"""Golden tests of the positional encoder against a direct numpy
transcription of the reference math (nerf.py:135-167), including the
nonstandard fractional-exponent frequencies (Q3) and channel-major layout."""

import numpy as np
import jax.numpy as jnp

from tinynerf.core import encoding


def _reference_encode(x: np.ndarray, L: int) -> np.ndarray:
    """Numpy transcription of the reference Encoder for one coordinate set."""
    freqs = np.exp2(np.linspace(0.0, L, L)) * np.pi  # nerf.py:142-145
    out = np.zeros(x.shape[:-1] + (3, 2 * L))
    for c in range(3):
        for l in range(L):
            out[..., c, 2 * l] = np.sin(freqs[l] * x[..., c])
            out[..., c, 2 * l + 1] = np.cos(freqs[l] * x[..., c])
    return out.reshape(x.shape[:-1] + (3 * 2 * L,))


def test_freq_bank_is_fractional():
    # 2^linspace(0, L, L): exponents 0, L/(L-1), ..., L — NOT 2^(0..L-1)
    bank = encoding.freq_bank(10)
    expected = np.exp2(np.linspace(0, 10, 10)).astype(np.float32) * np.pi
    np.testing.assert_allclose(bank, expected, rtol=1e-6)
    assert bank[1] != np.float32(2.0 * np.pi)  # would be 2pi under 2^(0..L-1)


def test_point_encoding_matches_reference_math():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, size=(5, 7, 3)).astype(np.float32)
    ours = np.asarray(encoding.encode_points(jnp.asarray(pts)))
    ref = _reference_encode(pts, encoding.L_POINT)
    assert ours.shape == (5, 7, 60)
    # fp32 sin/cos at arguments up to 2^10*pi*|x| carries ~5e-4 abs noise
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_dir_encoding_matches_reference_math():
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(4, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ours = np.asarray(encoding.encode_dirs(jnp.asarray(dirs)))
    ref = _reference_encode(dirs, encoding.L_DIR)
    assert ours.shape == (4, 24)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_no_identity_term():
    # layout starts with sin(f0 * x), f0 = pi — not the raw input
    pts = np.array([[0.25, 0.0, 0.0]], dtype=np.float32)
    enc = np.asarray(encoding.encode_points(jnp.asarray(pts)))
    np.testing.assert_allclose(enc[0, 0], np.sin(np.pi * 0.25), atol=1e-6)
    np.testing.assert_allclose(enc[0, 1], np.cos(np.pi * 0.25), atol=1e-6)
