"""Sinusoidal positional encoding, exactly matching the reference semantics.

The reference (``nerf.py:126-167``) is deliberately nonstandard (SURVEY.md Q3):

- frequencies are ``2**linspace(0, L, L) * pi`` — i.e. L *fractional* exponents
  ``0, L/(L-1), ..., L`` — not the usual ``2**(0..L-1)``;
- there is no identity/raw-input term;
- the output layout is channel-major with sin/cos interleaved per frequency:
  ``[sin f0·x, cos f0·x, sin f1·x, cos f1·x, ... | y-block | z-block]``
  (reference ``nerf.py:159`` permute+flatten followed by ``nerf.py:103-104``).

Point dim = 3·2·10 = 60; dir dim = 3·2·4 = 24.

Unlike the reference, which rebuilds the frequency bank on device on every
forward call (``nerf.py:141-148``), the bank here is a compile-time constant
folded into the jitted graph.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

L_POINT = 10
L_DIR = 4
POINT_ENC_DIM = 3 * 2 * L_POINT  # 60
DIR_ENC_DIM = 3 * 2 * L_DIR      # 24


def freq_bank(num_freqs: int) -> np.ndarray:
    """``2**linspace(0, L, L) * pi`` — the reference's fractional-exponent bank
    (``nerf.py:142-145``). Returned as host numpy so it constant-folds under jit."""
    return np.exp2(np.linspace(0.0, num_freqs, num_freqs, dtype=np.float64)).astype(
        np.float32
    ) * np.pi


_POINT_FREQS = freq_bank(L_POINT)
_DIR_FREQS = freq_bank(L_DIR)


def positional_encode(x: jnp.ndarray, freqs: np.ndarray) -> jnp.ndarray:
    """Encode ``(..., 3)`` coordinates to ``(..., 3*2*L)`` in reference layout.

    Per channel c: ``[sin(f_0 c), cos(f_0 c), ..., sin(f_{L-1} c), cos(f_{L-1} c)]``,
    channel blocks concatenated in x, y, z order.
    """
    L = freqs.shape[0]
    # (..., 3, L)
    scaled = x[..., :, None] * jnp.asarray(freqs, dtype=x.dtype)
    # interleave sin/cos on a trailing axis -> (..., 3, L, 2) -> (..., 3*2L)
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    return enc.reshape(*x.shape[:-1], 3 * 2 * L)


def encode_points(points: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) world points -> (..., 60)."""
    return positional_encode(points, _POINT_FREQS)


def encode_dirs(dirs: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) world unit directions -> (..., 24)."""
    return positional_encode(dirs, _DIR_FREQS)
