"""Legacy-architecture field: loading + rendering the reference's shipped
``checkpoint/0-6`` artifacts (543,052-param retired model class).

The current reference code itself CRASHES on these files (nerf.py:402-420
instantiates the new 593,924-param class and load_state_dict mismatches);
tinynerf loads and renders them faithfully. Content note: all seven shipped
artifacts encode a saturated field (sigma pre-activations +33..+66 through a
Sigmoid head) — a collapsed training run — so renders are uniform white fog;
parity with the unpickled torch modules is asserted bit-exactly below.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinynerf.core import encoding, legacy, render
from tinynerf.core.rays import make_k_inv

CKPT = "/root/reference/checkpoint/0"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="shipped reference checkpoints absent")


@pytest.fixture(scope="module")
def params():
    return legacy.load_shipped_checkpoint(CKPT)


def test_param_count(params):
    assert legacy.n_params(params) == legacy.N_PARAMS == 543_052


def test_rejects_wrong_architecture(tmp_path):
    with pytest.raises(Exception):
        legacy.load_shipped_checkpoint(str(tmp_path / "missing"))


def test_bit_parity_vs_unpickled_torch_modules(params):
    """The stub-unpickled torch Sequentials still execute the REAL retired
    forward; our jnp field must match them exactly on shared inputs."""
    import sys
    import torch
    import torch.nn as nn

    class NeRFModel(nn.Module):
        pass

    class Encoder(nn.Module):
        pass

    class Network(nn.Module):
        pass

    main = sys.modules["__main__"]
    saved = {c.__name__: getattr(main, c.__name__, None)
             for c in (NeRFModel, Encoder, Network)}
    for c in (NeRFModel, Encoder, Network):
        c.__module__, c.__qualname__ = "__main__", c.__name__
        setattr(main, c.__name__, c)
    try:
        # restricted unpickler (untrusted artifact): same allowlist the
        # production loader uses — see legacy.load_shipped_checkpoint
        with torch.serialization.safe_globals(
                [NeRFModel, Encoder, Network, nn.Sequential, nn.Linear,
                 nn.ReLU, nn.Sigmoid]):
            model = torch.load(CKPT, map_location="cpu", weights_only=True)
    finally:
        for name, old in saved.items():
            if old is None:
                delattr(main, name)
            else:
                setattr(main, name, old)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (16, 3)).astype(np.float32)
    dirs = rng.normal(size=(16, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    enc_pt = torch.from_numpy(np.asarray(encoding.encode_points(
        jnp.asarray(pts))).copy())
    enc_dir = torch.from_numpy(np.asarray(encoding.encode_dirs(
        jnp.asarray(dirs))).copy())
    with torch.no_grad():
        t_h = model.network.point_layer(enc_pt)
        t_sig = model.network.sigma_layer(t_h).numpy()
        t_col = model.network.color_layer(
            torch.cat([enc_dir, t_h], -1)).numpy()

    col, sig = legacy.field_legacy(params, jnp.asarray(pts), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(sig), t_sig, atol=1e-6)
    np.testing.assert_allclose(np.asarray(col), t_col, atol=1e-6)


def test_renders_through_hierarchical_pipeline(params):
    """field_legacy plugs into render_rays unchanged (coarse+fine+merge)."""
    from tests.test_rays import _pose17
    k_inv = make_k_inv(8.0, 8.0, 10.0)
    pose = jnp.asarray(np.tile(_pose17(np.eye(4), 8, 8, 10.0, 2.0, 6.0),
                               (4, 1)))
    rows = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    cols = jnp.asarray(np.array([4.0, 3.0, 2.0, 1.0], np.float32))
    c_co, c_fi = render.render_rays(params, rows, cols, pose, k_inv, 8, 16,
                                    field_fn=legacy.field_legacy)
    assert np.isfinite(np.asarray(c_fi)).all()
    assert np.isfinite(np.asarray(c_co)).all()
