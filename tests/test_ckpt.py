import numpy as np
import jax
import jax.numpy as jnp

from tinynerf import ckpt, optim
from tinynerf.core import mlp


def test_save_load_roundtrip(tmp_path):
    params = mlp.init_network(jax.random.PRNGKey(0))
    opt = optim.adam_init(params)
    opt = optim.AdamState(count=jnp.asarray(7, jnp.int32), mu=opt.mu, nu=opt.nu)
    path = ckpt.save_checkpoint(str(tmp_path), "01-01-00-00-00", 42, params, opt)
    iteration, p2, o2 = ckpt.load_checkpoint(path)
    assert iteration == 42
    assert int(o2.count) == 7
    for name in params:
        np.testing.assert_array_equal(np.asarray(params[name]["w"]),
                                      np.asarray(p2[name]["w"]))
        np.testing.assert_array_equal(np.asarray(params[name]["b"]),
                                      np.asarray(p2[name]["b"]))


def test_find_latest(tmp_path):
    params = {"a": {"w": jnp.zeros(2), "b": jnp.zeros(1)}}
    ckpt.save_checkpoint(str(tmp_path), "t", 10, params)
    ckpt.save_checkpoint(str(tmp_path), "t", 300, params)
    ckpt.save_checkpoint(str(tmp_path), "t", 25, params)
    latest = ckpt.find_latest(str(tmp_path))
    assert latest.endswith("_300.npz")
    assert ckpt.find_latest(str(tmp_path / "empty" )) is None


def test_import_torch_state_dict_shapes_and_forward():
    torch = __import__("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from nerf import Network
    finally:
        sys.path.pop(0)

    net = Network()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = ckpt.import_torch_state_dict(sd)
    assert mlp.num_params(params) == 593_924

    rng = np.random.default_rng(0)
    pe = rng.normal(size=(2, 5, 60)).astype(np.float32)
    de = rng.normal(size=(2, 5, 24)).astype(np.float32)
    color_j, sigma_j = mlp.apply_network(params, jnp.asarray(pe), jnp.asarray(de))
    with torch.no_grad():
        color_t, sigma_t = net(5, torch.tensor(pe), torch.tensor(de))
    np.testing.assert_allclose(np.asarray(color_j), color_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_j), sigma_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_export_torch_state_dict_roundtrip(tmp_path):
    """Export -> reference-module .pkl -> import must reproduce our params
    exactly, and the strict load into the actual reference Network/NeRFModel
    catches any naming or shape drift (tools/export_torch_ckpt.py path)."""
    torch = __import__("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        import nerf as refnerf
    finally:
        sys.path.pop(0)

    params = mlp.init_network(jax.random.PRNGKey(3))
    sd_np = ckpt.export_torch_state_dict(params)
    model = refnerf.NeRFModel(num_coarse=4, num_fine=8, batch_ray=2)
    model.network.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd_np.items()}, strict=True)

    # the reference's own resume path: torch.save(model) -> torch.load
    pkl = str(tmp_path / "exported_7.pkl")
    torch.save(model, pkl)
    loaded = torch.load(pkl, map_location="cpu", weights_only=False)
    back = ckpt.import_torch_state_dict(
        {k: v.detach().numpy() for k, v in loaded.network.state_dict().items()})
    for name in params:
        np.testing.assert_array_equal(np.asarray(params[name]["w"]),
                                      np.asarray(back[name]["w"]))
        np.testing.assert_array_equal(np.asarray(params[name]["b"]),
                                      np.asarray(back[name]["b"]))

    # PROPOSAL trees export their fine net; grid trees refuse loudly
    sd_prop = ckpt.export_torch_state_dict({"net": params, "prop": {}})
    np.testing.assert_array_equal(sd_prop["point_info.weight"],
                                  sd_np["point_info.weight"])
    import pytest
    with pytest.raises(ValueError):
        ckpt.export_torch_state_dict({"lines": {}, "decoder": {}})


def test_occ_grid_roundtrip(tmp_path):
    """The occupancy grid is TRAINING state (weights co-adapt to its
    tightened sampling) — it must survive checkpoint resume."""
    from tinynerf.core import mlp, occupancy

    params = mlp.init_network(jax.random.PRNGKey(0))
    grid = occupancy.init_grid(resolution=8, half_extent=1.5, threshold=0.02)
    raw = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (8, 8, 8)).astype(np.float32))
    grid = grid._replace(raw=raw, density=raw * 2.0)

    path = ckpt.save_checkpoint(str(tmp_path), "t", 7, params, occ=grid)
    *_, occ = ckpt.load_checkpoint_full(path)
    assert occ is not None
    np.testing.assert_array_equal(np.asarray(occ.raw), np.asarray(grid.raw))
    np.testing.assert_array_equal(np.asarray(occ.density),
                                  np.asarray(grid.density))
    assert float(occ.half_extent) == 1.5
    assert abs(float(occ.threshold) - 0.02) < 1e-7

    # absent when not saved
    p2 = ckpt.save_checkpoint(str(tmp_path), "t", 8, params)
    *_, occ2 = ckpt.load_checkpoint_full(p2)
    assert occ2 is None
