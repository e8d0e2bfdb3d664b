import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinynerf import optim, train as trainlib
from tinynerf.config import Config
from tinynerf.core.rays import make_k_inv
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayTable


def _tiny_cfg(**kw):
    base = dict(batch_ray=32, n_coarse=8, n_fine=16, learning=5e-4,
                decay_end=1000, total_iter=100, step=50, use_pallas=False)
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def table(request):
    scene_dir = request.getfixturevalue("sync_scene_dir")
    return RayTable(load_scene(scene_dir, "sync", "train"))


def test_exp_schedule_q6_exact():
    # lr(iter) = learning * gamma^(iter/decay_end) for iter < decay_end,
    # else learning * (gamma * learning)  — the reference quirk Q6 verbatim
    lr = optim.exp_schedule(jnp.asarray(0), 3e-4, 0.1, 10000.0)
    np.testing.assert_allclose(float(lr), 3e-4, rtol=1e-6)
    lr = optim.exp_schedule(jnp.asarray(5000), 3e-4, 0.1, 10000.0)
    np.testing.assert_allclose(float(lr), 3e-4 * 0.1 ** 0.5, rtol=1e-5)
    lr = optim.exp_schedule(jnp.asarray(10000), 3e-4, 0.1, 10000.0)
    np.testing.assert_allclose(float(lr), 3e-4 * 0.1 * 3e-4, rtol=1e-6)


def test_multistep_schedule():
    lr_fn = lambda i: optim.multistep_schedule(jnp.asarray(i), 1e-3, 0.1, [10, 200])
    np.testing.assert_allclose(float(lr_fn(5)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(lr_fn(10)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(lr_fn(500)), 1e-5, rtol=1e-6)


def test_adam_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    tparam = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.Adam([tparam], lr=1e-2, betas=(0.9, 0.999), eps=1e-7)

    params = {"w": jnp.asarray(w0)}
    state = optim.adam_init(params)
    for i in range(5):
        g = rng.normal(size=(4, 3)).astype(np.float32)
        topt.zero_grad()
        tparam.grad = torch.tensor(g.copy())
        topt.step()
        params, state = optim.adam_update(
            {"w": jnp.asarray(g)}, state, params, jnp.asarray(1e-2))
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tparam.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_train_step_decreases_loss(table):
    cfg = _tiny_cfg()
    k_inv = make_k_inv(table.height, table.width, table.focal)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    losses = []
    for _ in range(150):
        state, metrics = step(state)
        losses.append(float(metrics["loss"]))
    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < early * 0.7, (early, late)
    assert int(state.iteration) == 150


def test_train_determinism(table):
    cfg = _tiny_cfg()
    k_inv = make_k_inv(table.height, table.width, table.focal)
    step = trainlib.make_train_step(cfg, table, k_inv)

    def run():
        state = trainlib.init_state(cfg)
        out = []
        for _ in range(5):
            state, m = step(state)
            out.append(float(m["loss"]))
        return out

    assert run() == run()


def test_chunked_step_matches_loop(table):
    cfg = _tiny_cfg()
    k_inv = make_k_inv(table.height, table.width, table.focal)
    step = trainlib.make_train_step(cfg, table, k_inv)
    chunked = trainlib.make_chunked_step(step, unroll=4)

    s_loop = trainlib.init_state(cfg)
    loop_losses, loop_lrs = [], []
    for _ in range(4):
        s_loop, m = step(s_loop)
        loop_losses.append(float(m["loss"]))
        loop_lrs.append(float(m["lr"]))
    last_rows = np.asarray(m["rows"])

    s_chunk, metrics = chunked(trainlib.init_state(cfg))
    np.testing.assert_allclose(np.asarray(metrics["loss"]), loop_losses,
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(metrics["lr"]), loop_lrs, rtol=1e-6)
    # preview fields are the LAST step's batch
    np.testing.assert_array_equal(np.asarray(metrics["rows"]), last_rows)
    assert int(s_chunk.iteration) == 4


def test_multi_step_scan_matches_loop(table):
    cfg = _tiny_cfg()
    k_inv = make_k_inv(table.height, table.width, table.focal)
    step = trainlib.make_train_step(cfg, table, k_inv)
    multi = trainlib.make_multi_step(step, unroll=4)

    s_loop = trainlib.init_state(cfg)
    loop_losses = []
    for _ in range(4):
        s_loop, m = step(s_loop)
        loop_losses.append(float(m["loss"]))

    s_scan, scan_losses = multi(trainlib.init_state(cfg))
    np.testing.assert_allclose(np.asarray(scan_losses), loop_losses,
                               rtol=2e-4, atol=1e-5)
    assert int(s_scan.iteration) == 4
