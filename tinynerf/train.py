"""The jitted train step: sample -> render -> loss -> grad -> Adam, on device.

One compiled XLA program per step replaces the reference's eager loop
(``nerf.py:445-499``), which crosses the host/device boundary 8+ times per
iteration (SURVEY.md §3.2). Here batch sampling, ray generation, both MLP
passes, the hierarchical resampler, compositing, backward and the optimizer
all live in a single traced graph with static shapes; the host only ticks the
loop and reads metrics at logging cadence.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tinynerf import optim
from tinynerf.config import Config
from tinynerf.core import mlp, render
from tinynerf.data.rays import RayTable


class TrainState(NamedTuple):
    params: Any
    opt: optim.AdamState
    iteration: jnp.ndarray  # int32 scalar — drives the LR schedule and resume
    key: jax.Array
    occ: Any = None         # OccGrid when empty-space skipping is enabled


def net_params(cfg: Config, params: Any) -> Any:
    """The main-field param tree. With PROPOSAL the train-state params are a
    ``{"net", "prop"}`` pair (one Adam over both); plain tree otherwise."""
    return params["net"] if cfg.proposal else params


def prop_params(cfg: Config, params: Any) -> Optional[Any]:
    return params["prop"] if cfg.proposal else None


def init_state(cfg: Config, key: Optional[jax.Array] = None,
               params: Optional[Any] = None,
               opt_state: Optional[optim.AdamState] = None,
               iteration: int = 0) -> TrainState:
    if cfg.fine_field == "grid" and cfg.grid_upsample and cfg.grid_levels > 1:
        # config-level incompatibility: fail on EVERY path (fresh init AND
        # resume) before any parameter work, not at the first upsample
        # milestone (ADVICE r3)
        raise ValueError("GRID_UPSAMPLE is incompatible with "
                         "GRID_LEVELS>1 (multi-resolution pyramid)")
    if params is not None and cfg.fine_field == "grid":
        # resumed checkpoints carry their own level structure in the lines
        # keys; the config knob cannot restructure them — say so instead of
        # silently ignoring GRID_LEVELS (ADVICE r3)
        lines = (params["net"] if cfg.proposal else params).get("lines")
        if lines is not None:
            n_levels = 1 + max((int(k[1:]) for k in lines if len(k) > 1),
                               default=0)
            if n_levels != cfg.grid_levels:
                print(f"WARNING: checkpoint has {n_levels} grid level(s) "
                      f"but GRID_LEVELS={cfg.grid_levels}; the checkpoint's "
                      "level structure wins (resume cannot restructure the "
                      "pyramid)")
    key = jax.random.PRNGKey(cfg.seed) if key is None else key
    pkey, skey = jax.random.split(key)
    if params is None:
        if cfg.fine_field == "grid":
            from tinynerf.core.gridfield import init_grid_field
            params = init_grid_field(pkey, res=cfg.grid_res,
                                     n_density=cfg.grid_comp_density,
                                     n_app=cfg.grid_comp_app,
                                     decoder_width=cfg.grid_decoder_width,
                                     extent=cfg.grid_extent,
                                     hybrid=cfg.grid_hybrid,
                                     sigma_width=cfg.grid_sigma_width,
                                     levels=cfg.grid_levels)
        else:
            params = mlp.init_network(pkey)
        if cfg.proposal:
            pkey2 = jax.random.fold_in(pkey, 1)
            if cfg.prop_field == "grid":
                from tinynerf.core.gridfield import init_grid_field
                prop = init_grid_field(
                    pkey2, res=cfg.prop_grid_res,
                    n_density=cfg.prop_grid_comp_density,
                    n_app=cfg.prop_grid_comp_app,
                    decoder_width=cfg.prop_grid_decoder_width,
                    extent=cfg.grid_extent,
                    hybrid=cfg.prop_grid_hybrid)
            else:
                from tinynerf.core.proposal import init_proposal
                prop = init_proposal(pkey2, cfg.proposal_width,
                                     cfg.proposal_depth,
                                     enc_l=cfg.proposal_enc_l)
            params = {"net": params, "prop": prop}
    if opt_state is None:
        opt_state = optim.adam_init(params)
    occ = None
    if cfg.occ_grid:
        from tinynerf.core.occupancy import init_grid
        occ = init_grid(cfg.occ_res, cfg.occ_extent, cfg.occ_thresh)
    return TrainState(params=params, opt=opt_state,
                      iteration=jnp.asarray(iteration, jnp.int32), key=skey,
                      occ=occ)


def _maybe_contract(cfg: Config, fn: render.FieldFn) -> render.FieldFn:
    """Wrap a field for unbounded scenes (``CONTRACT``): points warp into
    the mip-360 radius-2 ball before evaluation. The wrapper drops the
    fused-kernel attributes on purpose — see core/contract.py."""
    if not cfg.contract:
        return fn
    if cfg.ndc:
        raise ValueError(
            "CONTRACT is incompatible with NDC: both are warps of the march "
            "domain (NDC for forward-facing, contraction for unbounded 360) "
            "and composing them distorts the scene twice.")
    from tinynerf.core.contract import wrap_field_contract
    return wrap_field_contract(fn)


def make_field_fn(cfg: Config, force_pallas: bool = False) -> render.FieldFn:
    """Pick the field evaluator: fused Pallas kernel on TPU, pure jnp
    otherwise, with optional bf16 compute (fp32 params/geometry).
    ``force_pallas`` bypasses the backend check (interpreter-mode tests).
    With ``CONTRACT`` the chosen field is wrapped so it evaluates at
    mip-360-contracted points (unbounded 360 scenes)."""
    if cfg.contract:
        return _maybe_contract(cfg, _make_field_fn_inner(cfg, force_pallas))
    return _make_field_fn_inner(cfg, force_pallas)


def _make_field_fn_inner(cfg: Config, force_pallas: bool) -> render.FieldFn:
    if cfg.fine_field == "grid":
        # factorized CP feature grid (core/gridfield.py): pure XLA — the
        # field is three hat-basis matmuls + an elementwise product + a
        # 64-wide decoder, exactly the shape XLA fuses well (same reason
        # the proposal net's default path is jnp, train.make_prop_field_fn)
        from tinynerf.core.gridfield import make_field_grid
        dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
        fn = make_field_grid(n_density=cfg.grid_comp_density,
                             lookup=cfg.grid_lookup, compute_dtype=dtype,
                             fold=cfg.grid_level_fold)
        if cfg.grid_pallas and (force_pallas
                                or jax.default_backend() == "tpu"):
            if cfg.grid_hybrid:
                raise ValueError(
                    "GRID_PALLAS computes the plain CP form and would "
                    "silently drop the GRID_HYBRID sigma net — unset one")
            if cfg.grid_levels > 1:
                raise ValueError(
                    "GRID_PALLAS reads only the level-0 line tables and "
                    "would silently drop the GRID_LEVELS pyramid — unset "
                    "one")
            # fused ray-major kernel: the (rows, R) hat-basis matrices —
            # the jnp path's dominant HBM artifact — live only in VMEM
            import functools
            from tinynerf.kernels.grid_kernel import grid_field_pallas_rays
            fn.eval_rays = functools.partial(
                grid_field_pallas_rays, n_density=cfg.grid_comp_density,
                compute_dtype=dtype)
        return fn
    if cfg.use_pallas and (force_pallas or jax.default_backend() == "tpu"):
        import functools
        from tinynerf.kernels.mlp_kernel import field_pallas, field_pallas_rays
        dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
        fn = functools.partial(field_pallas, compute_dtype=dtype)
        # renderer fast path: fused ray->point expansion (render._eval_field)
        fn.eval_rays = functools.partial(field_pallas_rays,
                                         compute_dtype=dtype)
        if cfg.fused_render:
            # EXPERIMENTAL (opt-in, default off): whole-renderer Pallas
            # fusion for grad-free renders — measured slower than the
            # per-pass kernels at production shapes; kept as a working
            # reference (see tinynerf/kernels/render_kernel.py STATUS)
            from tinynerf.kernels.render_kernel import render_fused
            fn.render_fused = functools.partial(render_fused,
                                                compute_dtype=dtype)
        return fn
    if cfg.precision == "bf16":
        from tinynerf.core import encoding, mlp

        def bf16_field(params, points, dirs):
            # encode at f32, cast the ENCODING to bf16: sin(2^10*pi*x) with
            # x quantized to bf16 is phase noise in the top PE bands (the
            # Pallas kernels encode at f32 internally for the same reason)
            pe = encoding.encode_points(points).astype(jnp.bfloat16)
            de = encoding.encode_dirs(dirs).astype(jnp.bfloat16)
            color, sigma = mlp.apply_network(params, pe, de)
            return color.astype(jnp.float32), sigma.astype(jnp.float32)
        return bf16_field
    return render.field_jnp


def make_prop_field_fn(cfg: Config,
                       force_pallas: bool = False) -> Optional[render.FieldFn]:
    """The narrow proposal field for the coarse pass (None unless PROPOSAL).

    Default is pure jnp even on TPU: the dedicated Pallas kernel
    (``kernels/proposal_kernel.py``) MEASURED SLOWER than XLA's lowering of
    the narrow net (29.3 vs ~26.5 ms/step at batch 4096 — per-row cost is
    dominated by the fixed PE transcendentals, which the kernel serializes
    across grid steps while XLA overlaps its fusions; larger kernel tiles
    explode Mosaic compile time). ``prop_pallas=True`` opts the kernel in —
    kept working + tested, same status as FUSED_RENDER.

    With ``CONTRACT`` the proposal field is wrapped exactly like the fine
    field (``_maybe_contract``): sample PLACEMENT must see the same warped
    scene the fine pass renders."""
    if not cfg.proposal:
        return None
    if cfg.contract:
        return _maybe_contract(
            cfg, _make_prop_field_fn_inner(cfg, force_pallas))
    return _make_prop_field_fn_inner(cfg, force_pallas)


def _make_prop_field_fn_inner(cfg: Config,
                              force_pallas: bool) -> render.FieldFn:
    if cfg.prop_field == "grid":
        # tiny CP grid as the proposal field: all matmuls, zero PE
        # transcendentals — the cost that bounds the narrow prop NET
        # (kernels/proposal_kernel.py STATUS) simply doesn't exist here
        from tinynerf.core.gridfield import make_field_grid
        dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
        fn = make_field_grid(n_density=cfg.prop_grid_comp_density,
                             lookup=cfg.grid_lookup, compute_dtype=dtype)
        if cfg.grid_pallas and (force_pallas
                                or jax.default_backend() == "tpu"):
            if cfg.prop_grid_hybrid:
                raise ValueError(
                    "GRID_PALLAS computes the plain CP form and would "
                    "silently drop the PROP_GRID_HYBRID sigma net — "
                    "unset one")
            # same fused kernel, proposal-grid geometry (R=64, F=32): no
            # transcendentals on its hot path, so the proposal-kernel
            # serialization lesson (make_prop_field_fn docstring) does not
            # apply here
            import functools
            from tinynerf.kernels.grid_kernel import grid_field_pallas_rays
            fn.eval_rays = functools.partial(
                grid_field_pallas_rays,
                n_density=cfg.prop_grid_comp_density, compute_dtype=dtype)
        return fn
    from tinynerf.core.encoding import L_POINT
    if (cfg.use_pallas and cfg.prop_pallas
            and cfg.proposal_enc_l == L_POINT
            and (force_pallas or jax.default_backend() == "tpu")):
        # the kernel's encoding-permutation machinery is specialized to the
        # full L=10 bank; narrower PROPOSAL_ENC_L uses the jnp path (which
        # is the measured-faster default anyway)
        import functools
        from tinynerf.kernels.proposal_kernel import (prop_field_pallas,
                                                      prop_field_pallas_rays)
        dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
        fn = functools.partial(prop_field_pallas, compute_dtype=dtype)
        fn.eval_rays = functools.partial(prop_field_pallas_rays,
                                         compute_dtype=dtype)
        return fn
    from tinynerf.core.proposal import make_field_proposal
    dtype = jnp.bfloat16 if cfg.precision == "bf16" else None
    # f32 encoding, bf16 network — see bf16_field above
    return make_field_proposal(cfg.proposal_enc_l, compute_dtype=dtype)


def upsample_grid_state(cfg: Config, state: TrainState,
                        new_res: int) -> TrainState:
    """Coarse-to-fine resolution step for the fine grid field
    (``GRID_UPSAMPLE``): linearly resample the line tables — and the
    matching Adam moment trees, which live on the same lattice — to
    ``new_res`` nodes per axis.

    Interpolating the moments (instead of TensoRF's full optimizer reset)
    preserves per-node adaptivity across the jump: ``nu`` stays
    non-negative because the interpolation weights are. The decoder,
    proposal field and iteration/LR state pass through untouched. Shapes
    change, so the next train-step call re-traces (once per milestone).
    Runs outside jit — a few (R', R) @ (R, F) matmuls, host-dispatched."""
    from tinynerf.core.gridfield import upsample_lines

    def resize(tree):
        if cfg.proposal:
            return dict(tree, net=upsample_lines(tree["net"], new_res))
        return upsample_lines(tree, new_res)

    return state._replace(
        params=resize(state.params),
        opt=state.opt._replace(mu=resize(state.opt.mu),
                               nu=resize(state.opt.nu)))


def make_lr_scale(cfg: Config, params: Any):
    """Per-leaf LR-multiplier pytree for optim.adam_update, or None.

    Only the grid field uses it: factorized line tables want ~10-40x the
    decoder/MLP learning rate (TensoRF-style split). Pyramid tables
    (GRID_LEVELS>1) additionally scale by ``grid_level_lr**level`` —
    level l's key inside ``lines`` is ``{x,y,z}{l}`` — so coarse levels
    can train hotter (>1, to offset their zero init) or cooler (<1, to
    damp their wide-support late-schedule gradients). Every other leaf —
    decoder, proposal net — stays at 1x, and non-grid configs return None
    so the default path keeps single-LR torch-exact semantics."""
    uses_grid = (cfg.fine_field == "grid"
                 or (cfg.proposal and cfg.prop_field == "grid"))
    if not uses_grid or (cfg.grid_lr_mult == 1.0 and cfg.grid_level_lr == 1.0):
        return None

    def scale(path, _leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        if "lines" not in keys:
            return 1.0
        name = keys[keys.index("lines") + 1]
        level = int(name[1:]) if len(name) > 1 and name[1:].isdigit() else 0
        return cfg.grid_lr_mult * cfg.grid_level_lr ** level

    return jax.tree_util.tree_map_with_path(scale, params)


def make_loss_fn(cfg: Config, k_inv: jnp.ndarray,
                 field_fn: Optional[render.FieldFn] = None,
                 ndc_params=None) -> Callable:
    """loss(params, batch, key) -> (loss, (C_coarse, C_fine)). Shared by the
    single-chip and mesh-sharded steps. With PROPOSAL, ``params`` is the
    combined {"net", "prop"} pair and the coarse pass runs the narrow field
    (both nets train under the same sum loss, like the reference's shared
    coarse+fine objective)."""
    field_fn = field_fn or make_field_fn(cfg)
    prop_fn = make_prop_field_fn(cfg)

    want_dist = cfg.dist_loss > 0.0
    want_il = cfg.prop_interlevel > 0.0
    if (want_dist or want_il) and not cfg.proposal:
        raise ValueError("DIST_LOSS / PROP_INTERLEVEL require PROPOSAL=True "
                         "(see render.distortion_loss / interlevel_loss)")

    def loss_fn(params, batch, key, occ=None):
        out = render.render_rays(
            net_params(cfg, params), batch.rows, batch.cols, batch.pose17,
            k_inv, cfg.n_coarse, cfg.n_fine, field_fn=field_fn,
            key=key if cfg.stratified else None,
            compat_sort=cfg.compat_sort, ndc_params=ndc_params,
            white_bkgd=cfg.white_bkgd, occ_grid=occ,
            occ_march=cfg.occ_march_steps, occ_contract=cfg.contract,
            occ_march_res=cfg.occ_march_res,
            prop_params=prop_params(cfg, params), prop_field_fn=prop_fn,
            want_dist=want_dist, want_interlevel=want_il,
            lindisp=cfg.lindisp)
        c_co, c_fi = out[0], out[1]
        loss = render.ray_loss(c_co, c_fi, batch.rgb)
        if want_dist:
            # sum over rays, matching the house sum-loss scale (Q14)
            loss = loss + cfg.dist_loss * jnp.sum(out[2]["dist"])
        if want_il:
            loss = loss + cfg.prop_interlevel * jnp.sum(out[2]["interlevel"])
        if cfg.fine_field == "grid" and cfg.grid_tv > 0.0:
            from tinynerf.core.gridfield import tv_loss
            loss = loss + cfg.grid_tv * tv_loss(net_params(cfg, params))
        return loss, (c_co, c_fi)

    return loss_fn



def _maybe_update_occ(cfg: Config, state: TrainState, field_fn, key,
                      cell_sharding=None):
    """In-graph occupancy-grid EMA refresh every cfg.occ_update_every steps
    (lax.cond: the R^3 field sweep only executes on refresh steps). With
    ``cell_sharding`` the probe evals are partitioned across the mesh."""
    if state.occ is None:
        return state.occ
    from tinynerf.core.occupancy import update_grid
    n_total = cfg.occ_res ** 3
    subset = (None if cfg.occ_subset >= 1.0
              else max(1, int(n_total * cfg.occ_subset)))

    def do(g):
        return update_grid(g, net_params(cfg, state.params), field_fn, key,
                           subset=subset, cell_sharding=cell_sharding,
                           contract=cfg.contract)

    return jax.lax.cond(
        state.iteration % cfg.occ_update_every == 0, do, lambda g: g,
        state.occ)

def _apply_batch(cfg: Config, loss_fn, lr_fn, field_fn, batch_sharding,
                 state: TrainState, batch, skey, okey,
                 ) -> Tuple[TrainState, dict]:
    """Shared step body: occ refresh -> grad -> Adam -> metrics. All three
    step builders (sampled / host-fed / indexed-epoch) trace through this."""
    occ = _maybe_update_occ(cfg, state, field_fn, okey,
                            cell_sharding=batch_sharding)
    if batch_sharding is not None:
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding)
            if x.ndim >= 1 else x, batch)
    (loss, (c_co, c_fi)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, batch, skey, occ)
    lr = lr_fn(state.iteration)
    params, opt = optim.adam_update(grads, state.opt, state.params, lr,
                                    lr_scale=make_lr_scale(cfg, state.params))
    metrics = {"loss": loss, "lr": lr,
               "c_true0": batch.rgb[0], "c_fine0": c_fi[0],
               # last-step batch, for the host-side preview canvas
               "rows": batch.rows, "cols": batch.cols,
               "rgb": batch.rgb, "pic": batch.pic}
    return TrainState(params=params, opt=opt,
                      iteration=state.iteration + 1, key=state.key,
                      occ=occ), metrics


def make_train_step(cfg: Config, table: RayTable, k_inv: jnp.ndarray,
                    field_fn: Optional[render.FieldFn] = None,
                    batch_sharding=None, ndc_params=None,
                    ) -> Callable[[TrainState], Tuple[TrainState, dict]]:
    """Build the jitted step. With ``batch_sharding`` (a NamedSharding over the
    ray axis), the sampled batch is sharding-constrained so XLA partitions the
    whole step data-parallel over the mesh and inserts the gradient psum
    itself — collectives ride ICI, params stay replicated (SURVEY.md §2.17).
    """
    loss_fn = make_loss_fn(cfg, k_inv, field_fn, ndc_params)
    lr_fn = optim.make_lr_fn(cfg)
    field_fn_resolved = field_fn or make_field_fn(cfg)

    def step(state: TrainState) -> Tuple[TrainState, dict]:
        key, bkey, skey, okey = jax.random.split(state.key, 4)
        batch = table.sample(bkey, cfg.batch_ray)
        return _apply_batch(cfg, loss_fn, lr_fn, field_fn_resolved,
                            batch_sharding, state._replace(key=key),
                            batch, skey, okey)

    return jax.jit(step, donate_argnums=0)


def make_host_fed_train_step(cfg: Config, k_inv: jnp.ndarray,
                             field_fn: Optional[render.FieldFn] = None,
                             batch_sharding=None, ndc_params=None) -> Callable:
    """Train step taking the ray batch as an argument — the big-scene path.

    Used with the native C++ host prefetcher (``tinynerf/data/native.py``)
    when the pixel table exceeds HBM: the C++ ring buffer assembles batches
    on background threads and jax's async dispatch overlaps the host->device
    copy with the previous step's compute.
    """
    loss_fn = make_loss_fn(cfg, k_inv, field_fn, ndc_params)
    lr_fn = optim.make_lr_fn(cfg)
    field_fn_resolved = field_fn or make_field_fn(cfg)

    def step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        key, skey, okey = jax.random.split(state.key, 3)
        return _apply_batch(cfg, loss_fn, lr_fn, field_fn_resolved,
                            batch_sharding, state._replace(key=key),
                            batch, skey, okey)

    return jax.jit(step, donate_argnums=0)


def make_indexed_train_step(cfg: Config, table: RayTable, k_inv: jnp.ndarray,
                            field_fn: Optional[render.FieldFn] = None,
                            batch_sharding=None, ndc_params=None) -> Callable:
    """Train step over a GIVEN (B,) array of flat pixel indices.

    The epoch path: the caller owns the index stream, so a shuffled
    without-replacement permutation reproduces the reference DataLoader's
    ``shuffle=True, drop_last=True`` epoch semantics exactly (used by the
    Runner's val mode, reference ``nerf.py:498-499``)."""
    loss_fn = make_loss_fn(cfg, k_inv, field_fn, ndc_params)
    lr_fn = optim.make_lr_fn(cfg)
    field_fn_resolved = field_fn or make_field_fn(cfg)

    def step(state: TrainState, idx: jnp.ndarray) -> Tuple[TrainState, dict]:
        key, skey, okey = jax.random.split(state.key, 3)
        batch = table.gather(idx)
        return _apply_batch(cfg, loss_fn, lr_fn, field_fn_resolved,
                            batch_sharding, state._replace(key=key),
                            batch, skey, okey)

    return jax.jit(step, donate_argnums=0)


def make_multi_step(step_fn: Callable, unroll: int) -> Callable:
    """Fuse ``unroll`` train steps into one compiled program with lax.scan —
    amortizes per-dispatch overhead for benchmarking and headless training.
    Returns (state, losses (unroll,))."""
    def body(state, _):
        state, metrics = step_fn(state)  # jitted fns inline when traced
        return state, metrics["loss"]

    def multi(state):
        return jax.lax.scan(body, state, None, length=unroll)

    return jax.jit(multi, donate_argnums=0)


def make_chunked_indexed_step(step_fn: Callable, unroll: int) -> Callable:
    """Scan-fused epoch chunk: ``multi(state, idx (unroll, B)) -> (state,
    metrics)`` with the same metric semantics as :func:`make_chunked_step`.
    One dispatch per ``unroll`` epoch batches (the val-pass fast path)."""
    def body(state, idx):
        state, metrics = step_fn(state, idx)
        scalars = {"loss": metrics["loss"], "lr": metrics["lr"]}
        last = {k: metrics[k]
                for k in ("c_true0", "c_fine0", "rows", "cols", "rgb", "pic")}
        return state, (scalars, last)

    def multi(state, idx_chunk):
        state, (scalars, last) = jax.lax.scan(body, state, idx_chunk)
        last = jax.tree_util.tree_map(lambda x: x[-1], last)
        return state, {**scalars, **last}

    return jax.jit(multi, donate_argnums=0)


def make_chunked_step(step_fn: Callable, unroll: int) -> Callable:
    """Like :func:`make_multi_step` but keeps the full metrics stream:
    returns (state, metrics) where scalar metrics are stacked (unroll,) and
    the preview-batch fields are those of the LAST step. This is what the
    Runner's training loop uses — per-iteration logging fidelity at
    one-dispatch-per-chunk cost."""
    def body(state, _):
        state, metrics = step_fn(state)
        scalars = {"loss": metrics["loss"], "lr": metrics["lr"]}
        last = {k: metrics[k]
                for k in ("c_true0", "c_fine0", "rows", "cols", "rgb", "pic")}
        return state, (scalars, last)

    def multi(state):
        state, (scalars, last) = jax.lax.scan(body, state, None, length=unroll)
        # keep only the final step's batch fields
        last = jax.tree_util.tree_map(lambda x: x[-1], last)
        return state, {**scalars, **last}

    return jax.jit(multi, donate_argnums=0)
