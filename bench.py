"""Benchmark harness: train-throughput rays/sec/chip on the lego workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload matches the reference's lego training configuration per step:
N_COARSE=64 + N_FINE=128 hierarchical samples per ray, full forward+backward+
Adam (reference ``conf/lego.ini``, ``nerf.py:445-475``), on a synthetic
800x800 scene resident in HBM. Rays/step defaults to 4096 (the reference's
400-ray batches cannot saturate any accelerator; rays/sec is the
batch-size-independent throughput metric — pass --batch 400 for the literal
reference batch).

Default model config since late round 3: PROPOSAL (tiny CP-grid coarse
proposal field) + the HYBRID GRID fine field (FINE_FIELD=grid +
GRID_HYBRID: TensoRF-CP line tables with an NGP-style density MLP mixing
the components, core/gridfield.py). This deviates from the reference's
shared-single-net architecture but every flip is measured STRICTLY
dominant on the 20k-iter validation protocol (VALIDATION.md round-3
tables): reference semantics 18.37 dB @110k -> proposal net 23.38 dB
@154k -> full-stack prop net 30.47 dB @135k -> full-stack prop GRID
30.76 dB @142k -> hybrid grid fine 33.50 dB @374k sustained — faster AND
higher quality at every step, and the 100k-soak ordering agrees (38.14 dB
hybrid vs 37.21 MLP fine). ``--mlp-fine`` measures the previous
(reference-size fine net) flagship, ``--no-proposal`` the
reference-architecture config, ``--prop-field mlp`` the narrow-net
proposal; the JSON carries a ``config`` field naming the measured variant.

vs_baseline: the reference publishes no numbers (BASELINE.md). The comparison
point is an estimated 8,000 rays/sec for the PyTorch reference on a modern
single GPU: its loop is bounded by 3 mandatory host<->device syncs per
400-ray iteration (SURVEY.md §3.2) at an optimistic ~20 it/s. A MEASURED
anchor exists since round 2: the reference runs at 92 rays/s on this host's
CPU (BASELINE.md "Measured reference numbers"), making the 8k GPU estimate
~87x its own CPU speed — a plausible GPU/CPU ratio for this workload.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 8_000.0  # estimated PyTorch-GPU baseline (see above)
REF_CPU_TRAIN_RAYS_PER_SEC = 92.0  # MEASURED: tools/bench_reference_cpu.py
REF_CPU_RENDER_SEC_PER_FRAME = 2_184.0  # MEASURED: 1.365 s per 400-ray
# no-grad batch x 1,600 batches/view (tools/bench_reference_cpu.py --render,
# BASELINE.md) — the render ratio divides two measurements on this host;
# the train ratio is measured-vs-GPU-estimate and is labeled as such


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--coarse", type=int, default=64)
    parser.add_argument("--fine", type=int, default=128)
    parser.add_argument("--unroll", type=int, default=20)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--hw", type=int, default=800)
    parser.add_argument("--precision", type=str, default="bf16",
                        choices=["fp32", "bf16"])
    parser.add_argument("--no-pallas", action="store_true",
                        help="use the pure-jnp field instead of the fused kernel")
    parser.add_argument("--fused", action="store_true",
                        help="EXPERIMENTAL whole-renderer fusion (measured "
                             "slower; see kernels/render_kernel.py)")
    parser.add_argument("--proposal", dest="proposal", action="store_true",
                        default=True,
                        help="narrow proposal net for the coarse pass "
                             "(PROPOSAL config; ~9x fewer coarse FLOPs). "
                             "DEFAULT since round 3: measured strictly "
                             "dominant — +36%% rays/s AND +5.2 dB on the "
                             "20k-iter validation protocol (VALIDATION.md)")
    parser.add_argument("--no-proposal", dest="proposal", action="store_false",
                        help="reference-architecture config (shared single "
                             "net for coarse+fine, the Config default)")
    parser.add_argument("--prop-enc-l", type=int, default=10,
                        help="PROPOSAL_ENC_L: point-PE bands for the "
                             "proposal field (10 = full Q3 bank)")
    parser.add_argument("--prop-field", type=str, default="grid",
                        choices=["mlp", "grid"],
                        help="PROP_FIELD: proposal field implementation — "
                             "tiny CP grid (default; zero PE "
                             "transcendentals, measured strictly dominant) "
                             "or the narrow PE net")
    parser.add_argument("--grid", dest="grid", action="store_true",
                        default=True,
                        help="FINE_FIELD=grid: factorized CP feature-grid "
                             "fine field (core/gridfield.py, ~7.7x fewer "
                             "MACs/sample than the reference net). DEFAULT "
                             "since late round 3 together with --hybrid: "
                             "measured strictly dominant over the MLP fine "
                             "net (VALIDATION.md: 33.50 dB @374k sustained "
                             "vs 30.76 @142k at 20k iters; 38.14 vs 37.21 "
                             "dB at a 100k soak)")
    parser.add_argument("--mlp-fine", dest="grid", action="store_false",
                        help="previous flagship: reference-size MLP fine "
                             "net (593,924 params) under the grid proposal")
    parser.add_argument("--hybrid", dest="hybrid", action="store_true",
                        default=True,
                        help="GRID_HYBRID: NGP-style tiny density MLP "
                             "mixing the CP components (default; +6.3 dB "
                             "over the plain CP sum at 15%% step cost)")
    parser.add_argument("--no-hybrid", dest="hybrid", action="store_false",
                        help="plain CP density sum (fastest config: "
                             "743k rays/s vs 632k hybrid)")
    parser.add_argument("--no-prop-hybrid", dest="prop_hybrid",
                        action="store_false", default=True,
                        help="disable the proposal-side density MLP "
                             "(PROP_GRID_HYBRID; default on with the "
                             "hybrid fine field: +1.16 dB @20k / +2.10 dB "
                             "@100k at <=1.5%% step cost, VALIDATION.md)")
    parser.add_argument("--grid-res", type=int, default=None,
                        help="grid line resolution override (default 256)")
    parser.add_argument("--grid-pallas", action="store_true",
                        help="fused CP-grid Pallas kernel for the grid "
                             "fields (kernels/grid_kernel.py)")
    parser.add_argument("--grid-lookup", type=str, default="onehot",
                        choices=["onehot", "gather"],
                        help="grid lookup implementation (gather is the "
                             "measurement-only canonical formulation)")
    parser.add_argument("--occ", action="store_true",
                        help="measure with the occupancy grid enabled "
                             "(empty-space skipping; trades ~9%% rays/s for "
                             "reconstruction quality)")
    parser.add_argument("--set", action="append", default=[],
                        metavar="KEY=VALUE", dest="overrides",
                        help="override any INI config key on top of the "
                             "flag-built config (repeatable), e.g. "
                             "--set PROP_INTERLEVEL=0.01")
    parser.add_argument("--metric", type=str, default="train",
                        choices=["train", "render"],
                        help="train rays/sec (default) or 800x800 sec/frame")
    parser.add_argument("--host-chunks", nargs="?", const=1, default=0,
                        type=int, metavar="K",
                        help="render metric only: measure the serving path "
                             "(host loop over one compiled program) instead "
                             "of the whole-frame program; optional K = "
                             "chunks folded per dispatch (default 1)")
    args = parser.parse_args()
    if args.host_chunks and args.metric != "render":
        parser.error("--host-chunks only applies to --metric render")

    import jax

    from tinynerf import train as trainlib
    from tinynerf.config import Config
    from tinynerf.core.rays import make_k_inv
    from tinynerf.data.poses import SceneData
    from tinynerf.data.rays import RayTable

    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", file=sys.stderr)

    # fresh entropy per process: the remote execution tunnel caches
    # content-identical dispatches across processes, so a deterministic seed
    # can make repeat bench invocations report cache-served (fake) times
    seed = int.from_bytes(os.urandom(4), "little")
    cfg = Config(batch_ray=args.batch, n_coarse=args.coarse,
                 n_fine=args.fine, precision=args.precision,
                 use_pallas=not args.no_pallas,
                 fused_render=args.fused, seed=seed,
                 occ_grid=args.occ, white_bkgd=args.occ,
                 proposal=args.proposal, proposal_enc_l=args.prop_enc_l,
                 prop_field=args.prop_field,
                 fine_field="grid" if args.grid else "mlp",
                 grid_hybrid=args.grid and args.hybrid,
                 prop_grid_hybrid=(args.grid and args.hybrid
                                   and args.prop_hybrid),
                 grid_lookup=args.grid_lookup, grid_pallas=args.grid_pallas)
    if args.grid_res is not None:
        cfg.grid_res = args.grid_res
    elif args.grid and args.hybrid:
        # flagship line resolution: 384 beats 256 (+1.18 dB @20k) and 512
        # at ~1% step cost (VALIDATION.md queue 10)
        cfg.grid_res = 384
    from tinynerf.config import apply_key
    for kv in args.overrides:
        key, _, raw = kv.partition("=")
        apply_key(cfg, key, raw)
    if args.overrides:
        print(f"overrides={args.overrides}", file=sys.stderr)

    # synthetic lego-shaped scene: 16 x 800 x 800 pixel table in HBM
    rng = np.random.default_rng(0)
    n_pics, hw = 16, args.hw
    images = rng.uniform(0, 1, (n_pics, hw, hw, 3)).astype(np.float32)
    pose_rows = np.zeros((n_pics, 17), np.float32)
    focal = 0.5 * hw / np.tan(0.4)
    for i in range(n_pics):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0, 0, 4.0]
        hwf = np.array([[hw], [hw], [focal]], np.float32)
        pose_rows[i] = np.concatenate(
            [np.concatenate([c2w[:3, :4], hwf], axis=1).flatten(), [2.0, 6.0]])
    scene = SceneData(images=images, poses_bounds=pose_rows,
                      height=hw, width=hw, focal=focal)
    table = RayTable(scene)
    k_inv = make_k_inv(hw, hw, focal)

    state = trainlib.init_state(cfg)

    if args.metric == "render":
        # seconds per full 800x800 frame (reference display() unit of work:
        # 1,600 x 400-ray batches per view, nerf.py:503-530)
        import jax
        import jax.numpy as jnp
        from tinynerf import eval as evallib
        frame_fn = evallib.make_frame_fn(cfg, k_inv, hw, hw,
                                         host_chunks=args.host_chunks)
        t0 = time.perf_counter()
        jax.block_until_ready(frame_fn(state.params,
                                       jnp.asarray(pose_rows[0])))  # compile
        print(f"time_to_first_frame={time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        times = []
        for i in range(args.rounds):
            # vary the pose per round — identical dispatches can be served
            # from the remote execution cache and report fake times
            pose_row = jnp.asarray(pose_rows[1 + i % (n_pics - 1)])
            t0 = time.perf_counter()
            jax.block_until_ready(frame_fn(state.params, pose_row))
            times.append(time.perf_counter() - t0)
        sec = min(times)
        print(f"render times={['%.3f' % t for t in times]}", file=sys.stderr)
        out = {
            "metric": "render_800x800_sec_per_frame", "value": round(sec, 3),
            "unit": "s",
            "vs_baseline": round(REF_CPU_RENDER_SEC_PER_FRAME / sec, 2),
            "baseline_basis": "measured_reference_cpu_2184s_per_frame"}
        if args.host_chunks:
            out["mode"] = f"host_chunks_x{args.host_chunks}"
        print(json.dumps(out))
        return

    step = trainlib.make_train_step(cfg, table, k_inv)
    multi = trainlib.make_multi_step(step, args.unroll)

    # warmup / compile
    state, losses = multi(state)
    jax.block_until_ready(losses)

    def timed_rounds(state):
        times = []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            state, losses = multi(state)
            jax.block_until_ready(losses)
            times.append(time.perf_counter() - t0)
        return state, times, losses

    state, times, losses = timed_rounds(state)
    # plausibility guard: ~560 MFLOP/ray fwd+bwd caps any real chip far
    # below 1e6 rays/s — faster readings mean the remote tunnel served a
    # cached execution; retry with a fresh PRNG stream
    for _ in range(2):
        if args.batch * args.unroll / min(times) < 1e6:
            break
        print("implausibly fast round (cache hit?) — retrying",
              file=sys.stderr)
        state = trainlib.init_state(
            cfg, key=jax.random.PRNGKey(
                int.from_bytes(os.urandom(4), "little")))
        state, losses = multi(state)
        jax.block_until_ready(losses)
        state, times, losses = timed_rounds(state)

    best = min(times)
    rays_per_sec = args.batch * args.unroll / best
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 2),
        "baseline_basis": "estimated_reference_gpu_8k_rays_per_sec",
        "vs_cpu_measured": round(rays_per_sec / REF_CPU_TRAIN_RAYS_PER_SEC, 1),
        "config": ((("hybrid_grid_fine+" if args.hybrid else "grid_fine+")
                    if args.grid else "")
                   + ("prop_hybrid+" if cfg.prop_grid_hybrid else "")
                   + (("proposal_grid" if args.prop_field == "grid"
                       else "proposal_coarse") if args.proposal
                      else "reference_shared_net")
                   + ("+" + ",".join(args.overrides)
                      if args.overrides else "")),
    }
    print(f"times={['%.4f' % t for t in times]} "
          f"loss_last={float(np.asarray(losses)[-1]):.4f} "
          f"samples/ray={args.coarse}+{args.fine} batch={args.batch} "
          f"precision={args.precision}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
