"""Child process for the multi-process (multi-host analog) harness.

Spawned by ``tests/test_multiprocess.py`` (and ``__graft_entry__.
dryrun_multiprocess``) as N coordinated processes that join one
``jax.distributed`` job over localhost — the DCN-join path of SURVEY.md
§2.17 exercised for real, not as a single-process no-op. Each process owns
``--local-devices`` fake CPU devices; the global mesh spans all processes,
so the pjit train step's gradient psum and the sharded eval render cross
the process boundary exactly as they would cross hosts on a v5e pod.

Writes ``<out>/result_<pid>.json`` with the loss stream, test PSNR and a
parameter digest for the parent to compare across processes and against a
single-process run of identical configuration.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--out", required=True, help="per-process artifact dir")
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--step", type=int, default=2)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--family", default="mlp", choices=["mlp", "hybrid"],
                    help="mlp = reference-semantics shared net; hybrid = "
                    "the flagship stack (grid fine + hybrid sigma nets + "
                    "grid proposal + per-leaf GRID_LR_MULT + VAL_METRICS) "
                    "at tiny geometry")
    args = ap.parse_args()

    # CPU backend with fake devices, BEFORE any backend initialization.
    # (The image's site hook pins jax_platforms=axon regardless of env vars,
    # so this must go through the config API — same dance as conftest.py.)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)

    from tinynerf.parallel import distributed as dist

    multi = dist.maybe_initialize()  # resolves COORDINATOR_ADDRESS etc.
    info = dist.process_info()
    expected = int(os.environ.get("NUM_PROCESSES", "1"))
    assert info["process_count"] == expected, info
    assert multi == (expected > 1)
    assert info["global_devices"] == expected * args.local_devices, info

    import numpy as np
    from tinynerf.config import Config
    from tinynerf.runner import Runner

    extra = {}
    if args.family == "hybrid":
        # the FLAGSHIP architecture at tiny geometry: {net, prop} param
        # pair, hybrid sigma nets on both grids, per-leaf GRID_LR_MULT
        # Adam scaling, and the held-out VAL_METRICS series — everything
        # VERDICT r3 #5/#6 wants proven across a real process boundary
        extra = dict(fine_field="grid", grid_hybrid=True, grid_res=17,
                     # multi-resolution pyramid with a non-unit per-level LR:
                     # the GRID_LEVEL_LR Adam scaling must survive the psum +
                     # replicated-placement path exactly like GRID_LR_MULT
                     # (res 17 so the 17+9 lattices nest)
                     grid_levels=2, grid_level_lr=0.5,
                     grid_comp_density=4, grid_comp_app=4,
                     grid_decoder_width=8, grid_extent=6.0,
                     proposal=True, prop_field="grid", prop_grid_hybrid=True,
                     prop_grid_res=8, prop_grid_comp_density=4,
                     prop_grid_comp_app=4, prop_grid_decoder_width=8,
                     val_metrics=True)
    cfg = Config(
        img_dir=args.scene,
        results_path=os.path.join(args.out, "results"),
        ckpt_path=os.path.join(args.out, "ckpt"),
        log_dir=os.path.join(args.out, "runs"),
        # low LR on purpose: the training dynamics are fp-chaotic (CLAUDE.md
        # gradient WARNING), and this harness compares cross-process psum
        # fp-reassociation against the single-process reduction order —
        # at 5e-3 a 1e-6 reassociation delta amplifies 4x per step
        total_iter=args.iters, step=args.step, batch_ray=args.batch,
        n_coarse=4, n_fine=4, learning=5e-4, use_pallas=False,
        render_chunk=8 * args.local_devices * expected, **extra)

    runner = Runner(cfg)
    losses = []
    val_psnrs = []

    # wrap the logger to capture the loss stream on every process
    real_log = runner.logger.log

    def capture(iteration, scalars):
        for k, v in scalars.items():
            if k.startswith("loss/"):
                losses.append((iteration, float(np.asarray(v))))
            elif k == "psnr/val":
                val_psnrs.append((iteration, float(np.asarray(v))))
        real_log(iteration, scalars)

    runner.logger.log = capture
    runner.train("train")
    psnr = runner.display(max_views=1)
    # BASELINE stretch config 5 across REAL process boundaries: res-scaled
    # camera-path video render sharded over the global mesh (frames leave
    # the jit replicated; only process 0 writes the video)
    runner.render_path_video(n_views=2, res_scale=2.0)

    leaves = jax.tree_util.tree_leaves(jax.device_get(runner.state.params))
    digest = hashlib.sha256(
        b"".join(np.ascontiguousarray(l).tobytes() for l in leaves)
    ).hexdigest()

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"result_{info['process_index']}.json"),
              "w") as fh:
        json.dump({"process_index": info["process_index"],
                   "process_count": info["process_count"],
                   "global_devices": info["global_devices"],
                   "losses": sorted(losses),
                   "val_psnrs": sorted(val_psnrs),
                   "psnr": float(psnr),
                   "param_digest": digest}, fh)
    print(f"[child {info['process_index']}] done: psnr={psnr:.2f}")


if __name__ == "__main__":
    main()
