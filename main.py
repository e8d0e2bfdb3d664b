"""tinynerf CLI — same surface as the reference: ``python main.py --conf=lego``.

Reads ``conf/<name>.ini`` (section name = scene name, reference
``main.py:10-34``), then trains and renders the test-split video — the
intended reference flow ``trainer("train"); display()`` (the shipped
reference crashes on both calls, SURVEY.md Q1; fixed here per decision D1).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser(description="tinynerf (TPU) argument parser.")
    parser.add_argument("--conf", type=str, default="lego",
                        help="scene name under ./conf/ or a path to an .ini")
    parser.add_argument("--mode", type=str, default="all",
                        choices=["all", "train", "display", "path"])
    parser.add_argument("--iters", type=int, default=None,
                        help="override TOTAL_ITER")
    parser.add_argument("--path-views", type=int, default=120,
                        help="number of frames for --mode=path")
    parser.add_argument("--path-scale", type=float, default=1.0,
                        help="resolution multiplier for --mode=path")
    parser.add_argument("--depth", action="store_true",
                        help="also write per-view depth + opacity maps")
    parser.add_argument("--host-chunks", nargs="?", const=1, default=0,
                        type=int, metavar="K",
                        help="render frames via the host-chunk loop "
                             "(seconds to first frame; avoids the one-time "
                             "whole-frame XLA compile under PROPOSAL); "
                             "optional K folds K chunks per dispatch")
    args = parser.parse_args()

    if os.environ.get("TINYNERF_FORCE_CPU"):
        # smoke runs without TPU access: the image's site hook pins
        # jax_platforms=axon regardless of JAX_PLATFORMS, so the config
        # API is the only reliable override (tests/conftest.py does the
        # same for the suite)
        import jax
        jax.config.update("jax_platforms", "cpu")

    from tinynerf.config import load_config
    from tinynerf.parallel.distributed import maybe_initialize
    from tinynerf.runner import Runner

    maybe_initialize()  # multi-host (pod) join over DCN; no-op single-process
    cfg = load_config(args.conf)
    if args.iters is not None:
        cfg.total_iter = args.iters
    if args.mode in ("display", "path"):
        # render-only modes need trained weights: resume the latest
        # checkpoint regardless of the INI's CONTINUE flag (without this a
        # display-only invocation silently renders from FRESH weights)
        cfg.continue_ = True

    runner = Runner(cfg)
    if args.mode in ("display", "path") and runner.last_iter < 0:
        raise SystemExit(
            f"--mode={args.mode} needs trained weights but no checkpoint was "
            f"found under {cfg.ckpt_path!r} — refusing to render from fresh "
            f"weights. Train first (--mode=train) or point CKPT_PATH at an "
            f"existing run.")
    if args.mode in ("all", "train"):
        runner.train("train")
    if args.mode in ("all", "display"):
        runner.display(depth=args.depth, host_chunks=args.host_chunks)
    if args.mode == "path":
        runner.render_path_video(n_views=args.path_views,
                                 res_scale=args.path_scale,
                                 host_chunks=args.host_chunks)


if __name__ == "__main__":
    main()
