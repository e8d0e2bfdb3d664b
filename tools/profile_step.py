"""Capture + summarize a device profile of the production train step.

Runs N steps of the bench workload under ``jax.profiler.trace`` and prints a
per-step breakdown of device time by op (Pallas kernels, XLA fusions,
layout copies), so kernel/tail regressions show up as numbers instead of
bench-level guesswork. This is the tool behind the step decompositions
quoted in CLAUDE.md / VALIDATION.md.

    python tools/profile_step.py [--batch 4096] [--steps 5] [--occ]

Works on the real TPU; on CPU it profiles the (much slower) interpreter
path. The trace directory is left at --out for TensorBoard's profile
plugin.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def summarize(trace_dir: str, n_steps: int, top: int = 18) -> None:
    files = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not files:
        print("no trace captured", file=sys.stderr)
        return
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid", -1), ""):
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    print(f"\ndevice time per step (top {top} ops, {n_steps} steps traced):")
    for name, d in dur.most_common(top):
        print(f"  {d / (n_steps * 1e3):8.3f} ms  x{cnt[name]:4d}  {name[:86]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--coarse", type=int, default=64)
    ap.add_argument("--fine", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--occ", action="store_true")
    ap.add_argument("--proposal", action="store_true")
    ap.add_argument("--grid", action="store_true",
                    help="FINE_FIELD=grid (factorized CP feature grid)")
    ap.add_argument("--grid-pallas", action="store_true",
                    help="fused CP-grid Pallas kernel (GRID_PALLAS)")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="KEY=VALUE",
                    help="override any INI config key (repeatable)")
    ap.add_argument("--out", default="/tmp/tinynerf_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tinynerf import train as trainlib
    from tinynerf.config import Config
    from tinynerf.core.rays import make_k_inv
    from tinynerf.data.poses import SceneData
    from tinynerf.data.rays import RayTable

    seed = int.from_bytes(os.urandom(4), "little")
    rng = np.random.default_rng(1)
    n_pics, hw = 4, 400
    images = rng.uniform(0, 1, (n_pics, hw, hw, 3)).astype(np.float32)
    pose_rows = np.zeros((n_pics, 17), np.float32)
    focal = 0.5 * hw / np.tan(0.4)
    for i in range(n_pics):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0, 0, 4.0]
        hwf = np.array([[hw], [hw], [focal]], np.float32)
        pose_rows[i] = np.concatenate(
            [np.concatenate([c2w[:3, :4], hwf], 1).flatten(), [2.0, 6.0]])

    cfg = Config(batch_ray=args.batch, n_coarse=args.coarse,
                 n_fine=args.fine, precision=args.precision, seed=seed,
                 occ_grid=args.occ, white_bkgd=args.occ,
                 occ_update_every=10 ** 9, proposal=args.proposal,
                 fine_field="grid" if args.grid else "mlp",
                 grid_pallas=args.grid_pallas)
    from tinynerf.config import apply_key
    for kv in args.overrides:
        key, _, raw = kv.partition("=")
        apply_key(cfg, key, raw)
    table = RayTable(SceneData(images=images, poses_bounds=pose_rows,
                               height=hw, width=hw, focal=focal))
    step = trainlib.make_train_step(cfg, table, make_k_inv(hw, hw, focal))
    state = trainlib.init_state(cfg)
    state, m = step(state)
    jax.block_until_ready(m["loss"])

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = step(state)
        jax.block_until_ready(m["loss"])
    summarize(args.out, args.steps)


if __name__ == "__main__":
    main()
