"""One-command reproduction of the VALIDATION.md convergence protocol.

Generates the raytraced-spheres capture (tools/make_synthetic_scene.py) if
absent, writes the protocol INI for a named config family, runs the full
CLI (train + test-split render + PSNR/SSIM), and emits ONE JSON line with
the scores and sustained throughput — the row format of VALIDATION.md's
tables. The reference publishes no numbers (BASELINE.md), so this harness
IS the evidence chain: every table row in VALIDATION.md is a `validate.py`
invocation away from re-measurement.

Families (--family):
  reference  reference semantics (shared coarse/fine net, no extras)
  proposal   PROPOSAL coarse field (grid prop), fine MLP
  full       MLP-fine stack: PROPOSAL + OCC_GRID + WHITE_BKGD   [default]
  grid       all-grid: FINE_FIELD=grid full stack (lego_grid.ini recipe)
  hybrid     flagship: grid stack + GRID_HYBRID density MLP
             (bench.py default since late round 3)
  u360       unbounded-360 stack (CONTRACT+LINDISP+hybrid grid) — pair
             with --scene-format 360 (outward ring capture)
  u360_nowarp / u360_bigbox
             warp ablation / naive-huge-box baselines for u360
  llff_hybrid / llff_full
             forward-facing (fern-style) path: flagship / MLP-fine stack
             on the LLFF capture — pair with --scene-format llff

Usage:
    python tools/validate.py --out /tmp/val --iters 20000
    python tools/validate.py --family grid --iters 20000 --extra GRID_RES=128
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = """[spheres]
IMG_DIR = {scene}/
RESULTS_PATH = {out}/results/
CKPT_PATH = {out}/ckpt/
LOG_DIR = {out}/runs/
TOTAL_ITER = {iters}
BATCH_RAY = {batch}
LEARNING = 5e-4
N_COARSE = 64
N_FINE = {n_fine}
DATA_TYPE = sync
STEP = {step}
DECAY_END = 200000
SCHED = EXP
CONTINUE = False
PRECISION = bf16
"""

FAMILY = {
    "reference": "",
    "proposal": "PROPOSAL = True\n",
    "full": ("PROPOSAL = True\nWHITE_BKGD = True\nOCC_GRID = True\n"
             "OCC_RES = 64\nOCC_EXTENT = 1.5\nOCC_THRESH = 0.01\n"
             "OCC_UPDATE_EVERY = 256\nOCC_SUBSET = 0.125\n"),
    "grid": ("PROPOSAL = True\nWHITE_BKGD = True\nOCC_GRID = True\n"
             "OCC_RES = 64\nOCC_EXTENT = 1.5\nOCC_THRESH = 0.01\n"
             "OCC_UPDATE_EVERY = 256\nOCC_SUBSET = 0.125\n"
             "FINE_FIELD = grid\nGRID_EXTENT = 1.5\nGRID_RES = 256\n"
             "GRID_COMP_DENSITY = 64\nGRID_COMP_APP = 64\n"
             "GRID_DECODER_WIDTH = 128\nGRID_LR_MULT = 20\nGRID_TV = 0.1\n"),
}
# flagship since late round 3: the grid stack + the NGP-style density MLP
# (GRID_HYBRID) on BOTH fields — measured strictly dominant over the plain
# CP sum and the MLP fine net, and the proposal-side MLP adds +1.16 dB
# @20k / +2.10 dB @100k at <=1.5% step cost (VALIDATION.md)
FAMILY["hybrid"] = (FAMILY["grid"] + "GRID_HYBRID = True\n"
                    + "PROP_GRID_HYBRID = True\n"
                    # res 384 > 256 (+1.18 dB @20k, +0.61 @100k) > 512
                    # at ~1-2% step cost (VALIDATION.md queue 10)
                    + "GRID_RES = 384\n")

# the convergence-quality preset (conf/lego_levels.ini): flagship + the
# UNFOLDED GRID_LEVELS=2 pyramid at 384+192. The non-nested lattices are
# load-bearing: summing two independently-interpolated piecewise-linear
# levels yields ~576 distinct breakpoints/axis, and that effective
# refinement is where most of the preset's converged +0.39 dB lives —
# the folded nested variant (385+193, function-identical to its unfolded
# form) soaks to only 40.88, flagship-level (VALIDATION.md round 5).
FAMILY["levels"] = FAMILY["hybrid"] + "GRID_LEVELS = 2\n"

# --- unbounded-360 protocol (VERDICT r3 #2): pair with --scene-format 360.
# Hybrid-grid stack WITHOUT the occupancy grid (its bounded extent boxes
# the origin, not this scene's unbounded content) on the outward ring
# capture: near spheres at r~2 through an environment shell at r=60.
# u360 = full CONTRACT+LINDISP warp, grid spanning the radius-2
# contraction ball; u360_nowarp ablates ONLY the warp (same capacity —
# the bounded field clamps past r=2); u360_bigbox is the naive "make the
# box huge" fix (linear march + extent 80, resolution/unit collapses).
_U360_BASE = ("PROPOSAL = True\nFINE_FIELD = grid\nGRID_HYBRID = True\n"
              "PROP_GRID_HYBRID = True\nGRID_RES = 384\n"
              "GRID_COMP_DENSITY = 64\nGRID_COMP_APP = 64\n"
              "GRID_DECODER_WIDTH = 128\nGRID_LR_MULT = 20\nGRID_TV = 0.1\n"
              # NEAR sets the lindisp anchor: it must sit just inside the
              # nearest content (~1.7 world units on the generated capture)
              # or disparity spacing wastes most of the march in empty
              # space (near=0.1 put HALF the samples inside r<0.2 —
              # measured -1.3 dB on the v1 capture)
              "STRATIFIED = True\nNEAR = 1.0\nFAR = 80\n")
FAMILY["u360"] = (_U360_BASE
                  + "CONTRACT = True\nLINDISP = True\nGRID_EXTENT = 2.0\n")
# + contracted occupancy grid (cells in the radius-2 ball, disparity march)
FAMILY["u360_occ"] = (FAMILY["u360"]
                      + "OCC_GRID = True\nOCC_RES = 64\nWHITE_BKGD = True\n"
                      + "OCC_UPDATE_EVERY = 256\nOCC_SUBSET = 0.125\n")
FAMILY["u360_nowarp"] = _U360_BASE + "GRID_EXTENT = 2.0\n"
FAMILY["u360_bigbox"] = _U360_BASE + "GRID_EXTENT = 80.0\n"

# --- forward-facing (fern-style) protocol: pair with --scene-format llff.
# The reference's second headline scene is LLFF fern (conf/fern.ini):
# poses_bounds.npy ingest, per-ray near/far, raw-unit marching, identical
# train/val/test splits (Q10 — test PSNR is training-view PSNR, exactly
# the reference's evidence regime). llff_hybrid runs the flagship family
# on that path; llff_full is the MLP-fine stack control (round 1 only
# ever measured the plain MLP at 80x80/4k). The generated capture's
# spheres sit inside r~1.4, so the sync families' extent-1.5 grids and
# occ box carry over unchanged; WHITE_BKGD matches the white-composited
# LLFF pngs.
FAMILY["llff_hybrid"] = FAMILY["hybrid"] + "DATA_TYPE = llff\n"
FAMILY["llff_full"] = FAMILY["full"] + "DATA_TYPE = llff\n"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", choices=sorted(FAMILY), default="full")
    parser.add_argument("--out", type=str, default="/tmp/tinynerf_val")
    parser.add_argument("--scene", type=str, default="/tmp/spheres100",
                        help="capture dir (generated if absent)")
    parser.add_argument("--hw", type=int, default=100,
                        help="capture resolution (protocol: 100)")
    parser.add_argument("--views", type=int, default=100,
                        help="training views (protocol: 100)")
    parser.add_argument("--iters", type=int, default=20000)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--n-fine", type=int, default=128)
    parser.add_argument("--extra", action="append", default=[],
                        metavar="KEY=VALUE", help="extra INI keys (repeat)")
    parser.add_argument("--scene-format", default="sync",
                        choices=["sync", "360", "llff", "texture"],
                        help="capture generator: inward spheres (protocol "
                             "default), the outward unbounded-360 ring "
                             "(u360* families), the forward-facing LLFF "
                             "layout (llff_* families), or the "
                             "high-frequency texture/specular/thin-rod "
                             "scene (scene family #2 — pair with the sync "
                             "families, e.g. --scene /tmp/texture100)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (smoke runs only — "
                             "protocol numbers are TPU)")
    args = parser.parse_args()

    if not os.path.isdir(args.scene):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "make_synthetic_scene.py"),
             args.scene, "--hw", str(args.hw), "--views", str(args.views),
             "--format", args.scene_format],
            check=True)

    # merge base <- family <- --extra as key/value pairs (later wins), so
    # overrides never produce duplicate INI keys (configparser is strict)
    pairs: dict = {}
    base = BASE.format(scene=args.scene.rstrip("/"), out=args.out,
                       iters=args.iters, batch=args.batch,
                       n_fine=args.n_fine, step=min(2000, args.iters))
    for line in (base + FAMILY[args.family]).splitlines():
        if "=" in line:
            key, _, value = line.partition("=")
            pairs[key.strip()] = value.strip()
    for kv in args.extra:
        key, _, value = kv.partition("=")
        pairs[key.strip()] = value.strip()
    ini = "[spheres]\n" + "".join(f"{k} = {v}\n" for k, v in pairs.items())
    os.makedirs(args.out, exist_ok=True)
    ini_path = os.path.join(args.out, "val.ini")
    with open(ini_path, "w") as fh:
        fh.write(ini)

    cmd = [sys.executable, os.path.join(REPO, "main.py"),
           "--conf", ini_path]
    env = dict(os.environ)
    if args.cpu:
        env["TINYNERF_FORCE_CPU"] = "1"  # honored by main.py
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    rays = []
    psnr = ssim = None
    log_path = os.path.join(args.out, "train.log")
    with open(log_path, "w") as logf:
        for line in proc.stdout:
            logf.write(line)
            sys.stderr.write(line)
            m = re.search(r"\[RAYS/S\] ([\d,]+)", line)
            if m:
                rays.append(float(m.group(1).replace(",", "")))
            m = re.search(r"Test PSNR: ([\d.]+) dB .*\(SSIM ([\d.]+)\)", line)
            if m:
                psnr, ssim = float(m.group(1)), float(m.group(2))
    rc = proc.wait()
    if rc != 0:
        sys.exit(f"training run failed (rc {rc}); log: {log_path}")

    # sustained = median of the per-STEP meter after warmup (first window
    # carries the compile)
    sustained = sorted(rays[1:])[len(rays[1:]) // 2] if len(rays) > 1 else (
        rays[0] if rays else None)
    print(json.dumps({
        "family": args.family, "iters": args.iters,
        "psnr_db": psnr, "ssim": ssim,
        "sustained_rays_per_sec": sustained,
        "wall_s": round(time.time() - t0, 1),
        "ini": ini_path}))


if __name__ == "__main__":
    main()
