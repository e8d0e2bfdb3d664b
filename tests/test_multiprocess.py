"""TRUE multi-process execution: 2 coordinated jax.distributed processes.

SURVEY.md §2.17 promises multi-host training joined via ``jax.distributed``
over DCN. Faking 8 devices in ONE process (test_parallel.py) exercises the
mesh math but not the process boundary; this harness spawns two real
processes (4 fake CPU devices each) that join one job over localhost —
cross-process gradient psum, replicated global placement of params/tables,
process-0-gated artifact writes, and addressability-safe eval assembly all
run for real.

Asserts, against a single-process 8-device run of the identical config:
- per-iteration loss streams match (same global mesh semantics),
- final parameters are identical across the two processes (replicated
  state never diverges) and match the single-process run,
- ONLY process 0 writes checkpoints/previews/videos/metric logs.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(_REPO, "tests", "multiprocess_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(scene: str, out: str, pid: int, nproc: int, port: int,
           local_devices: int, family: str = "mlp") -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets device count via the config API
    if nproc > 1:
        env.update(COORDINATOR_ADDRESS=f"localhost:{port}",
                   NUM_PROCESSES=str(nproc), PROCESS_ID=str(pid))
    else:
        for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
            env.pop(k, None)
        env["NUM_PROCESSES"] = "1"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, CHILD, "--scene", scene, "--out", out,
         "--local-devices", str(local_devices),
         "--iters", "4", "--step", "1", "--family", family],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _first_step_params(out_dir: str) -> dict:
    """Load the iter-0 checkpoint (params after exactly ONE optimizer step)."""
    import glob as globlib
    from tinynerf import ckpt

    paths = globlib.glob(os.path.join(out_dir, "ckpt", "*_0.npz"))
    assert len(paths) == 1, paths
    _it, params, _opt, _key, _occ = ckpt.load_checkpoint_full(paths[0])
    return params


def _wait_all(procs, names, timeout: int = 900):
    """Drain every child's pipe CONCURRENTLY — sequential communicate can
    deadlock against a child blocked writing to a full pipe while the
    drained child waits on it inside a collective."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(len(procs)) as pool:
        outs = list(pool.map(lambda p: p.communicate(timeout=timeout)[0],
                             procs))
    for p, name, out in zip(procs, names, outs):
        assert p.returncode == 0, f"{name} failed:\n{out[-4000:]}"
    return outs


def _load(out_dir: str, pid: int) -> dict:
    with open(os.path.join(out_dir, f"result_{pid}.json")) as fh:
        return json.load(fh)


def _artifact_files(out_dir: str):
    found = []
    for sub in ("ckpt", "results", "runs"):
        root = os.path.join(out_dir, sub)
        for r, _dirs, files in os.walk(root):
            found += [os.path.join(r, f) for f in files]
    return found


def _spawn_pair(sync_scene_dir, out0, out1, family="mlp"):
    """Launch + drain the 2-process job; ONE retry when the failure is the
    gloo TCP context timing out at connect — an infrastructure symptom of
    this image's single CPU core being oversubscribed (other test
    processes starving the peer), not a property under test."""
    import shutil

    # Coordination-infrastructure symptoms of this image's single CPU core
    # being oversubscribed (other test processes starving a peer past a
    # connect/barrier deadline) — not properties under test.
    _INFRA = ("Gloo context initialization failed", "Timed out",
              "timed out", "Connection refused", "DEADLINE_EXCEEDED")

    for attempt in (1, 2):
        port = _free_port()
        p1 = _spawn(sync_scene_dir, out1, 1, 2, port, local_devices=4,
                    family=family)
        p0 = _spawn(sync_scene_dir, out0, 0, 2, port, local_devices=4,
                    family=family)
        try:
            return _wait_all([p0, p1], ["proc0", "proc1"])
        except (AssertionError, subprocess.TimeoutExpired) as exc:
            infra = (isinstance(exc, subprocess.TimeoutExpired)
                     or any(s in str(exc) for s in _INFRA))
            if attempt == 2 or not infra:
                raise
            for p in (p0, p1):
                if p.poll() is None:
                    p.kill()
                    p.wait()
            for d in (out0, out1):
                shutil.rmtree(d, ignore_errors=True)


def test_two_process_train_matches_single_process(sync_scene_dir, tmp_path):
    out0, out1 = str(tmp_path / "proc0"), str(tmp_path / "proc1")
    _spawn_pair(sync_scene_dir, out0, out1)

    r0, r1 = _load(out0, 0), _load(out1, 1)
    assert r0["process_count"] == r1["process_count"] == 2
    assert r0["global_devices"] == 8

    # replicated state never diverges between the two processes
    assert r0["param_digest"] == r1["param_digest"]
    np.testing.assert_allclose(r0["psnr"], r1["psnr"], rtol=1e-6)

    # single-process, same 8-device global mesh, same config/seed
    outs = str(tmp_path / "single")
    ps = _spawn(sync_scene_dir, outs, 0, 1, _free_port(), local_devices=8)
    _wait_all([ps], ["single"])
    rs = _load(outs, 0)
    assert rs["global_devices"] == 8

    l_multi = np.asarray([v for _, v in r0["losses"]])
    l_single = np.asarray([v for _, v in rs["losses"]])
    assert l_multi.shape == l_single.shape and l_multi.size > 0
    # step-0 loss (initial params, pure forward) must match tightly —
    # identical data, init and graph semantics across the process split
    np.testing.assert_allclose(l_multi[0], l_single[0], rtol=1e-6)
    # params after exactly ONE optimizer step: elementwise-equal up to the
    # cross-process psum's fp reassociation (gloo ring vs in-process order).
    # Multi-step LOSS trajectories are deliberately not compared — the
    # dynamics are fp-chaotic (CLAUDE.md gradient WARNING: kinked
    # nonlinearities + discrete resampler bins amplify a 1e-7 reduction
    # delta by ~1e3 per step), so one step is the sound comparison window.
    p_multi = _first_step_params(out0)
    p_single = _first_step_params(outs)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(p_multi),
                    jax.tree_util.tree_leaves(p_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    assert np.isfinite(l_multi).all() and np.isfinite(r0["psnr"])

    # process-0 hygiene: ONLY process 0 wrote artifacts
    files0 = _artifact_files(out0)
    assert any("ckpt" in f for f in files0)
    assert any(f.endswith((".jpg",)) for f in files0)
    assert any(f.endswith((".mp4", ".gif")) for f in files0)
    assert any(f.endswith("metrics.jsonl") for f in files0)
    # the res_scale=2 sharded path video (BASELINE stretch config 5,
    # rendered over the cross-process mesh) also lands on process 0 only
    assert any("_path_" in f and f.endswith((".mp4", ".gif"))
               for f in files0)
    assert _artifact_files(out1) == []


def test_two_process_flagship(sync_scene_dir, tmp_path):
    """The FLAGSHIP stack (grid fine + hybrid sigma nets + grid proposal +
    per-leaf GRID_LR_MULT Adam + VAL_METRICS) across a REAL process
    boundary (VERDICT r3 #5/#6): the {net, prop} pytree psum, the LR-scaled
    update and the lines tables must stay replicated, match a
    single-process run after one step, and the held-out val-PSNR series
    must be computed by BOTH processes (global-mesh jit) but logged by
    process 0 only."""
    out0, out1 = str(tmp_path / "proc0"), str(tmp_path / "proc1")
    _spawn_pair(sync_scene_dir, out0, out1, family="hybrid")

    r0, r1 = _load(out0, 0), _load(out1, 1)
    assert r0["global_devices"] == 8
    # replicated {net, prop} state never diverges between processes
    assert r0["param_digest"] == r1["param_digest"]
    np.testing.assert_allclose(r0["psnr"], r1["psnr"], rtol=1e-6)

    # VAL_METRICS on a pod run: process 0 logged the held-out series
    # (one value per STEP boundary); process 1 entered the same jit
    # (the run would deadlock otherwise) but logged nothing
    assert len(r0["val_psnrs"]) >= 1
    assert all(np.isfinite(v) for _, v in r0["val_psnrs"])
    assert r1["val_psnrs"] == []

    # single-process run, same 8-device global mesh, same config/seed
    outs = str(tmp_path / "single")
    ps = _spawn(sync_scene_dir, outs, 0, 1, _free_port(), local_devices=8,
                family="hybrid")
    _wait_all([ps], ["single"])
    rs = _load(outs, 0)
    l_multi = np.asarray([v for _, v in r0["losses"]])
    l_single = np.asarray([v for _, v in rs["losses"]])
    np.testing.assert_allclose(l_multi[0], l_single[0], rtol=1e-6)
    # params after exactly ONE LR-scaled Adam step across the process
    # split (gloo psum fp reassociation bounds the tolerance — see
    # test_two_process_train_matches_single_process)
    p_multi = _first_step_params(out0)
    p_single = _first_step_params(outs)
    assert "prop" in p_multi and "lines" in p_multi["net"]
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(p_multi),
                    jax.tree_util.tree_leaves(p_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    # val series matches the single-process run's at step 0 (identical
    # params + identical fixed batch before any psum reassociation)
    if rs["val_psnrs"] and r0["val_psnrs"]:
        np.testing.assert_allclose(r0["val_psnrs"][0][1],
                                   rs["val_psnrs"][0][1], rtol=1e-5)
    # artifact hygiene holds for the flagship too
    assert _artifact_files(out1) == []
