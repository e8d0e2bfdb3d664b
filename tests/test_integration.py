"""End-to-end: Runner trains on a generated scene, PSNR improves, resume works
(SURVEY.md §4 integration strategy)."""

import os

import numpy as np
import pytest

from tinynerf import ckpt
from tinynerf.config import Config
from tinynerf.runner import Runner


@pytest.fixture()
def cfg(sync_scene_dir, tmp_path):
    return Config(
        img_dir=sync_scene_dir, results_path=str(tmp_path / "results"),
        ckpt_path=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
        total_iter=60, step=30, batch_ray=64, n_coarse=8, n_fine=8,
        learning=5e-3, decay_end=10_000, use_pallas=False, render_chunk=72)


def test_runner_end_to_end(cfg):
    runner = Runner(cfg)
    frames0 = __import__("tinynerf.eval", fromlist=["x"]).render_test_set(
        cfg, runner.state.params, runner.test_table, runner.k_inv,
        "pre", 0, save=False, max_views=1)
    psnr_before = __import__("tinynerf.eval", fromlist=["x"]).test_psnr(
        frames0, runner.test_table)

    runner.train("train")
    assert int(runner.state.iteration) == cfg.total_iter

    # checkpoints + preview written at cadence
    assert ckpt.find_latest(cfg.ckpt_path) is not None
    jpgs = [f for f in os.listdir(cfg.results_path) if f.endswith(".jpg")]
    assert jpgs

    score = runner.display(max_views=1)
    assert np.isfinite(score)
    # positive-improvement gate: 60 deterministic CPU iters on this scene
    # gain +0.32 dB (fixed seeds -> the delta is reproducible); assert half
    # of that so training must actually LEARN, not merely not-hurt
    assert score > psnr_before + 0.15

    # metrics were logged
    log_dirs = os.listdir(cfg.log_dir)
    assert log_dirs
    jsonl = os.path.join(cfg.log_dir, log_dirs[0], "metrics.jsonl")
    assert os.path.getsize(jsonl) > 0


def test_runner_resume(cfg):
    runner = Runner(cfg)
    runner.train("train")
    params_end = runner.state.params

    cfg.continue_ = True
    cfg.total_iter = 70
    resumed = Runner(cfg)
    # resumed from the iter-59 checkpoint
    assert int(resumed.state.iteration) == 60
    np.testing.assert_allclose(
        np.asarray(resumed.state.params["trunk_0"]["w"]),
        np.asarray(params_end["trunk_0"]["w"]), atol=1e-6)
    assert int(resumed.state.opt.count) > 0  # Adam state restored
    resumed.train("train")
    assert int(resumed.state.iteration) == 70


def test_exact_resume_matches_uninterrupted(sync_scene_dir, tmp_path):
    """Resume-from-checkpoint must continue the PRNG sample stream exactly:
    60 iters + resume to 120 == one uninterrupted 120-iter run."""
    def make_cfg(sub, total):
        return Config(
            img_dir=sync_scene_dir, results_path=str(tmp_path / sub / "r"),
            ckpt_path=str(tmp_path / sub / "c"), log_dir=str(tmp_path / sub / "l"),
            total_iter=total, step=30, batch_ray=32, n_coarse=4, n_fine=4,
            learning=5e-3, use_pallas=False)

    a = Runner(make_cfg("a", 60))
    a.train("train")
    cfg_resume = make_cfg("a", 120)
    cfg_resume.continue_ = True
    a2 = Runner(cfg_resume)
    assert int(a2.state.iteration) == 60
    a2.train("train")

    b = Runner(make_cfg("b", 120))
    b.train("train")

    for pa, pb in zip(
            __import__("jax").tree_util.tree_leaves(a2.state.params),
            __import__("jax").tree_util.tree_leaves(b.state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)


def test_cli_main_on_8_device_mesh(sync_scene_dir, tmp_path, monkeypatch):
    """Pod-path smoke through the REAL CLI: ``main.py`` with MESH_SHAPE=8 on
    the 8 fake CPU devices — config parse -> Runner -> pjit ray-DP train ->
    sharded display, end to end (VERDICT r1 item 8)."""
    import sys
    import main as climain

    ini = tmp_path / "mesh_scene.ini"
    ini.write_text(
        "[mesh_scene]\n"
        f"IMG_DIR = {sync_scene_dir}/\n"
        f"RESULTS_PATH = {tmp_path}/results/\n"
        f"CKPT_PATH = {tmp_path}/ckpt/\n"
        f"LOG_DIR = {tmp_path}/runs/\n"
        "TOTAL_ITER = 20\nSTEP = 10\nBATCH_RAY = 64\n"
        "N_COARSE = 4\nN_FINE = 4\nDATA_TYPE = sync\nLEARNING = 5e-3\n"
        "DECAY_END = 10000\nSCHED = EXP\nCONTINUE = False\n"
        "RENDER_CHUNK = 72\nMESH_SHAPE = 8\nUSE_PALLAS = False\n")
    monkeypatch.setattr(sys, "argv", ["main.py", f"--conf={ini}"])
    climain.main()
    # checkpoints + rendered views written through the sharded path
    assert ckpt.find_latest(str(tmp_path / "ckpt")) is not None
    out = [f for f in os.listdir(tmp_path / "results") if f.endswith(".jpg")]
    assert out


def test_cli_display_mode_resumes_and_writes_depth(sync_scene_dir, tmp_path,
                                                   monkeypatch, capsys):
    """``--mode=display`` must render from the latest checkpoint even when
    the INI says CONTINUE=False (it used to silently render from FRESH
    weights), and ``--depth`` writes per-view depth + opacity maps."""
    import sys
    import main as climain

    ini = tmp_path / "disp_scene.ini"
    ini.write_text(
        "[disp_scene]\n"
        f"IMG_DIR = {sync_scene_dir}/\n"
        f"RESULTS_PATH = {tmp_path}/results/\n"
        f"CKPT_PATH = {tmp_path}/ckpt/\n"
        f"LOG_DIR = {tmp_path}/runs/\n"
        "TOTAL_ITER = 10\nSTEP = 10\nBATCH_RAY = 32\n"
        "N_COARSE = 4\nN_FINE = 4\nDATA_TYPE = sync\nLEARNING = 5e-3\n"
        "DECAY_END = 10000\nSCHED = EXP\nCONTINUE = False\n"
        "RENDER_CHUNK = 72\nUSE_PALLAS = False\n")
    monkeypatch.setattr(sys, "argv", ["main.py", f"--conf={ini}",
                                      "--mode=train"])
    climain.main()
    monkeypatch.setattr(sys, "argv", ["main.py", f"--conf={ini}",
                                      "--mode=display", "--depth"])
    climain.main()
    assert "Resumed from" in capsys.readouterr().out
    deep = [f for root, _, fs in os.walk(tmp_path / "results")
            for f in fs if f.endswith("_depth.jpg")]
    accs = [f for root, _, fs in os.walk(tmp_path / "results")
            for f in fs if f.endswith("_acc.jpg")]
    assert deep and accs


def test_runner_val_mode_runs_one_full_epoch(cfg):
    """Reference ``trainer("val")`` runs ONE DataLoader epoch over the val
    split (nerf.py:498-499): num_pix // batch shuffled without-replacement
    batches, remainder dropped."""
    runner = Runner(cfg)
    start = int(runner.state.iteration)
    runner.train("val")
    expected = runner.val_table.num_pix // cfg.batch_ray
    assert expected > 0  # fixture sanity: the epoch is non-empty
    assert int(runner.state.iteration) == start + expected


def test_indexed_step_visits_given_pixels(sync_scene_dir):
    """The epoch step trains on exactly the pixels whose indices it is
    handed (without-replacement semantics are the caller's permutation)."""
    import jax
    import jax.numpy as jnp
    from tinynerf import train as trainlib
    from tinynerf.core.rays import make_k_inv
    from tinynerf.data.poses import load_scene
    from tinynerf.data.rays import RayTable

    cfg = Config(batch_ray=8, n_coarse=4, n_fine=4, use_pallas=False)
    table = RayTable(load_scene(sync_scene_dir, "sync", "train"))
    k_inv = make_k_inv(table.height, table.width, table.focal)
    step = trainlib.make_indexed_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    idx = jnp.arange(16, 24, dtype=jnp.int32)
    state, metrics = step(state, idx)
    np.testing.assert_array_equal(
        np.asarray(metrics["rows"]),
        np.asarray(idx % (table.height * table.width)) // table.width)
    np.testing.assert_array_equal(np.asarray(metrics["pic"]),
                                  np.asarray(idx) // table.pic_size)
    assert np.isfinite(float(metrics["loss"]))


def test_val_metrics_logged_during_training(cfg, capsys):
    """VAL_METRICS: held-out val-batch PSNR printed + logged at the STEP
    cadence, on the SAME fixed ray batch each boundary (comparable series)."""
    import json

    cfg.val_metrics = True
    runner = Runner(cfg)
    runner.train("train")
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if "[VAL PSNR]" in l]
    assert len(lines) == cfg.total_iter // cfg.step
    vals = [float(l.split("]")[1].split("dB")[0]) for l in lines]
    assert all(np.isfinite(v) and v > 0 for v in vals)

    # and it reached the metrics stream
    log_dirs = os.listdir(cfg.log_dir)
    jsonl = os.path.join(cfg.log_dir, log_dirs[0], "metrics.jsonl")
    with open(jsonl) as fh:
        rows = [json.loads(l) for l in fh]
    assert any("psnr/val" in r for r in rows)


def test_val_psnr_works_on_host_feed_table(cfg):
    """VAL_METRICS must not depend on device-resident pixels: HOST_FEED
    tables (device_pixels=False) build the fixed val batch host-side."""
    cfg.host_feed = True
    cfg.val_metrics = True
    runner = Runner(cfg)
    v = runner._val_psnr()
    assert np.isfinite(v) and v > 0
