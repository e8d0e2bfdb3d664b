"""The HTTP render service (tools/serve_render.py): end-to-end over a real
socket — boot from a checkpoint, serve /info and /frame, reject viewless
starts. The serving counterpart of --mode=display (the reference has no
serving surface at all)."""

import io
import json
import os
import re
import subprocess
import sys
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from tests.util import make_sync_scene
from tinynerf import ckpt, optim, train as trainlib
from tinynerf.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SERVE = os.path.join(REPO, "tools", "serve_render.py")


def _write_ini(path, scene_dir, out_dir):
    with open(path, "w") as fh:
        fh.write(f"""[servescene]
IMG_DIR = {scene_dir}/
RESULTS_PATH = {out_dir}/results/
CKPT_PATH = {out_dir}/ckpt/
LOG_DIR = {out_dir}/runs/
TOTAL_ITER = 4
BATCH_RAY = 16
N_COARSE = 4
N_FINE = 8
DATA_TYPE = sync
STEP = 2
DECAY_END = 1000
SCHED = EXP
CONTINUE = True
RENDER_CHUNK = 64
""")


def _boot(ini, extra=()):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 fake device is plenty for a viewer
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, SERVE, "--conf", ini, "--cpu", "--port", "0",
         *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def test_serve_render_frames(tmp_path):
    scene = str(tmp_path / "scene")
    make_sync_scene(scene, n_pics=2, hw=12)
    ini = str(tmp_path / "serve.ini")
    _write_ini(ini, scene, str(tmp_path / "out"))

    # a real checkpoint through the framework's own save path
    cfg = Config(batch_ray=16, n_coarse=4, n_fine=8)
    state = trainlib.init_state(cfg)
    os.makedirs(str(tmp_path / "out" / "ckpt"), exist_ok=True)
    ckpt.save_checkpoint(str(tmp_path / "out" / "ckpt"), "serve", 7,
                         jax.device_get(state.params),
                         jax.device_get(state.opt),
                         key=jax.device_get(state.key))

    proc = _boot(ini)
    try:
        m, seen = None, []
        while m is None:
            line = proc.stdout.readline()
            if not line:
                raise AssertionError(f"server exited before banner: {seen}")
            seen.append(line)
            m = re.search(r"http://127\.0\.0\.1:(\d+)/", line)
        base = f"http://127.0.0.1:{m.group(1)}"

        info = json.loads(urllib.request.urlopen(
            base + "/info", timeout=120).read())
        assert info["iteration"] == 7
        assert info["backend"] == "cpu"

        page = urllib.request.urlopen(base + "/", timeout=120).read()
        assert b"tinynerf" in page and b"/frame" in page

        from PIL import Image
        jpg = urllib.request.urlopen(
            base + "/frame?theta=45&elev=20&radius=1.2&scale=0.5",
            timeout=600).read()
        img = np.asarray(Image.open(io.BytesIO(jpg)))
        assert img.shape == (6, 6, 3)  # hw=12 at scale 0.5
        # compiled-frame-fn cache: same resolution again is near-instant
        jpg2 = urllib.request.urlopen(
            base + "/frame?theta=90&scale=0.5", timeout=120).read()
        assert Image.open(io.BytesIO(jpg2)).size == (6, 6)

        # diagnostics views: depth/acc render grayscale via the extras path
        dep = urllib.request.urlopen(
            base + "/frame?theta=90&scale=0.5&view=depth",
            timeout=600).read()
        img_d = Image.open(io.BytesIO(dep))
        assert img_d.size == (6, 6) and img_d.mode == "L"

        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(base + "/nope", timeout=60)
        assert err.value.code == 404
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_serve_refuses_fresh_weights(tmp_path):
    scene = str(tmp_path / "scene")
    make_sync_scene(scene, n_pics=2, hw=12)
    ini = str(tmp_path / "serve.ini")
    _write_ini(ini, scene, str(tmp_path / "out"))  # no checkpoint written
    proc = _boot(ini)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode != 0
    assert "no checkpoint" in out
