"""tools/validate.py — the VALIDATION.md protocol harness — must keep
producing its JSON row end-to-end (scene gen -> INI -> CLI train+eval ->
parse). Tiny shapes; the protocol numbers themselves are TPU-only."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_validate_tool_emits_row(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "validate.py"),
         "--family", "reference", "--cpu",
         "--scene", str(tmp_path / "scene"), "--hw", "16", "--views", "3",
         "--iters", "20", "--batch", "16", "--n-fine", "8",
         "--out", str(tmp_path / "out"),
         "--extra", "N_COARSE = 4", "--extra", "RENDER_CHUNK = 64"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row["family"] == "reference"
    assert row["iters"] == 20
    assert row["psnr_db"] is not None and row["psnr_db"] > 0
    assert 0.0 <= row["ssim"] <= 1.0
    assert os.path.exists(row["ini"])
    # the --extra override must have reached the INI
    with open(row["ini"]) as fh:
        assert "N_COARSE = 4" in fh.read()
