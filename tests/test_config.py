import os

import pytest

from tinynerf.config import Config, load_config


def _write(tmp_path, name, body):
    path = os.path.join(tmp_path, name + ".ini")
    with open(path, "w") as f:
        f.write(body)
    return path


def test_load_full_ini(tmp_path):
    path = _write(tmp_path, "lego", """[lego]
GPU = 1
IMG_DIR = ./data/lego/
RESULTS_PATH = ./out/
CKPT_PATH = ./ck/
LOW_RES = 2
TOTAL_ITER = 12345
BATCH_RAY = 512
LEARNING = 1e-3
LR_GAMMA = 0.5
LR_MILESTONE = [10, 200]
N_COARSE = 32
N_FINE = 64
DATA_TYPE = sync
STEP = 50
DECAY_END = 1000
SCHED = EXP
CONTINUE = True
""")
    cfg = load_config(path)
    assert cfg.total_iter == 12345
    assert cfg.batch_ray == 512
    assert cfg.learning == pytest.approx(1e-3)
    assert cfg.lr_milestone == [10, 200]  # Q2 fixed: ints, not characters
    assert cfg.continue_ is True          # Q2 fixed: no eval()
    assert cfg.low_res == 2
    assert cfg.data_type == "sync"


def test_epoch_alias_and_defaults(tmp_path):
    # The shipped reference INIs have EPOCH but no TOTAL_ITER / RESULTS_PATH /
    # CONTINUE (Q1); they must load with defaults instead of raising.
    path = _write(tmp_path, "fern", """[fern]
EPOCH = 777
DATA_TYPE = llff
""")
    cfg = load_config(path)
    assert cfg.total_iter == 777
    assert cfg.results_path == Config().results_path
    assert cfg.continue_ is False


def test_total_iter_beats_epoch(tmp_path):
    path = _write(tmp_path, "s", "[s]\nEPOCH = 1\nTOTAL_ITER = 2\n")
    assert load_config(path).total_iter == 2


def test_shipped_conf_files_load():
    for name in ("lego", "fern"):
        cfg = load_config(name, conf_dir=os.path.join(
            os.path.dirname(__file__), "..", "conf"))
        assert cfg.n_coarse == 64 and cfg.n_fine == 128
        assert cfg.sched == "EXP"


def test_missing_conf_raises():
    with pytest.raises(FileNotFoundError):
        load_config("does_not_exist")


def test_apply_key_rejects_unknown():
    cfg = Config()
    from tinynerf.config import apply_key
    apply_key(cfg, "prop_interlevel", "0.01")   # case-insensitive
    assert cfg.prop_interlevel == 0.01
    with pytest.raises(KeyError):
        apply_key(cfg, "PROP_INTRLEVEL", "0.01")  # typo must not pass silently


def test_config_docs_current():
    """docs/CONFIG.md is generated from config.py — fail if it drifts."""
    import importlib.util
    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "gen_config_docs", os.path.join(root, "tools", "gen_config_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    on_disk = open(os.path.join(root, "docs", "CONFIG.md")).read()
    assert on_disk == mod.render(), (
        "docs/CONFIG.md is stale — run: python tools/gen_config_docs.py")


_CONF_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "conf")


@pytest.mark.parametrize("ini", sorted(os.listdir(_CONF_DIR)))
def test_shipped_inis_parse(ini):
    """Every shipped scene config must load into a valid Config (the
    reference's own shipped INIs raise NoOptionError, SURVEY.md Q1 — ours
    must not)."""
    cfg = load_config(os.path.join(_CONF_DIR, ini))
    assert cfg.total_iter > 0 and cfg.batch_ray > 0
    assert cfg.n_coarse > 0 and cfg.n_fine >= 0
    assert cfg.fine_field in ("mlp", "grid")
