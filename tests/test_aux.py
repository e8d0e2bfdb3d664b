"""Aux subsystems: profiling, distributed init, logging."""

import json
import os

import numpy as np

from tinynerf.logging import MetricLogger, PreviewCanvas
from tinynerf.parallel import distributed
from tinynerf.profiling import Throughput, trace


def test_throughput_meter():
    meter = Throughput(rays_per_step=100)
    meter.tick(10)
    assert meter.rays_per_sec > 0
    val = meter.window()
    assert val > 0
    assert meter.rays_per_sec == 0.0  # window reset


def test_profiler_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp
    with trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    found = []
    for root, _dirs, files in os.walk(tmp_path):
        found += [f for f in files if f.endswith((".pb", ".json.gz"))]
    assert found, "profiler produced no trace artifacts"


def test_distributed_single_process_noop():
    assert distributed.maybe_initialize() is False
    info = distributed.process_info()
    assert info["process_count"] == 1
    assert info["process_index"] == 0
    # idempotent
    assert distributed.maybe_initialize() is False


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), use_tensorboard=False)
    logger.log(0, {"loss/train": np.float32(1.5)})
    logger.log(1, {"loss/train": np.float32(1.25), "lr/train": 1e-3})
    logger.flush()
    logger.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["iter"] == 0 and lines[0]["loss/train"] == 1.5
    assert lines[1]["lr/train"] == 1e-3


def test_preview_canvas(tmp_path):
    canvas = PreviewCanvas(4, 4)
    canvas.update(np.array([1, 2]), np.array([1, 2]),
                  np.array([[1.0, 0, 0], [0, 1.0, 0]]), np.array([0, 1]))
    # only pic 0 pixels land
    assert tuple(canvas.canvas[1, 1]) == (1.0, 0.0, 0.0)
    assert tuple(canvas.canvas[2, 2]) == (1.0, 1.0, 1.0)
    canvas.save(str(tmp_path / "preview.jpg"))
    assert os.path.isfile(tmp_path / "preview.jpg")


def test_ssim_metric_properties():
    from tinynerf.eval import ssim

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
    assert abs(ssim(img, img) - 1.0) < 1e-6
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32)
    noisier = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1).astype(
        np.float32)
    s1, s2 = ssim(img, noisy), ssim(img, noisier)
    assert 0.0 < s2 < s1 < 1.0
    # structure-destroying constant image scores near zero on a textured one
    assert ssim(img, np.full_like(img, float(img.mean()))) < 0.35
