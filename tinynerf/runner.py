"""Training/eval orchestration — the reference ``NeRFRunner`` re-imagined.

Owns the host-side loop only: dataset ingest, checkpoint resume, metric
logging cadence, preview/checkpoint artifacts and the final video render.
Everything per-iteration runs inside the jitted step from ``tinynerf.train``.

Mirrors the reference flow (``nerf.py:353-530``): construct -> maybe resume
latest checkpoint -> ``train("train")`` -> ``display()``, with the same
conf keys and artifact naming.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf import ckpt, eval as evallib, train as trainlib
from tinynerf.config import Config
from tinynerf.core.rays import make_k_inv
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayBatch, RayTable
from tinynerf.logging import MetricLogger, PreviewCanvas
from tinynerf.parallel import distributed as dist, mesh as meshlib
from tinynerf.profiling import Throughput


class Runner:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.start_time = time.strftime("%m-%d-%H-%M-%S", time.localtime())

        # --- mesh / sharding (ray-DP; single-device when 1 chip) ---
        # built before the data tables: on a multi-process (pod) run the
        # tables must be placed replicated over the GLOBAL mesh
        self.mesh = meshlib.mesh_for_config(cfg)
        self.batch_sharding = (meshlib.batch_sharding(self.mesh)
                               if self.mesh is not None else None)
        self.multiprocess = dist.is_multiprocess()
        self.is_main = dist.is_main_process()

        # --- data (host ingest -> HBM tables, or host-side for big scenes) ---
        def ingest(mode):
            scene = load_scene(cfg.img_dir, cfg.data_type, mode, cfg.low_res)
            if cfg.near > 0 or cfg.far > 0:
                # march-bound overrides (NEAR/FAR): sync scenes hardcode
                # 2.0/6.0 (reference loader.py:9-10) — unbounded 360
                # captures need near ~0.1 and an arbitrarily large far
                scene.poses_bounds = scene.poses_bounds.copy()
                if cfg.near > 0:
                    scene.poses_bounds[:, 15] = cfg.near
                if cfg.far > 0:
                    scene.poses_bounds[:, 16] = cfg.far
            return scene

        train_scene = ingest("train")
        if cfg.ndc and cfg.data_type == "llff":
            # NDC needs LLFF-standard recentered/rescaled poses (poses.py)
            from tinynerf.data.poses import recenter_and_rescale
            train_scene.poses_bounds = recenter_and_rescale(
                train_scene.poses_bounds)
        table_kw = dict(pixel_dtype=cfg.pixel_dtype,
                        device_pixels=not cfg.host_feed,
                        mesh=self.mesh if self.multiprocess else None)
        self.train_table = RayTable(train_scene, **table_kw)
        # llff splits are identical (Q10); avoid re-ingesting the same images
        if cfg.data_type == "llff":
            self.val_table = self.test_table = self.train_table
        else:
            self.val_table = RayTable(ingest("val"), **table_kw)
            self.test_table = RayTable(ingest("test"), **table_kw)

        self.k_inv = make_k_inv(self.train_table.height, self.train_table.width,
                                self.train_table.focal)
        # NDC warp (opt-in for forward-facing scenes, Q10/D1)
        self.ndc_params = (
            (float(self.train_table.height), float(self.train_table.width),
             float(self.train_table.focal))
            if cfg.ndc and cfg.data_type == "llff" else None)

        if cfg.occ_grid and cfg.contract:
            # contracted occupancy grid (unbounded-360 + empty-space
            # skipping): cells live in the radius-2 contraction ball and
            # the probe march is disparity-spaced (core/occupancy.py).
            # Must run BEFORE init_state builds the grid.
            if not cfg.lindisp:
                raise ValueError(
                    "OCC_GRID with CONTRACT requires LINDISP: only a "
                    "disparity-spaced probe march keeps contracted-radial "
                    "probe spacing within the grid's dilation margin over "
                    "an unbounded depth range.")
            if float(cfg.occ_extent) != 2.0:
                print(f"NOTE: OCC_EXTENT={cfg.occ_extent} overridden to 2.0 "
                      "— under CONTRACT the occupancy grid spans the "
                      "contracted radius-2 ball")
                cfg.occ_extent = 2.0

        # --- state (fresh or resumed-latest, reference nerf.py:402-420) ---
        self.last_iter = -1
        params = opt_state = saved_key = saved_occ = None
        if cfg.continue_:
            latest = ckpt.find_latest(cfg.ckpt_path)
            if latest is not None:
                (self.last_iter, params, opt_state, saved_key,
                 saved_occ) = ckpt.load_checkpoint_full(latest)
                print(f"Resumed from {latest} (iter {self.last_iter})")
        if self.last_iter < 0:
            print("New run created.")
        self.state = trainlib.init_state(
            cfg, params=params, opt_state=opt_state,
            iteration=self.last_iter + 1)
        if saved_key is not None:  # exact-resume: continue the sample stream
            self.state = self.state._replace(key=saved_key)
        if saved_occ is not None and cfg.occ_grid:
            # the grid is training state: weights co-adapt to its tightened
            # sample distribution, so resume/display must reuse it
            self.state = self.state._replace(occ=saved_occ)
        if self.mesh is not None:
            self.state = meshlib.replicate_state(self.state, self.mesh)

        if cfg.occ_grid and cfg.occ_march_steps is None:
            # probe count must out-resolve the 3-cell dilation margin for
            # this scene's actual ray span (core/occupancy.py)
            pb = np.asarray(self.train_table.poses)
            if cfg.contract:
                from tinynerf.core.occupancy import (
                    derive_march_steps_contracted)
                cfg.occ_march_steps = derive_march_steps_contracted(
                    cfg.occ_res, float(np.min(pb[:, 15])),
                    float(np.max(pb[:, 16])))
            else:
                from tinynerf.core.occupancy import derive_march_steps
                cfg.occ_march_steps = derive_march_steps(
                    cfg.occ_res, cfg.occ_extent,
                    float(np.max(pb[:, 16] - pb[:, 15])))

        if cfg.occ_grid and cfg.data_type == "sync" and not cfg.white_bkgd:
            raise ValueError(
                "OCC_GRID on a white-composited (sync) scene requires "
                "WHITE_BKGD = True: rays that miss occupied space composite "
                "to the background and would train toward black against "
                "white ground truth.")

        # metric/artifact writes are process-0-owned on pod runs
        from tinynerf.logging import NullLogger
        self.logger = (MetricLogger(os.path.join(cfg.log_dir, self.start_time))
                       if self.is_main else NullLogger())
        self._step_fns = {}
        self._val_eval = None
        # pod runs: bring the collective context up on a trivial program
        # before the first train-step compile (see distributed.barrier)
        dist.barrier("runner_init")

    def _step_fn(self, table: RayTable):
        key = id(table)
        if key not in self._step_fns:
            if self.cfg.host_feed:
                self._step_fns[key] = trainlib.make_host_fed_train_step(
                    self.cfg, self.k_inv, batch_sharding=self.batch_sharding,
                    ndc_params=self.ndc_params)
            else:
                self._step_fns[key] = trainlib.make_train_step(
                    self.cfg, table, self.k_inv,
                    batch_sharding=self.batch_sharding,
                    ndc_params=self.ndc_params)
        return self._step_fns[key]

    def _val_psnr(self) -> float:
        """Held-out observability metric (``VAL_METRICS``): PSNR of the fine
        pass over a FIXED val-split ray batch — the same rays every call, so
        the logged series is comparable across iterations. One extra
        dispatch per STEP logging boundary (amortized like the preview
        canvas). On a pod run EVERY process calls this (the jit spans the
        global mesh, so all processes must enter it together); only
        process 0 prints/logs the value — see the train loop."""
        from tinynerf.core import render
        if self._val_eval is None:
            cfg = self.cfg
            # host-side batch construction: works for BOTH device-pixel and
            # host-feed (device_pixels=False) tables, where .sample raises
            table = self.val_table
            rng = np.random.default_rng(cfg.seed + 777)
            idx = rng.integers(0, table.num_pix, cfg.batch_ray)
            pic = (idx // table.pic_size).astype(np.int32)
            in_pic = idx % table.pic_size
            flat = table.host_pixels[idx]
            if table.pixel_dtype == "u8":
                flat = flat.astype(np.float32) * (1.0 / 255.0)
            batch = RayBatch(
                rows=jnp.asarray((in_pic // table.width).astype(np.float32)),
                cols=jnp.asarray((in_pic % table.width).astype(np.float32)),
                rgb=jnp.asarray(flat.astype(np.float32)),
                pose17=jnp.asarray(np.asarray(table.poses)[pic]),
                pic=jnp.asarray(pic))
            if self.multiprocess:
                # pod observability (VERDICT r3 #6): params live replicated
                # on the GLOBAL mesh, so the val batch must too — every
                # process builds the identical batch (fixed seed) and the
                # jit runs as one global program
                batch = dist.put_replicated(batch, self.mesh)
            field_fn = trainlib.make_field_fn(cfg)
            prop_fn = trainlib.make_prop_field_fn(cfg)

            @jax.jit
            def val_mse(params, occ, b):
                _c, c_fi = render.render_rays(
                    trainlib.net_params(cfg, params), b.rows, b.cols,
                    b.pose17, self.k_inv, cfg.n_coarse, cfg.n_fine,
                    field_fn=field_fn, compat_sort=cfg.compat_sort,
                    ndc_params=self.ndc_params, merge_impl="twolist",
                    white_bkgd=cfg.white_bkgd, occ_grid=occ,
                    occ_march=cfg.occ_march_steps,
                    occ_march_res=cfg.occ_march_res,
                    occ_contract=cfg.contract,
                    prop_params=trainlib.prop_params(cfg, params),
                    prop_field_fn=prop_fn, lindisp=cfg.lindisp)
                return jnp.mean(jnp.square(c_fi - b.rgb))

            self._val_eval = (val_mse, batch)
        val_mse, batch = self._val_eval
        return evallib.mse_to_db(
            float(val_mse(self.state.params, self.state.occ, batch)))

    def _make_feeder(self, table: RayTable):
        """Native C++ prefetching batch source (big-scene path)."""
        from tinynerf.data.native import make_ray_store
        store = make_ray_store(
            table.host_pixels, np.asarray(table.poses), table.height,
            table.width, seed=self.cfg.seed)
        store.start(self.cfg.batch_ray)
        return store

    def train(self, mode: str = "train") -> None:
        """Run the training loop until ``total_iter`` (resuming mid-count).

        ``mode="val"`` runs ONE FULL EPOCH over the val split — a shuffled
        without-replacement pass visiting every val pixel once, batches of
        ``batch_ray`` with the remainder dropped, exactly the reference's
        ``trainer("val")`` DataLoader epoch (``nerf.py:498-499``; shuffle=True
        drop_last=True). Like the reference, the val pass runs the full
        forward/backward/optimizer step (the code path is shared).
        Under ``host_feed`` (no device pixel table) the epoch length is kept
        but batches come from the with-replacement C++ feeder — a documented
        approximation for the big-scene path."""
        cfg = self.cfg
        table = {"train": self.train_table, "val": self.val_table}[mode]
        canvas = PreviewCanvas(table.height, table.width)

        start = int(self.state.iteration)
        idx_epoch = None
        if mode == "val":
            n_batches = table.num_pix // cfg.batch_ray  # drop_last
            end = start + n_batches
            if not cfg.host_feed:
                perm = jax.random.permutation(
                    jax.random.fold_in(self.state.key, start),
                    table.num_pix)[: n_batches * cfg.batch_ray]
                idx_epoch = perm.reshape(n_batches, cfg.batch_ray).astype(
                    jnp.int32)
                step_fn = trainlib.make_indexed_train_step(
                    cfg, table, self.k_inv,
                    batch_sharding=self.batch_sharding,
                    ndc_params=self.ndc_params)
            else:
                step_fn = self._step_fn(table)
        else:
            end = cfg.total_iter
            step_fn = self._step_fn(table)
        # coarse-to-fine grid schedule: milestones at iterations not yet run
        # (a resumed run's checkpoint already carries post-milestone shapes
        # for every milestone < start)
        upsample = []
        if mode == "train" and cfg.fine_field == "grid" and cfg.grid_upsample:
            from tinynerf.config import parse_grid_upsample
            upsample = [(i, r) for i, r in parse_grid_upsample(
                cfg.grid_upsample) if i >= start]
        print(f"[STEP] {mode}: iterations {start} -> {end}")
        feeder = self._make_feeder(table) if cfg.host_feed else None
        profiling_until = (start + cfg.profile_steps
                           if (cfg.profile_steps and mode == "train") else -1)
        if profiling_until > 0:
            jax.profiler.start_trace(os.path.join(cfg.log_dir, "trace"))

        # scan-fused chunks (one dispatch per chunk, full per-iter metric
        # stream) unless the host feeder or the profiler needs per-step
        # host control. Chunk divides the logging cadence so checkpoints
        # land exactly on (it+1) % STEP == 0 boundaries.
        def _make_multi(n):
            if n <= 1:
                return None
            if idx_epoch is not None:
                return trainlib.make_chunked_indexed_step(step_fn, n)
            return trainlib.make_chunked_step(step_fn, n)

        chunked = feeder is None and profiling_until < 0
        chunk = self._chunk_size(cfg.step) if chunked else 1
        multi_fn = _make_multi(chunk) if chunked else None

        try:  # reference-style progress bar (nerf.py:458)
            from tqdm import tqdm
            bar = tqdm(total=end - start, unit="it", dynamic_ncols=True)
        except ImportError:
            bar = None
        meter = Throughput(rays_per_step=cfg.batch_ray)
        it = start
        while it < end:
            if upsample and it == upsample[0][0]:
                _, new_res = upsample.pop(0)
                self.state = trainlib.upsample_grid_state(
                    cfg, self.state, new_res)
                if self.mesh is not None:
                    self.state = meshlib.replicate_state(self.state, self.mesh)
                print(f"[GRID] upsampled line tables to R={new_res} "
                      f"before iter {it}")
            if it == profiling_until:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                print(f"[PROFILE] trace of {cfg.profile_steps} steps -> "
                      f"{os.path.join(cfg.log_dir, 'trace')}")
                profiling_until = -1
                chunked = feeder is None
                chunk = self._chunk_size(cfg.step) if chunked else 1
                multi_fn = _make_multi(chunk) if chunked else None

            # single-step across an upcoming milestone so the resize lands
            # exactly before its iteration (chunks are scan-fused and cannot
            # change param shapes mid-flight)
            if (multi_fn is not None and it + chunk <= end
                    and not (upsample and it + chunk > upsample[0][0])):
                if idx_epoch is not None:
                    self.state, metrics = multi_fn(
                        self.state, idx_epoch[it - start: it - start + chunk])
                else:
                    self.state, metrics = multi_fn(self.state)
                losses = np.asarray(metrics["loss"])
                lrs = np.asarray(metrics["lr"])
                for j in range(chunk):
                    self.logger.log(it + j, {f"loss/{mode}": losses[j],
                                             f"lr/{mode}": lrs[j]})
                it += chunk
                meter.tick(chunk)
                metrics = {**metrics, "loss": losses[-1]}
                if bar is not None:
                    bar.update(chunk)
            else:
                if feeder is not None:
                    rows, cols, rgb, pose, pic = feeder.next()
                    batch = RayBatch(
                        rows=jnp.asarray(rows), cols=jnp.asarray(cols),
                        rgb=jnp.asarray(rgb), pose17=jnp.asarray(pose),
                        pic=jnp.asarray(pic))
                    self.state, metrics = step_fn(self.state, batch)
                elif idx_epoch is not None:
                    self.state, metrics = step_fn(self.state,
                                                  idx_epoch[it - start])
                else:
                    self.state, metrics = step_fn(self.state)
                self.logger.log(it, {f"loss/{mode}": metrics["loss"],
                                     f"lr/{mode}": metrics["lr"]})
                it += 1
                meter.tick(1)
                if bar is not None:
                    bar.update(1)

            if it % cfg.step == 0:
                loss = float(np.asarray(metrics["loss"]))
                c_t = np.asarray(metrics["c_true0"])
                c_f = np.asarray(metrics["c_fine0"])
                rate = meter.rays_per_sec
                print(f"[ITER] {it - 1} [LOSS] {loss:.4f} "
                      f"[T] ({c_t[0]:.4f} {c_t[1]:.4f} {c_t[2]:.4f}) "
                      f"[F] ({c_f[0]:.4f} {c_f[1]:.4f} {c_f[2]:.4f}) "
                      f"[RAYS/S] {rate:,.0f}")
                if mode == "train" and cfg.val_metrics:
                    # ALL processes enter the (global-mesh) val jit; only
                    # process 0 reports — pod runs keep the held-out series
                    val_psnr = self._val_psnr()
                    if self.is_main:
                        print(f"[VAL PSNR] {val_psnr:.2f} dB")
                        self.logger.log(it - 1, {"psnr/val": val_psnr})
                self.logger.flush()
                if mode == "train" and self.is_main:
                    # process-0 owns the preview + checkpoint artifacts; on a
                    # pod the preview fields may be sharded across processes,
                    # so read back only what this host can address
                    canvas.update(dist.to_host(metrics["rows"]),
                                  dist.to_host(metrics["cols"]),
                                  dist.to_host(metrics["rgb"]),
                                  dist.to_host(metrics["pic"]))
                    os.makedirs(cfg.results_path, exist_ok=True)
                    canvas.save(os.path.join(
                        cfg.results_path, f"{self.start_time}_{it - 1}.jpg"))
                    ckpt.save_checkpoint(
                        cfg.ckpt_path, self.start_time, it - 1,
                        jax.device_get(self.state.params),
                        jax.device_get(self.state.opt),
                        key=jax.device_get(self.state.key),
                        occ=(jax.device_get(self.state.occ)
                             if self.state.occ is not None else None))
                if mode == "train":
                    self.last_iter = it - 1
                meter.reset()
        if bar is not None:
            bar.close()
        if profiling_until > 0:  # loop shorter than the trace window
            jax.profiler.stop_trace()
        if feeder is not None:
            feeder.close()
        self.logger.flush()

    @staticmethod
    def _chunk_size(step: int, cap: int = 200) -> int:
        """Largest divisor of the logging cadence, capped (compile cost)."""
        for c in range(min(step, cap), 0, -1):
            if step % c == 0:
                return c
        return 1

    def display(self, max_views: Optional[int] = None,
                depth: bool = False, host_chunks: int = 0) -> float:
        """Full-frame render of the test split -> JPGs + mp4; returns PSNR.
        ``depth=True`` also writes per-view depth + opacity maps;
        ``host_chunks=True`` renders via the per-chunk serving program
        (fast first frame, no whole-frame compile)."""
        print("Start generating video...")
        frames = evallib.render_test_set(
            self.cfg, self.state.params, self.test_table, self.k_inv,
            self.start_time, self.last_iter, save=True, max_views=max_views,
            ndc_params=self.ndc_params, batch_sharding=self.batch_sharding,
            occ_grid=self.state.occ, depth=depth, host_chunks=host_chunks)
        score = evallib.test_psnr(frames, self.test_table)
        ssim_score = evallib.test_ssim(frames, self.test_table)
        print(f"Test PSNR: {score:.2f} dB over {frames.shape[0]} views "
              f"(SSIM {ssim_score:.4f})")
        return score

    def render_path_video(self, n_views: int = 120,
                          res_scale: float = 1.0,
                          host_chunks: int = 0) -> None:
        """Free-viewpoint video along a scene-appropriate camera path
        (spiral for llff, 360-degree orbit for sync). ``res_scale=2`` renders
        e.g. a 1600x1600-class spiral from 800-class training intrinsics."""
        from tinynerf.data.paths import make_path
        pose_rows = make_path(np.asarray(self.train_table.poses),
                              self.cfg.data_type, n_views=n_views,
                              res_scale=res_scale)
        hwf = pose_rows[0, :15].reshape(3, 5)[:, 4]
        k_inv = make_k_inv(float(hwf[0]), float(hwf[1]), float(hwf[2]))
        out_base = os.path.join(
            self.cfg.results_path, f"{self.start_time}_path_{self.last_iter}")
        print(f"Rendering {n_views}-view path at "
              f"{int(hwf[0])}x{int(hwf[1])} -> {out_base}")
        evallib.render_path(self.cfg, self.state.params, pose_rows, k_inv,
                            out_base, ndc_params=self.ndc_params,
                            batch_sharding=self.batch_sharding,
                            occ_grid=self.state.occ,
                            host_chunks=host_chunks)
