"""Full-frame rendering, PSNR, per-view JPG export and mp4 video.

The reference's ``display()`` (``nerf.py:503-530``) walks the test DataLoader
in order, 400 pixels at a time, scattering ``C_fine`` into an image buffer.
Here a full frame is rendered as a jitted chunked march over the pixel grid —
one compiled program per chunk shape, reusable across views — and the buffer
is sized by the split actually being rendered (fixing reference quirk Q11,
which sizes it by the *train* split's pic count, ``nerf.py:434,513``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf.config import Config
from tinynerf.core import render
from tinynerf.data.rays import RayTable


def make_frame_fn(cfg: Config, k_inv: jnp.ndarray, height: int, width: int,
                  field_fn=None, ndc_params=None, batch_sharding=None,
                  occ_grid=None, extras: bool = False,
                  host_chunks: bool = False):
    """Whole-frame renderer: ONE jitted dispatch per view.

    The pixel grid is marched with an on-device ``lax.map`` over fixed-size
    chunks (bounding peak activation memory) instead of a host loop — a
    full 800x800 view is a single XLA program, so per-dispatch latency is
    paid once per frame, not once per 4096-pixel chunk.

    With ``batch_sharding`` (a NamedSharding over the ray axis) each chunk is
    partitioned across the mesh — the pod-scale eval path: devices march
    disjoint pixel spans and XLA gathers the tiles (SURVEY.md §2.17).

    With the fused Pallas renderer (single-chip, ``field_fn.render_fused``)
    the frame is ONE kernel call over every pixel — the kernel's ray-tile
    grid bounds memory by construction, and wrapping it in ``lax.map``
    instead makes XLA's stacked-output loop fusion exceed the VMEM stack.

    ``host_chunks=True`` trades steady-state frame rate for
    time-to-first-frame: a Python loop over ONE jitted chunk program
    (returns numpy) instead of the single whole-frame XLA program — see
    the inline note on the PROPOSAL frame-compile blowup."""
    if field_fn is None:
        from tinynerf.train import make_field_fn
        field_fn = make_field_fn(cfg)
    from tinynerf.train import make_prop_field_fn, net_params, prop_params
    prop_fn = make_prop_field_fn(cfg)
    num_pix = height * width

    if (getattr(field_fn, "render_fused", None) is not None
            and batch_sharding is None and not cfg.compat_sort
            and cfg.n_fine > 0 and not extras and not cfg.proposal
            and not host_chunks):
        rr, cc = np.meshgrid(np.arange(height, dtype=np.float32),
                             np.arange(width, dtype=np.float32),
                             indexing="ij")
        rows_f = jnp.asarray(rr.reshape(-1))
        cols_f = jnp.asarray(cc.reshape(-1))

        @jax.jit
        def frame_fused(params, pose17_row):
            pose = jnp.broadcast_to(pose17_row.astype(jnp.float32),
                                    (num_pix, 17))
            _, c_fine = render.render_rays(
                net_params(cfg, params), rows_f, cols_f, pose, k_inv,
                cfg.n_coarse, cfg.n_fine, field_fn=field_fn,
                ndc_params=ndc_params,
                merge_impl="twolist", white_bkgd=cfg.white_bkgd,
                occ_grid=occ_grid, occ_march=cfg.occ_march_steps,
                occ_march_res=cfg.occ_march_res,
                occ_contract=cfg.contract, lindisp=cfg.lindisp)
            return c_fine.reshape(height, width, 3)

        return frame_fused

    chunk = min(cfg.render_chunk, num_pix)
    out_shardings = None
    if batch_sharding is not None:
        n_dev = len(batch_sharding.mesh.devices.flatten())
        chunk = -(-chunk // n_dev) * n_dev  # divisible by mesh size
        # frames leave the jit fully replicated so EVERY process can read
        # the assembled image (on a pod, per-device tiles would not be
        # host-addressable from other processes)
        from jax.sharding import NamedSharding, PartitionSpec
        out_shardings = NamedSharding(batch_sharding.mesh, PartitionSpec())
    n_chunks = -(-num_pix // chunk)
    padded = n_chunks * chunk

    rr, cc = np.meshgrid(np.arange(height, dtype=np.float32),
                         np.arange(width, dtype=np.float32), indexing="ij")
    rows = np.pad(rr.reshape(-1), (0, padded - num_pix)).reshape(n_chunks, chunk)
    cols = np.pad(cc.reshape(-1), (0, padded - num_pix)).reshape(n_chunks, chunk)
    rows_d, cols_d = jnp.asarray(rows), jnp.asarray(cols)

    # deep-march path: fine samples sharded over the mesh's sample axis
    sh_render = None
    if (cfg.sample_shard > 1 and batch_sharding is not None
            and "sample" in dict(batch_sharding.mesh.shape)
            and occ_grid is None and not extras and not cfg.compat_sort
            and not cfg.proposal and cfg.n_fine > 0
            and ndc_params is None and not cfg.lindisp):
        from tinynerf.parallel.sample_shard import (
            make_sample_sharded_render)
        sh_render = make_sample_sharded_render(
            batch_sharding.mesh, k_inv, cfg.n_coarse, cfg.n_fine,
            field_fn=field_fn, white_bkgd=cfg.white_bkgd)

    def chunk_body(params, r, c, pose17_row):
        pose = jnp.broadcast_to(pose17_row.astype(jnp.float32), (chunk, 17))
        if sh_render is not None:
            _, c_fine = sh_render(params, r, c, pose)
            return c_fine
        if batch_sharding is not None:
            r = jax.lax.with_sharding_constraint(r, batch_sharding)
            c = jax.lax.with_sharding_constraint(c, batch_sharding)
        out = render.render_rays(
            net_params(cfg, params), r, c, pose, k_inv,
            cfg.n_coarse, cfg.n_fine,
            field_fn=field_fn, compat_sort=cfg.compat_sort,
            ndc_params=ndc_params, merge_impl="twolist",
            white_bkgd=cfg.white_bkgd, occ_grid=occ_grid,
            occ_march=cfg.occ_march_steps, extras=extras,
            occ_march_res=cfg.occ_march_res,
            occ_contract=cfg.contract,
            prop_params=prop_params(cfg, params),
            prop_field_fn=prop_fn, lindisp=cfg.lindisp)
        if extras:
            return out[1], out[2], out[3]
        return out[1]

    if host_chunks:
        if jax.process_count() > 1:
            raise ValueError(
                "host_chunks frame mode is single-process (the serving "
                "path passes process-local chunk arrays into the jit); pod "
                "renders use the whole-frame lax.map path")
        # Host-loop variant: ONE compiled program per GROUP of pixel chunks
        # instead of per frame. Time-to-first-frame drops from minutes to
        # seconds under PROPOSAL, whose chunk body blows up the TPU
        # backend's whole-frame fusion passes when wrapped in the 157-way
        # lax.map (the measured ~115-300 s one-time frame compile — see
        # CLAUDE.md render-path notes). ``host_chunks`` as an int K > 1
        # folds K chunks into each dispatch via a small lax.map — the
        # body still compiles ONCE, but the ~22 ms remote-tunnel dispatch
        # latency amortizes K-fold (VERDICT r3 #4: the gap between 0.363
        # s/frame whole-frame and 5.4-5.8 s/frame K=1 was almost entirely
        # dispatch count). The interactive serving path
        # (tools/serve_render.py) uses this mode.
        group = int(host_chunks) if not isinstance(host_chunks, bool) else 1
        group = max(1, min(group, n_chunks))
        n_groups = -(-n_chunks // group)
        if n_chunks % group:  # pad with repeats; assembly drops past num_pix
            pad_rows = np.concatenate(
                [rows, np.repeat(rows[-1:], n_groups * group - n_chunks, 0)])
            pad_cols = np.concatenate(
                [cols, np.repeat(cols[-1:], n_groups * group - n_chunks, 0)])
        else:
            pad_rows, pad_cols = rows, cols
        grp_rows = [jnp.asarray(pad_rows[g * group:(g + 1) * group])
                    for g in range(n_groups)]
        grp_cols = [jnp.asarray(pad_cols[g * group:(g + 1) * group])
                    for g in range(n_groups)]

        if group == 1:
            jit_chunk = jax.jit(chunk_body, out_shardings=out_shardings)
            run = lambda params, g, pose: jit_chunk(
                params, grp_rows[g][0], grp_cols[g][0], pose)
        else:
            def group_body(params, r_g, c_g, pose17_row):
                return jax.lax.map(
                    lambda rc: chunk_body(params, rc[0], rc[1], pose17_row),
                    (r_g, c_g))

            jit_group = jax.jit(group_body, out_shardings=out_shardings)
            run = lambda params, g, pose: jit_group(
                params, grp_rows[g], grp_cols[g], pose)

        def frame_host(params, pose17_row):
            outs = [run(params, g, pose17_row) for g in range(n_groups)]
            shp = (height, width)
            if extras:
                cat = lambda j: np.concatenate(
                    [np.asarray(o[j]).reshape(-1) for o in outs]
                )[:num_pix * (3 if j == 0 else 1)]
                return (cat(0).reshape(*shp, 3), cat(1).reshape(shp),
                        cat(2).reshape(shp))
            c_fine = np.concatenate(
                [np.asarray(o).reshape(-1, 3) for o in outs])
            return c_fine[:num_pix].reshape(*shp, 3)

        return frame_host

    def frame(params, pose17_row):
        out = jax.lax.map(lambda rc: chunk_body(params, rc[0], rc[1],
                                                pose17_row),
                          (rows_d, cols_d))  # (n_chunks, chunk, *)
        if extras:
            c_fine, depth, acc = out
            shp = (height, width)
            return (c_fine.reshape(padded, 3)[:num_pix].reshape(*shp, 3),
                    depth.reshape(padded)[:num_pix].reshape(shp),
                    acc.reshape(padded)[:num_pix].reshape(shp))
        return out.reshape(padded, 3)[:num_pix].reshape(height, width, 3)

    if out_shardings is not None:
        return jax.jit(frame, out_shardings=out_shardings)
    return jax.jit(frame)


def mse_to_db(mse: float) -> float:
    """Mean-squared error ([0,1]-range signal) -> PSNR dB."""
    if mse == 0:
        return float("inf")
    return -10.0 * float(np.log10(mse))


def psnr(pred: np.ndarray, target: np.ndarray) -> float:
    return mse_to_db(float(np.mean((pred - target) ** 2)))


def ssim(pred: np.ndarray, target: np.ndarray, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> float:
    """Structural similarity (Wang et al. 2004) with the standard NeRF-eval
    settings: 11x11 gaussian window (sigma 1.5), dynamic range 1.0,
    per-channel then averaged. pred/target (H, W, 3) in [0, 1]."""
    from scipy.ndimage import gaussian_filter

    c1, c2 = k1 ** 2, k2 ** 2
    blur = lambda x: np.stack(
        [gaussian_filter(x[..., c], sigma, truncate=10.0 / 3.0)
         for c in range(x.shape[-1])], axis=-1)
    mu_p, mu_t = blur(pred), blur(target)
    var_p = blur(pred * pred) - mu_p * mu_p
    var_t = blur(target * target) - mu_t * mu_t
    cov = blur(pred * target) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2)
    return float(np.mean(num / den))


def render_test_set(cfg: Config, params: Any, table: RayTable,
                    k_inv: jnp.ndarray, start_time: str,
                    last_iter: int, field_fn=None,
                    save: bool = True, max_views: Optional[int] = None,
                    ndc_params=None, batch_sharding=None,
                    occ_grid=None, depth: bool = False,
                    host_chunks: bool = False) -> np.ndarray:
    """Render every view of ``table`` in order; optionally write per-view JPGs
    under ``results_path/<start_time>/`` and an mp4 at 30 fps (reference
    ``nerf.py:523-530``). Returns the (N, H, W, 3) stack.

    ``depth=True`` additionally writes ``<pic>_depth.jpg`` (expected
    termination distance, near/far-normalized) and ``<pic>_acc.jpg``
    (accumulated opacity) per view — standard NeRF diagnostics.

    ``host_chunks=True`` selects the per-chunk host-loop frame program
    (seconds to first frame instead of the one-time whole-frame XLA
    compile, which runs minutes under PROPOSAL — see make_frame_fn)."""
    from tinynerf.parallel.distributed import is_main_process
    save = save and is_main_process()  # pod runs: process 0 owns artifacts
    frame_fn = make_frame_fn(cfg, k_inv, table.height, table.width,
                             field_fn=field_fn, ndc_params=ndc_params,
                             batch_sharding=batch_sharding,
                             occ_grid=occ_grid, extras=depth,
                             host_chunks=host_chunks)
    n_views = table.num_pics if max_views is None else min(max_views, table.num_pics)
    frames = np.empty((n_views, table.height, table.width, 3), np.float32)
    if depth:
        depths = np.empty((n_views, table.height, table.width), np.float32)
        accs = np.empty_like(depths)
    poses = np.asarray(table.poses)
    for pic in range(n_views):
        out = frame_fn(params, jnp.asarray(poses[pic]))
        if depth:
            frames[pic], depths[pic], accs[pic] = (np.asarray(o) for o in out)
        else:
            frames[pic] = np.asarray(out)
    frames = np.clip(frames, 0.0, 1.0)

    if save:
        import imageio
        save_dir = os.path.join(cfg.results_path, start_time)
        os.makedirs(save_dir, exist_ok=True)
        for pic in range(n_views):
            imageio.imwrite(os.path.join(save_dir, f"{pic}.jpg"),
                            (frames[pic] * 255.0).astype(np.uint8))
            if depth:
                if ndc_params is not None:
                    # under the NDC warp render_rays marches t in [0, 1]
                    # (NDC units), so depth is already in that range —
                    # normalizing by world-space near/far would clip it
                    near, far = 0.0, 1.0
                else:
                    near, far = poses[pic, 15], poses[pic, 16]
                dn = np.clip((depths[pic] - near) / max(far - near, 1e-6),
                             0.0, 1.0)
                imageio.imwrite(os.path.join(save_dir, f"{pic}_depth.jpg"),
                                ((1.0 - dn) * 255.0).astype(np.uint8))
                imageio.imwrite(
                    os.path.join(save_dir, f"{pic}_acc.jpg"),
                    (np.clip(accs[pic], 0, 1) * 255.0).astype(np.uint8))
        video_u8 = (frames * 255.0).astype(np.uint8)
        base = os.path.join(cfg.results_path, f"{start_time}_{last_iter}")
        try:
            imageio.mimwrite(base + ".mp4", video_u8, fps=30)
        except (ValueError, IOError):
            # no ffmpeg/pyav backend in this environment — fall back to GIF
            imageio.mimwrite(base + ".gif", video_u8,
                             duration=1000 / 30, loop=0)
    return frames


def render_path(cfg: Config, params: Any, pose_rows: np.ndarray,
                k_inv: jnp.ndarray, out_base: str, field_fn=None,
                fps: int = 30, save: bool = True,
                ndc_params=None, batch_sharding=None,
                occ_grid=None, host_chunks: bool = False) -> np.ndarray:
    """Render an arbitrary camera path (spiral/orbit, ``tinynerf/data/paths``)
    to a video. Frame size comes from each pose row's h/w columns, so
    res-scaled paths (e.g. 1600x1600 spiral) work unchanged; ``k_inv`` must
    match the path intrinsics (``make_k_inv`` of the scaled h/w/f).

    ``occ_grid``/``batch_sharding`` flow into the frame renderer exactly as
    in :func:`render_test_set`: an occ-trained checkpoint's path render uses
    the same tightened sample intervals as its own test renders, and the
    pod-sharded path (BASELINE stretch config 5 — res_scale=2 spiral over
    the mesh) shards each frame's pixel chunks across devices."""
    from tinynerf.parallel.distributed import is_main_process
    save = save and is_main_process()  # pod runs: process 0 owns artifacts
    height = int(pose_rows[0, :15].reshape(3, 5)[0, 4])
    width = int(pose_rows[0, :15].reshape(3, 5)[1, 4])
    frame_fn = make_frame_fn(cfg, k_inv, height, width, field_fn=field_fn,
                             ndc_params=ndc_params,
                             batch_sharding=batch_sharding,
                             occ_grid=occ_grid, host_chunks=host_chunks)
    frames = np.empty((pose_rows.shape[0], height, width, 3), np.float32)
    for i in range(pose_rows.shape[0]):
        frames[i] = np.asarray(frame_fn(params, jnp.asarray(pose_rows[i])))
    frames = np.clip(frames, 0.0, 1.0)
    if save:
        import imageio
        os.makedirs(os.path.dirname(out_base) or ".", exist_ok=True)
        video_u8 = (frames * 255.0).astype(np.uint8)
        try:
            imageio.mimwrite(out_base + ".mp4", video_u8, fps=fps)
        except (ValueError, IOError):
            imageio.mimwrite(out_base + ".gif", video_u8,
                             duration=1000 / fps, loop=0)
    return frames


def test_psnr(frames: np.ndarray, table: RayTable) -> float:
    """Mean PSNR of rendered frames against the split's ground truth."""
    vals = [psnr(frames[i], table.image(i)) for i in range(frames.shape[0])]
    return float(np.mean(vals))


def test_ssim(frames: np.ndarray, table: RayTable) -> float:
    """Mean SSIM of rendered frames against the split's ground truth."""
    vals = [ssim(frames[i], table.image(i)) for i in range(frames.shape[0])]
    return float(np.mean(vals))
