"""Interactive render service: serve free-viewpoint frames from a trained
checkpoint over HTTP.

The serving counterpart of the offline ``--mode=display`` / ``--mode=path``
surfaces (the reference has none — its only output is the test-split video,
``nerf.py:503-530``): loads the latest checkpoint for a config and exposes

- ``GET /``            — a minimal viewer page (azimuth / elevation / radius
                         sliders driving the frame endpoint);
- ``GET /frame?theta=..&elev=..&radius=..&scale=..`` — one rendered JPEG
  from that viewpoint (sync scenes: orbit-sphere parameterization via
  ``data.paths.orbit_pose``; llff: position along the standard spiral);
- ``GET /info``        — run metadata as JSON.

One compiled XLA program per frame resolution (cached across requests —
the first request at a new ``scale`` pays the compile, the rest stream);
renders are serialized with a lock (single chip, single compiled program).

Usage:
    python tools/serve_render.py --conf conf/lego.ini --port 8008
    python tools/serve_render.py --conf ... --cpu   # no-TPU environments
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_PAGE = """<!doctype html>
<html><head><title>tinynerf viewer</title><style>
 body {{ font-family: sans-serif; margin: 2em; background: #111; color: #eee }}
 img {{ image-rendering: pixelated; width: 512px; border: 1px solid #444 }}
 label {{ display: inline-block; width: 6em }}
 .row {{ margin: 0.4em 0 }}
</style></head><body>
<h2>tinynerf &mdash; {scene} (iter {it})</h2>
<img id="v" src="/frame">
<div class="row"><label>azimuth</label>
 <input type="range" id="theta" min="0" max="360" value="0" step="3"></div>
<div class="row"><label>elevation</label>
 <input type="range" id="elev" min="-80" max="80" value="{elev}" step="2"></div>
<div class="row"><label>radius</label>
 <input type="range" id="radius" min="50" max="200" value="100" step="5"></div>
<div class="row"><label>scale</label>
 <select id="scale"><option>0.125</option><option selected>0.25</option>
 <option>0.5</option><option>1.0</option></select></div>
<div class="row"><label>view</label>
 <select id="view"><option selected>rgb</option><option>depth</option>
 <option>acc</option></select></div>
<script>
 const ids = ["theta", "elev", "radius", "scale", "view"];
 let busy = false, dirty = false;
 function refresh() {{
   if (busy) {{ dirty = true; return; }}
   busy = true;
   const q = new URLSearchParams({{
     theta: theta.value, elev: elev.value,
     radius: radius.value / 100, scale: scale.value, view: view.value }});
   const img = new Image();
   img.onload = () => {{ v.src = img.src; busy = false;
                         if (dirty) {{ dirty = false; refresh(); }} }};
   img.onerror = () => {{ busy = false; }};
   img.src = "/frame?" + q;
 }}
 ids.forEach(i => document.getElementById(i).addEventListener("input", refresh));
 refresh();
</script></body></html>"""


# client scale values snap to this set: bounds the compiled-program cache
# (one XLA program per distinct frame resolution) at 5 entries
_SCALES = (0.125, 0.25, 0.5, 1.0, 2.0)


class _Service:
    """Checkpoint + per-resolution compiled frame renderers."""

    def __init__(self, cfg, runner, host_chunks: int = 8):
        self.cfg = cfg
        self.runner = runner
        self.host_chunks = host_chunks
        self.pose_rows = None  # lazy: numpy copy of the training poses
        self._frame_fns = {}
        self._spiral = None
        self.lock = threading.Lock()

    def _rows(self):
        import numpy as np
        if self.pose_rows is None:
            self.pose_rows = np.asarray(self.runner.train_table.poses)
        return self.pose_rows

    def pose(self, theta: float, elev, radius: float, scale: float):
        from tinynerf.data import paths
        if self.cfg.data_type == "llff":
            # forward-facing rig: theta indexes the standard spiral
            if self._spiral is None or self._spiral[0] != scale:
                self._spiral = (scale, paths.spiral_path(
                    self._rows(), n_views=120, res_scale=scale))
            return self._spiral[1][int(theta / 360.0 * 120) % 120]
        # rig-aware: outward pan for unbounded-360 rings, inward orbit
        # for Blender-style rigs
        return paths.free_pose(self._rows(), theta, elev_deg=elev,
                               radius_scale=radius, res_scale=scale)

    def frame_fn(self, hwf, extras: bool = False):
        from tinynerf import eval as evallib
        from tinynerf.core.rays import make_k_inv
        h, w = int(hwf[0]), int(hwf[1])
        key = (h, w, extras)
        if key not in self._frame_fns:
            k_inv = make_k_inv(float(hwf[0]), float(hwf[1]), float(hwf[2]))
            self._frame_fns[key] = evallib.make_frame_fn(
                self.cfg, k_inv, h, w, ndc_params=self.runner.ndc_params,
                batch_sharding=self.runner.batch_sharding,
                occ_grid=self.runner.state.occ, extras=extras,
                # serving wants time-to-first-frame: per-chunk programs
                # sidestep the whole-frame compile blowup under PROPOSAL
                host_chunks=self.host_chunks)
        return self._frame_fns[key]

    def rig_elev_deg(self) -> float:
        """Training rig's mean elevation in degrees (sync scenes; 0 for
        llff, where the slider indexes the spiral instead)."""
        import numpy as np
        if self.cfg.data_type == "llff":
            return 0.0
        from tinynerf.data.paths import _orbit_geometry
        return float(np.rad2deg(_orbit_geometry(self._rows())[1]))

    def render_jpeg(self, theta: float, elev, radius: float,
                    scale: float, view: str = "rgb") -> bytes:
        import numpy as np
        import jax.numpy as jnp
        from PIL import Image

        # snap to the fixed scale ladder (bounded compile cache), then
        # refuse degenerate frames (h*scale < 4 px)
        scale = min(_SCALES, key=lambda s: abs(s - scale))
        h0 = min(self.runner.train_table.height,
                 self.runner.train_table.width)
        if int(h0 * scale) < 4:
            raise ValueError(f"scale {scale} gives a {int(h0 * scale)}px "
                             f"frame; minimum is 4px")
        row = self.pose(theta, elev, radius, scale)
        hwf = row[:15].reshape(3, 5)[:, 4]
        extras = view in ("depth", "acc")
        with self.lock:
            fn = self.frame_fn(hwf, extras=extras)
            out = fn(self.runner.state.params, jnp.asarray(row))
        if extras:
            rgb, depth, acc = (np.asarray(o) for o in out)
            if view == "depth":
                # near/far-normalized expected termination (white = near),
                # matching the --depth export convention (eval.py)
                near, far = ((0.0, 1.0) if self.runner.ndc_params is not None
                             else (float(row[15]), float(row[16])))
                dn = np.clip((depth - near) / max(far - near, 1e-6), 0.0, 1.0)
                frame = 1.0 - dn
            else:
                frame = np.clip(acc, 0.0, 1.0)
            u8 = (frame * 255.0).astype(np.uint8)
        else:
            u8 = (np.clip(np.asarray(out), 0.0, 1.0) * 255.0
                  ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(u8).save(buf, "JPEG", quality=90)
        return buf.getvalue()

    def info(self) -> dict:
        import jax
        cfg = self.cfg
        return {
            "scene": os.path.basename(os.path.normpath(cfg.img_dir)),
            "data_type": cfg.data_type,
            "iteration": int(self.runner.last_iter),
            "fine_field": cfg.fine_field,
            "proposal": bool(cfg.proposal),
            "occ_grid": bool(cfg.occ_grid),
            "height": int(self.runner.train_table.height),
            "width": int(self.runner.train_table.width),
            "backend": jax.default_backend(),
        }


def _make_handler(svc: _Service):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet: one line per frame
            sys.stderr.write("%s %s\n" % (self.address_string(), fmt % args))

        def _send(self, code: int, ctype: str, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlsplit(self.path)
            q = urllib.parse.parse_qs(url.query)

            def num(name, default, lo, hi):
                try:
                    v = float(q[name][0])
                except (KeyError, ValueError):
                    return default
                return min(max(v, lo), hi)

            try:
                if url.path == "/":
                    info = svc.info()
                    # slider starts at the rig's mean elevation — the same
                    # viewpoint the parameterless first /frame renders
                    page = _PAGE.format(scene=info["scene"],
                                        it=info["iteration"],
                                        elev=round(svc.rig_elev_deg()))
                    self._send(200, "text/html", page.encode())
                elif url.path == "/info":
                    self._send(200, "application/json",
                               json.dumps(svc.info()).encode())
                elif url.path == "/frame":
                    view = q.get("view", ["rgb"])[0]
                    if view not in ("rgb", "depth", "acc"):
                        raise ValueError(f"view={view!r}: rgb|depth|acc")
                    jpg = svc.render_jpeg(
                        theta=num("theta", 0.0, 0.0, 360.0),
                        elev=(num("elev", 0.0, -80.0, 80.0)
                              if "elev" in q else None),
                        radius=num("radius", 1.0, 0.3, 3.0),
                        scale=num("scale", 0.25, 0.05, 2.0),
                        view=view)
                    self._send(200, "image/jpeg", jpg)
                else:
                    self._send(404, "text/plain", b"not found")
            except BrokenPipeError:
                pass
            except ValueError as exc:  # client-input errors (e.g. degenerate scale)
                self._send(400, "text/plain", str(exc).encode())
            except Exception as exc:  # surface render errors to the client
                self._send(500, "text/plain", repr(exc).encode())

    return Handler


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, required=True,
                        help="scene name under ./conf/ or a path to an .ini")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8008)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (no-TPU environments)")
    parser.add_argument("--lax-map", action="store_true",
                        help="whole-frame XLA programs instead of per-chunk "
                             "(faster steady-state, minutes-long first "
                             "compile under PROPOSAL)")
    parser.add_argument("--chunk-group", type=int, default=8,
                        help="pixel chunks folded per dispatch in serving "
                             "mode (amortizes the ~22 ms tunnel latency "
                             "K-fold at seconds-scale compile; measured "
                             "sweet spot 8 — see VALIDATION.md round 4)")
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from tinynerf.config import load_config
    from tinynerf.runner import Runner

    cfg = load_config(args.conf)
    cfg.continue_ = True  # serving needs trained weights: resume latest
    runner = Runner(cfg)
    if runner.last_iter < 0:
        raise SystemExit(
            f"no checkpoint under {cfg.ckpt_path!r} — train first "
            f"(python main.py --conf=... --mode=train)")

    svc = _Service(cfg, runner,
                   host_chunks=0 if args.lax_map else max(1, args.chunk_group))
    server = ThreadingHTTPServer((args.host, args.port), _make_handler(svc))
    print(f"serving {svc.info()['scene']} (iter {runner.last_iter}) "
          f"on http://{args.host}:{server.server_address[1]}/", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
