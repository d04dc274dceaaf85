"""Live interactive demo: the reference's defining UX, TPU-native.

The reference is built around a windowed demo where you drag the mouse
through a running dam-break and inject impulses, with Space toggling the
color view (reference: examples/sph2d_cpu_demo.rs:85-141 drag input +
apply_drag; :60-67 view toggle; screen->world transform :129-133).  This is
the same loop re-architected for a headless accelerator host: the sim steps
and rasterizes entirely on device (one fused dispatch per frame), finished
RGB frames stream to a browser over plain HTTP (stdlib only), and pointer
events come back as world-space impulses applied between steps.

    python examples/interactive.py --n 5041 --port 8787
    # then open http://localhost:8787 — drag to push fluid, Space to toggle

No GUI toolkit, no websockets, no pip installs: a ThreadingHTTPServer and a
<canvas>.  The sim loop never blocks on a client: frames render at sim rate
and HTTP requests read the latest finished frame.

Headless check (CI, no browser):  --selfdrive 40  injects a scripted drag
(the same screen-coordinate path a browser would POST) and exits nonzero if
the fluid failed to respond.
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import math
import sys
import threading
import time
from types import SimpleNamespace
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

PAGE = """<!doctype html>
<html><head><title>bevy_gpu_fluid_tpu</title><style>
 body { background: #111; color: #ccc; font: 13px monospace; margin: 1em; }
 canvas { border: 1px solid #444; image-rendering: pixelated; cursor: crosshair; }
</style></head><body>
<div>drag = impulse &nbsp; | &nbsp; Space = view toggle &nbsp; | &nbsp;
 <span id="s">connecting...</span></div>
<canvas id="c"></canvas>
<script>
const c = document.getElementById('c'), ctx = c.getContext('2d');
let last = null, drag = false;
function post(path, body) {
  fetch(path, {method: 'POST', body: JSON.stringify(body || {})});
}
c.addEventListener('pointerdown', e => { drag = true; last = [e.offsetX, e.offsetY]; });
window.addEventListener('pointerup', () => { drag = false; last = null; });
c.addEventListener('pointermove', e => {
  if (!drag || !last) return;
  const dx = e.offsetX - last[0], dy = e.offsetY - last[1];
  if (dx === 0 && dy === 0) return;
  post('/impulse', {px: e.offsetX, py: e.offsetY, dx: dx, dy: dy});
  last = [e.offsetX, e.offsetY];
});
window.addEventListener('keydown', e => {
  if (e.code === 'Space') { e.preventDefault(); post('/toggle'); }
});
async function loop() {
  try {
    const r = await fetch('/frame.png?' + Date.now());
    const blob = await r.blob();
    const img = await createImageBitmap(blob);
    c.width = img.width; c.height = img.height;
    ctx.drawImage(img, 0, 0);
    const st = await (await fetch('/stats')).json();
    document.getElementById('s').textContent =
      st.n + ' particles | step ' + st.step + ' | ' + st.fps.toFixed(1) +
      ' FPS | view: ' + st.mode + ' | overflow: ' + st.overflow;
  } catch (e) {}
  requestAnimationFrame(loop);
}
loop();
</script></body></html>"""


@dataclasses.dataclass(frozen=True)
class RasterSpec:
    """Screen geometry of a frame: world origin + scale, matching
    render.raster.RasterSpec's fields the pointer mapping needs."""
    x0: float
    y0: float
    scale: float
    height: int
    width: int


class _SessionSim:
    """Session-backed adapter with the slice of the Simulation surface the
    app uses — for LARGE scenes (100k-16M): the dense state stays resident
    on device, frames come from the scalable Pallas field raster, and drag
    impulses apply densely (Session.kick).  Screen geometry: the field
    frame is (ny*P) x (nx*P) px aligned to the binning grid."""

    def __init__(self, n: int, px_per_cell: int = 2):
        import bevy_gpu_fluid_tpu as bgf
        from bevy_gpu_fluid_tpu.models import verlet_solver

        side = int(math.isqrt(n))
        state = bgf.init_grid(side, side, 0.04)
        extent = side * 0.04
        self.cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
        grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                          y_max=extent * 1.1 + 1.0, cap=8)
        self._sess = verlet_solver.Session(state, bgf.FluidParams.demo(),
                                           self.cfg, grid)
        self._ppc = px_per_cell
        P, g = px_per_cell, grid
        self.spec = RasterSpec(x0=g.origin_x, y0=g.origin_y,
                               scale=P / g.cell_size, height=g.ny * P,
                               width=g.nx * P)

    @property
    def state(self):
        # stats only (n/step); never materializes the particle state
        return SimpleNamespace(n=self._sess.n, step=self._sess.sim.step)

    def particle_state(self):
        return self._sess.state()

    @property
    def overflow(self):
        return self._sess.overflow

    def kick(self, x, y, ux, uy):
        self._sess.kick(x, y, ux, uy)

    def run_frame(self, substeps, mode):
        return self._sess.run_frame(substeps, px_per_cell=self._ppc,
                                    mode="const" if mode == "const"
                                    else "density")


class _ShardedSim:
    """Multi-chip adapter: the same app surface over a ShardedSession —
    per-slab stepping + raster strips, cross-slab drag impulses.  The
    browser loop is unchanged; only the engine under it scales out."""

    def __init__(self, n: int, devices: int, px_per_cell: int = 2):
        import bevy_gpu_fluid_tpu as bgf
        from bevy_gpu_fluid_tpu.parallel import shard
        from bevy_gpu_fluid_tpu.parallel.sharded_session import ShardedSession

        side = int(math.isqrt(n))
        state = bgf.init_grid(side, side, 0.04)
        extent = side * 0.04
        self.cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
        sspec = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0,
                                      x_max=extent + 1.0,
                                      y_max=extent * 1.1 + 1.0,
                                      n_devices=devices,
                                      capacity=max(1024, state.n))
        self._sess = ShardedSession(state, bgf.FluidParams.demo(), self.cfg,
                                    sspec)
        self._ppc = px_per_cell
        P, g = px_per_cell, sspec.local_grid
        self.spec = RasterSpec(x0=sspec.global_x0, y0=g.origin_y,
                               scale=P / g.cell_size, height=g.ny * P,
                               width=devices * sspec.nx_local * P)

    @property
    def state(self):
        return SimpleNamespace(n=self._sess.n, step=self._sess.sim.step)

    def particle_state(self):
        return self._sess.state()

    @property
    def overflow(self):
        return self._sess.overflow

    def kick(self, x, y, ux, uy):
        self._sess.kick(x, y, ux, uy)

    def run_frame(self, substeps, mode):
        return self._sess.run_frame(substeps, px_per_cell=self._ppc,
                                    mode="const" if mode == "const"
                                    else "density")


class InteractiveApp:
    """Sim loop + frame buffer + input queue, UI-agnostic.

    The HTTP layer (or a test, or the self-drive script) talks to this
    object only through ``latest_png``/``pointer_drag``/``toggle_view`` —
    exactly the surface a native window would use."""

    def __init__(self, n: int = 5041, substeps: int = 16,
                 raster_width: int = 512, solver: str = "verlet",
                 session: bool = False, sharded: int = 0):
        from bevy_gpu_fluid_tpu import Simulation

        if sharded:
            self.sim = _ShardedSim(n, devices=sharded)
        elif session:
            self.sim = _SessionSim(n)
        else:
            self.sim = Simulation.dam_break(n=n, solver=solver,
                                            raster_width=raster_width)
        self.substeps = substeps
        self.mode = "density"       # reference default ViewMode::DensityColor
        self._impulses: list[tuple[float, float, float, float]] = []
        self._lock = threading.Lock()
        self._frame: np.ndarray | None = None
        self._png: bytes | None = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.fps = 0.0
        self.frames = 0
        from bevy_gpu_fluid_tpu.render.pump import FramePump
        self._pump = FramePump(pull=True)

    # ---- input (screen space, as a browser/window delivers it) ----------
    def pointer_drag(self, px: float, py: float, dx: float, dy: float):
        """Pointer moved (dx, dy) canvas px while pressed at (px, py).
        Converts to world coords (canvas row 0 = top) and queues an impulse
        with the reference's semantics: vel += IMPULSE * normalized drag
        direction within r^2 < INTERACTION_AREA (sph2d_cpu_demo.rs:129-140)."""
        spec = self.sim.spec
        wx = spec.x0 + px / spec.scale
        wy = spec.y0 + (spec.height - py) / spec.scale
        norm = math.hypot(dx, dy)
        if norm == 0.0:
            return
        with self._lock:
            self._impulses.append((wx, wy, dx / norm, -dy / norm))

    def toggle_view(self):
        """Space key: ConstColor <-> DensityColor (sph2d_cpu_demo.rs:60-67)."""
        self.mode = "const" if self.mode == "density" else "density"

    # ---- output ----------------------------------------------------------
    def latest_frame(self) -> np.ndarray | None:
        with self._lock:
            return self._frame

    def latest_png(self) -> bytes | None:
        from PIL import Image
        with self._lock:
            if self._frame is None:
                return None
            if self._png is None:
                buf = io.BytesIO()
                Image.fromarray(self._frame).save(buf, "PNG")
                self._png = buf.getvalue()
            return self._png

    def stats(self) -> dict:
        return {"n": int(self.sim.state.n), "step": int(self.sim.state.step),
                "fps": self.fps, "mode": self.mode,
                "overflow": self.sim.overflow}

    # ---- loop -------------------------------------------------------------
    def _run_one_frame(self):
        # pipelined: publish frame k-1 while frame k's dispatch + transfer
        # are in flight (render.pump.FramePump) — one frame of latency for
        # ~2x frame rate on dispatch-latency-bound rigs
        with self._lock:
            pending, self._impulses = self._impulses, []
        for (wx, wy, ux, uy) in pending:
            self.sim.kick(wx, wy, ux, uy)
        img = self._pump.push(self.sim.run_frame(self.substeps, self.mode))
        if img is not None:             # None only while priming the pipe
            with self._lock:
                self._frame = img
                self._png = None
            self.frames += 1

    def _loop(self):
        t0, n0 = time.time(), 0
        while not self._stop.is_set():
            self._run_one_frame()
            now = time.time()
            if now - t0 >= 1.0:
                self.fps = (self.frames - n0) / (now - t0)
                t0, n0 = now, self.frames

    def start(self):
        self._run_one_frame()           # compile + prime the frame pipe
        self._run_one_frame()           # first frame lands before serving
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)


def make_server(app: InteractiveApp, port: int) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/frame.png"):
                png = app.latest_png()
                if png is None:
                    self._send(503, "text/plain", b"no frame yet")
                else:
                    self._send(200, "image/png", png)
            elif self.path.startswith("/stats"):
                self._send(200, "application/json",
                           json.dumps(app.stats()).encode())
            else:
                self._send(200, "text/html", PAGE.encode())

        def do_POST(self):
            ln = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(ln) if ln else b"{}"
            try:
                body = json.loads(raw or b"{}")
            except json.JSONDecodeError:
                body = {}
            if self.path.startswith("/impulse"):
                app.pointer_drag(float(body.get("px", 0)),
                                 float(body.get("py", 0)),
                                 float(body.get("dx", 0)),
                                 float(body.get("dy", 0)))
            elif self.path.startswith("/toggle"):
                app.toggle_view()
            self._send(200, "application/json", b"{}")

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def selfdrive(app: InteractiveApp, frames: int) -> int:
    """Headless exercise of the exact input path a browser drives: a
    rightward drag across the lower half of the canvas, then a view toggle.
    Returns 0 iff the fluid responded (velocity change) and stayed finite."""
    def pstate():
        s = app.sim
        return s.particle_state() if hasattr(s, "particle_state") \
            else s.state
    spec = app.sim.spec
    v0 = float(np.abs(np.asarray(pstate().vx)).max())
    for i in range(frames):
        if i % 4 == 0:  # drag a path through the fluid block
            px = spec.width * (0.3 + 0.3 * (i / max(frames, 1)))
            py = spec.height * 0.8
            app.pointer_drag(px, py, 6.0, 0.0)
        if i == frames // 2:
            app.toggle_view()
        app._run_one_frame()
    s = pstate()
    ok = (bool(np.isfinite(np.asarray(s.x)).all())
          and float(np.abs(np.asarray(s.vx)).max()) > v0
          and app.latest_png() is not None)
    print(f"selfdrive: {frames} frames, step={int(s.step)} "
          f"mode={app.mode} overflow={app.sim.overflow} ok={ok}")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5041)
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--substeps", type=int, default=16)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--solver", default="verlet")
    ap.add_argument("--session", action="store_true",
                    help="Session-backed large-N mode: resident dense "
                         "state + scalable field raster + dense impulses "
                         "(use for 100k-16M particles)")
    ap.add_argument("--sharded", type=int, default=0, metavar="D",
                    help="multi-chip mode: shard the scene over D devices "
                         "(ShardedSession; with --cpu, D virtual devices)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (headless hosts)")
    ap.add_argument("--selfdrive", type=int, default=0, metavar="FRAMES",
                    help="no server: scripted drag + toggle, then exit")
    args = ap.parse_args()

    if args.cpu:
        import os
        if args.sharded:
            # must land before any backend initialization
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.sharded}")
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.jax_cache_cpu"))

    app = InteractiveApp(n=args.n, substeps=args.substeps,
                         raster_width=args.width, solver=args.solver,
                         session=args.session, sharded=args.sharded)
    if args.selfdrive:
        app._run_one_frame()
        return selfdrive(app, args.selfdrive)

    app.start()
    srv = make_server(app, args.port)
    print(f"serving http://localhost:{args.port} "
          f"({args.n} particles x {args.substeps} substeps/frame)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        app.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
