"""Interactive web shell: the CYD touchscreen + LCD reborn as a browser tab.

The reference's user surface is a 320x240 touch LCD: drag a finger, dye
swirls (``touch_routine``/``draw_routine``).  Here a tiny dependency-free
HTTP server streams the rendered frames as MJPEG (multipart) and accepts
pointer drags back, feeding them through the same native lossy drag queue ->
impulse path as the scripted schedules.  The sim/render producer and the
HTTP consumers synchronize through the C++ FrameHandshake — the FreeRTOS
semaphore pair, verbatim in role.

Run:  python -m esp32_fluid_simulation_tpu.io_host.server --port 8000
then open http://localhost:8000/ and drag on the canvas.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax

from ..config import SimConfig
from ..state import Impulses
from ..models.stable_fluids import init_state
from ..models import make_step
from ..render import render_rgb8
from .native import DragQueue, FramePacer

_PAGE = """<!doctype html>
<title>tpu-fluid</title>
<style>body{background:#111;color:#eee;font-family:monospace;text-align:center}
img{image-rendering:pixelated;border:1px solid #444;touch-action:none}</style>
<h3>tpu-fluid &mdash; drag to stir</h3>
<img id="v" src="/stream" width="%WIDTH%" height="%HEIGHT%">
<p id="s"></p>
<script>
const img = document.getElementById('v');
let last = null, lastT = 0, down = false;
function cell(e) {
  const r = img.getBoundingClientRect();
  return [ (e.clientX - r.left) / r.width, (e.clientY - r.top) / r.height ];
}
function send(p, q, ms) {
  fetch('/drag', {method: 'POST',
                  body: JSON.stringify({from: p, to: q, ms: ms})});
}
img.addEventListener('pointerdown', e => {
  down = true; last = cell(e); lastT = e.timeStamp;
});
img.addEventListener('pointermove', e => {
  if (!down) return;
  const c = cell(e);
  send(last, c, e.timeStamp - lastT); last = c; lastT = e.timeStamp;
});
addEventListener('pointerup', () => { down = false; last = null; });
</script>
"""


class SimServer:
    def __init__(self, cfg: SimConfig, fps: float = 30.0):
        self.cfg = cfg
        self.fps = fps
        self.queue = DragQueue(16)
        self._step = make_step(cfg, donate=False)

        @jax.jit
        def _step_render(st, imp):
            # one device program per frame (step + render inline): halves
            # the per-frame dispatch latency through the tunnel
            st = self._step(st, imp)
            return st, render_rgb8(st.color, s=cfg.scaling)

        self._step_render = _step_render
        self._frame_jpeg = b""
        self._frame_lock = threading.Condition()
        self._frame_no = 0
        self._stop = threading.Event()
        self.steps_done = 0
        self.mime = "image/jpeg"

    # -- input ------------------------------------------------------------
    def drag(self, frm, to, ms=None):
        """Fractional screen coords -> sim-frame drag (the x/y swap of
        .ino:258-267 happens here: screen row fraction -> axis 0).

        Velocity = delta cells * 1000/ms, ms being the client-measured time
        between pointer events — the reference's drag formula with a
        measured poll period (.ino:80-86)."""
        h, w = self.cfg.shape[-2], self.cfg.shape[-1]
        i0, j0 = frm[1] * (h - 1), frm[0] * (w - 1)
        i1, j1 = to[1] * (h - 1), to[0] * (w - 1)
        period_ms = min(max(float(ms) if ms else 1000.0 / self.fps, 1.0),
                        1000.0)
        scale = 1000.0 / period_ms
        self.queue.try_push(int(round(i1)), int(round(j1)),
                            (i1 - i0) * scale, (j1 - j0) * scale)

    # -- sim loop ---------------------------------------------------------
    def _encode(self, rgb):
        try:
            from PIL import Image
            buf = io.BytesIO()
            Image.fromarray(rgb).save(buf, format="JPEG", quality=85)
            self.mime = "image/jpeg"
            return buf.getvalue()
        except ImportError:  # raw PPM fallback (correctly labeled)
            self.mime = "image/x-portable-pixmap"
            h, w, _ = rgb.shape
            return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()

    def run_sim(self, n_frames=None):
        try:
            self._run_sim(n_frames)
        finally:
            # a step/encode exception must stop the server visibly instead
            # of freezing /stream on a stale frame
            self._stop.set()
            with self._frame_lock:
                self._frame_lock.notify_all()

    def _run_sim(self, n_frames=None):
        state = init_state(self.cfg)
        pacer = FramePacer(self.fps)
        # Warm up the with-impulses step variant AND Impulses.from_lists's
        # small device ops before serving: otherwise the FIRST user drag
        # stalls the sim thread for seconds of remote jit compilation
        # (measured ~4 s on the tunneled TPU) — a zero-velocity impulse at
        # (0, 0) is a no-op on the zero-velocity initial state.
        warm = Impulses.from_lists(self.cfg, [(0, 0)],
                                   [(0.0,) * self.cfg.ndim])
        state, _ = self._step_render(state, warm)
        while not self._stop.is_set():
            drags = self.queue.drain(self.cfg.max_impulses)
            # queue entries are already sim-frame (i, j, vi, vj)
            imp = (Impulses.from_lists(
                       self.cfg, [(i, j) for i, j, _, _ in drags],
                       [(vi, vj) for _, _, vi, vj in drags])
                   if drags else Impulses.none(self.cfg))
            state, img = self._step_render(state, imp)
            rgb = np.moveaxis(np.asarray(img), 0, -1)
            jpeg = self._encode(np.ascontiguousarray(rgb))
            with self._frame_lock:
                self._frame_jpeg = jpeg
                self._frame_no += 1
                self._frame_lock.notify_all()
            self.steps_done += 1
            if n_frames and self.steps_done >= n_frames:
                break
            pacer.wait()

    def next_frame(self, after, timeout=60.0):
        """Block until a frame newer than ``after`` exists (first frames
        wait out the jit compile); returns (bytes, frame_no)."""
        deadline = time.time() + timeout
        with self._frame_lock:
            while (self._frame_no <= after or not self._frame_jpeg) \
                    and not self._stop.is_set():
                remaining = deadline - time.time()
                if remaining <= 0 or not self._frame_lock.wait(remaining):
                    break
            return self._frame_jpeg, self._frame_no

    def stop(self):
        self._stop.set()


def make_handler(sim: SimServer):
    ho, wo = sim.cfg.render_shape

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/":
                page = (_PAGE.replace("%WIDTH%", str(wo))
                        .replace("%HEIGHT%", str(ho))).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(page)))
                self.end_headers()
                self.wfile.write(page)
            elif self.path == "/frame":
                frame, _ = sim.next_frame(-1)
                self.send_response(200)
                self.send_header("Content-Type", sim.mime)
                self.send_header("Content-Length", str(len(frame)))
                self.end_headers()
                self.wfile.write(frame)
            elif self.path == "/stream":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                seen = -1
                try:
                    while not sim._stop.is_set():
                        frame, seen = sim.next_frame(seen)
                        if not frame:
                            continue
                        self.wfile.write(b"--frame\r\n")
                        self.wfile.write(b"Content-Type: " + sim.mime.encode() + b"\r\n")
                        self.wfile.write(
                            b"Content-Length: %d\r\n\r\n" % len(frame))
                        self.wfile.write(frame)
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass
            elif self.path == "/stats":
                body = json.dumps({
                    "steps": sim.steps_done,
                    "queue_dropped": sim.queue.dropped,
                    "shape": list(sim.cfg.shape),
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path == "/drag":
                n = int(self.headers.get("Content-Length", 0))
                msg = json.loads(self.rfile.read(n))
                sim.drag(msg["from"], msg["to"], msg.get("ms"))
                self.send_response(204)
                self.end_headers()
            else:
                self.send_error(404)

    return Handler


def serve(cfg: SimConfig, port: int = 8000, fps: float = 30.0,
          n_frames=None):
    # Initialize the JAX backend from the MAIN thread before the sim thread
    # touches it: the tunneled TPU plugin on the dev machine deadlocks if
    # its first initialization happens on a secondary thread (subsequent
    # threaded compiles/executions are fine).
    import jax.numpy as jnp
    jax.block_until_ready(jnp.zeros(()) + 1)

    sim = SimServer(cfg, fps=fps)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(sim))
    sim_thread = threading.Thread(target=sim.run_sim, args=(n_frames,),
                                  daemon=True, name="sim")
    sim_thread.start()
    return sim, httpd


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--grid", type=int, nargs=2, default=[61, 81])
    ap.add_argument("--scaling", type=int, default=4)
    ap.add_argument("--fps", type=float, default=30.0)
    args = ap.parse_args(argv)
    cfg = SimConfig(shape=tuple(args.grid), scaling=args.scaling)
    sim, httpd = serve(cfg, port=args.port, fps=args.fps)
    print(f"serving on http://127.0.0.1:{args.port}/")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        sim.stop()


if __name__ == "__main__":
    main()
