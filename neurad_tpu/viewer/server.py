"""Browser viewer: orbit camera + live render + actor/time controls.

TPU-native counterpart of `nerfstudio/viewer/` (Viewer `viewer.py:58`,
RenderStateMachine `render_state_machine.py:57`, LidarRenderer 361). viser is not
in this image, so the viewer is a self-contained stdlib HTTP server + embedded
JS page: the browser posts camera poses, the server renders through the model
under a lock (the reference's train_lock) with resolution adaptation — low-res
while the camera moves, full-res when static (the render state machine's
low_move/low_static/high FSM, `render_state_machine.py:57-120`).
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>neurad_tpu viewer</title><style>
body { margin:0; background:#111; color:#eee; font-family:monospace; }
#hud { position:absolute; top:8px; left:8px; }
canvas { display:block; }
input[type=range] { width: 200px; }
</style></head><body>
<div id="hud">
  <div>neurad_tpu viewer &mdash; drag to orbit, wheel to zoom, shift-drag to pan</div>
  <div>time <input type="range" id="time" min="0" max="1" step="0.01" value="0"><span id="tv">0</span></div>
  <div id="status"></div>
</div>
<canvas id="c"></canvas>
<script>
const canvas = document.getElementById('c');
const ctx = canvas.getContext('2d');
let az = 0.5, el = 0.3, dist = 30, target = [10, 0, 1], drag = null, moving = false, timer = null;
let t01 = 0;
function pose() {
  const ce = Math.cos(el), se = Math.sin(el), ca = Math.cos(az), sa = Math.sin(az);
  const eye = [target[0] + dist*ce*ca, target[1] + dist*ce*sa, target[2] + dist*se];
  const f = [(target[0]-eye[0])/dist, (target[1]-eye[1])/dist, (target[2]-eye[2])/dist];
  const up = [0,0,1];
  let r = [f[1]*up[2]-f[2]*up[1], f[2]*up[0]-f[0]*up[2], f[0]*up[1]-f[1]*up[0]];
  const rn = Math.hypot(...r); r = r.map(x=>x/rn);
  const u = [r[1]*f[2]-r[2]*f[1], r[2]*f[0]-r[0]*f[2], r[0]*f[1]-r[1]*f[0]];
  return [[r[0], u[0], -f[0], eye[0]], [r[1], u[1], -f[1], eye[1]], [r[2], u[2], -f[2], eye[2]]];
}
async function render(hi) {
  const res = await fetch('/render', {method:'POST', body: JSON.stringify({pose: pose(), quality: hi?'high':'low', t01})});
  const data = await res.json();
  const img = new Image();
  img.onload = () => { canvas.width = window.innerWidth; canvas.height = window.innerHeight;
    ctx.imageSmoothingEnabled = false;
    ctx.drawImage(img, 0, 0, canvas.width, canvas.height); };
  img.src = 'data:image/png;base64,' + data.png;
  document.getElementById('status').textContent = data.status || '';
}
function queueRender() {
  render(false);
  clearTimeout(timer);
  timer = setTimeout(() => render(true), 400);
}
canvas.onmousedown = e => drag = [e.clientX, e.clientY, e.shiftKey];
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (drag[2]) { target[0] -= dx*0.05; target[2] += dy*0.05; }
  else { az -= dx*0.01; el = Math.max(-1.4, Math.min(1.4, el + dy*0.01)); }
  drag = [e.clientX, e.clientY, drag[2]];
  queueRender();
};
window.onwheel = e => { dist = Math.max(2, dist * (1 + e.deltaY*0.001)); queueRender(); };
document.getElementById('time').oninput = e => {
  t01 = parseFloat(e.target.value);
  document.getElementById('tv').textContent = t01.toFixed(2);
  queueRender();
};
queueRender();
</script></body></html>"""


class ViewerServer:
    """Serves the viewer page + /render endpoint.

    render_fn(c2w [3,4] numpy, width, height, time01) -> rgb [H, W, 3] float.
    """

    def __init__(self, render_fn: Callable, port: int = 7007, train_lock: Optional[threading.Lock] = None):
        self.render_fn = render_fn
        self.port = port
        self.train_lock = train_lock or threading.Lock()
        self._server: Optional[ThreadingHTTPServer] = None

    def _handler(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                hi = req.get("quality") == "high"
                w, h = (384, 256) if hi else (96, 64)
                pose = np.asarray(req["pose"], dtype=np.float32)
                with outer.train_lock:
                    rgb = outer.render_fn(pose, w, h, float(req.get("t01", 0.0)))
                png = _to_png(np.asarray(rgb))
                payload = json.dumps(
                    {"png": base64.b64encode(png).decode(), "status": f"{w}x{h}"}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *args):
                pass

        return Handler

    def start(self, background: bool = True):
        self._server = ThreadingHTTPServer(("0.0.0.0", self.port), self._handler())
        print(f"[viewer] http://localhost:{self.port}")
        if background:
            threading.Thread(target=self._server.serve_forever, daemon=True).start()
        else:
            self._server.serve_forever()

    def stop(self):
        if self._server:
            self._server.shutdown()


def _to_png(rgb: np.ndarray) -> bytes:
    import imageio.v2 as imageio

    buf = io.BytesIO()
    imageio.imwrite(buf, (np.clip(rgb, 0, 1) * 255).astype(np.uint8), format="png")
    return buf.getvalue()
