"""Interactive browser viewer: progressive rendering over HTTP.

The TPU-native analog of the reference's application shell (Application.js +
MainDialog + canvas): the render loop runs server-side on the accelerator,
and a minimal single-page client orbits the camera with pointer drags, picks
renderer/tone mapper, and streams progressively refined frames.  Camera
motion resets accumulation exactly like the reference's Transform change
events (RenderingContext.js:42-46).

Endpoints:
  GET /                 — the viewer page
  GET /frame?yaw=&pitch=&distance=&spp=&renderer=&tonemap=&extinction=
                        — advance the progressive render, return PNG
  GET /info             — renderer/tone-mapper lists + current state
"""

from __future__ import annotations

import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>vpt_tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px sans-serif;
       display:flex; height:100vh; }
#view { flex:1; display:flex; align-items:center; justify-content:center; }
img { image-rendering:pixelated; cursor:grab; }
#panel { width:220px; padding:12px; background:#1a1a1a; }
select,input { width:100%; margin:2px 0 10px; background:#222; color:#ddd;
               border:1px solid #444; padding:4px; }
#stats { color:#888; margin-top:10px; white-space:pre; }
</style></head><body>
<div id="view"><img id="canvas" width="512" height="512"></div>
<div id="panel">
  <label>Renderer</label><select id="renderer"></select>
  <label>Tone mapper</label><select id="tonemap"></select>
  <label>Extinction</label><input id="extinction" type="number" value="20">
  <label>Samples / request</label><input id="spp" type="number" value="4">
  <div id="stats"></div>
</div>
<script>
let yaw = 0.5, pitch = 0.3, distance = 2.0, dragging = false,
    px = 0, py = 0, epoch = 0, busy = false, frames = 0;
const img = document.getElementById('canvas');
img.addEventListener('pointerdown', e => {
  dragging = true; px = e.clientX; py = e.clientY;
  img.setPointerCapture(e.pointerId); });
img.addEventListener('pointerup', () => dragging = false);
img.addEventListener('pointermove', e => {
  if (!dragging) return;
  yaw -= (e.clientX - px) * 0.01; pitch += (e.clientY - py) * 0.01;
  pitch = Math.max(-1.5, Math.min(1.5, pitch));
  px = e.clientX; py = e.clientY; epoch++; frames = 0; });
img.addEventListener('wheel', e => {
  e.preventDefault();
  distance *= Math.exp(e.deltaY * 0.001); epoch++; frames = 0; });
for (const id of ['renderer', 'tonemap', 'extinction'])
  document.getElementById(id).addEventListener('change',
    () => { epoch++; frames = 0; });

async function init() {
  const info = await (await fetch('info')).json();
  for (const [id, list, def] of [["renderer", info.renderers, info.renderer],
                                 ["tonemap", info.tonemappers, info.tonemap]]) {
    const sel = document.getElementById(id);
    for (const name of list) {
      const o = document.createElement('option');
      o.value = o.textContent = name;
      if (name === def) o.selected = true;
      sel.appendChild(o);
    }
  }
  loop();
}
async function loop() {
  if (busy) return;
  busy = true;
  const myEpoch = epoch;
  const q = new URLSearchParams({
    yaw, pitch, distance,
    renderer: document.getElementById('renderer').value,
    tonemap: document.getElementById('tonemap').value,
    extinction: document.getElementById('extinction').value,
    spp: document.getElementById('spp').value,
    reset: frames === 0 ? '1' : '0',
  });
  const t0 = performance.now();
  const blob = await (await fetch('frame?' + q)).blob();
  const dt = performance.now() - t0;
  if (myEpoch === epoch) {
    img.src = URL.createObjectURL(blob);
    frames += parseInt(document.getElementById('spp').value);
    document.getElementById('stats').textContent =
      `accumulated: ${frames} spp\\nlast request: ${dt.toFixed(0)} ms`;
  }
  busy = false;
  setTimeout(loop, 1);
}
init();
</script></body></html>
"""


class ViewerServer:
    def __init__(self, context=None, port: int = 8000,
                 host: str = "127.0.0.1"):
        from .context import RenderingContext

        if context is None:
            from .. import transfer, volume

            context = RenderingContext(resolution=512)
            context.set_volume(volume.sphere_volume(64))
            context.set_transfer_function(
                transfer.gray_ramp(alpha_scale=1.0))
            context.choose_renderer("mcm")
            context.choose_tone_mapper("reinhard")
        self.ctx = context
        self.lock = threading.Lock()
        self.host, self.port = host, port
        self._pose = None
        self._server = None

    # -- request handling --------------------------------------------------
    def _apply_query(self, q):
        from ..renderers import factory

        ctx = self.ctx
        yaw = float(q.get("yaw", ["0"])[0])
        pitch = float(q.get("pitch", ["0"])[0])
        distance = float(q.get("distance", ["2"])[0])
        renderer = q.get("renderer", [ctx.renderer_key or "mcm"])[0]
        tonemap = q.get("tonemap", [ctx.tone_mapper.name])[0]
        extinction = float(q.get("extinction", ["20"])[0])
        reset = q.get("reset", ["0"])[0] == "1"

        config = (renderer, tonemap, extinction)
        pose = (yaw, pitch, distance)
        if config != getattr(self, "_config", None) or ctx.renderer is None:
            # renderer/tonemap/extinction change: rebuild (recompiles)
            self._config = config
            module = factory.get_module(renderer)
            params = module.Params()
            if hasattr(params, "extinction"):
                params = module.Params(extinction=extinction)
            ctx.choose_renderer(renderer, params=params)
            ctx.choose_tone_mapper(tonemap)
        if pose != self._pose or reset:
            # camera-only change: move the camera (fires the accumulation
            # reset listener) but KEEP the compiled renderer
            self._pose = pose
            ctx.camera_animator.yaw = yaw
            ctx.camera_animator.pitch = pitch
            ctx.camera_animator.distance = distance
            ctx.camera_animator._update_camera()

    def _render_png(self, q) -> bytes:
        from PIL import Image

        from ..io.image import to_uint8

        with self.lock:
            self._apply_query(q)
            self.ctx.render(frames=int(q.get("spp", ["4"])[0]))
            arr = to_uint8(np.asarray(self.ctx.get_display_image()))
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        return buf.getvalue()

    def _info(self) -> bytes:
        from ..renderers import factory
        from ..tonemap import TONE_MAPPERS

        return json.dumps({
            "renderers": sorted(factory.MODULES),
            "tonemappers": sorted(TONE_MAPPERS),
            "renderer": self.ctx.renderer_key or "mcm",
            "tonemap": self.ctx.tone_mapper.name,
            "resolution": self.ctx.resolution,
        }).encode()

    # -- server ------------------------------------------------------------
    def make_handler(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                q = urllib.parse.parse_qs(parsed.query)
                try:
                    if parsed.path in ("/", "/index.html"):
                        body, ctype = _PAGE.encode(), "text/html"
                    elif parsed.path == "/frame":
                        body, ctype = viewer._render_png(q), "image/png"
                    elif parsed.path == "/info":
                        body, ctype = viewer._info(), "application/json"
                    else:
                        self.send_error(404)
                        return
                except Exception as e:  # surface render errors to client
                    self.send_error(500, str(e)[:200])
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        return Handler

    def serve_forever(self):
        self._server = ThreadingHTTPServer((self.host, self.port),
                                           self.make_handler())
        print(f"vpt_tpu viewer on http://{self.host}:"
              f"{self._server.server_address[1]}")
        self._server.serve_forever()

    def serve_background(self):
        self._server = ThreadingHTTPServer((self.host, self.port),
                                           self.make_handler())
        thread = threading.Thread(target=self._server.serve_forever,
                                  daemon=True)
        thread.start()
        return self._server.server_address[1]

    def shutdown(self):
        if self._server:
            self._server.shutdown()
