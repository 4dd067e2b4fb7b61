"""Browser-based live viewer — the PTWindow/GL display stand-in.

The reference displays the accumulating render in an OpenGL window with
keyboard interaction (src/window.cpp, src/tracer_ui.cpp). A headless TPU
host has no GL; this module serves the same role over HTTP with only the
stdlib: a tiny threaded server shows the latest preview frame
(auto-refreshing) and forwards commands to the exact same interactive
command interpreter the REPL uses (interactive.run_interactive), so every
REPL command — camera motion, look, material edits, scene switching,
sampling/light toggles, DoF picking, state save/load — works from the
browser.

Usage:  python -m fluctus_tpu <scene> --serve 8000
then open http://localhost:8000 (port-forward when remote).
"""

from __future__ import annotations

import html
import os
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs

_PAGE = """<!DOCTYPE html>
<html><head><title>fluctus_tpu</title><style>
body {{ background: #1b1b1f; color: #ddd; font-family: monospace;
       display: flex; flex-direction: column; align-items: center; }}
img {{ image-rendering: pixelated; max-width: 90vw; border: 1px solid #444; }}
input {{ background: #2a2a2f; color: #ddd; border: 1px solid #555;
         padding: 4px; width: 28em; }}
pre {{ color: #9a9; }}
</style></head><body>
<h3>fluctus_tpu — live render</h3>
<img id="frame" src="/frame.png" alt="(no frame yet)">
<p><form method="post" action="/cmd">
<input name="c" placeholder="w/s/a/d/r/f, look 10 0, depth 4, rr, maxspp 64, scale 0.5, aperture .001, envstrength 2, arealight int 50, integrator mk, tonemap 2, exposure 1.5, blend 0.8, mat 0 kd 1 0 0, q ..."
 autofocus></form></p>
<pre>{log}</pre>
<script>
setInterval(() => {{
  document.getElementById("frame").src = "/frame.png?ts=" + Date.now();
}}, 2000);
</script></body></html>"""


class _QueueStream:
    """Blocking line source for run_interactive, fed by HTTP posts."""

    def __init__(self):
        self.q = queue.Queue()

    def put(self, line: str):
        self.q.put(line)

    def __iter__(self):
        return self

    def __next__(self):
        line = self.q.get()
        if line is None:
            raise StopIteration
        return line


def serve(renderer, port: int = 8000, out_path: str = "preview.png",
          ready_event: threading.Event = None, host: str = "127.0.0.1"):
    """Run the viewer: HTTP server on `host:port` + the interactive
    command loop on the calling thread. Returns when the user sends `q`.
    Binds loopback only by default — the command channel is
    unauthenticated (it can write files via `png <path>` and load
    arbitrary scene paths), so reach it remotely via SSH port-forward
    rather than exposing the port."""
    from .interactive import run_interactive

    stream = _QueueStream()
    log_lines = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):       # quiet
            pass

        def do_GET(self):
            if self.path.startswith("/frame.png"):
                if os.path.exists(out_path):
                    with open(out_path, "rb") as f:
                        data = f.read()
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Cache-Control", "no-store")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self.send_response(404)
                    self.end_headers()
                return
            body = _PAGE.format(log=html.escape(
                "\n".join(log_lines[-12:]))).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            q = parse_qs(self.rfile.read(n).decode())
            cmd = (q.get("c") or [""])[0].strip()
            if cmd:
                log_lines.append("> " + cmd)
                stream.put(cmd + "\n")
            self.send_response(303)
            self.send_header("Location", "/")
            self.end_headers()

    server = ThreadingHTTPServer((host, port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    if ready_event is not None:
        ready_event.set()
    print(f"viewer: http://localhost:{server.server_address[1]}/ "
          f"(send 'q' to quit)")
    try:
        return run_interactive(renderer, out_path=out_path,
                               input_stream=stream)
    finally:
        server.shutdown()
