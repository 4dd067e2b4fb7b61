"""Browser live viewer (PTWindow stand-in): HTTP server + the REPL
command interpreter, driven over real sockets."""

import json
import os
import time
import threading
import urllib.parse
import urllib.request

from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings
from fluctus_tpu.viewer import serve


def test_viewer_http_roundtrip(tmp_path):
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    s.wf_buffer_size = 2048
    r = Renderer(16, 16, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    out = str(tmp_path / "frame.png")
    ready = threading.Event()
    port = 18732
    result = {}

    def run():
        result["n"] = serve(r, port=port, out_path=out, ready_event=ready)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(30)
    base = f"http://127.0.0.1:{port}"
    page = urllib.request.urlopen(base + "/", timeout=10).read().decode()
    assert "fluctus_tpu" in page

    def post(cmd):
        data = urllib.parse.urlencode({"c": cmd}).encode()
        urllib.request.urlopen(base + "/cmd", data=data, timeout=120)

    # toolbar widget panel is served (nanogui analogue)
    for wid in ("integrator", "depth", "rr", "maxspp", "scale", "fov",
                "aperture", "tonemap", "exposure", "denoise", "blend",
                "envstrength", "al_size", "al_int", "al_color"):
        assert f'id="{wid}"' in page, f"missing widget {wid}"

    post("spp 1")
    post("w")           # camera forward + refresh -> writes the frame

    # widget commands land in the live state (updateGUI round-trip):
    # posts enqueue asynchronously — poll /state.json until both applied
    post("depth 5")
    post("exposure 1.7")
    deadline = time.time() + 150
    st = {}
    while time.time() < deadline:
        st = json.loads(urllib.request.urlopen(
            base + "/state.json", timeout=30).read())
        if st.get("depth") == 5 and abs(st.get("exposure", 0) - 1.7) < 1e-9:
            break
        time.sleep(1.0)
    assert st["depth"] == 5 and abs(st["exposure"] - 1.7) < 1e-9
    assert st["integrator"] == "wf"
    assert st["al_color"].startswith("#") and len(st["al_color"]) == 7

    # the q POST's 303 redirect-follow GET races server shutdown once the
    # command queue is empty — tolerate a reset on that final request
    try:
        post("q")
    except (urllib.error.URLError, OSError):
        pass
    t.join(180)
    assert not t.is_alive()
    assert result["n"] == 5
    assert os.path.exists(out)
    # the `w` was executed before shutdown
    assert r.settings.camera.pos[2] < 4.0
