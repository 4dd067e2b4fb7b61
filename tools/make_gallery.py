#!/usr/bin/env python
"""Render the gallery images on TPU: egyptcat + teapot + gold_rings
wavefront renders, plus the denoised egyptcat pair (noisy 8spp vs
denoised, reference denoiser flow tracer.cpp:339-356)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ASSETS = "/root/reference/assets"
OUT = os.path.join(os.path.dirname(__file__), "..", "gallery")


def main():
    from fluctus_tpu import compile_cache
    compile_cache.enable()
    from fluctus_tpu.renderer import Renderer
    from fluctus_tpu.settings import Settings

    os.makedirs(OUT, exist_ok=True)

    # --- egyptcat denoised pair (use_denoiser accumulates guide features)
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 6
    s.use_denoiser = True
    r = Renderer(960, 540, settings=s, data_dir="data")
    r.load_scene(f"{ASSETS}/egyptcat/egyptcat.obj",
                 env_map=f"{ASSETS}/env_maps/night.hdr")
    r.init_wavefront(1 << 19)
    r.render_wavefront(24)
    r.film = r.wavefront_film()
    r.save_image(os.path.join(OUT, "egyptcat_noisy.png"))
    r.save_denoised(os.path.join(OUT, "egyptcat_denoised.png"))
    print("wrote egyptcat noisy/denoised pair", flush=True)

    # --- gold_rings
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 6
    s.camera.pos = (-1.93, 5.2, 8.5)
    s.camera.dir = (0.0, -0.49, -0.87)
    r = Renderer(960, 540, settings=s, data_dir="data")
    r.load_scene(f"{ASSETS}/gold_rings/gold_rings_bark.obj",
                 env_map=f"{ASSETS}/env_maps/night.hdr")
    r.init_wavefront(1 << 19)
    r.render_wavefront(48)
    r.film = r.wavefront_film()
    r.save_image(os.path.join(OUT, "gold_rings_wavefront.png"))
    print("wrote gold_rings", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())