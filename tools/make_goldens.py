#!/usr/bin/env python
"""Render the milestone-config golden images (BASELINE's RMSE axis,
reference protocol tracer.cpp:108-182: fixed camera/state, batch spp).

Four configs (SURVEY milestones):
  1. teapot-diffuse    — teapot.ply, env light
  2. teapot-dielectric — teapot.ply, glass override, env light
  3. gold_rings        — gold_rings_bark.obj (GGX metal), env light
  4. egyptcat          — egyptcat.obj (GGX + texture), committed state

Writes tests/goldens/<name>.npz (linear HDR, float16, plus the spp) at
GOLD_W x GOLD_H. Run on the TPU; tests/test_golden.py gates CPU renders
against these with a noise-aware RMSE threshold, and this script's
--check mode re-renders at full spp and applies the tight 1e-2 gate.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLD_W, GOLD_H = 160, 90
GOLD_SPP = 256
ASSETS = "/root/reference/assets"


def configs():
    from fluctus_tpu.settings import Settings

    out = []

    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 6
    s.camera.pos = (0.0, 1.2, 4.2)
    s.camera.dir = (0.0, -0.18, -1.0)
    out.append(("teapot_diffuse", f"{ASSETS}/teapot.ply",
                f"{ASSETS}/env_maps/night.hdr", s, None))

    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 8
    s.camera.pos = (0.0, 1.2, 4.2)
    s.camera.dir = (0.0, -0.18, -1.0)

    def make_glass(scene):
        from fluctus_tpu import bxdf_types as bx
        for m in scene.materials:
            m.type = bx.BXDF_IDEAL_DIELECTRIC
            m.Ni = 1.5
            m.Kt = (0.95, 0.95, 0.95)
        scene.material_types = bx.BXDF_IDEAL_DIELECTRIC
    out.append(("teapot_dielectric", f"{ASSETS}/teapot.ply",
                f"{ASSETS}/env_maps/night.hdr", s, make_glass))

    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 6
    s.camera.pos = (-1.93, 5.2, 8.5)
    s.camera.dir = (0.0, -0.49, -0.87)
    out.append(("gold_rings", f"{ASSETS}/gold_rings/gold_rings_bark.obj",
                f"{ASSETS}/env_maps/night.hdr", s, None))

    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 6
    out.append(("egyptcat", f"{ASSETS}/egyptcat/egyptcat.obj",
                f"{ASSETS}/env_maps/night.hdr", s, None))
    return out


def render(name, scene_file, env, settings, mutate, spp, w=GOLD_W, h=GOLD_H):
    from fluctus_tpu.renderer import Renderer
    r = Renderer(w, h, settings=settings,
                 data_dir=os.path.join(os.path.dirname(__file__), "..",
                                       "data"))
    r.load_scene(scene_file, env_map=env, use_saved_state=(name == "egyptcat"))
    if mutate is not None:
        mutate(r.scene)
        r.reload_materials()
    r.render_single_wavefront(spp=spp)
    img = r.hdr_image()
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="re-render at golden spp and RMSE-gate vs goldens")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from fluctus_tpu import compile_cache
    compile_cache.enable()

    gdir = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
    os.makedirs(gdir, exist_ok=True)
    fails = 0
    for name, f, env, s, mut in configs():
        if args.only and args.only not in name:
            continue
        img = render(name, f, env, s, mut, GOLD_SPP)
        path = os.path.join(gdir, f"{name}.npz")
        if args.check:
            ref = np.load(path)["hdr"].astype(np.float32)
            rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
            ok = rmse <= 1e-2
            fails += not ok
            print(f"{name}: RMSE {rmse:.5f} {'OK' if ok else 'FAIL'}")
        else:
            np.savez_compressed(path, hdr=img.astype(np.float16),
                                spp=GOLD_SPP, w=GOLD_W, h=GOLD_H)
            print(f"wrote {path} (mean {img.mean():.4f})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())