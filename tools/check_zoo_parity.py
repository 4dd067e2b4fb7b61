#!/usr/bin/env python
"""full_zoo wf-vs-mk cross-integrator parity on TPU (round-5 verdict
item 4's done-bar: "a golden + parity gate lands for it").

Same independence argument as tests/test_milestone_parity.py — the two
integrators share BSDF/env/camera code but have independent control
flow, MIS accumulation order, splat paths and RNG usage — applied to
the 521k-tri material-zoo composition, which the CPU suite cannot
afford to render (minutes per integrator per run). Runs both
integrators at ZOO_W x ZOO_H x ZOO_SPP and gates tonemapped RMSE,
4x4-box RMSE and the tonemapped-mean energy diff.

Exit 0 = all gates pass (sweep section protocol)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ZOO_W, ZOO_H = 160, 90
ZOO_SPP = int(os.environ.get("ZOO_SPP", "32"))


def _tonemap(img):
    return np.clip(img / (1.0 + img), 0.0, 1.0)


def _box4(img):
    h, w = img.shape[:2]
    return img[:h // 4 * 4, :w // 4 * 4].reshape(
        h // 4, 4, w // 4, 4, -1).mean(axis=(1, 3))


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from fluctus_tpu import compile_cache
    compile_cache.enable()
    import make_goldens

    case = [c for c in make_goldens.configs() if c[0] == "full_zoo"][0]
    name, scene_file, env, settings, mutate = case
    if not os.path.exists(scene_file):
        from make_fullzoo import make_fullzoo
        make_fullzoo(scene_file)

    from fluctus_tpu.renderer import Renderer
    data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "data")

    def build():
        import copy
        r = Renderer(ZOO_W, ZOO_H, settings=copy.deepcopy(settings),
                     data_dir=data_dir)
        r.load_scene(scene_file, env_map=env, use_saved_state=False)
        return r

    r = build()
    r.render_single_wavefront(spp=ZOO_SPP)
    img_wf = r.hdr_image()
    del r

    # On TPU render_single routes to the exact-spp wavefront unless
    # FLT_FORCE_MK=1 (renderer.py render_single docstring) — without
    # the override this tool compared wavefront to wavefront and the
    # first sweep run printed a vacuous rmse 0.0000. Force the true mk
    # megastep for the second arm.
    os.environ["FLT_FORCE_MK"] = "1"
    try:
        r2 = build()
        r2.render_single(spp=ZOO_SPP)
        img_mk = r2.hdr_image()
    finally:
        os.environ.pop("FLT_FORCE_MK", None)

    assert np.isfinite(img_wf).all() and np.isfinite(img_mk).all()
    assert img_wf.mean() > 1e-3 and img_mk.mean() > 1e-3
    assert not np.array_equal(np.asarray(img_wf), np.asarray(img_mk)), \
        "wf and mk produced bit-identical images — the mk arm did not " \
        "run the mk integrator (vacuous parity)"
    a, b = _tonemap(img_wf), _tonemap(img_mk)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    rmse4 = float(np.sqrt(np.mean((_box4(a) - _box4(b)) ** 2)))
    d_tm = abs(a.mean() - b.mean()) / max(b.mean(), 1e-9)
    print(f"full_zoo wf-vs-mk @{ZOO_W}x{ZOO_H}x{ZOO_SPP}spp: "
          f"rmse {rmse:.4f} box4 {rmse4:.4f} d_tm {d_tm * 100:.3f}%")
    # gates: set from the per-config floor protocol (1.3x measured) once
    # a hardware measurement exists; until then the generic milestone
    # gates (test_milestone_parity.py GATES default) apply
    g_rmse = float(os.environ.get("ZOO_GATE_RMSE", "0.07"))
    g_box4 = float(os.environ.get("ZOO_GATE_BOX4", "0.03"))
    g_tm = float(os.environ.get("ZOO_GATE_TM", "0.012"))
    ok = rmse < g_rmse and rmse4 < g_box4 and d_tm < g_tm
    print("ZOO PARITY", "OK" if ok else
          f"FAIL (gates {g_rmse}/{g_box4}/{g_tm})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
