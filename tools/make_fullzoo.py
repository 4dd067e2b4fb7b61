#!/usr/bin/env python
"""Generate the country_kitchen-class material-zoo stress scene.

The reference's milestone-5 workload is country_kitchen (~500k tris,
7 BXDF types, dozens of textures, bump maps; settings_default.json
"country_kitchen" shortcut, tracer.cpp:419-424) — its .obj does not ship
in this image (only the .mtl + textures), so this composes an equivalent
stress load from the shipped geometry via the .sc.json format plus its
per-instance ``materials`` override extension (scene.py:load_scene_file):

  - 24 open-field egyptcat statues (16,014 tris each): GLOSSY textured,
    plus variants overridden to diffuse w/ kitchen textures and a
    normal-mapped variant (cushion-bump.jpg as map_N — a bump image,
    but it exercises the tangent-space normal path with real UVs)
  - 8 teapots cycling the remaining lobes: ideal_reflection,
    ideal_dielectric, ggx_rough_reflection (inferred), ggx_rough_dielectric
    (inferred), emissive, mixed, glossy, plain diffuse
  - 4 gold_rings (textured diffuse bark + ideal_reflection rings)
  - 4 psor prisms (ideal_dielectric, ground shells stripped)

Total ~521k triangles, every BXDF type in bxdf_types.py, >=5 textures
incl. a normal map. Camera/light/bench config: data/bigscene/zoo.bm.json
and the bench.py full_zoo_500k entry.

Usage: python tools/make_fullzoo.py [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os

A = "/root/reference/assets"
CAT = f"{A}/egyptcat/egyptcat.obj"
TEAPOT = f"{A}/teapot.ply"
RINGS = f"{A}/gold_rings/gold_rings_bark.obj"
PSOR = f"{A}/psor/psor-cube.obj"
KTX = f"{A}/country_kitchen/textures"

CAT_SKIP = ["mag_ground", "mat_light"]      # room shell + door light
SPAN = 26.0

TEAPOT_MATS = [
    {"<default>": {"shader": "ideal_reflection",
                   "Ks": [1.0, 0.85, 0.45]}},
    {"<default>": {"shader": "ideal_dielectric",
                   "Ks": [0.96, 0.99, 0.96], "Ni": 1.52}},
    # no shader tag: inferred GGX_ROUGH_REFLECTION (Kd+Ks, Ni>1, Ns>1)
    {"<default>": {"Kd": [0.2, 0.1, 0.05], "Ks": [0.9, 0.6, 0.3],
                   "Ni": 1.45, "Ns": 220.0}},
    # explicit tag: Ks==Kt would trip the ideal-dielectric inference
    # rule first (scene.cpp:271-285), so the rough variant needs it
    {"<default>": {"shader": "rough_dielectric", "Ks": [0.9, 0.9, 0.95],
                   "Kt": [0.9, 0.9, 0.95], "Ni": 1.45, "Ns": 90.0}},
    {"<default>": {"shader": "emissive", "Ke": [6.0, 4.5, 2.5]}},
    # no shader, Kd+Ks with Ni=1: infers BXDF_MIXED (scene.cpp:319-321)
    {"<default>": {"Kd": [0.7, 0.2, 0.2], "Ks": [0.3, 0.3, 0.3],
                   "Ni": 1.0}},
    {"<default>": {"shader": "glossy", "Kd": [0.1, 0.3, 0.6],
                   "Ni": 1.4, "Ns": 600.0}},
    {"<default>": {"shader": "diffuse", "Kd": [0.8, 0.15, 0.1]}},
]

CAT_VARIANTS = [
    None,                                            # shipped glossy+texture
    {"egyptcat": {"shader": "diffuse", "Kd": [0.9, 0.9, 0.9],
                  "map_Kd": f"{KTX}/Tea-Towel.jpg"}},
    {"egyptcat": {"shader": "diffuse", "Kd": [0.9, 0.9, 0.9],
                  "map_Kd": f"{KTX}/Country-Kitchen-JayHardy.png"}},
    {"egyptcat": {"map_N": f"{KTX}/cushion-bump.jpg"}},   # keep glossy
]


def make_fullzoo(out: str | None = None):
    out = out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "bigscene", "full_zoo.sc.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    entries = []
    # 6x4 statue field centered on origin
    for r in range(4):
        for c in range(6):
            e = {"file": CAT, "skipMaterials": CAT_SKIP,
                 "translation": [(c - 2.5) * SPAN, 0.0, (r - 1.5) * SPAN]}
            v = CAT_VARIANTS[(r * 6 + c) % len(CAT_VARIANTS)]
            if v:
                e["materials"] = v
            entries.append(e)
    # teapots down the central aisle (scaled up to statue scale)
    for i, mats in enumerate(TEAPOT_MATS):
        entries.append({"file": TEAPOT, "scale": 2.2,
                        "translation": [(i - 3.5) * 13.0, 0.0, 0.5 * SPAN],
                        "materials": mats})
    # gold rings at the corners
    for i in range(4):
        entries.append({"file": RINGS, "scale": 3.0,
                        "translation": [(-1.5 + 3.0 * (i % 2)) * SPAN, 0.0,
                                        (-1.5 + 3.0 * (i // 2)) * SPAN]})
    # psor prisms along the far edge (strip their ground planes)
    for i in range(4):
        entries.append({"file": PSOR, "scale": 2.0,
                        "skipMaterials": ["Ground_01_MAT"],
                        "translation": [(i - 1.5) * 30.0, 0.0, -2.6 * SPAN]})
    with open(out, "w") as f:
        json.dump(entries, f, indent=1)
    print(f"wrote {out}: {len(entries)} instances")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    make_fullzoo(ap.parse_args().out)
