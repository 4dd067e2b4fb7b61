#!/usr/bin/env python
"""Generate a conference-scale benchmark scene.

The reference's headline benchmark is defined on conference.obj (~331k
triangles, /root/reference/src/tracer.cpp:419-424) and milestone 5 on
country_kitchen (~500k), but neither .obj ships in this image (only
.mtl/textures). This tool composes an instanced grid of egyptcat
(16,026 tris each) via the multi-model ``.sc.json`` format
(scene.cpp:864-897 analogue) to reach the same scale — the workload that
exercises SBVH at depth, the supercluster traversal tier, and
HBM-resident tables.

Usage:  python tools/make_bigscene.py [--cols 5 --rows 4] [--out PATH]

Default 5x4 grid = 320,520 triangles (conference scale).
"""

from __future__ import annotations

import argparse
import json
import os

MODEL = "/root/reference/assets/egyptcat/egyptcat.obj"
# egyptcat world bounds (measured): x [-11.77, 10.64], z [-8.32, 14.09]
SPAN_X = 23.0
SPAN_Z = 23.0
TRIS_PER_INSTANCE = 16026


def make_bigscene(cols: int = 5, rows: int = 4, out: str | None = None,
                  model: str = MODEL, open_field: bool = False):
    """open_field: strip each instance's room shell + door light
    (materials mag_ground / mat_light — egyptcat is a statue sealed in a
    12-triangle box) via the .sc.json skipMaterials extension. The result
    is an open field of statues: an EXTERIOR camera then has every
    instance visible at once, so per-tile candidate lists span the whole
    supercluster table — the workload the 2-level traversal tier exists
    for (interior cameras only ever see one instance's clusters)."""
    tag = "_open" if open_field else ""
    out = out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "bigscene", f"big_egyptcat_{cols}x{rows}{tag}.sc.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    entries = []
    # center the grid on the origin so the original egyptcat camera state
    # (looking at one cat) stays a sensible interior viewpoint
    x0 = -0.5 * (cols - 1) * SPAN_X
    z0 = -0.5 * (rows - 1) * SPAN_Z
    for r in range(rows):
        for c in range(cols):
            e = {
                "file": model,
                "translation": [x0 + c * SPAN_X, 0.0, z0 + r * SPAN_Z],
            }
            if open_field:
                e["skipMaterials"] = ["mag_ground", "mat_light"]
            entries.append(e)
    with open(out, "w") as f:
        json.dump(entries, f, indent=1)
    n = cols * rows * (16000 if open_field else TRIS_PER_INSTANCE)
    print(f"wrote {out}: {cols}x{rows} grid, ~{n:,} triangles")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=5)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--model", default=MODEL)
    ap.add_argument("--open", action="store_true", dest="open_field",
                    help="strip room shells (skipMaterials) — exterior-"
                         "visible field of statues")
    args = ap.parse_args()
    make_bigscene(args.cols, args.rows, args.out, args.model,
                  args.open_field)
