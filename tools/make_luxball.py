#!/usr/bin/env python
"""Generate the luxball stand-in scene (milestone config 2, BASELINE.json):
the reference's luxball.obj does not ship in this image, so this builds the
same stress case procedurally — a glass SHELL (outer + inner sphere
surfaces, ideal dielectric, nested media transitions) around a DIFFUSE
core sphere, on a diffuse ground plane, lit by the HDR environment with
MIS. Exercises nested dielectric enter/exit chains and caustic-ish paths
that a solid glass object (teapot_dielectric) does not
(ideal_dielectric.cl:10-45 double-interface behavior).

Writes data/luxball/luxball.obj + .mtl (custom ``shader`` MTL tag,
scene.cpp:122-142 convention). Deterministic output — committed to the
repo; re-run only to regenerate.
"""
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "luxball")


def uv_sphere(center, radius, n_lat=24, n_lon=48, flip=False):
    """Returns (verts [V,3], faces [F,3] 0-based). flip inverts winding
    (inward-facing normals for the shell's inner surface)."""
    cx, cy, cz = center
    verts = [(cx, cy + radius, cz)]
    for i in range(1, n_lat):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2.0 * np.pi * j / n_lon
            verts.append((cx + radius * np.sin(th) * np.cos(ph),
                          cy + radius * np.cos(th),
                          cz + radius * np.sin(th) * np.sin(ph)))
    verts.append((cx, cy - radius, cz))
    bot = len(verts) - 1
    faces = []
    ring = lambda i, j: 1 + (i - 1) * n_lon + (j % n_lon)
    for j in range(n_lon):
        faces.append((0, ring(1, j + 1), ring(1, j)))
    for i in range(1, n_lat - 1):
        for j in range(n_lon):
            a, b = ring(i, j), ring(i, j + 1)
            c, d = ring(i + 1, j), ring(i + 1, j + 1)
            faces.append((a, b, d))
            faces.append((a, d, c))
    for j in range(n_lon):
        faces.append((bot, ring(n_lat - 1, j), ring(n_lat - 1, j + 1)))
    f = np.asarray(faces, np.int64)
    if flip:
        f = f[:, ::-1]
    return np.asarray(verts, np.float64), f


def main():
    os.makedirs(OUT, exist_ok=True)
    parts = []   # (material, verts, faces)

    # glass shell: outer r=1.0, inner r=0.85 (inverted winding so the
    # inner surface's normals face the enclosed air gap)
    c = (0.0, 1.05, 0.0)
    parts.append(("glass", *uv_sphere(c, 1.0)))
    parts.append(("glass", *uv_sphere(c, 0.85, flip=True)))
    # diffuse core inside the shell
    parts.append(("core", *uv_sphere(c, 0.6, n_lat=18, n_lon=36)))
    # ground plane
    g = 6.0
    pv = np.asarray([(-g, 0.0, -g), (g, 0.0, -g), (g, 0.0, g), (-g, 0.0, g)])
    pf = np.asarray([(0, 1, 2), (0, 2, 3)], np.int64)
    parts.append(("ground", pv, pf))

    with open(os.path.join(OUT, "luxball.mtl"), "w") as m:
        m.write("newmtl glass\nshader ideal_dielectric\n"
                "Ks 1.0 1.0 1.0\nKt 0.98 0.98 0.98\nNi 1.5\n\n")
        m.write("newmtl core\nshader diffuse\nKd 0.65 0.25 0.08\n\n")
        m.write("newmtl ground\nshader diffuse\nKd 0.55 0.55 0.55\n")

    with open(os.path.join(OUT, "luxball.obj"), "w") as o:
        o.write("mtllib luxball.mtl\n")
        base = 1
        for mat, v, f in parts:
            o.write(f"usemtl {mat}\n")
            for x, y, z in v:
                o.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
            for a, b, cc in f:
                o.write(f"f {a + base} {b + base} {cc + base}\n")
            base += len(v)
    ntri = sum(len(f) for _, _, f in parts)
    print(f"wrote {OUT}/luxball.obj ({ntri} tris)")


if __name__ == "__main__":
    main()
