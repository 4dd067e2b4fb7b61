"""ASCII PLY loader, matching the reference's own parser
(src/scene.cpp:352-484): reads vertex x/y/z (+ optional nx/ny/nz), tri and
quad faces (quads split into two triangles i0i1i2 / i2i3i0), and assigns
flat normals when the file has none.
"""

from __future__ import annotations

import numpy as np


def load_ply(path: str, scene, transform=None):
    with open(path, "r", errors="replace") as f:
        # --- header ---
        elements = []  # (name, count, [props])
        props = []
        name, count = None, 0
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "element":
                if name is not None:
                    elements.append((name, count, props))
                name, count, props = parts[1], int(parts[2]), []
            elif parts[0] == "property":
                props.append(parts[-1])
            elif parts[0] == "end_header":
                if name is not None:
                    elements.append((name, count, props))
                break

        positions, normals, faces = [], [], []
        for ename, ecount, eprops in elements:
            if ename == "vertex":
                idx = {p: i for i, p in enumerate(eprops)}
                has_n = "nx" in idx
                rows = np.loadtxt(f, max_rows=ecount, dtype=np.float32,
                                  ndmin=2)
                positions = rows[:, [idx["x"], idx["y"], idx["z"]]]
                if has_n:
                    normals = rows[:, [idx["nx"], idx["ny"], idx["nz"]]]
            elif ename == "face":
                for _ in range(ecount):
                    vals = f.readline().split()
                    k = int(vals[0])
                    ids = [int(v) for v in vals[1:1 + k]]
                    if k == 3:
                        faces.append(ids)
                    elif k == 4:
                        faces.append([ids[0], ids[1], ids[2]])
                        faces.append([ids[2], ids[3], ids[0]])
                    else:
                        raise ValueError("unsupported polygon size %d" % k)
            else:
                for _ in range(ecount):
                    f.readline()

    F = np.asarray(faces, np.int64)
    P = np.asarray(positions, np.float32)
    p = P[F]
    if transform is not None:
        p = transform.apply(p)

    if len(normals):
        n = np.asarray(normals, np.float32)[F]
    else:
        flat = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        flat /= np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-20)
        n = np.repeat(flat[:, None, :], 3, axis=1)

    t = np.zeros((len(F), 3, 2), np.float32)
    mat_id = np.zeros(len(F), np.int32)  # default material
    scene.append_triangles(p, n, t, mat_id)
