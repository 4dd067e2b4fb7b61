#!/usr/bin/env python
"""TPU parity check: supercluster trace kernel + streamed resolve (v4)
vs the flat production kernels, on egyptcat (forced via FLT_SC_THRESHOLD=1)
or the big 5x4 grid scene. Run on real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

scene_file = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/assets/egyptcat/egyptcat.obj"

import jax, jax.numpy as jnp
from fluctus_tpu.scene.scene import Scene
from fluctus_tpu.accel.bvh import build_bvh
from fluctus_tpu.accel import mxu_trace as mt
from fluctus_tpu.vec import Vec3

sc = Scene(); sc.load_model(scene_file)
p, nrm, uv, mid = sc.triangle_arrays()
print("tris", len(p))
t0 = time.time(); bvh = build_bvh(p); print("bvh", time.time()-t0)
t0 = time.time()
m = mt.MXUScene.build(p, bvh, normals=nrm, uvs=uv, mat_ids=mid,
                      materials=sc.materials, atlas=sc.device_textures(),
                      slim=(len(p) > 65536))
print("mxu build", time.time()-t0, "clusters", m.n_clusters, "supers", m.n_superclusters)

rng = np.random.default_rng(0)
n = 1 << 17
lo = np.asarray(m.cluster_box)[:, 0:3].min(0)
hi = np.asarray(m.cluster_box)[:, 3:6].max(0)
ctr = np.asarray(m.center)
o = rng.uniform(lo - 0.2*(hi-lo), hi + 0.2*(hi-lo), (n, 3)) + ctr
d = rng.normal(size=(n, 3)); d /= np.linalg.norm(d, axis=1, keepdims=True)
orig = Vec3(*[jnp.asarray(o[:, k], jnp.float32) for k in range(3)])
dirs = Vec3(*[jnp.asarray(d[:, k], jnp.float32) for k in range(3)])

def run():
    t, tri, u, v, col = mt.closest_hit_mxu_full(orig, dirs, m)
    t = np.asarray(t); tri = np.asarray(tri)
    occ = np.asarray(mt.any_hit_mxu(orig, dirs, jnp.full(n, 1e30, jnp.float32), m))
    row = np.asarray(mt.resolve_hits_mxu(orig, dirs, jnp.asarray(t), jnp.asarray(col), m))
    return t, tri, occ, row, np.asarray(col)

# flat (reference) config
os.environ["FLT_SC_THRESHOLD"] = "999999"
t1, tri1, occ1, row1, col1 = run()
# forced supercluster + streamed resolve
os.environ["FLT_SC_THRESHOLD"] = "1"; os.environ["FLT_RESOLVE_V"] = "4"
t2, tri2, occ2, row2, col2 = run()

hit1 = tri1 >= 0; hit2 = tri2 >= 0
print("hits", hit1.sum(), hit2.sum(), "agree", (hit1 == hit2).mean())
assert (hit1 == hit2).all()
dt = np.abs(t1[hit1] - t2[hit1]) / np.maximum(np.abs(t1[hit1]), 1e-6)
print("t rel err max", dt.max())
assert dt.max() < 1e-4
same_tri = (tri1 == tri2)
print("same winner tri frac", same_tri[hit1].mean())
assert same_tri[hit1].mean() > 0.999   # coplanar ties may differ
print("any_hit agree", (occ1 == occ2).mean()); assert (occ1 == occ2).all()
mask = same_tri & hit1
dr = np.abs(row1[mask] - row2[mask]).max()
print("resolve row max abs diff (same winners)", dr)
assert dr < 2e-2
print("PARITY OK")
