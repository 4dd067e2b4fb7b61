#!/usr/bin/env python
"""Standalone trace-kernel microbenchmark on the real TPU.

Times closest-hit and any-hit over egyptcat with camera-ray and
bounce-like ray distributions. Timing uses a dependent chain ending in a
scalar transfer (block_until_ready is unreliable on this PJRT).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from fluctus_tpu import compile_cache
    if jax.default_backend() == "tpu":
        compile_cache.enable()

    from fluctus_tpu.accel.mxu_trace import (MXUScene, closest_hit_mxu,
                                             any_hit_mxu, RAY_TILE)
    from fluctus_tpu.accel import build_bvh, SplitMode
    from fluctus_tpu.scene import Scene
    from fluctus_tpu.vec import Vec3

    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/assets/egyptcat/egyptcat.obj"
    n = int(os.environ.get("N_RAYS", str(1 << 20)))
    csize = int(os.environ.get("CLUSTER", "256"))

    sc = Scene()
    sc.load_model(scene_path)
    p, nrm, uv, mid = sc.triangle_arrays()
    print(f"{scene_path}: {p.shape[0]} tris")
    t0 = time.time()
    bvh = build_bvh(p, mode=SplitMode.SAH)
    print(f"BVH: {bvh.num_nodes} nodes in {time.time()-t0:.1f}s")
    t0 = time.time()
    mxu = MXUScene.build(p, bvh, cluster_size=csize, normals=nrm, uvs=uv,
                         mat_ids=mid, materials=sc.materials)
    print(f"MXUScene: {mxu.n_clusters} clusters x {mxu.cluster_size} "
          f"({time.time()-t0:.1f}s)")

    # camera-like rays: origin above/front, directions toward bbox jittered
    lo = p.reshape(-1, 3).min(0)
    hi = p.reshape(-1, 3).max(0)
    c = (lo + hi) / 2
    ext = float(np.max(hi - lo))
    rng = np.random.default_rng(0)
    eye = c + np.array([0.0, 0.35 * ext, 1.6 * ext])
    tgt = c[None, :] + (rng.random((n, 3)) - 0.5) * (hi - lo)[None, :] * 1.2
    d = tgt - eye[None, :]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_cam = Vec3(*(jnp.full(n, v, jnp.float32) for v in eye))
    d_cam = Vec3(*(jnp.asarray(d[:, k], jnp.float32) for k in range(3)))

    # bounce-like rays: origins on surface bbox, random directions
    po = c[None, :] + (rng.random((n, 3)) - 0.5) * (hi - lo)[None, :]
    dd = rng.normal(size=(n, 3))
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o_bnc = Vec3(*(jnp.asarray(po[:, k], jnp.float32) for k in range(3)))
    d_bnc = Vec3(*(jnp.asarray(dd[:, k], jnp.float32) for k in range(3)))

    def timeit(name, fn, *args, iters=8):
        r = fn(*args)          # compile
        _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0][:1])[0])
        t0 = time.time()
        for _ in range(iters):
            r = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0][:1])[0])
        dt = (time.time() - t0) / iters
        print(f"{name:28s} {dt*1e3:8.2f} ms   {n/dt/1e6:8.1f} Mrays/s")
        return dt

    timeit("closest camera", lambda o, dv: closest_hit_mxu(o, dv, mxu)[0],
           o_cam, d_cam)
    timeit("closest bounce", lambda o, dv: closest_hit_mxu(o, dv, mxu)[0],
           o_bnc, d_bnc)
    timeit("anyhit shadow (len=.3ext)",
           lambda o, dv: any_hit_mxu(o, dv, jnp.full(n, 0.3 * ext), mxu),
           o_bnc, d_bnc)
    hits = np.asarray(closest_hit_mxu(o_cam, d_cam, mxu)[1])
    print(f"camera hit rate: {(hits >= 0).mean():.3f}")


if __name__ == "__main__":
    main()
