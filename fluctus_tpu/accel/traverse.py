"""BVH traversal in pure JAX — TPU-first design.

The reference offers stack-based and bitstack traversals (src/bvh.cl). On TPU
the *bitstack* variant (bvh.cl:10-230) is the right shape: per-ray state is a
handful of scalars (node index + two stack words), there are no per-lane
scatter writes (a 64-entry stack array would need one per push), and every
step is elementwise VPU work plus lane-wide 1D gathers of node/triangle data.

We flatten the reference's nested backtracking loop into a two-mode state
machine (DESCEND / BACKTRACK) inside one ``lax.while_loop`` so all rays run in
lockstep with masking. Traversal order (near child first) and hit semantics
match bvh.cl:232-374 exactly; the bitstack is widened to 2x uint32 so the
full MaxDepth=64 (bvh.hpp:67) fits (the reference's int stacks silently
truncate past depth 32).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..vec import Vec3, cross, dot, gather as vgather
from .bvh import BVHArrays

F32_MAX = jnp.float32(np.finfo(np.float32).max)
EPSILON = 1e-12  # intersect.cl:63


class TrianglesDevice(NamedTuple):
    """Device triangle data. v0/e1/e2 feed Moller-Trumbore; the rest is
    gathered once per ray after traversal for hit reconstruction."""
    v0: Vec3
    e1: Vec3
    e2: Vec3
    n0: Vec3
    n1: Vec3
    n2: Vec3
    t0u: jnp.ndarray
    t0v: jnp.ndarray
    t1u: jnp.ndarray
    t1v: jnp.ndarray
    t2u: jnp.ndarray
    t2v: jnp.ndarray
    mat_id: jnp.ndarray

    @staticmethod
    def from_arrays(p, n, t, mat_id) -> "TrianglesDevice":
        """p [M,3,3], n [M,3,3], t [M,3,2], mat_id [M] (host numpy)."""
        v = lambda a: Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
                           jnp.asarray(a[:, 2]))
        p = np.asarray(p, np.float32)
        n = np.asarray(n, np.float32)
        t = np.asarray(t, np.float32)
        return TrianglesDevice(
            v0=v(p[:, 0]), e1=v(p[:, 1] - p[:, 0]), e2=v(p[:, 2] - p[:, 0]),
            n0=v(n[:, 0]), n1=v(n[:, 1]), n2=v(n[:, 2]),
            t0u=jnp.asarray(t[:, 0, 0]), t0v=jnp.asarray(t[:, 0, 1]),
            t1u=jnp.asarray(t[:, 1, 0]), t1v=jnp.asarray(t[:, 1, 1]),
            t2u=jnp.asarray(t[:, 2, 0]), t2v=jnp.asarray(t[:, 2, 1]),
            mat_id=jnp.asarray(np.asarray(mat_id, np.int32)))


import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVHDevice:
    bmin: Vec3                  # [Nn]
    bmax: Vec3
    right_or_start: jnp.ndarray  # int32
    parent: jnp.ndarray          # int32
    n_prims: jnp.ndarray         # int32
    indices: jnp.ndarray         # int32 [K]
    # static: leaf-test unroll length (not traced)
    max_leaf: int = dataclasses.field(metadata=dict(static=True), default=8)

    @staticmethod
    def from_host(bvh: BVHArrays) -> "BVHDevice":
        return BVHDevice(
            bmin=Vec3(jnp.asarray(bvh.box_min[:, 0]),
                      jnp.asarray(bvh.box_min[:, 1]),
                      jnp.asarray(bvh.box_min[:, 2])),
            bmax=Vec3(jnp.asarray(bvh.box_max[:, 0]),
                      jnp.asarray(bvh.box_max[:, 1]),
                      jnp.asarray(bvh.box_max[:, 2])),
            right_or_start=jnp.asarray(bvh.right_or_start.astype(np.int32)),
            parent=jnp.asarray(bvh.parent),
            n_prims=jnp.asarray(bvh.n_prims.astype(np.int32)),
            indices=jnp.asarray(bvh.indices.astype(np.int32)),
            max_leaf=max(1, bvh.max_leaf_size()))


# ---------------------------------------------------------------------------
# Primitive tests (intersect.cl ports, vectorized)
# ---------------------------------------------------------------------------

def intersect_aabb(orig: Vec3, inv_dir: Vec3, bmin: Vec3, bmax: Vec3, t_prev):
    """Slab test (intersect.cl:41-60). Returns (hit, tmin)."""
    t1 = (bmin - orig) * inv_dir
    t2 = (bmax - orig) * inv_dir
    tminv = Vec3(jnp.minimum(t1.x, t2.x), jnp.minimum(t1.y, t2.y),
                 jnp.minimum(t1.z, t2.z))
    tmaxv = Vec3(jnp.maximum(t1.x, t2.x), jnp.maximum(t1.y, t2.y),
                 jnp.maximum(t1.z, t2.z))
    tmin = jnp.maximum(jnp.maximum(tminv.x, tminv.y), tminv.z)
    tmax = jnp.minimum(jnp.minimum(tmaxv.x, tmaxv.y), tmaxv.z)
    hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin < t_prev)
    return hit, tmin


def intersect_triangle(orig: Vec3, d: Vec3, v0: Vec3, e1: Vec3, e2: Vec3):
    """Moller-Trumbore (intersect.cl:62-93). Returns (ok, t, u, v)."""
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    ok = jnp.abs(det) >= EPSILON
    idet = 1.0 / jnp.where(ok, det, 1.0)
    tvec = orig - v0
    u = dot(tvec, pvec) * idet
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * idet
    t = dot(e2, qvec) * idet
    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    return ok, t, u, v


# ---------------------------------------------------------------------------
# 64-bit bitstack as uint32 pairs
# ---------------------------------------------------------------------------

def _shl(lo, hi):
    return lo << 1, (hi << 1) | (lo >> 31)


def _shr(lo, hi):
    return (lo >> 1) | (hi << 31), hi >> 1


def _empty(lo, hi):
    return (lo | hi) == 0


# ---------------------------------------------------------------------------
# Lockstep traversal state machine
# ---------------------------------------------------------------------------

def _traverse(orig: Vec3, d: Vec3, tris: TrianglesDevice, bvh: BVHDevice,
              t_max, any_hit: bool):
    n = orig.x.shape[0]
    u0 = jnp.zeros(n, jnp.uint32)
    inv_dir = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    n_nodes = bvh.parent.shape[0]
    n_idx = bvh.indices.shape[0]

    state = dict(
        top=jnp.zeros(n, jnp.int32),
        l_lo=u0, l_hi=u0, r_lo=u0, r_hi=u0,
        backtrack=jnp.zeros(n, bool),
        done=jnp.zeros(n, bool),
        t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)),
        tri=jnp.full(n, -1, jnp.int32),
        u=jnp.zeros(n, jnp.float32),
        v=jnp.zeros(n, jnp.float32),
    )

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        topc = jnp.clip(s["top"], 0, n_nodes - 1)
        nprims = jnp.take(bvh.n_prims, topc)
        ros = jnp.take(bvh.right_or_start, topc)
        par = jnp.take(bvh.parent, topc)

        active = ~s["done"]
        descend = active & ~s["backtrack"]
        backtrack = active & s["backtrack"]
        is_leaf = descend & (nprims > 0)
        is_inner = descend & (nprims == 0)

        # ---- inner: test both children, pick near first (bvh.cl:53-91) ----
        li = topc + 1
        ri = jnp.clip(ros, 0, n_nodes - 1)
        lhit, lt = intersect_aabb(orig, inv_dir, vgather(bvh.bmin, li),
                                  vgather(bvh.bmax, li), s["t"])
        rhit, rt = intersect_aabb(orig, inv_dir, vgather(bvh.bmin, ri),
                                  vgather(bvh.bmax, ri), s["t"])
        lhit &= is_inner
        rhit &= is_inner
        both = lhit & rhit
        left_first = lt <= rt
        go_left = (both & left_first) | (lhit & ~rhit)
        go_right = (both & ~left_first) | (rhit & ~lhit)
        inner_descend = go_left | go_right

        push_l = both & left_first
        push_r = both & ~left_first
        nl_lo = jnp.where(push_l, s["l_lo"] | 1, s["l_lo"])
        nr_lo = jnp.where(push_r, s["r_lo"] | 1, s["r_lo"])
        sl_lo, sl_hi = _shl(nl_lo, s["l_hi"])
        sr_lo, sr_hi = _shl(nr_lo, s["r_hi"])

        # ---- leaf: masked triangle tests (bvh.cl:253-279), rolled as a
        # fori_loop so the compiled body holds ONE triangle test (an 8-way
        # unroll multiplied compile time ~20x on the TPU toolchain) --------
        def leaf_body(j, carry):
            t_best, tri_best, u_best, v_best, occluded = carry
            lane = is_leaf & (j < nprims)
            slot = jnp.clip(ros + j, 0, n_idx - 1)
            tidx = jnp.take(bvh.indices, slot)
            ok, t, uu, vv = intersect_triangle(
                orig, d,
                vgather(tris.v0, tidx), vgather(tris.e1, tidx),
                vgather(tris.e2, tidx))
            closer = lane & ok & (t > 0.0) & (t < t_best)
            if any_hit:
                occluded = occluded | closer
            else:
                t_best = jnp.where(closer, t, t_best)
                tri_best = jnp.where(closer, tidx, tri_best)
                u_best = jnp.where(closer, uu, u_best)
                v_best = jnp.where(closer, vv, v_best)
            return (t_best, tri_best, u_best, v_best, occluded)

        t_best, tri_best, u_best, v_best, occluded = jax.lax.fori_loop(
            0, bvh.max_leaf, leaf_body,
            (s["t"], s["tri"], s["u"], s["v"], jnp.zeros(n, bool)))

        # ---- backtrack one level (bvh.cl:94-125) ---------------------------
        l_bit = (s["l_lo"] & 1) != 0
        r_bit = (s["r_lo"] & 1) != 0
        stacks_empty = _empty(s["l_lo"], s["l_hi"]) & _empty(s["r_lo"], s["r_hi"])
        bt_done = backtrack & stacks_empty
        bt_l = backtrack & ~stacks_empty & l_bit
        bt_r = backtrack & ~stacks_empty & ~l_bit & r_bit
        bt_up = backtrack & ~stacks_empty & ~l_bit & ~r_bit

        # visit right sibling: clear low l bit then shift both
        bl_lo, bl_hi = _shl(s["l_lo"] & ~jnp.uint32(1), s["l_hi"])
        blr_lo, blr_hi = _shl(s["r_lo"], s["r_hi"])
        # visit left sibling: clear low r bit then shift both
        br_lo, br_hi = _shl(s["r_lo"] & ~jnp.uint32(1), s["r_hi"])
        brl_lo, brl_hi = _shl(s["l_lo"], s["l_hi"])
        # pop one level
        up_l_lo, up_l_hi = _shr(s["l_lo"], s["l_hi"])
        up_r_lo, up_r_hi = _shr(s["r_lo"], s["r_hi"])

        new = dict(s)
        new["top"] = jnp.where(go_left, li,
                     jnp.where(go_right, ri,
                     jnp.where(bt_l, ri,
                     jnp.where(bt_r, topc + 1,
                     jnp.where(bt_up, par, s["top"])))))
        new["l_lo"] = jnp.where(inner_descend, sl_lo,
                      jnp.where(bt_l, bl_lo,
                      jnp.where(bt_r, brl_lo,
                      jnp.where(bt_up, up_l_lo, s["l_lo"]))))
        new["l_hi"] = jnp.where(inner_descend, sl_hi,
                      jnp.where(bt_l, bl_hi,
                      jnp.where(bt_r, brl_hi,
                      jnp.where(bt_up, up_l_hi, s["l_hi"]))))
        new["r_lo"] = jnp.where(inner_descend, sr_lo,
                      jnp.where(bt_l, blr_lo,
                      jnp.where(bt_r, br_lo,
                      jnp.where(bt_up, up_r_lo, s["r_lo"]))))
        new["r_hi"] = jnp.where(inner_descend, sr_hi,
                      jnp.where(bt_l, blr_hi,
                      jnp.where(bt_r, br_hi,
                      jnp.where(bt_up, up_r_hi, s["r_hi"]))))
        # leaf processed or dead inner -> backtrack mode; sibling visit -> descend
        new["backtrack"] = jnp.where(is_leaf | (is_inner & ~inner_descend), True,
                           jnp.where(bt_l | bt_r, False, s["backtrack"]))
        new["done"] = s["done"] | bt_done
        if not any_hit:
            new["t"], new["tri"], new["u"], new["v"] = (
                t_best, tri_best, u_best, v_best)
        else:
            new["done"] = new["done"] | occluded
            new["tri"] = jnp.where(occluded, 1, s["tri"])  # tri>=0 => occluded
        return new

    out = jax.lax.while_loop(cond, body, state)
    return out


def closest_hit(orig: Vec3, d: Vec3, tris: TrianglesDevice, bvh: BVHDevice,
                t_max=None):
    """Closest hit. Returns (t, tri_idx, u, v); tri_idx = -1 on miss."""
    if t_max is None:
        t_max = F32_MAX
    out = _traverse(orig, d, tris, bvh, t_max, any_hit=False)
    return out["t"], out["tri"], out["u"], out["v"]


def any_hit(orig: Vec3, d: Vec3, t_max, tris: TrianglesDevice,
            bvh: BVHDevice):
    """Occlusion query. Returns bool array."""
    out = _traverse(orig, d, tris, bvh, t_max, any_hit=True)
    return out["tri"] >= 0


# ---------------------------------------------------------------------------
# Brute force (tests / tiny scenes)
# ---------------------------------------------------------------------------

def brute_force_closest(orig: Vec3, d: Vec3, tris: TrianglesDevice):
    """O(N*M) reference intersector used to validate traversal."""
    def per_tri(carry, i):
        t_best, tri_best, u_best, v_best = carry
        v0 = vgather(tris.v0, i)
        e1 = vgather(tris.e1, i)
        e2 = vgather(tris.e2, i)
        ok, t, u, v = intersect_triangle(orig, d, v0, e1, e2)
        closer = ok & (t > 0.0) & (t < t_best)
        return ((jnp.where(closer, t, t_best),
                 jnp.where(closer, i, tri_best),
                 jnp.where(closer, u, u_best),
                 jnp.where(closer, v, v_best)), None)

    n = orig.x.shape[0]
    m = tris.mat_id.shape[0]
    init = (jnp.full(n, F32_MAX), jnp.full(n, -1, jnp.int32),
            jnp.zeros(n), jnp.zeros(n))
    (t, tri, u, v), _ = jax.lax.scan(
        per_tri, init, jnp.arange(m, dtype=jnp.int32))
    return t, tri, u, v
