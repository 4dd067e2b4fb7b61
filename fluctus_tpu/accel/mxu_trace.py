"""MXU ray-triangle intersection — the TPU-native traversal engine.

Why not a BVH walk: on TPU, per-lane data-dependent gathers inside loops
serialize (~7 ns/element measured on v5e), and Mosaic's dynamic_gather is
unsupported by the deployed toolchain; any SIMT-style traversal is therefore
three orders of magnitude off the reference's throughput. The systolic-array
answer: intersect RAY TILES against TRIANGLE CLUSTERS as dense matmuls.

Method (per triangle, precomputed): the affine map W = [e1 e2 n]^-1 with
translation -W v0 takes a world point to (u, v, w) coordinates where the
triangle is the unit right triangle in the w=0 plane. For a ray (o, d):
o' = W(o - c) + t0, d' = W d (both are [B,4] @ [4,M] matmuls against the
column-stacked transforms), then t = -o'_w / d'_w, u = o'_u + t d'_u,
v = o'_v + t d'_v, hit iff t > 0, u >= 0, v >= 0, u + v <= 1 — identical
predicates to the reference's Moller-Trumbore (intersect.cl:62-93), equal
hit-t up to ~1e-7 relative.

Rays are sorted by a coherence key (direction octant | origin morton |
direction LSBs) and cut into tiles; every tile gets a PRIVATE candidate
cluster list from a conservative interval-arithmetic cull + front-to-back
sort done in plain JAX (`_tile_order`), and the Pallas kernel walks that
list in a while loop with per-ray t_best pruning and a conservative
early-out — the reference's stack-traversal work saving (bvh.cl:234-373)
recovered tile-granular. Clusters come from cutting the SAH/SBVH tree into
subtrees of <= cluster_size triangles, so they inherit the reference
hierarchy's build quality. Two kernel layouts exist: rays-on-sublanes
(original, used for interpret-mode tests) and the production
rays-on-lanes layout (`_trace_kernel_rol`, [tc, rt] intermediates) whose
per-candidate cull runs on [1, rt] rows — ~two orders of magnitude
cheaper, which is what makes long candidate lists affordable. A separate
kernel resolves the winner's exact t/u/v, interpolated vertex attributes
and baked material parameters via one-hot matmuls — zero serialized
gathers in the whole hot path.

Measured on v5e (wall-clock, dependent-chain timing, egyptcat 16k tris,
1M rays): ~10-18 Mrays/s closest-hit camera, ~9-12 bounce, ~13-18 any-hit
(the axon tunnel adds ±30% session noise); ~3x the round-1 dense sweep.
"""

from __future__ import annotations

import dataclasses
import os as _os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vec import Vec3
from .bvh import BVHArrays

F32_MAX = np.float32(3.4028235e38)
HIGHEST = jax.lax.Precision.HIGHEST

from .. import flags
# supercluster granularity (member clusters per super, build-time) and the
# cluster count above which the two-level kernel takes over (dispatch-time):
# below it the flat candidate list is cheaper
SC_CLUSTERS = flags.env_int("SC_CLUSTERS", 64)
SC_THRESHOLD = flags.env_int("SC_THRESHOLD", 96)

# bump when any table layout changes (ATTR_*/B16 columns, transform packing,
# cluster/supercluster cut rules) — invalidates on-disk table caches
TABLE_VERSION = 4

# attrs column layout (keep in sync with resolve consumers in core/trace.py)
ATTR_N = 0        # nx, ny, nz
ATTR_UV = 3       # tu, tv
ATTR_MAT = 5      # material id
ATTR_KD = 6       # Kd gamma-linearized (matGetAlbedo semantics), 3
ATTR_KS = 9       # Ks, 3
ATTR_KE = 12      # Ke, 3
ATTR_KT = 15      # Kt, 3
ATTR_NS = 18      # GGX alpha
ATTR_NI = 19
ATTR_D = 20       # dissolve
ATTR_TYPE = 21    # bxdf bits
ATTR_MAP_KD = 22
ATTR_MAP_KS = 23
ATTR_MAP_N = 24
ATTR_TRI = 25     # original triangle index (float-exact below 2^24)
ATTR_HITU = 26    # barycentric u of the hit (written by the resolve kernel)
ATTR_HITV = 27
ATTR_HITT = 28    # exact hit t (recomputed from the winner transform)
# baked texture descriptors (atlas metadata resolved at build time — kills
# the 3 per-map w/h/offset gathers per segment): wh = w*4096 + h (exact in
# f32 below 2^24), off = first texel index (must be < 2^24)
ATTR_TKD_WH = 29
ATTR_TKD_OFF = 30
ATTR_TKS_WH = 31
ATTR_TKS_OFF = 32
ATTR_TN_WH = 33
ATTR_TN_OFF = 34
ATTR_COLS = 40    # padded


class B16:
    """Column offsets of the bf16 resolve table (one row per triangle,
    128 lanes). Every entry is EXACT in bf16 by construction: floats are
    split hi/lo (hi = bf16(x), lo = bf16(x - hi): 16-bit effective
    mantissa), integers into 8-bit chunks (values < 256 are bf16-exact,
    and the one-hot weights are exactly 0/1) — so a single one-pass bf16
    MXU product fetches the whole row with known precision. Map indices
    are stored +1 so the empty (-1) case round-trips through zero rows."""
    TXY_HI = 0       # 12: affine transform rows (x0..3, y0..3, z0..3)
    TXY_LO = 12      # 12
    CF_HI = 24       # 15 const floats: KD3 KS3 KE3 KT3 NS NI D
    CF_LO = 39       # 15
    V0_HI = 54       # 5 per-vertex floats of v0: N3, UV2
    V0_LO = 59
    V1_HI = 64
    V1_LO = 69
    V2_HI = 74
    V2_LO = 79
    MAT = 84         # 2 chunks
    TYPE = 86        # 2
    MAP_KD = 88      # 2 (stored +1)
    MAP_KS = 90      # 2 (stored +1)
    MAP_N = 92       # 2 (stored +1)
    TRI = 94         # 3
    TKD_W = 97       # 2
    TKD_H = 99       # 2
    TKD_OFF = 101    # 3
    TKS_W = 104
    TKS_H = 106
    TKS_OFF = 108
    TN_W = 111
    TN_H = 113
    TN_OFF = 115
    COLS = 128


def _b16_split(x):
    """f32 -> (hi, lo) with hi + lo == x to ~2^-16 relative; both bf16-
    representable."""
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    x = np.asarray(x, np.float32)
    hi = x.astype(bf16).astype(np.float32)
    lo = (x - hi).astype(bf16).astype(np.float32)
    return hi, lo


def _b16_chunks(v, n):
    """non-negative int array -> n 8-bit chunk columns (little-endian)."""
    v = np.asarray(v, np.int64)
    assert (v >= 0).all() and (v < (1 << (8 * n))).all()
    return [((v >> (8 * k)) & 0xFF).astype(np.float32) for k in range(n)]


def _build_attr_b16(a, txy_t):
    """Pack the resolve-v3 bf16 table (see B16) from the per-triangle
    attribute array a [Mpad, 3, ATTR_COLS] and transforms txy_t [Mpad, 12].
    Returned as bfloat16 [Mpad, 128]."""
    import ml_dtypes
    m_pad = a.shape[0]
    tb = np.zeros((m_pad, B16.COLS), np.float32)

    def put_f(col_hi, col_lo, x):
        hi, lo = _b16_split(x)
        w = x.shape[1]
        tb[:, col_hi:col_hi + w] = hi
        tb[:, col_lo:col_lo + w] = lo

    def put_i(col, n, v):
        for k, c in enumerate(_b16_chunks(np.rint(v), n)):
            tb[:, col + k] = c

    put_f(B16.TXY_HI, B16.TXY_LO, txy_t)
    cf = np.concatenate(
        [a[:, 0, ATTR_KD:ATTR_KD + 3], a[:, 0, ATTR_KS:ATTR_KS + 3],
         a[:, 0, ATTR_KE:ATTR_KE + 3], a[:, 0, ATTR_KT:ATTR_KT + 3],
         a[:, 0, ATTR_NS:ATTR_NS + 1], a[:, 0, ATTR_NI:ATTR_NI + 1],
         a[:, 0, ATTR_D:ATTR_D + 1]], axis=1)
    put_f(B16.CF_HI, B16.CF_LO, cf)
    for k, (ch, cl) in enumerate(((B16.V0_HI, B16.V0_LO),
                                  (B16.V1_HI, B16.V1_LO),
                                  (B16.V2_HI, B16.V2_LO))):
        vf = np.concatenate([a[:, k, ATTR_N:ATTR_N + 3],
                             a[:, k, ATTR_UV:ATTR_UV + 2]], axis=1)
        put_f(ch, cl, vf)

    put_i(B16.MAT, 2, a[:, 0, ATTR_MAT])
    put_i(B16.TYPE, 2, a[:, 0, ATTR_TYPE])
    put_i(B16.MAP_KD, 2, a[:, 0, ATTR_MAP_KD] + 1.0)
    put_i(B16.MAP_KS, 2, a[:, 0, ATTR_MAP_KS] + 1.0)
    put_i(B16.MAP_N, 2, a[:, 0, ATTR_MAP_N] + 1.0)
    put_i(B16.TRI, 3, a[:, 0, ATTR_TRI])
    for wh_col, off_col, (cw, chh, co) in (
            (ATTR_TKD_WH, ATTR_TKD_OFF, (B16.TKD_W, B16.TKD_H, B16.TKD_OFF)),
            (ATTR_TKS_WH, ATTR_TKS_OFF, (B16.TKS_W, B16.TKS_H, B16.TKS_OFF)),
            (ATTR_TN_WH, ATTR_TN_OFF, (B16.TN_W, B16.TN_H, B16.TN_OFF))):
        wh = np.rint(a[:, 0, wh_col]).astype(np.int64)
        put_i(cw, 2, wh // 4096)
        put_i(chh, 2, wh % 4096)
        put_i(co, 3, a[:, 0, off_col])
    return tb.astype(ml_dtypes.bfloat16)


# ---------------------------------------------------------------------------
# Cluster construction (host)
# ---------------------------------------------------------------------------

def _cut_supers(bvh: BVHArrays, counts, cluster_lo, super_size: int):
    """Cut the BVH at ``super_size`` refs to form SUPERCLUSTERS — the
    coarse tier over clusters (the analogue of the upper levels of the
    reference's traversal stack, bvh.cl:234-373, which this design cut
    away at cluster granularity). Both cuts come from the same DFS, so
    every supercluster's member clusters are one CONTIGUOUS range of
    cluster ids; returns [n_sc, 3] int64 rows (c0, count, node) plus the
    node boxes. counts/cluster_lo come from _cut_clusters."""
    n_prims = bvh.n_prims.astype(np.int64)
    leaf = n_prims > 0
    parent = bvh.parent.astype(np.int64)
    cut_ok = counts <= super_size
    pbig = np.where(parent >= 0, ~cut_ok[np.maximum(parent, 0)], True)
    cut = np.nonzero(cut_ok & pbig)[0]

    right = bvh.right_or_start.astype(np.int64)
    leaf_start = np.where(leaf, right, np.iinfo(np.int64).max)
    lo_all = np.minimum.accumulate(leaf_start[::-1])[::-1]
    lo = lo_all[cut]
    # member clusters: clusters whose slice starts within the super slice
    c0 = np.searchsorted(cluster_lo, lo, side="left")
    c1 = np.append(c0[1:], len(cluster_lo))
    return cut, c0, c1


def _cut_clusters(bvh: BVHArrays, cluster_size: int):
    """Cut the BVH into subtrees holding <= cluster_size triangle refs.
    Returns list of (index_list_slice, bmin, bmax).

    Fully vectorized (no per-node Python loop — the old walk was seconds at
    country_kitchen scale): subtree ref counts converge in <= depth passes
    of the child recurrence, the cut set is ``count[i] <= cs <
    count[parent[i]]``, and each cut subtree's leaf refs form a CONTIGUOUS
    slice of ``indices`` because every builder here appends leaf indices in
    DFS order — so consecutive cut nodes tile the index array. The slice
    layout is verified and the code falls back to an explicit walk for
    foreign caches that violate it."""
    n_prims = bvh.n_prims.astype(np.int64)
    right = bvh.right_or_start.astype(np.int64)
    nn = bvh.num_nodes
    leaf = n_prims > 0
    inner = ~leaf

    # subtree ref counts: children have larger indices, so the recurrence
    # converges bottom-up in at most tree-depth passes (builder cap: 64)
    counts = np.where(leaf, n_prims, 0)
    li = np.nonzero(inner)[0]
    lchild = li + 1
    rchild = right[li]
    for _ in range(80):
        new = counts[lchild] + counts[rchild]
        if (counts[li] == new).all():
            break
        counts[li] = new

    cut_ok = counts <= cluster_size
    parent = bvh.parent.astype(np.int64)
    pbig = np.where(parent >= 0, ~cut_ok[np.maximum(parent, 0)], True)
    cut = np.nonzero(cut_ok & pbig)[0]

    # first leaf start at-or-after each node (leaf starts increase in DFS
    # node order); consecutive cut slices then tile `indices`
    leaf_start = np.where(leaf, right, np.iinfo(np.int64).max)
    lo_all = np.minimum.accumulate(leaf_start[::-1])[::-1]
    lo = lo_all[cut]
    hi = np.append(lo[1:], len(bvh.indices))

    good = (lo[0] == 0 and (hi >= lo).all()
            and (hi - lo == counts[cut]).all())
    if not good:  # foreign cache with non-DFS leaf order
        return _cut_clusters_walk(bvh, cluster_size, counts), None, None
    return ([(bvh.indices[lo[j]:hi[j]], bvh.box_min[i], bvh.box_max[i])
             for j, i in enumerate(cut)], counts, lo)


def _cut_clusters_walk(bvh: BVHArrays, cluster_size: int, counts):
    """Explicit-stack fallback for caches whose leaf slices aren't DFS-
    contiguous."""
    n_prims = bvh.n_prims
    right = bvh.right_or_start
    clusters = []

    def leaves_of(i):
        out = []
        stack = [i]
        while stack:
            k = stack.pop()
            if n_prims[k] > 0:
                out.append((int(right[k]), int(n_prims[k])))
            else:
                stack.append(k + 1)
                stack.append(int(right[k]))
        return out

    stack = [0]
    while stack:
        i = stack.pop()
        if counts[i] <= cluster_size or n_prims[i] > 0:
            idx = np.concatenate([bvh.indices[s:s + c]
                                  for s, c in leaves_of(i)])
            clusters.append((idx, bvh.box_min[i], bvh.box_max[i]))
        else:
            stack.append(i + 1)
            stack.append(int(right[i]))
    return clusters


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MXUScene:
    """Cluster-sorted triangle transform tables + cluster AABBs."""
    tx: jnp.ndarray        # [4, Mpad] unit-triangle transform, x out-coord
    ty: jnp.ndarray        # [4, Mpad]
    tz: jnp.ndarray        # [4, Mpad] (w coord: plane distance)
    cluster_box: jnp.ndarray  # [n_clusters, 8] bmin3 bmax3 pad2 (centered)
    tri_map: jnp.ndarray      # [Mpad] padded column -> original tri index
    center: jnp.ndarray       # [3] world-space centering offset
    # per-vertex shading attributes [3*Mpad, ATTR_COLS]: rows are the three
    # vertex slots of each triangle; see ATTR_* column constants. Material
    # parameters are baked per-triangle so the winner-resolve matmul yields
    # hit attributes AND ShadingParams with ZERO device gathers (gathers
    # serialize at ~7 ns/element on this TPU). None when built bare.
    attrs: Optional[jnp.ndarray] = None
    # transposed transforms [Mpad, 12]: (tx0..3, ty0..3, tz0..3) per tri,
    # consumed by the resolve kernel to recover exact t, u, v for the winner
    txy_t: Optional[jnp.ndarray] = None
    # coefficient-major transforms [12, Mpad] for the rays-on-lanes kernel
    t12: Optional[jnp.ndarray] = None
    # cluster-blocked transforms [n_clusters*16, tc] (cluster c at sublanes
    # c*16..c*16+12) — DMA/slice-friendly layout for the resolve kernels'
    # exact-f32 winner-transform fetch
    t12b: Optional[jnp.ndarray] = None
    # sub_box/fine_box fed the deleted rol3/rol4/sc3 generations; kept
    # as fields (always None now) for table-cache format compatibility
    sub_box: Optional[jnp.ndarray] = None
    fine_box: Optional[jnp.ndarray] = None
    # bf16 resolve table [Mpad, 128] (B16 layout) — one single-pass MXU
    # one-hot product fetches transforms + all shading attributes
    attr_b16: Optional[jnp.ndarray] = None
    # cluster-blocked TRANSPOSE of attr_b16 [n_clusters*128, tc] (cluster
    # c's [128, tc] block at sublanes c*128..) — feeds the rays-on-lanes
    # resolve v5, whose accumulator/output keep rays on LANES so the
    # epilogue runs full-width rows and consumers slice [1, n] attribute
    # rows instead of lane-strided columns
    b16t: Optional[jnp.ndarray] = None
    # SUPERCLUSTER tier [n_sc, 8]: bmin3 bmax3 (centered) + first member
    # cluster id + member count (both f32-exact) — the coarse level that
    # keeps candidate-list generation O(n_sc) per tile instead of
    # O(n_clusters) (vacuous at conference scale, ~1.9k clusters)
    sc_box: Optional[jnp.ndarray] = None
    # static
    n_clusters: int = dataclasses.field(metadata=dict(static=True), default=1)
    cluster_size: int = dataclasses.field(metadata=dict(static=True), default=256)
    n_superclusters: int = dataclasses.field(metadata=dict(static=True),
                                             default=0)
    # whether attrs carry baked atlas descriptors (ATTR_T*_WH/OFF columns)
    has_tex_meta: bool = dataclasses.field(metadata=dict(static=True),
                                           default=False)

    @staticmethod
    def build(positions: np.ndarray, bvh: BVHArrays,
              cluster_size: int = 256, normals: Optional[np.ndarray] = None,
              uvs: Optional[np.ndarray] = None,
              mat_ids: Optional[np.ndarray] = None,
              materials=None, atlas=None, slim: bool = False,
              return_host: bool = False):
        """positions: [M,3,3] world-space triangle vertices. materials:
        optional list of HostMaterial — baked per-triangle into attrs.
        atlas: optional TextureAtlas whose per-texture w/h/offset descriptors
        are baked per-triangle (texture metadata then costs zero gathers).
        slim: skip the f32 attrs table (resolve v2/v1 fallback input,
        ~0.5 KB/tri) — the bf16 B16 table serves the production resolve;
        used for large scenes where attrs would cost 100s of MB."""
        p = np.asarray(positions, np.float64)
        lo = p.reshape(-1, 3).min(0)
        hi = p.reshape(-1, 3).max(0)
        center = (lo + hi) * 0.5
        p = p - center  # center for f32 precision in the affine transform

        clusters, counts, cluster_lo = _cut_clusters(bvh, cluster_size)
        n_clusters = len(clusters)
        m_pad = n_clusters * cluster_size

        # supercluster tier (coarse cut at SC_CLUSTERS member clusters)
        sc_box = None
        n_sc = 0
        if counts is not None and n_clusters > 1:
            sc_size = SC_CLUSTERS * cluster_size
            sc_nodes, sc_c0, sc_c1 = _cut_supers(bvh, counts, cluster_lo,
                                                 sc_size)
            n_sc = len(sc_nodes)
            sb = np.zeros((n_sc, 8), np.float32)
            sb[:, 0:3] = bvh.box_min[sc_nodes] - center
            sb[:, 3:6] = bvh.box_max[sc_nodes] - center
            sb[:, 6] = sc_c0.astype(np.float32)
            sb[:, 7] = (sc_c1 - sc_c0).astype(np.float32)
            assert sc_c0[0] == 0 and (sc_c1[-1:] == n_clusters).all() \
                and (sc_c1 - sc_c0 >= 1).all(), "super/cluster cut mismatch"
            sc_box = sb

        tri_map = np.full(m_pad, -1, np.int32)
        boxes = np.zeros((n_clusters, 8), np.float32)
        order = np.zeros(m_pad, np.int64)
        used = np.zeros(m_pad, bool)
        for ci, (idx, bmin, bmax) in enumerate(clusters):
            base = ci * cluster_size
            k = len(idx)
            assert k <= cluster_size
            # spatial-split BVHs can duplicate refs inside one subtree —
            # dedupe, the kernel needs each triangle once per cluster
            idx = np.unique(idx)
            k = len(idx)
            order[base:base + k] = idx
            used[base:base + k] = True
            tri_map[base:base + k] = idx
            boxes[ci, 0:3] = bmin - center
            boxes[ci, 3:6] = bmax - center

        tris = p[order]                 # [Mpad,3,3] (garbage rows where unused)
        v0 = tris[:, 0]
        e1 = tris[:, 1] - tris[:, 0]
        e2 = tris[:, 2] - tris[:, 0]
        nrm = np.cross(e1, e2)
        mats = np.stack([e1, e2, nrm], axis=-1)       # [Mpad,3,3]
        det = np.linalg.det(mats)
        ok = used & (np.abs(det) > 1e-30)
        minv = np.zeros((m_pad, 3, 3))
        minv[ok] = np.linalg.inv(mats[ok])
        trans = -np.einsum("mij,mj->mi", minv, v0)
        t4 = np.concatenate([minv.transpose(0, 2, 1), trans[:, None, :]],
                            axis=1)                    # [Mpad,4,3]
        t4[~ok] = 0.0  # forces d'_w == 0 -> never hits

        attrs = None
        if normals is not None:
            a = np.zeros((m_pad, 3, ATTR_COLS), np.float32)
            a[:, :, ATTR_N:ATTR_N + 3] = normals[order]   # [Mpad,3v,3]
            if uvs is not None:
                a[:, :, ATTR_UV:ATTR_UV + 2] = uvs[order]
            if mat_ids is not None:
                mid = mat_ids[order]
                a[:, :, ATTR_MAT] = mid[:, None]
                if materials is not None:
                    # bake per-triangle material parameters (constant across
                    # the 3 vertex slots -> barycentric weights sum to them)
                    def col(get):
                        return np.array([get(materials[i]) for i in
                                         range(len(materials))], np.float32)[mid]
                    kd = col(lambda m: m.Kd) ** 2.2   # matGetAlbedo gamma
                    a[:, :, ATTR_KD:ATTR_KD + 3] = kd[:, None, :]
                    a[:, :, ATTR_KS:ATTR_KS + 3] = col(lambda m: m.Ks)[:, None, :]
                    a[:, :, ATTR_KE:ATTR_KE + 3] = col(lambda m: m.Ke)[:, None, :]
                    a[:, :, ATTR_KT:ATTR_KT + 3] = col(lambda m: m.Kt)[:, None, :]
                    a[:, :, ATTR_NS] = col(lambda m: m.Ns)[:, None]
                    a[:, :, ATTR_NI] = col(lambda m: m.Ni)[:, None]
                    a[:, :, ATTR_D] = col(lambda m: m.d)[:, None]
                    a[:, :, ATTR_TYPE] = col(lambda m: m.type)[:, None]
                    a[:, :, ATTR_MAP_KD] = col(lambda m: m.map_Kd)[:, None]
                    a[:, :, ATTR_MAP_KS] = col(lambda m: m.map_Ks)[:, None]
                    a[:, :, ATTR_MAP_N] = col(lambda m: m.map_N)[:, None]
                    if atlas is not None and getattr(atlas, "count", 0) > 0:
                        # host-side descriptor tuples — reading the device
                        # arrays back here costs a multi-second tunnel sync
                        tw = np.array(atlas.width_t, np.int32)
                        th = np.array(atlas.height_t, np.int32)
                        toff = np.array(atlas.offset_t, np.int32)
                        assert tw.max() < 4096 and th.max() < 4096, \
                            "texture dims must fit the wh-pack (w,h < 4096)"
                        assert toff.max() < (1 << 24), \
                            "atlas offsets must be f32-exact (< 2^24)"

                        def meta(get, wh_col, off_col):
                            ti = np.array([get(materials[i]) for i in
                                           range(len(materials))],
                                          np.int32)[mid]
                            ok_t = ti >= 0
                            ts = np.maximum(ti, 0)
                            wh = np.where(ok_t, tw[ts] * 4096 + th[ts], 0)
                            of = np.where(ok_t, toff[ts], 0)
                            a[:, :, wh_col] = wh.astype(np.float32)[:, None]
                            a[:, :, off_col] = of.astype(np.float32)[:, None]
                        meta(lambda m: m.map_Kd, ATTR_TKD_WH, ATTR_TKD_OFF)
                        meta(lambda m: m.map_Ks, ATTR_TKS_WH, ATTR_TKS_OFF)
                        meta(lambda m: m.map_N, ATTR_TN_WH, ATTR_TN_OFF)
            a[:, :, ATTR_TRI] = order[:, None].astype(np.float32)
            a[~used] = 0.0
            # row layout: vertex-major within the cluster so the weighted
            # one-hot [RT, 3*TC] lines up: rows [0..TC) = v0 of each tri,
            # [TC..2TC) = v1, [2TC..3TC) = v2
            a_tri = a                      # [Mpad, 3, ATTR_COLS] layout
            if slim:
                attrs = True   # sentinel: b16 table still built below
            else:
                a = a.reshape(n_clusters, cluster_size, 3, ATTR_COLS)
                a = a.transpose(0, 2, 1, 3).reshape(
                    n_clusters * 3 * cluster_size, ATTR_COLS)
                attrs = a

        txy_t = np.concatenate([t4[:, :, 0], t4[:, :, 1], t4[:, :, 2]],
                               axis=1).astype(np.float32)  # [Mpad, 12]

        # sub_box/fine_box fed the deleted rol3/rol4/sc3 kernel
        # generations (sweep losers, PERF.md round-5 table); the fields
        # stay on the NamedTuple for table-cache compatibility but are
        # no longer built.
        sub_box = None
        fine_box = None

        attr_b16 = None
        if attrs is not None:
            # `a_tri` holds the pre-reshape [Mpad, 3, ATTR_COLS] layout
            attr_b16 = _build_attr_b16(a_tri, txy_t)
        if attrs is True:
            attrs = None   # slim: B16 only

        # cluster-blocked transforms for the resolve kernels' exact-f32
        # winner-transform fetch: cluster c's 12 transform rows live at
        # sublanes [c*16, c*16+12) (16-row stride keeps dynamic sublane
        # offsets 8-aligned; lane width = cluster_size is DMA-sliceable,
        # unlike the 12-lane-wide txy_t)
        t12 = np.ascontiguousarray(txy_t.T)
        t12b = np.zeros((n_clusters * 16, cluster_size), np.float32)
        t12b.reshape(n_clusters, 16, cluster_size)[:, :12] = \
            t12.reshape(12, n_clusters, cluster_size).transpose(1, 0, 2)

        # cluster-blocked transpose of the B16 table for the rays-on-lanes
        # resolve v5 (cluster c's [128, tc] block at sublanes c*128..)
        b16t = None
        if attr_b16 is not None:
            b16t = np.ascontiguousarray(
                attr_b16.reshape(n_clusters, cluster_size, B16.COLS)
                .transpose(0, 2, 1)
                .reshape(n_clusters * B16.COLS, cluster_size))

        # slim (production at >64k tris): drop tables no runtime path can
        # reach at that scale — attr_b16 only feeds b16t, txy_t serves
        # only debug u/v recovery and the interpret resolve, and tx/ty/tz
        # serve only the rays-on-sublanes fallback (FLT_ROL=0).
        # ~295 MB of HBM + cache at 481k tris.
        tx = ty = tz = None
        if slim:
            attr_b16 = None
            if txy_t.size * 4 > (12 << 20):
                txy_t = None
                fine_box = None
        else:
            tx = np.ascontiguousarray(t4[:, :, 0].T, np.float32)
            ty = np.ascontiguousarray(t4[:, :, 1].T, np.float32)
            tz = np.ascontiguousarray(t4[:, :, 2].T, np.float32)

        host = dict(
            sc_box=sc_box, sub_box=sub_box, fine_box=fine_box,
            attr_b16=attr_b16, attrs=attrs,
            b16t=b16t, txy_t=txy_t, t12=t12, t12b=t12b,
            tx=tx, ty=ty, tz=tz,
            cluster_box=boxes, tri_map=tri_map,
            center=center.astype(np.float32))
        statics = dict(
            n_clusters=n_clusters, cluster_size=cluster_size,
            n_superclusters=n_sc,
            has_tex_meta=(atlas is not None and materials is not None
                          and getattr(atlas, "count", 0) > 0))
        if return_host:
            return host, statics
        return MXUScene._from_host(host, statics)

    @staticmethod
    def _from_host(host: dict, statics: dict) -> "MXUScene":
        """Upload the host-built table dict (build / cache load) once."""
        j = lambda k: (jnp.asarray(host[k]) if host.get(k) is not None
                       else None)
        return MXUScene(
            sc_box=j("sc_box"), sub_box=j("sub_box"),
            fine_box=j("fine_box"), attr_b16=j("attr_b16"),
            attrs=j("attrs"), b16t=j("b16t"), txy_t=j("txy_t"), t12=j("t12"),
            t12b=j("t12b"),
            tx=j("tx"), ty=j("ty"), tz=j("tz"),
            cluster_box=j("cluster_box"), tri_map=j("tri_map"),
            center=j("center"), **statics)

    @staticmethod
    def build_cached(cache_path: Optional[str], positions, bvh,
                     progress=None, **kw) -> "MXUScene":
        """build() behind a content-keyed binary table cache — the
        hierarchy-cache philosophy (data/hierarchies, tracer.cpp:934-952)
        applied to the MXU tables, which otherwise cost ~20 s of host
        numpy at 320k tris on every run. The caller keys ``cache_path``
        by scene hash + split mode + cluster size + B16_LAYOUT_VERSION."""
        if cache_path and _os.path.exists(cache_path):
            z = np.load(cache_path, allow_pickle=False)
            host = {k: (None if z[k].ndim == 0 else z[k])
                    for k in ("sc_box", "sub_box", "fine_box", "attr_b16",
                              "attrs", "b16t", "txy_t", "t12", "t12b", "tx",
                              "ty", "tz", "cluster_box", "tri_map",
                              "center")}
            import ml_dtypes
            for k in ("attr_b16", "b16t"):
                if host[k] is not None:
                    host[k] = host[k].view(ml_dtypes.bfloat16)
            statics = dict(
                n_clusters=int(z["n_clusters"]),
                cluster_size=int(z["cluster_size"]),
                n_superclusters=int(z["n_superclusters"]),
                has_tex_meta=bool(z["has_tex_meta"]))
            return MXUScene._from_host(host, statics)
        host, statics = MXUScene.build(positions, bvh, return_host=True, **kw)
        if cache_path:
            _os.makedirs(_os.path.dirname(cache_path), exist_ok=True)
            out = {k: (np.zeros(()) if v is None else
                       (v.view(np.uint16) if k in ("attr_b16", "b16t")
                        else v))
                   for k, v in host.items()}
            out.update(statics)
            tmp = cache_path + ".tmp.npz"   # .npz suffix: savez won't append
            np.savez(tmp, **out)
            _os.replace(tmp, cache_path)
        return MXUScene._from_host(host, statics)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _trace_kernel(o_ref, d_ref, tm_ref, ord_ref, cons_ref,
                  tx_ref, ty_ref, tz_ref, box_ref, t_ref, i_ref,
                  *, rt, tc, n_clusters, any_hit):
    """One ray tile. The kernel walks the tile's private candidate-cluster
    list (precomputed by `_tile_order`: conservatively culled, sorted
    front-to-back by the tile's lower-bound entry distance) in a while loop
    that exits as soon as (a) the list hits its -1 sentinel or (b) the next
    candidate's conservative tnear exceeds the worst remaining t_best in
    the tile — the vector-machine analogue of the reference's stack
    traversal early-out (bvh.cl:234-373 `tnear > hit->t` pruning).

    The K=4 affine transforms are evaluated as VPU broadcast-FMAs — on this
    toolchain an f32 MXU matmul at HIGHEST precision decomposes into 6
    passes and dominated the kernel (measured 5x slower than needed).

    Winner selection is ONE packed min-reduction: positive-float bit
    patterns sort like integers, so key = (bitcast(t) & ~(tc-1)) | col picks
    the closest triangle and its column together (t quantized by ~2^-13
    relative; u, v are recovered exactly in the resolve kernel).

    In any-hit mode a blocked ray zeroes its t_ref slot so the early-out
    `t_worst <= 0` fires once the whole tile is occluded."""
    t_ref[:] = tm_ref[:]
    i_ref[:] = jnp.full((rt, 1), -1, jnp.int32)

    O = o_ref[:]                     # [rt, 4]: centered origin, w=1
    D = d_ref[:]                     # [rt, 4]: direction, w=0
    inv = 1.0 / jnp.where(D[:, 0:3] == 0.0, 1e-30, D[:, 0:3])
    colbits = tc - 1                 # tc is a power of two

    def cond(carry):
        slot, stop = carry
        return (slot < n_clusters) & ~stop

    def body(carry):
        slot, _ = carry
        c = ord_ref[0, slot, 0]
        t_best = t_ref[:]

        # ---- cluster AABB cull: per-ray slab test for the tile ------------
        box = box_ref[jnp.maximum(c, 0), :]
        t1 = (box[0:3] - O[:, 0:3]) * inv
        t2 = (box[3:6] - O[:, 0:3]) * inv
        tnear = jnp.max(jnp.minimum(t1, t2), axis=1, keepdims=True)
        tfar = jnp.min(jnp.maximum(t1, t2), axis=1, keepdims=True)
        box_hit = (tfar >= 0.0) & (tnear <= tfar) & (tnear < t_best)
        if any_hit:
            box_hit = box_hit & (i_ref[:] < 0)
        live = jnp.any(box_hit) & (c >= 0)

        @pl.when(live)
        def _():
            off = pl.multiple_of(c * tc, 128)
            tx = tx_ref[:, pl.ds(off, tc)]
            ty = ty_ref[:, pl.ds(off, tc)]
            tz = tz_ref[:, pl.ds(off, tc)]
            o0 = O[:, 0:1]
            o1 = O[:, 1:2]
            o2 = O[:, 2:3]
            d0 = D[:, 0:1]
            d1 = D[:, 1:2]
            d2 = D[:, 2:3]
            # broadcast FMAs: [rt,1] x [1,tc]
            oz = o0 * tz[0:1] + o1 * tz[1:2] + o2 * tz[2:3] + tz[3:4]
            dz = d0 * tz[0:1] + d1 * tz[1:2] + d2 * tz[2:3]
            safe = jnp.where(dz == 0.0, 1.0, dz)
            t = -oz / safe
            ox = o0 * tx[0:1] + o1 * tx[1:2] + o2 * tx[2:3] + tx[3:4]
            dx = d0 * tx[0:1] + d1 * tx[1:2] + d2 * tx[2:3]
            u = ox + t * dx
            oy = o0 * ty[0:1] + o1 * ty[1:2] + o2 * ty[2:3] + ty[3:4]
            dy = d0 * ty[0:1] + d1 * ty[1:2] + d2 * ty[2:3]
            v = oy + t * dy
            valid = (dz != 0.0) & (t > 0.0) & \
                (jnp.minimum(jnp.minimum(u, v), 1.0 - u - v) >= 0.0)
            if any_hit:
                tcand = jnp.where(valid, t, F32_MAX)
                tmin = jnp.min(tcand, axis=1, keepdims=True)
                blocked = tmin < t_best
                i_ref[:] = jnp.where(blocked, 1, i_ref[:])
                t_ref[:] = jnp.where(blocked, 0.0, t_ref[:])
            else:
                col = jax.lax.broadcasted_iota(jnp.int32, (rt, tc), 1)
                key = (pltpu.bitcast(t, jnp.int32) & ~colbits) | col
                key = jnp.where(valid, key, jnp.int32(0x7F800000))
                kmin = jnp.min(key, axis=1, keepdims=True)
                tmin = pltpu.bitcast(kmin & ~colbits, jnp.float32)
                better = tmin < t_best
                t_ref[:] = jnp.where(better, tmin, t_ref[:])
                i_ref[:] = jnp.where(better, (kmin & colbits) + c * tc,
                                     i_ref[:])

        # ---- early-out: nothing ahead can beat the worst live t_best ------
        nxt = slot + 1
        guard = jnp.minimum(nxt, n_clusters - 1)
        t_worst = jnp.max(t_ref[:])
        stop = (ord_ref[0, guard, 0] < 0) | (cons_ref[0, guard, 0] > t_worst) \
            | (t_worst <= 0.0)
        return nxt, stop

    t_worst0 = jnp.max(tm_ref[:])
    stop0 = (ord_ref[0, 0, 0] < 0) | (cons_ref[0, 0, 0] > t_worst0) \
        | (t_worst0 <= 0.0)
    jax.lax.while_loop(cond, body, (jnp.int32(0), stop0))


def _trace_kernel_rol(o_ref, tm_ref, ord_ref, cons_ref, t12_ref, box_ref,
                      t_ref, i_ref, *, rt, tc, n_clusters, any_hit):
    """Rays-on-lanes variant: intermediates are [tc, rt] (triangles on
    sublanes, rays on lanes). The per-candidate AABB cull runs on [1, rt]
    rows — ~128x cheaper than the lane-padded [rt, 1] columns of the
    rays-on-sublanes layout — so small ray tiles and long candidate lists
    cost almost nothing beyond the live pair math. The per-cluster
    transform block is sliced [12, tc] from the resident table (128-aligned
    dynamic lane slice) and transposed in-register once per visit."""
    O = o_ref[0]                      # [8, rt]: ox oy oz 1 dx dy dz 0
    o0, o1, o2 = O[0:1], O[1:2], O[2:3]
    d0, d1, d2 = O[4:5], O[5:6], O[6:7]
    eps = 1e-30
    i0 = 1.0 / jnp.where(d0 == 0.0, eps, d0)
    i1 = 1.0 / jnp.where(d1 == 0.0, eps, d1)
    i2 = 1.0 / jnp.where(d2 == 0.0, eps, d2)
    tm = tm_ref[0]                    # [1, rt]
    t_ref[0] = tm
    i_ref[0] = jnp.full((1, rt), -1, jnp.int32)
    rowbits = tc - 1

    def cond(carry):
        slot, stop = carry
        return (slot < n_clusters) & ~stop

    def body(carry):
        slot, _ = carry
        c = ord_ref[0, slot, 0]
        t_best = t_ref[0]             # [1, rt]
        box = box_ref[jnp.maximum(c, 0), :]

        ax = (box[0] - o0) * i0
        bx = (box[3] - o0) * i0
        ay = (box[1] - o1) * i1
        by = (box[4] - o1) * i1
        az = (box[2] - o2) * i2
        bz = (box[5] - o2) * i2
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(ax, bx),
                                        jnp.minimum(ay, by)),
                            jnp.minimum(az, bz))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(ax, bx),
                                       jnp.maximum(ay, by)),
                           jnp.maximum(az, bz))
        box_hit = (tfar >= 0.0) & (tnear <= tfar) & (tnear < t_best)
        if any_hit:
            box_hit = box_hit & (i_ref[0] < 0)
        live = jnp.any(box_hit) & (c >= 0)

        @pl.when(live)
        def _():
            off = pl.multiple_of(c * tc, 128)
            TT = t12_ref[:, pl.ds(off, tc)].T        # [tc, 12]
            oz = o0 * TT[:, 8:9] + o1 * TT[:, 9:10] + o2 * TT[:, 10:11] \
                + TT[:, 11:12]
            dz = d0 * TT[:, 8:9] + d1 * TT[:, 9:10] + d2 * TT[:, 10:11]
            t = -oz / jnp.where(dz == 0.0, 1.0, dz)
            ox = o0 * TT[:, 0:1] + o1 * TT[:, 1:2] + o2 * TT[:, 2:3] \
                + TT[:, 3:4]
            dx = d0 * TT[:, 0:1] + d1 * TT[:, 1:2] + d2 * TT[:, 2:3]
            u = ox + t * dx
            oy = o0 * TT[:, 4:5] + o1 * TT[:, 5:6] + o2 * TT[:, 6:7] \
                + TT[:, 7:8]
            dy = d0 * TT[:, 4:5] + d1 * TT[:, 5:6] + d2 * TT[:, 6:7]
            v = oy + t * dy
            valid = (dz != 0.0) & (t > 0.0) & \
                (jnp.minimum(jnp.minimum(u, v), 1.0 - u - v) >= 0.0)
            if any_hit:
                tcand = jnp.where(valid, t, F32_MAX)
                tmin = jnp.min(tcand, axis=0, keepdims=True)
                blocked = tmin < t_best
                i_ref[0] = jnp.where(blocked, 1, i_ref[0])
                t_ref[0] = jnp.where(blocked, 0.0, t_ref[0])
            else:
                row = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)
                key = (pltpu.bitcast(t, jnp.int32) & ~rowbits) | row
                key = jnp.where(valid, key, jnp.int32(0x7F800000))
                kmin = jnp.min(key, axis=0, keepdims=True)
                tmin = pltpu.bitcast(kmin & ~rowbits, jnp.float32)
                better = tmin < t_best
                t_ref[0] = jnp.where(better, tmin, t_ref[0])
                i_ref[0] = jnp.where(better, (kmin & rowbits) + c * tc,
                                     i_ref[0])

        nxt = slot + 1
        guard = jnp.minimum(nxt, n_clusters - 1)
        t_worst = jnp.max(t_ref[0])
        stop = (ord_ref[0, guard, 0] < 0) | (cons_ref[0, guard, 0] > t_worst) \
            | (t_worst <= 0.0)
        return nxt, stop

    t_worst0 = jnp.max(tm)
    stop0 = (ord_ref[0, 0, 0] < 0) | (cons_ref[0, 0, 0] > t_worst0) \
        | (t_worst0 <= 0.0)
    jax.lax.while_loop(cond, body, (jnp.int32(0), stop0))


def _trace_kernel_rol_sc(o_ref, tm_ref, ord_ref, cons_ref, t12_ref, box_ref,
                         scb_ref, t_ref, i_ref, *, rt, tc, n_sc, any_hit):
    """Two-level rays-on-lanes kernel: the tile's candidate list holds
    SUPERCLUSTERS (coarse BVH cut, ~SC_CLUSTERS clusters each); a live
    candidate's member clusters are then swept with per-cluster [1, rt]
    slab culls before any pair math. This keeps the per-tile candidate
    generation and its front-to-back sort O(n_superclusters) — at
    conference scale (~1.9k clusters) a flat cluster-granular list would
    spend more on the [ncl, rt] cull + [nt, ncl] sort than on the trace
    itself. The fine level re-creates the reference stack traversal's
    middle levels (bvh.cl:234-373) tile-granular."""
    O = o_ref[0]                      # [8, rt]: ox oy oz 1 dx dy dz 0
    o0, o1, o2 = O[0:1], O[1:2], O[2:3]
    d0, d1, d2 = O[4:5], O[5:6], O[6:7]
    eps = 1e-30
    i0 = 1.0 / jnp.where(d0 == 0.0, eps, d0)
    i1 = 1.0 / jnp.where(d1 == 0.0, eps, d1)
    i2 = 1.0 / jnp.where(d2 == 0.0, eps, d2)
    tm = tm_ref[0]                    # [1, rt]
    t_ref[0] = tm
    i_ref[0] = jnp.full((1, rt), -1, jnp.int32)
    rowbits = tc - 1

    def slab6(b0, b1, b2, b3, b4, b5, t_best):
        ax = (b0 - o0) * i0
        bx = (b3 - o0) * i0
        ay = (b1 - o1) * i1
        by = (b4 - o1) * i1
        az = (b2 - o2) * i2
        bz = (b5 - o2) * i2
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(ax, bx),
                                        jnp.minimum(ay, by)),
                            jnp.minimum(az, bz))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(ax, bx),
                                       jnp.maximum(ay, by)),
                           jnp.maximum(az, bz))
        hit = (tfar >= 0.0) & (tnear <= tfar) & (tnear < t_best)
        if any_hit:
            hit = hit & (i_ref[0] < 0)
        return hit

    def cond(carry):
        slot, stop = carry
        return (slot < n_sc) & ~stop

    def body(carry):
        slot, _ = carry
        s = ord_ref[0, slot, 0]
        srow = scb_ref[jnp.maximum(s, 0), :]
        live_sc = jnp.any(slab6(srow[0], srow[1], srow[2], srow[3], srow[4],
                                srow[5], t_ref[0])) & (s >= 0)

        @pl.when(live_sc)
        def _():
            c0 = srow[6].astype(jnp.int32)
            cnt = srow[7].astype(jnp.int32)

            def inner(k, _):
                c = c0 + k
                t_best = t_ref[0]
                box = box_ref[c, :]
                live = jnp.any(slab6(box[0], box[1], box[2], box[3], box[4],
                                     box[5], t_best)) & (jnp.max(t_best) > 0.0)

                @pl.when(live)
                def _():
                    off = pl.multiple_of(c * tc, 128)
                    TT = t12_ref[:, pl.ds(off, tc)].T        # [tc, 12]
                    oz = o0 * TT[:, 8:9] + o1 * TT[:, 9:10] \
                        + o2 * TT[:, 10:11] + TT[:, 11:12]
                    dz = d0 * TT[:, 8:9] + d1 * TT[:, 9:10] + d2 * TT[:, 10:11]
                    t = -oz / jnp.where(dz == 0.0, 1.0, dz)
                    ox = o0 * TT[:, 0:1] + o1 * TT[:, 1:2] + o2 * TT[:, 2:3] \
                        + TT[:, 3:4]
                    dx = d0 * TT[:, 0:1] + d1 * TT[:, 1:2] + d2 * TT[:, 2:3]
                    u = ox + t * dx
                    oy = o0 * TT[:, 4:5] + o1 * TT[:, 5:6] + o2 * TT[:, 6:7] \
                        + TT[:, 7:8]
                    dy = d0 * TT[:, 4:5] + d1 * TT[:, 5:6] + d2 * TT[:, 6:7]
                    v = oy + t * dy
                    valid = (dz != 0.0) & (t > 0.0) & \
                        (jnp.minimum(jnp.minimum(u, v), 1.0 - u - v) >= 0.0)
                    if any_hit:
                        tcand = jnp.where(valid, t, F32_MAX)
                        tmin = jnp.min(tcand, axis=0, keepdims=True)
                        blocked = tmin < t_best
                        i_ref[0] = jnp.where(blocked, 1, i_ref[0])
                        t_ref[0] = jnp.where(blocked, 0.0, t_ref[0])
                    else:
                        row = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)
                        key = (pltpu.bitcast(t, jnp.int32) & ~rowbits) | row
                        key = jnp.where(valid, key, jnp.int32(0x7F800000))
                        kmin = jnp.min(key, axis=0, keepdims=True)
                        tmin = pltpu.bitcast(kmin & ~rowbits, jnp.float32)
                        better = tmin < t_best
                        t_ref[0] = jnp.where(better, tmin, t_ref[0])
                        i_ref[0] = jnp.where(better, (kmin & rowbits) + c * tc,
                                             i_ref[0])
                return 0

            jax.lax.fori_loop(0, cnt, inner, 0)

        nxt = slot + 1
        guard = jnp.minimum(nxt, n_sc - 1)
        t_worst = jnp.max(t_ref[0])
        stop = (ord_ref[0, guard, 0] < 0) | (cons_ref[0, guard, 0] > t_worst) \
            | (t_worst <= 0.0)
        return nxt, stop

    t_worst0 = jnp.max(tm)
    stop0 = (ord_ref[0, 0, 0] < 0) | (cons_ref[0, 0, 0] > t_worst0) \
        | (t_worst0 <= 0.0)
    jax.lax.while_loop(cond, body, (jnp.int32(0), stop0))


@partial(jax.jit, static_argnames=("scene_static", "any_hit", "ray_tile",
                                   "interpret"))
def _trace_rol_sc(o4, d4, tmax_col, t12, boxes, sc_boxes, scene_static,
                  any_hit, ray_tile, interpret):
    """Two-level (supercluster) rays-on-lanes dispatch. Candidate lists
    are generated and sorted at SUPERCLUSTER granularity."""
    n_sc, tc = scene_static
    rt = ray_tile
    b = o4.shape[0]
    nt = b // rt

    order, cons = _tile_order_dispatch(o4, d4, tmax_col, sc_boxes, rt,
                                       interpret)
    nsc_pad = order.shape[1]

    rays = jnp.stack([o4[:, 0], o4[:, 1], o4[:, 2], o4[:, 3],
                      d4[:, 0], d4[:, 1], d4[:, 2], d4[:, 3]], axis=0)
    rays = rays.reshape(8, nt, rt).transpose(1, 0, 2)     # [nt, 8, rt]
    tm = tmax_col.reshape(nt, 1, rt)

    kernel = partial(_trace_kernel_rol_sc, rt=rt, tc=tc,
                     n_sc=nsc_pad, any_hit=any_hit)
    t, i = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 8, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsc_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsc_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # t12 resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cluster boxes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # supercluster rows
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1, rt), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, rt), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(t12.size * 4 + (32 << 20), 127 << 20)),
        interpret=interpret,
    )(rays, tm, order, cons, t12, boxes, sc_boxes)
    return t.reshape(b, 1), i.reshape(b, 1)



@partial(jax.jit, static_argnames=("scene_static", "any_hit", "ray_tile",
                                   "interpret"))
def _trace_rol(o4, d4, tmax_col, t12, boxes, scene_static, any_hit,
               ray_tile, interpret):
    """Rays-on-lanes dispatch: rays packed [n_tiles, 8, rt]."""
    n_clusters, tc = scene_static
    rt = ray_tile
    b = o4.shape[0]
    nt = b // rt

    order, cons = _tile_order_dispatch(o4, d4, tmax_col, boxes, rt, interpret)
    ncl_pad = order.shape[1]

    rays = jnp.stack([o4[:, 0], o4[:, 1], o4[:, 2], o4[:, 3],
                      d4[:, 0], d4[:, 1], d4[:, 2], d4[:, 3]], axis=0)
    rays = rays.reshape(8, nt, rt).transpose(1, 0, 2)     # [nt, 8, rt]
    tm = tmax_col.reshape(nt, 1, rt)

    kernel = partial(_trace_kernel_rol, rt=rt, tc=tc,
                     n_clusters=n_clusters, any_hit=any_hit)
    t, i = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 8, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncl_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncl_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1, rt), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, rt), jnp.int32),
        ],
        interpret=interpret,
    )(rays, tm, order, cons, t12, boxes)
    return t.reshape(b, 1), i.reshape(b, 1)


_CULL_INF = np.float32(1e30)


def _tile_order_kernel(o_ref, tm_ref, box_ref, cons_ref, *, rt, ncl,
                       ncl_pad):
    """Exact per-ray slab tests against every cluster AABB, unioned over
    the tile: one [ncl, rt] broadcast computation (no interval
    arithmetic). cons_ref[c] = min over rays of the ray's true entry
    lower bound if ANY ray can enter cluster c within its tmax, else
    +inf. ~25 ops on [ncl, rt] per tile — a few us."""
    O = o_ref[0]                      # [8, rt]
    o0, o1, o2 = O[0:1], O[1:2], O[2:3]
    d0, d1, d2 = O[4:5], O[5:6], O[6:7]
    eps = 1e-30
    i0 = 1.0 / jnp.where(d0 == 0.0, eps, d0)
    i1 = 1.0 / jnp.where(d1 == 0.0, eps, d1)
    i2 = 1.0 / jnp.where(d2 == 0.0, eps, d2)
    tm = tm_ref[0]                    # [1, rt]

    bx0 = box_ref[:, 0:1]             # [ncl, 1]
    by0 = box_ref[:, 1:2]
    bz0 = box_ref[:, 2:3]
    bx1 = box_ref[:, 3:4]
    by1 = box_ref[:, 4:5]
    bz1 = box_ref[:, 5:6]

    ax = (bx0 - o0) * i0              # [ncl, rt]
    bx = (bx1 - o0) * i0
    ay = (by0 - o1) * i1
    by = (by1 - o1) * i1
    az = (bz0 - o2) * i2
    bz = (bz1 - o2) * i2
    tnear = jnp.maximum(jnp.maximum(jnp.minimum(ax, bx),
                                    jnp.minimum(ay, by)),
                        jnp.minimum(az, bz))
    tfar = jnp.minimum(jnp.minimum(jnp.maximum(ax, bx),
                                   jnp.maximum(ay, by)),
                       jnp.maximum(az, bz))
    hit = (tfar >= 0.0) & (tnear <= tfar) & (tnear < tm)
    entry = jnp.where(hit, jnp.maximum(tnear, 0.0), _CULL_INF)
    cons = jnp.min(entry, axis=1, keepdims=True)          # [ncl, 1]
    if ncl_pad > ncl:
        cons = jnp.concatenate(
            [cons, jnp.full((ncl_pad - ncl, 1), _CULL_INF, jnp.float32)],
            axis=0)
    cons_ref[0] = cons


@partial(jax.jit, static_argnames=("rt", "interpret"))
def _tile_order_v2(o4, d4, tmax_col, boxes, rt, interpret=False):
    """Per-tile candidate lists from EXACT per-ray slab tests (pallas),
    sorted front-to-back by the tile's min entry bound. Same contract as
    _tile_order but ~2x tighter lists on divergent bounce tiles (interval
    arithmetic over a tile's direction spread admits nearly every
    cluster; the union of true per-ray tests does not)."""
    b = o4.shape[0]
    nt = b // rt
    ncl = boxes.shape[0]
    ncl_pad = ncl + ((-ncl) % 8)

    rays = jnp.stack([o4[:, 0], o4[:, 1], o4[:, 2], o4[:, 3],
                      d4[:, 0], d4[:, 1], d4[:, 2], d4[:, 3]], axis=0)
    rays = rays.reshape(8, nt, rt).transpose(1, 0, 2)     # [nt, 8, rt]
    tm = tmax_col.reshape(nt, 1, rt)

    kernel = partial(_tile_order_kernel, rt=rt, ncl=ncl, ncl_pad=ncl_pad)
    cons = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 8, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ncl_pad, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, ncl_pad, 1), jnp.float32),
        interpret=interpret,
    )(rays, tm, boxes)

    key = cons[:, :, 0]                                   # [nt, ncl_pad]
    idx = jnp.broadcast_to(jnp.arange(ncl_pad, dtype=jnp.int32)[None, :],
                           (nt, ncl_pad))
    skey, sidx = jax.lax.sort((key, idx), num_keys=1)
    order = jnp.where(skey >= _CULL_INF, -1, sidx)
    return (order.reshape(nt, ncl_pad, 1), skey.reshape(nt, ncl_pad, 1))


def _tile_order_dispatch(o4, d4, tmax_col, boxes, rt, interpret):
    if flags.env("TILE_ORDER", "2") == "2":
        return _tile_order_v2(o4, d4, tmax_col, boxes, rt, interpret)
    return _tile_order(o4, d4, tmax_col, boxes, rt)


def _tile_order(o4, d4, tmax_col, boxes, rt):
    """Per-ray-tile candidate cluster lists (plain JAX, outside the kernel).

    For every (tile, cluster) pair a conservative interval-arithmetic slab
    test decides whether ANY ray in the tile could enter the cluster's AABB
    within its tmax; survivors are sorted by their lower-bound entry
    distance (front-to-back for the whole tile). Returns
      order [n_tiles, ncl_pad, 1] int32 (-1-terminated candidate list)
      cons  [n_tiles, ncl_pad, 1] f32   (conservative tnear per candidate)
    Correctness: a cluster is only dropped when provably unreachable by
    every ray of the tile, and `cons` is a true lower bound, so the
    kernel's `cons > t_worst` early-out never skips a potential closest
    hit. Rays are direction-sorted before tiling (`_sorted_trace`), which
    keeps the per-tile intervals tight."""
    b = o4.shape[0]
    nt = b // rt
    ncl = boxes.shape[0]
    o = o4[:, 0:3].reshape(nt, rt, 3)
    d = d4[:, 0:3].reshape(nt, rt, 3)
    olo = o.min(axis=1)[:, None, :]           # [nt,1,3]
    ohi = o.max(axis=1)[:, None, :]
    dlo = d.min(axis=1)[:, None, :]
    dhi = d.max(axis=1)[:, None, :]
    tm_hi = tmax_col.reshape(nt, rt).max(axis=1)   # [nt]

    # reciprocal interval; a sign change makes the axis unconstraining
    span = (dlo <= 0.0) & (dhi >= 0.0)
    safe_lo = jnp.where(dlo == 0.0, 1e-30, dlo)
    safe_hi = jnp.where(dhi == 0.0, 1e-30, dhi)
    ilo = jnp.where(span, -_CULL_INF, 1.0 / safe_hi)
    ihi = jnp.where(span, _CULL_INF, 1.0 / safe_lo)

    bmin = boxes[None, :, 0:3]                # [1,ncl,3]
    bmax = boxes[None, :, 3:6]

    def imul(alo, ahi):
        """Interval product (a) * (ilo, ihi) -> (lo, hi)."""
        p1, p2 = alo * ilo, alo * ihi
        p3, p4 = ahi * ilo, ahi * ihi
        return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

    ta_lo, ta_hi = imul(bmin - ohi, bmin - olo)    # t at bmin planes
    tb_lo, tb_hi = imul(bmax - ohi, bmax - olo)    # t at bmax planes
    near_lo = jnp.minimum(ta_lo, tb_lo)
    far_hi = jnp.maximum(ta_hi, tb_hi)
    tnear_lo = jnp.max(near_lo, axis=2)            # [nt,ncl]
    tfar_hi = jnp.min(far_hi, axis=2)

    # box-box distance: a direction-independent lower bound on ray travel
    # from any tile origin into the cluster (|p - o| >= dist) — this is the
    # bound that engages when a tile is origin-coherent but direction-mixed
    if flags.env_bool("DIST_LO", True):
        gap = jnp.maximum(jnp.maximum(bmin - ohi, olo - bmax), 0.0)
        dist_lo = jnp.sqrt(jnp.sum(gap * gap, axis=2))  # [nt,ncl]
        tnear_lo = jnp.maximum(tnear_lo, dist_lo)
    cull = (tfar_hi < 0.0) | (tnear_lo > tfar_hi) \
        | (tnear_lo > tm_hi[:, None])

    key = jnp.where(cull, _CULL_INF, jnp.maximum(tnear_lo, 0.0))
    idx = jnp.broadcast_to(
        jnp.arange(ncl, dtype=jnp.int32)[None, :], (nt, ncl))
    skey, sidx = jax.lax.sort((key, idx), num_keys=1)
    order = jnp.where(skey >= _CULL_INF, -1, sidx)
    cap = flags.env_int("CAND_CAP", 0)
    if cap > 0:   # diagnostic: truncate candidate lists (NOT correct)
        order = jnp.where(jnp.arange(ncl)[None, :] < cap, order, -1)

    pad = (-ncl) % 8
    if pad:
        order = jnp.concatenate(
            [order, jnp.full((nt, pad), -1, jnp.int32)], axis=1)
        skey = jnp.concatenate(
            [skey, jnp.full((nt, pad), _CULL_INF, jnp.float32)], axis=1)
    return (order.reshape(nt, ncl + pad, 1),
            skey.reshape(nt, ncl + pad, 1))


def _pad_rays(x, rt):
    n = x.shape[0]
    pad = (-n) % rt
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


@partial(jax.jit, static_argnames=("scene_static", "any_hit", "ray_tile",
                                   "interpret"))
def _trace(o4, d4, tmax_col, scene_arrays, scene_static, any_hit, ray_tile,
           interpret):
    n_clusters, tc = scene_static
    tx, ty, tz, boxes = scene_arrays
    rt = ray_tile
    b = o4.shape[0]

    order, cons = _tile_order_dispatch(o4, d4, tmax_col, boxes, rt, interpret)
    ncl_pad = order.shape[1]

    kernel = partial(_trace_kernel, rt=rt, tc=tc,
                     n_clusters=n_clusters, any_hit=any_hit)
    grid = (b // rt,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncl_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncl_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # full tables resident in VMEM across the sweep
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(o4, d4, tmax_col, order, cons, tx, ty, tz, boxes)
    return out


RAY_TILE = flags.env_int("RAY_TILE", 512)
SORT_RAYS = flags.env_bool("SORT_RAYS", True)
ROL = flags.env_bool("ROL", True)
ROL_TILE = flags.env_int("ROL_TILE", 512)




def _dispatch_trace(o4, d4, tmax_col, scene, any_hit, ray_tile, interpret):
    """Select the trace kernel: two-level supercluster (large scenes),
    rays-on-lanes (ROL) or rays-on-sublanes.

    The rol2 (resident), rol3 (sub-block), rol4 (packed-fine) and sc3
    (supercluster sub-block) generations were sweep-measured in rounds
    3-5 and DELETED per the delete-don't-park rule — rol_v=1 won every
    e2e (16.34 vs 15.08/12.69 Mrays/s, PERF.md round-5 sweep table) and
    SC_SUB=0 won both big-scene entries."""
    sc_threshold = flags.env_int("SC_THRESHOLD", SC_THRESHOLD)
    if ROL and scene.sc_box is not None and scene.t12 is not None \
            and scene.n_clusters > sc_threshold and not interpret:
        return _trace_rol_sc(o4, d4, tmax_col, scene.t12, scene.cluster_box,
                             scene.sc_box,
                             (scene.n_superclusters, scene.cluster_size),
                             any_hit, ROL_TILE, interpret)
    if ROL and scene.t12 is not None and not interpret:
        return _trace_rol(o4, d4, tmax_col, scene.t12, scene.cluster_box,
                          (scene.n_clusters, scene.cluster_size),
                          any_hit, ROL_TILE, interpret)
    assert scene.tx is not None, \
        "rays-on-sublanes fallback unavailable on a slim MXUScene " \
        "(vertex tables dropped at >64k tris; use the ROL/SC kernels)"
    return _trace(o4, d4, tmax_col,
                  (scene.tx, scene.ty, scene.tz, scene.cluster_box),
                  (scene.n_clusters, scene.cluster_size),
                  any_hit, ray_tile, interpret)


def _morton5(q):
    """Spread 5 bits of q to every 3rd bit position (vectorized int32)."""
    return ((q & 1) | ((q & 2) << 2) | ((q & 4) << 4)
            | ((q & 8) << 6) | ((q & 16) << 8))


def _sort_key(o4, d4, lo, hi):
    """Two-level coherence sort key, returned as (major, minor) for a
    two-key lax.sort. Major: direction octant | origin morton (15b) —
    octant-major keeps each tile's direction signs fixed (bounded
    reciprocal intervals for the slab test) and the morton groups
    bounce-ray origins spatially so the per-tile box-distance bound
    engages. Minor: 7-bit-per-axis quantized direction, which orders
    primary rays (identical origins, hence identical major key) into
    tight frusta. lax.sort carries payload operands without gathers, so
    the reorder costs ~2 sorts (~3 ms @1M)."""
    d = d4[:, 0:3]
    o = o4[:, 0:3]
    oct_ = ((d[:, 0] < 0).astype(jnp.int32)
            | ((d[:, 1] < 0).astype(jnp.int32) << 1)
            | ((d[:, 2] < 0).astype(jnp.int32) << 2))
    ext = jnp.maximum(hi - lo, 1e-30)
    qo = jnp.clip((o - lo[None, :]) / ext[None, :] * 31.0, 0.0, 31.0)
    qo = qo.astype(jnp.int32)
    morton = (_morton5(qo[:, 0]) | (_morton5(qo[:, 1]) << 1)
              | (_morton5(qo[:, 2]) << 2))
    qd = jnp.clip((d * 0.5 + 0.5) * 127.0, 0.0, 127.0).astype(jnp.int32)
    minor = (qd[:, 0] << 14) | (qd[:, 1] << 7) | qd[:, 2]
    return (oct_ << 15) | morton, minor


def _perm_apply(perm, cols, mode):
    """Apply a row permutation to f32 columns instead of carrying each
    column through the sort network. The round-5 profile shows each
    carried sort operand staging HBM<->S(1) at ~4.5 ms per f32[1M].
    Two shapes, A/B'd on hardware by tools/bench_perm.py + the r5 sweep:
      mode="gather"     ONE stacked [n,k] row-gather (k pads to 128
                        lanes on TPU — bandwidth-wasteful but a single
                        fused op)
      mode="gather1"    k independent 1-D takes (no lane padding; k
                        dispatches — measured catastrophic, 5.90 e2e)"""
    if mode == "gather1":
        return [jnp.take(c, perm) for c in cols]
    g = jnp.take(jnp.stack(cols, axis=1), perm, axis=0)
    return [g[:, k] for k in range(len(cols))]


def _perm_invert(sidx):
    """inv[sidx[j]] = j — the unsort permutation, via one int32 scatter
    (unique indices; no accumulation)."""
    n = sidx.shape[0]
    return jnp.zeros(n, jnp.int32).at[sidx].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)


def _perm_unsort2(sidx, t_col, i_col, mode):
    """Restore (t f32, i int32) to original ray order by gathering with
    the inverse permutation: one stacked gather (``gather``; int column
    rides as a bitcast — gathers move bits, not values) or two 1-D
    takes (``gather1``)."""
    inv = _perm_invert(sidx)
    if mode == "gather1":
        return jnp.take(t_col, inv), jnp.take(i_col, inv)
    i_f = jax.lax.bitcast_convert_type(i_col, jnp.float32)
    g = jnp.take(jnp.stack([t_col, i_f], axis=1), inv, axis=0)
    return g[:, 0], jax.lax.bitcast_convert_type(g[:, 1], jnp.int32)


def _exit_clamp(o4, d4, tmax_col, lo, hi):
    """Clamp each ray's tmax to its exit distance from the scene root AABB
    (with a safety margin): nothing can be hit beyond it, so (a) rays that
    escape the scene get tmax = 0 and sort into dead tail tiles, and (b)
    the kernel's `cons > t_worst` early-out engages even in tiles that
    contain miss rays — otherwise one such ray (t_best stuck at F32_MAX)
    forces the full candidate sweep for the whole tile. Measured: tiles
    average 35 candidate clusters but only ~4 winner clusters without
    this bound."""
    o = o4[:, 0:3]
    dd = d4[:, 0:3]
    inv = 1.0 / jnp.where(dd == 0.0, 1e-30, dd)
    t1 = (lo[None, :] - o) * inv
    t2 = (hi[None, :] - o) * inv
    tnear = jnp.max(jnp.minimum(t1, t2), axis=1)
    tfar = jnp.min(jnp.maximum(t1, t2), axis=1)
    exit_t = jnp.where((tfar >= tnear) & (tfar > 0.0),
                       tfar * 1.001 + 1e-4, 0.0)
    return jnp.minimum(tmax_col[:, 0], exit_t).reshape(-1, 1)


def _sorted_trace(o4, d4, tmax_col, scene, any_hit, ray_tile, interpret):
    """Sort rays by coherence key, trace, restore order. Gather-free:
    lax.sort moves all payload columns together. Misses return
    t = F32_MAX (the scene-exit clamp makes the raw kernel t meaningless
    for them)."""
    b = o4.shape[0]
    boxes = scene.cluster_box
    lo = jnp.min(boxes[:, 0:3], axis=0)
    hi = jnp.max(boxes[:, 3:6], axis=0)
    const_tmax = bool(tmax_col is None)
    if const_tmax:   # exit clamp IS the tmax; recomputed after the sort
        tmax_col = jnp.full((b, 1), F32_MAX, jnp.float32)
    tmax_col = _exit_clamp(o4, d4, tmax_col, lo, hi)
    key_mode = flags.env("KEY", "oct")
    if any_hit:
        # shadow rays can keep sorting when ext rays run in block-lane
        # order: the occupancy cut (non-pending lanes sort to tail tiles
        # with empty candidate lists) only exists under a sort
        key_mode = flags.env("KEY_SHADOW", key_mode)
    if key_mode == "none":
        # no-sort mode: trace in LANE order. With the block-bound pool
        # (config.block_ring) lanes are already pixel-block-coherent —
        # primary rays share a tile's frustum and bounce rays share the
        # block's hit region — so the per-segment sort/unsort pair can be
        # skipped entirely; tiles are simply lane-order chunks. The
        # per-tile candidate machinery (_tile_order) is layout-agnostic.
        t, i = _dispatch_trace(o4, d4, tmax_col, scene, any_hit,
                               ray_tile, interpret)
        t_out = jnp.where(i[:, 0] >= 0, t[:, 0], F32_MAX)
        return t_out.reshape(b, 1), i
    # the "dir" and "bal" key variants were sweep losers (never beat the
    # oct|morton key in any round-3/4 measurement) and are deleted per
    # the delete-don't-park rule; "oct" and "none" are the measured space
    kmaj, kmin = _sort_key(o4, d4, lo, hi)
    # padding rows (and degenerate tmax<=0 rays) sort to the end so they
    # cannot pollute real tiles' conservative bounds. For the default key
    # (18-bit major) the two keys pack into ONE 30-bit sort key — each
    # operand of a multi-payload lax.sort is an offload-staged column, so
    # fewer operands is a direct win.
    idx = jnp.arange(b, dtype=jnp.int32)
    # PERM_SINGLE, not PERM: the gather permutation on THIS (single-set)
    # path reproducibly crashes the TPU worker ("kernel fault",
    # 2026-08-20 repro: FLT_PERM=gather FLT_PAIR_SORT=0 python bench.py)
    # while the pair path below runs it stably at +75% e2e. Until the
    # fault is isolated, single-set traces (mk integrator, pick, shadow
    # fallback) stay on the sort-carry machinery; the env escape exists
    # for hardware triage only.
    perm_mode = flags.env("PERM_SINGLE", "sort")
    perm_gather = perm_mode in ("gather", "gather1")
    if key_mode == "oct" and not any_hit:
        # shadow (any-hit) rays keep the full 2-key sort: their direction
        # coherence is what makes occlusion tiles cheap, and the packed
        # key drops the z-direction bits (measured 55 -> 75 ms)
        skey = (kmaj << 12) | (kmin >> 9)
        skey = jnp.where(tmax_col[:, 0] <= 0.0, jnp.int32(0x7FFFFFFF), skey)
        if perm_gather:
            _, sidx = jax.lax.sort((skey, idx), num_keys=1)
            cols = [o4[:, 0], o4[:, 1], o4[:, 2],
                    d4[:, 0], d4[:, 1], d4[:, 2]]
            if not const_tmax:
                cols.append(tmax_col[:, 0])
            g = _perm_apply(sidx, cols, perm_mode)
            ox, oy, oz, dx, dy, dz = g[:6]
            tm = g[6] if not const_tmax else None
        else:
            ops = (skey, idx, o4[:, 0], o4[:, 1], o4[:, 2],
                   d4[:, 0], d4[:, 1], d4[:, 2])
            if not const_tmax:
                ops = ops + (tmax_col[:, 0],)
            srt = jax.lax.sort(ops, num_keys=1)
            sidx, ox, oy, oz, dx, dy, dz = srt[1:8]
            tm = srt[8] if not const_tmax else None
    else:
        kmaj = jnp.where(tmax_col[:, 0] <= 0.0, jnp.int32(0x7FFFFFFF), kmaj)
        if perm_gather:
            _, _, sidx = jax.lax.sort((kmaj, kmin, idx), num_keys=2)
            ox, oy, oz, dx, dy, dz, tm = _perm_apply(
                sidx, [o4[:, 0], o4[:, 1], o4[:, 2],
                       d4[:, 0], d4[:, 1], d4[:, 2], tmax_col[:, 0]],
                perm_mode)
        else:
            ops = (kmaj, kmin, idx, o4[:, 0], o4[:, 1], o4[:, 2],
                   d4[:, 0], d4[:, 1], d4[:, 2], tmax_col[:, 0])
            srt = jax.lax.sort(ops, num_keys=2)
            _, _, sidx, ox, oy, oz, dx, dy, dz, tm = srt
    o4s = jnp.stack([ox, oy, oz, jnp.ones(b)], axis=1)
    d4s = jnp.stack([dx, dy, dz, jnp.zeros(b)], axis=1)
    if tm is None:
        tm = _exit_clamp(o4s, d4s,
                         jnp.full((b, 1), F32_MAX, jnp.float32), lo, hi)[:, 0]
    t, i = _dispatch_trace(o4s, d4s, tm.reshape(b, 1), scene, any_hit,
                           ray_tile, interpret)
    # restore original order: sort by the carried original index, or
    # gather by the inverse permutation (FLT_PERM=gather)
    if perm_gather:
        t_out, i_out = _perm_unsort2(sidx, t[:, 0], i[:, 0], perm_mode)
    else:
        _, t_out, i_out = jax.lax.sort((sidx, t[:, 0], i[:, 0]), num_keys=1)
    t_out = jnp.where(i_out >= 0, t_out, F32_MAX)
    return t_out.reshape(b, 1), i_out.reshape(b, 1)


def _sorted_trace_pair(eo4, ed4, so4, sd4, sh_tmax_col, scene, ray_tile,
                       interpret):
    """Shared-order extension+shadow trace (``FLT_PAIR_SORT``).

    A segment's extension ray and shadow ray start at the SAME path
    vertex (the previous hit point, epsilon-offset), so one coherence
    permutation serves both ray sets: ONE 15-operand ``lax.sort`` keyed
    on the extension key carries both ray records, and ONE 3-operand
    unsort restores both results (the shadow verdict rides bit 30 of the
    winner column). That is 18 offload-staged sort columns in 2 sort
    programs, vs 24 columns in 4 programs on the independent path —
    the round-5 profile attributes ~200 ms/seg of async S(1) traffic to
    sort staging/merges against 54 ms of actual trace kernels.

    Trade-offs vs the independent path (measure e2e): the shadow rays
    lose their own direction-octant ordering (they ride the extension
    order; origin coherence is shared, direction coherence is not), and
    non-pending shadow lanes (tmax 0) no longer sort to dead tail tiles.

    Returns (t_ext[b,1], col_ext[b,1], occluded[b] bool) in original
    lane order. Misses have t = F32_MAX, col = -1.
    """
    b = eo4.shape[0]
    boxes = scene.cluster_box
    lo = jnp.min(boxes[:, 0:3], axis=0)
    hi = jnp.max(boxes[:, 3:6], axis=0)
    sh_tm = _exit_clamp(so4, sd4, sh_tmax_col, lo, hi)
    kmaj, kmin = _sort_key(eo4, ed4, lo, hi)
    skey = (kmaj << 12) | (kmin >> 9)
    etm = _exit_clamp(eo4, ed4, jnp.full((b, 1), F32_MAX, jnp.float32),
                      lo, hi)
    skey = jnp.where(etm[:, 0] <= 0.0, jnp.int32(0x7FFFFFFF), skey)
    idx = jnp.arange(b, dtype=jnp.int32)
    pair_perm = flags.env("PERM", "gather")
    if pair_perm in ("gather", "gather1"):
        _, sidx = jax.lax.sort((skey, idx), num_keys=1)
        srt2 = _perm_apply(sidx, [
            eo4[:, 0], eo4[:, 1], eo4[:, 2],
            ed4[:, 0], ed4[:, 1], ed4[:, 2],
            so4[:, 0], so4[:, 1], so4[:, 2],
            sd4[:, 0], sd4[:, 1], sd4[:, 2], sh_tm[:, 0]], pair_perm)
        srt = [None, sidx] + srt2
    else:
        srt = jax.lax.sort(
            (skey, idx, eo4[:, 0], eo4[:, 1], eo4[:, 2],
             ed4[:, 0], ed4[:, 1], ed4[:, 2],
             so4[:, 0], so4[:, 1], so4[:, 2],
             sd4[:, 0], sd4[:, 1], sd4[:, 2], sh_tm[:, 0]),
            num_keys=1)
        sidx = srt[1]
    ones = jnp.ones(b, jnp.float32)
    zeros = jnp.zeros(b, jnp.float32)
    eo4s = jnp.stack([srt[2], srt[3], srt[4], ones], axis=1)
    ed4s = jnp.stack([srt[5], srt[6], srt[7], zeros], axis=1)
    so4s = jnp.stack([srt[8], srt[9], srt[10], ones], axis=1)
    sd4s = jnp.stack([srt[11], srt[12], srt[13], zeros], axis=1)
    stm = srt[14]
    etm_s = _exit_clamp(eo4s, ed4s, jnp.full((b, 1), F32_MAX, jnp.float32),
                        lo, hi)
    t_e, i_e = _dispatch_trace(eo4s, ed4s, etm_s, scene, False,
                               ray_tile, interpret)
    _, i_s = _dispatch_trace(so4s, sd4s, stm.reshape(b, 1), scene, True,
                             ray_tile, interpret)
    # winner col fits [-1, 2^30-2) (padded tri count << 2^30); +1 makes it
    # non-negative so the occlusion verdict can ride bit 30 of one column
    packed = (i_e[:, 0] + 1) | jnp.where(i_s[:, 0] >= 0,
                                         jnp.int32(1 << 30), jnp.int32(0))
    if pair_perm in ("gather", "gather1"):
        t_out, p_out = _perm_unsort2(sidx, t_e[:, 0], packed, pair_perm)
    else:
        _, t_out, p_out = jax.lax.sort((sidx, t_e[:, 0], packed),
                                       num_keys=1)
    occ = (p_out >> 30) > 0
    col = (p_out & ((1 << 30) - 1)) - 1
    t_out = jnp.where(col >= 0, t_out, F32_MAX)
    return t_out.reshape(b, 1), col.reshape(b, 1), occ


def trace_pair_mxu(eorig: Vec3, edir: Vec3, sorig: Vec3, sdir: Vec3,
                   sh_tmax, scene: MXUScene, ray_tile: int = None,
                   interpret: bool = False):
    """Extension closest-hit + shadow occlusion under ONE shared sort
    (see _sorted_trace_pair). Returns (t[n], col[n], occluded[n])."""
    ray_tile = ray_tile or RAY_TILE
    n = eorig.x.shape[0]
    eo4, ed4, _ = _ray_inputs(eorig, edir, scene, None, ray_tile)
    so4, sd4, stm = _ray_inputs(sorig, sdir, scene, sh_tmax, ray_tile)
    t, col, occ = _sorted_trace_pair(eo4, ed4, so4, sd4, stm, scene,
                                     ray_tile, interpret)
    return t[:n, 0], col[:n, 0], occ[:n]


def closest_hit_mxu(orig: Vec3, d: Vec3, scene: MXUScene, t_max=None,
                    ray_tile: int = 512, interpret: bool = False):
    """Returns (t, tri_idx, u, v) like traverse.closest_hit."""
    t, tri, u, v, _ = closest_hit_mxu_full(orig, d, scene, t_max, ray_tile,
                                           interpret)
    return t, tri, u, v


def closest_hit_mxu_full(orig: Vec3, d: Vec3, scene: MXUScene, t_max=None,
                         ray_tile: int = 512, interpret: bool = False):
    """Returns (t, tri, u, v, col). u, v are recovered from the winner's
    transform (8 gathers) — prefer resolve_hits_mxu, which recovers them
    gather-free along with all shading attributes."""
    n = orig.x.shape[0]
    o4, d4, tmax_col = _ray_inputs(orig, d, scene, t_max, ray_tile)
    if SORT_RAYS and not interpret:
        t, i = _sorted_trace(o4, d4,
                             None if t_max is None else tmax_col,
                             scene, False, ray_tile, interpret)
    else:
        t, i = _trace(
            o4, d4, tmax_col,
            (scene.tx, scene.ty, scene.tz, scene.cluster_box),
            (scene.n_clusters, scene.cluster_size),
            False, ray_tile, interpret)
    t = t[:n, 0]
    i = i[:n, 0]
    tri = jnp.where(i >= 0, jnp.take(scene.tri_map, jnp.maximum(i, 0)), -1)
    if scene.txy_t is None:
        # slim tables (production at >64k tris) drop the [Mpad, 12]
        # transposed transforms this debug-path recovery gathers from —
        # return the kernel's packed-winner t (reduced mantissa, column
        # bits spliced in) and u = v = 0; resolve_hits_mxu recovers the
        # exact f32 t/u/v gather-free from the cluster-blocked t12b
        return t, tri, jnp.zeros_like(t), jnp.zeros_like(t), i
    # t, u, v from the winning transform rows (test/debug path)
    safe = jnp.maximum(i, 0)
    tw = jnp.take(scene.txy_t, safe, axis=0)          # [n, 12]
    o4n = o4[:n]
    d4n = d4[:n]
    oz = jnp.sum(o4n * tw[:, 8:12], axis=1)
    dz = jnp.sum(d4n * tw[:, 8:12], axis=1)
    t_exact = -oz / jnp.where(dz == 0.0, 1.0, dz)
    t = jnp.where(i >= 0, t_exact, t)
    ox = jnp.sum(o4n * tw[:, 0:4], axis=1)
    dx = jnp.sum(d4n * tw[:, 0:4], axis=1)
    oy = jnp.sum(o4n * tw[:, 4:8], axis=1)
    dy = jnp.sum(d4n * tw[:, 4:8], axis=1)
    u = ox + t * dx
    v = oy + t * dy
    return t, tri, u, v, i


def _ray_inputs(orig: Vec3, d: Vec3, scene: MXUScene, t_max, ray_tile):
    n = orig.x.shape[0]
    o4 = jnp.stack([orig.x - scene.center[0], orig.y - scene.center[1],
                    orig.z - scene.center[2], jnp.ones(n)], axis=1)
    d4 = jnp.stack([d.x, d.y, d.z, jnp.zeros(n)], axis=1)
    if t_max is None:
        tmax_col = jnp.full((n, 1), F32_MAX, jnp.float32)
    else:
        tmax_col = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                    (n,)).reshape(n, 1)
    o4, _ = _pad_rays(o4, ray_tile)
    d4, _ = _pad_rays(d4, ray_tile)
    tmax_col, _ = _pad_rays(tmax_col, ray_tile)
    return o4, d4, tmax_col


def _resolve_kernel(col_ref, t_ref, o_ref, d_ref, txy_ref, attr_ref,
                    out_ref, *, rt, tc):
    """Winner-attribute fetch WITHOUT gathers. From the winning column the
    kernel (1) recovers exact barycentric u, v by fetching the winner's
    affine transform through a one-hot matmul, then (2) fetches the
    barycentrically-interpolated vertex attributes and baked material
    parameters with a weighted one-hot matmul. Replaces ~16 serialized
    gathers per ray (at ~7 ns/element) with two small MXU products."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros((rt, ATTR_COLS), jnp.float32)

    col = col_ref[:]                      # [rt,1] padded winner column
    local = col - j * tc
    active = (local >= 0) & (local < tc)

    @pl.when(jnp.any(active))
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (rt, tc), 1)
        onehot = ((lane == local) & active).astype(jnp.float32)
        # winner transform rows -> exact t, u, v (the traversal's t is
        # quantized by the packed reduction; recompute from tz)
        tw = jnp.dot(onehot, txy_ref[:], preferred_element_type=jnp.float32,
                     precision=HIGHEST)   # [rt, 12]
        O = o_ref[:]
        D = d_ref[:]
        oz = jnp.sum(O * tw[:, 8:12], axis=1, keepdims=True)
        dz = jnp.sum(D * tw[:, 8:12], axis=1, keepdims=True)
        t = -oz / jnp.where(dz == 0.0, 1.0, dz)
        ox = jnp.sum(O * tw[:, 0:4], axis=1, keepdims=True)
        dx = jnp.sum(D * tw[:, 0:4], axis=1, keepdims=True)
        oy = jnp.sum(O * tw[:, 4:8], axis=1, keepdims=True)
        dy = jnp.sum(D * tw[:, 4:8], axis=1, keepdims=True)
        u = ox + t * dx
        v = oy + t * dy
        w = jnp.concatenate([onehot * (1.0 - u - v), onehot * u, onehot * v],
                            axis=1)       # [rt, 3*tc]
        res = jnp.dot(w, attr_ref[:], preferred_element_type=jnp.float32,
                      precision=HIGHEST)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rt, ATTR_COLS), 1)
        amask = active.astype(jnp.float32)
        res = res + jnp.where(cols == ATTR_HITU, u * amask, 0.0)
        res = res + jnp.where(cols == ATTR_HITV, v * amask, 0.0)
        res = res + jnp.where(cols == ATTR_HITT, t * amask, 0.0)
        out_ref[:] = out_ref[:] + res


@partial(jax.jit, static_argnames=("scene_static", "ray_tile", "interpret"))
def _resolve(col, t, o4, d4, txy, attrs, scene_static, ray_tile, interpret):
    n_clusters, tc = scene_static
    rt = ray_tile
    b = col.shape[0]
    kernel = partial(_resolve_kernel, rt=rt, tc=tc)
    return pl.pallas_call(
        kernel,
        grid=(b // rt, n_clusters),
        in_specs=[
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, 12), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * tc, ATTR_COLS), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, ATTR_COLS), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ATTR_COLS), jnp.float32),
        interpret=interpret,
    )(col, t, o4, d4, txy, attrs)




def _resolve_kernel_v5(colr_ref, rays_ref, tbl_ref, txy_ref, out_ref,
                       acc_ref, txyacc_ref, *, rt, tc):
    """Winner-attribute resolve, v5 (rays on LANES): per winner cluster ONE
    single-pass bf16 one-hot product fetches the whole 128-row B16 block
    (transforms + attributes; every entry bf16-exact by construction — see
    B16) as acc[128, rt], then the epilogue reconstructs values and
    barycentrically interpolates the per-vertex floats at full f32
    precision, all on full-width [w, rt] rows.

    vs the retired rays-on-sublanes v3: the [rt, 1] column ops that wasted
    127/128 lanes become [1, rt] rows, and the OUTPUT is the SoA
    [ATTR_COLS, n] matrix whose per-attribute consumers slice contiguous
    rows — the row-major [n, 40] layout forced a ~31 ms/segment
    lane-strided column-extraction fusion downstream (and tiles with
    4-lane-wide narrow arrays throughout).

    The tile's distinct winner clusters are discovered IN-KERNEL by an
    ascending min-scan over the rays' winner ids — no precomputed winner
    lists (the JAX-level lane sorts those needed were offload ops).

    The winner's TRANSFORM rows are fetched in exact f32 from the
    cluster-blocked t12b table via a HIGHEST-precision one-hot product (an
    exact selection): t/u/v derived from the bf16 hi/lo reconstruction
    lose ~2^-16 of the pre-cancellation magnitude, which at
    conference-scale scene extents (~115 units) grew to percent-level t
    error."""
    acc_ref[:] = jnp.zeros((B16.COLS, rt), jnp.float32)
    txyacc_ref[:] = jnp.zeros((16, rt), jnp.float32)
    col = colr_ref[0]                     # [1, rt] padded winner column
    R = rays_ref[0]                       # [8, rt]: ox oy oz 1 dx dy dz 0
    ccl = jnp.where(col >= 0, col // tc, jnp.int32(0x7FFFFFFF))

    def cond(carry):
        prev = carry
        return jnp.min(jnp.where(ccl > prev, ccl,
                                 jnp.int32(0x7FFFFFFF))) < 0x7FFFFFFF

    def body(carry):
        prev = carry
        # each hit ray's one-hot column is nonzero in exactly ONE visit
        # (its winner cluster), so the raw fetched rows simply ACCUMULATE;
        # the whole reconstruction epilogue runs once per tile
        c = jnp.min(jnp.where(ccl > prev, ccl, jnp.int32(0x7FFFFFFF)))
        local = col - c * tc
        active = (local >= 0) & (local < tc)
        tri = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)
        ohb = (tri == local) & active                     # [tc, rt]
        oht = ohb.astype(jnp.bfloat16)
        off = pl.multiple_of(c * B16.COLS, 128)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            tbl_ref[pl.ds(off, B16.COLS), :], oht,
            preferred_element_type=jnp.float32)           # [128, rt]
        blk = txy_ref[pl.ds(pl.multiple_of(c * 16, 16), 16), :]  # [16, tc]
        txyacc_ref[:] = txyacc_ref[:] + jax.lax.dot_general(
            blk, ohb.astype(jnp.float32),
            (((1,), (0,)), ((), ())), precision=HIGHEST)  # [16, rt] exact
        return c

    jax.lax.while_loop(cond, body, jnp.int32(-1))
    out_ref[:] = _b16_epilogue_t(acc_ref[:], col, R[0:4], R[4:8], rt,
                                 txyacc_ref[0:12])


def _b16_epilogue_t(acc, col, O, D, rt, txy):
    """Reconstruct the f32 SoA ATTR rows from the accumulated B16 fetch:
    hi+lo float sums, 8-bit chunk recombination, exact t/u/v from the
    winner's f32 transform rows (txy [12, rt]), barycentric interpolation
    of the per-vertex floats. Runs ONCE per tile on full-width rows."""
    active = col >= 0                                  # [1, rt]
    g = lambda a, w: acc[a:a + w, :]
    oz = jnp.sum(O * txy[8:12], axis=0, keepdims=True)
    dz = jnp.sum(D * txy[8:12], axis=0, keepdims=True)
    t = -oz / jnp.where(dz == 0.0, 1.0, dz)
    ox = jnp.sum(O * txy[0:4], axis=0, keepdims=True)
    dx = jnp.sum(D * txy[0:4], axis=0, keepdims=True)
    oy = jnp.sum(O * txy[4:8], axis=0, keepdims=True)
    dy = jnp.sum(D * txy[4:8], axis=0, keepdims=True)
    u = ox + t * dx
    v = oy + t * dy

    cf = g(B16.CF_HI, 15) + g(B16.CF_LO, 15)
    v0 = g(B16.V0_HI, 5) + g(B16.V0_LO, 5)
    v1 = g(B16.V1_HI, 5) + g(B16.V1_LO, 5)
    v2 = g(B16.V2_HI, 5) + g(B16.V2_LO, 5)
    vert = (1.0 - u - v) * v0 + u * v1 + v * v2   # [5, rt] N3+UV2

    c2 = lambda a: acc[a:a + 1, :] + acc[a + 1:a + 2, :] * 256.0
    c3 = lambda a: c2(a) + acc[a + 2:a + 3, :] * 65536.0
    am = active.astype(jnp.float32)
    wh = lambda cw, chh: c2(cw) * 4096.0 + c2(chh)
    res = jnp.concatenate([
        vert,                                     # 0-4: N, UV
        c2(B16.MAT),                              # 5
        cf,                                       # 6-20
        c2(B16.TYPE),                             # 21
        c2(B16.MAP_KD) - am,                      # 22 (stored +1)
        c2(B16.MAP_KS) - am,                      # 23
        c2(B16.MAP_N) - am,                       # 24
        c3(B16.TRI),                              # 25
        u * am, v * am, t * am,                   # 26-28
        wh(B16.TKD_W, B16.TKD_H), c3(B16.TKD_OFF),  # 29-30
        wh(B16.TKS_W, B16.TKS_H), c3(B16.TKS_OFF),  # 31-32
        wh(B16.TN_W, B16.TN_H), c3(B16.TN_OFF),     # 33-34
        jnp.zeros((ATTR_COLS - 35, rt), jnp.float32),
    ], axis=0)
    return res * am


def _resolve_rays(col, o4, d4, rt):
    """Pack resolve inputs rays-on-lanes: ([nt,1,rt] winner cols,
    [nt,8,rt] rays)."""
    b = col.shape[0]
    nt = b // rt
    rays = jnp.stack([o4[:, 0], o4[:, 1], o4[:, 2], o4[:, 3],
                      d4[:, 0], d4[:, 1], d4[:, 2], d4[:, 3]], axis=0)
    rays = rays.reshape(8, nt, rt).transpose(1, 0, 2)     # [nt, 8, rt]
    colr = col.reshape(nt, 1, rt)
    return colr, rays


@partial(jax.jit, static_argnames=("scene_static", "ray_tile", "interpret"))
def _resolve_v5(col, o4, d4, tbl_t, t12b, scene_static, ray_tile, interpret):
    n_clusters, tc = scene_static
    rt = ray_tile
    b = col.shape[0]
    colr, rays = _resolve_rays(col, o4, d4, rt)
    kernel = partial(_resolve_kernel_v5, rt=rt, tc=tc)
    return pl.pallas_call(
        kernel,
        grid=(b // rt,),
        in_specs=[
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bf16 table resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # f32 blocked transforms
        ],
        out_specs=pl.BlockSpec((ATTR_COLS, rt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ATTR_COLS, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B16.COLS, rt), jnp.float32),
                        pltpu.VMEM((16, rt), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_RESOLVE_V2_VMEM_BYTES + (40 << 20)),
        interpret=interpret,
    )(colr, rays, tbl_t, t12b)


def _resolve_kernel_v5s(colr_ref, rays_ref, tbl_ref, txy_ref, out_ref,
                        acc_ref, txyacc_ref, buf_ref, buf2_ref, sem_ref,
                        sem2_ref, *, rt, tc):
    """Winner-attribute resolve, v5 streamed: the transposed B16 table
    stays in HBM; each winner cluster's [128, tc] bf16 block (64 KB) is
    DMA'd into a double-buffered VMEM scratch while the previous block's
    one-hot product runs. Removes the resolve path's VMEM ceiling
    entirely — at conference scale (320k tris) the table is ~120 MB and
    streaming ~5 winner blocks per tile costs ~0.3 MB of traffic instead.
    Winner discovery is the same in-kernel ascending min-scan as v5."""
    acc_ref[:] = jnp.zeros((B16.COLS, rt), jnp.float32)
    txyacc_ref[:] = jnp.zeros((16, rt), jnp.float32)
    col = colr_ref[0]                     # [1, rt] padded winner column
    R = rays_ref[0]
    ccl = jnp.where(col >= 0, col // tc, jnp.int32(0x7FFFFFFF))
    NONE = jnp.int32(0x7FFFFFFF)

    def next_cluster(prev):
        return jnp.min(jnp.where(ccl > prev, ccl, NONE))

    def start_dma(c, slot):
        pltpu.make_async_copy(
            tbl_ref.at[pl.ds(c * B16.COLS, B16.COLS), :],
            buf_ref.at[slot], sem_ref.at[slot]).start()
        pltpu.make_async_copy(
            txy_ref.at[pl.ds(c * 16, 16), :],
            buf2_ref.at[slot], sem2_ref.at[slot]).start()

    def wait_dma(c, slot):
        pltpu.make_async_copy(
            tbl_ref.at[pl.ds(c * B16.COLS, B16.COLS), :],
            buf_ref.at[slot], sem_ref.at[slot]).wait()
        pltpu.make_async_copy(
            txy_ref.at[pl.ds(c * 16, 16), :],
            buf2_ref.at[slot], sem2_ref.at[slot]).wait()

    c0 = next_cluster(jnp.int32(-1))

    @pl.when(c0 < NONE)
    def _():
        start_dma(c0, 0)

        def cond(carry):
            c, slot = carry
            return c < NONE

        def body(carry):
            c, slot = carry
            nxt = next_cluster(c)

            @pl.when(nxt < NONE)
            def _():
                start_dma(nxt, 1 - slot)    # prefetch while we compute
            wait_dma(c, slot)
            local = col - c * tc
            active = (local >= 0) & (local < tc)
            tri = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)
            ohb = (tri == local) & active
            oht = ohb.astype(jnp.bfloat16)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                buf_ref[slot], oht,
                preferred_element_type=jnp.float32)       # [128, rt]
            txyacc_ref[:] = txyacc_ref[:] + jax.lax.dot_general(
                buf2_ref[slot], ohb.astype(jnp.float32),
                (((1,), (0,)), ((), ())), precision=HIGHEST)  # [16, rt]
            return nxt, 1 - slot

        jax.lax.while_loop(cond, body, (c0, jnp.int32(0)))

    out_ref[:] = _b16_epilogue_t(acc_ref[:], col, R[0:4], R[4:8], rt,
                                 txyacc_ref[0:12])


@partial(jax.jit, static_argnames=("scene_static", "ray_tile", "interpret"))
def _resolve_v5s(col, o4, d4, tbl_t, t12b, scene_static, ray_tile,
                 interpret):
    n_clusters, tc = scene_static
    rt = ray_tile
    b = col.shape[0]
    colr, rays = _resolve_rays(col, o4, d4, rt)
    kernel = partial(_resolve_kernel_v5s, rt=rt, tc=tc)
    return pl.pallas_call(
        kernel,
        grid=(b // rt,),
        in_specs=[
            pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, rt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # bf16 table in HBM
            pl.BlockSpec(memory_space=pl.ANY),    # f32 transforms in HBM
        ],
        out_specs=pl.BlockSpec((ATTR_COLS, rt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ATTR_COLS, b), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B16.COLS, rt), jnp.float32),
            pltpu.VMEM((16, rt), jnp.float32),
            pltpu.VMEM((2, B16.COLS, tc), jnp.bfloat16),
            pltpu.VMEM((2, 16, tc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(colr, rays, tbl_t, t12b)


# resident-table resolve needs txy+attrs in VMEM (~128 MB/chip); beyond
# this the grid-sweep kernel streams blocks from HBM instead
_RESOLVE_V2_VMEM_BYTES = 48 * (1 << 20)


def resolve_hits_mxu(orig: Vec3, d: Vec3, t, col, scene: MXUScene,
                     ray_tile: int = None, interpret: bool = False):
    ray_tile = ray_tile or RAY_TILE
    """Per-ray winner attributes as the SoA matrix [ATTR_COLS, n] (see
    ATTR_* ROW constants), including exact barycentric u, v
    (ATTR_HITU/ATTR_HITV). col: padded winner column (-1 = miss -> zero
    row). Channel-major so consumers slice contiguous [n] rows — TPU
    tiling pads narrow [n, 40] row-matrices to 128 lanes and their column
    extraction fused into a ~31 ms/segment relayout."""
    n = col.shape[0]
    o4, d4, _ = _ray_inputs(orig, d, scene, None, ray_tile)
    col2, _ = _pad_rays(col.reshape(n, 1), ray_tile)
    # production resolve = B16 v5 (VMEM-resident) / v5s (HBM-streamed);
    # the earlier v1 grid-sweep survives ONLY as the interpret-mode (CPU
    # test) path, and the v2 winner-list generation was deleted (sweep
    # loser, round-5 prune — v5 superseded it in every configuration)
    if not interpret and scene.b16t is not None:
        table_b = scene.b16t.size * 2 + scene.t12b.size * 4
        if table_b <= _RESOLVE_V2_VMEM_BYTES:
            out = _resolve_v5(col2, o4, d4, scene.b16t, scene.t12b,
                              (scene.n_clusters, scene.cluster_size),
                              ray_tile, interpret)
        else:
            # table exceeds the resident budget -> HBM-streamed variant
            out = _resolve_v5s(col2, o4, d4, scene.b16t, scene.t12b,
                               (scene.n_clusters, scene.cluster_size),
                               ray_tile, interpret)
        return out[:, :n]
    assert scene.attrs is not None, \
        "slim MXUScene has only the B16 resolve (f32 attrs dropped): " \
        "rebuild with slim=False for interpret-mode (CPU) debugging"
    t2, _ = _pad_rays(t.reshape(n, 1), ray_tile)
    out = _resolve(col2, t2, o4, d4, scene.txy_t, scene.attrs,
                   (scene.n_clusters, scene.cluster_size), ray_tile, interpret)
    return out[:n].T


def any_hit_mxu(orig: Vec3, d: Vec3, t_max, scene: MXUScene,
                ray_tile: int = None, interpret: bool = False):
    """Occlusion query. Returns bool[n]."""
    ray_tile = ray_tile or RAY_TILE
    n = orig.x.shape[0]
    o4, d4, tmax_col = _ray_inputs(orig, d, scene, t_max, ray_tile)
    if SORT_RAYS and not interpret:
        t, i = _sorted_trace(o4, d4, tmax_col, scene, True, ray_tile,
                             interpret)
    else:
        t, i = _trace(
            o4, d4, tmax_col,
            (scene.tx, scene.ty, scene.tz, scene.cluster_box),
            (scene.n_clusters, scene.cluster_size),
            True, ray_tile, interpret)
    return i[:n, 0] >= 0
