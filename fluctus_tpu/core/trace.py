"""Extension-ray tracing: BVH traversal + hit reconstruction + implicit
area-light intersection + tangent-space normal mapping.

Combines the reference's traceExtension flow (wf_extrays.cl:16-35):
bvh_intersect -> intersectLight -> hit SoA, with the shading-time normal
work from wf_logic.cl:207-212 / mk_sample_bsdf.cl:48-54 (normal map applied,
backface flip).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import dataclasses

import jax
import jax.numpy as jnp

from ..accel.traverse import BVHDevice, TrianglesDevice, any_hit, closest_hit
from ..geom import AreaLight, Hit, MaterialsSoA
from ..texture_fetch import mat_get_float3
from ..vec import (Vec3, cross, dot, gather as vgather, lerp_bary, normalize,
                   where as vwhere)

F32_MAX = jnp.float32(3.4028235e38)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceScene:
    """All device-resident scene data, passed as one pytree argument."""
    tris: TrianglesDevice
    bvh: BVHDevice
    mats: MaterialsSoA
    atlas: object           # TextureAtlas
    env: Optional[object]   # EnvMapTables or None
    # static: OR of BXDF type bits present (getBxdfDefines analogue)
    material_types: int = dataclasses.field(metadata=dict(static=True), default=0)
    # optional MXU (Pallas matmul) tracer tables; when present they are the
    # preferred traversal backend (see accel/mxu_trace.py)
    mxu: Optional[object] = None


def intersect_area_light(orig: Vec3, d: Vec3, light: AreaLight, t_prev):
    """Quad light intersection for implicit hits (intersect.cl:124-155).
    Returns (hit_mask, t). Backside hits rejected."""
    # Solve ray-plane, then check |local coords| <= size
    denom = dot(d, light.N)
    facing = denom < 0.0   # reject dot(dir, N) > 0; == 0 -> parallel
    t = dot(light.pos - orig, light.N) / jnp.where(denom == 0.0, 1.0, denom)
    p = orig + d * t
    rel = p - light.pos
    lx = dot(rel, light.right)
    ly = dot(rel, light.up)
    inside = (jnp.abs(lx) <= light.size_x) & (jnp.abs(ly) <= light.size_y)
    hit = facing & (denom != 0.0) & inside & (t > 0.0) & (t < t_prev)
    return hit, t


def reconstruct_hit(orig: Vec3, d: Vec3, t, tri_idx, u, v,
                    tris: TrianglesDevice) -> Hit:
    """Build the Hit record from traversal output (bvh.cl:271-279):
    P from ray, smooth normal + uv barycentrically interpolated."""
    safe = jnp.maximum(tri_idx, 0)
    n = normalize(lerp_bary(u, v, vgather(tris.n0, safe),
                            vgather(tris.n1, safe), vgather(tris.n2, safe)))
    uu = (1.0 - u - v) * jnp.take(tris.t0u, safe) + u * jnp.take(tris.t1u, safe) \
        + v * jnp.take(tris.t2u, safe)
    vv = (1.0 - u - v) * jnp.take(tris.t0v, safe) + u * jnp.take(tris.t1v, safe) \
        + v * jnp.take(tris.t2v, safe)
    mat_id = jnp.where(tri_idx >= 0, jnp.take(tris.mat_id, safe), -1)
    return Hit(P=orig + d * t, N=n, uv_u=uu, uv_v=vv, t=t,
               i=tri_idx, area_light_hit=jnp.zeros_like(tri_idx),
               mat_id=mat_id)


def _interpret_pallas() -> bool:
    return jax.default_backend() != "tpu"


def shading_from_attrs(row, col, tex_meta: bool = False):
    """Build ShadingParams from the winner-resolve SoA attribute matrix
    [ATTR_COLS, n] (accel/mxu_trace.py ATTR_* rows) — zero gathers, and
    each attribute is a contiguous row slice. With tex_meta, the baked
    atlas descriptors (wh-pack + offset rows) are unpacked per lane so
    texel fetches skip the metadata gathers too."""
    from ..accel import mxu_trace as mt
    from ..bsdf import ShadingParams
    g = lambda c: row[c]
    v3 = lambda c: Vec3(row[c], row[c + 1], row[c + 2])
    valid = col >= 0

    def meta(wh_col, off_col):
        if not tex_meta:
            return None
        wh = g(wh_col)
        w = jnp.floor(wh * (1.0 / 4096.0))
        h = wh - w * 4096.0
        return ((g(off_col) + 0.5).astype(jnp.int32),
                (w + 0.5).astype(jnp.int32), (h + 0.5).astype(jnp.int32))

    return ShadingParams(
        Kd=v3(mt.ATTR_KD), Ks=v3(mt.ATTR_KS), Ke=v3(mt.ATTR_KE),
        Kt=v3(mt.ATTR_KT), alpha=g(mt.ATTR_NS), Ni=g(mt.ATTR_NI),
        d=g(mt.ATTR_D),
        type=jnp.where(valid, (g(mt.ATTR_TYPE) + 0.5).astype(jnp.int32), 0),
        map_N=jnp.where(valid, jnp.round(g(mt.ATTR_MAP_N)).astype(jnp.int32),
                        -1),
        map_Kd=jnp.where(valid,
                         jnp.round(g(mt.ATTR_MAP_KD)).astype(jnp.int32), -1),
        map_Ks=jnp.where(valid,
                         jnp.round(g(mt.ATTR_MAP_KS)).astype(jnp.int32), -1),
        kd_meta=meta(mt.ATTR_TKD_WH, mt.ATTR_TKD_OFF),
        ks_meta=meta(mt.ATTR_TKS_WH, mt.ATTR_TKS_OFF),
        n_meta=meta(mt.ATTR_TN_WH, mt.ATTR_TN_OFF))


def trace_extension_raw(orig: Vec3, d: Vec3, scene: DeviceScene):
    """Raw MXU closest-hit only: (t, winner_col) without the attribute
    resolve — lets the wavefront dispatch the resolve as its own program
    (resolve_extension) away from the traces' sort offload ops."""
    from ..accel import mxu_trace as mt
    interp = _interpret_pallas()
    n = orig.x.shape[0]
    rt = mt.RAY_TILE
    o4, d4, tmax_col = mt._ray_inputs(orig, d, scene.mxu, None, rt)
    if mt.SORT_RAYS and not interp:
        t2, col2 = mt._sorted_trace(o4, d4, None, scene.mxu,
                                    False, rt, interp)
    else:
        assert scene.mxu.tx is not None, \
            "rays-on-sublanes fallback unavailable on a slim MXUScene " \
            "(vertex tables dropped at >64k tris; unset FLT_SORT_RAYS=0)"
        t2, col2 = mt._trace(
            o4, d4, tmax_col,
            (scene.mxu.tx, scene.mxu.ty, scene.mxu.tz,
             scene.mxu.cluster_box),
            (scene.mxu.n_clusters, scene.mxu.cluster_size),
            False, rt, interp)
    return t2[:n, 0], col2[:n, 0]


def trace_extension(orig: Vec3, d: Vec3, scene: DeviceScene,
                    area_light: Optional[AreaLight],
                    check_area_light, want_shading: bool = False,
                    raw=None):
    """Closest hit + optional implicit area-light quad (wf_extrays.cl:26-29).
    check_area_light: traced bool (sampleImpl && useAreaLight).
    Returns Hit, or (Hit, ShadingParams-or-None) when want_shading.
    raw: optional precomputed (t, col) from trace_extension_raw."""
    sp = None
    if scene.mxu is not None:
        from ..accel import mxu_trace as mt
        interp = _interpret_pallas()
        if (scene.mxu.attrs is not None or scene.mxu.attr_b16 is not None
                or scene.mxu.b16t is not None):
            # gather-free: trace + attribute/material resolve on the MXU
            t, col = raw if raw is not None \
                else trace_extension_raw(orig, d, scene)
            row = mt.resolve_hits_mxu(orig, d, t, col, scene.mxu,
                                      interpret=interp)
            t = jnp.where(col >= 0, row[mt.ATTR_HITT], t)
            nrm = Vec3(row[mt.ATTR_N], row[mt.ATTR_N + 1],
                       row[mt.ATTR_N + 2])
            mat_id = jnp.where(col >= 0,
                               (row[mt.ATTR_MAT] + 0.5).astype(jnp.int32),
                               -1)
            # original tri id comes from the attrs matmul too (float-exact)
            tri = jnp.where(col >= 0,
                            (row[mt.ATTR_TRI] + 0.5).astype(jnp.int32), -1)
            hit = Hit(P=orig + d * t, N=normalize(nrm),
                      uv_u=row[mt.ATTR_UV], uv_v=row[mt.ATTR_UV + 1],
                      t=t, i=tri, area_light_hit=jnp.zeros_like(tri),
                      mat_id=mat_id)
            if want_shading:
                sp = shading_from_attrs(row, col,
                                        tex_meta=scene.mxu.has_tex_meta)
        else:
            t, tri, u, v, col = mt.closest_hit_mxu_full(orig, d, scene.mxu,
                                                        interpret=interp)
            hit = reconstruct_hit(orig, d, t, tri, u, v, scene.tris)
    else:
        t, tri, u, v = closest_hit(orig, d, scene.tris, scene.bvh)
        hit = reconstruct_hit(orig, d, t, tri, u, v, scene.tris)
    if area_light is not None:
        l_hit, l_t = intersect_area_light(orig, d, area_light, hit.t)
        l_hit &= check_area_light
        hit = Hit(
            P=vwhere(l_hit, orig + d * l_t, hit.P),
            N=vwhere(l_hit, Vec3(
                jnp.broadcast_to(area_light.N.x, t.shape),
                jnp.broadcast_to(area_light.N.y, t.shape),
                jnp.broadcast_to(area_light.N.z, t.shape)), hit.N),
            uv_u=hit.uv_u, uv_v=hit.uv_v,
            t=jnp.where(l_hit, l_t, hit.t),
            i=jnp.where(l_hit, 0, hit.i),            # intersect.cl:152
            area_light_hit=jnp.where(l_hit, 1, hit.area_light_hit),
            mat_id=jnp.where(l_hit, 0, hit.mat_id))  # intersect.cl:153
    if want_shading:
        return hit, sp
    return hit


def trace_pair(orig: Vec3, d: Vec3, sorig: Vec3, sdir: Vec3, max_len,
               scene: DeviceScene, area_light: Optional[AreaLight],
               check_area_light):
    """Extension closest-hit + shadow occlusion under ONE shared
    coherence sort (FLT_PAIR_SORT; see mxu_trace._sorted_trace_pair).
    Returns (raw=(t, col), occluded) matching trace_extension_raw +
    trace_shadow semantics, incl. the area-light body occlusion OR
    (wf_shadowrays.cl:27-33)."""
    from ..accel import mxu_trace as mt
    t, col, occ = mt.trace_pair_mxu(orig, d, sorig, sdir, max_len,
                                    scene.mxu,
                                    interpret=_interpret_pallas())
    if area_light is not None:
        l_hit, _ = intersect_area_light(sorig, sdir, area_light, max_len)
        occ |= l_hit & check_area_light
    return (t, col), occ


def trace_shadow(orig: Vec3, d: Vec3, max_len, scene: DeviceScene,
                 area_light: Optional[AreaLight], check_area_light):
    """Occlusion query incl. the area light body (wf_shadowrays.cl:27-33)."""
    if scene.mxu is not None:
        from ..accel.mxu_trace import any_hit_mxu
        occ = any_hit_mxu(orig, d, max_len, scene.mxu,
                          interpret=_interpret_pallas())
    else:
        occ = any_hit(orig, d, max_len, scene.tris, scene.bvh)
    if area_light is not None:
        l_hit, _ = intersect_area_light(orig, d, area_light, max_len)
        occ |= l_hit & check_area_light
    return occ


def tangent_space_normal(hit: Hit, tris: TrianglesDevice,
                         mats_mapn, atlas, meta=None) -> Vec3:
    """Normal mapping (utils.cl:174-207). mats_mapn: per-lane map_N idx.
    Statically pruned when the scene has no normal maps."""
    if getattr(atlas, "count", 0) == 0 or not getattr(atlas, "has_n", True):
        return hit.N
    has_map = (mats_mapn >= 0) & (hit.i >= 0)
    default = Vec3.of(0.5, 0.5, 1.0)
    texn = mat_get_float3(
        Vec3(jnp.full_like(hit.uv_u, 0.5), jnp.full_like(hit.uv_u, 0.5),
             jnp.ones_like(hit.uv_u)), hit.uv_u, hit.uv_v, mats_mapn, atlas,
        meta=meta)
    texn = texn + texn - 1.0

    safe = jnp.maximum(hit.i, 0)
    # geometric edges and uv edges
    e1 = vgather(tris.e1, safe)
    e2 = vgather(tris.e2, safe)
    t1u = jnp.take(tris.t1u, safe) - jnp.take(tris.t0u, safe)
    t1v = jnp.take(tris.t1v, safe) - jnp.take(tris.t0v, safe)
    t2u = jnp.take(tris.t2u, safe) - jnp.take(tris.t0u, safe)
    t2v = jnp.take(tris.t2v, safe) - jnp.take(tris.t0v, safe)

    det = t1u * t2v - t1v * t2u
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    tang = normalize((e1 * t2v - e2 * t1v) * inv_det)
    bitang = normalize((e2 * t1u - e1 * t2u) * inv_det)

    n = Vec3(
        tang.x * texn.x + bitang.x * texn.y + hit.N.x * texn.z,
        tang.y * texn.x + bitang.y * texn.y + hit.N.y * texn.z,
        tang.z * texn.x + bitang.z * texn.y + hit.N.z * texn.z)
    n = normalize(n)
    valid = has_map & (det != 0.0)
    return vwhere(valid, n, hit.N)
