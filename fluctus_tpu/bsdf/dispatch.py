"""BSDF dispatcher — the masked-superkernel replacement for the reference's
per-material queues.

The reference bins paths into per-material queues and launches a specialized
kernel per queue (wf_logic.cl:337-342, wf_mat_*.cl), each compiled with only
its own lobe (bxdf_partial.cl). On TPU, queue compaction buys nothing — all
lanes step together — so we evaluate every lobe *present in the scene*
(static ``scene_types`` bitmask = the analogue of getBxdfDefines,
utils.cpp:165-185) and select per lane with ``where``. Absent lobes cost
zero: they are pruned at trace time.

Conventions follow src/bxdf.cl: dir_in points TOWARD the surface; sample
returns (dir_out, pdf_w, bsdf); BXDF_MIXED is short-circuited to DIFFUSE
exactly like the reference (bxdf.cl:30-32).

Emissive: the reference's bxdfSample for BXDF_EMISSIVE leaves pdf/dir
uninitialized (bxdf.cl:104-105). We define it as pdf=0 (terminates the path
cleanly); emission reaches the image via the integrator's implicit-emission
accumulation instead.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import bxdf_types as bx
from ..geom import MaterialsSoA
from ..rng import rand_n
from ..sampling import INV_PI, cos_sample_hemisphere_uv
from ..texture_fetch import mat_get_albedo, mat_get_float3
from ..vec import Vec3, dot, is_zero, normalize, reflect0, refract1
from ..vec import where as vwhere
from . import ggx
from .fresnel import fresnel_dielectric, fresnel_dielectric_cos_t


class ShadingParams(NamedTuple):
    """Per-lane resolved material parameters (textures already applied)."""
    Kd: Vec3      # albedo, gamma-linearized (matGetAlbedo)
    Ks: Vec3      # specular, raw (matGetFloat3)
    Ke: Vec3
    Kt: Vec3
    alpha: jnp.ndarray   # GGX alpha (Ns post-remap)
    Ni: jnp.ndarray
    d: jnp.ndarray
    type: jnp.ndarray    # int32 bxdf bits
    map_N: jnp.ndarray   # normal-map texture idx (used by hit reconstruction)
    map_Kd: jnp.ndarray  # diffuse/specular texture idx (apply_textures)
    map_Ks: jnp.ndarray
    # baked atlas descriptors (off, w, h) per lane — present on the MXU
    # resolve path, where they make texture fetches metadata-gather-free
    kd_meta: tuple = None
    ks_meta: tuple = None
    n_meta: tuple = None


def resolve_material(mats: MaterialsSoA, mat_id, uv_u, uv_v, atlas) -> ShadingParams:
    """Gather material row per lane + resolve Kd/Ks textures once
    (getMaterialParameters, utils.cl:209-219)."""
    m = mats.gather(mat_id)
    return ShadingParams(
        Kd=mat_get_albedo(m.Kd, uv_u, uv_v, m.map_Kd, atlas),
        Ks=mat_get_float3(m.Ks, uv_u, uv_v, m.map_Ks, atlas),
        Ke=m.Ke, Kt=m.Kt, alpha=m.Ns, Ni=m.Ni, d=m.d, type=m.type,
        map_N=m.map_N, map_Kd=m.map_Kd, map_Ks=m.map_Ks)


def apply_textures(sp: ShadingParams, uv_u, uv_v, atlas) -> ShadingParams:
    """Overlay Kd/Ks textures onto baked material parameters (used with the
    MXU attribute-resolve path, where constants come gather-free and only
    actual texels are fetched). No-op for untextured scenes. When the
    resolve supplied baked atlas descriptors (sp.*_meta), each fetch is a
    single texel gather — no metadata gathers."""
    if getattr(atlas, "count", 0) == 0:
        return sp
    if getattr(atlas, "has_kd", True):
        kd = mat_get_albedo(Vec3.zeros(sp.alpha.shape), uv_u, uv_v,
                            sp.map_Kd, atlas, meta=sp.kd_meta)
        sp = sp._replace(Kd=vwhere(sp.map_Kd >= 0, kd, sp.Kd))
    if getattr(atlas, "has_ks", True):
        ks = mat_get_float3(Vec3.zeros(sp.alpha.shape), uv_u, uv_v,
                            sp.map_Ks, atlas, meta=sp.ks_meta)
        sp = sp._replace(Ks=vwhere(sp.map_Ks >= 0, ks, sp.Ks))
    return sp


def _sel(t, *types):
    m = t == types[0]
    for ty in types[1:]:
        m |= t == ty
    return m


# ---------------------------------------------------------------------------
# Glossy helpers (glossy.cl:12-22)
# ---------------------------------------------------------------------------

def _eta_to_ks(eta):
    r = jnp.where(eta > 0.0, (eta - 1.0) / (eta + 1.0), 0.0)
    return r * r


def _ks_to_eta(ks: Vec3):
    k = jnp.clip((ks.x + ks.y + ks.z) / 3.0, 0.0, 0.99)
    s = jnp.sqrt(k)
    return (s + 1.0) / (1.0 - s)


def _glossy_params(sp: ShadingParams):
    """Fill in Ks/Ni from each other when unset (glossy.cl:30-35)."""
    ni = jnp.where(sp.Ni > 0.0, sp.Ni, _ks_to_eta(sp.Ks))
    ks_auto = _eta_to_ks(ni)
    ks = vwhere(is_zero(sp.Ks), Vec3(ks_auto, ks_auto, ks_auto), sp.Ks)
    return ks, ni


# ---------------------------------------------------------------------------
# Sample
# ---------------------------------------------------------------------------

def bxdf_sample(n: Vec3, sp: ShadingParams, backface, dir_in: Vec3, seed,
                scene_types: int):
    """Sample continuation direction. Returns (dir_out, pdf_w, bsdf, seed).

    Always consumes exactly 3 RNG draws so the per-path sequence is
    material-independent (each lobe uses the uniforms it needs).
    """
    (ra, rb, rc), seed = rand_n(seed, 3)
    t = sp.type
    shp = n.x.shape
    d_out = Vec3.zeros(shp)
    pdf = jnp.zeros(shp, jnp.float32)
    bsdf = Vec3.zeros(shp)

    if scene_types & (bx.BXDF_DIFFUSE | bx.BXDF_MIXED | bx.BXDF_EMISSIVE):
        d, p = cos_sample_hemisphere_uv(n, ra, rb)
        f = sp.Kd * INV_PI
        m = _sel(t, bx.BXDF_DIFFUSE, bx.BXDF_MIXED)
        d_out, pdf, bsdf = vwhere(m, d, d_out), jnp.where(m, p, pdf), vwhere(m, f, bsdf)
        # emissive: pdf stays 0, bsdf = 1 (see module docstring)
        me = _sel(t, bx.BXDF_EMISSIVE)
        bsdf = vwhere(me, Vec3.ones(shp), bsdf)

    if scene_types & bx.BXDF_GLOSSY:
        ks, ni = _glossy_params(sp)
        cos_th = -dot(dir_in, n)
        fr = fresnel_dielectric(cos_th, 1.0, ni)
        pick_spec = ra < fr
        # both sub-lobes computed, blended per reference (glossy.cl:37-63)
        d_spec, p_spec, f_spec = ggx.sample_reflect(n, ks, sp.alpha, ni, dir_in, rb, rc)
        d_diff, p_diff = cos_sample_hemisphere_uv(n, rb, rc)
        d = vwhere(pick_spec, d_spec, d_diff)
        base_pdf = dot(n, d) * INV_PI
        coat_pdf = jnp.where(pick_spec, p_spec, ggx.pdf_reflect(n, sp.alpha, dir_in, d))
        coat_f = vwhere(pick_spec, f_spec, ggx.eval_reflect(n, ks, sp.alpha, ni, dir_in, d))
        base_f = sp.Kd * INV_PI
        p = (1.0 - fr) * base_pdf + fr * coat_pdf
        f = base_f * (1.0 - fr) + coat_f  # coat contains its own Fresnel
        bad = dot(n, d) < 1e-5
        f = vwhere(bad, Vec3.zeros(shp), f)
        m = _sel(t, bx.BXDF_GLOSSY)
        d_out, pdf, bsdf = vwhere(m, d, d_out), jnp.where(m, p, pdf), vwhere(m, f, bsdf)

    if scene_types & bx.BXDF_GGX_ROUGH_REFLECTION:
        d, p, f = ggx.sample_reflect(n, sp.Ks, sp.alpha, sp.Ni, dir_in, ra, rb)
        m = _sel(t, bx.BXDF_GGX_ROUGH_REFLECTION)
        d_out, pdf, bsdf = vwhere(m, d, d_out), jnp.where(m, p, pdf), vwhere(m, f, bsdf)

    if scene_types & bx.BXDF_GGX_ROUGH_DIELECTRIC:
        d, p, f = ggx.sample_refract(n, sp.Ks, sp.alpha, sp.Ni, backface,
                                     dir_in, ra, rb, rc)
        m = _sel(t, bx.BXDF_GGX_ROUGH_DIELECTRIC)
        d_out, pdf, bsdf = vwhere(m, d, d_out), jnp.where(m, p, pdf), vwhere(m, f, bsdf)

    if scene_types & bx.BXDF_IDEAL_REFLECTION:
        # ideal_reflection.cl:9-21
        d = reflect0(dir_in, n)
        cos_o = dot(normalize(d), n)
        f = sp.Ks * jnp.where(cos_o != 0.0, 1.0 / jnp.where(cos_o == 0.0, 1.0, cos_o), 0.0)
        m = _sel(t, bx.BXDF_IDEAL_REFLECTION)
        d_out = vwhere(m, d, d_out)
        pdf = jnp.where(m, 1.0, pdf)
        bsdf = vwhere(m, f, bsdf)

    if scene_types & bx.BXDF_IDEAL_DIELECTRIC:
        # ideal_dielectric.cl:10-45
        cos_i = -dot(dir_in, n)
        n1 = jnp.where(backface, sp.Ni, 1.0)
        n2 = jnp.where(backface, 1.0, sp.Ni)
        eta = n1 / n2
        fr, cos_t = fresnel_dielectric_cos_t(cos_i, n1, n2)
        refl = ra < fr
        d_refl = refract_reflect(dir_in, n, cos_i)
        d_refr = refract1(dir_in, n, eta, cos_i, cos_t)
        d = vwhere(refl, d_refl, d_refr)
        absorb = sp.Ks * (eta * eta)
        f3 = vwhere(refl, Vec3.ones(shp), absorb)
        cos_o = dot(normalize(d), n)
        f3 = f3 * jnp.where(cos_o != 0.0, 1.0 / jnp.where(cos_o == 0.0, 1.0, cos_o), 0.0)
        m = _sel(t, bx.BXDF_IDEAL_DIELECTRIC)
        d_out = vwhere(m, d, d_out)
        pdf = jnp.where(m, 1.0, pdf)
        bsdf = vwhere(m, f3, bsdf)

    return d_out, pdf, bsdf, seed


def refract_reflect(d: Vec3, n: Vec3, cos_i):
    """reflect(dir, n, &cosI) = dir + 2 cosI n (utils.cl:46-49)."""
    return d + n * (cos_i + cos_i)


# ---------------------------------------------------------------------------
# Eval / Pdf (for NEE directions; singular lobes are zero)
# ---------------------------------------------------------------------------

def bxdf_eval(n: Vec3, sp: ShadingParams, backface, dir_in: Vec3,
              dir_out: Vec3, scene_types: int) -> Vec3:
    """bxdfEval (bxdf.cl:112-203)."""
    t = sp.type
    shp = n.x.shape
    out = Vec3.zeros(shp)

    if scene_types & (bx.BXDF_DIFFUSE | bx.BXDF_MIXED):
        m = _sel(t, bx.BXDF_DIFFUSE, bx.BXDF_MIXED)
        out = vwhere(m, sp.Kd * INV_PI, out)

    if scene_types & bx.BXDF_GLOSSY:
        ks, ni = _glossy_params(sp)
        base = sp.Kd * INV_PI
        coat = ggx.eval_reflect(n, ks, sp.alpha, ni, dir_in, dir_out)
        fr = fresnel_dielectric(-dot(dir_in, n), 1.0, ni)
        m = _sel(t, bx.BXDF_GLOSSY)
        out = vwhere(m, base * (1.0 - fr) + coat, out)

    if scene_types & bx.BXDF_GGX_ROUGH_REFLECTION:
        m = _sel(t, bx.BXDF_GGX_ROUGH_REFLECTION)
        out = vwhere(m, ggx.eval_reflect(n, sp.Ks, sp.alpha, sp.Ni, dir_in, dir_out), out)

    if scene_types & bx.BXDF_GGX_ROUGH_DIELECTRIC:
        m = _sel(t, bx.BXDF_GGX_ROUGH_DIELECTRIC)
        out = vwhere(m, ggx.eval_refract(n, sp.Ks, sp.alpha, sp.Ni, backface,
                                         dir_in, dir_out), out)

    if scene_types & bx.BXDF_EMISSIVE:
        m = _sel(t, bx.BXDF_EMISSIVE)
        out = vwhere(m, sp.Ke, out)

    # ideal lobes: delta distributions evaluate to 0
    return out


def bxdf_pdf(n: Vec3, sp: ShadingParams, backface, dir_in: Vec3,
             dir_out: Vec3, scene_types: int):
    """bxdfPdf (bxdf.cl:206-296)."""
    t = sp.type
    shp = n.x.shape
    out = jnp.zeros(shp, jnp.float32)

    if scene_types & (bx.BXDF_DIFFUSE | bx.BXDF_MIXED):
        m = _sel(t, bx.BXDF_DIFFUSE, bx.BXDF_MIXED)
        out = jnp.where(m, dot(n, dir_out) * INV_PI, out)

    if scene_types & bx.BXDF_GLOSSY:
        ks, ni = _glossy_params(sp)
        base = dot(n, dir_out) * INV_PI
        coat = ggx.pdf_reflect(n, sp.alpha, dir_in, dir_out)
        fr = fresnel_dielectric(-dot(dir_in, n), 1.0, ni)
        m = _sel(t, bx.BXDF_GLOSSY)
        out = jnp.where(m, (1.0 - fr) * base + fr * coat, out)

    if scene_types & bx.BXDF_GGX_ROUGH_REFLECTION:
        m = _sel(t, bx.BXDF_GGX_ROUGH_REFLECTION)
        out = jnp.where(m, ggx.pdf_reflect(n, sp.alpha, dir_in, dir_out), out)

    if scene_types & bx.BXDF_GGX_ROUGH_DIELECTRIC:
        m = _sel(t, bx.BXDF_GGX_ROUGH_DIELECTRIC)
        out = jnp.where(m, ggx.pdf_refract(n, sp.alpha, sp.Ni, backface,
                                           dir_in, dir_out), out)

    return out
