"""External analytic ground truth for the GLOSSY Fresnel blend
(VERDICT r4 missing #5 / next-round #7).

All goldens elsewhere are self-generated, and wf-vs-mk agreement cannot
catch a SYSTEMATICALLY wrong BSDF (both integrators share bsdf/).
Here the ground truth is independent: a pure-numpy glossy BRDF written
directly from the published equations (Walter et al. 2007 eq. 33/34/24
for GGX D/G/pdf; exact dielectric Fresnel from the Fresnel equations;
the diffuse/coat blend per glossy.cl:37-63 semantics), integrated by
Gauss-Legendre x trapezoid quadrature — no jax, no fluctus_tpu math.

Three gates, in increasing pipeline depth:
  A. bxdf_eval(GLOSSY) == numpy formula pointwise (1e-5): catches a
     wrong Fresnel blend / wrong D/G transcription outright.
  B. MC integral via bxdf_sample/pdf == quadrature rho (5e-3): catches
     sample<->pdf<->eval inconsistencies.
  C. end-to-end mk render of a glossy plane under a uniform unit env
     == quadrature rho (2.5%): catches integrator-level weighting bugs.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from fluctus_tpu import bxdf_types as bx
from fluctus_tpu.bsdf import bxdf_eval, bxdf_pdf, bxdf_sample
from fluctus_tpu.bsdf.dispatch import ShadingParams
from fluctus_tpu.vec import Vec3

KD = np.array([0.5, 0.3, 0.2])
NI = 1.5
ALPHA = 0.25          # GGX alpha, post-remap


# ---------------------------------------------------------------------------
# Independent numpy implementation (no fluctus imports)
# ---------------------------------------------------------------------------

def np_fresnel_dielectric(cos_i, n1, n2):
    """Exact unpolarized dielectric Fresnel (Fresnel equations)."""
    cos_i = np.clip(cos_i, 0.0, 1.0)
    sin_t2 = (n1 / n2) ** 2 * (1.0 - cos_i ** 2)
    if np.isscalar(sin_t2):
        sin_t2 = np.asarray([sin_t2])
        cos_i = np.asarray([cos_i])
    tir = sin_t2 >= 1.0
    cos_t = np.sqrt(np.maximum(1.0 - sin_t2, 0.0))
    rs = (n1 * cos_i - n2 * cos_t) / np.maximum(n1 * cos_i + n2 * cos_t,
                                                1e-30)
    rp = (n1 * cos_t - n2 * cos_i) / np.maximum(n1 * cos_t + n2 * cos_i,
                                                1e-30)
    f = 0.5 * (rs ** 2 + rp ** 2)
    return np.where(tir, 1.0, f)


def np_ggx_d(alpha, cos_h):
    """GTR2 / GGX NDF, Walter 2007 eq. 33."""
    cos_h = np.asarray(cos_h)
    c2 = cos_h ** 2
    t2 = (1.0 - c2) / np.maximum(c2, 1e-30)
    a2 = alpha * alpha
    return np.where(cos_h > 0.0,
                    a2 / np.maximum(math.pi * c2 ** 2 * (a2 + t2) ** 2,
                                    1e-30), 0.0)


def np_ggx_g1(alpha, cos_v, v_dot_h):
    """Smith G1, Walter 2007 eq. 34."""
    c2 = cos_v ** 2
    t2 = (1.0 - c2) / np.maximum(c2, 1e-30)
    g = 2.0 / (1.0 + np.sqrt(1.0 + alpha * alpha * t2))
    return np.where(cos_v * v_dot_h > 0.0, g, 0.0)


def np_glossy_ks(ni):
    """Ks auto-derived from Ni when the material leaves Ks=0
    (glossy.cl:12-22 semantics: normal-incidence reflectance)."""
    r = (ni - 1.0) / (ni + 1.0)
    return r * r


def np_glossy_eval(wo, wi, kd=KD, ni=NI, alpha=ALPHA):
    """The glossy lobe: diffuse*(1-F(cos_o)) + GGX coat (its own F at the
    macro-normal incident angle). n = +z. wo points AWAY from surface
    toward the camera, wi away toward the light."""
    n = np.array([0.0, 0.0, 1.0])
    cos_o = wo @ n
    cos_i = wi @ n
    if cos_i <= 0.0 or cos_o <= 0.0:
        return np.zeros(3)
    f_blend = float(np_fresnel_dielectric(cos_o, 1.0, ni)[0])
    h = wo + wi
    h = h / np.linalg.norm(h)
    d = float(np_ggx_d(alpha, h @ n))
    g = float(np_ggx_g1(alpha, cos_o, wo @ h) *
              np_ggx_g1(alpha, cos_i, wi @ h))
    ks = np_glossy_ks(ni)
    coat = f_blend * ks * d * g / (4.0 * cos_i * cos_o)
    return kd / math.pi * (1.0 - f_blend) + coat


def np_glossy_rho(wo, kd=KD, ni=NI, alpha=ALPHA, n_theta=96, n_phi=192):
    """Directional-hemispherical reflectance by quadrature:
    rho(wo) = int f(wo, wi) cos_i dwi."""
    x, w = np.polynomial.legendre.leggauss(n_theta)   # over cos in [0,1]
    cos_i = 0.5 * (x + 1.0)
    w = 0.5 * w
    phis = (np.arange(n_phi) + 0.5) * (2.0 * math.pi / n_phi)
    rho = np.zeros(3)
    for c, wq in zip(cos_i, w):
        s = math.sqrt(max(1.0 - c * c, 0.0))
        acc = np.zeros(3)
        for p in phis:
            wi = np.array([s * math.cos(p), s * math.sin(p), c])
            acc += np_glossy_eval(wo, wi, kd, ni, alpha) * c
        rho += acc * wq * (2.0 * math.pi / n_phi)
    return rho


def _sp(n_lanes):
    z = jnp.zeros(n_lanes, jnp.float32)
    return ShadingParams(
        Kd=Vec3(jnp.full(n_lanes, KD[0]), jnp.full(n_lanes, KD[1]),
                jnp.full(n_lanes, KD[2])),
        Ks=Vec3(z, z, z),                      # auto-derived from Ni
        Ke=Vec3(z, z, z), Kt=Vec3(z, z, z),
        alpha=jnp.full(n_lanes, ALPHA), Ni=jnp.full(n_lanes, NI),
        d=jnp.ones(n_lanes),
        type=jnp.full(n_lanes, bx.BXDF_GLOSSY, jnp.int32),
        map_N=jnp.full(n_lanes, -1, jnp.int32),
        map_Kd=jnp.full(n_lanes, -1, jnp.int32),
        map_Ks=jnp.full(n_lanes, -1, jnp.int32))


def test_glossy_eval_matches_numpy_formula():
    """Gate A: pointwise bxdf_eval == independent numpy formula."""
    rng = np.random.default_rng(7)
    k = 256
    # random wo/wi over the upper hemisphere
    def hemi(m):
        v = rng.standard_normal((m, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        v[:, 2] = np.abs(v[:, 2]) + 1e-3
        return v / np.linalg.norm(v, axis=1, keepdims=True)
    wo = hemi(k)
    wi = hemi(k)
    n = Vec3(jnp.zeros(k), jnp.zeros(k), jnp.ones(k))
    dir_in = Vec3(*[jnp.asarray(-wo[:, i], jnp.float32) for i in range(3)])
    dir_out = Vec3(*[jnp.asarray(wi[:, i], jnp.float32) for i in range(3)])
    got = bxdf_eval(n, _sp(k), jnp.zeros(k, bool), dir_in, dir_out,
                    bx.BXDF_GLOSSY)
    got = np.stack([np.asarray(got.x), np.asarray(got.y),
                    np.asarray(got.z)], 1)
    want = np.stack([np_glossy_eval(wo[j], wi[j]) for j in range(k)])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_glossy_sampler_integrates_to_quadrature():
    """Gate B: E[f cos / pdf] under bxdf_sample == quadrature rho."""
    from fluctus_tpu.rng import burtle_hash
    theta_o = math.radians(35.0)
    wo = np.array([math.sin(theta_o), 0.0, math.cos(theta_o)])
    rho = np_glossy_rho(wo)

    m = 1 << 21
    n = Vec3(jnp.zeros(m), jnp.zeros(m), jnp.ones(m))
    dir_in = Vec3(jnp.full(m, -wo[0], jnp.float32), jnp.zeros(m),
                  jnp.full(m, -wo[2], jnp.float32))
    seed = burtle_hash(jnp.arange(m, dtype=jnp.uint32) + 123)
    d_out, pdf, f, _ = bxdf_sample(n, _sp(m), jnp.zeros(m, bool), dir_in,
                                   seed, bx.BXDF_GLOSSY)
    cos_i = np.asarray(d_out.z)
    pdf = np.asarray(pdf)
    ok = (pdf > 1e-9) & (cos_i > 0.0)
    w = np.where(ok, cos_i / np.maximum(pdf, 1e-30), 0.0)
    est = np.array([float((np.asarray(c) * w).mean())
                    for c in (f.x, f.y, f.z)])
    np.testing.assert_allclose(est, rho, rtol=5e-3)


def test_glossy_plane_render_matches_quadrature(tmp_path):
    """Gate C: end-to-end mk render, glossy plane + uniform unit env at
    normal-ish incidence (1-degree FOV) == quadrature rho(wo=n)."""
    from fluctus_tpu import rgbe
    from fluctus_tpu.renderer import Renderer
    from fluctus_tpu.settings import Settings

    env = str(tmp_path / "uniform.hdr")
    rgbe.write_hdr(env, np.ones((16, 32, 3), np.float32))
    obj = tmp_path / "plane.obj"
    obj.write_text("""
v -2000 -2000 0\nv 2000 -2000 0\nv 2000 2000 0\nv -2000 2000 0
f 1 2 3\nf 1 3 4\n""")

    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.use_russian_roulette = False
    s.max_path_depth = 2
    s.camera.pos = (0.0, 0.0, 50.0)
    s.camera.dir = (0.0, 0.0, -1.0)
    s.camera.fov = 1.0
    r = Renderer(8, 8, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene(str(obj), env_map=env, use_saved_state=False)
    for mmat in r.scene.materials:
        mmat.Kd = tuple(KD)
        mmat.Ks = (0.0, 0.0, 0.0)
        mmat.Ni = NI
        mmat.Ns = ALPHA            # post-remap alpha set directly
        mmat.type = bx.BXDF_GLOSSY
    r.reload_materials()
    r.render_single(spp=192)
    img = r.hdr_image()            # [h, w, 3] linear

    # the renderer's material resolve gamma-linearizes Kd — INCLUDING the
    # untextured fallback (reference parity: utils.cl:160-166 applies
    # pow(val, 2.2) unconditionally) — so the analytic expectation uses
    # the linearized albedo
    rho = np_glossy_rho(np.array([0.0, 0.0, 1.0]), kd=KD ** 2.2)
    got = img.reshape(-1, 3).mean(0)
    np.testing.assert_allclose(got, rho, rtol=0.025)
