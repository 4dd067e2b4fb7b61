import numpy as np
import jax.numpy as jnp

from fluctus_tpu import bxdf_types as bx
from fluctus_tpu import vec
from fluctus_tpu.bsdf import ShadingParams, bxdf_eval, bxdf_pdf, bxdf_sample
from fluctus_tpu.bsdf.fresnel import fresnel_dielectric
from fluctus_tpu.vec import Vec3

N = 200_000


def make_params(n, **kw):
    z = jnp.zeros(n)
    o = jnp.ones(n)
    defaults = dict(
        Kd=Vec3(o, o, o), Ks=Vec3(o, o, o), Ke=Vec3(z, z, z), Kt=Vec3(z, z, z),
        alpha=jnp.full(n, 0.2), Ni=jnp.full(n, 1.5), d=o,
        type=jnp.full(n, bx.BXDF_DIFFUSE, jnp.int32),
        map_N=jnp.full(n, -1, jnp.int32),
        map_Kd=jnp.full(n, -1, jnp.int32),
        map_Ks=jnp.full(n, -1, jnp.int32))
    for k, v in kw.items():
        if k == "type":
            defaults[k] = jnp.full(n, v, jnp.int32)
        elif k in ("Kd", "Ks", "Ke", "Kt"):
            defaults[k] = Vec3(jnp.full(n, v[0]), jnp.full(n, v[1]), jnp.full(n, v[2]))
        else:
            defaults[k] = jnp.full(n, v)
    return ShadingParams(**defaults)


def up_normal(n):
    return Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))


def incoming_dir(n, cos_theta=0.7):
    # dirIn points TOWARD the surface
    s = np.sqrt(1 - cos_theta**2)
    return Vec3(jnp.full(n, s), jnp.zeros(n), jnp.full(n, -cos_theta))


def test_diffuse_furnace():
    """E[f * cos / pdf] = albedo = 1 for Kd=1 (white furnace)."""
    nrm = up_normal(N)
    sp = make_params(N, type=bx.BXDF_DIFFUSE)
    seed = jnp.arange(N, dtype=jnp.uint32)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(N, bool),
                                   incoming_dir(N), seed, bx.BXDF_DIFFUSE)
    est = np.asarray(vec.luminance(f)) * np.asarray(vec.dot(nrm, d_out)) \
        / np.maximum(np.asarray(pdf), 1e-9)
    assert abs(est.mean() - 1.0) < 5e-3


def test_diffuse_pdf_consistency():
    nrm = up_normal(N)
    sp = make_params(N, type=bx.BXDF_DIFFUSE)
    seed = jnp.arange(N, dtype=jnp.uint32)
    d_in = incoming_dir(N)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(N, bool), d_in, seed,
                                   bx.BXDF_DIFFUSE)
    pdf2 = bxdf_pdf(nrm, sp, jnp.zeros(N, bool), d_in, d_out, bx.BXDF_DIFFUSE)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), atol=1e-5)
    ev = bxdf_eval(nrm, sp, jnp.zeros(N, bool), d_in, d_out, bx.BXDF_DIFFUSE)
    np.testing.assert_allclose(np.asarray(ev.x), np.asarray(f.x), atol=1e-6)


def test_ggx_reflect_pdf_consistency_and_energy():
    n = 100_000
    nrm = up_normal(n)
    t = bx.BXDF_GGX_ROUGH_REFLECTION
    sp = make_params(n, type=t, alpha=0.3, Ni=1.0)  # Ni<=1 -> F=1
    seed = jnp.arange(n, dtype=jnp.uint32) + 17
    d_in = incoming_dir(n)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(n, bool), d_in, seed, t)
    pdf2 = bxdf_pdf(nrm, sp, jnp.zeros(n, bool), d_in, d_out, t)
    # below-horizon samples (cos_o <= 0) recompute a sign-flipped half-vector
    # and get pdf 0 — the integrator rejects them; check the valid set
    good = (np.asarray(pdf) > 1e-6) & (np.asarray(vec.dot(nrm, d_out)) > 0)
    np.testing.assert_allclose(np.asarray(pdf)[good], np.asarray(pdf2)[good],
                               rtol=1e-3)
    ev = bxdf_eval(nrm, sp, jnp.zeros(n, bool), d_in, d_out, t)
    np.testing.assert_allclose(np.asarray(ev.x)[good], np.asarray(f.x)[good],
                               rtol=1e-3, atol=1e-5)
    # single-scatter GGX loses some energy but must stay below 1
    cos_o = np.asarray(vec.dot(nrm, d_out))
    valid = good & (cos_o > 0)
    est = (np.asarray(f.x) * cos_o / np.maximum(np.asarray(pdf), 1e-9))[valid]
    mean = est.mean() * valid.mean()  # invalid samples contribute 0
    assert 0.6 < mean <= 1.02


def test_glossy_pdf_consistency():
    n = 100_000
    nrm = up_normal(n)
    t = bx.BXDF_GLOSSY
    sp = make_params(n, type=t, Kd=(0.5, 0.5, 0.5), Ks=(0.3, 0.3, 0.3),
                     alpha=0.2, Ni=1.5)
    seed = jnp.arange(n, dtype=jnp.uint32) + 99
    d_in = incoming_dir(n)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(n, bool), d_in, seed, t)
    pdf2 = bxdf_pdf(nrm, sp, jnp.zeros(n, bool), d_in, d_out, t)
    good = (np.asarray(pdf) > 1e-5) & (np.asarray(vec.dot(nrm, d_out)) > 1e-4)
    np.testing.assert_allclose(np.asarray(pdf)[good], np.asarray(pdf2)[good],
                               rtol=2e-3)


def test_ideal_reflection():
    n = 1000
    nrm = up_normal(n)
    t = bx.BXDF_IDEAL_REFLECTION
    sp = make_params(n, type=t, Ks=(0.8, 0.8, 0.8))
    d_in = incoming_dir(n, 0.6)
    seed = jnp.arange(n, dtype=jnp.uint32)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(n, bool), d_in, seed, t)
    # mirror direction
    expect = np.asarray(vec.reflect0(d_in, nrm).to_array())
    np.testing.assert_allclose(np.asarray(d_out.to_array()), expect, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf), 1.0)
    # f = Ks / cosO
    np.testing.assert_allclose(np.asarray(f.x), 0.8 / 0.6, rtol=1e-5)


def test_ideal_dielectric_fresnel_split():
    n = 400_000
    nrm = up_normal(n)
    t = bx.BXDF_IDEAL_DIELECTRIC
    sp = make_params(n, type=t, Ks=(1.0, 1.0, 1.0), Ni=1.5)
    cos_i = 0.8
    d_in = incoming_dir(n, cos_i)
    seed = jnp.arange(n, dtype=jnp.uint32) + 5
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(n, bool), d_in, seed, t)
    # Reflected fraction should match Fresnel
    refl = np.asarray(d_out.z) > 0
    fr = float(fresnel_dielectric(jnp.float32(cos_i), 1.0, 1.5))
    assert abs(refl.mean() - fr) < 5e-3
    # refracted dirs obey Snell's law: sin_t = sin_i / 1.5
    sin_t = np.sqrt(np.asarray(d_out.x)[~refl]**2 + np.asarray(d_out.y)[~refl]**2)
    sin_i = np.sqrt(1 - cos_i**2)
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), 1.0)


def test_emissive_terminates():
    n = 64
    nrm = up_normal(n)
    t = bx.BXDF_EMISSIVE
    sp = make_params(n, type=t, Ke=(2.0, 2.0, 2.0))
    seed = jnp.arange(n, dtype=jnp.uint32)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(n, bool),
                                   incoming_dir(n), seed, t)
    np.testing.assert_allclose(np.asarray(pdf), 0.0)
    ev = bxdf_eval(nrm, sp, jnp.zeros(n, bool), incoming_dir(n), d_out, t)
    np.testing.assert_allclose(np.asarray(ev.x), 2.0)


def test_mixed_dispatch_matches_diffuse():
    n = 1024
    nrm = up_normal(n)
    sp_mixed = make_params(n, type=bx.BXDF_MIXED, Kd=(0.5, 0.5, 0.5))
    sp_diff = make_params(n, type=bx.BXDF_DIFFUSE, Kd=(0.5, 0.5, 0.5))
    seed = jnp.arange(n, dtype=jnp.uint32)
    d_in = incoming_dir(n)
    o1 = bxdf_sample(nrm, sp_mixed, jnp.zeros(n, bool), d_in, seed,
                     bx.BXDF_MIXED | bx.BXDF_DIFFUSE)
    o2 = bxdf_sample(nrm, sp_diff, jnp.zeros(n, bool), d_in, seed,
                     bx.BXDF_DIFFUSE)
    np.testing.assert_allclose(np.asarray(o1[0].to_array()),
                               np.asarray(o2[0].to_array()))
    np.testing.assert_allclose(np.asarray(o1[1]), np.asarray(o2[1]))


def test_ggx_refract_pdf_consistency():
    """Rough dielectric (Walter et al., ggx.cl:159-228). The dispatch-level
    eval/pdf follow the reference's two-sided convention (frontface =
    reflection lobe only, transmission reachable only via the backface
    branch) — so reflection samples are checked through bxdf_pdf/eval, and
    transmission samples against the lobe-level pdf/eval re-derivation."""
    from fluctus_tpu.bsdf import ggx as ggx_mod
    n = 100_000
    nrm = up_normal(n)
    t = bx.BXDF_GGX_ROUGH_DIELECTRIC
    sp = make_params(n, type=t, Ks=(1.0, 1.0, 1.0), alpha=0.2, Ni=1.5)
    seed = jnp.arange(n, dtype=jnp.uint32) + 31
    d_in = incoming_dir(n)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(n, bool), d_in, seed, t)
    cos_o = np.asarray(vec.dot(nrm, d_out))
    refl = cos_o > 1e-4
    pdf2 = np.asarray(bxdf_pdf(nrm, sp, jnp.zeros(n, bool), d_in, d_out, t))
    good = refl & (np.asarray(pdf) > 1e-5)
    assert good.mean() > 0.03      # fr(0.7, 1.5) ~ 0.05 of samples reflect
    np.testing.assert_allclose(np.asarray(pdf)[good], pdf2[good], rtol=2e-3)
    ev = bxdf_eval(nrm, sp, jnp.zeros(n, bool), d_in, d_out, t)
    np.testing.assert_allclose(np.asarray(ev.x)[good], np.asarray(f.x)[good],
                               rtol=2e-3, atol=1e-4)
    # transmission branch: the sampled pdf must match the lobe pdf
    # recomputed from the half-vector (exactly the ggxPdfRefract path)
    h2 = vec.normalize(d_in * 1.0 - d_out * 1.5)
    p_refr = np.asarray(ggx_mod.ggx_pdf_refract(
        jnp.full(n, 0.2), 1.0, 1.5, Vec3(-d_in.x, -d_in.y, -d_in.z), d_out,
        nrm, h2))
    tr = (cos_o < -1e-4) & (np.asarray(pdf) > 1e-5)
    assert tr.mean() > 0.8
    # grazing half-vector reconstruction cancels in f32 — a small tail
    # legitimately diverges; gate the fraction within tolerance
    ok = np.isclose(np.asarray(pdf)[tr], p_refr[tr], rtol=2e-3)
    assert ok.mean() > 0.99, ok.mean()


def test_ggx_refract_energy_vs_ideal():
    """Single-scatter rough-dielectric energy: E[f*|cosO|/pdf] must stay at
    or below the ideal-dielectric budget fr + (1-fr)*eta^2 (the eta^2 is
    the radiance compression crossing into the denser medium,
    ideal_dielectric.cl:35-41) and lose only shadowing/masking energy."""
    n = 400_000
    nrm = up_normal(n)
    t = bx.BXDF_GGX_ROUGH_DIELECTRIC
    cos_i = 0.8
    sp = make_params(n, type=t, Ks=(1.0, 1.0, 1.0), alpha=0.15, Ni=1.5)
    seed = jnp.arange(n, dtype=jnp.uint32) + 77
    d_in = incoming_dir(n, cos_i)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(n, bool), d_in, seed, t)
    pdfn = np.asarray(pdf)
    cos_o = np.asarray(vec.dot(nrm, d_out))
    # signed cosine: the refract-branch bsdf is negative on the frontface
    # and the integrator's T *= f * dot(n, d)/pdf cancels the signs
    # (integrator_wf.py:559, matching sampleGGXRefract's focus term)
    est = np.where(pdfn > 1e-6,
                   np.asarray(f.x) * cos_o / np.maximum(pdfn, 1e-9),
                   0.0)
    fr = float(fresnel_dielectric(jnp.float32(cos_i), 1.0, 1.5))
    ideal = fr + (1.0 - fr) * (1.0 / 1.5) ** 2
    mean = est.mean()
    assert 0.6 * ideal < mean <= ideal * 1.03, (mean, ideal)


def test_ideal_dielectric_round_trip_flux():
    """Radiance eta^2 scaling must cancel over an enter+exit pair
    (ideal_dielectric.cl:35-41): w_in * w_out == 1 for the refract branch."""
    n = 200_000
    nrm = up_normal(n)
    t = bx.BXDF_IDEAL_DIELECTRIC
    sp = make_params(n, type=t, Ks=(1.0, 1.0, 1.0), Ni=1.5)
    seed = jnp.arange(n, dtype=jnp.uint32) + 123
    cos_i = 0.9
    d_in = incoming_dir(n, cos_i)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(n, bool), d_in, seed, t)
    refr = np.asarray(d_out.z) < 0
    # signed cosine (see test_ggx_refract_energy_vs_ideal)
    w_in = (np.asarray(f.x) * np.asarray(vec.dot(nrm, d_out))
            / np.asarray(pdf))
    # exiting through a parallel slab face: backface hit; the integrator
    # hands bxdf_sample the normal already flipped toward the ray
    # (integrator_wf.py:447-448), i.e. +z for the downward refracted ray
    d_in2 = Vec3(jnp.asarray(np.asarray(d_out.x)),
                 jnp.asarray(np.asarray(d_out.y)),
                 jnp.asarray(np.asarray(d_out.z)))
    d3, pdf3, f3, _ = bxdf_sample(nrm, sp, jnp.ones(n, bool), d_in2,
                                  seed + 1, t)
    w_out = (np.asarray(f3.x)
             * np.asarray(vec.dot(nrm, d3)) / np.asarray(pdf3))
    refr2 = refr & (np.asarray(d3.z) < 0)     # refracted out again
    prod = (w_in * w_out)[refr2]
    assert refr2.mean() > 0.3
    np.testing.assert_allclose(prod, 1.0, rtol=1e-4)


def test_glossy_furnace_bound():
    """Glossy coat (glossy.cl:24-63): white Kd under a full coat must not
    gain energy: E[f*cosO/pdf] <= 1."""
    n = 400_000
    nrm = up_normal(n)
    t = bx.BXDF_GLOSSY
    sp = make_params(n, type=t, Kd=(1.0, 1.0, 1.0), Ks=(1.0, 1.0, 1.0),
                     alpha=0.2, Ni=1.5)
    seed = jnp.arange(n, dtype=jnp.uint32) + 9
    d_in = incoming_dir(n)
    d_out, pdf, f, _ = bxdf_sample(nrm, sp, jnp.zeros(n, bool), d_in, seed, t)
    pdfn = np.asarray(pdf)
    cos_o = np.asarray(vec.dot(nrm, d_out))
    est = np.where((pdfn > 1e-6) & (cos_o > 0),
                   np.asarray(f.x) * cos_o / np.maximum(pdfn, 1e-9), 0.0)
    mean = est.mean()
    assert 0.7 < mean <= 1.02, mean
