import os

import numpy as np
import jax.numpy as jnp

from fluctus_tpu import envmap, rgbe, vec
from fluctus_tpu.rng import rand
from fluctus_tpu.vec import Vec3

NIGHT = "/root/reference/assets/env_maps/night.hdr"


def test_rgbe_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((16, 32, 3)) * 10.0).astype(np.float32)
    p = str(tmp_path / "x.hdr")
    rgbe.write_hdr(p, img)
    back, w, h = rgbe.read_hdr(p)
    assert (w, h) == (32, 16)
    # rgbe precision: half a quantization step of the shared exponent
    step = img.max(axis=-1, keepdims=True) / 128.0
    assert (np.abs(back - img) <= step + 1e-4).all()


def test_read_night_hdr(assets):
    data, w, h = rgbe.read_hdr(NIGHT)
    assert (w, h) == (512, 256)
    assert data.shape == (256, 512, 3)
    assert np.isfinite(data).all()
    assert data.max() > 0.0


def test_alias_table_statistics():
    # A small, spiky distribution: alias sampling must reproduce it exactly
    rng = np.random.default_rng(1)
    n = 256
    weights = rng.random(n) ** 4 + 1e-4
    pdf = weights / weights.sum() * n  # n-normalized
    prob, alias = envmap.build_alias_table(pdf)

    # Draw via the same logic as sample_env_map_alias
    m = 2_000_000
    u = rng.random(m)
    r = u * n
    i = np.minimum(np.floor(r).astype(np.int64), n - 1)
    take_alias = (r - i) >= prob[i]
    idx = np.where(take_alias, alias[i], i)
    counts = np.bincount(idx, minlength=n) / m
    np.testing.assert_allclose(counts, pdf / n, atol=5e-4)


def test_uv_direction_roundtrip():
    rng = np.random.default_rng(2)
    d = rng.standard_normal((1000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    v3 = Vec3.of(d[:, 0], d[:, 1], d[:, 2])
    u, v = envmap.direction_to_uv(v3)
    back, sin_phi = envmap.uv_to_direction(u, v)
    np.testing.assert_allclose(np.asarray(back.to_array()), d, atol=1e-4)
    assert (np.asarray(sin_phi) >= 0).all()


def test_env_pdf_integrates_to_one(assets):
    """Monte Carlo: E[1/pdf] over alias samples ~= solid angle measure 4pi...
    Actually with pdf in solid-angle measure, E_unif? Instead verify that
    sampled directions have pdf matching env_map_pdf lookup (consistency)."""
    env = envmap.EnvironmentMap(NIGHT).device_tables()
    seed = jnp.arange(50_000, dtype=jnp.uint32)
    u, seed = rand(seed)
    L, pdf = envmap.sample_env_map_alias(env, u)
    # consistency with the MIS pdf lookup (away from the y>0.99 guard)
    pdf2 = envmap.env_map_pdf(env, L)
    mask = np.asarray(L.y) <= 0.98
    a, b = np.asarray(pdf)[mask], np.asarray(pdf2)[mask]
    # Both use pdfTable[uvInd]/sin; uv reconstruction differs slightly
    # (reference quirk in v), so compare loosely
    ok = np.isclose(a, b, rtol=0.35) | (np.abs(a - b) < 1e-3)
    assert ok.mean() > 0.95

    # Monte Carlo integral of Li/pdf should approximate the true integral
    Li = envmap.eval_env_map_dir(env, L)
    lum = np.asarray(vec.luminance(Li))
    est = (lum / np.maximum(np.asarray(pdf), 1e-12))[np.asarray(pdf) > 0].mean()

    # ground truth: integral of luminance over sphere
    data, w, h = rgbe.read_hdr(NIGHT)
    vgrid = (np.arange(h) + 0.5) / h
    sin_th = np.sin(np.pi * vgrid)[:, None]
    lum_img = 0.212671 * data[..., 0] + 0.715160 * data[..., 1] + 0.072169 * data[..., 2]
    truth = (lum_img * sin_th).sum() * (2 * np.pi * np.pi) / (w * h)
    assert abs(est - truth) / truth < 0.05
