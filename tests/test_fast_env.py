"""The single-gather env path must match the reference path closely."""

import numpy as np
import jax.numpy as jnp

from fluctus_tpu import envmap, vec
from fluctus_tpu.rng import rand
from fluctus_tpu.vec import Vec3

NIGHT = "/root/reference/assets/env_maps/night.hdr"


def _dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Vec3.of(d[:, 0], d[:, 1], d[:, 2])


def test_fast_eval_matches_bilinear(assets):
    env = envmap.EnvironmentMap(NIGHT).device_tables()
    d = _dirs(20_000)
    ref = envmap.eval_env_map_dir(env, d)
    li, pdf = envmap.eval_env_and_pdf_fast(env, d)
    # nearest-RGBE vs bilinear-f32: compare means and correlation
    a = np.asarray(vec.luminance(ref))
    b = np.asarray(vec.luminance(li))
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02
    assert np.corrcoef(a, b)[0, 1] > 0.97
    # pdf vs reference pdf lookup
    p_ref = np.asarray(envmap.env_map_pdf(env, d))
    p_fast = np.asarray(pdf)
    mask = p_ref > 1e-6
    rel = np.abs(p_fast[mask] - p_ref[mask]) / p_ref[mask]
    assert np.median(rel) < 0.01
    assert (rel < 0.05).mean() > 0.99


def test_fast_sample_matches(assets):
    env = envmap.EnvironmentMap(NIGHT).device_tables()
    seed = jnp.arange(50_000, dtype=jnp.uint32)
    u, _ = rand(seed)
    L1, p1 = envmap.sample_env_map_alias(env, u)
    L2, p2, li2 = envmap.sample_env_map_alias_fast(env, u)
    # quantized alias probs flip a tiny fraction of picks
    same = np.isclose(np.asarray(L1.x), np.asarray(L2.x), atol=1e-6)
    assert same.mean() > 0.999
    rel = np.abs(np.asarray(p2)[same] - np.asarray(p1)[same]) / \
        np.maximum(np.asarray(p1)[same], 1e-12)
    assert np.median(rel) < 0.01

    # MC integral with the fast path still matches the truth
    lum = np.asarray(vec.luminance(li2))
    est = (lum / np.maximum(np.asarray(p2), 1e-12))[np.asarray(p2) > 0].mean()
    ref = envmap.eval_env_map_dir(env, L1)
    est_ref = (np.asarray(vec.luminance(ref))
               / np.maximum(np.asarray(p1), 1e-12))[np.asarray(p1) > 0].mean()
    assert abs(est - est_ref) / est_ref < 0.03
