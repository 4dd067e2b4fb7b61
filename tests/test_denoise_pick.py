import numpy as np
import jax.numpy as jnp
import pytest

from fluctus_tpu.core.denoise import atrous_denoise


def test_atrous_reduces_noise():
    rng = np.random.default_rng(0)
    clean = np.zeros((64, 64, 3), np.float32)
    clean[:, :32] = 0.2
    clean[:, 32:] = 0.8
    noisy = clean + rng.normal(0, 0.15, clean.shape).astype(np.float32)
    out = np.asarray(atrous_denoise(jnp.asarray(noisy), iterations=3))
    err_before = np.abs(noisy - clean).mean()
    err_after = np.abs(out - clean).mean()
    assert err_after < err_before * 0.6
    # edge mostly preserved: means of the two halves stay distinct
    assert abs(out[:, :28].mean() - 0.2) < 0.08
    assert abs(out[:, 36:].mean() - 0.8) < 0.08


def test_atrous_blend_zero_identity():
    rng = np.random.default_rng(1)
    img = rng.random((16, 16, 3)).astype(np.float32)
    out = np.asarray(atrous_denoise(jnp.asarray(img), blend=0.0))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_pick_single():
    from fluctus_tpu.renderer import Renderer
    from fluctus_tpu.settings import Settings
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    r = Renderer(32, 32, settings=s, data_dir="/tmp/picktest")
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    ok, t, tri = r.pick_single(0.5, 0.5)  # center: teapot
    assert ok and 0.5 < t < 10.0
    before = r.settings.camera.focal_dist
    assert r.pick_dof_depth(0.5, 0.5)
    assert r.settings.camera.focal_dist == pytest.approx(t)
