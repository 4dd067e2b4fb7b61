"""Denoiser end-to-end wiring: guide-feature accumulation in both
integrators (wf_logic.cl:214-237 semantics) and the Renderer denoise API
(OptixDenoiser stand-in, tracer.cpp:339-356 / 173-178)."""

import numpy as np
import pytest

from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings

TEAPOT = "/root/reference/assets/teapot.ply"
ENV = "/root/reference/assets/env_maps/night.hdr"


@pytest.fixture(scope="module")
def denoised_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("denoise")
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 3
    s.use_denoiser = True
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    r = Renderer(48, 48, settings=s, data_dir=str(tmp / "data"))
    r.load_scene(TEAPOT, env_map=ENV)
    return r, tmp


def test_mk_features_accumulate(denoised_setup):
    r, tmp = denoised_setup
    r.reset()
    r.render_single(spp=2)
    f = r.features
    assert f is not None
    nw = np.asarray(f.normal_w)
    aw = np.asarray(f.albedo_w)
    # teapot fills part of the frame: some pixels hit, some miss
    assert nw.max() == 2.0 and nw.min() == 0.0
    # diffuse teapot: albedo recorded wherever a first hit exists
    assert (aw[nw > 0] > 0).all()
    # averaged camera-space normals are ~unit where seen every sample
    albedo, normal = r.feature_images()
    flat_w = nw.reshape(48, 48)[::-1]
    full = flat_w == 2.0
    # (interpolated vertex normals are not exactly unit; silhouette pixels
    # average normals of different jittered hits)
    ln = np.linalg.norm(normal[full], axis=-1)
    assert (ln > 0.5).all() and (ln < 1.2).all()
    # first hits face the camera: +z in camera space
    assert (normal[full][:, 2] > 0).mean() > 0.95
    assert np.isfinite(albedo).all()


def test_denoise_reduces_mse(tmp_path):
    """Features + filter reduce MSE vs a high-spp reference on a noisy
    area-light render (soft shadows + GGX sampling noise at 1 spp)."""
    s = Settings()
    s.use_area_light = True
    s.max_path_depth = 4
    s.use_denoiser = True
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    s.area_light.pos = (0.0, 3.0, 1.0)
    s.area_light.N = (0.0, -1.0, 0.0)
    s.area_light.E = (60.0, 60.0, 60.0)
    r = Renderer(48, 48, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene(TEAPOT)
    r.reset()
    r.render_single(spp=96)
    ref = r.hdr_image()
    r.reset()
    r.render_single(spp=1)
    noisy = r.hdr_image()
    den = r.denoised_image(blend=1.0)
    mse_noisy = float(np.mean((noisy - ref) ** 2))
    mse_den = float(np.mean((den - ref) ** 2))
    assert mse_den < 0.9 * mse_noisy
    # blend control: 0 = passthrough
    passthrough = r.denoised_image(blend=0.0)
    np.testing.assert_allclose(passthrough, noisy, atol=1e-6)


def test_wavefront_features(denoised_setup):
    r, tmp = denoised_setup
    r.init_wavefront(4096)
    r.render_wavefront(6)
    r.film = r.wavefront_film()
    f = r.features
    assert f is not None
    nw = np.asarray(f.normal_w)
    aw = np.asarray(f.albedo_w)
    assert nw.sum() > 0 and aw.sum() > 0
    albedo, normal = r.feature_images()
    assert np.isfinite(albedo).all() and np.isfinite(normal).all()
    seen = nw.reshape(48, 48)[::-1] > 0
    ln = np.linalg.norm(normal[seen], axis=-1)
    assert (ln < 1.2).all()
    # denoise runs end-to-end on the wavefront film too
    den = r.denoised_image(blend=1.0)
    assert np.isfinite(den).all()
    out = str(tmp / "denoised.png")
    r.save_denoised(out)
    import os
    assert os.path.getsize(out) > 100
