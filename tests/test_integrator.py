import numpy as np
import jax.numpy as jnp
import pytest

from fluctus_tpu.accel import build_bvh
from fluctus_tpu.accel.traverse import BVHDevice, TrianglesDevice
from fluctus_tpu.core.integrator_mk import Film, render_sample
from fluctus_tpu.core.trace import DeviceScene
from fluctus_tpu.envmap import EnvironmentMap
from fluctus_tpu.geom import (AreaLight, Camera, PostProcessParams,
                              RenderConfig, RenderParams)
from fluctus_tpu.scene.material import default_material, materials_to_soa
from fluctus_tpu.scene.texture import pack_atlas
from fluctus_tpu import bxdf_types as bx


def quad_scene(kd=0.5, z=0.0, size=50.0):
    """A large diffuse quad in the z=0 plane, facing +z."""
    p = np.array([
        [[-size, -size, z], [size, -size, z], [size, size, z]],
        [[-size, -size, z], [size, size, z], [-size, size, z]],
    ], np.float32)
    n = np.zeros_like(p)
    n[..., 2] = 1.0
    t = np.zeros((2, 3, 2), np.float32)
    mat_id = np.zeros(2, np.int32)
    mat = default_material()
    mat.Kd = (kd, kd, kd)
    mats = materials_to_soa([mat])
    bvh = build_bvh(p)
    return DeviceScene(
        tris=TrianglesDevice.from_arrays(p, n, t, mat_id),
        bvh=BVHDevice.from_host(bvh),
        mats=mats,
        atlas=pack_atlas([]),
        env=EnvironmentMap.from_array(np.ones((16, 32, 3), np.float32)).device_tables(),
        material_types=bx.BXDF_DIFFUSE)


def simple_setup(width=32, height=32, **cfg_kw):
    cam = Camera.make(pos=(0, 0, 5), dir=(0, 0, -1), up=(0, 1, 0),
                      right=(1, 0, 0), fov=40.0)
    light = AreaLight.make(pos=(0, 0, 30), N=(0, 0, -1), right=(1, 0, 0),
                           up=(0, 1, 0), E=(100, 100, 100), size=(0.5, 0.5))
    params = RenderParams(camera=cam, area_light=light,
                          env_map_strength=jnp.float32(1.0),
                          world_radius=jnp.float32(80.0),
                          pp=PostProcessParams(jnp.float32(1.0), jnp.int32(0)))
    config = RenderConfig(width=width, height=height, max_bounces=3,
                          use_env_map=True, use_area_light=False,
                          material_types=bx.BXDF_DIFFUSE, **cfg_kw)
    return params, config


def render(scene, params, config, spp):
    import jax
    film = Film.zeros(config.num_pixels)
    seed = jnp.arange(config.num_pixels, dtype=jnp.uint32)
    fn = jax.jit(render_sample, static_argnames="config")
    for _ in range(spp):
        film, seed, stats = fn(scene, params, film, seed, config)
    mean = np.stack([np.asarray(film.color.x), np.asarray(film.color.y),
                     np.asarray(film.color.z)], -1) / np.asarray(film.weight)[:, None]
    return mean.reshape(config.height, config.width, 3), stats


def test_white_furnace_quad():
    """Diffuse quad (Kd=0.5) under uniform unit-radiance env:
    Lo = albedo * Li = 0.5 — validates NEE+MIS weights sum correctly.
    Note matGetAlbedo gamma: effective albedo = 0.5^2.2."""
    scene = quad_scene(kd=0.5)
    params, config = simple_setup()
    img, stats = render(scene, params, config, spp=48)
    center = img[8:24, 8:24]
    expect = 0.5 ** 2.2
    assert abs(center.mean() - expect) / expect < 0.03, \
        f"furnace: got {center.mean():.4f}, want {expect:.4f}"
    assert int(stats.samples) == config.num_pixels


def test_mis_consistency():
    """Estimator must converge to the same value with NEE+BSDF MIS,
    NEE only, and BSDF sampling only."""
    scene = quad_scene(kd=0.8)
    results = {}
    for name, (impl, expl) in dict(
            mis=(True, True), nee=(False, True), bsdf=(True, False)).items():
        params, config = simple_setup(sample_impl=impl, sample_expl=expl)
        img, _ = render(scene, params, config, spp=96)
        results[name] = img[8:24, 8:24].mean()
    expect = 0.8 ** 2.2
    for name, val in results.items():
        assert abs(val - expect) / expect < 0.05, (name, val, expect)


def test_area_light_illumination():
    """Quad lit by area light only: analytic direct lighting check at the
    point directly under the light."""
    scene = quad_scene(kd=1.0)
    scene = scene.__class__(**{**scene.__dict__, "env": None})
    cam = Camera.make(pos=(0, 0, 5), dir=(0, 0, -1), up=(0, 1, 0),
                      right=(1, 0, 0), fov=10.0)
    h = 4.0  # light height above quad
    light = AreaLight.make(pos=(0, 0, h), N=(0, 0, -1), right=(1, 0, 0),
                           up=(0, 1, 0), E=(10, 10, 10), size=(0.1, 0.1))
    params = RenderParams(camera=cam, area_light=light,
                          env_map_strength=jnp.float32(1.0),
                          world_radius=jnp.float32(80.0),
                          pp=PostProcessParams(jnp.float32(1.0), jnp.int32(0)))
    config = RenderConfig(width=16, height=16, max_bounces=2,
                          use_env_map=False, use_area_light=True,
                          material_types=bx.BXDF_DIFFUSE)
    img, _ = render(scene, params, config, spp=256)
    # analytic: small light ~ point: L = E * A * cos1 * cos2 / (pi * d^2) * albedo/pi
    # with albedo=1 (gamma: 1.0^2.2 = 1): Lo = (Kd/pi) * E * (A * cos_l * cos_s / d^2)
    A = 0.2 * 0.2
    d = h - 5e-0 * 0  # quad at z=0, light at h
    Lo = (1.0 / np.pi) * 10.0 * A * 1.0 * 1.0 / (h * h)
    center = img[6:10, 6:10].mean()
    assert abs(center - Lo) / Lo < 0.08, (center, Lo)


def test_env_only_background():
    """Rays that miss geometry must show the env map itself."""
    scene = quad_scene(kd=0.5, size=0.01)  # tiny quad, mostly background
    params, config = simple_setup()
    img, _ = render(scene, params, config, spp=8)
    corner = img[:4, :4].mean()
    assert abs(corner - 1.0) < 0.02  # uniform env of radiance 1
