"""Small built-in scenes for smoke tests, compile checks and dry runs."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import bxdf_types as bx
from .accel import build_bvh
from .accel.traverse import BVHDevice, TrianglesDevice
from .core.trace import DeviceScene
from .envmap import EnvironmentMap
from .geom import (AreaLight, Camera, PostProcessParams, RenderConfig,
                   RenderParams)
from .scene.material import default_material, materials_to_soa
from .scene.texture import pack_atlas


def quad_scene(kd: float = 0.5, size: float = 50.0,
               with_env: bool = True) -> DeviceScene:
    """A large diffuse quad at z=0 facing +z under a uniform env map."""
    p = np.array([
        [[-size, -size, 0.0], [size, -size, 0.0], [size, size, 0.0]],
        [[-size, -size, 0.0], [size, size, 0.0], [-size, size, 0.0]],
    ], np.float32)
    n = np.zeros_like(p)
    n[..., 2] = 1.0
    t = np.zeros((2, 3, 2), np.float32)
    mat = default_material()
    mat.Kd = (kd, kd, kd)
    env = None
    if with_env:
        env = EnvironmentMap.from_array(
            np.ones((16, 32, 3), np.float32)).device_tables()
    return DeviceScene(
        tris=TrianglesDevice.from_arrays(p, n, t, np.zeros(2, np.int32)),
        bvh=BVHDevice.from_host(build_bvh(p)),
        mats=materials_to_soa([mat]),
        atlas=pack_atlas([]),
        env=env,
        material_types=bx.BXDF_DIFFUSE)


def quad_setup(width: int = 32, height: int = 32, max_bounces: int = 3,
               use_area_light: bool = False, **cfg_kw):
    cam = Camera.make(pos=(0, 0, 5), dir=(0, 0, -1), up=(0, 1, 0),
                      right=(1, 0, 0), fov=40.0)
    light = AreaLight.make(pos=(0, 0, 4), N=(0, 0, -1), right=(1, 0, 0),
                           up=(0, 1, 0), E=(10, 10, 10), size=(0.5, 0.5))
    params = RenderParams(camera=cam, area_light=light,
                          env_map_strength=jnp.float32(1.0),
                          world_radius=jnp.float32(80.0),
                          pp=PostProcessParams(jnp.float32(1.0), jnp.int32(0)))
    config = RenderConfig(width=width, height=height, max_bounces=max_bounces,
                          use_env_map=True, use_area_light=use_area_light,
                          material_types=bx.BXDF_DIFFUSE, **cfg_kw)
    return params, config


def egyptcat_scene(width: int = 64, height: int = 32, max_bounces: int = 3,
                   **cfg_kw):
    """The REAL flagship scene at test size: egyptcat OBJ (18k tris, GGX +
    textures) with the night.hdr environment — full DeviceScene pytree
    (BVH, packed texture atlas, env radiance/pdf/alias tables, baked
    material set), pure-JAX bitstack backend (mxu=None; interpretable on
    any backend). Serves the multichip dryrun / sharded bit-exactness
    tests so the sharding evidence covers the production pytree, not just
    the 2-triangle quad (clcontext.cpp:917-927 ring semantics per shard).

    Returns (scene, params, config)."""
    import os
    from .scene.scene import Scene

    assets = "/root/reference/assets"
    sc = Scene()
    sc.load_model(os.path.join(assets, "egyptcat", "egyptcat.obj"))
    sc.load_env_map(os.path.join(assets, "env_maps", "night.hdr"))
    bvh = build_bvh(sc.triangle_arrays()[0])
    scene = DeviceScene(
        tris=TrianglesDevice.from_arrays(*sc.triangle_arrays()),
        bvh=BVHDevice.from_host(bvh),
        mats=sc.device_materials(),
        atlas=sc.device_textures(),
        env=sc.envmap.device_tables(),
        material_types=sc.material_types)
    cam = Camera.make(pos=(0.0, 1.1, 3.2), dir=(0.0, -0.25, -1.0),
                      up=(0, 1, 0), right=(1, 0, 0), fov=50.0)
    light = AreaLight.make(pos=(0, 3, 0), N=(0, -1, 0), right=(1, 0, 0),
                           up=(0, 0, 1), E=(10, 10, 10), size=(0.5, 0.5))
    params = RenderParams(camera=cam, area_light=light,
                          env_map_strength=jnp.float32(1.0),
                          world_radius=jnp.float32(sc.world_radius()),
                          pp=PostProcessParams(jnp.float32(1.0), jnp.int32(0)))
    config = RenderConfig(width=width, height=height,
                          max_bounces=max_bounces, use_env_map=True,
                          use_area_light=False,
                          material_types=sc.material_types, **cfg_kw)
    return scene, params, config
