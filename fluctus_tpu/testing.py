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
