"""Core geometry / parameter pytrees.

TPU-native equivalents of the reference's shared GPU structs (src/geom.h):
``GPUTaskState`` (geom.h:222-259) becomes the ``PathState`` SoA pytree,
``RenderParams`` (geom.h:183-203) splits into a *static* ``RenderConfig``
(hashable; a change triggers a retrace, the analogue of the reference's kernel
recompiles with -D flags, src/clcontext.cpp:877-900) and a *dynamic*
``RenderParams`` pytree (camera/light values that change without recompiling).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from .vec import Vec3

MIN_PATH_LENGTH = 5  # RR start depth (geom.h:39)


# ---------------------------------------------------------------------------
# Dynamic parameter pytrees (jit inputs)
# ---------------------------------------------------------------------------

class Camera(NamedTuple):
    """Pinhole + thin-lens camera (geom.h:165-175)."""
    pos: Vec3
    dir: Vec3
    up: Vec3
    right: Vec3
    fov: jnp.ndarray           # degrees
    fov_scale: jnp.ndarray     # tan(fov/2 in rad)
    aperture_size: jnp.ndarray
    focal_dist: jnp.ndarray

    @staticmethod
    def make(pos, dir, up, right, fov=60.0, aperture_size=0.0, focal_dist=0.5):
        import math
        f32 = lambda v: jnp.float32(v)
        return Camera(
            pos=Vec3.of(*pos), dir=Vec3.of(*dir), up=Vec3.of(*up),
            right=Vec3.of(*right), fov=f32(fov),
            fov_scale=f32(math.tan(math.radians(0.5 * float(fov)))),
            aperture_size=f32(aperture_size), focal_dist=f32(focal_dist))


class AreaLight(NamedTuple):
    """Rectangular area light (geom.h:120-128). size_* are half extents."""
    right: Vec3
    up: Vec3
    N: Vec3
    pos: Vec3
    E: Vec3
    size_x: jnp.ndarray
    size_y: jnp.ndarray

    @staticmethod
    def make(pos, N, right, up, E, size):
        f32 = lambda v: jnp.float32(v)
        return AreaLight(pos=Vec3.of(*pos), N=Vec3.of(*N), right=Vec3.of(*right),
                         up=Vec3.of(*up), E=Vec3.of(*E),
                         size_x=f32(size[0]), size_y=f32(size[1]))


class PostProcessParams(NamedTuple):
    exposure: jnp.ndarray
    tm_operator: jnp.ndarray  # 0 linear, 1 reinhard, 2 uncharted2, 3 raw


class RenderParams(NamedTuple):
    """Dynamic render parameters (geom.h:183-203, value part)."""
    camera: Camera
    area_light: AreaLight
    env_map_strength: jnp.ndarray
    world_radius: jnp.ndarray
    pp: PostProcessParams
    # spp cap VALUE (dynamic, like the reference's params.maxSpp kernel
    # arg) — the cap's presence stays a static gate (RenderConfig.max_spp
    # > 0 = CHECK_SPP), so retargeting spp does not retrace/recompile
    # (plain-int default: a jnp scalar here would initialize the JAX
    # backend at import time, before callers can configure platforms)
    max_spp: jnp.ndarray = 0


# ---------------------------------------------------------------------------
# Static config (hashable, passed as static argnum / closure)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Compile-time render flags — the analogue of the reference's kernel
    -D defines (src/kernel_impl.hpp getAdditionalBuildOptions) plus geometry
    sizes. Hashable so a change triggers a clean retrace."""
    width: int
    height: int
    max_bounces: int = 4
    use_env_map: bool = False
    use_area_light: bool = True
    sample_impl: bool = True        # implicit light hits (SAMPLE_IMPLICIT)
    sample_expl: bool = True        # next-event estimation (SAMPLE_EXPLICIT)
    use_roulette: bool = False
    max_spp: int = 0                # 0 = unbounded (CHECK_SPP off)
    material_types: int = 0         # OR of BXDF type bits present in scene
    backend: str = "jax"            # traversal backend: "jax" | "mxu"
    # Unroll the bounce loop at trace time. Required on TPU: gathers inside
    # lax loops serialize (~200x slower); straightline gathers vectorize.
    unroll_bounces: bool = False
    # Single-gather env-map path (RGBE-packed nearest lookup + derived pdf).
    # Preferred on TPU where every random gather costs ~7 ns/element.
    fast_env: bool = False
    # Accumulate denoiser guide features (first-hit camera-space normal +
    # first-diffuse-hit albedo, wf_logic.cl:214-237). Static gate like the
    # reference's USE_OPTIX_DENOISER define: off = zero cost.
    denoiser: bool = False
    # Block-bound wavefront pool: pool slots are partitioned into `groups`
    # groups, each bound to one contiguous pixel block with a private
    # raygen ring (the reference's single global pixel ring,
    # wf_raygen.cl:25, becomes one ring per block). Terminations then
    # splat into dense per-block accumulators (core/block_splat.py)
    # instead of a full-film scatter.
    block_ring: bool = False
    groups: int = 1024

    def block_plan(self, num_tasks: int):
        from .core.block_splat import plan
        return plan(self.num_pixels, num_tasks, self.groups)

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Hit record SoA
# ---------------------------------------------------------------------------

class Hit(NamedTuple):
    """Closest-hit record (geom.h:152-161), SoA over a ray batch."""
    P: Vec3
    N: Vec3
    uv_u: jnp.ndarray
    uv_v: jnp.ndarray
    t: jnp.ndarray
    i: jnp.ndarray              # triangle index, -1 = miss
    area_light_hit: jnp.ndarray  # int32 0/1
    mat_id: jnp.ndarray

    @staticmethod
    def empty(shape, tmax):
        z = jnp.zeros(shape, jnp.float32)
        return Hit(P=Vec3(z, z, z), N=Vec3(z, z, z), uv_u=z, uv_v=z,
                   t=jnp.full(shape, tmax, jnp.float32),
                   i=jnp.full(shape, -1, jnp.int32),
                   area_light_hit=jnp.zeros(shape, jnp.int32),
                   mat_id=jnp.full(shape, -1, jnp.int32))


# ---------------------------------------------------------------------------
# Path state SoA — GPUTaskState (geom.h:222-259) as a pytree of [N] arrays
# ---------------------------------------------------------------------------

class PathState(NamedTuple):
    orig: Vec3
    dir: Vec3
    shadow_orig: Vec3
    shadow_dir: Vec3
    T: Vec3                 # throughput / pdf
    Ei: Vec3                # accumulated irradiance
    last_bsdf: Vec3         # NEE bsdf eval, added if shadow ray unblocked
    last_emission: Vec3
    last_T: Vec3
    hit: Hit
    last_pdf_w: jnp.ndarray
    path_len: jnp.ndarray       # uint32
    seed: jnp.ndarray           # uint32 RNG state
    last_specular: jnp.ndarray  # bool
    shadow_blocked: jnp.ndarray  # bool
    backface: jnp.ndarray       # bool
    pixel_index: jnp.ndarray    # int32
    first_diffuse_hit: jnp.ndarray  # bool (denoiser features)
    last_pdf_direct: jnp.ndarray
    last_pdf_implicit: jnp.ndarray
    last_cos_th: jnp.ndarray
    last_light_pick_prob: jnp.ndarray
    shadow_ray_len: jnp.ndarray

    @staticmethod
    def reset(num_tasks: int, world_radius=1.0, seed_offset: int = 0) -> "PathState":
        """Initial state, as wf_reset.cl:33-61 (seed = gid)."""
        n = num_tasks
        z = jnp.zeros(n, jnp.float32)
        return PathState(
            orig=Vec3(z, z, z), dir=Vec3(z, z, z),
            shadow_orig=Vec3(z, z, z), shadow_dir=Vec3(z, z, z),
            T=Vec3.ones(n), Ei=Vec3.zeros(n),
            last_bsdf=Vec3.zeros(n), last_emission=Vec3.zeros(n),
            last_T=Vec3.zeros(n),
            hit=Hit.empty(n, jnp.finfo(jnp.float32).max),
            last_pdf_w=jnp.ones(n, jnp.float32),
            path_len=jnp.zeros(n, jnp.uint32),
            seed=(jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(seed_offset)),
            last_specular=jnp.ones(n, bool),
            shadow_blocked=jnp.ones(n, bool),
            backface=jnp.zeros(n, bool),
            pixel_index=jnp.zeros(n, jnp.int32),
            first_diffuse_hit=jnp.zeros(n, bool),
            last_pdf_direct=z, last_pdf_implicit=z, last_cos_th=z,
            last_light_pick_prob=jnp.ones(n, jnp.float32),
            shadow_ray_len=jnp.full(n, 2.0 * world_radius, jnp.float32),
        )


# ---------------------------------------------------------------------------
# Materials SoA (device form of geom.h:130-143)
# ---------------------------------------------------------------------------

class MaterialsSoA(NamedTuple):
    Kd: Vec3
    Ks: Vec3
    Ke: Vec3
    Kt: Vec3
    Ns: jnp.ndarray      # GGX alpha after toRoughness remap (scene.cpp:13-16)
    Ni: jnp.ndarray
    d: jnp.ndarray       # dissolve
    map_Kd: jnp.ndarray  # int32 texture idx, -1 = none
    map_Ks: jnp.ndarray
    map_N: jnp.ndarray
    type: jnp.ndarray    # int32 BXDF bits

    def gather(self, mat_id: jnp.ndarray) -> "MaterialsSoA":
        from . import vec
        idx = jnp.maximum(mat_id, 0)
        g = lambda a: jnp.take(a, idx)
        return MaterialsSoA(
            Kd=vec.gather(self.Kd, idx), Ks=vec.gather(self.Ks, idx),
            Ke=vec.gather(self.Ke, idx), Kt=vec.gather(self.Kt, idx),
            Ns=g(self.Ns), Ni=g(self.Ni), d=g(self.d),
            map_Kd=g(self.map_Kd), map_Ks=g(self.map_Ks), map_N=g(self.map_N),
            type=g(self.type))
