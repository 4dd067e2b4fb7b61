"""Structure-of-arrays 3-vector math for TPU.

The reference renderer (fluctus) uses OpenCL ``float3`` per work-item. On TPU,
packing xyz into a trailing dim of 3 wastes 125/128 vector lanes, so we store
each component as its own full array (SoA). ``Vec3`` is a pytree (NamedTuple of
arrays), so it passes transparently through jit/vmap/shard_map and every
operation is a fully lane-utilized VPU op.

Semantics mirror the reference's vector helpers:
  - include/math/float3.hpp (host vectors)
  - src/utils.cl:72-80 (makeOrthoBasis), 30-64 (reflect/refract)
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


class Vec3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        return Vec3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # -- constructors -------------------------------------------------------
    @staticmethod
    def full(shape, value, dtype=jnp.float32) -> "Vec3":
        a = jnp.full(shape, value, dtype)
        return Vec3(a, a, a)

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "Vec3":
        return Vec3.full(shape, 0.0, dtype)

    @staticmethod
    def ones(shape, dtype=jnp.float32) -> "Vec3":
        return Vec3.full(shape, 1.0, dtype)

    @staticmethod
    def of(x, y, z) -> "Vec3":
        return Vec3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                    jnp.asarray(z, jnp.float32))

    @staticmethod
    def from_array(a) -> "Vec3":
        """[..., 3] array -> Vec3 of [...] components."""
        a = jnp.asarray(a)
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    def to_array(self) -> jnp.ndarray:
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    @property
    def shape(self):
        return jnp.shape(self.x)

    def astype(self, dtype) -> "Vec3":
        return Vec3(self.x.astype(dtype), self.y.astype(dtype), self.z.astype(dtype))


# -- free functions ----------------------------------------------------------

def dot(a: Vec3, b: Vec3) -> jnp.ndarray:
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(a.y * b.z - a.z * b.y,
                a.z * b.x - a.x * b.z,
                a.x * b.y - a.y * b.x)


def length(a: Vec3) -> jnp.ndarray:
    return jnp.sqrt(dot(a, a))


def normalize(a: Vec3) -> Vec3:
    inv = jax_rsqrt(jnp.maximum(dot(a, a), 1e-30))
    return a * inv


def jax_rsqrt(x):
    import jax.lax as lax
    return lax.rsqrt(x)


def vmin(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.minimum(a.x, b.x), jnp.minimum(a.y, b.y), jnp.minimum(a.z, b.z))


def vmax(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.maximum(a.x, b.x), jnp.maximum(a.y, b.y), jnp.maximum(a.z, b.z))


def where(cond: jnp.ndarray, a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.where(cond, a.x, b.x), jnp.where(cond, a.y, b.y),
                jnp.where(cond, a.z, b.z))


def lerp_bary(u, v, v1: Vec3, v2: Vec3, v3: Vec3) -> Vec3:
    """Barycentric interpolation, as src/utils.cl:25-28."""
    return v1 * (1.0 - u - v) + v2 * u + v3 * v


def reflect0(d: Vec3, n: Vec3) -> Vec3:
    """Mirror reflection of incoming dir d about n (src/utils.cl:30-33)."""
    return d - n * (2.0 * dot(d, n))


def refract1(wi: Vec3, n: Vec3, eta, i_dot_n, cos_theta_t) -> Vec3:
    """Refraction given precomputed cosThetaT (src/utils.cl:61-64)."""
    return wi * eta + n * (eta * i_dot_n - cos_theta_t)


def is_zero(a: Vec3) -> jnp.ndarray:
    return (a.x == 0.0) & (a.y == 0.0) & (a.z == 0.0)


def maxcomp(a: Vec3) -> jnp.ndarray:
    return jnp.maximum(a.x, jnp.maximum(a.y, a.z))


def mean(a: Vec3) -> jnp.ndarray:
    return (a.x + a.y + a.z) * (1.0 / 3.0)


def luminance(a: Vec3) -> jnp.ndarray:
    """sRGB luminance (src/utils.cl:262-265)."""
    return 0.212671 * a.x + 0.715160 * a.y + 0.072169 * a.z


def gather(a: Vec3, idx: jnp.ndarray, **kw) -> Vec3:
    """Component-wise gather — one lane-efficient 1D gather per component."""
    return Vec3(jnp.take(a.x, idx, **kw), jnp.take(a.y, idx, **kw),
                jnp.take(a.z, idx, **kw))
