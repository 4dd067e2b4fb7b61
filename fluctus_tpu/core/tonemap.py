"""Postprocess: exposure, tonemapping, gamma — port of src/mk_postprocess.cl
and src/tonemap.cl. Operator indices follow tracer_ui.cpp:355-366:
0 = Linear, 1 = Reinhard, 2 = Uncharted 2 filmic, 3 = Raw (no gamma).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..vec import Vec3

GAMMA = jnp.float32(0.454545454545454545)  # 1/2.2 (geom.h:12)


def reinhard(c: Vec3) -> Vec3:
    return Vec3(c.x / (1.0 + c.x), c.y / (1.0 + c.y), c.z / (1.0 + c.z))


def _uc2_func(x):
    # tonemap.cl:8-19 with its baked constants
    A, B, CB, DE, DF, ExF = 0.22, 0.30, 0.03, 0.002, 0.06, 1.0 / 30.0
    return ((x * (A * x + CB) + DE) / (x * (A * x + B) + DF)) - ExF


def uncharted2(c: Vec3) -> Vec3:
    w = _uc2_func(jnp.float32(11.2))
    f = lambda x: _uc2_func(2.0 * x) / w
    return Vec3(f(c.x), f(c.y), f(c.z))


def postprocess(color: Vec3, weight, exposure, tm_operator) -> Vec3:
    """mk_postprocess.cl:25-47: divide by sample count, exposure, tonemap,
    gamma (skipped for Raw). tm_operator is a traced int32 scalar."""
    inv_w = jnp.where(weight > 0.0, 1.0 / jnp.maximum(weight, 1e-30), 1.0)
    c = color * inv_w * exposure
    c_r = reinhard(c)
    c_u = uncharted2(c)
    pick = lambda lin, r, u: jnp.where(
        tm_operator == 1, r, jnp.where(tm_operator == 2, u, lin))
    c = Vec3(pick(c.x, c_r.x, c_u.x), pick(c.y, c_r.y, c_u.y),
             pick(c.z, c_r.z, c_u.z))
    g = lambda x: jnp.where(tm_operator == 3, x,
                            jnp.power(jnp.maximum(x, 0.0), GAMMA))
    return Vec3(g(c.x), g(c.y), g(c.z))
