"""Device-side texture fetch from the packed atlas.

Port of readTexture/getTexelCoords (src/utils.cl:139-158): nearest-neighbor
with wrap addressing, clamped to the texture rect, and matGetAlbedo's 2.2
gamma linearization (utils.cl:161-166 — note the reference applies the gamma
to the constant fallback color too; reproduced). One uint32 gather per texel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scene.texture import TextureAtlas
from .vec import Vec3, where as vwhere

ONE_255 = jnp.float32(1.0 / 255.0)


def take_u32(table, idx):
    """jnp.take from a uint32 table via an int32 bitcast. On this TPU a
    gather whose table is uint32 stages operands ~4x slower than int32
    (130 ms vs 30 ms @1M measured); the bitcast is free and keeps the
    fast path."""
    s = jax.lax.bitcast_convert_type(table, jnp.int32)
    return jax.lax.bitcast_convert_type(jnp.take(s, idx), jnp.uint32)


def _fetch_texel(texels, off, w, h, u, v) -> Vec3:
    """Nearest-with-wrap texel fetch given per-lane descriptors — exactly
    one gather (the texel itself)."""
    x = u * w.astype(jnp.float32)
    y = v * h.astype(jnp.float32)
    ws = jnp.maximum(w, 1)
    hs = jnp.maximum(h, 1)
    tx = jnp.mod(jnp.mod(jnp.floor(x).astype(jnp.int32), ws) + ws, ws)
    ty = jnp.mod(jnp.mod(jnp.floor(y).astype(jnp.int32), hs) + hs, hs)
    tx = jnp.clip(tx, 0, w - 1)
    ty = jnp.clip(ty, 0, h - 1)

    texel = take_u32(texels, off + ty * w + tx)
    r = (texel & 0xFF).astype(jnp.float32) * ONE_255
    g = ((texel >> 8) & 0xFF).astype(jnp.float32) * ONE_255
    b = ((texel >> 16) & 0xFF).astype(jnp.float32) * ONE_255
    return Vec3(r, g, b)


def fetch_texture(atlas: TextureAtlas, tex_idx, u, v) -> Vec3:
    """Nearest-with-wrap texel fetch for per-lane texture indices.
    tex_idx may be -1 (caller masks the result)."""
    safe = jnp.maximum(tex_idx, 0)
    w = jnp.take(atlas.width, safe)
    h = jnp.take(atlas.height, safe)
    off = jnp.take(atlas.offset, safe)
    return _fetch_texel(atlas.texels, off, w, h, u, v)


def mat_get_float3(fallback: Vec3, u, v, tex_idx, atlas: TextureAtlas,
                   used: bool = True, meta=None) -> Vec3:
    """utils.cl:168-171 — texture if bound, else constant. No gamma.
    Statically pruned when the scene has no textures (or `used` is False:
    no material references this map type). With baked descriptors (meta =
    per-lane (off, w, h), from the MXU attr resolve) the fetch costs one
    gather instead of four."""
    if atlas.count == 0 or not used:
        return fallback
    if meta is not None:
        off, w, h = meta
        tex = _fetch_texel(atlas.texels, off, w, h, u, v)
    else:
        tex = fetch_texture(atlas, tex_idx, u, v)
    return vwhere(tex_idx >= 0, tex, fallback)


def mat_get_albedo(fallback: Vec3, u, v, tex_idx, atlas: TextureAtlas,
                   used: bool = True, meta=None) -> Vec3:
    """utils.cl:161-166 — like mat_get_float3 but gamma-linearized (^2.2),
    applied to the fallback as well (reference behavior)."""
    val = mat_get_float3(fallback, u, v, tex_idx, atlas, used, meta)
    p = lambda c: jnp.power(jnp.maximum(c, 0.0), 2.2)
    return Vec3(p(val.x), p(val.y), p(val.z))
