"""Texture loading and atlas packing.

The reference packs all RGBA8 textures into one byte array with per-texture
offset descriptors (src/clcontext.cpp:588-629, geom.h:145-150). We do the
same but store packed-uint32 texels: on TPU a texel fetch is then a single
lane-wide 1D gather + bit unpack, instead of four byte gathers.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np


class HostTexture:
    def __init__(self, path: str, name: str):
        from PIL import Image
        with Image.open(path) as im:
            rgba = np.asarray(im.convert("RGBA"), np.uint8)
        # Flip vertically: OBJ/GL uv origin is bottom-left, images top-left
        # (DevIL's IL_ORIGIN_LOWER_LEFT default matches this flip).
        self.data = rgba[::-1].copy()
        self.name = name
        self.path = path
        self.height, self.width = rgba.shape[:2]


import dataclasses

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TextureAtlas:
    """Device-side atlas: packed 0xAABBGGRR uint32 texels + descriptors.

    ``count`` is static: a scene without textures statically prunes every
    texture-fetch path at trace time — the analogue of the reference
    compiling material kernels without texture code. (Gathers from
    degenerate 1-element dummy tables also destabilize the TPU runtime, so
    descriptor tables are padded to >= 128 rows.)"""
    texels: "jax.Array"       # uint32 [total]
    offset: "jax.Array"       # int32 [n_pad]
    width: "jax.Array"        # int32 [n_pad]
    height: "jax.Array"       # int32 [n_pad]
    count: int = dataclasses.field(metadata=dict(static=True), default=0)
    # which material slots actually reference textures — statically prunes
    # the corresponding fetch paths (each masked gather still costs a full
    # serialized pass on this TPU)
    has_kd: bool = dataclasses.field(metadata=dict(static=True), default=True)
    has_ks: bool = dataclasses.field(metadata=dict(static=True), default=True)
    has_n: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # host-side copies of the descriptors (tuples of ints, static): host
    # consumers (MXUScene.build bakes them per-triangle) must never read
    # the device arrays back — a device->host sync over the axon tunnel
    # costs seconds
    offset_t: tuple = dataclasses.field(metadata=dict(static=True),
                                        default=())
    width_t: tuple = dataclasses.field(metadata=dict(static=True),
                                       default=())
    height_t: tuple = dataclasses.field(metadata=dict(static=True),
                                        default=())

    def with_material_usage(self, materials) -> "TextureAtlas":
        import dataclasses as dc
        return dc.replace(
            self,
            has_kd=any(m.map_Kd >= 0 for m in materials),
            has_ks=any(m.map_Ks >= 0 for m in materials),
            has_n=any(m.map_N >= 0 for m in materials))


_MIN_ROWS = 128


def pack_atlas(textures: List[HostTexture]) -> TextureAtlas:
    import jax.numpy as jnp
    n_pad = max(_MIN_ROWS, len(textures))
    if not textures:
        return TextureAtlas(jnp.zeros(_MIN_ROWS, jnp.uint32),
                            jnp.zeros(n_pad, jnp.int32),
                            jnp.ones(n_pad, jnp.int32),
                            jnp.ones(n_pad, jnp.int32), count=0,
                            offset_t=(0,) * n_pad, width_t=(1,) * n_pad,
                            height_t=(1,) * n_pad)
    offsets, ws, hs, chunks = [], [], [], []
    total = 0
    for t in textures:
        offsets.append(total)
        ws.append(t.width)
        hs.append(t.height)
        rgba = t.data.astype(np.uint32)
        packed = (rgba[..., 0] | (rgba[..., 1] << 8) | (rgba[..., 2] << 16)
                  | (rgba[..., 3] << 24)).reshape(-1)
        chunks.append(packed)
        total += packed.size
    pad = n_pad - len(textures)
    offsets += [0] * pad
    ws += [1] * pad
    hs += [1] * pad
    return TextureAtlas(
        texels=jnp.asarray(np.concatenate(chunks)),
        offset=jnp.asarray(np.array(offsets, np.int32)),
        width=jnp.asarray(np.array(ws, np.int32)),
        height=jnp.asarray(np.array(hs, np.int32)),
        count=len(textures),
        offset_t=tuple(offsets), width_t=tuple(ws), height_t=tuple(hs))
