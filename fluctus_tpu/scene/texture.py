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
        self.height, self.width = rgba.shape[:2]


class TextureAtlas(NamedTuple):
    """Device-side atlas: packed 0xAABBGGRR uint32 texels + descriptors."""
    texels: "np.ndarray"       # jnp uint32 [total]
    offset: "np.ndarray"       # jnp int32 [n]
    width: "np.ndarray"        # jnp int32 [n]
    height: "np.ndarray"       # jnp int32 [n]


def pack_atlas(textures: List[HostTexture]) -> Optional[TextureAtlas]:
    import jax.numpy as jnp
    if not textures:
        # 1-texel dummy so downstream gathers always have a valid operand
        return TextureAtlas(jnp.zeros(1, jnp.uint32), jnp.zeros(1, jnp.int32),
                            jnp.ones(1, jnp.int32), jnp.ones(1, jnp.int32))
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
    return TextureAtlas(
        texels=jnp.asarray(np.concatenate(chunks)),
        offset=jnp.asarray(np.array(offsets, np.int32)),
        width=jnp.asarray(np.array(ws, np.int32)),
        height=jnp.asarray(np.array(hs, np.int32)))
