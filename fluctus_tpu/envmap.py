"""Environment map: loading, alias-table importance sampling, evaluation.

Host side ports src/envmap.cpp:31-116 (sin-theta-weighted luminance pdf +
stable Vose alias construction); device side ports src/env_map.cl (lat-long
mapping, bilinear eval, alias sampling, MIS pdf). On TPU the alias sample and
pdf lookup are pure gathers; bilinear eval is 4 gathers + lerp.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import rgbe
from .texture_fetch import take_u32
from .vec import Vec3

PI = np.float32(np.pi)
TWO_PI = np.float32(2.0 * np.pi)
INV_2PI_PI = np.float32(1.0 / (2.0 * np.pi * np.pi))  # geom.h:33


def build_alias_table(pdf: np.ndarray):
    """Stable Vose alias method (envmap.cpp:67-113).

    pdf: step-function pdf over n cells, mean 1 (already n-normalized).
    Returns (prob_table float32[n], alias_table int32[n]).
    """
    n = pdf.size
    prob = np.ones(n, np.float32)
    alias = np.arange(n, dtype=np.int32)

    p = pdf.astype(np.float64).copy()
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        l = small.pop()
        g = large.pop()
        prob[l] = p[l]
        alias[l] = g
        p[g] = (p[g] + p[l]) - 1.0
        (small if p[g] < 1.0 else large).append(g)
    # leftovers keep prob 1 (self-alias)
    return prob, alias


class EnvironmentMap:
    """Loaded .hdr environment with importance-sampling tables.

    Mirrors the reference EnvironmentMap (src/envmap.hpp, envmap.cpp:9-116):
    pdf_table holds per-texel solid-angle-ready pdf (scaled by 1/(2 pi^2)),
    prob/alias tables drive O(1) sampling of the flat 1D distribution.
    """

    def __init__(self, filename: str, scale: float = 1.0):
        data, w, h = rgbe.read_hdr(filename)
        self.name = filename
        self.width, self.height = w, h
        self.scale = scale
        self._build(data)

    @classmethod
    def from_array(cls, data: np.ndarray, name: str = "<array>"):
        self = cls.__new__(cls)
        self.name = name
        self.height, self.width = data.shape[:2]
        self.scale = 1.0
        self._build(np.asarray(data, np.float32))
        return self

    def _build(self, data: np.ndarray):
        w, h = self.width, self.height
        # sin-theta-weighted luminance scalars (envmap.cpp:35-52)
        v = (np.arange(h, dtype=np.float32) + 0.5) / h
        sin_th = np.sin(PI * v)[:, None]
        lum = (0.212671 * data[..., 0] + 0.715160 * data[..., 1]
               + 0.072169 * data[..., 2])
        scalars = (lum * sin_th).reshape(-1).astype(np.float64)

        # flat 1D pdf, n-normalized like the reference (envmap.cpp:54-65)
        integral = scalars.sum() / (w * h)
        if integral == 0:
            pdf = np.full(w * h, 1.0, np.float64)
        else:
            pdf = scalars / integral

        prob, alias = build_alias_table(pdf)

        # final pdf table includes the (u,v)->dir jacobian factor except
        # 1/sin(theta), which is applied at sample time (envmap.cpp:115)
        self.pdf_table = jnp.asarray((pdf * INV_2PI_PI).astype(np.float32))
        self.prob_table = jnp.asarray(prob)
        self.alias_table = jnp.asarray(alias)
        self.image = Vec3(jnp.asarray(data[..., 0].reshape(-1)),
                          jnp.asarray(data[..., 1].reshape(-1)),
                          jnp.asarray(data[..., 2].reshape(-1)))

        # single-gather variants: RGBE-packed radiance + packed alias pair
        from .rgbe import _float_to_rgbe
        rgbe8 = _float_to_rgbe(data.reshape(-1, 3)).astype(np.uint32)
        self.packed = jnp.asarray(rgbe8[:, 0] | (rgbe8[:, 1] << 8)
                                  | (rgbe8[:, 2] << 16) | (rgbe8[:, 3] << 24))
        if w * h <= (1 << 18):
            prob_q = np.clip(np.round(prob * 16383.0), 0, 16383).astype(np.uint32)
            self.prob_alias = jnp.asarray((prob_q << 18)
                                          | alias.astype(np.uint32))
        else:
            self.prob_alias = None
        self.inv_mean_lum = jnp.float32(1.0 / max(integral, 1e-30))

    def device_tables(self) -> "EnvMapTables":
        return EnvMapTables(self.image, self.packed, self.pdf_table,
                            self.prob_table, self.alias_table,
                            self.prob_alias, self.inv_mean_lum,
                            self.width, self.height)


import dataclasses  # noqa: E402
from typing import Optional  # noqa: E402
import jax  # noqa: E402


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvMapTables:
    """Device-resident env map arrays. width/height are static Python ints
    (pytree metadata, not traced) — they parameterize the gather math.

    ``packed`` holds each texel RGBE-encoded in one uint32: random gathers
    on this TPU cost ~7 ns/element regardless of table, so a radiance lookup
    must be ONE gather, not three. ``prob_alias`` likewise packs the alias
    probability (f16 bits) and alias index into one word."""
    image: Vec3          # flattened [h*w] per channel (reference/bilinear)
    packed: jnp.ndarray  # uint32 RGBE per texel
    pdf_table: jnp.ndarray
    prob_table: jnp.ndarray
    alias_table: jnp.ndarray
    # alias prob (14 bits) + alias index (18 bits) in one word; None when the
    # map exceeds 2^18 texels
    prob_alias: Optional[jnp.ndarray]
    inv_mean_lum: jnp.ndarray  # 1 / mean(lum * sin)  — lets pdf be derived
    width: int = dataclasses.field(metadata=dict(static=True), default=1)
    height: int = dataclasses.field(metadata=dict(static=True), default=1)


# ---------------------------------------------------------------------------
# Device-side math (jnp, vectorized over ray batches)
# ---------------------------------------------------------------------------

def direction_to_uv(d: Vec3):
    """Lat-long direction -> uv in [0,1]^2 (env_map.cl:14-17)."""
    u = jnp.arctan2(d.x, -d.z) * (0.5 / PI) + 0.5
    v = jnp.arccos(jnp.clip(d.y, -1.0, 1.0)) * (1.0 / PI)
    return u, v


def uv_to_direction(u, v):
    """uv -> direction + sin(phi) (env_map.cl:21-35)."""
    phi = v * PI
    theta = u * TWO_PI - PI
    sin_phi = jnp.sin(phi)
    cos_phi = jnp.cos(phi)
    return Vec3(sin_phi * jnp.sin(theta), cos_phi,
                -sin_phi * jnp.cos(theta)), sin_phi


def eval_env_map_dir(env: EnvMapTables, d: Vec3) -> Vec3:
    """Bilinear lookup along a direction (env_map.cl:37-41).

    Matches OpenCL CLK_FILTER_LINEAR + CLK_ADDRESS_CLAMP_TO_EDGE with
    normalized coords: sample point at uv*size - 0.5, clamped.
    """
    u, v = direction_to_uv(d)
    w, h = env.width, env.height
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    from .vec import gather
    c00 = gather(env.image, y0i * w + x0i)
    c10 = gather(env.image, y0i * w + x1i)
    c01 = gather(env.image, y1i * w + x0i)
    c11 = gather(env.image, y1i * w + x1i)
    top = c00 * (1.0 - tx) + c10 * tx
    bot = c01 * (1.0 - tx) + c11 * tx
    return top * (1.0 - ty) + bot * ty


def sample_env_map_alias(env: EnvMapTables, rnd):
    """O(1) alias-method sample of the flat 1D distribution
    (env_map.cl:63-92). Returns (L: Vec3, pdf_w).

    Reproduces the reference's exact uv reconstruction, including its
    idiosyncratic v = (uvInd + 0.5)/(w*h) (env_map.cl:81).
    """
    w, h = env.width, env.height
    wh = w * h
    r = rnd * wh
    i = jnp.minimum(jnp.floor(r).astype(jnp.int32), wh - 1)
    m_prob = jnp.take(env.prob_table, i)
    uv_ind = jnp.where(r - i.astype(jnp.float32) < m_prob, i,
                       jnp.take(env.alias_table, i))
    u = (jnp.mod(uv_ind, w).astype(jnp.float32) + 0.5) / w
    v = (uv_ind.astype(jnp.float32) + 0.5) / wh
    L, sin_th = uv_to_direction(u, v)
    pdf = jnp.where(sin_th != 0.0,
                    jnp.take(env.pdf_table, uv_ind) / jnp.maximum(sin_th, 1e-30),
                    0.0)
    return L, pdf


def env_map_pdf(env: EnvMapTables, d: Vec3):
    """MIS pdf of sampling direction d (env_map.cl:95-109)."""
    w, h = env.width, env.height
    u, v = direction_to_uv(d)
    iu = jnp.minimum(jnp.floor(u * w).astype(jnp.int32), w - 1)
    iv = jnp.minimum(jnp.floor(v * h).astype(jnp.int32), h - 1)
    import jax.lax as lax
    pdf = jnp.take(env.pdf_table, iv * w + iu) * \
        lax.rsqrt(jnp.maximum(1.0 - d.y * d.y, 1e-12))
    return jnp.where(d.y > 0.99, 0.0, pdf)


# ---------------------------------------------------------------------------
# Single-gather ("fast") variants — random gathers on TPU serialize at
# ~7 ns/element, so radiance+pdf lookups are restructured to touch ONE
# packed uint32 table each. Radiance is RGBE-quantized (~0.4% relative);
# the pdf is re-derived from the decoded luminance instead of gathered.
# ---------------------------------------------------------------------------

def _decode_rgbe(texel) -> Vec3:
    """uint32 RGBE -> linear RGB (rgbe2float: value = comp * 2^(e-136))."""
    e = ((texel >> 24) & 0xFF).astype(jnp.float32)
    f = jnp.where(e > 0.0, jnp.exp2(e - 136.0), 0.0)
    return Vec3((texel & 0xFF).astype(jnp.float32) * f,
                ((texel >> 8) & 0xFF).astype(jnp.float32) * f,
                ((texel >> 16) & 0xFF).astype(jnp.float32) * f)


def _texel_index(env: EnvMapTables, d: Vec3):
    w, h = env.width, env.height
    u, v = direction_to_uv(d)
    iu = jnp.minimum(jnp.floor(u * w).astype(jnp.int32), w - 1)
    iv = jnp.minimum(jnp.floor(v * h).astype(jnp.int32), h - 1)
    return iv * w + iu, iv


def _pdf_from_lum(env: EnvMapTables, lum, iv):
    """pdf_table value re-derived: lum * sin(theta_row) / mean * 1/(2 pi^2)."""
    h = env.height
    sin_row = jnp.sin(PI * (iv.astype(jnp.float32) + 0.5) / h)
    return lum * sin_row * env.inv_mean_lum * INV_2PI_PI


def eval_env_map_dir_fast(env: EnvMapTables, d: Vec3) -> Vec3:
    """Nearest-neighbor RGBE lookup: one gather."""
    idx, _ = _texel_index(env, d)
    return _decode_rgbe(take_u32(env.packed, idx))


def eval_env_and_pdf_fast(env: EnvMapTables, d: Vec3):
    """Radiance + MIS pdf from the same single gather."""
    idx, iv = _texel_index(env, d)
    li = _decode_rgbe(take_u32(env.packed, idx))
    lum = 0.212671 * li.x + 0.715160 * li.y + 0.072169 * li.z
    import jax.lax as lax
    pdf = _pdf_from_lum(env, lum, iv) * lax.rsqrt(
        jnp.maximum(1.0 - d.y * d.y, 1e-12))
    pdf = jnp.where(d.y > 0.99, 0.0, pdf)
    return li, pdf


def sample_env_map_alias_fast(env: EnvMapTables, rnd):
    """Alias sample + radiance + pdf in TWO gathers (prob_alias, packed).

    Matches sample_env_map_alias semantics with 14-bit-quantized alias
    probabilities (distribution error <= 2^-14 per cell)."""
    w, h = env.width, env.height
    wh = w * h
    r = rnd * wh
    i = jnp.minimum(jnp.floor(r).astype(jnp.int32), wh - 1)
    pa = take_u32(env.prob_alias, i)
    m_prob = ((pa >> 18) & 0x3FFF).astype(jnp.float32) * (1.0 / 16383.0)
    alias = (pa & 0x3FFFF).astype(jnp.int32)
    uv_ind = jnp.where(r - i.astype(jnp.float32) < m_prob, i, alias)
    u = (jnp.mod(uv_ind, w).astype(jnp.float32) + 0.5) / w
    v = (uv_ind.astype(jnp.float32) + 0.5) / wh
    L, sin_th = uv_to_direction(u, v)
    li = _decode_rgbe(take_u32(env.packed, uv_ind))
    lum = 0.212671 * li.x + 0.715160 * li.y + 0.072169 * li.z
    iv = uv_ind // w
    pdf = jnp.where(sin_th != 0.0,
                    _pdf_from_lum(env, lum, iv) / jnp.maximum(sin_th, 1e-30),
                    0.0)
    return L, pdf, li


# ---------------------------------------------------------------------------
# Backend-selecting wrappers used by the integrators
# ---------------------------------------------------------------------------

def env_radiance_and_pdf(env: EnvMapTables, d: Vec3, fast: bool):
    """(radiance, MIS pdf) along d — one gather when fast."""
    if fast and env.prob_alias is not None:
        return eval_env_and_pdf_fast(env, d)
    return eval_env_map_dir(env, d), env_map_pdf(env, d)


def env_sample(env: EnvMapTables, rnd, fast: bool):
    """NEE sample: (L, pdf, radiance)."""
    if fast and env.prob_alias is not None:
        return sample_env_map_alias_fast(env, rnd)
    L, pdf = sample_env_map_alias(env, rnd)
    return L, pdf, eval_env_map_dir(env, L)
