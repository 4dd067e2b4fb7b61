"""Denoiser — TPU stand-in for the reference's OptiX AI denoiser
(src/denoiser/OptixDenoiser.cpp). OptiX does not exist on TPU; we provide an
edge-aware à-trous wavelet filter (Dammertz et al. 2010) over the HDR film,
guided by the same auxiliary feature buffers the reference feeds OptiX
(first-hit albedo and camera-space normal, wf_logic.cl:214-237), with the
same blend-factor control (DenoiserOptix::setBlend).

Pure jnp convolutions — XLA maps the 5x5 taps to fused VPU work.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..vec import Vec3

# 5-tap B3-spline kernel for the a-trous wavelet
_B3 = jnp.asarray([1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16])


def _shift2d(img, dy, dx):
    """Edge-clamped 2D shift."""
    return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)


def atrous_denoise(color: jnp.ndarray, albedo: Optional[jnp.ndarray] = None,
                   normal: Optional[jnp.ndarray] = None, iterations: int = 2,
                   sigma_color: float = 4.0, sigma_albedo: float = 0.2,
                   sigma_normal: float = 0.3, blend: float = 1.0):
    """color: [H, W, 3] HDR radiance. Returns denoised [H, W, 3].

    blend: 0 = original, 1 = fully denoised (matches the reference's
    denoiser blend slider semantics, inverted to 'strength')."""
    out = color
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros_like(out[..., :1])
        for ky in range(5):
            for kx in range(5):
                dy, dx = (ky - 2) * step, (kx - 2) * step
                w = (_B3[ky] * _B3[kx])
                nb = _shift2d(out, dy, dx)
                wt = jnp.full_like(wacc, w)
                # range terms
                dc = jnp.sum((nb - out) ** 2, axis=-1, keepdims=True)
                wt = wt * jnp.exp(-dc / (sigma_color * sigma_color))
                if albedo is not None:
                    da = jnp.sum((_shift2d(albedo, dy, dx) - albedo) ** 2,
                                 axis=-1, keepdims=True)
                    wt = wt * jnp.exp(-da / (sigma_albedo * sigma_albedo))
                if normal is not None:
                    dn = jnp.sum((_shift2d(normal, dy, dx) - normal) ** 2,
                                 axis=-1, keepdims=True)
                    wt = wt * jnp.exp(-dn / (sigma_normal * sigma_normal))
                acc = acc + nb * wt
                wacc = wacc + wt
        out = acc / jnp.maximum(wacc, 1e-8)
    return color * (1.0 - blend) + out * blend
