"""Camera ray generation — port of the shared raygen math
(src/wf_raygen.cl:23-65 == src/mk_raygen.cl:20-57): jittered-AA pinhole with
horizontal aspect fix, fov scale = tan(fov/2), and thin-lens depth of field
scaled by worldRadius * apertureSize.

Note: the reference computes the vertical pixel coordinate as
``y = pixelIdx * (1/width)`` — a *fractional* row index (py + px/width),
which adds up to one extra pixel of vertical jitter. We reproduce it by
default for output parity; pass ``y_quirk=False`` for the conventional
floor(pixelIdx/width).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geom import Camera
from ..rng import rand
from ..sampling import uniform_sample_disk
from ..vec import Vec3, normalize


def generate_camera_rays(pixel_idx, cam: Camera, width: int, height: int,
                         world_radius, seed, y_quirk: bool = True):
    """pixel_idx: int32 [N]. Returns (orig Vec3, dir Vec3, seed)."""
    w1 = 1.0 / width
    h1 = 1.0 / height
    x = jnp.mod(pixel_idx, width).astype(jnp.float32)
    if y_quirk:
        y = pixel_idx.astype(jnp.float32) * w1          # wf_raygen.cl:31
    else:
        y = (pixel_idx // width).astype(jnp.float32)

    u1, seed = rand(seed)
    u2, seed = rand(seed)
    x = x + u1
    y = y + u2

    ndc_x = x * w1
    ndc_y = y * h1
    scr_x = ndc_x + ndc_x - 1.0
    scr_y = ndc_y + ndc_y - 1.0
    scr_x = scr_x * (width * h1)          # aspect fix, horizontal
    scr_x = scr_x * cam.fov_scale
    scr_y = scr_y * cam.fov_scale

    orig = Vec3(jnp.broadcast_to(cam.pos.x, x.shape),
                jnp.broadcast_to(cam.pos.y, x.shape),
                jnp.broadcast_to(cam.pos.z, x.shape))
    target = orig + cam.right * scr_x + cam.up * scr_y + cam.dir
    d = normalize(target - orig)

    # Depth of field (wf_raygen.cl:58-65). Evaluated unconditionally and
    # selected — aperture == 0 keeps the pinhole ray (and the masked RNG
    # draws keep the sequence length fixed).
    rx, ry, seed_dof = uniform_sample_disk(seed)
    fp = orig + d * cam.focal_dist
    orig_dof = orig + (cam.right * rx + cam.up * ry) * (world_radius * cam.aperture_size)
    d_dof = normalize(fp - orig_dof)

    use_dof = cam.aperture_size > 0.0
    from ..vec import where as vwhere
    orig = vwhere(use_dof, orig_dof, orig)
    d = vwhere(use_dof, d_dof, d)
    seed = jnp.where(use_dof, seed_dof, seed)
    return orig, d, seed
