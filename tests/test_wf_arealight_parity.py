"""Wavefront vs exact-spp integrator parity with the area light
(area-only NEE: light pick probability 1 in both, so estimators match)."""

import numpy as np
import jax
import jax.numpy as jnp

from fluctus_tpu.core.integrator_mk import Film, render_sample
from fluctus_tpu.core.integrator_wf import wf_reset, wf_segment
from fluctus_tpu.testing import quad_scene, quad_setup


def test_area_light_wf_matches_mk():
    scene = quad_scene(kd=0.8, with_env=False)
    params, config = quad_setup(width=16, height=16, max_bounces=2,
                                use_area_light=True)
    config = config.replace(use_env_map=False)

    # mk reference
    film = Film.zeros(config.num_pixels)
    seed = jnp.arange(config.num_pixels, dtype=jnp.uint32)
    fn = jax.jit(render_sample, static_argnames="config")
    for _ in range(64):
        film, seed, _ = fn(scene, params, film, seed, config)
    img_mk = np.asarray(film.color.x) / np.asarray(film.weight)

    # wavefront
    state = wf_reset(config, 2048)
    step = jax.jit(wf_segment, static_argnames=("config", "first_iteration"))
    for _ in range(150):
        state, _ = step(scene, params, state, config)
    w = np.asarray(state.film.weight)
    assert w.min() > 0
    img_wf = np.asarray(state.film.color.x) / w

    c_mk = img_mk.reshape(16, 16)[4:12, 4:12].mean()
    c_wf = img_wf.reshape(16, 16)[4:12, 4:12].mean()
    assert c_mk > 0.01  # light actually illuminates the quad
    assert abs(c_wf - c_mk) / c_mk < 0.1, (c_wf, c_mk)
