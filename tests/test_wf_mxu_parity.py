"""End-to-end parity: the wavefront integrator must converge to the same
image with the MXU backend (baked materials, interpret mode) as with the
pure-JAX bitstack backend."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from fluctus_tpu.accel import build_bvh
from fluctus_tpu.accel.mxu_trace import MXUScene
from fluctus_tpu.core.integrator_wf import wf_reset, wf_segment
from fluctus_tpu.scene.material import default_material
from fluctus_tpu.testing import quad_scene, quad_setup


def test_wavefront_mxu_matches_jax_backend():
    scene_jax = quad_scene(kd=0.5)
    params, config = quad_setup(width=16, height=16, max_bounces=3)

    # rebuild the same quad with the MXU backend + baked materials
    import numpy as np
    size = 50.0
    p = np.array([
        [[-size, -size, 0.0], [size, -size, 0.0], [size, size, 0.0]],
        [[-size, -size, 0.0], [size, size, 0.0], [-size, size, 0.0]],
    ], np.float32)
    n = np.zeros_like(p)
    n[..., 2] = 1.0
    uv = np.zeros((2, 3, 2), np.float32)
    mat = default_material()
    mat.Kd = (0.5, 0.5, 0.5)
    mxu = MXUScene.build(p, build_bvh(p), cluster_size=128, normals=n,
                         uvs=uv, mat_ids=np.zeros(2, np.int32),
                         materials=[mat])
    scene_mxu = dataclasses.replace(scene_jax, mxu=mxu)

    def render(scene, segments=100, num_tasks=1024):
        state = wf_reset(config, num_tasks)
        step = jax.jit(wf_segment, static_argnames=("config",
                                                    "first_iteration"))
        for _ in range(segments):
            state, _ = step(scene, params, state, config)
        w = np.asarray(state.film.weight)
        img = np.asarray(state.film.color.x) / np.maximum(w, 1e-9)
        return img, w

    img_jax, w1 = render(scene_jax)
    img_mxu, w2 = render(scene_mxu)
    assert w1.min() > 0 and w2.min() > 0
    # same geometry/materials/sampler seeds -> statistically identical
    center_jax = img_jax.reshape(16, 16)[4:12, 4:12].mean()
    center_mxu = img_mxu.reshape(16, 16)[4:12, 4:12].mean()
    expect = 0.5 ** 2.2
    assert abs(center_jax - expect) / expect < 0.05
    assert abs(center_mxu - expect) / expect < 0.05
    # pixelwise agreement within MC noise
    diff = np.abs(img_jax - img_mxu).mean()
    assert diff < 0.05, diff
