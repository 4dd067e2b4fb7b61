"""Multi-chip scaling: pixel/path sharding over a device mesh.

The reference is single-GPU (SURVEY §2.3); its scaling axis is paths in
flight. The TPU-native design shards that axis over chips: the path/pixel
pool is split across a 1-D ``Mesh`` ("px" axis = the renderer's data
parallelism), scene data (BVH, triangles, materials, env tables) is
replicated, and the only cross-chip communication is the psum of render
stats and the final film gather — both over ICI.

Implementation: GSPMD via jit + NamedSharding. Each chip renders its pixel
slice independently; XLA inserts no collectives in the hot loop (everything
is elementwise over the sharded axis + gathers from replicated tables).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.integrator_mk import Film, render_sample
from ..geom import RenderConfig, RenderParams


def make_mesh(n_devices: Optional[int] = None, axis: str = "px") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicate_scene(scene, mesh: Mesh):
    """Place all scene arrays replicated on the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(scene, rep)


def render_sharded(scene, params: RenderParams, film: Film, seed,
                   config: RenderConfig, mesh: Mesh, axis: str = "px"):
    """One render_sample step with the pixel pool sharded across the mesh.

    film/seed must be sharded along their leading (pixel) dim; scene/params
    replicated. Returns (film, seed, stats) with stats fully reduced
    (XLA turns the global sums into psums over ICI).
    """
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    fn = jax.jit(
        render_sample,
        static_argnames="config",
        in_shardings=(rep, rep,
                      jax.tree_util.tree_map(lambda _: shard, film),
                      shard),
        out_shardings=(jax.tree_util.tree_map(lambda _: shard, film),
                       shard, rep),
    )
    return fn(scene, params, film, seed, config)


def shard_film(film: Film, seed, mesh: Mesh, axis: str = "px"):
    shard = NamedSharding(mesh, P(axis))
    return (jax.device_put(film, jax.tree_util.tree_map(lambda _: shard, film)),
            jax.device_put(seed, shard))
