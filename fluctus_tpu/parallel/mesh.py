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


def sharded_render_fn(film: Film, mesh: Mesh, axis: str = "px"):
    """The jitted GSPMD render_sample step used by render_sharded.
    Exposed so tests can .lower().compile() it and assert XLA inserted
    no film-sized collectives (the pixel axis is embarrassingly parallel;
    only the scalar stats reduction may psum — see test_mk_sharded)."""
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        render_sample,
        static_argnames="config",
        in_shardings=(rep, rep,
                      jax.tree_util.tree_map(lambda _: shard, film),
                      shard),
        out_shardings=(jax.tree_util.tree_map(lambda _: shard, film),
                       shard, rep),
    )


def render_sharded(scene, params: RenderParams, film: Film, seed,
                   config: RenderConfig, mesh: Mesh, axis: str = "px"):
    """One render_sample step with the pixel pool sharded across the mesh.

    film/seed must be sharded along their leading (pixel) dim; scene/params
    replicated. Returns (film, seed, stats) with stats fully reduced
    (XLA turns the global sums into psums over ICI).
    """
    return sharded_render_fn(film, mesh, axis)(scene, params, film, seed,
                                               config)


def shard_film(film: Film, seed, mesh: Mesh, axis: str = "px"):
    shard = NamedSharding(mesh, P(axis))
    return (jax.device_put(film, jax.tree_util.tree_map(lambda _: shard, film)),
            jax.device_put(seed, shard))


# ---------------------------------------------------------------------------
# Wavefront (throughput) integrator sharding
# ---------------------------------------------------------------------------

def shard_wf_state(state, mesh: Mesh, axis: str = "px"):
    """Distribute a wf_reset state over the mesh: pool and film/spp sharded
    on their leading dim, one ring cursor per shard.

    Each shard owns the pixel sub-ring [k*P/D, (k+1)*P/D) and a private
    slice of the path pool — the reference's single-GPU pixel ring
    (clcontext.cpp:917-927) replicated per chip with disjoint pixel
    domains, so a segment needs NO cross-chip communication except the
    stats psum.

    Block-ring states (config.block_ring: curr_pixel is a per-GROUP cursor
    vector [G], film/spp in the padded [G*Pk] layout) shard the same way —
    each shard owns G/D whole groups, so the cursor vector is simply
    sharded along its group dim."""
    d = mesh.devices.size
    n = state.pool.seed.shape[0]
    p = state.film.weight.shape[0]
    if n % d or p % d:
        raise ValueError(f"pool ({n}) and pixels ({p}) must divide the "
                         f"mesh size ({d})")
    shard = NamedSharding(mesh, P(axis))
    if state.curr_pixel.ndim == 1:      # block mode: [G] group cursors
        if state.curr_pixel.shape[0] % d:
            raise ValueError(f"groups ({state.curr_pixel.shape[0]}) must "
                             f"divide the mesh size ({d})")
        sharded = state
    else:
        sharded = state._replace(curr_pixel=jnp.zeros(d, jnp.int32))
    return jax.device_put(
        sharded, jax.tree_util.tree_map(lambda _: shard, sharded))


def wf_segment_sharded(scene, params, state, config, mesh: Mesh,
                       axis: str = "px"):
    """One wavefront segment under shard_map: per-shard pools, pixel
    sub-rings and films; counters psum'd over the mesh (the reference's
    queue-counter readback, reduced over chips)."""
    try:
        from jax import shard_map
    except ImportError:          # jax < 0.8
        from jax.experimental.shard_map import shard_map

    from ..core.integrator_wf import wf_segment

    def local_segment(scene, params, state):
        # pixel_base counts PADDED pixels in block mode (each shard owns
        # G/D whole groups of Pk padded slots; integrator_wf derives the
        # global group offset as pixel_base // Pk) and true pixels
        # otherwise — both equal the local film length.
        local_pixels = state.film.weight.shape[0]
        base = jax.lax.axis_index(axis).astype(jnp.int32) * local_pixels
        st = state if config.block_ring else state._replace(
            curr_pixel=state.curr_pixel[0])
        new_state, counters = wf_segment(scene, params, st, config,
                                         pixel_base=base)
        counters = jax.tree_util.tree_map(
            lambda c: jax.lax.psum(c, axis), counters)
        if not config.block_ring:
            new_state = new_state._replace(
                curr_pixel=new_state.curr_pixel.reshape(1))
        return new_state, counters

    shard = P(axis)
    rep = P()
    state_specs = jax.tree_util.tree_map(lambda _: shard, state)
    kw = dict(mesh=mesh, in_specs=(rep, rep, state_specs),
              out_specs=(state_specs, rep))
    try:
        fn = shard_map(local_segment, check_vma=False, **kw)
    except TypeError:            # jax < 0.8 spelling
        fn = shard_map(local_segment, check_rep=False, **kw)
    return fn(scene, params, state)
