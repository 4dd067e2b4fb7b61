"""Dense per-group film splat — the block-bound pool's replacement for the
global ``segment_sum`` film scatter (utils.cl:269-305 atomic splats → one
deterministic one-hot matmul per pixel group).

Design: the path pool is partitioned into ``G`` groups of ``S`` lanes; each
group owns one contiguous range of ``P`` true pixels (padded to ``Pk``, a
lane multiple). A lane only ever carries paths for its group's pixels
(per-group raygen rings, integrator_wf), so a segment's splats from group
``g`` land inside film block ``g`` — a [Pk, S] one-hot times [S, C] data
matmul with f32-exact HIGHEST precision accumulates them densely. The
2M-segment scatter this replaces measured ~42 ms/segment at 1080p; the
dense kernel is bounded by one film read+write (~0.1 ms class).

The exact-spp cap (CHECK_SPP, wf_logic.cl:76-84 / mk_splat.cl:21-34) is
enforced in-kernel WITHOUT a prefix scan (Mosaic has no cumsum): when a
pixel's candidate count fits its remaining budget — the overwhelmingly
common case — the whole segment is admitted; otherwise only the lowest-
lane candidate is (at most one splat that segment, provably <= budget
since budget >= 1). Still exactly capped, never over-admits, and the
tail pixels converge >= 1 sample/segment, so exact-spp termination cost
is unchanged in practice.

Pixel-space conventions (shared with integrator_wf):
  group g owns true pixels [g*P, g*P + len_g), len_g = min(P, num - g*P)
  padded pid = g*Pk + local;  true pid = g*Pk_to_true(padded)
  film/spp arrays are padded to [G*Pk]; only the leading len_g entries of
  each block are live.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST


def plan(num_pixels: int, num_tasks: int, groups: int):
    """Static geometry: (S lanes/group, P true pixels/group, Pk padded)."""
    if num_tasks % groups:
        raise ValueError(f"num_tasks {num_tasks} % groups {groups} != 0")
    s = num_tasks // groups
    p = -(-num_pixels // groups)          # ceil
    if (groups - 1) * p >= num_pixels:
        raise ValueError(f"groups {groups} too large for {num_pixels} pixels")
    pk = -(-p // 128) * 128
    return s, p, pk


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _splat_kernel(loc_ref, dat_ref, film_ref, out_ref, *, s, pk, c):
    """out[Pk,C] = film + onehot(local)[Pk,S] @ data[S,C]. local -1 = none."""
    local = loc_ref[0]                                     # [1, S]
    rows = jax.lax.broadcasted_iota(jnp.int32, (pk, s), 0)
    oh = (rows == local).astype(jnp.float32)               # [Pk, S]
    out_ref[:] = film_ref[:] + jax.lax.dot_general(
        oh, dat_ref[:], (((1,), (0,)), ((), ())), precision=HIGHEST)


def _splat_kernel_capped(loc_ref, dat_ref, rem_ref, film_ref, out_ref,
                         *, s, pk, c):
    """Capped splat: per pixel, admit every candidate when the count fits
    the remaining budget, else only the lowest-lane one (exact CHECK_SPP,
    no prefix scan — see module docstring)."""
    local = loc_ref[0]                                     # [1, S]
    rows = jax.lax.broadcasted_iota(jnp.int32, (pk, s), 0)
    ohb = rows == local
    oh = ohb.astype(jnp.float32)
    cnt = jnp.sum(oh, axis=1, keepdims=True)               # [Pk, 1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (pk, s), 1)
    min_lane = jnp.min(jnp.where(ohb, lanes, s), axis=1,
                       keepdims=True)                      # [Pk, 1]
    rem = rem_ref[:]                                       # [Pk, 1]
    # f32 arithmetic select — Mosaic cannot lower vector<i1> selects
    fits = (cnt <= rem).astype(jnp.float32)                # [Pk, 1]
    has = (rem >= 1.0).astype(jnp.float32)                 # [Pk, 1]
    first = (ohb & (lanes == min_lane)).astype(jnp.float32)
    oh = oh * fits + first * (1.0 - fits) * has
    out_ref[:] = film_ref[:] + jax.lax.dot_general(
        oh, dat_ref[:], (((1,), (0,)), ((), ())), precision=HIGHEST)


def _fetch_kernel(loc_ref, tbl_ref, out_ref, *, s, pk):
    """Per-lane dense fetch of a per-pixel table column (spp counts):
    out[1,S] = tbl[local[s]] — the gather-free pix_spp read."""
    local = loc_ref[0]                                     # [1, S]
    rows = jax.lax.broadcasted_iota(jnp.int32, (pk, s), 0)
    oh = (rows == local).astype(jnp.float32)
    out_ref[0] = jnp.sum(oh * tbl_ref[:], axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("groups", "interpret"))
def splat(local, data, film, groups: int, remaining=None,
          interpret: bool = False):
    """Accumulate splat records into the padded film.

    local: [n] int32 — pixel index within the lane's group block
           (0..Pk), -1 = no splat this segment.
    data:  [n, C] f32 — rgbw (+feature) channels, pre-masked.
    film:  [G*Pk, C] f32 padded accumulator.
    remaining: optional [G*Pk, 1] f32 per-pixel budget; when given, each
           pixel admits at most that many splats (lane order), exactly.
    """
    g = groups
    n, c = data.shape
    s = n // g
    pk = film.shape[0] // g
    if interpret:
        # reference path (CPU tests): same admission semantics via
        # segment reductions on padded ids
        pid = jnp.where(local >= 0,
                        (jnp.arange(n, dtype=jnp.int32) // s) * pk + local,
                        g * pk)
        if remaining is not None:
            lane = jnp.arange(n, dtype=jnp.int32)
            one = (local >= 0).astype(jnp.float32)
            cnt = jax.ops.segment_sum(one, pid, num_segments=g * pk + 1)
            min_lane = jax.ops.segment_min(
                jnp.where(local >= 0, lane, n), pid,
                num_segments=g * pk + 1)
            rem = jnp.take(remaining[:, 0], jnp.minimum(pid, g * pk - 1))
            fits = jnp.take(cnt, pid) <= rem
            first = lane == jnp.take(min_lane, pid)
            ok = (local >= 0) & jnp.where(fits, True,
                                          first & (rem >= 1.0))
            pid = jnp.where(ok, pid, g * pk)
            data = data * ok[:, None].astype(jnp.float32)
        acc = jax.ops.segment_sum(data, pid, num_segments=g * pk + 1)[:-1]
        return film + acc

    # lane arrays ride as [g, 1, s] so the (1, s) block equals the
    # trailing array dims (Mosaic requires % (8, 128) or exact match)
    loc2 = local.reshape(g, 1, s)
    if remaining is None:
        kernel = partial(_splat_kernel, s=s, pk=pk, c=c)
        args = (loc2, data, film)
        specs = [
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    else:
        kernel = partial(_splat_kernel_capped, s=s, pk=pk, c=c)
        args = (loc2, data, remaining, film)
        specs = [
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=specs,
        out_specs=pl.BlockSpec((pk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g * pk, c), jnp.float32),
    )(*args)


@partial(jax.jit, static_argnames=("groups", "interpret"))
def fetch(local, table, groups: int, interpret: bool = False):
    """Per-lane read of a padded per-pixel f32 column (dense, gather-free).
    local: [n] int32 in-block pixel index (always valid).
    table: [G*Pk, 1] f32.  Returns [n] f32."""
    g = groups
    n = local.shape[0]
    s = n // g
    pk = table.shape[0] // g
    if interpret:
        pid = (jnp.arange(n, dtype=jnp.int32) // s) * pk + local
        return jnp.take(table[:, 0], pid)
    out = pl.pallas_call(
        partial(_fetch_kernel, s=s, pk=pk),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, s), jnp.float32),
    )(local.reshape(g, 1, s), table)
    return out.reshape(n)
