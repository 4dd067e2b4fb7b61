"""Multi-host (DCN) launch layer — the scale-out story beyond one host.

The reference has no distributed path at all (SURVEY §2.3: single-GPU
SIMT); this is the TPU-native extension promised by SURVEY §5: multi-slice
scaling initializes `jax.distributed`, builds the global device mesh, and
keeps the renderer's sharding contract unchanged — the "px" axis simply
spans all hosts' devices. Scene tables stay replicated (each host loads
assets locally — deterministic builders, content-hashed caches), so the
only DCN traffic is the stats psum and the final film gather; everything
else rides ICI within each slice.

Untestable in this image (one process, one chip), so the logic is split:
`init_distributed` performs the environment-driven initialization (pure
plumbing, gated behind FLT_MULTIHOST), while `host_mesh_layout` — the part
that can be wrong — is a pure function unit-tested on synthetic device
lists (tests/test_mk_sharded.py::test_host_mesh_layout).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .. import flags


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op (returns False) unless FLT_MULTIHOST=1 — single-host sessions
    must never block on a coordinator."""
    if not flags.env_bool("MULTIHOST", False):
        return False
    import jax

    kw = {}
    if coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = (
            coordinator or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    return True


def host_mesh_layout(device_host_ids: Sequence[int]) -> np.ndarray:
    """Order a global device list for the 1-D "px" mesh so that devices of
    the same host (= the same ICI slice in the one-slice-per-host
    deployment) are CONTIGUOUS along the axis.

    Contiguity is the load-bearing property: the film/pool are sharded by
    leading-dim slices, so contiguous same-host ranges make every
    film-gather boundary that crosses hosts a single DCN transfer per
    host pair, and keep any future hierarchical reductions (psum within
    host, then across) expressible as a reshape to [hosts, devs_per_host].

    Input: per-device host id (device.process_index order as jax.devices()
    returns it). Returns the permutation to apply to jax.devices().
    Raises if hosts have unequal device counts (a ragged mesh cannot
    reshape to [hosts, devs_per_host])."""
    ids = np.asarray(device_host_ids)
    hosts, counts = np.unique(ids, return_counts=True)
    if len(set(counts.tolist())) > 1:
        raise ValueError(f"ragged host device counts: {dict(zip(hosts.tolist(), counts.tolist()))}")
    # stable sort by host id keeps intra-host device order
    return np.argsort(ids, kind="stable")


def make_global_mesh(axis: str = "px"):
    """Global 1-D mesh over every device of every process, host-contiguous
    (see host_mesh_layout). Single-process: identical to make_mesh()."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    perm = host_mesh_layout([d.process_index for d in devs])
    return Mesh(np.array([devs[i] for i in perm]), (axis,))
