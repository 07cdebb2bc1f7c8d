"""Device-mesh helpers (SURVEY.md §7.1 item 4).

The framework's scaling dimension is graph size: nodes (and their padded
edge rows) are 1-D partitioned over the ``'nodes'`` mesh axis; an optional
``'batch'`` axis carries independent trials / RHS blocks.  XLA/GSPMD emits
the collectives (all_gather / psum / ppermute) over ICI from sharding
annotations — there is no hand-written NCCL/MPI layer (reference has no
distributed runtime at all, SURVEY.md §2.3)."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_nodes_axis: int | None = None, batch_axis: int = 1,
              devices=None) -> Mesh:
    """1-D (or 2-D with batch) device mesh with axes ('nodes', 'batch')."""
    devices = devices if devices is not None else jax.devices()
    nd = len(devices)
    if n_nodes_axis is None:
        n_nodes_axis = nd // batch_axis
    assert n_nodes_axis * batch_axis == nd, (n_nodes_axis, batch_axis, nd)
    dev_array = np.asarray(devices).reshape(n_nodes_axis, batch_axis)
    return Mesh(dev_array, axis_names=("nodes", "batch"))


def node_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (node) axis; replicate the rest."""
    return NamedSharding(mesh, P("nodes", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host initialization (``jax.distributed.initialize`` wrapper).

    Call once per host before building meshes on a multi-host pod slice; all
    arguments auto-detect on TPU pods (GCE metadata).  No-op if already
    initialized or single-process.  The reference has no distributed
    runtime at all (SURVEY.md §2.3) — this, plus mesh shardings, is the
    framework's entire communication layer: XLA/GSPMD emits the ICI/DCN
    collectives."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
