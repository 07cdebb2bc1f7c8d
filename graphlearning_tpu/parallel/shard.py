"""Sharded graph + distributed SpMM with halo exchange.

Design (SURVEY.md §7.1 item 4, §5 'long-context analogue'):

* **Partition**: the padded-ELL arrays (``cols``, ``vals``, ``deg``) and
  node features are 1-D row-partitioned over the ``'nodes'`` mesh axis
  (node count padded up to a multiple of the axis size).  Column indices
  stay global.
* **`sharded_spmm`** (GSPMD path): the plain ELL gather under ``jit`` with
  sharding annotations — XLA inserts the all_gather of features over ICI.
* **`sharded_spmm_ring`** (explicit halo-exchange path): ``shard_map`` +
  ``lax.ppermute`` rotate feature blocks around the ring; each step
  accumulates the contributions of the currently-held block while the next
  block is in flight.  This is the ring-attention analogue for graph
  aggregation: communication overlaps local block accumulation, and only
  ``n/P`` features are resident per device per step.

Both match the single-device ``ops.spmm`` (the ring path up to
floating-point reordering of the k-sum).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu import config


def pad_graph_to(g: SparseGraph, multiple: int) -> SparseGraph:
    """Pad node count up to a multiple (padded rows: degree 0, self cols)."""
    n_pad = (-g.n) % multiple
    if n_pad == 0:
        return g
    n_new = g.n + n_pad
    pad_cols = (
        jnp.arange(g.n, n_new, dtype=g.cols.dtype)[:, None]
        * jnp.ones((1, g.k), dtype=g.cols.dtype)
    )
    cols = jnp.concatenate([g.cols, pad_cols], axis=0)
    vals = jnp.concatenate(
        [g.vals, jnp.zeros((n_pad, g.k), dtype=g.vals.dtype)], axis=0
    )
    deg = jnp.concatenate(
        [g.deg, jnp.zeros((n_pad,), dtype=g.deg.dtype)], axis=0
    )
    return SparseGraph(cols=cols, vals=vals, deg=deg, n=n_new, k=g.k)


def shard_graph(g: SparseGraph, mesh: Mesh) -> SparseGraph:
    """Place the graph's ELL arrays row-sharded over the 'nodes' axis."""
    num = mesh.shape["nodes"]
    g = pad_graph_to(g, num)
    row = NamedSharding(mesh, P("nodes", None))
    vec = NamedSharding(mesh, P("nodes"))
    return SparseGraph(
        cols=jax.device_put(g.cols, row),
        vals=jax.device_put(g.vals, row),
        deg=jax.device_put(g.deg, vec),
        n=g.n,
        k=g.k,
    )


def sharded_spmm(g: SparseGraph, X, mesh: Mesh):
    """GSPMD SpMM: annotate shardings, let XLA place the all_gather."""
    row = NamedSharding(mesh, P("nodes", None))

    @functools.partial(jax.jit, out_shardings=row)
    def f(cols, vals, X):
        gathered = jnp.take(X, cols, axis=0)
        return jnp.einsum("nk,nkd->nd", vals, gathered)

    return f(g.cols, g.vals, X)


def sharded_spmm_ring(g: SparseGraph, X, mesh: Mesh):
    """Explicit ring halo exchange: P steps of (ppermute block rotation +
    local masked accumulation).  Device p holds feature block p; at step s
    it accumulates contributions from columns living in block
    ``(p + s) mod P`` while rotating the blocks one hop around the ring."""
    nodes_n = mesh.shape["nodes"]
    n = g.n
    blk = n // nodes_n
    spec_row = P("nodes", None)
    spec_vec = P("nodes")

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_row, spec_row, spec_row),
        out_specs=spec_row,
    )
    def f(cols, vals, Xl):
        # cols/vals: (n/P, k) local rows with global col indices; Xl: (n/P, d)
        p = jax.lax.axis_index("nodes")
        d = Xl.shape[1]
        acc0 = jnp.zeros((cols.shape[0], d), dtype=Xl.dtype)

        acc, Xblk = acc0, Xl
        # static unroll (P steps): lets XLA overlap each ppermute with the
        # next step's local accumulation
        for s in range(nodes_n):
            owner = (p + s) % nodes_n          # block currently held
            start = owner * blk
            local_idx = jnp.clip(cols - start, 0, blk - 1)
            in_blk = (cols >= start) & (cols < start + blk)
            contrib = jnp.where(
                in_blk[..., None], vals[..., None] * Xblk[local_idx], 0.0
            )
            acc = acc + jnp.sum(contrib, axis=1)
            if s + 1 < nodes_n:
                # rotate: receive the next block from the right neighbor
                Xblk = jax.lax.ppermute(
                    Xblk, "nodes",
                    [(i, (i - 1) % nodes_n) for i in range(nodes_n)],
                )
        return acc

    return jax.jit(f)(g.cols, g.vals, X)


def put_features(X, mesh: Mesh):
    """Row-shard a feature/label matrix over 'nodes' (padding rows of zeros
    to the graph's padded size if needed)."""
    num = mesh.shape["nodes"]
    X = np.asarray(X)
    n_pad = (-X.shape[0]) % num
    if n_pad:
        X = np.concatenate([X, np.zeros((n_pad,) + X.shape[1:], X.dtype)])
    spec = P("nodes", *([None] * (X.ndim - 1)))
    return jax.device_put(jnp.asarray(X, dtype=config.float_dtype()),
                          NamedSharding(mesh, spec))
