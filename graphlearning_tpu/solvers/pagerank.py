"""PageRank power iteration as a jitted ``lax.while_loop``
(reference ``graph.py:1371-1412``)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from graphlearning_tpu import config
from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.ops.graphops import degree_vector, spmm_t


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _page_rank(g: SparseGraph, alpha, v, tol, max_iter: int = 10**5):
    n = g.n
    deg = degree_vector(g)
    # clamp tol to dtype-reachable precision (f32 cannot hit 1e-10; an
    # unreachable tol spins the loop to max_iter / trips TPU watchdogs)
    tol = jnp.maximum(tol, 100.0 * jnp.finfo(v.dtype).eps)
    u0 = jnp.full((n,), 1.0 / n, dtype=v.dtype)

    def P(u):
        # P u = W^T D^-1 u
        return spmm_t(g, u / deg)

    def cond(state):
        u, err, i = state
        return jnp.logical_and(err > tol, i < max_iter)

    def body(state):
        u, _, i = state
        w = alpha * P(u) + (1.0 - alpha) * v
        return w, jnp.max(jnp.abs(w - u)), i + 1

    u, _, _ = jax.lax.while_loop(cond, body, (u0, jnp.asarray(jnp.inf, v.dtype), 0))
    return u


def page_rank(g: SparseGraph, alpha=0.85, v=None, tol=1e-10):
    dtype = g.vals.dtype
    if v is None:
        v = jnp.full((g.n,), 1.0 / g.n, dtype=dtype)
    else:
        v = jnp.asarray(v, dtype=dtype)
    return _page_rank(g, jnp.asarray(alpha, dtype), v, jnp.asarray(tol, dtype))
