"""Pallas TPU SpMM kernel for banded ELL graphs.

XLA's dynamic gather on TPU costs ~10ns per index regardless of locality
(measured: 1e8 edges/s for any d — per-index overhead bound).  The
TPU-native fix (SURVEY.md §7.1 item 2): exploit the bandedness of
RCM-reordered kNN graphs and turn the gather into dense MXU work:

  * per row-block, DMA one contiguous window of X rows (HBM → VMEM, large
    sequential read at full bandwidth),
  * scatter the k edge weights of each row into a dense (R, W) block-row
    ``A`` of the weight matrix (k VPU compare/select passes — no gather),
  * compute ``out = A @ window`` on the MXU.

Edges falling outside the window (a tiny residual for reordered kNN
graphs) are handled by the caller through the XLA gather path — the
ELL+COO hybrid of SURVEY.md §7.3.

Layout requirements: R and W multiples of 8 and 128 respectively; d is
zero-padded to a lane multiple by the wrapper.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded_kernel(winstart_ref, cols_ref, vals_ref, x_hbm, out_ref,
                   win, sem, *, W: int, k: int):
    start = winstart_ref[pl.program_id(0)]
    copy = pltpu.make_async_copy(x_hbm.at[pl.ds(start, W), :], win, sem)
    copy.start()

    R = cols_ref.shape[0]
    local = cols_ref[:] - start                      # (R, k) window-local cols
    in_win = (local >= 0) & (local < W)
    local = jnp.clip(local, 0, W - 1)
    w = jnp.where(in_win, vals_ref[:], 0.0)

    # Build the dense (R, W) block-row of the weight matrix: k VPU passes
    # of compare+select (no gather).  Duplicate columns accumulate.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    A = jnp.zeros((R, W), dtype=out_ref.dtype)
    for j in range(k):
        A = A + jnp.where(
            col_ids == local[:, j][:, None], w[:, j][:, None], 0.0
        )

    copy.wait()
    # HIGHEST: f32 MXU via multi-pass bf16 decomposition — without it the
    # default single-pass bf16 gives ~1e-2 error vs the VPU reference
    out_ref[:] = jax.lax.dot_general(
        A, win[:], (((1,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def banded_spmm(cols, vals, winstart, X, W: int = 1024, R: int = 512,
                interpret: bool = False):
    """``out[i] = sum_j vals[i,j] * X[cols[i,j]]`` for edges inside each
    row-block's window ``[winstart[b], winstart[b]+W)``; out-of-window
    edges contribute 0 (caller adds the residual).

    Args:
      cols, vals: (n, k) ELL arrays, n a multiple of R.
      winstart: (n // R,) int32 window starts (each ≤ n - W, ≥ 0).
      X: (n, d) features, d a multiple of 128 (pad first).
    """
    n, k = cols.shape
    d = X.shape[1]
    assert n % R == 0 and W % 128 == 0 and d % 128 == 0, (n, R, W, d)
    grid = (n // R,)

    kernel = functools.partial(_banded_kernel, W=W, k=k)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, k), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, k), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((R, d), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((W, d), X.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), X.dtype),
        interpret=interpret,
    )(winstart, cols, vals, X)


# -- host-side planning ---------------------------------------------------


def plan_banded(cols_np, R: int = 512, W: int = 1024):
    """Compute per-row-block window starts and the residual (out-of-window)
    edge list.  Returns (winstart, residual_rows, residual_cols_slots)."""
    n, k = cols_np.shape
    assert n % R == 0
    nblocks = n // R
    blocks = cols_np.reshape(nblocks, R * k)
    # median-centered window per block (robust to stray long-range edges)
    med = np.median(blocks, axis=1)
    winstart = np.clip(med - W // 2, 0, max(0, n - W)).astype(np.int32)
    lo = winstart[:, None]
    out_mask = (blocks < lo) | (blocks >= lo + W)
    out_mask = out_mask.reshape(n, k)
    ridx = np.argwhere(out_mask)
    return winstart, ridx[:, 0].astype(np.int32), ridx[:, 1].astype(np.int32)


def spmm_banded_hybrid(g, X, plan, W: int = 1024, R: int = 512):
    """Banded Pallas kernel + XLA gather for the residual edges
    (ELL+COO hybrid)."""
    winstart, rrows, rslots = plan
    n, k = g.cols.shape
    d = X.shape[1]
    d_pad = (-d) % 128
    Xp = jnp.pad(X, ((0, 0), (0, d_pad))) if d_pad else X
    out = banded_spmm(g.cols, g.vals, jnp.asarray(winstart), Xp, W=W, R=R)
    if len(rrows):
        # the kernel zeroed out-of-window edges; add their contribution here
        rcols = g.cols[rrows, rslots]
        rvals = g.vals[rrows, rslots]
        contrib = rvals[:, None] * jnp.take(Xp, rcols, axis=0)
        out = out.at[rrows].add(contrib)
    return out[:, :d] if d_pad else out
