"""Pallas TPU SpMM kernel for banded ELL graphs.

XLA's dynamic gather on TPU costs ~20ns per index regardless of locality
(measured dispatch-to-value on v5e: 4.5e7 edges/s at d=128 — a per-index
overhead bound).  The TPU-native fix (SURVEY.md §7.1 item 2): exploit the
bandedness of RCM-reordered kNN graphs and turn the gather into dense MXU
work:

  * each row-block's edges fall inside a window of ``W`` feature rows,
    quantized to multiples of the tile size ``WT`` so the window tiles are
    ordinary ``BlockSpec`` inputs (Mosaic double-buffers the HBM→VMEM DMAs
    automatically),
  * per (row-block, window-tile) grid step, scatter the edge weights into
    a dense ``(R, WT)`` block ``A`` of the weight matrix via k VPU
    compare+select passes (no gather),
  * accumulate ``out += A @ x_tile`` on the MXU across the tile grid axis
    (the out block only depends on the row-block index, so Mosaic keeps it
    resident in VMEM between tile steps).

Cost model (drives the autotuner): A-build is ``n*W*kcap`` VPU ops, the
matmul ``n*W*d*passes`` MXU MACs — both ∝ the window size ``W``, so the
planner trades window tightness against the residual (out-of-window edge)
fraction, and caps the ELL slot count at ``kcap`` (degree-skew tail goes
to the residual too).  Residual edges are handled by the caller through
the XLA gather path — the ELL+COO hybrid of SURVEY.md §7.3.

Matmul modes: ``f32`` = Mosaic HIGHEST (6-pass bf16 decomposition, exact
f32); ``bf16x3`` = manual (A_hi+A_lo)(x_hi+x_lo) split dropping the lo·lo
term (3 passes, ~1e-5 rel err — enough for f32 CG); ``bf16`` = single
pass (~1e-2 rel err — diffusion/PageRank/MBO heat steps).

Replaces the reference's scipy CSR SpMM hot loop (utils.py:523) for the
single-chip fast path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded_kernel(winstart_ref, cols_ref, vals_ref, x_ref, out_ref,
                   *, WT: int, k: int, mode: str = "f32"):
    i = pl.program_id(0)
    t = pl.program_id(1)
    base = winstart_ref[i] + t * WT                  # tile start (abs rows)

    R = cols_ref.shape[0]
    local = cols_ref[:] - base                       # (R, k) tile-local cols
    in_tile = (local >= 0) & (local < WT)
    local = jnp.clip(local, 0, WT - 1)
    w = jnp.where(in_tile, vals_ref[:], 0.0)

    # Dense (R, WT) block of the weight matrix: k VPU compare+select passes
    # (no gather).  Duplicate columns accumulate.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, WT), 1)
    A = jnp.zeros((R, WT), dtype=jnp.float32)
    for j in range(k):
        A = A + jnp.where(
            col_ids == local[:, j][:, None], w[:, j][:, None], 0.0
        )

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]
    dims = (((1,), (0,)), ((), ()))
    if mode == "f32":
        # Mosaic HIGHEST: exact f32 via 6-pass bf16 decomposition.
        out_ref[:] += jax.lax.dot_general(
            A, x, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    elif mode == "bf16x3":
        # manual split: (A_hi+A_lo)@(x_hi+x_lo) minus the lo·lo term.
        # Each operand is exact to ~2^-16 rel; dropped term is O(2^-32).
        A_hi = A.astype(jnp.bfloat16)
        A_lo = (A - A_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            A_hi, x_hi, dims, preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            A_hi, x_lo, dims, preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            A_lo, x_hi, dims, preferred_element_type=jnp.float32)
        out_ref[:] += acc
    elif mode == "bf16":
        out_ref[:] += jax.lax.dot_general(
            A.astype(jnp.bfloat16), x.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown mode {mode!r}")


def banded_spmm(cols, vals, winstart, X, W: int = 1024, R: int = 512,
                WT: int = 1024, interpret: bool = False, mode: str = "f32",
                precision=None):
    """``out[i] = sum_j vals[i,j] * X[cols[i,j]]`` for edges inside each
    row-block's window ``[winstart[b], winstart[b]+W)``; out-of-window
    edges contribute 0 (caller adds the residual).

    Args:
      cols, vals: (n, k) ELL arrays, n a multiple of R and of WT.
      winstart: (n // R,) int32 window starts — multiples of WT,
        each in [0, n - W] (plan_banded quantizes).
      X: (n, d) features, d a multiple of 128 (pad first).
      W: window size (multiple of WT).
      WT: window tile size (the BlockSpec unit for X; multiple of 128).
      mode: matmul precision mode — "f32", "bf16x3", or "bf16".
      precision: legacy alias — a jax.lax.Precision maps onto mode.
    """
    if precision is not None:
        mode = "f32" if precision == jax.lax.Precision.HIGHEST else mode
    n, k = cols.shape
    d = X.shape[1]
    WT = min(WT, W)
    assert (n % R == 0 and n % WT == 0 and W % WT == 0 and WT % 128 == 0
            and d % 128 == 0), (n, R, W, WT, d)
    grid = (n // R, W // WT)

    kernel = functools.partial(_banded_kernel, WT=WT, k=k, mode=mode)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, k), lambda i, t, ws: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, k), lambda i, t, ws: (i, 0),
                             memory_space=pltpu.VMEM),
                # window tile: index_map reads the prefetched winstart
                pl.BlockSpec((WT, d), lambda i, t, ws: (ws[i] // WT + t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, d), lambda i, t, ws: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(winstart, cols, vals, X)


# -- host-side planning ---------------------------------------------------


def plan_banded(cols_np, R: int = 512, W: int | None = None, WT: int = 1024,
                max_residual: float = 0.002, max_W: int = 16384,
                deg=None, kcap: int | None = None):
    """Compute per-row-block window starts and the residual (out-of-window
    or over-``kcap``) edge list.

    When ``W is None``, auto-select the smallest window (multiple of WT,
    capped at ``max_W`` and at n) whose residual edge fraction is below
    ``max_residual``.  When ``deg`` is given and ``kcap`` is None, also cap
    the ELL slot count at the smallest ``kcap`` whose overflow edges stay
    under ``max_residual/2`` of all edges (degree-skew tail → residual;
    A-build cost ∝ kcap).  Window starts are quantized to multiples of
    ``WT`` (the kernel's BlockSpec unit).

    Returns ``(winstart, residual_rows, residual_slots, W, kcap)``.
    """
    n, k = cols_np.shape
    assert n % R == 0 and n % WT == 0
    nblocks = n // R

    if deg is not None:
        deg = np.asarray(deg)
        valid = np.arange(k)[None, :] < deg[:, None]
    else:
        valid = np.ones((n, k), dtype=bool)
    total_edges = max(1, int(valid.sum()))

    if kcap is None:
        if deg is not None:
            # smallest cap with overflow ≤ max_residual/2 of all edges
            budget = max_residual / 2 * total_edges
            kcap = k
            for c in range(1, k + 1):
                if np.maximum(np.minimum(deg, k) - c, 0).sum() <= budget:
                    kcap = c
                    break
        else:
            kcap = k

    blocks = cols_np.reshape(nblocks, R * k)
    med = np.median(blocks, axis=1)
    in_cap = np.arange(k)[None, :] < kcap

    def residuals(Wc):
        ws = np.clip(med - Wc // 2, 0, max(0, n - Wc))
        ws = (ws // WT).astype(np.int64) * WT        # quantize to WT
        ws = np.clip(ws, 0, max(0, n - Wc)).astype(np.int32)
        lo = np.repeat(ws, R)[:, None]
        out = (cols_np < lo) | (cols_np >= lo + Wc)
        # residual = valid edges that are out-of-window OR over the cap
        out = valid & (out | ~in_cap)
        return ws, out

    if W is None:
        # A-build cost ∝ W: grow in WT increments (not doubling) to the
        # smallest window meeting the residual target.  For an RCM-ordered
        # graph of bandwidth B, the needed W ≈ R + 2B + WT quantization.
        cap = min(max_W, max(WT, (n // WT) * WT))
        W = WT
        while True:
            winstart, out_mask = residuals(W)
            if out_mask.sum() / total_edges <= max_residual or W >= cap:
                break
            W += WT
    assert W % WT == 0 and W <= n, (W, WT, n)
    winstart, out_mask = residuals(W)
    ridx = np.argwhere(out_mask)
    return (winstart, ridx[:, 0].astype(np.int32),
            ridx[:, 1].astype(np.int32), int(W), int(kcap))


def spmm_banded_hybrid(g, X, plan, W: int | None = None, R: int = 512,
                       WT: int = 1024, interpret: bool = False,
                       mode: str = "f32", precision=None):
    """Banded Pallas kernel + XLA gather for the residual edges
    (ELL+COO hybrid).  ``plan`` comes from :func:`plan_banded`; its
    auto-selected window/kcap are used unless ``W`` overrides the window.
    Accepts both the 5-tuple plan (with kcap) and the legacy 4-tuple."""
    if precision is not None:
        mode = "f32" if precision == jax.lax.Precision.HIGHEST else mode
    if len(plan) == 5:
        winstart, rrows, rslots, planW, kcap = plan
    else:
        winstart, rrows, rslots, planW = plan
        kcap = g.cols.shape[1]
    if W is None:
        W = planW
    n, k = g.cols.shape
    cols = g.cols[:, :kcap] if kcap < k else g.cols
    vals = g.vals[:, :kcap] if kcap < k else g.vals
    d = X.shape[1]
    d_pad = (-d) % 128
    Xp = jnp.pad(X, ((0, 0), (0, d_pad))) if d_pad else X
    out = banded_spmm(cols, vals, jnp.asarray(winstart), Xp, W=W, R=R,
                      WT=WT, interpret=interpret, mode=mode)
    if len(rrows):
        # the kernel zeroed out-of-window / over-cap edges; add them here
        rcols = g.cols[rrows, rslots]
        rvals = g.vals[rrows, rslots]
        contrib = rvals[:, None] * jnp.take(Xp, rcols, axis=0)
        out = out.at[rrows].add(contrib)
    return out[:, :d] if d_pad else out
