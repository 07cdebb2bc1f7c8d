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
pass (~1e-2 rel err — diffusion/PageRank/MBO heat steps).  The packed
path additionally offers the round-5 row-quantized int8 band (rowq:
1-2 int8 planes in ONE stream, per-output-row power-of-two scales —
planes=2 is the measured exact-grade champion at 2 B/cell, +17% over
bf16x3) and a bf16-hi + ulp-scaled int8-lo variant (bf16i8, kept as a
measured negative result: a second band stream costs ~15% at equal
bytes on v5e, so 3 B/cell in two streams loses to 4 B/cell in one).

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


# -- materialized-band path ----------------------------------------------
#
# The A-build compare+select passes cost n·W·kcap VPU ops per SpMM call and
# dominate the banded kernel (measured: mode f32→bf16 changes edges/s by
# <20% — the MXU is not the bottleneck).  Iterative solvers (CG, power
# iteration, MBO heat steps — reference utils.py:483-532 hot loop) apply
# the SAME operator hundreds of times, so we build the dense (n, W) band
# ONCE in HBM and each subsequent SpMM just streams it: cost becomes
# n·W·bytes/HBM_BW — memory-bound, ~6× faster at W=4-5k, kcap≈20.
# The trade is HBM footprint (n·W·4 bytes f32); callers gate on a memory
# budget (see ops.accel).


def _band_build_kernel(winstart_ref, cols_ref, vals_ref, band_ref,
                       *, WT: int, k: int, out_dtype):
    # NOTE grid order is (t, i): the row-block axis i is INNERMOST.  With
    # the output block index varying along the inner axis, tile writes
    # stream at full rate; the (i, t) order (out index varying on the
    # inner-of-two axes' second coordinate) measured 3 orders of magnitude
    # slower on v5e.
    t = pl.program_id(0)
    i = pl.program_id(1)
    base = winstart_ref[i] + t * WT

    R = cols_ref.shape[0]
    local = cols_ref[:] - base
    in_tile = (local >= 0) & (local < WT)
    local = jnp.clip(local, 0, WT - 1)
    w = jnp.where(in_tile, vals_ref[:], 0.0)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, WT), 1)
    A = jnp.zeros((R, WT), dtype=jnp.float32)
    for j in range(k):
        A = A + jnp.where(
            col_ids == local[:, j][:, None], w[:, j][:, None], 0.0
        )
    band_ref[:] = A.astype(out_dtype)


def materialize_band(cols, vals, winstart, W: int, R: int = 512,
                     WT: int = 1024, interpret: bool = False,
                     out_dtype=jnp.float32):
    """One-time dense-band build: returns ``band`` of shape (n, W) with
    ``band[i, c] = sum of vals[i, j] over cols[i, j] == winstart[block(i)] + c``
    (out-of-window edges dropped — the caller's residual list covers them).
    """
    n, k = cols.shape
    WT = min(WT, W)
    assert n % R == 0 and n % WT == 0 and W % WT == 0
    # large slot counts (hub degrees) overflow the kernel's scoped VMEM:
    # build in slot chunks and sum (one-time cost, transient 2x band HBM)
    KMAX = 32
    if k > KMAX:
        out = materialize_band(cols[:, :KMAX], vals[:, :KMAX], winstart, W,
                               R=R, WT=WT, interpret=interpret,
                               out_dtype=jnp.float32)
        rest = materialize_band(cols[:, KMAX:], vals[:, KMAX:], winstart, W,
                                R=R, WT=WT, interpret=interpret,
                                out_dtype=jnp.float32)
        return (out + rest).astype(out_dtype)
    grid = (W // WT, n // R)                      # i innermost (see kernel)
    kernel = functools.partial(_band_build_kernel, WT=WT, k=k,
                               out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, k), lambda t, i, ws: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, k), lambda t, i, ws: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, WT), lambda t, i, ws: (i, t),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, W), out_dtype),
        interpret=interpret,
    )(winstart, cols, vals)


def _band_matmul_kernel(winstart_ref, band_ref, x_ref, out_ref,
                        *, mode: str):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    A = band_ref[:]
    x = x_ref[:]
    dims = (((1,), (0,)), ((), ()))
    if A.dtype == jnp.bfloat16:
        out_ref[:] += jax.lax.dot_general(
            A, x.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)
    elif mode == "f32":
        out_ref[:] += jax.lax.dot_general(
            A, x, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "bf16x3":
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
    else:  # "bf16" on f32-stored band
        out_ref[:] += jax.lax.dot_general(
            A.astype(jnp.bfloat16), x.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)


def band_spmm(band, winstart, X, R: int = 512, WT: int = 1024,
              interpret: bool = False, mode: str = "f32"):
    """``out = band-matrix @ X`` streaming a materialized (n, W) band
    (from :func:`materialize_band`).  Memory-bound: no A-build passes."""
    n, W = band.shape
    d = X.shape[1]
    WT = min(WT, W)
    assert (n % R == 0 and n % WT == 0 and W % WT == 0
            and d % 128 == 0), (n, R, W, WT, d)
    grid = (n // R, W // WT)
    kernel = functools.partial(_band_matmul_kernel, mode=mode)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, WT), lambda i, t, ws: (i, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, d), lambda i, t, ws: (ws[i] // WT + t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, d), lambda i, t, ws: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(winstart, band, X)


# -- min-plus (tropical) band kernel ---------------------------------------
#
# Bellman-Ford / Hopf-Lax distance relaxation over the materialized band:
# ``out[i] = min over window cols c with band[i,c] > 0 of update(d[c],
# band[i,c], f[c])``.  The XLA gather formulation costs ~30ns/edge; the
# band formulation streams the stored band at HBM rate (same trade as the
# SpMM above).  Zero band cells mean "no edge" — valid because graph
# weights are strictly positive (kNN kernels; reference dijkstra assumes
# positive costs, hjsolvers.cpp:117-227).

_MINPLUS_BIG = 1e30


def _band_minplus_kernel(winstart_ref, band_ref, df_ref, out_ref,
                         *, WT: int, hopf_lax: bool, track_arg: bool,
                         recip: bool):
    i = pl.program_id(0)
    t = pl.program_id(1)
    base = winstart_ref[i] + t * WT

    A = band_ref[:].astype(jnp.float32)              # (R, WT)
    if recip:
        # reciprocal edge costs 1/w (reference dijkstra
        # reciprocal_weights, graph.py:1077-1175); zero cells stay zero
        # so the A > 0 edge test below still works
        A = jnp.where(A > 0, 1.0 / jnp.where(A == 0, 1.0, A), 0.0)
    dwin = df_ref[0, :][None, :]                     # (1, WT) distances
    fwin = df_ref[1, :][None, :]                     # (1, WT) speed values
    if hopf_lax:
        fw = A * fwin
        cand = 0.5 * (fw + jnp.sqrt(fw * fw + 4.0 * dwin * dwin))
    else:
        cand = dwin + A * fwin
    cand = jnp.where(A > 0, cand, _MINPLUS_BIG)
    m = jnp.min(cand, axis=1)                        # (R,)

    R = A.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, _MINPLUS_BIG)

    cur = out_ref[:]                                  # (R, 128)
    if track_arg:
        # argmin via equality match (portable: two lane reduces, no
        # argmin primitive); ties resolve to the smallest window column
        wlane = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
        hit = cand == m[:, None]
        a = jnp.min(jnp.where(hit, wlane, jnp.int32(2**30)), axis=1)
        absidx = (a + base).astype(jnp.float32)       # exact below 2^24
        better = m < cur[:, 0]
        col0 = jnp.where(better, m, cur[:, 0])
        col1 = jnp.where(better, absidx, cur[:, 1])
        out_ref[:] = jnp.where(
            lane == 0, col0[:, None],
            jnp.where(lane == 1, col1[:, None], cur))
    else:
        out_ref[:] = jnp.where(
            lane == 0, jnp.minimum(cur[:, 0], m)[:, None], cur)


def band_minplus(band, winstart, d, f, R: int = 512, WT: int = 1024,
                 hopf_lax: bool = False, track_arg: bool = False,
                 recip: bool = False, interpret: bool = False):
    """One min-plus relaxation round over the band.  Returns an (n, 128)
    f32 array: column 0 = per-row min candidate (``_MINPLUS_BIG`` where the
    window holds no edge), column 1 (when ``track_arg``) = float-encoded
    absolute column index of the argmin (shortest-path-tree parent)."""
    n, W = band.shape
    WT = min(WT, W)
    assert n % R == 0 and n % WT == 0 and W % WT == 0, (n, R, W, WT)
    df = jnp.zeros((8, n), jnp.float32).at[0].set(d).at[1].set(f)
    grid = (n // R, W // WT)
    kernel = functools.partial(_band_minplus_kernel, WT=WT,
                               hopf_lax=hopf_lax, track_arg=track_arg,
                               recip=recip)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, WT), lambda i, t, ws: (i, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, WT), lambda i, t, ws: (0, ws[i] // WT + t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i, t, ws: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        interpret=interpret,
    )(winstart, band, df)


def residual_minplus(d, f, resid, hopf_lax: bool = False,
                     track_arg: bool = False, recip: bool = False):
    """Min-plus contribution of the out-of-window residual edges
    (structure from :func:`build_residual_ell`; zero-valued slots are
    padding, masked out).  Returns ``(min, argmin)`` over residual edges
    per row (``_MINPLUS_BIG`` / -1 where none)."""
    urows, rcols, rvals, inv_map, sp_r, sp_c, sp_v = resid
    n = d.shape[0]
    best = jnp.full((n,), _MINPLUS_BIG, jnp.float32)
    arg = jnp.full((n,), -1, jnp.int32)

    def upd(cand, cols, valid):
        cand = jnp.where(valid, cand, _MINPLUS_BIG)
        m = jnp.min(cand, axis=1)
        slot = jnp.argmin(cand, axis=1)
        a = jnp.take_along_axis(cols, slot[:, None], axis=1)[:, 0]
        return m, a

    if recip:
        rvals = jnp.where(rvals > 0,
                          1.0 / jnp.where(rvals == 0, 1.0, rvals), 0.0)
        sp_v = jnp.where(sp_v > 0,
                         1.0 / jnp.where(sp_v == 0, 1.0, sp_v), 0.0)
    if rcols.shape[0]:
        dn = jnp.take(d, rcols, axis=0)
        fn = jnp.take(f, rcols, axis=0)
        if hopf_lax:
            fw = rvals * fn
            cand = 0.5 * (fw + jnp.sqrt(fw * fw + 4.0 * dn * dn))
        else:
            cand = dn + rvals * fn
        m, a = upd(cand, rcols, rvals > 0)
        best = best.at[urows].set(m)
        arg = arg.at[urows].set(jnp.where(m < _MINPLUS_BIG, a, -1))
    if sp_r.shape[0]:
        dn = jnp.take(d, sp_c)
        fn = jnp.take(f, sp_c)
        if hopf_lax:
            fw = sp_v * fn
            cand = 0.5 * (fw + jnp.sqrt(fw * fw + 4.0 * dn * dn))
        else:
            cand = dn + sp_v * fn
        cand = jnp.where(sp_v > 0, cand, _MINPLUS_BIG)
        prev = best[sp_r]
        best = best.at[sp_r].min(cand)
        if track_arg:
            # one pass is enough: duplicate sp rows are rare (hub spill)
            took = best[sp_r] < prev
            arg = arg.at[sp_r].set(jnp.where(took & (cand <= best[sp_r]),
                                             sp_c, arg[sp_r]))
    if not track_arg:
        return best, None
    return best, arg


def build_residual_ell(rrows, rslots, cols_np, vals_np, n_pad: int,
                       rb: int | None = None):
    """Host-side residual regrouping: the naive per-edge ``out.at[rows].add``
    scatter serializes on duplicate rows (measured ~300ns/edge on v5e for
    a 200k-edge residual).  Regroup into

    * an ELL bucket — unique rows × ``rb`` slots — whose contribution is
      applied with a GATHER-based expansion (``inv_map``), no scatter;
    * a tiny COO spill for rows with more than ``rb`` residual edges
      (hubs), applied with a unique-free scatter of few rows.

    Returns ``(urows, rcols, rvals, inv_map, spill_rows, spill_cols,
    spill_vals)`` as device arrays, or None when there is no residual.
    """
    m = len(rrows)
    if m == 0:
        return None
    rcols_e = cols_np[rrows, rslots].astype(np.int64)
    rvals_e = vals_np[rrows, rslots]
    order = np.argsort(rrows, kind="stable")
    rr = rrows[order]
    rc = rcols_e[order]
    rv = rvals_e[order]
    counts = np.bincount(rr, minlength=n_pad)
    urows = np.nonzero(counts)[0]
    if rb is None:
        # 95th-percentile row count, clamped — hub tails go to the spill
        rb = int(np.clip(np.percentile(counts[urows], 95), 4, 32))
    start_of = np.zeros(n_pad + 1, np.int64)
    start_of[1:] = np.cumsum(counts)
    rank = np.arange(m) - start_of[rr]
    in_ell = rank < rb
    ui = np.searchsorted(urows, rr[in_ell])
    rcols = np.zeros((len(urows), rb), np.int32)
    rvals = np.zeros((len(urows), rb), np.float32)
    rcols[ui, rank[in_ell]] = rc[in_ell]
    rvals[ui, rank[in_ell]] = rv[in_ell]
    inv_map = np.full(n_pad, -1, np.int32)
    inv_map[urows] = np.arange(len(urows))
    sp_r = rr[~in_ell].astype(np.int32)
    sp_c = rc[~in_ell].astype(np.int32)
    sp_v = rv[~in_ell].astype(np.float32)
    return (jnp.asarray(urows.astype(np.int32)), jnp.asarray(rcols),
            jnp.asarray(rvals), jnp.asarray(inv_map),
            jnp.asarray(sp_r), jnp.asarray(sp_c), jnp.asarray(sp_v))


def apply_residual(out, Xp, resid):
    """Add the regrouped residual contribution (see build_residual_ell)."""
    urows, rcols, rvals, inv_map, sp_r, sp_c, sp_v = resid
    if rcols.shape[0]:
        C = jnp.einsum("ur,urd->ud", rvals, jnp.take(Xp, rcols, axis=0),
                       preferred_element_type=jnp.float32)
        add = jnp.where((inv_map >= 0)[:, None],
                        jnp.take(C, jnp.clip(inv_map, 0, None), axis=0), 0.0)
        out = out + add
    if sp_r.shape[0]:
        out = out.at[sp_r].add(sp_v[:, None] * jnp.take(Xp, sp_c, axis=0))
    return out


def spmm_band_hybrid(band, g, X, plan, R: int = 512, WT: int = 1024,
                     interpret: bool = False, mode: str = "f32",
                     resid=None):
    """Materialized-band SpMM + gather path for the residual edges."""
    if len(plan) == 5:
        winstart, rrows, rslots, _, _ = plan
    else:
        winstart, rrows, rslots, _ = plan
    d = X.shape[1]
    d_pad = (-d) % 128
    Xp = jnp.pad(X, ((0, 0), (0, d_pad))) if d_pad else X
    out = band_spmm(band, jnp.asarray(winstart), Xp, R=R, WT=WT,
                    interpret=interpret, mode=mode)
    if resid is not None:
        out = apply_residual(out, Xp, resid)
    elif len(rrows):
        rcols = g.cols[rrows, rslots]
        rvals = g.vals[rrows, rslots]
        contrib = rvals[:, None] * jnp.take(Xp, rcols, axis=0)
        out = out.at[rrows].add(contrib)
    return out[:, :d] if d_pad else out


# -- occupancy-aware compact tiled band ------------------------------------
#
# The rectangular band pays ONE window width for every row block — sized by
# the worst block — so a kNN band of ~20 real edges/row streams ~1000 band
# bytes per edge (judged round 1: the band design itself was the ceiling).
# The compact tiled band stores only the OCCUPIED (R, WT) tiles: each row
# block keeps its own list of window tiles that actually contain edges
# (plus a cost-model threshold — tiles worth fewer edges than their stream
# time go to the gather residual).  Band shape becomes (G*R, WT) with G =
# total kept tiles; the SpMM grid runs over tiles, revisiting each block's
# output rows consecutively.  Stream bytes drop by the occupancy factor
# (measured 3-6x on RCM kNN graphs at R=WT=512).


def plan_tiles(cols_np, R: int = 512, WT: int = 512, deg=None,
               kcap: int | None = None, kcap_max: int | None = None,
               min_edges_per_tile: int | None = None,
               hbm_budget_bytes: float = 8e9, ncols: int | None = None):
    """Per-(row-block, window-tile) occupancy plan.

    Returns ``(tile_block, tile_start, block_first, rrows, rslots, kcap)``:
    ``tile_block[g]`` = row-block index of kept tile g, ``tile_start[g]`` =
    absolute column start (multiple of WT), ``block_first[g]`` = 1 iff g is
    its block's first tile (output init flag).  Residual = valid edges not
    covered by a kept tile or beyond ``kcap`` slots.  Every block keeps at
    least its most-populated tile so the output rows are always written.
    """
    n, k = cols_np.shape
    if ncols is None:
        ncols = n                        # square case: X length == row count
    assert n % R == 0 and ncols % WT == 0, (n, ncols, R, WT)
    nblocks = n // R
    ntiles_cols = ncols // WT

    if deg is not None:
        deg = np.asarray(deg)
        valid = np.arange(k)[None, :] < deg[:, None]
    else:
        valid = np.ones((n, k), dtype=bool)
    total_edges = max(1, int(valid.sum()))

    if kcap is None:
        if deg is not None:
            budget = 0.001 * total_edges
            kcap = k
            for c in range(1, k + 1):
                if np.maximum(np.minimum(deg, k) - c, 0).sum() <= budget:
                    kcap = c
                    break
        else:
            kcap = k
    if kcap_max is not None:
        kcap = min(kcap, kcap_max)
    in_cap = np.arange(k)[None, :] < kcap

    if min_edges_per_tile is None:
        # tile stream time vs residual gather time (accel cost constants)
        min_edges_per_tile = max(8, int(R * WT * 4 / 700e9 / 40e-9))

    block_of = np.repeat(np.arange(nblocks, dtype=np.int64), R)
    covered = valid & in_cap
    brow = block_of[:, None] * np.ones((1, k), np.int64)
    tcol = np.clip(cols_np.astype(np.int64) // WT, 0, ntiles_cols - 1)
    flat = (brow * ntiles_cols + tcol)[covered]
    counts = np.bincount(flat, minlength=nblocks * ntiles_cols).reshape(
        nblocks, ntiles_cols)

    keep = counts >= min_edges_per_tile
    # every block keeps its best tile (zero-edge blocks keep tile 0: the
    # kernel writes zeros, which is correct for an all-padding block)
    best = counts.argmax(axis=1)
    keep[np.arange(nblocks), best] = True
    # HBM budget: drop lowest-count kept tiles beyond the budget
    # (inf = uncapped — the per-shard partition planner routes overflow
    # at the halo level instead)
    max_tiles = (np.inf if np.isinf(hbm_budget_bytes)
                 else int(hbm_budget_bytes / (R * WT * 4)))
    if keep.sum() > max_tiles:
        order = np.argsort(counts[keep])
        drop = keep.sum() - max_tiles
        kept_idx = np.argwhere(keep)
        for bi, ti in kept_idx[order[:drop]]:
            if ti != best[bi]:               # never drop a block's anchor
                keep[bi, ti] = False

    tb, tt = np.nonzero(keep)                # sorted by block, then tile
    tile_block = tb.astype(np.int32)
    tile_start = (tt * WT).astype(np.int32)
    block_first = np.zeros(len(tb), np.int32)
    block_first[np.unique(tb, return_index=True)[1]] = 1

    covered_by_kept = covered & keep[block_of[:, None],
                                     np.clip(tcol, 0, ntiles_cols - 1)]
    out_mask = valid & ~covered_by_kept
    ridx = np.argwhere(out_mask)
    return (tile_block, tile_start, block_first,
            ridx[:, 0].astype(np.int32), ridx[:, 1].astype(np.int32),
            int(kcap))


def _tiles_build_kernel(tb_ref, ts_ref, cols_ref, vals_ref, band_ref,
                        *, WT: int, k: int, out_dtype):
    g = pl.program_id(0)
    base = ts_ref[g]
    R = cols_ref.shape[0]
    local = cols_ref[:] - base
    in_tile = (local >= 0) & (local < WT)
    local = jnp.clip(local, 0, WT - 1)
    w = jnp.where(in_tile, vals_ref[:], 0.0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, WT), 1)
    # accumulate at f64 only when the stored band is f64 (CPU parity mode)
    acc_dtype = jnp.float64 if out_dtype == jnp.float64 else jnp.float32
    A = jnp.zeros((R, WT), dtype=acc_dtype)
    for j in range(k):
        A = A + jnp.where(col_ids == local[:, j][:, None],
                          w[:, j][:, None].astype(acc_dtype), 0.0)
    band_ref[:] = A.astype(out_dtype)


def materialize_band_tiles(cols, vals, tile_block, tile_start,
                           R: int = 512, WT: int = 512,
                           interpret: bool = False, out_dtype=jnp.float32):
    """Build the compact (G*R, WT) tiled band (one (R, WT) dense block per
    kept tile; see :func:`plan_tiles`)."""
    n, k = cols.shape
    G = tile_block.shape[0]
    KMAX = 32
    if k > KMAX:
        out = materialize_band_tiles(cols[:, :KMAX], vals[:, :KMAX],
                                     tile_block, tile_start, R=R, WT=WT,
                                     interpret=interpret,
                                     out_dtype=jnp.float32)
        rest = materialize_band_tiles(cols[:, KMAX:], vals[:, KMAX:],
                                      tile_block, tile_start, R=R, WT=WT,
                                      interpret=interpret,
                                      out_dtype=jnp.float32)
        return (out + rest).astype(out_dtype)
    kernel = functools.partial(_tiles_build_kernel, WT=WT, k=k,
                               out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((R, k), lambda g, tb, ts: (tb[g], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, k), lambda g, tb, ts: (tb[g], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, WT), lambda g, tb, ts: (g, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((G * R, WT), out_dtype),
        interpret=interpret,
    )(tile_block, tile_start, cols, vals)


def _tiles_matmul_kernel(tb_ref, ts_ref, bf_ref, band_ref, x_ref, out_ref,
                         *, mode: str):
    g = pl.program_id(0)

    @pl.when(bf_ref[g] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    A = band_ref[:]
    x = x_ref[:]
    dims = (((1,), (0,)), ((), ()))
    if mode == "f64":
        # CPU parity mode (interpret): exact f64 matmul on an f64 band
        out_ref[:] += jax.lax.dot_general(
            A.astype(jnp.float64), x.astype(jnp.float64), dims,
            preferred_element_type=jnp.float64)
    elif A.dtype == jnp.bfloat16:
        out_ref[:] += jax.lax.dot_general(
            A, x.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)
    elif mode == "f32":
        out_ref[:] += jax.lax.dot_general(
            A, x, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "bf16x3":
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
    else:  # "bf16" on f32-stored band
        out_ref[:] += jax.lax.dot_general(
            A.astype(jnp.bfloat16), x.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)


def band_tiles_spmm(band, tile_block, tile_start, block_first, X, n: int,
                    R: int = 512, WT: int = 512, interpret: bool = False,
                    mode: str = "f32"):
    """``out = tiled-band @ X`` streaming only the occupied tiles.

    Rectangular case allowed (``X.shape[0] != n``, e.g. a halo-extended
    feature buffer in the sharded path): ``tile_start`` indexes ``X``
    rows, ``tile_block`` indexes output rows.

    NOTE on tile order: ``tile_block`` must be NON-DECREASING.  Pallas TPU
    keeps the output window resident only while consecutive grid steps
    target the same output block; revisiting an earlier block reads
    flushed/undefined VMEM (plan padding must therefore repeat the LAST
    block, never jump back to block 0)."""
    G = tile_block.shape[0]
    d = X.shape[1]
    assert n % R == 0 and X.shape[0] % WT == 0 and d % 128 == 0, (
        n, R, WT, X.shape, d)
    out_dtype = jnp.float64 if mode == "f64" else jnp.float32
    kernel = functools.partial(_tiles_matmul_kernel, mode=mode)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((R, WT), lambda g, tb, ts, bf: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, d), lambda g, tb, ts, bf: (ts[g] // WT, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, d), lambda g, tb, ts, bf: (tb[g], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), out_dtype),
        interpret=interpret,
    )(tile_block, tile_start, block_first, band, X)


def _tiles_minplus_kernel(tb_ref, ts_ref, bf_ref, band_ref, df_ref, out_ref,
                          *, WT: int, hopf_lax: bool, track_arg: bool,
                          recip: bool):
    g = pl.program_id(0)
    base = ts_ref[g]

    A = band_ref[:].astype(jnp.float32)
    if recip:
        A = jnp.where(A > 0, 1.0 / jnp.where(A == 0, 1.0, A), 0.0)
    dwin = df_ref[0, :][None, :]
    fwin = df_ref[1, :][None, :]
    if hopf_lax:
        fw = A * fwin
        cand = 0.5 * (fw + jnp.sqrt(fw * fw + 4.0 * dwin * dwin))
    else:
        cand = dwin + A * fwin
    cand = jnp.where(A > 0, cand, _MINPLUS_BIG)
    m = jnp.min(cand, axis=1)

    R = A.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    @pl.when(bf_ref[g] == 1)
    def _():
        out_ref[:] = jnp.full_like(out_ref, _MINPLUS_BIG)

    cur = out_ref[:]
    if track_arg:
        wlane = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
        hit = cand == m[:, None]
        a = jnp.min(jnp.where(hit, wlane, jnp.int32(2**30)), axis=1)
        absidx = (a + base).astype(jnp.float32)
        better = m < cur[:, 0]
        col0 = jnp.where(better, m, cur[:, 0])
        col1 = jnp.where(better, absidx, cur[:, 1])
        out_ref[:] = jnp.where(
            lane == 0, col0[:, None],
            jnp.where(lane == 1, col1[:, None], cur))
    else:
        out_ref[:] = jnp.where(
            lane == 0, jnp.minimum(cur[:, 0], m)[:, None], cur)


def band_tiles_minplus(band, tile_block, tile_start, block_first, d, f,
                       n: int, R: int = 512, WT: int = 512,
                       hopf_lax: bool = False, track_arg: bool = False,
                       recip: bool = False, interpret: bool = False,
                       ncols: int | None = None):
    """One min-plus relaxation round over the compact tiled band (see
    :func:`band_minplus` for the output convention).  ``ncols``: length
    of the window/column space ``d``/``f`` live in when it differs from
    the row count ``n`` (the sharded partition's halo-extended local
    buffer, ``parallel.band_shard.ShardedOp.minplus_``)."""
    G = tile_block.shape[0]
    ncols = n if ncols is None else ncols
    assert n % R == 0 and ncols % WT == 0, (n, R, WT, ncols)
    assert d.shape == (ncols,) and f.shape == (ncols,), (d.shape, ncols)
    df = jnp.zeros((8, ncols), jnp.float32).at[0].set(d).at[1].set(f)
    kernel = functools.partial(_tiles_minplus_kernel, WT=WT,
                               hopf_lax=hopf_lax, track_arg=track_arg,
                               recip=recip)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((R, WT), lambda g, tb, ts, bf: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, WT), lambda g, tb, ts, bf: (0, ts[g] // WT),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda g, tb, ts, bf: (tb[g], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        interpret=interpret,
    )(tile_block, tile_start, block_first, band, df)


def _tiles_lip_kernel(tb_ref, ts_ref, bf_ref, band_ref, u_ref, out_ref,
                      *, C: int):
    """Per row block: [w-weighted sum | neighbor min | neighbor max] of the
    C class columns of u over this tile's edges — the three reductions of
    the game-theoretic p-Laplace / AMLE iteration (reference
    lp_iterate.cpp:35-187) in ONE band stream."""
    g = pl.program_id(0)
    A = band_ref[:].astype(jnp.float32)          # (R, WT)
    u = u_ref[:]                                 # (WT, 128)
    R = A.shape[0]
    big = jnp.float32(3e38)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    @pl.when(bf_ref[g] == 1)
    def _():
        lane384 = jax.lax.broadcasted_iota(jnp.int32, (R, 384), 1)
        out_ref[:] = jnp.where(lane384 < 128, 0.0,
                               jnp.where(lane384 < 256, big, -big))

    sum_part = jax.lax.dot_general(
        A, u, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (R, 128)

    has_edge = A > 0
    min_mat = jnp.full((R, 128), big, jnp.float32)
    max_mat = jnp.full((R, 128), -big, jnp.float32)
    for c in range(C):
        uc = u[:, c][None, :]                    # (1, WT)
        cand_min = jnp.min(jnp.where(has_edge, uc, big), axis=1)
        cand_max = jnp.max(jnp.where(has_edge, uc, -big), axis=1)
        min_mat = jnp.where(lane == c, cand_min[:, None], min_mat)
        max_mat = jnp.where(lane == c, cand_max[:, None], max_mat)

    cur = out_ref[:]
    out_ref[:] = jnp.concatenate([
        cur[:, 0:128] + sum_part,
        jnp.minimum(cur[:, 128:256], min_mat),
        jnp.maximum(cur[:, 256:384], max_mat),
    ], axis=1)


def band_tiles_lip(band, tile_block, tile_start, block_first, U, n: int,
                   C: int, R: int = 512, WT: int = 512,
                   interpret: bool = False, ncols: int | None = None):
    """One pass of the lip-iteration reductions over the compact tiled
    band.  ``U``: (ncols, 128) class columns (first C valid; ``ncols``
    defaults to ``n`` and differs only for the sharded halo-extended
    window space).  Returns (n, 384): ``[:, :128]`` = w-weighted neighbor
    sums, ``[:, 128:256]`` = neighbor min (3e38 where none in-band),
    ``[:, 256:384]`` = neighbor max (-3e38 where none)."""
    G = tile_block.shape[0]
    ncols = n if ncols is None else ncols
    assert n % R == 0 and ncols % WT == 0 and U.shape == (ncols, 128)
    kernel = functools.partial(_tiles_lip_kernel, C=C)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((R, WT), lambda g, tb, ts, bf: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, 128), lambda g, tb, ts, bf: (ts[g] // WT, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 384), lambda g, tb, ts, bf: (tb[g], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, 384), jnp.float32),
        interpret=interpret,
    )(tile_block, tile_start, block_first, band, U)


def residual_lip(U, resid, n: int):
    """Residual-edge contributions to the lip reductions: returns
    ``(sum_add, min_r, max_r)`` of shape (n, C) with big/-big identities
    (structure from :func:`build_residual_ell`; zero-valued slots are
    padding)."""
    urows, rcols, rvals, inv_map, sp_r, sp_c, sp_v = resid
    C = U.shape[1]
    big = jnp.float32(3e38)
    sum_add = jnp.zeros((n, C), jnp.float32)
    min_r = jnp.full((n, C), big, jnp.float32)
    max_r = jnp.full((n, C), -big, jnp.float32)
    if rcols.shape[0]:
        un = jnp.take(U, rcols, axis=0)                # (u, rb, C)
        valid = (rvals > 0)[:, :, None]
        sum_u = jnp.einsum("ur,urc->uc", rvals, un,
                           preferred_element_type=jnp.float32)
        min_u = jnp.min(jnp.where(valid, un, big), axis=1)
        max_u = jnp.max(jnp.where(valid, un, -big), axis=1)
        sum_add = sum_add.at[urows].add(sum_u)
        min_r = min_r.at[urows].min(min_u)
        max_r = max_r.at[urows].max(max_u)
    if sp_r.shape[0]:
        un = jnp.take(U, sp_c, axis=0)                 # (m, C)
        valid = (sp_v > 0)[:, None]
        sum_add = sum_add.at[sp_r].add(
            jnp.where(valid, sp_v[:, None] * un, 0.0))
        min_r = min_r.at[sp_r].min(jnp.where(valid, un, big))
        max_r = max_r.at[sp_r].max(jnp.where(valid, un, -big))
    return sum_add, min_r, max_r


def spmm_tiles_hybrid(band, tiles, g, X, R: int = 512, WT: int = 512,
                      interpret: bool = False, mode: str = "f32",
                      resid=None):
    """Compact-tiled-band SpMM + gather path for the residual edges.
    ``tiles`` = (tile_block, tile_start, block_first) device arrays."""
    tile_block, tile_start, block_first = tiles
    d = X.shape[1]
    d_pad = (-d) % 128
    Xp = jnp.pad(X, ((0, 0), (0, d_pad))) if d_pad else X
    out = band_tiles_spmm(band, tile_block, tile_start, block_first, Xp,
                          g.n, R=R, WT=WT, interpret=interpret, mode=mode)
    if resid is not None:
        out = apply_residual(out, Xp, resid)
    return out[:, :d] if d_pad else out


# -- packed compact tiles ---------------------------------------------------
#
# At small tile sizes the compact tiled band hits a GRID-STEP floor, not a
# bandwidth floor: the round-3 sweep measured bytes/edge falling 589->408
# from (512,512) to (256,128) while achieved GB/s collapsed 457->243 —
# ~2.5 us/step of DMA-issue latency dominates at G~13k steps.  Packing S
# same-block tiles into one (R, S*WT) slab per grid step keeps the small
# tiles' low zero-padding while dividing the step count by S: the slab is
# one contiguous band DMA, the S window tiles are S independent X inputs
# whose index maps read a (G, S) prefetched start table.


def pack_tiles(tb, ts, bf, S: int):
    """Group the (block-sorted) kept tiles into slabs of S consecutive
    tiles of the SAME block (tail slabs pad by repeating their last tile
    — zero band, same window, so the extra DMA re-reads a resident tile
    and accumulates 0).  Returns ``(slab_block, slab_starts (G,S),
    slab_first, pack_index (G,S) -> original tile or -1)``."""
    tb = np.asarray(tb)
    ts = np.asarray(ts)
    bf = np.asarray(bf)
    slabs_b, slabs_ts, slabs_bf, slabs_src = [], [], [], []
    i = 0
    G0 = len(tb)
    while i < G0:
        j = i
        while j < i + S and j < G0 and tb[j] == tb[i]:
            j += 1
        starts = list(ts[i:j])
        src = list(range(i, j))
        while len(starts) < S:          # pad: repeat last tile, zero band
            starts.append(starts[-1])
            src.append(-1)
        slabs_b.append(tb[i])
        slabs_ts.append(starts)
        slabs_bf.append(int(bf[i:j].max()))
        slabs_src.append(src)
        i = j
    return (np.asarray(slabs_b, np.int32),
            np.asarray(slabs_ts, np.int32),
            np.asarray(slabs_bf, np.int32),
            np.asarray(slabs_src, np.int32))


def pack_band(band, pack_index, R: int, WT: int, out_dtype=None):
    """Re-lay unpacked (G0*R, WT) tiles into packed (G*R, S*WT) slabs
    (device-side, one-time)."""
    G, S = pack_index.shape
    G0 = band.shape[0] // R
    dtype = out_dtype or band.dtype
    tiles = band.reshape(G0, R, WT)
    zero = jnp.zeros((1, R, WT), tiles.dtype)
    tiles = jnp.concatenate([tiles, zero])            # -1 -> zero tile
    idx = jnp.asarray(np.where(pack_index < 0, G0, pack_index))
    slabs = tiles[idx.reshape(-1)].reshape(G, S, R, WT)
    return jnp.transpose(slabs, (0, 2, 1, 3)).reshape(
        G * R, S * WT).astype(dtype)


def _tiles_packed_kernel(tb_ref, ts_ref, bf_ref, band_ref, *rest, WT: int,
                         S: int, mode: str):
    xs = rest[:-1]
    out_ref = rest[-1]
    g = pl.program_id(0)

    @pl.when(bf_ref[g] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    A = band_ref[:]                                   # (R, S*WT)
    x = jnp.concatenate([x_ref[:] for x_ref in xs], axis=0)  # (S*WT, d)
    dims = (((1,), (0,)), ((), ()))
    if A.dtype == jnp.bfloat16:
        out_ref[:] += jax.lax.dot_general(
            A, x.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)
    elif mode == "f32":
        out_ref[:] += jax.lax.dot_general(
            A, x.astype(jnp.float32), dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    else:  # bf16x3 on an f32 band
        A_hi = A.astype(jnp.bfloat16)
        A_lo = (A - A_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        xf = x.astype(jnp.float32)
        x_hi = xf.astype(jnp.bfloat16)
        x_lo = (xf - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            A_hi, x_hi, dims, preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            A_hi, x_lo, dims, preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            A_lo, x_hi, dims, preferred_element_type=jnp.float32)
        out_ref[:] += acc


def band_tiles_spmm_packed(band, slab_block, slab_starts, slab_first, X,
                           n: int, R: int = 256, WT: int = 128, S: int = 4,
                           interpret: bool = False, mode: str = "bf16"):
    """``out = packed-tiled-band @ X``: one grid step streams an
    (R, S*WT) slab + its S window tiles.  ``X`` may be bf16 (halves the
    window-stream bytes in bf16 mode); output is f32."""
    G = slab_block.shape[0]
    d = X.shape[1]
    assert n % R == 0 and X.shape[0] % WT == 0 and d % 128 == 0
    # starts are prefetched FLAT (G*S,): a 2-D scalar-prefetch array is
    # lane-padded to 128 in SMEM (measured: a (G, 4) table became a 1.9 MB
    # SMEM operand and overflowed the 1 MB budget)
    slab_starts = slab_starts.reshape(-1)
    assert slab_starts.shape == (G * S,)
    kernel = functools.partial(_tiles_packed_kernel, WT=WT, S=S, mode=mode)
    x_specs = [
        pl.BlockSpec(
            (WT, d),
            (lambda k: lambda g, tb, ts, bf: (ts[g * S + k] // WT, 0))(k),
            memory_space=pltpu.VMEM)
        for k in range(S)
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((R, S * WT), lambda g, tb, ts, bf: (g, 0),
                             memory_space=pltpu.VMEM),
            ] + x_specs,
            out_specs=pl.BlockSpec((R, d),
                                   lambda g, tb, ts, bf: (tb[g], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(slab_block, slab_starts, slab_first, band, *([X] * S))


# -- exact-grade 3 B/cell band: bf16 hi + int8 lo -------------------------
#
# bf16x3 streams a 4 B/cell f32 band and splits hi/lo in-kernel; the lo
# term only carries ~8 significant bits, so storing it as an int8 keeps
# the ~1e-5 exact-CG-grade error at 3 B/cell — a 25% cut of the dominant
# traffic term at the tuned geometry.  The quantization step for cell
# (i,j) is ulp(hi_ij)*2^-8, i.e. the scale is PER-ELEMENT but carried
# entirely by hi's exponent bits, so no scale array is stored: the
# kernel rebuilds it with one exponent mask + subtract (both exact,
# power-of-two arithmetic) and one bf16 multiply.


def quantize_band_i8(band):
    """Split an f32 band into ``(hi bf16, q int8)`` with
    ``band ≈ hi + q * ulp(hi) * 2**-8`` per element.

    The quantization error is <= ulp(hi)*2^-9 ~ |band|*2^-16 per cell —
    uniform RELATIVE accuracy however widely the band magnitudes spread
    (a per-slab scale was measured 7x worse on row-stochastic weights
    whose max weight is ~1 while the typical is ~1/k).  ``q`` is exact
    in bf16 (|q| <= 127) and the scale is a power of two, so the
    in-kernel dequantization is exact."""
    hi = band.astype(jnp.bfloat16)
    # XLA folds f32->bf16->f32 round-trips under jit (measured: the
    # residual silently becomes 0); the barrier forces the real downcast
    r = band - jax.lax.optimization_barrier(hi).astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(hi, jnp.int16)
    u = jax.lax.bitcast_convert_type(
        bits & jnp.int16(0x7F80), jnp.bfloat16).astype(jnp.float32)
    # ulp(hi) = u * 2^-7 (bf16: 7 stored mantissa bits); step = ulp*2^-8
    s = u * jnp.float32(2.0 ** -15)
    q = jnp.where(s > 0, jnp.round(r / jnp.where(s > 0, s, 1.0)), 0.0)
    return hi, jnp.clip(q, -127, 127).astype(jnp.int8)


def _tiles_packed_i8_kernel(tb_ref, ts_ref, bf_ref, hi_ref, q_ref,
                            *rest, WT: int, S: int):
    xs = rest[:-1]
    out_ref = rest[-1]
    g = pl.program_id(0)

    @pl.when(bf_ref[g] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    A_hi = hi_ref[:]                                  # (R, S*WT) bf16
    # per-element dequant scale ulp(A_hi)*2^-8 = 2^(e-15) rebuilt from
    # the exponent bits: mask (int16 subtract is unsupported on the v5e
    # VPU, so the -15 exponent shift is a bf16 power-of-two multiply —
    # still exact).  A_hi==0 cells give u=0 so the product stays 0.
    u = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(A_hi, jnp.int16)
        & jnp.int16(0x7F80), jnp.bfloat16)
    A_lo = (q_ref[:].astype(jnp.bfloat16) * u) * jnp.bfloat16(2.0 ** -15)
    xf = jnp.concatenate([x_ref[:] for x_ref in xs], axis=0)  # (S*WT, d)
    x_hi = xf.astype(jnp.bfloat16)
    x_lo = (xf - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(
        A_hi, x_hi, dims, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        A_hi, x_lo, dims, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        A_lo, x_hi, dims, preferred_element_type=jnp.float32)
    out_ref[:] += acc


def band_tiles_spmm_packed_i8(hi, q, slab_block, slab_starts,
                              slab_first, X, n: int, R: int = 384,
                              WT: int = 128, S: int = 6,
                              interpret: bool = False):
    """``out = (hi + q*ulp(hi)*2^-8) @ X`` on packed slabs — the
    exact-CG-grade (~1e-5) mode at 3 band bytes/cell.  ``X`` must be f32
    (split hi/lo in-kernel); output f32."""
    G = slab_block.shape[0]
    d = X.shape[1]
    assert n % R == 0 and X.shape[0] % WT == 0 and d % 128 == 0
    slab_starts = slab_starts.reshape(-1)
    assert slab_starts.shape == (G * S,)
    kernel = functools.partial(_tiles_packed_i8_kernel, WT=WT, S=S)
    x_specs = [
        pl.BlockSpec(
            (WT, d),
            (lambda k: lambda g, tb, ts, bf: (ts[g * S + k] // WT, 0))(k),
            memory_space=pltpu.VMEM)
        for k in range(S)
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((R, S * WT), lambda g, tb, ts, bf: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S * WT), lambda g, tb, ts, bf: (g, 0),
                             memory_space=pltpu.VMEM),
            ] + x_specs,
            out_specs=pl.BlockSpec((R, d),
                                   lambda g, tb, ts, bf: (tb[g], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(slab_block, slab_starts, slab_first, hi, q, *([X] * S))


# -- row-quantized fixed-point band: 1-2 int8 planes, ONE stream ----------
#
# Measured on v5e: a SECOND band input stream costs ~15% throughput at
# equal bytes (two bf16 planes lose to one f32 plane + in-kernel split),
# so the 3 B/cell bf16+int8 format above cannot beat bf16x3 despite the
# byte saving.  This format keeps ONE stream: the band is fixed-point
# per OUTPUT ROW — A ≈ s_row*(q_hi + q_lo/254) with s_row a power of
# two >= rowmax/127 — stored as 1 (fast) or 2 (exact) int8 planes
# side-by-side in a single (R, planes*S*WT) int8 block.  The MXU
# multiplies int8 operands directly (no VPU dequant); the per-row scale
# is applied OUTSIDE the kernel where XLA fuses it into the residual
# pass.  2 planes = ~16 bits row-relative = exact-CG grade at HALF the
# bf16x3 band bytes; 1 plane = ~bf16-grade at half the bf16 bytes.


def quantize_band_rowq(band, row_of, n: int, planes: int = 2):
    """Row-quantize a packed f32 band (G*R, S*WT) into
    ``(qband (G*R, planes*S*WT) int8, s (n,) f32)`` with
    ``band[i] ≈ s[row_of[i]] * (q_hi[i] + q_lo[i]/254)``.  (254, not
    256: round(r*256) reaches ±128 and the int8 clip would double the
    error tail.)

    ``row_of`` maps each packed band row to its graph row (slabs of the
    same row block share scales so partial products can be scaled after
    accumulation).  ``s`` is a power of two — the final rescale is
    exact."""
    rowmax = jnp.zeros((n,), jnp.float32).at[row_of].max(
        jnp.max(jnp.abs(band), axis=1))
    e = jnp.ceil(jnp.log2(jnp.where(rowmax > 0, rowmax, 1.0) / 127.0)
                 ).astype(jnp.int32)
    s = jnp.where(rowmax > 0, jnp.ldexp(jnp.float32(1.0), e), 1.0)
    s = jnp.where(rowmax > 127.0 * s, 2.0 * s, s)
    t = band / s[row_of][:, None]                     # |t| <= 127
    q_hi = jnp.round(t)
    if planes == 1:
        q = jnp.clip(q_hi, -127, 127).astype(jnp.int8)
        return q, s
    q_lo = jnp.clip(jnp.round((t - q_hi) * 254.0), -127, 127)
    q = jnp.concatenate([jnp.clip(q_hi, -127, 127), q_lo],
                        axis=1).astype(jnp.int8)
    return q, s


def _tiles_packed_rowq_kernel(tb_ref, ts_ref, bf_ref, q_ref, *rest,
                              WT: int, S: int, planes: int):
    xs = rest[:-1]
    out_ref = rest[-1]
    g = pl.program_id(0)

    @pl.when(bf_ref[g] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    SW = S * WT
    Q = q_ref[:]                                      # (R, planes*SW)
    dims = (((1,), (0,)), ((), ()))
    if planes == 1:
        x = jnp.concatenate([x_ref[:] for x_ref in xs], axis=0)
        acc = jax.lax.dot_general(
            Q, x.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)
    else:
        xf = jnp.concatenate([x_ref[:] for x_ref in xs], axis=0)
        x_hi = xf.astype(jnp.bfloat16)
        x_lo = (xf - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        q_hi = Q[:, :SW]
        q_lo = Q[:, SW:]
        acc = jax.lax.dot_general(
            q_hi, x_hi, dims, preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            q_hi, x_lo, dims, preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            q_lo, x_hi, dims,
            preferred_element_type=jnp.float32) * jnp.float32(1 / 254)
    out_ref[:] += acc


def band_tiles_spmm_packed_rowq(qband, srow, slab_block, slab_starts,
                                slab_first, X, n: int, R: int = 256,
                                WT: int = 128, S: int = 12,
                                planes: int = 2,
                                interpret: bool = False):
    """``out = rowquant-band @ X`` on packed slabs (see
    quantize_band_rowq).  planes=2: exact-CG grade (~1e-5), X must be
    f32 (split hi/lo in-kernel).  planes=1: fast grade (~bf16), X may
    be pre-cast bf16.  Output f32, already rescaled by ``srow``."""
    G = slab_block.shape[0]
    d = X.shape[1]
    assert n % R == 0 and X.shape[0] % WT == 0 and d % 128 == 0
    slab_starts = slab_starts.reshape(-1)
    assert slab_starts.shape == (G * S,)
    kernel = functools.partial(_tiles_packed_rowq_kernel, WT=WT, S=S,
                               planes=planes)
    x_specs = [
        pl.BlockSpec(
            (WT, d),
            (lambda k: lambda g, tb, ts, bf: (ts[g * S + k] // WT, 0))(k),
            memory_space=pltpu.VMEM)
        for k in range(S)
    ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((R, planes * S * WT),
                             lambda g, tb, ts, bf: (g, 0),
                             memory_space=pltpu.VMEM),
            ] + x_specs,
            out_specs=pl.BlockSpec((R, d),
                                   lambda g, tb, ts, bf: (tb[g], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(slab_block, slab_starts, slab_first, qband, *([X] * S))
    # per-row rescale OUTSIDE the kernel: XLA fuses it into the caller's
    # residual pass, so it costs no extra memory sweep
    return out * srow[:, None]


# -- host-side planning ---------------------------------------------------


def plan_banded(cols_np, R: int = 512, W: int | None = None, WT: int = 1024,
                max_residual: float = 0.002, max_W: int = 16384,
                deg=None, kcap: int | None = None,
                kcap_max: int | None = None,
                gain_per_tile: int | None = None):
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
    if kcap_max is not None:
        # hard cap (e.g. the build kernel's VMEM slot budget) — overflow
        # edges land in the residual beyond the max_residual target
        kcap = min(kcap, kcap_max)

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
        prev = None
        while True:
            winstart, out_mask = residuals(W)
            cur = int(out_mask.sum())
            if cur / total_edges <= max_residual or W >= cap:
                break
            if (gain_per_tile is not None and prev is not None
                    and prev - cur < gain_per_tile):
                # cost-aware stop: widening the window costs more stream
                # time than the residual edges it absorbs would cost in
                # the gather path
                W -= WT
                winstart, out_mask = residuals(W)
                break
            prev = cur
            W += WT
    assert W % WT == 0 and W <= n, (W, WT, n)
    winstart, out_mask = residuals(W)
    ridx = np.argwhere(out_mask)
    return (winstart, ridx[:, 0].astype(np.int32),
            ridx[:, 1].astype(np.int32), int(W), int(kcap))


def spmm_banded_hybrid(g, X, plan, W: int | None = None, R: int = 512,
                       WT: int = 1024, interpret: bool = False,
                       mode: str = "f32", precision=None, resid=None):
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
    if resid is not None:
        out = apply_residual(out, Xp, resid)
        return out[:, :d] if d_pad else out
    if len(rrows):
        # the kernel zeroed out-of-window / over-cap edges; add them here
        rcols = g.cols[rrows, rslots]
        rvals = g.vals[rrows, rslots]
        contrib = rvals[:, None] * jnp.take(Xp, rcols, axis=0)
        out = out.at[rrows].add(contrib)
    return out[:, :d] if d_pad else out
