"""Partitioned tiled-band SpMM — the Pallas fast path over a device mesh.

Round-1 verdict: the banded kernel (where all measured single-chip perf
lives) ran single-chip only; the distributed SpMM used the plain-ELL
GSPMD gather.  This module shards the *compact tiled band* itself
(SURVEY.md §5 'graph partitioning', §7.2 step 6):

* **Partition**: rows are split into P contiguous blocks (RCM ordering
  keeps each block's neighbor columns within a narrow halo of the block).
  Each device holds its own block's occupied (R, WT) band tiles, built by
  the same ``pallas_spmm.plan_tiles``/``materialize_band_tiles`` machinery
  as the single-chip path, with column starts rebased onto a
  halo-extended local feature buffer.
* **Halo exchange**: one ``lax.ppermute`` per neighbor moves the H
  boundary feature rows (H = max column overhang, rounded to WT) — the
  graph analogue of ring attention's block rotation, except kNN+RCM
  locality makes ONE hop suffice.  XLA overlaps the two ppermutes with
  the local tile stream.
* **Compute**: each device streams only its own occupied tiles through
  the MXU (``band_tiles_spmm``) — per-device work and HBM traffic are
  1/P of the single-chip kernel, which is the ≥80% scaling design point
  (BASELINE.md scaling target).

Edges whose columns fall outside the halo (none on RCM kNN graphs unless
the bandwidth exceeds the block size) go to a global residual COO applied
with a GSPMD gather.  Results match ``ops.spmm`` to float reduction order.

Two consumers:

* :class:`ShardedOp` — a SparseGraph-duck-typed pytree that the sharded
  *model solvers* (``parallel/execute.py``) pass straight into the SAME
  jitted programs the single-chip path uses; ``ops.graphops.spmm``
  dispatches to the partitioned band kernel via its ``spmm_`` hook.  This
  is the round-2-verdict item 1: the banded halo-exchange kernel IS the
  sharded model hot path.
* :class:`ShardedBandPlan` — the standalone benchmark/driver handle
  (``bench.py`` sharded mode, ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graphlearning_tpu.core.sparse import SparseGraph


def _roundup(x: int, m: int) -> int:
    return -(-int(x) // m) * m


class BandPartition:
    """Host-side product of partitioning a graph's tiled band over P
    contiguous row blocks (one per device).  Plain numpy — device
    placement is the consumer's job."""

    def __init__(self, *, band, tb, ts, bf, cols, vals, deg, lcols,
                 res_rows, res_slots, res_cols, res_vals,
                 n, n_pad, B, H, G, Pn, R, WT, nnz):
        self.band = band          # (Pn*G*R, WT) materialized tiles
        self.tb = tb              # (Pn*G,) tile -> local row-block index
        self.ts = ts              # (Pn*G,) tile -> local X-buffer col start
        self.bf = bf              # (Pn*G,) 1 iff first tile of its block
        self.cols = cols          # (n_pad, k) padded ELL (global indices)
        self.vals = vals
        self.deg = deg
        self.lcols = lcols        # (n_pad, k) halo-local ELL col indices
        self.res_rows = res_rows  # global COO residual (out-of-halo edges)
        self.res_slots = res_slots  # ELL slot of each residual edge
        self.res_cols = res_cols
        self.res_vals = res_vals
        self.n, self.n_pad = n, n_pad
        self.B, self.H, self.G, self.Pn = B, H, G, Pn
        self.R, self.WT = R, WT
        self.nnz = nnz

    @property
    def residual_frac(self) -> float:
        return len(self.res_rows) / max(1, self.nnz)


def build_band_partition(W, Pn: int, R: int = 512, WT: int = 512,
                         interpret: bool = False, max_halo_frac: float = 1.0,
                         band_dtype=np.float32) -> BandPartition:
    """Partition ``W``'s rows into ``Pn`` contiguous blocks and build each
    block's compact tiled band on the halo-extended local index space.

    Tile lists are padded per shard to the max tile count ``G`` with
    no-op tiles that REPEAT the shard's last real (block, start) pair —
    the padded ``tile_block`` sequence stays non-decreasing, so the Pallas
    output window is never revisited after being flushed (real-TPU
    correctness requirement, see ``band_tiles_spmm``)."""
    from graphlearning_tpu.ops.pallas_spmm import (
        materialize_band_tiles, plan_tiles)

    if isinstance(W, SparseGraph):
        cols = np.asarray(W.cols)
        vals = np.asarray(W.vals)
        deg = np.asarray(W.deg)
        n = W.n
        nnz = int(deg.sum())
    else:
        cols, vals, deg = SparseGraph.ell_from_scipy(W)
        n = W.shape[0]
        nnz = int(deg.sum())

    # block size: multiple of both R and WT so every shard's rows and
    # local feature buffer tile cleanly
    unit = int(np.lcm(R, WT))
    B = _roundup(-(-n // Pn), unit)
    n_pad = B * Pn
    k = cols.shape[1]
    if n_pad > n:
        pad = n_pad - n
        cols = np.concatenate(
            [cols, np.repeat(np.arange(n, n_pad, dtype=cols.dtype)
                             [:, None], k, axis=1)])
        vals = np.concatenate([vals, np.zeros((pad, k), vals.dtype)])
        deg = np.concatenate([deg, np.zeros(pad, deg.dtype)])

    valid = np.arange(k)[None, :] < deg[:, None]
    blk = np.repeat(np.arange(Pn), B)[:, None]          # (n_pad, 1)
    lo = blk * B                                        # block start
    over_l = np.maximum(lo - cols, 0)
    over_r = np.maximum(cols - (lo + B - 1), 0)
    over = np.where(valid, np.maximum(over_l, over_r), 0)
    H = _roundup(max(1, int(over.max())), WT)
    if H > max_halo_frac * B:
        # halo would exceed a neighbor block: single-hop exchange
        # can't cover it — send the overflow through the residual
        H = _roundup(int(max_halo_frac * B), WT) or WT
    H = min(H, B)

    in_halo = valid & (np.maximum(over_l, over_r) <= H)
    # residual: valid edges outside the halo (global COO)
    res = valid & ~in_halo
    rr, rs = np.nonzero(res)
    res_rows = rr.astype(np.int32)
    res_slots = rs.astype(np.int32)
    res_cols = cols[rr, rs].astype(np.int32)
    res_vals = vals[rr, rs].copy()
    ell_cols, ell_vals = cols, vals
    # zero residual edges out of the band (col rebased to a safe slot);
    # the ELL copy handed to consumers keeps them (degree/laplacian ops)
    vals = vals.copy()
    vals[rr, rs] = 0.0
    cols = cols.copy()
    cols[rr, rs] = np.asarray(lo)[rr, 0]

    Wloc = B + 2 * H                  # local feature buffer length
    plans, bands = [], []
    lcols = np.empty_like(cols)
    for p in range(Pn):
        sl = slice(p * B, (p + 1) * B)
        local = cols[sl] - (p * B - H)           # in [0, Wloc)
        local = np.clip(local, 0, Wloc - 1)
        lcols[sl] = local                        # halo-local ELL indices
        # per-shard plan keeps EVERY in-halo edge: no cost threshold, no
        # HBM cap (the budget was sized for the single-chip whole-graph
        # band; residual routing happens above, at the halo level)
        tb, ts, bf, prr, prs, _ = plan_tiles(
            local, R=R, WT=WT, deg=None, kcap=k,
            min_edges_per_tile=1, ncols=Wloc,
            hbm_budget_bytes=float("inf"))
        assert len(prr) == 0, "plan_tiles must keep all in-halo edges"
        band = materialize_band_tiles(
            jnp.asarray(local), jnp.asarray(vals[sl]),
            jnp.asarray(tb), jnp.asarray(ts), R=R, WT=WT,
            interpret=interpret,
            out_dtype=jnp.dtype(band_dtype))
        plans.append((tb, ts, bf))
        bands.append(np.asarray(band))

    Gmax = max(len(pl[0]) for pl in plans)
    tb_all = np.zeros((Pn, Gmax), np.int32)
    ts_all = np.zeros((Pn, Gmax), np.int32)
    bf_all = np.zeros((Pn, Gmax), np.int32)
    band_all = np.zeros((Pn, Gmax * R, WT), band_dtype)
    for p, ((tb, ts, bf), band) in enumerate(zip(plans, bands)):
        g = len(tb)
        tb_all[p, :g], ts_all[p, :g], bf_all[p, :g] = tb, ts, bf
        band_all[p, : g * R] = band
        # padding tiles: zero band, bf=0, and (tb, ts) REPEATING the last
        # real tile — the no-op accumulation targets the still-resident
        # final output window instead of revisiting a flushed one
        # (ADVICE r2: revisited output blocks read undefined VMEM on TPU)
        if g < Gmax:
            tb_all[p, g:] = tb[-1]
            ts_all[p, g:] = ts[-1]

    return BandPartition(
        band=band_all.reshape(Pn * Gmax * R, WT),
        tb=tb_all.reshape(-1), ts=ts_all.reshape(-1), bf=bf_all.reshape(-1),
        cols=ell_cols, vals=ell_vals, deg=deg, lcols=lcols,
        res_rows=res_rows, res_slots=res_slots, res_cols=res_cols,
        res_vals=res_vals,
        n=n, n_pad=n_pad, B=B, H=H, G=Gmax, Pn=Pn, R=R, WT=WT, nnz=nnz)


def band_tiles_spmm_xla(band, tb, ts, X, n: int, R: int, WT: int,
                        out_dtype=jnp.float32):
    """Pure-XLA tiled-band product — same semantics as the Pallas
    ``band_tiles_spmm`` (zero-band padding tiles contribute 0): batched
    (G, R, WT) x (G, WT, d) matmul + segment-sum over row blocks.  Used on
    CPU meshes, where Pallas interpret mode pays an O(n·d) output copy per
    grid step (measured 58 s/call at G=768 vs <1 s for this form)."""
    G = tb.shape[0]
    d = X.shape[1]
    Xt = X.reshape(-1, WT, d)[ts // WT]              # (G, WT, d)
    Pg = jnp.einsum("grw,gwd->grd",
                    band.reshape(G, R, WT).astype(out_dtype),
                    Xt.astype(out_dtype))
    out = jax.ops.segment_sum(Pg, tb, num_segments=n // R)
    return out.reshape(n, d).astype(out_dtype)


_MP_BIG = 1e30    # matches pallas_spmm._MINPLUS_BIG


def band_tiles_minplus_xla(band, tb, ts, d, f, n: int, R: int, WT: int,
                           hopf_lax: bool = False, recip: bool = False):
    """Pure-XLA tropical (min-plus) relaxation over the tiled band — the
    CPU-mesh analogue of ``pallas_spmm.band_tiles_minplus`` (zero band
    cells mean 'no edge'; see that kernel's docstring).  Returns
    ``(best, arg)``: per-row candidate min (``_MP_BIG`` where the band
    holds no edge) and the LOCAL column index of the argmin (-1 where
    none)."""
    G = tb.shape[0]
    A = band.reshape(G, R, WT).astype(d.dtype)
    if recip:
        A = jnp.where(A > 0, 1.0 / jnp.where(A == 0, 1.0, A), 0.0)
    dwin = d.reshape(-1, WT)[ts // WT]                       # (G, WT)
    fwin = f.reshape(-1, WT)[ts // WT].astype(d.dtype)
    if hopf_lax:
        fw = A * fwin[:, None, :]
        cand = 0.5 * (fw + jnp.sqrt(fw * fw
                                    + 4.0 * (dwin ** 2)[:, None, :]))
    else:
        cand = dwin[:, None, :] + A * fwin[:, None, :]
    cand = jnp.where(A > 0, cand, _MP_BIG)
    m_t = jnp.min(cand, axis=2)                              # (G, R)
    a_t = ts[:, None] + jnp.argmin(cand, axis=2)             # local col
    best = jax.ops.segment_min(m_t, tb, num_segments=n // R).reshape(n)
    rows = tb[:, None] * R + jax.lax.broadcasted_iota(
        jnp.int32, (G, R), 1)
    hit = m_t == best[rows]
    a_t = jnp.where(hit, a_t, jnp.int32(2 ** 30))
    arg = jax.ops.segment_min(a_t, tb, num_segments=n // R).reshape(n)
    arg = jnp.where(best >= _MP_BIG * 0.5, -1, arg)
    return best, arg


def band_tiles_lip_xla(band, tb, ts, U, n: int, R: int, WT: int):
    """Pure-XLA lip reductions over the tiled band — CPU-mesh analogue of
    ``pallas_spmm.band_tiles_lip``: per row ``[w-sum | neighbor min |
    neighbor max]`` of the U columns over in-band edges (big/-big
    identities where none)."""
    G = tb.shape[0]
    C = U.shape[1]
    big = jnp.asarray(3e38, U.dtype)
    A = band.reshape(G, R, WT).astype(U.dtype)
    Uw = U.reshape(-1, WT, C)[ts // WT]                      # (G, WT, C)
    s_t = jnp.einsum("grw,gwc->grc", A, Uw)
    has = (A > 0)[:, :, :, None]
    min_t = jnp.min(jnp.where(has, Uw[:, None, :, :], big), axis=2)
    max_t = jnp.max(jnp.where(has, Uw[:, None, :, :], -big), axis=2)
    nb = n // R
    ssum = jax.ops.segment_sum(s_t, tb, num_segments=nb).reshape(n, C)
    smin = jax.ops.segment_min(min_t, tb, num_segments=nb).reshape(n, C)
    smax = jax.ops.segment_max(max_t, tb, num_segments=nb).reshape(n, C)
    return ssum, smin, smax


def _band_local_spmm(mesh, axis, Pn, B, H, R, WT, G, mode, interpret,
                     band, tb, ts, bf, X):
    """shard_map'd partitioned band SpMM: two single-hop halo ppermutes +
    the local compact-tile stream.  Traceable inside jit/while_loop."""
    from graphlearning_tpu.ops.pallas_spmm import band_tiles_spmm

    fwd = [(i, (i + 1) % Pn) for i in range(Pn)]
    bwd = [(i, (i - 1) % Pn) for i in range(Pn)]
    out_dtype = jnp.float64 if mode == "f64" else jnp.float32

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis),
                  P(axis, None)),
        out_specs=P(axis, None),
        # pallas_call's out_shape carries no varying-mesh-axes info;
        # the kernel output is per-shard rows, so vma checking is moot
        check_vma=False)
    def local(band, tb, ts, bf, Xl):
        lh = jax.lax.ppermute(Xl[-H:], axis, fwd)   # p-1's tail -> p
        rh = jax.lax.ppermute(Xl[:H], axis, bwd)    # p+1's head -> p
        Xloc = jnp.concatenate([lh, Xl, rh], axis=0)
        if interpret:
            return band_tiles_spmm_xla(band, tb, ts, Xloc, n=B, R=R,
                                       WT=WT, out_dtype=out_dtype)
        return band_tiles_spmm(band, tb, ts, bf, Xloc, n=B, R=R, WT=WT,
                               interpret=False, mode=mode)

    return local(band, tb, ts, bf, X)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["g", "band", "tb", "ts", "bf", "res", "lcols",
                 "res_slots"],
    meta_fields=["meta"],
)
class ShardedOp:
    """Mesh-partitioned SpMM operator that quacks like a SparseGraph.

    The sharded solver programs (``parallel/execute.py`` and the jitted
    entries in ``ssl.py``) take a graph pytree and call
    ``ops.graphops.spmm`` on it; passing a ``ShardedOp`` instead routes
    every SpMM through the partitioned tiled-band Pallas kernel with
    ppermute halo exchange, while degree / diagonal / gather ops fall
    through to the row-sharded padded-ELL arrays (``self.g``).  This is
    how the banded kernel becomes the sharded models' hot path without
    duplicating any solver code.

    ``meta`` = (mesh, axis, Pn, B, H, R, WT, G, mode, interpret) —
    hashable, so jit treats each (mesh, plan-geometry) as one cache entry.
    """

    def __init__(self, g, band, tb, ts, bf, res, meta, lcols=None,
                 res_slots=None):
        self.g = g
        self.band = band
        self.tb = tb
        self.ts = ts
        self.bf = bf
        self.res = res            # (rows, cols, vals) COO or None
        self.lcols = lcols        # (n_pad, k) halo-local ELL cols
        self.res_slots = res_slots  # ELL slot of each residual edge
        self.meta = meta

    # -- SparseGraph duck-type surface ------------------------------------

    @property
    def cols(self):
        return self.g.cols

    @property
    def vals(self):
        return self.g.vals

    @property
    def deg(self):
        return self.g.deg

    @property
    def n(self):
        return self.g.n

    @property
    def k(self):
        return self.g.k

    @property
    def shape(self):
        return (self.g.n, self.g.n)

    def mask(self):
        return self.g.mask()

    # -- the banded SpMM hook (dispatched by ops.graphops.spmm) -----------

    def spmm_(self, X):
        """``W @ X`` through the partitioned band; X: (n_pad, d) row-
        sharded.  Pads d to the 128-lane multiple on the fly (free in
        time: the kernel is band-stream-bound) and casts back to X's
        dtype, so f64 solver loops on the CPU parity mesh carry f64."""
        (mesh, axis, Pn, B, H, R, WT, G, mode, interpret) = self.meta
        d = X.shape[1]
        d_pad = (-d) % 128
        in_dtype = jnp.float64 if mode == "f64" else jnp.float32
        Xp = X.astype(in_dtype)
        if d_pad:
            Xp = jnp.pad(Xp, ((0, 0), (0, d_pad)))
        out = _band_local_spmm(mesh, axis, Pn, B, H, R, WT, G, mode,
                               interpret, self.band, self.tb, self.ts,
                               self.bf, Xp)
        if self.res is not None:
            rr, rc, rv = self.res
            out = out.at[rr].add(rv[:, None] * jnp.take(Xp, rc, axis=0))
        if d_pad:
            out = out[:, :d]
        return out.astype(X.dtype)

    # -- halo-exchange gather + tropical/lip reductions -------------------
    # (round-3 verdict item 2: the sharded distance/HJ family rides the
    # band partition's single-hop halo instead of per-iteration O(n)
    # GSPMD all-gathers.)

    def _halo_map(self, fn, *arrays, out_ndim: int = 2):
        """shard_map ``fn(band, tb, ts, bf, lcols, shard_idx, *halo_ext)``
        over halo-extended per-shard slices of the row-sharded
        ``arrays`` (each (n, ...))."""
        (mesh, axis, Pn, B, H, R, WT, G, mode, interpret) = self.meta
        fwd = [(i, (i + 1) % Pn) for i in range(Pn)]
        bwd = [(i, (i - 1) % Pn) for i in range(Pn)]

        def local(band, tb, ts, bf, lcols, *arrs):
            ext = []
            for a in arrs:
                lh = jax.lax.ppermute(a[-H:], axis, fwd)
                rh = jax.lax.ppermute(a[:H], axis, bwd)
                ext.append(jnp.concatenate([lh, a, rh], axis=0))
            p = jax.lax.axis_index(axis)
            return fn(band, tb, ts, bf, lcols, p, *ext)

        nd = [a.ndim for a in arrays]
        sm = functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis, None), P(axis), P(axis), P(axis),
                      P(axis, None),
                      *[P(axis, *([None] * (x - 1))) for x in nd]),
            out_specs=P(axis, *([None] * (out_ndim - 1))),
            check_vma=False)
        return sm(local)(self.band, self.tb, self.ts, self.bf,
                         self.lcols, *arrays)

    def neighbor_take_(self, x):
        """``x[g.cols]`` computed through the halo: per-iteration comm is
        the 2H boundary rows (one ppermute pair) instead of the GSPMD
        all-gather of all n rows.  Residual (out-of-halo) slots are
        patched with a global gather (few edges by construction)."""
        x2 = x[:, None] if x.ndim == 1 else x

        def fn(band, tb, ts, bf, lcols, p, xl):
            return jnp.take(xl, lcols, axis=0)       # (B, k, C)

        out = self._halo_map(fn, x2, out_ndim=3)
        if self.res is not None and self.res_slots is not None:
            rr, rc, _ = self.res
            out = out.at[rr, self.res_slots].set(jnp.take(x2, rc, axis=0))
        return out[..., 0] if x.ndim == 1 else out

    def minplus_(self, d, f, hopf_lax: bool = False, recip: bool = False):
        """One tropical (min-plus) relaxation round over the partitioned
        band + residual: returns ``(best, arg)`` — per-row candidate min
        (BIG where no edge) and GLOBAL argmin column (-1 where none).
        The relaxation update matches ``solvers.eikonal._bellman_ford``
        (eikonal ``d_j + w f_j`` or Hopf-Lax quadratic)."""
        (mesh, axis, Pn, B, H, R, WT, G, mode, interpret) = self.meta
        from graphlearning_tpu.ops.pallas_spmm import band_tiles_minplus

        big = jnp.asarray(_MP_BIG, d.dtype)

        def fn(band, tb, ts, bf, lcols, p, dfl):
            dl, fl = dfl[:, 0], dfl[:, 1]
            if interpret:
                m, a = band_tiles_minplus_xla(
                    band, tb, ts, dl, fl, n=B, R=R, WT=WT,
                    hopf_lax=hopf_lax, recip=recip)
            else:
                out = band_tiles_minplus(
                    band, tb, ts, bf, dl.astype(jnp.float32),
                    fl.astype(jnp.float32), n=B, R=R, WT=WT,
                    hopf_lax=hopf_lax, track_arg=True, recip=recip,
                    ncols=B + 2 * H)
                m = out[:, 0].astype(dl.dtype)
                a = out[:, 1].astype(jnp.int32)
            aglob = jnp.where(m >= _MP_BIG * 0.5, -1,
                              a + (p * B - H))
            return jnp.stack([m, aglob.astype(m.dtype)], axis=1)

        ma = self._halo_map(fn, jnp.stack(
            [d.astype(jnp.result_type(d.dtype, jnp.float32)),
             f.astype(jnp.result_type(d.dtype, jnp.float32))], axis=1))
        best, arg = ma[:, 0], ma[:, 1].astype(jnp.int32)
        if self.res is not None:
            n = self.g.n
            rr, rc, rv = self.res
            rv = rv.astype(best.dtype)
            if recip:
                rv = jnp.where(rv > 0, 1.0 / jnp.where(rv == 0, 1.0, rv),
                               0.0)
            dn = jnp.take(d, rc).astype(best.dtype)
            fn_r = jnp.take(f, rc).astype(best.dtype)
            if hopf_lax:
                fw = rv * fn_r
                cand = 0.5 * (fw + jnp.sqrt(fw * fw + 4.0 * dn * dn))
            else:
                cand = dn + rv * fn_r
            cand = jnp.where(rv > 0, cand, big)
            m_r = jnp.full((n,), big, best.dtype).at[rr].min(cand)
            hit = cand == jnp.take(m_r, rr)
            a_r = jnp.full((n,), -1, jnp.int32).at[rr].max(
                jnp.where(hit, rc, -1))
            better = m_r < best
            best = jnp.where(better, m_r, best)
            arg = jnp.where(better, a_r, arg)
        return best, arg

    def lip_reduce_(self, U):
        """The three lip reductions over the partitioned band + residual:
        returns ``(wsum_u, nmin, nmax)`` each (n, C) — w-weighted neighbor
        sums and unweighted neighbor min/max of U's columns (big/-big
        identities where a row has no edges).  Matches the per-round math
        of ``solvers.plaplace._lip_iterate_mc``."""
        (mesh, axis, Pn, B, H, R, WT, G, mode, interpret) = self.meta
        from graphlearning_tpu.ops.pallas_spmm import band_tiles_lip

        C = U.shape[1]
        big = jnp.asarray(3e38, U.dtype)

        def fn(band, tb, ts, bf, lcols, p, Ul):
            if interpret:
                s, mn, mx = band_tiles_lip_xla(band, tb, ts, Ul, n=B,
                                               R=R, WT=WT)
            else:
                U128 = jnp.pad(Ul.astype(jnp.float32),
                               ((0, 0), (0, 128 - C)))
                out = band_tiles_lip(band, tb, ts, bf, U128, n=B, C=C,
                                     R=R, WT=WT, ncols=B + 2 * H)
                s = out[:, :C].astype(Ul.dtype)
                mn = out[:, 128:128 + C].astype(Ul.dtype)
                mx = out[:, 256:256 + C].astype(Ul.dtype)
            return jnp.concatenate([s, mn, mx], axis=1)

        out = self._halo_map(fn, U)
        s, mn, mx = out[:, :C], out[:, C:2 * C], out[:, 2 * C:3 * C]
        if self.res is not None:
            n = self.g.n
            rr, rc, rv = self.res
            rv = rv.astype(U.dtype)
            un = jnp.take(U, rc, axis=0)
            valid = (rv > 0)[:, None]
            s = s.at[rr].add(jnp.where(valid, rv[:, None] * un, 0.0))
            mn = mn.at[rr].min(jnp.where(valid, un, big))
            mx = mx.at[rr].max(jnp.where(valid, un, -big))
        return s, mn, mx


def make_sharded_op(W, mesh: Mesh, axis: str | None = None,
                    R: int = 512, WT: int = 512, mode: str = "bf16x3",
                    interpret: bool = False, max_halo_frac: float = 1.0,
                    ell_dtype=None) -> ShardedOp:
    """Build a :class:`ShardedOp` for ``W`` on ``mesh``: partition the
    tiled band, place band + ELL arrays row-sharded, residual replicated."""
    from graphlearning_tpu import config as _config

    axis = axis or mesh.axis_names[0]
    Pn = int(mesh.shape[axis])
    band_dtype = np.float64 if mode == "f64" else (
        np.dtype(jnp.bfloat16) if mode == "bf16" else np.float32)
    part = build_band_partition(W, Pn, R=R, WT=WT, interpret=interpret,
                                max_halo_frac=max_halo_frac,
                                band_dtype=band_dtype)
    row = NamedSharding(mesh, P(axis, None))
    flat = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    ell_dtype = ell_dtype or _config.float_dtype()
    g = SparseGraph(
        cols=jax.device_put(jnp.asarray(part.cols, _config.index_dtype),
                            row),
        vals=jax.device_put(jnp.asarray(part.vals, ell_dtype), row),
        deg=jax.device_put(jnp.asarray(part.deg, _config.index_dtype),
                           flat),
        n=part.n_pad, k=part.cols.shape[1])
    if len(part.res_rows):
        res_dtype = jnp.float64 if mode == "f64" else jnp.float32
        res = (jax.device_put(jnp.asarray(part.res_rows), rep),
               jax.device_put(jnp.asarray(part.res_cols), rep),
               jax.device_put(jnp.asarray(part.res_vals, res_dtype), rep))
        res_slots = jax.device_put(jnp.asarray(part.res_slots), rep)
    else:
        res = None
        res_slots = None
    op = ShardedOp(
        g=g,
        band=jax.device_put(jnp.asarray(part.band), row),
        tb=jax.device_put(jnp.asarray(part.tb), flat),
        ts=jax.device_put(jnp.asarray(part.ts), flat),
        bf=jax.device_put(jnp.asarray(part.bf), flat),
        res=res,
        lcols=jax.device_put(
            jnp.asarray(part.lcols, _config.index_dtype), row),
        res_slots=res_slots,
        meta=(mesh, axis, part.Pn, part.B, part.H, R, WT, part.G, mode,
              interpret))
    op.residual_frac = part.residual_frac
    op.n_orig = part.n
    return op


class ShardedBandPlan:
    """Per-device compact tiled band + halo metadata for one mesh —
    standalone benchmark/driver handle (``bench.py`` sharded mode).

    Build once per (graph, mesh); ``spmm(X)`` then runs the partitioned
    kernel.  ``interpret=True`` runs the Pallas kernels in interpreter
    mode (CPU-mesh tests)."""

    def __init__(self, W, mesh: Mesh, axis: str | None = None,
                 R: int = 512, WT: int = 512, mode: str = "bf16x3",
                 interpret: bool = False, max_halo_frac: float = 1.0):
        self.mesh = mesh
        self.axis = axis or mesh.axis_names[0]
        self.Pn = int(mesh.shape[self.axis])
        self.R, self.WT, self.mode = R, WT, mode
        self.interpret = interpret
        self.op = make_sharded_op(W, mesh, axis=self.axis, R=R, WT=WT,
                                  mode=mode, interpret=interpret,
                                  max_halo_frac=max_halo_frac)
        self.n = self.op.n_orig
        self.n_pad = self.op.n
        self.B = self.op.meta[3]
        self.H = self.op.meta[4]
        self.G = self.op.meta[7]
        self._fn = None

    @property
    def res_rows(self):
        """Rows of the out-of-halo residual COO (host view)."""
        return (np.asarray(self.op.res[0]) if self.op.res is not None
                else np.empty(0, np.int32))

    # -- execution ---------------------------------------------------------

    def put_rows(self, X):
        """Pad + place a feature matrix row-sharded over the node axis.
        Rows pad to ``n_pad``; the feature dim pads to a lane multiple
        (128) so chained ``spmm`` calls skip the per-call repad."""
        X = np.asarray(X, np.float32)
        d_pad = (-X.shape[1]) % 128
        if X.shape[0] < self.n_pad or d_pad:
            X = np.pad(X, ((0, self.n_pad - X.shape[0]), (0, d_pad)))
        return jax.device_put(
            jnp.asarray(X), NamedSharding(self.mesh, P(self.axis, None)))

    def spmm(self, X):
        """``W @ X`` over the mesh.  ``X``: (n_pad, d) sharded (or host
        array, which is padded + placed).  Returns (n_pad, d) — lane
        padding to 128 is applied and sliced back off internally by
        ``ShardedOp.spmm_`` — and chains directly into the next call."""
        if not hasattr(X, "sharding"):
            X = self.put_rows(X)
        if self._fn is None:
            meta = self.op.meta
            # g=None: spmm_ never touches the ELL arrays, and closing over
            # them would serialize MBs of constants into the remote-compile
            # payload (HTTP 413 on the TPU tunnel)
            self._fn = jax.jit(
                lambda band, tb, ts, bf, res, X: ShardedOp(
                    None, band, tb, ts, bf, res, meta).spmm_(X))
        return self._fn(self.op.band, self.op.tb, self.op.ts, self.op.bf,
                        self.op.res, X)
