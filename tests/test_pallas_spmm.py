"""Parity tests for the banded Pallas SpMM kernel (interpret mode on CPU).

The kernel computes ``out[i] = sum_j vals[i,j] * X[cols[i,j]]`` for edges
inside each row-block's window; ``spmm_banded_hybrid`` adds the residual.
Compared against scipy CSR @ X (the reference utils.py:523 semantics).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from conftest import random_knn_csr
from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.ops.pallas_spmm import (
    banded_spmm, plan_banded, spmm_banded_hybrid)
from graphlearning_tpu.parallel.shard import pad_graph_to


def _banded_graph(n, k, bandwidth, seed=0):
    """kNN-like graph whose columns stay within ``bandwidth`` of the row
    (mimics an RCM-reordered kNN graph)."""
    rs = np.random.RandomState(seed)
    rows = np.repeat(np.arange(n), k)
    off = rs.randint(-bandwidth, bandwidth + 1, size=n * k)
    cols = np.clip(rows + off, 0, n - 1)
    vals = rs.rand(n * k) + 0.1
    W = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    W.setdiag(0)
    W.eliminate_zeros()
    return W


@pytest.mark.parametrize("bandwidth", [100, 2000])
def test_banded_hybrid_matches_scipy(bandwidth):
    n, k, d = 1024, 8, 128
    W = _banded_graph(n, k, bandwidth)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 512)
    rs = np.random.RandomState(1)
    X = rs.randn(n, d).astype(np.float32)

    winstart, rrows, rslots, Wwin, kcap = plan_banded(
        np.asarray(g.cols), R=512)
    plan = (winstart, jnp.asarray(rrows), jnp.asarray(rslots), Wwin, kcap)
    out = spmm_banded_hybrid(
        g, jnp.asarray(X), plan, R=512, interpret=True)
    ref = W @ X.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out)[: n], ref, rtol=2e-4, atol=2e-4)


def test_plan_auto_window_covers_band():
    n, k = 2048, 8
    W = _banded_graph(n, k, 300, seed=3)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 512)
    winstart, rrows, rslots, Wwin, kcap = plan_banded(
        np.asarray(g.cols), R=512)
    # auto window must cover a 300-wide band with (near-)zero residual
    assert Wwin >= 1024
    assert len(rrows) / (g.n * g.k) <= 0.002
    assert np.all(winstart >= 0) and np.all(winstart + Wwin <= g.n)


def test_random_graph_residual_fallback():
    """A non-banded random graph: most edges land in the residual path —
    hybrid must still match scipy exactly."""
    n, k, d = 1024, 8, 128
    W = random_knn_csr(n, k, seed=5, symmetrize=False)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 512)
    rs = np.random.RandomState(2)
    X = rs.randn(n, d).astype(np.float32)
    winstart, rrows, rslots, Wwin, kcap = plan_banded(
        np.asarray(g.cols), R=512, W=1024)
    plan = (winstart, jnp.asarray(rrows), jnp.asarray(rslots), Wwin, kcap)
    out = spmm_banded_hybrid(g, jnp.asarray(X), plan, R=512, interpret=True)
    ref = W @ X.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out)[: n], ref, rtol=2e-4, atol=2e-4)


def test_kcap_degree_skew_to_residual():
    """Degree-capped planning: overflow slots route to the residual and the
    hybrid still matches scipy (SURVEY.md §7.3 'row-bucketing or ELL+COO
    hybrid')."""
    n, k, d = 1024, 6, 128
    W = _banded_graph(n, k, 150, seed=7)
    # inject degree skew: a few hub rows with many extra edges
    import scipy.sparse as sp
    rs = np.random.RandomState(8)
    hubs = rs.choice(n, 10, replace=False)
    extra_r = np.repeat(hubs, 40)
    extra_c = rs.randint(0, n, len(extra_r))
    E = sp.coo_matrix((rs.rand(len(extra_r)), (extra_r, extra_c)),
                      shape=(n, n))
    W = (W + E).tocsr()
    W.setdiag(0)
    W.eliminate_zeros()
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 512)
    winstart, rrows, rslots, Wwin, kcap = plan_banded(
        np.asarray(g.cols), R=512, max_residual=0.05, deg=np.asarray(g.deg))
    assert kcap < g.k  # the hub tail must have been capped
    plan = (winstart, jnp.asarray(rrows), jnp.asarray(rslots), Wwin, kcap)
    X = np.random.RandomState(9).randn(n, d).astype(np.float32)
    out = spmm_banded_hybrid(g, jnp.asarray(X), plan, R=512, interpret=True)
    ref = W @ X.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=2e-4, atol=2e-4)


def test_bf16x3_mode_accuracy():
    """Manual 3-pass bf16 split: ~1e-5 relative error vs exact."""
    n, k, d = 1024, 8, 128
    W = _banded_graph(n, k, 100, seed=11)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 512)
    X = np.random.RandomState(12).randn(n, d).astype(np.float32)
    winstart, rrows, rslots, Wwin, kcap = plan_banded(
        np.asarray(g.cols), R=512)
    plan = (winstart, jnp.asarray(rrows), jnp.asarray(rslots), Wwin, kcap)
    out = spmm_banded_hybrid(g, jnp.asarray(X), plan, R=512, interpret=True,
                             mode="bf16x3")
    ref = W @ X.astype(np.float64)
    err = np.abs(np.asarray(out)[:n] - ref).max() / np.abs(ref).max()
    assert err < 5e-5, err


# -- materialized-band path ------------------------------------------------


@pytest.mark.parametrize("store,mode,tol", [
    ("f32", "f32", 2e-6),
    ("f32", "bf16x3", 2e-4),
    ("bf16", "bf16", 2e-2),
])
def test_band_stream_matches_scipy(store, mode, tol):
    from graphlearning_tpu.ops.pallas_spmm import (
        materialize_band, spmm_band_hybrid)

    n, k, d = 1024, 8, 128
    W = _banded_graph(n, k, 400, seed=5)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 512)
    rs = np.random.RandomState(2)
    X = rs.randn(g.n, d).astype(np.float32)

    winstart, rrows, rslots, Wwin, kcap = plan_banded(
        np.asarray(g.cols), R=512, kcap=g.cols.shape[1])
    band = materialize_band(
        g.cols, g.vals, jnp.asarray(winstart), Wwin, R=512,
        interpret=True,
        out_dtype=jnp.bfloat16 if store == "bf16" else jnp.float32)
    plan = (jnp.asarray(winstart), jnp.asarray(rrows),
            jnp.asarray(rslots), Wwin, kcap)
    out = spmm_band_hybrid(band, g, jnp.asarray(X), plan, R=512,
                           interpret=True, mode=mode)
    ref = W @ np.asarray(X[:n]).astype(np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out)[:n] / scale, ref / scale,
                               atol=tol)


def test_band_equals_onthefly_kernel():
    """The materialized band must reproduce exactly what the on-the-fly
    A-build kernel computes (same windows, same in-window edge set)."""
    from graphlearning_tpu.ops.pallas_spmm import (
        materialize_band, spmm_band_hybrid)

    n, k, d = 1024, 6, 128
    W = _banded_graph(n, k, 900, seed=7)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 512)
    rs = np.random.RandomState(3)
    X = rs.randn(g.n, d).astype(np.float32)

    winstart, rrows, rslots, Wwin, kcap = plan_banded(
        np.asarray(g.cols), R=512, kcap=g.cols.shape[1])
    plan = (jnp.asarray(winstart), jnp.asarray(rrows),
            jnp.asarray(rslots), Wwin, kcap)
    band = materialize_band(g.cols, g.vals, jnp.asarray(winstart), Wwin,
                            R=512, interpret=True)
    out_band = spmm_band_hybrid(band, g, jnp.asarray(X), plan, R=512,
                                interpret=True, mode="f32")
    out_fly = spmm_banded_hybrid(g, jnp.asarray(X), plan, W=Wwin, R=512,
                                 interpret=True, mode="f32")
    np.testing.assert_allclose(np.asarray(out_band), np.asarray(out_fly),
                               rtol=1e-5, atol=1e-5)


# -- compact tiled band (occupancy-aware) -----------------------------------


def _tiles_setup(W, R=512, WT=512, seed=1, min_edges=None):
    from graphlearning_tpu.ops.pallas_spmm import (
        plan_tiles, materialize_band_tiles, build_residual_ell)

    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32),
                     max(R, WT))
    cols_np = np.asarray(g.cols)
    vals_np = np.asarray(g.vals).astype(np.float32)
    deg_np = np.asarray(g.deg)
    tb, ts, bf, rrows, rslots, kcap = plan_tiles(
        cols_np, R=R, WT=WT, deg=deg_np, min_edges_per_tile=min_edges)
    band = materialize_band_tiles(
        g.cols[:, :kcap], g.vals[:, :kcap], jnp.asarray(tb),
        jnp.asarray(ts), R=R, WT=WT, interpret=True)
    resid = build_residual_ell(rrows, rslots, cols_np, vals_np, g.n)
    tiles = (jnp.asarray(tb), jnp.asarray(ts), jnp.asarray(bf))
    return g, band, tiles, resid, (tb, ts, bf, rrows, rslots, kcap)


@pytest.mark.parametrize("bandwidth,min_edges", [(100, None), (2000, 40)])
def test_tiled_band_matches_scipy(bandwidth, min_edges):
    from graphlearning_tpu.ops.pallas_spmm import spmm_tiles_hybrid

    n, k, d = 1024, 8, 128
    W = _banded_graph(n, k, bandwidth)
    g, band, tiles, resid, plan = _tiles_setup(W, min_edges=min_edges)
    rs = np.random.RandomState(1)
    X = rs.randn(g.n, d).astype(np.float32)
    out = spmm_tiles_hybrid(band, tiles, g, jnp.asarray(X), R=512, WT=512,
                            interpret=True, resid=resid)
    ref = W @ X[:n].astype(np.float64)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=2e-4,
                               atol=2e-4)


def test_tiled_band_occupancy_smaller_than_window():
    """The point of the tiled band: fewer stored bytes than the rectangular
    window on a banded graph."""
    from graphlearning_tpu.ops.pallas_spmm import plan_tiles

    n, k = 8192, 8
    W = _banded_graph(n, k, 600, seed=2)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 512)
    cols_np = np.asarray(g.cols)
    deg_np = np.asarray(g.deg)
    winstart, _, _, Wwin, _ = plan_banded(cols_np, R=512, deg=deg_np)
    tb, ts, bf, rr, rsl, kcap = plan_tiles(cols_np, R=512, WT=512,
                                           deg=deg_np)
    rect_cells = g.n * Wwin
    tile_cells = len(tb) * 512 * 512
    assert tile_cells < rect_cells, (tile_cells, rect_cells)
    # residual stays small on a banded graph
    assert len(rr) / (g.n * g.k) < 0.05


def test_tiled_minplus_matches_gather():
    from graphlearning_tpu.ops.pallas_spmm import (band_tiles_minplus,
                                                   residual_minplus,
                                                   _MINPLUS_BIG)

    n, k = 1024, 8
    W = _banded_graph(n, k, 150, seed=4)
    g, band, tiles, resid, plan = _tiles_setup(W)
    rs = np.random.RandomState(0)
    d0 = np.full(g.n, 1e30, np.float32)
    d0[:n] = rs.rand(n).astype(np.float32) * 10
    f = np.ones(g.n, np.float32)
    out = band_tiles_minplus(band, *tiles, jnp.asarray(d0), jnp.asarray(f),
                             g.n, R=512, WT=512, interpret=True)
    bmin = np.asarray(out[:, 0])
    if resid is not None:
        rmin, _ = residual_minplus(jnp.asarray(d0), jnp.asarray(f), resid)
        bmin = np.minimum(bmin, np.asarray(rmin))
    # reference: one min-plus relaxation over all edges
    Wc = W.tocoo()
    ref = np.full(n, 1e30)
    np.minimum.at(ref, Wc.row, d0[Wc.col] + Wc.data * f[Wc.col])
    ok = ref < 1e29
    np.testing.assert_allclose(bmin[:n][ok], ref[ok], rtol=1e-5)


def test_packed_tiles_spmm_matches_scipy():
    """Packed compact tiles (S same-block tiles per grid step) match the
    unpacked tiled SpMM and scipy, including pad slabs (zero band,
    repeated window)."""
    import jax.numpy as jnp
    from conftest import random_knn_csr
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.parallel.shard import pad_graph_to
    from graphlearning_tpu.ops.pallas_spmm import (
        band_tiles_spmm_packed, materialize_band_tiles, pack_band,
        pack_tiles, plan_tiles)

    rs = np.random.RandomState(3)
    W = random_knn_csr(1024, 8, seed=3)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 128)
    R, WT, S = 64, 128, 4
    tb, ts, bf, rr, rslot, kcap = plan_tiles(
        np.asarray(g.cols), R=R, WT=WT, deg=np.asarray(g.deg), kcap=g.k,
        min_edges_per_tile=1, hbm_budget_bytes=float("inf"))
    assert len(rr) == 0
    band = materialize_band_tiles(
        g.cols, g.vals, jnp.asarray(tb), jnp.asarray(ts), R=R, WT=WT,
        interpret=True, out_dtype=jnp.float32)
    sb, sts, sbf, src = pack_tiles(tb, ts, bf, S)
    packed = pack_band(band, src, R=R, WT=WT)
    X = rs.randn(g.n, 128).astype(np.float32)
    out = np.asarray(band_tiles_spmm_packed(
        packed, jnp.asarray(sb), jnp.asarray(sts), jnp.asarray(sbf),
        jnp.asarray(X), n=g.n, R=R, WT=WT, S=S, interpret=True,
        mode="f32"))
    ref = W @ X[: W.shape[0]]
    np.testing.assert_allclose(out[: W.shape[0]], ref, rtol=1e-4,
                               atol=1e-4 * np.abs(ref).max())


def test_packed_tiles_spmm_i8_exact_grade():
    """bf16-hi + int8-lo packed band (3 B/cell) reaches exact-CG-grade
    (~1e-5) accuracy vs scipy f64 — far past plain-bf16's ~4e-3."""
    import jax.numpy as jnp
    from conftest import random_knn_csr
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.parallel.shard import pad_graph_to
    from graphlearning_tpu.ops.pallas_spmm import (
        band_tiles_spmm_packed, band_tiles_spmm_packed_i8,
        materialize_band_tiles, pack_band, pack_tiles, plan_tiles,
        quantize_band_i8)

    rs = np.random.RandomState(7)
    W = random_knn_csr(1024, 8, seed=7)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 128)
    R, WT, S = 64, 128, 4
    tb, ts, bf, rr, rslot, kcap = plan_tiles(
        np.asarray(g.cols), R=R, WT=WT, deg=np.asarray(g.deg), kcap=g.k,
        min_edges_per_tile=1, hbm_budget_bytes=float("inf"))
    assert len(rr) == 0
    band = materialize_band_tiles(
        g.cols, g.vals, jnp.asarray(tb), jnp.asarray(ts), R=R, WT=WT,
        interpret=True, out_dtype=jnp.float32)
    sb, sts, sbf, src = pack_tiles(tb, ts, bf, S)
    packed = pack_band(band, src, R=R, WT=WT)
    hi, q = quantize_band_i8(packed)
    assert hi.dtype == jnp.bfloat16 and q.dtype == jnp.int8
    # host dequantization: hi + q*ulp(hi)*2^-8 reproduces the f32 band
    # to ~ulp(hi)*2^-9 per cell
    hin = np.asarray(hi, np.float32)
    u = (np.abs(hin).view(np.int32) & 0x7F800000).view(np.float32)
    rec = hin.astype(np.float64) + np.asarray(q, np.float64) * u * 2.0**-15
    pk = np.asarray(packed, np.float64)
    bad = np.abs(rec - pk) > np.maximum(u * 2.0**-15, 1e-30)
    assert not bad.any()
    X = rs.randn(g.n, 128).astype(np.float32)
    out = np.asarray(band_tiles_spmm_packed_i8(
        hi, q, jnp.asarray(sb), jnp.asarray(sts), jnp.asarray(sbf),
        jnp.asarray(X), n=g.n, R=R, WT=WT, S=S, interpret=True))
    ref64 = W.astype(np.float64) @ X[: W.shape[0]].astype(np.float64)
    rel = np.abs(out[: W.shape[0]] - ref64).max() / np.abs(ref64).max()
    assert rel < 1e-4, rel
    # and strictly better than the plain bf16 single-pass mode
    out_bf16 = np.asarray(band_tiles_spmm_packed(
        packed.astype(jnp.bfloat16), jnp.asarray(sb), jnp.asarray(sts),
        jnp.asarray(sbf), jnp.asarray(X).astype(jnp.bfloat16), n=g.n,
        R=R, WT=WT, S=S, interpret=True, mode="bf16"))
    rel_bf16 = (np.abs(out_bf16[: W.shape[0]] - ref64).max()
                / np.abs(ref64).max())
    assert rel < rel_bf16 / 10, (rel, rel_bf16)


def test_packed_tiles_spmm_rowq_modes():
    """Row-quantized single-stream int8 band: planes=2 reaches
    exact-CG grade; planes=1 reaches bf16-grade; both rescale by the
    per-row power-of-two exactly."""
    import functools
    import jax
    import jax.numpy as jnp
    from conftest import random_knn_csr
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.parallel.shard import pad_graph_to
    from graphlearning_tpu.ops.pallas_spmm import (
        band_tiles_spmm_packed_rowq, materialize_band_tiles, pack_band,
        pack_tiles, plan_tiles, quantize_band_rowq)

    rs = np.random.RandomState(11)
    W = random_knn_csr(1024, 8, seed=11)
    g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32), 128)
    R, WT, S = 64, 128, 4
    tb, ts, bf, rr, rslot, kcap = plan_tiles(
        np.asarray(g.cols), R=R, WT=WT, deg=np.asarray(g.deg), kcap=g.k,
        min_edges_per_tile=1, hbm_budget_bytes=float("inf"))
    assert len(rr) == 0
    band = materialize_band_tiles(
        g.cols, g.vals, jnp.asarray(tb), jnp.asarray(ts), R=R, WT=WT,
        interpret=True, out_dtype=jnp.float32)
    sb, sts, sbf, src = pack_tiles(tb, ts, bf, S)
    packed = pack_band(band, src, R=R, WT=WT)
    G = len(sb)
    row_of = jnp.asarray(np.repeat(sb.astype(np.int64) * R, R)
                         + np.tile(np.arange(R), G))
    X = rs.randn(g.n, 128).astype(np.float32)
    ref64 = W.astype(np.float64) @ X[: W.shape[0]].astype(np.float64)
    rels = {}
    for planes in (2, 1):
        qband, srow = jax.jit(functools.partial(
            quantize_band_rowq, n=g.n, planes=planes))(packed, row_of)
        assert qband.dtype == jnp.int8
        # scales are powers of two (exact rescale)
        sn = np.asarray(srow, np.float64)
        np.testing.assert_array_equal(sn, np.exp2(np.round(np.log2(sn))))
        Xk = jnp.asarray(X).astype(jnp.bfloat16) if planes == 1 \
            else jnp.asarray(X)
        out = np.asarray(band_tiles_spmm_packed_rowq(
            qband, srow, jnp.asarray(sb), jnp.asarray(sts),
            jnp.asarray(sbf), Xk, n=g.n, R=R, WT=WT, S=S, planes=planes,
            interpret=True))
        rels[planes] = (np.abs(out[: W.shape[0]] - ref64).max()
                        / np.abs(ref64).max())
    assert rels[2] < 1e-4, rels
    assert rels[1] < 2e-2, rels
    assert rels[2] < rels[1] / 20, rels


def test_quantize_band_rowq_edge_cases():
    """Row quantizer: mixed-sign values, all-zero rows, and a 1e6
    dynamic range inside one row all reconstruct within the per-row
    quantum; scales stay positive powers of two."""
    import functools
    import jax
    import jax.numpy as jnp
    from graphlearning_tpu.ops.pallas_spmm import quantize_band_rowq

    R, SW, G = 8, 256, 2
    rs = np.random.RandomState(0)
    band = rs.randn(G * R, SW).astype(np.float32)
    band[3, :] = 0.0                            # all-zero row
    band[5, 0] = 1e3                            # huge dynamic range
    band[5, 1] = 1e-3
    band[7, :8] = -7.25                         # negative values
    row_of = jnp.asarray(np.arange(G * R) % (G * R))
    n = G * R
    for planes in (1, 2):
        q, s = jax.jit(functools.partial(
            quantize_band_rowq, n=n, planes=planes))(
                jnp.asarray(band), row_of)
        sn = np.asarray(s, np.float64)
        assert (sn > 0).all()
        np.testing.assert_array_equal(sn, np.exp2(np.round(np.log2(sn))))
        qn = np.asarray(q, np.float64)
        if planes == 2:
            rec = (qn[:, :SW] + qn[:, SW:] / 254.0) * sn[:, None]
            quantum = sn / 254.0
        else:
            rec = qn * sn[:, None]
            quantum = sn
        err = np.abs(rec - band)
        assert (err <= quantum[:, None] + 1e-12).all(), err.max()
        assert (qn[3] == 0).all()               # zero row stays zero
