"""Host-side feasibility stats for the sliding-window subgroup-band
kernel (VERDICT r3 item 6): on the 2-D RCM bench graph, what are
- per-16-row subgroup window spans (band bytes/edge at 128-quantized
  widths),
- block window widths (X ring cap WCAP),
- block-to-block window drift (ring delta, 512-quantized),
- residual fraction at a given WSUB cap?
"""
import os
import sys

import numpy as np
import scipy.sparse as sp
from scipy.spatial import cKDTree
from scipy.sparse.csgraph import reverse_cuthill_mckee

n = int(os.environ.get("N", 1 << 18))
k = 16
rs = np.random.RandomState(0)
pts = rs.rand(n, 2)
tree = cKDTree(pts)
dist, ind = tree.query(pts, k=k + 1)
dist, ind = dist[:, 1:], ind[:, 1:]
eps = np.maximum(dist[:, -1:] ** 2, 1e-12)
w = np.exp(-4 * dist**2 / eps)
rows = np.repeat(np.arange(n, dtype=np.int64), k)
W = sp.csr_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n))
W = (W + W.T) / 2
perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
W = W[perm][:, perm].tocsr()
nnz = W.nnz
print(f"n={n} nnz={nnz}")

R, SUB = 256, 16
QW, QS, QB = 128, 8, 512

for WSUB_CAP in (1024, 2048, 4096):
    deg = np.diff(W.indptr)
    band_cells = 0
    resid = 0
    bws = np.zeros(n // R, np.int64)
    spans = []
    sub_lo = np.zeros(n // SUB, np.int64)
    sub_w = np.zeros(n // SUB, np.int64)
    for j in range(n // SUB):
        a, b = W.indptr[j * SUB], W.indptr[(j + 1) * SUB]
        cols = W.indices[a:b]
        if len(cols) == 0:
            sub_lo[j] = j * SUB
            sub_w[j] = QW
            band_cells += SUB * QW
            continue
        med = np.median(cols)
        lo0 = med - WSUB_CAP // 2
        lo = int(max(0, min(cols.min(), max(lo0, 0))))
        lo = (lo // QS) * QS
        wspan = int(cols.max()) + 1 - lo
        if wspan > WSUB_CAP:
            # keep the densest WSUB window around the median; spill rest
            lo = int(max(0, med - WSUB_CAP // 2)) // QS * QS
            wspan = WSUB_CAP
            resid += int(np.sum((cols < lo) | (cols >= lo + wspan)))
        wq = -(-wspan // QW) * QW
        sub_lo[j] = lo
        sub_w[j] = wq
        band_cells += SUB * wq
        spans.append(wq)
    # block windows
    WCAPn = 0
    deltas = []
    prev = 0
    for i in range(n // R):
        js = slice(i * R // SUB, (i + 1) * R // SUB)
        lo = int(sub_lo[js].min()) // QB * QB
        lo = max(prev, lo)  # monotone ring
        hi = int((sub_lo[js] + sub_w[js]).max())
        WCAPn = max(WCAPn, hi - lo)
        deltas.append(lo - prev)
        prev = lo
        bws[i] = lo
    spans = np.asarray(spans)
    deltas = np.asarray(deltas)
    bpe = band_cells * 2 / nnz
    xbytes = (n + WCAPn) * 128 * 4 * 2      # double-write ring
    traffic = band_cells * 2 + xbytes + n * 128 * 4
    print(f"WSUB_CAP={WSUB_CAP}: band {band_cells*2/1e6:.0f} MB "
          f"({bpe:.0f} B/edge) resid {resid/nnz*100:.3f}% "
          f"WCAP={WCAPn} sub_w p50={np.percentile(spans,50):.0f} "
          f"p99={np.percentile(spans,99):.0f} "
          f"delta p99={np.percentile(deltas,99):.0f} max={deltas.max()} "
          f"traffic/spmm={traffic/1e9:.2f} GB "
          f"-> {nnz/ (traffic/606e9 + (n//R)*6*0.144e-6)/1e9:.2f} G e/s model")


# --- ordering comparison: RCM vs Morton (z-order) per-subgroup spans ----
def morton_order(pts):
    q = np.clip((pts * (1 << 16)).astype(np.int64), 0, (1 << 16) - 1)
    x, y = q[:, 0], q[:, 1]

    def spread(v):
        v = (v | (v << 16)) & 0x0000FFFF0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v << 2)) & 0x3333333333333333
        v = (v | (v << 1)) & 0x5555555555555555
        return v

    return np.argsort(spread(x) | (spread(y) << 1))


def hilbert_order(pts, bits=16):
    # Skilling's algorithm, vectorized for 2-D
    q = np.clip((pts * (1 << bits)).astype(np.int64), 0, (1 << bits) - 1)
    x, y = q[:, 0].copy(), q[:, 1].copy()
    rx = np.zeros_like(x); ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_n = np.where(swap, y_f, x_f)
        y_n = np.where(swap, x_f, y_f)
        x, y = x_n, y_n
        s //= 2
    return np.argsort(d)


Worig = sp.csr_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n))
Worig = (Worig + Worig.T) / 2

for name, order in (("morton", morton_order(pts)),
                    ("hilbert", hilbert_order(pts))):
    Wo = Worig[order][:, order].tocsr()
    for cap in (512, 1024, 2048):
        cells = 0; resid = 0; spans = []
        for j in range(n // SUB):
            a, b = Wo.indptr[j * SUB], Wo.indptr[(j + 1) * SUB]
            cols = Wo.indices[a:b]
            if len(cols) == 0:
                cells += SUB * QW; continue
            med = np.median(cols)
            lo = int(max(0, min(cols.min(), med - cap // 2))) // QS * QS
            span = int(cols.max()) + 1 - lo
            if span > cap:
                lo = int(max(0, med - cap // 2)) // QS * QS
                span = cap
                resid += int(np.sum((cols < lo) | (cols >= lo + span)))
            wq = -(-span // QW) * QW
            cells += SUB * wq; spans.append(wq)
        spans = np.asarray(spans)
        print(f"{name} cap={cap}: {cells*2/1e6:.0f} MB "
              f"({cells*2/Wo.nnz:.0f} B/edge) resid {resid/Wo.nnz*100:.2f}% "
              f"span p50={np.percentile(spans,50):.0f} "
              f"p90={np.percentile(spans,90):.0f}")


# --- SUB sweep on hilbert (MXU util vs span trade) ----------------------
ordH = hilbert_order(pts)
WoH = Worig[ordH][:, ordH].tocsr()
nnzH = WoH.nnz
for SUBv in (16, 32, 64, 128):
    for cap in (1024, 1536, 2048):
        cells = 0; resid = 0; spans = []
        for j in range(n // SUBv):
            a, b = WoH.indptr[j * SUBv], WoH.indptr[(j + 1) * SUBv]
            cols = WoH.indices[a:b]
            if len(cols) == 0:
                cells += SUBv * QW; continue
            med = np.median(cols)
            lo = int(max(0, min(cols.min(), med - cap // 2))) // QS * QS
            span = int(cols.max()) + 1 - lo
            if span > cap:
                lo = int(max(0, med - cap // 2)) // QS * QS
                span = cap
                resid += int(np.sum((cols < lo) | (cols >= lo + span)))
            wq = -(-span // QW) * QW
            cells += SUBv * wq; spans.append(wq)
        bpe = cells * 2 / nnzH
        util = min(1.0, SUBv / 128)
        mxu_ms = cells * 128 * 2 / (197e12 * util) * 1e3
        band_ms = cells * 2 / 606e9 * 1e3
        rg_ms = resid * 1.3 * 6e-9 * 1e3
        x_ms = (n * 128 * 4 * 2) / 606e9 * 1e3
        out_ms = n * 128 * 4 / 606e9 * 1e3
        dma_ms = (n // 256) * 6 * 0.144e-3
        tot = max(mxu_ms, band_ms + x_ms + out_ms) + rg_ms + dma_ms
        print(f"SUB={SUBv} cap={cap}: {bpe:.0f} B/edge resid "
              f"{resid/nnzH*100:.2f}% mxu {mxu_ms:.2f}ms band {band_ms:.2f}"
              f" resid {rg_ms:.2f} -> ~{tot:.2f}ms = "
              f"{nnzH/tot*1e3/1e9:.2f} G e/s")
