"""SCALING.md regeneration with variance (VERDICT r3 item 7) + the
banded min-plus (distance-solver) scaling row (item 2).

Runs bench.py sharded mode as subprocesses (3 repeats per kernel) on the
virtual 8-device CPU mesh and measures the banded tropical relaxation's
retained throughput; prints a markdown table with min/median/max.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPS = int(os.environ.get("REPS", 3))

rows = {}
for kernel in ("banded", "gspmd"):
    vals = []
    tables = []
    for r in range(REPS):
        env = dict(os.environ, GLT_BENCH_MODE="sharded",
                   GLT_BENCH_SHARDED_KERNEL=kernel,
                   PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, env=env,
                             timeout=1800)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        vals.append(res["value"])
        tables.append(res["config"]["edges_per_sec"])
        print(f"{kernel} rep {r}: retained {res['value']}%", flush=True)
    rows[kernel] = (vals, tables)

# banded min-plus retained throughput (Bellman-Ford relaxation rounds
# through ShardedOp.minplus_ at P=1 vs P=8 on the same graph)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp
import scipy.sparse as sp
from scipy.spatial import cKDTree
from scipy.sparse.csgraph import reverse_cuthill_mckee
from jax.sharding import Mesh

sys.path.insert(0, REPO)
from graphlearning_tpu.parallel.band_shard import make_sharded_op

n, k = 1 << 16, 10
rs = np.random.RandomState(0)
pts = rs.rand(n, 2)
tree = cKDTree(pts)
dist, ind = tree.query(pts, k=k + 1)
dist, ind = dist[:, 1:], ind[:, 1:]
w = np.exp(-4 * dist**2 / np.maximum(dist[:, -1:] ** 2, 1e-12))
rowsI = np.repeat(np.arange(n, dtype=np.int64), k)
W = sp.csr_matrix((w.ravel(), (rowsI, ind.ravel())), shape=(n, n))
W = (W + W.T) / 2
perm = np.asarray(reverse_cuthill_mckee(W.tocsr(), symmetric_mode=True))
W = W[perm][:, perm].tocsr()
nnz = W.nnz

devices = jax.devices()
mp_rates = {}
for P in (1, 8):
    mesh = Mesh(np.asarray(devices[:P]).reshape(P, 1), ("nodes", "batch"))
    op = make_sharded_op(W, mesh, axis="nodes", R=64, WT=64, mode="f32",
                         interpret=True)
    import jax as _j

    @_j.jit
    def round_(d, f):
        m, a = op.minplus_(d, f)
        return jnp.minimum(d, m)

    d0 = jnp.full((op.n,), 1e30, jnp.float32).at[:16].set(0.0)
    f0 = jnp.ones((op.n,), jnp.float32)
    d = round_(d0, f0)
    d.block_until_ready()
    reps = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        d = d0
        for _ in range(10):
            d = round_(d, f0)
        d.block_until_ready()
        reps.append(nnz * 10 / (time.perf_counter() - t0))
    mp_rates[P] = reps
    print(f"minplus P={P}: {[f'{v/1e6:.2f}M' for v in reps]}", flush=True)

retained_mp = [min(b / a for a in mp_rates[1]) for b in mp_rates[8]]
print("\n## table (paste into SCALING.md)\n")
for kernel, (vals, tables) in rows.items():
    v = np.asarray(vals)
    t0 = tables[0]
    print(f"| {kernel} | " + " | ".join(
        f"{t0[str(p)]/1e6:.2f}M" for p in (1, 2, 4, 8))
        + f" | {np.min(v):.1f} / {np.median(v):.1f} / {np.max(v):.1f} |")
mp = np.asarray([b / np.median(mp_rates[1]) * 100 for b in mp_rates[8]])
print(f"| banded min-plus (BF round) | {np.median(mp_rates[1])/1e6:.2f}M |"
      f" — | — | {np.median(mp_rates[8])/1e6:.2f}M |"
      f" {np.min(mp):.1f} / {np.median(mp):.1f} / {np.max(mp):.1f} |")
