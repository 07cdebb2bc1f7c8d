"""Pallas in-VMEM dynamic-gather probe (band-hostile format exploration).

The band-hostile SpMM (ops/gather.py) runs at the XLA HBM row-gather rate
(~4.5 ns/row for a <100 MB table, measured in scripts/gather_probe2.py).
The one mechanism not yet measured is a Pallas kernel that holds a CHUNK
of the gather table resident in VMEM (~16 MB/core) and gathers rows with
dynamic indices on-chip — if mosaic can gather from VMEM materially
faster than 4.5 ns/row, a two-level (VMEM chunk + HBM residual) kernel
would lift the 2.29e8 e/s band-hostile headline.

This probe measures that primitive in isolation:

  * table: (T, d) bf16, VMEM-resident (T*d*2 bytes <= ~8 MB)
  * indices: (G,) int32 uniform over [0, T)
  * out: (G, d) gathered rows

Variants:
  1. pallas_take    — jnp.take(table, idx, axis=0) inside the kernel
                      (mosaic vectorized-gather lowering, if any)
  2. pallas_loop    — fori_loop of per-row dynamic-slice copies
                      (the "obvious" DMA-free formulation)
  3. xla_take       — jnp.take on the same shapes (the current kernel's
                      mechanism; table in HBM) — the bar to beat

Usage: python scripts/pallas_gather_probe.py  (real TPU; interpret=False)
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a VALUE fetch (tunnel: block_until_ready can be elided)
    float(jnp.sum(out[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def make_pallas_take(T, G, d, BG):
    """Gather via jnp.take inside the kernel; table fully VMEM-resident,
    grid over index blocks."""

    def kernel(idx_ref, table_ref, out_ref):
        idx = idx_ref[:]                     # (BG,) int32, VMEM
        out_ref[:] = jnp.take(table_ref[:], idx, axis=0)

    grid = (G // BG,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BG,), lambda i: (i,)),
            pl.BlockSpec((T, d), lambda i: (0, 0)),   # whole table, reused
        ],
        out_specs=pl.BlockSpec((BG, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, d), jnp.bfloat16),
    )


def make_pallas_loop(T, G, d, BG):
    """Per-row dynamic-slice copy loop."""

    def kernel(idx_ref, table_ref, out_ref):
        # idx is UNBLOCKED (full (G,) in SMEM) while out is blocked per
        # grid step — offset by the grid position so each block reads
        # its own indices
        base = pl.program_id(0) * BG

        def body(i, _):
            j = idx_ref[base + i]
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(j, 1), :]
            return 0

        jax.lax.fori_loop(0, BG, body, 0)

    grid = (G // BG,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # full idx in SMEM
            pl.BlockSpec((T, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BG, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, d), jnp.bfloat16),
    )


def make_pallas_taa(T, G, d, BG):
    """Gather via take_along_axis with (BG, d) broadcast indices — the
    per-element-gather formulation mosaic's dynamic_gather targets."""

    def kernel(idx_ref, table_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (BG, d))
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx2, axis=0)

    grid = (G // BG,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BG,), lambda i: (i,)),
            pl.BlockSpec((T, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BG, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, d), jnp.bfloat16),
    )


def make_onehot_mxu(T, d, BG):
    """Gather as one-hot matmul on the MXU: out = onehot(idx) @ table.
    BG*T*d MACs per BG rows — compute-bound at ~T/(2*peak) s/row; only
    plausible for small tables."""

    def fn(table, idx):
        def blk(carry, ib):
            oh = (ib[:, None] == jnp.arange(T)[None, :]).astype(
                jnp.bfloat16)
            return carry, jnp.dot(oh, table,
                                  preferred_element_type=jnp.bfloat16)

        _, out = jax.lax.scan(blk, 0, idx.reshape(-1, BG))
        return out.reshape(-1, d)

    return fn


def main():
    T = 16384            # 16k rows x 128 d x 2B = 4 MB VMEM table
    d = 128
    G = 1 << 20          # 1M gathers (~ the 30-d graph's per-iter volume/7)
    BG = 2048
    rs = np.random.RandomState(0)
    table = jnp.asarray(rs.randn(T, d).astype(np.float32)).astype(
        jnp.bfloat16)
    idx = jnp.asarray(rs.randint(0, T, G).astype(np.int32))

    results = {}

    # bar to beat: XLA take, same shapes (table lives in HBM)
    xla = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = _time(xla, table, idx)
    results["xla_take_ns_per_row"] = dt / G * 1e9

    for name, maker in (("pallas_take", make_pallas_take),
                        ("pallas_taa", make_pallas_taa),
                        ("pallas_loop", make_pallas_loop)):
        try:
            fn = jax.jit(maker(T, G, d, BG))
            if name == "pallas_loop":
                dt = _time(fn, idx, table, iters=3)
            else:
                dt = _time(fn, idx, table)
            results[f"{name}_ns_per_row"] = dt / G * 1e9
        except Exception as e:  # lowering not supported -> record that
            results[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]

    # MXU one-hot gather (XLA): compute-bound alternative mechanism
    try:
        fn = jax.jit(make_onehot_mxu(T, d, BG))
        dt = _time(fn, table, idx, iters=3)
        results["onehot_mxu_ns_per_row"] = dt / G * 1e9
    except Exception as e:
        results["onehot_mxu_error"] = f"{type(e).__name__}: {e}"[:300]

    results = {k: (round(v, 3) if isinstance(v, float) else v)
               for k, v in results.items()}
    print(json.dumps({"probe": "pallas_vmem_gather", "T": T, "d": d,
                      "G": G, "BG": BG,
                      "backend": jax.default_backend(), **results},
                     indent=1))


if __name__ == "__main__":
    main()
