"""Global configuration for graphlearning_tpu.

Dtype policy (SURVEY.md §7.1): the reference (jwcalder/GraphLearning) is float64
scipy throughout; TPU prefers float32/bfloat16.  We resolve the working float
dtype from JAX's x64 state so that CPU-hosted parity tests (which enable x64)
match the reference bit-for-bit-ish, while TPU runs use f32 by default.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Persistent compilation cache: first XLA compiles on the TPU tunnel are
# slow (minutes for big programs like LOBPCG); cache them across processes.
_cache_dir = os.environ.get(
    "GLT_COMPILATION_CACHE", os.path.expanduser("~/.cache/glt_jax_cache")
)
if _cache_dir and _cache_dir != "0":
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # persist even tiny programs: through the remote-compile tunnel a
        # trivial eager op costs ~0.4s to compile, and a cold fit dispatches
        # dozens of them
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # pragma: no cover - older jax without the flag
        pass

# Index dtype: int32 everywhere (reference marshals int32 to C as well,
# reference graph.py:69-84).
index_dtype = jnp.int32


def float_dtype():
    """Working float dtype: f64 when jax x64 is enabled (CPU parity tests),
    f32 otherwise (TPU default)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


import dataclasses
from typing import Any, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class GLTConfig:
    """Framework-wide execution config (SURVEY.md §5 'config/flag system').

    One config drives both single-chip and sharded execution: the mesh /
    partition fields describe the distribution layer (``parallel.execute``
    builds a ``Distributor`` from them), the dtype/tolerance fields the
    solver numerics.  ``None`` fields fall back to the module defaults
    (``float_dtype()``, per-model tolerances).

    The reference has no config system at all — pure kwargs plus global
    directory constants (reference ssl.py:129, weightmatrix.py:17).
    """

    # -- distribution -------------------------------------------------------
    mesh_shape: Optional[Tuple[int, ...]] = None   # None -> all devices 1-D
    mesh_axes: Tuple[str, ...] = ("nodes",)        # partition axis first
    node_axis: str = "nodes"                       # axis graphs shard over
    devices: Any = None                            # default: jax.devices()

    # -- sharded SpMM kernel -------------------------------------------------
    # "auto": partitioned tiled-band Pallas kernel with ppermute halo
    # exchange (parallel/band_shard.py) when the graph's partition covers
    # almost all edges and the backend can run it profitably; GSPMD
    # all-gather ELL otherwise.  "banded" / "gspmd" force a kernel.
    sharded_kernel: str = "auto"
    band_R: Optional[int] = None                   # None -> 512 (TPU) / 64
    band_WT: Optional[int] = None
    band_mode: Optional[str] = None                # None -> bf16x3 / f64
    band_max_residual: float = 0.02                # auto-fallback threshold

    # -- numerics -----------------------------------------------------------
    dtype: Any = None                              # None -> float_dtype()
    cg_tol: Optional[float] = None                 # None -> model tolerance
    cg_max_iter: int = 10**5

    def resolve_dtype(self):
        return self.dtype if self.dtype is not None else float_dtype()

    def make_mesh(self):
        """Build the jax Mesh this config describes."""
        import numpy as np
        from jax.sharding import Mesh

        devices = self.devices if self.devices is not None else jax.devices()
        shape = self.mesh_shape
        if shape is None:
            shape = (len(devices),) + (1,) * (len(self.mesh_axes) - 1)
        n = int(np.prod(shape))
        dev = np.asarray(devices[:n]).reshape(shape)
        return Mesh(dev, axis_names=self.mesh_axes)
