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
