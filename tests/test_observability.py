"""Tests for observability (tracing/counters/benchmark) and solver-state
checkpoint/resume (SURVEY.md §5 auxiliary subsystems)."""

import numpy as np
import jax
import jax.numpy as jnp

from graphlearning_tpu import observability as obs
from graphlearning_tpu import checkpoint as ckpt


def test_timer_and_benchmark():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    with obs.Timer(sync=f(x)) as t:
        y = f(x)
    assert t.seconds is not None and t.seconds >= 0
    res = obs.benchmark(f, x, iters=3, edges=1000)
    assert res["seconds_per_call"] > 0
    assert res["edges_per_sec"] == 1000 / res["seconds_per_call"]


def test_benchmark_chained():
    f = jax.jit(lambda x: x * 0.5)
    res = obs.benchmark(f, jnp.ones((16,)), iters=4, chain=True)
    assert res["iters"] == 4


def test_counters():
    c = obs.Counters()
    c.add("cg_iters", 10)
    c.add("cg_iters", 5)
    c.gauge("residual", 1e-7)
    assert c.get("cg_iters") == 15
    assert c.get("residual") == 1e-7
    assert "cg_iters: 15" in c.summary()
    c.reset()
    assert c.get("cg_iters") == 0


def test_trace_writes_dir(tmp_path):
    logdir = str(tmp_path / "trace")
    with obs.trace(logdir):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    import os
    assert os.path.isdir(logdir) and len(os.listdir(logdir)) > 0


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck")
    state = {"x": jnp.arange(5.0), "vecs": jnp.ones((3, 2))}
    ckpt.save(path, state, step=7)
    restored, step = ckpt.load(path)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["x"]), np.arange(5.0))


def test_run_checkpointed_resumes(tmp_path):
    """Kill after 10 steps -> resume must continue from step 10, and the
    final state must equal an uninterrupted run."""
    path = str(tmp_path / "run")
    step_fn = jax.jit(lambda s: s + 1.0)

    s0 = jnp.zeros(())
    # uninterrupted reference
    ref, n = ckpt.run_checkpointed(step_fn, s0, 25, str(tmp_path / "ref"),
                                   every=10)
    assert n == 25 and float(ref) == 25.0

    # interrupted: run only 10 steps (simulate by num_steps=10) ...
    ckpt.run_checkpointed(step_fn, s0, 10, path, every=10)
    # ... then "restart" asking for the full 25: resumes from 10
    final, n = ckpt.run_checkpointed(step_fn, s0, 25, path, every=10)
    assert n == 25 and float(final) == 25.0


def test_checkpoint_load_missing(tmp_path):
    assert ckpt.load(str(tmp_path / "nope")) is None
