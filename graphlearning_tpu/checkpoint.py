"""Solver-state checkpoint / resume.

The reference's only persistence is whole-graph pickling and artifact
caches (SURVEY.md §5: ``graph.save/load``, kNN/trainset/accuracy npz
files) — no solver-state checkpointing exists.  For long pod runs the TPU
framework checkpoints *solver state pytrees* (CG iterates, eigenbases,
MBO label fields) with orbax, and provides a segmented runner that makes
any jitted ``state -> state`` iteration resumable.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import numpy as np


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


def save(path: str, state: Any, step: int = 0) -> None:
    """Save a solver-state pytree (+ step counter) to ``path`` (orbax)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            _ckpt_dir(path),
            {"state": jax.tree.map(np.asarray, state), "step": int(step)},
            force=True,
        )


def load(path: str, like: Any = None):
    """Load ``(state, step)`` saved by :func:`save`; None if absent.

    ``like``: optional template pytree — the restored leaves are
    re-shaped onto its tree structure (orbax restores tuples as lists,
    which would break jitted ``state -> state`` programs traced on
    tuples)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(path)
    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    state = restored["state"]
    if like is not None:
        state = jax.tree.unflatten(jax.tree.structure(like),
                                   jax.tree.leaves(state))
    return state, int(restored["step"])


def run_checkpointed(
    step_fn: Callable,
    state: Any,
    num_steps: int,
    path: str,
    every: int = 100,
    resume: bool = True,
):
    """Run ``state = step_fn(state)`` ``num_steps`` times, checkpointing the
    state pytree every ``every`` steps; on restart with ``resume=True`` the
    run continues from the last checkpoint.

    ``step_fn`` should be jitted (called once per step between host-side
    checkpoint segments).  Returns ``(final_state, steps_run)``.
    """
    start = 0
    if resume:
        restored = load(path, like=state)
        if restored is not None:
            state, start = restored
    step = start
    while step < num_steps:
        seg = min(every, num_steps - step)
        for _ in range(seg):
            state = step_fn(state)
        jax.block_until_ready(state)
        step += seg
        save(path, state, step)
    return state, step


def run_checkpointed_while(
    step_fn: Callable,
    state: Any,
    done_fn: Callable,
    max_steps: int,
    path: str,
    every: int = 10,
    resume: bool = True,
):
    """Like :func:`run_checkpointed` for data-dependent loops: run
    ``state = step_fn(state)`` until ``done_fn(state)`` is truthy (checked
    between checkpoint segments, so a segment may overshoot by up to
    ``every - 1`` no-op steps — ``step_fn`` must be idempotent once done,
    which ``lax.while_loop`` bodies converted to single rounds are when
    they carry their own stop flag).  Returns ``(final_state,
    steps_run)``."""
    start = 0
    if resume:
        restored = load(path, like=state)
        if restored is not None:
            state, start = restored
    step = start
    while step < max_steps and not bool(done_fn(state)):
        seg = min(every, max_steps - step)
        for _ in range(seg):
            state = step_fn(state)
        jax.block_until_ready(state)
        step += seg
        save(path, state, step)
    return state, step
