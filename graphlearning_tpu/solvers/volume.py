"""Volume-constrained label assignment — traceable core.

The reference implements Jacobs-Merkurjev-Esedoḡlu auction dynamics
(sequential bidding with per-class heaps, ``mbo_convolution.cpp:16-316``).
The TPU-native equivalent solves the same dual problem: find per-class
prices ``p_c`` such that ``labels = argmax_c (a_ic + p_c)`` satisfies the
volume bounds — all nodes bid in parallel each round and prices adjust by
the count violation (SURVEY.md §2.2 'batched/Jacobi auction'), followed by
an exact one-node-per-round feasibility repair.

This module holds the *traceable* function so both the eager-per-iteration
path (``ssl._volume_assignment``) and the fully fused on-device MBO loops
(``ops.accel._volume_mbo_accel``, ``ssl._volume_mbo_loop``) share it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assign_labels(a, fixed_mask, fixed_labels, lower, upper,
                  max_price_it: int = 500, valid=None):
    """Traceable volume-constrained assignment (see module docstring).

    ``a``: (n, k) affinities.  Returns int labels of shape (n,) satisfying
    ``lower <= counts <= upper`` (training nodes pinned to
    ``fixed_labels``), matching the serial auction's feasible set.

    ``valid``: optional (n,) bool — rows outside it (mesh-padding rows in
    sharded execution) are excluded from the counts and never moved.
    """
    n, k = a.shape
    scale = jnp.max(a) - jnp.min(a) + 1e-8
    neg_big = jnp.asarray(jnp.finfo(a.dtype).min, a.dtype)

    def count_of(labels):
        oh = jax.nn.one_hot(labels, k, dtype=a.dtype)
        if valid is not None:
            oh = jnp.where(valid[:, None], oh, 0.0)
        return jnp.sum(oh, axis=0)

    def body(state):
        p, it, done = state
        scores = a + p[None, :]
        labels = jnp.argmax(scores, axis=1)
        labels = jnp.where(fixed_mask, fixed_labels, labels)
        counts = count_of(labels)
        over = jnp.maximum(counts - upper, 0.0)
        under = jnp.maximum(lower - counts, 0.0)
        grad = (under - over) / n
        done = jnp.max(over + under) == 0
        # freeze p once feasible so the post-loop argmax reproduces the
        # feasible labeling (an extra step can break counts by one)
        p_new = p + scale * 0.5 * grad
        p_new = p_new - jnp.mean(p_new)
        p = jnp.where(done, p, p_new)
        return p, it + 1, done

    def cond(state):
        p, it, done = state
        return jnp.logical_and(~done, it < max_price_it)

    p0 = jnp.zeros((k,), dtype=a.dtype)
    p, _, _ = jax.lax.while_loop(cond, body, (p0, 0, jnp.asarray(False)))
    labels = jnp.argmax(a + p[None, :], axis=1)
    labels = jnp.where(fixed_mask, fixed_labels, labels)

    # exact-feasibility repair: the price ascent can stall one unit off
    # (the serial auction in the reference is exact by construction).
    # Each round moves one movable node from the most over-full class to
    # the most under-full class, choosing the node losing least score.
    def rcond(state):
        labels, it = state
        counts = count_of(labels)
        bad = jnp.logical_or(jnp.any(counts > upper),
                             jnp.any(counts < lower))
        return jnp.logical_and(bad, it < n)

    # per-round batch size: a badly infeasible start (adversarial priors,
    # no warm start) would take n one-node rounds; moving the top
    # min(over, under) margins at once bounds the repair at
    # ~(violation / KREP) + #class-pairs rounds with identical feasibility
    KREP = int(min(128, n))

    def rbody(state):
        labels, it = state
        counts = count_of(labels)
        co = jnp.argmax(counts - upper)   # most over-full
        cu = jnp.argmax(lower - counts)   # most under-full
        over = counts[co] - upper[co]
        under = lower[cu] - counts[cu]
        # move t nodes this round: min(over, under) when both violated
        # (never overshoots either bound), else one node (old behavior)
        both = jnp.minimum(jnp.maximum(over, 0.0), jnp.maximum(under, 0.0))
        t = jnp.clip(both, 1.0, float(KREP)).astype(jnp.int32)
        movable = jnp.logical_and(labels == co, ~fixed_mask)
        if valid is not None:
            movable = jnp.logical_and(movable, valid)
        margin = jnp.where(movable, a[:, cu] - a[:, co], neg_big)
        vals, idx = jax.lax.top_k(margin, KREP)
        take = (jnp.arange(KREP) < t) & (vals > neg_big)
        labels = labels.at[idx].set(
            jnp.where(take, cu.astype(labels.dtype), labels[idx]))
        return labels, it + 1

    labels, _ = jax.lax.while_loop(rcond, rbody, (labels, 0))
    return labels


def projection_weights(scores, weights, priors, dt, *, similarity: bool,
                       valid=None):
    """Traceable class-size gradient loop (reference ``ssl.py:172-209``):
    iterate ``w += dt*(class_size(w) - priors)``, ``w /= w[0]`` until
    ``max|grad| <= 1e-3`` or 1e4 steps.  ``scores`` must be pre-normalized
    to [0, 1] (the reference normalizes before the loop).  ``valid``
    excludes mesh-padding rows from the class sizes (sharded execution)."""
    k = scores.shape[1]
    n_true = (scores.shape[0] if valid is None
              else jnp.sum(valid.astype(scores.dtype)))

    def cond(state):
        w, err, i = state
        return jnp.logical_and(i < 10**4, err > 1e-3)

    def body(state):
        w, err, i = state
        sw = scores * w
        pred = jnp.argmax(sw, axis=1) if similarity else jnp.argmin(sw, axis=1)
        oh = jax.nn.one_hot(pred, k, dtype=scores.dtype)
        if valid is not None:
            oh = jnp.where(valid[:, None], oh, 0.0)
        class_size = jnp.sum(oh, axis=0) / n_true
        grad = class_size - priors
        err = jnp.max(jnp.abs(grad))
        w = w + dt * grad
        return w / w[0], err, i + 1

    w, err, _ = jax.lax.while_loop(
        cond, body, (weights, jnp.asarray(1.0, scores.dtype),
                     jnp.asarray(0)))
    return w, err


def poisson_mbo_round(heat_steps, state, priors, valid=None):
    """ONE PoissonMBO outer round (heat diffusion + volume projection +
    threshold) on a ``(u, w, err)`` state — the body of
    :func:`poisson_mbo_loop`, exposed so the checkpointed runner
    (``checkpoint.run_checkpointed``) can segment the T rounds across
    host-side checkpoint saves (reference analogue:
    mbo_convolution.cpp:1029-1161 outer iterations)."""
    u, w, err = state
    k = u.shape[1]
    u = heat_steps(u)
    if valid is not None:
        u = jnp.where(valid[:, None], u, 0.0)
        s = u - jnp.min(jnp.where(valid[:, None], u, jnp.inf))
        s = jnp.where(valid[:, None], s, 0.0)
    else:
        s = u - jnp.min(u)
    m = jnp.max(s)
    s = jnp.where(m > 0, s / m, s)
    w, err = projection_weights(s, w, priors, -0.1, similarity=True,
                                valid=valid)
    labels = jnp.argmax(s * w, axis=1)
    oh = jax.nn.one_hot(labels, k, dtype=u.dtype)
    if valid is not None:
        oh = jnp.where(valid[:, None], oh, 0.0)
    return oh, w, err


def poisson_mbo_loop(heat_steps, u0, w0, priors, T: int, valid=None):
    """Traceable PoissonMBO outer loop (reference ``ssl.py:774-839``):
    T rounds of Ns-step heat diffusion (``heat_steps``, traceable
    (n, k) -> (n, k)) + volume-constrained label projection + threshold.
    The projection weights thread through the loop (warm start, as the
    reference's ``self.weights`` attribute does across outer rounds).
    ``valid`` keeps mesh-padding rows at zero and out of the class sizes
    and score normalization (sharded execution)."""

    def outer(i, state):
        return poisson_mbo_round(heat_steps, state, priors, valid=valid)

    return jax.lax.fori_loop(
        0, T, outer, (u0, w0, jnp.asarray(1.0, u0.dtype)))


def mbo_loop(dual_conv, labels0, fixed_mask, fixed_labels, lower, upper,
             temp, key, n_true: int, max_iters: int,
             max_price_it: int = 500, valid=None):
    """Traceable full VolumeMBO fixed-point loop (reference ``run_mbo`` /
    ``run_mbo_with_temperature``, mbo_convolution.cpp:1029-1161): per
    iteration one dual graph convolution of the current one-hot labels, an
    annealed-Gumbel perturbation (temperature thresholding analogue), and
    a volume-constrained assignment; stops when no label changes (past the
    annealing window when temp > 0).

    ``dual_conv``: traceable (n,) int labels -> (n, k) affinities.
    """
    def cond(state):
        labels, key, it, stop = state
        return jnp.logical_and(~stop, it < max_iters)

    def body(state):
        return mbo_round(dual_conv, state, fixed_mask, fixed_labels,
                         lower, upper, temp, n_true=n_true,
                         max_price_it=max_price_it, valid=valid)

    state = (labels0, key, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    labels, _, iters, _ = jax.lax.while_loop(cond, body, state)
    return labels, iters


def mbo_round(dual_conv, state, fixed_mask, fixed_labels, lower, upper,
              temp, n_true: int, max_price_it: int = 500, valid=None):
    """ONE VolumeMBO fixed-point iteration on a ``(labels, key, it, stop)``
    state — the body of :func:`mbo_loop`, exposed so the checkpointed
    runner can segment the iterations across host-side saves (the PRNG key
    threads through the state, so a resumed run replays the identical
    annealing-noise sequence)."""
    labels, key, it, stop = state
    a = dual_conv(labels)
    key, sub = jax.random.split(key)
    noise = jax.random.gumbel(sub, a.shape, dtype=a.dtype)
    a = a + jnp.where(temp > 0,
                      (temp / (it + 1.0)) * noise / n_true, 0.0)
    new_labels = assign_labels(a, fixed_mask, fixed_labels, lower,
                               upper, max_price_it=max_price_it,
                               valid=valid)
    new_labels = new_labels.astype(labels.dtype)
    if valid is not None:
        # mesh-padding rows never change (their zero affinities would
        # track the drifting prices and defeat the stopping rule)
        new_labels = jnp.where(valid, new_labels, labels)
    changed = jnp.sum(new_labels != labels)
    stop = jnp.logical_and(changed == 0,
                           jnp.logical_or(temp == 0, it > 10))
    return new_labels, key, it + 1, stop
