"""Batched L-BFGS minimization with Armijo backtracking.

TPU-native replacement for Rosetta's ``lbfgs_armijo_nonmonotone`` MinMover
(reference folding/folding.py:91-104): instead of one sequential C++
minimization per decoy subprocess, the whole decoy ensemble minimizes as ONE
array program — every state tensor carries a leading batch axis, the two-loop
recursion is a batched einsum, and the backtracking line search advances all
decoys together inside a ``lax.while_loop`` (converged decoys are frozen by
masking). This is the throughput axis the reference parallelized with
ThreadPoolExecutor subprocesses (utils_trX2dy/utils.py:501-505).

Semantics matched to the reference MinMover:
  * fractional convergence tolerance (Rosetta 'tolerance 0.0001' means
    |f_old - f_new| <= tol * |f_avg|),
  * bounded max iterations per stage (1000 / 500),
  * Armijo sufficient-decrease line search (monotone; Rosetta's nonmonotone
    variant only relaxes acceptance, which a fixed-iteration budget absorbs).

The optimizer state (LBFGSState) is an explicit pytree, so long
minimizations can run as a sequence of BOUNDED device calls
(lbfgs_init + lbfgs_run chunks) — keeping any single XLA execution short
enough for remote-TPU RPC limits and enabling host-side progress reporting.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

_C1 = 1e-4            # Armijo sufficient-decrease constant
_MAX_BACKTRACK = 25   # max step halvings per iteration


class LBFGSResult(NamedTuple):
    x: jnp.ndarray          # (B, D) final parameters
    f: jnp.ndarray          # (B,) final energies
    n_iter: jnp.ndarray     # () iterations executed
    converged: jnp.ndarray  # (B,) convergence flags


class LBFGSState(NamedTuple):
    """Full optimizer state; a plain pytree (chunkable across device calls)."""
    k: jnp.ndarray        # () iterations so far
    x: jnp.ndarray        # (B, D)
    f: jnp.ndarray        # (B,)
    g: jnp.ndarray        # (B, D)
    s_hist: jnp.ndarray   # (M, B, D)
    y_hist: jnp.ndarray   # (M, B, D)
    rho: jnp.ndarray      # (M, B)
    valid: jnp.ndarray    # (M, B)
    done: jnp.ndarray     # (B,) converged-or-frozen
    frozen: jnp.ndarray   # (B,) caller-frozen decoys
    fails: jnp.ndarray    # (B,) consecutive line-search failures
    smalls: jnp.ndarray   # (B,) consecutive below-tolerance improvements
    # (W, B) ring of recent f values for NONMONOTONE acceptance (Rosetta
    # lbfgs_armijo_nonmonotone, folding.py:96); None = monotone Armijo
    f_hist: Optional[jnp.ndarray] = None


def _value_and_grad_batch(fun: Callable) -> Callable:
    """fun: (B, D) -> (B,); returns (values (B,), grads (B, D)).

    Decoys are independent, so the gradient of the batch sum IS the per-decoy
    gradient — one backward pass for the whole ensemble.
    """
    def vg(x):
        vals, pullback = jax.vjp(fun, x)
        (grads,) = pullback(jnp.ones_like(vals))
        return vals, grads
    return vg


def _two_loop(g, s_hist, y_hist, rho, valid):
    """Batched L-BFGS two-loop recursion.

    Args:
      g: (B, D) gradients.
      s_hist/y_hist: (M, B, D) step / gradient-difference history (circular,
        oldest-to-newest along axis 0 after the caller's roll).
      rho: (M, B) 1/(s.y) per entry; valid: (M, B) entry-validity mask.

    Returns (B, D) descent direction -H g.
    """
    M = s_hist.shape[0]

    def bwd(i, carry):
        q, alpha = carry
        j = M - 1 - i                       # newest -> oldest
        a = rho[j] * jnp.sum(s_hist[j] * q, axis=-1)         # (B,)
        a = jnp.where(valid[j], a, 0.0)
        q = q - a[:, None] * y_hist[j]
        return q, alpha.at[j].set(a)

    q, alpha = jax.lax.fori_loop(
        0, M, bwd, (g, jnp.zeros((M,) + g.shape[:1], g.dtype)))

    # initial Hessian scale gamma = s.y / y.y of the newest valid entry
    sy = jnp.sum(s_hist * y_hist, axis=-1)                    # (M, B)
    yy = jnp.sum(y_hist * y_hist, axis=-1)
    newest = jnp.argmax(
        jnp.where(valid, jnp.arange(M, dtype=jnp.float32)[:, None], -1.0),
        axis=0)                                               # (B,)
    take = functools.partial(jnp.take_along_axis, indices=newest[None, :],
                             axis=0)
    gamma = jnp.where(
        jnp.any(valid, axis=0),
        take(sy)[0] / jnp.maximum(take(yy)[0], 1e-20),
        1.0)
    r = gamma[:, None] * q

    def fwd(j, r):
        b = rho[j] * jnp.sum(y_hist[j] * r, axis=-1)
        b = jnp.where(valid[j], b, 0.0)
        corr = (alpha[j] - b)[:, None] * s_hist[j]
        return r + jnp.where(valid[j][:, None], corr, 0.0)

    r = jax.lax.fori_loop(0, M, fwd, r)
    return -r


def lbfgs_init(fun: Callable, x0: jnp.ndarray, history: int = 10,
               freeze: Optional[jnp.ndarray] = None,
               nonmonotone: int = 0) -> LBFGSState:
    """Build the initial optimizer state (one energy+gradient evaluation).

    nonmonotone > 0 enables Grippo-style nonmonotone Armijo acceptance over
    a window of that many recent f values (Rosetta's
    lbfgs_armijo_nonmonotone relaxes acceptance the same way)."""
    B, D = x0.shape
    M = history
    f0, g0 = _value_and_grad_batch(fun)(x0)
    frozen0 = jnp.zeros((B,), bool) if freeze is None else freeze
    return LBFGSState(
        k=jnp.asarray(0),
        x=x0, f=f0, g=g0,
        s_hist=jnp.zeros((M, B, D), x0.dtype),
        y_hist=jnp.zeros((M, B, D), x0.dtype),
        rho=jnp.zeros((M, B), x0.dtype),
        valid=jnp.zeros((M, B), bool),
        done=frozen0,
        frozen=frozen0,
        fails=jnp.zeros((B,), jnp.int32),
        smalls=jnp.zeros((B,), jnp.int32),
        f_hist=(jnp.tile(f0, (nonmonotone, 1)) if nonmonotone > 0
                else None),
    )


def lbfgs_run(fun: Callable, st0: LBFGSState, max_iter: int,
              tol: float = 1e-4) -> LBFGSState:
    """Advance the optimizer by up to max_iter iterations (resumable)."""
    B = st0.x.shape[0]
    M = st0.s_hist.shape[0]
    vg = _value_and_grad_batch(fun)
    stop_k = st0.k + max_iter

    def cond(st: LBFGSState):
        return (st.k < stop_k) & ~jnp.all(st.done)

    def body(st: LBFGSState):
        d = _two_loop(st.g, st.s_hist, st.y_hist, st.rho, st.valid)
        # fall back to steepest descent when not a descent direction
        gd = jnp.sum(st.g * d, axis=-1)
        bad = gd >= 0.0
        d = jnp.where(bad[:, None], -st.g, d)
        gd = jnp.where(bad, -jnp.sum(st.g * st.g, axis=-1), gd)

        # --- batched Armijo backtracking -------------------------------
        # Trials are VALUE-ONLY on purpose: the backward pass costs ~3x the
        # forward in HBM traffic (measured via XLA cost analysis — dense
        # geometry cotangents), so evaluating grad per trial and skipping
        # the post-accept value+grad call was measured SLOWER (22.6 vs
        # 17.6 ms/iter at B=50, L=150).
        def ls_cond(carry):
            t, accepted, n, _, _ = carry
            return (n < _MAX_BACKTRACK) & ~jnp.all(accepted | st.done)

        # nonmonotone acceptance reference value: max of the recent-f ring
        # (monotone path: the current f) — Rosetta lbfgs_armijo_nonmonotone
        f_ref = st.f if st.f_hist is None else jnp.max(st.f_hist, axis=0)

        def ls_body(carry):
            t, accepted, n, f_new, x_new = carry
            x_try = st.x + t[:, None] * d
            f_try = fun(x_try)
            ok = (f_try <= f_ref + _C1 * t * gd) & jnp.isfinite(f_try)
            newly = ok & ~accepted
            f_new = jnp.where(newly, f_try, f_new)
            x_new = jnp.where(newly[:, None], x_try, x_new)
            t = jnp.where(ok | accepted, t, t * 0.5)
            return t, accepted | ok, n + 1, f_new, x_new

        # Initial trial step: unit when curvature history scales the
        # direction; gradient-scaled on (re)starts so the first steepest-
        # descent step moves at most ~0.5 per coordinate (torsions: radians).
        has_hist = jnp.any(st.valid, axis=0)
        d_inf = jnp.max(jnp.abs(d), axis=-1)
        t0 = jnp.where(has_hist, 1.0,
                       jnp.minimum(1.0, 0.5 / jnp.maximum(d_inf, 1e-8)))
        carry = (t0, jnp.zeros((B,), bool), jnp.asarray(0), st.f, st.x)
        t, accepted, _, f_new, x_new = jax.lax.while_loop(
            ls_cond, ls_body, carry)

        moved = accepted & ~st.done
        x_next = jnp.where(moved[:, None], x_new, st.x)
        f_next = jnp.where(moved, f_new, st.f)
        _, g_next = vg(x_next)
        g_next = jnp.where(moved[:, None], g_next, st.g)

        # --- history update (circular via roll: slot M-1 is newest) ----
        s = x_next - st.x
        y = g_next - st.g
        sy = jnp.sum(s * y, axis=-1)
        good = moved & (sy > 1e-10)
        # line-search failure with stale history: wipe it and retry as
        # steepest descent next iteration before declaring convergence
        failed = ~accepted & ~st.done
        keep = ~failed
        s_hist = jnp.roll(st.s_hist, -1, axis=0).at[M - 1].set(
            jnp.where(good[:, None], s, 0.0)) * keep[None, :, None]
        y_hist = jnp.roll(st.y_hist, -1, axis=0).at[M - 1].set(
            jnp.where(good[:, None], y, 0.0)) * keep[None, :, None]
        rho = jnp.roll(st.rho, -1, axis=0).at[M - 1].set(
            jnp.where(good, 1.0 / jnp.maximum(sy, 1e-20), 0.0)) * keep[None, :]
        valid = jnp.roll(st.valid, -1, axis=0).at[M - 1].set(good) \
            & keep[None, :]

        fails = jnp.where(failed, st.fails + 1, 0)

        # --- convergence: several consecutive below-tolerance steps ----
        # (a single small L-BFGS step mid-descent is routine; Rosetta's
        # tolerance is over the line-minimization sequence, not one step)
        denom = 0.5 * (jnp.abs(st.f) + jnp.abs(f_next)) + 1e-8
        small = jnp.abs(st.f - f_next) <= tol * denom
        smalls = jnp.where(moved & small, st.smalls + 1, 0)
        done = st.done | (smalls >= 3) | (fails >= 2)

        f_hist = st.f_hist
        if f_hist is not None:
            f_hist = jnp.roll(f_hist, -1, axis=0).at[-1].set(
                jnp.where(moved, f_next, st.f))

        return LBFGSState(st.k + 1, x_next, f_next, g_next,
                          s_hist, y_hist, rho, valid, done, st.frozen,
                          fails, smalls, f_hist)

    return jax.lax.while_loop(cond, body, st0)


def state_put(st: LBFGSState, put) -> LBFGSState:
    """Re-commit every batch axis of the state with `put(a, axis)`.

    Used after host-side lane compaction (state_gather) to restore the
    decoy-batch NamedSharding, so subsequent L-BFGS chunks keep running
    SPMD over the mesh instead of silently collapsing onto one device."""
    return LBFGSState(
        k=st.k,
        x=put(st.x), f=put(st.f), g=put(st.g),
        s_hist=put(st.s_hist, 1), y_hist=put(st.y_hist, 1),
        rho=put(st.rho, 1), valid=put(st.valid, 1),
        done=put(st.done), frozen=put(st.frozen),
        fails=put(st.fails), smalls=put(st.smalls),
        f_hist=None if st.f_hist is None else put(st.f_hist, 1),
    )


def state_gather(st: LBFGSState, idx) -> LBFGSState:
    """Select a subset of batch lanes from an optimizer state.

    Used by the staged folder's batch COMPACTION: once most decoys of a
    large batch have converged, the still-active lanes are repacked into a
    smaller batch so subsequent chunks stop paying compute/HBM for drained
    lanes (the while-loop otherwise runs at full batch width until the
    slowest decoy converges). Host-side numpy indexing — the state is tiny
    (MB) next to a fold chunk, and chunk boundaries are host syncs anyway.
    """
    import numpy as np

    idx = np.asarray(idx)

    def take(a, axis):
        return jnp.asarray(np.take(np.asarray(a), idx, axis=axis))

    return LBFGSState(
        k=st.k,
        x=take(st.x, 0), f=take(st.f, 0), g=take(st.g, 0),
        s_hist=take(st.s_hist, 1), y_hist=take(st.y_hist, 1),
        rho=take(st.rho, 1), valid=take(st.valid, 1),
        done=take(st.done, 0), frozen=take(st.frozen, 0),
        fails=take(st.fails, 0), smalls=take(st.smalls, 0),
        f_hist=None if st.f_hist is None else take(st.f_hist, 1),
    )


def lbfgs_minimize(fun: Callable, x0: jnp.ndarray, max_iter: int = 1000,
                   tol: float = 1e-4, history: int = 10,
                   freeze: Optional[jnp.ndarray] = None,
                   nonmonotone: int = 0) -> LBFGSResult:
    """Minimize a batch of independent objectives with L-BFGS.

    Args:
      fun: batched objective, (B, D) -> (B,). Must be jit-traceable.
      x0: (B, D) initial parameters.
      max_iter: iteration cap (Rosetta max_iter, folding.py:92-104).
      tol: fractional energy-change convergence tolerance.
      history: L-BFGS memory M.
      freeze: optional (B,) bool; True decoys are left untouched (used by the
        staged protocol's per-decoy clash gating).

    Returns LBFGSResult. The whole routine is one XLA program: jit/grad-safe,
    shapes static, batch-native. For chunked execution across bounded device
    calls use lbfgs_init + lbfgs_run directly.
    """
    st = lbfgs_run(fun, lbfgs_init(fun, x0, history=history, freeze=freeze,
                                   nonmonotone=nonmonotone),
                   max_iter=max_iter, tol=tol)
    return LBFGSResult(x=st.x, f=st.f, n_iter=st.k,
                       converged=st.done & ~st.frozen)
