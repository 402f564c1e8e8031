"""Batched natural cubic splines on a shared knot grid.

The reference writes per-pair spline restraint text files and lets Rosetta's
C++ SplineFunc interpolate them (folding/utils_ros/utils_ros.py:66-74 and the
'SPLINE TAG' constraint lines). Here the same tables live as dense
(L, L, n_knots) arrays: because every pair shares the same x-grid, the
tridiagonal system for the second derivatives has a fixed matrix whose inverse
is precomputed once, so fitting all L^2 splines is a single (L^2, n) x (n, n)
matmul — MXU-friendly — and evaluation is a vectorized gather-free
one-hot contraction.

Out-of-range queries extrapolate linearly with the boundary slope, so distant
pairs still feel a pull toward the restrained region.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class SplineTable(NamedTuple):
    x: jnp.ndarray        # (n,) shared knots
    y: jnp.ndarray        # (..., n) values
    m: jnp.ndarray        # (..., n) second derivatives (natural BC)


_OP_CACHE: dict = {}


def _second_derivative_operator(x: np.ndarray) -> np.ndarray:
    """(n, n) linear operator y -> M for a natural cubic spline on knots x.

    Cached per knot grid: the folder fits tables for every dampened
    histogram of every dynamics step, but only ever on the four fixed
    knot grids (dist/torsion/planar/af2)."""
    key = x.tobytes()
    hit = _OP_CACHE.get(key)
    if hit is not None:
        return hit
    op = _second_derivative_operator_impl(x)
    _OP_CACHE[key] = op
    return op


def _second_derivative_operator_impl(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    h = np.diff(x)
    if n < 3:
        return np.zeros((n, n))
    # tridiagonal A (n-2, n-2) and rhs operator D (n-2, n)
    A = np.zeros((n - 2, n - 2))
    D = np.zeros((n - 2, n))
    for i in range(1, n - 1):
        r = i - 1
        A[r, r] = (h[i - 1] + h[i]) / 3.0
        if r > 0:
            A[r, r - 1] = h[i - 1] / 6.0
        if r < n - 3:
            A[r, r + 1] = h[i] / 6.0
        D[r, i - 1] = 1.0 / h[i - 1]
        D[r, i] = -1.0 / h[i - 1] - 1.0 / h[i]
        D[r, i + 1] = 1.0 / h[i]
    op = np.zeros((n, n))
    op[1:-1] = np.linalg.solve(A, D)
    return op


def fit_natural_cubic(x: np.ndarray, y) -> SplineTable:
    """Fit natural cubic splines for a batch of tables sharing knots x.

    Args:
      x: (n,) strictly increasing knots (host constant).
      y: (..., n) values. A NUMPY y is fitted entirely ON HOST and the
        table stays numpy-backed — the restraint-compilation path runs
        once per dampened histogram per dynamics step, and eager device
        dispatch over the remote-TPU tunnel costs far more than this
        (..., n) x (n, n) BLAS matmul; callers transfer the finished
        tables to device once, at the jitted-program boundary
        (folder._protocol_staged / fold_chains). A jax y keeps the
        on-device einsum (in-jit and explicitly-device callers).
    """
    op64 = _second_derivative_operator(np.asarray(x, np.float64))
    if isinstance(y, np.ndarray):
        op = op64.astype(y.dtype)
        m = np.einsum("...n,kn->...k", y, op)
        return SplineTable(np.asarray(x, dtype=y.dtype), y, m)
    op = jnp.asarray(op64, dtype=y.dtype)
    m = jnp.einsum("...n,kn->...k", y, op,
                   precision=jax.lax.Precision.HIGHEST)
    return SplineTable(jnp.asarray(x, dtype=y.dtype), y, m)


def evaluate_spline(table: SplineTable, q: jnp.ndarray) -> jnp.ndarray:
    """Evaluate batched splines at batched query points.

    Args:
      table: SplineTable with y/m of shape (..., n).
      q: queries of shape (...,) matching the batch of the table.

    Returns:
      values of shape (...,).
    """
    x, y, m = table
    n = x.shape[0]
    # interval index in [0, n-2]
    k = jnp.clip(jnp.sum(x[: n - 1] <= q[..., None], axis=-1) - 1, 0, n - 2)
    oh_lo = jax.nn.one_hot(k, n, dtype=y.dtype)
    oh_hi = jax.nn.one_hot(k + 1, n, dtype=y.dtype)

    def sel(t, oh):
        return jnp.sum(t * oh, axis=-1)

    xk, xk1 = sel(jnp.broadcast_to(x, y.shape), oh_lo), sel(
        jnp.broadcast_to(x, y.shape), oh_hi)
    yk, yk1 = sel(y, oh_lo), sel(y, oh_hi)
    mk, mk1 = sel(m, oh_lo), sel(m, oh_hi)
    h = xk1 - xk
    t = (q - xk) / h
    u = 1.0 - t
    h2 = h * h / 6.0
    inside = (u * yk + t * yk1
              + (u * u * u - u) * h2 * mk
              + (t * t * t - t) * h2 * mk1)

    # linear extrapolation with boundary slopes
    h0 = x[1] - x[0]
    hn = x[-1] - x[-2]
    slope_lo = (y[..., 1] - y[..., 0]) / h0 - h0 * (
        2.0 * m[..., 0] + m[..., 1]) / 6.0
    slope_hi = (y[..., -1] - y[..., -2]) / hn + hn * (
        m[..., -2] + 2.0 * m[..., -1]) / 6.0
    below = y[..., 0] + slope_lo * (q - x[0])
    above = y[..., -1] + slope_hi * (q - x[-1])
    out = jnp.where(q < x[0], below, inside)
    out = jnp.where(q > x[-1], above, out)
    return out


def evaluate_spline_with_deriv(table: SplineTable, q: jnp.ndarray):
    """Spline value AND dvalue/dq in one pass (shared one-hot gathers).

    The derivative costs almost nothing extra on top of the value (same
    interval selection and knot gathers), which enables an analytic custom
    VJP for the restraint energy: the backward pass becomes a single
    elementwise multiply instead of re-traversing the one-hot machinery.
    """
    x, y, m = table
    n = x.shape[0]
    k = jnp.clip(jnp.sum(x[: n - 1] <= q[..., None], axis=-1) - 1, 0, n - 2)
    oh_lo = jax.nn.one_hot(k, n, dtype=y.dtype)
    oh_hi = jax.nn.one_hot(k + 1, n, dtype=y.dtype)

    def sel(t, oh):
        return jnp.sum(t * oh, axis=-1)

    xb = jnp.broadcast_to(x, y.shape)
    xk, xk1 = sel(xb, oh_lo), sel(xb, oh_hi)
    yk, yk1 = sel(y, oh_lo), sel(y, oh_hi)
    mk, mk1 = sel(m, oh_lo), sel(m, oh_hi)
    h = xk1 - xk
    t = (q - xk) / h
    u = 1.0 - t
    h2 = h * h / 6.0
    inside = (u * yk + t * yk1
              + (u * u * u - u) * h2 * mk
              + (t * t * t - t) * h2 * mk1)
    # d/dq: dt/dq = 1/h, du/dq = -1/h
    dinside = ((yk1 - yk) / h
               + h / 6.0 * (-(3.0 * u * u - 1.0) * mk
                            + (3.0 * t * t - 1.0) * mk1))

    h0 = x[1] - x[0]
    hn = x[-1] - x[-2]
    slope_lo = (y[..., 1] - y[..., 0]) / h0 - h0 * (
        2.0 * m[..., 0] + m[..., 1]) / 6.0
    slope_hi = (y[..., -1] - y[..., -2]) / hn + hn * (
        m[..., -2] + 2.0 * m[..., -1]) / 6.0
    below = y[..., 0] + slope_lo * (q - x[0])
    above = y[..., -1] + slope_hi * (q - x[-1])

    lo_mask = q < x[0]
    hi_mask = q > x[-1]
    val = jnp.where(lo_mask, below, jnp.where(hi_mask, above, inside))
    deriv = jnp.where(lo_mask, slope_lo,
                      jnp.where(hi_mask, slope_hi, dinside))
    return val, deriv


@jax.custom_vjp
def masked_spline_energy(y, m, x_knots, q, mask):
    """sum(mask * spline(q)) with an analytic one-multiply backward.

    y/m: (..., n) tables; x_knots: (n,); q/mask: (...,). Differentiable in q
    only (tables and masks are protocol constants)."""
    val, _ = evaluate_spline_with_deriv(SplineTable(x_knots, y, m), q)
    return jnp.sum(jnp.where(mask, val, 0.0))


def _mse_fwd(y, m, x_knots, q, mask):
    val, deriv = evaluate_spline_with_deriv(SplineTable(x_knots, y, m), q)
    e = jnp.sum(jnp.where(mask, val, 0.0))
    return e, (deriv, mask)


def _mse_bwd(res, g):
    deriv, mask = res
    dq = g * jnp.where(mask, deriv, 0.0)
    return None, None, None, dq, None


masked_spline_energy.defvjp(_mse_fwd, _mse_bwd)


def _eval_with_deriv_pb(y, m, x, q):
    """evaluate_spline_with_deriv for PAIR-MAJOR batched queries.

    y/m: (P, K) per-pair tables; q: (P, B) queries (B decoys per pair).
    Returns value and dvalue/dq, both (P, B). Kept separate from the dense
    evaluator so the (P, B, K) one-hot broadcast is explicit."""
    K = x.shape[0]
    k = jnp.clip(jnp.sum(x[: K - 1] <= q[..., None], axis=-1) - 1, 0, K - 2)
    oh_lo = jax.nn.one_hot(k, K, dtype=y.dtype)          # (P, B, K)
    oh_hi = jax.nn.one_hot(k + 1, K, dtype=y.dtype)

    def sel(t, oh):
        return jnp.sum(t[:, None, :] * oh, axis=-1)      # (P, B)

    def selx(oh):
        return jnp.sum(x[None, None, :] * oh, axis=-1)

    xk, xk1 = selx(oh_lo), selx(oh_hi)
    yk, yk1 = sel(y, oh_lo), sel(y, oh_hi)
    mk, mk1 = sel(m, oh_lo), sel(m, oh_hi)
    h = xk1 - xk
    t = (q - xk) / h
    u = 1.0 - t
    h2 = h * h / 6.0
    inside = (u * yk + t * yk1
              + (u * u * u - u) * h2 * mk
              + (t * t * t - t) * h2 * mk1)
    dinside = ((yk1 - yk) / h
               + h / 6.0 * (-(3.0 * u * u - 1.0) * mk
                            + (3.0 * t * t - 1.0) * mk1))

    h0 = x[1] - x[0]
    hn = x[-1] - x[-2]
    slope_lo = ((y[:, 1] - y[:, 0]) / h0
                - h0 * (2.0 * m[:, 0] + m[:, 1]) / 6.0)[:, None]
    slope_hi = ((y[:, -1] - y[:, -2]) / hn
                + hn * (m[:, -2] + 2.0 * m[:, -1]) / 6.0)[:, None]
    below = y[:, 0][:, None] + slope_lo * (q - x[0])
    above = y[:, -1][:, None] + slope_hi * (q - x[-1])
    lo = q < x[0]
    hi = q > x[-1]
    val = jnp.where(lo, below, jnp.where(hi, above, inside))
    deriv = jnp.where(lo, slope_lo, jnp.where(hi, slope_hi, dinside))
    return val, deriv


@jax.custom_vjp
def masked_spline_energy_pb(y, m, x_knots, q, mask):
    """Per-decoy masked spline energy over pair-major batched queries.

    y/m: (P, K); q: (P, B); mask: (P,) bool. Returns (B,) = sum over active
    pairs of spline_p(q[p, b]). Differentiable in q only (analytic VJP:
    one multiply)."""
    val, _ = _eval_with_deriv_pb(y, m, x_knots, q)
    return jnp.sum(jnp.where(mask[:, None], val, 0.0), axis=0)


def _msepb_fwd(y, m, x_knots, q, mask):
    val, deriv = _eval_with_deriv_pb(y, m, x_knots, q)
    e = jnp.sum(jnp.where(mask[:, None], val, 0.0), axis=0)
    return e, (deriv, mask)


def _msepb_bwd(res, g):
    deriv, mask = res
    dq = g[None, :] * jnp.where(mask[:, None], deriv, 0.0)
    return None, None, None, dq, None


masked_spline_energy_pb.defvjp(_msepb_fwd, _msepb_bwd)


@jax.custom_vjp
def masked_spline_energy_lanes(y, m, x_knots, q, mask):
    """Per-lane masked spline energy: each lane (chain-mode decoy) has its
    OWN tables and active set.

    y/m: (M, P, K); x_knots: (K,); q/mask: (M, P). Returns (M,) sums over
    each lane's active pairs. Differentiable in q only."""
    val, _ = evaluate_spline_with_deriv(SplineTable(x_knots, y, m), q)
    return jnp.sum(jnp.where(mask, val, 0.0), axis=-1)


def _msel_fwd(y, m, x_knots, q, mask):
    val, deriv = evaluate_spline_with_deriv(SplineTable(x_knots, y, m), q)
    e = jnp.sum(jnp.where(mask, val, 0.0), axis=-1)
    return e, (deriv, mask)


def _msel_bwd(res, g):
    deriv, mask = res
    dq = g[..., None] * jnp.where(mask, deriv, 0.0)
    return None, None, None, dq, None


masked_spline_energy_lanes.defvjp(_msel_fwd, _msel_bwd)
