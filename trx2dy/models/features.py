"""Classic trRosetta input features: reweighting, PSSM, fast DCA.

JAX equivalents of DistPredictorBaseline.get_f2d and its static helpers
(utils_trX2dy/utils.py:641-702). The (21L x 21L) covariance inverse of
fast_dca is the single heaviest op of the feature frontend (SURVEY.md §7
hard-parts #3) — it runs as a Cholesky solve in float32 on the MXU; the
matrix is symmetric positive-definite by construction (regularized
covariance).

Feature layout (526 = 2*42 + 442):
  f1d (L, 42) = [query one-hot(20) | PSSM(21) | entropy(1)]
  f2d (L, L, 526) = [tile_i f1d | tile_j f1d | DCA features(441) + APC(1)]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

N_TOKENS = 21


@jax.jit
def reweight(msa1hot: jnp.ndarray, cutoff: float = 0.8) -> jnp.ndarray:
    """Sequence weights: 1 / (# sequences with >= cutoff identity)
    (utils.py:671-676)."""
    L = msa1hot.shape[1]
    id_min = L * cutoff
    id_mtx = jnp.tensordot(msa1hot, msa1hot, [[1, 2], [1, 2]])
    id_mask = id_mtx > id_min
    return 1.0 / jnp.sum(id_mask, axis=-1)


@jax.jit
def msa2pssm(msa1hot: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted PSSM + per-position entropy (utils.py:663-668)."""
    beff = jnp.sum(w)
    f_i = jnp.sum(w[:, None, None] * msa1hot, axis=0) / beff + 1e-9
    h_i = jnp.sum(-f_i * jnp.log(f_i), axis=1)
    return jnp.concatenate([f_i, h_i[:, None]], axis=1)


@jax.jit
def fast_dca(msa1hot: jnp.ndarray, weights: jnp.ndarray,
             penalty: float = 4.5) -> jnp.ndarray:
    """Regularized inverse-covariance DCA + APC-corrected contacts
    (utils.py:679-702). Returns (L, L, 442)."""
    nr, nc, ns = msa1hot.shape
    x = msa1hot.reshape(nr, nc * ns)
    num_points = jnp.sum(weights) - jnp.sqrt(jnp.mean(weights))
    mean = jnp.sum(x * weights[:, None], axis=0, keepdims=True) / num_points
    x = (x - mean) * jnp.sqrt(weights[:, None])
    cov = jnp.matmul(x.T, x, precision=jax.lax.Precision.HIGHEST) / num_points

    cov_reg = cov + jnp.eye(nc * ns) * penalty / jnp.sqrt(jnp.sum(weights))
    # SPD by construction: Cholesky solve replaces torch.inverse
    chol = jax.scipy.linalg.cho_factor(cov_reg)
    inv_cov = jax.scipy.linalg.cho_solve(chol, jnp.eye(nc * ns))

    x1 = inv_cov.reshape(nc, ns, nc, ns)
    features = jnp.transpose(x1, (0, 2, 1, 3)).reshape(nc, nc, ns * ns)
    nc_eye = jnp.eye(nc)
    x3 = jnp.sqrt(jnp.sum(jnp.square(x1[:, :-1, :, :-1]), axis=(1, 3))) \
        * (1 - nc_eye)
    apc = (jnp.sum(x3, axis=0, keepdims=True)
           * jnp.sum(x3, axis=1, keepdims=True) / jnp.sum(x3))
    contacts = (x3 - apc) * (1 - nc_eye)
    return jnp.concatenate([features, contacts[:, :, None]], axis=2)


@jax.jit
def get_f2d(msa: jnp.ndarray) -> jnp.ndarray:
    """Full 526-dim pair features from an (R, L) token MSA
    (utils.py:641-661)."""
    nrow, ncol = msa.shape
    msa1hot = (jnp.arange(N_TOKENS) == msa[..., None]).astype(jnp.float32)
    w = reweight(msa1hot, 0.8)

    f1d_seq = msa1hot[0, :, :20]
    f1d_pssm = msa2pssm(msa1hot, w)
    f1d = jnp.concatenate([f1d_seq, f1d_pssm], axis=1)       # (L, 42)

    if nrow > 1:
        f2d_dca = fast_dca(msa1hot, w)
    else:
        f2d_dca = jnp.zeros((ncol, ncol, 442))

    f2d = jnp.concatenate([
        jnp.tile(f1d[:, None, :], (1, ncol, 1)),
        jnp.tile(f1d[None, :, :], (ncol, 1, 1)),
        f2d_dca,
    ], axis=-1)
    return f2d                                                # (L, L, 526)
