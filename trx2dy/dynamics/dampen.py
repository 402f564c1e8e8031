"""Distribution dampening — the core of the "Dynamics" sampler.

After each decoy, the distance/angle distribution peaks that the decoy already
realized are suppressed, pushing the next minimization into *other* modes of
the predicted distributions. Vectorized JAX equivalent of the reference's
per-pair python loop (utils_trX2dy/utils.py:325-403):

  for pairs (i,j) where max_b pred[i,j,b] < P:
      k = argmax_b fact[i,j,b]          # bin realized by the decoy
      if pred[i,j,k] >= pcut: pred[i,j,k] *= decay_rate
      renormalize pred[i,j,:]; gaussian-smooth (sigma=1) along bins

Faithfully reproduced edge cases:
  * window is the single argmax bin (backward=forward=0 for every published
    flag, utils.py:325-334);
  * when argmax is the LAST bin the reference slice is empty
    (utils.py:392: fw becomes -1) so no decay happens — but renormalization
    and smoothing still apply;
  * the un-normalized "tmp" channel (norm=False) skips renorm/smooth and
    drives the convergence check in the driver (run_inference.py:135-137).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class DampenParams(NamedTuple):
    """Sampling hyper-parameters (reference utils.py:325-334, flag table)."""
    P: float = 0.5          # only dampen pairs whose max prob is below this
    pcut: float = 0.05      # only decay bins at/above this probability
    decay_rate: float = 0.5
    sigma: float = 1.0      # gaussian smoothing along the bin axis


# Flag table from the reference ("0HD" is the only flag ever used, utils.py:385)
DAMPEN_FLAGS = {
    "0HHD": DampenParams(P=0.3, pcut=0.03, decay_rate=0.72),
    "0LD": DampenParams(P=0.5, pcut=0.07, decay_rate=0.50),
    "0HD": DampenParams(P=0.5, pcut=0.05, decay_rate=0.50),
    "0LLD": DampenParams(P=0.7, pcut=0.1, decay_rate=0.42),
}


def gaussian_smooth_bins(x: jnp.ndarray, sigma: float = 1.0,
                         truncate: float = 4.0) -> jnp.ndarray:
    """1D gaussian filter along the last axis, scipy-compatible.

    Matches scipy.ndimage.gaussian_filter(mode='reflect', truncate=4.0) as the
    reference applies it to each (nbins,) slice (utils.py:375-376,399).
    """
    radius = int(truncate * sigma + 0.5)
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    kernel = np.exp(-0.5 * (t / sigma) ** 2)
    kernel = (kernel / kernel.sum()).astype(np.float32)
    k = jnp.asarray(kernel)

    # scipy 'reflect' == numpy/jnp pad mode 'symmetric' (edge value repeated)
    pad = [(0, 0)] * (x.ndim - 1) + [(radius, radius)]
    xp = jnp.pad(x, pad, mode="symmetric")
    # correlate along last axis
    windows = [xp[..., i:i + x.shape[-1]] for i in range(2 * radius + 1)]
    return sum(w * kk for w, kk in zip(windows, k))


def dampen_distribution(pred: jnp.ndarray, fact: jnp.ndarray,
                        params: DampenParams = DampenParams(),
                        norm: bool = True, smooth: bool = True) -> jnp.ndarray:
    """Dampen predicted histograms against a decoy's realized one-hot bins.

    Args:
      pred: (L, L, B) current (possibly already-dampened) histograms.
      fact: (L, L, B) one-hot realized histograms from the decoy.
      norm: True -> renormalize + (optionally) smooth masked pairs
            (the reference's norm=True path); False -> return the raw decayed
            tensor (the "tmp" convergence channel).
    """
    B = pred.shape[-1]
    mask = jnp.max(pred, axis=-1) < params.P                    # (L, L)
    idx = jnp.argmax(fact, axis=-1)                             # (L, L)
    onehot = jax.nn.one_hot(idx, B, dtype=pred.dtype)           # (L, L, B)

    val = jnp.take_along_axis(pred, idx[..., None], axis=-1)[..., 0]
    do_decay = mask & (val >= params.pcut) & (idx != B - 1)
    decayed = pred * jnp.where(
        (onehot > 0) & do_decay[..., None], params.decay_rate, 1.0
    )
    if not norm:
        return decayed

    ssum = jnp.sum(decayed, axis=-1, keepdims=True)
    normalized = decayed / jnp.where(ssum == 0, 1.0, ssum)
    if smooth:
        normalized = gaussian_smooth_bins(normalized, params.sigma)
    # only masked pairs are renormalized/smoothed; others keep original values
    return jnp.where(mask[..., None], normalized, pred)
