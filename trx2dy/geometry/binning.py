"""Histogram binning of real-valued 6D geometry maps ("pros" kernels).

Vectorized JAX equivalent of the reference's per-structure loops
(utils_trX2dy/utils.py:185-249). Bin semantics are reproduced exactly:

  bin(x) = sum(edges < x)   -- i.e. left-open intervals
  dist  : edges 2.0, 2.5, ..., 20.0 (37 edges) -> 37 bins; d<=2 or d>20 -> bin 0
  omega : edges -pi + k*pi/12, k=0..23 -> 25 bins, zeroed where dist bin is 0
  theta : same as omega
  phi   : edges k*pi/12, k=0..11 -> 13 bins, zeroed where dist bin is 0

Reference quirk (utils.py:226): the phi histogram is computed by binning the
*theta* values against the phi edges (``Tphi_asym = theta_asym.reshape(...)``).
``phi_compat_bug=True`` (the default) reproduces this behaviour so the
dampening loop matches the reference numerically; pass False for the corrected
binning.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

DIST_EDGES = np.arange(2.0, 20.5, 0.5)            # 37 edges
TORSION_EDGES = np.arange(-np.pi, np.pi, np.pi / 12.0)   # 24 edges
PLANAR_EDGES = np.arange(0.0, np.pi, np.pi / 12.0)       # 12 edges

N_DIST_BINS = 37
N_TORSION_BINS = 25
N_PLANAR_BINS = 13


def _bin_index(x: jnp.ndarray, edges: np.ndarray) -> jnp.ndarray:
    """sum(edges < x) with left-open semantics, matching the reference."""
    e = jnp.asarray(edges, dtype=x.dtype)
    return jnp.sum(e[None, None, :] < x[..., None], axis=-1).astype(jnp.int32)


def bin_geometry_maps(dist, omega=None, theta=None, phi=None,
                      angle: bool = True, phi_compat_bug: bool = True):
    """One-hot histograms of 6D geometry maps.

    Args:
      dist/omega/theta/phi: (L, L) real maps (0 outside the contact mask, as
        produced by geometry_maps_6d).
      angle: when False only the distance histogram is returned.
      phi_compat_bug: reproduce the reference's theta-into-phi-bins binning.

    Returns:
      dict of one-hot float32 histograms:
        dist (L,L,37); and when angle: omega (L,L,25), theta (L,L,25),
        phi (L,L,13).
    """
    jd = _bin_index(dist, DIST_EDGES)
    # d <= 2 -> 0 already; d > 20 -> 37 -> remap to bin 0 (no contact).
    jd = jnp.where(jd >= N_DIST_BINS, 0, jd)
    out = {"dist": jnp.eye(N_DIST_BINS, dtype=jnp.float32)[jd]}
    if not angle:
        return out

    no_contact = jd == 0

    jo = _bin_index(omega, TORSION_EDGES)
    jo = jnp.where(no_contact, 0, jo)
    out["omega"] = jnp.eye(N_TORSION_BINS, dtype=jnp.float32)[jo]

    jt = _bin_index(theta, TORSION_EDGES)
    jt = jnp.where(no_contact, 0, jt)
    out["theta"] = jnp.eye(N_TORSION_BINS, dtype=jnp.float32)[jt]

    phi_src = theta if phi_compat_bug else phi
    jp = _bin_index(phi_src, PLANAR_EDGES)
    jp = jnp.where(no_contact, 0, jp)
    out["phi"] = jnp.eye(N_PLANAR_BINS, dtype=jnp.float32)[jp]
    return out
