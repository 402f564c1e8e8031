"""The Dynamics sampling loop: decoy -> measured histograms -> dampened npz.

Reference flow (utils_trX2dy/utils.py:406-475 get_npz_from_pred_pdb +
run_inference.py:16-144 generate_npz_and_pdb): after each folded decoy, bin
its realized geometry into one-hot histograms, suppress the realized peaks of
the current predicted distributions (dampening), renormalize+smooth, and feed
the result to the next minimization — plus an un-normalized "tmp" channel
whose max-abs change drives convergence.

TPU-native differences from the reference:
  * measurement runs on the in-memory decoy atoms (no PDB file round trip;
    the PDB-per-iteration files are still written by the driver for the
    resume contract),
  * the per-pair python dampening loop is the vectorized kernel in
    trx2dy.dynamics.dampen,
  * the whole measure+dampen step is one jitted program.

Faithful quirks kept: virtual CB used for GLY only in the reference —
our decoys' CB IS the virtual CB for all residues (the reference measures
real CBs from its full-atom PDBs; after its G->A mutation the centroid CB is
ideal, so distributions agree within binning resolution); the phi histogram
bins THETA values (binning.phi_compat_bug, utils.py:226).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.geometry.transforms import geometry_maps_6d
from trx2dy.geometry.binning import bin_geometry_maps
from trx2dy.dynamics.dampen import DampenParams, dampen_distribution


class GeomHistograms(NamedTuple):
    """Predicted/processed geometry histograms + convergence channel."""
    dist: jnp.ndarray   # (L, L, 37)
    omega: jnp.ndarray  # (L, L, 25)
    theta: jnp.ndarray  # (L, L, 25)
    phi: jnp.ndarray    # (L, L, 13)
    tmp: jnp.ndarray    # (L, L, 37) un-normalized convergence channel


def histograms_from_npz(npz: dict) -> GeomHistograms:
    """Load a reference-layout npz dict ('tmp' defaults to 'dist',
    utils.py:460-463)."""
    g = lambda k: jnp.asarray(np.asarray(npz[k], np.float32))
    tmp = g("tmp") if "tmp" in npz else g("dist")
    return GeomHistograms(dist=g("dist"), omega=g("omega"), theta=g("theta"),
                          phi=g("phi"), tmp=tmp)


def histograms_to_npz(h: GeomHistograms) -> dict:
    return {"dist": np.asarray(h.dist), "omega": np.asarray(h.omega),
            "theta": np.asarray(h.theta), "phi": np.asarray(h.phi),
            "tmp": np.asarray(h.tmp)}


@jax.jit
def measure_decoy(n, ca, c, cb):
    """Bin one decoy's realized geometry into one-hot histograms.

    Equivalent of get_distribution_from_pdb (utils.py:294-316): dense 20 A
    contact masking replaces the cKDTree, then the pros() binning.
    Returns dict dist/omega/theta/phi of one-hot (L, L, nbins) float32.
    """
    maps = geometry_maps_6d(n, ca, c, cb=cb, dmax=20.0)
    return bin_geometry_maps(maps["dist"], maps["omega"], maps["theta"],
                             maps["phi"], angle=True, phi_compat_bug=True)


@functools.partial(jax.jit, static_argnames=("angle",))
def dampen_step(cur: GeomHistograms, fact: dict, sigma: float = 1.0,
                angle: bool = True,
                params: DampenParams = DampenParams()) -> GeomHistograms:
    """One Dynamics update: dampen all four geometries + the tmp channel.

    Mirrors get_npz_from_pred_pdb (utils.py:406-475): each geometry is
    dampened against its measured one-hot counterpart with renorm+smooth;
    tmp is dampened from the previous tmp with norm=False.
    """
    new_dist = dampen_distribution(cur.dist, fact["dist"], params, norm=True,
                                   smooth=True)
    new_tmp = dampen_distribution(cur.tmp, fact["dist"], params, norm=False)
    if angle:
        new_omega = dampen_distribution(cur.omega, fact["omega"], params,
                                        norm=True, smooth=True)
        new_theta = dampen_distribution(cur.theta, fact["theta"], params,
                                        norm=True, smooth=True)
        new_phi = dampen_distribution(cur.phi, fact["phi"], params,
                                      norm=True, smooth=True)
    else:
        new_omega, new_theta, new_phi = cur.omega, cur.theta, cur.phi
    return GeomHistograms(dist=new_dist, omega=new_omega, theta=new_theta,
                          phi=new_phi, tmp=new_tmp)


def reliability_score(torsions: jnp.ndarray) -> jnp.ndarray:
    """Ramachandran reliability: fraction of interior residues with
    phi in [-180, 0] (utils.py:337-372; psi is always in range).

    Args:
      torsions: (3, L) [phi; psi; omega]. Interior = residues 1..L-2, the
        ones BioPython's PPBuilder reports both angles for.
    """
    phi = torsions[0]
    L = phi.shape[0]
    w = jnp.mod(phi + jnp.pi, 2.0 * jnp.pi) - jnp.pi   # wrap to (-pi, pi]
    ok = (w >= -jnp.pi) & (w <= 0.0)
    interior = (jnp.arange(L) >= 1) & (jnp.arange(L) <= L - 2)
    return jnp.sum(ok & interior) / jnp.maximum(jnp.sum(interior), 1)


def convergence_delta(old: GeomHistograms, new: GeomHistograms) -> float:
    """max |delta tmp| — the driver's convergence statistic
    (run_inference.py:135-137)."""
    return float(jnp.max(jnp.abs(old.tmp - new.tmp)))
