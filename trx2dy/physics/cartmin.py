"""Cartesian-DOF refinement — the torsion-space folder's stand-in for the
reference's cartesian passes.

The reference protocol runs a cartesian MinMover after the centroid stages
(folding/folding.py:169 min_mover_cart) and a cartesian-switched FastRelax
round 2 (folding.py:234, data/2relax_round2.txt), where bonds/angles become
degrees of freedom restrained by Rosetta's cart_bonded term. trx2dy's NeRF
backbone keeps bonds/angles ideal forever, so that strain-relief channel is
unreachable from torsion space (VERDICT round 1, Missing #1).

This module adds the channel as an OPTIONAL final stage: per-atom cartesian
displacements on top of the NeRF-built backbone, minimized against
  * the same restraint splines + centroid terms (vdw, hbond, rama, omega —
    torsions re-extracted from the displaced atoms), and
  * a cart_bonded substitute: harmonic bond/angle penalties toward the
    Engh & Huber ideals the NeRF build uses (geometry/nerf.py:30-38), plus
    a CB tether to the virtual-CB position.

Measured effect on the bundled example + the L=300 self-consistency target
is recorded in PARITY.md / EXAMPLE_RESULTS.md (scripts/cart_refine_ab.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from trx2dy.geometry.nerf import (
    BOND_N_CA, BOND_CA_C, BOND_C_N, BOND_C_O,
    ANGLE_N_CA_C, ANGLE_CA_C_N, ANGLE_C_N_CA, ANGLE_CA_C_O,
)
from trx2dy.geometry.transforms import virtual_cb, backbone_torsions
from trx2dy.physics.energy import (
    EnergyWeights, vdw_energy, hbond_energy, rama_energy,
    omega_planarity_energy, pairwise_geometry,
)
from trx2dy.physics.restraints import restraint_energy
from trx2dy.physics.minimize import lbfgs_minimize

_ATOMS = ("N", "CA", "C", "O", "CB")

# cart_bonded-like stiffnesses (Rosetta's cart_bonded length/angle scale)
K_BOND = 300.0     # per A^2
K_ANGLE = 80.0     # per rad^2


def _norm(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-12)


def _angle(a, b, c):
    u, v = a - b, c - b
    cosang = jnp.sum(u * v, axis=-1) / (_norm(u) * _norm(v))
    return jnp.arccos(jnp.clip(cosang, -1.0 + 1e-7, 1.0 - 1e-7))


def cart_bonded_energy(atoms: dict, k_bond: float = K_BOND,
                       k_angle: float = K_ANGLE, res_mask=None):
    """Harmonic ideal-geometry restoring term (cart_bonded substitute)."""
    n, ca, c, o, cb = (atoms[a] for a in _ATOMS)
    L = ca.shape[0]
    m = jnp.ones((L,), bool) if res_mask is None else res_mask
    m2 = m[:-1] & m[1:]

    e = k_bond * jnp.sum(jnp.where(m, (_norm(ca - n) - BOND_N_CA) ** 2, 0.0))
    e += k_bond * jnp.sum(jnp.where(m, (_norm(c - ca) - BOND_CA_C) ** 2, 0.0))
    e += k_bond * jnp.sum(jnp.where(m, (_norm(o - c) - BOND_C_O) ** 2, 0.0))
    e += k_bond * jnp.sum(
        jnp.where(m2, (_norm(n[1:] - c[:-1]) - BOND_C_N) ** 2, 0.0))

    e += k_angle * jnp.sum(
        jnp.where(m, (_angle(n, ca, c) - ANGLE_N_CA_C) ** 2, 0.0))
    e += k_angle * jnp.sum(
        jnp.where(m2, (_angle(ca[:-1], c[:-1], n[1:]) - ANGLE_CA_C_N) ** 2,
                  0.0))
    e += k_angle * jnp.sum(
        jnp.where(m2, (_angle(c[:-1], n[1:], ca[1:]) - ANGLE_C_N_CA) ** 2,
                  0.0))
    e += k_angle * jnp.sum(
        jnp.where(m, (_angle(ca, c, o) - ANGLE_CA_C_O) ** 2, 0.0))

    # centroid CB IS the virtual CB by construction: tether it
    e += k_bond * jnp.sum(jnp.where(m, jnp.sum(
        (cb - virtual_cb(n, ca, c)) ** 2, axis=-1), 0.0))
    return e


def atoms_energy(atoms: dict, rst, masks, w: EnergyWeights, res_mask=None):
    """pose_energy's term sum on EXPLICIT atoms (energy.pose_energy:229-266
    semantics, with torsions re-extracted from the displaced coordinates)."""
    e = _centroid_terms(atoms, w, res_mask)
    if w.atom_pair or w.dihedral or w.angle:
        g = pairwise_geometry(atoms)
        e = e + restraint_energy(rst, masks, g["dist"], g["omega"],
                                 g["theta"], g["phi"],
                                 w.atom_pair, w.dihedral, w.angle)
    return e


def _centroid_terms(atoms: dict, w: EnergyWeights, res_mask=None):
    e = jnp.asarray(0.0, atoms["CA"].dtype)
    if w.vdw:
        e = e + w.vdw * vdw_energy(atoms, res_mask)
    if w.rama or w.omega:
        (phi, psi, omg), _ = backbone_torsions(atoms["N"], atoms["CA"],
                                               atoms["C"])
        if w.rama:
            e = e + w.rama * rama_energy(phi, psi, res_mask)
        if w.omega:
            e = e + w.omega * omega_planarity_energy(omg, res_mask)
    if w.cen_hb:
        e = e + w.cen_hb * hbond_energy(atoms, 1.0, 1.0, res_mask)
    if w.hbond_sr or w.hbond_lr:
        e = e + hbond_energy(atoms, w.hbond_sr, w.hbond_lr, res_mask)
    return e


@functools.partial(jax.jit, static_argnames=("w_tuple", "max_iter", "kind",
                                             "dist_on_ca"))
def _refine_jit(atoms0, tables, w_tuple, max_iter, kind,
                dist_on_ca=False, res_mask=None):
    """Tables are ARGUMENTS (not closure constants) so the dynamics
    sampler's per-step table changes reuse ONE compiled program."""
    w = EnergyWeights(*w_tuple)
    B, L, _ = atoms0["N"].shape

    def unpack(delta):
        d = delta.reshape(B, len(_ATOMS), L, 3)
        return {nm: atoms0[nm] + d[:, i] for i, nm in enumerate(_ATOMS)}

    def restraints_b(atoms_b):
        if kind == "dense":
            rst, masks = tables
            def one(at):
                g = pairwise_geometry(at)
                return restraint_energy(rst, masks, g["dist"], g["omega"],
                                        g["theta"], g["phi"], w.atom_pair,
                                        w.dihedral, w.angle)
            return jax.vmap(one)(atoms_b)
        from trx2dy.physics.compact import compact_restraint_energy_lanes
        return compact_restraint_energy_lanes(
            atoms_b, tables, w.atom_pair, w.dihedral, w.angle,
            dist_on_ca=dist_on_ca)

    def efun(delta):
        atoms = unpack(delta)
        cen = jax.vmap(
            lambda at: _centroid_terms(at, w, res_mask)
            + cart_bonded_energy(at, res_mask=res_mask))(atoms)
        return cen + restraints_b(atoms)

    res = lbfgs_minimize(efun, jnp.zeros((B, len(_ATOMS) * L * 3)),
                         max_iter=max_iter)
    return unpack(res.x), res.f


def cartesian_refine(atoms: dict, rst, masks, w: EnergyWeights,
                     max_iter: int = 200, res_mask=None):
    """Refine a (B, L, 3)-atom ensemble with cartesian DOFs against ONE
    dense restraint set (fold_ensemble's shape).

    Returns (refined atoms dict, (B,) final energies incl. cart_bonded)."""
    return _refine_jit(atoms, (rst, masks), tuple(w), max_iter, "dense",
                       res_mask=res_mask)


def cartesian_refine_lanes(atoms: dict, cl, w: EnergyWeights,
                           max_iter: int = 200, dist_on_ca: bool = False,
                           res_mask=None):
    """Chain-mode refinement: lane k refines against its OWN compacted
    restraint tables (physics/compact.py CompactLanes — the relax-stage
    compact set fold_chains already builds)."""
    return _refine_jit(atoms, cl, tuple(w), max_iter, "lanes",
                       dist_on_ca=dist_on_ca, res_mask=res_mask)
