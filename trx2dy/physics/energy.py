"""Centroid-level energy terms — the PyRosetta score-function replacement.

The reference folder scores poses with four Rosetta centroid score functions
(folding/folding.py:74-84; weight files folding/data/scorefxn*.wts):

  scorefxn  : cen_hb 5.0, rama 1.0, omega 0.5, vdw 1.0, constraints 5/4/4
  scorefxn1 : same but vdw 3.0, constraints 3/1/1
  scorefxn_vdw : rama 1.0, vdw 1.0
  scorefxn_cart: hbond_sr_bb 3.0, hbond_lr_bb 3.0, rama 1.0, omega 0.5,
                 vdw 0.5, cart_bonded 0.1, constraints 5/4/4

Those C++ terms are re-derived here as smooth, fully-differentiable JAX
functions over the NeRF-built backbone (N, CA, C, O, CB):

  vdw    — soft-sphere repulsion over all backbone-atom pairs with
           |i-j| >= 2 (bonded/1-3/1-4 neighbours excluded by construction;
           bond lengths/angles are ideal in torsion space).
  rama   — negative log of a 6-basin von Mises mixture built from the same
           basin table the reference samples initial torsions from
           (utils_ros.py:674-696).
  omega  — harmonic backbone-omega planarity about 180 deg.
  cen_hb — backbone O(i)..N(j) hydrogen-bond well with C=O..N directionality
           (substitute for Rosetta's centroid cen_hb; parity is
           distributional per BASELINE.json, not term-by-term).
  cart_bonded — zero by construction (ideal internal coordinates).

Parity note: Rosetta's exact functional forms are not public-contract here;
the driver metric is ensemble TM/RMSD distribution parity (BASELINE.md), and
the dominant terms by weight and count are the spline restraints, which ARE
exact (trx2dy.physics.restraints).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.geometry.nerf import build_backbone
from trx2dy.geometry.transforms import dihedral, bond_angle
from trx2dy.physics.restraints import RestraintSet, RestraintMasks, restraint_energy

_HI = jax.lax.Precision.HIGHEST


class EnergyWeights(NamedTuple):
    """One Rosetta-style score function as term weights."""
    cen_hb: float = 0.0
    rama: float = 0.0
    omega: float = 0.0
    vdw: float = 0.0
    atom_pair: float = 0.0   # atom_pair_constraint
    dihedral: float = 0.0    # dihedral_constraint
    angle: float = 0.0       # angle_constraint
    hbond_sr: float = 0.0    # hbond_sr_bb (|i-j| < 5)
    hbond_lr: float = 0.0    # hbond_lr_bb


# folding/data/scorefxn.wts
SCOREFXN_CENT = EnergyWeights(cen_hb=5.0, rama=1.0, omega=0.5, vdw=1.0,
                              atom_pair=5.0, dihedral=4.0, angle=4.0)
# folding/data/scorefxn1.wts
SCOREFXN1 = EnergyWeights(cen_hb=5.0, rama=1.0, omega=0.5, vdw=3.0,
                          atom_pair=3.0, dihedral=1.0, angle=1.0)
# folding/data/scorefxn_vdw.wts
SCOREFXN_VDW = EnergyWeights(rama=1.0, vdw=1.0)
# folding/data/scorefxn_cart.wts (cart_bonded 0.1 is identically 0 here)
SCOREFXN_CART = EnergyWeights(hbond_sr=3.0, hbond_lr=3.0, rama=1.0, omega=0.5,
                              vdw=0.5, atom_pair=5.0, dihedral=4.0, angle=4.0)

# Backbone atom order and soft-sphere radii (A). CB uses the ALA-like radius —
# the reference mutates G->A before centroid minimization (folding.py:112-117).
ATOM_ORDER = ("N", "CA", "C", "O", "CB")
ATOM_RADII = np.array([1.65, 1.90, 1.90, 1.48, 1.90], dtype=np.float32)

# Ramachandran 6-basin table (phi_deg, psi_deg, weight) — utils_ros.py:674-696
RAMA_BASINS = np.array([
    [-140.0, 153.0, 0.135],
    [-72.0, 145.0, 0.155],
    [-122.0, 117.0, 0.073],
    [-82.0, -14.0, 0.122],
    [-61.0, -41.0, 0.497],
    [57.0, 39.0, 0.018],
], dtype=np.float32)
RAMA_KAPPA = 8.0  # von Mises concentration (~basin half-width 25 deg)

OMEGA_SIGMA = np.deg2rad(10.0)  # backbone-omega planarity width


def vdw_energy(atoms: dict, res_mask=None) -> jnp.ndarray:
    """Soft-sphere repulsion: sum over backbone-atom pairs with |i-j| >= 2 of
    ((sigma^2 - d^2)/sigma)^2 for d < sigma (Rosetta centroid vdw shape).

    res_mask: optional (L,) bool — False residues (length-bucket padding)
    contribute nothing."""
    L = atoms["CA"].shape[0]
    xyz = jnp.stack([atoms[a] for a in ATOM_ORDER], axis=1)   # (L, 5, 3)
    radii = jnp.asarray(ATOM_RADII)
    flat = xyz.reshape(L * 5, 3)
    r = jnp.tile(radii, L)
    # |a-b|^2 via the Gram matrix: one (N,3)x(3,N) MXU matmul instead of a
    # (N,N,3) broadcast-difference tensor (3x HBM traffic at N=5L)
    sq = jnp.sum(flat * flat, axis=-1)
    gram = jnp.matmul(flat, flat.T, precision=_HI)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
    sig = r[:, None] + r[None, :]
    res = jnp.repeat(jnp.arange(L), 5)
    sep_ok = jnp.abs(res[:, None] - res[None, :]) >= 2
    upper = jnp.arange(L * 5)[:, None] < jnp.arange(L * 5)[None, :]
    pair_ok = sep_ok & upper
    if res_mask is not None:
        am = jnp.repeat(res_mask, 5)
        pair_ok = pair_ok & am[:, None] & am[None, :]
    viol = jnp.maximum(sig * sig - d2, 0.0) / sig
    return jnp.sum(jnp.where(pair_ok, viol * viol, 0.0))


def rama_energy(phi: jnp.ndarray, psi: jnp.ndarray,
                res_mask=None) -> jnp.ndarray:
    """-log of the 6-basin von Mises mixture, summed over interior residues
    (both phi and psi defined: residues 1..L-2)."""
    basins = jnp.asarray(RAMA_BASINS)
    c_phi = jnp.deg2rad(basins[:, 0])
    c_psi = jnp.deg2rad(basins[:, 1])
    w = basins[:, 2]
    # (L, 6) log-likelihood per basin
    ll = (RAMA_KAPPA * (jnp.cos(phi[:, None] - c_phi[None, :]) - 1.0)
          + RAMA_KAPPA * (jnp.cos(psi[:, None] - c_psi[None, :]) - 1.0))
    e = -jax.scipy.special.logsumexp(ll, axis=-1, b=w[None, :])
    L = phi.shape[0]
    interior = (jnp.arange(L) >= 1) & (jnp.arange(L) <= L - 2)
    if res_mask is not None:
        # padding is a suffix: interior = real residues with a real successor
        nxt = jnp.roll(res_mask, -1).at[-1].set(False)
        interior = interior & res_mask & nxt
    return jnp.sum(jnp.where(interior, e, 0.0))


def omega_planarity_energy(omega: jnp.ndarray, res_mask=None) -> jnp.ndarray:
    """Harmonic penalty on trans-peptide deviation, residues 0..L-2.

    Uses 1-cos so the potential is smooth and periodic; near 180 deg it
    matches 0.5*(delta/sigma)^2."""
    L = omega.shape[0]
    valid = jnp.arange(L) < L - 1
    if res_mask is not None:
        nxt = jnp.roll(res_mask, -1).at[-1].set(False)
        valid = valid & res_mask & nxt
    dev = 1.0 - jnp.cos(omega - jnp.pi)            # ~ delta^2/2 near pi
    return jnp.sum(jnp.where(valid, dev / (OMEGA_SIGMA ** 2), 0.0))


def hbond_energy(atoms: dict, w_sr: float, w_lr: float,
                 res_mask=None) -> jnp.ndarray:
    """Backbone H-bond substitute: O(i)..N(j) distance well x directionality.

    e_ij = -g(d_ON) * a(C(i)-O(i)..N(j)) * a(O(i)..N(j)-CA(j)) for |i-j| >= 2,
    g a Gaussian well at 2.95 A, a() favouring near-linear acceptor geometry.
    Split into short-range (|i-j| < 5, helices/turns) and long-range (sheets)
    to mirror hbond_sr_bb / hbond_lr_bb (folding/data/scorefxn_cart.wts).
    """
    O, N, C, CA = atoms["O"], atoms["N"], atoms["C"], atoms["CA"]
    L = O.shape[0]
    sqo = jnp.sum(O * O, axis=-1)
    sqn = jnp.sum(N * N, axis=-1)
    gram = jnp.matmul(O, N.T, precision=_HI)
    d = jnp.sqrt(jnp.maximum(sqo[:, None] + sqn[None, :] - 2.0 * gram, 0.0)
                 + 1e-12)
    g = jnp.exp(-((d - 2.95) ** 2) / (2.0 * 0.35 ** 2))

    # acceptor directionality: angle C(i)-O(i)-N(j) near 180 deg
    co = O - C                                      # (L, 3) C=O bond vector
    on = N[None, :, :] - O[:, None, :]              # (L, L, 3)
    cos_a = jnp.sum(co[:, None, :] * on, axis=-1) / (
        jnp.linalg.norm(co, axis=-1)[:, None] * (d + 1e-8))
    a_acc = jnp.maximum(cos_a, 0.0) ** 2

    # donor-side: O approaches N from outside the N-CA bond
    nca = CA - N
    cos_d = jnp.sum(-on * nca[None, :, :], axis=-1) / (
        jnp.linalg.norm(nca, axis=-1)[None, :] * (d + 1e-8))
    a_don = jnp.maximum(-cos_d, 0.0)   # linear: sqrt would have inf grad at 0

    sep = jnp.abs(jnp.arange(L)[:, None] - jnp.arange(L)[None, :])
    ok = jnp.ones((L, L), bool)
    if res_mask is not None:
        ok = res_mask[:, None] & res_mask[None, :]
    e = -g * a_acc * a_don
    e_sr = jnp.sum(jnp.where(ok & (sep >= 2) & (sep < 5), e, 0.0))
    e_lr = jnp.sum(jnp.where(ok & (sep >= 5), e, 0.0))
    return w_sr * e_sr + w_lr * e_lr


def pairwise_geometry(atoms: dict) -> dict:
    """Dense (L, L) dist/omega/theta/phi maps for restraint evaluation.

    Unlike geometry_maps_6d this applies NO contact cutoff: Rosetta evaluates
    every active spline restraint at the current geometry regardless of
    distance, and the dist spline's linear extrapolation supplies the
    long-range attractive gradient.

    Gradient safety: diagonal (i==j) pairs would hit arctan2(0,0)/arccos(+-1)
    whose NaN/inf cotangents leak through jnp.where masking. The j-side atoms
    are therefore displaced by a constant offset on the diagonal BEFORE the
    angle math (the standard double-where trick) — diagonal values are
    garbage but finite, and every consumer masks the diagonal out."""
    n, ca, cb = atoms["N"], atoms["CA"], atoms["CB"]
    L = ca.shape[0]
    eye = jnp.eye(L, dtype=bool)[..., None]
    off = jnp.asarray([7.3, 5.1, 3.7], cb.dtype)   # arbitrary non-degenerate
    sq = jnp.sum(cb * cb, axis=-1)
    gram = jnp.matmul(cb, cb.T, precision=_HI)
    d = jnp.sqrt(jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
                 + 1e-12)
    ca_i = jnp.broadcast_to(ca[:, None, :], (L, L, 3))
    ca_j = jnp.where(eye, ca[None, :, :] + off, ca[None, :, :])
    cb_i = jnp.broadcast_to(cb[:, None, :], (L, L, 3))
    cb_j = jnp.where(eye, cb[None, :, :] + off, cb[None, :, :])
    n_i = jnp.broadcast_to(n[:, None, :], (L, L, 3))
    return {
        "dist": d,
        "omega": dihedral(ca_i, cb_i, cb_j, ca_j),
        "theta": dihedral(n_i, ca_i, cb_i, cb_j),
        "phi": bond_angle(ca_i, cb_i, cb_j),
    }


def pose_energy(torsions: jnp.ndarray, rst: RestraintSet,
                masks: RestraintMasks, w: EnergyWeights,
                dist_on_ca: bool = False, res_mask=None) -> jnp.ndarray:
    """Total energy of one decoy parameterized by backbone torsions.

    Args:
      torsions: (3, L) [phi; psi; omega] in radians.
      w: static EnergyWeights (a python NamedTuple of floats — closure
        constant under jit, so zero-weight terms compile away).
      dist_on_ca: static; evaluate the distance restraints on CA-CA instead
        of CB-CB (the af2-distogram mode, utils_ros.py:188 'AtomPair CA').
    """
    phi, psi, omg = torsions[0], torsions[1], torsions[2]
    atoms = build_backbone(phi, psi, omg)
    e = jnp.asarray(0.0, torsions.dtype)
    if w.vdw:
        e = e + w.vdw * vdw_energy(atoms, res_mask)
    if w.rama:
        e = e + w.rama * rama_energy(phi, psi, res_mask)
    if w.omega:
        e = e + w.omega * omega_planarity_energy(omg, res_mask)
    if w.cen_hb:
        e = e + w.cen_hb * hbond_energy(atoms, 1.0, 1.0, res_mask)
    if w.hbond_sr or w.hbond_lr:
        e = e + hbond_energy(atoms, w.hbond_sr, w.hbond_lr, res_mask)
    if w.atom_pair or w.dihedral or w.angle:
        g = pairwise_geometry(atoms)
        dist = g["dist"]
        if dist_on_ca:
            ca = atoms["CA"]
            # epsilon under the sqrt (not added to the vector) — keeps the
            # diagonal gradient finite without biasing distances, same
            # pattern as the weighted path below
            d2 = jnp.sum((ca[:, None, :] - ca[None, :, :]) ** 2, axis=-1)
            dist = jnp.sqrt(d2 + 1e-12)
        e = e + restraint_energy(rst, masks, dist, g["omega"], g["theta"],
                                 g["phi"], w.atom_pair, w.dihedral, w.angle)
    return e


# --------------------------------------------------------------------------
# weighted-by-array energy: one compiled program serves every score function
# --------------------------------------------------------------------------

# order of the weight vector (matches EnergyWeights fields)
WEIGHT_FIELDS = EnergyWeights._fields


def weights_to_vec(w: EnergyWeights) -> np.ndarray:
    # host constant; becomes a traced (9,) jit argument at the program
    # boundary (no eager device dispatch on the per-step path)
    return np.asarray([getattr(w, f) for f in WEIGHT_FIELDS], np.float32)


def pose_energy_weighted(torsions: jnp.ndarray, rst: RestraintSet,
                         masks: RestraintMasks, w_vec: jnp.ndarray,
                         dist_on_ca: bool = False,
                         res_mask=None) -> jnp.ndarray:
    """pose_energy with the score-function weights as a TRACED (9,) vector.

    Every term is always computed; stages differ only in data. This lets the
    staged protocol reuse ONE compiled L-BFGS program for all score
    functions (centroid / sf1 / vdw / cart / relax), cutting compile time
    ~10x versus tracing the whole multi-stage protocol into one program.
    """
    w = dict(zip(WEIGHT_FIELDS, w_vec))
    phi, psi, omg = torsions[0], torsions[1], torsions[2]
    atoms = build_backbone(phi, psi, omg)
    e = w["vdw"] * vdw_energy(atoms, res_mask)
    e = e + w["rama"] * rama_energy(phi, psi, res_mask)
    e = e + w["omega"] * omega_planarity_energy(omg, res_mask)
    # hbond components shared between cen_hb (sr+lr at weight 1) and the
    # cart-flavour hbond_sr/hbond_lr terms
    e = e + hbond_energy(atoms, w["cen_hb"] + w["hbond_sr"],
                         w["cen_hb"] + w["hbond_lr"], res_mask)
    g = pairwise_geometry(atoms)
    dist = g["dist"]
    if dist_on_ca:
        ca = atoms["CA"]
        # epsilon under the sqrt (not added to the vector): finite diagonal
        # gradient without biasing distances, same as pose_energy's af2 path
        d2 = jnp.sum((ca[:, None, :] - ca[None, :, :]) ** 2, axis=-1)
        dist = jnp.sqrt(d2 + 1e-12)
    e = e + restraint_energy(rst, masks, dist, g["omega"], g["theta"],
                             g["phi"], w["atom_pair"], w["dihedral"],
                             w["angle"])
    return e


def pose_energy_weighted_compact(torsions: jnp.ndarray, cr,
                                 w_vec: jnp.ndarray,
                                 dist_on_ca: bool = False,
                                 res_mask=None) -> jnp.ndarray:
    """pose_energy_weighted with restraints over compacted active-pair lists
    (physics.compact) instead of dense masked (L, L) maps — the staged
    folder's production energy path (~3-5x less HBM traffic; identical
    per-pair numerics)."""
    from trx2dy.physics.compact import compact_restraint_energy

    w = dict(zip(WEIGHT_FIELDS, w_vec))
    phi, psi, omg = torsions[0], torsions[1], torsions[2]
    atoms = build_backbone(phi, psi, omg)
    e = w["vdw"] * vdw_energy(atoms, res_mask)
    e = e + w["rama"] * rama_energy(phi, psi, res_mask)
    e = e + w["omega"] * omega_planarity_energy(omg, res_mask)
    e = e + hbond_energy(atoms, w["cen_hb"] + w["hbond_sr"],
                         w["cen_hb"] + w["hbond_lr"], res_mask)
    return e + compact_restraint_energy(atoms, cr, w["atom_pair"],
                                        w["dihedral"], w["angle"],
                                        dist_on_ca)


def batched_energy_weighted_compact(x: jnp.ndarray, cr,
                                    w_vec: jnp.ndarray,
                                    dist_on_ca: bool = False,
                                    res_mask=None) -> jnp.ndarray:
    """(B, 3L) flattened torsions -> (B,) energies over compacted pairs.

    The staged folder's production path. Base terms vmap per decoy; the
    restraint terms run as ONE pair-major batched evaluation
    (compact_restraint_energy_batch) so atom selection is MXU matmuls with
    the batch in the matmul's N dimension rather than per-decoy gathers."""
    from trx2dy.physics.compact import compact_restraint_energy_batch

    w = dict(zip(WEIGHT_FIELDS, w_vec))
    B = x.shape[0]
    t = x.reshape(B, 3, -1)
    atoms_b = jax.vmap(lambda tt: build_backbone(tt[0], tt[1], tt[2]))(t)

    def base(tt, atoms):
        e = w["vdw"] * vdw_energy(atoms, res_mask)
        e = e + w["rama"] * rama_energy(tt[0], tt[1], res_mask)
        e = e + w["omega"] * omega_planarity_energy(tt[2], res_mask)
        return e + hbond_energy(atoms, w["cen_hb"] + w["hbond_sr"],
                                w["cen_hb"] + w["hbond_lr"], res_mask)

    e_base = jax.vmap(base)(t, atoms_b)
    return e_base + compact_restraint_energy_batch(
        atoms_b, cr, w["atom_pair"], w["dihedral"], w["angle"], dist_on_ca)


def batched_energy_weighted_lanes(x: jnp.ndarray, cl,
                                  w_vec: jnp.ndarray,
                                  dist_on_ca: bool = False,
                                  res_mask=None) -> jnp.ndarray:
    """(M, 3L) -> (M,) chain-mode energies: lane k has its OWN compacted
    restraint tables (one dampening chain per lane, folder.fold_chains)."""
    from trx2dy.physics.compact import compact_restraint_energy_lanes

    w = dict(zip(WEIGHT_FIELDS, w_vec))
    M = x.shape[0]
    t = x.reshape(M, 3, -1)
    atoms_b = jax.vmap(lambda tt: build_backbone(tt[0], tt[1], tt[2]))(t)

    def base(tt, atoms):
        e = w["vdw"] * vdw_energy(atoms, res_mask)
        e = e + w["rama"] * rama_energy(tt[0], tt[1], res_mask)
        e = e + w["omega"] * omega_planarity_energy(tt[2], res_mask)
        return e + hbond_energy(atoms, w["cen_hb"] + w["hbond_sr"],
                                w["cen_hb"] + w["hbond_lr"], res_mask)

    e_base = jax.vmap(base)(t, atoms_b)
    return e_base + compact_restraint_energy_lanes(
        atoms_b, cl, w["atom_pair"], w["dihedral"], w["angle"], dist_on_ca)


def batched_energy_weighted_union(x: jnp.ndarray, ur, acts,
                                  w_vec: jnp.ndarray,
                                  dist_on_ca: bool = False,
                                  res_mask=None) -> jnp.ndarray:
    """(C, 3L) -> (C,) chain-mode energies over a SHARED pair list with
    per-lane tables (compact.UnionRestraints — the device-resident chain
    path, folder.fold_chains_pool)."""
    from trx2dy.physics.compact import compact_restraint_energy_union

    w = dict(zip(WEIGHT_FIELDS, w_vec))
    C = x.shape[0]
    t = x.reshape(C, 3, -1)
    atoms_b = jax.vmap(lambda tt: build_backbone(tt[0], tt[1], tt[2]))(t)

    def base(tt, atoms):
        e = w["vdw"] * vdw_energy(atoms, res_mask)
        e = e + w["rama"] * rama_energy(tt[0], tt[1], res_mask)
        e = e + w["omega"] * omega_planarity_energy(tt[2], res_mask)
        return e + hbond_energy(atoms, w["cen_hb"] + w["hbond_sr"],
                                w["cen_hb"] + w["hbond_lr"], res_mask)

    e_base = jax.vmap(base)(t, atoms_b)
    return e_base + compact_restraint_energy_union(
        atoms_b, ur, acts, w["atom_pair"], w["dihedral"], w["angle"],
        dist_on_ca)


def pose_base_and_geometry(torsions: jnp.ndarray, w_vec: jnp.ndarray,
                           dist_on_ca: bool = False):
    """Per-decoy non-restraint energy + the four geometry query maps.

    Split out so the batched caller can evaluate the spline restraints with
    the fused Pallas kernel over the whole decoy batch at once
    (trx2dy.ops.spline_energy) instead of per-decoy one-hot interpolation.
    """
    w = dict(zip(WEIGHT_FIELDS, w_vec))
    phi, psi, omg = torsions[0], torsions[1], torsions[2]
    atoms = build_backbone(phi, psi, omg)
    e = w["vdw"] * vdw_energy(atoms)
    e = e + w["rama"] * rama_energy(phi, psi)
    e = e + w["omega"] * omega_planarity_energy(omg)
    e = e + hbond_energy(atoms, w["cen_hb"] + w["hbond_sr"],
                         w["cen_hb"] + w["hbond_lr"])
    g = pairwise_geometry(atoms)
    dist = g["dist"]
    if dist_on_ca:
        ca = atoms["CA"]
        sq = jnp.sum(ca * ca, axis=-1)
        gram = jnp.matmul(ca, ca.T, precision=_HI)
        dist = jnp.sqrt(jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram,
                                    0.0) + 1e-12)
    return e, dist, g["omega"], g["theta"], g["phi"]


def batched_energy_fused(x: jnp.ndarray, rst: RestraintSet,
                         masks: RestraintMasks, w_vec: jnp.ndarray,
                         dist_on_ca: bool = False) -> jnp.ndarray:
    """(B, 3L) -> (B,) energies with the fused Pallas spline kernel.

    Shared restraint tables across the batch (the non-chain fold path).
    """
    from trx2dy.ops.spline_energy import spline_energy_batch

    B = x.shape[0]
    t = x.reshape(B, 3, -1)
    e_base, qd, qo, qt, qp = jax.vmap(
        pose_base_and_geometry, in_axes=(0, None, None))(t, w_vec, dist_on_ca)
    w = dict(zip(WEIGHT_FIELDS, w_vec))
    e = e_base
    e = e + w["atom_pair"] * spline_energy_batch(
        rst.dist.y, rst.dist.m, rst.dist.x, qd, masks.dist)
    e = e + w["dihedral"] * spline_energy_batch(
        rst.omega.y, rst.omega.m, rst.omega.x, qo, masks.omega)
    e = e + w["dihedral"] * spline_energy_batch(
        rst.theta.y, rst.theta.m, rst.theta.x, qt, masks.theta)
    e = e + w["angle"] * spline_energy_batch(
        rst.phi.y, rst.phi.m, rst.phi.x, qp, masks.phi)
    return e
