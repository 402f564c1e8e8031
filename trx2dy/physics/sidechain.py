"""Sidechain packing: backbone decoys -> full-atom (atom14) structures.

The reference's FastRelax phase relaxes with sidechain DoFs in the
full-atom `fa_standard` residue set and dumps full-atom PDBs
(folding/folding.py:200-273, mmap.set_chi(True) :224-228); it also
re-detects disulfide bonds (`-detect_disulf` init flag folding.py:48,
`detect_disulfides()` :233). The TPU-native equivalent packs chi torsions
for the whole decoy ensemble as ONE batched L-BFGS over (B, L, 4) angles:

  build   — backbone rigid frames from the folded N/CA/C (Gram-Schmidt,
            rigid_utils.py:1226 convention) + the AF2 torsion->frames->
            atom14 machinery already validated against the reference's
            ProtConverter (trx2dy.models.structure_module);
  energy  — soft-sphere clash over atom14 pairs (AF2 van der Waals radii,
            protein_constants.py:429) + a rotamer prior (von Mises mixture
            at the -60/60/180 staggered chi minima) + a harmonic disulfide
            well on detected CYS SG pairs;
  pack    — vmapped L-BFGS over the chi angles, backbone frozen.

The backbone atoms of the emitted atom14 are overwritten with the folded
NeRF coordinates so packing NEVER moves the backbone (TM/RMSD metrics are
bit-identical with and without packing).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.geometry.nerf import build_backbone
from trx2dy.geometry.rigid import Rigid, make_transform_from_reference
from trx2dy.geometry.transforms import dihedral
from trx2dy.models import constants as rc
from trx2dy.models.structure_module import (
    torsion_angles_to_frames, frames_to_atom14,
)
from trx2dy.physics.minimize import lbfgs_minimize

_HI = jax.lax.Precision.HIGHEST

# atom14 slots of the backbone atoms (AF2 layout: N, CA, C, O first four,
# CB fifth where present)
_BB_SLOTS = {"N": 0, "CA": 1, "C": 2, "O": 3}
_CB_SLOT = 4

# staggered chi rotamer minima and prior width
_ROTAMER_CENTERS = np.deg2rad([-60.0, 60.0, 180.0]).astype(np.float32)
_ROTAMER_KAPPA = 4.0
W_CLASH = 1.0
W_ROTAMER = 0.25
W_SS = 10.0
SS_BOND_LENGTH = 2.05      # S-S bond (A)
SS_DETECT_CB = 4.5         # CB-CB detection cutoff (Rosetta's default ~4.5 A)
CLASH_TOL = 0.5            # soft tolerance subtracted from radii sums (A)


def _atom14_radii() -> np.ndarray:
    """(21, 14) van der Waals radius by element of each atom14 slot."""
    rad = np.zeros((rc.restype_num + 1, 14), np.float32)
    for r in range(rc.restype_num + 1):
        for a in range(14):
            name = str(rc.atom14_names[r, a])
            if name:
                rad[r, a] = rc.van_der_waals_radius[name[0]]
    return rad


ATOM14_RADII = _atom14_radii()


class PackInput(NamedTuple):
    """Static per-target arrays shared across the decoy batch."""
    aatype: jnp.ndarray        # (L,) int
    radii: jnp.ndarray         # (L, 14)
    atom_mask: jnp.ndarray     # (L, 14)
    chi_mask: jnp.ndarray      # (L, 4)
    sg_slot: int               # atom14 slot of CYS SG


def pack_input(seq: str) -> PackInput:
    aatype = rc.sequence_to_aatype(seq)
    cys = rc.restype_order.get("C", 1)
    sg_slot = int(np.argmax(rc.atom14_names[cys] == "SG"))
    return PackInput(
        aatype=jnp.asarray(aatype),
        radii=jnp.asarray(ATOM14_RADII[aatype]),
        atom_mask=jnp.asarray(rc.restype_atom14_mask[aatype]),
        chi_mask=jnp.asarray(rc.chi_angles_mask[aatype], jnp.float32),
        sg_slot=sg_slot,
    )


def atom14_from_torsions(torsions: jnp.ndarray, chi: jnp.ndarray,
                         pin: PackInput, pin_backbone: bool = True,
                         backbone=None):
    """(3, L) backbone torsions + (L, 4) chi -> (L, 14, 3) atom14.

    The psi rigid-group angle equals our psi torsion variable: NeRF places
    O at dihedral(N, CA, C, O) = psi + pi (geometry/nerf.py:183-184) and
    the AF2 psi group's literature O satisfies the same convention
    (validated geometrically in tests/test_sidechain.py).

    backbone: optional explicit N/CA/C/O/CB atom dict — sidechains pack
    onto THESE coordinates instead of the ideal NeRF build (the
    cartesian-refined backbone keeps its small non-ideal displacements,
    like Rosetta's full-atom pose after a cart pass)."""
    phi, psi, _ = torsions[0], torsions[1], torsions[2]
    atoms = backbone if backbone is not None else \
        build_backbone(torsions[0], torsions[1], torsions[2])
    bb = make_transform_from_reference(atoms["N"], atoms["CA"], atoms["C"])
    L = phi.shape[0]

    chi = chi * pin.chi_mask
    ang = jnp.stack([jnp.sin(chi), jnp.cos(chi)], axis=-1)     # (L, 4, 2)
    zero = jnp.zeros((L, 1, 2)).at[..., 1].set(1.0)
    # alpha slots: pre-omega, phi (atom14-empty groups), psi, chi1..4
    psi_ang = jnp.stack([jnp.sin(psi), jnp.cos(psi)], axis=-1)[:, None]
    alpha = jnp.concatenate([zero, zero, psi_ang, ang], axis=-2)  # (L, 7, 2)

    frames = torsion_angles_to_frames(bb, alpha, pin.aatype)
    xyz, mask = frames_to_atom14(frames, pin.aatype)

    if pin_backbone:
        # pin the backbone to the folded coordinates exactly
        for name, slot in _BB_SLOTS.items():
            xyz = xyz.at[:, slot].set(atoms[name])
    return xyz, mask, atoms


def detect_disulfides(cb: np.ndarray, seq: str,
                      cutoff: float = SS_DETECT_CB) -> np.ndarray:
    """Greedy CYS pairing by CB-CB distance (host-side).

    Mirrors the reference's detect_disulfides at the resolution available
    pre-packing (folding.py:48,233). Returns (n_pairs, 2) int array."""
    cys = np.array([i for i, a in enumerate(seq) if a == "C"])
    pairs = []
    if len(cys) >= 2:
        d = np.linalg.norm(cb[cys][:, None] - cb[cys][None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        used = set()
        for k in np.argsort(d, axis=None):
            i, j = np.unravel_index(k, d.shape)
            if i in used or j in used or d[i, j] > cutoff:
                continue
            pairs.append((int(cys[i]), int(cys[j])))
            used.update((int(i), int(j)))
    return np.asarray(pairs, np.int32).reshape(-1, 2)


def _clash_energy(xyz: jnp.ndarray, pin: PackInput) -> jnp.ndarray:
    """Soft-sphere repulsion over atom14 pairs of DIFFERENT residues
    (plus own-backbone N/O vs delta-and-beyond sidechain atoms).

    Backbone-backbone pairs contribute no chi gradient; they are excluded
    to keep the objective a pure packing score. Adjacent-residue pairs
    where both atoms are backbone/CB (bonded or 1-3/1-4 through the
    peptide bond) are excluded."""
    L = xyz.shape[0]
    flat = xyz.reshape(L * 14, 3)
    r = pin.radii.reshape(-1)
    amask = pin.atom_mask.reshape(-1)
    sq = jnp.sum(flat * flat, axis=-1)
    gram = jnp.matmul(flat, flat.T, precision=_HI)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)

    res = jnp.repeat(jnp.arange(L), 14)
    slot = jnp.tile(jnp.arange(14), L)
    is_bb = slot <= _CB_SLOT
    same = res[:, None] == res[None, :]
    adjacent = jnp.abs(res[:, None] - res[None, :]) == 1
    bb_pair = is_bb[:, None] & is_bb[None, :]
    sidechain_pair = ~bb_pair
    # intra-residue: only N/O vs atoms >= slot 6 (delta and beyond; the
    # gamma 1-4 pairs are left to the rotamer prior)
    no = (slot == 0) | (slot == 3)
    deep = slot >= 6
    intra_ok = same & ((no[:, None] & deep[None, :])
                       | (deep[:, None] & no[None, :]))
    inter_ok = ~same & sidechain_pair & ~(adjacent & bb_pair)
    pair_mask = ((intra_ok | inter_ok)
                 & (amask[:, None] * amask[None, :] > 0)
                 & (jnp.arange(L * 14)[:, None] < jnp.arange(L * 14)[None, :]))

    sig = jnp.maximum(r[:, None] + r[None, :] - CLASH_TOL, 1e-3)
    viol = jnp.maximum(sig * sig - d2, 0.0) / sig
    return jnp.sum(jnp.where(pair_mask, viol * viol, 0.0))


def _rotamer_energy(chi: jnp.ndarray, pin: PackInput) -> jnp.ndarray:
    """-log von Mises mixture at the staggered minima, per active chi."""
    ll = _ROTAMER_KAPPA * (jnp.cos(chi[..., None]
                                   - jnp.asarray(_ROTAMER_CENTERS)) - 1.0)
    e = -jax.scipy.special.logsumexp(
        ll, axis=-1, b=jnp.full((3,), 1.0 / 3.0))
    return jnp.sum(e * pin.chi_mask)


def _disulfide_energy(xyz: jnp.ndarray, pairs: jnp.ndarray,
                      pin: PackInput) -> jnp.ndarray:
    """Harmonic well |SG_i - SG_j| -> 2.05 A over detected pairs."""
    if pairs.shape[0] == 0:
        return jnp.asarray(0.0, xyz.dtype)
    sg = xyz[:, pin.sg_slot]
    d = jnp.linalg.norm(sg[pairs[:, 0]] - sg[pairs[:, 1]] + 1e-9, axis=-1)
    return jnp.sum((d - SS_BOND_LENGTH) ** 2)


def _pack_energy(chi_flat: jnp.ndarray, torsions: jnp.ndarray,
                 pairs: jnp.ndarray, pin: PackInput,
                 backbone=None) -> jnp.ndarray:
    L = torsions.shape[-1]
    chi = chi_flat.reshape(L, 4)
    xyz, _, _ = atom14_from_torsions(torsions, chi, pin, backbone=backbone)
    return (W_CLASH * _clash_energy(xyz, pin)
            + W_ROTAMER * _rotamer_energy(chi, pin)
            + W_SS * _disulfide_energy(xyz, pairs, pin))


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _pack_jit(torsions: jnp.ndarray, chi0: jnp.ndarray, pairs: jnp.ndarray,
              pin: PackInput, max_iter: int, backbone=None):
    """(B, 3, L) torsions + (B, L, 4) chi0 -> packed atom14 (B, L, 14, 3)."""
    B, _, L = torsions.shape
    bb_ax = None if backbone is None else 0

    def fun(chi_flat):
        return jax.vmap(_pack_energy, in_axes=(0, 0, None, None, bb_ax))(
            chi_flat, torsions, pairs, pin, backbone)

    res = lbfgs_minimize(fun, chi0.reshape(B, L * 4), max_iter=max_iter)
    chi = res.x.reshape(B, L, 4)
    xyz, mask, _ = jax.vmap(atom14_from_torsions,
                            in_axes=(0, 0, None, None, bb_ax))(
        torsions, chi, pin, True, backbone)
    return xyz, mask, chi, res.f


def pack_ensemble(torsions, seq: str, max_iter: int = 150,
                  pairs: Optional[np.ndarray] = None, backbone=None):
    """Pack sidechains for a (B, 3, L) torsion ensemble.

    Returns (atom14 (B, L, 14, 3), atom14_mask (L, 14), chi (B, L, 4)).
    Disulfide pairs are detected from the batch-mean CB positions unless
    given explicitly (the ensemble shares one pairing, like the
    reference's per-pose detection with shared sequence)."""
    torsions = jnp.asarray(torsions)
    if torsions.ndim == 2:
        torsions = torsions[None]
    B, _, L = torsions.shape
    pin = pack_input(seq)
    if pairs is None:
        if backbone is not None:
            cb = np.asarray(backbone["CB"]).mean(0)
        else:
            atoms = jax.vmap(
                lambda t: build_backbone(t[0], t[1], t[2]))(torsions)
            cb = np.asarray(atoms["CB"]).mean(0)
        pairs = detect_disulfides(cb, seq)
    pairs = jnp.asarray(np.asarray(pairs, np.int32).reshape(-1, 2))
    # staggered trans start for every chi — committed to the SAME batch
    # sharding as the incoming torsions, so a dp-sharded fold result packs
    # SPMD over the mesh instead of the fresh replicated chi0 pulling the
    # packed atom14 onto one device (multichip emit-path invariant)
    from trx2dy.physics.folder import _batch_sharder
    put, _ = _batch_sharder(torsions)
    chi0 = put(jnp.full((B, L, 4), np.pi, jnp.float32) * pin.chi_mask)
    from trx2dy.utils import aot
    if aot.enabled():
        xyz, mask, chi, _ = aot.aot_call(
            "pack", functools.partial(_pack_jit, max_iter=max_iter),
            (torsions, chi0, pairs, pin), {"backbone": backbone},
            static_key=repr(max_iter))
    else:
        xyz, mask, chi, _ = _pack_jit(torsions, chi0, pairs, pin,
                                      max_iter=max_iter, backbone=backbone)
    return xyz, mask[0] if mask.ndim == 3 else mask, chi


def pack_and_write(paths, seq: str, torsions, max_iter: int = 150,
                   backbone=None) -> None:
    """Pack the ensemble's sidechains and write one full-atom PDB per decoy.

    The full-atom equivalent of the reference's pose.dump_pdb after
    FastRelax (folding.py:273). backbone: pack onto these (cart-refined)
    coordinates instead of the ideal NeRF build of torsions."""
    from trx2dy.io.pdbio import write_pdb_atom14

    xyz14, mask, _ = pack_ensemble(torsions, seq, max_iter=max_iter,
                                   backbone=backbone)
    xyz14 = np.asarray(xyz14)
    mask = np.asarray(mask)
    for b, path in enumerate(paths):
        write_pdb_atom14(path, seq, xyz14[b], mask)
