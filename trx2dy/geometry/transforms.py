"""Vector-geometry kernels: dihedrals, angles, virtual CB, 6D geometry maps.

Functional JAX equivalents of the reference's numpy helpers
(reference: utils_trX2dy/utils.py:97-182 — get_dihedrals / get_angles /
get_neighbors). All kernels broadcast over leading axes and are jit/vmap-safe;
the dense (L, L) formulation replaces the reference's cKDTree neighbour search
(utils.py:153-157), which is the right trade on TPU for L ≲ 1k.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Virtual-CB coefficients (reference utils.py:131-135): with b = CA - N,
# c = C - CA, a = b x c:  CB = -0.58273431*a + 0.56802827*b - 0.54067466*c + CA
_VCB_A = -0.58273431
_VCB_B = 0.56802827
_VCB_C = -0.54067466

_EPS = 1e-8


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + _EPS)


def dihedral(a, b, c, d) -> jnp.ndarray:
    """Signed dihedral angle a-b-c-d in radians, in (-pi, pi].

    Matches the praxeolitic formulation used by the reference
    (utils.py:97-110): project b-a and d-c onto the plane normal to c-b and
    take atan2 of the cross/dot products.
    """
    b0 = a - b
    b1 = _normalize(c - b)
    b2 = d - c
    v = b0 - jnp.sum(b0 * b1, axis=-1, keepdims=True) * b1
    w = b2 - jnp.sum(b2 * b1, axis=-1, keepdims=True) * b1
    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1, v) * w, axis=-1)
    return jnp.arctan2(y, x)


def bond_angle(a, b, c) -> jnp.ndarray:
    """Planar angle a-b-c in radians, in [0, pi] (reference utils.py:113-122)."""
    v = _normalize(a - b)
    w = _normalize(c - b)
    # clip strictly inside (-1, 1): arccos' cotangent is inf at the endpoints
    # and would poison gradients of downstream jnp.where-masked energies
    cos = jnp.clip(jnp.sum(v * w, axis=-1), -1.0 + 1e-7, 1.0 - 1e-7)
    return jnp.arccos(cos)


def virtual_cb(n, ca, c) -> jnp.ndarray:
    """Virtual C-beta rebuilt from backbone N/CA/C (reference utils.py:131-135).

    This is the trRosetta convention; the folder also *places* CB with this
    formula so measured and restrained geometries agree exactly.
    """
    b = ca - n
    cc = c - ca
    a = jnp.cross(b, cc)
    return _VCB_A * a + _VCB_B * b + _VCB_C * cc + ca


def geometry_maps_6d(n, ca, c, cb=None, dmax: float = 20.0, atom_mask=None):
    """Dense 6D inter-residue geometry maps.

    Args:
      n, ca, c: (L, 3) backbone coordinates.
      cb: optional (L, 3) C-beta coordinates (e.g. real CBs from a PDB). When
        None, the virtual CB is used for every residue.
      dmax: contact cutoff in Angstrom; pairs beyond it (and the diagonal) are
        zeroed, reproducing the reference's cKDTree(dmax) sparsity
        (utils.py:153-182).
      atom_mask: optional (L,) bool; False rows are treated as absent (their
        pairs zeroed), replacing the reference's NaN-row dropping.

    Returns:
      dict with 'dist', 'omega', 'theta', 'phi' — each (L, L) float32.
        dist : CB(i)-CB(j) distance
        omega: dihedral CA(i)-CB(i)-CB(j)-CA(j)       (symmetric)
        theta: dihedral N(i)-CA(i)-CB(i)-CB(j)        (asymmetric)
        phi  : planar angle CA(i)-CB(i)-CB(j)         (asymmetric)
    """
    L = ca.shape[0]
    if cb is None:
        cb = virtual_cb(n, ca, c)

    # epsilon under the sqrt (not added to the vector): keeps the diagonal
    # gradient finite without biasing off-diagonal distances
    d2 = jnp.sum((cb[:, None, :] - cb[None, :, :]) ** 2, axis=-1)
    d = jnp.sqrt(d2 + _EPS ** 2)
    eye = jnp.eye(L, dtype=bool)
    mask = (d <= dmax) & ~eye
    if atom_mask is not None:
        pair_ok = atom_mask[:, None] & atom_mask[None, :]
        mask = mask & pair_ok

    ca_i = ca[:, None, :].repeat(L, 1)
    ca_j = ca[None, :, :].repeat(L, 0)
    cb_i = cb[:, None, :].repeat(L, 1)
    cb_j = cb[None, :, :].repeat(L, 0)
    n_i = n[:, None, :].repeat(L, 1)

    omega = dihedral(ca_i, cb_i, cb_j, ca_j)
    theta = dihedral(n_i, ca_i, cb_i, cb_j)
    phi = bond_angle(ca_i, cb_i, cb_j)

    z = jnp.zeros_like(d)
    return {
        "dist": jnp.where(mask, d, z),
        "omega": jnp.where(mask, omega, z),
        "theta": jnp.where(mask, theta, z),
        "phi": jnp.where(mask, phi, z),
    }


def backbone_torsions(n, ca, c):
    """Per-residue (phi, psi, omega) from backbone coordinates, radians.

    phi[0] and psi[-1]/omega[-1] are undefined; they are returned as 0 with
    the companion validity masks. omega[i] is the CA(i)-C(i)-N(i+1)-CA(i+1)
    dihedral (Rosetta convention).
    """
    L = ca.shape[0]
    phi = dihedral(c[:-1], n[1:], ca[1:], c[1:])          # residues 1..L-1
    psi = dihedral(n[:-1], ca[:-1], c[:-1], n[1:])        # residues 0..L-2
    omg = dihedral(ca[:-1], c[:-1], n[1:], ca[1:])        # residues 0..L-2

    phi_full = jnp.concatenate([jnp.zeros((1,)), phi])
    psi_full = jnp.concatenate([psi, jnp.zeros((1,))])
    omg_full = jnp.concatenate([omg, jnp.zeros((1,))])
    phi_mask = jnp.arange(L) > 0
    psi_mask = jnp.arange(L) < L - 1
    return (phi_full, psi_full, omg_full), (phi_mask, psi_mask, psi_mask)
