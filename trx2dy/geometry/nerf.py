"""Torsion-space backbone build (NeRF) via parallel prefix composition.

Replaces PyRosetta's internal-coordinate machinery (the reference folder
manipulates pose torsions through pose.set_phi/set_psi/set_omega,
folding/utils_ros/utils_ros.py:656-664) with a TPU-native formulation: each
atom placement is a fixed 4x4 rigid transform parameterized by
(bond, angle, torsion), and the cumulative chain of transforms is computed
with ``jax.lax.associative_scan`` — O(log L) depth, fully differentiable, and
batched over decoys with ``vmap``.

Conventions:
  * torsions are radians; per-residue parameters are (phi, psi, omega) where
    omega[i] is the CA(i)-C(i)-N(i+1)-CA(i+1) dihedral.
  * Ideal Engh & Huber backbone geometry (bonds/angles fixed — torsion-space
    minimization, like the reference's MoveMap(bb=True, chi=False),
    folding/folding.py:86-89).
  * CB is placed with the same virtual-CB formula used for measurement
    (trx2dy.geometry.transforms.virtual_cb) so restrained and measured
    geometries agree exactly.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.geometry.transforms import virtual_cb

# Engh & Huber ideal backbone geometry
BOND_N_CA = 1.458
BOND_CA_C = 1.525
BOND_C_N = 1.329
BOND_C_O = 1.231
ANGLE_N_CA_C = np.deg2rad(111.2)
ANGLE_CA_C_N = np.deg2rad(116.2)
ANGLE_C_N_CA = np.deg2rad(121.7)
ANGLE_CA_C_O = np.deg2rad(120.8)


def _nerf_matrix(r, theta, phi):
    """4x4 extension transform for one atom placement.

    Standard torsion-to-Cartesian transform (Parsons et al., J Comput Chem
    2005): in the parent frame the new atom sits at
    r*(-cos(theta), sin(theta)cos(phi), sin(theta)sin(phi)) and the child
    frame is reached by composing the two rotations. r/theta may be python
    floats; phi is a traced array — all broadcast together.
    """
    phi = jnp.asarray(phi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    one = jnp.ones_like(phi)
    zero = jnp.zeros_like(phi)
    ct, st = ct * one, st * one
    rows = [
        [-ct, -st, zero, -r * ct],
        [st * cp, -ct * cp, -sp, r * st * cp],
        [st * sp, -ct * sp, cp, r * st * sp],
        [zero, zero, zero, one],
    ]
    return jnp.stack([jnp.stack(row, axis=-1) for row in rows], axis=-2)


def _frame_from_three(a, b, c):
    """4x4 frame with origin c, x along b->c, y toward a (in the a,b,c plane)."""
    x = c - b
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    ab = a - b
    y = ab - jnp.sum(ab * x, axis=-1, keepdims=True) * x
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    z = jnp.cross(x, y)
    rot = jnp.stack([x, y, z], axis=-1)
    top = jnp.concatenate([rot, c[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def place_atom(a, b, c, r, theta, phi):
    """Place one atom from three reference atoms and internal coordinates.

    Vectorized over leading axes. Used for carbonyl O placement (and tests).
    """
    frame = _frame_from_three(a, b, c)
    st = jnp.sin(theta)
    local = jnp.stack(
        [-r * jnp.cos(theta) * jnp.ones_like(phi),
         r * st * jnp.cos(phi),
         r * st * jnp.sin(phi)], axis=-1)
    # coordinates are accuracy-critical: keep the tiny matmuls in full f32
    # (TPU default matmul precision is bf16)
    return c + jnp.einsum("...ij,...j->...i", frame[..., :3, :3], local,
                          precision=jax.lax.Precision.HIGHEST)


def build_backbone(phi, psi, omega):
    """Build N/CA/C/O/CB coordinates from per-residue torsions.

    Args:
      phi, psi, omega: (L,) torsions in radians. phi[0], psi[-1], omega[-1]
        are gauge/unused degrees of freedom (kept as parameters so shapes stay
        static under vmap/jit).

    Returns:
      dict atom -> (L, 3) float32 coordinates.
    """
    L = phi.shape[0]
    dtype = phi.dtype

    # Seed residue 0 in a canonical pose.
    n0 = jnp.array([0.0, 0.0, 0.0], dtype)
    ca0 = jnp.array([BOND_N_CA, 0.0, 0.0], dtype)
    c0 = ca0 + BOND_CA_C * jnp.array(
        [np.cos(np.pi - ANGLE_N_CA_C), np.sin(np.pi - ANGLE_N_CA_C), 0.0], dtype)

    # Extension steps: for residue i -> i+1 place (N', CA', C') with torsions
    # (psi_i, omega_i, phi_{i+1}) and the cycling ideal geometry.
    if L > 1:
        tors = jnp.stack([psi[:-1], omega[:-1], phi[1:]], axis=-1).reshape(-1)
        n_steps = 3 * (L - 1)
        r = jnp.tile(jnp.array([BOND_C_N, BOND_N_CA, BOND_CA_C], dtype), L - 1)
        th = jnp.tile(jnp.array(
            [ANGLE_CA_C_N, ANGLE_C_N_CA, ANGLE_N_CA_C], dtype), L - 1)
        mats = _nerf_matrix(r, th, tors)                     # (n_steps, 4, 4)
        # Hand-unrolled rigid composition (rot rows/cols as (n,) lanes):
        # a 4x4-matmul associative_scan lowers to ~2 log2(n) tiny batched
        # MXU matmuls (4x4 padded to the systolic tile) and dominated the
        # whole energy evaluation; the unrolled form is pure fused VPU work
        # at full f32 (same trick as the reference's rot_matmul,
        # rigid_utils.py:87-152). ~5x faster at L=150, B=50.
        rot = mats[:, :3, :3]
        tsl = mats[:, :3, 3]

        def compose(a, b):
            ra, ta = a
            rb, tb = b
            # (a then b): r = ra @ rb, t = ra @ tb + ta, unrolled
            r00 = (ra[:, 0, 0] * rb[:, 0, 0] + ra[:, 0, 1] * rb[:, 1, 0]
                   + ra[:, 0, 2] * rb[:, 2, 0])
            r01 = (ra[:, 0, 0] * rb[:, 0, 1] + ra[:, 0, 1] * rb[:, 1, 1]
                   + ra[:, 0, 2] * rb[:, 2, 1])
            r02 = (ra[:, 0, 0] * rb[:, 0, 2] + ra[:, 0, 1] * rb[:, 1, 2]
                   + ra[:, 0, 2] * rb[:, 2, 2])
            r10 = (ra[:, 1, 0] * rb[:, 0, 0] + ra[:, 1, 1] * rb[:, 1, 0]
                   + ra[:, 1, 2] * rb[:, 2, 0])
            r11 = (ra[:, 1, 0] * rb[:, 0, 1] + ra[:, 1, 1] * rb[:, 1, 1]
                   + ra[:, 1, 2] * rb[:, 2, 1])
            r12 = (ra[:, 1, 0] * rb[:, 0, 2] + ra[:, 1, 1] * rb[:, 1, 2]
                   + ra[:, 1, 2] * rb[:, 2, 2])
            r20 = (ra[:, 2, 0] * rb[:, 0, 0] + ra[:, 2, 1] * rb[:, 1, 0]
                   + ra[:, 2, 2] * rb[:, 2, 0])
            r21 = (ra[:, 2, 0] * rb[:, 0, 1] + ra[:, 2, 1] * rb[:, 1, 1]
                   + ra[:, 2, 2] * rb[:, 2, 1])
            r22 = (ra[:, 2, 0] * rb[:, 0, 2] + ra[:, 2, 1] * rb[:, 1, 2]
                   + ra[:, 2, 2] * rb[:, 2, 2])
            rr = jnp.stack([
                jnp.stack([r00, r01, r02], -1),
                jnp.stack([r10, r11, r12], -1),
                jnp.stack([r20, r21, r22], -1)], -2)
            tt = jnp.stack([
                ra[:, 0, 0] * tb[:, 0] + ra[:, 0, 1] * tb[:, 1]
                + ra[:, 0, 2] * tb[:, 2] + ta[:, 0],
                ra[:, 1, 0] * tb[:, 0] + ra[:, 1, 1] * tb[:, 1]
                + ra[:, 1, 2] * tb[:, 2] + ta[:, 1],
                ra[:, 2, 0] * tb[:, 0] + ra[:, 2, 1] * tb[:, 1]
                + ra[:, 2, 2] * tb[:, 2] + ta[:, 2]], -1)
            return rr, tt

        cum_rot, cum_tsl = jax.lax.associative_scan(compose, (rot, tsl))
        hi = jax.lax.Precision.HIGHEST
        seed = _frame_from_three(n0, ca0, c0)
        # positions: seed_rot @ cum_tsl + seed_tsl (tiny, keep einsum)
        pos_flat = jnp.einsum("ij,nj->ni", seed[:3, :3], cum_tsl,
                              precision=hi) + seed[:3, 3]
        pos = pos_flat.reshape(L - 1, 3, 3)
        n = jnp.concatenate([n0[None], pos[:, 0]])
        ca = jnp.concatenate([ca0[None], pos[:, 1]])
        c = jnp.concatenate([c0[None], pos[:, 2]])
    else:
        n, ca, c = n0[None], ca0[None], c0[None]

    # Carbonyl O: anti to the next N, i.e. torsion psi_i + pi about CA-C.
    o = place_atom(n, ca, c, BOND_C_O, ANGLE_CA_C_O, psi + jnp.pi)
    cb = virtual_cb(n, ca, c)
    return {"N": n, "CA": ca, "C": c, "O": o, "CB": cb}
