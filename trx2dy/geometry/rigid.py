"""Quaternion / rigid-transform algebra for the structure module.

Functional JAX counterpart of the reference's OpenFold-style Rotation/Rigid
classes (trRosettaX2/strutils/utils_3d/rigid_utils.py:333,865). Instead of a
class hierarchy, a rigid is a (rot (...,3,3), trans (...,3)) NamedTuple and
the quaternion state of the structure-module loop is carried explicitly —
pytree-friendly, jit/vmap/scan-safe.

Quaternion convention: (w, x, y, z), matching rigid_utils.py:207-331's
_QTR_MAT / _QUAT_MULTIPLY tables.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Rigid(NamedTuple):
    rot: jnp.ndarray    # (..., 3, 3)
    trans: jnp.ndarray  # (..., 3)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)
    (rigid_utils.py:207-240 _QTR_MAT expansion)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tw, tx, ty, tz = 2 * w, 2 * x, 2 * y, 2 * z
    r = jnp.stack([
        1 - ty * y - tz * z, tx * y - tw * z, tx * z + tw * y,
        tx * y + tw * z, 1 - tx * x - tz * z, ty * z - tw * x,
        tx * z - tw * y, ty * z + tw * x, 1 - tx * x - ty * y,
    ], axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# _QUAT_MULTIPLY_BY_VEC (rigid_utils.py:274-295): product of quaternion
# (a,b,c,d) with pure-vector quaternion (0,x,y,z)
def quat_multiply_by_vec(quat: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    a, b, c, d = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    return jnp.stack([
        -b * x - c * y - d * z,
        a * x + c * z - d * y,
        a * y - b * z + d * x,
        a * z + b * y - c * x,
    ], axis=-1)


def identity_rigid(shape, dtype=jnp.float32) -> Rigid:
    rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), shape + (3, 3))
    trans = jnp.zeros(shape + (3,), dtype)
    return Rigid(rot, trans)


def identity_quats(shape, dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,), dtype)
    return q.at[..., 0].set(1.0)


def rigid_apply(r: Rigid, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply r to points (..., 3); r broadcasts over leading axes."""
    return jnp.einsum("...ij,...j->...i", r.rot, pts,
                      precision=jax.lax.Precision.HIGHEST) + r.trans


def rigid_invert_apply(r: Rigid, pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ji,...j->...i", r.rot, pts - r.trans,
                      precision=jax.lax.Precision.HIGHEST)


def rigid_compose(a: Rigid, b: Rigid) -> Rigid:
    """a then b in a's frame: (Ra Rb, Ra tb + ta)."""
    hi = jax.lax.Precision.HIGHEST
    rot = jnp.einsum("...ij,...jk->...ik", a.rot, b.rot, precision=hi)
    trans = jnp.einsum("...ij,...j->...i", a.rot, b.trans, precision=hi) \
        + a.trans
    return Rigid(rot, trans)


def rigid_from_tensor_4x4(t: jnp.ndarray) -> Rigid:
    return Rigid(t[..., :3, :3], t[..., :3, 3])


def rigid_to_tensor_7(quats: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([quats, trans], axis=-1)


def compose_q_update(quats: jnp.ndarray, trans: jnp.ndarray,
                     update: jnp.ndarray):
    """AF2 Algorithm 23 backbone update (rigid_utils.py:603-626,1052-1087):
    update (..., 6) = (b, c, d, tx, ty, tz); quaternion update (1,b,c,d)
    right-multiplied (additively via the bilinear table), then normalized;
    translation update applied in the CURRENT frame.

    Returns (new_quats, new_trans).
    """
    q_vec, t_vec = update[..., :3], update[..., 3:]
    new_quats = quat_normalize(quats + quat_multiply_by_vec(quats, q_vec))
    # translation update is rotated by the PRE-update rotation
    # (rigid_utils.py:1072 `self._rots.apply(t_vec)`)
    rot = quat_to_rot(quat_normalize(quats))
    new_trans = jnp.einsum("...ij,...j->...i", rot, t_vec,
                           precision=jax.lax.Precision.HIGHEST) + trans
    return new_quats, new_trans


def make_transform_from_reference(n, ca, c):
    """Gram-Schmidt backbone frame (rigid_utils.py:1226-1290 from_3_points
    convention): origin CA, x toward C."""
    e1 = c - ca
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    u2 = n - ca
    e2 = u2 - jnp.sum(u2 * e1, axis=-1, keepdims=True) * e1
    e2 = e2 / jnp.linalg.norm(e2, axis=-1, keepdims=True)
    e3 = jnp.cross(e1, e2)
    rot = jnp.stack([e1, e2, e3], axis=-1)
    return Rigid(rot, ca)
