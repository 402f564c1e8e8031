"""AF2-style structure module (IPA) + full-atom coordinate build.

JAX re-implementation of StructureModuleFullAtom
(trRosettaX2/strutils/structure_module.py:571-780) and ProtConverter
(strutils/utils_3d/prot_converter.py:188-290): per block —
IPA (Algorithm 22, structure_module.py:266-490), layer-norm, transition,
6-DoF quaternion backbone update (rigid_utils.py:1052-1087), angle resnet
(structure_module.py:184-263) — then torsion_angles_to_frames
(prot_converter.py:60-146) and literature-position atom14 placement
(prot_converter.py:149-185).

Parameters are a flat dict with the torch state_dict keys under a caller-
chosen prefix (the e2e checkpoint uses 'structure_module.'); the rigid state
of the iteration is carried as explicit (quats, trans) arrays.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.geometry.rigid import (
    Rigid, quat_to_rot, quat_normalize, identity_quats, compose_q_update,
    rigid_apply, rigid_invert_apply, rigid_compose, rigid_from_tensor_4x4,
)
from trx2dy.models import constants as rc
from trx2dy.models.predictor2d import linear, layer_norm

Params = Dict[str, jnp.ndarray]
_HI = jax.lax.Precision.HIGHEST


class SMConfig(NamedTuple):
    """structure_module config keys of model_1.json (predict.py:118-121)."""
    c_s: int = 128
    c_z: int = 128
    c_ipa: int = 16
    c_resnet: int = 128
    no_heads_ipa: int = 12
    no_qk_points: int = 4
    no_v_points: int = 8
    no_blocks: int = 8
    no_transition_layers: int = 1
    no_resnet_blocks: int = 2
    no_angles: int = 7
    trans_scale_factor: float = 10.0


def invariant_point_attention(p: Params, name: str, s, z, rig: Rigid,
                              mask, cfg: SMConfig):
    """IPA (structure_module.py:266-490). s (L,C_s), z (L,L,C_z), mask (L,)."""
    L = s.shape[0]
    H, C, Pq, Pv = (cfg.no_heads_ipa, cfg.c_ipa, cfg.no_qk_points,
                    cfg.no_v_points)
    q = linear(p, f"{name}.linear_q", s).reshape(L, H, C)
    kv = linear(p, f"{name}.linear_kv", s).reshape(L, H, 2 * C)
    k, v = jnp.split(kv, 2, axis=-1)

    def points(lin_name, n_pts):
        pts = linear(p, f"{name}.{lin_name}", s)          # (L, H*n*3)
        # reference layout: split into 3 chunks of H*n then stack as xyz
        pts = jnp.stack(jnp.split(pts, 3, axis=-1), axis=-1)   # (L, H*n, 3)
        pts = rigid_apply(Rigid(rig.rot[:, None], rig.trans[:, None]), pts)
        return pts.reshape(L, H, n_pts, 3)

    q_pts = points("linear_q_points", Pq)
    kv_pts = linear(p, f"{name}.linear_kv_points", s)
    kv_pts = jnp.stack(jnp.split(kv_pts, 3, axis=-1), axis=-1)
    kv_pts = rigid_apply(Rigid(rig.rot[:, None], rig.trans[:, None]), kv_pts)
    kv_pts = kv_pts.reshape(L, H, Pq + Pv, 3)
    k_pts, v_pts = kv_pts[:, :, :Pq], kv_pts[:, :, Pq:]

    b = linear(p, f"{name}.linear_b", z)                  # (L, L, H)

    a = jnp.einsum("ihc,jhc->hij", q, k, precision=_HI) \
        * np.sqrt(1.0 / (3 * C))
    a = a + np.sqrt(1.0 / 3) * jnp.transpose(b, (2, 0, 1))

    d2 = jnp.sum((q_pts[:, None] - k_pts[None, :]) ** 2, axis=-1)  # (L,L,H,Pq)
    head_w = jax.nn.softplus(p[f"{name}.head_weights"]) \
        * np.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))
    pt_att = jnp.sum(d2 * head_w[None, None, :, None], axis=-1) * (-0.5)
    a = a + jnp.transpose(pt_att, (2, 0, 1))

    sq_mask = 1e5 * (mask[:, None] * mask[None, :] - 1.0)
    a = jax.nn.softmax(a + sq_mask[None], axis=-1)        # (H, L, L)

    o = jnp.einsum("hij,jhc->ihc", a, v, precision=_HI).reshape(L, -1)
    o_pt = jnp.einsum("hij,jhpx->ihpx", a, v_pts, precision=_HI)
    o_pt = rigid_invert_apply(
        Rigid(rig.rot[:, None, None], rig.trans[:, None, None]), o_pt)
    o_pt_norm = jnp.sqrt(jnp.sum(o_pt ** 2, axis=-1) + 1e-8).reshape(L, -1)
    o_pt_flat = o_pt.reshape(L, -1, 3)                    # (L, H*Pv, 3)
    # o_pair = attention-weighted pair rows: [L, H, C_z]
    o_pair = jnp.einsum("hij,ijc->ihc", a, z, precision=_HI).reshape(L, -1)

    cat = jnp.concatenate(
        [o, o_pt_flat[..., 0], o_pt_flat[..., 1], o_pt_flat[..., 2],
         o_pt_norm, o_pair], axis=-1)
    return linear(p, f"{name}.linear_out", cat)


def angle_resnet(p: Params, name: str, s, s_initial, cfg: SMConfig):
    """AngleResnet (structure_module.py:184-263)."""
    a = linear(p, f"{name}.linear_initial", jax.nn.relu(s_initial))
    x = linear(p, f"{name}.linear_in", jax.nn.relu(s)) + a
    for i in range(cfg.no_resnet_blocks):
        h = linear(p, f"{name}.layers.{i}.linear_1", jax.nn.relu(x))
        h = linear(p, f"{name}.layers.{i}.linear_2", jax.nn.relu(h))
        x = x + h
    out = linear(p, f"{name}.linear_out", jax.nn.relu(x))
    out = out.reshape(out.shape[:-1] + (cfg.no_angles, 2))
    norm = jnp.sqrt(jnp.clip(jnp.sum(out ** 2, axis=-1, keepdims=True),
                             1e-8, None))
    return out, out / norm


def transition(p: Params, name: str, s, n_layers: int):
    for i in range(n_layers):
        h = linear(p, f"{name}.layers.{i}.linear_1", s)
        h = linear(p, f"{name}.layers.{i}.linear_2", jax.nn.relu(h))
        h = linear(p, f"{name}.layers.{i}.linear_3", jax.nn.relu(h))
        s = s + h
    return layer_norm(p, f"{name}.layer_norm", s)


def torsion_angles_to_frames(rig: Rigid, alpha: jnp.ndarray,
                             aatype: jnp.ndarray) -> Rigid:
    """prot_converter.py:60-146: 7 sin/cos angles + identity bb -> 8 global
    frames per residue."""
    L = aatype.shape[0]
    default_4x4 = jnp.asarray(rc.restype_rigid_group_default_frame)[aatype]
    default_r = rigid_from_tensor_4x4(default_4x4)        # (L, 8)

    bb_rot = jnp.zeros((L, 1, 2)).at[..., 1].set(1.0)
    alpha = jnp.concatenate([bb_rot, alpha], axis=-2)     # (L, 8, 2)

    all_rots = jnp.zeros((L, 8, 3, 3))
    all_rots = all_rots.at[..., 0, 0].set(1.0)
    all_rots = all_rots.at[..., 1, 1].set(alpha[..., 1])
    all_rots = all_rots.at[..., 1, 2].set(-alpha[..., 0])
    all_rots = all_rots.at[..., 2, 1].set(alpha[..., 0])
    all_rots = all_rots.at[..., 2, 2].set(alpha[..., 1])

    all_frames = rigid_compose(default_r, Rigid(all_rots,
                                                jnp.zeros((L, 8, 3))))
    c1 = Rigid(all_frames.rot[:, 4], all_frames.trans[:, 4])
    c2 = rigid_compose(c1, Rigid(all_frames.rot[:, 5], all_frames.trans[:, 5]))
    c3 = rigid_compose(c2, Rigid(all_frames.rot[:, 6], all_frames.trans[:, 6]))
    c4 = rigid_compose(c3, Rigid(all_frames.rot[:, 7], all_frames.trans[:, 7]))
    rot = jnp.concatenate(
        [all_frames.rot[:, :5], c2.rot[:, None], c3.rot[:, None],
         c4.rot[:, None]], axis=1)
    trans = jnp.concatenate(
        [all_frames.trans[:, :5], c2.trans[:, None], c3.trans[:, None],
         c4.trans[:, None]], axis=1)
    return rigid_compose(Rigid(rig.rot[:, None], rig.trans[:, None]),
                         Rigid(rot, trans))


def frames_to_atom14(frames: Rigid, aatype: jnp.ndarray):
    """prot_converter.py:149-185: literature positions in their rigid group's
    global frame -> atom14 coordinates + mask."""
    group_idx = jnp.asarray(rc.restype_atom14_to_rigid_group)[aatype]  # (L,14)
    group_mask = jax.nn.one_hot(group_idx, 8, dtype=frames.rot.dtype)
    rot = jnp.einsum("lgij,lag->laij", frames.rot, group_mask, precision=_HI)
    trans = jnp.einsum("lgi,lag->lai", frames.trans, group_mask, precision=_HI)
    lit = jnp.asarray(rc.restype_atom14_rigid_group_positions)[aatype]
    mask = jnp.asarray(rc.restype_atom14_mask)[aatype]
    xyz = rigid_apply(Rigid(rot, trans), lit) * mask[..., None]
    return xyz, mask


def structure_module_apply(p: Params, prefix: str, single, pair, aatype,
                           mask: Optional[jnp.ndarray] = None,
                           cfg: SMConfig = SMConfig(),
                           build_all_atoms: bool = True):
    """Full StructureModuleFullAtom forward (structure_module.py:678-780).

    Returns dict with 'frames' (quats+trans (L,7)), 'angles' (L,7,2),
    'single' (L,c_s), 'cords_ca' (L,3) and, when build_all_atoms,
    'atom14' (L,14,3) + 'atom14_mask' (L,14).
    """
    L = single.shape[0]
    if mask is None:
        mask = jnp.ones((L,), single.dtype)
    s = layer_norm(p, f"{prefix}.layer_norm_s", single)
    z = layer_norm(p, f"{prefix}.layer_norm_z", pair)
    s_initial = s
    s = linear(p, f"{prefix}.linear_in", s)

    quats = identity_quats((L,), s.dtype)
    trans = jnp.zeros((L, 3), s.dtype)

    angles = unnormalized = None
    for i in range(cfg.no_blocks):
        rig = Rigid(quat_to_rot(quat_normalize(quats)), trans)
        s = s + invariant_point_attention(p, f"{prefix}.ipa", s, z, rig,
                                          mask, cfg)
        s = layer_norm(p, f"{prefix}.layer_norm_ipa", s)
        s = transition(p, f"{prefix}.transition", s,
                       cfg.no_transition_layers)
        update = linear(p, f"{prefix}.bb_update.linear", s)
        quats, trans = compose_q_update(quats, trans, update)
        unnormalized, angles = angle_resnet(p, f"{prefix}.angle_resnet", s,
                                            s_initial, cfg)
        if i != cfg.no_blocks - 1:
            quats = jax.lax.stop_gradient(quats)   # stop_rot_gradient

    scaled_trans = trans * cfg.trans_scale_factor
    rig = Rigid(quat_to_rot(quat_normalize(quats)), scaled_trans)
    out = {
        "frames": jnp.concatenate([quat_normalize(quats), scaled_trans], -1),
        "angles": angles,
        "unnormalized_angles": unnormalized,
        "single": s,
        "cords_ca": scaled_trans,
    }
    if build_all_atoms:
        all_frames = torsion_angles_to_frames(rig, angles, aatype)
        xyz, amask = frames_to_atom14(all_frames, aatype)
        out["atom14"] = xyz
        out["atom14_mask"] = amask
    return out
