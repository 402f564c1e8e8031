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

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.geometry.nerf import (
    BOND_N_CA, BOND_CA_C, BOND_C_N, BOND_C_O,
    ANGLE_N_CA_C, ANGLE_CA_C_N, ANGLE_C_N_CA, ANGLE_CA_C_O,
)
from trx2dy.geometry.transforms import virtual_cb, backbone_torsions
from trx2dy.physics.energy import (
    EnergyWeights, WEIGHT_FIELDS, weights_to_vec, vdw_energy, hbond_energy,
    rama_energy, omega_planarity_energy, pairwise_geometry,
)
from trx2dy.physics.restraints import restraint_energy
from trx2dy.physics.minimize import lbfgs_minimize, lbfgs_init, lbfgs_run

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


def _delta_unpack(atoms0: dict, delta):
    """(B, 5*L*3) flat displacement vector -> displaced atoms dict."""
    B, L, _ = atoms0["N"].shape
    d = delta.reshape(B, len(_ATOMS), L, 3)
    return {nm: atoms0[nm] + d[:, i] for i, nm in enumerate(_ATOMS)}


def _cart_efun(atoms0: dict, tables, w_vec, kind: str,
               dist_on_ca: bool = False, res_mask=None):
    """delta -> (B,) total cartesian-refinement energy, with the score
    weights as a TRACED (9,) vector (energy.pose_energy_weighted's trick):
    one compiled program serves every ramp stage of the cartesian FastRelax
    schedule AND the final refinement, for all weight settings.

    kind selects the restraint formulation (mirrors folder._weighted_fun):
    "dense" tables=(rst, masks); "compact" a CompactRestraints (shared
    tables, batch-major matmul selection); "lanes" a CompactLanes (chain
    mode, per-lane tables)."""
    w = dict(zip(WEIGHT_FIELDS, w_vec))

    def restraints_b(atoms_b):
        if kind == "dense":
            rst, masks = tables
            def one(at):
                g = pairwise_geometry(at)
                return restraint_energy(rst, masks, g["dist"], g["omega"],
                                        g["theta"], g["phi"], w["atom_pair"],
                                        w["dihedral"], w["angle"])
            return jax.vmap(one)(atoms_b)
        if kind == "lanes":
            from trx2dy.physics.compact import compact_restraint_energy_lanes
            return compact_restraint_energy_lanes(
                atoms_b, tables, w["atom_pair"], w["dihedral"], w["angle"],
                dist_on_ca=dist_on_ca)
        if kind == "union":
            from trx2dy.physics.compact import compact_restraint_energy_union
            ur, acts = tables
            return compact_restraint_energy_union(
                atoms_b, ur, acts, w["atom_pair"], w["dihedral"],
                w["angle"], dist_on_ca=dist_on_ca)
        from trx2dy.physics.compact import compact_restraint_energy_batch
        return compact_restraint_energy_batch(
            atoms_b, tables, w["atom_pair"], w["dihedral"], w["angle"],
            dist_on_ca=dist_on_ca)

    def centroid_one(at):
        # every term always computed (weights are data, cf. the staged
        # folder); zero weights contribute zero
        e = w["vdw"] * vdw_energy(at, res_mask)
        (phi, psi, omg), _ = backbone_torsions(at["N"], at["CA"], at["C"])
        e = e + w["rama"] * rama_energy(phi, psi, res_mask)
        e = e + w["omega"] * omega_planarity_energy(omg, res_mask)
        e = e + hbond_energy(at, w["cen_hb"] + w["hbond_sr"],
                             w["cen_hb"] + w["hbond_lr"], res_mask)
        return e + cart_bonded_energy(at, res_mask=res_mask)

    def efun(delta):
        atoms = _delta_unpack(atoms0, delta)
        return jax.vmap(centroid_one)(atoms) + restraints_b(atoms)

    return efun


# Idealize pass (the reference's IdealizeMover fallback,
# folding/folding.py:237-268: poses whose cart_bonded exceeds a threshold
# are re-idealized). Rosetta's mover is expensive and destructive, so the
# reference gates it; our substitute is a short TETHERED minimization of
# cart_bonded alone — residual bond/angle strain snaps back to ideal while
# the tether pins coordinates to the refined pose (sub-0.2 A movements),
# so it runs unconditionally as part of the compiled refinement. The
# bonded stiffnesses are scaled up 10x against the tether so the residual
# relaxes to ~1% of the strain for bonds and ~10% for angles (an angle
# deviation's restoring force competes with the tether through the ~1.5 A
# lever arm of the atoms it moves: at the base k_angle=80/rad^2 the two
# nearly cancel and angles stay strained).
IDEALIZE_ITERS = 50
IDEALIZE_SCALE = 10.0
K_TETHER = 30.0    # per A^2 per atom, toward the refined coordinates


def _idealize(atoms0, delta, res_mask=None, iters: int = IDEALIZE_ITERS):
    def ideal_fun(d):
        atoms = _delta_unpack(atoms0, d)
        e = jax.vmap(lambda at: cart_bonded_energy(
            at, k_bond=IDEALIZE_SCALE * K_BOND,
            k_angle=IDEALIZE_SCALE * K_ANGLE, res_mask=res_mask))(atoms)
        return e + K_TETHER * jnp.sum((d - delta) ** 2, axis=-1)
    return lbfgs_minimize(ideal_fun, delta, max_iter=iters).x


@functools.partial(jax.jit, static_argnames=("max_iter", "kind",
                                             "dist_on_ca"))
def _refine_jit(atoms0, tables, w_vec, max_iter, kind,
                dist_on_ca=False, res_mask=None):
    """Tables AND weights are arguments (not closure constants) so the
    dynamics sampler's per-step table changes reuse ONE compiled program."""
    B, L, _ = atoms0["N"].shape
    efun = _cart_efun(atoms0, tables, w_vec, kind, dist_on_ca, res_mask)
    res = lbfgs_minimize(efun, jnp.zeros((B, len(_ATOMS) * L * 3)),
                         max_iter=max_iter)
    x = _idealize(atoms0, res.x, res_mask)
    return _delta_unpack(atoms0, x), res.f


@functools.partial(jax.jit, static_argnames=("kind", "dist_on_ca"))
def _cart_init_jit(atoms0, delta0, tables, w_vec, kind,
                   dist_on_ca=False, res_mask=None):
    efun = _cart_efun(atoms0, tables, w_vec, kind, dist_on_ca, res_mask)
    return lbfgs_init(efun, delta0)


@functools.partial(jax.jit, static_argnames=("chunk", "kind", "dist_on_ca"))
def _cart_run_jit(state, atoms0, tables, w_vec, chunk, kind,
                  dist_on_ca=False, res_mask=None):
    """One bounded chunk of the cartesian L-BFGS (remote-TPU RPC safety,
    same rationale as folder._stage_run_jit)."""
    efun = _cart_efun(atoms0, tables, w_vec, kind, dist_on_ca, res_mask)
    return lbfgs_run(efun, state, max_iter=chunk)


def _cart_init(atoms0, delta0, tables, w_vec, kind, dist_on_ca=False,
               res_mask=None):
    """_cart_init_jit, optionally through the AOT trace cache
    (utils/aot.py — skips this program's per-process jit trace)."""
    from trx2dy.utils import aot
    if aot.enabled():
        return aot.aot_call(
            "cart_init",
            functools.partial(_cart_init_jit, kind=kind,
                              dist_on_ca=dist_on_ca),
            (atoms0, delta0, tables, w_vec), {"res_mask": res_mask},
            static_key=repr((kind, dist_on_ca)))
    return _cart_init_jit(atoms0, delta0, tables, w_vec, kind,
                          dist_on_ca, res_mask)


def _cart_run(state, atoms0, tables, w_vec, chunk, kind, dist_on_ca=False,
              res_mask=None):
    """_cart_run_jit through the optional AOT trace cache (see above)."""
    from trx2dy.utils import aot
    if aot.enabled():
        return aot.aot_call(
            "cart_run",
            functools.partial(_cart_run_jit, chunk=chunk, kind=kind,
                              dist_on_ca=dist_on_ca),
            (state, atoms0, tables, w_vec), {"res_mask": res_mask},
            static_key=repr((chunk, kind, dist_on_ca)))
    return _cart_run_jit(state, atoms0, tables, w_vec, chunk, kind,
                         dist_on_ca, res_mask)


def _table_kind(tables) -> str:
    from trx2dy.physics.compact import (
        CompactRestraints, CompactLanes, UnionRestraints,
    )
    if isinstance(tables, CompactLanes):
        return "lanes"
    if isinstance(tables, CompactRestraints):
        return "compact"
    if isinstance(tables, tuple) and len(tables) == 2 \
            and isinstance(tables[0], UnionRestraints):
        return "union"
    return "dense"


# chunk of cartesian L-BFGS iterations per device call; 50 divides every
# stage of the reference ramp schedules (50/50/100/200) so ONE compiled
# run program serves all of them
CART_CHUNK = 50


def cartesian_relax_block(atoms: dict, tables, w_stages,
                          w_full_vec, dist_on_ca: bool = False,
                          res_mask=None):
    """One cartesian FastRelax repeat, host-orchestrated over chunked
    compiled programs: ramp through w_stages = ((w_vec, iters), ...)
    carrying the displacement vector, then accept_to_best against the
    starting pose under the full weights (reference
    folding/data/1relax_round1.txt:10-16 `switch:cartesian repeat 1` /
    2relax_round2.txt's per-repeat accept_to_best semantics).

    Returns (atoms dict, (B,) full-weight energies of the kept pose)."""
    kind = _table_kind(tables)
    B, L, _ = atoms["N"].shape
    # the zero displacement start is committed to the SAME batch sharding
    # as the incoming atoms: a fresh replicated array would pull the whole
    # cartesian block onto one device of a dp-sharded fold
    from trx2dy.physics.folder import _batch_sharder
    put, _ = _batch_sharder(atoms["CA"])
    delta = put(jnp.zeros((B, len(_ATOMS) * L * 3), atoms["CA"].dtype))
    f0 = _cart_init(atoms, delta, tables, w_full_vec, kind,
                        dist_on_ca, res_mask).f
    for w_vec, iters in w_stages:
        st = _cart_init(atoms, delta, tables, w_vec, kind,
                            dist_on_ca, res_mask)
        remaining = iters
        while remaining > 0:
            st = _cart_run(st, atoms, tables, w_vec,
                               min(CART_CHUNK, remaining), kind,
                               dist_on_ca, res_mask)
            remaining -= CART_CHUNK
            if bool(np.asarray(jnp.all(st.done))):
                break
        delta = st.x
    f1 = _cart_init(atoms, delta, tables, w_full_vec, kind,
                        dist_on_ca, res_mask).f
    keep = np.asarray(f1) < np.asarray(f0)          # accept_to_best
    delta = put(jnp.where(put(jnp.asarray(keep))[:, None], delta, 0.0))
    return _delta_unpack(atoms, delta), jnp.minimum(f1, f0)


def cartesian_relax_traced(atoms: dict, rst, masks, w_stages, w_full_vec,
                           dist_on_ca: bool = False, res_mask=None):
    """Traced (jit-inlinable) form of cartesian_relax_block for the
    monolithic protocol path — dense tables, lbfgs_minimize per stage,
    accept_to_best at the end."""
    B, L, _ = atoms["N"].shape
    delta = jnp.zeros((B, len(_ATOMS) * L * 3), atoms["CA"].dtype)
    full = _cart_efun(atoms, (rst, masks), w_full_vec, "dense",
                      dist_on_ca, res_mask)
    f0 = full(delta)
    for w_vec, iters in w_stages:
        efun = _cart_efun(atoms, (rst, masks), w_vec, "dense",
                          dist_on_ca, res_mask)
        delta = lbfgs_minimize(efun, delta, max_iter=iters).x
    f1 = full(delta)
    delta = jnp.where((f1 < f0)[:, None], delta, 0.0)
    return _delta_unpack(atoms, delta), jnp.minimum(f1, f0)


def cartesian_refine(atoms: dict, rst, masks, w: EnergyWeights,
                     max_iter: int = 200, res_mask=None):
    """Refine a (B, L, 3)-atom ensemble with cartesian DOFs against ONE
    dense restraint set (fold_ensemble's shape).

    Returns (refined atoms dict, (B,) final energies incl. cart_bonded)."""
    return _refine_jit(atoms, (rst, masks), weights_to_vec(w), max_iter,
                       "dense", res_mask=res_mask)


def cartesian_refine_compact(atoms: dict, cr, w: EnergyWeights,
                             max_iter: int = 200,
                             dist_on_ca: bool = False, res_mask=None):
    """cartesian_refine against COMPACTED active-pair tables
    (physics/compact.py CompactRestraints — shared across the batch).

    Numerically the same objective as the dense path restricted to the
    active pairs, at the compact path's HBM cost (the production staged
    folder's 2.9 vs 5.6 ms value+grad, PERF.md) — fold_ensemble's default
    final stage."""
    from trx2dy.utils import aot
    if aot.enabled():
        return aot.aot_call(
            "cart_refine",
            functools.partial(_refine_jit, max_iter=max_iter,
                              kind="compact", dist_on_ca=dist_on_ca),
            (atoms, cr, weights_to_vec(w)), {"res_mask": res_mask},
            static_key=repr((max_iter, "compact", dist_on_ca)))
    return _refine_jit(atoms, cr, weights_to_vec(w), max_iter, "compact",
                       dist_on_ca=dist_on_ca, res_mask=res_mask)


@jax.jit
def _idealize_finish_jit(atoms0, delta, res_mask=None):
    """Idealize tether pass + displacement unpack (the tail _refine_jit
    fuses; split out so the refine body can share the chunked cart
    programs)."""
    return _delta_unpack(atoms0, _idealize(atoms0, delta, res_mask))


def cartesian_refine_lanes(atoms: dict, cl, w: EnergyWeights,
                           max_iter: int = 200, dist_on_ca: bool = False,
                           res_mask=None):
    """Chain-mode refinement: lane k refines against its OWN compacted
    restraint tables (physics/compact.py CompactLanes — the relax-stage
    compact set fold_chains already builds).

    Runs on the SAME chunked (_cart_init_jit, _cart_run_jit) programs as
    the relax round-1 cartesian block instead of a monolithic _refine_jit:
    in the dynamics pipeline those executables are already traced + loaded
    by the time the refine runs, and every distinct big program costs
    ~10 s of first-use overhead over the remote-TPU tunnel per process.
    Chunked resume is exact (folder._stage_run_jit pattern), so the result
    matches the monolithic path."""
    from trx2dy.physics.folder import _batch_sharder
    put, _ = _batch_sharder(atoms["CA"])
    kind = _table_kind(cl)      # CompactLanes or (UnionRestraints, acts)
    B, L, _ = atoms["N"].shape
    w_vec = weights_to_vec(w)
    delta = put(jnp.zeros((B, len(_ATOMS) * L * 3), atoms["CA"].dtype))
    st = _cart_init(atoms, delta, cl, w_vec, kind,
                        dist_on_ca, res_mask)
    remaining = max_iter
    while remaining > 0:
        st = _cart_run(st, atoms, cl, w_vec,
                           min(CART_CHUNK, remaining), kind,
                           dist_on_ca, res_mask)
        remaining -= CART_CHUNK
        if bool(np.asarray(jnp.all(st.done))):
            break
    return _idealize_finish_jit(atoms, st.x, res_mask), st.f
