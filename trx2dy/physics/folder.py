"""The restrained-minimization folder: npz histograms -> 3D decoy ensemble.

TPU-native replacement for the reference's PyRosetta pipeline
(folding/folding.py:32-281). One call folds the ENTIRE decoy ensemble as a
single XLA program: the batch axis replaces the reference's one-subprocess-
per-decoy fan-out (utils_trX2dy/utils.py:484-505), torsion-space NeRF
replaces pose internal coordinates, dense spline tables replace constraint
files, and batched L-BFGS replaces the MinMover.

Protocol (mode 2, the Dynamics default "-m 2 -r no-idp --orient"):
  1. random Ramachandran-basin torsion init, omega=180 deg
     (utils_ros.py:656-696 set_random_dihedral/random_dihedral);
  2. clash removal: <=5 rounds of vdw-only minimization while vdw score >= 10
     (utils_ros.py:699-703 remove_clash);
  3. restraints added for 1 <= |i-j| < L, then 3x L-BFGS(1000) on the
     centroid score function (RepeatMover(min_mover, 3), folding.py:105,168);
  4. a refinement pass on the cartesian-flavour weights (hbond terms on) —
     the torsion-space stand-in for min_mover_cart (folding.py:169; bonds and
     angles are ideal by construction so cart_bonded is identically 0);
  5. clash removal minimizing scorefxn1 (folding.py:170);
  6. FastRelax substitute (folding.py:189-268): two rounds of restrained
     minimization with the relax constraint weights (5/1/1), restraint
     probability cutoffs 0.15 then 0.30, glycine pairs excluded (nogly).

Modes 0/1 stage the restraints by sequence separation (short 1-12 /
medium 12-24 / long 24+, folding.py:125-162) with CUMULATIVE masks —
Rosetta's add_rst appends to the constraint set.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.geometry.nerf import build_backbone
from trx2dy.geometry.transforms import backbone_torsions, dihedral
from trx2dy.physics.energy import (
    EnergyWeights, SCOREFXN_CENT, SCOREFXN1, SCOREFXN_VDW, SCOREFXN_CART,
    pose_energy, pose_energy_weighted, pose_energy_weighted_compact,
    batched_energy_weighted_compact, batched_energy_weighted_lanes,
    batched_energy_weighted_union, weights_to_vec, batched_energy_fused,
)
from trx2dy.physics.restraints import (
    FoldParams, RestraintSet, RestraintMasks, compile_restraints,
    compile_restraints_af2, compile_restraints_idp, compile_restraints_gpcr,
    restraint_masks, disulfide_pairs, add_disulfide_restraints,
)
from trx2dy.physics.minimize import (
    lbfgs_minimize, lbfgs_init, lbfgs_run, state_gather, state_put,
)


def _batch_sharder(x):
    """(put, dp) for the decoy-batch axis of x.

    When x is committed with a NamedSharding whose leading axis is sharded
    (the multi-chip fold entry, parallel/decoys.py), `put(a, axis=0)`
    re-commits a's batch axis to the same mesh axis — used at every host
    round-trip of the staged protocol (lane parking, compaction, relax
    accept_to_best) so chunk outputs STAY sharded across the mesh instead of
    collapsing onto the default device after the first stage. dp is the
    number of shards along the batch axis (compaction buckets must stay
    divisible by it). Single-device folds get the identity put and dp=1."""
    sh = getattr(x, "sharding", None)
    if isinstance(sh, jax.sharding.NamedSharding) and sh.spec \
            and sh.spec[0] is not None:
        mesh, names = sh.mesh, sh.spec[0]
        axis_names = names if isinstance(names, tuple) else (names,)
        dp = int(np.prod([mesh.shape[n] for n in axis_names]))

        def put(a, axis=0):
            a = jnp.asarray(a)
            spec = [None] * a.ndim
            spec[axis] = names
            return jax.device_put(
                a, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(*spec)))
        return put, dp

    def put(a, axis=0):
        return jnp.asarray(a)
    return put, 1

# FastRelax's score function: ref2015_cart + constraint weights 5/1/1
# (folding.py:200-204). Torsion-space substitute keeps the centroid terms.
SCOREFXN_RELAX = EnergyWeights(hbond_sr=3.0, hbond_lr=3.0, rama=1.0,
                               omega=0.5, vdw=0.5,
                               atom_pair=5.0, dihedral=1.0, angle=1.0)

# FastRelax ramp schedules (data/1relax_round1.txt, 2relax_round2.txt):
# each `ramp_repack_min <fa_rep_scale> <tol> <cst_scale> <iters>` stage scales
# the repulsive term by fa_rep_scale and every constraint term by cst_scale,
# then minimizes; `accept_to_best` keeps the best full-score pose per repeat.
# Round 1 (1relax_round1.txt:1-16) is `switch:torsion repeat 2` FOLLOWED by a
# `switch:cartesian repeat 1` block (ramp 0.02/0.25/0.55/1.0 at 50/50/100/200
# iters) — modeled by CART_SCHEDULE_R1 below, run in atom space between the
# two relax rounds. Round 2 (2relax_round2.txt) is `switch:cartesian
# repeat 2`; its torsional component runs here and its cartesian channel is
# the final cartesian_refine stage.
RELAX_SCHEDULE_R1 = ((0.02, 1.0, 100), (0.25, 0.5, 100),
                     (0.55, 0.1, 100), (1.0, 0.1, 100))
RELAX_SCHEDULE_R2 = ((0.02, 1.0, 50), (0.25, 0.5, 50),
                     (0.55, 0.1, 100), (1.0, 0.1, 200))
# the round-1 embedded cartesian repeat (1relax_round1.txt:10-16) — VERDICT
# round 2, Missing #1: ramped cartesian-DOF minimization against the SAME
# pcut=0.15 restraint set, before round 2 switches to pcut=0.30
CART_SCHEDULE_R1 = ((0.02, 1.0, 50), (0.25, 0.5, 50),
                    (0.55, 0.1, 100), (1.0, 0.1, 200))
RELAX_REPEATS = 2


def _ramped_relax_weights(fa_scale: float, cst_scale: float) -> EnergyWeights:
    w = SCOREFXN_RELAX
    return w._replace(vdw=w.vdw * fa_scale, atom_pair=w.atom_pair * cst_scale,
                      dihedral=w.dihedral * cst_scale,
                      angle=w.angle * cst_scale)


def _cart_r1_stages():
    """CART_SCHEDULE_R1 as ((w_vec, iters), ...) for the cartesian block."""
    return tuple((weights_to_vec(_ramped_relax_weights(fa, cst)), iters)
                 for fa, cst, iters in CART_SCHEDULE_R1)


def _project_torsions(x, atoms):
    """(B, 3L) torsions re-extracted from (cartesian-displaced) atoms.

    The projection back onto the NeRF manifold for relax round 2: undefined
    slots keep their incoming values (phi[0], omega[-1] — unused by
    build_backbone) and psi[-1] is recovered from the carbonyl O, which IS
    psi's image under the rebuild (nerf.py:183-184 places O anti to the
    next N at torsion psi+pi about N-CA-C)."""
    B = x.shape[0]
    t0 = x.reshape(B, 3, -1)

    def one(n, ca, c, o, t0_l):
        (phi, psi, omg), _ = backbone_torsions(n, ca, c)
        psi_last = dihedral(n[-1], ca[-1], c[-1], o[-1]) - jnp.pi
        phi = phi.at[0].set(t0_l[0, 0])
        psi = psi.at[-1].set(psi_last)
        omg = omg.at[-1].set(t0_l[2, -1])
        return jnp.stack([phi, psi, omg])

    t = jax.vmap(one)(atoms["N"], atoms["CA"], atoms["C"], atoms["O"], t0)
    return t.reshape(B, -1)

CLASH_SCORE_CUTOFF = 10.0   # remove_clash threshold (utils_ros.py:699-703)
CLASH_ROUNDS = 5

# Nonmonotone Armijo window for the restrained stages (Rosetta's
# lbfgs_armijo_nonmonotone, folding.py:96, relaxes acceptance over recent f
# values). 0 = monotone. A/B measurement (scripts/ab_nonmonotone.py): see
# PERF.md — kept at the measured winner.
NONMONOTONE_WINDOW = 0

# Ramachandran basin table + cumulative probabilities (utils_ros.py:674-696)
_BASIN_PHI = np.deg2rad([-140.0, -72.0, -122.0, -82.0, -61.0, 57.0])
_BASIN_PSI = np.deg2rad([153.0, 145.0, 117.0, -14.0, -41.0, 39.0])
_BASIN_P = np.array([0.135, 0.155, 0.073, 0.122, 0.497, 0.018])


class FoldResult(NamedTuple):
    """Result of a fold.

    `atoms` is authoritative. When the default cartesian refinement stage
    ran (fastrelax=True, cart_refine=True), `atoms` carries the REFINED
    coordinates, which have left the ideal-geometry NeRF manifold:
    rebuilding coordinates from `torsions` (the pre-refinement minimizer
    state) silently discards the refinement, and `energy` is the
    pre-refinement staged centroid score (the refiner's objective includes
    cart_bonded and is not comparable across stages). Downstream consumers
    that need sidechains should pass `atoms` as `backbone=` to
    sidechain.pack_ensemble rather than re-deriving a backbone.
    """
    torsions: jnp.ndarray    # (B, 3, L) final [phi; psi; omega]
    energy: jnp.ndarray      # (B,) final centroid score
    atoms: dict              # atom -> (B, L, 3)


def random_torsions(key: jax.Array, L: int, n_decoys: int) -> jnp.ndarray:
    """(B, 3, L) random basin-sampled (phi, psi) with omega = pi."""
    basin = jax.random.choice(key, 6, shape=(n_decoys, L),
                              p=jnp.asarray(_BASIN_P))
    phi = jnp.asarray(_BASIN_PHI, jnp.float32)[basin]
    psi = jnp.asarray(_BASIN_PSI, jnp.float32)[basin]
    omg = jnp.full((n_decoys, L), jnp.pi, jnp.float32)
    return jnp.stack([phi, psi, omg], axis=1)


def pad_npz(npz: dict, L: int, pad_to: int) -> dict:
    """Zero-pad (L, L, ...) histogram maps (and (L,)/(L, L) masks like 'idr')
    to pad_to. Zero probabilities stay below every pcut, so padded pairs
    never activate a restraint — padding is pure shape bucketing."""
    out = {}
    p = pad_to - L
    for k, v in npz.items():
        v = np.asarray(v)
        if v.ndim >= 2 and v.shape[0] == L and v.shape[1] == L:
            v = np.pad(v, [(0, p), (0, p)] + [(0, 0)] * (v.ndim - 2))
        elif v.ndim == 1 and v.shape[0] == L:
            v = np.pad(v, (0, p))
        out[k] = v
    return out


def _batch_energy(w: EnergyWeights, dist_on_ca: bool = False, res_mask=None):
    """(B, 3L) flattened torsions -> (B,) energies, for a static weight set."""
    def fn(x, rst, masks):
        B = x.shape[0]
        t = x.reshape(B, 3, -1)
        return jax.vmap(pose_energy,
                        in_axes=(0, None, None, None, None, None))(
            t, rst, masks, w, dist_on_ca, res_mask)
    return fn


def _stage_masks_centroid(rst: RestraintSet, seq: str, mode: int,
                          pcut: float,
                          idr=None) -> Sequence[RestraintMasks]:
    """Cumulative per-stage restraint masks for the centroid phase.

    Mode 3 (folding.py:173-187) stages by ORDER then DISORDER pair masks
    instead of sequence separation; `idr` is the (L, L) disorder mask."""
    L = len(seq)
    stages = []
    cum = None

    def accumulate(m):
        nonlocal cum
        if cum is None:
            cum = m
        else:
            cum = RestraintMasks(*(a | b for a, b in zip(cum, m)))
        stages.append(cum)

    if mode == 3:
        if idr is None:
            raise ValueError("mode 3 requires the npz 'idr' mask")
        idr = np.asarray(idr, bool)
        if idr.ndim == 1:
            idr = idr[:, None] | idr[None, :]
        base = restraint_masks(rst, seq, 0, L, pcut=pcut)
        for pair_mask in (~idr, idr):           # order, then disorder
            accumulate(RestraintMasks(*(m & pair_mask for m in base)))
        return stages

    if mode == 0:
        ranges = [(1, 12), (12, 24), (24, L)]
    elif mode == 1:
        ranges = [(3, 24), (24, L)]
    elif mode == 2:
        ranges = [(1, L)]
    else:
        raise ValueError(f"mode {mode} not supported (0/1/2/3)")
    for (s1, s2) in ranges:
        accumulate(restraint_masks(rst, seq, s1, s2, pcut=pcut))
    return stages


def _protocol(x0, rst, stage_masks, relax1_masks, relax2_masks,
              n_centroid_stages: int, fastrelax: bool, max_iter: int,
              dist_on_ca: bool = False, res_mask=None,
              cart_r1: bool = False):
    """The full staged protocol as one traced program.

    stage_masks is a pytree of stacked (n_stages, ...) masks so the stage
    count is static while mask *contents* stay data (no recompiles across
    dynamics iterations).
    """
    e_vdw = _batch_energy(SCOREFXN_VDW, res_mask=res_mask)
    e_cent = _batch_energy(SCOREFXN_CENT, dist_on_ca, res_mask)
    e_cart = _batch_energy(SCOREFXN_CART, dist_on_ca, res_mask)
    e_sf1 = _batch_energy(SCOREFXN1, dist_on_ca, res_mask)
    e_relax = _batch_energy(SCOREFXN_RELAX, dist_on_ca, res_mask)
    empty = jax.tree.map(lambda m: jnp.zeros_like(m[0]), stage_masks)

    def remove_clash(x, min_fun, masks, iters):
        def rnd(_, x):
            freeze = e_vdw(x, rst, empty) < CLASH_SCORE_CUTOFF
            return lbfgs_minimize(lambda xx: min_fun(xx, rst, masks), x,
                                  max_iter=iters, freeze=freeze).x
        return jax.lax.fori_loop(0, CLASH_ROUNDS, rnd, x)

    x = remove_clash(x0, e_vdw, empty, 500)

    for s in range(n_centroid_stages):
        masks = jax.tree.map(lambda m, s=s: m[s], stage_masks)
        for _ in range(3):                      # RepeatMover(min_mover, 3)
            x = lbfgs_minimize(lambda xx: e_cent(xx, rst, masks), x,
                               max_iter=max_iter).x
        x = lbfgs_minimize(lambda xx: e_cart(xx, rst, masks), x,
                           max_iter=max_iter).x
        x = remove_clash(x, e_sf1, masks, max_iter)

    if fastrelax:
        def relax_round(x, masks, schedule):
            best_x, best_f = x, e_relax(x, rst, masks)
            for _ in range(RELAX_REPEATS):
                for fa, cst, iters in schedule:
                    e = _batch_energy(_ramped_relax_weights(fa, cst),
                                      dist_on_ca, res_mask)
                    x = lbfgs_minimize(lambda xx: e(xx, rst, masks), x,
                                       max_iter=iters).x
                f = e_relax(x, rst, masks)          # accept_to_best
                best_x = jnp.where((f < best_f)[:, None], x, best_x)
                best_f = jnp.minimum(f, best_f)
            return best_x
        x = relax_round(x, relax1_masks, RELAX_SCHEDULE_R1)
        if cart_r1:
            # round 1's embedded cartesian repeat (1relax_round1.txt:10-16):
            # ramped cartesian-DOF relax on the SAME pcut=0.15 set, relief
            # projected back to torsions before round 2 switches restraints
            from trx2dy.physics.cartmin import cartesian_relax_traced
            B = x.shape[0]
            t = x.reshape(B, 3, -1)
            atoms = jax.vmap(lambda tt: build_backbone(tt[0], tt[1],
                                                       tt[2]))(t)
            atoms, _ = cartesian_relax_traced(
                atoms, rst, relax1_masks, _cart_r1_stages(),
                weights_to_vec(SCOREFXN_RELAX), dist_on_ca=dist_on_ca,
                res_mask=res_mask)
            x = _project_torsions(x, atoms)
        x = relax_round(x, relax2_masks, RELAX_SCHEDULE_R2)

    final_masks = jax.tree.map(lambda m: m[n_centroid_stages - 1], stage_masks)
    f = e_cent(x, rst, final_masks)
    return x, f


@functools.partial(jax.jit,
                   static_argnames=("n_centroid_stages", "fastrelax",
                                    "max_iter", "dist_on_ca", "cart_r1"))
def _protocol_jit(x0, rst, stage_masks, relax1_masks, relax2_masks,
                  n_centroid_stages, fastrelax, max_iter,
                  dist_on_ca=False, res_mask=None, cart_r1=False):
    return _protocol(x0, rst, stage_masks, relax1_masks, relax2_masks,
                     n_centroid_stages, fastrelax, max_iter, dist_on_ca,
                     res_mask, cart_r1)


# chunk of L-BFGS iterations per device call: bounds every XLA execution to
# seconds regardless of batch size / length (remote-TPU RPC safety) while
# keeping host round trips negligible
STAGE_CHUNK = 250

# residual pair-bucket margin for FRESH dynamics runs (fold_chains_pool),
# applied on top of the dampening-proxy count (tablegen.count_fn row 1):
# the proxy models one full dampening step; later steps drift ~1% more
# (measured), so a small margin keeps the ratchet from ever firing
# mid-run (each firing re-mints every stage-program shape: compiles +
# executable loads over the remote-TPU tunnel)
GROWTH_HEADROOM = 1.08

# batch compaction: once the active lanes of a stage fit in half the current
# batch, repack them into the next power-of-2 bucket so drained lanes stop
# burning compute/HBM (the fix for the measured B=100 batch-drain collapse).
# Buckets keep the set of compiled program shapes small and cacheable.
COMPACT_MIN_BATCH = 8
# ... but only engage repacking at batches where per-iteration time actually
# scales with the lane count (B x L big enough to leave the latency-bound
# regime). Below this, every repacked sub-bucket duplicates the whole stage
# program family, and each extra executable costs ~10 s of first-use
# trace + load over the remote-TPU tunnel per process — measured to
# dominate the dynamics pipeline's fixed cost at B=32, L=90.
LANE_REPACK_MIN_BATCH = 48


def _bucket_size(n: int, dp: int = 1) -> int:
    b = COMPACT_MIN_BATCH
    while b < n:
        b *= 2
    if b % dp:                       # keep the batch axis dp-shardable
        b = -(-b // dp) * dp
    return b


@jax.jit
def _atoms_jit(t):
    """(B, 3, L) torsions -> atoms dict, on device (sharding-preserving)."""
    return jax.vmap(lambda tt: build_backbone(tt[0], tt[1], tt[2]))(t)


@jax.jit
def _project_torsions_jit(x, atoms):
    return _project_torsions(x, atoms)


def _weighted_fun(rst, masks, w_vec, dist_on_ca, multi, remat=False,
                  fused=False, res_mask=None):
    from trx2dy.physics.compact import (
        CompactRestraints, CompactLanes, UnionRestraints,
    )

    if isinstance(rst, UnionRestraints):
        # chain mode, shared pair list + per-lane tables (masks = UnionActs)
        def fun(xx):
            return batched_energy_weighted_union(xx, rst, masks, w_vec,
                                                 dist_on_ca, res_mask)
    elif isinstance(rst, CompactRestraints):
        # compacted active-pair path (masks are baked into the pair lists)
        def fun(xx):
            return batched_energy_weighted_compact(xx, rst, w_vec,
                                                   dist_on_ca, res_mask)
    elif isinstance(rst, CompactLanes):
        def fun(xx):
            return batched_energy_weighted_lanes(xx, rst, w_vec,
                                                 dist_on_ca, res_mask)
    elif fused and not multi:
        # fused Pallas spline path: shared tables, batched queries
        def fun(xx):
            return batched_energy_fused(xx, rst, masks, w_vec, dist_on_ca)
    else:
        in_axes = (0, 0, 0, None, None, None) if multi else \
            (0, None, None, None, None, None)

        def fun(xx):
            B = xx.shape[0]
            t = xx.reshape(B, 3, -1)
            return jax.vmap(pose_energy_weighted, in_axes=in_axes)(
                t, rst, masks, w_vec, dist_on_ca, res_mask)
    # rematerialize the energy in the backward pass: ~2x lower peak HBM for
    # ~1.3x compute — lifts the max decoy batch per chip (large-B configs)
    return jax.checkpoint(fun) if remat else fun


@functools.partial(jax.jit,
                   static_argnames=("dist_on_ca", "multi", "remat", "fused",
                                    "nm"))
def _stage_init_jit(x, rst, masks, w_vec, freeze, dist_on_ca=False,
                    multi=False, remat=False, fused=False, res_mask=None,
                    nm=0):
    fun = _weighted_fun(rst, masks, w_vec, dist_on_ca, multi, remat, fused,
                        res_mask)
    return lbfgs_init(fun, x, freeze=freeze, nonmonotone=nm)


@functools.partial(jax.jit,
                   static_argnames=("dist_on_ca", "multi", "remat",
                                    "fused"))
def _stage_run_jit(state, rst, masks, w_vec, chunk, dist_on_ca=False,
                   multi=False, remat=False, fused=False, res_mask=None):
    """One bounded chunk of the stage L-BFGS. The score function is DATA
    (w_vec) and so is the iteration bound (chunk — the while_loop's trip
    bound is already data-dependent), so a single compiled program serves
    every stage of the protocol at every chunk size: the relax schedules'
    50/100/200-iteration budgets would otherwise each trace + load their
    own copy of this (large) executable per process (~10 s each over the
    remote-TPU tunnel)."""
    fun = _weighted_fun(rst, masks, w_vec, dist_on_ca, multi, remat, fused,
                        res_mask)
    return lbfgs_run(fun, state, max_iter=chunk)


def _stage_init(x, rst, masks, w_vec, freeze, dist_on_ca=False, multi=False,
                remat=False, fused=False, res_mask=None, nm=0):
    """_stage_init_jit, optionally through the AOT trace cache
    (utils/aot.py): a fresh process deserializes the exported module
    instead of paying this (large) program's jit trace again."""
    from trx2dy.utils import aot
    if aot.enabled():
        return aot.aot_call(
            "stage_init",
            functools.partial(_stage_init_jit, dist_on_ca=dist_on_ca,
                              multi=multi, remat=remat, fused=fused, nm=nm),
            (x, rst, masks, w_vec, freeze), {"res_mask": res_mask},
            static_key=repr((dist_on_ca, multi, remat, fused, nm)))
    return _stage_init_jit(x, rst, masks, w_vec, freeze, dist_on_ca, multi,
                           remat, fused, res_mask, nm=nm)


def _stage_run(state, rst, masks, w_vec, chunk, dist_on_ca=False,
               multi=False, remat=False, fused=False, res_mask=None):
    """_stage_run_jit through the optional AOT trace cache (see above)."""
    from trx2dy.utils import aot
    if aot.enabled():
        return aot.aot_call(
            "stage_run",
            functools.partial(_stage_run_jit, dist_on_ca=dist_on_ca,
                              multi=multi, remat=remat, fused=fused),
            (state, rst, masks, w_vec, jnp.asarray(chunk, jnp.int32)),
            {"res_mask": res_mask},
            static_key=repr((dist_on_ca, multi, remat, fused)))
    return _stage_run_jit(state, rst, masks, w_vec, chunk, dist_on_ca,
                          multi, remat, fused, res_mask)


# --- repack-in-the-loop (A/B switch, VERDICT r2 item 6) ---------------------
# The reference relax scripts' `ramp_repack_min` REPACKS rotamers before every
# ramp-stage minimization with chi in the movemap (folding.py:224-228,
# 2relax_round2.txt). The shipped substitute packs once post hoc; flipping
# this flag turns on the in-loop variant for relax round 2 — each ramp stage
# first packs chi on the current backbone, then minimizes torsions with the
# full-atom clash of those (frozen) sidechains added to the score — so the
# two protocols can be A/B'd on matched workloads (scripts/ab_repack.py).
REPACK_IN_LOOP = False
W_FA_CLASH = 1.0            # weight of the frozen-chi full-atom clash term
REPACK_CHI_ITERS = 30       # chi L-BFGS budget per in-loop repack


def _fa_weighted_fun(rst, masks, w_vec, dist_on_ca, res_mask,
                     chi, pairs, pin):
    """_weighted_fun + the full-atom clash of frozen packed sidechains."""
    from trx2dy.physics.sidechain import _pack_energy
    base = _weighted_fun(rst, masks, w_vec, dist_on_ca, False, False,
                         False, res_mask)

    def fun(xx):
        B = xx.shape[0]
        t = xx.reshape(B, 3, -1)
        fa = jax.vmap(_pack_energy, in_axes=(0, 0, None, None, None))(
            chi.reshape(B, -1), t, pairs, pin, None)
        return base(xx) + W_FA_CLASH * fa
    return fun


@functools.partial(jax.jit, static_argnames=("dist_on_ca",))
def _fa_init_jit(x, rst, masks, w_vec, chi, pairs, pin, freeze,
                 dist_on_ca=False, res_mask=None):
    fun = _fa_weighted_fun(rst, masks, w_vec, dist_on_ca, res_mask,
                           chi, pairs, pin)
    return lbfgs_init(fun, x, freeze=freeze)


@functools.partial(jax.jit, static_argnames=("dist_on_ca",))
def _fa_run_jit(state, rst, masks, w_vec, chi, pairs, pin, chunk,
                dist_on_ca=False, res_mask=None):
    fun = _fa_weighted_fun(rst, masks, w_vec, dist_on_ca, res_mask,
                           chi, pairs, pin)
    return lbfgs_run(fun, state, max_iter=chunk)


def _protocol_staged(x0, rst, stages, relax1_masks, relax2_masks,
                     fastrelax: bool, max_iter: int, dist_on_ca: bool,
                     multi_rst: bool = False, remat: bool = False,
                     res_mask=None, cart_r1: bool = False,
                     pack_args=None, stage_log: Optional[list] = None):
    """Host-orchestrated protocol over chunked compiled stage programs.

    multi_rst: rst/mask leaves carry a leading per-decoy axis (chain mode).
    stage_log (optional): appended with (label, iterations_run, wall_s)
    per stage call — the profiling surface for protocol cost accounting."""
    B = x0.shape[0]
    put, dp = _batch_sharder(x0)
    no_freeze = put(jnp.zeros((B,), bool))
    w_vdw = weights_to_vec(SCOREFXN_VDW)
    w_cent = weights_to_vec(SCOREFXN_CENT)
    w_cart = weights_to_vec(SCOREFXN_CART)
    w_sf1 = weights_to_vec(SCOREFXN1)
    w_relax = weights_to_vec(SCOREFXN_RELAX)

    # The fused Pallas spline path is available but measured SLOWER than
    # XLA's fused one-hot interpolation at production sizes (B=50, L=150:
    # 7.6 vs 5.6 ms per value+grad — the kernel's 34-interval scan
    # recomputes more VPU work than the one-hot costs in HBM traffic), so
    # the XLA path stays default. Flip for memory-bound regimes.
    fused = False

    # Compact the stage-constant masks into active-pair lists (HBM-bound
    # regime: only ~18-40% of pairs are active — physics.compact). Chain
    # mode passes pre-built CompactLanes from fold_chains.
    from trx2dy.physics.compact import (
        compact_restraints, CompactRestraints, CompactLanes, UnionActs,
        UnionRestraints, union_take_lanes,
    )

    def _as_arg(m):
        # restraint compilation + compaction are host-side numpy; ONE
        # device transfer here per program family, so the chunked
        # _stage_run_jit calls pass device handles (re-transferring the
        # tables per 250-iteration chunk would cost ~1.3 ms/MB per call)
        if isinstance(m, UnionActs):
            # device path (fold_chains_pool): tables already on device,
            # shared across families — stage arg = (UnionRestraints, acts)
            return (rst, m)
        if isinstance(m, (CompactRestraints, CompactLanes)):
            return (jax.tree.map(jnp.asarray, m), None)
        if not multi_rst and not fused:
            return (jax.tree.map(jnp.asarray, compact_restraints(rst, m)),
                    None)
        return (jax.tree.map(jnp.asarray, rst), jax.tree.map(jnp.asarray, m))

    stage_args = [_as_arg(m) for m in stages]
    relax1_args = _as_arg(relax1_masks)
    relax2_args = _as_arg(relax2_masks)

    def stage(x, rst_masks, w, freeze=no_freeze, iters=None,
              label="stage"):
        import time as _time
        t_st = _time.perf_counter()
        rst_a, masks = rst_masks
        iters = max_iter if iters is None else iters
        B0 = x.shape[0]
        st = _stage_init(x, rst_a, masks, w, freeze, dist_on_ca,
                             multi_rst, remat, fused, res_mask,
                             nm=NONMONOTONE_WINDOW)
        rst_c, masks_c = rst_a, masks
        x_full = np.array(np.asarray(x))     # final params per original lane
        lane = np.arange(B0)                 # current lane -> original index
        remaining = iters
        while remaining > 0:
            st = _stage_run(st, rst_c, masks_c, w,
                                min(STAGE_CHUNK, remaining), dist_on_ca,
                                multi_rst, remat, fused, res_mask)
            remaining -= STAGE_CHUNK
            done = np.asarray(st.done)
            if done.all():
                break
            if remaining > 0 and B0 >= LANE_REPACK_MIN_BATCH:
                n_act = int((~done).sum())
                bucket = _bucket_size(n_act, dp)
                if bucket <= len(done) // 2:
                    # park finished lanes, repack active into a small bucket
                    x_full[lane] = np.asarray(st.x)
                    act = np.where(~done)[0]
                    pad = np.where(done)[0][:bucket - n_act]
                    sel = np.concatenate([act, pad])
                    st = state_put(state_gather(st, sel), put)
                    lane = lane[sel]
                    if multi_rst:
                        # gather the surviving lanes' tables ON DEVICE —
                        # round-tripping (M, P, K) tables through the host
                        # costs ~ms/MB each way over the remote-TPU tunnel
                        sel_dev = jnp.asarray(sel)
                        if isinstance(rst_c, UnionRestraints):
                            # only y/m/act carry the lane axis; the pair
                            # list is shared
                            rst_c, masks_c = union_take_lanes(
                                rst_c, masks_c, sel_dev, put)
                            continue

                        def take0(a, sel_dev=sel_dev):
                            return put(jnp.take(a, sel_dev, axis=0))
                        rst_c = jax.tree.map(take0, rst_c)
                        masks_c = jax.tree.map(take0, masks_c)
        x_full[lane] = np.asarray(st.x)
        if stage_log is not None:
            stage_log.append((label, int(np.asarray(st.k)),
                              round(_time.perf_counter() - t_st, 3)))
        return put(x_full)

    def vdw_scores(x):
        # vdw-only scoring through the SHARED stage program (w_vec is
        # data; every non-vdw weight is 0, so values and gradients equal
        # the dedicated vdw program's) — each extra executable costs
        # ~10 s+ of first-use trace + load over the remote-TPU tunnel
        return _stage_init(x, stage_args[0][0], stage_args[0][1],
                               w_vdw, ~no_freeze, dist_on_ca, multi_rst,
                               remat, fused, res_mask).f

    def remove_clash(x, w_min, rst_masks, iters):
        for _ in range(CLASH_ROUNDS):
            active = np.asarray(vdw_scores(x)) >= CLASH_SCORE_CUTOFF
            if not active.any():
                break
            x = stage(x, rst_masks, w_min, freeze=put(~active),
                      iters=iters, label="clash")
        return x

    # initial clash removal: vdw-only weights, restraint weights zeroed
    # (same program family as every other stage — see vdw_scores)
    x = x0
    for _ in range(CLASH_ROUNDS):
        active = np.asarray(vdw_scores(x)) >= CLASH_SCORE_CUTOFF
        if not active.any():
            break
        x = stage(x, stage_args[0], w_vdw, freeze=put(~active), iters=500,
                  label="clash0")

    for sa in stage_args:
        for _ in range(3):
            x = stage(x, sa, w_cent, label="cent")
        x = stage(x, sa, w_cart, label="cart")
        x = remove_clash(x, w_sf1, sa, max_iter)
    if fastrelax:
        def full_f(xx, rst_masks):
            return np.asarray(_stage_init(xx, rst_masks[0], rst_masks[1],
                                              w_relax, ~no_freeze, dist_on_ca,
                                              multi_rst, remat, fused,
                                              res_mask).f)

        def fa_stage(x, rst_masks, w, iters):
            """ramp_repack_min stand-in: pack chi on the current backbone,
            minimize torsions with the frozen-chi full-atom clash added."""
            from trx2dy.physics.sidechain import _pack_jit
            pin, pairs = pack_args
            x = put(x)
            t = x.reshape(x.shape[0], 3, -1)
            chi0 = put(jnp.full(t.shape[:1] + (t.shape[2], 4), jnp.pi,
                                jnp.float32) * pin.chi_mask)
            _, _, chi, _ = _pack_jit(t, chi0, pairs, pin,
                                     max_iter=REPACK_CHI_ITERS)
            st = _fa_init_jit(x, rst_masks[0], rst_masks[1], w, chi, pairs,
                              pin, ~no_freeze, dist_on_ca, res_mask)
            remaining = iters
            while remaining > 0:
                st = _fa_run_jit(st, rst_masks[0], rst_masks[1], w, chi,
                                 pairs, pin, min(STAGE_CHUNK, remaining),
                                 dist_on_ca, res_mask)
                remaining -= STAGE_CHUNK
                if bool(np.asarray(jnp.all(st.done))):
                    break
            return st.x

        def relax_round(x, rst_masks, schedule, repack=False):
            best_x, best_f = x, full_f(x, rst_masks)
            for _ in range(RELAX_REPEATS):
                for fa, cst, iters in schedule:
                    w = weights_to_vec(_ramped_relax_weights(fa, cst))
                    if repack:
                        x = fa_stage(x, rst_masks, w, iters)
                    else:
                        x = stage(x, rst_masks, w, iters=iters,
                                  label="relax")
                f = full_f(x, rst_masks)            # accept_to_best
                best_x = jnp.where(put(f < best_f)[:, None], x, best_x)
                best_f = np.minimum(f, best_f)
            return best_x
        x = relax_round(x, relax1_args, RELAX_SCHEDULE_R1)
        if cart_r1:
            # round 1's embedded cartesian repeat (1relax_round1.txt:10-16)
            # against the pcut=0.15 tables, chunked per device call; the
            # relief is projected back to torsions before round 2 switches
            # to the pcut=0.30 restraint set
            from trx2dy.physics.cartmin import cartesian_relax_block
            t = put(x).reshape(x.shape[0], 3, -1)
            atoms = _atoms_jit(t)
            rst_a, masks_a = relax1_args
            tables = rst_a if masks_a is None else (rst_a, masks_a)
            atoms, _ = cartesian_relax_block(
                atoms, tables, _cart_r1_stages(),
                weights_to_vec(SCOREFXN_RELAX), dist_on_ca=dist_on_ca,
                res_mask=res_mask)
            x = put(_project_torsions_jit(x, atoms))
        x = relax_round(x, relax2_args, RELAX_SCHEDULE_R2,
                        repack=pack_args is not None and not multi_rst)
    f = _stage_init(x, stage_args[-1][0], stage_args[-1][1], w_cent,
                        ~no_freeze, dist_on_ca, multi_rst, remat, fused,
                        res_mask).f
    return x, f


def fold_ensemble(npz: dict, seq: str, key: jax.Array, n_decoys: int = 1,
                  mode: int = 2, use_orient: bool = True,
                  fastrelax: bool = True, pcut: Optional[float] = None,
                  params: FoldParams = FoldParams(), max_iter: int = 1000,
                  x0: Optional[jnp.ndarray] = None,
                  rst_mode: str = "no-idp", known_npz: Optional[dict] = None,
                  staged_execution: bool = True,
                  remat: bool = False,
                  oversample: float = 0.0,
                  pad_to: Optional[int] = None,
                  detect_disulf: bool = True,
                  cart_refine: bool = True) -> FoldResult:
    """Fold an ensemble of decoys from predicted geometry histograms.

    Args:
      npz: dict with 'dist' (+ 'omega'/'theta'/'phi' when use_orient).
      seq: one-letter sequence (GLY handled like the reference's G->A
        mutation: the virtual CB stands in during minimization).
      key: PRNG key; one independent torsion init per decoy.
      n_decoys: ensemble size — the vmapped batch axis (headline config:
        init_num=50 decoys per target on one chip, BASELINE.json).
      mode/use_orient/fastrelax/pcut: reference CLI semantics
        (-m / --orient / --fastrelax / -pd, utils_ros/arguments.py:11-30).
      oversample: fold ceil(n_decoys*(1+oversample)) decoys and return the
        n_decoys LOWEST-ENERGY ones. A small fraction (~15-20% measured on
        the bundled example) of random inits minimize into trapped
        topologies whose final centroid energy sits far above the good band
        (gap > 25% of |median|, corr(E, TM) ~ -0.95); energy selection over
        extra vmap lanes culls them for a fraction of the cost the
        reference would pay spawning extra PyRosetta decoy processes.
      pad_to: pad the target to this length with inert residues (zero
        histograms -> no restraints; res_mask zeroes every physics term),
        so batch-mode targets of different lengths share one bucket of
        compiled programs instead of recompiling per L (SURVEY §7 step 7).
        Returned torsions/atoms are sliced back to the true length.

    Returns FoldResult with final torsions, centroid energies, and atoms.
    """
    L = len(seq)
    if np.asarray(npz["dist"]).shape[0] != L:
        raise ValueError(
            f"sequence length {L} does not match npz geometry maps "
            f"{np.asarray(npz['dist']).shape[:2]}")
    L_true = L
    res_mask = None
    if pad_to is not None and pad_to > L:
        if known_npz is not None:
            # known_npz holds REAL-VALUED geometry maps ((N, L, L), not
            # histograms) — zero padding would bin fake 0-distance contacts
            raise ValueError(
                "pad_to (length bucketing) is not supported together with "
                "known_npz / rst_mode='gpcr'; fold this target unbucketed")
        npz = pad_npz(npz, L, pad_to)
        seq = seq + "A" * (pad_to - L)
        res_mask = jnp.arange(pad_to) < L
        L = pad_to
    pcut = params.PCUT if pcut is None else pcut
    dist_on_ca = rst_mode == "af2"
    if rst_mode == "no-idp":
        rst = compile_restraints(npz, params, use_orient=use_orient)
    elif rst_mode == "af2":
        if use_orient:
            raise ValueError("af2 restraints do not support --orient "
                             "(utils_ros.py:150)")
        rst = compile_restraints_af2(npz, params)
    elif rst_mode == "idp":
        rst = compile_restraints_idp(npz, params, use_orient=use_orient)
    elif rst_mode == "gpcr":
        if known_npz is None:
            raise ValueError("rst_mode='gpcr' requires known_npz "
                             "(folding CLI -KNOWN)")
        rst = compile_restraints_gpcr(npz, known_npz, params,
                                      use_orient=use_orient)
    else:
        raise ValueError(f"unknown rst_mode {rst_mode!r}")

    if detect_disulf and rst_mode in ("no-idp", "idp"):
        # '-detect_disulf' stand-in (folding.py:48,233): harmonic CB-CB
        # wells for predicted-close CYS pairs, active at every pcut
        ss = disulfide_pairs(npz["dist"], seq)
        if len(ss):
            rst = add_disulfide_restraints(rst, ss)

    stages = _stage_masks_centroid(rst, seq, mode, pcut,
                                   idr=npz.get("idr"))
    stacked = jax.tree.map(lambda *ms: jnp.stack(ms), *stages)
    relax1 = restraint_masks(rst, seq, 1, L, pcut=0.15, nogly=True)
    relax2 = restraint_masks(rst, seq, 1, L, pcut=0.30, nogly=True)

    n_fold = n_decoys
    if x0 is None:
        if oversample > 0.0:
            n_fold = int(np.ceil(n_decoys * (1.0 + oversample)))
        x0 = random_torsions(key, L, n_fold)
    x0 = x0.reshape(x0.shape[0], 3 * L)

    cart_r1 = cart_refine and fastrelax and rst_mode in ("no-idp", "idp")
    pack_args = None
    if REPACK_IN_LOOP and fastrelax and staged_execution:
        from trx2dy.physics.sidechain import pack_input
        # SS pairs are empty in-loop: the disulfide CB-CB wells already
        # restrain CYS pairs through every stage
        pack_args = (pack_input(seq),
                     jnp.zeros((0, 2), jnp.int32))
    if staged_execution:
        x, f = _protocol_staged(x0, rst, stages, relax1, relax2,
                                fastrelax=fastrelax, max_iter=max_iter,
                                dist_on_ca=dist_on_ca, remat=remat,
                                res_mask=res_mask, cart_r1=cart_r1,
                                pack_args=pack_args)
    else:
        x, f = _protocol_jit(x0, rst, stacked, relax1, relax2,
                             n_centroid_stages=len(stages),
                             fastrelax=fastrelax, max_iter=max_iter,
                             dist_on_ca=dist_on_ca, res_mask=res_mask,
                             cart_r1=cart_r1)

    if n_fold > n_decoys:
        keep = np.argsort(np.asarray(f))[:n_decoys]
        x = jnp.asarray(np.asarray(x)[keep])
        f = jnp.asarray(np.asarray(f)[keep])

    tp = x.reshape(-1, 3, L)
    atoms = jax.vmap(lambda tt: build_backbone(tt[0], tt[1], tt[2]))(tp)
    if cart_refine and fastrelax and rst_mode in ("no-idp", "idp"):
        # the reference's cartesian channel (min_mover_cart folding.py:169,
        # cart-switched relax round 2 :234): small per-atom displacements
        # against the relax score + harmonic ideal-geometry (cart_bonded)
        # terms. Runs AFTER energy gating, on the kept lanes only.
        # Measured +0.02 mean TM on the bundled example (PERF.md).
        # Compacted active-pair tables: same objective as the dense path
        # on the relax2-active pairs at ~half the HBM traffic (PERF.md).
        from trx2dy.physics.cartmin import cartesian_refine_compact
        from trx2dy.physics.compact import compact_restraints
        atoms, _ = cartesian_refine_compact(
            atoms, compact_restraints(rst, relax2), SCOREFXN_RELAX,
            max_iter=200, res_mask=res_mask)
    t = tp[:, :, :L_true]
    if L_true < L:
        atoms = {k: v[:, :L_true] for k, v in atoms.items()}
    return FoldResult(torsions=t, energy=f, atoms=atoms)


def fold_chains_pool(pool: dict, lane_map, seq: str, key: jax.Array,
                     mode: int = 2, use_orient: bool = True,
                     fastrelax: bool = True, pcut: Optional[float] = None,
                     params: FoldParams = FoldParams(),
                     max_iter: int = 1000, candidates: int = 1,
                     detect_disulf: bool = True,
                     bucket_floors: Optional[dict] = None,
                     cart_refine: bool = True,
                     lane_bucket: Optional[int] = None,
                     res_mask=None,
                     true_len: Optional[int] = None,
                     x0: Optional[jnp.ndarray] = None,
                     timings: Optional[dict] = None,
                     stage_log: Optional[list] = None,
                     growth_buckets: bool = False) -> FoldResult:
    """fold_chains over a DEVICE-RESIDENT histogram pool (VERDICT r4
    items 2+3): the dynamics sampler's per-step restraint tables are built
    on device by physics.tablegen (shared union pair list + per-lane
    tables, compact.UnionRestraints) instead of host numpy compilation —
    the dampened histograms never round-trip through the host, and atom
    selection runs as one MXU-efficient batched matmul instead of C
    per-lane matmuls at N=9.

    Args:
      pool: dict with 'dist'/'omega'/'theta'/'phi' lane-stacked
        (U, L, L, nbins) histograms (device arrays; the driver's chain
        state). Already padded if length bucketing is in use — pass
        res_mask/true_len accordingly.
      lane_map: (K,) int array, chain k folds from pool row lane_map[k].
      candidates/lane_bucket/bucket_floors: fold_chains semantics (best-of
        lanes per chain, fixed program-shape bucketing, pair-bucket
        ratchet — the floors dict uses the same {"all": {term: P}} layout).
      true_len: slice outputs back to this length (pad_to counterpart).

    The host sees only: 4 pair counts (bucket sizing), the per-chain
    energies (candidate pick), and the final decoys. Mode 3 / idp / gpcr
    targets use the host fold_chains path (the device compiler supports
    modes 0-2, no-idp restraints — the dynamics driver's production
    space)."""
    from trx2dy.physics.tablegen import union_compiler
    from trx2dy.physics.compact import _bucket as _pair_bucket

    L = len(seq)
    lane_map = np.asarray(lane_map, np.int32)
    K = len(lane_map)
    reps = candidates if candidates > 1 else 1
    fan = np.repeat(lane_map, reps)
    n_real = len(fan)
    if lane_bucket is not None and lane_bucket > n_real:
        fan = np.concatenate(
            [fan, np.full(lane_bucket - n_real, fan[-1], np.int32)])
    C = len(fan)

    import time as _time
    tm = {} if timings is None else timings
    t0 = _time.perf_counter()
    comp = union_compiler(seq, params, mode, pcut, use_orient,
                          detect_disulf)
    count_rows = np.asarray(comp.count(pool))
    counts = count_rows[1] if growth_buckets else count_rows[0]
    tm["t_counts"] = round(_time.perf_counter() - t0, 3)
    fl = (bucket_floors.setdefault("all", {})
          if bucket_floors is not None else {})
    names = ("dist", "omega", "theta", "phi")
    # growth_buckets=True (the driver's chain steps) sizes from the
    # dampening-proxy counts (tablegen.count_fn row 1) so the shapes the
    # chain steps compile already cover the run's activation growth; the
    # initial fold keeps the as-given counts (row 0) and so never pays the
    # post-dampening workload. GROWTH_HEADROOM covers the residual
    # multi-step drift (measured ~1%); the floors ratchet stays as the
    # correctness backstop when a run outgrows even that.
    P = tuple(
        max(_pair_bucket(int(np.ceil(c * (1.0 if n in fl else
                                          GROWTH_HEADROOM)))),
            fl.get(n, 0))
        for n, c in zip(names, counts))
    for n, p_t in zip(names, P):
        fl[n] = max(fl.get(n, 0), p_t)

    t0 = _time.perf_counter()
    ur, stage_acts, r1_acts, r2_acts = comp.compile(
        pool, jnp.asarray(fan), P)
    jax.block_until_ready(ur.dist.y)
    tm["t_tables"] = round(_time.perf_counter() - t0, 3)

    if x0 is None:
        x0 = random_torsions(key, L, C)
    elif x0.shape[0] < C:
        x0 = jnp.concatenate(
            [x0, jnp.broadcast_to(x0[-1:],
                                  (C - x0.shape[0],) + x0.shape[1:])])
    x0 = x0.reshape(C, 3 * L)

    t0 = _time.perf_counter()
    x, f = _protocol_staged(x0, ur, stage_acts, r1_acts, r2_acts,
                            fastrelax=fastrelax, max_iter=max_iter,
                            dist_on_ca=False, multi_rst=True,
                            res_mask=res_mask,
                            cart_r1=cart_refine and fastrelax,
                            stage_log=stage_log)
    jax.block_until_ready(x)
    tm["t_protocol"] = round(_time.perf_counter() - t0, 3)
    t_all = x.reshape(C, 3, L)
    atoms = jax.vmap(lambda tt: build_backbone(tt[0], tt[1], tt[2]))(t_all)
    if cart_refine and fastrelax:
        t0 = _time.perf_counter()
        from trx2dy.physics.cartmin import cartesian_refine_lanes
        atoms, _ = cartesian_refine_lanes(atoms, (ur, r2_acts),
                                          SCOREFXN_RELAX, max_iter=200,
                                          res_mask=res_mask)
        jax.block_until_ready(atoms["CA"])
        tm["t_cart"] = round(_time.perf_counter() - t0, 3)
    if reps > 1:
        f_np = np.asarray(f)[:n_real].reshape(K, reps)
        pick = np.arange(K) * reps + np.argmin(f_np, axis=1)
    else:
        pick = np.arange(K)
    pick_dev = jnp.asarray(pick)
    L_true = L if true_len is None else true_len
    t = t_all[pick_dev][:, :, :L_true]
    f = f[pick_dev]
    atoms = {k: v[pick_dev][:, :L_true] for k, v in atoms.items()}
    return FoldResult(torsions=t, energy=f, atoms=atoms)


def _npz_fingerprint(npz: dict) -> str:
    """Content hash of a histogram dict (key/shape/dtype/bytes) — the
    fold_chains dedup key. ~ms per L=90 lane; negligible next to the
    O(L^2) spline fitting it saves."""
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    for k in sorted(npz):
        a = np.asarray(npz[k])
        h.update(k.encode())
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def fold_chains(npz_list, seq: str, key: jax.Array, mode: int = 2,
                use_orient: bool = True, fastrelax: bool = True,
                pcut: Optional[float] = None,
                params: FoldParams = FoldParams(), max_iter: int = 1000,
                x0: Optional[jnp.ndarray] = None,
                candidates: int = 1,
                detect_disulf: bool = True,
                bucket_floors: Optional[dict] = None,
                cart_refine: bool = True,
                pad_to: Optional[int] = None,
                lane_bucket: Optional[int] = None) -> FoldResult:
    """Fold ONE decoy per chain, each chain with its OWN restraint set.

    The TPU-native throughput axis for the Dynamics sampler: K independent
    dampening chains advance together as one batched minimization instead of
    the reference's strictly sequential single chain (run_inference.py:97-139
    folds one decoy per iteration). npz_list is one histogram dict per chain.

    candidates > 1 folds that many lanes per chain and keeps the
    lowest-energy one — the chain analog of fold_ensemble's oversample
    (culls trapped-topology decoys that would poison the dampening chain).

    lane_bucket pads the folded lane count (K * candidates) up to a fixed
    bucket by replicating the last lane (content-dedup makes the padding
    free on host; the padded lanes are dropped before returning). Callers
    that issue fold_chains with VARYING lane counts — the dynamics driver's
    initial ensembles (M*N lanes) vs its chain steps (M*K*candidates) —
    share ONE set of compiled stage-program shapes this way, instead of
    tracing + loading a second program family per process (~minutes over
    the remote-TPU tunnel).
    """
    L_true = len(seq)
    L = L_true
    K = len(npz_list)
    if candidates > 1 and x0 is not None:
        raise ValueError(
            "candidates > 1 requires x0=None: candidate lanes are fresh "
            "random inits per chain; explicit torsions would fold the same "
            "start candidate times with no best-of selection")
    pcut = params.PCUT if pcut is None else pcut
    # compile restraints / masks ONCE per UNIQUE npz dict, then fan out:
    # callers that replicate one histogram set across lanes (the driver's
    # initial ensembles) would otherwise redo the O(L^2) host spline
    # fitting per lane. Uniqueness is by CONTENT fingerprint (hashed
    # BEFORE padding, which copies) — equal-content dicts from different
    # sources dedup too, so this is a safe public-API contract; the id()
    # memo just avoids re-hashing replicated objects.
    uniq: dict = {}
    lane_of = []
    _fp_memo: dict = {}
    for npz in npz_list:
        fp = _fp_memo.get(id(npz))
        if fp is None:
            fp = _npz_fingerprint(npz)
            _fp_memo[id(npz)] = fp
        if fp not in uniq:
            uniq[fp] = (len(uniq), npz)
        lane_of.append(uniq[fp][0])
    u_npzs = [npz for _, npz in uniq.values()]
    res_mask = None
    if pad_to is not None and pad_to > L:
        # length bucketing (same contract as fold_ensemble): zero-padded
        # histograms never activate restraints; padded residues are masked
        # out of every energy term via res_mask
        u_npzs = [pad_npz(npz, L, pad_to) for npz in u_npzs]
        seq = seq + "A" * (pad_to - L)
        res_mask = jnp.arange(pad_to) < L
        L = pad_to
    u_rsts = [compile_restraints(npz, params, use_orient=use_orient)
              for npz in u_npzs]
    if detect_disulf:
        for idx, npz in enumerate(u_npzs):
            ss = disulfide_pairs(np.asarray(npz["dist"]), seq)
            if len(ss):
                u_rsts[idx] = add_disulfide_restraints(u_rsts[idx], ss)
    u_stage_masks = [_stage_masks_centroid(r, seq, mode, pcut)
                     for r in u_rsts]
    n_stages = len(u_stage_masks[0])
    u_r1 = [restraint_masks(r, seq, 1, L, pcut=0.15, nogly=True)
            for r in u_rsts]
    u_r2 = [restraint_masks(r, seq, 1, L, pcut=0.30, nogly=True)
            for r in u_rsts]
    reps = candidates if candidates > 1 else 1
    fan = [u for u in lane_of for _ in range(reps)]
    n_real = len(fan)
    if lane_bucket is not None and lane_bucket > n_real:
        fan = fan + [fan[-1]] * (lane_bucket - n_real)
    rsts = [u_rsts[u] for u in fan]
    stage_masks = [u_stage_masks[u] for u in fan]
    r1_masks = [u_r1[u] for u in fan]
    r2_masks = [u_r2[u] for u in fan]

    from trx2dy.physics.compact import compact_restraints_lanes

    def compact_with(key, masks):
        # bucket_floors (caller-owned, mutated here): ratchet the pair
        # buckets per program so iterative callers (the dynamics sampler)
        # keep ONE compiled shape per program across dampening steps — a
        # count drift across a half-octave bucket boundary otherwise costs
        # a minutes-long TPU recompile every iteration
        fl = None if bucket_floors is None else \
            bucket_floors.setdefault(key, {})
        # compaction is host-numpy; device=True transfers ONLY the unique
        # lane tables and fans them out with one jitted gather per step
        # (the chunked stage programs then pass device handles)
        cl = compact_restraints_lanes(rsts, masks, floor=fl, device=True)
        if fl is not None:
            for name in ("dist", "omega", "theta", "phi"):
                fl[name] = max(fl.get(name, 0),
                               getattr(cl, name).i.shape[1])
        return cl

    # ONE shared floor for every program family: centroid stages and both
    # relax rounds then carry IDENTICAL table shapes, so the whole protocol
    # runs on a single compiled (init, run) stage-program pair — each extra
    # executable costs ~10 s of first-use trace + load over the tunnel per
    # process. The relax rounds pay stage-sized pair padding for it
    # (act-masked, numerics unchanged).
    stages = [compact_with("all", [sm[s] for sm in stage_masks])
              for s in range(n_stages)]
    relax1 = compact_with("all", r1_masks)
    relax2 = compact_with("all", r2_masks)

    M = len(rsts)
    if x0 is None:
        x0 = random_torsions(key, L, M)
    elif x0.shape[0] < M:
        # lane_bucket padding with an explicit x0: replicate the last start
        x0 = jnp.concatenate(
            [x0, jnp.broadcast_to(x0[-1:],
                                  (M - x0.shape[0],) + x0.shape[1:])])
    x0 = x0.reshape(M, 3 * L)

    x, f = _protocol_staged(x0, None, stages, relax1, relax2,
                            fastrelax=fastrelax, max_iter=max_iter,
                            dist_on_ca=False, multi_rst=True,
                            res_mask=res_mask,
                            cart_r1=cart_refine and fastrelax)
    t_all = x.reshape(M, 3, L)
    atoms = jax.vmap(lambda tt: build_backbone(tt[0], tt[1], tt[2]))(t_all)
    if cart_refine and fastrelax:
        # cartesian channel per chain, each lane against its OWN compacted
        # relax-stage tables (see fold_ensemble; folding.py:169,234). Runs
        # over ALL bucketed lanes BEFORE candidate selection so the refine
        # program keeps the bucket shape (one compiled shape per process);
        # per-lane refinement is independent, so the kept lanes' results
        # don't depend on the dropped ones.
        from trx2dy.physics.cartmin import cartesian_refine_lanes
        atoms, _ = cartesian_refine_lanes(atoms, relax2, SCOREFXN_RELAX,
                                          max_iter=200, res_mask=res_mask)
    if reps > 1:
        # lanes k*reps .. k*reps+reps-1 belong to chain k
        f_np = np.asarray(f)[:n_real].reshape(K, reps)
        pick = np.arange(K) * reps + np.argmin(f_np, axis=1)
    else:
        pick = np.arange(K)
    pick_dev = jnp.asarray(pick)
    t = t_all[pick_dev][:, :, :L_true]
    f = f[pick_dev]
    atoms = {k: v[pick_dev] for k, v in atoms.items()}
    if L_true < L:
        atoms = {k: v[:, :L_true] for k, v in atoms.items()}
    return FoldResult(torsions=t, energy=f, atoms=atoms)
