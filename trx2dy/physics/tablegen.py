"""On-device restraint-table compilation for the dynamics chain path.

The reference rebuilds restraints from each dampened histogram ON THE HOST
every sampling iteration (utils_trX2dy/utils.py:379-475 writes npz files,
folding/utils_ros/utils_ros.py:6-146 gen_rst re-derives spline tables from
them), and earlier rounds of this repo mirrored that: histograms came back
to the host each step for numpy spline fitting + pair-list compaction
(35-55 s of per-step host round-trips over the remote-TPU tunnel,
EXAMPLE_RESULTS.md). Everything in that pipeline is array math, so this
module runs it as ONE jitted device program per step:

  dampened histograms (lane-stacked, device-resident)
    -> activation probabilities + per-family masks  (elementwise)
    -> shared union pair list                       (nonzero with static size)
    -> per-lane -log-ratio tables at active pairs   (gather + elementwise)
    -> natural-cubic second derivatives             (one (P,K)x(K,K) matmul)
    -> disulfide harmonic wells                     (where-override)

producing compact.UnionRestraints / UnionActs for the staged folder. The
pair-list size P per term is a STATIC shape, ratcheted by the caller across
dampening steps exactly like the host path's bucket_floors (a count drift
across a bucket boundary costs one recompile, then the shape is pinned).

Per-pair numerics match physics.restraints.compile_restraints /
restraint_masks / disulfide handling bit-for-bit in formula (same -log
ratios, same knot grids, same cutoffs); only the iteration space (active
pairs instead of dense (L, L)) and the execution site (device) changed.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.physics.restraints import (
    FoldParams, dist_knots, torsion_knots, planar_knots,
)
from trx2dy.physics.spline import _second_derivative_operator
from trx2dy.physics.compact import UnionTerm, UnionRestraints, UnionActs

_HI = jax.lax.Precision.HIGHEST

# term -> (prob-cutoff offset, triangle kind) — restraint_masks semantics
# (utils_ros.py:706-743: omega/theta need pcut+0.5, phi pcut+0.6; dist and
# omega act on the upper triangle, theta/phi on all off-diagonal pairs)
_TERMS = (("dist", 0.0, "upper"), ("omega", 0.5, "upper"),
          ("theta", 0.5, "offdiag"), ("phi", 0.6, "offdiag"))

# disulfide gate (restraints.disulfide_pairs defaults)
_SS_GATE = 4.75
_SS_MIN_CONTACT = 0.5
_SS_MIN_SEP = 3
_SS_K = 10.0      # add_disulfide_restraints k_spring
_SS_D0 = 3.85


def _stage_ranges(mode: int, L: int):
    """Cumulative sequence-separation ranges per centroid stage
    (folder._stage_masks_centroid modes 0/1/2)."""
    if mode == 0:
        ranges = [(1, 12), (12, 24), (24, L)]
    elif mode == 1:
        ranges = [(3, 24), (24, L)]
    elif mode == 2:
        ranges = [(1, L)]
    else:
        raise ValueError(
            f"mode {mode} not supported by the device table compiler "
            "(0/1/2; mode 3 / idr targets use the host fold_chains path)")
    cum = []
    lo = ranges[0][0]
    for (s1, s2) in ranges:
        lo = min(lo, s1)
        cum.append((lo, s2))      # cumulative union of sep windows
    return cum


class _UnionCompiler(NamedTuple):
    """Host handle: jitted (count, compile) pair for one static context."""
    count: object
    compile: object
    n_stages: int


@functools.lru_cache(maxsize=16)
def _compiler_cache(seq: str, params: FoldParams, mode: int, pcut: float,
                    use_orient: bool, detect_disulf: bool) -> _UnionCompiler:
    return _build_compiler(seq, params, mode, pcut, use_orient,
                           detect_disulf)


def union_compiler(seq: str, params: FoldParams = FoldParams(),
                   mode: int = 2, pcut: float | None = None,
                   use_orient: bool = True,
                   detect_disulf: bool = True) -> _UnionCompiler:
    """The (count, compile) program pair for a static folding context.

    Cached per (seq, params, mode, pcut, use_orient, detect_disulf): the
    sequence-derived pair masks and spline operators are baked into the
    programs as constants (small: a few (L, L) bools)."""
    pcut = params.PCUT if pcut is None else pcut
    return _compiler_cache(seq, params, mode, float(pcut), use_orient,
                           detect_disulf)


def _build_compiler(seq: str, params: FoldParams, mode: int, pcut: float,
                    use_orient: bool, detect_disulf: bool) -> _UnionCompiler:
    p = params
    L = len(seq)
    idx = np.arange(L)
    sep = np.abs(idx[:, None] - idx[None, :])
    upper = idx[:, None] < idx[None, :]
    offdiag = idx[:, None] != idx[None, :]
    tri = {"upper": upper, "offdiag": offdiag}
    isg = np.frombuffer(seq.encode(), np.uint8) == ord("G")
    nogly = ~(isg[:, None] | isg[None, :])
    ranges = _stage_ranges(mode, L)
    n_stages = len(ranges)
    range_masks = [(sep >= s1) & (sep < s2) for (s1, s2) in ranges]
    # families: n_stages centroid masks, then relax1 (0.15) / relax2 (0.30)
    # with nogly (folder.fold_chains's restraint_masks calls)
    fam_base = [(pcut, rm, False) for rm in range_masks]
    fam_base += [(0.15, sep >= 1, True), (0.30, sep >= 1, True)]
    # union pair list must cover every family's possible active set: the
    # lowest probability cutoff, full separation range, no gly filter
    union_cut = min(pcut, 0.15)

    is_c = np.frombuffer(seq.encode(), np.uint8) == ord("C")
    ss_scope = (is_c[:, None] & is_c[None, :]) & (sep >= _SS_MIN_SEP)
    ss_possible = detect_disulf and is_c.sum() >= 2

    knots = {"dist": dist_knots(p), "omega": torsion_knots(p),
             "theta": torsion_knots(p), "phi": planar_knots(p)}
    ops = {k: _second_derivative_operator(
        np.asarray(v, np.float64)).astype(np.float32)
        for k, v in knots.items()}
    bkgr = ((knots["dist"][3:] / p.DCUT) ** p.ALPHA).astype(np.float32)
    erep = np.asarray(p.EREP, np.float32)
    ss_well = (_SS_K * (knots["dist"] - _SS_D0) ** 2).astype(np.float32)

    def probs_and_ss(pool):
        """(U, L, L) activation probabilities per term + the per-lane
        disulfide pair mask (symmetric)."""
        pr = {"dist": jnp.sum(pool["dist"][..., 5:], axis=-1)}
        if use_orient:
            for k in ("omega", "theta", "phi"):
                pr[k] = jnp.sum(pool[k][..., 1:], axis=-1)
        else:
            neg = jnp.full_like(pr["dist"], -1.0)
            pr.update(omega=neg, theta=neg, phi=neg)
        if ss_possible:
            d = pool["dist"]
            mode_d = 2.25 + 0.5 * jnp.argmax(d[..., 1:], axis=-1)
            contact = jnp.sum(d[..., 1:], axis=-1)
            ss = (jnp.asarray(ss_scope) & (mode_d <= _SS_GATE)
                  & (contact >= _SS_MIN_CONTACT))
            ss = ss | jnp.swapaxes(ss, -1, -2)
        else:
            ss = jnp.zeros(pr["dist"].shape, bool)
        # disulfide pairs are forced active at every cutoff
        # (add_disulfide_restraints sets dist_prob = 1)
        pr["dist"] = jnp.where(ss, 1.0, pr["dist"])
        return pr, ss

    def _dampen_proxy(p):
        """One worst-case dampening step (decay the modal bin of every
        maskable pair by the default rate, renormalize, smooth) — the three
        channels that grow the activation set across a dynamics run. Used
        only to SIZE the chain-step pair buckets: the actual masks always
        come from the real histograms."""
        from trx2dy.dynamics.dampen import gaussian_smooth_bins
        nb = p.shape[-1]
        masked = jnp.max(p, axis=-1) < 0.5
        oh = jax.nn.one_hot(jnp.argmax(p, axis=-1), nb, dtype=p.dtype)
        dec = jnp.where((oh > 0) & masked[..., None], p * 0.5, p)
        ssum = jnp.sum(dec, axis=-1, keepdims=True)
        dec = dec / jnp.where(ssum == 0, 1.0, ssum)
        sm = gaussian_smooth_bins(dec, 1.0)
        ssum = jnp.sum(sm, axis=-1, keepdims=True)
        sm = sm / jnp.where(ssum == 0, 1.0, ssum)
        return jnp.where(masked[..., None], sm, p)

    @jax.jit
    def count_fn(pool: dict) -> jnp.ndarray:
        """(2, 4) int32 union-over-lanes active-pair counts per term
        (dist, omega, theta, phi): row 0 = the histograms as given, row 1
        = union with a one-step dampening proxy (_dampen_proxy). Row 1
        sizes the CHAIN-STEP buckets so dampening-driven activation growth
        never re-mints program shapes mid-run; row 0 sizes the initial
        fold, which should not pay the post-dampening workload."""
        pr, _ = probs_and_ss(pool)
        if use_orient:
            pool_d = {k: _dampen_proxy(pool[k]) for k in pool}
        else:
            pool_d = {"dist": _dampen_proxy(pool["dist"])}
        pr_d, _ = probs_and_ss({**pool, **pool_d})
        raw, grown = [], []
        for name, off, kind in _TERMS:
            base = jnp.asarray(tri[kind] & (sep >= 1))
            m = jnp.any(pr[name] >= union_cut + off, axis=0) & base
            md = m | (jnp.any(pr_d[name] >= union_cut + off, axis=0)
                      & base)
            raw.append(jnp.sum(m, dtype=jnp.int32))
            grown.append(jnp.sum(md, dtype=jnp.int32))
        return jnp.stack([jnp.stack(raw), jnp.stack(grown)])

    def _tables_at_pairs(pool, name, flat):
        """(U, P, K) -log-ratio spline values at the gathered pairs —
        compile_restraints' formulas (restraints.py:99-150) evaluated only
        at the union pair list."""
        U = pool[name].shape[0]
        nb = pool[name].shape[-1]
        ph = jnp.take(pool[name].reshape(U, L * L, nb), flat, axis=1)
        if name == "dist":
            attr = (-jnp.log((ph[..., 5:] + p.MEFF)
                             / (ph[..., -1:] * bkgr + 1e-6)) + p.EBASE)
            repul = jnp.maximum(attr[..., :1], 0.0) + erep
            return jnp.concatenate([repul, attr], axis=-1)
        y = -jnp.log((ph + p.MEFF) / (ph[..., -1:] + p.MEFF))
        if name == "phi":
            return jnp.concatenate(
                [jnp.flip(y[..., 1:3], -1), y[..., 1:],
                 jnp.flip(y[..., -2:], -1)], axis=-1)
        return jnp.concatenate([y[..., -2:], y[..., 1:], y[..., 1:3]],
                               axis=-1)

    @functools.partial(jax.jit, static_argnames=("P",))
    def compile_fn(pool: dict, lane_map: jnp.ndarray, P: tuple):
        """pool: per-term (U, L, L, nbins) lane-stacked histograms;
        lane_map: (C,) int32 fold-lane -> pool-row; P: static per-term
        pair-bucket sizes (dist, omega, theta, phi).

        Returns (UnionRestraints with (C, P, K) tables,
                 [UnionActs per centroid stage], relax1 acts, relax2 acts).
        """
        pr, ss = probs_and_ss(pool)
        terms = {}
        acts = {name: [] for name, _, _ in _TERMS}
        for (name, off, kind), P_t in zip(_TERMS, P):
            base = jnp.asarray(tri[kind] & (sep >= 1))
            union = jnp.any(pr[name] >= union_cut + off, axis=0) & base
            if name == "dist" and ss_possible:
                union = union | (jnp.any(ss, axis=0) & base)
            (flat,) = jnp.nonzero(union.reshape(-1), size=P_t,
                                  fill_value=1)   # pad pair = (0, 1)
            n_real = jnp.sum(union, dtype=jnp.int32)
            pad = jnp.arange(P_t) >= n_real
            i = (flat // L).astype(jnp.int32)
            j = (flat % L).astype(jnp.int32)

            y_u = _tables_at_pairs(pool, name, flat)       # (U, P, K)
            if name == "dist" and ss_possible:
                U = ss.shape[0]
                ss_pair = jnp.take(ss.reshape(U, L * L), flat, axis=1)
                y_u = jnp.where(ss_pair[..., None], ss_well, y_u)
            if not use_orient and name != "dist":
                y_u = jnp.zeros_like(y_u)
            m_u = jnp.einsum("upn,kn->upk", y_u, jnp.asarray(ops[name]),
                             precision=_HI)
            terms[name] = UnionTerm(
                i=i, j=j,
                y=jnp.take(y_u, lane_map, axis=0),
                m=jnp.take(m_u, lane_map, axis=0),
                x=jnp.asarray(knots[name], jnp.float32))

            U = pr[name].shape[0]
            prob_pair = jnp.take(pr[name].reshape(U, L * L), flat, axis=1)
            prob_pair = jnp.take(prob_pair, lane_map, axis=0)  # (C, P)
            for cut, rmask, ng in fam_base:
                fam = jnp.asarray(rmask & tri[kind]
                                  & (nogly if ng else True))
                ok = jnp.take(fam.reshape(-1), flat)           # (P,)
                acts[name].append((prob_pair >= cut + off)
                                  & ok[None, :] & ~pad[None, :])

        ur = UnionRestraints(**terms)
        fams = [UnionActs(*(acts[name][f] for name, _, _ in _TERMS))
                for f in range(n_stages + 2)]
        return ur, fams[:n_stages], fams[n_stages], fams[n_stages + 1]

    return _UnionCompiler(count=count_fn, compile=compile_fn,
                          n_stages=n_stages)
