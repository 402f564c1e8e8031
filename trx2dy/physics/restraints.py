"""Restraint compilation: predicted histograms -> dense spline energy tables.

TPU-native replacement for the reference's text-file spline restraints
(folding/utils_ros/utils_ros.py:6-146 gen_rst): instead of writing one
Rosetta ``SPLINE`` file per residue pair and letting C++ interpolate, the
-log-ratio energy tables for *all* pairs live as dense ``(L, L, n_knots)``
arrays and are fitted as natural cubic splines in one batched matmul
(trx2dy.physics.spline). Evaluation of every restraint of one geometry type
is then a single vectorized spline lookup over the ``(L, L)`` geometry maps —
no gather/scatter, MXU/VPU-friendly, and identical maths:

  dist  (utils_ros.py:54-75):
      knots  = [0.0, 2.0, 3.5] ++ [4.25 + 0.5 k, k=0..31]           (35)
      attr_k = -log((p_k + MEFF) / (p_last * (x_k/DCUT)^ALPHA + 1e-6)) + EBASE
      repul  = max(attr_0, 0) + EREP                                 (3 knots)
      active: sum(p[5:]) > PCUT, j > i
  omega (utils_ros.py:77-97):  knots linspace(-pi-1.5A, pi+1.5A, 28),
      y = -log((p+MEFF)/(p_last+MEFF)); pad [y[-2:], y[1:], y[1:3]]
      active: sum(p[1:]) > PCUT(+0.5 at add time), j > i
  theta (utils_ros.py:99-119): same tables, active j != i
  phi   (utils_ros.py:121-144): knots linspace(-1.5A, pi+1.5A, 16),
      pad [flip(y[1:3]), y[1:], flip(y[-2:])]; active j != i, +0.6 offset

Restraint *selection* (probability cutoffs, sequence-separation staging,
no-glycine filtering — utils_ros.py:706-743 add_rst) is expressed as boolean
(L, L) masks computed by :func:`restraint_masks`.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from trx2dy.physics.spline import SplineTable, fit_natural_cubic


class FoldParams(NamedTuple):
    """Numeric parameters of folding/data/params.json (keys kept verbatim)."""
    PCUT: float = 0.05
    PCUT1: float = 0.5
    EBASE: float = -0.5
    EREP: tuple = (10.0, 3.0, 0.5)
    DREP: tuple = (0.0, 2.0, 3.5)
    PREP: float = 0.1
    SIGD: float = 10.0
    SIGM: float = 1.0
    MEFF: float = 1e-4
    DCUT: float = 19.5
    ALPHA: float = 1.57
    DSTEP: float = 0.5
    ASTEP: float = 15.0  # degrees


class RestraintSet(NamedTuple):
    """Dense spline tables + activation probabilities for one npz."""
    dist: SplineTable      # y/m: (L, L, 35)
    dist_prob: jnp.ndarray  # (L, L) = sum(p[5:])
    omega: SplineTable     # (L, L, 28)
    omega_prob: jnp.ndarray
    theta: SplineTable     # (L, L, 28)
    theta_prob: jnp.ndarray
    phi: SplineTable       # (L, L, 16)
    phi_prob: jnp.ndarray


def dist_knots(p: FoldParams = FoldParams()) -> np.ndarray:
    return np.concatenate([np.asarray(p.DREP),
                           4.25 + p.DSTEP * np.arange(32)])


def torsion_knots(p: FoldParams = FoldParams()) -> np.ndarray:
    a = np.deg2rad(p.ASTEP)
    return np.linspace(-np.pi - 1.5 * a, np.pi + 1.5 * a, 28)


def planar_knots(p: FoldParams = FoldParams()) -> np.ndarray:
    a = np.deg2rad(p.ASTEP)
    return np.linspace(-1.5 * a, np.pi + 1.5 * a, 16)


def compile_restraints(npz: dict, params: FoldParams = FoldParams(),
                       use_orient: bool = True) -> RestraintSet:
    """Build dense spline energy tables from a predicted-geometry npz dict.

    Args:
      npz: dict with 'dist' (L,L,37) and, when use_orient, 'omega'/'theta'
        (L,L,25) and 'phi' (L,L,13) softmaxed histograms (numpy or jax).
      params: folding parameters (defaults = folding/data/params.json).

    Returns:
      RestraintSet. When use_orient is False the angle tables are zero-energy
      (flat splines) with zero probabilities, so their masks never activate.
    """
    p = params
    dist = np.asarray(npz["dist"], dtype=np.float32)
    L = dist.shape[0]

    # ---- dist ----------------------------------------------------- 35 knots
    xk = dist_knots(p)
    bins = xk[3:]                               # 4.25 .. 19.75
    bkgr = (bins / p.DCUT) ** p.ALPHA
    attr = (-np.log((dist[:, :, 5:] + p.MEFF)
                    / (dist[:, :, -1][:, :, None] * bkgr[None, None, :] + 1e-6))
            + p.EBASE)
    repul = np.maximum(attr[:, :, 0], 0.0)[:, :, None] + np.asarray(p.EREP)
    ydist = np.concatenate([repul, attr], axis=-1).astype(np.float32)
    dist_prob = dist[:, :, 5:].sum(-1)

    # All tables are compiled ON HOST (numpy-backed SplineTables): this
    # runs once per dampened histogram per dynamics step, and eager device
    # ops over the remote-TPU tunnel cost more than the whole fit. The
    # folder transfers finished tables to device once per program family.
    def _fit(x, y):
        return fit_natural_cubic(x, np.asarray(y))

    if use_orient:
        omega = np.asarray(npz["omega"], dtype=np.float32)
        theta = np.asarray(npz["theta"], dtype=np.float32)
        phi = np.asarray(npz["phi"], dtype=np.float32)

        def torsion_table(t):
            y = -np.log((t + p.MEFF) / (t[:, :, -1] + p.MEFF)[:, :, None])
            return np.concatenate(
                [y[:, :, -2:], y[:, :, 1:], y[:, :, 1:3]], axis=-1
            ).astype(np.float32)

        yomega = torsion_table(omega)
        ytheta = torsion_table(theta)

        yphi_raw = -np.log((phi + p.MEFF) / (phi[:, :, -1] + p.MEFF)[:, :, None])
        yphi = np.concatenate(
            [np.flip(yphi_raw[:, :, 1:3], axis=-1), yphi_raw[:, :, 1:],
             np.flip(yphi_raw[:, :, -2:], axis=-1)], axis=-1
        ).astype(np.float32)

        omega_prob = omega[:, :, 1:].sum(-1)
        theta_prob = theta[:, :, 1:].sum(-1)
        phi_prob = phi[:, :, 1:].sum(-1)
    else:
        yomega = np.zeros((L, L, 28), np.float32)
        ytheta = np.zeros((L, L, 28), np.float32)
        yphi = np.zeros((L, L, 16), np.float32)
        omega_prob = theta_prob = phi_prob = np.full((L, L), -1.0, np.float32)

    return RestraintSet(
        dist=_fit(xk, ydist), dist_prob=np.asarray(dist_prob),
        omega=_fit(torsion_knots(p), yomega), omega_prob=np.asarray(omega_prob),
        theta=_fit(torsion_knots(p), ytheta), theta_prob=np.asarray(theta_prob),
        phi=_fit(planar_knots(p), yphi), phi_prob=np.asarray(phi_prob),
    )


class RestraintMasks(NamedTuple):
    """Active (L, L) boolean masks per geometry type for one protocol stage."""
    dist: jnp.ndarray
    omega: jnp.ndarray
    theta: jnp.ndarray
    phi: jnp.ndarray


def restraint_masks(rst: RestraintSet, seq: str, sep1: int, sep2: int,
                    pcut: float = 0.05, nogly: bool = False) -> RestraintMasks:
    """Boolean restraint-activation masks, reference add_rst semantics
    (utils_ros.py:706-743): sep1 <= |i-j| < sep2; prob >= pcut (+0.5 for
    omega/theta, +0.6 for phi); dist/omega upper-triangle only; optional
    glycine exclusion (relax stages run on the real sequence where GLY has no
    CB, folding.py:218-229)."""
    L = rst.dist_prob.shape[0]
    idx = np.arange(L)
    sep = np.abs(idx[:, None] - idx[None, :])
    sep_ok = (sep >= sep1) & (sep < sep2)
    upper = idx[:, None] < idx[None, :]
    offdiag = idx[:, None] != idx[None, :]
    if nogly:
        isg = np.frombuffer(seq.encode(), dtype=np.uint8) == ord("G")
        pair_ok = ~(isg[:, None] | isg[None, :])
        sep_ok = sep_ok & pair_ok
    # host numpy throughout: masks feed the host-side compaction
    # (physics.compact) — no device round trips on the per-step path
    return RestraintMasks(
        dist=sep_ok & upper & (np.asarray(rst.dist_prob) >= pcut),
        omega=sep_ok & upper & (np.asarray(rst.omega_prob) >= pcut + 0.5),
        theta=sep_ok & offdiag & (np.asarray(rst.theta_prob) >= pcut + 0.5),
        phi=sep_ok & offdiag & (np.asarray(rst.phi_prob) >= pcut + 0.6),
    )


def disulfide_pairs(dist_hist, seq: str, gate: float = 4.75,
                    min_contact: float = 0.5, min_sep: int = 3) -> np.ndarray:
    """Candidate disulfide CYS pairs from the predicted distance histogram.

    The reference folds with '-detect_disulf' and re-detects disulfides
    before FastRelax round 2 (folding/folding.py:48,233), so SS bonds
    constrain the BACKBONE during relax. Without sidechains at fold time,
    the closest available signal is the predicted CB-CB distance mode: a
    disulfide's CB-CB distance is ~3.4-4.5 A, BELOW the spline restraints'
    attractive range (the tables' attractive knots start at 4.25 A —
    compile_restraints / utils_ros.py:54-75 — so an ordinary restraint
    cannot hold a bonded pair). Gate: both residues CYS, |i-j| >= min_sep,
    mode distance <= gate and total contact probability >= min_contact.

    Returns (P, 2) int array of (i, j) pairs, i < j.
    """
    p = np.asarray(dist_hist)
    L = p.shape[0]
    is_c = np.frombuffer(seq[:L].encode(), np.uint8) == ord("C")
    if is_c.sum() < 2:
        return np.zeros((0, 2), np.int64)
    # npz layout: bin 0 = no-contact, bins 1..36 = [2, 20) A at 0.5 A
    mode_d = 2.25 + 0.5 * p[:, :, 1:].argmax(-1)
    contact = p[:, :, 1:].sum(-1)
    ii, jj = np.triu_indices(L, k=min_sep)
    ok = (is_c[ii] & is_c[jj] & (mode_d[ii, jj] <= gate)
          & (contact[ii, jj] >= min_contact))
    return np.stack([ii[ok], jj[ok]], axis=-1)


def add_disulfide_restraints(rst: RestraintSet, pairs: np.ndarray,
                             k_spring: float = 10.0,
                             d0: float = 3.85) -> RestraintSet:
    """Replace the dist spline of the given pairs with a harmonic SG-proxy
    well k_spring*(d_CB-CB - d0)^2 and force the pairs active at every
    probability cutoff (dist_prob = 1), so the well holds through ALL
    centroid and relax stages — the backbone-level stand-in for Rosetta's
    disulfide constraint during FastRelax (folding.py:233).

    d0 = 3.85 A is the canonical disulfide CB-CB distance; the quadratic
    keeps pulling from any range (Rosetta HARMONIC semantics)."""
    if len(pairs) == 0:
        return rst
    from trx2dy.physics.spline import fit_natural_cubic

    x = np.asarray(rst.dist.x)
    y = np.array(np.asarray(rst.dist.y))
    well = (k_spring * (x - d0) ** 2).astype(y.dtype)
    prob = np.array(np.asarray(rst.dist_prob))
    for i, j in np.asarray(pairs):
        y[i, j] = y[j, i] = well
        prob[i, j] = prob[j, i] = 1.0
    return rst._replace(dist=fit_natural_cubic(x, y), dist_prob=prob)


def restraint_energy(rst: RestraintSet, masks: RestraintMasks,
                     dist, omega, theta, phi,
                     w_atom_pair: float, w_dihedral: float, w_angle: float):
    """Total restraint energy of one conformation's dense geometry maps.

    Uses the analytic-VJP spline energy (spline.masked_spline_energy): the
    backward pass w.r.t. the geometry queries is a single multiply instead
    of autodiff re-traversing the one-hot interpolation — the folder's
    L-BFGS evaluates this gradient thousands of times per decoy.

    Args:
      dist/omega/theta/phi: (L, L) geometry maps (no contact cutoff — spline
        extrapolation handles long range, like Rosetta does).
      w_*: constraint-type weights from the score function
        (atom_pair_constraint / dihedral_constraint / angle_constraint,
        folding/data/scorefxn.wts).
    """
    from trx2dy.physics.spline import masked_spline_energy

    def term(table, q, mask):
        return masked_spline_energy(table.y, table.m, table.x, q, mask)

    e = w_atom_pair * term(rst.dist, dist, masks.dist)
    e += w_dihedral * term(rst.omega, omega, masks.omega)
    e += w_dihedral * term(rst.theta, theta, masks.theta)
    e += w_angle * term(rst.phi, phi, masks.phi)
    return e


def compile_restraints_af2(npz: dict, params: FoldParams = FoldParams()
                           ) -> "RestraintSet":
    """AF2-distogram restraints (-r af2): 64-bin CA-CA distograms -> 60-knot
    spline tables (utils_ros.py:148-194 gen_rst_af2).

    npz keys: 'dist' (L, L, 64) probabilities, 'bins' (64,) bin centers.
    The distance restraint acts on CA-CA (the folder must evaluate it on CA
    coordinates); orientation restraints are unsupported like the reference.
    Quirks kept: the background uses only the LAST bin's (bins/DCUT)^ALPHA
    value (a scalar — utils_ros.py:172), and PCUT is hardcoded to 0.0025.
    """
    p = params
    dist = np.asarray(npz["dist"], dtype=np.float32)
    af_bins = np.asarray(npz["bins"], dtype=np.float64)
    L = dist.shape[0]
    bins = af_bins[5:-1]
    prob = dist[:, :, 6:-1].sum(-1)
    bkgr_last = float((bins[-1] / p.DCUT) ** p.ALPHA)
    attr = (-np.log((dist[:, :, 6:-1] + p.MEFF)
                    / (dist[:, :, -2][:, :, None] * bkgr_last + 1e-6))
            + p.EBASE)
    repul = np.maximum(attr[:, :, 0], 0.0)[:, :, None] + np.asarray(p.EREP)
    ydist = np.concatenate([repul, attr], axis=-1).astype(np.float32)
    knots = np.concatenate([[0.0, 2.325, 3.575], bins])

    zeros28 = np.zeros((L, L, 28), np.float32)
    zeros16 = np.zeros((L, L, 16), np.float32)
    neg = np.full((L, L), -1.0, np.float32)
    # shift prob so the reference's hardcoded 0.0025 cutoff maps onto the
    # standard pcut comparison in restraint_masks (prob' >= pcut - 0.0475)
    return RestraintSet(
        dist=fit_natural_cubic(knots, ydist),
        dist_prob=prob + (0.05 - 0.0025),
        omega=fit_natural_cubic(torsion_knots(p), zeros28),
        omega_prob=neg,
        theta=fit_natural_cubic(torsion_knots(p), zeros28),
        theta_prob=neg,
        phi=fit_natural_cubic(planar_knots(p), zeros16),
        phi_prob=neg,
    )


def compile_restraints_idp(npz: dict, params: FoldParams = FoldParams(),
                           use_orient: bool = True) -> "RestraintSet":
    """IDR-aware restraints (-r idp, utils_ros.py:196-373 gen_idp_rst):
    for intrinsically-disordered pairs (npz['idr'][i,j] truthy) the -log
    background is MODE-relative — normalized by the max-probability bin
    (distance background scaled by (x/x_mode)^ALPHA, angles by p_max) —
    instead of last-bin-relative. Tables are blended per pair by the idr
    mask; activation masks are unchanged (mode-3 staging applies the
    order/disorder pair masks on top, folding.py:173-187).
    """
    p = params
    std = compile_restraints(npz, params, use_orient=use_orient)
    idr = np.asarray(npz["idr"], dtype=bool)
    if idr.ndim == 1:          # residue-level flags -> pair mask
        idr = idr[:, None] | idr[None, :]
    dist = np.asarray(npz["dist"], dtype=np.float32)
    bins = 4.25 + p.DSTEP * np.arange(32)

    mode_bin = np.argmax(dist[:, :, 5:], axis=-1)
    idr_bkgr = (bins[None, None, :] / bins[mode_bin][:, :, None]) ** p.ALPHA
    idr_attr = (-np.log((dist[:, :, 5:] + p.MEFF)
                        / (dist[:, :, 5:].max(-1)[:, :, None] * idr_bkgr
                           + 1e-6)) + p.EBASE)
    repul = np.asarray(std.dist.y)[:, :, :3]
    ydist_idr = np.concatenate([repul, idr_attr], axis=-1).astype(np.float32)
    ydist = np.where(idr[:, :, None], ydist_idr, np.asarray(std.dist.y))
    out = std._replace(dist=fit_natural_cubic(dist_knots(p), ydist))

    if use_orient:
        def idr_torsion(t):
            y = -np.log((t + p.MEFF) / (t.max(-1) + p.MEFF)[:, :, None])
            return np.concatenate([y[:, :, -2:], y[:, :, 1:], y[:, :, 1:3]],
                                  axis=-1).astype(np.float32)

        for key in ("omega", "theta"):
            t = np.asarray(npz[key], dtype=np.float32)
            y = np.where(idr[:, :, None], idr_torsion(t),
                         np.asarray(getattr(std, key).y))
            out = out._replace(**{key: fit_natural_cubic(torsion_knots(p),
                                                         y)})
        phi = np.asarray(npz["phi"], dtype=np.float32)
        yraw = -np.log((phi + p.MEFF) / (phi.max(-1) + p.MEFF)[:, :, None])
        yidr = np.concatenate([np.flip(yraw[:, :, 1:3], -1), yraw[:, :, 1:],
                               np.flip(yraw[:, :, -2:], -1)],
                              axis=-1).astype(np.float32)
        y = np.where(idr[:, :, None], yidr, np.asarray(std.phi.y))
        out = out._replace(phi=fit_natural_cubic(planar_knots(p), y))
    return out


def _gaussian_vote(onehot_stack: np.ndarray) -> np.ndarray:
    """get_sample (utils_ros.py:458-483): blend N known-structure one-hot
    histograms into a soft distribution by voting Gaussians per realized bin,
    width set by the vote count (<N/3 -> 1.5, >2N/3 -> 0.5, else 1.0).

    Args:
      onehot_stack: (N, L, L, C) one-hot histograms of the known structures.
    Returns (L, L, C) soft histogram (divided by N).
    """
    N, _, _, C = onehot_stack.shape
    counts = onehot_stack.sum(0)                       # (L, L, C)
    std = np.where(counts < N / 3.0, 1.5,
                   np.where(counts > 2.0 * N / 3.0, 0.5, 1.0))
    x = np.arange(C, dtype=np.float64)
    out = np.zeros(counts.shape, np.float64)
    for k in range(C):
        c_k = counts[:, :, k]
        if not c_k.any():
            continue
        s = std[:, :, k][..., None]
        gauss = (np.exp(-((x[None, None, :] - k) ** 2) / (2.0 * s ** 2))
                 / np.sqrt(2.0 * np.pi * s ** 2))
        out += c_k[..., None] * gauss
    return (out / N).astype(np.float32)


def _linear_blend(test: np.ndarray, cate: np.ndarray, bins: np.ndarray,
                  mask: np.ndarray, rg: int = 5) -> np.ndarray:
    """ling_sumlt (utils_ros.py:375-394), vectorized: for masked pairs,
    replace the predicted table's values at the rg lowest-energy bins of the
    known-structure table by a linear interpolation between the predicted
    values at the bracketing bins — flattening the predicted restraint over
    the region the known structures favour."""
    order = np.argsort(cate, axis=-1)[..., :rg]        # (L, L, rg)
    lo = order.min(-1)
    hi = order.max(-1)
    low = np.where(lo - 1 < 0, lo, lo - 1)
    high = np.where(hi + 1 >= len(bins), hi, hi + 1)
    t_low = np.take_along_axis(test, low[..., None], -1)[..., 0]
    t_high = np.take_along_axis(test, high[..., None], -1)[..., 0]
    denom = bins[low] - bins[high]
    denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
    interp = ((bins[order] - bins[high][..., None]) / denom[..., None]
              * (t_low - t_high)[..., None] + t_high[..., None])
    out = test.copy()
    ii, jj = np.where(mask)
    out[ii[:, None], jj[:, None], order[ii, jj]] = interp[ii, jj]
    return out


def compile_restraints_gpcr(npz: dict, known_npz: dict,
                            params: FoldParams = FoldParams(),
                            use_orient: bool = True) -> "RestraintSet":
    """GPCR two-conformation restraints (-r gpcr, utils_ros.py:484-654
    gen_gpcr_rst): predicted tables, with the regions the KNOWN structures
    realize linearly flattened on idr-masked pairs, so minimization can fall
    into either the predicted or the known conformation.

    known_npz: real-valued geometry maps of N known structures —
      'dist' (N, L, L); when use_orient also 'omega', 'theta_asym',
      'phi_asym' (N, L, L) (reference key names, utils_ros.py:488).
    npz additionally carries 'idr' (the blend mask).
    """
    from trx2dy.geometry.binning import bin_geometry_maps
    import jax.numpy as _jnp

    p = params
    std_set = compile_restraints(npz, params, use_orient=use_orient)
    idr = np.asarray(npz["idr"], dtype=bool)
    if idr.ndim == 1:
        idr = idr[:, None] | idr[None, :]

    known_dist = np.asarray(known_npz["dist"], np.float32)
    N = known_dist.shape[0]

    def onehots(key_real, key_bin):
        stack = []
        for n in range(N):
            maps = dict(dist=known_dist[n])
            if use_orient:
                maps["omega"] = np.asarray(known_npz["omega"][n], np.float32)
                maps["theta"] = np.asarray(known_npz["theta_asym"][n],
                                           np.float32)
                maps["phi"] = np.asarray(known_npz["phi_asym"][n], np.float32)
                h = bin_geometry_maps(_jnp.asarray(maps["dist"]),
                                      _jnp.asarray(maps["omega"]),
                                      _jnp.asarray(maps["theta"]),
                                      _jnp.asarray(maps["phi"]), angle=True)
            else:
                h = bin_geometry_maps(_jnp.asarray(maps["dist"]), angle=False)
            stack.append(np.asarray(h[key_bin]))
        return np.stack(stack)

    bins_d = dist_knots(p)
    cate_dist = _gaussian_vote(onehots("dist", "dist"))
    bkgr = (bins_d[3:] / p.DCUT) ** p.ALPHA
    attr = (-np.log((cate_dist[:, :, 5:] + p.MEFF)
                    / (cate_dist[:, :, -1][:, :, None] * bkgr + 1e-6))
            + p.EBASE)
    repul = np.maximum(attr[:, :, 0], 0.0)[:, :, None] + np.asarray(p.EREP)
    cate_table = np.concatenate([repul, attr], -1).astype(np.float32)
    ydist = _linear_blend(np.asarray(std_set.dist.y), cate_table, bins_d, idr)
    out = std_set._replace(dist=fit_natural_cubic(bins_d, ydist))

    if use_orient:
        def cate_torsion(key_bin):
            cate = _gaussian_vote(onehots(None, key_bin))
            y = -np.log((cate + p.MEFF) / (cate[:, :, -1] + p.MEFF)[:, :, None])
            return np.concatenate([y[:, :, -2:], y[:, :, 1:], y[:, :, 1:3]],
                                  -1).astype(np.float32)

        tk = torsion_knots(p)
        for key in ("omega", "theta"):
            y = _linear_blend(np.asarray(getattr(out, key).y),
                              cate_torsion(key), tk, idr)
            out = out._replace(**{key: fit_natural_cubic(tk, y)})

        cate = _gaussian_vote(onehots(None, "phi"))
        yraw = -np.log((cate + p.MEFF) / (cate[:, :, -1] + p.MEFF)[:, :, None])
        ycate = np.concatenate([np.flip(yraw[:, :, 1:3], -1), yraw[:, :, 1:],
                                np.flip(yraw[:, :, -2:], -1)],
                               -1).astype(np.float32)
        pk = planar_knots(p)
        y = _linear_blend(np.asarray(out.phi.y), ycate, pk, idr)
        out = out._replace(phi=fit_natural_cubic(pk, y))
    return out
