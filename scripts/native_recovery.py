"""Native-recovery self-consistency check of the physics engine.

Bins a known structure's REAL geometry into sharp histograms (the same
measurement kernels the Dynamics loop uses, utils_trX2dy/utils.py:294-316
equivalent), folds an ensemble from those histograms alone, and reports the
best TM-score back to that native. With near-ideal restraints the folder
should recover the native fold (TM >~ 0.8) — this validates the surrogate
centroid terms + spline restraints + minimizer END TO END, independent of
any network prediction, and at ANY length (the L~300 synthetic target
catches length-dependent term imbalance).

Usage:
  python scripts/native_recovery.py [--pdb PATH] [--decoys N] [--synthetic L]
  (CPU or TPU; prints per-decoy TM + best TM)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def native_histograms(n, ca, c, cb, smooth_sigma: float = 1.0):
    """Real backbone -> smoothed histograms in the predicted-npz layout."""
    import jax.numpy as jnp
    from trx2dy.geometry.transforms import geometry_maps_6d, virtual_cb
    from trx2dy.geometry.binning import bin_geometry_maps
    from trx2dy.dynamics.dampen import gaussian_smooth_bins

    cb = np.where(np.isnan(cb), np.asarray(virtual_cb(
        jnp.asarray(n), jnp.asarray(ca), jnp.asarray(c))), cb)
    maps = geometry_maps_6d(jnp.asarray(n), jnp.asarray(ca), jnp.asarray(c),
                            cb=jnp.asarray(cb), dmax=20.0)
    hists = bin_geometry_maps(maps["dist"], maps["omega"], maps["theta"],
                              maps["phi"], angle=True, phi_compat_bug=False)
    out = {}
    for k, h in hists.items():
        h = gaussian_smooth_bins(h, smooth_sigma)
        s = jnp.sum(h, axis=-1, keepdims=True)
        out[k] = np.asarray(jnp.where(s > 0, h / jnp.maximum(s, 1e-8), h))
    return out


def _compact_walk(L: int, seed: int) -> np.ndarray:
    """Compact self-avoiding CA walk: 3.8 A steps, >=4 A self-clearance,
    confined to a globule-sized sphere (Rg ~ 2.2 L^0.38, the empirical
    compact-protein scaling). Used only as a DISTANCE TARGET — the actual
    synthetic native is a physical backbone folded to match it."""
    rng = np.random.default_rng(seed)
    R = 2.9 * L ** 0.38
    pts = np.zeros((L, 3))
    i = 1
    while i < L:
        for _ in range(200):
            u = rng.normal(size=3)
            cand = pts[i - 1] + 3.8 * u / np.linalg.norm(u)
            if np.linalg.norm(cand) > R:
                continue
            if i > 3 and np.linalg.norm(
                    pts[:i - 2] - cand, axis=1).min() < 4.0:
                continue
            pts[i] = cand
            i += 1
            break
        else:
            i = max(1, i - 5)        # backtrack out of dead ends
    return pts


def synthetic_native(L: int, seed: int = 0, max_iter: int = 600):
    """A physical, COMPACT synthetic native of length L.

    A raw torsion-segment backbone is a giant extended ribbon (Rg ~ 5x the
    compact scaling; <5% of pairs inside the 20 A restraint horizon), so
    recovering it is ill-posed — the restraints carry almost no long-range
    information. Instead: (1) draw a compact self-avoiding CA walk, (2) bin
    its pair distances into sharp dist histograms, (3) FOLD a backbone
    against them (distance-only) — the lowest-energy decoy is a genuine
    NeRF-physical compact structure (Rg and contact fraction printed) that
    the recovery test then has to find again from its own binned geometry.
    """
    import jax
    from trx2dy.physics.folder import fold_ensemble

    walk = _compact_walk(L, seed)
    d = np.linalg.norm(walk[:, None] - walk[None, :], axis=-1)
    nb = 36                                       # contact bins, 2-20 A
    centers = 2.25 + 0.5 * np.arange(nb)
    dist = np.exp(-0.5 * ((d[..., None] - centers) / 0.75) ** 2)
    dist = np.where(d[..., None] < 20.0, dist, 0.0)
    no_contact = (d >= 20.0).astype(np.float64)
    dist = np.concatenate([no_contact[..., None], dist], -1)
    dist /= dist.sum(-1, keepdims=True)
    uniform = {k: np.full((L, L, n), 1.0 / n, np.float32)
               for k, n in (("omega", 25), ("theta", 25), ("phi", 13))}
    npz = {"dist": dist.astype(np.float32), **uniform}
    res = fold_ensemble(npz, "A" * L, jax.random.PRNGKey(seed + 7),
                        n_decoys=4, max_iter=max_iter, use_orient=False,
                        fastrelax=False)
    best = int(np.argmin(np.asarray(res.energy)))
    atoms = {k: np.asarray(v)[best] for k, v in res.atoms.items()}
    ca = atoms["CA"]
    rg = float(np.sqrt(((ca - ca.mean(0)) ** 2).sum(-1).mean()))
    iu = np.triu_indices(L, k=3)
    dd = np.linalg.norm(ca[:, None] - ca[None, :], axis=-1)[iu]
    print(f"[native-recovery] synthetic L={L}: Rg={rg:.1f} A "
          f"(compact ~{2.2 * L ** 0.38:.1f}), "
          f"pairs<20A={float((dd < 20).mean()):.2f}")
    return atoms


def run(pdb: str | None, synthetic: int | None, decoys: int, max_iter: int,
        fastrelax: bool, seed: int, oversample: float = 0.5):
    import jax
    from trx2dy.physics.folder import fold_ensemble
    from trx2dy.analysis.tmscore import tm_score_pair

    if synthetic:
        atoms = synthetic_native(synthetic, seed=1)
        n, ca, c, cb = atoms["N"], atoms["CA"], atoms["C"], atoms["CB"]
        seq = "A" * synthetic
        label = f"synthetic L={synthetic}"
    else:
        from trx2dy.io.pdbio import read_pdb_backbone
        coords, seq = read_pdb_backbone(pdb)
        n, ca, c, cb = (coords[k] for k in ("N", "CA", "C", "CB"))
        label = f"{os.path.basename(pdb)} L={len(seq)}"

    npz = native_histograms(n, ca, c, cb)
    res = fold_ensemble(npz, seq, jax.random.PRNGKey(seed),
                        n_decoys=decoys, max_iter=max_iter,
                        fastrelax=fastrelax, oversample=oversample)
    tms = []
    for b in range(decoys):
        r = tm_score_pair(np.asarray(res.atoms["CA"])[b], np.asarray(ca))
        tms.append(float(r.tm))
    tms = np.asarray(tms)
    print(f"[native-recovery] {label}: decoys={decoys} "
          f"best TM={tms.max():.4f} mean={tms.mean():.4f} "
          f"per-decoy={[round(t, 3) for t in tms.tolist()]}")
    return tms


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pdb", default="/root/reference/example/apo.pdb")
    ap.add_argument("--synthetic", type=int, default=None,
                    help="use a synthetic native of this length instead")
    ap.add_argument("--decoys", type=int, default=8)
    ap.add_argument("--max_iter", type=int, default=1000)
    ap.add_argument("--fastrelax", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    run(None if args.synthetic else args.pdb, args.synthetic, args.decoys,
        args.max_iter, args.fastrelax, args.seed)


if __name__ == "__main__":
    main()
