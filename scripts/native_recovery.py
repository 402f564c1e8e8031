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


def _beta_meander_trace(n_strands: int = 5, strand_len: int = 9,
                        sandwich: bool = False):
    """Idealized antiparallel beta CA trace, used only as a DISTANCE TARGET.

    Strands run along +/-x with the beta-typical ~3.4 A rise per residue
    and 4.8 A inter-strand ladder spacing; 2-residue turns arc over the
    sheet plane with ~3.2-3.7 A chain steps (real hairpin-turn scale).
    sandwich=True stacks a second meander sheet 10 A below, reached by a
    chain-step crossover loop. The actual synthetic native is a physical
    backbone FOLDED to match this trace's distances, so strand pairing
    emerges from the restraints, exactly like _compact_walk's globule."""
    step, lateral = 3.4, 4.8
    pts: list = []

    def sheet(z, y0, dir_y, flip=0):
        for s in range(n_strands):
            y = y0 + dir_y * s * lateral
            xs = np.arange(strand_len) * step
            if (s + flip) % 2:
                xs = xs[::-1]
            for x in xs:
                pts.append((x, y, z))
            if s + 1 < n_strands:
                # 2-residue hairpin turn bulging out of the sheet plane:
                # steps ~3.7 / 3.2 / 3.7 A across the 4.8 A strand gap
                x_end = pts[-1][0]
                bulge = 3.6 if z >= 0 else -3.6
                pts.append((x_end, y + dir_y * 0.8, z + bulge))
                pts.append((x_end, y + dir_y * 4.0, z + bulge))

    sheet(0.0, 0.0, +1)
    if sandwich:
        ax, ay, az = pts[-1]
        # second sheet runs back DOWN in y, 10 A below; crossover loop in
        # ~3.6 A chain steps
        b = np.asarray((ax, ay - 3.0, az - 10.0))
        a = np.asarray((ax, ay, az))
        gap = float(np.linalg.norm(b - a))
        n_link = max(int(np.ceil(gap / 3.6)) - 1, 1)
        for t in range(1, n_link + 1):
            pts.append(tuple(a + (b - a) * t / (n_link + 1)))
        # x-flip so sheet 2's first strand starts at the crossover's x end
        sheet(b[2], b[1], -1, flip=n_strands % 2)
    return np.asarray(pts, np.float64)


def synthetic_beta_native(seed: int = 0, max_iter: int = 600,
                          n_strands: int = 5, strand_len: int = 9,
                          sandwich: bool = False):
    """A physical, SHEET-DOMINANT synthetic native (VERDICT r2 item 5).

    The compact-walk target exercises helical/globular packing; nothing in
    it stresses the long-range hbond surrogate that makes or breaks
    beta-pairing (physics/energy.py hbond_lr). This target's distance map
    IS a beta ladder: antiparallel strands 4.8 A apart with register-shifted
    contacts, so the folded native carries extended strands and the
    recovery fold has to hold them paired."""
    import jax
    from trx2dy.physics.folder import fold_ensemble

    trace = _beta_meander_trace(n_strands, strand_len, sandwich=sandwich)
    L = len(trace)
    d = np.linalg.norm(trace[:, None] - trace[None, :], axis=-1)
    nb = 36
    centers = 2.25 + 0.5 * np.arange(nb)
    dist = np.exp(-0.5 * ((d[..., None] - centers) / 0.6) ** 2)
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
    # sheet-content diagnostic: fraction of residues in the extended
    # basin (phi < -100 deg, psi > 90 deg or < -150 deg)
    import jax.numpy as jnp
    from trx2dy.geometry.transforms import backbone_torsions
    (phi, psi, _), _ = backbone_torsions(
        jnp.asarray(atoms["N"]), jnp.asarray(atoms["CA"]),
        jnp.asarray(atoms["C"]))
    phi, psi = np.asarray(phi), np.asarray(psi)
    ext = ((phi < np.deg2rad(-45)) &
           ((psi > np.deg2rad(60)) | (psi < np.deg2rad(-150))))
    ca = atoms["CA"]
    rg = float(np.sqrt(((ca - ca.mean(0)) ** 2).sum(-1).mean()))
    print(f"[native-recovery] synthetic-beta L={L}: Rg={rg:.1f} A, "
          f"extended-basin fraction={float(ext.mean()):.2f}, "
          f"trace-fit RMSD-free best energy={float(res.energy[best]):.0f}")
    return atoms


def run(pdb: str | None, synthetic: int | None, decoys: int, max_iter: int,
        fastrelax: bool, seed: int, oversample: float = 0.5,
        beta: bool = False, sandwich: bool = False):
    import jax
    from trx2dy.physics.folder import fold_ensemble
    from trx2dy.analysis.tmscore import tm_score_pair

    if beta:
        atoms = synthetic_beta_native(seed=1, sandwich=sandwich)
        n, ca, c, cb = atoms["N"], atoms["CA"], atoms["C"], atoms["CB"]
        seq = "A" * len(ca)
        label = f"synthetic-beta L={len(ca)}" + \
            (" (sandwich)" if sandwich else "")
    elif synthetic:
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
    ap.add_argument("--beta", action="store_true",
                    help="use the sheet-dominant synthetic native")
    ap.add_argument("--sandwich", action="store_true",
                    help="with --beta: two stacked sheets")
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
    run(None if (args.synthetic or args.beta) else args.pdb,
        args.synthetic, args.decoys, args.max_iter, args.fastrelax,
        args.seed, beta=args.beta, sandwich=args.sandwich)


if __name__ == "__main__":
    main()
