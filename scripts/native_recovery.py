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


def synthetic_native(L: int, seed: int = 0):
    """A mixed helix/extended synthetic backbone of length L (NeRF-built),
    used as a self-consistent 'native' at lengths the bundled example
    doesn't cover."""
    import jax.numpy as jnp
    from trx2dy.geometry.nerf import build_backbone

    rng = np.random.default_rng(seed)
    phi = np.empty(L, np.float32)
    psi = np.empty(L, np.float32)
    # segments of helix (phi,psi = -61,-41) and extended strand (-122,117)
    # joined by 2-residue polyproline-ish turns — compact but non-trivial
    pos = 0
    toggle = True
    while pos < L:
        seg = int(rng.integers(8, 18))
        if toggle:
            phi[pos:pos + seg], psi[pos:pos + seg] = -1.065, -0.716  # helix
        else:
            phi[pos:pos + seg], psi[pos:pos + seg] = -2.13, 2.04    # strand
        pos += seg
        if pos < L:
            t = min(2, L - pos)
            phi[pos:pos + t], psi[pos:pos + t] = -1.257, 2.67       # turn
            pos += t
        toggle = not toggle
    omg = np.full(L, np.pi, np.float32)
    atoms = build_backbone(jnp.asarray(phi), jnp.asarray(psi),
                           jnp.asarray(omg))
    return {k: np.asarray(v) for k, v in atoms.items()}


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
