"""A/B: repack-in-the-loop vs pack-once-post-hoc (VERDICT r2 item 6).

The reference's FastRelax `ramp_repack_min` repacks rotamers before every
ramp-stage minimization with chi movable and the full-atom score active
(/root/reference/folding/folding.py:200-234, data/2relax_round2.txt). The
shipped substitute ramps centroid weights and packs sidechains once after
the fold. This script measures what in-loop repacking buys on the
native-recovery workload (apo L=90, production protocol): for each seed it
folds the same decoys with folder.REPACK_IN_LOOP off and on and reports
best/mean TM to the native.

Usage: python scripts/ab_repack.py [--seeds 3] [--decoys 4] [--max_iter 400]
       [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pdb", default="/root/reference/example/apo.pdb")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--decoys", type=int, default=4)
    ap.add_argument("--max_iter", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import trx2dy.physics.folder as folder
    from trx2dy.physics.folder import fold_ensemble
    from trx2dy.analysis.tmscore import tm_score_pair
    from trx2dy.io.pdbio import read_pdb_backbone
    from scripts.native_recovery import native_histograms

    coords, seq = read_pdb_backbone(args.pdb)
    npz = native_histograms(coords["N"], coords["CA"], coords["C"],
                            coords["CB"])
    nat_ca = np.asarray(coords["CA"])

    results = {}
    for label, flag in (("pack-post-hoc", False), ("repack-in-loop", True)):
        folder.REPACK_IN_LOOP = flag
        tms, times = [], []
        for seed in range(args.seeds):
            t0 = time.time()
            res = fold_ensemble(npz, seq, jax.random.PRNGKey(seed),
                                n_decoys=args.decoys,
                                max_iter=args.max_iter, fastrelax=True,
                                oversample=0.5)
            times.append(time.time() - t0)
            for b in range(args.decoys):
                r = tm_score_pair(np.asarray(res.atoms["CA"])[b], nat_ca)
                tms.append(float(r.tm))
        tms = np.asarray(tms).reshape(args.seeds, args.decoys)
        results[label] = tms
        print(f"[ab-repack] {label}: best/seed="
              f"{[round(float(t), 3) for t in tms.max(1)]} "
              f"mean={tms.mean():.4f} overall-best={tms.max():.4f} "
              f"wall/seed={np.mean(times):.0f}s")
    folder.REPACK_IN_LOOP = False

    a, b = results["pack-post-hoc"], results["repack-in-loop"]
    print(f"[ab-repack] delta best (in-loop - post-hoc) per seed: "
          f"{[round(float(d), 3) for d in (b.max(1) - a.max(1))]}  "
          f"delta mean: {b.mean() - a.mean():+.4f}")


if __name__ == "__main__":
    main()
