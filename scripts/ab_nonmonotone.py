"""A/B: monotone vs nonmonotone Armijo acceptance in the staged folder.

Rosetta's MinMover uses `lbfgs_armijo_nonmonotone` (reference
folding/folding.py:96); trx2dy's default line search is monotone. This
experiment measures whether the nonmonotone window changes (a) the
trapped-topology fraction of random inits — the failure mode nonmonotone
acceptance is supposed to help escape — and (b) ensemble quality/wall time
on the bundled example.

Usage: python scripts/ab_nonmonotone.py [--decoys 24] [--window 10] [--cpu]
Prints one summary line per arm.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_arm(window: int, npz, seq, apo_ca, decoys: int, max_iter: int,
            seed: int):
    import jax
    import trx2dy.physics.folder as F
    from trx2dy.analysis.tmscore import tm_score_pair

    F.NONMONOTONE_WINDOW = window
    t0 = time.time()
    res = F.fold_ensemble(npz, seq, jax.random.PRNGKey(seed),
                          n_decoys=decoys, max_iter=max_iter,
                          fastrelax=True, oversample=0.0)
    dt = time.time() - t0
    e = np.asarray(res.energy)
    med = np.median(e)
    trapped = (e > med + 0.25 * abs(med)).mean()
    tms = np.asarray([float(tm_score_pair(
        np.asarray(res.atoms["CA"])[b], apo_ca).tm) for b in range(decoys)])
    print(f"[ab] window={window:3d}: {dt:7.1f}s  "
          f"trapped={trapped:.2%}  E median={med:.0f}  "
          f"TM best={tms.max():.4f} mean={tms.mean():.4f}")
    return dict(window=window, seconds=dt, trapped=float(trapped),
                tm_best=float(tms.max()), tm_mean=float(tms.mean()))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--decoys", type=int, default=24)
    ap.add_argument("--max_iter", type=int, default=1000)
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from trx2dy.io.a3m import read_fasta
    from trx2dy.io.pdbio import read_pdb_backbone

    npz = dict(np.load(
        "/root/reference/example/output/seq/pred_npz/seq_NMR.npz"))
    seq = read_fasta("/root/reference/example/seq.fasta")
    apo, _ = read_pdb_backbone("/root/reference/example/apo.pdb")
    apo_ca = np.asarray(apo["CA"])
    for w in (0, args.window):
        run_arm(w, npz, seq, apo_ca, args.decoys, args.max_iter, args.seed)


if __name__ == "__main__":
    main()
