#!/usr/bin/env python
"""Batch-scaling benchmark: decoys/min at several batch sizes (B-drain fix).

Measures the full staged protocol at L=150 for each B and reports the
aggregate rate — the number PERF.md's batch-scaling paragraph quotes.
Compaction (trx2dy.physics.folder stage repacking) should keep large-B
aggregate rates at or above the B=50 sweet spot instead of collapsing.

Usage: python scripts/batch_scaling.py [-B 25 50 100] [-L 150] [--remat]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from trx2dy.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, nargs="+", default=[25, 50, 100])
    ap.add_argument("-L", type=int, default=150)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    from bench import synth_target_npz
    from trx2dy.physics.folder import fold_ensemble

    L = args.L
    npz, _ = synth_target_npz(L, seed=0)
    seq = "A" * L
    for B in args.B:
        # one warm-up fold at tiny budget to absorb compiles for this B
        fold_ensemble(npz, seq, jax.random.PRNGKey(1), n_decoys=B,
                      fastrelax=True, max_iter=250, remat=args.remat)
        t0 = time.time()
        res = fold_ensemble(npz, seq, jax.random.PRNGKey(0), n_decoys=B,
                            fastrelax=True, max_iter=1000, remat=args.remat)
        dt = time.time() - t0
        e = np.asarray(res.energy)
        print(f"B={B:4d} L={L}: {dt:6.1f} s -> {60.0 * B / dt:6.1f} "
              f"decoys/min (median E {np.median(e):.0f})", flush=True)


if __name__ == "__main__":
    main()
