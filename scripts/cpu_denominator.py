#!/usr/bin/env python
"""Measure the single-CPU-core folding denominator (VERDICT item 4).

PyRosetta is not installable in this image, so the reference's per-decoy
CPU cost cannot be timed directly. This measures the closest defensible
stand-in: the SAME full staged protocol (identical iteration budget,
restraint tables, clash/relax schedule) executed by this repo's folder on
ONE CPU core via the XLA CPU backend (this host has exactly one core, so
no pinning is needed). Rosetta's minimizer does comparable per-iteration
work (all-active-restraint spline evaluation + centroid scoring + L-BFGS
line search), so this bounds the reference's one-core decoy rate to within
a small factor; the report presents the ratio as a range.

Usage: python scripts/cpu_denominator.py [-L 150] [--max_iter 1000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("JAX_PLATFORMS", None)
os.environ.pop("PALLAS_AXON_TPU_GEN", None)

from trx2dy.utils.cache import enable_compilation_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-L", type=int, default=150)
    ap.add_argument("--max_iter", type=int, default=1000)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache("/tmp/trx2dy_jax_cache_cpu")
    import numpy as np
    from bench import synth_target_npz
    from trx2dy.physics.folder import fold_ensemble

    L = args.L
    npz, _ = synth_target_npz(L, seed=0)
    seq = "A" * L

    # compile warm-up: max_iter=STAGE_CHUNK produces exactly the chunk
    # shapes the measured run uses (250-iter centroid chunks + the fixed
    # 50/100/200-iter relax chunks); compiled programs land in the disk
    # cache so the timed run below is compile-free
    t0 = time.time()
    fold_ensemble(npz, seq, jax.random.PRNGKey(1), n_decoys=1,
                  fastrelax=True, max_iter=250)
    print(f"warm-up (compile + 1/4-budget run): {time.time() - t0:.0f} s",
          flush=True)

    t0 = time.time()
    res = fold_ensemble(npz, seq, jax.random.PRNGKey(0), n_decoys=1,
                        fastrelax=True, max_iter=args.max_iter)
    dt = time.time() - t0
    print(f"one decoy, L={L}, full staged protocol "
          f"(max_iter={args.max_iter}), 1 CPU core: {dt:.0f} s "
          f"=> {60.0 / dt:.3f} decoys/min/core "
          f"(energy {float(np.asarray(res.energy)[0]):.0f})")


if __name__ == "__main__":
    main()
