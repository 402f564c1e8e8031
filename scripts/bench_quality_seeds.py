"""Seed study for the bench.py quality floor (VERDICT r3 items 4-5).

Runs the exact bench workload (L=150, B=50, full staged protocol with
relax + cartesian refinement) over N seeds of the fold RNG and prints the
per-seed best/mean TM vs the generator structure the restraints encode.
bench.py's shipped floors (best TM >= 0.70, mean TM >= 0.55 — see the
quality_floor check there) are set from the measured minimum across seeds
minus a noise margin; re-run this if the protocol changes.

Intended for TPU (one serial process — the axon tunnel is single-tenant):
    python scripts/bench_quality_seeds.py --seeds 5
CPU sanity run (slow, ~40 min/seed at B=50; shrink with --decoys):
    python scripts/bench_quality_seeds.py --cpu --decoys 8 --seeds 2
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--decoys", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from trx2dy.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import bench
    from trx2dy.physics.folder import fold_ensemble
    from trx2dy.analysis.tmscore import tm_score_batch

    npz, native_ca = bench.synth_target_npz(bench.L)
    seq = ("ARNDCQEGHILKMFPSTWYV" * 8)[:bench.L]
    score = jax.jit(tm_score_batch)

    rows = []
    for seed in range(args.seeds):
        t0 = time.time()
        res = fold_ensemble(npz, seq, jax.random.PRNGKey(seed),
                            n_decoys=args.decoys, max_iter=1000,
                            fastrelax=True)
        tms = np.asarray(score(res.atoms["CA"], jnp.asarray(native_ca)).tm)
        row = {"seed": seed, "best_tm": round(float(tms.max()), 4),
               "mean_tm": round(float(tms.mean()), 4),
               "min_tm": round(float(tms.min()), 4),
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    best = [r["best_tm"] for r in rows]
    mean = [r["mean_tm"] for r in rows]
    print(json.dumps({"n_seeds": len(rows), "decoys": args.decoys,
                      "best_tm_min": min(best), "best_tm_max": max(best),
                      "mean_tm_min": min(mean), "mean_tm_max": max(mean)}))


if __name__ == "__main__":
    main()
