#!/usr/bin/env python
"""Matched-workload quality run on the bundled 1TNQ example (L=90).

Produces the SAME decoy count as the reference's committed ensemble
(example/output/seq/pred_pdb: conf_{1,2}_{1..4} == 8 decoys): per model
(NMR, Xray) fold init_num initial decoys and Nmax dampening-chain decoys,
then evaluate every decoy against the apo and holo natives with the
TM-score engine. Prints a per-decoy table plus the summary.txt-style
per-native bests, so the comparison with the reference's summary
(example/output/seq/summary.txt: apo best TM 0.6661 / holo 0.6269) is at
MATCHED ensemble size.

Usage: python scripts/matched_quality.py [--init_num 2] [--nmax 2]
       [--seed 0] [--out /tmp/matched_out] [--cpu]
"""
import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trx2dy_jax_cache")
from trx2dy.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

REF = "/root/reference/example"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--init_num", type=int, default=2)
    ap.add_argument("--nmax", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/matched_out")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        os.environ.pop("PALLAS_AXON_TPU_GEN", None)
        import jax
        jax.config.update("jax_platforms", "cpu")

    from trx2dy.dynamics.driver import DynamicsConfig, run_single
    from trx2dy.analysis.evaluate import run_score, score_all

    out = os.path.join(args.out, f"seed{args.seed}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    cfg = DynamicsConfig(init_num=args.init_num, Nmax=args.nmax,
                         mult_two_models=True, n_chains=1, seed=args.seed)
    t0 = time.time()
    save = run_single("seq", os.path.join(REF, "seq.fasta"),
                      os.path.join(REF, "seq.a3m"), out, cfg,
                      npz_dir=os.path.join(REF, "output/seq/pred_npz"))
    t1 = time.time()
    pdb_dir = os.path.join(save, "pred_pdb")
    n = len([f for f in os.listdir(pdb_dir) if f.endswith(".pdb")])
    print(f"# {n} decoys in {t1 - t0:.0f}s -> {pdb_dir}", flush=True)

    natives = os.path.join(args.out, "natives")
    os.makedirs(natives, exist_ok=True)
    for nat in ("apo.pdb", "holo.pdb"):
        shutil.copy(os.path.join(REF, nat), os.path.join(natives, nat))

    results = score_all(natives, pdb_dir)
    for nat_name, rows in sorted(results.items()):
        for pred_name, tm, rmsd in sorted(rows):
            print(f"{nat_name:10s} {pred_name:16s} TM {tm:.4f}  "
                  f"RMSD {rmsd:6.3f}")
    run_score(natives, pdb_dir, save_summary=True, save_dir=save)
    with open(os.path.join(save, "summary.txt")) as f:
        print(f.read())


if __name__ == "__main__":
    main()
