"""Dynamics pipeline CLI — drop-in equivalent of the reference
run_inference.py (argparse surface at run_inference.py:356-380, plus
TPU-framework extras --npz_dir / --model_dir / --seed / --max_iter).

Usage (bundled example, precomputed geometry):
  python -m trx2dy.cli.run_inference \
      --fasta example/seq.fasta --msa example/seq.a3m --name seq \
      --save_dir out --npz_dir example/output/seq/pred_npz
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Protein dynamic-ensemble prediction (trx2dy, TPU-native)")
    p.add_argument("--fasta", type=str, help="single-sample FASTA file")
    p.add_argument("--msa", type=str, help="single-sample MSA (.a3m) file")
    p.add_argument("--fasta_dir", type=str, help="FASTA dir for batch mode")
    p.add_argument("--msa_dir", type=str, help="MSA dir for batch mode")
    p.add_argument("--name", type=str, help="sample name (single mode)")
    p.add_argument("--name_lst", type=str, help="file with names (batch mode)")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--init_num", type=int, default=10)
    p.add_argument("--Nmax", type=int, default=300)
    p.add_argument("--angle", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--mult_two_models", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--device", type=str, default="tpu",
                   help="accepted for reference compatibility; JAX picks the "
                        "backend (tpu when available, else cpu)")
    # framework extras
    p.add_argument("--npz_dir", type=str, default=None,
                   help="directory with precomputed <name>_{NMR,Xray}.npz")
    p.add_argument("--model_dir", type=str, default=None,
                   help="directory with converted Predictor2D weights")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_iter", type=int, default=1000,
                   help="L-BFGS iteration cap per minimization stage")
    p.add_argument("--n_chains", type=int, default=8,
                   help="parallel dampening chains per model (batched as "
                        "one device program per step; default 8 = the "
                        "measured single-chip sweet spot, EXAMPLE_RESULTS; "
                        "1 + --no-combine_models = the reference's "
                        "sequential sampler)")
    p.add_argument("--chain_candidates", type=int, default=None,
                   help="best-of-N candidate lanes folded per chain step. "
                        "An explicit value is honored exactly (the default "
                        "None lets the driver raise candidates to fill any "
                        "lane-bucket slack). 1 disables per-step energy "
                        "gating: 32 emits per 32-lane fold, measured "
                        "-0.02 mean TM on the bundled example "
                        "(EXAMPLE_RESULTS.md K=16c1 row)")
    p.add_argument("--combine_models", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fold the NMR and X-ray models' chains in ONE "
                        "batched program per step instead of running the "
                        "two samplers serially")
    p.add_argument("--len_bucket", type=int, default=None,
                   help="pad targets to multiples of this length so batch "
                        "targets share compiled fold programs (default: 32 "
                        "in batch mode, off in single mode)")
    p.add_argument("--aot_cache", action="store_true",
                   help="serve the fold program family from the on-disk AOT "
                        "trace cache (utils/aot.py): repeat pipeline runs "
                        "skip ~60 s/process of jit tracing. The FIRST run "
                        "with this flag recompiles the family (minutes), so "
                        "it pays off for recurring/batch production use")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.aot_cache:
        from trx2dy.utils import aot
        aot.enable()
    from trx2dy.dynamics.driver import DynamicsConfig, run_single

    len_bucket = args.len_bucket
    if len_bucket is None:
        len_bucket = 32 if args.name_lst else 0
    extra = {}
    if args.chain_candidates is not None:
        # an EXPLICIT value is a contract: disable the bucket filler so the
        # driver cannot silently raise it when the lane bucket has slack
        # (only the default None opts into fill-to-bucket)
        extra["chain_candidates"] = args.chain_candidates
        extra["fill_candidates"] = False
        if args.chain_candidates == 1:
            import sys as _sys
            print("[trx2dy] --chain_candidates 1 disables per-step energy "
                  "gating: maximum throughput, measured -0.02 mean TM on "
                  "the bundled example (EXAMPLE_RESULTS.md)",
                  file=_sys.stderr, flush=True)
    cfg = DynamicsConfig(init_num=args.init_num, Nmax=args.Nmax,
                         angle=args.angle,
                         mult_two_models=args.mult_two_models,
                         seed=args.seed, max_iter=args.max_iter,
                         n_chains=args.n_chains,
                         combine_models=args.combine_models,
                         len_bucket=len_bucket, **extra)

    if args.name_lst:
        if not args.fasta_dir or not args.msa_dir:
            raise SystemExit(
                "batch mode requires --fasta_dir, --msa_dir, --name_lst")
        with open(args.name_lst) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        import time
        for name in names:
            t0 = time.time()
            run_single(name, os.path.join(args.fasta_dir, name + ".fasta"),
                       os.path.join(args.msa_dir, name + ".a3m"),
                       args.save_dir, cfg, npz_dir=args.npz_dir,
                       model_dir=args.model_dir)
            print(f"[trx2dy] {name} done ({time.time() - t0:.1f}s)",
                  flush=True)
    else:
        if not args.fasta or not args.name:
            raise SystemExit("single mode requires --fasta and --name")
        out = run_single(args.name, args.fasta, args.msa, args.save_dir, cfg,
                         npz_dir=args.npz_dir, model_dir=args.model_dir)
        print(f"[trx2dy] inference for '{args.name}' completed: {out}")


if __name__ == "__main__":
    main()
