#!/usr/bin/env python
"""Fold B independent decoys from the bundled example npz and score them.

The per-term sensitivity harness for closing the matched-count quality gap
(VERDICT item 2): folds one batched ensemble per model npz (NMR / Xray),
writes the decoys, and prints per-decoy TM/RMSD vs both natives plus
mean/best statistics.

Usage: python scripts/fold_quality.py [-B 16] [--seed 0] [--tag base]
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
    ap.add_argument("-B", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tag", default="base")
    ap.add_argument("--out", default="/tmp/fold_quality")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax
    from trx2dy.io.a3m import read_fasta
    from trx2dy.io.pdbio import write_pdb_backbone
    from trx2dy.physics.folder import fold_ensemble
    from trx2dy.analysis.evaluate import score_all

    seq = read_fasta(os.path.join(REF, "seq.fasta"))
    natives = os.path.join(args.out, "natives")
    os.makedirs(natives, exist_ok=True)
    for nat in ("apo.pdb", "holo.pdb"):
        shutil.copy(os.path.join(REF, nat), os.path.join(natives, nat))

    for model in ("NMR", "Xray"):
        npz = dict(np.load(os.path.join(
            REF, "output/seq/pred_npz", f"seq_{model}.npz")))
        out = os.path.join(args.out, args.tag, model)
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out)
        t0 = time.time()
        res = fold_ensemble(npz, seq, jax.random.PRNGKey(args.seed),
                            n_decoys=args.B, fastrelax=True)
        dt = time.time() - t0
        atoms = {k: np.asarray(v) for k, v in res.atoms.items()}
        for b in range(args.B):
            write_pdb_backbone(os.path.join(out, f"decoy{b:02d}.pdb"), seq,
                               {k: v[b] for k, v in atoms.items()})
        print(f"# {model}: {args.B} decoys in {dt:.0f}s "
              f"({60 * args.B / dt:.1f}/min)", flush=True)
        scores = score_all(natives, out)
        for nat_name, rows in sorted(scores.items()):
            tms = np.array([tm for _, tm, _ in rows])
            rms = np.array([r for _, _, r in rows])
            print(f"{args.tag:12s} {model:4s} vs {nat_name:8s} "
                  f"TM mean {tms.mean():.4f} best {tms.max():.4f} "
                  f"worst {tms.min():.4f} | RMSD mean {rms.mean():.2f} "
                  f"best {rms.min():.2f}", flush=True)
            order = np.argsort(-tms)
            print("   " + " ".join(f"{tms[i]:.3f}" for i in order))


if __name__ == "__main__":
    main()
