"""Single-npz folder CLI — equivalent of folding/folding.py.

Flags mirror folding/utils_ros/arguments.py (-NPZ/-FASTA/-OUT/-m/-r/
--orient/--fastrelax/-pd), with a --n_decoys extra: where the reference runs
one decoy per process, the TPU folder minimizes a whole batch at once and
writes OUT (single decoy) or OUT stem + _k.pdb (batch).
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Restrained torsion-space folding from geometry npz")
    p.add_argument("-NPZ", type=str, required=True)
    p.add_argument("-FASTA", type=str, required=True)
    p.add_argument("-OUT", type=str, required=True)
    p.add_argument("-pd", type=float, dest="pcut", default=0.05)
    p.add_argument("-m", type=int, dest="mode", default=2,
                   choices=[0, 1, 2, 3])
    p.add_argument("-r", type=str, dest="rst", default="no-idp",
                   choices=["no-idp", "idp", "af2", "gpcr"])
    p.add_argument("-KNOWN", type=str, default=None,
                   help="known-structure npz (gpcr mode)")
    p.add_argument("--orient", dest="use_orient", action="store_true",
                   default=True)
    p.add_argument("--no-orient", dest="use_orient", action="store_false")
    p.add_argument("--fastrelax", dest="fastrelax", action="store_true",
                   default=True)
    p.add_argument("--no-fastrelax", dest="fastrelax", action="store_false")
    p.add_argument("-n", type=int, dest="steps", default=1000)
    p.add_argument("--n_decoys", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backbone_only", action="store_true",
                   help="skip sidechain packing even after fastrelax")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    from trx2dy.io.a3m import read_fasta
    from trx2dy.io.pdbio import write_pdb_backbone
    from trx2dy.physics.folder import fold_ensemble

    npz = dict(np.load(args.NPZ))
    seq = read_fasta(args.FASTA)
    known = dict(np.load(args.KNOWN)) if args.KNOWN else None
    res = fold_ensemble(npz, seq, jax.random.PRNGKey(args.seed),
                        n_decoys=args.n_decoys, mode=args.mode,
                        use_orient=args.use_orient, fastrelax=args.fastrelax,
                        pcut=args.pcut, max_iter=args.steps,
                        rst_mode=args.rst, known_npz=known)
    if args.n_decoys == 1:
        paths = [args.OUT]
    else:
        stem, ext = os.path.splitext(args.OUT)
        paths = [f"{stem}_{b}{ext or '.pdb'}" for b in range(args.n_decoys)]
    if args.fastrelax and not args.backbone_only:
        # reference contract: relaxed poses are dumped FULL-ATOM
        # (fa_standard switch + dump_pdb, folding.py:220,273)
        from trx2dy.physics.sidechain import pack_and_write
        # backbone=res.atoms keeps the cartesian-refined coordinates —
        # rebuilding from torsions would silently discard the refinement
        pack_and_write(paths, seq, res.torsions, backbone=res.atoms)
    else:
        atoms = {k: np.asarray(v) for k, v in res.atoms.items()}
        for b, out in enumerate(paths):
            write_pdb_backbone(out, seq, {k: v[b] for k, v in atoms.items()})
    if args.n_decoys == 1:
        print(f"[trx2dy] wrote {args.OUT} (energy {float(res.energy[0]):.1f})")
    else:
        print(f"[trx2dy] wrote {args.n_decoys} decoys")


if __name__ == "__main__":
    main()
