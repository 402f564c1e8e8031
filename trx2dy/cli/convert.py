"""Checkpoint conversion CLI: torch checkpoints -> torch-free npz.

Converts the published trRosettaX2 weights once so inference never imports
torch:

  python -m trx2dy.cli.convert --in trX2(NMR)_40.pth --out trX2_NMR.npz
  python -m trx2dy.cli.convert --in esm_msa1_t12_100M_UR50S.pt \
      --out esm_msa1b.npz --esm

All trx2dy loaders accept either format.
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Convert torch weights to npz")
    p.add_argument("--in", dest="inp", required=True,
                   help="torch checkpoint (.pth / .pth.tar / .pt)")
    p.add_argument("--out", required=True, help="output .npz")
    p.add_argument("--esm", action="store_true",
                   help="treat input as a fairseq ESM checkpoint (applies "
                        "the prefix-strip + row/column swap upgrade)")
    p.add_argument("--bf16", action="store_true",
                   help="store matmul weights in bfloat16 (norms stay f32)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from trx2dy.models.torch_convert import (
        load_torch_checkpoint, load_esm_checkpoint, save_params_npz,
    )

    if args.esm:
        params = load_esm_checkpoint(args.inp)
    else:
        params = load_torch_checkpoint(args.inp)
    if args.bf16:
        from trx2dy.models.predictor2d import cast_params
        params = cast_params(params)
    save_params_npz(params, args.out)
    n = sum(int(v.size) for v in params.values())
    print(f"[trx2dy] wrote {args.out}: {len(params)} tensors, "
          f"{n / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
