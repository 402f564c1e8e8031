"""e2e static structure prediction CLI — equivalent of
trRosettaX2/predict.py: MSA -> ESM-MSA embeddings -> recycling Folding ->
model_1_results.npz + model_1.pdb + plddt.csv.

Requires converted checkpoints: the Folding weights (model_1.pth.tar) and
the ESM-MSA-1b weights (esm_msa1_t12_100M_UR50S.pt), both loadable as torch
files or pre-converted .npz.
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="trx2dy e2e structure prediction")
    p.add_argument("-i", "--msa", required=True, help="input MSA (a3m)")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("-mdir", "--model_pth", default="model_pth/trX2_orig")
    p.add_argument("-mname", "--model_name", default="model_1")
    p.add_argument("-nrows", "--nrows", default=500, type=int)
    p.add_argument("-nrec", "--num_recycle", default=3, type=int)
    p.add_argument("--row_chunk", default=None, type=int,
                   help="chunk tied-row attention over this many MSA rows "
                        "(long-MSA memory bound)")
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="bf16 matmul weights, norms in f32 — the "
                        "reference's torch.amp.autocast equivalent "
                        "(predict.py:55, main_chunk.py:147); measured "
                        "1.85x on the ESM trunk (PERF.md)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax.numpy as jnp

    from trx2dy.io.a3m import parse_a3m
    from trx2dy.models.esm_msa import mymsa_to_esmmsa, esm_msa_apply_jit
    from trx2dy.models.folding_e2e import folding_apply_jit
    from trx2dy.models.predictor2d_infer import load_params
    from trx2dy.io.pdbio import write_pdb_atom14

    os.makedirs(args.out_dir, exist_ok=True)

    msa = parse_a3m(args.msa, limit=30000)
    if len(msa) == 1:
        msa = np.concatenate([msa, msa], axis=0)
    if len(msa) > 1.1 * args.nrows:
        # reference contract (predict.py:141-147): the filtered MSA is a
        # reusable on-disk artifact filter{nrows}.a3m in out_dir
        from trx2dy.io.msa_filter import (hhfilter_diff_indices,
                                          write_filtered_a3m)
        a3m_filtered = os.path.join(args.out_dir, f"filter{args.nrows}.a3m")
        if not os.path.isfile(a3m_filtered):
            # the artifact gets hhfilter's FULL accepted set (which may
            # exceed nrows, exactly like the binary's output file — hence
            # exact=True, disabling the sweep's prefix early-exit); the
            # nrows cap happens at parse time (predict.py:146)
            write_filtered_a3m(args.msa, a3m_filtered,
                               hhfilter_diff_indices(msa, args.nrows,
                                                     exact=True))
        msa_filtered = parse_a3m(a3m_filtered, limit=args.nrows)
    else:
        msa_filtered = msa
    raw_seq = open(args.msa).readlines()[1].strip().replace("-", "")

    model_params = load_params(
        _find(args.model_pth, args.model_name, (".pth.tar", ".pth", ".npz")))
    esm_file = _find(args.model_pth, "esm_msa1_t12_100M_UR50S",
                     (".pt", ".npz"))
    if esm_file.endswith(".pt"):
        from trx2dy.models.torch_convert import load_esm_checkpoint
        esm_params = load_esm_checkpoint(esm_file)   # fairseq format upgrade
    else:
        esm_params = load_params(esm_file)

    if args.bf16:
        from trx2dy.models.predictor2d import cast_params
        esm_params = cast_params(esm_params)
        model_params = cast_params(model_params)

    toks = jnp.asarray(mymsa_to_esmmsa(msa_filtered))
    emb = esm_msa_apply_jit(esm_params, toks, repr_layers=(12,),
                        need_head_weights=True, row_chunk=args.row_chunk)
    if float(jnp.max(jnp.abs(emb["representations"][12]))) == 0.0 or \
            float(jnp.max(jnp.abs(emb["row_attentions"]))) == 0.0:
        # reference guard (predict.py:168-169)
        raise ValueError("ESM-MSA fails to generate embeddings! Please "
                         f"check the input MSA file: {args.msa}.")

    out = folding_apply_jit(model_params, raw_seq, toks,
                        emb["representations"][12], emb["row_attentions"],
                        n_recycle=args.num_recycle, msa_cutoff=args.nrows)

    plddt = np.asarray(out["plddt"], np.float32)
    np.savez_compressed(
        os.path.join(args.out_dir, f"{args.model_name}_results.npz"),
        plddt=plddt,
        **{k: np.asarray(v, np.float32) for k, v in out["geoms"].items()})
    write_pdb_atom14(os.path.join(args.out_dir, f"{args.model_name}.pdb"),
                     raw_seq, np.asarray(out["atom14"], np.float32),
                     np.asarray(out["atom14_mask"]), plddt)
    with open(os.path.join(args.out_dir, "plddt.csv"), "w") as f:
        f.write("Residue_Index,pLDDT\n")
        for i, v in enumerate(plddt):
            # float() upcasts the float32 the way pandas does before repr,
            # matching the committed plddt.csv digits (example/output)
            f.write(f"{i + 1},{float(v)}\n")
    print("done!")
    print(f"pLDDT: {float(plddt.mean()):.3f}")


def _find(mdir: str, stem: str, exts) -> str:
    for ext in exts:
        path = os.path.join(mdir, stem + ext)
        if os.path.exists(path):
            return path
    raise FileNotFoundError(f"no {stem}(.pth.tar/.pth/.pt/.npz) in {mdir}")


if __name__ == "__main__":
    main()
