"""End-to-end rehearsal of the static-prediction CLI at realistic shape.

The pretrained checkpoints are not in this image, so this drives
`trx2dy.cli.predict` with RANDOM weights saved in the exact on-disk formats
the reference ships (model_1.pth.tar torch state_dict; fairseq-format
esm_msa1_t12_100M_UR50S.pt with 'encoder.' prefixes and the row<->column
key swap the loader must undo), on the reference's real example MSA
(trRosettaX2/example/output/filter500.a3m: R=950 raw -> 500 filtered,
L=127). It then validates every artifact's FORMAT against the committed
example outputs (trRosettaX2/predict.py:178-207):

  * filter{nrows}.a3m written to out_dir and reused on a second run
  * model_1_results.npz keys: plddt + the geometry-prob maps
  * model_1.pdb: 80-col ATOM records, pLDDT in the B-factor column
  * plddt.csv: 'Residue_Index,pLDDT' header, float64 digit layout

Numbers can't be compared (random weights) — formats and shapes can.

Usage: python scripts/e2e_rehearsal.py [--out /tmp/e2e_out] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/trRosettaX2"


def make_checkpoints(mdir: str) -> None:
    """Random full-config checkpoints in the reference's on-disk formats."""
    import torch
    import contextlib
    torch.amp.autocast = lambda *a, **k: contextlib.nullcontext()
    sys.path.insert(0, "/root/reference")
    from trRosettaX2.main_chunk import Folding as TorchFolding
    from esm.model import MSATransformer
    from esm.data import Alphabet

    os.makedirs(mdir, exist_ok=True)
    torch.manual_seed(0)
    cfg = {"structure_module": dict(
        c_s=128, c_z=128, c_ipa=16, no_heads_ipa=4, no_qk_points=4,
        no_v_points=8, c_resnet=64, no_blocks=8, no_transition_layers=1,
        no_resnet_blocks=2, no_angles=7, trans_scale_factor=10)}
    tm = TorchFolding(dim_2d=128, dim_3d=128, config=cfg)
    torch.save(tm.state_dict(), os.path.join(mdir, "model_1.pth.tar"))

    alphabet = Alphabet.from_architecture("msa_transformer")
    esm_args = argparse.Namespace(
        layers=12, embed_dim=768, ffn_embed_dim=3072, attention_heads=12,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_tokens_per_msa=2 ** 30, max_positions=1024,
        embed_positions_msa=True, max_tokens=2 ** 30)
    esm = MSATransformer(esm_args, alphabet)

    def swap_rc(s):   # the checkpoint stores axial attns under swapped names
        if "row" in s:
            return s.replace("row", "column")
        return s.replace("column", "row")

    fairseq_sd = {"encoder.sentence_encoder." + swap_rc(k)
                  if "layers." in k else "encoder." + swap_rc(k): v
                  for k, v in esm.state_dict().items()}
    torch.save({"model": fairseq_sd, "args": vars(esm_args)},
               os.path.join(mdir, "esm_msa1_t12_100M_UR50S.pt"))


def check_artifacts(out: str, L: int, nrows: int) -> None:
    # filter artifact exists and parses to <= nrows rows of width L
    from trx2dy.io.a3m import parse_a3m
    filt = os.path.join(out, f"filter{nrows}.a3m")
    assert os.path.isfile(filt), "filter a3m artifact missing"
    # artifact = hhfilter's full accepted set (>= nrows rows, like the
    # binary's output file); the model consumes the first nrows
    m = parse_a3m(filt, limit=10 ** 6)
    assert m.shape[0] >= nrows and m.shape[1] == L, m.shape
    assert parse_a3m(filt, limit=nrows).shape == (nrows, L)

    d = np.load(os.path.join(out, "model_1_results.npz"))
    assert "plddt" in d and d["plddt"].shape == (L,), list(d.keys())
    for k in ("dist", "omega", "theta", "phi"):
        assert k in d and d[k].shape[:2] == (L, L), (k, d[k].shape)
        s = d[k].sum(-1)
        assert np.allclose(s, 1.0, atol=1e-3), f"{k} not a distribution"

    # pdb format vs the committed example (field layout, not values)
    ref_line = open(f"{REF}/example/output/model_1.pdb").readline()
    got_line = open(os.path.join(out, "model_1.pdb")).readline()
    assert len(got_line.rstrip("\n")) == len(ref_line.rstrip("\n")), \
        (len(got_line), len(ref_line))
    for sl in (slice(0, 6), slice(12, 16), slice(21, 22)):  # record/atom/chain
        assert got_line[sl] == ref_line[sl], (sl, got_line[sl], ref_line[sl])
    bfac = got_line[60:66]
    float(bfac)  # parses

    # plddt.csv header + float64 digit layout like the committed file
    lines = open(os.path.join(out, "plddt.csv")).read().splitlines()
    ref_lines = open(f"{REF}/example/output/plddt.csv").read().splitlines()
    assert lines[0] == ref_lines[0] == "Residue_Index,pLDDT"
    assert len(lines) == L + 1
    idx, val = lines[1].split(",")
    assert idx == "1" and val == repr(float(np.float32(float(val)))), lines[1]
    print("[e2e-rehearsal] all artifact formats OK")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/e2e_out")
    ap.add_argument("--mdir", default="/tmp/e2e_pth")
    ap.add_argument("--nrows", type=int, default=500)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")

    if not os.path.isfile(os.path.join(args.mdir, "model_1.pth.tar")):
        t0 = time.time()
        make_checkpoints(args.mdir)
        print(f"[e2e-rehearsal] checkpoints built in {time.time() - t0:.0f}s")

    shutil.rmtree(args.out, ignore_errors=True)
    from trx2dy.cli.predict import main as predict_main
    msa = f"{REF}/example/output/filter500.a3m"
    # bf16 (the CLI default, = the reference's autocast) only on TPU —
    # CPU emulates bf16 slowly and this path is also the format check
    flags = ["--no-bf16"] if args.cpu else []
    t0 = time.time()
    predict_main(["-i", msa, "-o", args.out, "-mdir", args.mdir,
                  "-nrows", str(args.nrows)] + flags)
    dt = time.time() - t0
    print(f"[e2e-rehearsal] predict.py end-to-end: {dt:.1f}s "
          f"(R=500 filtered, L=127, 3 recycles)")

    from trx2dy.io.a3m import parse_a3m
    L = parse_a3m(msa, limit=2).shape[1]
    check_artifacts(args.out, L, args.nrows)

    # reuse contract: second run must keep the existing filter artifact
    mt = os.path.getmtime(os.path.join(args.out, f"filter{args.nrows}.a3m"))
    predict_main(["-i", msa, "-o", args.out, "-mdir", args.mdir,
                  "-nrows", str(args.nrows)] + flags)
    assert os.path.getmtime(
        os.path.join(args.out, f"filter{args.nrows}.a3m")) == mt, \
        "filter a3m was regenerated instead of reused"
    print("[e2e-rehearsal] filter artifact reuse OK")


if __name__ == "__main__":
    main()
