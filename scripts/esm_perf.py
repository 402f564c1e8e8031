"""Measure the ESM-MSA-1b trunk forward at the reference's hot shape.

The reference's e2e path spends most of its time in the ESM-MSA embedding
forward at nrows=500 filtered rows (predict.py:160-170); BASELINE.json's
long-context config names R=500, L=400 explicitly. This measures
esm_msa_apply (full 12-layer, 768-dim trunk, need_head_weights=True like
the e2e path) with random full-size weights at that shape, auto row/column
chunking engaged (R*C = 200k >> the 2^16 trigger).

Prints warm per-forward seconds and tokens/s. Results go to PERF.md.

Usage: python scripts/esm_perf.py [--rows 500] [--length 400] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def random_esm_params(rng) -> dict:
    """Full-size ESM-MSA-1b parameter set in the converted flat layout."""
    D, H, F, LAYERS, VOCAB = 768, 12, 3072, 12, 33
    p = {}

    def add(name, *shape, scale=0.02):
        p[name] = (rng.standard_normal(shape) * scale).astype(np.float32)

    def add_ln(name):
        p[f"{name}.weight"] = np.ones(D, np.float32)
        p[f"{name}.bias"] = np.zeros(D, np.float32)

    add("embed_tokens.weight", VOCAB, D)
    add("msa_position_embedding", 1, 1024, 1, 1)
    add("embed_positions.weight", 1026, D)
    add_ln("emb_layer_norm_before")
    add_ln("emb_layer_norm_after")
    for i in range(LAYERS):
        base = f"layers.{i}"
        for attn in ("row_self_attention", "column_self_attention"):
            add_ln(f"{base}.{attn}.layer_norm")
            for nm in ("k_proj", "v_proj", "q_proj", "out_proj"):
                add(f"{base}.{attn}.layer.{nm}.weight", D, D)
                p[f"{base}.{attn}.layer.{nm}.bias"] = np.zeros(
                    D, np.float32)
        add_ln(f"{base}.feed_forward_layer.layer_norm")
        add(f"{base}.feed_forward_layer.layer.fc1.weight", F, D)
        p[f"{base}.feed_forward_layer.layer.fc1.bias"] = np.zeros(
            F, np.float32)
        add(f"{base}.feed_forward_layer.layer.fc2.weight", D, F)
        p[f"{base}.feed_forward_layer.layer.fc2.bias"] = np.zeros(
            D, np.float32)
    add("lm_head.dense.weight", D, D)
    p["lm_head.dense.bias"] = np.zeros(D, np.float32)
    add_ln("lm_head.layer_norm")
    p["lm_head.bias"] = np.zeros(VOCAB, np.float32)
    return p


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500)
    ap.add_argument("--length", type=int, default=400)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--row_chunk", type=int, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="cast matmul weights to bf16 (norms stay f32), "
                         "the reference's autocast equivalent")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from trx2dy.models.esm_msa import esm_msa_apply_jit, mymsa_to_esmmsa

    rng = np.random.default_rng(0)
    toks = jnp.asarray(mymsa_to_esmmsa(
        rng.integers(0, 21, (args.rows, args.length))))
    params = {k: jnp.asarray(v)
              for k, v in random_esm_params(rng).items()}
    if args.bf16:
        from trx2dy.models.predictor2d import cast_params
        params = cast_params(params)

    def fwd():
        out = esm_msa_apply_jit(params, toks, repr_layers=(12,),
                            need_head_weights=True,
                            row_chunk=args.row_chunk)
        # force a host transfer: block_until_ready alone can return
        # before the tunnel worker finishes the async execution
        return float(jnp.sum(out["representations"][12]))

    t0 = time.time()
    fwd()
    print(f"[esm-perf] first call (compile+run): {time.time() - t0:.1f}s")
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        fwd()
        times.append(time.time() - t0)
    best = min(times)
    ntok = args.rows * (args.length + 1)
    print(f"[esm-perf] R={args.rows} L={args.length} "
          f"(RC={ntok} tokens, 12 layers, head weights on): "
          f"warm {best:.2f}s/forward, {ntok / best / 1e3:.0f}K tokens/s "
          f"(runs: {['%.2f' % t for t in times]})")


if __name__ == "__main__":
    main()
