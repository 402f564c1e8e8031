"""End-to-end static structure prediction model (trRosettaX2 "model_1").

JAX re-implementation of main_chunk.py:20-196 Folding: ESM-MSA features ->
recycling loop over [RecyclingEmbedder -> e2e Predictor2D trunk ->
StructureModuleFullAtom -> pLDDT head].

Feature layout (InputEmbedder.get_f2d, main_chunk.py:29-53):
  f2d (L, L, 2642) = [query ESM repr tiled i (768) | tiled j (768) |
                      row attentions 12x12 (144) | 31-token DCA (962)]
  msa_emb = ESM layer-12 representations (rows, L, 768), added to the
  31-token embedding inside the trunk.

The structure-module/trunk dimensions are inferred from checkpoint weight
shapes (model_1.json is an undistributed artifact; predict.py:118-121 only
forwards its keys).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.models.features import reweight, fast_dca
from trx2dy.models.predictor2d import predictor2d_apply, linear, layer_norm
from trx2dy.models.structure_module import (
    SMConfig, structure_module_apply,
)
from trx2dy.models.constants import sequence_to_aatype

Params = Dict[str, jnp.ndarray]
_HI = jax.lax.Precision.HIGHEST
N_ESM_TOKENS = 31
DIST_BINS = np.arange(2.0, 20.5, 0.5)   # 37 recycling distance bins


def e2e_pair_features(esm_repr: jnp.ndarray, row_attn: jnp.ndarray,
                      msa_esm: jnp.ndarray) -> jnp.ndarray:
    """(L, L, 2642) pair features (main_chunk.py:29-53).

    Args:
      esm_repr: (R, C) layer-12 representations INCLUDING the cls column —
        sliced here like the reference ([:, 1:]).
      row_attn: (layers, heads, C, C) row attentions (cls sliced here).
      msa_esm: (R, C) ESM-vocab tokens (with cls) for the DCA block.
    """
    repr_noclr = esm_repr[:, 1:]                       # (R, L, 768)
    seq_emb = repr_noclr[0]                            # (L, 768)
    L = seq_emb.shape[0]
    pair_emb = jnp.concatenate([
        jnp.tile(seq_emb[None, :, :], (L, 1, 1)),
        jnp.tile(seq_emb[:, None, :], (1, L, 1)),
    ], axis=-1)
    attn_feats = jnp.transpose(
        row_attn[:, :, 1:, 1:].reshape(-1, L, L), (1, 2, 0))   # (L, L, 144)

    tokens = msa_esm[:, 1:]
    msa1hot = (jnp.arange(N_ESM_TOKENS) == tokens[..., None]).astype(
        jnp.float32)
    if tokens.shape[0] > 1:
        w = reweight(msa1hot, 0.8)
        dca = fast_dca(msa1hot, w)                     # (L, L, 962)
    else:
        dca = jnp.zeros((L, L, N_ESM_TOKENS ** 2 + 1))
    return jnp.concatenate([pair_emb, attn_feats, dca], axis=-1), repr_noclr


def one_hot_dist(x: jnp.ndarray) -> jnp.ndarray:
    """Recycling distance binning (main_chunk.py:10-17)."""
    bins = jnp.asarray(DIST_BINS, x.dtype)
    binned = jnp.sum(bins <= x[..., None], axis=-1)
    binned = jnp.minimum(binned, len(DIST_BINS) - 1)
    return (jnp.arange(len(DIST_BINS)) == binned[..., None]).astype(x.dtype)


def recycling_embed(p: Params, prefix: str, pair_prev, single_prev, x_prev):
    """RecyclingEmbedder (main_chunk.py:97-112)."""
    d = jnp.sqrt(jnp.sum(
        (x_prev[:, None, :] - x_prev[None, :, :]) ** 2, axis=-1) + 1e-12)
    d = linear(p, f"{prefix}.linear", one_hot_dist(d))
    pair = layer_norm(p, f"{prefix}.norm_pair", pair_prev) + d
    single = layer_norm(p, f"{prefix}.norm_msa", single_prev)
    return single, pair


def plddt_head(p: Params, prefix: str, single: jnp.ndarray):
    """to_plddt (main_chunk.py:128-135,188-191): 50-bin expectation."""
    h = layer_norm(p, f"{prefix}.0", single)
    h = jax.nn.relu(linear(p, f"{prefix}.1", h))
    h = jax.nn.relu(linear(p, f"{prefix}.3", h))
    logits = linear(p, f"{prefix}.5", h)
    prob = jax.nn.softmax(logits, axis=-1)
    centers = jnp.arange(0.01, 1.01, 0.02)
    return jnp.einsum("lk,k->l", prob, centers, precision=_HI), prob


def infer_sm_config(p: Params, prefix: str = "structure_module") -> SMConfig:
    """Derive the structure-module dims from checkpoint weight shapes."""
    c_s = p[f"{prefix}.linear_in.weight"].shape[0]
    c_z = p[f"{prefix}.layer_norm_z.weight"].shape[0]
    n_heads = p[f"{prefix}.ipa.head_weights"].shape[0]
    hc = p[f"{prefix}.ipa.linear_q.weight"].shape[0]
    c_ipa = hc // n_heads
    hpq = p[f"{prefix}.ipa.linear_q_points.weight"].shape[0]
    no_qk = hpq // (n_heads * 3)
    hpkv = p[f"{prefix}.ipa.linear_kv_points.weight"].shape[0]
    no_v = hpkv // (n_heads * 3) - no_qk
    c_resnet = p[f"{prefix}.angle_resnet.linear_in.weight"].shape[0]
    no_resnet = len({k.split(".")[3] for k in p
                     if k.startswith(f"{prefix}.angle_resnet.layers.")})
    no_trans = len({k.split(".")[3] for k in p
                    if k.startswith(f"{prefix}.transition.layers.")})
    return SMConfig(c_s=c_s, c_z=c_z, c_ipa=c_ipa, no_heads_ipa=n_heads,
                    no_qk_points=no_qk, no_v_points=no_v, c_resnet=c_resnet,
                    no_resnet_blocks=no_resnet, no_transition_layers=no_trans)


def folding_apply(p: Params, seq: str, msa_esm: jnp.ndarray,
                  esm_repr: jnp.ndarray, row_attn: jnp.ndarray,
                  n_recycle: int = 3, msa_cutoff: int = 500,
                  sm_blocks: int = 8, trunk_depth: int = 12,
                  coord_recycling: bool = False):
    """Folding.forward (main_chunk.py:137-195).

    Args:
      msa_esm: (R, C) ESM-vocab tokens with cls (filtered MSA).
      esm_repr/row_attn: ESM outputs for the SAME filtered MSA.
      coord_recycling: the reference passes the cycle-0 zero coordinates to
        the RecyclingEmbedder on EVERY cycle (`t` is assigned only when
        reprs_prev is None, main_chunk.py:150-156), so its coordinate
        recycling is inert. False (default) reproduces that behaviour for
        checkpoint parity; True enables real coordinate recycling.

    Returns dict of the final cycle: geometry probs, atom14 coords + mask,
    plddt (L,), frames, angles.
    """
    aatype = jnp.asarray(sequence_to_aatype(seq))
    L = len(seq)
    f2d, repr_noclr = e2e_pair_features(esm_repr, row_attn, msa_esm)
    msa_trunk = msa_esm[:msa_cutoff, 1:]
    msa_emb = repr_noclr[:msa_cutoff]
    sm_cfg = infer_sm_config(p)._replace(no_blocks=sm_blocks)

    pair_prev = jnp.zeros((L, L, 128))
    single_prev = jnp.zeros((L, 128))
    x_prev = jnp.zeros((L, 3))

    out = None
    for _ in range(1 + n_recycle):
        rec_single, rec_pair = recycling_embed(
            p, "recycle_embedder", pair_prev, single_prev, x_prev)
        logits, reprs = predictor2d_apply(
            p, f2d, msa_trunk, depth=trunk_depth, prefix="net2d",
            msa_emb=msa_emb, rec_reprs={"single": rec_single,
                                        "pair": rec_pair},
            return_repr=True)
        geoms = {k: jax.nn.softmax(v, axis=-1) for k, v in logits.items()}
        sm_out = structure_module_apply(
            p, "structure_module", reprs["msa"][0], reprs["pair"], aatype,
            cfg=sm_cfg)
        plddt, plddt_prob = plddt_head(p, "to_plddt", sm_out["single"])
        out = {"geoms": geoms, "plddt": plddt, "plddt_prob": plddt_prob,
               **sm_out}
        pair_prev = reprs["pair"]
        single_prev = reprs["msa"][0]
        if coord_recycling:
            x_prev = sm_out["cords_ca"]
    return out


# Production (compiled) entry — the e2e CLI's per-recycle trunk+SM step as
# one XLA program (eager dispatch over the TPU tunnel is a host round-trip
# per op). seq is a compile-time constant like the other config args.
folding_apply_jit = jax.jit(
    folding_apply,
    static_argnames=("seq", "n_recycle", "msa_cutoff", "sm_blocks",
                     "trunk_depth", "coord_recycling"))
