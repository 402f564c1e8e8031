"""ESM-MSA-1b axial MSA transformer in JAX.

Re-implementation of the vendored fairseq MSA Transformer
(trRosettaX2/esm/model.py:225-420, esm/axial_attention.py, esm/modules.py):
12 AxialTransformerLayers (768 dim, 12 heads, 3072 FFN), each =
pre-LN residual [tied RowSelfAttention -> ColumnSelfAttention -> GELU FFN],
with learned positional embeddings, per-row MSA position scalars, and the
RobertaLMHead / ContactPredictionHead.

Row attention ties attention maps across MSA rows with 1/sqrt(R) scaling
(axial_attention.py:38-40). The memory-bounded chunked path
(_batched_forward, axial_attention.py:42-74) — accumulate q.k logits over
row blocks, ONE softmax, then accumulate the context — is implemented as a
lax.scan over row chunks (`row_chunk`), the TPU-native equivalent of the
reference's long-MSA mechanism (SURVEY.md §2.3 item 3).

Works on a single MSA: tokens (R, C) in the ESM vocabulary (33 symbols,
padding_idx=1; mapping from the 21-token alphabet via
trx2dy.models.esm_tokens.mymsa_to_esmmsa). Params are a flat dict with the
torch state_dict keys.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.models.predictor2d import linear


def layer_norm(p, name, x):
    """ESM1bLayerNorm: TF-style eps=1e-12 inside the sqrt
    (esm/modules.py:47-64) — NOT torch's default 1e-5."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-12) * p[f"{name}.weight"] \
        + p[f"{name}.bias"]

Params = Dict[str, jnp.ndarray]
_HI = jax.lax.Precision.HIGHEST

EMBED_DIM = 768
HEADS = 12
HEAD_DIM = EMBED_DIM // HEADS
LAYERS = 12
PADDING_IDX = 1

# 21-token alphabet -> ESM-MSA vocab (utils_trX2dy/utils.py:800-821)
_ESM_TOKEN_TABLE = np.array([5, 10, 17, 13, 23, 16, 9, 6, 21, 12, 4, 15, 20,
                             18, 14, 8, 11, 22, 19, 7, 30, 32])


def mymsa_to_esmmsa(msa: np.ndarray, input_type: str = "msa") -> np.ndarray:
    """Prepend cls(0) (+ optionally append eos(2)) and map tokens."""
    cls = np.zeros_like(msa[..., 0:1])
    body = _ESM_TOKEN_TABLE[msa]
    if input_type == "fasta":
        eos = 2 * np.ones_like(msa[..., 0:1])
        return np.concatenate([cls, body, eos], axis=-1)
    return np.concatenate([cls, body], axis=-1)


def _row_attention(p: Params, name: str, x, padding_mask,
                   row_chunk: Optional[int] = None):
    """Tied row self-attention (axial_attention.py:12-140). x (R, C, D).

    Returns (out (R, C, D), attn (H, C, C))."""
    R = x.shape[0]
    scaling = HEAD_DIM ** -0.5 / np.sqrt(R)

    def qk_chunk(xc, mask_c):
        q = linear(p, f"{name}.q_proj", xc).reshape(
            xc.shape[0], xc.shape[1], HEADS, HEAD_DIM) * scaling
        if mask_c is not None:
            q = q * (1 - mask_c[..., None, None])
        k = linear(p, f"{name}.k_proj", xc).reshape(
            xc.shape[0], xc.shape[1], HEADS, HEAD_DIM)
        return jnp.einsum("rihd,rjhd->hij", q, k, precision=_HI)

    if row_chunk is None or R <= row_chunk:
        attn_w = qk_chunk(x, padding_mask)
    else:
        n_chunks = (R + row_chunk - 1) // row_chunk
        pad_to = n_chunks * row_chunk
        xp = jnp.pad(x, ((0, pad_to - R), (0, 0), (0, 0)))
        mp = jnp.pad(padding_mask if padding_mask is not None
                     else jnp.zeros(x.shape[:2], x.dtype),
                     ((0, pad_to - R), (0, 0)), constant_values=1.0)
        xc = xp.reshape(n_chunks, row_chunk, x.shape[1], x.shape[2])
        mc = mp.reshape(n_chunks, row_chunk, x.shape[1])
        attn_w = jax.lax.scan(
            lambda acc, args: (acc + qk_chunk(args[0], args[1]), None),
            jnp.zeros((HEADS, x.shape[1], x.shape[1]), x.dtype),
            (xc, mc))[0]

    if padding_mask is not None:
        # mask keyed on the first row's padding (axial_attention.py:100-104)
        attn_w = jnp.where(padding_mask[0][None, None, :] > 0, -10000.0,
                           attn_w)
    attn = jax.nn.softmax(attn_w, axis=-1)                  # (H, C, C)

    v = linear(p, f"{name}.v_proj", x).reshape(R, x.shape[1], HEADS, HEAD_DIM)
    ctx = jnp.einsum("hij,rjhd->rihd", attn, v, precision=_HI)
    out = linear(p, f"{name}.out_proj", ctx.reshape(R, x.shape[1], -1))
    return out, attn


def _col_attention(p: Params, name: str, x, padding_mask,
                   col_chunk: Optional[int] = None):
    """Column self-attention (axial_attention.py:140-245). x (R, C, D).

    Each column's (R x R) attention is independent, so chunking over
    columns is exact — the analog of the reference's _batched_forward
    column split (axial_attention.py:166-188). With col_chunk set, columns
    are processed in blocks of that size under lax.scan, bounding the
    (H, C, R, R) logits tensor to (H, col_chunk, R, R)."""
    R, C, D = x.shape
    if R == 1:
        return linear(p, f"{name}.out_proj",
                      linear(p, f"{name}.v_proj", x))

    def block(xc, mask_c):
        # xc (R, Cc, D); mask_c (R, Cc) or None
        Cc = xc.shape[1]
        q = linear(p, f"{name}.q_proj", xc).reshape(R, Cc, HEADS, HEAD_DIM) \
            * HEAD_DIM ** -0.5
        k = linear(p, f"{name}.k_proj", xc).reshape(R, Cc, HEADS, HEAD_DIM)
        v = linear(p, f"{name}.v_proj", xc).reshape(R, Cc, HEADS, HEAD_DIM)
        attn_w = jnp.einsum("ichd,jchd->hcij", q, k, precision=_HI)
        if mask_c is not None:
            attn_w = jnp.where(
                jnp.transpose(mask_c, (1, 0))[None, :, None, :] > 0,
                -10000.0, attn_w)
        attn = jax.nn.softmax(attn_w, axis=-1)
        ctx = jnp.einsum("hcij,jchd->ichd", attn, v, precision=_HI)
        return linear(p, f"{name}.out_proj", ctx.reshape(R, Cc, -1))

    if col_chunk is None or C <= col_chunk:
        return block(x, padding_mask)

    n_chunks = (C + col_chunk - 1) // col_chunk
    pad_to = n_chunks * col_chunk
    xp = jnp.pad(x, ((0, 0), (0, pad_to - C), (0, 0)))
    mp = jnp.pad(padding_mask if padding_mask is not None
                 else jnp.zeros(x.shape[:2], x.dtype),
                 ((0, 0), (0, pad_to - C)), constant_values=1.0)
    # (R, n, cc, D) -> (n, R, cc, D) so scan iterates over column blocks
    xc = jnp.moveaxis(xp.reshape(R, n_chunks, col_chunk, D), 1, 0)
    mc = jnp.moveaxis(mp.reshape(R, n_chunks, col_chunk), 1, 0)
    out = jax.lax.scan(lambda _, args: (None, block(args[0], args[1])),
                       None, (xc, mc))[1]                   # (n, R, cc, D)
    return jnp.moveaxis(out, 0, 1).reshape(R, pad_to, D)[:, :C]


def _ffn(p: Params, name: str, x):
    h = jax.nn.gelu(linear(p, f"{name}.fc1", x), approximate=False)
    return linear(p, f"{name}.fc2", h)


MAX_TOKENS_PER_MSA = 2 ** 16   # reference default (esm/pretrained.py:61)


def esm_msa_apply(p: Params, tokens: jnp.ndarray, repr_layers=(12,),
                  need_head_weights: bool = True,
                  row_chunk: Optional[int] = None,
                  col_chunk: Optional[int] = None,
                  max_tokens_per_msa: int = MAX_TOKENS_PER_MSA,
                  res_idx: Optional[jnp.ndarray] = None):
    """MSATransformer.forward (esm/model.py:334-420) for one MSA.

    The real esm_msa1_t12_100M_UR50S.pt checkpoint has
    embed_positions_msa=True and therefore resolves to the MSATransformer1b
    loader arm (esm/pretrained.py:125-132); its forward (esm/model.py:586)
    differs from the base model only in accepting custom residue positions
    (res_idx), supported here. With res_idx=None — or the contiguous
    arange the reference predict.py always passes (predict.py:157) — the
    two arms are numerically identical.

    Args:
      tokens: (R, C) int ESM-vocab tokens (C includes the prepended cls).
      row_chunk: when set, tied-row attention logits accumulate over row
        blocks of this size (the reference's max_tokens_per_msa chunking).
      col_chunk: when set, column attention runs over column blocks of
        this size (exact — per-column softmaxes are independent).
      max_tokens_per_msa: when R*C exceeds this, both chunkings engage
        automatically with the reference's block sizes
        (axial_attention.py:127,242: max_rows = max_tokens // C for row
        attention, max_cols = max_tokens // R for column attention).
      res_idx: optional custom residue positions, (C,) or (C-1,) ints
        (without the cls slot — a (cls-1) position is prepended, matching
        esm/model.py:598-601). Positions are shifted so min -> 2 and
        clamped to [0, 1000] (esm/modules.py:268).

    Returns dict with 'representations' {layer: (R, C, 768)},
    'row_attentions' (layers, H, C, C), 'logits' (R, C, vocab).
    """
    R, C = tokens.shape
    if R * C > max_tokens_per_msa:
        if row_chunk is None:
            row_chunk = max(1, max_tokens_per_msa // C)
        if col_chunk is None:
            col_chunk = max(1, max_tokens_per_msa // R)
    has_pad = bool((np.asarray(tokens) == PADDING_IDX).any()) \
        if not isinstance(tokens, jax.core.Tracer) else True
    padding_mask = (tokens == PADDING_IDX).astype(jnp.float32) \
        if has_pad else None

    x = p["embed_tokens.weight"][tokens]                    # (R, C, 768)

    # LearnedPositionalEmbedding (esm/modules.py:241-270)
    if res_idx is None:
        mask = (tokens != PADDING_IDX).astype(jnp.int32)
        positions = jnp.cumsum(mask, axis=1) * mask + PADDING_IDX
    else:
        r = jnp.asarray(res_idx).reshape(-1)
        if r.shape[0] == C - 1:                 # no cls slot: prepend one
            r = jnp.concatenate([r[:1] - 1, r])
        positions = jnp.clip(r + (2 - jnp.min(r)), 0, 1000)
        positions = jnp.broadcast_to(positions[None, :], (R, C))
    x = x + p["embed_positions.weight"][positions]

    if "msa_position_embedding" in p:
        x = x + p["msa_position_embedding"][0, :R]          # (R, 1, 1)

    x = layer_norm(p, "emb_layer_norm_before", x)
    if padding_mask is not None:
        x = x * (1 - padding_mask[..., None])

    reprs = {}
    if 0 in repr_layers:
        reprs[0] = x
    row_attns = []
    for li in range(LAYERS):
        base = f"layers.{li}"
        # row attention (pre-LN residual, esm/modules.py:380-412)
        h = layer_norm(p, f"{base}.row_self_attention.layer_norm", x)
        h, attn = _row_attention(p, f"{base}.row_self_attention.layer", h,
                                 padding_mask, row_chunk=row_chunk)
        x = x + h
        if need_head_weights:
            row_attns.append(attn)
        # column attention
        h = layer_norm(p, f"{base}.column_self_attention.layer_norm", x)
        h = _col_attention(p, f"{base}.column_self_attention.layer", h,
                           padding_mask, col_chunk=col_chunk)
        x = x + h
        # FFN
        h = layer_norm(p, f"{base}.feed_forward_layer.layer_norm", x)
        x = x + _ffn(p, f"{base}.feed_forward_layer.layer", h)
        if (li + 1) in repr_layers:
            reprs[li + 1] = x

    x = layer_norm(p, "emb_layer_norm_after", x)
    if LAYERS in repr_layers:
        reprs[LAYERS] = x                                   # post-LN (model.py:419)

    out = {"representations": reprs}
    if need_head_weights:
        out["row_attentions"] = jnp.stack(row_attns)        # (12, 12, C, C)

    # RobertaLMHead (esm/modules.py:318-334)
    h = linear(p, "lm_head.dense", x)
    h = jax.nn.gelu(h, approximate=False)
    h = layer_norm(p, "lm_head.layer_norm", h)
    out["logits"] = jnp.einsum("rcd,vd->rcv", h, p["embed_tokens.weight"],
                               precision=_HI) + p["lm_head.bias"]
    return out


def contact_head_apply(p: Params, row_attentions: jnp.ndarray,
                       prepend_bos: bool = True):
    """ContactPredictionHead (esm/modules.py:337-377): symmetrize + APC +
    logistic regression over (layers*heads) attention features."""
    a = row_attentions
    if prepend_bos:
        a = a[..., 1:, 1:]
    Lh = a.shape[0] * a.shape[1]
    C = a.shape[-1]
    a = a.reshape(Lh, C, C)
    a = a + jnp.swapaxes(a, -1, -2)                         # symmetrize
    # APC
    a_i = jnp.sum(a, axis=-1, keepdims=True)
    a_j = jnp.sum(a, axis=-2, keepdims=True)
    a_all = jnp.sum(a, axis=(-1, -2), keepdims=True)
    a = a - (a_i * a_j) / a_all
    feats = jnp.transpose(a, (1, 2, 0))                     # (C, C, L*H)
    logits = linear(p, "contact_head.regression", feats)[..., 0]
    return jax.nn.sigmoid(logits)


# Production (compiled) entry: ONE XLA program for the whole trunk instead
# of eager per-op dispatch — essential over the TPU tunnel, where each
# eager op is a host round-trip. Chunk sizes / flags are compile-time
# (static); tests that override the module dim constants use the eager
# esm_msa_apply so no stale traces are cached here.
esm_msa_apply_jit = jax.jit(
    esm_msa_apply,
    static_argnames=("repr_layers", "need_head_weights", "row_chunk",
                     "col_chunk", "max_tokens_per_msa"))
