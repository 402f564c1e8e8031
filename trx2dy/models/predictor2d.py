"""Predictor2D — the trRosettaX2 2D-geometry trunk (Dynamics flavor) in JAX.

Re-implementation of trRosettaX2/evoutils/attn_conv.py:476 (Predictor2D with
dim=128, depth=12, msa_tie_row_attn=True, in_dim=526) as pure functions over
a FLAT parameter dict keyed by the torch checkpoint's state_dict names
(prefix "net." from the DistPredictorBaseline wrapper, utils.py:626-631).
Using the checkpoint keys directly makes weight conversion a cast-only copy
(trx2dy.models.torch_convert) and lets parity be audited key-by-key.

Per block (SequentialSequence.forward order, attn_conv.py:441-472):
  m += MSAAttention(LN(m), pair-bias x)   tied-row + column axial attention
  m += FF(LN(m))
  x  = UpdateX(x, m)                      MSA outer-product -> pair
  x  = TriUpdate(x)                       4x [tri-op + Res2Net conv] + trans
  m  = UpdateM(x, m)                      pair-attention -> MSA + FF

Heads: 1x1 convs; dist/omega on the symmetrized trunk (attn_conv.py:586-597).
All dropout layers are identity (inference); gradient checkpointing is
unnecessary (remat would be added only for training).

Works unbatched: pair x is (L, L, D), MSA m is (R, L, D).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

DIM = 128
DEPTH = 12
HEADS = 8
DIM_HEAD = 64
IN_DIM = 526
N_TOKENS = 21
_EPS_LN = 1e-5
_EPS_IN = 1e-5
_HI = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
# primitive layers
# --------------------------------------------------------------------------

def linear(p: Params, name: str, x, bias: bool = True):
    """torch nn.Linear: x @ W^T + b; W is (out, in). In bf16 mode (params
    cast via cast_params) the matmul runs on the MXU in bf16 with f32
    accumulation (precision=HIGHEST)."""
    w = p[f"{name}.weight"]
    y = jnp.einsum("...i,oi->...o", x.astype(w.dtype), w, precision=_HI)
    if bias:
        y = y + p[f"{name}.bias"]
    return y


def cast_params(p: Params, dtype=jnp.bfloat16) -> Params:
    """Cast matmul/conv weights to a compute dtype, keeping norm affines in
    f32 — the torch.amp.autocast equivalent (predict.py:55,
    main_chunk.py:147) for the trunk."""
    out = {}
    for k, v in p.items():
        is_norm = (".norm" in k or "bn" in k.split(".")[-2]
                   if len(k.split(".")) > 1 else False) \
            or k.endswith("layer_norm.weight") or k.endswith("layer_norm.bias")
        out[k] = v if (is_norm or v.dtype != jnp.float32) \
            else v.astype(dtype) if v.ndim > 1 else v
    return out


def layer_norm(p: Params, name: str, x):
    """Normalization statistics always in f32 (bf16 means over hundreds of
    elements drift), output in the input dtype — matches torch AMP's
    norm-in-fp32 policy."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mu) / jnp.sqrt(var + _EPS_LN) \
        * p[f"{name}.weight"].astype(jnp.float32) \
        + p[f"{name}.bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def instance_norm(p: Params, name: str, x):
    """torch InstanceNorm2d(affine=True) on channel-last (H, W, C) input;
    statistics in f32 (see layer_norm)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=(0, 1), keepdims=True)
    var = jnp.var(x32, axis=(0, 1), keepdims=True)
    out = (x32 - mu) / jnp.sqrt(var + _EPS_IN) \
        * p[f"{name}.weight"].astype(jnp.float32) \
        + p[f"{name}.bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def conv2d(p: Params, name: str, x):
    """torch Conv2d on channel-last (H, W, C); kernel stored (O, I, kh, kw)."""
    w = p[f"{name}.weight"]
    x = x.astype(w.dtype)
    if w.shape[-1] == 1 and w.shape[-2] == 1:    # 1x1 -> plain matmul
        y = jnp.einsum("hwi,oi->hwo", x, w[:, :, 0, 0], precision=_HI)
    else:
        kern = jnp.transpose(w, (2, 3, 1, 0))    # OIHW -> HWIO
        y = jax.lax.conv_general_dilated(
            x[None], kern, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_HI)[0]
    return y + p[f"{name}.bias"]


def elu(x):
    return jax.nn.elu(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


# --------------------------------------------------------------------------
# modules (names follow evoutils source)
# --------------------------------------------------------------------------

def feed_forward(p: Params, name: str, x, drop=None):
    """FeedForward (attn_conv.py:52-68): Linear(d,4d) ReLU [Dropout]
    Linear(4d,d). drop: optional (rng, rate) for the training-time dropout
    between the activation and the second linear (attn_conv.py:64)."""
    h = jax.nn.relu(linear(p, f"{name}.feed_forward.0", x))
    if drop is not None:
        h = _dropout(drop[0], h, drop[1])
    return linear(p, f"{name}.feed_forward.3", h)


# --------------------------------------------------------------------------
# training-time dropout (evoutils/dropout.py:35-78 semantics)
# --------------------------------------------------------------------------

def _dropout(key, x, rate):
    """Plain elementwise inverted dropout."""
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _dropout_rowwise(key, x, rate):
    """Row-broadcast dropout: ONE bernoulli mask shared across dim -3
    (DropoutRowwise, evoutils/dropout.py:63-70) — whole pair-rows drop
    together, the AF2 1.11.6 structured-dropout pattern."""
    keep = jax.random.bernoulli(key, 1.0 - rate, (1,) + x.shape[-2:])
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _dropout_columnwise(key, x, rate):
    """Column-broadcast dropout: mask shared across dim -2
    (DropoutColumnwise, evoutils/dropout.py:71-78)."""
    keep = jax.random.bernoulli(
        key, 1.0 - rate, x.shape[:-2] + (1,) + x.shape[-1:])
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def bottle2neck(p: Params, name: str, x):
    """Res2Net bottleneck (attn_conv.py:72-143): expansion=1, scale=4,
    baseWidth=26 -> width 52, shortcut=False."""
    width = 52
    out = conv2d(p, f"{name}.conv1", elu(instance_norm(p, f"{name}.bn1", x)))
    spx = [out[..., i * width:(i + 1) * width] for i in range(4)]
    outs = []
    sp = None
    for i in range(3):
        sp = spx[i] if i == 0 else sp + spx[i]
        sp = conv2d(p, f"{name}.convs.{i}",
                    elu(instance_norm(p, f"{name}.bns.{i}", sp)))
        outs.append(sp)
    out = jnp.concatenate(outs + [spx[3]], axis=-1)
    out = conv2d(p, f"{name}.conv3",
                 elu(instance_norm(p, f"{name}.bn3", out)))
    return out


def triangle_multiplication(p: Params, name: str, z, direct: str):
    """modules.py:272-296."""
    z = layer_norm(p, f"{name}.norm", z)
    ab = sigmoid(linear(p, f"{name}.linear2.0", z)) \
        * linear(p, f"{name}.linear1", z)
    a, b = jnp.split(ab, 2, axis=-1)
    gate = sigmoid(linear(p, f"{name}.to_gate.0", z))
    if direct == "outgoing":
        prod = jnp.einsum("ikd,jkd->ijd", a, b, precision=_HI)
    else:
        prod = jnp.einsum("kid,kjd->ijd", a, b, precision=_HI)
    out = layer_norm(p, f"{name}.to_out.0", prod)
    out = linear(p, f"{name}.linear_out", out)
    return gate * out


def triangle_attention(p: Params, name: str, z, wise: str, n_heads: int = 4):
    """modules.py:309-350."""
    z = layer_norm(p, f"{name}.norm", z)
    qkv = linear(p, f"{name}.to_qkv", z, bias=False)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    L = z.shape[0]
    reshape = lambda t: t.reshape(L, L, n_heads, -1)
    q, k, v = reshape(q), reshape(k), reshape(v)
    b = linear(p, f"{name}.linear_for_pair", z, bias=False)   # (L, L, H)
    gate = sigmoid(linear(p, f"{name}.to_gate.0", z))
    scale = q.shape[-1] ** 0.5
    if wise == "row":
        attn = jax.nn.softmax(
            jnp.einsum("rihd,rjhd->rijh", q, k, precision=_HI) / scale
            + b[None, :, :, :], axis=2)
        out = jnp.einsum("rijh,rjhd->rihd", attn, v, precision=_HI)
    else:  # col
        attn = jax.nn.softmax(
            jnp.einsum("ilhd,jlhd->ijlh", q, k, precision=_HI) / scale
            + b[:, :, None, :], axis=1)
        out = jnp.einsum("ijlh,jlhd->ilhd", attn, v, precision=_HI)
    out = gate * out.reshape(L, L, -1)
    return linear(p, f"{name}.to_out", out)


def pair_transition(p: Params, name: str, z):
    """modules.py:353-367."""
    z = layer_norm(p, f"{name}.norm", z)
    return linear(p, f"{name}.linear2.1",
                  jax.nn.relu(linear(p, f"{name}.linear1", z)))


def tri_update(p: Params, name: str, z, use_flash: bool = False,
               dropout=None):
    """TriUpdate (attn_conv.py:147-189); dropout = identity at inference.

    use_flash: route the triangle attentions through the Pallas flash
    kernel (trx2dy.ops.triangle_attention) — avoids the O(L^3 H) logits
    tensor; recommended for L >~ 300 on TPU.
    dropout: optional (rng, rate) enabling the training-time structured
    dropout (attn_conv.py:158-185): row-broadcast on the tri-mult and
    row-attention branches, column-broadcast on the column-attention
    branch, rate dropout_rate_pair=0.10."""
    if use_flash:
        from trx2dy.ops.triangle_attention import triangle_attention_pallas
        tri_attn = triangle_attention_pallas
    else:
        tri_attn = triangle_attention
    if dropout is None:
        row_d = col_d = lambda _, x: x
        keys = [None] * 4
    else:
        rng, rate = dropout
        keys = list(jax.random.split(rng, 4))
        row_d = lambda k, x: _dropout_rowwise(k, x, rate)
        col_d = lambda k, x: _dropout_columnwise(k, x, rate)
    z = z + row_d(keys[0], triangle_multiplication(
            p, f"{name}.pair_multi_out", z, "outgoing")) \
        + bottle2neck(p, f"{name}.conv_stem.0.1", z)
    z = z + row_d(keys[1], triangle_multiplication(
            p, f"{name}.pair_multi_in", z, "incoming")) \
        + bottle2neck(p, f"{name}.conv_stem.1.1", z)
    z = z + row_d(keys[2], tri_attn(p, f"{name}.pair_row_attn", z, "row")) \
        + bottle2neck(p, f"{name}.conv_stem.2.1", z)
    z = z + col_d(keys[3], tri_attn(p, f"{name}.pair_col_attn", z, "col")) \
        + bottle2neck(p, f"{name}.conv_stem.3.1", z)
    z = z + pair_transition(p, f"{name}.pair_trans", z)
    return z


def _self_attention_col(p: Params, name: str, m):
    """attn_width on (R, L, D) along the row axis R (column attention):
    input to the torch module is (L, R, D) batches (attn_conv.py:303-305)."""
    x = jnp.swapaxes(m, 0, 1)                    # (L, R, D)
    q = linear(p, f"{name}.to_q", x, bias=False)
    kv = linear(p, f"{name}.to_kv", x, bias=False)
    k, v = jnp.split(kv, 2, axis=-1)
    resh = lambda t: t.reshape(t.shape[0], t.shape[1], HEADS, DIM_HEAD)
    q, k, v = resh(q), resh(k), resh(v)
    scale = DIM_HEAD ** -0.5
    dots = jnp.einsum("bihd,bjhd->bhij", q, k, precision=_HI) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v, precision=_HI)
    out = out.reshape(out.shape[0], out.shape[1], -1)
    out = linear(p, f"{name}.to_out", out)
    return jnp.swapaxes(out, 0, 1)               # back to (R, L, D)


def _self_attention_row_tied(p: Params, name: str, m, pair):
    """attn_height with tie_attn_dim=R and pair bias (attn_conv.py:238-245):
    dots = sum_r q.k * scale * R^-0.5 + pair_bias, shared across rows."""
    R = m.shape[0]
    q = linear(p, f"{name}.to_q", m, bias=False)
    kv = linear(p, f"{name}.to_kv", m, bias=False)
    k, v = jnp.split(kv, 2, axis=-1)
    resh = lambda t: t.reshape(R, t.shape[1], HEADS, DIM_HEAD)
    q, k, v = resh(q), resh(k), resh(v)
    scale = DIM_HEAD ** -0.5 * R ** -0.5
    dots = jnp.einsum("rihd,rjhd->hij", q, k, precision=_HI) * scale
    pb = layer_norm(p, f"{name}.pair_norm", pair)
    pb = linear(p, f"{name}.pair_linear", pb, bias=False)     # (L, L, H)
    dots = dots + jnp.transpose(pb, (2, 0, 1))
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("hij,rjhd->rihd", attn, v, precision=_HI)
    out = out.reshape(R, out.shape[1], -1)
    return linear(p, f"{name}.to_out", out)


def msa_attention(p: Params, name: str, m, pair):
    """PreNorm(MSAAttention) (attn_conv.py:277-325): column attention +
    tied-row attention with pair bias, averaged."""
    m = layer_norm(p, f"{name}.norm", m)
    w_out = _self_attention_col(p, f"{name}.fn.attn_width", m)
    h_out = _self_attention_row_tied(p, f"{name}.fn.attn_height", m, pair)
    return (w_out + h_out) / 2.0


def update_x(p: Params, name: str, x, m):
    """UpdateX (attn_conv.py:341-371): MSA outer product -> pair update.
    (the module's norm/conv layers are defined but unused in forward)."""
    mm = linear(p, f"{name}.proj_down1", m)                   # (R, L, 32)
    R = mm.shape[0]
    outer = jnp.einsum("rid,rjc->ijcd", mm, mm, precision=_HI) / R
    outer = outer.reshape(outer.shape[0], outer.shape[1], -1)
    return x + linear(p, f"{name}.proj_down2", outer)


def update_m(p: Params, name: str, x, m, n_heads: int = 8, ff_drop=None):
    """UpdateM (attn_conv.py:374-395): pair-derived attention over MSA.
    ff_drop: optional (rng, rate) — its FeedForward carries dropout=0.1
    (attn_conv.py:382), the one live elementwise dropout in the trunk."""
    pair = (x + jnp.swapaxes(x, 0, 1)) / 2.0
    pair = layer_norm(p, f"{name}.norm1", pair)
    attn = jax.nn.softmax(linear(p, f"{name}.linear1", pair), axis=-2)
    values = layer_norm(p, f"{name}.norm2", m)
    values = linear(p, f"{name}.linear2", values)             # (R, L, d/h)
    attn_out = jnp.einsum("ijh,rjd->rihd", attn, values, precision=_HI)
    attn_out = attn_out.reshape(m.shape[0], m.shape[1], -1)
    out = m + attn_out
    return out + feed_forward(p, f"{name}.ff",
                              layer_norm(p, f"{name}.norm3", out),
                              drop=ff_drop)


def relpos_embed(p: Params, name: str, res_id):
    """relpos (attn_conv.py:398-413): clamp |i-j| to +-32, one-hot 65, linear."""
    d = res_id[:, None] - res_id[None, :]
    d = jnp.clip(d, -32, 32)
    onehot = (d[..., None] == jnp.arange(-32, 33)).astype(jnp.float32)
    return linear(p, f"{name}.linear", onehot)


# --------------------------------------------------------------------------
# full forward
# --------------------------------------------------------------------------

def predictor2d_apply(p: Params, f2d: jnp.ndarray, msa: jnp.ndarray,
                      res_id=None, depth: int = DEPTH, prefix: str = "net",
                      msa_emb=None, rec_reprs=None, return_repr: bool = False,
                      use_flash: bool = False, dropout_rng=None,
                      pair_dropout: float = 0.10, ff_dropout: float = 0.10,
                      remat: bool = False):
    """Forward pass (attn_conv.py:534-605; e2e flavor attn_conv_e2e.py:525-
    576 differs only by in_dim/num_tokens, the optional ESM msa_emb added to
    the token embedding, and the recycling injection rec_reprs).

    Args:
      p: flat param dict with torch state_dict keys under `prefix.`
        ('net' for the Dynamics checkpoints, 'net2d' inside the e2e Folding).
      f2d: (L, L, in_dim) pair features.
      msa: (R, L) int tokens, already row-capped (msa_cutoff=500).
      msa_emb: optional (R, L, 768) ESM representations (e2e path).
      rec_reprs: optional dict {'single': (L, dim), 'pair': (L, L, dim)}
        recycling embeddings (attn_conv_e2e.py:550-552).
      dropout_rng: training only — enables the reference's structured
        dropout (row/column-broadcast in TriUpdate at pair_dropout=0.10,
        elementwise in UpdateM's FF at ff_dropout=0.10); None = inference
        (all dropout identity).
      remat: rematerialize each trunk block (jax.checkpoint) — the
        torch.utils.checkpoint equivalent (attn_conv.py:183-185,303-313)
        for training memory.

    Returns dict of LOGITS {dist (L,L,37), omega (L,L,25), theta (L,L,25),
    phi (L,L,13)} — softmax is applied by the caller like the reference
    (utils.py:639-640). With return_repr also returns {'pair', 'msa'}.
    """
    L = f2d.shape[0]
    if res_id is None:
        res_id = jnp.arange(L)

    x = instance_norm(p, f"{prefix}.bn1", f2d)
    x = conv2d(p, f"{prefix}.conv1", elu(x))                  # (L, L, 128)
    m = p[f"{prefix}.token_emb.weight"][msa]                  # (R, L, 128)
    if msa_emb is not None:
        m = m + linear(p, f"{prefix}.linear_emb", msa_emb)
    if rec_reprs is not None:
        m = m.at[0].add(rec_reprs["single"])
        x = x + rec_reprs["pair"]
    x = x + relpos_embed(p, f"{prefix}.input_emb.relpos", res_id)

    if dropout_rng is not None:
        block_keys = jax.random.split(dropout_rng, depth)

    def block_body(x, m, i, key):
        blk = f"{prefix}.net.blocks.{i}"
        tri_drop = ff_drop = None
        if key is not None:
            k_tri, k_ff = jax.random.split(key)
            tri_drop = (k_tri, pair_dropout)
            ff_drop = (k_ff, ff_dropout)
        m = m + msa_attention(p, f"{blk}.1", m, x)
        m = m + feed_forward(p, f"{blk}.3.fn",
                             layer_norm(p, f"{blk}.3.norm", m))
        x = update_x(p, f"{blk}.2", x, m)
        x = tri_update(p, f"{blk}.0", x, use_flash=use_flash,
                       dropout=tri_drop)
        m = update_m(p, f"{blk}.4", x, m, ff_drop=ff_drop)
        return x, m

    for i in range(depth):
        body = (lambda i: lambda x, m, key: block_body(x, m, i, key))(i)
        if remat:
            body = jax.checkpoint(body)
        x, m = body(x, m,
                    block_keys[i] if dropout_rng is not None else None)

    sym = (x + jnp.swapaxes(x, 0, 1)) * 0.5
    head = lambda name, t: conv2d(p, name, t)
    out = {
        "dist": head(f"{prefix}.to_dist_logits", sym),
        "theta": head(f"{prefix}.to_theta_logits", x),
        "omega": head(f"{prefix}.to_omega_logits", sym),
        "phi": head(f"{prefix}.to_phi_logits", x),
    }
    if return_repr:
        return out, {"pair": x, "msa": m}
    return out


# --------------------------------------------------------------------------
# random init (shape-complete, for tests and scratch training)
# --------------------------------------------------------------------------

def init_params(key, depth: int = DEPTH, dim: int = DIM,
                in_dim: int = IN_DIM) -> Params:
    """Random parameters with exactly the checkpoint's keys and shapes."""
    keys = {}

    def lin(name, i, o, bias=True):
        keys[f"{name}.weight"] = (o, i)
        if bias:
            keys[f"{name}.bias"] = (o,)

    def ln(name, d):
        keys[f"{name}.weight"] = (d,)
        keys[f"{name}.bias"] = (d,)

    def conv(name, i, o, k):
        keys[f"{name}.weight"] = (o, i, k, k)
        keys[f"{name}.bias"] = (o,)

    ln("net.bn1", in_dim)
    conv("net.conv1", in_dim, dim, 1)
    keys["net.token_emb.weight"] = (N_TOKENS, dim)
    lin("net.input_emb.relpos.linear", 65, dim)

    for i in range(depth):
        b = f"net.net.blocks.{i}"
        # TriUpdate
        for d_, direct in (("pair_multi_out", 1), ("pair_multi_in", 1)):
            nm = f"{b}.0.{d_}"
            ln(f"{nm}.norm", dim)
            lin(f"{nm}.linear1", dim, dim * 2)
            lin(f"{nm}.linear2.0", dim, dim * 2)
            lin(f"{nm}.to_gate.0", dim, dim)
            ln(f"{nm}.to_out.0", dim)
            lin(f"{nm}.linear_out", dim, dim)
        for a_ in ("pair_row_attn", "pair_col_attn"):
            nm = f"{b}.0.{a_}"
            ln(f"{nm}.norm", dim)
            lin(f"{nm}.to_qkv", dim, 32 * 3 * 4, bias=False)
            lin(f"{nm}.linear_for_pair", dim, 4, bias=False)
            lin(f"{nm}.to_gate.0", dim, dim)
            lin(f"{nm}.to_out", 4 * 32, dim)
        nm = f"{b}.0.pair_trans"
        ln(f"{nm}.norm", dim)
        lin(f"{nm}.linear1", dim, dim * 4)
        lin(f"{nm}.linear2.1", dim * 4, dim)
        for c in range(4):
            nm = f"{b}.0.conv_stem.{c}.1"
            ln2 = lambda n, d: (keys.__setitem__(f"{n}.weight", (d,)),
                                keys.__setitem__(f"{n}.bias", (d,)))
            ln2(f"{nm}.bn1", dim)
            conv(f"{nm}.conv1", dim, 208, 1)
            for j in range(3):
                ln2(f"{nm}.bns.{j}", 52)
                conv(f"{nm}.convs.{j}", 52, 52, 3)
            ln2(f"{nm}.bn3", 208)
            conv(f"{nm}.conv3", 208, dim, 1)
        # MSAAttention prenorm
        ln(f"{b}.1.norm", dim)
        for att in ("attn_width", "attn_height"):
            nm = f"{b}.1.fn.{att}"
            lin(f"{nm}.to_q", dim, HEADS * DIM_HEAD, bias=False)
            lin(f"{nm}.to_kv", dim, HEADS * DIM_HEAD * 2, bias=False)
            lin(f"{nm}.to_out", HEADS * DIM_HEAD, dim)
            ln(f"{nm}.pair_norm", dim)
            lin(f"{nm}.pair_linear", dim, HEADS, bias=False)
        # UpdateX
        lin(f"{b}.2.proj_down1", dim, 32)
        lin(f"{b}.2.proj_down2", 32 * 32, dim)
        # FF prenorm
        ln(f"{b}.3.norm", dim)
        lin(f"{b}.3.fn.feed_forward.0", dim, dim * 4)
        lin(f"{b}.3.fn.feed_forward.3", dim * 4, dim)
        # UpdateM
        ln(f"{b}.4.norm1", dim)
        ln(f"{b}.4.norm2", dim)
        ln(f"{b}.4.norm3", dim)
        lin(f"{b}.4.linear1", dim, HEADS)
        lin(f"{b}.4.linear2", dim, dim // HEADS)
        lin(f"{b}.4.ff.feed_forward.0", dim, dim * 4)
        lin(f"{b}.4.ff.feed_forward.3", dim * 4, dim)

    conv("net.to_dist_logits", dim, 37, 1)
    conv("net.to_theta_logits", dim, 25, 1)
    conv("net.to_omega_logits", dim, 25, 1)
    conv("net.to_phi_logits", dim, 13, 1)

    params = {}
    subkeys = jax.random.split(key, len(keys))
    for (name, shape), k in zip(sorted(keys.items()), subkeys):
        if name.endswith(".bias") or (name.endswith(".weight")
                                      and len(shape) == 1):
            params[name] = jnp.zeros(shape) if name.endswith(".bias") \
                else jnp.ones(shape)
        else:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
            params[name] = jax.random.normal(k, shape) / np.sqrt(fan_in)
    return params
