"""Flash-style triangle attention — Pallas TPU kernel.

The trunk's TriangleAttention (reference evoutils/modules.py:309-350; JAX
port trx2dy.models.predictor2d.triangle_attention) materializes the
(L, L, L, H) logits tensor: at L=400, H=4 that is 1 GB in f32 *per
direction per block* — the HBM-bandwidth wall of the long-sequence config
(BASELINE.json configs[3]).

This kernel computes the same row-wise attention without materializing the
logits: for each (row r, query-tile i) it streams key/value tiles over j
with the online-softmax recurrence (running max/sum), entirely in VMEM.
HBM traffic drops from O(L^3 H) to O(L^2 H D) — the size of q/k/v
themselves.

Semantics (row-wise, modules.py:334-339):
  attn[r, i, j, h] = softmax_j( q[r,i,h,:] . k[r,j,h,:] / sqrt(D)
                                + bias[i, j, h] )
  out[r, i, h, :]  = sum_j attn[r,i,j,h] v[r,j,h,:]

Column-wise attention is the same kernel on transposed operands (the caller
swaps axes). Gating and output projection stay in XLA (they fuse fine).

Forward-only: the Dynamics/e2e pipelines run the trunk at inference;
training uses the XLA path (or remat).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _tri_attn_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, blk_j: int,
                     n_j: int):
    """One (row, i-tile) program: online softmax over j tiles.

    Block shapes (leading row axis of size 1 squeezed):
      q_ref: (1, BI, HD)   —  H*D flattened, per-head slices strided
      k_ref: (1, L, HD)
      v_ref: (1, L, HD)
      b_ref: (H, BI, L)    —  head-major so VMEM tiles are (8,128)-friendly
                              (an (..., H=4) minor dim would lane-pad 32x)
      o_ref: (1, BI, HD)
    """
    q = q_ref[0]                                   # (BI, HD)
    BI, HD = q.shape
    H = b_ref.shape[0]
    D = HD // H

    def body(j, carry):
        # Mosaic's tpu.matmul wants plain 2D dots (no mid-position batch
        # dims), so the H=4 heads are a static unroll of (BI,D)x(D,BJ)
        # MXU matmuls.
        m_prev, l_prev, acc = carry                # (BI,H), (BI,H), (BI,HD)
        k_blk = k_ref[0, pl.ds(j * blk_j, blk_j), :]          # (BJ, HD)
        v_blk = v_ref[0, pl.ds(j * blk_j, blk_j), :]
        b_blk = b_ref[:, :, pl.ds(j * blk_j, blk_j)]          # (H, BI, BJ)

        m_news, l_news, accs = [], [], []
        for h in range(H):
            q_h = q[:, h * D:(h + 1) * D]                     # (BI, D)
            k_h = k_blk[:, h * D:(h + 1) * D]                 # (BJ, D)
            v_h = v_blk[:, h * D:(h + 1) * D]
            s = jax.lax.dot_general(
                q_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # (BI, BJ)
            s = s * (D ** -0.5) + b_blk[h]

            m_prev_h = m_prev[:, h]
            m_blk = jnp.max(s, axis=1)
            m_new = jnp.maximum(m_prev_h, m_blk)
            p = jnp.exp(s - m_new[:, None])                   # (BI, BJ)
            corr = jnp.exp(m_prev_h - m_new)
            l_news.append(l_prev[:, h] * corr + jnp.sum(p, axis=1))
            pv = jax.lax.dot_general(
                p, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (BI, D)
            accs.append(acc[:, h * D:(h + 1) * D] * corr[:, None] + pv)
            m_news.append(m_new)
        return (jnp.stack(m_news, axis=1), jnp.stack(l_news, axis=1),
                jnp.concatenate(accs, axis=1))

    m0 = jnp.full((BI, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BI, H), jnp.float32)
    acc0 = jnp.zeros((BI, HD), jnp.float32)
    _, l_fin, acc = jax.lax.fori_loop(0, n_j, body, (m0, l0, acc0))
    l_safe = jnp.maximum(l_fin, 1e-30)                        # (BI, H)
    outs = [acc[:, h * D:(h + 1) * D] / l_safe[:, h][:, None]
            for h in range(H)]
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_i", "blk_j", "interpret"))
def triangle_attention_flash(q, k, v, bias, blk_i: int = 128,
                             blk_j: int = 128, interpret: bool = False):
    """Row-wise triangle attention without logits materialization.

    Args:
      q, k, v: (L, L, H, D) — [row, position, head, dim].
      bias: (L, L, H) pair bias added to every row's logits.
      blk_i/blk_j: query/key tile sizes (L is padded to multiples).

    Returns (L, L, H, D).
    """
    L = q.shape[0]
    H, D = q.shape[2], q.shape[3]
    HD = H * D

    pad_i = (-L) % blk_i
    pad_j = (-L) % blk_j
    Lp_i = L + pad_i
    Lp_j = L + pad_j
    qf = jnp.pad(q.reshape(L, L, HD), ((0, 0), (0, pad_i), (0, 0)))
    kf = jnp.pad(k.reshape(L, L, HD), ((0, 0), (0, pad_j), (0, 0)))
    vf = jnp.pad(v.reshape(L, L, HD), ((0, 0), (0, pad_j), (0, 0)))
    bf = jnp.pad(jnp.transpose(bias, (2, 0, 1)),       # (H, L, L) head-major
                 ((0, 0), (0, pad_i), (0, pad_j)),
                 constant_values=NEG_INF)
    # padded-i rows attend over a NEG_INF row -> softmax over garbage; they
    # are sliced off below. padded-j keys are masked by the NEG_INF bias.

    n_i = Lp_i // blk_i
    n_j = Lp_j // blk_j

    grid = (L, n_i)
    out = pl.pallas_call(
        functools.partial(_tri_attn_kernel, blk_j=blk_j, n_j=n_j),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_i, HD), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp_j, HD), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp_j, HD), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, blk_i, Lp_j), lambda r, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_i, HD), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, Lp_i, HD), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bf)
    return out[:, :L, :].reshape(L, L, H, D)


def triangle_attention_pallas(p, name: str, z, wise: str, n_heads: int = 4,
                              interpret: bool = False):
    """Drop-in replacement for predictor2d.triangle_attention using the
    flash kernel for the attention core (projections/gate/output in XLA)."""
    from trx2dy.models.predictor2d import linear, layer_norm, sigmoid

    z = layer_norm(p, f"{name}.norm", z)
    qkv = linear(p, f"{name}.to_qkv", z, bias=False)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    L = z.shape[0]
    reshape = lambda t: t.reshape(L, L, n_heads, -1)
    q, k, v = reshape(q), reshape(k), reshape(v)
    b = linear(p, f"{name}.linear_for_pair", z, bias=False)   # (L, L, H)
    gate = sigmoid(linear(p, f"{name}.to_gate.0", z))

    # NOTE the reference scales by sqrt(D) of the HEAD dim (modules.py:330:
    # scale = q.size(-1) ** .5) — same as the kernel's D**-0.5.
    if wise == "row":
        out = triangle_attention_flash(q, k, v, b, interpret=interpret)
    else:
        # col-wise (modules.py:335-339): for each column l, queries i attend
        # keys j with logits q[i,l].k[j,l] + b[i,j] — the column becomes the
        # kernel's row axis (transpose q/k/v), the bias stays UNtransposed
        # (query/key indices keep their original meaning).
        qt = jnp.swapaxes(q, 0, 1)
        kt = jnp.swapaxes(k, 0, 1)
        vt = jnp.swapaxes(v, 0, 1)
        out = triangle_attention_flash(qt, kt, vt, b, interpret=interpret)
        out = jnp.swapaxes(out, 0, 1)
    out = gate * out.reshape(L, L, -1)
    return linear(p, f"{name}.to_out", out)
