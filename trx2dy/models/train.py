"""Training step for the Predictor2D geometry network.

The reference ships inference only (no training code; checkpoints are
downloaded artifacts). A complete framework needs the training path, built
TPU-first:

  * loss — masked cross-entropy of the four geometry heads against binned
    native geometry (the classic trRosetta objective; bins are exactly
    trx2dy.geometry.binning's, so labels come straight from native PDBs),
  * bf16-matmul trunk with f32 master weights (mixed precision replaces the
    reference's torch.amp autocast, SURVEY.md §2.3 item 5),
  * rematerialized blocks via jax.checkpoint (replaces
    torch.utils.checkpoint, attn_conv.py:183-185,303-313),
  * pjit/NamedSharding over a (dp, mp) mesh — batch over dp, MSA rows over
    mp; XLA inserts the tied-row-attention all-reduces over ICI.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trx2dy.models.predictor2d import predictor2d_apply, Params

HEAD_BINS = {"dist": 37, "omega": 25, "theta": 25, "phi": 13}


class TrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState
    step: jnp.ndarray


def geometry_loss(params: Params, f2d: jnp.ndarray, msa: jnp.ndarray,
                  labels: Dict[str, jnp.ndarray],
                  mask: Optional[jnp.ndarray] = None,
                  depth: int = 12, dropout_rng=None,
                  remat: bool = False) -> jnp.ndarray:
    """Masked mean cross-entropy over the four heads for ONE sample.

    labels: dict of (L, L) int bin indices; mask: (L, L) bool of valid pairs
    (e.g. resolved residues within the 20 A contact shell for angles).
    dropout_rng enables the reference's training-time structured dropout
    (evoutils/dropout.py:63-78 semantics); remat rematerializes each trunk
    block (the torch.utils.checkpoint equivalent).
    """
    logits = predictor2d_apply(params, f2d, msa, depth=depth,
                               dropout_rng=dropout_rng, remat=remat)
    if mask is None:
        mask = jnp.ones(f2d.shape[:2], bool)
    total = jnp.asarray(0.0)
    for k in ("dist", "omega", "theta", "phi"):
        logp = jax.nn.log_softmax(logits[k], axis=-1)
        nll = -jnp.take_along_axis(logp, labels[k][..., None], axis=-1)[..., 0]
        total = total + jnp.sum(jnp.where(mask, nll, 0.0)) \
            / jnp.maximum(jnp.sum(mask), 1)
    return total


def batched_loss(params, f2d, msa, labels, mask, depth: int = 12,
                 dropout_rng=None, remat: bool = False):
    """Mean loss over the leading batch axis (vmapped single-sample loss)."""
    if dropout_rng is None:
        per = jax.vmap(
            lambda f, m, lab, mk: geometry_loss(params, f, m, lab, mk,
                                                depth=depth, remat=remat),
            in_axes=(0, 0, 0, 0))(f2d, msa, labels, mask)
    else:
        rngs = jax.random.split(dropout_rng, f2d.shape[0])
        per = jax.vmap(
            lambda f, m, lab, mk, r: geometry_loss(
                params, f, m, lab, mk, depth=depth, dropout_rng=r,
                remat=remat),
            in_axes=(0, 0, 0, 0, 0))(f2d, msa, labels, mask, rngs)
    return jnp.mean(per)


def make_optimizer(lr: float = 1e-3, weight_decay: float = 1e-4,
                   clip: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def init_train_state(params: Params,
                     optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.asarray(0))


def make_train_step(optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, depth: int = 12,
                    dropout: bool = False, remat: bool = False,
                    dropout_seed: int = 0):
    """Build the jitted (optionally mesh-sharded) train step.

    With a mesh: params/opt_state replicated, batch inputs sharded over
    'dp', the MSA row axis additionally sharded over 'mp'. The jit partitioner
    turns the tied-row attention reductions into psums over ICI.

    dropout=True enables the reference's structured training dropout
    (per-step rng folded from dropout_seed and the step counter);
    remat=True rematerializes each trunk block.
    """

    def step_fn(state: TrainState, f2d, msa, labels, mask):
        rng = jax.random.fold_in(jax.random.PRNGKey(dropout_seed),
                                 state.step) if dropout else None
        loss, grads = jax.value_and_grad(batched_loss)(
            state.params, f2d, msa, labels, mask, depth=depth,
            dropout_rng=rng, remat=remat)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    dp = lambda nd: NamedSharding(mesh, P(*(("dp",) + (None,) * (nd - 1))))
    msa_sh = NamedSharding(mesh, P("dp", "mp", None))
    state_sh = TrainState(params=repl, opt_state=repl, step=repl)
    label_sh = {k: dp(3) for k in HEAD_BINS}
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, dp(4), msa_sh, label_sh, dp(3)),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
