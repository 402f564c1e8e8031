"""Multi-chip decoy parallelism for the folding engine.

Scale-out story (SURVEY.md §2.3 item 8): the decoy ensemble is
embarrassingly parallel, so the batch axis shards over the mesh's 'dp' axis
with restraint tables replicated. The staged protocol's jitted stage
programs are sharding-agnostic — jit propagates the input sharding, XLA
partitions every per-decoy tensor (L-BFGS state included), and the only
collective is the tiny all-reduce of the `all(done)` loop predicate.

One chip folds ~50 decoys at the throughput sweet spot; N chips fold N x 50
with no code change to the physics."""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trx2dy.physics.folder import FoldResult, fold_ensemble, random_torsions


def fold_ensemble_sharded(mesh: Mesh, npz: dict, seq: str, key: jax.Array,
                          n_decoys: int, **fold_kwargs) -> FoldResult:
    """fold_ensemble with the decoy batch sharded over the mesh's 'dp' axis.

    n_decoys must be divisible by the dp size. All fold_ensemble options
    pass through.
    """
    dp = mesh.shape["dp"]
    if n_decoys % dp:
        raise ValueError(f"n_decoys={n_decoys} not divisible by dp={dp}")
    L = len(seq)
    x0 = random_torsions(key, L, n_decoys)
    sharding = NamedSharding(mesh, P("dp", None, None))
    x0 = jax.device_put(x0, sharding)
    with mesh:
        return fold_ensemble(npz, seq, key, n_decoys=n_decoys, x0=x0,
                             **fold_kwargs)
