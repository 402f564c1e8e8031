"""Device-mesh and sharding helpers.

The reference has NO distributed backend (SURVEY.md §2.3: the only "nccl"
string is a checkpoint artifact); its parallelism is subprocess decoy fan-out
and an ad-hoc 2-GPU block split (attn_conv.py:441-472). The TPU-native
scale-out story is jax.sharding over an ICI mesh:

  axis "dp" — data parallel over targets / decoy sub-batches (the reference's
              ThreadPoolExecutor axis),
  axis "mp" — model/sequence parallel: MSA rows are sharded over "mp"; the
              tied-row attention's sum over rows and the UpdateX outer
              product become XLA all-reduces over ICI (this subsumes the
              reference's pipeline split at layer 5, which is unnecessary
              for a dim-128 trunk).

Shardings are declared with NamedSharding + PartitionSpec and jit inserts
the collectives — no hand-written NCCL-style communication.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axes: Tuple[str, str] = ("dp", "mp"),
              mp_size: Optional[int] = None) -> Mesh:
    """Build a 2D (dp, mp) mesh over the given (or all) devices.

    mp_size defaults to 2 when the device count is even and > 1, else 1 —
    MSA-row sharding pays off once rows no longer fit one chip's HBM.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mp_size is None:
        mp_size = 2 if (n % 2 == 0 and n > 1) else 1
    if n % mp_size:
        raise ValueError(f"{n} devices not divisible by mp={mp_size}")
    arr = np.asarray(devices).reshape(n // mp_size, mp_size)
    return Mesh(arr, axes)


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard one axis over 'dp', replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def msa_sharding(mesh: Mesh) -> NamedSharding:
    """(B, R, L) MSA: batch over dp, rows over mp."""
    return NamedSharding(mesh, P("dp", "mp", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
