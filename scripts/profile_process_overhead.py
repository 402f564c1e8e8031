"""Split the per-process fixed cost of the driver's fold program family.

Runs the driver-shaped fold_chains call TWICE in one process with a warm
on-disk compile cache: call 1 pays jit tracing + cache deserialization +
executable load over the tunnel + device work; call 2 pays device work
only. The difference is the per-process overhead that the e2e pipeline
pays before its first decoy. JAX_LOG_COMPILES output distinguishes true
cache misses from loads.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from trx2dy.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

jax.config.update("jax_log_compiles", True)

from trx2dy.physics.folder import fold_chains  # noqa: E402
from trx2dy.io.a3m import read_fasta  # noqa: E402


def main():
    base = dict(np.load(
        "/root/reference/example/output/seq/pred_npz/seq_NMR.npz"))
    base2 = dict(np.load(
        "/root/reference/example/output/seq/pred_npz/seq_Xray.npz"))
    seq = read_fasta("/root/reference/example/seq.fasta")
    n_init = 13
    npzs = [base] * n_init + [base2] * n_init
    floors: dict = {}
    kw = dict(mode=2, use_orient=True, fastrelax=True, max_iter=1000,
              candidates=1, bucket_floors=floors, lane_bucket=32)
    for rep in range(2):
        t0 = time.perf_counter()
        fr = fold_chains(npzs, seq, jax.random.PRNGKey(rep), **kw)
        jax.block_until_ready(fr.atoms["CA"])
        print(f"== call {rep}: {time.perf_counter() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
