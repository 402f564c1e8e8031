"""Isolate the HOST-SIDE cost of one steady-state chain step.

A fold_chains call in the dynamics sampler does, per step, BEFORE any
L-BFGS work: 8x compile_restraints (unique dampened histograms), stage /
relax mask construction, and compact_restraints_lanes over 3 program
families x 4 terms x 8 unique lanes. Every jnp op in that path dispatches
eagerly — over the axon tunnel each is a host<->device round trip — so
this script times exactly that slice on the real backend with NO protocol
execution (no multi-minute stage compiles needed).

Usage: python scripts/profile_chainstep_host.py [--reps 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from trx2dy.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from trx2dy.physics.restraints import (  # noqa: E402
    FoldParams, compile_restraints, restraint_masks, disulfide_pairs,
)
from trx2dy.physics.folder import _stage_masks_centroid  # noqa: E402
from trx2dy.physics.compact import compact_restraints_lanes  # noqa: E402


def perturbed_npzs(base: dict, n: int, seed: int = 0) -> list:
    """n distinct dampened-histogram stand-ins (content differs per lane)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        d = {}
        for k in ("dist", "omega", "theta", "phi"):
            a = np.asarray(base[k], np.float32)
            a = a * rng.uniform(0.6, 1.0, size=a.shape[:2] + (1,)).astype(
                np.float32)
            a = a / np.maximum(a.sum(-1, keepdims=True), 1e-9)
            d[k] = a
        out.append(d)
    return out


def one_step(npzs, seq, K_cand=2):
    params = FoldParams()
    L = len(seq)
    t0 = time.perf_counter()
    rsts = [compile_restraints(z, params, use_orient=True) for z in npzs]
    for idx, z in enumerate(npzs):
        ss = disulfide_pairs(np.asarray(z["dist"]), seq)
        assert ss is not None
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    stage_masks = [_stage_masks_centroid(r, seq, 2, params.PCUT)
                   for r in rsts]
    r1 = [restraint_masks(r, seq, 1, L, pcut=0.15, nogly=True)
          for r in rsts]
    r2 = [restraint_masks(r, seq, 1, L, pcut=0.30, nogly=True)
          for r in rsts]
    t_masks = time.perf_counter() - t0

    # candidate fan-out shares objects (dedup inside compact_restraints_lanes)
    fan = [u for u in range(len(rsts)) for _ in range(K_cand)]
    rsts_f = [rsts[u] for u in fan]
    n_stages = len(stage_masks[0])
    t0 = time.perf_counter()
    outs = []
    for s in range(n_stages):
        outs.append(compact_restraints_lanes(
            rsts_f, [stage_masks[u][s] for u in fan]))
    outs.append(compact_restraints_lanes(rsts_f, [r1[u] for u in fan]))
    outs.append(compact_restraints_lanes(rsts_f, [r2[u] for u in fan]))
    jax.block_until_ready(jax.tree.leaves(outs))
    t_compact = time.perf_counter() - t0
    return t_compile, t_masks, t_compact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n_lanes", type=int, default=8)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())

    base = dict(np.load(
        "/root/reference/example/output/seq/pred_npz/seq_NMR.npz"))
    with open("/root/reference/example/seq.fasta") as f:
        seq = "".join(l.strip() for l in f if not l.startswith(">"))
    npzs = perturbed_npzs(base, args.n_lanes)

    for r in range(args.reps):
        t = one_step(npzs, seq)
        print(f"rep {r}: compile_restraints {t[0]:.3f}s  masks {t[1]:.3f}s"
              f"  compaction {t[2]:.3f}s  TOTAL {sum(t):.3f}s")


if __name__ == "__main__":
    main()
