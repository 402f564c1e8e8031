#!/usr/bin/env python
"""Roofline/MFU analysis of the headline fold step (VERDICT item 4).

Times one compiled stage chunk (the program that dominates bench.py) at the
headline shape (B=50, L=150), reads XLA's cost analysis (flops + bytes
accessed) from the compiled executable, and reports achieved FLOP/s and
HBM bandwidth against TPU v5e-lite peaks — answering "how far is the fold
step from speed-of-light" with measured numbers instead of a CPU-baseline
ratio alone.

Peaks used (TPU v5e public specs): 197 TFLOP/s bf16 MXU, ~99 TFLOP/s fp32
(MXU at half bf16 rate), 819 GB/s HBM.

Usage: python scripts/mfu_profile.py [-B 50] [-L 150]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from trx2dy.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

PEAK_BF16 = 197e12
PEAK_F32 = 99e12
PEAK_HBM = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=50)
    ap.add_argument("-L", type=int, default=150)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--dense", action="store_true",
                    help="profile the dense masked path instead of the "
                         "compact production path")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from bench import synth_target_npz
    from trx2dy.physics.restraints import FoldParams, compile_restraints
    from trx2dy.physics.folder import (
        random_torsions, _stage_masks_centroid, _stage_init_jit,
        _stage_run_jit, weights_to_vec, SCOREFXN_CENT,
    )

    B, L = args.B, args.L
    npz, _ = synth_target_npz(L, seed=0)
    seq = "A" * L
    params = FoldParams()
    rst_dense = compile_restraints(npz, params, use_orient=True)
    masks_dense = _stage_masks_centroid(rst_dense, seq, 2, params.PCUT)[0]
    if args.dense:
        rst, masks = rst_dense, masks_dense
    else:
        # production path: compacted active pairs (physics.compact)
        from trx2dy.physics.compact import compact_restraints
        rst, masks = compact_restraints(rst_dense, masks_dense), None
    w = weights_to_vec(SCOREFXN_CENT)
    x0 = np.asarray(random_torsions(jax.random.PRNGKey(0), L, B)
                    ).reshape(B, 3 * L)
    freeze = jnp.zeros((B,), bool)

    st = _stage_init_jit(jnp.asarray(x0), rst, masks, w, freeze)
    # lower+compile the chunk program once to read its cost analysis
    lowered = _stage_run_jit.lower(st, rst, masks, w, args.chunk)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    flops = float(costs.get("flops", 0.0))
    bytes_acc = float(costs.get("bytes accessed", 0.0))

    # warm up, then time the chunk (iterations may stop early on
    # convergence; use a fresh state each rep so all reps run the same work)
    st_run = _stage_run_jit(st, rst, masks, w, args.chunk)
    jax.block_until_ready(st_run.x)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = _stage_run_jit(st, rst, masks, w, args.chunk)
        jax.block_until_ready(out.x)
    dt = (time.time() - t0) / reps
    iters = int(np.asarray(out.k)) - int(np.asarray(st.k))

    # XLA's cost analysis counts each while-loop BODY once (verified:
    # identical numbers at chunk=10 and chunk=250), so flops/bytes are
    # per-iteration; scale by executed iterations for rates. The body
    # contains ONE line-search trial; iterations that backtrack more do
    # extra work, so these achieved rates are lower bounds.
    per_iter_ms = 1e3 * dt / max(iters, 1)
    fps = flops * iters / dt
    bps = bytes_acc * iters / dt
    print(f"shape B={B} L={L} chunk={args.chunk}: {dt*1e3:.1f} ms "
          f"({iters} iters, {per_iter_ms:.2f} ms/iter)")
    print(f"XLA cost analysis: {flops/1e9:.2f} GFLOP, "
          f"{bytes_acc/1e9:.2f} GB accessed per iteration "
          f"(arithmetic intensity {flops/max(bytes_acc,1):.2f} flops/byte)")
    print(f"achieved (>=): {fps/1e12:.2f} TFLOP/s "
          f"({100*fps/PEAK_F32:.1f}% of f32 peak, "
          f"{100*fps/PEAK_BF16:.1f}% of bf16 peak)")
    print(f"achieved HBM (>=): {bps/1e9:.1f} GB/s "
          f"({100*bps/PEAK_HBM:.1f}% of 819 GB/s)")
    print(f"decoy-iterations/s: {B*iters/dt:.0f}")


if __name__ == "__main__":
    main()
