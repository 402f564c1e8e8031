"""Long-sequence folding study (VERDICT r3 item 2, BASELINE configs[3]).

Every published folder throughput number is L=150; the restraint tables,
compact pair lists, and L-BFGS state all scale >= L^2, so the batch sweet
spot and decoys/min at L=300-400 are unknown until measured. Three legs,
each a separate serial TPU run (axon is single-tenant):

  --leg batch -L 400 -B 10 25 50   full staged protocol per B: decoys/min,
                                   peak HBM (device memory_stats), TM of
                                   the decoys vs the generator structure
  --leg sampler                    short Nmax-bounded dynamics loop at
                                   L=400 (2 synthetic restraint models,
                                   the production driver end to end)
  --leg inference                  deep-MSA chunked ESM trunk at R=1000,
                                   L=400 (the configs[3] inference half;
                                   random weights, bf16)

Results go to PERF.md's long-sequence section.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def peak_hbm_gb() -> float | None:
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return round(stats["peak_bytes_in_use"] / 2 ** 30, 2)
    except Exception:                            # noqa: BLE001
        pass
    return None


def leg_batch(Ls, Bs) -> None:
    import jax
    import jax.numpy as jnp
    from bench import synth_target_npz
    from trx2dy.physics.folder import fold_ensemble
    from trx2dy.analysis.tmscore import tm_score_batch

    score = jax.jit(tm_score_batch)
    for L in Ls:
        npz, native_ca = synth_target_npz(L, seed=0)
        seq = ("ARNDCQEGHILKMFPSTWYV" * ((L + 19) // 20))[:L]
        for B in Bs:
            # warm-up absorbs the per-(L,B) compiles
            fold_ensemble(npz, seq, jax.random.PRNGKey(1), n_decoys=B,
                          fastrelax=True, max_iter=250)
            t0 = time.time()
            res = fold_ensemble(npz, seq, jax.random.PRNGKey(0), n_decoys=B,
                                fastrelax=True, max_iter=1000)
            jax.block_until_ready(res.atoms["CA"])
            dt = time.time() - t0
            tms = np.asarray(score(res.atoms["CA"],
                                   jnp.asarray(native_ca)).tm)
            print(json.dumps({
                "leg": "batch", "L": L, "B": B, "wall_s": round(dt, 1),
                "decoys_per_min": round(60.0 * B / dt, 2),
                "peak_hbm_gb": peak_hbm_gb(),
                "best_tm": round(float(tms.max()), 4),
                "mean_tm": round(float(tms.mean()), 4)}), flush=True)


def leg_sampler(L: int, nmax: int, init_num: int, n_chains: int) -> None:
    """The production dynamics driver at L=400: synthetic two-model
    restraints (NMR/Xray stand-ins from two generator seeds), full
    Nmax-bounded loop, full-atom emit — the configs[3] sampling half."""
    import jax
    from bench import synth_target_npz
    from trx2dy.dynamics.driver import DynamicsConfig, run_single

    work = f"/tmp/long_seq_sampler_L{L}"
    import shutil
    shutil.rmtree(work, ignore_errors=True)
    npz_dir = os.path.join(work, "npz")
    os.makedirs(npz_dir, exist_ok=True)
    seq = ("ARNDCQEGHILKMFPSTWYV" * ((L + 19) // 20))[:L]
    for tag, seed in (("NMR", 0), ("Xray", 1)):
        npz, _ = synth_target_npz(L, seed=seed)
        np.savez_compressed(os.path.join(npz_dir, f"t_{tag}.npz"), **npz)
    fasta = os.path.join(work, "t.fasta")
    with open(fasta, "w") as f:
        f.write(">t\n" + seq + "\n")

    cfg = DynamicsConfig(init_num=init_num, Nmax=nmax, n_chains=n_chains)
    t0 = time.time()
    out = run_single("t", fasta, None, work, cfg, npz_dir=npz_dir)
    wall = time.time() - t0
    pdb_dir = os.path.join(work, "t", "pred_pdb")
    n = len([f for f in os.listdir(pdb_dir) if f.endswith(".pdb")])
    print(json.dumps({
        "leg": "sampler", "L": L, "Nmax": nmax, "init_num": init_num,
        "n_chains": n_chains, "decoys": n, "wall_s": round(wall, 1),
        "decoys_per_min": round(n / (wall / 60.0), 2),
        "peak_hbm_gb": peak_hbm_gb(), "out": str(out)}), flush=True)


def leg_inference(rows: int, length: int) -> None:
    """Deep-MSA chunked ESM trunk at the configs[3] shape — delegates to
    the existing esm_perf harness (bf16, auto chunking) in-process."""
    import subprocess
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "esm_perf.py"),
         "--rows", str(rows), "--length", str(length), "--bf16"],
        capture_output=True, text=True, timeout=3600)
    sys.stdout.write(p.stdout)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-2000:])
        raise RuntimeError("esm_perf leg failed")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=["batch", "sampler", "inference"],
                    required=True)
    ap.add_argument("-L", type=int, nargs="+", default=[300, 400])
    ap.add_argument("-B", type=int, nargs="+", default=[10, 25, 50])
    ap.add_argument("--nmax", type=int, default=8)
    ap.add_argument("--init_num", type=int, default=4)
    ap.add_argument("--n_chains", type=int, default=4)
    ap.add_argument("--rows", type=int, default=1000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.leg == "batch":
        leg_batch(args.L, args.B)
    elif args.leg == "sampler":
        leg_sampler(args.L[-1], args.nmax, args.init_num, args.n_chains)
    else:
        leg_inference(args.rows, args.L[-1])


if __name__ == "__main__":
    main()
