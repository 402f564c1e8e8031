"""Drive BATCH MODE for real (VERDICT r3 item 3): >= 3 targets of
different lengths through `trx2dy.cli.run_inference --name_lst
--len_bucket 32 --aot_cache` in ONE process on TPU, and measure the
per-target wall-clock — replacing the extrapolated "~17 decoys/min
amortized marginal" with a measured number.

Targets: the real bundled example (seq, L=90, real predicted npzs) plus
two synthetic targets (L=118 and L=150, bench-style basin-generated
two-model restraint sets). With --len_bucket 32 they pad to 96/128/160 —
three distinct length buckets, the honest (worst) case for program reuse;
run with --len_bucket 160 to measure the shared-bucket (best) case.

Reference anchor: run_inference.py:339-354 (the reference's batch loop
runs targets strictly serially, each paying its full per-process cost).

Usage: python scripts/batch_mode_run.py [--nmax 20] [--len_bucket 32]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/example"
WORK = "/tmp/batch_mode"


def build_workspace() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    for d in ("fasta", "msa", "npz"):
        os.makedirs(os.path.join(WORK, d), exist_ok=True)
    # target 1: the real example (both real predicted models)
    seq90 = open(f"{REF}/seq.fasta").read().strip().splitlines()[1]
    with open(os.path.join(WORK, "fasta", "t090.fasta"), "w") as f:
        f.write(">t090\n" + seq90 + "\n")
    for tag in ("NMR", "Xray"):
        shutil.copy(f"{REF}/output/seq/pred_npz/seq_{tag}.npz",
                    os.path.join(WORK, "npz", f"t090_{tag}.npz"))
    # targets 2-3: synthetic basin-generated two-model restraints — build
    # in a CPU-forced subprocess so workspace prep never touches the TPU
    code = """
import os, sys
os.environ.pop("JAX_PLATFORMS", None)
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %r)
from bench import synth_target_npz
for L in (118, 150):
    name = "t%%03d" %% L
    seq = ("ARNDCQEGHILKMFPSTWYV" * ((L + 19) // 20))[:L]
    with open(os.path.join(%r, "fasta", name + ".fasta"), "w") as f:
        f.write(">" + name + "\\n" + seq + "\\n")
    for tag, seed in (("NMR", 0), ("Xray", 1)):
        npz, _ = synth_target_npz(L, seed=seed)
        np.savez_compressed(
            os.path.join(%r, "npz", name + "_" + tag + ".npz"), **npz)
print("workspace ok")
""" % (REPO, WORK, WORK)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600)
    if p.returncode != 0:
        raise RuntimeError(f"workspace build failed: {p.stderr[-2000:]}")
    with open(os.path.join(WORK, "name_lst"), "w") as f:
        f.write("t090\nt118\nt150\n")
    # empty a3m placeholders (unused: npz_dir short-circuits inference)
    for n in ("t090", "t118", "t150"):
        open(os.path.join(WORK, "msa", n + ".a3m"), "w").close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nmax", type=int, default=20)
    ap.add_argument("--init_num", type=int, default=10)
    ap.add_argument("--len_bucket", type=int, default=32)
    ap.add_argument("--keep-workspace", action="store_true")
    args = ap.parse_args()

    if not args.keep_workspace or not os.path.isdir(WORK):
        build_workspace()
    out = os.path.join(WORK, f"out_lb{args.len_bucket}")
    shutil.rmtree(out, ignore_errors=True)

    env = dict(os.environ)
    env["TRX2DY_AOT_CACHE"] = "1"
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "trx2dy.cli.run_inference",
         "--fasta_dir", os.path.join(WORK, "fasta"),
         "--msa_dir", os.path.join(WORK, "msa"),
         "--name_lst", os.path.join(WORK, "name_lst"),
         "--save_dir", out, "--npz_dir", os.path.join(WORK, "npz"),
         "--Nmax", str(args.nmax), "--init_num", str(args.init_num),
         "--len_bucket", str(args.len_bucket), "--aot_cache"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    sys.stdout.write(p.stdout)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit(f"batch run failed rc={p.returncode}")

    per_target = {}
    for line in p.stdout.splitlines():
        if line.startswith("[trx2dy] ") and " done (" in line:
            name = line.split()[1]
            per_target[name] = float(line.split("(")[1].rstrip("s)"))
    decoys = {}
    for name in per_target:
        d = os.path.join(out, name, "pred_pdb")
        decoys[name] = len([f for f in os.listdir(d)
                            if f.startswith("conf") and f.endswith(".pdb")])
    total = sum(decoys.values())
    # amortized marginal = targets AFTER the first (which pays the
    # per-process trace/compile fixed cost)
    rest = [n for n in per_target if n != next(iter(per_target))]
    marg_wall = sum(per_target[n] for n in rest)
    marg_dec = sum(decoys[n] for n in rest)
    print(json.dumps({
        "len_bucket": args.len_bucket, "Nmax": args.nmax,
        "wall_s": round(wall, 1), "per_target_s": per_target,
        "decoys": decoys,
        "overall_decoys_per_min": round(total / (wall / 60.0), 2),
        "amortized_marginal_decoys_per_min":
            round(marg_dec / (marg_wall / 60.0), 2) if marg_wall else None,
    }), flush=True)


if __name__ == "__main__":
    main()
