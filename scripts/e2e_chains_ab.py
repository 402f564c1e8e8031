"""n_chains A/B campaign on the full bundled-example pipeline (VERDICT r3
item 1): the steady-state chain steps fold M*K*candidates lanes against a
measured B~50 single-chip sweet spot, so the default n_chains=4 (16 lanes)
leaves throughput on the table. This script runs the COMPLETE 100-decoy
workload (2 models, init_num=10, Nmax=40/model) per arm with the AOT trace
cache on, twice per arm (cold = per-arm program-shape compiles, warm = the
production number), then scores every arm's ensemble against the apo/holo
natives with the in-process TM engine.

One TPU process at a time (axon is single-tenant); evaluation runs in a
CPU-forced subprocess between TPU runs. Results land in
/tmp/e2e_chains_ab/summary.json and are transcribed to EXAMPLE_RESULTS.md.

Usage:  python scripts/e2e_chains_ab.py [--arms 4,8,16] [--skip-cold]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/example"
WORK = "/tmp/e2e_chains_ab"


def run_pipeline(arm: int, tag: str, sequential: bool = False) -> dict:
    label = "seq1" if sequential else f"nc{arm}"
    out = os.path.join(WORK, f"{label}_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    env = dict(os.environ)
    env["TRX2DY_AOT_CACHE"] = "1"
    extra = ["--no-combine_models"] if sequential else []
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "trx2dy.cli.run_inference",
         "--fasta", f"{REF}/seq.fasta", "--msa", f"{REF}/seq.a3m",
         "--name", "seq", "--save_dir", out,
         "--npz_dir", f"{REF}/output/seq/pred_npz",
         "--Nmax", "40", "--init_num", "10",
         "--n_chains", str(arm), "--aot_cache"] + extra,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    if p.returncode != 0:
        print(p.stdout[-2000:], p.stderr[-4000:], sep="\n", file=sys.stderr)
        raise RuntimeError(f"arm {label} ({tag}) failed rc={p.returncode}")
    # phase totals from traces.jsonl
    phases: dict = {}
    tr = os.path.join(out, "seq", "traces.jsonl")
    if os.path.exists(tr):
        with open(tr) as f:
            for line in f:
                row = json.loads(line)
                if row.get("kind") == "phase":
                    for k, v in row.items():
                        if k.startswith("t_") and isinstance(v, (int, float)):
                            phases[k] = round(phases.get(k, 0.0) + v, 1)
    n_pdb = len([f for f in os.listdir(os.path.join(out, "seq", "pred_pdb"))
                 if f.endswith(".pdb") and f.startswith("conf")])
    return {"n_chains": arm, "sequential": sequential, "run": tag,
            "wall_s": round(wall, 1), "decoys": n_pdb,
            "decoys_per_min": round(n_pdb / (wall / 60.0), 2),
            "phases": phases, "out": out}


def evaluate(out: str) -> dict:
    """Score the arm's ensemble vs apo/holo in a CPU-forced subprocess."""
    code = f"""
import os, json
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
from trx2dy.utils.cache import enable_compilation_cache
enable_compilation_cache()
from trx2dy.analysis.evaluate import score_all
res = score_all({os.path.join(WORK, 'natives')!r},
                {os.path.join(out, 'seq', 'pred_pdb')!r})
with open(os.path.join({out!r}, "eval_full.json"), "w") as f:
    json.dump(res, f)   # per-decoy rows: the fidelity study reads these
summ = {{}}
for nat, rows in res.items():
    tms = [r[1] for r in rows]; rms = [r[2] for r in rows]
    summ[nat.split("/")[-1]] = {{
        "best_tm": round(max(tms), 4), "best_rmsd": round(min(rms), 3),
        "mean_tm": round(sum(tms) / len(tms), 4),
        "mean_rmsd": round(sum(rms) / len(rms), 3), "n": len(tms)}}
print("EVALJSON " + json.dumps(summ))
"""
    p = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       capture_output=True, text=True, timeout=1800)
    if p.returncode != 0:
        raise RuntimeError(f"eval failed: {p.stderr[-2000:]}")
    for line in p.stdout.splitlines():
        if line.startswith("EVALJSON "):
            return json.loads(line[len("EVALJSON "):])
    raise RuntimeError("no EVALJSON line in eval output")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", type=str, default="4,8,16")
    ap.add_argument("--skip-cold", action="store_true",
                    help="skip the cold (compile) pass per arm — use when "
                         "the XLA/AOT caches are already warm for the arm")
    ap.add_argument("--seq-arm", action="store_true",
                    help="also run the reference-shape sequential arm "
                         "(n_chains=1, --no-combine_models) — the anchor "
                         "for the chain-fidelity distribution study")
    args = ap.parse_args()

    os.makedirs(WORK, exist_ok=True)
    natives = os.path.join(WORK, "natives")
    os.makedirs(natives, exist_ok=True)
    for nat in ("apo.pdb", "holo.pdb"):
        shutil.copy(os.path.join(REF, nat), os.path.join(natives, nat))

    rows = []
    for arm in [int(a) for a in args.arms.split(",")]:
        if not args.skip_cold:
            r = run_pipeline(arm, "cold")
            print(json.dumps(r), flush=True)
            rows.append(r)
        r = run_pipeline(arm, "warm")
        r["quality"] = evaluate(r["out"])
        print(json.dumps(r), flush=True)
        rows.append(r)
    if args.seq_arm:
        r = run_pipeline(1, "warm", sequential=True)
        r["quality"] = evaluate(r["out"])
        print(json.dumps(r), flush=True)
        rows.append(r)

    with open(os.path.join(WORK, "summary.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[e2e_chains_ab] summary -> {WORK}/summary.json")


if __name__ == "__main__":
    main()
