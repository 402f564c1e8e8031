#!/usr/bin/env python
"""Headline benchmark: minimized decoys/min/chip at L~150.

Workload (BASELINE.json configs[2]): one target of length 150 with a full
restraint set, init_num=50 decoys minimized in parallel on one chip through
the complete staged protocol (clash removal, 3x centroid L-BFGS, cart-flavour
refinement, two relax rounds) — the work the reference performs with 50
sequential PyRosetta subprocesses (folding/folding.py) on 50 CPU cores.

Baseline denominator: the reference has NO published numbers (BASELINE.md)
and PyRosetta is not installable in this image, so the denominator is the
MEASURED single-CPU-core rate of the same full staged protocol executed by
this repo's folder on the XLA CPU backend: 1.20 decoys/min/core at L=150
(scripts/cpu_denominator.py, conservative — Rosetta does strictly more
per-iteration work). vs_baseline = (our decoys/min/chip) / 1.2.

The target npz is synthesized deterministically from a basin-sampled
structure (measured + binned + smoothed geometry of a realizable fold), so
the restraint funnel is representative and self-contained — no network
weights or external files needed.

Variance protocol (VERDICT r4 item 1 — one timed rep was hostage to
tunnel/compile noise large enough to flip the headline verdict):
  * N_REPS timed repetitions in ONE process, each with its own PRNG key;
    the headline value is the MEDIAN and every rep is in the artifact.
  * Warmup folds the SAME keys as the timed reps, so each rep's
    converged-lane compaction-bucket program family (physics/folder.py
    repacking — the bucket sequence is key-dependent) is compiled before
    any timing starts.
  * A jax.monitoring listener counts backend-compile events inside each
    timed region ("compiles" per rep in the artifact): a healthy capture
    shows 0 — any nonzero rep identifies itself instead of silently
    halving the headline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"quality", "reps", ...}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from trx2dy.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

L = 150
N_DECOYS = 50
BASELINE_DECOYS_PER_MIN = 1.2   # measured 1-CPU-core rate (see above)
REP_KEYS = (1, 2, 3)            # timed reps; warmup covers the same keys


class CompileCounter:
    """Counts backend-compile events (jax.monitoring) so the artifact can
    prove the timed region executed fully-warm programs."""

    def __init__(self):
        self.events = 0
        self.secs = 0.0
        self._on = False
        from jax._src import monitoring
        monitoring.register_event_duration_secs_listener(self._listen)

    def _listen(self, name, secs, **kw):
        if self._on and name.endswith("backend_compile_duration"):
            self.events += 1
            self.secs += secs

    def region(self):
        counter = self

        class _Region:
            def __enter__(self):
                counter.events = 0
                counter.secs = 0.0
                counter._on = True
                return counter

            def __exit__(self, *a):
                counter._on = False
        return _Region()


def synth_target_npz(L: int, seed: int = 0):
    """Histograms measured from a deterministic basin-sampled structure,
    smoothed along bins to imitate softmaxed network output. Also returns
    the generator structure's CA coordinates — the ground truth the
    restraints encode — so the bench can score what it folded."""
    from trx2dy.physics.folder import random_torsions
    from trx2dy.geometry.nerf import build_backbone
    from trx2dy.geometry.transforms import geometry_maps_6d
    from trx2dy.geometry.binning import bin_geometry_maps
    from trx2dy.dynamics.dampen import gaussian_smooth_bins

    t = random_torsions(jax.random.PRNGKey(seed), L, 1)[0]
    # compact it slightly: bias phi/psi toward the helix basin mixture
    atoms = build_backbone(t[0], t[1], t[2])
    maps = geometry_maps_6d(atoms["N"], atoms["CA"], atoms["C"],
                            cb=atoms["CB"], dmax=20.0)
    hist = bin_geometry_maps(maps["dist"], maps["omega"], maps["theta"],
                             maps["phi"], angle=True)
    out = {}
    for k, h in hist.items():
        h = gaussian_smooth_bins(h, sigma=1.5)
        h = h + 0.02 / h.shape[-1]
        out[k] = np.asarray(h / h.sum(-1, keepdims=True), np.float32)
    return out, np.asarray(atoms["CA"])


def _init_backend(attempts: int = 3, backoff_s: float = 30.0):
    """Touch the backend with bounded retries.

    The axon TPU tunnel can fail at init transiently (round 2's bench
    artifact was lost to exactly this); retry with backoff so one hiccup
    doesn't cost the whole benchmark, and let the caller distinguish a
    tunnel outage from a repo regression via the structured error."""
    last = None
    for i in range(attempts):
        try:
            devs = jax.devices()
            jnp.zeros(()).block_until_ready()   # round-trip, not just init
            return devs
        except Exception as e:                  # noqa: BLE001
            last = e
            if i + 1 < attempts:
                print(f"backend init attempt {i + 1}/{attempts} failed: "
                      f"{e}; retrying in {backoff_s:.0f}s", file=sys.stderr)
                time.sleep(backoff_s)
    raise RuntimeError(f"backend init failed after {attempts} attempts: "
                       f"{last}") from last


def _fail(stage: str, err: BaseException) -> None:
    """ONE structured JSON line on failure, so the artifact distinguishes
    an environment outage from a repo regression."""
    print(json.dumps({"error": f"{type(err).__name__}: {err}",
                      "stage": stage,
                      "metric": f"minimized decoys/min/chip (L={L}, full "
                                f"protocol, batch={N_DECOYS})",
                      "value": None, "unit": "decoys/min",
                      "vs_baseline": None}))
    sys.exit(1)


def main() -> None:
    try:
        _init_backend()
    except Exception as e:                      # noqa: BLE001
        _fail("backend_init", e)

    from trx2dy.physics.folder import fold_ensemble

    npz, native_ca = synth_target_npz(L)
    seq = ("ARNDCQEGHILKMFPSTWYV" * 8)[:L]

    def run(key):
        res = fold_ensemble(npz, seq, key, n_decoys=N_DECOYS,
                            max_iter=1000, fastrelax=True)
        # block on atoms (not energy): the protocol ends with the
        # cartesian refinement stage, which produces the atoms AFTER the
        # staged energies — energy alone would under-time the protocol
        res.atoms["CA"].block_until_ready()
        np.asarray(res.atoms["CA"][0, 0])      # force through the tunnel
        return res

    counter = CompileCounter()

    # ---- warmup: fold every timed key once (untimed) --------------------
    # Each key's run can take a DIFFERENT converged-lane compaction bucket
    # sequence (folder repacking), i.e. a different set of program shapes;
    # warming the exact keys guarantees the timed region is fully compiled.
    warmup_s = []
    try:
        for k in REP_KEYS:
            t0 = time.time()
            run(jax.random.PRNGKey(k))
            warmup_s.append(round(time.time() - t0, 1))
    except Exception as e:                      # noqa: BLE001
        _fail("warmup_compile", e)

    # ---- timed reps -----------------------------------------------------
    reps, rep_compiles, rep_compile_s, results = [], [], [], []
    try:
        for k in REP_KEYS:
            with counter.region():
                t0 = time.time()
                res = run(jax.random.PRNGKey(k))
                dt = time.time() - t0
            reps.append(round(N_DECOYS / (dt / 60.0), 2))
            rep_compiles.append(counter.events)
            rep_compile_s.append(round(counter.secs, 1))
            results.append(res)
    except Exception as e:                      # noqa: BLE001
        _fail("timed_run", e)
    for res in results:
        if not bool(np.isfinite(np.asarray(res.energy)).all()):
            _fail("validation", RuntimeError("non-finite decoy energies"))

    # Quality rides INSIDE the bench artifact (VERDICT r3 item 4): TM of
    # every timed decoy of every rep vs the generator structure the
    # restraints encode, so an optimization that corrupts decoys cannot
    # ship a green BENCH. Floors from a 5-seed TPU study of THIS workload
    # (2026-08-20, scripts/bench_quality_seeds.py): best TM 0.7499-0.7679,
    # mean TM 0.6074-0.6285 (the random-basin generator target recovers
    # lower than real natives, which fold at ~0.99 — EXAMPLE_RESULTS.md;
    # it is a funnel-quality regression bar, not a native-recovery claim).
    try:
        from trx2dy.analysis.tmscore import tm_score_batch
        # jit: eager per-op dispatch over the axon tunnel is pathologically
        # slow (CLAUDE.md); one compiled program scores all 50 decoys
        score = jax.jit(tm_score_batch)
        per_rep = []
        for res in results:
            tms = np.asarray(score(res.atoms["CA"],
                                   jnp.asarray(native_ca)).tm)
            per_rep.append({"best_tm": round(float(tms.max()), 4),
                            "mean_tm": round(float(tms.mean()), 4)})
        # floors apply to the WORST rep; headline quality = worst too
        quality = min(per_rep, key=lambda q: (q["best_tm"], q["mean_tm"]))
    except Exception as e:                      # noqa: BLE001
        _fail("quality_score", e)
    if quality["best_tm"] < 0.70 or quality["mean_tm"] < 0.55:
        _fail("quality_floor", RuntimeError(
            f"{quality} below floors (best>=0.70, mean>=0.55; measured "
            f"seed-min 0.7499/0.6074) — the timed protocol no longer "
            f"recovers the generator structure"))

    decoys_per_min = float(np.median(reps))
    print(json.dumps({
        "metric": f"minimized decoys/min/chip (L={L}, full protocol, "
                  f"batch={N_DECOYS}, median of {len(reps)} reps)",
        "value": round(decoys_per_min, 2),
        "unit": "decoys/min",
        "vs_baseline": round(decoys_per_min / BASELINE_DECOYS_PER_MIN, 1),
        "quality": quality,
        "reps": reps,
        "rep_quality": per_rep,
        "compiles_in_timed_region": rep_compiles,
        "compile_secs_in_timed_region": rep_compile_s,
        "warmup_s": warmup_s,
    }))


if __name__ == "__main__":
    main()
