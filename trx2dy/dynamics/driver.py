"""Dynamics pipeline driver — the run_inference.py equivalent.

Orchestrates per-target ensemble generation exactly like the reference driver
(run_inference.py:16-337): fold an initial ensemble, pick the most reliable
decoy by Ramachandran score, then iterate fold -> measure -> dampen until the
tmp-channel change drops below 0.01 or Nmax is reached; finally flatten the
output tree and rename decoys to conf_1_k / conf_2_k.

File contracts preserved (naturally resumable, SURVEY.md §5):
  save_dir/<name>/pred_npz/<name>_{NMR,Xray}.npz     predicted histograms
  save_dir/<name>/tmp_npz/[NMR|Xray/]<name><k>.npz   per-iteration npz
  save_dir/<name>/pred_pdb/...                       decoys, renamed at end
  (tmp_npz removed on completion, like the reference)

TPU-native changes: the initial N decoys fold as ONE batched minimization
(replacing N subprocesses), and measurement/dampening run on in-memory decoy
atoms instead of re-parsing the written PDB.
"""
from __future__ import annotations

import functools
import os
import re
import shutil
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.io.a3m import read_fasta
from trx2dy.io.pdbio import write_pdb_backbone
from trx2dy.physics.folder import fold_ensemble
from trx2dy.dynamics.loop import (
    GeomHistograms, histograms_from_npz, histograms_to_npz, measure_decoy,
    dampen_step, reliability_score, convergence_delta,
)

CONVERGE_TOL = 0.01   # max|delta tmp| (run_inference.py:135-137)
PACK_CHUNK = 8        # sidechain-pack batch bucket (see write_decoys)


class TraceWriter:
    """Per-decoy observability: appends one JSON line per folded decoy
    (energy, reliability, convergence delta) to save_dir/<name>/traces.jsonl.
    An additive artifact — the reference only print()s progress
    (run_inference.py:48,103); file contracts are unchanged."""

    def __init__(self, path: Optional[str]):
        self.path = path

    def write(self, **row):
        if self.path is None:
            return
        import json
        with open(self.path, "a") as f:
            f.write(json.dumps(
                {k: (float(v) if isinstance(v, (np.floating, np.ndarray))
                     else v) for k, v in row.items()}) + "\n")


@dataclass
class DynamicsConfig:
    """Driver options (reference argparse defaults, run_inference.py:356-380
    and folding CLI defaults, utils_ros/arguments.py)."""
    init_num: int = 10
    Nmax: int = 300
    angle: bool = True
    mult_two_models: bool = True
    sigma: float = 1.0
    mode: int = 2
    fastrelax: bool = True
    max_iter: int = 1000
    seed: int = 0
    # parallel dampening chains per model. The reference's sampler is
    # strictly sequential (one decoy per iteration, run_inference.py:97-139);
    # K chains fold together as one batched program per step, producing the
    # same kind of dampening-driven ensemble ~K times faster in wall-clock.
    # n_chains=1 with combine_models=False reproduces the reference's exact
    # sequential behavior (and its per-file resume contract).
    # Default 8 from the r4 A/B on the bundled 100-decoy example (warm,
    # AOT on): K=4 5.8, K=8 13.0-17.4, K=16 9.3 decoys/min e2e — K=8's
    # 2xK=4 chains double emits per 32-lane step at the same device cost;
    # K=16 crosses into the 64-lane bucket whose step costs ~2x. Per-decoy
    # TM distributions are flat-to-better in K across 1/4/8/16
    # (EXAMPLE_RESULTS.md chain-fidelity table).
    n_chains: int = 8
    # Batch the NMR and X-ray samplers into ONE device program per step
    # (TPU throughput redesign): the reference runs the two models strictly
    # serially (run_inference.py:298-302 then :334-339), which leaves the
    # chip at a tiny batch for the whole second half of the pipeline.
    # Falls back to the serial samplers automatically when a resume is in
    # progress (existing tmp_npz iteration files), where the sequential
    # path's exact resume contract applies.
    combine_models: bool = True
    # full-atom decoy output (sidechain packing). None = follow fastrelax,
    # mirroring the reference: FastRelax switches to fa_standard and dumps
    # full-atom PDBs (folding.py:220,273); without relax the pose stays
    # centroid (backbone + CB).
    full_atom: Optional[bool] = None
    # energy-gated decoy selection (TPU redesign, not in the reference):
    # initial ensembles fold ceil(N*(1+oversample)) lanes per stream and
    # keep the N lowest-energy; each chain step folds chain_candidates
    # lanes per chain and keeps the best (see also fill_candidates below).
    # Culls the ~15-20% trapped-topology minimizations whose final
    # energy sits far above the good band (corr(E, TM) ~ -0.95 measured).
    oversample: float = 0.25
    chain_candidates: int = 2
    # the combined sampler buckets its folded lane count so initial
    # ensembles and chain steps share ONE family of compiled stage
    # programs; fill_candidates spends any bucket padding the chain steps
    # would fold anyway as extra best-of candidates per chain (monotone
    # quality at ~zero marginal device cost) instead of inert lanes
    fill_candidates: bool = True
    # pad targets to multiples of this length so batch-mode targets of
    # different L reuse one bucket of compiled fold programs (0 = off)
    len_bucket: int = 0
    fold_kwargs: dict = field(default_factory=dict)

    @property
    def emit_full_atom(self) -> bool:
        return self.fastrelax if self.full_atom is None else self.full_atom


def _fold_and_write(hist: GeomHistograms, seq: str, key, n_decoys: int,
                    out_paths, cfg: DynamicsConfig):
    """Fold n_decoys from the current histograms and write the PDBs.

    Returns the FoldResult (atoms carry the batch axis)."""
    npz = {"dist": hist.dist, "omega": hist.omega, "theta": hist.theta,
           "phi": hist.phi}
    pad_to = None
    if cfg.len_bucket:
        pad_to = -(-len(seq) // cfg.len_bucket) * cfg.len_bucket
    res = fold_ensemble(npz, seq, key, n_decoys=n_decoys, mode=cfg.mode,
                        use_orient=cfg.angle, fastrelax=cfg.fastrelax,
                        max_iter=cfg.max_iter, oversample=cfg.oversample,
                        pad_to=pad_to, **cfg.fold_kwargs)
    if cfg.emit_full_atom:
        from trx2dy.physics.sidechain import pack_and_write
        # sidechains pack onto the (cart-refined) folded backbone
        pack_and_write(out_paths, seq, res.torsions, backbone=res.atoms)
    else:
        atoms_np = {k: np.asarray(v) for k, v in res.atoms.items()}
        for b, path in enumerate(out_paths):
            write_pdb_backbone(path, seq,
                               {k: v[b] for k, v in atoms_np.items()})
    return res


def _measure(res, b: int):
    """One-hot histograms of decoy b of a FoldResult."""
    a = res.atoms
    return measure_decoy(a["N"][b], a["CA"][b], a["C"][b], a["CB"][b])


def generate_ensemble(pdb_name: str, processed_npz_dir: str,
                      pred_pdb_dir: str, initial_npz: str | dict, seq: str,
                      cfg: DynamicsConfig, key: jax.Array,
                      begin_num: int = 0,
                      trace: Optional[TraceWriter] = None) -> int:
    """Reference generate_npz_and_pdb (run_inference.py:16-144).

    With cfg.n_chains > 1 the iterative sampler runs K independent dampening
    chains batched on one chip (TPU-native throughput redesign: the
    reference's loop is strictly sequential, one decoy per iteration) —
    seeded from the K most reliable initial decoys, producing the same
    kind of ensemble ~K times faster in wall-clock.

    Returns the index of the last generated structure.
    """
    resuming = os.path.isdir(processed_npz_dir) and any(
        f.startswith(pdb_name) and f.endswith(".npz")
        for f in os.listdir(processed_npz_dir))
    if cfg.n_chains > 1 and not resuming:
        return _generate_ensemble_chains(pdb_name, processed_npz_dir,
                                         pred_pdb_dir, initial_npz, seq,
                                         cfg, key, begin_num, trace)
    # An in-progress tmp_npz tree routes to the sequential sampler, whose
    # per-file resume contract is exact (run_inference.py:100-102); the
    # batched chains path has no notion of partially-produced iterations.
    # This is sound even for a tree an interrupted CHAINS run left behind:
    # the sequential loop re-folds each saved iteration file from ITS OWN
    # histograms (not the previous decoy's), so every replayed decoy still
    # draws from a legitimate dampened state; past the last file the run
    # continues as one chain from the latest state (chain provenance is
    # recorded in traces.jsonl; the npz key set is a parity surface).
    trace = trace or TraceWriter(None)
    os.makedirs(processed_npz_dir, exist_ok=True)
    os.makedirs(pred_pdb_dir, exist_ok=True)
    if isinstance(initial_npz, (str, os.PathLike)):
        initial_npz = dict(np.load(initial_npz))
    hist = histograms_from_npz(initial_npz)

    # ---- initial ensemble: one batched fold of N decoys ----------------
    N = cfg.init_num
    init_paths = [os.path.join(pred_pdb_dir, f"initial{i}.pdb")
                  for i in range(N)]
    key, k_init = jax.random.split(key)
    res = _fold_and_write(hist, seq, k_init, N, init_paths, cfg)

    scores = jax.vmap(reliability_score)(res.torsions)
    best = int(jnp.argmax(scores))
    e_np = np.asarray(res.energy)
    for i in range(N):
        trace.write(decoy=f"initial{i}", kind="initial",
                    energy=float(e_np[i]),
                    reliability=float(np.asarray(scores)[i]),
                    selected_seed=(i == best))

    # ---- first dampening from the most reliable initial decoy ----------
    fact = _measure(res, best)
    hist = dampen_step(hist, fact, sigma=cfg.sigma, angle=cfg.angle)
    npz_pattern = os.path.join(processed_npz_dir, pdb_name + "{k}.npz")
    np.savez_compressed(npz_pattern.format(k=begin_num + 1),
                        **histograms_to_npz(hist))

    # ---- iterative sampling --------------------------------------------
    iter_n = begin_num
    old_tmp = hist  # holds the tmp used for the convergence diff
    while True:
        iter_n += 1
        current = npz_pattern.format(k=iter_n)
        if os.path.exists(current):   # resume contract (run_inference.py:100)
            hist = histograms_from_npz(dict(np.load(current)))
            old_tmp = hist
        key, k_it = jax.random.split(key)
        pdb_path = os.path.join(pred_pdb_dir, f"{pdb_name}{iter_n}.pdb")
        res = _fold_and_write(hist, seq, k_it, 1, [pdb_path], cfg)
        if iter_n - begin_num >= cfg.Nmax:
            trace.write(decoy=f"{pdb_name}{iter_n}", kind="chain",
                        energy=float(np.asarray(res.energy)[0]),
                        stopped="Nmax")
            break
        fact = _measure(res, 0)
        new_hist = dampen_step(hist, fact, sigma=cfg.sigma, angle=cfg.angle)
        np.savez_compressed(npz_pattern.format(k=iter_n + 1),
                            **histograms_to_npz(new_hist))
        delta = convergence_delta(old_tmp, new_hist)
        trace.write(decoy=f"{pdb_name}{iter_n}", kind="chain",
                    energy=float(np.asarray(res.energy)[0]),
                    delta=float(delta))
        hist = new_hist
        old_tmp = new_hist
        if delta < CONVERGE_TOL:
            break
    return iter_n


def flatten_directory(parent: str) -> None:
    """Move files of subdirectories up into parent, '_1' suffixing conflicts
    (run_inference.py:145-168 move_and_delete_subfolders)."""
    for root, dirs, files in os.walk(parent, topdown=False):
        for name in files:
            if name.startswith("."):
                continue        # provisional/hidden files never ship
            src = os.path.join(root, name)
            dst = os.path.join(parent, name)
            if src == dst:
                continue
            if os.path.exists(dst):
                base, ext = os.path.splitext(name)
                c = 1
                while os.path.exists(dst):
                    dst = os.path.join(parent, f"{base}_{c}{ext}")
                    c += 1
            shutil.move(src, dst)
        for name in dirs:
            try:
                os.rmdir(os.path.join(root, name))
            except OSError:
                pass


def rename_to_conf(folder: str, num_conf1_others: int) -> None:
    """Rename decoys to the conf_1_k / conf_2_k contract
    (run_inference.py:170-278 rename_pdb_files semantics, including the
    lexicographic ordering of 'other' decoys)."""
    if not os.path.isdir(folder):
        return
    pat_init = re.compile(r"initial(\d+)\.pdb$", re.IGNORECASE)
    pat_init1 = re.compile(r"initial(\d+)_1\.pdb$", re.IGNORECASE)
    pat_c1 = re.compile(r"conf_1_(\d+)\.pdb$", re.IGNORECASE)
    pat_c2 = re.compile(r"conf_2_(\d+)\.pdb$", re.IGNORECASE)
    pat_num = re.compile(r".*(\d+)\.pdb$", re.IGNORECASE)

    init_x, init_x1, others = [], [], []
    max_c1 = max_c2 = max_proj_c1 = 0
    for fn in os.listdir(folder):
        if not fn.lower().endswith(".pdb") or fn.startswith("."):
            continue   # dotfiles = provisional/hidden, never decoys
        if (m := pat_c1.match(fn)):
            max_c1 = max(max_c1, int(m.group(1)))
        elif (m := pat_c2.match(fn)):
            max_c2 = max(max_c2, int(m.group(1)))
        elif (m := pat_init1.match(fn)):   # check _1 BEFORE plain initial
            init_x1.append((fn, int(m.group(1))))
        elif (m := pat_init.match(fn)):
            x = int(m.group(1))
            init_x.append((fn, x))
            max_proj_c1 = max(max_proj_c1, x + 1)
        elif pat_num.match(fn):
            others.append(fn)

    existing_c1_from_others = sum(
        1 for fn in os.listdir(folder)
        if (m := pat_c1.match(fn)) and int(m.group(1)) > max_proj_c1)

    plan: dict[str, str] = {}
    for fn, x in sorted(init_x, key=lambda t: t[1]):
        plan[fn] = f"conf_1_{x + 1}.pdb"
        max_c1 = max(max_c1, x + 1)
    for fn, x in sorted(init_x1, key=lambda t: t[1]):
        plan[fn] = f"conf_2_{x + 1}.pdb"
        max_c2 = max(max_c2, x + 1)

    c1_next, c2_next = max_c1 + 1, max_c2 + 1
    budget = max(0, num_conf1_others - existing_c1_from_others)
    for i, fn in enumerate(sorted(others)):
        if i < budget:
            plan[fn] = f"conf_1_{c1_next}.pdb"
            c1_next += 1
        else:
            plan[fn] = f"conf_2_{c2_next}.pdb"
            c2_next += 1

    for old, new in plan.items():
        src, dst = os.path.join(folder, old), os.path.join(folder, new)
        if src != dst and not os.path.exists(dst):
            os.rename(src, dst)


def run_single(name: str, fasta_file: str, msa_file: Optional[str],
               save_dir: str, cfg: DynamicsConfig,
               npz_dir: Optional[str] = None,
               model_dir: Optional[str] = None) -> str:
    """Full per-target pipeline (run_inference.py:280-337 run_single).

    2D geometry source, in priority order:
      1. existing <save>/pred_npz/<name>_{NMR,Xray}.npz or files in npz_dir,
      2. the JAX Predictor2D with converted weights from model_dir.
    """
    save_content = os.path.join(save_dir, name)
    save_npz_dir = os.path.join(save_content, "pred_npz")
    save_pdb_dir = os.path.join(save_content, "pred_pdb")
    npz_tmp_dir = os.path.join(save_content, "tmp_npz")
    for d in (save_npz_dir, save_pdb_dir, npz_tmp_dir):
        os.makedirs(d, exist_ok=True)

    seq = read_fasta(fasta_file)
    key = jax.random.PRNGKey(cfg.seed)

    def npz_for(tag: str) -> str:
        target = os.path.join(save_npz_dir, f"{name}_{tag}.npz")
        if os.path.exists(target):
            return target
        if npz_dir:
            src = os.path.join(npz_dir, f"{name}_{tag}.npz")
            if os.path.exists(src):
                shutil.copy(src, target)
                return target
        if model_dir is None:
            raise FileNotFoundError(
                f"no precomputed npz for {name}_{tag} and no model_dir given")
        from trx2dy.models.predictor2d_infer import pred_2d_geometry
        weight_file = {"NMR": "trX2(NMR)_40.pth",
                       "Xray": "trX2(X-ray)_40.pth"}[tag]
        pred_2d_geometry(os.path.join(model_dir, weight_file), msa_file,
                         save_npz_dir, f"{name}_{tag}")
        return target

    key1, key2 = jax.random.split(key)
    trace = TraceWriter(os.path.join(save_content, "traces.jsonl"))
    if cfg.mult_two_models:
        n1 = npz_for("NMR")
        n2 = npz_for("Xray")
        # resume in progress? the serial samplers own the exact per-file
        # resume contract (run_inference.py:100-102) — use them then
        resuming = any(
            f.startswith(name) and f.endswith(".npz")
            for tag in ("NMR", "Xray")
            if os.path.isdir(os.path.join(npz_tmp_dir, tag))
            for f in os.listdir(os.path.join(npz_tmp_dir, tag)))
        if cfg.combine_models and not resuming:
            # both models' chains batched into ONE program per step
            streams = [
                _ModelStream(tag="NMR",
                             npz_dir=os.path.join(npz_tmp_dir, "NMR"),
                             pdb_dir=os.path.join(save_pdb_dir, "NMR"),
                             hist=histograms_from_npz(dict(np.load(n1))),
                             begin=0),
                _ModelStream(tag="Xray",
                             npz_dir=os.path.join(npz_tmp_dir, "Xray"),
                             pdb_dir=os.path.join(save_pdb_dir, "Xray"),
                             hist=histograms_from_npz(dict(np.load(n2)))),
            ]
            num = _generate_chains_multi(name, streams, seq, cfg, key1,
                                         trace=trace)[0]
        else:
            num = generate_ensemble(name, os.path.join(npz_tmp_dir, "NMR"),
                                    os.path.join(save_pdb_dir, "NMR"), n1,
                                    seq, cfg, key1, trace=trace)
            generate_ensemble(name, os.path.join(npz_tmp_dir, "Xray"),
                              os.path.join(save_pdb_dir, "Xray"), n2, seq,
                              cfg, key2, begin_num=num, trace=trace)
    else:
        n1 = npz_for("NMR")
        num = generate_ensemble(name, npz_tmp_dir,
                                os.path.join(save_pdb_dir, "NMR"), n1, seq,
                                cfg, key1, trace=trace)

    shutil.rmtree(npz_tmp_dir, ignore_errors=True)
    flatten_directory(save_pdb_dir)
    rename_to_conf(save_pdb_dir, num)
    return save_content


class _AsyncIO:
    """Overlap PDB/npz writes with device work (the fold of the next step).

    The reference's loop serializes IO with compute; here writes are queued
    on a small thread pool and drained before the driver touches the output
    tree (flatten/rename). Exceptions re-raise on drain."""

    def __init__(self, workers: int = 2):
        from concurrent.futures import ThreadPoolExecutor
        self._ex = ThreadPoolExecutor(max_workers=workers)
        self._futs = []

    def submit(self, fn, *args, **kwargs):
        self._futs.append(self._ex.submit(fn, *args, **kwargs))

    def drain(self):
        futs, self._futs = self._futs, []
        for f in futs:
            f.result()

    def check(self):
        """Re-raise from any already-completed write WITHOUT blocking —
        called once per sampling step so a failing disk surfaces after one
        step, not after the whole multi-hour run."""
        done = [f for f in self._futs if f.done()]
        self._futs = [f for f in self._futs if not f.done()]
        for f in done:
            f.result()

    def close(self, raise_errors: bool = True):
        try:
            self.drain()
        except BaseException:
            self._ex.shutdown(wait=False)
            if raise_errors:
                raise
        else:
            self._ex.shutdown()


def _stack_hists(hists) -> GeomHistograms:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *hists)


@functools.partial(jax.jit, static_argnames=("angle",))
def _chain_update_batch(chains: GeomHistograms, n, ca, c, cb, advance,
                        sigma: float, angle: bool):
    """Measure + dampen every chain lane in ONE program.

    chains: stacked (C, ...) histograms; n/ca/c/cb: (C, L, 3) decoy atoms;
    advance: (C,) bool — lanes that actually advance (inactive chains keep
    their histograms). Returns (new_chains, delta) with delta = per-lane
    max|Δtmp| (the convergence statistic, run_inference.py:135-137)."""
    fact = jax.vmap(measure_decoy)(n, ca, c, cb)
    new = jax.vmap(lambda cur, f: dampen_step(cur, f, sigma=sigma,
                                              angle=angle))(chains, fact)
    delta = jax.vmap(lambda o, w: jnp.max(jnp.abs(o.tmp - w.tmp)))(chains,
                                                                   new)
    def sel(a, b):
        m = advance.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(m, b, a)
    return jax.tree.map(sel, chains, new), delta


@dataclass
class _ModelStream:
    """One restraint model's sampler state inside the combined loop."""
    tag: str                     # "NMR" / "Xray" / "" (single-model)
    npz_dir: str                 # its tmp_npz subdirectory
    pdb_dir: str                 # its pred_pdb subdirectory
    hist: GeomHistograms         # initial (predicted) histograms
    begin: Optional[int] = None  # known begin_num; None = after prev stream


def _generate_chains_multi(pdb_name: str, streams, seq: str,
                           cfg: DynamicsConfig, key: jax.Array,
                           trace: Optional[TraceWriter] = None) -> list:
    """K-chain batched sampler over one or more restraint models AT ONCE.

    The TPU redesign of the reference's sequential pipeline: instead of one
    decoy per device program per model (run_inference.py:97-139) run
    len(streams) * n_chains independent dampening chains as ONE batched
    fold per step (each lane with its own restraint tables), and overlap
    all file IO with the next step's device work.

    The chain state (dampened histograms) is DEVICE-RESIDENT for the whole
    run: each step is fold (fold_chains_pool — restraint tables built on
    device from the histograms, physics/tablegen.py) -> measure+dampen
    (_chain_update_batch) with no host round trip. The host sees only the
    per-step convergence deltas/energies and the decoys; the tmp_npz
    resume contract is written asynchronously from device snapshots.

    File contracts per stream match the serial sampler (initial{i}.pdb,
    <name>{k}.pdb, tmp_npz <name>{k}.npz with k continuing across
    streams). Streams whose begin index depends on an unfinished earlier
    stream write under provisional names and are renamed once the earlier
    stream's final count is known — byte-identical final layout to the
    reference's serial NMR-then-Xray ordering (run_inference.py:334-339).

    Returns the list of final produced indices per stream (begin + count).
    """
    trace = trace or TraceWriter(None)
    M = len(streams)
    K = cfg.n_chains
    N = cfg.init_num
    C = M * K
    L_true = len(seq)
    pad_to = None
    if cfg.len_bucket:
        pad_to = -(-L_true // cfg.len_bucket) * cfg.len_bucket
    padded = pad_to is not None and pad_to > L_true
    seq_fold = seq + "A" * (pad_to - L_true) if padded else seq
    res_mask = jnp.arange(len(seq_fold)) < L_true if padded else None
    for s in streams:
        os.makedirs(s.npz_dir, exist_ok=True)
        os.makedirs(s.pdb_dir, exist_ok=True)
        # stale provisional files from an interrupted earlier run must not
        # survive into this run's rename pass
        for d in (s.npz_dir, s.pdb_dir):
            for f in os.listdir(d):
                if f.startswith(".tmp_s"):
                    os.remove(os.path.join(d, f))
    io = _AsyncIO()

    def _pad_hist(h: GeomHistograms) -> GeomHistograms:
        # pad ONCE at load; the whole run (fold, measure, dampen) works at
        # the padded length — zero histograms never activate restraints and
        # stay zero through dampening, res_mask zeroes every physics term
        if not padded:
            return h
        p = pad_to - L_true
        return GeomHistograms(*[
            jnp.asarray(np.pad(np.asarray(v), [(0, p), (0, p), (0, 0)]))
            for v in h])

    if cfg.emit_full_atom:
        from trx2dy.io.pdbio import write_pdb_atom14
        from trx2dy.physics.sidechain import pack_ensemble

    def write_decoys(fr, lanes, paths):
        """Write the decoys of the given lanes; sidechain packing (when
        full-atom output is on) runs ONLY over the written lanes.

        fr carries PADDED-length tensors (length bucketing); everything
        here slices back to the true length at the host boundary.

        Packing runs in fixed-size batches of PACK_CHUNK lanes (last batch
        padded by repetition) so the initial emit (M*N lanes) and every
        chain step (however many lanes its budget writes) share ONE
        compiled pack executable per process — each distinct batch shape
        would otherwise trace + load its own copy over the TPU tunnel."""
        if cfg.emit_full_atom:
            from trx2dy.physics.sidechain import detect_disulfides
            t_np = np.asarray(fr.torsions)[:, :, :L_true]
            bb_np = {k: np.asarray(v)[:, :L_true]
                     for k, v in fr.atoms.items()}
            # one disulfide pairing for the whole written set (ensemble-mean
            # CB, pack_ensemble's own rule) — per-chunk detection could
            # disagree across chunks of one ensemble
            pairs = detect_disulfides(bb_np["CB"][lanes].mean(0), seq)
            for c0 in range(0, len(lanes), PACK_CHUNK):
                sub = list(lanes[c0:c0 + PACK_CHUNK])
                sub_paths = paths[c0:c0 + PACK_CHUNK]
                n_real = len(sub)
                pad = sub + [sub[0]] * (PACK_CHUNK - n_real)
                xyz14, mask14, _ = pack_ensemble(
                    jnp.asarray(t_np[pad]), seq, pairs=pairs,
                    backbone={k: jnp.asarray(v[pad])
                              for k, v in bb_np.items()})
                xyz14 = np.asarray(xyz14)
                mask14 = np.asarray(mask14)
                for j, path in enumerate(sub_paths):
                    io.submit(write_pdb_atom14, path, seq, xyz14[j], mask14)
        else:
            atoms_np = {a: np.asarray(v)[:, :L_true]
                        for a, v in fr.atoms.items()}
            for j, (lane, path) in enumerate(zip(lanes, paths)):
                io.submit(write_pdb_backbone, path, seq,
                          {a: v[lane] for a, v in atoms_np.items()})

    # ---- device-resident chain state ------------------------------------
    # chain (i, k) lives at pool row i*K + k; at init every chain of stream
    # i holds the stream's predicted histograms, so the initial ensembles
    # fold from lane_map entries pointing at row i*K
    chains = _stack_hists([_pad_hist(s.hist)
                           for s in streams for _ in range(K)])

    def pool_dict():
        return {f: getattr(chains, f)
                for f in ("dist", "omega", "theta", "phi")}

    # ---- initial ensembles: ONE chains-path fold for all streams --------
    # The lane_bucket makes this call reuse the SAME compiled stage-program
    # shapes as every chain step below, so the whole pipeline traces +
    # loads ONE program family per process (the separate fold_ensemble
    # family previously cost ~180 s of jit tracing + executable loads over
    # the remote-TPU tunnel before the first decoy came back).
    # pair-bucket ratchet: ONE compiled shape per fold program across all
    # dampening steps (mask drift otherwise recompiles minutes per step)
    floors: dict = {}
    from trx2dy.physics.folder import (
        FoldResult, fold_chains_pool, _bucket_size,
    )
    n_init = int(np.ceil(N * (1.0 + cfg.oversample)))
    cand = cfg.chain_candidates
    lane_bucket = _bucket_size(max(M * n_init, C * cand))
    if cfg.fill_candidates and lane_bucket // C > cand:
        # chain steps would otherwise fold inert padding lanes up to the
        # bucket — spend them as extra best-of candidates instead
        cand = lane_bucket // C
    t0 = time.perf_counter()
    key, k_init = jax.random.split(key)
    init_map = [i * K for i in range(M) for _ in range(n_init)]
    tm_fold: dict = {}
    fr_all = fold_chains_pool(pool_dict(), init_map, seq_fold, k_init,
                              mode=cfg.mode, use_orient=cfg.angle,
                              fastrelax=cfg.fastrelax,
                              max_iter=cfg.max_iter, candidates=1,
                              bucket_floors=floors, res_mask=res_mask,
                              lane_bucket=lane_bucket, timings=tm_fold,
                              **cfg.fold_kwargs)
    # per-stream energy gating (fold_ensemble's oversample semantics):
    # keep each stream's N lowest-energy lanes, in energy order
    e_all = np.asarray(fr_all.energy)
    keep = np.concatenate([
        i * n_init + np.argsort(e_all[i * n_init:(i + 1) * n_init])[:N]
        for i in range(M)])
    keep_dev = jnp.asarray(keep)
    fr = FoldResult(
        torsions=fr_all.torsions[keep_dev],
        energy=fr_all.energy[keep_dev],
        atoms={k: v[keep_dev] for k, v in fr_all.atoms.items()})
    jax.block_until_ready(fr.atoms["CA"])
    t_fold = time.perf_counter() - t0
    init_lanes = list(range(M * N))
    init_paths = [os.path.join(streams[i].pdb_dir, f"initial{j}.pdb")
                  for i in range(M) for j in range(N)]
    t0 = time.perf_counter()
    write_decoys(fr, init_lanes, init_paths)
    trace.write(kind="phase", step="initial", t_fold=round(t_fold, 3),
                t_emit=round(time.perf_counter() - t0, 3), **tm_fold)
    scores = np.asarray(
        jax.vmap(reliability_score)(fr.torsions[:, :, :L_true]))
    e_np = np.asarray(fr.energy)

    # chain (i, k) seeds from stream i's k-th most reliable initial decoy
    seed_lanes = []
    for i, s in enumerate(streams):
        order = np.argsort(scores[i * N:(i + 1) * N])[::-1][:K]
        for j in range(N):
            trace.write(decoy=f"initial{j}", kind="initial", model=s.tag,
                        energy=float(e_np[i * N + j]),
                        reliability=float(scores[i * N + j]),
                        selected_seed=bool(j in order))
        seed_lanes += [i * N + int(order[k % len(order)]) for k in range(K)]
    seed_dev = jnp.asarray(np.asarray(seed_lanes))

    a = fr.atoms
    chains, _ = _chain_update_batch(
        chains, jnp.take(a["N"], seed_dev, axis=0),
        jnp.take(a["CA"], seed_dev, axis=0),
        jnp.take(a["C"], seed_dev, axis=0),
        jnp.take(a["CB"], seed_dev, axis=0),
        jnp.ones((C,), bool), cfg.sigma, cfg.angle)

    # begin indices: stream 0 is known now; later streams resolve when the
    # previous stream's final count is known (reference begin_num chaining)
    begins: list = [s.begin for s in streams]
    if begins[0] is None:
        begins[0] = 0
    produced = [0] * M
    active = np.ones((M, K), bool)
    renames: list = []           # (provisional_path, stream, k_index)

    def npz_name(i: int, k: int) -> str:
        if begins[i] is not None:
            return os.path.join(streams[i].npz_dir,
                                f"{pdb_name}{begins[i] + k}.npz")
        path = os.path.join(streams[i].npz_dir, f".tmp_s{i}_{k}.npz")
        renames.append((path, i, k, ".npz"))
        return path

    def pdb_name_for(i: int, k: int) -> str:
        if begins[i] is not None:
            return os.path.join(streams[i].pdb_dir,
                                f"{pdb_name}{begins[i] + k}.pdb")
        path = os.path.join(streams[i].pdb_dir, f".tmp_s{i}_{k}.pdb")
        renames.append((path, i, k, ".pdb"))
        return path

    def save_hist_npz(path, chains_snapshot, c):
        # exact reference key set (tmp_npz layout is a parity surface);
        # chain provenance lives in traces.jsonl instead. Runs on the IO
        # pool: the device->host transfer of this chain's histograms
        # overlaps the next step's fold instead of serializing with it
        # (the snapshot pins the step's device buffers until written).
        arrs = {}
        for f in GeomHistograms._fields:
            a = np.asarray(getattr(chains_snapshot, f)[c])
            arrs[f] = a[:L_true, :L_true] if padded else a
        np.savez_compressed(path, **arrs)

    for i in range(M):
        io.submit(save_hist_npz, npz_name(i, 1), chains, i * K)

    # ---- the batched sampling loop -------------------------------------
    try:
        while True:
            io.check()           # surface write failures after ONE step
            writing = np.zeros((M, K), bool)
            budget = [cfg.Nmax - produced[i] for i in range(M)]
            for i in range(M):
                act = np.where(active[i])[0]
                writing[i, act[:max(0, budget[i])]] = True
            if not writing.any():
                break
            key, k_it = jax.random.split(key)
            t0 = time.perf_counter()
            tm_fold = {}
            fr = fold_chains_pool(pool_dict(), np.arange(C), seq_fold,
                                  k_it, mode=cfg.mode,
                                  use_orient=cfg.angle,
                                  fastrelax=cfg.fastrelax,
                                  max_iter=cfg.max_iter,
                                  candidates=cand,
                                  bucket_floors=floors, res_mask=res_mask,
                                  lane_bucket=lane_bucket, timings=tm_fold,
                                  growth_buckets=True,
                                  **cfg.fold_kwargs)
            jax.block_until_ready(fr.atoms["CA"])
            t_fold = time.perf_counter() - t0

            lanes, paths, rows = [], [], []
            for i in range(M):
                for k in range(K):
                    if not writing[i, k]:
                        continue
                    produced[i] += 1
                    lanes.append(i * K + k)
                    paths.append(pdb_name_for(i, produced[i]))
                    rows.append((i, k, produced[i]))
            t0 = time.perf_counter()
            write_decoys(fr, lanes, paths)
            t_emit = time.perf_counter() - t0

            t0 = time.perf_counter()
            a = fr.atoms
            adv = np.zeros((C,), bool)
            adv[lanes] = True
            chains, delta = _chain_update_batch(
                chains, a["N"], a["CA"], a["C"], a["CB"],
                jnp.asarray(adv), cfg.sigma, cfg.angle)
            delta_np = np.asarray(delta)       # (C,) — the only per-step
            e_np = np.asarray(fr.energy)       # host pulls besides decoys
            trace.write(kind="phase", step=max(produced),
                        t_fold=round(t_fold, 3), t_emit=round(t_emit, 3),
                        t_measure=round(time.perf_counter() - t0, 3),
                        **tm_fold)
            for (i, k, num) in rows:
                c = i * K + k
                if num < cfg.Nmax:
                    # sequential parity: generate_ensemble breaks at Nmax
                    # BEFORE saving, so the resume tree ends at index Nmax
                    # — don't save a trailing Nmax+1 state here either
                    io.submit(save_hist_npz, npz_name(i, num + 1),
                              chains, c)
                trace.write(decoy=f"{pdb_name}{num}", kind="chain",
                            model=streams[i].tag, chain=k,
                            energy=float(e_np[c]), delta=float(delta_np[c]))
                if delta_np[c] < CONVERGE_TOL:
                    active[i, k] = False

    except Exception:
        io.close(raise_errors=False)  # keep the loop's error
        raise
    t0 = time.perf_counter()
    io.close()
    trace.write(kind="phase", step="io_drain",
                t_io=round(time.perf_counter() - t0, 3))

    # resolve provisional names now that every stream's count is known
    for i in range(1, M):
        if begins[i] is None:
            begins[i] = begins[i - 1] + produced[i - 1]
    for path, i, k, ext in renames:
        final = os.path.join(os.path.dirname(path),
                             f"{pdb_name}{begins[i] + k}{ext}")
        if os.path.exists(path):
            os.replace(path, final)
    return [begins[i] + produced[i] for i in range(M)]


def _generate_ensemble_chains(pdb_name, processed_npz_dir, pred_pdb_dir,
                              initial_npz, seq, cfg: DynamicsConfig,
                              key: jax.Array, begin_num: int = 0,
                              trace: Optional[TraceWriter] = None) -> int:
    """K-chain batched variant of the iterative sampler (single model)."""
    if isinstance(initial_npz, (str, os.PathLike)):
        initial_npz = dict(np.load(initial_npz))
    stream = _ModelStream(tag="", npz_dir=processed_npz_dir,
                          pdb_dir=pred_pdb_dir,
                          hist=histograms_from_npz(initial_npz),
                          begin=begin_num)
    return _generate_chains_multi(pdb_name, [stream], seq, cfg, key,
                                  trace)[0]
