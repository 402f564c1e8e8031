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

import os
import re
import shutil
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
    n_chains: int = 1
    # full-atom decoy output (sidechain packing). None = follow fastrelax,
    # mirroring the reference: FastRelax switches to fa_standard and dumps
    # full-atom PDBs (folding.py:220,273); without relax the pose stays
    # centroid (backbone + CB).
    full_atom: Optional[bool] = None
    # energy-gated decoy selection (TPU redesign, not in the reference):
    # oversample folds ceil(N*(1+x)) lanes and keeps the N lowest-energy;
    # chain_candidates folds that many lanes per dampening chain and keeps
    # the best. Culls the ~15-20% trapped-topology minimizations whose final
    # energy sits far above the good band (corr(E, TM) ~ -0.95 measured).
    oversample: float = 0.25
    chain_candidates: int = 2
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
        pack_and_write(out_paths, seq, res.torsions)
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
    if cfg.n_chains > 1:
        return _generate_ensemble_chains(pdb_name, processed_npz_dir,
                                         pred_pdb_dir, initial_npz, seq,
                                         cfg, key, begin_num, trace)
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
        if not fn.lower().endswith(".pdb"):
            continue
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
        num = generate_ensemble(name, os.path.join(npz_tmp_dir, "NMR"),
                                os.path.join(save_pdb_dir, "NMR"), n1, seq,
                                cfg, key1, trace=trace)
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


def _generate_ensemble_chains(pdb_name, processed_npz_dir, pred_pdb_dir,
                              initial_npz, seq, cfg: DynamicsConfig,
                              key: jax.Array, begin_num: int = 0,
                              trace: Optional[TraceWriter] = None) -> int:
    """K-chain batched variant of the iterative sampler."""
    from trx2dy.physics.folder import fold_chains

    trace = trace or TraceWriter(None)

    os.makedirs(processed_npz_dir, exist_ok=True)
    os.makedirs(pred_pdb_dir, exist_ok=True)
    if isinstance(initial_npz, (str, os.PathLike)):
        initial_npz = dict(np.load(initial_npz))
    hist0 = histograms_from_npz(initial_npz)
    K = cfg.n_chains

    N = cfg.init_num
    init_paths = [os.path.join(pred_pdb_dir, f"initial{i}.pdb")
                  for i in range(N)]
    key, k_init = jax.random.split(key)
    res = _fold_and_write(hist0, seq, k_init, N, init_paths, cfg)
    scores = np.asarray(jax.vmap(reliability_score)(res.torsions))
    seed_order = np.argsort(scores)[::-1][:K]
    e_np = np.asarray(res.energy)
    for i in range(N):
        trace.write(decoy=f"initial{i}", kind="initial",
                    energy=float(e_np[i]), reliability=float(scores[i]),
                    selected_seed=bool(i in seed_order))

    # chain k seeds from the k-th most reliable initial decoy
    chains = []
    for k in range(K):
        fact = _measure(res, int(seed_order[k % len(seed_order)]))
        chains.append(dampen_step(hist0, fact, sigma=cfg.sigma,
                                  angle=cfg.angle))
    old_tmps = list(chains)
    active = np.ones(K, bool)

    produced = begin_num
    npz_pattern = os.path.join(processed_npz_dir, pdb_name + "{k}.npz")
    np.savez_compressed(npz_pattern.format(k=begin_num + 1),
                        **histograms_to_npz(chains[0]))

    while active.any() and produced - begin_num < cfg.Nmax:
        key, k_it = jax.random.split(key)
        npzs = [{"dist": h.dist, "omega": h.omega, "theta": h.theta,
                 "phi": h.phi} for h in chains]
        fr = fold_chains(npzs, seq, k_it, mode=cfg.mode,
                         use_orient=cfg.angle, fastrelax=cfg.fastrelax,
                         max_iter=cfg.max_iter,
                         candidates=cfg.chain_candidates)
        atoms_np = {a: np.asarray(v) for a, v in fr.atoms.items()}
        if cfg.emit_full_atom:
            from trx2dy.io.pdbio import write_pdb_atom14
            from trx2dy.physics.sidechain import pack_ensemble
            xyz14, mask14, _ = pack_ensemble(fr.torsions, seq)
            xyz14, mask14 = np.asarray(xyz14), np.asarray(mask14)
        for k in range(K):
            if not active[k] or produced - begin_num >= cfg.Nmax:
                continue
            produced += 1
            pdb_path = os.path.join(pred_pdb_dir,
                                    f"{pdb_name}{produced}.pdb")
            if cfg.emit_full_atom:
                write_pdb_atom14(pdb_path, seq, xyz14[k], mask14)
            else:
                write_pdb_backbone(
                    pdb_path, seq, {a: v[k] for a, v in atoms_np.items()})
            fact = measure_decoy(fr.atoms["N"][k], fr.atoms["CA"][k],
                                 fr.atoms["C"][k], fr.atoms["CB"][k])
            new_hist = dampen_step(chains[k], fact, sigma=cfg.sigma,
                                   angle=cfg.angle)
            np.savez_compressed(npz_pattern.format(k=produced + 1),
                                **histograms_to_npz(new_hist))
            delta = convergence_delta(old_tmps[k], new_hist)
            trace.write(decoy=f"{pdb_name}{produced}", kind="chain",
                        chain=k, energy=float(np.asarray(fr.energy)[k]),
                        delta=float(delta))
            if delta < CONVERGE_TOL:
                active[k] = False
            chains[k] = new_hist
            old_tmps[k] = new_hist
    return produced
