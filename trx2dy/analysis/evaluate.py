"""Ensemble evaluation vs native structures — evaluate.py equivalent.

The reference spawns one ./bin/TMscore subprocess per (native, prediction)
pair and regex-parses stdout (utils_trX2dy/evaluate_utils.py:33-100). Here
the all-vs-all TM/RMSD matrix is computed in-process with the vmapped
JAX TM-score engine (trx2dy.analysis.tmscore) — one device program per
native instead of O(N_nat x N_pred) process spawns.

summary.txt format is byte-compatible with the reference
(evaluate_utils.py:70-100; golden example example/output/seq/summary.txt):

  <native> best_RMSD: <r> model: <pred> best_TM_score: <t> model: <pred>
  ...
  Mean RMSD: <r2>     # mean over per-native best RMSDs, 2 decimals
  Mean TM-score: <t2>
  Min RMSD: <r2>
  Max TM-score: <t2>
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.io.pdbio import read_pdb_backbone
from trx2dy.analysis.tmscore import tm_score_pair, align_common


def _load_cas(pdb_dir: str) -> Dict[str, Tuple[np.ndarray, str, list]]:
    out = {}
    for fn in sorted(os.listdir(pdb_dir)):
        if not fn.endswith(".pdb"):
            continue
        coords, seq, resseq = read_pdb_backbone(
            os.path.join(pdb_dir, fn), return_resseq=True)
        out[fn] = (coords["CA"], seq, resseq)
    return out


def score_all(native_dir: str, pred_dir: str, align: bool = False):
    """All (native, pred) TM-scores/RMSDs.

    Returns dict native_name -> list of (pred_name, tm, rmsd). TM-score is
    normalized by the native (first-argument) length, matching the reference
    invocation `TMscore native pred` where Structure1 = native. Residues are
    matched by residue number (TMscore default) unless align=True, which
    switches to sequence alignment (`-seq`, evaluate_utils.py:57-60).
    """
    natives = _load_cas(native_dir)
    preds = _load_cas(pred_dir)
    results: Dict[str, List[Tuple[str, float, float]]] = {}
    for nat_name, (nat_ca, nat_seq, nat_res) in natives.items():
        rows = []
        # bucket preds by aligned length so each bucket is one vmapped call
        buckets: Dict[int, list] = {}
        for pred_name, (pred_ca, pred_seq, pred_res) in preds.items():
            ia, ib = align_common(nat_seq, pred_seq, nat_res, pred_res,
                                  align=align)
            ok = ~(np.isnan(nat_ca[ia]).any(-1) | np.isnan(pred_ca[ib]).any(-1))
            # bucket key includes the pred's full length: TMscore normalizes
            # by the full length of its second structure (= the prediction,
            # given the reference's `TMscore native pred` arg order), not by
            # the aligned-residue count.
            buckets.setdefault((int(ok.sum()), len(pred_seq)), []).append(
                (pred_name, nat_ca[ia][ok], pred_ca[ib][ok]))
        for (L, l_norm), items in buckets.items():
            if L < 4:
                continue
            nat_stack = jnp.asarray(
                np.stack([n for _, n, _ in items]), jnp.float32)
            pred_stack = jnp.asarray(
                np.stack([p for _, _, p in items]), jnp.float32)
            r = jax.vmap(lambda p, n: tm_score_pair(p, n, l_norm=l_norm))(
                pred_stack, nat_stack)
            for (pred_name, _, _), tm, rmsd in zip(
                    items, np.asarray(r.tm), np.asarray(r.rmsd)):
                rows.append((pred_name, float(tm), float(rmsd)))
        results[nat_name] = rows
    return results


def run_score(native_pdb_dir: str, pred_pdb_dir: str, align: bool = False,
              save_summary: bool = False, save_dir: str | None = None):
    """Reference run_score: per-native best models + ensemble statistics.

    Returns (min_rmsd, max_tmscore, mean_rmsd, mean_tmscore) where the means
    are over the per-native BEST values (evaluate_utils.py:84-92).
    """
    results = score_all(native_pdb_dir, pred_pdb_dir, align=align)
    lines = []
    best_rmsds, best_tms = [], []
    for nat_name, rows in results.items():
        if not rows:
            continue
        best_r = min(rows, key=lambda t: t[2])
        best_t = max(rows, key=lambda t: t[1])
        stem = lambda s: s.split("/")[-1].split(".")[0]
        lines.append(
            f"{stem(nat_name)} best_RMSD: {round(best_r[2], 3)} model: "
            f"{stem(best_r[0])} best_TM_score: {round(best_t[1], 4)} model: "
            f"{stem(best_t[0])}\n")
        best_rmsds.append(best_r[2])
        best_tms.append(best_t[1])
    if not best_rmsds:
        return None, None, None, None
    mean_rmsd = float(np.mean(best_rmsds))
    mean_tm = float(np.mean(best_tms))
    min_rmsd = float(np.min(best_rmsds))
    max_tm = float(np.max(best_tms))
    lines.append(f"Mean RMSD: {round(mean_rmsd, 2)}\n")
    lines.append(f"Mean TM-score: {round(mean_tm, 2)}\n")
    lines.append(f"Min RMSD: {round(min_rmsd, 2)}\n")
    lines.append(f"Max TM-score: {round(max_tm, 2)}\n")
    if save_summary:
        out_dir = save_dir or pred_pdb_dir
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "summary.txt"), "w") as f:
            f.write("".join(lines))
    return min_rmsd, max_tm, mean_rmsd, mean_tm
