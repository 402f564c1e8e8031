"""TM-score / RMSD engine — replacement for the reference's bin/TMscore.

The reference shells out to the Zhang-lab TMscore C++ binary and regex-parses
its stdout (utils_trX2dy/utils.py:514-523, evaluate_utils.py:56-66). Here the
same quantities are computed in-process with JAX so all-vs-all matrices
vmap/jit onto the TPU:

  * Kabsch optimal superposition (SVD),
  * TM-score via the standard iterative-extension search: seed fragments of
    length L, L/2, L/4, ... >= 4 at every offset, superimpose, then refine by
    re-superimposing on the subset of residues within a distance cutoff until
    the subset fixes (Zhang & Skolnick, Proteins 2004),
  * d0 = 1.24 (Ltarget - 15)^(1/3) - 1.8 (clamped at 0.5),
  * 'RMSD of the common residues' = plain Kabsch RMSD over aligned CAs.

Sequence-independent alignment (TMalign) is NOT implemented; like the
reference's default TMscore invocation, residues are matched by index — both
chains must be the same protein (the evaluate.py use case).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class TMResult(NamedTuple):
    tm: jnp.ndarray      # () TM-score (normalized by reference length)
    rmsd: jnp.ndarray    # () Kabsch RMSD over all common residues
    gdt_ts: jnp.ndarray  # () GDT-TS (1,2,4,8 A thresholds)
    gdt_ha: jnp.ndarray  # () GDT-HA (0.5,1,2,4 A)


def kabsch(P: jnp.ndarray, Q: jnp.ndarray, weights=None):
    """Optimal rotation/translation superposing P onto Q (both (L, 3)).

    Returns (R, t) with R @ p + t ~ q, least-squares optimal (weighted).
    """
    if weights is None:
        weights = jnp.ones(P.shape[0], P.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    pc = jnp.sum(P * w[:, None], axis=0)
    qc = jnp.sum(Q * w[:, None], axis=0)
    P0, Q0 = P - pc, Q - qc
    H = (P0 * w[:, None]).T @ Q0
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], P.dtype)).at[2, 2].set(det)
    R = Vt.T @ S @ U.T
    t = qc - R @ pc
    return R, t


def kabsch_rmsd(P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    R, t = kabsch(P, Q)
    d = P @ R.T + t - Q
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))


def tm_d0(L: int) -> float:
    """TM-score normalization distance (Zhang & Skolnick 2004)."""
    if L > 15:
        return max(1.24 * (L - 15.0) ** (1.0 / 3.0) - 1.8, 0.5)
    return 0.5


def _superpose_score(P, Q, sel, d0):
    """Superimpose P onto Q using weighted subset sel, score ALL residues.

    Returns (tm_contrib per residue, distances)."""
    R, t = kabsch(P, Q, weights=sel)
    d = jnp.linalg.norm(P @ R.T + t - Q, axis=-1)
    return 1.0 / (1.0 + (d / d0) ** 2), d


@functools.partial(jax.jit, static_argnames=("n_iter", "l_norm"))
def tm_score_pair(pred_ca: jnp.ndarray, native_ca: jnp.ndarray,
                  n_iter: int = 20, l_norm: int | None = None) -> TMResult:
    """TM-score of a predicted CA trace vs a native one (index-aligned).

    Args:
      pred_ca / native_ca: (L, 3) common (aligned) residues.
      l_norm: normalization length. The TMscore binary sets d0 from — and
        divides the contribution sum by — the FULL length of its second
        structure, even when fewer residues align (gapped chains). Defaults
        to L (equal-length chains: identical behavior).

    Implements the fragment-seeded iterative search: for every seed fragment
    (lengths L, L/2, L/4, ... >= 4, all offsets) superimpose on the seed,
    then alternate [select residues with d < cutoff] / [re-superimpose on
    selection] for n_iter rounds with the TMscore cutoff schedule; keep the
    best score over all seeds.
    """
    L = pred_ca.shape[0]
    if l_norm is None:
        l_norm = L
    d0 = tm_d0(l_norm)
    norm = L / float(l_norm)   # rescale mean-over-L scores to sum/l_norm
    # cutoff schedule: d8 = sqrt-ish growth, as in TMscore (d < d0 + step)
    frag_lens = []
    fl = L
    while fl >= 4:
        frag_lens.append(fl)
        fl //= 2
    seeds = []
    for fl in frag_lens:
        for off in range(0, L - fl + 1, max(1, fl // 2)):
            m = np.zeros(L, np.float32)
            m[off:off + fl] = 1.0
            seeds.append(m)
    seed_masks = jnp.asarray(np.stack(seeds))            # (S, L)

    def refine(seed):
        def step(carry, cutoff):
            sel, best = carry
            contrib, d = _superpose_score(pred_ca, native_ca, sel, d0)
            score = jnp.mean(contrib)
            new_sel = (d < cutoff).astype(pred_ca.dtype)
            # keep >= 4 residues selected: fall back to previous selection
            new_sel = jnp.where(jnp.sum(new_sel) >= 4, new_sel, sel)
            return (new_sel, jnp.maximum(best, score)), None

        cutoffs = jnp.asarray(
            np.concatenate([np.full(n_iter // 2, d0 + 1.0),
                            np.full(n_iter - n_iter // 2, d0 + 2.5)]),
            pred_ca.dtype)
        (sel, best), _ = jax.lax.scan(step, (seed, jnp.asarray(0.0, pred_ca.dtype)),
                                      cutoffs)
        contrib, _ = _superpose_score(pred_ca, native_ca, sel, d0)
        return jnp.maximum(best, jnp.mean(contrib))

    tms = jax.vmap(refine)(seed_masks)
    tm = jnp.max(tms) * norm

    R, t = kabsch(pred_ca, native_ca)
    d = jnp.linalg.norm(pred_ca @ R.T + t - native_ca, axis=-1)
    rmsd = jnp.sqrt(jnp.mean(d * d))

    # GDT from the best final superpositions (approximate: use best TM frame)
    def gdt_from(seed):
        _, dd = _superpose_score(pred_ca, native_ca, seed, d0)
        return dd
    dists = jax.vmap(gdt_from)(seed_masks)               # (S, L)
    frac = lambda thr: jnp.max(jnp.mean(dists < thr, axis=-1))
    gdt_ts = (frac(1.0) + frac(2.0) + frac(4.0) + frac(8.0)) / 4.0
    gdt_ha = (frac(0.5) + frac(1.0) + frac(2.0) + frac(4.0)) / 4.0
    return TMResult(tm=tm, rmsd=rmsd, gdt_ts=gdt_ts, gdt_ha=gdt_ha)


def tm_score_batch(pred_cas: jnp.ndarray, native_ca: jnp.ndarray) -> TMResult:
    """vmapped TM-score of (B, L, 3) predictions vs one (L, 3) native."""
    return jax.vmap(lambda p: tm_score_pair(p, native_ca))(pred_cas)


def nw_align(seq_a: str, seq_b: str, match: float = 1.0,
             mismatch: float = 0.0, gap: float = -1.0):
    """Needleman-Wunsch global alignment; returns aligned index pairs.

    Scoring mirrors the TMscore binary's `-seq` mode (NWDP on sequences:
    identity match=1, mismatch=0, gap=-1 — the behavior the reference opts
    into via evaluate_utils.py:57-60). Host-side numpy DP; O(len_a*len_b).
    Returns (idx_a, idx_b) of the non-gap aligned columns.
    """
    a = np.frombuffer(seq_a.encode(), np.uint8)
    b = np.frombuffer(seq_b.encode(), np.uint8)
    n, m = len(a), len(b)
    score = np.zeros((n + 1, m + 1), np.float32)
    ptr = np.zeros((n + 1, m + 1), np.int8)      # 0=diag 1=up(gap b) 2=left
    score[:, 0] = gap * np.arange(n + 1)
    score[0, :] = gap * np.arange(m + 1)
    ptr[1:, 0] = 1
    ptr[0, 1:] = 2
    sub = np.where(a[:, None] == b[None, :], match, mismatch).astype(np.float32)
    for i in range(1, n + 1):
        diag = score[i - 1, :-1] + sub[i - 1]
        up = score[i - 1, 1:] + gap
        row = score[i]
        for j in range(1, m + 1):
            left = row[j - 1] + gap
            best = diag[j - 1]
            p = 0
            if up[j - 1] > best:
                best, p = up[j - 1], 1
            if left > best:
                best, p = left, 2
            row[j] = best
            ptr[i, j] = p
    ia, ib = [], []
    i, j = n, m
    while i > 0 or j > 0:
        p = ptr[i, j]
        if p == 0:
            i -= 1
            j -= 1
            ia.append(i)
            ib.append(j)
        elif p == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(ia[::-1], np.int64), np.asarray(ib[::-1], np.int64)


def align_by_resseq(res_a, res_b):
    """Match residues by residue number + insertion code (TMscore default).

    res_a/res_b: lists of residue-id strings (from
    read_pdb_backbone(..., return_resseq=True)). Returns (idx_a, idx_b) of
    residues present in both, in chain-a order. Duplicated ids keep the
    first occurrence (matching first-model/altloc-A reader semantics).
    """
    pos_b = {}
    for j, r in enumerate(res_b):
        pos_b.setdefault(r, j)
    ia, ib = [], []
    seen = set()
    for i, r in enumerate(res_a):
        if r in pos_b and r not in seen:
            seen.add(r)
            ia.append(i)
            ib.append(pos_b[r])
    return np.asarray(ia, np.int64), np.asarray(ib, np.int64)


def align_common(seq_a: str, seq_b: str, res_a=None, res_b=None,
                 align: bool = False):
    """Index maps of the common residues of two same-protein chains.

    Mirrors the TMscore binary's matching rules (the reference subprocesses
    it, evaluate_utils.py:56-66):
      * align=True  -> sequence alignment (`-seq` flag): Needleman-Wunsch.
      * default     -> match by residue number when both chains provide
        residue ids (res_a/res_b), exactly like TMscore's default mode.
      * without residue ids: identity / exact-subsequence anchoring for the
        common same-protein cases, Needleman-Wunsch otherwise (never the old
        silent truncation).
    Returns (idx_a, idx_b) numpy arrays.
    """
    if align:
        return nw_align(seq_a, seq_b)
    if res_a is not None and res_b is not None:
        return align_by_resseq(res_a, res_b)
    if seq_a == seq_b:
        idx = np.arange(len(seq_a))
        return idx, idx
    if seq_b in seq_a:
        off = seq_a.index(seq_b)
        return np.arange(off, off + len(seq_b)), np.arange(len(seq_b))
    if seq_a in seq_b:
        off = seq_b.index(seq_a)
        return np.arange(len(seq_a)), np.arange(off, off + len(seq_a))
    return nw_align(seq_a, seq_b)
