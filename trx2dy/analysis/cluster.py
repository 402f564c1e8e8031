"""Ensemble clustering — cluster.py equivalent (glocon / tmscore / rmsd).

Reference: utils_trX2dy/utils.py:526-616. The glocon metric between two
decoys is the mean thresholded distance-map difference over the upper
triangle:

  score(a, b) = sum(triu(|D_a - D_b| where > 3 else 0)) / (L(L-1)/2)

computed here as one vectorized JAX program over the whole (N, N) decoy-pair
grid instead of a python double loop + BioPython re-parsing per decoy.
KMeans(n_init=10, random_state=0) on the matrix rows matches the reference's
sklearn call exactly (sklearn is available; a numpy fallback guards minimal
images).
"""
from __future__ import annotations

import itertools
import os
import shutil
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.io.pdbio import read_pdb_backbone
from trx2dy.geometry.transforms import geometry_maps_6d
from trx2dy.analysis.tmscore import tm_score_pair, align_common


def decoy_dist_maps(pdb_dir: str):
    """(N, L, L) contact-masked CB distance maps of every decoy in a dir.

    Uses the same 20 A cutoff + real-CB convention as the reference's
    get_neighbors (utils.py:125-182)."""
    files = [f for f in os.listdir(pdb_dir) if f.endswith(".pdb")]
    maps, kept = [], []
    for fn in files:
        coords, seq = read_pdb_backbone(os.path.join(pdb_dir, fn))
        n, ca, c = (jnp.asarray(coords[k], jnp.float32)
                    for k in ("N", "CA", "C"))
        cb = np.where(np.isnan(coords["CB"]).any(-1, keepdims=True),
                      np.nan, coords["CB"])
        # real CB where present (non-GLY), virtual otherwise
        from trx2dy.geometry.transforms import virtual_cb
        vcb = np.asarray(virtual_cb(n, ca, c))
        cb = np.where(np.isnan(cb), vcb, cb)
        m = geometry_maps_6d(n, ca, c, cb=jnp.asarray(cb, jnp.float32),
                             dmax=20.0)
        maps.append(np.asarray(m["dist"]))
        kept.append(fn)
    return np.stack(maps), kept


@jax.jit
def glocon_matrix_from_maps(dists: jnp.ndarray) -> jnp.ndarray:
    """(N, N) glocon matrix from (N, L, L) distance maps."""
    N, L, _ = dists.shape
    triu = jnp.triu(jnp.ones((L, L), dists.dtype))

    def row(i):
        diff = jnp.abs(dists - dists[i])          # (N, L, L)
        diff = jnp.where(diff <= 3.0, 0.0, diff)
        return jnp.sum(diff * triu, axis=(1, 2)) / (L * (L - 1) / 2.0)

    return jax.vmap(row)(jnp.arange(N))


def tmscore_rmsd_matrices(pdb_dir: str):
    """(N, N) pairwise TM-score and RMSD matrices (utils.py:526-540).

    Same-length ensembles (the normal case — one target's decoys) go through
    the native C++ engine (trx2dy.native, ~5 ms/pair); mixed lengths fall
    back to the JAX engine pair by pair."""
    files = [f for f in os.listdir(pdb_dir) if f.endswith(".pdb")]
    cas, seqs = [], []
    for fn in files:
        coords, seq = read_pdb_backbone(os.path.join(pdb_dir, fn))
        cas.append(coords["CA"])
        seqs.append(seq)
    N = len(files)
    if N and len({len(s) for s in seqs}) == 1:
        from trx2dy import native
        res = native.tmscore_matrix(np.stack(cas))
        if res is not None:
            return res[0], res[1], files
    tm = np.zeros((N, N))
    rmsd = np.zeros((N, N))
    for i, j in itertools.combinations(range(N), 2):
        ia, ib = align_common(seqs[i], seqs[j])
        r = tm_score_pair(jnp.asarray(cas[i][ia], jnp.float32),
                          jnp.asarray(cas[j][ib], jnp.float32))
        tm[i, j] = tm[j, i] = float(r.tm)
        rmsd[i, j] = rmsd[j, i] = float(r.rmsd)
    return tm, rmsd, files


def _kmeans(matrix: np.ndarray, n_clusters: int) -> np.ndarray:
    try:
        from sklearn.cluster import KMeans
        km = KMeans(n_clusters=n_clusters, n_init=10, random_state=0)
        return km.fit(matrix).labels_
    except ImportError:    # pragma: no cover - sklearn is normally present
        rng = np.random.default_rng(0)
        best, best_inertia = None, np.inf
        for _ in range(10):
            centers = matrix[rng.choice(len(matrix), n_clusters,
                                        replace=False)]
            for _ in range(100):
                d = ((matrix[:, None] - centers[None]) ** 2).sum(-1)
                lab = d.argmin(1)
                new = np.stack([
                    matrix[lab == k].mean(0) if (lab == k).any() else centers[k]
                    for k in range(n_clusters)])
                if np.allclose(new, centers):
                    break
                centers = new
            inertia = (((matrix - centers[lab]) ** 2).sum())
            if inertia < best_inertia:
                best, best_inertia = lab, inertia
        return best


def cluster_decoys(pdb_dir: str, n_clusters: int = 10,
                   mode: str = "glocon") -> Dict[int, List[str]]:
    """Cluster a decoy directory; returns label -> file list."""
    if mode == "glocon":
        dists, files = decoy_dist_maps(pdb_dir)
        matrix = np.asarray(glocon_matrix_from_maps(jnp.asarray(dists)))
    elif mode == "tmscore":
        matrix, _, files = tmscore_rmsd_matrices(pdb_dir)
    elif mode == "rmsd":
        _, matrix, files = tmscore_rmsd_matrices(pdb_dir)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    labels = _kmeans(matrix, n_clusters)
    clusters: Dict[int, List[str]] = {}
    for fn, lab in zip(files, labels):
        clusters.setdefault(int(lab), []).append(fn)
    return clusters


def save_cluster_result(pdb_dir: str, n_clusters: int = 10, n_files: int = 5,
                        output_dir: str | None = None, mode: str = "glocon"):
    """Reference save_cluster_result (utils.py:593-616): copy the first
    n_files of each cluster into output_dir; 'no_cluster' when KMeans cannot
    run (fewer samples than clusters)."""
    output_dir = output_dir or os.path.join(pdb_dir, "clusters_result")
    os.makedirs(output_dir, exist_ok=True)
    try:
        clusters = cluster_decoys(pdb_dir, n_clusters=n_clusters, mode=mode)
    except ValueError:
        return "no_cluster"
    for _, files in clusters.items():
        for fn in files[:n_files]:
            shutil.copy(os.path.join(pdb_dir, fn), output_dir)
    return clusters
