"""Dampening kernel vs a direct port of the reference loop; a3m/pdb IO."""
import os

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from trx2dy.dynamics.dampen import (
    dampen_distribution, gaussian_smooth_bins, DampenParams)
from trx2dy.io.a3m import parse_a3m, read_fasta, seq_to_ints, ALPHABET
from trx2dy.io.pdbio import write_pdb_backbone, read_pdb_backbone

REF_EXAMPLE = "/root/reference/example"


def _reference_dampen(unprocessed, fact, norm=True, smooth=True, sigma=1.0,
                      P=0.5, pcut=0.05, decay_rate=0.5):
    """Direct numpy port of utils_trX2dy/utils.py:379-403 (0HD params)."""
    backward = forward = 0
    tmp = np.copy(unprocessed)
    processed = np.copy(unprocessed)
    mask = unprocessed.max(axis=-1) < P
    for i, j in np.argwhere(mask):
        t1 = fact[i, j]
        idx = np.argmax(t1)
        bw = backward if idx - backward >= 0 else idx
        fw = forward if idx + 1 + forward <= t1.size - 1 else t1.size - 1 - 1 - idx
        t2 = tmp[i, j][idx - bw: idx + 1 + fw]
        tmp[i, j][idx - bw: idx + 1 + fw] = np.where(t2 < pcut, t2, t2 * decay_rate)
        processed[i, j] = tmp[i, j] / np.sum(tmp[i, j])
        if smooth:
            processed[i, j] = gaussian_filter(processed[i, j], sigma)
    return processed if norm else tmp


def test_dampen_matches_reference_loop():
    rng = np.random.default_rng(0)
    L, B = 12, 37
    pred = rng.dirichlet(np.ones(B) * 0.4, size=(L, L)).astype(np.float32)
    idx = rng.integers(0, B, size=(L, L))
    fact = np.eye(B, dtype=np.float32)[idx]

    want = _reference_dampen(pred, fact)
    got = np.asarray(dampen_distribution(jnp.asarray(pred), jnp.asarray(fact)))
    np.testing.assert_allclose(got, want, atol=2e-6)

    # tmp channel (norm=False)
    want_tmp = _reference_dampen(pred, fact, norm=False)
    got_tmp = np.asarray(
        dampen_distribution(jnp.asarray(pred), jnp.asarray(fact), norm=False))
    np.testing.assert_allclose(got_tmp, want_tmp, atol=2e-6)


def test_dampen_last_bin_edge_case():
    """argmax == last bin -> no decay, but masked pairs still renorm+smooth."""
    L, B = 3, 5
    pred = np.full((L, L, B), 0.2, dtype=np.float32)
    fact = np.zeros((L, L, B), dtype=np.float32)
    fact[..., -1] = 1.0
    want = _reference_dampen(pred, fact)
    got = np.asarray(dampen_distribution(jnp.asarray(pred), jnp.asarray(fact)))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_gaussian_smooth_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.random((4, 37)).astype(np.float32)
    want = np.stack([gaussian_filter(r, 1.0) for r in x])
    got = np.asarray(gaussian_smooth_bins(jnp.asarray(x), 1.0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_parse_a3m_example():
    msa = parse_a3m(os.path.join(REF_EXAMPLE, "seq.a3m"))
    seq = read_fasta(os.path.join(REF_EXAMPLE, "seq.fasta"))
    assert msa.ndim == 2 and msa.shape[1] == len(seq)
    assert msa.max() <= 20
    np.testing.assert_array_equal(msa[0], seq_to_ints(seq))


def test_alphabet_tokens():
    assert seq_to_ints("AR-V").tolist() == [0, 1, 20, 19]
    assert len(ALPHABET) == 21


def test_pdb_roundtrip(tmp_path):
    from trx2dy.geometry.nerf import build_backbone
    L = 10
    seq = "MKVLGTAEGW"
    coords = build_backbone(
        jnp.full((L,), -1.0), jnp.full((L,), -0.8), jnp.full((L,), np.pi))
    coords_np = {k: np.asarray(v) for k, v in coords.items()}
    path = str(tmp_path / "t.pdb")
    write_pdb_backbone(path, seq, coords_np)
    got, got_seq = read_pdb_backbone(path)
    assert got_seq == seq
    for atom in ("N", "CA", "C", "O"):
        np.testing.assert_allclose(got[atom], coords_np[atom], atol=2e-3)
    # GLY (index 4) has no CB record -> NaN
    assert np.isnan(got["CB"][4]).all()
    assert np.isfinite(got["CB"][0]).all()


def test_read_reference_native_pdb():
    coords, seq = read_pdb_backbone(os.path.join(REF_EXAMPLE, "apo.pdb"))
    assert len(seq) > 50
    assert np.isfinite(coords["CA"]).all()
