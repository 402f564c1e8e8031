"""Tests for the TM-score/RMSD engine (bin/TMscore replacement)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trx2dy.analysis.tmscore import (
    kabsch, kabsch_rmsd, tm_score_pair, tm_d0, align_common,
)

REF = "/root/reference/example"


def _random_chain(L, key=0):
    rng = np.random.default_rng(key)
    steps = rng.normal(size=(L, 3)).astype(np.float32)
    steps = 3.8 * steps / np.linalg.norm(steps, axis=-1, keepdims=True)
    return jnp.asarray(np.cumsum(steps, axis=0))


def _rotate(x, key=1):
    rng = np.random.default_rng(key)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return x @ jnp.asarray(Q.astype(np.float32)).T + jnp.asarray([5.0, -3.0, 8.0])


class TestKabsch:
    def test_exact_superposition(self):
        P = _random_chain(40)
        Q = _rotate(P)
        assert float(kabsch_rmsd(P, Q)) < 1e-4

    def test_rotation_is_orthonormal(self):
        P = _random_chain(30)
        Q = _rotate(P, key=3)
        R, t = kabsch(P, Q)
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
        assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5


class TestTMScore:
    def test_identity_is_one(self):
        P = _random_chain(50)
        r = tm_score_pair(P, P)
        assert float(r.tm) > 0.999
        assert float(r.rmsd) < 1e-3

    def test_rigid_motion_is_one(self):
        P = _random_chain(60, key=2)
        r = tm_score_pair(_rotate(P), P)
        assert float(r.tm) > 0.999

    def test_d0_formula(self):
        assert abs(tm_d0(90) - (1.24 * 75 ** (1 / 3.0) - 1.8)) < 1e-9
        assert tm_d0(10) == 0.5

    def test_partial_match_beats_global_kabsch(self):
        # half the chain matches exactly, half is scrambled: the iterative
        # search must find the matching half
        P = np.asarray(_random_chain(60, key=4))
        Q = P.copy()
        rng = np.random.default_rng(5)
        Q[30:] += rng.normal(scale=15.0, size=(30, 3))
        r = tm_score_pair(jnp.asarray(Q), jnp.asarray(P))
        assert float(r.tm) > 0.45   # ~half residues nearly perfect

    @pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
    def test_matches_reference_binary_outputs(self):
        """Golden values produced by /root/reference/bin/TMscore."""
        from trx2dy.io.pdbio import read_pdb_backbone
        golden = {
            ("conf_1_1", "apo"): (0.6594, 3.100),
            ("conf_1_1", "holo"): (0.5267, 5.346),
            ("conf_2_1", "apo"): (0.6239, 4.137),
            ("conf_1_4", "holo"): (0.6232, 3.931),
        }
        for (decoy, native), (tm_ref, rmsd_ref) in golden.items():
            c1, s1 = read_pdb_backbone(
                f"{REF}/output/seq/pred_pdb/{decoy}.pdb")
            c2, s2 = read_pdb_backbone(f"{REF}/{native}.pdb")
            ia, ib = align_common(s1, s2)
            r = tm_score_pair(jnp.asarray(c1["CA"][ia], jnp.float32),
                              jnp.asarray(c2["CA"][ib], jnp.float32))
            assert abs(float(r.tm) - tm_ref) < 2e-3, (decoy, native)
            assert abs(float(r.rmsd) - rmsd_ref) < 2e-3, (decoy, native)


class TestAlign:
    def test_identity(self):
        ia, ib = align_common("ABCD", "ABCD")
        assert (ia == ib).all() and len(ia) == 4

    def test_subsequence(self):
        ia, ib = align_common("XXABCD", "ABCD")
        assert list(ia) == [2, 3, 4, 5] and list(ib) == [0, 1, 2, 3]

    def test_nw_interior_gap(self):
        # native with an interior gap vs full prediction: NW must skip the
        # gap instead of truncating (the old fallback matched index-by-index
        # and scored garbage past the gap)
        full = "ACDEFGHIKLMNPQRS"
        gapped = full[:5] + full[9:]            # residues 6-9 missing
        ia, ib = align_common(gapped, full, align=True)
        assert list(ia) == list(range(len(gapped)))
        assert list(ib) == list(range(5)) + list(range(9, 16))

    def test_align_flag_changes_behavior(self):
        # same inputs, different matching: resseq path vs NW path
        from trx2dy.analysis.tmscore import align_by_resseq
        res_full = [str(i + 1) for i in range(16)]
        res_gap = res_full[:5] + res_full[9:]
        ia, ib = align_by_resseq(res_gap, res_full)
        assert list(ib) == list(range(5)) + list(range(9, 16))

    def test_resseq_matching_with_offset_numbering(self):
        # prediction numbered 1..N, native numbered 101..: no common ids ->
        # empty match (exactly what TMscore default does); align=True rescues
        from trx2dy.analysis.tmscore import align_by_resseq
        res_pred = [str(i + 1) for i in range(8)]
        res_nat = [str(i + 101) for i in range(8)]
        ia, ib = align_by_resseq(res_pred, res_nat)
        assert len(ia) == 0
        ia, ib = align_common("ACDEFGHI", "ACDEFGHI", align=True)
        assert len(ia) == 8

    def test_mismatched_seqs_use_nw_not_truncation(self):
        # interior deletion without resseq info: default path now NW-aligns
        full = "ACDEFGHIKLMNPQRSTVWY"
        gapped = full[:8] + full[12:]
        ia, ib = align_common(gapped, full)
        assert list(ib) == list(range(8)) + list(range(12, 20))


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
class TestEvaluateGappedNative:
    def test_interior_gap_native_scores_sanely(self, tmp_path):
        """A native missing interior residues must still score ~ the intact
        one (residue-number matching); with index truncation the score
        collapses because post-gap residues are compared frame-shifted."""
        from trx2dy.io.pdbio import read_pdb_backbone
        from trx2dy.analysis.evaluate import run_score

        src = f"{REF}/apo.pdb"
        nat_dir = tmp_path / "native"
        pred_dir = tmp_path / "pred"
        nat_dir.mkdir()
        pred_dir.mkdir()
        # native with residues 31..40 deleted but original numbering kept
        kept = []
        with open(src) as f:
            for line in f:
                if line.startswith(("ATOM", "TER", "END")):
                    if line.startswith("ATOM"):
                        resno = int(line[22:26])
                        if 31 <= resno <= 40:
                            continue
                    kept.append(line)
        (nat_dir / "apo_gap.pdb").write_text("".join(kept))
        # prediction = one of the reference's committed decoys (full length)
        import shutil
        shutil.copy(f"{REF}/output/seq/pred_pdb/conf_1_1.pdb",
                    pred_dir / "conf_1_1.pdb")

        min_rmsd, max_tm, _, _ = run_score(str(nat_dir), str(pred_dir))
        # golden values from /root/reference/bin/TMscore on the same pair
        # (residue-number matching, normalized by the pred's full length)
        assert abs(max_tm - 0.5879) < 2e-3, max_tm
        assert abs(min_rmsd - 3.125) < 2e-3, min_rmsd
        # align=True (sequence alignment) should agree closely here
        _, max_tm_aln, _, _ = run_score(str(nat_dir), str(pred_dir),
                                        align=True)
        assert abs(max_tm_aln - max_tm) < 0.05
