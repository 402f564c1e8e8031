"""Tests for the e2e stack: rigid ops, structure module, ESM-MSA, Folding.

Oracle tests instantiate the REFERENCE torch modules with random weights and
require elementwise agreement after weight conversion.
"""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trx2dy.geometry.rigid import (
    Rigid, quat_to_rot, quat_normalize, identity_quats, compose_q_update,
    rigid_apply, rigid_invert_apply, rigid_compose,
)
from trx2dy.models.constants import sequence_to_aatype

HAS_REF = os.path.isdir("/root/reference/trRosettaX2")
try:
    import torch
    HAS_TORCH = True
except ImportError:  # pragma: no cover
    HAS_TORCH = False

if HAS_REF:
    sys.path.insert(0, "/root/reference/trRosettaX2")
    sys.path.insert(0, "/root/reference")


class TestRigid:
    def test_quat_rot_orthonormal(self):
        q = quat_normalize(jax.random.normal(jax.random.PRNGKey(0), (10, 4)))
        R = quat_to_rot(q)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(np.asarray(eye),
                                   np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
        det = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(det, 1.0, atol=1e-5)

    def test_apply_invert_roundtrip(self):
        key = jax.random.PRNGKey(1)
        q = quat_normalize(jax.random.normal(key, (5, 4)))
        r = Rigid(quat_to_rot(q), jax.random.normal(key, (5, 3)))
        pts = jax.random.normal(key, (5, 3))
        back = rigid_invert_apply(r, rigid_apply(r, pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   atol=1e-5)

    def test_compose_associative(self):
        key = jax.random.PRNGKey(2)
        qs = quat_normalize(jax.random.normal(key, (3, 4)))
        rs = [Rigid(quat_to_rot(qs[i]), jnp.asarray([float(i), 0.0, 1.0]))
              for i in range(3)]
        a = rigid_compose(rigid_compose(rs[0], rs[1]), rs[2])
        b = rigid_compose(rs[0], rigid_compose(rs[1], rs[2]))
        np.testing.assert_allclose(np.asarray(a.rot), np.asarray(b.rot),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                                   atol=1e-5)

    def test_identity_update_is_identity(self):
        quats = identity_quats((4,))
        trans = jnp.zeros((4, 3))
        nq, nt = compose_q_update(quats, trans, jnp.zeros((4, 6)))
        np.testing.assert_allclose(np.asarray(nq), np.asarray(quats))
        np.testing.assert_allclose(np.asarray(nt), 0.0)


class TestMSAFilter:
    def test_near_duplicates_dropped_order_preserved(self):
        """hhfilter -diff core: at the accepted identity cutoff, near
        duplicates of already-kept rows are removed; output keeps input
        order (the reference truncates by FILE order after filtering)."""
        from trx2dy.io.msa_filter import filter_msa_diff
        rng = np.random.default_rng(7)
        L = 40
        query = rng.integers(0, 20, L)
        dupes = np.tile(query, (10, 1))          # rows 1..10: copies
        diverse = rng.integers(0, 20, (5, L))    # rows 11..15
        msa = np.vstack([query, dupes, diverse])
        idx = filter_msa_diff(msa, 6)
        assert idx[0] == 0
        assert list(idx) == sorted(idx)          # input order
        assert set(idx) == {0, 11, 12, 13, 14, 15}

    def test_block_coverage_raises_cutoff(self):
        """The 50-column block criterion: a block covered only by similar
        sequences forces the identity cutoff UP until that block retains
        n_keep rows, even when other blocks are already diverse."""
        from trx2dy.io.msa_filter import hhfilter_diff_indices, GAP
        rng = np.random.default_rng(8)
        L = 100                                   # blocks [0:50), [50:100)
        msa = np.full((16, L), GAP, dtype=np.int64)
        msa[0, :50] = rng.integers(0, 20, 50)     # query: block 0 only
        base = rng.integers(0, 20, 50)
        for r in range(1, 6):                     # rows 1-5: block 1 only,
            row = base.copy()                     # ~86% mutual identity
            mut = rng.choice(50, 7, replace=False)
            row[mut] = (row[mut] + 1 + rng.integers(0, 19, 7)) % 20
            msa[r, 50:] = row
        for r in range(6, 16):                    # rows 6-15: block 0,
            msa[r, :50] = rng.integers(0, 20, 50)  # mutually diverse
        idx = hhfilter_diff_indices(msa, 3)
        in_block1 = [i for i in idx if (msa[i, 50:] != GAP).any()]
        # a global-count filter would stop at the strict cutoff (block 0
        # alone has >= 3 diverse rows) and keep only ONE block-1 row
        assert len(in_block1) >= 3, (idx, in_block1)

    def test_keeps_query_and_count(self):
        from trx2dy.io.msa_filter import filter_msa_diff
        rng = np.random.default_rng(0)
        msa = rng.integers(0, 21, (50, 30))
        idx = filter_msa_diff(msa, 10)
        assert idx[0] == 0 and len(idx) == 10

    def test_selects_diverse(self):
        from trx2dy.io.msa_filter import filter_msa_diff
        # 20 copies of the query + 3 distinct rows: the distinct ones win
        msa = np.zeros((23, 10), dtype=int)
        msa[20] = 1
        msa[21] = 2
        msa[22] = 3
        idx = set(filter_msa_diff(msa, 4).tolist())
        assert idx == {0, 20, 21, 22}

    def test_redundant_msa_falls_back_to_max_cutoff_set(self):
        """When NO cutoff satisfies per-block coverage (hyper-redundant
        MSA), HH-suite still emits the 90%-cutoff filtered set — the
        fallback must NOT be the unfiltered input prefix (which would
        return near-duplicates of the query)."""
        from trx2dy.io.msa_filter import filter_msa_diff
        rng = np.random.default_rng(11)
        L = 30
        query = rng.integers(0, 20, L)
        # rows 1..39: exact copies (identity 100% > every cutoff)
        msa = np.vstack([query, np.tile(query, (39, 1))])
        # two genuinely distinct rows at the END of the file
        distinct = rng.integers(0, 20, (2, L))
        msa = np.vstack([msa, distinct])
        idx = list(filter_msa_diff(msa, 8))
        # coverage target (min(total, 8) per block) is unreachable: the
        # filter keeps [query, distinct rows], never rows 1..7
        assert idx[0] == 0
        assert 40 in idx and 41 in idx
        assert 1 not in idx

    def test_trigger_ratio(self):
        from trx2dy.io.msa_filter import hhfilter_equivalent
        msa = np.zeros((100, 5), dtype=int)
        assert hhfilter_equivalent(msa, 95).shape[0] == 100  # below 1.1x
        np.random.seed(0)
        msa2 = np.random.randint(0, 21, (300, 5))
        assert hhfilter_equivalent(msa2, 100).shape[0] <= 100

    def test_write_filtered_a3m_preserves_entries(self, tmp_path):
        """The filter{nrows}.a3m artifact (reference predict.py:142-144 via
        hhfilter) keeps source headers + lowercase insertions verbatim and
        numbers rows the way parse_a3m counts them (wrong-length rows and
        headers skipped)."""
        from trx2dy.io.a3m import parse_a3m
        from trx2dy.io.msa_filter import write_filtered_a3m
        src = tmp_path / "in.a3m"
        src.write_text(
            ">query\nAMIVG\n"
            ">hit1 desc\nAMiaIVG\n"       # insertions -> row 1, width 5
            ">bad\nAMIV\n"                # wrong length: skipped
            "CMIVG\n"                     # headerless row 2
            ">hit3\nGMIVG\n")             # row 3
        dst = tmp_path / "filter.a3m"
        write_filtered_a3m(str(src), str(dst), [0, 2, 3])
        lines = dst.read_text().splitlines()
        assert lines == [">query", "AMIVG", ">seq_2", "CMIVG",
                         ">hit3", "GMIVG"]
        # a kept-with-insertions entry stays verbatim
        write_filtered_a3m(str(src), str(dst), [1])
        assert dst.read_text().splitlines() == [">hit1 desc", "AMiaIVG"]
        # round-trip: parsing the artifact matches slicing the parsed source
        write_filtered_a3m(str(src), str(dst), [0, 1, 3])
        assert (parse_a3m(str(dst)) ==
                parse_a3m(str(src))[[0, 1, 3]]).all()


class TestAtom14Writer:
    def test_roundtrip_backbone(self, tmp_path):
        from trx2dy.io.pdbio import write_pdb_atom14, read_pdb_backbone
        seq = "ARND"
        rng = np.random.default_rng(0)
        atom14 = rng.normal(scale=5.0, size=(4, 14, 3))
        path = str(tmp_path / "m.pdb")
        write_pdb_atom14(path, seq, atom14, plddt=np.full(4, 0.87))
        coords, rseq = read_pdb_backbone(path)
        assert rseq == seq
        np.testing.assert_allclose(coords["N"], atom14[:, 0], atol=1e-3)
        np.testing.assert_allclose(coords["CA"], atom14[:, 1], atol=1e-3)
        line = open(path).readlines()[0]
        assert len(line.rstrip("\n")) == 80
        assert "87.00" in line  # pLDDT in B-factor column


@pytest.mark.skipif(not (HAS_REF and HAS_TORCH), reason="no torch oracle")
class TestStructureModuleOracle:
    def test_parity(self):
        from strutils.structure_module import StructureModuleFullAtom
        from trx2dy.models.torch_convert import state_dict_to_params
        from trx2dy.models.structure_module import (
            structure_module_apply, SMConfig)
        torch.manual_seed(0)
        kw = dict(c_s=64, c_z=32, c_ipa=16, no_heads_ipa=4, no_qk_points=4,
                  no_v_points=8, c_resnet=64, no_blocks=2,
                  no_transition_layers=1, no_resnet_blocks=2, no_angles=7,
                  trans_scale_factor=10)
        tm = StructureModuleFullAtom(**kw)
        tm.eval()
        with torch.no_grad():
            tm.ipa.head_weights.normal_(0, 0.5)
        L = 9
        seq = "ARNDCQEGH"
        s = torch.randn(1, L, 64)
        z = torch.randn(1, L, L, 32)
        with torch.no_grad():
            out_t = tm(seq, {"single": s, "pair": z})
        cords_t = out_t["cords_allatm"][-1][0].permute(1, 0, 2).numpy()
        params = state_dict_to_params(
            {f"sm.{k}": v for k, v in tm.state_dict().items()})
        cfg = SMConfig(c_s=64, c_z=32, c_ipa=16, no_heads_ipa=4,
                       no_qk_points=4, no_v_points=8, c_resnet=64,
                       no_blocks=2, no_transition_layers=1,
                       no_resnet_blocks=2)
        out_j = structure_module_apply(
            params, "sm", jnp.asarray(s[0].numpy()), jnp.asarray(z[0].numpy()),
            jnp.asarray(sequence_to_aatype(seq)), cfg=cfg)
        assert np.abs(cords_t - np.asarray(out_j["atom14"])).max() < 1e-3


@pytest.mark.skipif(not (HAS_REF and HAS_TORCH), reason="no torch oracle")
class TestESMOracle:
    def test_parity_and_chunking(self):
        import argparse
        from esm.model import MSATransformer
        from esm.data import Alphabet
        from trx2dy.models.torch_convert import state_dict_to_params
        import trx2dy.models.esm_msa as em
        torch.manual_seed(0)
        alphabet = Alphabet.from_architecture("msa_transformer")
        args = argparse.Namespace(
            layers=12, embed_dim=96, ffn_embed_dim=384, attention_heads=12,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            max_tokens_per_msa=2 ** 30, max_positions=1024,
            embed_positions_msa=True, max_tokens=2 ** 30)
        tm = MSATransformer(args, alphabet)
        tm.eval()
        R, L = 6, 12
        rng = np.random.default_rng(0)
        toks = em.mymsa_to_esmmsa(rng.integers(0, 21, (R, L)))
        with torch.no_grad():
            out_t = tm(torch.from_numpy(toks[None]).long(),
                       repr_layers=[12], need_head_weights=True)
        params = state_dict_to_params(tm.state_dict())
        old = (em.EMBED_DIM, em.HEADS, em.HEAD_DIM)
        em.EMBED_DIM, em.HEADS, em.HEAD_DIM = 96, 12, 8
        try:
            out_j = em.esm_msa_apply(params, jnp.asarray(toks))
            out_c = em.esm_msa_apply(params, jnp.asarray(toks), row_chunk=2)
            out_cc = em.esm_msa_apply(params, jnp.asarray(toks), col_chunk=5)
            # auto trigger: R*C = 6*13 = 78 > 64 engages BOTH chunkings
            out_auto = em.esm_msa_apply(params, jnp.asarray(toks),
                                        max_tokens_per_msa=64)
        finally:
            em.EMBED_DIM, em.HEADS, em.HEAD_DIM = old
        t = out_t["representations"][12][0].numpy()
        assert np.abs(t - np.asarray(out_j["representations"][12])).max() < 1e-4
        assert np.abs(t - np.asarray(out_c["representations"][12])).max() < 1e-4
        assert np.abs(t - np.asarray(out_cc["representations"][12])).max() < 1e-4
        assert np.abs(t - np.asarray(out_auto["representations"][12])).max() < 1e-4
        at = out_t["row_attentions"][0].numpy()
        assert np.abs(at - np.asarray(out_j["row_attentions"])).max() < 1e-4


@pytest.mark.skipif(not (HAS_REF and HAS_TORCH), reason="no torch oracle")
class TestESM1bResIdxOracle:
    def test_custom_res_idx_parity(self):
        """The real ESM-MSA-1b checkpoint resolves to the MSATransformer1b
        arm (embed_positions_msa=True, pretrained.py:125-132) whose only
        behavioral difference is custom res_idx positions — verify ours
        matches with a non-contiguous res_idx."""
        import argparse
        from esm.model import MSATransformer1b
        from esm.data import Alphabet
        from trx2dy.models.torch_convert import state_dict_to_params
        import trx2dy.models.esm_msa as em
        torch.manual_seed(0)
        alphabet = Alphabet.from_architecture("msa_transformer")
        args = argparse.Namespace(
            layers=12, embed_dim=96, ffn_embed_dim=384, attention_heads=12,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            max_tokens_per_msa=2 ** 30, max_positions=1024,
            embed_positions_msa=True, embed_positions_msa_dim=1,
            max_tokens=2 ** 30)
        tm = MSATransformer1b(args, alphabet)
        tm.eval()
        R, L = 5, 12
        rng = np.random.default_rng(2)
        toks = em.mymsa_to_esmmsa(rng.integers(0, 21, (R, L)))
        # interior-gap residue numbering (an IDR construct, say)
        res = np.concatenate([np.arange(5), np.arange(20, 27)])
        with torch.no_grad():
            out_t = tm(torch.from_numpy(toks[None]).long(),
                       repr_layers=[12],
                       res_idx=torch.from_numpy(res[None]).long())
        params = state_dict_to_params(tm.state_dict())
        old = (em.EMBED_DIM, em.HEADS, em.HEAD_DIM)
        em.EMBED_DIM, em.HEADS, em.HEAD_DIM = 96, 12, 8
        try:
            out_j = em.esm_msa_apply(params, jnp.asarray(toks),
                                     need_head_weights=False,
                                     res_idx=jnp.asarray(res))
        finally:
            em.EMBED_DIM, em.HEADS, em.HEAD_DIM = old
        t = out_t["representations"][12][0].numpy()
        assert np.abs(t - np.asarray(out_j["representations"][12])).max() \
            < 1e-4


@pytest.mark.skipif(not (HAS_REF and HAS_TORCH), reason="no torch oracle")
class TestESMDeepMSA:
    def test_deep_msa_forward_auto_chunked(self):
        """A deep MSA forward must pass on CPU: the max_tokens_per_msa auto
        trigger bounds column attention to (H, col_chunk, R, R) blocks
        instead of the full (H, C, R, R). R=1024 is the architectural max —
        the reference's msa_position_embedding is (1, 1024, 1, 1)
        (esm/model.py:300-311), so deeper MSAs fail in the reference too."""
        import argparse
        from esm.model import MSATransformer
        from esm.data import Alphabet
        from trx2dy.models.torch_convert import state_dict_to_params
        import trx2dy.models.esm_msa as em
        torch.manual_seed(0)
        alphabet = Alphabet.from_architecture("msa_transformer")
        args = argparse.Namespace(
            layers=12, embed_dim=96, ffn_embed_dim=384, attention_heads=12,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            max_tokens_per_msa=2 ** 30, max_positions=1024,
            embed_positions_msa=True, max_tokens=2 ** 30)
        tm = MSATransformer(args, alphabet)
        tm.eval()
        params = state_dict_to_params(tm.state_dict())
        R, L = 1024, 64
        rng = np.random.default_rng(1)
        toks = em.mymsa_to_esmmsa(rng.integers(0, 21, (R, L)))
        old = (em.EMBED_DIM, em.HEADS, em.HEAD_DIM)
        em.EMBED_DIM, em.HEADS, em.HEAD_DIM = 96, 12, 8
        try:
            # 2^14 is the model-args default (esm/model.py:269-276);
            # R*C = 1024*65 >> 2^14 engages row_chunk=252 and col_chunk=16
            out = em.esm_msa_apply(params, jnp.asarray(toks),
                                   need_head_weights=False,
                                   max_tokens_per_msa=2 ** 14)
            rep = np.asarray(out["representations"][12])
            assert rep.shape == (R, L + 1, 96), rep.shape
            assert np.isfinite(rep).all()
            # spot-check exactness: first 8 rows through the unchunked path
            # must match the same rows' embedding trajectory is NOT expected
            # (row attention ties over ALL rows) — instead check chunked
            # column attention against a manual chunk size on a slice
            out2 = em.esm_msa_apply(params, jnp.asarray(toks[:24]),
                                    need_head_weights=False)
            out3 = em.esm_msa_apply(params, jnp.asarray(toks[:24]),
                                    need_head_weights=False,
                                    row_chunk=7, col_chunk=3)
            d = np.abs(np.asarray(out2["representations"][12])
                       - np.asarray(out3["representations"][12])).max()
            assert d < 1e-4, d
        finally:
            em.EMBED_DIM, em.HEADS, em.HEAD_DIM = old


@pytest.mark.skipif(not (HAS_REF and HAS_TORCH), reason="no torch oracle")
class TestFoldingE2EOracle:
    def test_full_model_parity(self):
        import contextlib
        torch.amp.autocast = lambda *a, **k: contextlib.nullcontext()
        from trRosettaX2.main_chunk import Folding as TorchFolding
        from trx2dy.models.torch_convert import state_dict_to_params
        from trx2dy.models.folding_e2e import folding_apply
        from trx2dy.models.esm_msa import mymsa_to_esmmsa
        torch.manual_seed(0)
        cfg = {"structure_module": dict(
            c_s=128, c_z=128, c_ipa=16, no_heads_ipa=4, no_qk_points=4,
            no_v_points=8, c_resnet=64, no_blocks=2, no_transition_layers=1,
            no_resnet_blocks=2, no_angles=7, trans_scale_factor=10)}
        tm = TorchFolding(dim_2d=128, dim_3d=128, config=cfg)
        tm.eval()
        L, R = 7, 4
        seq = "ARNDCQE"
        rng = np.random.default_rng(1)
        toks = mymsa_to_esmmsa(rng.integers(0, 21, (R, L)))
        C = L + 1
        esm_repr = rng.normal(size=(1, R, C, 768)).astype(np.float32)
        row_attn = rng.normal(scale=0.1, size=(1, 12, 12, C, C)).astype(
            np.float32)
        emb_out = {"representations": {12: torch.from_numpy(esm_repr)},
                   "row_attentions": torch.from_numpy(row_attn)}
        msa_t = torch.from_numpy(toks[None]).long()
        with torch.no_grad():
            _, out_t = tm.forward(seq, msa_t, msa_filtered=msa_t,
                                  emb_out=emb_out, n_recycle=1,
                                  device="cpu", msa_cutoff=500)
        params = state_dict_to_params(tm.state_dict())
        out_j = folding_apply(params, seq, jnp.asarray(toks),
                              jnp.asarray(esm_repr[0]),
                              jnp.asarray(row_attn[0]), n_recycle=1,
                              sm_blocks=2)
        plddt_t = out_t["plddt"][-1].squeeze().numpy()
        assert np.abs(plddt_t - np.asarray(out_j["plddt"])).max() < 1e-3
        cords_t = out_t["cords_allatm"][-1].squeeze(0).permute(1, 0, 2).numpy()
        assert np.abs(cords_t - np.asarray(out_j["atom14"])).max() < 1e-3
