"""Tests for the Dynamics loop, driver file contracts, and analysis CLIs."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trx2dy.dynamics.loop import (
    GeomHistograms, histograms_from_npz, histograms_to_npz, measure_decoy,
    dampen_step, reliability_score, convergence_delta,
)
from trx2dy.dynamics.driver import (
    DynamicsConfig, generate_ensemble, flatten_directory, rename_to_conf,
    run_single,
)


def _rand_npz(L, key=0):
    rng = np.random.default_rng(key)
    def soft(shape):
        x = rng.random(shape).astype(np.float32)
        return x / x.sum(-1, keepdims=True)
    return {"dist": soft((L, L, 37)), "omega": soft((L, L, 25)),
            "theta": soft((L, L, 25)), "phi": soft((L, L, 13))}


class TestLoop:
    def test_histograms_roundtrip(self):
        npz = _rand_npz(6)
        h = histograms_from_npz(npz)
        out = histograms_to_npz(h)
        np.testing.assert_allclose(out["dist"], npz["dist"])
        np.testing.assert_allclose(out["tmp"], npz["dist"])  # tmp defaults

    def test_measure_decoy_onehot(self):
        L = 20
        rng = np.random.default_rng(1)
        ca = jnp.asarray(np.cumsum(
            3.8 * rng.normal(size=(L, 3)) /
            np.linalg.norm(rng.normal(size=(L, 3)), axis=-1, keepdims=True),
            axis=0), jnp.float32)
        n = ca + jnp.asarray([1.4, 0, 0])
        c = ca + jnp.asarray([0, 1.5, 0])
        cb = ca + jnp.asarray([0, 0, 1.5])
        fact = measure_decoy(n, ca, c, cb)
        for k, nb in [("dist", 37), ("omega", 25), ("theta", 25), ("phi", 13)]:
            f = np.asarray(fact[k])
            assert f.shape == (L, L, nb)
            s = f.sum(-1)
            assert ((s == 0) | (s == 1)).all()   # one-hot or empty

    def test_dampen_step_suppresses_realized_bin(self):
        L = 8
        h = histograms_from_npz(_rand_npz(L, key=2))
        # realized bins: everything in bin 10
        fact = {k: jnp.zeros_like(getattr(h, k)).at[:, :, 10].set(1.0)
                for k in ("dist", "omega", "theta", "phi")}
        new = dampen_step(h, fact)
        # tmp channel: decayed where max<P and bin10 >= pcut
        old_tmp = np.asarray(h.tmp)
        new_tmp = np.asarray(new.tmp)
        mask = old_tmp.max(-1) < 0.5
        decay_expected = mask & (old_tmp[:, :, 10] >= 0.05)
        np.testing.assert_allclose(
            new_tmp[decay_expected][:, 10],
            old_tmp[decay_expected][:, 10] * 0.5, rtol=1e-6)
        # normalized channels stay distributions on masked pairs
        s = np.asarray(new.dist).sum(-1)
        np.testing.assert_allclose(s[mask], 1.0, atol=1e-4)

    def test_reliability_score(self):
        L = 10
        t = jnp.zeros((3, L)).at[0].set(jnp.deg2rad(-60.0))
        assert float(reliability_score(t)) == 1.0
        t_bad = jnp.zeros((3, L)).at[0].set(jnp.deg2rad(60.0))
        assert float(reliability_score(t_bad)) == 0.0

    def test_convergence_delta(self):
        h1 = histograms_from_npz(_rand_npz(5, key=3))
        h2 = h1._replace(tmp=h1.tmp + 0.25)
        assert abs(convergence_delta(h1, h2) - 0.25) < 1e-6


class TestRename:
    def _touch(self, d, names):
        for n in names:
            open(os.path.join(d, n), "w").write("x")

    def test_initial_and_iteration_renaming(self, tmp_path):
        d = str(tmp_path)
        self._touch(d, ["initial0.pdb", "initial1.pdb", "initial0_1.pdb",
                        "seq1.pdb", "seq2.pdb", "seq3.pdb"])
        rename_to_conf(d, num_conf1_others=2)
        files = sorted(os.listdir(d))
        # initial0/1 -> conf_1_1/2; initial0_1 -> conf_2_1;
        # 2 others -> conf_1_3, conf_1_4; last -> conf_2_2
        assert files == ["conf_1_1.pdb", "conf_1_2.pdb", "conf_1_3.pdb",
                         "conf_1_4.pdb", "conf_2_1.pdb", "conf_2_2.pdb"]

    def test_flatten(self, tmp_path):
        d = str(tmp_path)
        os.makedirs(os.path.join(d, "NMR"))
        os.makedirs(os.path.join(d, "Xray"))
        self._touch(os.path.join(d, "NMR"), ["initial0.pdb"])
        self._touch(os.path.join(d, "Xray"), ["initial0.pdb"])
        flatten_directory(d)
        files = sorted(os.listdir(d))
        assert files == ["initial0.pdb", "initial0_1.pdb"]


class TestDriver:
    def test_generate_ensemble_contract(self, tmp_path):
        L = 20
        seq = "ARNDCQEGHILKMFPSTWYV"
        npz = _rand_npz(L, key=5)
        cfg = DynamicsConfig(init_num=2, Nmax=1, max_iter=15, fastrelax=False)
        npz_dir = str(tmp_path / "tmp_npz")
        pdb_dir = str(tmp_path / "pred_pdb")
        last = generate_ensemble("t", npz_dir, pdb_dir, npz, seq, cfg,
                                 jax.random.PRNGKey(0))
        assert last >= 1
        assert os.path.exists(os.path.join(pdb_dir, "initial0.pdb"))
        assert os.path.exists(os.path.join(pdb_dir, "initial1.pdb"))
        assert os.path.exists(os.path.join(pdb_dir, "t1.pdb"))
        assert os.path.exists(os.path.join(npz_dir, "t1.npz"))
        saved = dict(np.load(os.path.join(npz_dir, "t1.npz")))
        assert set(saved) == {"dist", "omega", "theta", "phi", "tmp"}

    def test_run_single_with_precomputed_npz(self, tmp_path):
        L = 16
        seq = "ARNDCQEGHILKMFPS"
        fasta = tmp_path / "t.fasta"
        fasta.write_text(f">t\n{seq}\n")
        npz_dir = tmp_path / "npz"
        npz_dir.mkdir()
        np.savez_compressed(npz_dir / "t_NMR.npz", **_rand_npz(L, key=6))
        cfg = DynamicsConfig(init_num=2, Nmax=1, max_iter=10,
                             fastrelax=False, mult_two_models=False)
        out = run_single("t", str(fasta), None, str(tmp_path / "out"), cfg,
                         npz_dir=str(npz_dir))
        pdbs = sorted(os.listdir(os.path.join(out, "pred_pdb")))
        assert all(p.startswith("conf_") for p in pdbs)
        assert not os.path.exists(os.path.join(out, "tmp_npz"))
        assert os.path.exists(os.path.join(out, "pred_npz", "t_NMR.npz"))


REF_PDB_DIR = "/root/reference/example/output/seq/pred_pdb"


@pytest.mark.skipif(not os.path.isdir(REF_PDB_DIR),
                    reason="reference example not mounted")
class TestAnalysisCLI:
    def test_evaluate_matches_golden_stats(self, tmp_path):
        from trx2dy.analysis.evaluate import run_score
        nat = tmp_path / "native"
        nat.mkdir()
        import shutil
        shutil.copy("/root/reference/example/apo.pdb", nat)
        shutil.copy("/root/reference/example/holo.pdb", nat)
        min_rmsd, max_tm, mean_rmsd, mean_tm = run_score(
            str(nat), REF_PDB_DIR, save_summary=True, save_dir=str(tmp_path))
        # golden (example/output/seq/summary.txt): 3.02 / 0.67 / 3.47 / 0.65
        assert abs(min_rmsd - 3.02) < 0.05
        assert abs(max_tm - 0.67) < 0.01
        assert abs(mean_rmsd - 3.47) < 0.1
        assert abs(mean_tm - 0.65) < 0.01
        txt = (tmp_path / "summary.txt").read_text()
        assert "best_RMSD" in txt and "Mean TM-score" in txt

    def test_glocon_cluster(self, tmp_path):
        from trx2dy.analysis.cluster import save_cluster_result
        res = save_cluster_result(REF_PDB_DIR, n_clusters=2, n_files=1,
                                  output_dir=str(tmp_path / "c"))
        assert res != "no_cluster" and len(res) == 2
        copied = os.listdir(tmp_path / "c")
        assert 2 <= len(copied) <= 8

    def test_cluster_too_few_samples(self, tmp_path):
        from trx2dy.analysis.cluster import save_cluster_result
        res = save_cluster_result(REF_PDB_DIR, n_clusters=50,
                                  output_dir=str(tmp_path / "c2"))
        assert res == "no_cluster"


class TestChains:
    def test_chain_mode_produces_decoys(self, tmp_path):
        L = 18
        seq = "ARNDCQEGHILKMFPSTW"
        npz = _rand_npz(L, key=9)
        cfg = DynamicsConfig(init_num=2, Nmax=4, max_iter=10,
                             fastrelax=False, n_chains=2)
        last = generate_ensemble("c", str(tmp_path / "npz"),
                                 str(tmp_path / "pdb"), npz, seq, cfg,
                                 jax.random.PRNGKey(0))
        pdbs = sorted(os.listdir(tmp_path / "pdb"))
        # 2 initial + up to Nmax chain decoys, contiguous numbering
        assert "initial0.pdb" in pdbs and "c1.pdb" in pdbs
        assert last <= cfg.Nmax
        # per-decoy npz checkpoints exist
        assert os.path.exists(tmp_path / "npz" / "c1.npz")


class TestCombinedModels:
    def test_two_model_combined_contract(self, tmp_path):
        """mult_two_models + combine_models: both models' chains fold in
        one batched program per step, yet the final file layout matches the
        reference's serial NMR-then-Xray ordering (conf_1 = NMR initials +
        NMR chain decoys, conf_2 = Xray initials + Xray chain decoys;
        Xray numbering continues after NMR's final count)."""
        L = 16
        seq = "ARNDCQEGHILKMFPS"
        fasta = tmp_path / "t.fasta"
        fasta.write_text(f">t\n{seq}\n")
        npz_dir = tmp_path / "npz"
        npz_dir.mkdir()
        np.savez_compressed(npz_dir / "t_NMR.npz", **_rand_npz(L, key=31))
        np.savez_compressed(npz_dir / "t_Xray.npz", **_rand_npz(L, key=32))
        cfg = DynamicsConfig(init_num=2, Nmax=2, max_iter=8, fastrelax=False,
                             n_chains=2, mult_two_models=True,
                             combine_models=True)
        out = run_single("t", str(fasta), None, str(tmp_path / "out"), cfg,
                         npz_dir=str(npz_dir))
        pdbs = sorted(os.listdir(os.path.join(out, "pred_pdb")))
        assert all(p.startswith("conf_") for p in pdbs), pdbs
        # no provisional names may survive
        assert not any(".tmp_" in p for p in pdbs)
        n_c1 = sum(p.startswith("conf_1") for p in pdbs)
        n_c2 = sum(p.startswith("conf_2") for p in pdbs)
        # 2 initials per model + Nmax chain decoys per model, half each
        assert n_c1 == n_c2 == 2 + cfg.Nmax
        assert not os.path.exists(os.path.join(out, "tmp_npz"))
        # traces carry the model tag for both streams, plus per-step
        # phase-timing rows (fold / emit / measure+dampen wall seconds)
        import json
        rows = [json.loads(ln) for ln in
                open(os.path.join(out, "traces.jsonl"))]
        decoy_rows = [r for r in rows if r["kind"] in ("initial", "chain")]
        assert {r.get("model") for r in decoy_rows} == {"NMR", "Xray"}
        phase_rows = [r for r in rows if r["kind"] == "phase"]
        assert any("t_fold" in r for r in phase_rows)
        assert all(np.isfinite(v) for r in phase_rows
                   for k, v in r.items() if k.startswith("t_"))

    def test_combined_falls_back_on_resume(self, tmp_path):
        """An in-progress tmp_npz tree routes to the serial samplers whose
        per-file resume contract is exact (run_inference.py:100-102)."""
        from trx2dy.dynamics import driver as drv
        L = 14
        seq = "ARNDCQEGHILKMF"
        fasta = tmp_path / "t.fasta"
        fasta.write_text(f">t\n{seq}\n")
        npz_dir = tmp_path / "npz"
        npz_dir.mkdir()
        np.savez_compressed(npz_dir / "t_NMR.npz", **_rand_npz(L, key=41))
        np.savez_compressed(npz_dir / "t_Xray.npz", **_rand_npz(L, key=42))
        # pre-seed a tmp_npz iteration file (simulated interrupted run)
        tdir = tmp_path / "out" / "t" / "tmp_npz" / "NMR"
        tdir.mkdir(parents=True)
        np.savez_compressed(tdir / "t1.npz", **_rand_npz(L, key=43),
                            tmp=_rand_npz(L, key=43)["dist"])
        called = []
        orig = drv._generate_chains_multi
        drv._generate_chains_multi = lambda *a, **k: (
            called.append("multi") or orig(*a, **k))
        try:
            cfg = DynamicsConfig(init_num=1, Nmax=1, max_iter=5,
                                 fastrelax=False, n_chains=1,
                                 mult_two_models=True, combine_models=True)
            run_single("t", str(fasta), None, str(tmp_path / "out"), cfg,
                       npz_dir=str(npz_dir))
        finally:
            drv._generate_chains_multi = orig
        # the combined multi-stream path must NOT have been taken: with
        # n_chains=1 the serial sequential sampler (exact resume) runs
        assert called == []
        pdbs = os.listdir(tmp_path / "out" / "t" / "pred_pdb")
        assert any(p.startswith("conf_") for p in pdbs)


class TestResumeAndBatch:
    def test_resume_contract(self, tmp_path):
        """Re-running generate_ensemble continues from saved tmp_npz files
        (reference run_inference.py:100-102 semantics)."""
        L = 16
        seq = "ARNDCQEGHILKMFPS"
        npz = _rand_npz(L, key=21)
        cfg = DynamicsConfig(init_num=2, Nmax=2, max_iter=8, fastrelax=False)
        npz_dir = str(tmp_path / "npz")
        pdb_dir = str(tmp_path / "pdb")
        last1 = generate_ensemble("r", npz_dir, pdb_dir, npz, seq, cfg,
                                  jax.random.PRNGKey(0))
        files_before = set(os.listdir(npz_dir))
        # second run re-reads the existing iteration npz files
        last2 = generate_ensemble("r", npz_dir, pdb_dir, npz, seq, cfg,
                                  jax.random.PRNGKey(1))
        assert last2 >= 1
        assert files_before.issubset(set(os.listdir(npz_dir)))

    def test_resume_routes_past_chains_path(self, tmp_path):
        """With n_chains > 1 a resume (existing iteration npz files) must
        still run the SEQUENTIAL sampler — the batched chains path has no
        notion of partially-produced iterations and would restart."""
        from trx2dy.dynamics import driver as drv
        L = 16
        seq = "ARNDCQEGHILKMFPS"
        npz = _rand_npz(L, key=22)
        cfg = DynamicsConfig(init_num=2, Nmax=2, max_iter=8,
                             fastrelax=False, n_chains=4)
        npz_dir = tmp_path / "npz"
        npz_dir.mkdir()
        np.savez_compressed(npz_dir / "r1.npz", **npz,
                            tmp=npz["dist"])
        called = []
        orig = drv._generate_ensemble_chains
        drv._generate_ensemble_chains = lambda *a, **k: (
            called.append("chains") or orig(*a, **k))
        try:
            generate_ensemble("r", str(npz_dir), str(tmp_path / "pdb"),
                              npz, seq, cfg, jax.random.PRNGKey(0))
        finally:
            drv._generate_ensemble_chains = orig
        assert called == []

    def test_batch_mode_cli(self, tmp_path):
        """--name_lst batch mode drives run_single per name."""
        from trx2dy.cli.run_inference import main as cli_main
        L = 14
        seq = "ARNDCQEGHILKMF"
        for name in ("t1", "t2"):
            (tmp_path / f"{name}.fasta").write_text(f">{name}\n{seq}\n")
            (tmp_path / f"{name}.a3m").write_text(f">{name}\n{seq}\n")
            np.savez_compressed(tmp_path / f"{name}_NMR.npz",
                                **_rand_npz(L, key=hash(name) % 100))
        (tmp_path / "names.txt").write_text("t1\nt2\n")
        cli_main(["--name_lst", str(tmp_path / "names.txt"),
                  "--fasta_dir", str(tmp_path), "--msa_dir", str(tmp_path),
                  "--save_dir", str(tmp_path / "out"),
                  "--npz_dir", str(tmp_path),
                  "--init_num", "1", "--Nmax", "1", "--max_iter", "5",
                  "--no-mult_two_models"])
        for name in ("t1", "t2"):
            pdbs = os.listdir(tmp_path / "out" / name / "pred_pdb")
            assert any(p.startswith("conf_1") for p in pdbs), name


class TestCandidatesCLIContract:
    """An explicit --chain_candidates value is a contract (ADVICE r4): the
    bucket filler must not silently raise it, and the quality-trading
    value 1 warns on stderr (VERDICT r4 item 7)."""

    def _run_cli(self, tmp_path, argv_extra, capsys):
        from trx2dy.cli import run_inference as cli
        from trx2dy.dynamics import driver as drv
        captured = {}

        def fake_run_single(name, fasta, msa, save_dir, cfg, **kw):
            captured["cfg"] = cfg
            return save_dir

        orig = drv.run_single
        drv.run_single = fake_run_single
        try:
            (tmp_path / "t.fasta").write_text(">t\nARND\n")
            cli.main(["--fasta", str(tmp_path / "t.fasta"), "--name", "t",
                      "--save_dir", str(tmp_path / "out")] + argv_extra)
        finally:
            drv.run_single = orig
        return captured["cfg"], capsys.readouterr().err

    def test_explicit_candidates_disable_fill(self, tmp_path, capsys):
        cfg, err = self._run_cli(tmp_path, ["--chain_candidates", "2"],
                                 capsys)
        assert cfg.chain_candidates == 2
        assert cfg.fill_candidates is False       # honored exactly
        assert "energy gating" not in err         # no warning for N>1

    def test_candidates_one_warns(self, tmp_path, capsys):
        cfg, err = self._run_cli(tmp_path, ["--chain_candidates", "1"],
                                 capsys)
        assert cfg.chain_candidates == 1
        assert cfg.fill_candidates is False
        assert "disables per-step energy gating" in err

    def test_default_keeps_fill(self, tmp_path, capsys):
        cfg, err = self._run_cli(tmp_path, [], capsys)
        assert cfg.fill_candidates is True        # None opts into filling


class TestFullAtomOutput:
    def test_driver_emits_full_atom_pdbs(self, tmp_path):
        """With full_atom on, decoys carry sidechain heavy atoms
        (reference dumps full-atom poses after relax, folding.py:273)."""
        L = 16
        seq = "ARNDCQEGHILKMFPS"
        npz = _rand_npz(L, key=12)
        cfg = DynamicsConfig(init_num=2, Nmax=1, max_iter=10,
                             fastrelax=False, full_atom=True)
        pdb_dir = str(tmp_path / "pred_pdb")
        generate_ensemble("t", str(tmp_path / "tmp_npz"), pdb_dir, npz, seq,
                          cfg, jax.random.PRNGKey(0))
        path = os.path.join(pdb_dir, "initial0.pdb")
        names = {ln[12:16].strip() for ln in open(path)
                 if ln.startswith("ATOM")}
        # arginine NH1/CZ etc. prove sidechains beyond CB are present
        assert {"N", "CA", "C", "O", "CB"} <= names
        assert {"CG", "CD", "NE", "CZ"} <= names

    def test_full_atom_defaults_follow_fastrelax(self):
        assert DynamicsConfig(fastrelax=False).emit_full_atom is False
        assert DynamicsConfig(fastrelax=True).emit_full_atom is True
        assert DynamicsConfig(fastrelax=True,
                              full_atom=False).emit_full_atom is False


class TestTraces:
    def test_run_single_writes_traces(self, tmp_path):
        import json
        L = 16
        seq = "ARNDCQEGHILKMFPS"
        fasta = tmp_path / "t.fasta"
        fasta.write_text(f">t\n{seq}\n")
        npz_dir = tmp_path / "npz"
        npz_dir.mkdir()
        np.savez_compressed(npz_dir / "t_NMR.npz", **_rand_npz(L, key=61))
        # n_chains=1: the sequential sampler selects exactly ONE seed;
        # K chains would mark the top-K initials selected
        cfg = DynamicsConfig(init_num=2, Nmax=1, max_iter=10,
                             fastrelax=False, mult_two_models=False,
                             n_chains=1)
        out = run_single("t", str(fasta), None, str(tmp_path / "out"), cfg,
                         npz_dir=str(npz_dir))
        rows = [json.loads(ln) for ln in
                open(os.path.join(out, "traces.jsonl"))]
        kinds = {r["kind"] for r in rows}
        assert kinds - {"phase"} == {"initial", "chain"}
        init_rows = [r for r in rows if r["kind"] == "initial"]
        assert len(init_rows) == 2
        assert sum(r["selected_seed"] for r in init_rows) == 1
        assert all(np.isfinite(r["energy"]) for r in rows
                   if r["kind"] != "phase")


class TestAsyncIO:
    def test_check_surfaces_completed_errors_without_blocking(self):
        import time
        from trx2dy.dynamics.driver import _AsyncIO
        io = _AsyncIO()

        def boom():
            raise IOError("disk full")

        io.submit(boom)
        time.sleep(0.2)
        with pytest.raises(IOError):
            io.check()
        io.close()

    def test_close_noraise_keeps_loop_error(self):
        import time
        from trx2dy.dynamics.driver import _AsyncIO
        io = _AsyncIO()
        io.submit(lambda: 1 / 0)
        time.sleep(0.2)
        io.close(raise_errors=False)      # must NOT raise

    def test_ordered_writes_complete(self, tmp_path):
        from trx2dy.dynamics.driver import _AsyncIO
        io = _AsyncIO()
        for i in range(8):
            io.submit((tmp_path / f"f{i}.txt").write_text, str(i))
        io.close()
        assert sorted(p.name for p in tmp_path.iterdir()) == \
            [f"f{i}.txt" for i in range(8)]
