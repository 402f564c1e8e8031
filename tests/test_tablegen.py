"""Device-resident restraint compilation (physics/tablegen.py) + the union
chain path (compact.UnionRestraints, folder.fold_chains_pool).

Parity target: the host pipeline compile_restraints -> restraint_masks ->
compact_restraints_lanes (the reference gen_rst / add_rst semantics,
folding/utils_ros/utils_ros.py:6-146,706-743) — same tables, same active
sets, same energies, produced on device from lane-stacked histograms."""
import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.physics.restraints import (
    FoldParams, compile_restraints, restraint_masks, disulfide_pairs,
    add_disulfide_restraints,
)
from trx2dy.physics.compact import _bucket, compact_restraints_lanes
from trx2dy.physics.tablegen import union_compiler
from trx2dy.physics.folder import (
    fold_chains_pool, random_torsions, _stage_run_jit,
)
from trx2dy.physics.energy import (
    weights_to_vec, SCOREFXN_CENT, batched_energy_weighted_lanes,
    batched_energy_weighted_union,
)


def _rand_npz(L, key=0, cys_pair=None):
    rng = np.random.default_rng(key)

    def soft(shape):
        x = rng.random(shape).astype(np.float32)
        return x / x.sum(-1, keepdims=True)

    d = {"dist": soft((L, L, 37)), "omega": soft((L, L, 25)),
         "theta": soft((L, L, 25)), "phi": soft((L, L, 13))}
    if cys_pair is not None:
        i, j = cys_pair     # sharp ~3.75 A peak (bin 4): SS-detectable
        h = np.full(37, 1e-4, np.float32)
        h[4] = 0.9
        h /= h.sum()
        d["dist"][i, j] = d["dist"][j, i] = h
    return d


def _pool(npzs):
    return {k: jnp.stack([jnp.asarray(n[k]) for n in npzs])
            for k in ("dist", "omega", "theta", "phi")}


def _compiled(npzs, seq, mode=2, detect_disulf=False):
    comp = union_compiler(seq, FoldParams(), mode, None, True,
                          detect_disulf)
    pool = _pool(npzs)
    count_rows = np.asarray(comp.count(pool))
    assert count_rows.shape == (2, 4)
    assert (count_rows[1] >= count_rows[0]).all()   # proxy grows the set
    P = tuple(_bucket(int(c)) for c in count_rows[0])
    lane_map = jnp.arange(len(npzs), dtype=jnp.int32)
    return comp.compile(pool, lane_map, P)


class TestUnionCompiler:
    def test_masks_and_tables_match_host(self):
        L = 14
        seq = "ARNDCQEGHILKMF"
        npz = _rand_npz(L, key=41)
        rst = compile_restraints(npz)
        ur, stage_acts, r1, r2 = _compiled([npz], seq)
        fams = [(stage_acts[0], 0.05, False), (r1, 0.15, True),
                (r2, 0.30, True)]
        for fam, pc, ng in fams:
            hm = restraint_masks(rst, seq, 1, L, pcut=pc, nogly=ng)
            for name in ("dist", "omega", "theta", "phi"):
                t = getattr(ur, name)
                act = np.asarray(getattr(fam, name))[0]
                i, j = np.asarray(t.i), np.asarray(t.j)
                dev = set(zip(i[act], j[act]))
                host = set(zip(*np.nonzero(np.asarray(getattr(hm, name)))))
                assert dev == host, (name, pc)
        act0 = stage_acts[0]
        for name in ("dist", "omega", "theta", "phi"):
            t = getattr(ur, name)
            i, j = np.asarray(t.i), np.asarray(t.j)
            act = np.asarray(getattr(act0, name))[0]
            yh = np.asarray(getattr(rst, name).y)[i[act], j[act]]
            mh = np.asarray(getattr(rst, name).m)[i[act], j[act]]
            assert np.abs(np.asarray(t.y)[0][act] - yh).max() < 1e-4
            assert np.abs(np.asarray(t.m)[0][act] - mh).max() < 1e-3

    def test_disulfide_wells_match_host(self):
        L = 14
        seq = "ACNDCQEGHILKMF"       # CYS at 1 and 4
        npz = _rand_npz(L, key=41, cys_pair=(1, 4))
        rst = compile_restraints(npz)
        ss = disulfide_pairs(npz["dist"], seq)
        assert len(ss) == 1 and tuple(ss[0]) == (1, 4)
        rst = add_disulfide_restraints(rst, ss)
        ur, stage_acts, r1, r2 = _compiled([npz], seq, detect_disulf=True)
        t = ur.dist
        i, j = np.asarray(t.i), np.asarray(t.j)
        (k,) = np.where((i == 1) & (j == 4))[0]
        # the well is active at EVERY family and carries the harmonic table
        for fam in (stage_acts[0], r1, r2):
            assert np.asarray(fam.dist)[0, k]
        yh = np.asarray(rst.dist.y)[1, 4]
        assert np.abs(np.asarray(t.y)[0, k] - yh).max() < 1e-3
        # full relax2 mask parity with the SS-forced restraint set
        hm = restraint_masks(rst, seq, 1, L, pcut=0.30, nogly=True)
        act = np.asarray(r2.dist)[0]
        assert (set(zip(i[act], j[act]))
                == set(zip(*np.nonzero(np.asarray(hm.dist)))))

    def test_union_energy_matches_lanes_path(self):
        L, M = 16, 3
        seq = "ARNDCQEGHILKMFPS"
        npzs = [_rand_npz(L, key=50 + k) for k in range(M)]
        rsts = [compile_restraints(n) for n in npzs]
        masks = [restraint_masks(r, seq, 1, L, pcut=0.05) for r in rsts]
        cl = jax.tree.map(jnp.asarray, compact_restraints_lanes(rsts, masks))
        ur, stage_acts, _, _ = _compiled(npzs, seq)
        w = weights_to_vec(SCOREFXN_CENT)
        x = random_torsions(jax.random.PRNGKey(7), L, M).reshape(M, 3 * L)
        e_l, pb_l = jax.vjp(
            lambda xx: batched_energy_weighted_lanes(xx, cl, w), x)
        e_u, pb_u = jax.vjp(
            lambda xx: batched_energy_weighted_union(xx, ur, stage_acts[0],
                                                     w), x)
        np.testing.assert_allclose(np.asarray(e_l), np.asarray(e_u),
                                   rtol=1e-5)
        g_l = pb_l(jnp.ones_like(e_l))[0]
        g_u = pb_u(jnp.ones_like(e_u))[0]
        scale = float(jnp.abs(g_l).max()) + 1.0
        assert float(jnp.abs(g_l - g_u).max()) / scale < 1e-5

    def test_mode0_cumulative_stages(self):
        L = 30
        seq = ("ARNDCQEGHILKMFPSTWYV" * 2)[:L]
        npz = _rand_npz(L, key=60)
        rst = compile_restraints(npz)
        ur, stage_acts, _, _ = _compiled([npz], seq, mode=0)
        assert len(stage_acts) == 3
        for s, (s1, s2) in enumerate([(1, 12), (1, 24), (1, L)]):
            hm = restraint_masks(rst, seq, s1, s2, pcut=0.05)
            for name in ("dist", "omega", "theta", "phi"):
                t = getattr(ur, name)
                i, j = np.asarray(t.i), np.asarray(t.j)
                act = np.asarray(getattr(stage_acts[s], name))[0]
                assert (set(zip(i[act], j[act]))
                        == set(zip(*np.nonzero(
                            np.asarray(getattr(hm, name))))))


class TestFoldChainsPool:
    def test_fold_runs_with_relax_and_candidates(self):
        L = 14
        seq = "ARNDCQEGHILKMF"
        npzs = [_rand_npz(L, key=70), _rand_npz(L, key=71)]
        floors: dict = {}
        fr = fold_chains_pool(_pool(npzs), [0, 1], seq,
                              jax.random.PRNGKey(0), max_iter=8,
                              fastrelax=True, candidates=2, lane_bucket=8,
                              bucket_floors=floors)
        assert fr.torsions.shape == (2, 3, L)
        assert fr.atoms["CA"].shape == (2, L, 3)
        assert np.isfinite(np.asarray(fr.energy)).all()
        assert set(floors["all"]) == {"dist", "omega", "theta", "phi"}
        assert all(v >= 1 for v in floors["all"].values())

    def test_padded_pool_with_res_mask(self):
        L, Lp = 14, 16
        seq = "ARNDCQEGHILKMF" + "A" * (Lp - L)
        npz = _rand_npz(L, key=80)
        padded = {k: np.pad(v, [(0, Lp - L), (0, Lp - L), (0, 0)])
                  for k, v in npz.items()}
        fr = fold_chains_pool(_pool([padded]), [0], seq,
                              jax.random.PRNGKey(1), max_iter=8,
                              fastrelax=False,
                              res_mask=jnp.arange(Lp) < L, true_len=L)
        assert fr.torsions.shape == (1, 3, L)
        assert fr.atoms["CA"].shape == (1, L, 3)
        assert np.isfinite(np.asarray(fr.energy)).all()

    def test_program_shapes_stable_across_steps(self):
        """The floors ratchet must pin stage-program shapes across
        dampening steps exactly like the host path (TestBucketRatchet)."""
        L = 16
        seq = "ARNDCQEGHILKMFPS"
        floors: dict = {}
        kw = dict(mode=2, fastrelax=True, max_iter=6, bucket_floors=floors,
                  lane_bucket=4, candidates=2)
        fold_chains_pool(_pool([_rand_npz(L, key=95), _rand_npz(L, key=96)]),
                         [0, 1], seq, jax.random.PRNGKey(0), **kw)
        n_compiled = _stage_run_jit._cache_size()
        fold_chains_pool(_pool([_rand_npz(L, key=97), _rand_npz(L, key=98)]),
                         [0, 1], seq, jax.random.PRNGKey(1), **kw)
        assert _stage_run_jit._cache_size() == n_compiled
