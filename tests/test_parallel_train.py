"""Tests for the mesh/sharding helpers and the sharded training step.

Run on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trx2dy.parallel.mesh import make_mesh, data_sharding, msa_sharding
from trx2dy.models.predictor2d import init_params
from trx2dy.models.train import (
    geometry_loss, make_optimizer, init_train_state, make_train_step,
)


def _tiny_batch(B, R, L, seed=0):
    rng = np.random.default_rng(seed)
    f2d = jnp.asarray(rng.normal(size=(B, L, L, 526)).astype(np.float32))
    msa = jnp.asarray(rng.integers(0, 21, (B, R, L)))
    labels = {k: jnp.asarray(rng.integers(0, n, (B, L, L)))
              for k, n in [("dist", 37), ("omega", 25), ("theta", 25),
                           ("phi", 13)]}
    mask = jnp.ones((B, L, L), bool)
    return f2d, msa, labels, mask


class TestMesh:
    def test_shapes(self):
        mesh = make_mesh(jax.devices()[:8])
        assert mesh.shape["dp"] * mesh.shape["mp"] == 8
        assert mesh.shape["mp"] == 2

    def test_odd_device_count(self):
        mesh = make_mesh(jax.devices()[:3])
        assert mesh.shape == {"dp": 3, "mp": 1}

    def test_sharding_specs(self):
        mesh = make_mesh(jax.devices()[:4])
        assert data_sharding(mesh, 3).spec == jax.sharding.PartitionSpec(
            "dp", None, None)
        assert msa_sharding(mesh).spec == jax.sharding.PartitionSpec(
            "dp", "mp", None)


class TestTrainStep:
    def test_loss_finite_and_positive(self):
        params = init_params(jax.random.PRNGKey(0), depth=1)
        f2d, msa, labels, mask = _tiny_batch(1, 4, 8)
        loss = geometry_loss(params, f2d[0], msa[0],
                             {k: v[0] for k, v in labels.items()}, mask[0],
                             depth=1)
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_single_device_step_reduces_loss(self):
        params = init_params(jax.random.PRNGKey(1), depth=1)
        opt = make_optimizer(lr=3e-3)
        state = init_train_state(params, opt)
        step = make_train_step(opt, mesh=None, depth=1)
        batch = _tiny_batch(2, 3, 8, seed=2)
        state, l0 = step(state, *batch)
        for _ in range(5):
            state, l1 = step(state, *batch)
        assert float(l1) < float(l0)
        assert int(state.step) == 6

    def test_sharded_step_matches_unsharded(self):
        # Persistent-cache WRITES are disabled for this test: serializing
        # the 8-device SPMD executable is where the memory-map budget
        # historically ran out mid-suite (segfault in
        # compilation_cache.put_executable_and_time). conftest raises
        # vm.max_map_count when it can; skipping this one write keeps the
        # test safe where it cannot.
        old = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1e9)
        try:
            mesh = make_mesh(jax.devices()[:8])   # 4 x 2
            B, R, L = 4, 4, 8
            opt = make_optimizer(lr=1e-3)
            # donate_argnums consumes the state: independent params per path
            fresh = lambda: init_params(jax.random.PRNGKey(3), depth=1)

            step_sh = make_train_step(opt, mesh=mesh, depth=1)
            batch = _tiny_batch(B, R, L, seed=3)
            with mesh:
                state_sh, loss_sh = step_sh(init_train_state(fresh(), opt),
                                            *batch)

            step_1d = make_train_step(opt, mesh=None, depth=1)
            state_1d, loss_1d = step_1d(init_train_state(fresh(), opt),
                                        *batch)

            assert abs(float(loss_sh) - float(loss_1d)) < 1e-3
            # parameters after one step must agree across the two paths
            k = "net.conv1.weight"
            np.testing.assert_allclose(np.asarray(state_sh.params[k]),
                                       np.asarray(state_1d.params[k]),
                                       atol=1e-4)
        finally:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              old)


class TestTrainingDropout:
    def test_dropout_is_structured_and_deterministic(self):
        from trx2dy.models.predictor2d import predictor2d_apply
        params = init_params(jax.random.PRNGKey(5), depth=1)
        f2d, msa, _, _ = _tiny_batch(1, 3, 8, seed=5)
        rng = jax.random.PRNGKey(7)
        a = predictor2d_apply(params, f2d[0], msa[0], depth=1,
                              dropout_rng=rng)
        b = predictor2d_apply(params, f2d[0], msa[0], depth=1,
                              dropout_rng=rng)
        c = predictor2d_apply(params, f2d[0], msa[0], depth=1,
                              dropout_rng=jax.random.PRNGKey(8))
        d = predictor2d_apply(params, f2d[0], msa[0], depth=1)
        # same rng -> identical; different rng -> different; None -> eval path
        np.testing.assert_array_equal(np.asarray(a["dist"]),
                                      np.asarray(b["dist"]))
        assert np.abs(np.asarray(a["dist"])
                      - np.asarray(c["dist"])).max() > 0
        assert np.abs(np.asarray(a["dist"])
                      - np.asarray(d["dist"])).max() > 0

    def test_rowwise_mask_shares_rows(self):
        from trx2dy.models.predictor2d import (
            _dropout_rowwise, _dropout_columnwise)
        x = jnp.ones((16, 16, 4))
        r = np.asarray(_dropout_rowwise(jax.random.PRNGKey(0), x, 0.5))
        c = np.asarray(_dropout_columnwise(jax.random.PRNGKey(0), x, 0.5))
        # one mask broadcast across dim -3: every row identical
        assert (r == r[0:1]).all()
        assert 0.0 in r and not (r == 0).all()
        # columnwise: every column identical
        assert (c == c[:, 0:1]).all()

    def test_train_step_with_dropout_and_remat_reduces_loss(self):
        params = init_params(jax.random.PRNGKey(6), depth=1)
        opt = make_optimizer(lr=3e-3)
        state = init_train_state(params, opt)
        step = make_train_step(opt, mesh=None, depth=1, dropout=True,
                               remat=True)
        batch = _tiny_batch(2, 3, 8, seed=6)
        state, l0 = step(state, *batch)
        losses = []
        for _ in range(8):
            state, l1 = step(state, *batch)
            losses.append(float(l1))
        assert np.isfinite(losses).all()
        # dropout adds noise; compare smoothed tail vs head
        assert np.mean(losses[-3:]) < float(l0)


class TestShardedInferenceTrunk:
    def test_mp_sharded_predictor2d_matches_unsharded(self):
        """PARITY §2.3 claims MSA rows shard over 'mp' with psums inserted
        by the partitioner — execute the INFERENCE trunk sharded and assert
        numerical equality with the single-device result."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from trx2dy.models.predictor2d import predictor2d_apply

        mesh = make_mesh(jax.devices()[:8])       # dp=4, mp=2
        params = init_params(jax.random.PRNGKey(9), depth=2)
        rng = np.random.default_rng(9)
        R, L = 8, 12
        f2d = jnp.asarray(rng.normal(size=(L, L, 526)).astype(np.float32))
        msa = jnp.asarray(rng.integers(0, 21, (R, L)))

        ref = jax.jit(lambda p, f, m: predictor2d_apply(p, f, m, depth=2))(
            params, f2d, msa)

        repl = NamedSharding(mesh, P())
        msa_sh = NamedSharding(mesh, P("mp", None))   # rows over mp
        fn = jax.jit(lambda p, f, m: predictor2d_apply(p, f, m, depth=2),
                     in_shardings=(repl, repl, msa_sh),
                     out_shardings=repl)
        with mesh:
            out = fn(params, f2d, msa)
        for k in ("dist", "omega", "theta", "phi"):
            np.testing.assert_allclose(np.asarray(out[k]),
                                       np.asarray(ref[k]),
                                       atol=2e-4, rtol=1e-4)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out["dist"].shape[-1] == 37

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestShardedFold:
    # Runs in a SUBPROCESS: the SPMD fold executable is the largest
    # mapping consumer in the suite, and this jaxlib's CPU client
    # segfaults once the process's memory-map count crosses
    # vm.max_map_count (see conftest, which raises the limit when it
    # can). A fresh process resets the map count — dryrun_multichip
    # isolates itself the same way.
    _SHARDED_FOLD_SCRIPT = r"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from trx2dy.utils.cache import enable_compilation_cache
enable_compilation_cache("/tmp/trx2dy_jax_cache_tests")
from trx2dy.parallel.mesh import make_mesh
from trx2dy.parallel.decoys import fold_ensemble_sharded
rng = np.random.default_rng(4)
L = 16
seq = "ARNDCQEGHILKMFPS"
def soft(s):
    x = rng.random(s, dtype=np.float32)
    return x / x.sum(-1, keepdims=True)
npz = {{"dist": soft((L, L, 37)), "omega": soft((L, L, 25)),
        "theta": soft((L, L, 25)), "phi": soft((L, L, 13))}}
mesh = make_mesh(jax.devices()[:4], mp_size=1)
res = fold_ensemble_sharded(mesh, npz, seq, jax.random.PRNGKey(0),
                            n_decoys=8, max_iter=10, fastrelax=False)
assert res.torsions.shape == (8, 3, L), res.torsions.shape
assert np.isfinite(np.asarray(res.energy)).all()
print("SHARDED_FOLD_OK")
"""

    def test_fold_sharded_over_dp(self):
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("PALLAS_AXON_TPU_GEN", None)
        proc = subprocess.run(
            [sys.executable, "-c",
             self._SHARDED_FOLD_SCRIPT.format(repo=repo)],
            env=env, capture_output=True, text=True, timeout=1200)
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "SHARDED_FOLD_OK" in proc.stdout

    def test_indivisible_batch_rejected(self):
        from trx2dy.parallel.mesh import make_mesh
        from trx2dy.parallel.decoys import fold_ensemble_sharded
        mesh = make_mesh(jax.devices()[:4], mp_size=1)
        with pytest.raises(ValueError):
            fold_ensemble_sharded(mesh, {}, "AAAA", jax.random.PRNGKey(0),
                                  n_decoys=3)

    # Every chunk of the staged protocol must KEEP the decoy batch sharded
    # over dp — the round-1 regression was a silent de-shard at the first
    # host round-trip (folder.py lane parking / compaction), after which
    # all remaining stages ran on one device. The spy records the output
    # sharding of every _stage_run_jit chunk; STAGE_CHUNK is shrunk so the
    # run crosses many chunk boundaries AND triggers a 16 -> 8 compaction
    # repack (asserted, so the repack path itself is covered).
    _SHARD_PRESERVE_SCRIPT = r"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from trx2dy.utils.cache import enable_compilation_cache
enable_compilation_cache("/tmp/trx2dy_jax_cache_tests")
import trx2dy.physics.folder as folder
from trx2dy.parallel.mesh import make_mesh
from trx2dy.parallel.decoys import fold_ensemble_sharded

folder.STAGE_CHUNK = 5
# production gates repacking off below B=48 (executable-count economy on
# the remote-TPU tunnel); drop the gate so B=16 still exercises the
# repack path this test exists to cover
folder.LANE_REPACK_MIN_BATCH = 16
recorded = []
orig_run = folder._stage_run_jit
def spy_run(st, *a, **k):
    out = orig_run(st, *a, **k)
    recorded.append((out.x.shape[0], out.x.sharding))
    return out
folder._stage_run_jit = spy_run

rng = np.random.default_rng(4)
L = 16
seq = "ARNDCQEGHILKMFPS"
def soft(s):
    x = rng.random(s, dtype=np.float32)
    return x / x.sum(-1, keepdims=True)
npz = {{"dist": soft((L, L, 37)), "omega": soft((L, L, 25)),
        "theta": soft((L, L, 25)), "phi": soft((L, L, 13))}}
mesh = make_mesh(jax.devices()[:4], mp_size=1)
res = fold_ensemble_sharded(mesh, npz, seq, jax.random.PRNGKey(0),
                            n_decoys=16, max_iter=40, fastrelax=True)
assert recorded, "no stage chunks ran"
bad = [(s, sh) for s, sh in recorded
       if not (isinstance(sh, jax.sharding.NamedSharding)
               and sh.spec and sh.spec[0] == "dp"
               and len(sh.device_set) == 4)]
assert not bad, f"{{len(bad)}} chunk outputs lost dp sharding: {{bad[:3]}}"
sizes = {{s for s, _ in recorded}}
assert len(sizes) > 1, f"compaction repack never triggered: {{sizes}}"
for name, a in [("torsions", res.torsions), ("energy", res.energy),
                ("atoms.CA", res.atoms["CA"])]:
    sh = a.sharding
    assert isinstance(sh, jax.sharding.NamedSharding) and \
        sh.spec[0] == "dp", f"final {{name}} de-sharded: {{sh}}"
# the full-atom emit path: packed atom14 keeps the dp batch sharding
from trx2dy.physics.sidechain import pack_ensemble
with mesh:
    xyz14, _, _ = pack_ensemble(res.torsions, seq, max_iter=3,
                                backbone=res.atoms)
sh = xyz14.sharding
assert isinstance(sh, jax.sharding.NamedSharding) and \
    sh.spec[0] == "dp", f"packed atom14 de-sharded: {{sh}}"
print("SHARD_PRESERVE_OK", len(recorded), sorted(sizes))
"""

    def test_chunk_outputs_stay_dp_sharded(self):
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("PALLAS_AXON_TPU_GEN", None)
        proc = subprocess.run(
            [sys.executable, "-c",
             self._SHARD_PRESERVE_SCRIPT.format(repo=repo)],
            env=env, capture_output=True, text=True, timeout=1200)
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "SHARD_PRESERVE_OK" in proc.stdout


class TestBatchSharder:
    def test_sharded_input(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from trx2dy.physics.folder import _batch_sharder, _bucket_size
        from trx2dy.parallel.mesh import make_mesh
        mesh = make_mesh(jax.devices()[:4], mp_size=1)
        x = jax.device_put(jnp.zeros((8, 6)),
                           NamedSharding(mesh, P("dp", None)))
        put, dp = _batch_sharder(x)
        assert dp == 4
        # batch-axis-0 and batch-axis-1 recommits both span the mesh
        a = put(np.zeros((8, 3)))
        b = put(np.zeros((5, 8, 3)), 1)
        assert a.sharding.spec == P("dp", None)
        assert b.sharding.spec == P(None, "dp", None)
        # compaction buckets stay dp-divisible
        assert _bucket_size(9, dp=4) % 4 == 0
        assert _bucket_size(3, dp=4) % 4 == 0

    def test_unsharded_input_identity(self):
        from trx2dy.physics.folder import _batch_sharder
        put, dp = _batch_sharder(jnp.zeros((8, 6)))
        assert dp == 1
        out = put(np.ones((4, 2)))
        assert isinstance(out, jax.Array)

    def test_state_put_recommits_every_batch_axis(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from trx2dy.physics.folder import _batch_sharder
        from trx2dy.physics.minimize import (
            lbfgs_init, state_gather, state_put)
        from trx2dy.parallel.mesh import make_mesh
        mesh = make_mesh(jax.devices()[:4], mp_size=1)
        x = jax.device_put(
            jnp.arange(16.0).reshape(8, 2),
            NamedSharding(mesh, P("dp", None)))
        put, dp = _batch_sharder(x)
        st = lbfgs_init(lambda xx: jnp.sum(xx ** 2, -1), x)
        # the compaction repack: host gather then recommit
        st2 = state_put(state_gather(st, np.arange(4)), put)
        for name, axis in [("x", 0), ("f", 0), ("g", 0), ("s_hist", 1),
                           ("y_hist", 1), ("rho", 1), ("valid", 1),
                           ("done", 0), ("frozen", 0), ("fails", 0),
                           ("smalls", 0)]:
            sh = getattr(st2, name).sharding
            assert isinstance(sh, jax.sharding.NamedSharding), (name, sh)
            assert sh.spec[axis] == "dp", (name, sh)
