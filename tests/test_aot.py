"""AOT trace cache (utils/aot.py): numerics identical to the plain jit
path, disk round-trip works without re-export, staleness key behavior,
failure negative-caching, and the end-to-end staged-pipeline contract."""
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trx2dy.utils import aot


@pytest.fixture()
def aot_on(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "_ENABLED", True)
    monkeypatch.setenv("TRX2DY_AOT_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(aot, "_mem", {})
    yield str(tmp_path)


def _small_fold_args():
    from trx2dy.physics.restraints import FoldParams, compile_restraints
    from trx2dy.physics import folder as F
    from trx2dy.physics.compact import compact_restraints

    rng = np.random.default_rng(0)
    L = 24
    seq = ("ARNDCQEGHILKMFPSTWYV" * 2)[:L]
    npz = {}
    for k, nb in (("dist", 37), ("omega", 25), ("theta", 25), ("phi", 13)):
        h = rng.random((L, L, nb)).astype(np.float32)
        npz[k] = h / h.sum(-1, keepdims=True)
    rst = compile_restraints(npz, FoldParams(), use_orient=True)
    masks = F._stage_masks_centroid(rst, seq, 2, FoldParams().PCUT)[0]
    cr = compact_restraints(rst, masks)
    x = jnp.asarray(rng.standard_normal((3, 3 * L)), jnp.float32)
    freeze = jnp.zeros((3,), bool)
    w = F.weights_to_vec(F.SCOREFXN_CENT)
    return F, x, cr, w, freeze


def test_stage_programs_match_plain_path(aot_on):
    F, x, cr, w, freeze = _small_fold_args()
    ref_st = F._stage_init_jit(x, cr, None, w, freeze, nm=0)
    ref_run = F._stage_run_jit(ref_st, cr, None, w, 20)

    st = F._stage_init(x, cr, None, w, freeze, nm=0)
    run = F._stage_run(st, cr, None, w, 20)
    for a, b in zip(jax.tree.leaves(ref_run), jax.tree.leaves(run)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
    names = os.listdir(aot_on)
    assert any(n.startswith("stage_init") and n.endswith(".jaxexp")
               for n in names)
    assert any(n.startswith("stage_run") and n.endswith(".jaxexp")
               for n in names)


def test_disk_roundtrip_without_reexport(aot_on, monkeypatch):
    F, x, cr, w, freeze = _small_fold_args()
    st = F._stage_init(x, cr, None, w, freeze, nm=0)

    # fresh process simulation: drop the in-memory cache, forbid re-export
    monkeypatch.setattr(aot, "_mem", {})
    from jax import export as jex

    def boom(*a, **k):
        raise AssertionError("re-exported despite a warm disk cache")

    monkeypatch.setattr(jex, "export", boom)
    st2 = F._stage_init(x, cr, None, w, freeze, nm=0)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_source_hash_in_key(aot_on, monkeypatch):
    F, x, cr, w, freeze = _small_fold_args()
    F._stage_init(x, cr, None, w, freeze, nm=0)
    n0 = len(os.listdir(aot_on))
    monkeypatch.setattr(aot, "_src_hash", "different-source-tree")
    monkeypatch.setattr(aot, "_mem", {})
    F._stage_init(x, cr, None, w, freeze, nm=0)
    assert len(os.listdir(aot_on)) > n0   # stale key missed -> new entry


def test_export_failure_negative_cached(aot_on, monkeypatch):
    """An unexportable program must fail ONCE (with a warning), then take
    the plain path without re-paying trace+lower per call (ADVICE r3)."""
    from jax import export as jex

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("custom call off the allowlist")

    monkeypatch.setattr(jex, "export", boom)
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.arange(4.0)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        r1 = aot.aot_call("negcache", f, (x,))
        r2 = aot.aot_call("negcache", f, (x,))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(x) * 2)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(x) * 2)
    assert calls["n"] == 1, "second call re-paid the failed export"
    msgs = [str(w.message) for w in rec
            if "AOT cache disabled" in str(w.message)]
    assert len(msgs) == 1 and "negcache" in msgs[0]


def test_call_time_failure_evicts_and_falls_back(aot_on):
    """An artifact that deserializes but dies at call time must be evicted
    (mem + disk) and the plain jit path used instead (ADVICE r3)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.arange(3.0)
    aot.aot_call("rotted", f, (x,))
    entries = [(k, v) for k, v in aot._mem.items() if v is not aot._FAILED]
    assert len(entries) == 1
    key, (_call, tree) = entries[0]

    def bomb(*a):
        raise RuntimeError("jaxlib changed under the artifact")

    aot._mem[key] = (bomb, tree)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        r = aot.aot_call("rotted", f, (x,))
    np.testing.assert_array_equal(np.asarray(r), np.asarray(x) + 1)
    assert aot._mem[key] is aot._FAILED
    assert not any(n.endswith(".jaxexp") for n in os.listdir(aot_on))
    assert any("failed at call time" in str(w.message) for w in rec)


def test_python_leaf_values_keyed(aot_on):
    """Value-bearing Python leaves must be part of the key: two calls that
    differ only in a scalar config leaf may not share a cache entry."""
    def f(x, s):
        return x * s

    x = jnp.arange(3.0)
    r2 = aot.aot_call("pyleaf", f, (x, 2.0))
    r3 = aot.aot_call("pyleaf", f, (x, 3.0))
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(x) * 2)
    np.testing.assert_array_equal(np.asarray(r3), np.asarray(x) * 3)
    keys = [k for k, v in aot._mem.items() if v is not aot._FAILED]
    assert len(set(keys)) == 2


def test_object_leaves_bypass_cache(aot_on):
    """Object leaves with address-bearing reprs must NOT be value-keyed:
    each call would mint a fresh key, paying a full export + writing a new
    artifact every call (ADVICE r4). Such calls run the plain path, with a
    one-time warning, and produce correct results."""
    class Cfg:          # default repr carries the object address
        scale = 2.0

    def f(x, cfg):
        return x * cfg.scale

    x = jnp.arange(3.0)
    n_before = len(aot._mem)
    with pytest.warns(UserWarning, match="bypassed"):
        r = aot.aot_call("objleaf", f, (x, Cfg()))
    r2 = aot.aot_call("objleaf", f, (x, Cfg()))   # no second warning
    np.testing.assert_array_equal(np.asarray(r), np.asarray(x) * 2)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(x) * 2)
    assert len(aot._mem) == n_before              # no entries minted


def test_cache_dir_refuses_unsafe_permissions(tmp_path, monkeypatch):
    """A group/other-writable cache dir must be refused — the .tree
    artifact is unpickled from it (ADVICE r3 security finding)."""
    d = tmp_path / "loose"
    d.mkdir()
    os.chmod(d, 0o777)
    monkeypatch.setenv("TRX2DY_AOT_CACHE_DIR", str(d))
    with pytest.raises(RuntimeError, match="private"):
        aot._cache_dir()


def test_staged_pipeline_aot_bitidentical(aot_on):
    """VERDICT r3 item 7: drive the STAGED PIPELINE (a tiny fold_chains)
    through the AOT path and assert bit-identical results vs plain jit."""
    from trx2dy.physics.folder import fold_chains

    rng = np.random.default_rng(7)
    L = 24
    seq = ("ARNDCQEGHILKMFPSTWYV" * 2)[:L]
    npzs = []
    for _ in range(2):
        d = {}
        for k, nb in (("dist", 37), ("omega", 25), ("theta", 25),
                      ("phi", 13)):
            h = rng.random((L, L, nb)).astype(np.float32)
            d[k] = h / h.sum(-1, keepdims=True)
        npzs.append(d)
    kwargs = dict(mode=2, fastrelax=False, max_iter=40, cart_refine=False)
    key = jax.random.PRNGKey(3)

    aot._ENABLED = False
    try:
        plain = fold_chains(npzs, seq, key, **kwargs)
    finally:
        aot._ENABLED = True
    cached = fold_chains(npzs, seq, key, **kwargs)
    # entries were actually created for the stage family
    assert any(n.startswith(("stage_init", "stage_run"))
               for n in os.listdir(aot_on))
    np.testing.assert_array_equal(np.asarray(plain.energy),
                                  np.asarray(cached.energy))
    for k in plain.atoms:
        np.testing.assert_array_equal(np.asarray(plain.atoms[k]),
                                      np.asarray(cached.atoms[k]))


def test_sharded_args_fall_back_to_plain_jit(aot_on, monkeypatch):
    """dp-committed args must bypass the export path (the multichip
    invariant: exported modules pin single-device shardings)."""
    called = {}

    def spy(*a, **k):
        called["hit"] = True
        raise AssertionError("export path taken for sharded args")

    monkeypatch.setattr(aot, "_load_or_build", spy)
    F, x, cr, w, freeze = _small_fold_args()
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("dp",))
    sh = jax.sharding.NamedSharding(mesh,
                                    jax.sharding.PartitionSpec("dp"))
    x_sharded = jax.device_put(jnp.concatenate([x, x]), sh)
    freeze2 = jnp.zeros((6,), bool)
    st = F._stage_init(x_sharded, cr, None, w, freeze2, nm=0)
    assert "hit" not in called
    assert np.isfinite(np.asarray(st.f)).all()
