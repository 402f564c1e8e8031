"""AOT trace cache (utils/aot.py): numerics identical to the plain jit
path, disk round-trip works without re-export, staleness key behavior."""
import os

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
