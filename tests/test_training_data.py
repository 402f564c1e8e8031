"""Tests for the training-data path and the ESM auxiliary heads."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference/example"


class TestDataset:
    def test_labels_from_structure(self):
        from trx2dy.models.dataset import labels_from_structure
        rng = np.random.default_rng(0)
        L = 15
        ca = np.cumsum(3.8 * rng.normal(size=(L, 3)) /
                       np.linalg.norm(rng.normal(size=(L, 3)), axis=-1,
                                      keepdims=True), axis=0)
        coords = {"N": ca + [1.4, 0, 0], "CA": ca, "C": ca + [0, 1.5, 0],
                  "CB": ca + [0, 0, 1.5], "O": ca}
        labels, mask = labels_from_structure(coords, "A" * L)
        assert set(labels) == {"dist", "omega", "theta", "phi"}
        assert labels["dist"].shape == (L, L) and mask.shape == (L, L)
        assert labels["dist"].max() < 37 and labels["omega"].max() < 25
        assert mask.all()

    def test_missing_residues_masked(self):
        from trx2dy.models.dataset import labels_from_structure
        L = 8
        ca = np.arange(L * 3, dtype=float).reshape(L, 3)
        coords = {"N": ca.copy(), "CA": ca.copy(), "C": ca.copy(),
                  "CB": ca.copy(), "O": ca.copy()}
        coords["CA"][3] = np.nan
        _, mask = labels_from_structure(coords, "A" * L)
        assert not mask[3].any() and not mask[:, 3].any()

    @pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")
    def test_load_example_bundled(self):
        from trx2dy.models.dataset import load_example
        ex = load_example(f"{REF}/seq.a3m", f"{REF}/apo.pdb", msa_limit=32)
        if ex is not None:        # lengths must match for a valid pair
            assert ex.msa.shape[1] == len(ex.seq)
            assert ex.labels["dist"].shape == (len(ex.seq), len(ex.seq))


class TestESMHeads:
    def test_contact_head_shapes_and_range(self):
        from trx2dy.models.esm_msa import contact_head_apply
        rng = np.random.default_rng(1)
        C = 10
        attns = jnp.asarray(rng.normal(scale=0.1, size=(12, 12, C, C))
                            .astype(np.float32))
        params = {"contact_head.regression.weight":
                  jnp.asarray(rng.normal(size=(1, 144)).astype(np.float32)),
                  "contact_head.regression.bias": jnp.zeros((1,))}
        probs = contact_head_apply(params, attns)
        assert probs.shape == (C - 1, C - 1)   # cls sliced
        p = np.asarray(probs)
        assert (p >= 0).all() and (p <= 1).all()
