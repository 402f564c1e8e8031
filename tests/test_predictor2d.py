"""Predictor2D tests: shapes, invariances, and torch-oracle parity.

The oracle tests instantiate the REFERENCE torch implementation from
/root/reference with random weights, convert the state_dict, and require our
JAX forward pass to match elementwise — the strongest parity check possible
without the (undistributed) pretrained checkpoints.
"""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trx2dy.models.features import get_f2d, reweight, msa2pssm
from trx2dy.models.predictor2d import (
    predictor2d_apply, init_params, DEPTH,
)

HAS_REF = os.path.isdir("/root/reference/trRosettaX2")
try:
    import torch
    HAS_TORCH = True
except ImportError:  # pragma: no cover
    HAS_TORCH = False


def _rand_msa(R, L, key=0):
    rng = np.random.default_rng(key)
    msa = rng.integers(0, 21, (R, L))
    msa[0] = rng.integers(0, 20, L)
    return msa


class TestFeatures:
    def test_f2d_shape_and_layout(self):
        msa = jnp.asarray(_rand_msa(8, 10))
        f2d = get_f2d(msa)
        assert f2d.shape == (10, 10, 526)
        # first 42 dims tile along i: rows identical across j
        f = np.asarray(f2d)
        np.testing.assert_allclose(f[:, 0, :42], f[:, 5, :42])
        np.testing.assert_allclose(f[0, :, 42:84], f[5, :, 42:84])

    def test_single_sequence_dca_zero(self):
        msa = jnp.asarray(_rand_msa(1, 8))
        f2d = np.asarray(get_f2d(msa))
        assert np.abs(f2d[:, :, 84:]).max() == 0.0

    def test_reweight_identical_rows(self):
        msa = jnp.asarray(np.tile(_rand_msa(1, 12), (5, 1)))
        m1h = (jnp.arange(21) == msa[..., None]).astype(jnp.float32)
        w = np.asarray(reweight(m1h))
        np.testing.assert_allclose(w, 0.2)

    def test_pssm_sums(self):
        msa = jnp.asarray(_rand_msa(6, 9, key=3))
        m1h = (jnp.arange(21) == msa[..., None]).astype(jnp.float32)
        w = reweight(m1h)
        pssm = np.asarray(msa2pssm(m1h, w))
        assert pssm.shape == (9, 22)
        np.testing.assert_allclose(pssm[:, :21].sum(-1), 1.0, atol=1e-5)


class TestPredictor2D:
    def test_output_shapes(self):
        L, R = 9, 4
        params = init_params(jax.random.PRNGKey(0), depth=1)
        msa = jnp.asarray(_rand_msa(R, L))
        f2d = get_f2d(msa)
        out = predictor2d_apply(params, f2d, msa, depth=1)
        assert out["dist"].shape == (L, L, 37)
        assert out["omega"].shape == (L, L, 25)
        assert out["theta"].shape == (L, L, 25)
        assert out["phi"].shape == (L, L, 13)

    def test_dist_omega_symmetrized(self):
        L, R = 8, 3
        params = init_params(jax.random.PRNGKey(1), depth=1)
        msa = jnp.asarray(_rand_msa(R, L, key=2))
        out = predictor2d_apply(params, get_f2d(msa), msa, depth=1)
        d = np.asarray(out["dist"])
        o = np.asarray(out["omega"])
        np.testing.assert_allclose(d, d.transpose(1, 0, 2), atol=1e-5)
        np.testing.assert_allclose(o, o.transpose(1, 0, 2), atol=1e-5)

    def test_param_count_matches_torch_checkpoint_layout(self):
        params = init_params(jax.random.PRNGKey(0), depth=DEPTH)
        # every key must carry the DistPredictorBaseline prefix
        assert all(k.startswith("net.") for k in params)
        assert sum(np.prod(v.shape) for v in params.values()) > 5e6


@pytest.mark.skipif(not (HAS_REF and HAS_TORCH),
                    reason="reference torch code not available")
class TestTorchOracle:
    def _torch_model(self, depth):
        sys.path.insert(0, "/root/reference")
        sys.path.insert(0, "/root/reference/trRosettaX2")
        from trRosettaX2.evoutils.attn_conv import Predictor2D as TorchP2D
        torch.manual_seed(0)
        m = TorchP2D(dim=128, depth=depth, msa_tie_row_attn=True)
        m.eval()
        return m

    def test_forward_parity(self):
        depth, L, R = 2, 10, 5
        tm = self._torch_model(depth)
        f2d = torch.randn(1, L, L, 526)
        msa = torch.randint(0, 21, (1, R, L))
        with torch.no_grad():
            out_t = tm(f2d, msa.long())
        from trx2dy.models.torch_convert import state_dict_to_params
        params = state_dict_to_params(
            {f"net.{k}": v for k, v in tm.state_dict().items()})
        out_j = predictor2d_apply(params, jnp.asarray(f2d[0].numpy()),
                                  jnp.asarray(msa[0].numpy()), depth=depth)
        for k in ("dist", "omega", "theta", "phi"):
            t = out_t[k][0].numpy()
            j = np.asarray(out_j[k])
            assert np.abs(t - j).max() < 1e-4, k


class TestMixedPrecision:
    def test_bf16_trunk_close_to_f32(self):
        from trx2dy.models.predictor2d import cast_params
        params = init_params(jax.random.PRNGKey(5), depth=1)
        msa = jnp.asarray(_rand_msa(4, 10, key=5))
        f2d = get_f2d(msa)
        out32 = predictor2d_apply(params, f2d, msa, depth=1)
        out16 = predictor2d_apply(cast_params(params),
                                  f2d.astype(jnp.bfloat16), msa, depth=1)
        for k in out32:
            p32 = jax.nn.softmax(out32[k], -1)
            p16 = jax.nn.softmax(out16[k].astype(jnp.float32), -1)
            # same tolerance class as the reference's own AMP autocast
            assert float(jnp.abs(p32 - p16).max()) < 0.08, k


class TestProfiling:
    def test_phase_timer(self):
        from trx2dy.utils.profiling import PhaseTimer
        t = PhaseTimer()
        with t.phase("a"):
            sum(range(1000))
        with t.phase("a"):
            pass
        assert t.counts["a"] == 2 and "a" in t.report()
