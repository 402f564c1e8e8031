"""Tests for Pallas TPU kernels (interpret mode on the CPU backend)."""
import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.ops.triangle_attention import (
    triangle_attention_flash, triangle_attention_pallas,
)
from trx2dy.models.predictor2d import init_params, triangle_attention


def _exact(q, k, v, b):
    D = q.shape[-1]
    logits = jnp.einsum("rihd,rjhd->rijh", q.astype(jnp.float64),
                        k.astype(jnp.float64)) / (D ** 0.5) \
        + b.astype(jnp.float64)[None]
    attn = jax.nn.softmax(logits, axis=2)
    return jnp.einsum("rijh,rjhd->rihd", attn, v.astype(jnp.float64))


class TestFlashTriangleAttention:
    def _rand(self, L, H=4, D=32, key=0):
        ks = jax.random.split(jax.random.PRNGKey(key), 4)
        q, k, v = (jax.random.normal(ks[i], (L, L, H, D)) for i in range(3))
        b = jax.random.normal(ks[3], (L, L, H))
        return q, k, v, b

    def test_matches_exact_softmax(self):
        q, k, v, b = self._rand(12)
        exact = np.asarray(_exact(q, k, v, b), np.float32)
        flash = np.asarray(
            triangle_attention_flash(q, k, v, b, interpret=True))
        assert np.abs(exact - flash).max() < 5e-3   # f32 reduction noise

    def test_blocked_equals_single_block(self):
        q, k, v, b = self._rand(16, key=1)
        a = triangle_attention_flash(q, k, v, b, interpret=True)
        c = triangle_attention_flash(q, k, v, b, blk_i=8, blk_j=8,
                                     interpret=True)
        assert float(jnp.abs(a - c).max()) < 1e-4

    def test_padding_rows_sliced(self):
        # L not a multiple of the block: padded keys must not contribute
        q, k, v, b = self._rand(10, key=2)
        a = np.asarray(triangle_attention_flash(q, k, v, b, blk_i=8,
                                                blk_j=8, interpret=True))
        exact = np.asarray(_exact(q, k, v, b), np.float32)
        assert a.shape == (10, 10, 4, 32)
        assert np.abs(exact - a).max() < 5e-3

    def test_module_drop_in_row_and_col(self):
        params = init_params(jax.random.PRNGKey(0), depth=1)
        L = 14
        z = jax.random.normal(jax.random.PRNGKey(3), (L, L, 128))
        for wise, nm in [("row", "net.net.blocks.0.0.pair_row_attn"),
                         ("col", "net.net.blocks.0.0.pair_col_attn")]:
            ref = triangle_attention(params, nm, z, wise)
            new = triangle_attention_pallas(params, nm, z, wise,
                                            interpret=True)
            # both are f32 approximations of the same op
            assert float(jnp.abs(ref - new).max()) < 2e-2, wise
