"""Ring attention parity on 8 fake devices (SURVEY.md §4.3, §5 long-context)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tst.kernels.flash_attention import mha_reference
from tst.kernels.ring_attention import _online_partial, ring_attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _make(b=1, s=512, h=4, kvh=2, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32) * 0.4
    k = jnp.asarray(rng.normal(size=(b, s, kvh, d)), jnp.float32) * 0.4
    v = jnp.asarray(rng.normal(size=(b, s, kvh, d)), jnp.float32) * 0.4
    return q, k, v


def _seq_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


class TestOnlinePartial:
    def test_full_block_matches_dense(self):
        q, k, v = _make(s=256)
        o, lse = _online_partial(q, k, v, 0, 0, True, 1.0 / np.sqrt(32), chunk=64)
        ref = mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=3e-5)

    def test_fully_masked_block(self):
        q, k, v = _make(s=128)
        # kv block lies entirely in the future of every q position
        o, lse = _online_partial(q, k, v, 0, 10_000, True, 0.18, chunk=64)
        assert (np.asarray(lse) < -1e29).all()
        np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-6)


class TestRingAttention:
    @pytest.mark.parametrize("n_dev,causal", [(4, True), (4, False), (8, True)])
    def test_matches_dense(self, n_dev, causal):
        q, k, v = _make(s=512)
        mesh = _seq_mesh(n_dev)
        out = ring_attention(q, k, v, mesh, seq_axis="seq", causal=causal, chunk=64)
        ref = mha_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    def test_gqa(self):
        q, k, v = _make(s=256, h=8, kvh=2)
        mesh = _seq_mesh(4)
        out = ring_attention(q, k, v, mesh, seq_axis="seq", chunk=64)
        ref = mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    def test_single_device_axis(self):
        q, k, v = _make(s=256)
        mesh = _seq_mesh(1)
        out = ring_attention(q, k, v, mesh, seq_axis="seq", chunk=128)
        ref = mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    @pytest.mark.slow  # ~43 s on the 1-core host
    def test_differentiable(self):
        """Long-seq *training* path: grads flow through ppermute + combine."""
        q, k, v = _make(s=256)
        mesh = _seq_mesh(4)

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention(q, k, v, mesh, seq_axis="seq", chunk=64) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gr, gd, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                       err_msg=f"d{name}")

    def test_sharded_inputs_stay_sharded(self):
        """With inputs actually placed seq-sharded, output keeps the layout."""
        q, k, v = _make(s=512)
        mesh = _seq_mesh(8)
        sh = NamedSharding(mesh, P(None, "seq", None, None))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        out = jax.jit(
            lambda a, b, c: ring_attention(a, b, c, mesh, seq_axis="seq", chunk=64)
        )(qs, ks, vs)
        assert out.sharding.spec == P(None, "seq", None, None)
        ref = mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
