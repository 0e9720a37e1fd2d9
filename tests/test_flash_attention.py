"""Flash-attention kernel parity tests (interpret mode on CPU; SURVEY.md §4.2).

Forward AND gradients vs the dense XLA reference, incl. GQA and rectangular
shapes. Real-TPU runs are covered by the opt-in @tpu test.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tst.kernels.flash_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fa, "_INTERPRET", True)


def _make_qkv(b=2, s=256, h=4, kvh=2, d=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype) * 0.3
    k = jnp.asarray(rng.normal(size=(b, s, kvh, d)), dtype) * 0.3
    v = jnp.asarray(rng.normal(size=(b, s, kvh, d)), dtype) * 0.3
    return q, k, v


class TestForwardParity:
    @pytest.mark.parametrize("causal", [True, False])
    def test_mha(self, causal):
        q, k, v = _make_qkv(h=4, kvh=4)
        out = fa.flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
        ref = fa.mha_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gqa(self):
        q, k, v = _make_qkv(h=8, kvh=2)
        out = fa.flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
        ref = fa.mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_multi_kv_blocks(self):
        q, k, v = _make_qkv(s=512)
        out = fa.flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
        ref = fa.mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_single_block(self):
        q, k, v = _make_qkv(s=128)
        out = fa.flash_attention(q, k, v, causal=True)
        ref = fa.mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestGradParity:
    @pytest.mark.parametrize("causal", [True, False])
    def test_grads_match_reference(self, causal):
        q, k, v = _make_qkv(b=1, s=256, h=4, kvh=2, d=32)

        def loss_flash(q, k, v):
            o = fa.flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
            return jnp.sum(o * jnp.cos(o))  # nontrivial downstream fn

        def loss_ref(q, k, v):
            o = fa.mha_reference(q, k, v, causal=causal)
            return jnp.sum(o * jnp.cos(o))

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                       err_msg=f"d{name}")

    def test_grads_under_jit_and_vmap(self):
        """The kernel must survive the trainer's vmap-over-folds + jit."""
        q, k, v = _make_qkv(b=1, s=128, h=4, kvh=2, d=32)
        qs = jnp.stack([q, q * 1.1])
        ks = jnp.stack([k, k])
        vs = jnp.stack([v, v * 0.9])

        @jax.jit
        def vloss(qs, ks, vs):
            def one(q, k, v):
                return jnp.sum(fa.flash_attention(q, k, v, block_q=128, block_k=128) ** 2)

            return jax.vmap(jax.grad(one))(qs, ks, vs)

        g = vloss(qs, ks, vs)
        assert np.isfinite(np.asarray(g)).all()


class TestFoldedGQA:
    """The folded-GQA schedule (groups into q rows, auto when block_q is not
    forced and groups*S <= FOLD_MAX_ROWS) must match the dense reference and
    the tiled schedule exactly — fwd and grads, causal and not."""

    @pytest.mark.parametrize("causal", [True, False])
    def test_forward_matches_reference(self, causal):
        # qwen-0.5b head geometry at small scale: 14 q heads, 2 kv heads
        q, k, v = _make_qkv(b=2, s=256, h=14, kvh=2, d=32)
        out = fa.flash_attention(q, k, v, causal=causal)  # folded (no blocks)
        ref = fa.mha_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_folded_equals_tiled(self):
        q, k, v = _make_qkv(b=1, s=256, h=8, kvh=2, d=32)
        folded = fa.flash_attention(q, k, v, causal=True)
        tiled = fa.flash_attention(q, k, v, causal=True, block_q=128,
                                   block_k=128)
        np.testing.assert_allclose(np.asarray(folded), np.asarray(tiled),
                                   atol=2e-5)

    def test_folded_multi_kv_tile(self):
        """block_k < S: several kv tiles per folded q block, diagonal mask
        crossing tile boundaries."""
        q, k, v = _make_qkv(b=1, s=512, h=4, kvh=2, d=32)
        out = fa.flash_attention(q, k, v, causal=True, block_k=128)
        ref = fa.mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_folded_grads_match_reference(self):
        q, k, v = _make_qkv(b=1, s=256, h=6, kvh=2, d=32)

        def loss_flash(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, causal=True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(fa.mha_reference(q, k, v, causal=True) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, err_msg=f"d{name}")

    def test_folded_grads_under_jit_and_vmap(self):
        """The trainer composes vmap(fold axis) over the FOLDED schedule —
        pin fwd+grad parity for exactly that composition."""
        q, k, v = _make_qkv(b=1, s=128, h=4, kvh=2, d=32)
        qs = jnp.stack([q, q * 1.1])
        ks = jnp.stack([k, k * 0.9])
        vs = jnp.stack([v, v])

        def one(q, k, v):  # no explicit blocks → folded path
            return jnp.sum(fa.flash_attention(q, k, v, causal=True) ** 2)

        def one_ref(q, k, v):
            return jnp.sum(fa.mha_reference(q, k, v, causal=True) ** 2)

        g = jax.jit(jax.vmap(jax.grad(one, argnums=(0, 1, 2))))(qs, ks, vs)
        gr = jax.vmap(jax.grad(one_ref, argnums=(0, 1, 2)))(qs, ks, vs)
        for a, b, name in zip(g, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, err_msg=f"d{name}")

    @pytest.mark.slow  # ~7-9 s on the 1-core host
    def test_long_seq_stays_tiled(self):
        """groups*S over the cap must fall back to the tiled schedule."""
        s = fa.FOLD_MAX_ROWS  # groups=2 → 2*s > cap
        q, k, v = _make_qkv(b=1, s=s, h=2, kvh=1, d=16)
        out = fa.flash_attention(q, k, v, causal=True)
        ref = fa.mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_prescale_off_matches_prescale_on(self, monkeypatch):
        """PRESCALE_Q folds sm_scale into the [rows, d] operand tiles; both
        paths must agree to float tolerance, fwd and grads."""
        q, k, v = _make_qkv(b=1, s=256, h=6, kvh=2, d=32)

        def run():
            def loss(q, k, v):
                return jnp.sum(fa.flash_attention(q, k, v, causal=True) ** 2)

            o = fa.flash_attention(q, k, v, causal=True)
            g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return o, g

        o1, g1 = run()
        monkeypatch.setattr(fa, "PRESCALE_Q", False)
        o0, g0 = run()
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=2e-6)
        for a, b, name in zip(g1, g0, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, err_msg=f"d{name}")

    def test_bf16_softmax_chain_tolerance(self, monkeypatch):
        """SOFTMAX_BF16 trades ~1e-2 relative probability error for VPU
        speed — pin the measured tolerance so quality drift is caught."""
        monkeypatch.setattr(fa, "SOFTMAX_BF16", True)
        q, k, v = _make_qkv(b=2, s=256, h=4, kvh=2, d=32)
        out = fa.flash_attention(q, k, v, causal=True)
        ref = fa.mha_reference(q, k, v, causal=True)
        err = np.abs(np.asarray(out) - np.asarray(ref))
        assert err.max() < 2e-2, err.max()
        # and grads still flow (backward recomputes p in f32 from the lse)
        g = jax.grad(lambda q: jnp.sum(
            fa.flash_attention(q, k, v, causal=True) ** 2))(q)
        assert np.isfinite(np.asarray(g)).all()

    def test_explicit_fold_rejects_cross_attention_shapes(self):
        """fold=True with kv seq != q seq would silently compute a wrong
        pos % S causal mask — must be rejected (ADVICE r2)."""
        q, _, _ = _make_qkv(b=1, s=128, h=4, kvh=2, d=32)
        k2, v2 = (jax.random.normal(jax.random.key(9), (1, 256, 2, 32)),
                  jax.random.normal(jax.random.key(10), (1, 256, 2, 32)))
        with pytest.raises(ValueError, match="fold=True"):
            fa.flash_attention(q, k2, v2, causal=True, fold=True)

    def test_explicit_fold_rejects_unaligned_seq(self):
        q = jax.random.normal(jax.random.key(0), (1, 192, 4, 32))
        k = jax.random.normal(jax.random.key(1), (1, 192, 2, 32))
        v = jax.random.normal(jax.random.key(2), (1, 192, 2, 32))
        with pytest.raises(ValueError, match="fold=True"):
            fa.flash_attention(q, k, v, causal=True, fold=True)


class TestModelIntegration:
    def test_decoder_with_pallas_matches_xla(self):
        from tst.models.decoder import apply_model, init_params, spec_by_name

        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        tokens = jnp.arange(256, dtype=jnp.int32)[None, :] % 300
        ref = apply_model(params, tokens, spec, use_pallas=False)
        out = apply_model(params, tokens, spec, use_pallas=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=1e-3)


@pytest.mark.tpu
class TestOnTPU:
    def test_forward_parity_tpu(self, monkeypatch):
        monkeypatch.setattr(fa, "_INTERPRET", False)
        q, k, v = _make_qkv(b=2, s=512, h=8, kvh=2, d=64, dtype=jnp.bfloat16)
        out = fa.flash_attention(q, k, v, causal=True)
        ref = fa.mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )
