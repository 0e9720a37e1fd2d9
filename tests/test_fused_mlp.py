"""Fused SwiGLU MLP kernel parity (interpret mode on CPU; SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tst.kernels.fused_mlp as fm


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fm, "_INTERPRET", True)


def _make(m=256, d=64, f=256, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, d)), jnp.float32) * 0.3
    wg = jnp.asarray(rng.normal(size=(d, f)), jnp.float32) / np.sqrt(d)
    wu = jnp.asarray(rng.normal(size=(d, f)), jnp.float32) / np.sqrt(d)
    wd = jnp.asarray(rng.normal(size=(f, d)), jnp.float32) / np.sqrt(f)
    return x, wg, wu, wd


class TestForward:
    def test_parity(self):
        x, wg, wu, wd = _make()
        out = fm.fused_swiglu_mlp(x, wg, wu, wd, block_m=128, block_f=128)
        ref = fm.swiglu_reference(x, wg, wu, wd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_multi_f_blocks(self):
        x, wg, wu, wd = _make(f=512)
        out = fm.fused_swiglu_mlp(x, wg, wu, wd, block_m=128, block_f=128)
        ref = fm.swiglu_reference(x, wg, wu, wd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_3d_input(self):
        x, wg, wu, wd = _make(m=256)
        x3 = x.reshape(2, 128, -1)
        out = fm.fused_swiglu_mlp(x3, wg, wu, wd, block_m=128, block_f=128)
        assert out.shape == x3.shape
        ref = fm.swiglu_reference(x3, wg, wu, wd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestGrad:
    def test_grad_parity(self):
        x, wg, wu, wd = _make(m=128, d=32, f=128)

        def loss_fused(x, wg, wu, wd):
            return jnp.sum(fm.fused_swiglu_mlp(x, wg, wu, wd,
                                               block_m=128, block_f=128) ** 2)

        def loss_ref(x, wg, wu, wd):
            return jnp.sum(fm.swiglu_reference(x, wg, wu, wd) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, wg, wu, wd)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wg, wu, wd)
        for a, b, name in zip(gf, gr, ["x", "wg", "wu", "wd"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                       rtol=1e-3, err_msg=name)


class TestDecoderIntegration:
    def test_pallas_mlp_in_model(self):
        """use_pallas routes MLP through the fused kernel (qkvo LoRA only)."""
        import tst.kernels.flash_attention as fa

        from tst.models.decoder import apply_model, init_params, spec_by_name
        from tst.models.lora import LoraSpec, init_lora

        fa._INTERPRET = True
        try:
            spec = spec_by_name("tiny", dtype=jnp.float32)
            lspec = LoraSpec(rank=2, dtype=jnp.float32)
            params = init_params(jax.random.key(0), spec)
            lora = init_lora(jax.random.key(1), spec, lspec)
            tokens = jnp.arange(128, dtype=jnp.int32)[None, :] % 300
            ref = apply_model(params, tokens, spec, lora=lora, lora_spec=lspec,
                              use_pallas=False)
            out = apply_model(params, tokens, spec, lora=lora, lora_spec=lspec,
                              use_pallas=True, fused_mlp=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-3, rtol=1e-3)
        finally:
            fa._INTERPRET = False
