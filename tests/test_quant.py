"""int8 weights-only quantization tests (tst.models.quant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.models.decoder import apply_model, init_params, spec_by_name
from tst.models.lora import LoraSpec, init_lora
from tst.models.quant import (
    dequantize_leaf,
    is_quantized_leaf,
    quantize_leaf,
    quantize_params,
    quantized_bytes,
)


class TestQuantizeLeaf:
    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32) * 0.05
        q = quantize_leaf(w)
        assert q["q"].dtype == jnp.int8
        assert q["scale"].shape == (1, 128)
        back = dequantize_leaf(q, jnp.float32)
        err = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
        assert err < 0.02

    def test_stacked_layer_axis_scales_per_layer(self):
        w = jnp.stack([jnp.ones((8, 16)), 100 * jnp.ones((8, 16))])
        q = quantize_leaf(w)
        assert q["scale"].shape == (2, 1, 16)
        back = np.asarray(dequantize_leaf(q, jnp.float32))
        np.testing.assert_allclose(back[0], 1.0, rtol=0.01)
        np.testing.assert_allclose(back[1], 100.0, rtol=0.01)


class TestQuantizedModel:
    def test_forward_close_to_fp(self):
        spec = spec_by_name("small", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        qparams = quantize_params(params)
        assert is_quantized_leaf(qparams["layers"]["wq"])
        assert not is_quantized_leaf(qparams["layers"]["attn_norm"])
        tokens = jnp.arange(64, dtype=jnp.int32)[None, :] % 300
        ref = np.asarray(apply_model(params, tokens, spec))
        out = np.asarray(apply_model(qparams, tokens, spec))
        # weights-only int8: logits stay close; argmax largely agrees
        denom = np.abs(ref).max()
        assert np.abs(out - ref).max() / denom < 0.15
        agree = (out.argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.9, agree

    def test_memory_halves(self):
        spec = spec_by_name("small", dtype=jnp.bfloat16)
        params = init_params(jax.random.key(0), spec)
        before = quantized_bytes(params)
        qparams = quantize_params(params)  # NB: mutates in place (OOM safety)
        assert quantized_bytes(qparams) < 0.75 * before

    def test_quantized_init_never_builds_fp_tree(self):
        spec = spec_by_name("small", dtype=jnp.bfloat16)
        q = init_params(jax.random.key(0), spec, quantize=True)
        assert is_quantized_leaf(q["layers"]["wq"]) and is_quantized_leaf(q["embed"])
        assert not is_quantized_leaf(q["layers"]["attn_norm"])

    def test_quantizing_put_streams_int8(self):
        from tst.models.quant import quantizing_put

        put = quantizing_put(jnp.bfloat16)
        w = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
        leaf = put("layers.wq", w)
        assert is_quantized_leaf(leaf)
        norm = put("layers.attn_norm", np.ones((4, 16), np.float32))
        assert not is_quantized_leaf(norm)

    def test_lora_training_on_quantized_base(self):
        """Adapters must train against an int8 base (grads to LoRA only)."""
        from tst.train.sft import sft_loss_window

        spec = spec_by_name("tiny", dtype=jnp.float32)
        lspec = LoraSpec(rank=2, dtype=jnp.float32)
        params = quantize_params(init_params(jax.random.key(0), spec))
        lora = init_lora(jax.random.key(1), spec, lspec)
        tokens = jnp.arange(64, dtype=jnp.int32)[None, :] % 250
        mask = jnp.zeros((1, 64)).at[:, 30:33].set(1.0)
        pos = jnp.asarray([29], jnp.int32)
        loss, grads = jax.value_and_grad(
            lambda lo: sft_loss_window(params, lo, tokens, mask, pos, 4, spec, lspec)
        )(lora)
        assert np.isfinite(float(loss))
        gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert gnorm > 0

    def test_greedy_decode_on_quantized_base(self):
        from tst.models.decode import greedy_decode

        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        qparams = quantize_params(params)
        tokens = jnp.asarray(np.tile(np.arange(32, dtype=np.int32) % 250, (2, 1)))
        plen = jnp.asarray([32, 32], jnp.int32)
        out = greedy_decode(qparams, tokens, plen, 4, spec)
        assert out.shape == (2, 4)

    def test_pspec_tree_handles_quantized(self):
        from tst.runtime import mesh as mesh_mod

        spec = spec_by_name("tiny", dtype=jnp.float32)
        qparams = quantize_params(init_params(jax.random.key(0), spec))
        pspecs = mesh_mod.param_pspec_tree(qparams)
        from jax.sharding import PartitionSpec as P

        assert pspecs["layers"]["wq"]["q"] == P(None, "data", "tensor")
        assert pspecs["layers"]["wq"]["scale"] == P(None, None, "tensor")
        assert pspecs["embed"]["scale"] == P(None, "data")
