"""Regression tests for review findings: streaming int8 checkpoint load,
config-driven quantization path, and the IBP scorer pad bound."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.models.decoder import ModelSpec, apply_model, init_params
from tst.models.quant import is_quantized_leaf, quantizing_put


def _tiny_hf_checkpoint(tmp_path):
    """Write a tiny Qwen2-style safetensors checkpoint + config.json."""
    from safetensors.numpy import save_file

    d, L, H, KV, dh, F, V = 64, 2, 4, 2, 16, 128, 320
    rng = np.random.default_rng(0)
    sd = {
        "model.embed_tokens.weight": rng.normal(size=(V, d)).astype(np.float32) * 0.1,
        "model.norm.weight": np.ones(d, np.float32),
    }
    for i in range(L):
        pre = f"model.layers.{i}."
        sd[pre + "input_layernorm.weight"] = np.ones(d, np.float32)
        sd[pre + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
        sd[pre + "self_attn.q_proj.weight"] = rng.normal(size=(H * dh, d)).astype(np.float32) * 0.1
        sd[pre + "self_attn.k_proj.weight"] = rng.normal(size=(KV * dh, d)).astype(np.float32) * 0.1
        sd[pre + "self_attn.v_proj.weight"] = rng.normal(size=(KV * dh, d)).astype(np.float32) * 0.1
        sd[pre + "self_attn.o_proj.weight"] = rng.normal(size=(d, H * dh)).astype(np.float32) * 0.1
        sd[pre + "self_attn.q_proj.bias"] = np.zeros(H * dh, np.float32)
        sd[pre + "self_attn.k_proj.bias"] = np.zeros(KV * dh, np.float32)
        sd[pre + "self_attn.v_proj.bias"] = np.zeros(KV * dh, np.float32)
        sd[pre + "mlp.gate_proj.weight"] = rng.normal(size=(F, d)).astype(np.float32) * 0.1
        sd[pre + "mlp.up_proj.weight"] = rng.normal(size=(F, d)).astype(np.float32) * 0.1
        sd[pre + "mlp.down_proj.weight"] = rng.normal(size=(d, F)).astype(np.float32) * 0.1
    save_file(sd, str(tmp_path / "model.safetensors"))
    cfg = {
        "architectures": ["Qwen2ForCausalLM"], "vocab_size": V, "hidden_size": d,
        "num_hidden_layers": L, "num_attention_heads": H, "num_key_value_heads": KV,
        "intermediate_size": F, "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "tie_word_embeddings": True, "max_position_embeddings": 2048,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    return str(tmp_path)


class TestStreamingQuantLoad:
    @pytest.mark.slow  # ~11 s on the 1-core host
    def test_quantizing_put_through_load_checkpoint(self, tmp_path):
        from tst.models.hf_load import load_checkpoint, spec_from_hf_config

        ckpt = _tiny_hf_checkpoint(tmp_path)
        spec = spec_from_hf_config(ckpt)
        spec = ModelSpec(**{**spec.__dict__, "dtype": jnp.float32})
        qparams = load_checkpoint(ckpt, spec, put=quantizing_put(jnp.float32))
        assert is_quantized_leaf(qparams["embed"])
        assert is_quantized_leaf(qparams["layers"]["wq"])
        assert not is_quantized_leaf(qparams["layers"]["attn_norm"])
        # runs and stays close to the fp load
        fp = load_checkpoint(ckpt, spec, dtype=jnp.float32)
        tokens = jnp.arange(32, dtype=jnp.int32)[None, :] % 300
        out_q = np.asarray(apply_model(qparams, tokens, spec))
        out_f = np.asarray(apply_model(fp, tokens, spec))
        assert np.abs(out_q - out_f).max() / max(np.abs(out_f).max(), 1e-6) < 0.15

    def test_build_model_int8_config_path(self, tmp_path):
        from tst.config import RunConfig
        from tst.data.tokenize import ByteTokenizer
        from tst.train.pipeline import build_model

        ckpt = _tiny_hf_checkpoint(tmp_path)
        cfg = RunConfig()
        cfg.model.path = ckpt
        cfg.model.dtype = "float32"
        cfg.model.quantize = "int8"
        spec, params = build_model(cfg, ByteTokenizer())
        assert is_quantized_leaf(params["layers"]["w_gate"])
        assert spec.qkv_bias


class TestIBPPadBound:
    def test_reviewer_repro_n60_k4(self):
        """Later-round stratified folds must never exceed the scorer pad
        bound (reproduced crash: n=60, k=4, seed=1, ~10% pruned)."""
        from tst.data.folds import kfold_assign
        from tst.data.synthetic import make_synthetic_mcq

        ds = make_synthetic_mcq(n=60, bias_fraction=0.3, seed=1)
        k = 4
        n_strata = len({(s.category, s.answer_type, s.answer) for s in ds})
        pad_m = min(len(ds), int(np.ceil(len(ds) / k)) + n_strata)
        alive = np.ones(60, bool)
        rng = np.random.default_rng(0)
        for r in range(6):
            sub_idx = np.flatnonzero(alive)
            sub = ds.subset(sub_idx)
            fid = kfold_assign(sub, k, seed=1 + 1000 * r)
            assert np.bincount(fid, minlength=k).max() <= pad_m, r
            kill = rng.choice(sub_idx, size=max(len(sub_idx) // 10, 1), replace=False)
            alive[kill] = False
