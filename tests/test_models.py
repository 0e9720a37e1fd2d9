"""Model-core tests, incl. the HF-parity test (SURVEY.md §4.2 — "the single
most bug-catching test in this kind of build")."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.models.decoder import (
    ModelSpec,
    apply_model,
    init_params,
    param_count,
    spec_by_name,
)
from tst.models.hf_load import convert_state_dict, spec_from_hf_config
from tst.models.lora import (
    LoraSpec,
    init_lora,
    lora_param_count,
    merge_lora,
)

F32 = dict(dtype=jnp.float32)  # fp32 specs for CPU numerical parity


def _tiny_spec(**kw):
    return spec_by_name("tiny", **{**F32, **kw})


class TestDecoderBasics:
    def test_shapes_and_dtype(self):
        spec = _tiny_spec()
        params = init_params(jax.random.key(0), spec)
        tokens = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
        logits = apply_model(params, tokens, spec)
        assert logits.shape == (1, 8, spec.vocab_size)
        assert logits.dtype == jnp.float32

    def test_causality(self):
        """Changing a future token must not change past logits."""
        spec = _tiny_spec()
        params = init_params(jax.random.key(0), spec)
        t1 = jnp.array([[5, 6, 7, 8, 9, 10, 11, 12]], jnp.int32)
        t2 = t1.at[0, 5].set(99)
        l1 = apply_model(params, t1, spec)
        l2 = apply_model(params, t2, spec)
        np.testing.assert_allclose(l1[0, :5], l2[0, :5], atol=1e-5)
        assert not np.allclose(l1[0, 5:], l2[0, 5:], atol=1e-5)

    def test_remat_matches(self):
        spec = _tiny_spec()
        params = init_params(jax.random.key(0), spec)
        tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
        l1 = apply_model(params, tokens, spec, remat=False)
        l2 = apply_model(params, tokens, spec, remat=True)
        np.testing.assert_allclose(l1, l2, atol=1e-5)

    @pytest.mark.slow  # ~9 s on the 1-core host
    def test_unroll_layer_loop_matches_scan(self, monkeypatch):
        """LAYER_LOOP='unroll' (Python loop over layers) must be numerically
        identical to the default lax.scan path, for logits, KV stacks, and
        gradients (the unroll exists purely to change XLA's remat-save
        scheduling; see docs/ROADMAP.md item 2)."""
        import tst.models.decoder as decoder

        spec = _tiny_spec()
        params = init_params(jax.random.key(0), spec)
        tokens = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)

        def loss(p):
            return apply_model(p, tokens, spec, remat=True).sum()

        h_scan, k_scan, v_scan = apply_model(params, tokens, spec,
                                             return_kv=True)
        g_scan = jax.grad(loss)(params)
        assert decoder.LAYER_LOOP == "scan"
        monkeypatch.setattr(decoder, "LAYER_LOOP", "unroll")
        h_un, k_un, v_un = apply_model(params, tokens, spec,
                                       return_kv=True)
        g_un = jax.grad(loss)(params)
        # atol covers XLA fusion-order noise: an unrolled loop and a scan
        # body legally compile to different fusion schedules on CPU.
        np.testing.assert_allclose(h_scan, h_un, atol=5e-6)
        np.testing.assert_allclose(k_scan, k_un, atol=5e-6)
        np.testing.assert_allclose(v_scan, v_un, atol=5e-6)
        for ks, a, b in zip(
            jax.tree_util.tree_leaves_with_path(g_scan),
            jax.tree.leaves(g_scan),
            jax.tree.leaves(g_un),
        ):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5,
                                       err_msg=str(ks[0]))

    def test_param_count_tiny(self):
        spec = _tiny_spec()
        params = init_params(jax.random.key(0), spec)
        # embed 384*64 + 2 layers(2*64 norms + qkv/o + mlp) + final norm
        assert param_count(params) > 384 * 64

    def test_unknown_model(self):
        with pytest.raises(KeyError):
            spec_by_name("gpt5")


def _hf_logits(hf_model, tokens):
    import torch

    with torch.no_grad():
        out = hf_model(input_ids=torch.from_numpy(np.asarray(tokens)))
    return out.logits.float().numpy()


@pytest.mark.slow
class TestHFParity:
    def _compare(self, hf_model, spec, atol=2e-4):
        sd = hf_model.state_dict()
        params = convert_state_dict(sd, spec, dtype=jnp.float32)
        tokens = np.array([[3, 17, 101, 42, 8, 250, 11, 99, 7, 63]], np.int32)
        ours = np.asarray(apply_model(params, jnp.asarray(tokens), spec))
        theirs = _hf_logits(hf_model, tokens)
        np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-3)

    def test_llama_parity(self):
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            vocab_size=320, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
            attn_implementation="eager",
        )
        hf = LlamaForCausalLM(cfg).eval()
        spec = ModelSpec(
            name="t", vocab_size=320, d_model=64, n_layers=3, n_heads=4,
            n_kv_heads=2, d_head=16, d_ff=128, rms_eps=1e-5,
            rope_theta=10000.0, dtype=jnp.float32,
        )
        self._compare(hf, spec)

    def test_qwen2_parity(self):
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = Qwen2Config(
            vocab_size=320, hidden_size=64, intermediate_size=160,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-6, rope_theta=1000000.0, tie_word_embeddings=True,
            attn_implementation="eager",
        )
        hf = Qwen2ForCausalLM(cfg).eval()
        spec = ModelSpec(
            name="t", vocab_size=320, d_model=64, n_layers=2, n_heads=4,
            n_kv_heads=2, d_head=16, d_ff=160, rms_eps=1e-6,
            rope_theta=1000000.0, qkv_bias=True, tie_embeddings=True,
            dtype=jnp.float32,
        )
        self._compare(hf, spec)

    def test_llama32_rope_scaling_parity(self):
        """Llama-3.1/3.2 ship rope_type="llama3" frequency scaling; our
        rope_tables must match HF transformers' _compute_llama3_parameters
        even at short sequence (the scaling rewrites inv_freq globally)."""
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            vocab_size=320, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-5, rope_theta=500000.0, tie_word_embeddings=True,
            rope_scaling={"rope_type": "llama3", "factor": 32.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                          "original_max_position_embeddings": 8192},
            attn_implementation="eager",
        )
        hf = LlamaForCausalLM(cfg).eval()
        spec = ModelSpec(
            name="t", vocab_size=320, d_model=64, n_layers=2, n_heads=4,
            n_kv_heads=2, d_head=16, d_ff=128, rms_eps=1e-5,
            rope_theta=500000.0, tie_embeddings=True, dtype=jnp.float32,
            rope_scaling=("llama3", 32.0, 1.0, 4.0, 8192),
        )
        self._compare(hf, spec)

    def test_rope_scaling_changes_tables(self):
        from tst.models.decoder import rope_tables

        cos0, _ = rope_tables(64, 16, 500000.0)
        cos1, _ = rope_tables(64, 16, 500000.0,
                              scaling=("llama3", 32.0, 1.0, 4.0, 8192))
        assert not np.allclose(np.asarray(cos0), np.asarray(cos1))

    def test_family_specs_registered(self):
        for name in ("qwen2.5-1.5b", "qwen2.5-3b", "qwen2.5-7b",
                     "llama3.1-8b", "llama3.2-1b", "llama3.2-3b"):
            s = spec_by_name(name)
            assert s.q_dim == s.n_heads * s.d_head
            assert s.n_heads % s.n_kv_heads == 0
        assert spec_by_name("llama3.2-1b").rope_scaling[0] == "llama3"
        assert spec_by_name("qwen2.5-7b").tie_embeddings is False

    def test_spec_from_hf_config_rope_scaling(self, tmp_path):
        import json

        cfg = {
            "architectures": ["LlamaForCausalLM"], "vocab_size": 128256,
            "hidden_size": 2048, "num_hidden_layers": 16,
            "num_attention_heads": 32, "num_key_value_heads": 8,
            "head_dim": 64, "intermediate_size": 8192,
            "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
            "tie_word_embeddings": True,
            "rope_scaling": {"rope_type": "llama3", "factor": 32.0,
                             "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                             "original_max_position_embeddings": 8192},
        }
        (tmp_path / "config.json").write_text(json.dumps(cfg))
        spec = spec_from_hf_config(str(tmp_path))
        assert spec.rope_scaling == ("llama3", 32.0, 1.0, 4.0, 8192)
        ref = spec_by_name("llama3.2-1b")
        for f in ("vocab_size", "d_model", "n_layers", "n_heads",
                  "n_kv_heads", "d_head", "d_ff", "rope_scaling"):
            assert getattr(spec, f) == getattr(ref, f), f

    def test_spec_from_hf_config(self, tmp_path):
        import json

        cfg = {
            "architectures": ["Qwen2ForCausalLM"], "vocab_size": 151936,
            "hidden_size": 896, "num_hidden_layers": 24,
            "num_attention_heads": 14, "num_key_value_heads": 2,
            "intermediate_size": 4864, "rope_theta": 1000000.0,
            "rms_norm_eps": 1e-6, "tie_word_embeddings": True,
            "max_position_embeddings": 32768,
        }
        (tmp_path / "config.json").write_text(json.dumps(cfg))
        spec = spec_from_hf_config(str(tmp_path))
        ref = spec_by_name("qwen2.5-0.5b")
        for f in ("vocab_size", "d_model", "n_layers", "n_heads", "n_kv_heads",
                  "d_ff", "qkv_bias", "tie_embeddings"):
            assert getattr(spec, f) == getattr(ref, f), f


class TestLora:
    def test_zero_init_is_identity(self):
        spec = _tiny_spec()
        lspec = LoraSpec(rank=4, dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        lora = init_lora(jax.random.key(1), spec, lspec)
        tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
        base = apply_model(params, tokens, spec)
        with_lora = apply_model(params, tokens, spec, lora=lora, lora_spec=lspec)
        np.testing.assert_allclose(base, with_lora, atol=1e-6)

    def test_nonzero_b_changes_output(self):
        spec = _tiny_spec()
        lspec = LoraSpec(rank=4, dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        lora = init_lora(jax.random.key(1), spec, lspec)
        lora["q"]["b"] = jax.random.normal(jax.random.key(2), lora["q"]["b"].shape) * 0.1
        tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
        base = apply_model(params, tokens, spec)
        adapted = apply_model(params, tokens, spec, lora=lora, lora_spec=lspec)
        assert not np.allclose(base, adapted, atol=1e-5)

    def test_merge_matches_runtime(self):
        spec = _tiny_spec()
        lspec = LoraSpec(rank=4, targets=("q_proj", "v_proj", "gate_proj"), dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        lora = init_lora(jax.random.key(1), spec, lspec)
        for p in lora:
            lora[p]["b"] = jax.random.normal(jax.random.key(3), lora[p]["b"].shape) * 0.05
        tokens = jnp.array([[1, 2, 3, 4, 5]], jnp.int32)
        runtime = apply_model(params, tokens, spec, lora=lora, lora_spec=lspec)
        merged = apply_model(merge_lora(params, lora, lspec), tokens, spec)
        np.testing.assert_allclose(runtime, merged, atol=1e-4)

    def test_fold_axis_vmap(self):
        """k independent adapters as one vmapped program == k separate runs."""
        spec = _tiny_spec()
        lspec = LoraSpec(rank=2, dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        k = 3
        loras = [init_lora(jax.random.key(10 + f), spec, lspec) for f in range(k)]
        for f in range(k):
            for p in loras[f]:
                loras[f][p]["b"] = jax.random.normal(jax.random.key(50 + f), loras[f][p]["b"].shape) * 0.1
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *loras)
        tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
        batched = jax.vmap(
            lambda lo: apply_model(params, tokens, spec, lora=lo, lora_spec=lspec)
        )(stacked)
        for f in range(k):
            single = apply_model(params, tokens, spec, lora=loras[f], lora_spec=lspec)
            np.testing.assert_allclose(batched[f], single, atol=1e-5)

    def test_bad_target(self):
        with pytest.raises(ValueError):
            LoraSpec(targets=("zz_proj",))

    def test_param_count_small(self):
        spec = _tiny_spec()
        lora = init_lora(jax.random.key(0), spec, LoraSpec(rank=4))
        assert lora_param_count(lora) < 0.05 * param_count(init_params(jax.random.key(0), spec))
