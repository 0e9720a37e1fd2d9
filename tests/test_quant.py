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


class TestInt4:
    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(256, 64)), jnp.float32) * 0.05
        q = quantize_leaf(w, bits=4)
        # storage is nibble-packed int8 ([in, out/2], planar out halves),
        # NOT jnp.int4: the axon TPU backend cannot take S4 jit arguments,
        # and planar packing is what lets qdot fuse (quant.py docstring)
        assert q["q"].dtype == jnp.int8 and q["q"].shape == (256, 32)
        assert q["scale"].shape == (2, 1, 64)  # 256/128 groups
        back = dequantize_leaf(q, jnp.float32)
        err = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
        assert err < 0.08  # 4-bit: ~half-step of 1/7 of the per-group amax

    def test_pack_unpack_exact_on_grid(self):
        """Values already on the int4 grid survive quantize→dequantize
        bit-exactly — isolates the nibble pack/unpack (incl. sign extension
        of negative nibbles) from rounding noise."""
        rng = np.random.default_rng(1)
        ints = rng.integers(-7, 8, size=(256, 32)).astype(np.float32)
        ints[0, :] = 7.0  # pin every group's amax so scale == 1/1 exactly
        ints[128, :] = 7.0
        w = jnp.asarray(ints * (1.0 / 7.0)) * 7.0  # exact small floats
        q = quantize_leaf(w, bits=4)
        back = np.asarray(dequantize_leaf(q, jnp.float32))
        np.testing.assert_array_equal(back, ints)

    def test_stacked_grouped_scales(self):
        w = jnp.stack([jnp.ones((256, 16)), 100 * jnp.ones((256, 16))])
        q = quantize_leaf(w, bits=4)
        assert q["q"].shape == (2, 256, 8) and q["scale"].shape == (2, 2, 1, 16)
        back = np.asarray(dequantize_leaf(q, jnp.float32))
        np.testing.assert_allclose(back[0], 1.0, rtol=0.01)
        np.testing.assert_allclose(back[1], 100.0, rtol=0.01)

    def test_qdot_matches_materialized_dequant(self):
        """qdot's two planar-half dots + output concat must equal the plain
        einsum against the fully dequantized weight — for packed-int4, int8,
        and plain leaves alike (the decoder/decode projections all route
        through qdot)."""
        from tst.models.quant import qdot

        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(256, 64)), jnp.float32) * 0.05
        for leaf in (quantize_leaf(w, bits=4), quantize_leaf(w, bits=8), w):
            ref = jnp.einsum("bk,kn->bn", y, dequantize_leaf(leaf, jnp.float32),
                             preferred_element_type=jnp.float32)
            got = qdot(y, leaf, jnp.float32)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-6, atol=1e-6)

    def test_indivisible_input_falls_back_to_int8(self):
        w = jnp.ones((100, 16))  # 100 % 128 != 0
        q = quantize_leaf(w, bits=4)
        # per-channel int8 (scale same rank as q), not grouped-packed int4
        assert q["q"].dtype == jnp.int8 and q["q"].shape == (100, 16)
        assert q["scale"].ndim == q["q"].ndim

    def test_embed_and_head_stay_int8(self):
        from tst.models.quant import leaf_bits

        assert leaf_bits("embed", 4) == 8 and leaf_bits("lm_head", 4) == 8
        assert leaf_bits("wq", 4) == 4 and leaf_bits("w_down", 4) == 4
        assert leaf_bits("wq", 8) == 8

    def test_init_params_int4_structure(self):
        # NB: init_params(quantize=True) draws per-layer RNG keys (so the f32
        # stack never materializes) — its weights are a DIFFERENT random draw
        # than init_params(); only structure is checked here. Forward
        # closeness is tested via quantize_params on the same tree below.
        spec = spec_by_name("small", dtype=jnp.float32)
        q4 = init_params(jax.random.key(0), spec, quantize=True, bits=4)
        wq = q4["layers"]["wq"]
        # packed: int8 storage, output axis halved, grouped scale one rank up
        assert wq["q"].dtype == jnp.int8
        assert wq["q"].shape[-2:] == (spec.d_model, spec.q_dim // 2)
        assert wq["scale"].ndim == wq["q"].ndim + 1
        # embed stays per-channel int8 by design (same rank scale, full rows)
        assert q4["embed"]["q"].dtype == jnp.int8
        assert q4["embed"]["scale"].ndim == q4["embed"]["q"].ndim
        assert q4["embed"]["q"].shape[0] == spec.vocab_size

    @pytest.mark.slow  # ~7-9 s on the 1-core host
    def test_int4_forward_matches_fake_quant(self):
        """The int4 model forward must equal a forward over the explicitly
        dequantized tree — tests the in-graph grouped-dequant wiring exactly,
        independent of quantization noise (which a random-init network
        amplifies chaotically; the noise bound itself is covered by
        test_roundtrip_error_small)."""
        from tst.models.quant import dequantize_leaf, is_quantized_leaf

        spec = spec_by_name("small", dtype=jnp.float32)
        tokens = jnp.arange(64, dtype=jnp.int32)[None, :] % 300
        q4 = quantize_params(init_params(jax.random.key(0), spec), bits=4)
        wq = q4["layers"]["wq"]
        assert wq["scale"].ndim == wq["q"].ndim + 1  # grouped-packed, no fallback

        def deq(node):
            if is_quantized_leaf(node):
                return dequantize_leaf(node, jnp.float32)
            if isinstance(node, dict):
                return {k: deq(v) for k, v in node.items()}
            return node

        out = np.asarray(apply_model(q4, tokens, spec))
        ref = np.asarray(apply_model(deq(q4), tokens, spec))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_int4_bytes_below_int8(self):
        spec = spec_by_name("small", dtype=jnp.bfloat16)
        q8 = quantized_bytes(init_params(jax.random.key(0), spec, quantize=True, bits=8))
        q4 = quantized_bytes(init_params(jax.random.key(0), spec, quantize=True, bits=4))
        assert q4 < 0.85 * q8  # embed dominates "small"; layer stack halves

    def test_pspec_tree_handles_grouped_scale(self):
        from jax.sharding import PartitionSpec as P

        from tst.runtime import mesh as mesh_mod

        spec = spec_by_name("small", dtype=jnp.float32)
        q4 = init_params(jax.random.key(0), spec, quantize=True, bits=4)
        pspecs = mesh_mod.param_pspec_tree(q4)
        assert pspecs["layers"]["wq"]["q"] == P(None, "data", "tensor")
        assert pspecs["layers"]["wq"]["scale"] == P(None, None, None, "tensor")

    @pytest.mark.slow  # ~7-9 s on the 1-core host
    def test_lora_training_on_int4_base(self):
        from tst.train.sft import sft_loss_window

        spec = spec_by_name("small", dtype=jnp.float32)
        lspec = LoraSpec(rank=2, dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec, quantize=True, bits=4)
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

    @pytest.mark.slow
    def test_diagnostic_sx_separation_survives_int4(self):
        """The premise of shipping int4 for the 8B diagnostic: quantizing the
        frozen base must not change WHICH samples the blind SFT flags. At a
        fully-planted bias both runs saturate (acc 1.0) and rankings are
        noise (fp-vs-int8 rho measured -0.53 there), so the meaningful
        invariant is at PARTIAL bias: s(x) must separate the planted-biased
        half from the clean half under the fp and int4 bases alike."""
        import tempfile

        from tst.config import RunConfig
        from tst.data.synthetic import make_synthetic_mcq
        from tst.train.pipeline import run_sft_diagnostic

        ds = make_synthetic_mcq(n=64, bias_fraction=0.5,
                                bias_kind="position", seed=0)
        planted = np.array([s.meta["planted_bias"] for s in ds])

        def sep(quantize):
            cfg = RunConfig()
            cfg.data.bench = "synthetic"
            cfg.data.k = 2
            cfg.model.name = "small"  # int4-eligible dims (tiny falls back)
            cfg.model.dtype = "float32"
            cfg.model.use_pallas = False
            cfg.model.quantize = quantize
            cfg.lora.rank = 4
            cfg.lora.alpha = 8.0
            cfg.lora.targets = ("q_proj", "v_proj")
            cfg.optim.lr = 5e-3
            cfg.optim.epochs = 6
            cfg.optim.batch_size = 16
            cfg.out_dir = tempfile.mkdtemp()
            rep = run_sft_diagnostic(ds, cfg, return_state=True)
            s_x = np.asarray(rep["_state"]["s_x"])
            return float(s_x[planted].mean() - s_x[~planted].mean())

        sep_fp, sep_q4 = sep("none"), sep("int4")
        assert sep_fp > 0.15, f"fp diagnostic lost the planted split: {sep_fp:.3f}"
        assert sep_q4 > 0.15, f"int4 lost the planted split: {sep_q4:.3f}"


class TestInt4Kernel:
    """Pallas dequant-matmul (tst.kernels.quant_matmul) — interpret-mode
    parity on CPU; the real-chip measurement lives in
    scripts/bench_8b_decode.py."""

    def _leaf(self, k=256, n=256, seed=3):
        rng = np.random.default_rng(seed)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32) * 0.05
        return w, quantize_leaf(w, bits=4)

    def test_matches_qdot(self, monkeypatch):
        from tst.kernels import quant_matmul as qm
        from tst.models.quant import qdot

        monkeypatch.setattr(qm, "_INTERPRET", True)
        w, leaf = self._leaf()
        y = jnp.asarray(np.random.default_rng(4).normal(size=(8, 256)),
                        jnp.float32)
        ref = np.asarray(qdot(y, leaf, jnp.float32))
        got = np.asarray(qm.int4_matmul(y, leaf["q"], leaf["scale"]))
        # the kernel reassociates the dequant chain differently than qdot
        # (per-block accumulation order, fused scale folding), so bit equality
        # is not expected — only float noise
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_multi_block_accumulation(self, monkeypatch):
        from tst.kernels import quant_matmul as qm
        from tst.models.quant import qdot

        monkeypatch.setattr(qm, "_INTERPRET", True)
        w, leaf = self._leaf(k=512, n=512)
        y = jnp.asarray(np.random.default_rng(5).normal(size=(16, 512)),
                        jnp.float32)
        ref = np.asarray(qdot(y, leaf, jnp.float32))
        got = np.asarray(qm.int4_matmul(y, leaf["q"], leaf["scale"],
                                        block_n=128, block_k=128))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_pipelined_body_matches_serial(self, monkeypatch):
        """The software-pipelined body (unpack/dot staggered through VMEM
        scratch) computes the exact same dots — bit-identical to the serial
        kernel, including layer-stack indexing and the epilogue grid step."""
        from tst.kernels import quant_matmul as qm

        monkeypatch.setattr(qm, "_INTERPRET", True)
        rng = np.random.default_rng(11)
        leaves = [quantize_leaf(
            jnp.asarray(rng.normal(size=(512, 256)), jnp.float32) * 0.05,
            bits=4) for _ in range(3)]
        qs = jnp.stack([lf["q"] for lf in leaves])
        ss = jnp.stack([lf["scale"] for lf in leaves])
        y = jnp.asarray(rng.normal(size=(16, 512)), jnp.float32)
        for layer in (0, 2):
            ref = np.asarray(qm.int4_matmul_stacked(
                y, qs, ss, layer, block_n=128, block_k=128, pipeline=False))
            got = np.asarray(qm.int4_matmul_stacked(
                y, qs, ss, layer, block_n=128, block_k=128, pipeline=True))
            np.testing.assert_array_equal(got, ref)

    def test_decode_step_routes_packed_to_kernel(self, monkeypatch):
        """greedy_decode(use_pallas=True) on an int4 base must produce the
        same tokens as the XLA fallback path (the router pads B to a
        sublane multiple and falls back on lane-misaligned leaves)."""
        from tst.kernels import flash_attention as fa
        from tst.kernels import quant_matmul as qm
        from tst.models.decode import greedy_decode
        from tst.models.decoder import spec_by_name

        monkeypatch.setattr(qm, "_INTERPRET", True)
        monkeypatch.setattr(fa, "_INTERPRET", True)  # flash prefill leg
        spec = spec_by_name("small", dtype=jnp.float32)
        params = quantize_params(
            init_params(jax.random.key(0), spec), bits=4)
        tokens = jnp.asarray(
            np.tile(np.arange(32, dtype=np.int32) % 250, (3, 1)))  # B=3: pad
        plen = jnp.asarray([32, 30, 32], jnp.int32)
        ref = np.asarray(greedy_decode(params, tokens, plen, 4, spec,
                                       use_pallas=False))
        got = np.asarray(greedy_decode(params, tokens, plen, 4, spec,
                                       use_pallas=True))
        np.testing.assert_array_equal(got, ref)


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
