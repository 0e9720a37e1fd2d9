"""KV-cache greedy decode parity vs naive full re-forward (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.data.tokenize import ByteTokenizer
from tst.models.decode import decode_numeric, greedy_decode
from tst.models.decoder import apply_model, init_params, spec_by_name
from tst.models.lora import LoraSpec, init_lora


def _naive_greedy(params, tokens, prompt_len, max_new, spec, lora=None, lspec=None):
    """Reference: re-run the full forward for every generated token."""
    b, s = tokens.shape
    buf = np.zeros((b, s + max_new), np.int32)
    buf[:, :s] = np.asarray(tokens)
    lens = np.asarray(prompt_len).copy()
    outs = np.zeros((b, max_new), np.int32)
    for t in range(max_new):
        logits = apply_model(params, jnp.asarray(buf), spec, lora=lora, lora_spec=lspec)
        for i in range(b):
            nxt = int(jnp.argmax(logits[i, lens[i] - 1]))
            outs[i, t] = nxt
            buf[i, lens[i]] = nxt
            lens[i] += 1
    return outs


class TestGreedyDecode:
    def test_matches_naive(self):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        rng = np.random.default_rng(0)
        b, s = 3, 64
        tokens = np.full((b, s), 256, np.int32)  # pad id
        prompt_len = np.array([17, 33, 8], np.int32)
        for i, L in enumerate(prompt_len):
            tokens[i, :L] = rng.integers(0, 255, size=L)
        got = np.asarray(greedy_decode(params, jnp.asarray(tokens),
                                       jnp.asarray(prompt_len), 6, spec))
        want = _naive_greedy(params, jnp.asarray(tokens), prompt_len, 6, spec)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.slow  # ~7-9 s on the 1-core host
    def test_with_lora(self):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        lspec = LoraSpec(rank=4, dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        lora = init_lora(jax.random.key(1), spec, lspec)
        for p in lora:
            lora[p]["b"] = jax.random.normal(jax.random.key(2), lora[p]["b"].shape) * 0.1
        tokens = np.full((2, 64), 256, np.int32)
        tokens[0, :20] = np.arange(20) % 250
        tokens[1, :11] = (np.arange(11) * 7) % 250
        prompt_len = np.array([20, 11], np.int32)
        got = np.asarray(greedy_decode(params, jnp.asarray(tokens),
                                       jnp.asarray(prompt_len), 5, spec,
                                       lora=lora, lora_spec=lspec))
        want = _naive_greedy(params, jnp.asarray(tokens), prompt_len, 5, spec,
                             lora=lora, lspec=lspec)
        np.testing.assert_array_equal(got, want)

    def test_unroll_layer_loop_matches_scan(self, monkeypatch):
        # LAYER_LOOP="unroll" is the fast decode path on small models
        # (static per-layer cache offsets fuse; measured 3.42 -> 2.83
        # ms/step at 0.5B) — it must stay bit-identical to the scan form,
        # including LoRA
        from tst.models import decode as D

        spec = spec_by_name("tiny", dtype=jnp.float32)
        lspec = LoraSpec(rank=2, dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        lora = init_lora(jax.random.key(1), spec, lspec)
        for p in lora:
            lora[p]["b"] = jax.random.normal(
                jax.random.key(2), lora[p]["b"].shape) * 0.1
        tokens = np.full((2, 64), 256, np.int32)
        tokens[0, :20] = np.arange(20) % 250
        tokens[1, :11] = (np.arange(11) * 7) % 250
        prompt_len = jnp.array([20, 11], jnp.int32)
        assert D.LAYER_LOOP == "scan"  # module default
        want = np.asarray(greedy_decode(
            params, jnp.asarray(tokens), prompt_len, 5, spec,
            lora=lora, lora_spec=lspec))
        monkeypatch.setattr(D, "LAYER_LOOP", "unroll")
        got = np.asarray(greedy_decode(
            params, jnp.asarray(tokens), prompt_len, 5, spec,
            lora=lora, lora_spec=lspec))
        np.testing.assert_array_equal(got, want)

    def test_pad_to_too_small_rejected(self):
        # the contiguous-slot layout writes generated K/V at [s, s+max_new);
        # a smaller cache would silently clamp writes onto the last slot
        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        tokens = jnp.full((1, 64), 256, jnp.int32)
        with pytest.raises(ValueError, match="pad_to"):
            greedy_decode(params, tokens, jnp.array([8], jnp.int32), 6, spec,
                          pad_to=66)

    def test_jit_and_vmap_over_folds(self):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        lspec = LoraSpec(rank=2, dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        loras = [init_lora(jax.random.key(i), spec, lspec) for i in range(2)]
        for lo in loras:
            for p in lo:
                lo[p]["b"] = jax.random.normal(jax.random.key(9), lo[p]["b"].shape) * 0.1
        lora_k = jax.tree.map(lambda *xs: jnp.stack(xs), *loras)
        tokens = jnp.asarray(np.tile(np.arange(32, dtype=np.int32) % 250, (2, 1)))
        plen = jnp.asarray([32, 32], jnp.int32)

        @jax.jit
        def run(lora_k):
            return jax.vmap(
                lambda lo: greedy_decode(params, tokens, plen, 4, spec,
                                         lora=lo, lora_spec=lspec)
            )(lora_k)

        out = run(lora_k)
        assert out.shape == (2, 2, 4)
        for f in range(2):
            single = greedy_decode(params, tokens, plen, 4, spec,
                                   lora=loras[f], lora_spec=lspec)
            np.testing.assert_array_equal(np.asarray(out[f]), np.asarray(single))


class TestNumericParse:
    def test_parse(self):
        tok = ByteTokenizer()
        rows = [tok.encode("12.5 meters"), tok.encode("about 7"), tok.encode("dunno")]
        m = max(len(r) for r in rows)
        arr = np.full((3, m), tok.pad_id, np.int32)
        for i, r in enumerate(rows):
            arr[i, : len(r)] = r
        vals = decode_numeric(arr, tok)
        assert vals[0] == 12.5 and vals[1] == 7.0 and np.isnan(vals[2])


class TestDecodeCompileScaling:
    def test_no_model_constants_in_lowered_module(self):
        """The held-out decode program must take the model as an ARGUMENT.

        Closing over params embeds them as literal constants in the lowered
        module; XLA compile time then scales with model BYTES (measured: the
        0.5B decode program went from ~3 s to 10+ min of compile). Pin the
        property structurally: the lowered text of the infer-path decode fn
        at a wide geometry stays small (embedded f32 weights would add tens
        of MB of hex literals).
        """
        from tst.train.infer import _make_decode_fn

        spec = spec_by_name(
            "tiny", dtype=jnp.float32, d_model=512, d_ff=2048, n_heads=8,
            n_kv_heads=2, d_head=64,
        )
        params = init_params(jax.random.key(0), spec)  # ~tens of MB f32
        lspec = LoraSpec(rank=2, dtype=jnp.float32)
        lora = init_lora(jax.random.key(1), spec, lspec)
        lora_k = jax.tree.map(lambda x: x[None], lora)  # k=1 fold axis
        tokens = jnp.ones((8, 128), jnp.int32)
        plen = jnp.full((8,), 64, jnp.int32)
        idx = jnp.zeros((1, 4), jnp.int32)
        fn = _make_decode_fn(spec, lspec, max_new=4, use_pallas=False,
                             with_lora=True)
        text = fn.lower(params, lora_k, tokens, plen, idx).as_text()
        n_bytes = sum(
            int(np.prod(p.shape)) * 4 for p in jax.tree.leaves(params))
        assert n_bytes > 20e6  # the test only means something at this size
        assert len(text) < 5_000_000, (
            f"lowered module is {len(text)/1e6:.1f} MB — model weights are "
            "being embedded as constants again")


class TestHeldoutDecodeChunking:
    def test_chunk_budget_scales_with_base_bytes(self):
        """The decode-chunk cap is what a 16 GB chip has left after the base
        weights: an int4-8B base (~4.8 GB) must buy roughly twice the
        rows/fold of the int8 base (~8.0 GB), and the legacy no-base call
        must keep the conservative int8-envelope value."""
        from tst.train.infer import decode_chunk_rows

        spec8 = spec_by_name("llama3-8b")
        legacy = decode_chunk_rows(spec8, 512, 12, 5)
        int8 = decode_chunk_rows(spec8, 512, 12, 5, base_bytes=int(8.04e9))
        int4 = decode_chunk_rows(spec8, 512, 12, 5, base_bytes=int(4.76e9))
        assert legacy == int8  # 2.5 GB fallback == the int8 envelope
        assert int4 >= 2 * int8
        # 0.5B bf16 base: budget is huge, the measured 32-row cap holds
        spec0 = spec_by_name("qwen2.5-0.5b")
        assert decode_chunk_rows(spec0, 512, 12, 5,
                                 base_bytes=int(1.0e9)) == 32

    def test_chunked_matches_one_shot(self):
        """_decode_heldout_rows with a small chunk must reproduce the
        one-shot decode exactly, including when the per-fold row count is
        not a multiple of the chunk (the fixed-shape padding path added for
        VSI-scale numeric splits — the KV cache OOMs in one program)."""
        from tst.train.infer import _decode_heldout_rows

        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        lspec = LoraSpec(rank=2, dtype=jnp.float32)
        k = 2
        lora_k = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[init_lora(jax.random.key(i), spec, lspec) for i in range(k)],
        )
        rng = np.random.default_rng(1)
        n, s = 12, 48
        tokens = np.full((n, s), 256, np.int32)
        plen = rng.integers(8, 24, size=n).astype(np.int32)
        for i, L in enumerate(plen):
            tokens[i, :L] = rng.integers(0, 255, size=L)
        tokens = jnp.asarray(tokens)
        answer_pos = jnp.asarray(plen - 1)
        fold_id = np.array([0, 1] * (n // 2), np.int32)
        rows = np.arange(1, n, dtype=np.int32)  # uneven folds: 5 vs 6 rows

        kw = dict(max_new=4, use_pallas=False)
        gen1, idx1, val1 = _decode_heldout_rows(
            params, lora_k, spec, lspec, tokens, answer_pos, rows,
            fold_id, k, chunk=64, **kw)   # one shot
        gen2, idx2, val2 = _decode_heldout_rows(
            params, lora_k, spec, lspec, tokens, answer_pos, rows,
            fold_id, k, chunk=4, **kw)    # 6 rows/fold -> 4+2 (padded)
        np.testing.assert_array_equal(idx1, idx2)
        np.testing.assert_array_equal(val1, val2)
        np.testing.assert_array_equal(gen1[val1], gen2[val2])
