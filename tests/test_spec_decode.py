"""Speculative greedy decoding: EXACTNESS vs plain greedy decode.

The whole contract of tst/models/spec_decode.py is that the committed
stream is the target model's greedy stream bit-for-bit, for ANY draft —
a good draft only changes how many rounds it takes. Every test here pins
output equality against greedy_decode (itself parity-tested vs a naive
full re-forward in test_decode.py) and checks the round accounting that
delivers the speedup.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.models.decode import greedy_decode
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec, init_lora
from tst.models.spec_decode import speculative_greedy_decode


def _prompts(rng, b=3, s=64, vocab=250):
    tokens = np.full((b, s), 256 % 384, np.int32)
    plen = rng.integers(8, 34, size=b).astype(np.int32)
    for i, L in enumerate(plen):
        tokens[i, :L] = rng.integers(0, vocab, size=L)
    return jnp.asarray(tokens), jnp.asarray(plen)


@pytest.fixture(scope="module")
def tiny():
    spec = spec_by_name("tiny", dtype=jnp.float32)
    params = init_params(jax.random.key(0), spec)
    return spec, params


class TestExactness:
    @pytest.mark.slow  # ~7-9 s on the 1-core host
    def test_self_draft_bit_equal_and_round_count(self, tiny):
        # draft == target: every round accepts all gamma proposals, so the
        # committed stream is exact AND rounds hit the ideal
        # ceil((max_new-1)/(gamma+1))
        spec, params = tiny
        tokens, plen = _prompts(np.random.default_rng(0))
        max_new, gamma = 13, 3
        want = np.asarray(greedy_decode(params, tokens, plen, max_new, spec))
        got, stats = speculative_greedy_decode(
            params, spec, params, spec, tokens, plen, max_new, gamma=gamma,
            return_stats=True)
        np.testing.assert_array_equal(np.asarray(got), want)
        ideal = -(-(max_new - 1) // (gamma + 1))
        assert int(stats["rounds"]) == ideal
        assert int(jnp.min(stats["committed"])) >= max_new

    def test_unrelated_draft_still_exact(self, tiny):
        # an independently-initialized draft agrees with the target about
        # nothing — acceptance ~0 — but the output must not change at all
        spec, params = tiny
        draft = init_params(jax.random.key(7), spec)
        tokens, plen = _prompts(np.random.default_rng(1))
        max_new = 9
        want = np.asarray(greedy_decode(params, tokens, plen, max_new, spec))
        got, stats = speculative_greedy_decode(
            draft, spec, params, spec, tokens, plen, max_new, gamma=4,
            return_stats=True)
        np.testing.assert_array_equal(np.asarray(got), want)
        # every round still commits >= 1 token (the bonus), so the loop is
        # bounded by max_new - 1 rounds
        assert int(stats["rounds"]) <= max_new - 1

    def test_perturbed_draft_exact_with_partial_acceptance(self, tiny):
        # a draft NEAR the target accepts some but not all proposals —
        # the interesting regime; output still bit-equal
        spec, params = tiny
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.key(3), len(leaves))
        noise = treedef.unflatten(
            [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
             for p, k in zip(leaves, keys)])
        tokens, plen = _prompts(np.random.default_rng(2))
        max_new, gamma = 12, 3
        want = np.asarray(greedy_decode(params, tokens, plen, max_new, spec))
        got, stats = speculative_greedy_decode(
            noise, spec, params, spec, tokens, plen, max_new, gamma=gamma,
            return_stats=True)
        np.testing.assert_array_equal(np.asarray(got), want)
        assert 1 <= int(stats["rounds"]) <= max_new - 1

    @pytest.mark.parametrize("gamma", [1, 2, 5])
    def test_gamma_sweep_exact(self, tiny, gamma):
        spec, params = tiny
        draft = init_params(jax.random.key(11), spec)
        tokens, plen = _prompts(np.random.default_rng(3))
        want = np.asarray(greedy_decode(params, tokens, plen, 7, spec))
        got = speculative_greedy_decode(
            draft, spec, params, spec, tokens, plen, 7, gamma=gamma)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_smaller_draft_geometry(self, tiny):
        # the production shape: a cheaper model (fewer layers/heads, SAME
        # tokenizer) drafts for the big one — llama3.2-1b -> llama3-8b
        spec, params = tiny
        dspec = spec_by_name("tiny", dtype=jnp.float32, n_layers=1,
                             n_heads=2, n_kv_heads=1, d_ff=64)
        draft = init_params(jax.random.key(5), dspec)
        tokens, plen = _prompts(np.random.default_rng(4))
        want = np.asarray(greedy_decode(params, tokens, plen, 8, spec))
        got = speculative_greedy_decode(
            draft, dspec, params, spec, tokens, plen, 8, gamma=4)
        np.testing.assert_array_equal(np.asarray(got), want)

    @pytest.mark.slow  # ~7-9 s on the 1-core host
    def test_lora_on_target(self, tiny):
        # held-out decode serves fold-tuned targets; the verify forward must
        # carry the LoRA delta (the draft stays base)
        spec, params = tiny
        lspec = LoraSpec(rank=4, dtype=jnp.float32)
        lora = init_lora(jax.random.key(1), spec, lspec)
        for p in lora:
            lora[p]["b"] = jax.random.normal(
                jax.random.key(2), lora[p]["b"].shape) * 0.1
        draft = init_params(jax.random.key(13), spec)
        tokens, plen = _prompts(np.random.default_rng(5))
        want = np.asarray(greedy_decode(params, tokens, plen, 6, spec,
                                        lora=lora, lora_spec=lspec))
        got = speculative_greedy_decode(
            draft, spec, params, spec, tokens, plen, 6, gamma=2,
            lora=lora, lora_spec=lspec)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_max_new_one(self, tiny):
        spec, params = tiny
        tokens, plen = _prompts(np.random.default_rng(6))
        want = np.asarray(greedy_decode(params, tokens, plen, 1, spec))
        got = speculative_greedy_decode(
            params, spec, params, spec, tokens, plen, 1, gamma=3)
        np.testing.assert_array_equal(np.asarray(got), want)


class TestGuards:
    def test_draft_vocab_wider_than_target_rejected(self, tiny):
        spec, params = tiny
        wide = spec_by_name("tiny", dtype=jnp.float32, vocab_size=512)
        draft = init_params(jax.random.key(5), wide)
        tokens, plen = _prompts(np.random.default_rng(7))
        with pytest.raises(ValueError, match="vocab"):
            speculative_greedy_decode(
                draft, wide, params, spec, tokens, plen, 4)

    def test_gamma_zero_rejected(self, tiny):
        spec, params = tiny
        tokens, plen = _prompts(np.random.default_rng(8))
        with pytest.raises(ValueError, match="gamma"):
            speculative_greedy_decode(
                params, spec, params, spec, tokens, plen, 4, gamma=0)


class TestJit:
    def test_whole_program_jits(self, tiny):
        # one jitted program: prefills + while_loop; params as arguments
        # (constants would embed weights in the module — see
        # TestDecodeCompileScaling in test_decode.py)
        spec, params = tiny
        draft = init_params(jax.random.key(21), spec)
        tokens, plen = _prompts(np.random.default_rng(9))

        fn = jax.jit(lambda dp, tp, t, pl: speculative_greedy_decode(
            dp, spec, tp, spec, t, pl, 8, gamma=3))
        got = np.asarray(fn(draft, params, tokens, plen))
        want = np.asarray(greedy_decode(params, tokens, plen, 8, spec))
        np.testing.assert_array_equal(got, want)


class TestSpecDecodePipeline:
    """perf.spec_draft_* routes the numeric/open held-out decode legs
    through fold-vmapped exact speculative decoding (VERDICT r4 item 6).
    Trajectory neutrality is the whole contract: identical s(x)."""

    def test_heldout_numeric_scoring_identical_with_draft(self, tiny):
        from tst.train.infer import score_heldout_numeric

        spec, params = tiny
        dspec = spec_by_name("small", dtype=jnp.float32)
        dparams = init_params(jax.random.key(5), dspec)
        lspec = LoraSpec(rank=4, alpha=8.0, targets=("q_proj", "v_proj"),
                         dtype=spec.dtype)
        k = 2
        keys = jax.random.split(jax.random.key(7), k)
        lora_k = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[jax.tree.map(lambda x: x + 0.02, init_lora(kk, spec, lspec))
              for kk in keys])
        rng = np.random.default_rng(0)
        n, s = 10, 64
        tokens, plen = _prompts(rng, b=n, s=s)
        answer_pos = plen - 1
        gold = rng.uniform(1, 9, size=n).astype(np.float64)
        fold_id = np.asarray([i % k for i in range(n)], np.int32)
        from tst.data.tokenize import ByteTokenizer

        tok = ByteTokenizer()
        plain = score_heldout_numeric(
            params, lora_k, spec, lspec, tokens, answer_pos, gold,
            fold_id, k, tokenizer=tok, max_new=8)
        spec_out = score_heldout_numeric(
            params, lora_k, spec, lspec, tokens, answer_pos, gold,
            fold_id, k, tokenizer=tok, max_new=8,
            draft=(dspec, dparams), gamma=2)
        np.testing.assert_array_equal(
            np.nan_to_num(plain[0], nan=-1), np.nan_to_num(spec_out[0], nan=-1))
        np.testing.assert_array_equal(
            np.nan_to_num(plain[1], nan=-1), np.nan_to_num(spec_out[1], nan=-1))

    @pytest.mark.slow  # ~22 s on the 1-core host (two full diagnose-sft runs)
    def test_diagnose_sft_trajectory_neutral(self, tmp_path):
        """End-to-end: a diagnose-sft run with perf.spec_draft_model set
        produces the same s(x) artifact as the plain run."""
        import json

        from tst.config import RunConfig
        from tst.data.adapters import load_benchmark
        from tst.train.pipeline import run_sft_diagnostic

        def run(out, spec_draft):
            cfg = RunConfig()
            cfg.data.k = 2
            cfg.data.max_len = 160
            cfg.model.name = "tiny"
            cfg.model.dtype = "float32"
            cfg.model.use_pallas = False
            cfg.lora.rank = 4
            cfg.lora.alpha = 8.0
            cfg.lora.targets = ("q_proj", "v_proj")
            cfg.optim.epochs = 2
            cfg.optim.batch_size = 8
            cfg.perf.spec_draft_model = spec_draft
            cfg.perf.spec_draft_quantize = "none"
            cfg.out_dir = str(tmp_path / out)
            ds = load_benchmark("synthetic-numeric", n=24, seed=3)
            return run_sft_diagnostic(ds, cfg)

        rep_plain = run("plain", "")
        rep_spec = run("spec", "small")
        assert rep_spec["numeric_blind_mra"] == rep_plain["numeric_blind_mra"]
        sx_p = (tmp_path / "plain" / "sx.jsonl").read_text()
        sx_s = (tmp_path / "spec" / "sx.jsonl").read_text()
        assert [json.loads(l)["s_x"] for l in sx_s.splitlines()] == \
               [json.loads(l)["s_x"] for l in sx_p.splitlines()]
