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
