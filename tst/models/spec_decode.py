"""Exact speculative greedy decoding: a cheap draft model proposes, the
target verifies — output is IDENTICAL to target-only greedy decode.

The numeric/open answer legs (reference README.md:35 benchmark list;
SURVEY.md §2b B15) and the serving path decode greedily, so speculative
decoding here is a *lossless* speedup: the target model's argmax at every
position is what gets committed, the draft only decides how many positions
one target forward can commit at once. Per round:

  1. the DRAFT decodes ``gamma`` tokens one-by-one (``gamma + 1`` single
     steps — the extra step feeds the last draft token so the draft cache
     stays slot-aligned with the target's, see below);
  2. the TARGET runs ONE ``gamma + 1``-token chunk forward over
     ``[x_last, d_1..d_gamma]`` (:func:`tst.models.decode._chunk_step`),
     yielding its greedy token after every prefix;
  3. the longest prefix of draft tokens matching the target's choices is
     committed, plus the target's own next token (the "bonus") — so every
     round commits ``accepted + 1 >= 1`` exact-greedy tokens for the price
     of ``gamma + 1`` draft steps + one target chunk forward.

TPU realization — everything is static-shaped inside one jitted
``lax.while_loop``:

  * **append-only shared cache slots**: each round writes its chunk's K/V
    at slots ``[base, base + gamma + 1)`` shared by ALL rows (one
    scalar-indexed dynamic_update_slice per layer — the same trick as
    greedy decode; a per-row compaction would need batched scatters whose
    TPU compile is pathological). Rows that reject a suffix simply never
    mark those slots valid: a carried ``[B, S]`` validity mask replaces
    slot compaction, trading a few masked cache slots for fully static
    shapes.
  * **per-row divergence is free**: rows accept different counts; their
    semantic (RoPE) positions and output columns advance per-row while the
    cache slot base advances uniformly. The cache is sized for the worst
    case (``max_new`` rounds x ``gamma+1`` slots), which is the price of
    never reshaping — at the answer-decode shapes (max_new <= 32) this is
    a few hundred slots.
  * the loop runs until every row has committed ``max_new`` tokens; each
    round commits at least one, so the trip count is bounded by
    ``max_new``.

The draft must tokenize identically to the target (same tokenizer family);
its proposed ids index the target's embedding, so ``draft.vocab_size <=
target.vocab_size`` is required (Qwen2.5-0.5B -> 7B and Llama-3.2-1B ->
Llama-3-8B both satisfy it). Correctness never depends on the draft: a
bad draft only lowers the acceptance rate.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from tst.models.decode import _chunk_step, layer_loop_for
from tst.models.decoder import ModelSpec, apply_model, lm_head_weight
from tst.models.lora import LoraSpec


def speculative_greedy_decode(
    draft_params,
    draft_spec: ModelSpec,
    target_params,
    target_spec: ModelSpec,
    tokens: jnp.ndarray,  # int32 [B, S] right-padded prompts
    prompt_len: jnp.ndarray,  # int32 [B]
    max_new: int,
    gamma: int = 4,
    lora=None,
    lora_spec: Optional[LoraSpec] = None,
    use_pallas: bool = False,
    layer_loop: Optional[str] = None,
    draft_layer_loop: Optional[str] = None,
    return_stats: bool = False,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, dict]]:
    """Greedy continuation of each prompt → int32 [B, max_new], bit-equal
    to ``greedy_decode(target_params, ...)``.

    ``gamma``: draft tokens proposed per round. ``lora``/``lora_spec``
    apply to the TARGET (the model whose outputs are committed); the draft
    runs its base weights. ``return_stats`` additionally returns
    ``{"rounds", "committed"}`` — committed counts the exact-greedy tokens
    each row accumulated (>= max_new at exit; capped rows keep counting).
    """
    if gamma < 1:
        raise ValueError(f"gamma must be >= 1, got {gamma}")
    if draft_spec.vocab_size > target_spec.vocab_size:
        raise ValueError(
            f"draft vocab ({draft_spec.vocab_size}) exceeds target vocab "
            f"({target_spec.vocab_size}); draft ids must be valid target "
            "embedding indices")
    b, s = tokens.shape
    chunk = gamma + 1
    # worst case: every round commits exactly one token -> max_new rounds,
    # each consuming `chunk` append-only slots
    slots = s + max_new * chunk
    s_max = slots + (-slots) % 128

    tgt_loop = layer_loop or layer_loop_for(target_spec)
    drf_loop = draft_layer_loop or layer_loop_for(draft_spec)

    def prefill(params, spec, lora_, lspec_):
        h, k_all, v_all = apply_model(params, tokens, spec, lora=lora_,
                                      lora_spec=lspec_, use_pallas=use_pallas,
                                      return_kv=True)
        pad = s_max - s
        k_c = jnp.pad(k_all, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        v_c = jnp.pad(v_all, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        return h, k_c, v_c

    h_t, tk, tv = prefill(target_params, target_spec, lora, lora_spec)
    _, dk, dv = prefill(draft_params, draft_spec, None, None)

    # first committed token: target argmax at the last prompt position
    h_last = jnp.take_along_axis(h_t, (prompt_len - 1)[:, None, None], axis=1)[:, 0]
    head = lm_head_weight(target_params, target_spec).astype(h_t.dtype)
    first = jnp.argmax(
        jnp.einsum("bd,dv->bv", h_last, head, preferred_element_type=jnp.float32),
        axis=-1,
    ).astype(jnp.int32)

    ar = jnp.arange(s_max, dtype=jnp.int32)
    out0 = jnp.zeros((b, max_new), jnp.int32).at[:, 0].set(first)
    state0 = dict(
        x_last=first,                       # committed, not yet fed forward
        n_out=jnp.full((b,), 1, jnp.int32),  # committed tokens per row
        pos_last=prompt_len.astype(jnp.int32),  # semantic position of x_last
        base=jnp.int32(s),                  # next shared cache slot
        valid=(ar[None, :] < prompt_len[:, None]),  # [B, S] committed slots
        out=out0,
        tk=tk, tv=tv, dk=dk, dv=dv,
        rounds=jnp.int32(0),
    )

    jpos = jnp.arange(chunk, dtype=jnp.int32)

    def cond(st):
        return (jnp.min(st["n_out"]) < max_new) & (st["base"] + chunk <= s_max)

    def body(st):
        base, valid, pos_last = st["base"], st["valid"], st["pos_last"]

        # ── draft phase: gamma+1 single steps (the last feeds d_gamma so
        # the draft cache covers every chunk slot) ──
        def draft_step(carry, j):
            cur, dk_, dv_ = carry
            # A target bonus token can exceed the draft vocab (vocab subset
            # case); clip ONLY what the draft embeds — draft inputs affect
            # acceptance, never correctness — so exactness doesn't lean on
            # backend gather-clamp behavior. `cur` stays unclipped in the
            # scan output: the target must verify the true token.
            cur_d = (jnp.minimum(cur, draft_spec.vocab_size - 1)
                     if draft_spec.vocab_size < target_spec.vocab_size
                     else cur)
            # committed slots plus this round's earlier chunk slots
            vmask = valid | ((ar[None, :] >= base) & (ar[None, :] < base + j))
            nxt, dk_, dv_ = _chunk_step(
                draft_params, None, None, draft_spec, cur_d[:, None],
                (pos_last + j)[:, None], base + j, vmask, dk_, dv_,
                layer_loop=drf_loop, use_pallas=use_pallas)
            return (nxt[:, 0], dk_, dv_), cur

        (_, dk_, dv_), chunk_inputs = jax.lax.scan(
            draft_step, (st["x_last"], st["dk"], st["dv"]), jpos)
        # chunk_inputs[j] = the token fed at slot base+j: [x_last, d_1..d_gamma]
        chunk_tok = chunk_inputs.T  # [B, chunk]
        d = chunk_tok[:, 1:]  # [B, gamma] draft proposals

        # ── target verify: ONE chunk forward over [x_last, d_1..d_gamma] ──
        pos_chunk = pos_last[:, None] + jpos[None, :]
        tgt, tk_, tv_ = _chunk_step(
            target_params, lora, lora_spec, target_spec, chunk_tok,
            pos_chunk, base, valid, st["tk"], st["tv"],
            layer_loop=tgt_loop, use_pallas=use_pallas)
        # tgt[:, j] = target greedy token after [.., x_last, d_1..d_j]

        # ── acceptance: longest prefix where the draft matched ──
        match = (d == tgt[:, :gamma]).astype(jnp.int32)  # [B, gamma]
        acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [B] in 0..gamma
        bonus = jnp.take_along_axis(tgt, acc[:, None], axis=1)[:, 0]

        # ── commit d_1..d_acc then the bonus, per row ──
        d_pad = jnp.pad(d, ((0, 0), (0, 1)))  # [B, chunk]; col gamma unused
        cand = jnp.where(jpos[None, :] < acc[:, None], d_pad,
                         bonus[:, None])  # [B, chunk]
        cols = st["n_out"][:, None] + jpos[None, :]  # [B, chunk]
        wmask = (jpos[None, :] <= acc[:, None]) & (cols < max_new)
        onehot = (cols[:, :, None] == jnp.arange(max_new, dtype=jnp.int32)[None, None, :]) & wmask[:, :, None]
        out = jnp.where(onehot.any(axis=1),
                        jnp.sum(onehot * cand[:, :, None], axis=1),
                        st["out"])

        # slots base..base+acc hold [x_last, d_1..d_acc] — all committed
        valid = valid | ((ar[None, :] >= base) &
                         (ar[None, :] - base <= acc[:, None]))
        return dict(
            x_last=bonus,
            n_out=st["n_out"] + acc + 1,
            pos_last=pos_last + acc + 1,
            base=base + chunk,
            valid=valid,
            out=out,
            tk=tk_, tv=tv_, dk=dk_, dv=dv_,
            rounds=st["rounds"] + 1,
        )

    if max_new > 1:
        state = jax.lax.while_loop(cond, body, state0)
    else:
        state = state0
    if return_stats:
        return state["out"], {"rounds": state["rounds"],
                              "committed": state["n_out"]}
    return state["out"]
