"""Held-out batched inference: per-option log-prob MCQ scoring (B15).

Requirement: score each sample with the fold-model that *never saw it* in
training (reference README.md:35 — k-fold CV), as "batched XLA inference over
each held-out fold" [north-star]. Design (SURVEY.md §3.1 hot loop 2):

  * MCQ answers are single tokens by construction (tst.data.tokenize), so ONE
    forward pass per sample yields all option probabilities: gather the
    logits row at ``answer_pos`` and read the option-letter token ids.
  * fold-parallel: held-out rows are padded to a common ``[k, M]`` index
    grid; ``vmap`` over the fold axis runs every fold-model on its own
    held-out slice inside one jitted program — total work is exactly N
    forwards, not k·N.
  * probabilities are softmax over the *valid* option letters only (options
    beyond a sample's count are masked), so 2-option and 10-option samples
    are comparable.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tst.models.decoder import ModelSpec, apply_model, lm_head_weight
from tst.models.lora import LoraSpec


def heldout_index_grid(fold_id: np.ndarray, k: int,
                       pad_to: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Pad each fold's held-out rows to [k, M] (+ validity mask [k, M]).

    ``pad_to`` pins M (must be >= every fold's held-out count) so shrinking
    subsets (IBP rounds) keep a constant scorer program shape."""
    rows = [np.flatnonzero(fold_id == f) for f in range(k)]
    m = pad_to or max(len(r) for r in rows)
    if max(len(r) for r in rows) > m:
        raise ValueError(f"pad_to={m} smaller than a fold's held-out count")
    idx = np.zeros((k, m), np.int32)
    valid = np.zeros((k, m), bool)
    for f, r in enumerate(rows):
        idx[f, : len(r)] = r
        valid[f, : len(r)] = True
    return idx, valid


#: (spec, lora_spec, use_pallas, batch) → jitted scorer (see FoldTrainer note)
_SCORER_CACHE: Dict = {}


def _make_chunked_fold_scorer(per_batch, batch: int):
    """Shared fold-vmapped chunked-scan scaffold for the MCQ scorers.

    ``per_batch(base, lora, tokens_bS, pos_b, opt)`` → per-row scores
    [b, C]. The wrapper pads the [k, M] held-out grid to a multiple of
    ``batch``, scans fixed-size chunks device-side (bounds memory without
    retracing), vmaps the fold axis, and unpads — one scaffold so the
    single-token and multi-token scorers cannot drift apart.
    """

    @partial(jax.jit, static_argnames=())
    def score(base, lora_k, all_tokens, all_pos, opt, idx_kM):
        k, m = idx_kM.shape
        pad = (-m) % batch
        idx_pad = jnp.pad(idx_kM, ((0, 0), (0, pad)))
        n_chunks = idx_pad.shape[1] // batch
        chunks = idx_pad.reshape(k, n_chunks, batch)

        def per_fold(lora, idx_chunks):
            def body(_, idx_b):
                return None, per_batch(base, lora, all_tokens[idx_b],
                                       all_pos[idx_b], opt)

            _, out = jax.lax.scan(body, None, idx_chunks)
            return out.reshape(n_chunks * batch, -1)[:m]  # [M, C]

        if lora_k is None:
            return jax.vmap(lambda ic: per_fold(None, ic))(chunks)
        return jax.vmap(per_fold)(lora_k, chunks)

    return score


def make_mcq_scorer(
    spec: ModelSpec,
    lora_spec: Optional[LoraSpec] = None,
    use_pallas: bool = False,
    batch: int = 32,
):
    """Returns jitted ``score(base, lora_k|None, tokens, answer_pos,
    option_ids, idx_kM)`` → letter logits [k, M, C].

    Scoring runs in fixed-size chunks of ``batch`` along M to bound memory;
    chunking happens inside one jitted scan so the dataset stays device-side.
    """
    key = (spec, lora_spec, use_pallas, batch)
    cached = _SCORER_CACHE.get(key)
    if cached is not None:
        return cached

    def forward_logits(base, lora, tokens_bS, pos_b, option_ids):
        # hidden-state gather + letter-column head projection: never builds
        # [b, S, V] logits — one [b, D] @ [D, C] matmul instead.
        h = apply_model(base, tokens_bS, spec, lora=lora, lora_spec=lora_spec,
                        use_pallas=use_pallas, return_hidden=True)
        h_at = jnp.take_along_axis(
            h, pos_b[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]  # [b, D]
        head_cols = lm_head_weight(base, spec)[:, option_ids]  # [D, C]
        return jnp.einsum("bd,dc->bc", h_at, head_cols.astype(h.dtype),
                          preferred_element_type=jnp.float32)

    score = _make_chunked_fold_scorer(forward_logits, batch)
    _SCORER_CACHE[key] = score
    return score


def letter_probs(
    letter_logits: np.ndarray,  # [k, M, C]
    n_options: np.ndarray,  # [N]
    idx: np.ndarray,  # [k, M]
    valid: np.ndarray,  # [k, M]
    n: int,
) -> np.ndarray:
    """Scatter per-fold letter logits back to [N, C] option probabilities,
    softmaxed over each sample's valid options."""
    k, m, c = letter_logits.shape
    probs = np.zeros((n, c), np.float32)
    ll = np.asarray(letter_logits, np.float32)
    for f in range(k):
        rows = idx[f][valid[f]]
        x = ll[f][valid[f]]  # [r, C]
        nopt = n_options[rows]  # [r]
        mask = np.arange(c)[None, :] < nopt[:, None]
        x = np.where(mask, x, -np.inf)
        # non-MCQ rows (nopt == 0) have no valid options: leave probs at 0
        finite = nopt > 0
        x = x - np.where(finite, x.max(-1, where=mask, initial=-1e30), 0.0)[:, None]
        e = np.where(mask, np.exp(x), 0.0)
        denom = e.sum(-1, keepdims=True)
        probs[rows] = np.where(finite[:, None], e / np.maximum(denom, 1e-30), 0.0)
    return probs


def make_mcq_scorer_multitoken(
    spec: ModelSpec,
    lora_spec: Optional[LoraSpec] = None,
    use_pallas: bool = False,
    batch: int = 8,
):
    """Multi-token option scoring fallback (VERDICT r2 weak #6): for
    tokenizers violating the " A"-is-one-token invariant, score each option
    as the SUM of per-token log-probs of its full token sequence, teacher-
    forced after the answer marker. Costs C forwards per sample (vs 1 on the
    fast path) — correct for any tokenizer, used only when needed.

    Returns jitted ``score(base, lora_k|None, tokens, answer_pos, opt_seqs
    [C, T] (-1 padded), idx_kM)`` → summed option log-probs [k, M, C].
    """
    key = ("multitoken", spec, lora_spec, use_pallas, batch)
    cached = _SCORER_CACHE.get(key)
    if cached is not None:
        return cached

    def option_logprobs(base, lora, tokens_bS, pos_b, opt_seqs):
        b, s = tokens_bS.shape
        c, t = opt_seqs.shape
        s_arange = jnp.arange(s)[None, :]  # [1, S]
        j_idx = s_arange - (pos_b[:, None] + 1)  # [b, S]: option-token slot
        in_window = (j_idx >= 0) & (j_idx < t)
        j_safe = jnp.clip(j_idx, 0, t - 1)

        def per_option(opt_c):  # opt_c: [T]
            opt_at = jnp.take(opt_c, j_safe)  # [b, S]
            toks = jnp.where(in_window & (opt_at >= 0), opt_at, tokens_bS)
            h = apply_model(base, toks, spec, lora=lora, lora_spec=lora_spec,
                            use_pallas=use_pallas, return_hidden=True)
            # predictor positions: logits at pos+j predict option token j
            gather_pos = pos_b[:, None] + jnp.arange(t)[None, :]  # [b, T]
            # an option whose real tokens extend past the padded sequence
            # cannot be teacher-forced/scored (clipping would silently read
            # position s-1's logits for the tail) — the gold target always
            # fits by tokenize's construction (keep >= len(target)), so
            # scoring a longer-than-fits distractor as -inf is safe and
            # keeps it from winning on a truncated sum
            fits = jnp.all((opt_c[None, :] < 0) | (gather_pos <= s - 1),
                           axis=1)  # [b]
            gather_pos = jnp.clip(gather_pos, 0, s - 1)
            h_at = jnp.take_along_axis(
                h, gather_pos[:, :, None].astype(jnp.int32), axis=1)  # [b,T,D]
            logits = jnp.einsum(
                "btd,dv->btv", h_at,
                lm_head_weight(base, spec).astype(h.dtype),
                preferred_element_type=jnp.float32)  # [b, T, V]
            logp = logits - jax.scipy.special.logsumexp(logits, -1,
                                                        keepdims=True)
            tok_safe = jnp.clip(opt_c, 0, None)
            tok_lp = jnp.take_along_axis(
                logp, jnp.broadcast_to(tok_safe[None, :, None], (b, t, 1)),
                axis=2)[..., 0]  # [b, T]
            summed = jnp.where(opt_c[None, :] >= 0, tok_lp, 0.0).sum(-1)
            return jnp.where(fits, summed, -1e30)  # [b]

        return jax.lax.map(per_option, opt_seqs).T  # [b, C]

    score = _make_chunked_fold_scorer(option_logprobs, batch)
    _SCORER_CACHE[key] = score
    return score


def score_heldout_mcq(
    base,
    lora_k,
    spec: ModelSpec,
    lora_spec: Optional[LoraSpec],
    tokens: jnp.ndarray,
    answer_pos: jnp.ndarray,
    option_ids: np.ndarray,
    n_options: np.ndarray,
    fold_id: np.ndarray,
    k: int,
    use_pallas: bool = False,
    batch: int = 32,
    pad_to: Optional[int] = None,
    option_seqs: Optional[np.ndarray] = None,
) -> np.ndarray:
    """End-to-end: held-out per-option probabilities [N, C]. Rows whose fold
    id is outside [0, k) (e.g. IBP-pruned rows marked -1) are never scored
    and keep prob 0.

    ``option_seqs`` ([C, T], -1 padded) activates the multi-token fallback
    scorer for tokenizers without the single-token option invariant."""
    idx, valid = heldout_index_grid(fold_id, k, pad_to=pad_to)
    if option_seqs is not None and option_seqs.shape[-1] > 1:
        scorer = make_mcq_scorer_multitoken(spec, lora_spec, use_pallas,
                                            batch=min(batch, 8))
        ll = scorer(base, lora_k, tokens, answer_pos,
                    jnp.asarray(option_seqs), jnp.asarray(idx))
    else:
        scorer = make_mcq_scorer(spec, lora_spec, use_pallas, batch)
        ll = scorer(base, lora_k, tokens, answer_pos,
                    jnp.asarray(option_ids), jnp.asarray(idx))
    return letter_probs(np.asarray(ll), n_options, idx, valid, tokens.shape[0])


def pack_heldout_mcq(tb, fold_id: np.ndarray, k: int, pack_len: int,
                     batch: int,
                     pad_rows_to: Optional[int] = None,
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """Pack each fold's held-out MCQ rows for the packed scorer.

    The unpacked scorer forwards every held-out row at the full bucket
    length — at the benchmark mix that is ~40% pad tokens plus ~25% numeric
    rows whose letter logits are discarded (they are decode-scored). Packing
    the MCQ-only held-out split reuses the trainer's first-fit packer
    (tst.data.packing.pack_rows — per-seg answer_pos/sample_rows are already
    recorded) and cuts the scoring forward FLOPs ~2× at the VSI mix.

    Deterministic given (tb, fold_id): ``tst warmup`` and the run build the
    identical [k, R, L] grid, so the warmed program is the executed one.
    Returns (ptokens [k,R,L], ppos [k,R,G], psegs [k,R,G],
    sample_rows [k,R,G]); R is padded to a multiple of ``batch``.

    ``pad_rows_to``: pad R to exactly this grid size (must be a multiple of
    ``batch``, i.e. a previously returned R) — IBP rounds pin the scorer
    grid to round 0's so the jitted program never retraces as the surviving
    set shrinks (same invariant as pack_fold_datasets' pad_rows_to).
    """
    from tst.data.packing import pack_rows
    from tst.kernels.flash_attention import MAX_SEGS, SEG_PAD

    is_mcq = tb.gold >= 0
    packs = [pack_rows(tb, np.flatnonzero((fold_id == f) & is_mcq), pack_len)
             for f in range(k)]
    r = max(max(p.n_rows for p in packs), 1)
    r += (-r) % batch
    if pad_rows_to is not None:
        if r > pad_rows_to:
            raise ValueError(
                f"packed scorer rows {r} exceed the pinned grid {pad_rows_to}"
                " — a later IBP round packed into MORE rows than round 0 "
                "(first-fit anomaly); re-pin shapes")
        r = pad_rows_to
    seg_pad_row = np.full(MAX_SEGS, SEG_PAD, np.int32)
    seg_pad_row[0] = 0  # valid empty segment so the kernels see sane starts

    def pad_rows(a, fill, template=None):
        out = np.full((r,) + a.shape[1:], fill, a.dtype)
        if template is not None:
            out[:] = template
        out[: a.shape[0]] = a
        return out

    ptokens = np.stack([pad_rows(p.tokens, tb.pad_id) for p in packs])
    ppos = np.stack([pad_rows(p.answer_pos, -1) for p in packs])
    psegs = np.stack([pad_rows(p.seg_starts, 0, template=seg_pad_row)
                      for p in packs])
    srows = np.stack([pad_rows(p.sample_rows, -1) for p in packs])
    return ptokens, ppos, psegs, srows


def packed_scorer_batch(pack_len: int) -> int:
    """Rows per scan chunk: the same ~16k-token budget as the unpacked
    scorer's 32 × 512."""
    return max(1, (32 * 512) // pack_len)


def make_mcq_scorer_packed(
    spec: ModelSpec,
    lora_spec: Optional[LoraSpec] = None,
    use_pallas: bool = False,
    batch: int = 16,
):
    """Packed-row MCQ scorer: jitted ``score(base, lora_k|None, ptokens
    [k,R,L], ppos [k,R,G], psegs [k,R,G], option_ids)`` → letter logits
    [k, R, G, C].

    One forward per PACKED row (segment-masked attention + per-segment RoPE
    restart, numerically a batch of independent samples —
    tests/test_packing.py); hidden states are gathered at every segment's
    answer slot and projected onto the option-letter head columns only.
    """
    key = ("packed", spec, lora_spec, use_pallas, batch)
    cached = _SCORER_CACHE.get(key)
    if cached is not None:
        return cached

    @jax.jit
    def score(base, lora_k, ptokens, ppos, psegs, option_ids):
        k, r, s = ptokens.shape
        g = ppos.shape[-1]
        n_chunks = r // batch

        def per_fold(lora, tok_f, pos_f, seg_f):
            def body(_, args):
                tok_b, pos_b, seg_b = args
                h = apply_model(base, tok_b, spec, lora=lora,
                                lora_spec=lora_spec, use_pallas=use_pallas,
                                return_hidden=True, seg_starts=seg_b)
                pos_safe = jnp.clip(pos_b, 0, s - 1).astype(jnp.int32)
                h_at = jnp.take_along_axis(h, pos_safe[:, :, None], axis=1)
                head_cols = lm_head_weight(base, spec)[:, option_ids]
                return None, jnp.einsum(
                    "bgd,dc->bgc", h_at, head_cols.astype(h.dtype),
                    preferred_element_type=jnp.float32)

            _, out = jax.lax.scan(
                body, None,
                (tok_f.reshape(n_chunks, batch, s),
                 pos_f.reshape(n_chunks, batch, g),
                 seg_f.reshape(n_chunks, batch, g)))
            return out.reshape(r, g, -1)

        if lora_k is None:
            return jax.vmap(lambda t, p, sg: per_fold(None, t, p, sg))(
                ptokens, ppos, psegs)
        return jax.vmap(per_fold)(lora_k, ptokens, ppos, psegs)

    _SCORER_CACHE[key] = score
    return score


def score_heldout_mcq_packed(
    base,
    lora_k,
    spec: ModelSpec,
    lora_spec: Optional[LoraSpec],
    tb,
    fold_id: np.ndarray,
    k: int,
    pack_len: int,
    use_pallas: bool = False,
    batch: Optional[int] = None,
    pad_rows_to: Optional[int] = None,
) -> np.ndarray:
    """End-to-end packed variant of :func:`score_heldout_mcq`: held-out
    per-option probabilities [N, C]; non-MCQ rows and rows whose fold id is
    outside [0, k) keep prob 0. Single-token options only (the multi-token
    fallback keeps the unpacked path). ``pad_rows_to`` pins the packed grid
    shape across IBP rounds (see :func:`pack_heldout_mcq`)."""
    b = batch or packed_scorer_batch(pack_len)
    ptokens, ppos, psegs, srows = pack_heldout_mcq(tb, fold_id, k, pack_len, b,
                                                   pad_rows_to=pad_rows_to)
    scorer = make_mcq_scorer_packed(spec, lora_spec, use_pallas, batch=b)
    ll = scorer(base, lora_k, jnp.asarray(ptokens), jnp.asarray(ppos),
                jnp.asarray(psegs), jnp.asarray(tb.option_token_ids))
    kk, r, g, c = ll.shape
    flat = np.asarray(ll).reshape(kk, r * g, c)
    idx = srows.reshape(kk, r * g)
    valid = idx >= 0
    return letter_probs(flat, tb.n_options, np.where(valid, idx, 0), valid,
                        tb.n)


#: (spec, lora_spec, max_new, use_pallas, with_lora) → jitted decode program
_DECODE_CACHE: Dict = {}


def decode_chunk_rows(spec: ModelSpec, seq_len: int, max_new: int,
                      k: int, base_bytes: Optional[int] = None,
                      draft_spec: Optional[ModelSpec] = None) -> int:
    """Rows-per-fold chunk for held-out decode. The KV cache is the dominant
    allocation (k·rows × [L, S+pad, KVH, dh] × 2); its budget is what a
    16 GB chip has left after the base weights (~10.5 GB for base+cache,
    the envelope the measured int8-8B point sits in): 32 rows/fold at 0.5B,
    5 at 8B-int8, ~11 at 8B-int4 — decode is weight-read-bound at 8B, so
    rows freed by a smaller base amortize the read directly (int4 B=32
    measured 2,255 steps-only tok/s vs 1,380 at B=16, docs/RESULTS.md).
    Without ``base_bytes`` the budget falls back to the conservative 2.5 GB
    (= the int8-8B envelope). Shared by the real run
    (:func:`_decode_heldout_rows`) and ``tst warmup`` so the warmup
    compiles the SAME [k, chunk] decode program the run later executes."""
    s_max = seq_len + max_new + (-max_new) % 128
    itemsize = jnp.dtype(spec.dtype).itemsize  # cache lives in spec.dtype
    row_bytes = (spec.n_layers * s_max * spec.n_kv_heads * spec.d_head
                 * 2 * itemsize)  # K + V
    if draft_spec is not None:
        # speculative path: the draft keeps its own per-row cache over the
        # same slot range (draft weights ride in base_bytes)
        row_bytes += (draft_spec.n_layers * s_max * draft_spec.n_kv_heads
                      * draft_spec.d_head * 2
                      * jnp.dtype(draft_spec.dtype).itemsize)
    budget = 2.5e9 if base_bytes is None else max(1.5e9, 10.5e9 - base_bytes)
    return max(1, min(32, int(budget / max(k * row_bytes, 1))))


def _make_decode_fn(spec, lora_spec, max_new: int, use_pallas: bool,
                    with_lora: bool):
    """Jitted fold-vmapped greedy decode with EVERYTHING as arguments.

    Closing over ``base``/``tokens`` (the obvious one-liner) embeds the full
    model as literal constants in the lowered module — XLA compile time then
    scales with model BYTES, not program size (measured: the 0.5B decode
    program goes from 3 s to 10+ min of compile). Model/data must flow
    through the jit boundary as arguments.
    """
    key = (spec, lora_spec, max_new, use_pallas, with_lora)
    cached = _DECODE_CACHE.get(key)
    if cached is not None:
        return cached
    from tst.models.decode import greedy_decode, layer_loop_for

    loop = layer_loop_for(spec, fold_vmapped=True)

    @jax.jit
    def decode_all(base, lora_k, all_tokens, prompt_len, idx_kM):
        def per_fold(lora, idx_f):
            return greedy_decode(
                base, all_tokens[idx_f], prompt_len[idx_f], max_new, spec,
                lora=lora, lora_spec=lora_spec, use_pallas=use_pallas,
                layer_loop=loop,
            )

        if not with_lora:
            return jax.vmap(lambda i: per_fold(None, i))(idx_kM)
        return jax.vmap(per_fold)(lora_k, idx_kM)

    _DECODE_CACHE[key] = decode_all
    return decode_all


def _make_spec_decode_fn(spec, dspec, lora_spec, max_new: int, gamma: int,
                         use_pallas: bool, with_lora: bool):
    """Jitted fold-vmapped EXACT speculative decode (perf.spec_draft_*).

    Bit-identical to :func:`_make_decode_fn`'s output by construction
    (tst/models/spec_decode.py invariant — vmapped exactness pinned by
    TestSpecDecodePipeline), so routing the numeric/open scoring legs
    through it is trajectory-neutral. The draft is base-weighted and
    SHARED across folds; only the target carries the per-fold adapters —
    draft quality affects acceptance, never correctness. Same
    jit-boundary rule as _make_decode_fn: params flow as arguments.
    """
    key = (spec, dspec, lora_spec, max_new, gamma, use_pallas, with_lora,
           "spec")
    cached = _DECODE_CACHE.get(key)
    if cached is not None:
        return cached
    from tst.models.decode import layer_loop_for
    from tst.models.spec_decode import speculative_greedy_decode

    loop = layer_loop_for(spec, fold_vmapped=True)
    dloop = layer_loop_for(dspec, fold_vmapped=True)

    @jax.jit
    def decode_all(base, dbase, lora_k, all_tokens, prompt_len, idx_kM):
        def per_fold(lora, idx_f):
            return speculative_greedy_decode(
                dbase, dspec, base, spec, all_tokens[idx_f],
                prompt_len[idx_f], max_new, gamma=gamma, lora=lora,
                lora_spec=lora_spec, use_pallas=use_pallas,
                layer_loop=loop, draft_layer_loop=dloop,
            )

        if not with_lora:
            return jax.vmap(lambda i: per_fold(None, i))(idx_kM)
        return jax.vmap(per_fold)(lora_k, idx_kM)

    _DECODE_CACHE[key] = decode_all
    return decode_all


def _decode_heldout_rows(
    base, lora_k, spec, lora_spec, tokens, answer_pos, rows: np.ndarray,
    fold_id: np.ndarray, k: int, max_new: int, use_pallas: bool,
    pad_to: Optional[int] = None,
    chunk: Optional[int] = None,
    draft=None,  # (draft_spec, draft_params) → exact speculative decode
    gamma: int = 2,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy-decode the given rows with each row's held-out fold model.

    Rows are padded to a common [k, M] grid and decoded in fixed-shape
    chunks of ``chunk`` rows per fold: the KV cache is the dominant
    allocation (k·M rows × [L, S+pad, KVH, dh] × 2), and decoding a full
    VSI-scale numeric split in one program OOMs — at n=5000/k=5 the cache
    alone is ~10 GB at 8B. One [k, chunk] program compiles once and is
    reused across chunks (and across IBP rounds when ``pad_to`` pins M).
    The default chunk bounds the total cache at ~2.5 GB from the model
    geometry (32 rows/fold at 0.5B, 5 at 8B).
    Returns (gen [k, M, max_new], idx [k, M], valid [k, M]).
    """
    rows_by_fold = [rows[fold_id[rows] == f] for f in range(k)]
    m = pad_to or max(max((len(r) for r in rows_by_fold), default=1), 1)
    if max((len(r) for r in rows_by_fold), default=0) > m:
        raise ValueError(f"pad_to={m} smaller than a fold's held-out count")
    idx = np.zeros((k, m), np.int32)
    valid = np.zeros((k, m), bool)
    for f, r in enumerate(rows_by_fold):
        idx[f, : len(r)] = r
        valid[f, : len(r)] = True

    prompt_len = answer_pos + 1  # decode continues right after the marker
    if draft is not None:
        dspec, dparams = draft
        fn0 = _make_spec_decode_fn(spec, dspec, lora_spec, max_new, gamma,
                                   use_pallas, with_lora=lora_k is not None)
        fn = (lambda b, lk, t, pl, i: fn0(b, dparams, lk, t, pl, i))
    else:
        fn = _make_decode_fn(spec, lora_spec, max_new, use_pallas,
                             with_lora=lora_k is not None)
    if chunk is None:
        from tst.models.quant import quantized_bytes

        bb = quantized_bytes(base)
        if draft is not None:
            bb += quantized_bytes(draft[1])
        chunk = decode_chunk_rows(spec, tokens.shape[1], max_new, k,
                                  base_bytes=bb,
                                  draft_spec=draft[0] if draft else None)
    mc = min(m, max(int(chunk), 1))
    pad = (-m) % mc
    idx_p = np.pad(idx, ((0, 0), (0, pad)))
    # Enqueue every chunk before the first host sync: the generated tokens
    # are tiny ([k, chunk, max_new] int32), so holding all chunks on device
    # costs nothing, and deferring np.asarray lets the remote runtime
    # pipeline chunk dispatch with execution (measured 16.9 -> 16.6 s on
    # the 8B 256-row leg, scripts/probe_decode8b.py).
    outs = [fn(base, lora_k, tokens, prompt_len,
               jnp.asarray(idx_p[:, c0: c0 + mc]))
            for c0 in range(0, m + pad, mc)]
    gen = np.concatenate([np.asarray(o) for o in outs], axis=1)[:, :m]
    return gen, idx, valid  # [k, M, max_new]


def score_heldout_numeric(
    base,
    lora_k,
    spec: ModelSpec,
    lora_spec: Optional[LoraSpec],
    tokens: jnp.ndarray,
    answer_pos: jnp.ndarray,  # last prompt token index
    gold_values: np.ndarray,  # [N] float, NaN for non-numeric rows
    fold_id: np.ndarray,
    k: int,
    tokenizer=None,
    max_new: int = 12,
    use_pallas: bool = False,
    pad_to: Optional[int] = None,
    draft=None,  # (draft_spec, draft_params) → exact speculative decode
    gamma: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy-decode numeric answers with each row's held-out fold model.

    Returns (pred_values [N] float NaN-padded, per_sample_mra [N]).
    Per-sample MRA (the VSI-Bench numeric metric applied per sample) doubles
    as the numeric bias score s(x): high = the blind model reproduces the
    gold number — a non-visual shortcut (reference README.md:35).
    """
    from tst.eval.metrics import MRA_THRESHOLDS
    from tst.models.decode import decode_numeric

    n = tokens.shape[0]
    numeric_rows = np.flatnonzero(np.isfinite(gold_values))
    pred = np.full(n, np.nan, np.float32)
    s_num = np.full(n, np.nan, np.float32)
    if len(numeric_rows) == 0:
        return pred, s_num
    gen, idx, valid = _decode_heldout_rows(
        base, lora_k, spec, lora_spec, tokens, answer_pos, numeric_rows,
        fold_id, k, max_new, use_pallas, pad_to=pad_to,
        draft=draft, gamma=gamma,
    )
    for f in range(k):
        rows = idx[f][valid[f]]
        vals = decode_numeric(gen[f][valid[f]], tokenizer)
        pred[rows] = vals
        rel = np.abs(vals - gold_values[rows]) / np.maximum(np.abs(gold_values[rows]), 1e-9)
        rel = np.where(np.isnan(vals), np.inf, rel)
        s_num[rows] = np.mean(
            [(rel < (1.0 - th)).astype(np.float32) for th in MRA_THRESHOLDS], axis=0
        )
    return pred, s_num


def score_heldout_open(
    base,
    lora_k,
    spec: ModelSpec,
    lora_spec: Optional[LoraSpec],
    tokens: jnp.ndarray,
    answer_pos: jnp.ndarray,
    gold_texts: Sequence[Optional[str]],  # [N]; None for non-open rows
    fold_id: np.ndarray,
    k: int,
    tokenizer=None,
    max_new: int = 16,
    use_pallas: bool = False,
    pad_to: Optional[int] = None,
    draft=None,  # (draft_spec, draft_params) → exact speculative decode
    gamma: int = 2,
) -> Tuple[list, np.ndarray]:
    """Greedy-decode open (free-form) answers with each row's held-out fold
    model and score by normalized exact match (VERDICT r1 item 5: MMMU's open
    split, reference README.md:35, previously had no s(x) path).

    Returns (pred_texts [N] with None on non-open rows, s_open [N] — 1.0 when
    the blind model reproduces the gold answer, NaN on non-open rows).
    """
    from tst.eval.metrics import open_exact_match
    from tst.models.decode import decode_text

    n = tokens.shape[0]
    open_rows = np.array(
        [i for i, g in enumerate(gold_texts) if g is not None], np.int32)
    pred_texts: list = [None] * n
    s_open = np.full(n, np.nan, np.float32)
    if len(open_rows) == 0:
        return pred_texts, s_open
    gen, idx, valid = _decode_heldout_rows(
        base, lora_k, spec, lora_spec, tokens, answer_pos, open_rows,
        fold_id, k, max_new, use_pallas, pad_to=pad_to,
        draft=draft, gamma=gamma,
    )
    for f in range(k):
        rows = idx[f][valid[f]]
        texts = decode_text(gen[f][valid[f]], tokenizer)
        for r, t in zip(rows, texts):
            pred_texts[r] = t
            s_open[r] = open_exact_match(t, gold_texts[r])
    return pred_texts, s_open


def score_all_mcq(
    base,
    spec: ModelSpec,
    tokens: jnp.ndarray,
    answer_pos: jnp.ndarray,
    option_ids: np.ndarray,
    n_options: np.ndarray,
    use_pallas: bool = False,
    batch: int = 32,
    option_seqs: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Zero-shot scoring of every sample with the base model (the blind
    baseline leg of the vision-blind gap, SURVEY.md §3.4)."""
    n = tokens.shape[0]
    fold_id = np.zeros(n, np.int32)
    return score_heldout_mcq(
        base, None, spec, None, tokens, answer_pos, option_ids, n_options,
        fold_id, k=1, use_pallas=use_pallas, batch=batch,
        option_seqs=option_seqs,
    )
