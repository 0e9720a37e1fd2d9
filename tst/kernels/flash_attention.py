"""Pallas TPU flash attention (fwd + bwd), GQA-aware, causal.

SURVEY.md §2b B12: the training hot loop's attention without ever
materializing the [S, S] probability matrix — the buffer that OOM'd the
dense-XLA path at Qwen-0.5B batch 16 seq 512 (24.8 GB > 15.75 GB HBM).

Design (per the TPU kernel playbooks):
  * online softmax with f32 running (m, l) statistics in VMEM scratch;
  * grid (batch, q_head, q_blocks, kv_blocks) — first three ``parallel``
    (megacore-friendly), kv ``arbitrary`` (sequential reduction);
  * causal: whole KV tiles above the diagonal are skipped (`pl.when`),
    diagonal tiles masked elementwise with -0.7*f32_max (never -inf:
    exp(-inf - -inf) = NaN);
  * GQA without expanding K/V in HBM: the K/V BlockSpec index maps divide
    the q-head grid index by the group size, so each KV head is streamed
    once per group from HBM;
  * backward via custom_vjp with two kernels — dKV (iterates Q tiles per KV
    tile) and dQ (iterates KV tiles per Q tile) — recomputing probabilities
    from the saved logsumexp, with di = Σ o·do precomputed once;
  * bwd produces per-q-head dk/dv, group-summed outside the kernel (keeps
    the kernel free of cross-head reductions).

Layout: [B, H, S, D]. S must divide by the block size (guaranteed: the data
pipeline pads to 128-multiple buckets). Interpret mode runs the same kernels
on CPU for parity tests (SURVEY.md §4.2).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)

_INTERPRET = False  # flipped by tests on CPU

#: Fold sm_scale into q OUTSIDE the kernel (XLA fuses the elementwise
#: multiply into the preceding transpose for free) and pass sm_scale=1.0 in
#: — the kernels then skip BOTH full-[rows, bk]-tile multiplies (s*scale in
#: every kernel and ds*scale in the backwards; together ~3 of the ~12 VPU
#: ops per logit element). Gradients need no special-casing: with
#: z = (c·q)@kᵀ the kernel's dq is w.r.t. the scaled q, and XLA's chain
#: rule through the outer multiply rescales it. (In-kernel operand scaling
#: was tried first and crashed the Mosaic compile helper under the trainer's
#: fold-vmap.) Read at TRACE time — clear tst.train.sft._STEP_CACHE when
#: flipping mid-process, like FOLD_BLOCK_Q.
PRESCALE_Q = True

#: Run the one-shot softmax chain (mask/max/exp/sum) on bf16 logits —
#: MEASURED SLOWER (127.3 vs 130.5 samples/s at the 0.5B step): Mosaic
#: requires f32 matmul accumulators, so the chain pays a full-tile
#: f32→bf16 cast that costs more than the half-width vector ops save.
#: Kept as a flag for future toolchains that allow bf16 MXU output.
SOFTMAX_BF16 = False

#: Single-KV-tile backward: one fused dq/dk/dv kernel (shared s→p→dp
#: recompute) instead of separate dQ and dKV kernels that each redo it.
#: Read at TRACE time, like the other kernel knobs.
FUSED_BWD = True


def _maybe_scale_s(s, sm_scale):
    """Skip the full-tile logits multiply when the scale is statically 1.0
    (the PRESCALE_Q path passes pre-scaled q and sm_scale=1.0)."""
    return s if sm_scale == 1.0 else s * sm_scale


def _compiler_params(dims):
    try:
        return pltpu.CompilerParams(dimension_semantics=dims)
    except (AttributeError, TypeError):  # older jax naming
        return pltpu.TPUCompilerParams(dimension_semantics=dims)


def _pick_block(s: int, target: int = 1024) -> int:
    """Largest block <= target that divides s (sequences are 128-multiples).

    target=1024 from a measured sweep on v5e (scripts/sweep_flash_blocks.py,
    Qwen-0.5B head geometry): 1024x1024 beats the old 512x512 default by
    1.31x fwd+bwd at S=16k and 1.38x at S=32k (37->51 achieved fwd TFLOP/s
    at 32k); 2048-wide blocks fail to compile (VMEM). At S<=1024 this
    degrades to the whole sequence, which matched or beat all alternatives.
    """
    for cand in (target, 512, 256, 128):
        if cand <= s and s % cand == 0:
            return cand
    return min(s, 128)


# ───────────────────────────── forward ─────────────────────────────


def _fwd_kernel_oneshot(*refs, sm_scale, causal, block_q, block_k, pos_mod,
                        has_seg=False):
    """Single-KV-tile forward: plain softmax, no online statistics.

    When the whole KV sequence fits one tile (the folded-GQA regime at
    short/mid sequence), the online-softmax machinery — f32 scratch
    accumulators, per-tile rescaling, init/store grid phases — is pure
    overhead; this kernel computes max/exp/sum/PV in one pass.
    """
    if has_seg:
        q_ref, k_ref, v_ref, seg_ref, o_ref, lse_ref = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, lse_ref), seg_ref = refs, None
    q_idx = pl.program_id(2)
    q = q_ref[0, 0]  # [bq, d]
    k = k_ref[0, 0]  # [bk, d]
    chain_dtype = jnp.bfloat16 if SOFTMAX_BF16 else jnp.float32
    # Mosaic requires a 32-bit matmul accumulator; the bf16 chain casts the
    # f32 logits once and runs mask/max/exp on half-width vectors
    s = _maybe_scale_s(jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ), sm_scale).astype(chain_dtype)
    if causal:
        rows = _row_positions(block_q, block_k, q_idx, pos_mod)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = _causal_seg_where(s, rows, cols, seg_ref,
                              jnp.asarray(DEFAULT_MASK_VALUE, chain_dtype))
    m = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    v = v_ref[0, 0]
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)
    lse_row = m[:, 0].astype(jnp.float32) + jnp.log(jnp.maximum(l[:, 0], 1e-37))
    lse_ref[0, 0] = jnp.broadcast_to(lse_row[None, :], (8, block_q))


def _row_positions(block_q, block_k, q_idx, pos_mod):
    """Per-row sequence positions of a q tile. ``pos_mod`` is the folded-GQA
    marker: q rows are [G*S] (group-major), so position = row % S."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    if pos_mod is not None and block_q % pos_mod == 0:
        # a whole number of groups per tile: (q_idx*bq + i) % S == i % S —
        # the position pattern is IDENTICAL for every q tile, so the
        # dynamic q_idx term drops and the mask chain is fully static
        # (hoistable/constant-foldable by Mosaic). True for the default
        # folded schedule (bq = groups*S).
        pass
    else:
        rows = rows + q_idx * block_q
    if pos_mod is not None:
        if pos_mod & (pos_mod - 1) == 0:  # power of two (all default buckets)
            rows = jnp.bitwise_and(rows, jnp.int32(pos_mod - 1))
        else:
            rows = jax.lax.rem(rows, jnp.int32(pos_mod))
    return rows


#: max packed samples per row (tst.data.packing). Static kernel loop bound:
#: the segment mask reads MAX_SEGS scalars per tile from the starts tile.
MAX_SEGS = 8

#: lane width of the starts tile (TPU last-dim alignment); lanes beyond the
#: real starts hold SEG_PAD and are never read by the MAX_SEGS-bounded loop.
SEG_LANES = 128

#: huge sentinel for unused start slots (never <= any real position)
SEG_PAD = np.int32(1 << 30)


def seg_tile(seg_starts: jnp.ndarray) -> jnp.ndarray:
    """[B, n_segs] per-row segment starts → the kernels' [B, 8, SEG_LANES]
    int32 VMEM tile (sublane-replicated, SEG_PAD-filled unused lanes).

    ``seg_starts`` rows are ascending sample offsets within a packed
    sequence (tst.data.packing), first entry 0, unused slots >= SEG_PAD.
    """
    seg = jnp.asarray(seg_starts, jnp.int32)
    b, n = seg.shape
    if n > MAX_SEGS:
        raise ValueError(
            f"{n} segment starts > MAX_SEGS={MAX_SEGS} — the kernel's static "
            f"mask loop reads only the first {MAX_SEGS} lanes")
    row = jnp.concatenate(
        [seg, jnp.full((b, SEG_LANES - n), SEG_PAD, jnp.int32)], axis=1)
    return jnp.broadcast_to(row[:, None, :], (b, 8, SEG_LANES))


def _seg_spec(rank_extra: int):
    """BlockSpec for the starts tile: one [1, 8, SEG_LANES] block per batch,
    invariant over the remaining ``rank_extra`` grid axes."""
    if rank_extra == 1:
        return pl.BlockSpec((1, 8, SEG_LANES), lambda bi, hi: (bi, 0, 0))
    if rank_extra == 2:
        return pl.BlockSpec((1, 8, SEG_LANES), lambda bi, hi, qi: (bi, 0, 0))
    return pl.BlockSpec((1, 8, SEG_LANES), lambda bi, hi, qi, ki: (bi, 0, 0))


def _seg_start_vec(seg_ref, rows1):
    """Per-q-row segment start [bq, 1] from the per-batch starts tile.

    ``seg_ref`` block is [1, 8, MAX_SEGS_LANES] int32 (sublane-replicated;
    starts at [0, 0, j], unused slots = SEG_PAD). ``rows1`` [bq, 1] holds
    each row's sequence position; its segment start is the largest start
    <= position — a static MAX_SEGS-iteration max-chain of scalar compares
    (zero HBM traffic vs streaming a per-position [S] vector per tile).
    """
    start = jnp.zeros_like(rows1)
    for j in range(MAX_SEGS):
        sj = seg_ref[0, 0, j]
        start = jnp.where(sj <= rows1, jnp.maximum(start, sj), start)
    return start


def _tile_min_pos(q_idx, block_q, pos_mod):
    """Smallest sequence position covered by q tile ``q_idx``, or None when
    the tile spans positions non-contiguously (folded tiles wider than one
    group, or tiles that straddle a group boundary) and no tile-level skip
    is sound."""
    if pos_mod is not None and (block_q > pos_mod or pos_mod % block_q):
        return None
    p0 = q_idx * block_q
    if pos_mod is not None:
        if pos_mod & (pos_mod - 1) == 0:
            p0 = jnp.bitwise_and(p0, jnp.int32(pos_mod - 1))
        else:
            p0 = jax.lax.rem(p0, jnp.int32(pos_mod))
    return p0


def _seg_start_scalar(seg_ref, p0):
    """Segment start of position ``p0`` as a scalar: the largest start <=
    p0 (static MAX_SEGS max-chain over the per-batch starts tile)."""
    start = jnp.int32(0)
    for j in range(MAX_SEGS):
        sj = seg_ref[0, 0, j]
        start = jnp.where(sj <= p0, jnp.maximum(start, sj), start)
    return start


def _tile_run_condition(q_idx, kv_idx, block_q, block_k, pos_mod, seg_ref):
    """Dynamic tile-skip predicate for causal (+ packed-segment) attention.

    A q tile with contiguous positions [p0, p0+bq) needs KV columns in
    [seg_start(p0), p0+bq) only: every row's own segment start is >= the
    tile-min's (starts ascend with position), and causality bounds columns
    above. KV tiles outside that window are skipped whole (`pl.when`) —
    with m segments per packed row this removes ~(1 - 1/m) of the one-shot
    schedule's attention FLOPs (VERDICT r3 weak #1). Returns True (no skip)
    when the tile's positions are non-contiguous.
    """
    p0 = _tile_min_pos(q_idx, block_q, pos_mod)
    if p0 is None:
        return True
    run = kv_idx * block_k <= p0 + (block_q - 1)  # not fully above diagonal
    if seg_ref is not None:
        seg0 = _seg_start_scalar(seg_ref, p0)
        run = jnp.logical_and(run, (kv_idx + 1) * block_k - 1 >= seg0)
    return run


def _causal_seg_where(s, rows, cols, seg_ref, mask_value):
    """Apply causal (+ optional packed-segment) masking to a logits tile.

    rows/cols: [bq, bk] int32 sequence positions of the tile's q rows and
    kv columns. Packed rows restrict attention to the query's own segment:
    col >= segment_start(row) — combined with causality that equals
    "same segment and not in the future" (segments are contiguous).
    """
    ok = cols <= rows
    if seg_ref is not None:
        ok = jnp.logical_and(ok, cols >= _seg_start_vec(seg_ref, rows[:, :1]))
    return jnp.where(ok, s, mask_value)


def _fwd_kernel(*refs, sm_scale, causal, block_q, block_k, kv_blocks,
                pos_mod, has_seg=False):
    if has_seg:
        q_ref, k_ref, v_ref, seg_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, lse_ref,
         m_scr, l_scr, acc_scr), seg_ref = refs, None
    kv_idx = pl.program_id(3)
    q_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    run = True
    if causal:
        # skip KV tiles above the diagonal or (packed rows) entirely before
        # the tile's minimum segment start; True when the tile's positions
        # are non-contiguous (folded tiles spanning a whole group)
        run = _tile_run_condition(q_idx, kv_idx, block_q, block_k, pos_mod,
                                  seg_ref)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]  # [bq, d]
        k = k_ref[0, 0]  # [bk, d]
        s = _maybe_scale_s(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), sm_scale)  # [bq, bk]
        if causal:
            rows = _row_positions(block_q, block_k, q_idx, pos_mod)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
            s = _causal_seg_where(s, rows, cols, seg_ref, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]  # [bq, 1] f32
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)  # [bq, bk]
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]  # [bk, d]
        pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(kv_idx == kv_blocks - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse_row = m_scr[...][:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-37))
        lse_ref[0, 0] = jnp.broadcast_to(lse_row[None, :], (8, lse_row.shape[0]))


def _flash_fwd(q, k, v, seg, sm_scale, causal, block_q, block_k,
               pos_mod=None, seg_chunk=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, h, s, d = q.shape
    kv_heads = k.shape[1]
    groups = h // kv_heads
    kv_s = k.shape[2]
    has_seg = seg is not None
    operands = (q, k, v, seg) if has_seg else (q, k, v)
    if (has_seg and seg_chunk is not None and kv_s == block_k
            and block_q < kv_s and causal and pos_mod
            and pos_mod % block_q == 0 and block_k % seg_chunk == 0):
        # segment-sparse chunked one-shot (packed rows): whole KV in VMEM,
        # column chunks outside each row tile's segment window skipped
        o, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_oneshot_chunked, sm_scale=sm_scale,
                              causal=causal, block_q=block_q,
                              block_k=block_k, pos_mod=pos_mod,
                              seg_chunk=seg_chunk),
            grid=(b, h, s // block_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
                _seg_spec(2),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi, qi: (bi, hi, 0, qi)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, 8, s), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, block_k), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
            compiler_params=_compiler_params(("parallel", "parallel", "parallel")),
            interpret=_INTERPRET,
        )(*operands)
        return o, lse
    if kv_s == block_k:
        # whole-KV tiles: the scratch-free one-shot kernel
        in_specs = [
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
        ]
        if has_seg:
            in_specs.append(_seg_spec(2))
        o, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_oneshot, sm_scale=sm_scale,
                              causal=causal, block_q=block_q,
                              block_k=block_k, pos_mod=pos_mod,
                              has_seg=has_seg),
            grid=(b, h, s // block_q),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi, qi: (bi, hi, 0, qi)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, 8, s), jnp.float32),
            ],
            compiler_params=_compiler_params(("parallel", "parallel", "parallel")),
            interpret=_INTERPRET,
        )(*operands)
        return o, lse
    grid = (b, h, s // block_q, kv_s // block_k)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, causal=causal,
        block_q=block_q, block_k=block_k, kv_blocks=kv_s // block_k,
        pos_mod=pos_mod, has_seg=has_seg,
    )
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // groups, ki, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // groups, ki, 0)),
    ]
    if has_seg:
        in_specs.append(_seg_spec(3))
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            # TPU block constraint: last two dims must be (8k, 128k) —
            # lse is stored sublane-replicated as [B, H, 8, S]
            pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 8, s), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(*operands)
    return o, lse


def _chunk_visible(c, seg_chunk, p0, block_q, seg0):
    """Is column chunk ``c`` (cols [c*chunk, (c+1)*chunk)) visible to a q
    tile with contiguous positions [p0, p0+bq) in segment window
    [seg0, p0+bq)? Causal: chunk not fully above the tile's last row;
    segment: chunk not fully before the tile-min's segment start."""
    c0 = c * seg_chunk
    run = c0 <= p0 + (block_q - 1)
    return jnp.logical_and(run, c0 + seg_chunk - 1 >= seg0)


def _rows_start_cols(block_q, q_idx, pos_mod, seg_ref):
    """Per-row positions [bq, 1] and their segment starts [bq, 1] for a
    position-contiguous row tile (block_q <= pos_mod dividing it)."""
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) + q_idx * block_q
    if pos_mod & (pos_mod - 1) == 0:
        rows1 = jnp.bitwise_and(rows1, jnp.int32(pos_mod - 1))
    else:
        rows1 = jax.lax.rem(rows1, jnp.int32(pos_mod))
    start1 = _seg_start_vec(seg_ref, rows1)
    return rows1, start1


def _fwd_kernel_oneshot_chunked(*refs, sm_scale, causal, block_q, block_k,
                                pos_mod, seg_chunk):
    """Segment-sparse one-shot forward: whole KV in one VMEM tile, column
    chunks of ``seg_chunk`` computed only when they intersect the row
    tile's visible window [seg_start(p0), p0+bq) (VERDICT r3 weak #1: the
    monolithic one-shot computes the FULL [S, S] square per group — ~2m×
    the useful FLOPs at m segments/row). Two passes over the chunks keep
    the softmax exact (no online rescaling — measured 22-36% slower at
    this workload, scripts/sweep_packed.py C/L-Q):
      pass 1: logits chunks → VMEM scratch + running row max;
      pass 2: exp/sum/PV from the scratch.
    Skipped chunks cost nothing: the KV tile is already VMEM-resident for
    the visible ones, so there is no wasted DMA either."""
    q_ref, k_ref, v_ref, seg_ref, o_ref, lse_ref, s_scr, m_scr, l_scr, acc_scr = refs
    q_idx = pl.program_id(2)
    q = q_ref[0, 0]  # [bq, d]
    p0 = _tile_min_pos(q_idx, block_q, pos_mod)
    seg0 = _seg_start_scalar(seg_ref, p0)
    rows1, start1 = _rows_start_cols(block_q, q_idx, pos_mod, seg_ref)
    nchunks = block_k // seg_chunk
    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    for c in range(nchunks):
        @pl.when(_chunk_visible(c, seg_chunk, p0, block_q, seg0))
        def _logits(c=c):
            kc = k_ref[0, 0, c * seg_chunk:(c + 1) * seg_chunk, :]
            s = _maybe_scale_s(jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32), sm_scale)
            cols = (jax.lax.broadcasted_iota(
                jnp.int32, (block_q, seg_chunk), 1) + c * seg_chunk)
            ok = jnp.logical_and(cols <= rows1, cols >= start1)
            s = jnp.where(ok, s, DEFAULT_MASK_VALUE)
            s_scr[:, c * seg_chunk:(c + 1) * seg_chunk] = s
            m_scr[...] = jnp.maximum(m_scr[...],
                                     jnp.max(s, axis=1, keepdims=True))
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    for c in range(nchunks):
        @pl.when(_chunk_visible(c, seg_chunk, p0, block_q, seg0))
        def _pv(c=c):
            p = jnp.exp(s_scr[:, c * seg_chunk:(c + 1) * seg_chunk] - m_scr[...])
            l_scr[...] += jnp.sum(p, axis=1, keepdims=True)
            vc = v_ref[0, 0, c * seg_chunk:(c + 1) * seg_chunk, :]
            acc_scr[...] += jax.lax.dot(p.astype(vc.dtype), vc,
                                        preferred_element_type=jnp.float32)
    l = l_scr[...]
    o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)
    lse_row = m_scr[...][:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-37))
    lse_ref[0, 0] = jnp.broadcast_to(lse_row[None, :], (8, block_q))


# ───────────────────────────── backward ─────────────────────────────


def _bwd_dq_kernel_oneshot(*refs, sm_scale, causal, block_q, block_k,
                           pos_mod, has_seg=False):
    """dQ with the whole KV in one tile: no scratch accumulator/phases."""
    if has_seg:
        q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, seg_ref, dq_ref = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dq_ref), seg_ref = refs, None
    q_idx = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0, 0][:, None]
    di = di_ref[0, 0, 0][:, None]
    s = _maybe_scale_s(jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32),
                       sm_scale)
    if causal:
        rows = _row_positions(block_q, block_k, q_idx, pos_mod)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = _causal_seg_where(s, rows, cols, seg_ref, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)
    # bf16 operands + f32 accumulation: identical products to the
    # upcast-f32 matmul (inputs are already bf16) at full MXU rate
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # prescaled path (sm_scale==1.0): dq is w.r.t. the scaled q; the
    # caller's chain rule through the outer q*c multiply rescales it
    ds = _maybe_scale_s(p * (dp - di), sm_scale)
    dq_ref[0, 0] = jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


def _bwd_dkv_kernel_oneshot(*refs, sm_scale, causal, block_q, block_k,
                            pos_mod, has_seg=False):
    """dK/dV with all q rows in one tile: no scratch accumulators/phases."""
    if has_seg:
        q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, seg_ref, dk_ref, dv_ref = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dk_ref, dv_ref), seg_ref = refs, None
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0, 0][:, None]
    di = di_ref[0, 0, 0][:, None]
    s = _maybe_scale_s(jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32),
                       sm_scale)
    if causal:
        rows = _row_positions(block_q, block_k, 0, pos_mod)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = _causal_seg_where(s, rows, cols, seg_ref, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)
    dv_ref[0, 0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # bf16 operands + f32 accumulation: identical products to the
    # upcast-f32 matmul (inputs are already bf16) at full MXU rate
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # prescaled path: z = q_s@kᵀ with q_s = c·q ⇒ dk = dsᵀ @ q_s exactly —
    # no ds*scale multiply needed
    ds = _maybe_scale_s(p * (dp - di), sm_scale)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bwd_fused_nolse_kernel(*refs, sm_scale, causal, block_q, block_k,
                            q_blocks, pos_mod, has_seg=False):
    """Self-contained fused dQ/dK/dV: needs ONLY (q, k, v, do).

    With the whole KV in one tile, each row tile sees its row's full
    softmax domain, so the kernel derives its own stats instead of taking
    the forward's saved lse: m/l from the recomputed logits, and
    di = Σⱼ p·dp per row (the algebraic identity di = Σ o·do =
    Σ p·(do·vᵀ) — no extra matmul). The custom_vjp then saves NO flash
    residuals at all under any remat policy: the backward's fwd-kernel
    re-run (228 µs/layer under "dots") and the separate di/lse traffic
    disappear.
    """
    if has_seg:
        q_ref, k_ref, v_ref, do_ref, seg_ref, dq_ref, dk_ref, dv_ref, dk_scr, dv_scr = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
         dk_scr, dv_scr), seg_ref = refs, None
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = _maybe_scale_s(jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32),
                       sm_scale)
    if causal:
        rows = _row_positions(block_q, block_k, q_idx, pos_mod)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = _causal_seg_where(s, rows, cols, seg_ref, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    l_inv = 1.0 / jnp.sum(e, axis=1, keepdims=True)
    p = e * l_inv  # normalized probs, same reduction order as the forward
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    di = jnp.sum(p * dp, axis=1, keepdims=True)  # = Σ o·do per row
    ds = _maybe_scale_s(p * (dp - di), sm_scale)
    dq_ref[0, 0] = jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q_idx == q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_fused_chunked_kernel(*refs, sm_scale, causal, block_q, block_k,
                              q_blocks, pos_mod, seg_chunk):
    """Segment-sparse self-contained fused dQ/dK/dV: the chunked analogue
    of ``_bwd_fused_nolse_kernel`` — needs ONLY (q, k, v, do), derives its
    own softmax stats, and skips column chunks outside the row tile's
    visible window. Three chunk passes:
      1. logits → scratch + row max;
      2. p = exp(s-m) (stored over the logits scratch), l, dp → scratch,
         raw di accumulation (di = Σ pn·dp = l⁻¹ Σ p·dp);
      3. normalized p → dv/ds/dq/dk per chunk.
    dk/dv accumulate across row tiles (sequential q grid axis), exactly as
    the monolithic fused kernel does."""
    (q_ref, k_ref, v_ref, do_ref, seg_ref, dq_ref, dk_ref, dv_ref,
     s_scr, dp_scr, m_scr, l_scr, di_scr, dq_scr, dk_scr, dv_scr) = refs
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    p0 = _tile_min_pos(q_idx, block_q, pos_mod)
    seg0 = _seg_start_scalar(seg_ref, p0)
    rows1, start1 = _rows_start_cols(block_q, q_idx, pos_mod, seg_ref)
    nchunks = block_k // seg_chunk
    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    for c in range(nchunks):
        @pl.when(_chunk_visible(c, seg_chunk, p0, block_q, seg0))
        def _logits(c=c):
            kc = k_ref[0, 0, c * seg_chunk:(c + 1) * seg_chunk, :]
            s = _maybe_scale_s(jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32), sm_scale)
            cols = (jax.lax.broadcasted_iota(
                jnp.int32, (block_q, seg_chunk), 1) + c * seg_chunk)
            ok = jnp.logical_and(cols <= rows1, cols >= start1)
            s = jnp.where(ok, s, DEFAULT_MASK_VALUE)
            s_scr[:, c * seg_chunk:(c + 1) * seg_chunk] = s
            m_scr[...] = jnp.maximum(m_scr[...],
                                     jnp.max(s, axis=1, keepdims=True))
    l_scr[...] = jnp.zeros_like(l_scr)
    di_scr[...] = jnp.zeros_like(di_scr)
    for c in range(nchunks):
        @pl.when(_chunk_visible(c, seg_chunk, p0, block_q, seg0))
        def _stats(c=c):
            sl = slice(c * seg_chunk, (c + 1) * seg_chunk)
            p = jnp.exp(s_scr[:, sl] - m_scr[...])
            s_scr[:, sl] = p  # reuse the logits scratch as unnormalized p
            l_scr[...] += jnp.sum(p, axis=1, keepdims=True)
            vc = v_ref[0, 0, sl, :]
            dp = jax.lax.dot_general(do, vc, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp_scr[:, sl] = dp
            di_scr[...] += jnp.sum(p * dp, axis=1, keepdims=True)
    l_inv = 1.0 / l_scr[...]
    di = di_scr[...] * l_inv  # = Σ pn·dp = Σ o·do per row
    dq_scr[...] = jnp.zeros_like(dq_scr)
    for c in range(nchunks):
        @pl.when(_chunk_visible(c, seg_chunk, p0, block_q, seg0))
        def _grads(c=c):
            sl = slice(c * seg_chunk, (c + 1) * seg_chunk)
            pn = s_scr[:, sl] * l_inv
            dv_scr[sl, :] += jax.lax.dot_general(
                pn.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = _maybe_scale_s(pn * (dp_scr[:, sl] - di), sm_scale)
            kc = k_ref[0, 0, sl, :]
            dq_scr[...] += jax.lax.dot(ds.astype(kc.dtype), kc,
                                       preferred_element_type=jnp.float32)
            dk_scr[sl, :] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)

    @pl.when(q_idx == q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(*refs, sm_scale, causal, block_q, block_k, kv_blocks,
                   pos_mod, has_seg=False):
    if has_seg:
        q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, seg_ref, dq_ref, dq_scr = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dq_ref, dq_scr), seg_ref = refs, None
    kv_idx = pl.program_id(3)
    q_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    run = True
    if causal:
        run = _tile_run_condition(q_idx, kv_idx, block_q, block_k, pos_mod,
                                  seg_ref)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0][:, None]  # [bq, 1]
        di = di_ref[0, 0, 0][:, None]
        s = _maybe_scale_s(
            jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32), sm_scale)
        if causal:
            rows = _row_positions(block_q, block_k, q_idx, pos_mod)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
            s = _causal_seg_where(s, rows, cols, seg_ref, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)  # normalized probs [bq, bk]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [bq, bk]
        ds = _maybe_scale_s(p * (dp - di), sm_scale)
        dq_scr[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                   preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, sm_scale, causal, block_q, block_k,
                    q_blocks, pos_mod, has_seg=False):
    if has_seg:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, seg_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
         dk_scr, dv_scr), seg_ref = refs, None
    q_idx = pl.program_id(3)
    kv_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    run = True
    if causal:
        run = _tile_run_condition(q_idx, kv_idx, block_q, block_k, pos_mod,
                                  seg_ref)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0][:, None]
        di = di_ref[0, 0, 0][:, None]
        s = _maybe_scale_s(
            jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32), sm_scale)
        if causal:
            rows = _row_positions(block_q, block_k, q_idx, pos_mod)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
            s = _causal_seg_where(s, rows, cols, seg_ref, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)  # [bq, bk]
        # dv += p^T @ do
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # prescaled path: z = q_s@kᵀ ⇒ dk = dsᵀ @ q_s — no ds*scale needed
        ds = _maybe_scale_s(p * (dp - di), sm_scale)
        # dk += ds^T @ q
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(q_idx == q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_bwd_fused(q, k, v, seg, do, sm_scale, causal, block_q, block_k,
                     pos_mod=None, bwd_block_q=None, seg_chunk=None):
    """Self-contained fused backward for the single-KV-tile regime: ONE
    kernel computes dq/dk/dv from (q, k, v, do) alone — no saved o/lse, no
    di precompute, no forward re-run in the backward pass. Row tiles of
    pos_mod rows (one GQA group) keep the mask static and the f32 working
    set ~2 MB; dk/dv accumulate across row tiles."""
    b, h, s, d = q.shape
    kv_heads = k.shape[1]
    groups = h // kv_heads
    kv_s = k.shape[2]
    has_seg = seg is not None
    bq_f = bwd_block_q or pos_mod or block_q
    if s % bq_f:
        bq_f = block_q
    if (has_seg and seg_chunk is not None and bq_f < kv_s and causal
            and pos_mod and pos_mod % bq_f == 0 and block_k % seg_chunk == 0):
        # chunked segment-sparse fused backward (packed rows)
        dq, dk_h, dv_h = pl.pallas_call(
            functools.partial(_bwd_fused_chunked_kernel, sm_scale=sm_scale,
                              causal=causal, block_q=bq_f, block_k=block_k,
                              q_blocks=s // bq_f, pos_mod=pos_mod,
                              seg_chunk=seg_chunk),
            grid=(b, h, s // bq_f),
            in_specs=[
                pl.BlockSpec((1, 1, bq_f, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
                pl.BlockSpec((1, 1, bq_f, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
                _seg_spec(2),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bq_f, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, kv_s, d), k.dtype),
                jax.ShapeDtypeStruct((b, h, kv_s, d), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq_f, block_k), jnp.float32),   # s / p
                pltpu.VMEM((bq_f, block_k), jnp.float32),   # dp
                pltpu.VMEM((bq_f, 1), jnp.float32),         # m
                pltpu.VMEM((bq_f, 1), jnp.float32),         # l
                pltpu.VMEM((bq_f, 1), jnp.float32),         # raw di
                pltpu.VMEM((bq_f, d), jnp.float32),         # dq acc
                pltpu.VMEM((block_k, d), jnp.float32),      # dk acc
                pltpu.VMEM((block_k, d), jnp.float32),      # dv acc
            ],
            compiler_params=_compiler_params(
                ("parallel", "parallel", "arbitrary")),
            interpret=_INTERPRET,
        )(q, k, v, do, seg)
        dk = dk_h.reshape(b, kv_heads, groups, kv_s, d).sum(axis=2).astype(k.dtype)
        dv = dv_h.reshape(b, kv_heads, groups, kv_s, d).sum(axis=2).astype(v.dtype)
        return dq, dk, dv
    in_specs = [
        pl.BlockSpec((1, 1, bq_f, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
        pl.BlockSpec((1, 1, bq_f, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
    ]
    operands = (q, k, v, do)
    if has_seg:
        in_specs.append(_seg_spec(2))
        operands = (q, k, v, do, seg)
    dq, dk_h, dv_h = pl.pallas_call(
        functools.partial(_bwd_fused_nolse_kernel, sm_scale=sm_scale,
                          causal=causal, block_q=bq_f, block_k=block_k,
                          q_blocks=s // bq_f, pos_mod=pos_mod,
                          has_seg=has_seg),
        grid=(b, h, s // bq_f),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq_f, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, kv_s, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, kv_s, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=_compiler_params(
            ("parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(*operands)
    dk = dk_h.reshape(b, kv_heads, groups, kv_s, d).sum(axis=2).astype(k.dtype)
    dv = dv_h.reshape(b, kv_heads, groups, kv_s, d).sum(axis=2).astype(v.dtype)
    return dq, dk, dv


def _flash_bwd(q, k, v, seg, o, lse, do, sm_scale, causal, block_q, block_k,
               pos_mod=None, bwd_block_q=None):
    block_q = bwd_block_q or block_q
    b, h, s, d = q.shape
    kv_heads = k.shape[1]
    groups = h // kv_heads
    kv_s = k.shape[2]
    has_seg = seg is not None
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # [B,H,S]
    di = jnp.broadcast_to(di[:, :, None, :], (b, h, 8, s))  # sublane-replicated

    if kv_s == block_k:
        # whole-KV tiles (folded regime): scratch-free one-shot backward
        in_specs = [
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi: (bi, hi // groups, 0, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi, qi: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ]
        operands = (q, k, v, do, lse, di)
        if has_seg:
            in_specs.append(_seg_spec(2))
            operands = (q, k, v, do, lse, di, seg)
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel_oneshot, sm_scale=sm_scale,
                              causal=causal, block_q=block_q,
                              block_k=block_k, pos_mod=pos_mod,
                              has_seg=has_seg),
            grid=(b, h, s // block_q),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            compiler_params=_compiler_params(("parallel", "parallel", "parallel")),
            interpret=_INTERPRET,
        )(*operands)
        if s == block_q:
            # single q tile as well: one-shot dK/dV with the group-sum
            # inside the [s]-contraction
            in_specs = [
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi: (bi, hi // groups, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi: (bi, hi // groups, 0, 0)),
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi: (bi, hi, 0, 0)),
            ]
            operands = (q, k, v, do, lse, di)
            if has_seg:
                in_specs.append(_seg_spec(1))
                operands = (q, k, v, do, lse, di, seg)
            dk_h, dv_h = pl.pallas_call(
                functools.partial(_bwd_dkv_kernel_oneshot, sm_scale=sm_scale,
                                  causal=causal, block_q=block_q,
                                  block_k=block_k, pos_mod=pos_mod,
                                  has_seg=has_seg),
                grid=(b, h),
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((1, 1, block_k, d), lambda bi, hi: (bi, hi, 0, 0)),
                    pl.BlockSpec((1, 1, block_k, d), lambda bi, hi: (bi, hi, 0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((b, h, kv_s, d), k.dtype),
                    jax.ShapeDtypeStruct((b, h, kv_s, d), v.dtype),
                ],
                compiler_params=_compiler_params(("parallel", "parallel")),
                interpret=_INTERPRET,
            )(*operands)
            dk = dk_h.reshape(b, kv_heads, groups, kv_s, d).sum(axis=2).astype(k.dtype)
            dv = dv_h.reshape(b, kv_heads, groups, kv_s, d).sum(axis=2).astype(v.dtype)
            return dq, dk, dv
        return dq, *_dkv_tiled(q, k, v, seg, do, lse, di, sm_scale, causal,
                               block_q, block_k, pos_mod, groups)

    # dQ: grid (b, h, q_blocks, kv_blocks), kv sequential
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // groups, ki, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // groups, ki, 0)),
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
        pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
    ]
    operands = (q, k, v, do, lse, di)
    if has_seg:
        in_specs.append(_seg_spec(3))
        operands = (q, k, v, do, lse, di, seg)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, causal=causal,
                          block_q=block_q, block_k=block_k,
                          kv_blocks=kv_s // block_k, pos_mod=pos_mod,
                          has_seg=has_seg),
        grid=(b, h, s // block_q, kv_s // block_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=_compiler_params(("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(*operands)

    return dq, *_dkv_tiled(q, k, v, seg, do, lse, di, sm_scale, causal,
                           block_q, block_k, pos_mod, groups)


def _dkv_tiled(q, k, v, seg, do, lse, di, sm_scale, causal, block_q, block_k,
               pos_mod, groups):
    """dK/dV at q-head granularity: grid (b, h, kv_blocks, q_blocks), q
    sequential; per-q-head results are group-summed down to kv heads."""
    b, h, s, d = q.shape
    kv_heads = k.shape[1]
    kv_s = k.shape[2]
    has_seg = seg is not None
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi // groups, ki, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi // groups, ki, 0)),
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi, ki, qi: (bi, hi, 0, qi)),
        pl.BlockSpec((1, 1, 8, block_q), lambda bi, hi, ki, qi: (bi, hi, 0, qi)),
    ]
    operands = (q, k, v, do, lse, di)
    if has_seg:
        in_specs.append(_seg_spec(3))
        operands = (q, k, v, do, lse, di, seg)
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, causal=causal,
                          block_q=block_q, block_k=block_k,
                          q_blocks=s // block_q, pos_mod=pos_mod,
                          has_seg=has_seg),
        grid=(b, h, kv_s // block_k, s // block_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, kv_s, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, kv_s, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(*operands)

    # group-sum per-q-head dk/dv down to kv heads
    dk = dk_h.reshape(b, kv_heads, groups, kv_s, d).sum(axis=2).astype(k.dtype)
    dv = dv_h.reshape(b, kv_heads, groups, kv_s, d).sum(axis=2).astype(v.dtype)
    return dk, dv


# ───────────────────────────── public API ─────────────────────────────


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _flash(q, k, v, seg, sm_scale, causal, block_q, block_k, pos_mod,
           bwd_block_q=None, seg_chunk=None):
    o, _ = _flash_fwd(q, k, v, seg, sm_scale, causal, block_q, block_k,
                      pos_mod, seg_chunk)
    return o


def _flash_vjp_fwd(q, k, v, seg, sm_scale, causal, block_q, block_k, pos_mod,
                   bwd_block_q=None, seg_chunk=None):
    if k.shape[2] == block_k and FUSED_BWD:
        # single-KV-tile regime: the self-contained fused backward derives
        # its own softmax stats from (q, k, v, do) — the custom_vjp saves NO
        # kernel residuals, so the backward neither re-runs the forward
        # kernel nor streams saved (o, lse). Still NAME the primal output:
        # without it the 'flash'/'attn'/'dots_flash' policies have nothing
        # to match in this regime and silently degrade to full remat — the
        # OUTER recompute re-runs this kernel just to rebuild o for the ops
        # downstream of attention. (No lse name: the fused bwd never reads
        # it, and an unsaveable name would make policies stash dead bytes.)
        o, _ = _flash_fwd(q, k, v, seg, sm_scale, causal, block_q, block_k,
                          pos_mod, seg_chunk)
        from jax.ad_checkpoint import checkpoint_name

        o = checkpoint_name(o, "flash_out")
        return o, (q, k, v, seg)
    o, lse = _flash_fwd(q, k, v, seg, sm_scale, causal, block_q, block_k,
                        pos_mod, seg_chunk)
    # Name the residuals so remat policies can SAVE them: under plain
    # "dots"-style policies the pallas output is not a dot_general, so
    # jax.checkpoint re-runs this whole forward kernel during the backward
    # pass just to rebuild (o, lse) — 458us/layer at the 0.5B train step.
    # The "dots_flash" policy (tst.models.decoder._remat_policy) matches
    # these names; q/k/v residuals reconstruct from saved qkv dots via
    # elementwise RoPE, which costs nothing by comparison.
    from jax.ad_checkpoint import checkpoint_name

    o = checkpoint_name(o, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return o, (q, k, v, seg, o, lse)


def _flash_vjp_bwd(sm_scale, causal, block_q, block_k, pos_mod, bwd_block_q,
                   seg_chunk, res, do):
    # the starts tile is integer-typed: its cotangent is None (symbolic zero)
    if len(res) == 4:
        q, k, v, seg = res
        dq, dk, dv = _flash_bwd_fused(q, k, v, seg, do, sm_scale, causal,
                                      block_q, block_k, pos_mod, bwd_block_q,
                                      seg_chunk)
        return dq, dk, dv, None
    q, k, v, seg, o, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, seg, o, lse, do, sm_scale, causal,
                            block_q, block_k, pos_mod, bwd_block_q)
    return dq, dk, dv, None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


#: fold the GQA group axis into the q rows when groups*S is at most this —
#: at short/mid sequence the per-(b,h) matmul is M=S, K=d_head (M=512, K=64
#: at the 0.5B workload: ~7% MXU, overhead-bound at 280 grid cells/layer);
#: folding makes it M=groups*S with K/V tiles shared across the group
#: (M=3584 → ~4x faster attention, measured in docs/RESULTS.md). The cap
#: bounds VMEM: the [groups*S, block_k] f32 probs tile must fit.
FOLD_MAX_ROWS = 4096

#: past FOLD_MAX_ROWS the folded schedule still wins IF one GROUP's rows fit
#: a whole-KV one-shot tile: bq = bk = S (row tiles of one group, [S, S] f32
#: probs <= 4 MB at the 1024 cap). Measured at the packed-1024 0.5B workload
#: (groups*S = 7168): 164.3 samples/s vs 160.9 tiled / 128.6 folded
#: online-softmax / 159.1 512-row tiles (scripts/sweep_packed.py). Beyond
#: 1024 the quadratic probs tile blows VMEM (2048-row tiles: 57 MB > 16 MB).
FOLD_ONESHOT_MAX_S = 1024

#: tuning overrides for the folded schedule's row/kv tiles (None = all rows /
#: _pick_block(S)). Read at TRACE time — clear tst.train.sft._STEP_CACHE
#: when changing mid-process (scripts/sweep_fold_blocks.py does).
FOLD_BLOCK_Q: Optional[int] = None
FOLD_BLOCK_K: Optional[int] = None
#: backward q-row tile override for the folded schedule (None = same as the
#: forward: all groups*S rows). Swept at the step level: full rows wins
#: (120.4 samples/s vs 119.8 @896 / 118.0 @512) — Mosaic sub-schedules the
#: nominal [rows, block_k] f32 tiles without help. Kept as a knob for other
#: geometries.
FOLD_BWD_BLOCK_Q: Optional[int] = None

#: packed rows (seg_starts given): dispatch to the CHUNKED segment-sparse
#: one-shot when S >= this. The monolithic row-tiled one-shot it replaces
#: computes the FULL [S, S] square per group (its row tile spans every
#: position, so nothing can be skipped); with m segments per row that is
#: ~2m× the useful FLOPs (VERDICT r3 weak #1). The chunked schedule keeps
#: the one-shot structure (whole KV in one VMEM tile, exact two-pass
#: softmax, self-contained fused backward — the online-softmax tiled
#: alternative measured 22-64% SLOWER, scripts/sweep_packed.py C/L-Q) but
#: tiles rows position-contiguously (bq < S rows = one position range
#: inside one group) and computes each [bq, SEG_CHUNK] column chunk only
#: when it intersects the tile's visible window [seg_start(p0), p0+bq).
#: MEASURED (v5e, 0.5B k=5 packed, scripts/sweep_packed.py): at S=1024 the
#: monolithic full-square one-shot still WINS (164.1 samples/s vs chunked
#: best 143.3 at bq=ck=512 — the skipped ~55% of attention FLOPs are worth
#: less than the chunk bookkeeping + the single fat [3072, 1024] matmul's
#: MXU efficiency), so the default engages only at S >= 2048 where the
#: square's waste quadruples and the monolithic tile no longer fits anyway.
SEG_SPARSE_MIN_S = 2048

#: below/at this sequence length packed rows may use the folded chunked
#: one-shot even when the unpacked dispatch would go tiled (pack_len 2048:
#: groups*S and S both exceed the unpacked folded caps, but the chunked
#: kernel only ever materializes [SEG_BLOCK_Q, S] scratch)
SEG_ONESHOT_MAX_S = 2048

#: row tile / column chunk for the segment-sparse schedule (None = 256).
#: Smaller chunks skip more (avg computed cols ≈ bq + seg_len/2 + chunk)
#: but add VPU bookkeeping per chunk. Read at TRACE time — clear
#: tst.train.sft._STEP_CACHE when changing mid-process.
SEG_BLOCK_Q: Optional[int] = None
SEG_CHUNK: Optional[int] = None


def flash_attention(
    q: jnp.ndarray,  # [B, S, H, D] (model layout)
    k: jnp.ndarray,  # [B, S, KVH, D]
    v: jnp.ndarray,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    fold: Optional[bool] = None,
    seg_starts: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flash attention over model-layout tensors; returns [B, S, H, D].

    Dispatches between two kernel schedules:
      * **folded GQA** (automatic when ``block_q`` is not forced and
        ``groups*S <= FOLD_MAX_ROWS`` or ``S <= FOLD_ONESHOT_MAX_S``): q is
        viewed as [B, KVH, groups*S, D] — one grid cell per (batch, kv-head)
        runs the whole group as a single tall matmul, streaming each K/V
        tile from HBM once per GROUP instead of once per q-head; causal
        masking uses position = row % S (``pos_mod``). Rows tile as one tall
        matmul when they fit ``FOLD_MAX_ROWS``, else as one GROUP per tile
        with the whole KV in one tile (the row-tiled one-shot regime —
        measured fastest at packed-1024 shapes, scripts/sweep_packed.py).
        The backward dK/dV group-sum happens inside the matmul (contraction
        over rows).
      * **tiled** (long sequences / explicit blocks): the classic
        (batch, head, q_tile, kv_tile) grid with above-diagonal tile
        skipping.

    ``seg_starts``: optional int32 [B, n_segs<=MAX_SEGS] ascending segment
    start offsets for packed sequences (tst.data.packing; unused slots >=
    SEG_PAD). Attention is confined to each query's own contiguous segment
    — the packed-row equivalent of per-sample causal masks. Requires
    ``causal=True`` (segments are an additional restriction of the causal
    mask; a bidirectional packed mask is not implemented).
    """
    b, s, h, d = q.shape
    kv_heads = k.shape[2]
    groups = h // kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))
    seg = None
    if seg_starts is not None:
        if not causal:
            raise ValueError("seg_starts (packed sequences) requires causal=True")
        if seg_starts.shape[0] != b:
            raise ValueError(
                f"seg_starts batch {seg_starts.shape[0]} != q batch {b}")
        seg = seg_tile(seg_starts)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if fold is None:
        fold = (block_q is None and s == k.shape[1] and s % 128 == 0
                and (groups * s <= FOLD_MAX_ROWS
                     or s <= FOLD_ONESHOT_MAX_S
                     or (seg is not None and s <= SEG_ONESHOT_MAX_S)))
    elif fold:
        # explicit fold=True must still satisfy the schedule's invariants:
        # pos_mod masking assumes self-attention (q rows and kv columns share
        # the same sequence) and lane-aligned tiles
        if s != k.shape[1] or s % 128:
            raise ValueError(
                f"fold=True requires self-attention with a 128-multiple "
                f"sequence (q seq {s}, kv seq {k.shape[1]}) — the folded "
                f"schedule's pos = row % S causal mask is wrong for "
                f"cross-attention / kv-cache shapes")
    if fold:
        # folded-GQA schedule: [B, H, S, D] → [B, KVH, groups*S, D] (heads
        # are kv-major, so the reshape is layout-preserving). pos = row % S
        # masking is correct under ANY row tiling, so block_q here tiles the
        # folded [groups*S] rows (default: all of them — one tall matmul).
        qf = qt.reshape(b, kv_heads, groups * s, d)
        seg_bq = SEG_BLOCK_Q or 256
        ck = SEG_CHUNK or 256
        seg_chunk = None
        if (seg is not None and s >= SEG_SPARSE_MIN_S and seg_bq < s
                and s % seg_bq == 0 and s % ck == 0):
            # chunked segment-sparse one-shot: position-contiguous row
            # tiles, whole KV in one tile, per-chunk visibility skipping
            default_bq, default_bk = seg_bq, s
            seg_chunk = ck
        elif groups * s <= FOLD_MAX_ROWS and _pick_block(s, target=512) == s:
            # whole-rows one-shot (s <= 512): one tall matmul per (b, kvh),
            # KV in one tile — the measured 0.5B S=512 winner
            default_bq, default_bk = groups * s, s
        elif s <= FOLD_ONESHOT_MAX_S:
            # row-tiled folded one-shot: one GROUP per row tile, whole KV in
            # one tile (scratch-free kernels + self-contained fused bwd).
            # Preferred over whole-rows + kv tiles at s >= 1024: the online-
            # softmax fold measured 22% slower at 0.5B (sweep_packed.py C),
            # and its backward's [rows, bk] f32 tiles VMEM-OOM at d=128
            # (8B packed: 20.6 MB > 16 MB).
            default_bq = default_bk = s
        else:
            default_bq, default_bk = groups * s, _pick_block(s, target=512)
        bq = block_q or FOLD_BLOCK_Q or default_bq
        if block_q is None and (groups * s) % bq:
            bq = default_bq  # module-level override doesn't divide here
        bk = block_k or FOLD_BLOCK_K or default_bk
        if (groups * s) % bq or s % bk:
            raise ValueError(
                f"folded flash_attention: {groups}*{s} % block_q {bq} or "
                f"{s} % block_k {bk} != 0")
        bq_bwd = FOLD_BWD_BLOCK_Q or bq
        if (groups * s) % bq_bwd:
            bq_bwd = bq
        if seg_chunk is not None and not (bq < s and s % bq == 0 and bk == s):
            seg_chunk = None  # explicit overrides broke the chunked invariants
        qf, kernel_scale = _prescale(qf, sm_scale)
        o = _flash(qf, kt, vt, seg, kernel_scale, bool(causal),
                   int(bq), int(bk), int(s), int(bq_bwd), seg_chunk)
        return o.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    bq = block_q or _pick_block(s)
    bk = block_k or _pick_block(k.shape[1])
    if s % bq or k.shape[1] % bk:
        raise ValueError(
            f"flash_attention needs seq lengths divisible by the block sizes: "
            f"q {s} % {bq}, kv {k.shape[1]} % {bk} — pad sequences to a "
            f"128-multiple (tst.data.tokenize does this)"
        )
    qt, kernel_scale = _prescale(qt, sm_scale)
    o = _flash(qt, kt, vt, seg, kernel_scale, bool(causal), int(bq), int(bk),
               None, None)
    return o.transpose(0, 2, 1, 3)


def _prescale(qt, sm_scale):
    """(scaled q, kernel sm_scale): under PRESCALE_Q the multiply happens
    here in XLA (fused into the preceding transpose; gradients rescale
    through the chain rule) and every kernel skips its full-logits-tile
    multiplies via the static sm_scale==1.0 guard."""
    if PRESCALE_Q:
        return qt * jnp.asarray(sm_scale, qt.dtype), 1.0
    return qt, float(sm_scale)


def segment_starts_per_pos(seg_starts: jnp.ndarray, s: int) -> jnp.ndarray:
    """[B, n_segs] ascending starts → [B, S] segment start of each position
    (the largest start <= pos; positions before the first start get 0)."""
    seg = jnp.asarray(seg_starts, jnp.int32)
    pos = jnp.arange(s, dtype=jnp.int32)[None, :]  # [1, S]
    le = seg[:, None, :] <= pos[:, :, None]  # [B, S, n_segs]
    return jnp.max(jnp.where(le, seg[:, None, :], 0), axis=-1)


def segment_mask(seg_starts: jnp.ndarray, s: int) -> jnp.ndarray:
    """[B, S, S] bool causal-within-segment mask from packed-row starts:
    ok[b, i, j] = j <= i AND j >= segment_start(i). The dense-XLA
    equivalent of the kernels' seg tile (decoder fallback / references)."""
    start = segment_starts_per_pos(seg_starts, s)  # [B, S]
    rows = jnp.arange(s, dtype=jnp.int32)[:, None]  # [S, 1]
    cols = jnp.arange(s, dtype=jnp.int32)[None, :]  # [1, S]
    return (cols <= rows)[None] & (cols[None] >= start[:, :, None])


def mha_reference(q, k, v, causal: bool = True, sm_scale: Optional[float] = None,
                  seg_starts: Optional[jnp.ndarray] = None):
    """Dense XLA reference (same layout) for parity tests."""
    b, s, h, d = q.shape
    kv_heads = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))
    groups = h // kv_heads
    qg = q.reshape(b, s, kv_heads, groups, d)
    logits = jnp.einsum("bqkgd,bskd->bkgqs", qg, k, preferred_element_type=jnp.float32)
    logits = logits * sm_scale
    if seg_starts is not None:
        if not causal:
            raise ValueError("seg_starts requires causal=True")
        mask = segment_mask(seg_starts, s)  # [B, S, S]
        logits = jnp.where(mask[:, None, None], logits, -1e30)
    elif causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask[None, None, None], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bkgqs,bskd->bqkgd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.reshape(b, s, h, d).astype(q.dtype)
