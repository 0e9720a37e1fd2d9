"""Pallas packed-int4 dequant-matmul for the weight-read-bound decode step.

Why a kernel: at decode shapes (M = batch of 16–32 rows per step) XLA does
NOT fuse the planar-int4 dequant chain into the dot prologue the way it
does at training shapes — the dequantized halves spill to HBM in f32 and
the 8B int4 decode measured 57.8 ms/step vs int8's 16.5 (f32 spill of the
full weight ≈ 19 GB/step of extra traffic; scripts/bench_8b_decode.py).

Why the kernel indexes the LAYER STACK itself (scalar prefetch): pallas
inputs must be materialized arrays, so calling a 2-D kernel on a
scan-sliced layer weight makes XLA COPY that layer's packed bytes out of
the [L, K, N/2] stack every step — read + write + kernel read ≈ 3x the
packed traffic. Measured: every 2-D-kernel variant (per-group dots,
scale-folded full-depth dots, f32 vs bf16 MXU, 512-wide vs 3584-wide
bursts) landed within 21.6–24.3 ms/step at 8B — the slice copy was the
invariant floor. This version takes the whole stack plus the traced layer
index as a scalar-prefetch argument and block-indexes [layer, ki, ji], so
nothing is copied.

Layout contract (tst.models.quant._quantize_leaf_int4): ``q`` int8
[K, N/2]; column ``j`` lives in the LOW nibble stored BIASED (+8, in
[1, 15]) and column ``j + N/2`` in the HIGH nibble, signed — so the byte
value equals ``16*hi + lo_biased``. The unpack is a short f32 ALU chain
(v5e has no bf16 ALU — floor on bf16 fails an LLO check):

    f   = byte.astype(f32)            # exact: |byte| <= 127
    hi  = floor(f * 1/16)             # signed high nibble
    lo  = f - 16*hi - 8               # unbiased low nibble

with the RTN-g128 group scales folded elementwise into the two weight
tiles so each half is ONE full-depth dot per program (per-group 128-deep
dots measured slower — MXU pipeline refill). ``scale`` f32 [K/128, 1, N].

Grid is (N/2 blocks, K blocks) with K innermost sequential, f32
accumulation in the two output refs (standard pallas matmul accumulation
pattern). The caller concatenates the two [M, N/2] halves.

Inference-only (the decode step never differentiates weights); training
keeps the two-dot XLA path in tst.models.quant.qdot, which fuses at train
shapes (scripts/microbench_int4_dequant.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # rows per scale group (tst.models.quant.INT4_GROUP)

_INTERPRET = False  # flipped by tests on CPU


def _compiler_params(dims):
    try:
        return pltpu.CompilerParams(dimension_semantics=dims)
    except (AttributeError, TypeError):  # older jax naming
        return pltpu.TPUCompilerParams(dimension_semantics=dims)


def _kernel(li_ref, y_ref, q_ref, slo_ref, shi_ref, lo_ref, hi_ref):
    del li_ref  # consumed by the BlockSpec index maps
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        lo_ref[...] = jnp.zeros_like(lo_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)

    y = y_ref[...]
    _, bk, bn = q_ref.shape
    f = q_ref[0].astype(jnp.float32)      # byte = 16*hi + lo_biased, exact
    hi = jnp.floor(f * 0.0625)
    g3 = (bk // GROUP, GROUP, bn)
    # dot operands follow y's dtype: bf16 in production (small scaled
    # values), f32 in f32 tests (bit-parity with qdot)
    w_hi = (hi.reshape(g3) * shi_ref[0]).reshape(bk, bn).astype(y.dtype)
    w_lo = ((f - 16.0 * hi - 8.0).reshape(g3)
            * slo_ref[0]).reshape(bk, bn).astype(y.dtype)
    lo_ref[...] += jnp.dot(y, w_lo, preferred_element_type=jnp.float32)
    hi_ref[...] += jnp.dot(y, w_hi, preferred_element_type=jnp.float32)


def _kernel_pipe(li_ref, y_ref, q_ref, slo_ref, shi_ref, lo_ref, hi_ref,
                 wlo_s, whi_s):
    """Software-pipelined body: unpack block ki into scratch[ki % 2] while
    the MXU dots block ki−1 from scratch[(ki−1) % 2].

    The serial body (`_kernel`) makes each grid step's dots data-DEPENDENT
    on that step's VPU unpack chain, so the VLIW scheduler cannot co-issue
    them; staggering through a revolving scratch buffer makes unpack(ki)
    and dot(ki−1) independent straight-line ops the scheduler can overlap.
    The K grid runs ONE extra step (the epilogue dot); the q BlockSpec
    clamps that step's block index, its unpack is dead work (~1/nk), and
    the ki==0 dot on uninitialized scratch is discarded by a `jnp.where`
    select (NaN-safe: select, not multiply). Kept branch-free on purpose —
    `pl.when` regions are scheduling barriers.
    """
    del li_ref
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        lo_ref[...] = jnp.zeros_like(lo_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)

    _, bk, bn = q_ref.shape
    cur = jax.lax.rem(ki, 2)
    prev = jax.lax.rem(ki + 1, 2)

    # dot the PREVIOUS step's unpacked tiles (garbage at ki == 0, discarded);
    # the K slice of y must come off the REF (Mosaic has no value-level
    # dynamic_slice lowering)
    yk = y_ref[:, pl.ds(jnp.maximum(ki - 1, 0) * bk, bk)]
    acc_lo = jnp.dot(yk, wlo_s[prev], preferred_element_type=jnp.float32)
    acc_hi = jnp.dot(yk, whi_s[prev], preferred_element_type=jnp.float32)
    keep = ki > 0
    lo_ref[...] += jnp.where(keep, acc_lo, 0.0)
    hi_ref[...] += jnp.where(keep, acc_hi, 0.0)

    # unpack the CURRENT block into the other slot (dead on the epilogue)
    f = q_ref[0].astype(jnp.float32)
    hi = jnp.floor(f * 0.0625)
    g3 = (bk // GROUP, GROUP, bn)
    wlo_s[cur] = ((f - 16.0 * hi - 8.0).reshape(g3)
                  * slo_ref[0]).reshape(bk, bn).astype(wlo_s.dtype)
    whi_s[cur] = (hi.reshape(g3) * shi_ref[0]).reshape(bk, bn).astype(
        whi_s.dtype)


def _pick_blocks(k: int, n_half: int, block_n: int, block_k: int):
    """Wide (bn) and shallow (bk): the packed array is row-major
    [.., K, N/2], so a block row is one contiguous HBM burst of bn bytes.
    bn = largest divisor of n_half up to block_n (128 steps); bk bounded so
    the f32 unpack tiles fit VMEM (~6 MB at 512K packed elements/block)."""
    bn = min(block_n, n_half)
    while n_half % bn:
        bn -= 128 if bn > 128 else bn // 2
        if bn <= 0:
            bn = n_half
            break
    max_elems = 512 * 1024
    bk = min(block_k, k, max(GROUP, (max_elems // bn) // GROUP * GROUP))
    while k % bk or bk % GROUP:
        bk -= GROUP
    return bn, bk


#: Use the software-pipelined kernel body (unpack/dot staggered through a
#: revolving VMEM scratch so the VLIW scheduler can co-issue VPU and MXU).
#: Module-level so benches/tests can flip it; default set by measurement
#: (scripts/bench_8b_decode.py).
PIPELINE = False


def int4_matmul_stacked(y: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                        layer, *, block_n: int = 4096,
                        block_k: int = 1024,
                        pipeline: Optional[bool] = None) -> jnp.ndarray:
    """``y[M, K] @ dequant(q[layer], scale[layer])[K, N]`` → f32 [M, N].

    ``q`` int8 [L, K, N/2] planar-packed (low nibble biased +8, high
    signed), ``scale`` f32 [L, K/128, 1, N] (tst.models.quant layout);
    ``layer`` a (traced or static) scalar index. Indexing happens in the
    kernel's BlockSpecs via scalar prefetch — the stack is never sliced, so
    the per-layer copy a materialized pallas input would force never
    happens. M must be a multiple of 8; callers fall back to
    tst.models.quant.qdot otherwise. ``pipeline`` (default: module
    ``PIPELINE``) selects the software-pipelined body (`_kernel_pipe`).
    """
    m, k = y.shape
    n_layers, k2, n_half = q.shape
    assert k == k2, (y.shape, q.shape)
    n = 2 * n_half
    assert scale.shape == (n_layers, k // GROUP, 1, n), (scale.shape, k, n)
    pipe = PIPELINE if pipeline is None else pipeline
    bn, bk = _pick_blocks(k, n_half, block_n, block_k)
    nk = k // bk
    grid = (n_half // bn, nk + (1 if pipe else 0))
    offs = n_half // bn
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    if pipe:
        # the epilogue grid step's block index is clamped (its unpack is
        # dead work); y rides whole in VMEM — the kernel slices the K block
        # for the PREVIOUS grid step itself
        def _ki(ki, _nk=nk - 1):
            return jnp.minimum(ki, _nk)
        in_specs = [
            pl.BlockSpec((m, k), lambda ji, ki, li: (0, 0)),
            pl.BlockSpec((1, bk, bn), lambda ji, ki, li: (li[0], _ki(ki), ji)),
            pl.BlockSpec((1, bk // GROUP, 1, bn),
                         lambda ji, ki, li: (li[0], _ki(ki), 0, ji)),
            pl.BlockSpec((1, bk // GROUP, 1, bn),
                         lambda ji, ki, li, _o=offs:
                         (li[0], _ki(ki), 0, ji + _o)),
        ]
        kernel = _kernel_pipe
        scratch = [pltpu.VMEM((2, bk, bn), y.dtype),
                   pltpu.VMEM((2, bk, bn), y.dtype)]
    else:
        in_specs = [
            pl.BlockSpec((m, bk), lambda ji, ki, li: (0, ki)),
            pl.BlockSpec((1, bk, bn), lambda ji, ki, li: (li[0], ki, ji)),
            pl.BlockSpec((1, bk // GROUP, 1, bn),
                         lambda ji, ki, li: (li[0], ki, 0, ji)),
            pl.BlockSpec((1, bk // GROUP, 1, bn),
                         lambda ji, ki, li, _o=offs: (li[0], ki, 0, ji + _o)),
        ]
        kernel = _kernel
        scratch = []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((m, bn), lambda ji, ki, li: (0, ji)),
            pl.BlockSpec((m, bn), lambda ji, ki, li: (0, ji)),
        ],
        scratch_shapes=scratch,
    )
    lo, hi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, n_half), jnp.float32),
            jax.ShapeDtypeStruct((m, n_half), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(lidx, y, q, scale, scale)
    return jnp.concatenate([lo, hi], axis=-1)


def int4_matmul(y: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                *, block_n: int = 4096, block_k: int = 1024) -> jnp.ndarray:
    """2-D convenience wrapper: ``y[M, K] @ dequant(q, scale)[K, N]``."""
    return int4_matmul_stacked(y, q[None], scale[None], 0,
                               block_n=block_n, block_k=block_k)
