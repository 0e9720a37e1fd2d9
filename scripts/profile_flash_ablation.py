"""Decompose the folded one-shot flash forward's time budget by ablation.

The kernel runs at ~42% of its K=64 matmul-practical peak; scalar-multiply
removal measured NEUTRAL (sweep_softmax_variants), so the cost is in the
mask / max / exp / sum chain or tile movement. Each variant below removes
one piece (NUMERICALLY WRONG — timing only); the deltas attribute the gap.

Shapes = the 0.5B fold-parallel step's folded attention: one grid cell per
(batch=20, kv-head=2), rows = groups*S = 7*512 = 3584, d = 64, bk = 512.

Run: python scripts/profile_flash_ablation.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tst.aux.ckpt import enable_compilation_cache
from tst.kernels.flash_attention import DEFAULT_MASK_VALUE, _compiler_params

B, KVH, G, S, D = 20, 2, 7, 512, 64
ROWS, BK = G * S, S
ITERS = 64


def kernel(q_ref, k_ref, v_ref, o_ref, *, variant):
    q = q_ref[0, 0]  # [ROWS, D]
    k = k_ref[0, 0]  # [BK, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if variant in ("full", "nomax", "nosum", "nonorm"):
        rows = jnp.bitwise_and(
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, BK), 0), S - 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, BK), 1)
        s = jnp.where(cols <= rows, s, DEFAULT_MASK_VALUE)
    if variant in ("full", "nomask", "nosum", "nonorm"):
        m = jnp.max(s, axis=1, keepdims=True)
    else:
        m = 10.0  # nomax: fixed shift
    if variant == "matmul":
        p = s  # no exp at all: matmul-only floor
    else:
        p = jnp.exp(s - m)
    if variant in ("full", "nomask", "nomax"):
        l = jnp.sum(p, axis=1, keepdims=True)
    else:
        l = 1.0  # nosum/nonorm: skip the lane reduction
    v = v_ref[0, 0]
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    if variant in ("full", "nomask", "nomax", "nosum"):
        o = o / l if variant != "nosum" else o  # nosum also skips divide
    o_ref[0, 0] = o.astype(o_ref.dtype)


def build(variant):
    f = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid=(B, KVH),
        in_specs=[
            pl.BlockSpec((1, 1, ROWS, D), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ROWS, D), lambda bi, hi: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, KVH, ROWS, D), jnp.bfloat16),
        compiler_params=_compiler_params(("parallel", "parallel")),
    )

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            o = f(carry, k, v)
            # chain iterations so nothing is DCE'd; cast keeps dtype stable
            return (carry + 0.0 * o).astype(carry.dtype), ()

        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return out

    return run


def main():
    enable_compilation_cache()
    q = jax.random.normal(jax.random.key(0), (B, KVH, ROWS, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, KVH, BK, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, KVH, BK, D), jnp.bfloat16)
    matmul_ideal_us = (2 * 2 * B * KVH * ROWS * BK * D) / 197e12 * 1e6 / (B * KVH)
    print(f"grid cells/call: {B*KVH}; iters/timing: {ITERS}; "
          f"matmul-ideal {matmul_ideal_us:.1f} us/cell (197 peak)")
    print(f"{'variant':>8} {'compile_s':>9} {'call_ms':>8} {'us/cell':>8} {'xFull':>6}")
    base = None
    for variant in ("full", "nomask", "nomax", "nosum", "nonorm", "matmul"):
        run = build(variant)
        t0 = time.perf_counter()
        np.asarray(run(q, k, v))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(q, k, v)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / 3 / ITERS
        us_cell = dt * 1e6 / (B * KVH)
        if base is None:
            base = dt
        print(f"{variant:>8} {compile_s:>9.1f} {dt*1e3:>8.2f} {us_cell:>8.1f} "
              f"{dt/base:>6.2f}", flush=True)


if __name__ == "__main__":
    main()
