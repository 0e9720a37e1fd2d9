"""How much of the int4 dequant-matmul's time is EXPOSED unpack ALU?

Times the production kernel against a structurally identical pallas call
whose body skips the unpack chain entirely (dots the raw packed bytes) —
same grid, same BlockSpecs, same DMA and MXU work. The difference is the
VPU time Mosaic fails to hide behind the dots; it decides whether chasing
ALU overlap (the pipelined-body experiment lost 1.5x) can pay at all.

Shapes: the three distinct 8B per-layer matmuls, y bf16, L=32 stack,
B in {16, 32}. Run on the real chip.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tst.kernels import quant_matmul as qm

L = 32
SHAPES = [  # (K, N) of the 8B per-layer dots the decode step runs
    ("wq/wo", 4096, 4096),
    ("gate/up", 4096, 14336),
    ("down", 14336, 4096),
]


def _kernel_noalu(li_ref, y_ref, q_ref, slo_ref, shi_ref, lo_ref, hi_ref):
    del li_ref, slo_ref, shi_ref
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        lo_ref[...] = jnp.zeros_like(lo_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)

    y = y_ref[...]
    w = q_ref[0].astype(y.dtype)  # one cast, no unpack chain
    lo_ref[...] += jnp.dot(y, w, preferred_element_type=jnp.float32)
    hi_ref[...] += jnp.dot(y, w, preferred_element_type=jnp.float32)


def run(y, q, scale, layer, noalu: bool):
    m, k = y.shape
    _, _, n_half = q.shape
    bn, bk = qm._pick_blocks(k, n_half, 4096, 1024)
    grid = (n_half // bn, k // bk)
    offs = n_half // bn
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda ji, ki, li: (0, ki)),
            pl.BlockSpec((1, bk, bn), lambda ji, ki, li: (li[0], ki, ji)),
            pl.BlockSpec((1, bk // qm.GROUP, 1, bn),
                         lambda ji, ki, li: (li[0], ki, 0, ji)),
            pl.BlockSpec((1, bk // qm.GROUP, 1, bn),
                         lambda ji, ki, li, _o=offs: (li[0], ki, 0, ji + _o)),
        ],
        out_specs=[
            pl.BlockSpec((m, bn), lambda ji, ki, li: (0, ji)),
            pl.BlockSpec((m, bn), lambda ji, ki, li: (0, ji)),
        ],
    )
    return pl.pallas_call(
        _kernel_noalu if noalu else qm._kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m, n_half), jnp.float32),
                   jax.ShapeDtypeStruct((m, n_half), jnp.float32)],
        compiler_params=qm._compiler_params(("parallel", "arbitrary")),
    )(lidx, y, q, scale, scale)


def main():
    rng = np.random.default_rng(0)
    print(f"{'shape':>8} {'B':>3} {'serial_ms':>9} {'noalu_ms':>8} "
          f"{'exposed_alu%':>12} {'gbps_noalu':>10}")
    for name, k, n in SHAPES:
        q = jnp.asarray(rng.integers(1, 127, size=(L, k, n // 2)), jnp.int8)
        scale = jnp.asarray(
            rng.normal(size=(L, k // qm.GROUP, 1, n)).astype(np.float32)
            * 0.01)
        for b in (16, 32):
            y = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
            walls = {}
            for noalu in (False, True):
                # sum over all L layers so the packed read leaves HBM cache
                @jax.jit
                def f(y, q, scale, _noalu=noalu):
                    def body(c, i):
                        lo, hi = run(y, q, scale, i, _noalu)
                        return c + lo.sum() + hi.sum(), None
                    out, _ = jax.lax.scan(
                        body, jnp.float32(0), jnp.arange(L))
                    return out
                np.asarray(f(y, q, scale))
                t0 = time.perf_counter()
                for _ in range(5):
                    r = f(y, q, scale)
                np.asarray(r)
                walls[noalu] = (time.perf_counter() - t0) / 5 * 1e3
            gb = L * k * (n // 2) / 1e9
            print(f"{name:>8} {b:>3} {walls[False]:>9.2f} {walls[True]:>8.2f} "
                  f"{(walls[False] - walls[True]) / walls[False] * 100:>11.0f}% "
                  f"{gb / (walls[True] / 1e3):>10.0f}", flush=True)


if __name__ == "__main__":
    main()
