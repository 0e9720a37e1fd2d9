"""Pallas fused SwiGLU MLP: down( silu(x·Wg) · (x·Wu) ) in one kernel.

SURVEY.md §2b B12 (the MLP half of "fused attention+MLP"). What the fusion
buys on TPU: XLA materializes the [B·S, F] hidden between the up- and
down-projections in HBM (F=4864..14336 — 3 HBM round-trips of the largest
activation in the layer); this kernel keeps each [bm, bf] hidden tile in
VMEM, streaming Wg/Wu/Wd blocks while accumulating the output tile in f32
scratch.

Backward (custom_vjp) recomputes the hidden tile-free via standard XLA
matmuls — MXU-bound either way — so nothing bigger than [bm, D] is ever
saved. Forward/grad parity vs the jnp reference is tested in interpret mode
on CPU and on the real chip (SURVEY.md §4.2).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def _compiler_params(dims):
    try:
        return pltpu.CompilerParams(dimension_semantics=dims)
    except (AttributeError, TypeError):
        return pltpu.TPUCompilerParams(dimension_semantics=dims)


def _pick(n: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return n


def _fused_mlp_kernel(x_ref, wg_ref, wu_ref, wd_ref, out_ref, acc_ref, *, f_blocks):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # [bm, D]
    g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)  # [bm, bf]
    u = jnp.dot(x, wu_ref[...], preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    acc_ref[...] += jnp.dot(h, wd_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == f_blocks - 1)
    def _store():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _fused_mlp_fwd_impl(x2d, wg, wu, wd, block_m, block_f):
    m, d = x2d.shape
    f = wg.shape[1]
    grid = (m // block_m, f // block_f)
    return pl.pallas_call(
        functools.partial(_fused_mlp_kernel, f_blocks=f // block_f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((d, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((block_f, d), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, d), jnp.float32)],
        compiler_params=_compiler_params(("parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(x2d, wg, wu, wd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _swiglu(x2d, wg, wu, wd, block_m, block_f):
    return _fused_mlp_fwd_impl(x2d, wg, wu, wd, block_m, block_f)


def _swiglu_fwd(x2d, wg, wu, wd, block_m, block_f):
    out = _fused_mlp_fwd_impl(x2d, wg, wu, wd, block_m, block_f)
    return out, (x2d, wg, wu, wd)


def _swiglu_bwd(block_m, block_f, res, dout):
    x, wg, wu, wd = res
    xf = x.astype(jnp.float32)
    g = xf @ wg.astype(jnp.float32)
    u = xf @ wu.astype(jnp.float32)
    sg = jax.nn.sigmoid(g)
    silu_g = g * sg
    h = silu_g * u
    doutf = dout.astype(jnp.float32)
    dh = doutf @ wd.astype(jnp.float32).T
    dwd = h.T @ doutf
    du = dh * silu_g
    dg = dh * u * (sg + g * sg * (1 - sg))  # d silu(g)/dg = sig + g·sig·(1-sig)
    dx = dg @ wg.astype(jnp.float32).T + du @ wu.astype(jnp.float32).T
    dwg = xf.T @ dg
    dwu = xf.T @ du
    return (dx.astype(x.dtype), dwg.astype(wg.dtype),
            dwu.astype(wu.dtype), dwd.astype(wd.dtype))


_swiglu.defvjp(_swiglu_fwd, _swiglu_bwd)


def fused_swiglu_mlp(
    x: jnp.ndarray,  # [..., D]
    w_gate: jnp.ndarray,  # [D, F]
    w_up: jnp.ndarray,  # [D, F]
    w_down: jnp.ndarray,  # [F, D]
    block_m: int = 0,
    block_f: int = 0,
) -> jnp.ndarray:
    """SwiGLU MLP with leading dims flattened into the row-tile axis."""
    d = x.shape[-1]
    f = w_gate.shape[1]
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    bm = block_m or _pick(m, (256, 128, 64, 32, 16, 8))
    bf = block_f or _pick(f)
    x2d = x.reshape(m, d)
    out = _swiglu(x2d, w_gate, w_up, w_down, bm, bf)
    return out.reshape(*lead, d)


def swiglu_reference(x, w_gate, w_up, w_down):
    """Plain XLA reference for parity tests (matches decoder MLP math)."""
    g = jnp.einsum("...d,df->...f", x, w_gate, preferred_element_type=jnp.float32)
    u = jnp.einsum("...d,df->...f", x, w_up, preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    return jnp.einsum("...f,fd->...d", h, w_down,
                      preferred_element_type=jnp.float32).astype(x.dtype)
