"""Which int4-dequant formulation does XLA fuse into the consuming matmul?

The first packed-int4 cut (nibbles along the input axis, reconstruction via
stack+interleave-reshape) measured 8B k=5 full-remat at 4.59 samples/s vs
int8's 8.14 — the interleave breaks the dot-prologue fusion and a full f32
weight materializes per use. This microbenchmark times one [M, K] @ [K, N]
at a training-shaped size for each candidate reconstruction, against the
int8 dequant that is known to fuse:

  int8     : q.astype(f32) * scale                      (fusion baseline)
  interleave: stack([low, high], -2).reshape            (current, suspect)
  planar2dot: pack along N planar halves; two dots on elementwise-dequantized
              halves + output concat (each half's chain is pure elementwise)
  bf16      : interleave chain but multiply in bf16     (halves the spill)

Run: python scripts/microbench_int4_dequant.py [M K N]   (default 3584 4096 4096)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

G = 128


def timeit(fn, *args, reps=20, warm=3):
    # NB: this environment's remote PJRT returns early from
    # block_until_ready — np.asarray is the only hard host sync (same
    # workaround as tst/aux/profile.py). Sync on an in-graph scalar
    # reduction so the big output never rides the remote tunnel; chain it
    # through the reps so no step can be elided.
    f = jax.jit(lambda c, *a: fn(*a).astype(jnp.float32).sum() + c)
    c = jnp.float32(0)
    for _ in range(warm):
        c = f(c, *args)
    np.asarray(c)
    t0 = time.perf_counter()
    for _ in range(reps):
        c = f(c, *args)
    np.asarray(c)
    return (time.perf_counter() - t0) / reps


def main():
    M, K, N = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (3584, 4096, 4096)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.02

    # int8 per-channel
    s8 = np.abs(w).max(0, keepdims=True) / 127.0
    q8 = jnp.asarray(np.clip(np.round(w / s8), -127, 127), jnp.int8)
    s8 = jnp.asarray(s8)

    # int4 grouped along K, values in [-7, 7]
    wg = w.reshape(K // G, G, N)
    s4 = np.abs(wg).max(1, keepdims=True) / 7.0  # [K/G, 1, N]
    q4 = np.clip(np.round(wg / s4), -7, 7).astype(np.int8)  # [K/G, G, N]

    # layout A: nibbles packed along K (rows 2i low, 2i+1 high) — current
    qa = q4.reshape(K // G, G // 2, 2, N)
    packed_k = jnp.asarray((qa[:, :, 0] & 0xF) | (qa[:, :, 1] << 4), jnp.int8).reshape(K // 2, N)

    # layout B: planar halves along N (col j low nibble, col j + N/2 high)
    qf = q4.reshape(K, N)
    packed_n = jnp.asarray((qf[:, : N // 2] & 0xF) | (qf[:, N // 2:] << 4), jnp.int8)

    s4 = jnp.asarray(s4)

    def mm_bf16(x, wfull):
        return jnp.einsum("mk,kn->mn", x, wfull, preferred_element_type=jnp.bfloat16)

    def f_int8(x, q, s):
        return mm_bf16(x, (q.astype(jnp.float32) * s).astype(jnp.bfloat16))

    def f_interleave(x, p, s):
        low = ((p << 4) >> 4).astype(jnp.float32)
        high = (p >> 4).astype(jnp.float32)
        g = jnp.stack([low, high], axis=-2)  # [K/2, 2, N] — interleave
        g = g.reshape(K // G, G, N) * s
        return mm_bf16(x, g.reshape(K, N).astype(jnp.bfloat16))

    def f_interleave_bf16(x, p, s):
        low = ((p << 4) >> 4).astype(jnp.bfloat16)
        high = (p >> 4).astype(jnp.bfloat16)
        g = jnp.stack([low, high], axis=-2)
        g = g.reshape(K // G, G, N) * s.astype(jnp.bfloat16)
        return mm_bf16(x, g.reshape(K, N))

    def f_planar2dot(x, p, s):
        # each half: pure elementwise shifts + grouped scale via trivial
        # contiguous reshapes — fuses into its own dot's prologue
        def half(vals, scol):
            wf = vals.astype(jnp.float32).reshape(K // G, G, N // 2) * scol
            return wf.reshape(K, N // 2).astype(jnp.bfloat16)
        lo = mm_bf16(x, half((p << 4) >> 4, s[..., : N // 2]))
        hi = mm_bf16(x, half(p >> 4, s[..., N // 2:]))
        return jnp.concatenate([lo, hi], axis=-1)

    def f_bf16_ref(x, wfull):
        return mm_bf16(x, wfull)

    wfull = jnp.asarray(w, jnp.bfloat16)
    t_ref = timeit(f_bf16_ref, x, wfull)
    t8 = timeit(f_int8, x, q8, s8)
    ti = timeit(f_interleave, x, packed_k, s4)
    tib = timeit(f_interleave_bf16, x, packed_k, s4)
    tp = timeit(f_planar2dot, x, packed_n, s4)

    # correctness of the planar reconstruction vs direct dequant matmul
    ref = np.asarray(f_interleave(x, packed_k, s4), np.float32)
    got = np.asarray(f_planar2dot(x, packed_n, s4), np.float32)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)

    flops = 2 * M * K * N
    print(f"shape M={M} K={K} N={N}  ({flops/1e9:.1f} GFLOP)")
    for name, t in [("bf16 ref", t_ref), ("int8 fused", t8),
                    ("int4 interleave f32", ti), ("int4 interleave bf16", tib),
                    ("int4 planar 2-dot", tp)]:
        print(f"{name:>22}: {t*1e6:9.1f} us  {flops/t/1e12:7.1f} TF/s")
    print(f"planar vs interleave max rel err: {err:.2e}")


if __name__ == "__main__":
    main()
