"""Sweep flash-attention block sizes at long sequence lengths on the real TPU.

VERDICT r1 weak #7: the 512/128 _pick_block heuristic was unvalidated at the
16k/32k VideoMME shapes. This script times fwd and fwd+bwd at several
(block_q, block_k) choices and prints a JSON table; the winner gets encoded
into flash_attention._pick_block.

Run: python scripts/sweep_flash_blocks.py [seq ...]
"""

from __future__ import annotations

import itertools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tst.kernels.flash_attention import flash_attention


def time_one(seq: int, bq: int, bk: int, *, heads=14, kv_heads=2, d=64,
             batch=1, iters=8) -> dict:
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(batch, seq, heads, d)), jnp.bfloat16) * 0.3
    k = jnp.asarray(rng.normal(size=(batch, seq, kv_heads, d)), jnp.bfloat16) * 0.3
    v = jnp.asarray(rng.normal(size=(batch, seq, kv_heads, d)), jnp.bfloat16) * 0.3

    fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v, block_q=bq, block_k=bk))

    def loss(q, k, v):
        return flash_attention(q, k, v, block_q=bq, block_k=bk).astype(jnp.float32).sum()

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    out = {"seq": seq, "block_q": bq, "block_k": bk}
    t0 = time.perf_counter()
    o = fwd(q, k, v)
    np.asarray(o[0, 0, 0])  # hard sync (axon: block_until_ready lies)
    out["compile_fwd_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fwd(q, k, v)
    np.asarray(o[0, 0, 0])
    out["fwd_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 3)

    t0 = time.perf_counter()
    g = grad(q, k, v)
    np.asarray(g[0][0, 0, 0])
    out["compile_bwd_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = grad(q, k, v)
    np.asarray(g[0][0, 0, 0])
    out["fwdbwd_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 3)
    # causal attention FLOPs: ~0.5 * 4 * B*H*S^2*D fwd; bwd ~2.5x fwd
    flops_fwd = 0.5 * 4 * batch * heads * seq * seq * d
    out["fwd_tflops"] = round(flops_fwd / (out["fwd_ms"] / 1e3) / 1e12, 2)
    return out


def main():
    seqs = [int(a) for a in sys.argv[1:]] or [16384, 32768]
    results = []
    for seq in seqs:
        cands = [(512, 512), (1024, 512), (512, 1024), (2048, 512),
                 (1024, 1024), (256, 512)]
        for bq, bk in cands:
            if seq % bq or seq % bk:
                continue
            try:
                r = time_one(seq, bq, bk)
            except Exception as e:  # OOM/VMEM limits at big blocks
                r = {"seq": seq, "block_q": bq, "block_k": bk,
                     "error": f"{type(e).__name__}: {str(e)[:200]}"}
            results.append(r)
            print(json.dumps(r), flush=True)
    best = {}
    for r in results:
        if "fwdbwd_ms" not in r:
            continue
        s = r["seq"]
        if s not in best or r["fwdbwd_ms"] < best[s]["fwdbwd_ms"]:
            best[s] = r
    print(json.dumps({"best": {str(s): (b["block_q"], b["block_k"], b["fwdbwd_ms"])
                               for s, b in best.items()}}), flush=True)


if __name__ == "__main__":
    main()
