"""Speculative decode at PIPELINE shapes: fold-vmapped round cost (chip).

scripts/probe_spec_decode.py measured the serving shapes (one model, B
rows). The pipeline's numeric/open scoring legs decode differently: a
[k, chunk] fold-vmapped grid where every fold carries its own LoRA and the
draft is shared (tst/train/infer.py _make_spec_decode_fn). Under vmap the
round loop runs until the SLOWEST fold finishes, and the per-fold chunk is
small (the KV budget divides by k), so the serving break-even does not
transfer — this probe (VERDICT r4 item 6) measures it at the real shapes:

    speedup(alpha) = (sum_{j=1..gamma} alpha^j + 1) * t_step / t_round

t_step / t_round are measured with the difference method over
(MAX_NEW, SHORT_NEW) to cancel prefills; the unrelated random-weight
draft pins acceptance to ~0 so spec rounds == max_new-1 exactly.

Run: python scripts/probe_spec_pipeline.py [k] [chunk]
  env TST_PROBE_DRAFTS=int8,int4 TST_PROBE_GAMMAS=2,4 narrows the grid.
Each config prints ONE JSON line; pin the table in docs/RESULTS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from _workload import make_workload  # noqa: F401  (sys.path side effect)

from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec, init_lora
from tst.train.infer import (_make_decode_fn, _make_spec_decode_fn,
                             decode_chunk_rows)

MAX_NEW, SHORT_NEW, REPS = 16, 4, 3
GAMMAS = tuple(int(g) for g in
               os.environ.get("TST_PROBE_GAMMAS", "2,4").split(","))
DRAFT_BITS = {"bf16": None, "int8": 8, "int4": 4}
DRAFTS = tuple(os.environ.get("TST_PROBE_DRAFTS", "int4").split(","))
ALPHAS = (0.5, 0.7, 0.8, 0.9)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 5
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 0  # 0 = auto budget
S = 512


def expected_commits(alpha: float, gamma: int) -> float:
    return sum(alpha ** j for j in range(1, gamma + 1)) + 1.0


def _grid(rng, k, rows, s, vocab):
    tokens = np.full((k * rows, s), 7, np.int32)
    plen = rng.integers(s // 2, s - 8, size=k * rows).astype(np.int32)
    for i, L in enumerate(plen):
        tokens[i, :L] = rng.integers(0, vocab - 1, size=L)
    idx = np.arange(k * rows, dtype=np.int32).reshape(k, rows)
    return (jnp.asarray(tokens), jnp.asarray(plen), jnp.asarray(idx))


def _time_pair(thunk_long, thunk_short, n_long, n_short, reps):
    """Per-unit wall via the difference method; None at the noise floor.
    Hard-syncs with np.asarray (remote PJRT returns early from
    block_until_ready)."""
    walls = []
    for th in (thunk_long, thunk_short):
        np.asarray(th())  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(th())
        walls.append((time.perf_counter() - t0) / reps)
    d = walls[0] - walls[1]
    if d <= 0:
        return None
    return d / (n_long - n_short)


def main() -> None:
    from tst.aux.ckpt import enable_compilation_cache

    enable_compilation_cache()
    on_tpu = jax.default_backend() in ("tpu", "axon")
    tgt_name = "llama3-8b" if on_tpu else "small"
    drf_name = "llama3.2-1b" if on_tpu else "tiny"
    spec = spec_by_name(tgt_name)
    params = init_params(jax.random.key(0), spec,
                         quantize=on_tpu, bits=8)
    lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
    keys = jax.random.split(jax.random.key(1), K)
    lora_k = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[init_lora(kk, spec, lspec) for kk in keys])
    rng = np.random.default_rng(0)

    from tst.models.quant import quantized_bytes

    base_bytes = quantized_bytes(params)

    # ── plain fold-vmapped decode: per-step wall ──
    chunk = CHUNK or decode_chunk_rows(spec, S, MAX_NEW, K,
                                       base_bytes=base_bytes)
    tokens, plen, idx = _grid(rng, K, chunk, S, spec.vocab_size)
    pos = plen - 1

    def plain(new):
        f = _make_decode_fn(spec, lspec, new, on_tpu, with_lora=True)
        return lambda: f(params, lora_k, tokens, pos + 1, idx)

    t_step = _time_pair(plain(MAX_NEW), plain(SHORT_NEW),
                        MAX_NEW, SHORT_NEW, REPS)
    if t_step is None:
        print("plain decode below noise floor; aborting", file=sys.stderr)
        return
    print(json.dumps({
        "leg": "plain", "k": K, "chunk": int(chunk), "seq": S,
        "step_ms": round(t_step * 1e3, 2),
        "rows_tok_per_s": round(K * chunk / t_step, 0),
    }), flush=True)
    jax.clear_caches()

    for dq in DRAFTS:
        bits = DRAFT_BITS[dq]
        dspec = spec_by_name(drf_name)
        dparams = init_params(jax.random.key(9), dspec,
                              quantize=bits is not None, bits=bits or 8)
        dbytes = quantized_bytes(dparams)
        for gamma in GAMMAS:
            chunk_s = CHUNK or decode_chunk_rows(
                spec, S, MAX_NEW, K, base_bytes=base_bytes + dbytes,
                draft_spec=dspec)
            tokens_s, plen_s, idx_s = _grid(rng, K, chunk_s, S,
                                            spec.vocab_size)
            pos_s = plen_s - 1

            def spec_fn(new):
                f = _make_spec_decode_fn(spec, dspec, lspec, new, gamma,
                                         on_tpu, with_lora=True)
                return lambda: f(params, dparams, lora_k, tokens_s,
                                 pos_s + 1, idx_s)

            # unrelated draft: acceptance ~0 → rounds == new-1
            t_round = _time_pair(spec_fn(MAX_NEW), spec_fn(SHORT_NEW),
                                 MAX_NEW - 1, SHORT_NEW - 1, REPS)
            row = {
                "leg": f"spec_{dq}_g{gamma}", "k": K, "chunk": int(chunk_s),
                "gamma": gamma, "draft": f"{drf_name}-{dq}",
            }
            if t_round is None:
                row["round_ms"] = None
            else:
                row["round_ms"] = round(t_round * 1e3, 2)
                row["round_cost_in_steps"] = round(t_round / t_step, 3)
                be = None
                for a in np.linspace(0.01, 0.999, 300):
                    if expected_commits(float(a), gamma) * t_step >= t_round:
                        be = round(float(a), 3)
                        break
                row["break_even_alpha"] = be
                row["speedup_at_alpha"] = {
                    str(a): round(expected_commits(a, gamma) * t_step
                                  / t_round, 3)
                    for a in ALPHAS
                }
            print(json.dumps(row), flush=True)
            jax.clear_caches()


if __name__ == "__main__":
    main()
