"""Speculative-decode mechanics on the real chip: round wall vs plain steps.

Speculative greedy decoding commits ``E[accepted]+1`` exact-greedy tokens
per round (tst/models/spec_decode.py); whether it beats plain decode is
pure arithmetic on two measured walls:

    speedup(alpha) = (sum_{j=1..gamma} alpha^j + 1) * t_target_step / t_round

where alpha is the per-token draft/target agreement rate (workload- and
checkpoint-dependent — unmeasurable with synthetic weights, where two
models agree about nothing) and t_round = gamma+1 draft steps + one
(gamma+1)-token target chunk forward. This probe measures t_target_step
and t_round at serving shapes (8B-int8 target, llama3.2-1b bf16 draft,
S=512 prompts) and prints the break-even alpha and the speedup curve.

t_round is measured with an UNRELATED draft, which pins acceptance to ~0
so rounds == max_new-1 exactly (confirmed via return_stats); the
difference method over (max_new, short_new) cancels both prefills.

Run: python scripts/probe_spec_decode.py [B ...]    (default: 16 32)
     env TST_PROBE_DRAFTS=int8,int4 TST_PROBE_GAMMAS=2,4 narrows the grid
     (the full grid OOMs a 16 GB chip at B=32: the 8B-int8 target + bf16
     draft + two live chunk caches leave no slack, measured 2026-08-20).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

from _workload import make_workload, time_decode_steps

from tst.models.decode import greedy_decode
from tst.models.decoder import init_params, spec_by_name
from tst.models.spec_decode import speculative_greedy_decode

MAX_NEW, SHORT_NEW, REPS = 16, 4, 3
GAMMAS = (2, 4, 8)
#: draft weight storage — decode is weight-read-bound, so a quantized draft
#: cuts the gamma draft steps near-proportionally (int8 1B ~1.2 GB vs bf16
#: 2.4 GB); int4 routes through the pallas dequant-matmul like the target
DRAFTS = (("bf16", None), ("int8", 8), ("int4", 4))
ALPHAS = (0.5, 0.7, 0.8, 0.9)

_SEL_DRAFTS = os.environ.get("TST_PROBE_DRAFTS")
if _SEL_DRAFTS:
    _keep = set(_SEL_DRAFTS.split(","))
    DRAFTS = tuple(d for d in DRAFTS if d[0] in _keep)
_SEL_GAMMAS = os.environ.get("TST_PROBE_GAMMAS")
if _SEL_GAMMAS:
    GAMMAS = tuple(int(g) for g in _SEL_GAMMAS.split(","))


def expected_commits(alpha: float, gamma: int) -> float:
    return sum(alpha ** j for j in range(1, gamma + 1)) + 1.0


def main():
    w = make_workload()
    if not w.on_tpu:
        print("needs the real chip", file=sys.stderr)
        return
    tgt_spec = spec_by_name("llama3-8b")
    drf_spec = spec_by_name("llama3.2-1b")
    tgt = init_params(jax.random.key(0), tgt_spec, quantize=True, bits=8)

    def make_draft(bits):  # built lazily — 8 GB target + one draft at a time
        return init_params(jax.random.key(1), drf_spec,
                           quantize=bits is not None, bits=bits or 8)

    for b in [int(a) for a in sys.argv[1:]] or [16, 32]:
        rows = np.arange(b) % w.tokens.shape[0]
        toks = w.tokens[rows]
        plen = w.pos[rows] + 1

        # ── plain target decode steps-only (the baseline t_target_step) ──
        def make_plain(n_new):
            return jax.jit(lambda prm, t, pl_: greedy_decode(
                prm, t, pl_, n_new, tgt_spec, use_pallas=True,
                layer_loop="scan"))

        try:
            _, _, t_tgt_ms, _ = time_decode_steps(
                make_plain, (tgt, toks, plen), b,
                max_new=MAX_NEW, short_new=SHORT_NEW, reps=REPS)
        except Exception as e:
            print(f"B={b} plain decode failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        if t_tgt_ms is None:  # difference method hit the noise floor
            print(f"B={b} plain decode below noise floor; skipping batch",
                  file=sys.stderr)
            jax.clear_caches()
            continue
        print(f"B={b}  plain 8B-int8 step {t_tgt_ms:.2f} ms "
              f"({b * 1e3 / t_tgt_ms:.0f} tok/s steps-only)", flush=True)
        jax.clear_caches()  # drop the plain-decode executables + temps

        for dname, dbits in DRAFTS:
          try:
              drf = make_draft(dbits)
          except Exception as e:  # OOM after a failed config: skip, go on
              print(f"  draft={dname}: init failed "
                    f"{type(e).__name__}: {e}", file=sys.stderr)
              jax.clear_caches()
              continue
          for gamma in GAMMAS:
            def make_spec(n_new, _g=gamma):
                return jax.jit(lambda dp, tp, t, pl_: speculative_greedy_decode(
                    dp, drf_spec, tp, tgt_spec, t, pl_, n_new, gamma=_g,
                    use_pallas=True, layer_loop="scan",
                    draft_layer_loop="scan", return_stats=True))

            try:
                walls = {}
                compile_s = None
                for n_new in (MAX_NEW, SHORT_NEW):
                    fn = make_spec(n_new)
                    t0 = time.perf_counter()
                    out, stats = fn(drf, tgt, toks, plen)
                    np.asarray(out)
                    if compile_s is None:
                        compile_s = time.perf_counter() - t0
                    rounds = int(stats["rounds"])
                    assert rounds == n_new - 1, (
                        f"unrelated draft should accept 0 (rounds "
                        f"{rounds} != {n_new - 1})")
                    t0 = time.perf_counter()
                    for _ in range(REPS):
                        out, _ = fn(drf, tgt, toks, plen)
                    np.asarray(out)
                    walls[n_new] = (time.perf_counter() - t0) / REPS
            except Exception as e:
                print(f"  draft={dname} gamma={gamma}: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                jax.clear_caches()
                continue
            d_rounds = (MAX_NEW - 1) - (SHORT_NEW - 1)
            t_round_ms = (walls[MAX_NEW] - walls[SHORT_NEW]) / d_rounds * 1e3
            ratio = t_round_ms / t_tgt_ms
            # break-even: expected_commits(alpha*) == ratio
            lo, hi = 0.0, 1.0
            for _ in range(40):
                mid = (lo + hi) / 2
                if expected_commits(mid, gamma) < ratio:
                    lo = mid
                else:
                    hi = mid
            alpha_star = (lo + hi) / 2 if ratio <= gamma + 1 else float("nan")
            curve = "  ".join(
                f"a={a}: {expected_commits(a, gamma) / ratio:.2f}x"
                for a in ALPHAS)
            print(f"  draft={dname} gamma={gamma}  round {t_round_ms:.2f} ms "
                  f"({ratio:.2f} plain steps)  compile {compile_s:.0f}s  "
                  f"break-even alpha*={alpha_star:.2f}  {curve}", flush=True)
            jax.clear_caches()  # two live chunk caches/config is the margin
          del drf
          jax.clear_caches()


if __name__ == "__main__":
    main()
