"""Rank-level packed-vs-unpacked held-out MCQ scoring parity (real chip).

s(x) is consumed as a RANKING — prune order inside IBP, and the Spearman
>= 0.99 parity target against the reference's released split
(BASELINE.json metric) — but the packed scorer was only ever pinned at the
PROB level (max |dprob| 1.6e-2 at int8/bf16, docs/RESULTS.md round-4
scoring campaign). Near-boundary probability flips could reorder prunes
without tripping that tolerance. This probe (VERDICT r4 item 3) trains one
epoch at realistic n, scores the SAME trained adapters through both
scorers, and reports Spearman(s_packed, s_unpacked) over the MCQ rows,
plus the max prob delta and the fraction of argmax-letter flips.

Run: python scripts/probe_scorer_parity.py [n] [legs]
  legs: comma list from {05b_bf16, 8b_int8} (default: both)
Each leg prints ONE JSON line; pin the Spearman in docs/RESULTS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
LEGS = (sys.argv[2].split(",") if len(sys.argv) > 2
        else ["05b_bf16", "8b_int8"])

MODEL_SETS = {
    # mirror scripts/northstar_anchor.py's shipped configs
    "05b_bf16": dict(name="qwen2.5-0.5b", quantize="none", remat="dots",
                     batch_size=3),
    "8b_int8": dict(name="llama3-8b", quantize="int8", remat="attn",
                    batch_size=1),
    # CPU plumbing smoke (float32 tiny; not a measurement)
    "tiny": dict(name="tiny", quantize="none", remat=False, batch_size=4,
                 dtype="float32", use_pallas=False),
}


def leg(tag: str) -> None:
    import jax
    import jax.numpy as jnp

    from tst.config import RunConfig
    from tst.data.adapters import load_benchmark
    from tst.diagnose.score import bias_scores
    from tst.eval.parity import spearman
    from tst.train.infer import score_heldout_mcq, score_heldout_mcq_packed
    from tst.train.pipeline import run_sft_diagnostic

    m = MODEL_SETS[tag]
    cfg = RunConfig()
    cfg.data.k = 5
    cfg.model.name = m["name"]
    cfg.model.quantize = m["quantize"]
    cfg.model.remat = m["remat"]
    if "dtype" in m:
        cfg.model.dtype = m["dtype"]
    if "use_pallas" in m:
        cfg.model.use_pallas = m["use_pallas"]
    cfg.optim.batch_size = m["batch_size"]
    cfg.optim.epochs = 1
    cfg.optim.pack = True
    cfg.optim.pack_len = 1024
    cfg.out_dir = f"/tmp/scorer_parity_{tag}"
    ds = load_benchmark("synthetic-vsi:0.4", n=N, seed=0)
    rep = run_sft_diagnostic(ds, cfg, return_state=True)
    st = rep["_state"]
    tb, fold_id = st["tb"], st["fold_id"]
    mcq_fold = np.where(tb.gold >= 0, fold_id, -1)
    on_tpu = cfg.model.use_pallas and jax.default_backend() == "tpu"

    t0 = time.time()
    p_packed = score_heldout_mcq_packed(
        st["params"], st["lora"], st["spec"], st["lspec"], tb, mcq_fold,
        cfg.data.k, pack_len=cfg.optim.pack_len, use_pallas=on_tpu)
    np.asarray(p_packed)
    t_packed = time.time() - t0
    t0 = time.time()
    p_unpacked = score_heldout_mcq(
        st["params"], st["lora"], st["spec"], st["lspec"],
        jnp.asarray(tb.tokens), jnp.asarray(tb.answer_pos),
        tb.option_token_ids, tb.n_options, mcq_fold, cfg.data.k,
        use_pallas=on_tpu, option_seqs=tb.option_token_seqs)
    np.asarray(p_unpacked)
    t_unpacked = time.time() - t0

    mcq = np.asarray(tb.gold) >= 0
    s_p = bias_scores(np.asarray(p_packed)[mcq], tb.gold[mcq],
                      tb.n_options[mcq], rule=cfg.rf.score_rule)
    s_u = bias_scores(np.asarray(p_unpacked)[mcq], tb.gold[mcq],
                      tb.n_options[mcq], rule=cfg.rf.score_rule)
    flips = int(np.sum(np.argmax(np.asarray(p_packed)[mcq], -1)
                       != np.argmax(np.asarray(p_unpacked)[mcq], -1)))
    print(json.dumps({
        "leg": tag, "n": N, "n_mcq": int(mcq.sum()), "k": cfg.data.k,
        "spearman_sx": round(float(spearman(s_p, s_u)), 6),
        "max_abs_dprob": round(float(np.max(np.abs(
            np.asarray(p_packed)[mcq] - np.asarray(p_unpacked)[mcq]))), 6),
        "argmax_letter_flips": flips,
        "score_wall_packed_s": round(t_packed, 2),
        "score_wall_unpacked_s": round(t_unpacked, 2),
    }), flush=True)
    jax.clear_caches()


def main() -> None:
    for tag in LEGS:
        leg(tag)


if __name__ == "__main__":
    main()
