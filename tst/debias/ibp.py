"""Iterative Bias Pruning (IBP) — `tst debias-ibp`.

Requirement: "filtering high-bias samples using an 'Iterative Bias Pruning'
(IBP) procedure" producing the debiased benchmark (reference README.md:35;
artifact: VSI-Bench debiased config, reference README.md:14). Loop
(SURVEY.md §3.3):

  round r: run the k-fold diagnostic on the surviving set → s(x)
           → prune the top ``prune_rate`` fraction by s(x)
             (optionally category-balanced, so no question type is wiped out)
           → stop when blind accuracy ≤ chance + ε, or after R rounds.

TPU realization: the tokenized dataset is uploaded ONCE and stays
device-resident; each round trains on the surviving subset via fold index
streams (host keeps only the boolean survivor mask and tiny index arrays —
no per-round dataset re-upload). Only the stop-decision scalar and the s(x)
vector cross back per round [north-star]. The diagnostic is pluggable: the
blind-SFT engine (default) or the fast RF auditor.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import numpy as np

from tst.config import RunConfig
from tst.data.schema import BlindDataset


def prune_mask(
    s_x: np.ndarray,
    alive: np.ndarray,
    prune_rate: float,
    categories: Optional[np.ndarray] = None,
    min_keep: int = 8,
) -> np.ndarray:
    """One pruning step: drop the top ``prune_rate`` fraction of *alive*
    samples by s(x). NaN s(x) (non-MCQ rows) are never pruned.

    ``categories`` (int ids) switches to category-balanced pruning: the
    per-round prune budget is split across categories proportionally to their
    surviving counts, so pruning cannot collapse a whole question type
    (interpretable auditing requirement, reference README.md:35).
    """
    alive = np.asarray(alive, bool).copy()
    s = np.where(np.isnan(s_x), -np.inf, np.asarray(s_x, np.float32))
    n_alive = int(alive.sum())
    budget = int(round(prune_rate * n_alive))
    if budget <= 0 or n_alive <= min_keep:
        return alive
    budget = min(budget, n_alive - min_keep)

    def prune_from(rows: np.ndarray, quota: int) -> List[int]:
        order = rows[np.argsort(-s[rows], kind="stable")]
        order = order[np.isfinite(s[order])]
        return list(order[:quota])

    to_prune: List[int] = []
    if categories is None:
        to_prune = prune_from(np.flatnonzero(alive), budget)
    else:
        categories = np.asarray(categories)
        cats, counts = np.unique(categories[alive], return_counts=True)
        # largest-remainder apportionment of the budget over categories
        raw = budget * counts / counts.sum()
        quotas = np.floor(raw).astype(int)
        rem = budget - quotas.sum()
        for i in np.argsort(-(raw - quotas), kind="stable")[:rem]:
            quotas[i] += 1
        for c, quota in zip(cats, quotas):
            rows = np.flatnonzero(alive & (categories == c))
            to_prune += prune_from(rows, int(quota))
    alive[np.asarray(to_prune, int)] = False
    return alive


def run_ibp(ds: BlindDataset, cfg: RunConfig) -> Dict[str, Any]:
    """Full IBP pipeline → debiased split + audit trail + report."""
    t_start = time.time()
    n = len(ds)
    alive = np.ones(n, bool)
    cat_names = ds.categories
    cat_ids = np.array([cat_names.index(s.category) for s in ds])
    audit: List[Dict[str, Any]] = []
    last_sx = np.full(n, np.nan, np.float32)

    use_sft = cfg.ibp.diagnostic == "sft"
    rounds_run = 0
    stop_reason = "max_rounds"
    for r in range(cfg.ibp.rounds):
        sub_idx = np.flatnonzero(alive)
        sub = ds.subset(sub_idx)
        if use_sft:
            from tst.train.pipeline import run_sft_diagnostic

            sub_cfg = _round_cfg(cfg, r)
            rep = run_sft_diagnostic(sub, sub_cfg, return_state=True)
            s_sub = rep["_state"]["s_x"]
            blind_acc, chance = rep["blind_accuracy"], rep["chance_accuracy"]
        else:
            from tst.diagnose.rf import run_rf_diagnostic

            d = run_rf_diagnostic(sub, k=cfg.data.k, seed=cfg.data.seed + r,
                                  n_estimators=cfg.rf.n_estimators,
                                  max_depth=cfg.rf.max_depth, backend=cfg.rf.backend,
                                  score_rule=cfg.rf.score_rule)
            s_sub = d.s_x
            blind_acc, chance = d.blind_accuracy, d.chance
        last_sx[sub_idx] = s_sub
        rounds_run = r + 1
        audit.append({
            "round": r,
            "n_alive": int(alive.sum()),
            "blind_accuracy": float(blind_acc),
            "chance": float(chance),
        })
        if blind_acc <= chance + cfg.ibp.stop_epsilon:
            stop_reason = "blind_acc<=chance+eps"
            break
        new_alive = prune_mask(
            _scatter(s_sub, sub_idx, n), alive, cfg.ibp.prune_rate,
            categories=cat_ids if cfg.ibp.category_balanced else None,
        )
        audit[-1]["pruned_this_round"] = int(alive.sum() - new_alive.sum())
        if new_alive.sum() == alive.sum():
            stop_reason = "no_prunable_samples"
            break
        alive = new_alive

    from tst.io import outputs

    report = {
        "benchmark": ds.name,
        "rounds_run": rounds_run,
        "stop_reason": stop_reason,
        "n_original": n,
        "n_debiased": int(alive.sum()),
        "fraction_kept": float(alive.sum() / n),
        "final_blind_accuracy": audit[-1]["blind_accuracy"] if audit else None,
        "final_chance": audit[-1]["chance"] if audit else None,
        "per_round": audit,
        "wall_seconds": round(time.time() - t_start, 2),
    }
    outputs.write_debiased_split(cfg.out_dir, ds, alive,
                                 audit={"rounds": audit, "config": cfg.to_json()})
    outputs.write_sx_table(cfg.out_dir, ds, last_sx,
                           fold_id=np.zeros(n, np.int32),
                           extra={"kept": alive.astype(np.float32)})
    outputs.write_report(cfg.out_dir, report, name="ibp_report.json")
    return report


def _scatter(values: np.ndarray, idx: np.ndarray, n: int) -> np.ndarray:
    out = np.full(n, np.nan, np.float32)
    out[idx] = values
    return out


def _round_cfg(cfg: RunConfig, r: int) -> RunConfig:
    sub_cfg = RunConfig.from_json(cfg.to_json())
    sub_cfg.out_dir = f"{cfg.out_dir}/round_{r:02d}"
    sub_cfg.data.seed = cfg.data.seed + 1000 * r  # fresh folds per round
    return sub_cfg
