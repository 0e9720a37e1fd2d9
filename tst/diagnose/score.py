"""Bias score s(x) assignment.

Requirement: "assign each sample a bias score s(x)" from held-out predictions
of models trained on the other k-1 folds (reference README.md:35). The exact
aggregation used by the unreleased reference is [paper]-level knowledge
(SURVEY.md §7 hard part 3), so the rule is pluggable; all rules map held-out
per-option probabilities (and optionally multiple epochs/seeds of them) to a
scalar per sample where HIGHER means MORE shortcut-exploitable.

Rules:
  * ``gold_prob``   — mean held-out probability assigned to the gold answer
                      (default: smooth, works for RF and SFT alike)
  * ``correct``     — mean held-out exact-match correctness
  * ``margin``      — gold probability minus best competitor probability
  * ``excess_prob`` — gold probability minus chance (1/n_options), so MCQs
                      with different option counts are comparable
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np

ScoreRule = str
SCORE_RULES = ("gold_prob", "correct", "margin", "excess_prob")


def bias_scores(
    probs: Union[np.ndarray, Sequence[np.ndarray]],
    gold: np.ndarray,
    n_options: np.ndarray,
    rule: ScoreRule = "gold_prob",
) -> np.ndarray:
    """Aggregate held-out option probabilities into s(x).

    ``probs``: [N, C] or a sequence of them (epochs/seeds — averaged, the
    aggregation over repeats the paper implies for stability).
    Non-MCQ rows (gold < 0) get s(x) = NaN (scored by their own numeric path).
    """
    if rule not in SCORE_RULES:
        raise ValueError(f"unknown score rule {rule!r}; have {SCORE_RULES}")
    if not isinstance(probs, np.ndarray):
        probs = np.mean([np.asarray(p) for p in probs], axis=0)
    probs = np.asarray(probs, np.float32)
    gold = np.asarray(gold)
    n, c = probs.shape
    if c == 0:  # dataset with no MCQ rows (all numeric/open)
        return np.full(n, np.nan, np.float32)
    valid = gold >= 0
    g = np.clip(gold, 0, c - 1)
    gold_p = probs[np.arange(n), g]
    if rule == "gold_prob":
        s = gold_p
    elif rule == "correct":
        s = (probs.argmax(-1) == g).astype(np.float32)
    elif rule == "margin":
        masked = probs.copy()
        masked[np.arange(n), g] = -np.inf
        s = gold_p - masked.max(-1)
    elif rule == "excess_prob":
        s = gold_p - 1.0 / np.maximum(np.asarray(n_options, np.float32), 1.0)
    return np.where(valid, s, np.nan).astype(np.float32)


def rank_by_bias(s: np.ndarray) -> np.ndarray:
    """Indices sorted most-biased-first; NaNs (non-MCQ) last. Ties broken by
    index so ranking is deterministic — the ranking itself is the parity
    artifact (Spearman vs reference, BASELINE.json.metric)."""
    s = np.asarray(s, np.float32)
    key = np.where(np.isnan(s), -np.inf, s)
    return np.argsort(-key, kind="stable")
