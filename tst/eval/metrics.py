"""Evaluation metrics for blind stress-testing.

Requirements (reference README.md:33-35): quantify "shortcut performance" —
blind accuracy vs. chance — and the "vision-blind performance gap". VSI-Bench
numeric questions use Mean Relative Accuracy (MRA), the metric of the
VSI-Bench release ("Thinking in Space", reference README.md:60): accuracy
averaged over relative-error thresholds.

All metric kernels are mask-aware jnp functions so they compose into jitted
on-device loops (IBP needs blind accuracy per round without host round-trips,
SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

#: MRA confidence thresholds θ ∈ {0.5, 0.55, ..., 0.95}: a prediction scores
#: at θ if |pred - gold| / |gold| < 1 - θ.
MRA_THRESHOLDS = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))


def accuracy(pred, gold, mask=None) -> jnp.ndarray:
    """Masked exact-match accuracy. pred/gold int arrays, mask float/bool."""
    pred = jnp.asarray(pred)
    gold = jnp.asarray(gold)
    ok = (pred == gold).astype(jnp.float32)
    if mask is None:
        mask = (gold >= 0).astype(jnp.float32)
    else:
        mask = jnp.asarray(mask, jnp.float32) * (gold >= 0)
    return (ok * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def mra(pred_value, gold_value, mask=None) -> jnp.ndarray:
    """Mean Relative Accuracy over ``MRA_THRESHOLDS`` (VSI-Bench numeric)."""
    pred_value = jnp.asarray(pred_value, jnp.float32)
    gold_value = jnp.asarray(gold_value, jnp.float32)
    if mask is None:
        mask = jnp.isfinite(gold_value).astype(jnp.float32)
    else:
        mask = jnp.asarray(mask, jnp.float32) * jnp.isfinite(gold_value)
    rel_err = jnp.abs(pred_value - gold_value) / jnp.maximum(jnp.abs(gold_value), 1e-9)
    per_thresh = []
    for theta in MRA_THRESHOLDS:
        hit = (rel_err < (1.0 - theta)).astype(jnp.float32)
        per_thresh.append((hit * mask).sum() / jnp.maximum(mask.sum(), 1.0))
    return jnp.stack(per_thresh).mean()


def chance_accuracy(n_options, mask=None) -> jnp.ndarray:
    """Expected random-guess accuracy given per-sample option counts."""
    n_options = jnp.asarray(n_options, jnp.float32)
    if mask is None:
        mask = (n_options > 0).astype(jnp.float32)
    else:
        mask = jnp.asarray(mask, jnp.float32) * (n_options > 0)
    per = jnp.where(n_options > 0, 1.0 / jnp.maximum(n_options, 1.0), 0.0)
    return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def per_category_accuracy(pred, gold, cat_id, n_cats: int, mask=None) -> jnp.ndarray:
    """[n_cats] masked accuracy per category id (fixed-shape segment mean)."""
    pred, gold = jnp.asarray(pred), jnp.asarray(gold)
    cat_id = jnp.asarray(cat_id)
    ok = (pred == gold).astype(jnp.float32)
    m = (gold >= 0).astype(jnp.float32)
    if mask is not None:
        m = m * jnp.asarray(mask, jnp.float32)
    onehot = (cat_id[:, None] == jnp.arange(n_cats)[None, :]).astype(jnp.float32) * m[:, None]
    hits = (onehot * ok[:, None]).sum(0)
    counts = onehot.sum(0)
    return jnp.where(counts > 0, hits / jnp.maximum(counts, 1.0), jnp.nan)


#: Leading articles stripped by open-answer normalization (VQA-style match).
_OPEN_ARTICLES = ("a ", "an ", "the ")


def normalize_open_answer(text: str) -> str:
    """Canonicalize a free-form answer for exact matching: lowercase, strip
    punctuation, collapse whitespace, drop a leading article. This is the
    standard short-answer normalization used by open-ended VQA/MMMU-style
    scoring; the reference's open split (MMMU, reference README.md:35) is
    matched this way."""
    import re

    t = str(text).strip().lower()
    t = re.sub(r"[^\w\s.%-]", " ", t)
    t = re.sub(r"(?<!\d)\.(?!\d)", " ", t)  # keep "." only inside numbers
    t = re.sub(r"\s+", " ", t).strip()
    for art in _OPEN_ARTICLES:
        if t.startswith(art):
            t = t[len(art):]
            break
    # "42." -> "42", "42.0" -> "42" for numeric-looking strings
    m = re.fullmatch(r"(-?\d+)(?:\.0*)?", t)
    if m:
        t = m.group(1)
    return t


def open_exact_match(pred_text: str, gold_text: str) -> float:
    """1.0 iff normalized texts match (the open-answer correctness and its
    bias score s(x): a blind model reproducing the gold free-form answer is a
    non-visual shortcut)."""
    return float(normalize_open_answer(pred_text) == normalize_open_answer(gold_text))


def blind_report(
    blind_acc: float,
    chance: float,
    full_acc: Optional[float] = None,
    name: str = "",
) -> Dict[str, float]:
    """The paper's headline numbers for one benchmark: blind accuracy, its
    lift over chance (shortcut signal), and — when a with-vision accuracy is
    supplied — the vision-blind gap (reference README.md:35)."""
    report = {
        "benchmark": name,
        "blind_accuracy": float(blind_acc),
        "chance_accuracy": float(chance),
        "shortcut_lift": float(blind_acc - chance),
    }
    if full_acc is not None:
        report["full_accuracy"] = float(full_acc)
        report["vision_blind_gap"] = float(full_acc - blind_acc)
    return report
