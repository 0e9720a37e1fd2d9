"""Hand-crafted text features for the lightweight shortcut auditor.

Requirement: "a lightweight Random Forest-based diagnostic operating on
hand-crafted features" that gives "fine-grained and interpretable auditing"
(reference README.md:35). The feature families (question/option length stats,
answer-position priors, option-overlap stats, numeric-option priors) follow
the north-star enumeration in BASELINE.json.

Two stages (SURVEY.md §2b B8 — "jit-compiled feature kernels"):

  1. *Host extraction* (`_raw_counts`): pure text → padded numeric arrays
     (char/word counts, token-overlap counts, parsed numeric values). Python
     string work, runs once, O(N·options).
  2. *Device derivation* (`_derive_features`, jit): rank/argmax/z-score/
     one-hot math over the padded arrays — the part that benefits from being
     a single fused XLA program when IBP recomputes features over surviving
     masks on-device.

Every output column has a stable name in ``FeatureMatrix.names`` so Random
Forest feature importances are human-readable (interpretability is a product
requirement, reference README.md:35).
"""

from __future__ import annotations

import dataclasses
import re
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tst.data.schema import MCQ, BlindDataset

_WORD_RE = re.compile(r"[a-z0-9']+")
_NUM_RE = re.compile(r"-?\d+(?:\.\d+)?")

#: Tell-tale option phrasings that correlate with gold answers in the wild.
_SPECIAL_PHRASES = ("all of the above", "none of the above", "both", "cannot be determined")


@dataclasses.dataclass
class FeatureMatrix:
    x: np.ndarray  # float32 [N, D]
    names: List[str]  # length D
    labels: np.ndarray  # int32 [N] gold option index (-1 non-MCQ)
    n_options: np.ndarray  # int32 [N]
    categories: List[str]  # category vocabulary used for one-hots

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def dim(self) -> int:
        return self.x.shape[1]


def _words(text: str) -> List[str]:
    return _WORD_RE.findall(text.lower())


def _parse_number(opt: str) -> float:
    m = _NUM_RE.search(opt.replace(",", ""))
    return float(m.group()) if m else np.nan


def _raw_counts(ds: BlindDataset, max_opts: int, categories: Sequence[str]):
    """Host pass: text → numeric arrays. Returns dict of np arrays."""
    n = len(ds)
    q_chars = np.zeros(n, np.float32)
    q_words = np.zeros(n, np.float32)
    ctx_chars = np.zeros(n, np.float32)
    n_opts = np.zeros(n, np.int32)
    cat_id = np.zeros(n, np.int32)
    opt_chars = np.zeros((n, max_opts), np.float32)
    opt_words = np.zeros((n, max_opts), np.float32)
    opt_q_overlap = np.zeros((n, max_opts), np.float32)  # |opt∩q| / |opt|
    opt_o_overlap = np.zeros((n, max_opts), np.float32)  # mean overlap w/ other opts
    opt_numeric = np.full((n, max_opts), np.nan, np.float32)
    opt_special = np.zeros((n, max_opts), np.float32)
    cat_index = {c: i for i, c in enumerate(categories)}
    for i, s in enumerate(ds):
        qw = set(_words(s.question))
        q_chars[i] = len(s.question)
        q_words[i] = len(_words(s.question))
        ctx_chars[i] = len(s.context)
        cat_id[i] = cat_index.get(s.category, len(categories))
        if s.answer_type != MCQ:
            continue
        k = len(s.options)
        n_opts[i] = k
        ow = [set(_words(o)) for o in s.options]
        for j, o in enumerate(s.options):
            opt_chars[i, j] = len(o)
            opt_words[i, j] = len(ow[j])
            if ow[j]:
                opt_q_overlap[i, j] = len(ow[j] & qw) / len(ow[j])
                others = [len(ow[j] & ow[m]) / len(ow[j]) for m in range(k) if m != j]
                opt_o_overlap[i, j] = float(np.mean(others)) if others else 0.0
            opt_numeric[i, j] = _parse_number(o)
            lo = o.lower()
            opt_special[i, j] = float(any(p in lo for p in _SPECIAL_PHRASES))
    return dict(
        q_chars=q_chars, q_words=q_words, ctx_chars=ctx_chars, n_opts=n_opts,
        cat_id=cat_id, opt_chars=opt_chars, opt_words=opt_words,
        opt_q_overlap=opt_q_overlap, opt_o_overlap=opt_o_overlap,
        opt_numeric=opt_numeric, opt_special=opt_special,
    )


@partial(jax.jit, static_argnames=("max_opts", "n_cats"))
def _derive_features(raw: dict, max_opts: int, n_cats: int) -> jnp.ndarray:
    """Device pass: fused rank/argextreme/z-score/one-hot feature math."""
    k = raw["n_opts"].astype(jnp.float32)  # [N]
    valid = (
        jnp.arange(max_opts)[None, :] < raw["n_opts"][:, None]
    )  # [N, max_opts]
    safe_k = jnp.maximum(k, 1.0)

    def masked(a, fill):
        return jnp.where(valid, a, fill)

    oc = masked(raw["opt_chars"], 0.0)
    mean_len = oc.sum(-1) / safe_k
    std_len = jnp.sqrt(masked((oc - mean_len[:, None]) ** 2, 0.0).sum(-1) / safe_k)
    rel_len = jnp.where(valid, oc / jnp.maximum(mean_len[:, None], 1.0), 0.0)
    neg_inf = jnp.float32(-1e9)
    pos_inf = jnp.float32(1e9)
    is_longest = valid & (oc >= masked(oc, neg_inf).max(-1, keepdims=True))
    is_shortest = valid & (oc <= masked(oc, pos_inf).min(-1, keepdims=True))
    # length rank in [0,1]: fraction of valid options strictly shorter
    shorter = (oc[:, None, :] < oc[:, :, None]) & valid[:, None, :] & valid[:, :, None]
    len_rank = jnp.where(valid, shorter.sum(-1) / safe_k[:, None], 0.0)

    num = raw["opt_numeric"]
    is_num = valid & ~jnp.isnan(num)
    num0 = jnp.where(is_num, num, 0.0)
    n_num = jnp.maximum(is_num.sum(-1).astype(jnp.float32), 1.0)
    num_mean = num0.sum(-1) / n_num
    num_std = jnp.sqrt(jnp.where(is_num, (num0 - num_mean[:, None]) ** 2, 0.0).sum(-1) / n_num)
    num_z = jnp.where(is_num, (num0 - num_mean[:, None]) / jnp.maximum(num_std[:, None], 1e-6), 0.0)
    num_max = jnp.where(is_num, num, neg_inf).max(-1, keepdims=True)
    num_min = jnp.where(is_num, num, pos_inf).min(-1, keepdims=True)
    is_num_max = is_num & (num0 >= num_max)
    is_num_min = is_num & (num0 <= num_min)
    # "middle value" prior: neither min nor max among >=3 numeric options
    is_num_mid = is_num & ~is_num_max & ~is_num_min & (is_num.sum(-1, keepdims=True) >= 3)

    cat_onehot = jax.nn.one_hot(raw["cat_id"], n_cats + 1, dtype=jnp.float32)

    global_feats = [
        jnp.log1p(raw["q_chars"]),
        jnp.log1p(raw["q_words"]),
        jnp.log1p(raw["ctx_chars"]),
        k,
        jnp.log1p(mean_len),
        std_len / jnp.maximum(mean_len, 1.0),
    ]
    per_slot = [
        rel_len,
        len_rank,
        is_longest.astype(jnp.float32),
        is_shortest.astype(jnp.float32),
        masked(raw["opt_words"], 0.0),
        masked(raw["opt_q_overlap"], 0.0),
        masked(raw["opt_o_overlap"], 0.0),
        num_z,
        is_num_max.astype(jnp.float32),
        is_num_min.astype(jnp.float32),
        is_num_mid.astype(jnp.float32),
        masked(raw["opt_special"], 0.0),
        valid.astype(jnp.float32),
    ]
    return jnp.concatenate(
        [jnp.stack(global_feats, -1)] + per_slot + [cat_onehot], axis=-1
    ).astype(jnp.float32)


_GLOBAL_NAMES = ["q_chars_log", "q_words_log", "ctx_chars_log", "n_options",
                 "opt_len_mean_log", "opt_len_cv"]
_SLOT_NAMES = ["rel_len", "len_rank", "is_longest", "is_shortest", "opt_words",
               "q_overlap", "opt_overlap", "num_z", "is_num_max", "is_num_min",
               "is_num_mid", "special_phrase", "slot_valid"]


def featurize(
    ds: BlindDataset,
    categories: Optional[Sequence[str]] = None,
    max_opts: Optional[int] = None,
) -> FeatureMatrix:
    """Dataset → named feature matrix + gold labels for the RF auditor.

    ``categories``/``max_opts`` pin the output schema so train/heldout folds
    (and IBP rounds over shrinking subsets) produce identical columns.
    """
    cats = list(categories) if categories is not None else ds.categories
    mo = max_opts or max((len(s.options) for s in ds), default=1)
    mo = max(mo, 1)
    raw = _raw_counts(ds, mo, cats)
    x = np.asarray(_derive_features({k: jnp.asarray(v) for k, v in raw.items()}, mo, len(cats)))
    names = list(_GLOBAL_NAMES)
    for fam in _SLOT_NAMES:
        names += [f"{fam}[{c}]" for c in range(mo)]
    names += [f"cat={c}" for c in cats] + ["cat=<other>"]
    assert len(names) == x.shape[1], (len(names), x.shape)
    labels = np.array([s.answer_index for s in ds], dtype=np.int32)
    n_options = np.array(
        [len(s.options) if s.answer_type == MCQ else 0 for s in ds], dtype=np.int32
    )
    return FeatureMatrix(x=x, names=names, labels=labels, n_options=n_options, categories=cats)
