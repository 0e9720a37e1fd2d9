"""Random-Forest auditor: sklearn training + a JAX tree-ensemble backend.

Requirement: "lightweight Random Forest-based diagnostic" (reference
README.md:35). Per the north-star, inference is re-expressed as a JAX tree
ensemble so held-out scoring (and IBP re-audits) can run batched on-device:
the fitted sklearn trees are packed into dense arrays and traversed with a
fixed-depth ``fori_loop`` — all samples × all trees advance one level per
iteration, which XLA lowers to gathers/selects on the VPU with no
data-dependent control flow (SURVEY.md §2b B9).

Training stays on sklearn (CPU): forests are tiny (seconds to fit), the fit
algorithm is inherently sequential/host-sided, and sklearn doubles as the
parity oracle — ``predict_proba`` of the packed JAX forest must match sklearn
exactly (BASELINE.json config 1; SURVEY.md §4.2).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedForest:
    """Dense array form of a fitted tree ensemble.

    Leaves are encoded as self-looping nodes (left == right == self), so
    traversing ``max_depth`` levels is always safe and shape-static.
    """

    feature: jnp.ndarray  # int32 [T, M] splitting feature (0 at leaves)
    threshold: jnp.ndarray  # float32 [T, M]
    left: jnp.ndarray  # int32 [T, M]
    right: jnp.ndarray  # int32 [T, M]
    is_leaf: jnp.ndarray  # bool [T, M]
    value: jnp.ndarray  # float32 [T, M, C] class distribution at node
    max_depth: int  # static

    def tree_flatten(self):
        children = (self.feature, self.threshold, self.left, self.right,
                    self.is_leaf, self.value)
        return children, self.max_depth

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, max_depth=aux)

    @property
    def n_classes(self) -> int:
        return self.value.shape[-1]

    def predict_proba(self, x: jnp.ndarray) -> jnp.ndarray:
        """Mean class distribution over trees. x: [N, D] → [N, C]."""
        return _forest_predict_proba(self, x)


@partial(jax.jit, static_argnames=())
def _forest_predict_proba(f: PackedForest, x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[0]

    def one_tree(feature, threshold, left, right, is_leaf, value):
        def level(_, nodes):
            feat = feature[nodes]  # [N]
            thr = threshold[nodes]
            xv = jnp.take_along_axis(x, feat[:, None], axis=1)[:, 0]
            go_left = xv <= thr
            nxt = jnp.where(go_left, left[nodes], right[nodes])
            return jnp.where(is_leaf[nodes], nodes, nxt)

        nodes = jax.lax.fori_loop(
            0, f.max_depth, level, jnp.zeros(n, dtype=jnp.int32)
        )
        return value[nodes]  # [N, C]

    probs = jax.vmap(one_tree)(
        f.feature, f.threshold, f.left, f.right, f.is_leaf, f.value
    )  # [T, N, C]
    return probs.mean(axis=0)


def pack_sklearn_forest(clf) -> PackedForest:
    """Pack a fitted ``sklearn.ensemble.RandomForestClassifier``."""
    trees = [est.tree_ for est in clf.estimators_]
    T = len(trees)
    M = max(t.node_count for t in trees)
    C = int(clf.n_classes_)
    feature = np.zeros((T, M), np.int32)
    threshold = np.zeros((T, M), np.float32)
    left = np.zeros((T, M), np.int32)
    right = np.zeros((T, M), np.int32)
    is_leaf = np.ones((T, M), bool)
    value = np.zeros((T, M, C), np.float32)
    max_depth = 1
    for t, tree in enumerate(trees):
        nc = tree.node_count
        leaf = tree.children_left[:nc] == -1
        feature[t, :nc] = np.where(leaf, 0, tree.feature[:nc])
        # sklearn compares float32 features against float64 thresholds; for
        # exact parity with float32 inputs, use the largest float32 <= the
        # float64 threshold (x <= t64  <=>  x <= round_down32(t64)).
        t64 = tree.threshold[:nc]
        t32 = t64.astype(np.float32)
        over = t32.astype(np.float64) > t64
        t32[over] = np.nextafter(t32[over], np.float32(-np.inf), dtype=np.float32)
        threshold[t, :nc] = t32
        self_idx = np.arange(nc)
        left[t, :nc] = np.where(leaf, self_idx, tree.children_left[:nc])
        right[t, :nc] = np.where(leaf, self_idx, tree.children_right[:nc])
        is_leaf[t, :nc] = leaf
        v = tree.value[:nc, 0, :].astype(np.float32)  # sklearn>=1.3: probs; older: counts
        v = v / np.maximum(v.sum(-1, keepdims=True), 1e-12)
        value[t, :nc] = v
        max_depth = max(max_depth, int(tree.max_depth))
    return PackedForest(
        feature=jnp.asarray(feature), threshold=jnp.asarray(threshold),
        left=jnp.asarray(left), right=jnp.asarray(right),
        is_leaf=jnp.asarray(is_leaf), value=jnp.asarray(value),
        max_depth=max_depth + 1,
    )


class RandomForest:
    """Auditor forest: sklearn fit, sklearn or JAX (on-device) inference."""

    def __init__(
        self,
        n_estimators: int = 200,
        max_depth: Optional[int] = 12,
        seed: int = 0,
        class_weight: Optional[str] = "balanced",
    ):
        from sklearn.ensemble import RandomForestClassifier

        self.clf = RandomForestClassifier(
            n_estimators=n_estimators,
            max_depth=max_depth,
            random_state=seed,
            class_weight=class_weight,
            n_jobs=1,  # this environment has a single host core
        )
        self._packed: Optional[PackedForest] = None
        self._classes: Optional[np.ndarray] = None

    def fit(self, x: np.ndarray, y: np.ndarray) -> "RandomForest":
        self.clf.fit(np.asarray(x), np.asarray(y))
        self._classes = np.asarray(self.clf.classes_, dtype=np.int32)
        self._packed = None
        return self

    @property
    def feature_importances_(self) -> np.ndarray:
        return self.clf.feature_importances_

    @property
    def classes_(self) -> np.ndarray:
        assert self._classes is not None, "fit first"
        return self._classes

    def packed(self) -> PackedForest:
        if self._packed is None:
            self._packed = pack_sklearn_forest(self.clf)
        return self._packed

    def predict_proba(self, x: np.ndarray, backend: str = "jax") -> np.ndarray:
        """[N, n_classes_seen] class probabilities (columns = ``classes_``)."""
        if backend == "sklearn":
            return self.clf.predict_proba(np.asarray(x))
        if backend == "jax":
            return np.asarray(self.packed().predict_proba(jnp.asarray(x, jnp.float32)))
        raise ValueError(f"unknown backend {backend!r}")

    def predict_proba_full(self, x: np.ndarray, n_classes: int, backend: str = "jax") -> np.ndarray:
        """Probabilities scattered into a fixed [N, n_classes] frame (classes
        unseen in training get 0) — folds can see different label subsets."""
        p = self.predict_proba(x, backend)
        out = np.zeros((p.shape[0], n_classes), np.float32)
        out[:, self.classes_] = p
        return out
