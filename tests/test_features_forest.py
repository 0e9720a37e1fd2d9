"""M1 tests: featurizer, RF parity (sklearn == JAX packed forest), metrics,
s(x) rules, and the planted-bias semantic integration test (SURVEY.md §4.2/§4.4)."""

import numpy as np
import pytest

from tst.data.schema import BlindDataset, Sample
from tst.data.synthetic import make_synthetic_mcq
from tst.diagnose.rf import run_rf_diagnostic
from tst.diagnose.score import bias_scores, rank_by_bias
from tst.eval import metrics
from tst.features.featurize import featurize
from tst.features.forest import RandomForest, pack_sklearn_forest


def _ds(samples):
    return BlindDataset("t", samples)


class TestFeaturize:
    def test_longest_shortest_flags(self):
        s = Sample(id="a", question="q?", options=["tiny", "a much longer option", "mid one"],
                   answer="A", category="c1")
        fm = featurize(_ds([s]))
        f = dict(zip(fm.names, fm.x[0]))
        assert f["is_longest[1]"] == 1.0 and f["is_longest[0]"] == 0.0
        assert f["is_shortest[0]"] == 1.0
        assert f["slot_valid[2]"] == 1.0
        assert f["n_options"] == 3.0

    def test_numeric_priors(self):
        s = Sample(id="a", question="how many?", options=["2", "7", "30", "12"],
                   answer="B", category="count")
        fm = featurize(_ds([s]))
        f = dict(zip(fm.names, fm.x[0]))
        assert f["is_num_min[0]"] == 1.0
        assert f["is_num_max[2]"] == 1.0
        assert f["is_num_mid[1]"] == 1.0 and f["is_num_mid[3]"] == 1.0
        assert f["is_num_mid[0]"] == 0.0

    def test_overlap(self):
        s = Sample(id="a", question="is the red chair near the table?",
                   options=["red chair", "blue sofa"], answer="A", category="c")
        fm = featurize(_ds([s]))
        f = dict(zip(fm.names, fm.x[0]))
        assert f["q_overlap[0]"] == 1.0  # both words appear in question
        assert f["q_overlap[1]"] == 0.0

    def test_category_onehot_stable_schema(self):
        ds1 = _ds([Sample(id="a", question="q", options=["x", "y"], answer="A", category="cat_a")])
        cats = ["cat_a", "cat_b"]
        fm1 = featurize(ds1, categories=cats, max_opts=4)
        assert "cat=cat_b" in fm1.names
        ds2 = _ds([Sample(id="b", question="q", options=["x", "y"], answer="B", category="zzz")])
        fm2 = featurize(ds2, categories=cats, max_opts=4)
        assert fm1.dim == fm2.dim
        assert fm2.x[0, fm2.names.index("cat=<other>")] == 1.0

    def test_padding_slots_zero(self):
        s = Sample(id="a", question="q", options=["x", "y"], answer="A", category="c")
        fm = featurize(_ds([s]), max_opts=6)
        f = dict(zip(fm.names, fm.x[0]))
        for j in (2, 3, 4, 5):
            assert f[f"slot_valid[{j}]"] == 0.0
            assert f[f"rel_len[{j}]"] == 0.0


class TestForestParity:
    @pytest.mark.parametrize("n_classes", [2, 4])
    def test_jax_matches_sklearn(self, n_classes):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(300, 12)).astype(np.float32)
        y = (x[:, 0] * 2 + x[:, 3] > 0).astype(int)
        if n_classes == 4:
            y = y + 2 * (x[:, 5] > 0.3)
        rf = RandomForest(n_estimators=40, max_depth=8, seed=1).fit(x[:200], y[:200])
        p_sk = rf.predict_proba(x[200:], backend="sklearn")
        p_jx = rf.predict_proba(x[200:], backend="jax")
        np.testing.assert_allclose(p_sk, p_jx, atol=1e-5)
        np.testing.assert_array_equal(p_sk.argmax(-1), p_jx.argmax(-1))

    def test_unbounded_depth(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(200, 5)).astype(np.float32)
        y = rng.integers(0, 3, size=200)
        rf = RandomForest(n_estimators=10, max_depth=None, seed=0).fit(x, y)
        np.testing.assert_allclose(
            rf.predict_proba(x, "sklearn"), rf.predict_proba(x, "jax"), atol=1e-5
        )

    def test_missing_class_scatter(self):
        x = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
        y = np.array([0, 2] * 25)  # class 1 never seen
        rf = RandomForest(n_estimators=5, seed=0).fit(x, y)
        p = rf.predict_proba_full(x, n_classes=4)
        assert p.shape == (50, 4)
        assert (p[:, 1] == 0).all() and (p[:, 3] == 0).all()
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


class TestMetrics:
    def test_accuracy_masked(self):
        acc = metrics.accuracy([1, 2, 3, 0], [1, 2, 0, -1])
        assert float(acc) == pytest.approx(2 / 3)

    def test_chance(self):
        c = metrics.chance_accuracy([4, 2, 0])
        assert float(c) == pytest.approx((0.25 + 0.5) / 2)

    def test_mra_perfect_and_terrible(self):
        assert float(metrics.mra([10.0], [10.0])) == pytest.approx(1.0)
        assert float(metrics.mra([1000.0], [1.0])) == pytest.approx(0.0)

    def test_mra_partial(self):
        # 10% relative error passes thresholds theta < 0.9: 8 of 10
        assert float(metrics.mra([11.0], [10.0])) == pytest.approx(0.8)

    def test_per_category(self):
        acc = metrics.per_category_accuracy(
            pred=[0, 1, 0, 1], gold=[0, 1, 1, 1], cat_id=[0, 0, 1, 1], n_cats=3
        )
        assert float(acc[0]) == 1.0 and float(acc[1]) == 0.5
        assert np.isnan(float(acc[2]))

    def test_blind_report(self):
        r = metrics.blind_report(0.6, 0.25, full_acc=0.7, name="b")
        assert r["shortcut_lift"] == pytest.approx(0.35)
        assert r["vision_blind_gap"] == pytest.approx(0.1)


class TestScoreRules:
    def setup_method(self):
        self.probs = np.array([[0.7, 0.1, 0.1, 0.1], [0.25, 0.25, 0.25, 0.25]], np.float32)
        self.gold = np.array([0, 1])
        self.n_opt = np.array([4, 4])

    def test_gold_prob(self):
        s = bias_scores(self.probs, self.gold, self.n_opt, "gold_prob")
        np.testing.assert_allclose(s, [0.7, 0.25], atol=1e-6)

    def test_margin(self):
        s = bias_scores(self.probs, self.gold, self.n_opt, "margin")
        np.testing.assert_allclose(s, [0.6, 0.0], atol=1e-6)

    def test_excess(self):
        s = bias_scores(self.probs, self.gold, self.n_opt, "excess_prob")
        np.testing.assert_allclose(s, [0.45, 0.0], atol=1e-6)

    def test_epoch_aggregation(self):
        s = bias_scores([self.probs, np.roll(self.probs, 1, axis=0)],
                        self.gold, self.n_opt, "gold_prob")
        np.testing.assert_allclose(s, [(0.7 + 0.25) / 2, 0.25 / 2 + 0.05], atol=1e-6)

    def test_nan_for_non_mcq(self):
        s = bias_scores(self.probs, np.array([0, -1]), self.n_opt)
        assert np.isnan(s[1]) and not np.isnan(s[0])

    def test_rank(self):
        order = rank_by_bias(np.array([0.1, np.nan, 0.9, 0.5], np.float32))
        assert list(order) == [2, 3, 0, 1]


class TestRFDiagnosticSemantics:
    """The auditor must *detect* planted shortcuts, not just run (§4.4)."""

    def test_biased_benchmark_flagged(self):
        ds = make_synthetic_mcq(n=400, bias_fraction=1.0, bias_kind="longest_option", seed=0)
        d = run_rf_diagnostic(ds, k=4, seed=0)
        assert d.blind_accuracy > d.chance + 0.3, d.report()
        # the length features must dominate importances
        top5 = list(d.feature_importances)[:5]
        assert any("len" in f or "longest" in f for f in top5), top5

    def test_unbiased_benchmark_near_chance(self):
        ds = make_synthetic_mcq(n=400, bias_fraction=0.0, seed=0)
        d = run_rf_diagnostic(ds, k=4, seed=0)
        assert abs(d.blind_accuracy - d.chance) < 0.12, d.report()

    def test_sx_ranks_planted_samples_first(self):
        ds = make_synthetic_mcq(n=400, bias_fraction=0.5, bias_kind="longest_option", seed=1)
        d = run_rf_diagnostic(ds, k=4, seed=0)
        planted = np.array([s.meta["planted_bias"] for s in ds])
        order = rank_by_bias(d.s_x)
        top_half = order[:200]
        # most of the top-ranked half should be the planted samples
        assert planted[top_half].mean() > 0.7

    def test_backends_agree(self):
        ds = make_synthetic_mcq(n=120, bias_fraction=0.5, seed=2)
        d_sk = run_rf_diagnostic(ds, k=3, seed=0, backend="sklearn", n_estimators=30)
        d_jx = run_rf_diagnostic(ds, k=3, seed=0, backend="jax", n_estimators=30)
        np.testing.assert_allclose(d_sk.probs, d_jx.probs, atol=1e-5)
        np.testing.assert_allclose(d_sk.s_x, d_jx.s_x, atol=1e-5)
