"""Aux-subsystem guards (SURVEY.md §5): the functional analogues of race
detection/sanitizers, s(x) seed stability, logging, profiling helpers."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.aux.log import JsonlLogger
from tst.aux.profile import StepTimer, cost_analysis


class TestDebugGuards:
    def test_no_tracer_leaks_in_model(self):
        """jax.checking_leaks over the forward pass (tracer-leak 'sanitizer')."""
        from tst.models.decoder import apply_model, init_params, spec_by_name

        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        tokens = jnp.arange(128, dtype=jnp.int32)[None, :] % 300
        with jax.checking_leaks():
            out = jax.jit(lambda p, t: apply_model(p, t, spec))(params, tokens)
        assert np.isfinite(np.asarray(out)).all()

    def test_debug_nans_catches_bad_loss(self):
        """jax debug_nans flags a poisoned input instead of training on it."""
        from tst.models.decoder import apply_model, init_params, spec_by_name

        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        params["embed"] = params["embed"].at[0, 0].set(jnp.nan)
        tokens = jnp.zeros((1, 8), jnp.int32)
        jax.config.update("jax_debug_nans", True)
        try:
            with pytest.raises(Exception):  # FloatingPointError or XlaRuntimeError
                np.asarray(apply_model(params, tokens, spec))
        finally:
            jax.config.update("jax_debug_nans", False)


class TestSeedStability:
    def test_rf_sx_rank_stable_across_seeds(self):
        """s(x) rankings from independent seeds must agree strongly on a
        clearly-biased benchmark (the precondition for Spearman parity with
        anyone else's implementation)."""
        from tst.data.synthetic import make_synthetic_mcq
        from tst.diagnose.rf import run_rf_diagnostic
        from tst.eval.parity import spearman

        ds = make_synthetic_mcq(n=300, bias_fraction=0.6,
                                bias_kind="longest_option", seed=0)
        d1 = run_rf_diagnostic(ds, k=4, seed=1, n_estimators=60)
        d2 = run_rf_diagnostic(ds, k=4, seed=2, n_estimators=60)
        rho = spearman(d1.s_x, d2.s_x)
        assert rho > 0.55, rho  # rank agreement driven by the planted signal


class TestLoggingProfiling:
    def test_jsonl_logger(self, tmp_path):
        lg = JsonlLogger(str(tmp_path))
        lg.log(event="train", step=1, loss=2.5)
        lg.log(event="done")
        lg.close()
        rows = [json.loads(l) for l in open(os.path.join(str(tmp_path), "events.jsonl"))]
        assert rows[0]["loss"] == 2.5 and "t" in rows[0]
        assert rows[1]["event"] == "done"

    def test_step_timer(self):
        t = StepTimer(warmup=1)
        for _ in range(4):
            t.start()
            t.stop()
        s = t.summary()
        assert s["steps_timed"] == 3
        assert np.isfinite(s["mean_s"])

    def test_cost_analysis(self):
        costs = cost_analysis(lambda x: x @ x, jnp.ones((64, 64)))
        assert costs["flops"] and costs["flops"] > 0

    def test_trace_context(self, tmp_path):
        from tst.aux.profile import trace

        with trace(str(tmp_path / "prof")):
            jnp.ones(8).sum().block_until_ready()
        assert any(os.scandir(str(tmp_path / "prof")))
        with trace(None):  # no-op path
            pass

    def test_trace_writes_op_summary(self, tmp_path):
        """trace() exit parses the .xplane.pb (tst.aux.xplane: transcribed
        proto, protoc-generated reader) into op_summary.json."""
        import json

        from tst.aux.profile import trace

        d = str(tmp_path / "prof")
        with trace(d):
            jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64))).block_until_ready()
        p = os.path.join(d, "op_summary.json")
        assert os.path.exists(p), "op_summary.json not written"
        data = json.loads(open(p).read())
        assert "top_ops" in data and isinstance(data["top_ops"], list)

    def test_xplane_parser_on_captured_trace(self, tmp_path):
        from tst.aux.xplane import find_xplane, load_xspace

        d = str(tmp_path / "prof")
        from tst.aux.profile import trace

        with trace(d):
            jnp.ones(8).sum().block_until_ready()
        xp = find_xplane(d)
        assert xp is not None
        space = load_xspace(xp)
        assert len(space.planes) > 0
        assert all(isinstance(p.name, str) for p in space.planes)
