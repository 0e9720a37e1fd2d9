"""Multi-device mesh/GSPMD tests on 8 fake CPU devices (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tst.data.folds import kfold_assign
from tst.data.synthetic import make_synthetic_mcq
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import apply_model, init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.runtime import mesh as mesh_mod
from tst.train.infer import score_heldout_mcq
from tst.train.sft import FoldTrainer, make_fold_batches

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (fake) devices"
)


class TestMeshConstruction:
    def test_axes(self):
        mesh = mesh_mod.make_mesh(fold=2, data=2, tensor=2)
        assert mesh.axis_names == ("fold", "data", "seq", "tensor")
        assert mesh.devices.shape == (2, 2, 1, 2)

    def test_seq_axis(self):
        mesh = mesh_mod.make_mesh(fold=1, data=2, tensor=2, seq=2)
        assert mesh.shape["seq"] == 2

    def test_too_many(self):
        with pytest.raises(ValueError):
            mesh_mod.make_mesh(fold=4, data=4, tensor=4)

    def test_param_pspecs(self):
        assert mesh_mod.base_param_pspec("embed") == P("tensor", "data")
        assert mesh_mod.base_param_pspec("layers.wq") == P(None, "data", "tensor")
        assert mesh_mod.base_param_pspec("layers.wo") == P(None, "tensor", "data")
        assert mesh_mod.base_param_pspec("final_norm") == P(None)

    def test_lora_pspecs(self):
        assert mesh_mod.lora_param_pspec("a") == P("fold", None, None, None)
        assert mesh_mod.lora_param_pspec("b") == P("fold", None, "tensor", None)

    def test_shard_tree_places_params(self):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        mesh = mesh_mod.make_mesh(fold=1, data=2, tensor=2)
        params = init_params(jax.random.key(0), spec)
        sharded = mesh_mod.shard_tree(params, mesh_mod.param_pspec_tree(params), mesh)
        wq = sharded["layers"]["wq"]
        assert isinstance(wq.sharding, NamedSharding)
        assert wq.sharding.spec == P(None, "data", "tensor")
        # sharded forward == unsharded forward
        tokens = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
        np.testing.assert_allclose(
            np.asarray(apply_model(params, tokens, spec)),
            np.asarray(apply_model(sharded, tokens, spec)),
            atol=2e-4,
        )


class TestShardedTraining:
    """The same fold-parallel program must produce (near-)identical numerics
    on a 1-device setup and an 8-device (fold×data×tensor) mesh."""

    def _train(self, mesh, k=2, steps=6):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        lspec = LoraSpec(rank=4, alpha=8.0, dtype=jnp.float32)
        ds = make_synthetic_mcq(n=48, bias_fraction=1.0, bias_kind="position", seed=0)
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=512)
        fid = kfold_assign(ds, k, seed=0)
        batches = make_fold_batches(fid, k, batch_size=4, epochs=2, seed=0)[:steps]
        params = init_params(jax.random.key(0), spec)
        if mesh is not None:
            params = mesh_mod.shard_tree(params, mesh_mod.param_pspec_tree(params), mesh)
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
        trainer = FoldTrainer(spec, lspec, k=k, lr=1e-3, total_steps=steps,
                              mesh=mesh, t_max=t_max)
        lora, opt = trainer.init_state(jax.random.key(1))
        kw = {}
        if mesh is not None:
            kw["device"] = mesh_mod.replicated(mesh)
        tokens = jax.device_put(jnp.asarray(tb.tokens), **kw)
        mask = jax.device_put(jnp.asarray(tb.loss_mask), **kw)
        pos = jax.device_put(jnp.asarray(tb.answer_pos), **kw)
        lora, opt, log = trainer.fit(params, lora, opt, tokens, mask, batches,
                                     all_pos=pos, log_every=2)
        probs = score_heldout_mcq(params, lora, spec, lspec, tokens, pos,
                                  tb.option_token_ids, tb.n_options, fid, k, batch=8)
        return log, probs

    @pytest.mark.slow  # ~28 s on the 1-core host
    def test_sharded_matches_single_device(self):
        log_1, probs_1 = self._train(mesh=None)
        mesh = mesh_mod.make_mesh(fold=2, data=2, tensor=2)
        log_8, probs_8 = self._train(mesh=mesh)
        np.testing.assert_allclose(log_1.losses, log_8.losses, rtol=2e-3)
        np.testing.assert_allclose(probs_1, probs_8, atol=2e-3)

    @pytest.mark.slow  # ~17 s on the 1-core host
    def test_sharded_int4_base_matches_single_device(self):
        """int4-g128 grouped scales shard on the tensor axis ([*, in/g, 1,
        out] pspecs) — the sharded LoRA-on-int4 train must match 1-device
        numerics. Uses the "small" spec: "tiny"'s 64-wide in-dims silently
        fall back to int8, which would make this test vacuous."""
        from tst.models.quant import quantize_params

        spec = spec_by_name("small", dtype=jnp.float32)
        lspec = LoraSpec(rank=4, alpha=8.0, dtype=jnp.float32)
        ds = make_synthetic_mcq(n=32, bias_fraction=1.0, seed=3)
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=256)
        fid = kfold_assign(ds, 2, seed=0)
        batches = make_fold_batches(fid, 2, batch_size=4, epochs=1, seed=0)[:3]
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
        tokens = jnp.asarray(tb.tokens)
        mask = jnp.asarray(tb.loss_mask)
        pos = jnp.asarray(tb.answer_pos)

        def train(mesh):
            params = quantize_params(
                init_params(jax.random.key(0), spec), bits=4)
            wq = params["layers"]["wq"]
            assert wq["scale"].ndim == wq["q"].ndim + 1  # grouped, no fallback
            if mesh is not None:
                params = mesh_mod.shard_tree(
                    params, mesh_mod.param_pspec_tree(params), mesh)
            tr = FoldTrainer(spec, lspec, k=2, lr=1e-3, total_steps=3,
                             mesh=mesh, t_max=t_max)
            lora, opt = tr.init_state(jax.random.key(5))
            lora, _, log = tr.fit(params, lora, opt, tokens, mask, batches,
                                  all_pos=pos, log_every=1)
            return log.losses

        losses_1 = train(mesh=None)
        losses_8 = train(mesh=mesh_mod.make_mesh(fold=2, data=2, tensor=2))
        np.testing.assert_allclose(losses_1, losses_8, rtol=2e-3)

    @pytest.mark.slow  # ~16 s on the 1-core host
    def test_ring_training_matches_dense(self):
        """Sequence-parallel (ring attention) training == dense numerics."""
        spec = spec_by_name("tiny", dtype=jnp.float32)
        lspec = LoraSpec(rank=2, alpha=4.0, dtype=jnp.float32)
        ds = make_synthetic_mcq(n=24, bias_fraction=0.5, seed=2)
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=512)
        fid = kfold_assign(ds, 2, seed=0)
        batches = make_fold_batches(fid, 2, batch_size=4, epochs=1, seed=0)[:3]
        params = init_params(jax.random.key(0), spec)
        tokens = jnp.asarray(tb.tokens)
        mask = jnp.asarray(tb.loss_mask)
        pos = jnp.asarray(tb.answer_pos)
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))

        def train(mesh, ring):
            tr = FoldTrainer(spec, lspec, k=2, lr=1e-3, total_steps=3,
                             mesh=mesh, t_max=t_max, ring=ring)
            lora, opt = tr.init_state(jax.random.key(5))
            lora, _, log = tr.fit(params, lora, opt, tokens, mask, batches,
                                  all_pos=pos, log_every=1)
            return log.losses

        dense_losses = train(mesh=None, ring=False)
        mesh = mesh_mod.make_mesh(fold=2, data=1, seq=4, tensor=1)
        ring_losses = train(mesh=mesh, ring=True)
        np.testing.assert_allclose(dense_losses, ring_losses, rtol=2e-3)

    @pytest.mark.slow  # ~9 s on the 1-core host
    def test_fold_parallel_matches_fold_sequential(self):
        """vmapped fold axis == training each fold as its own program."""
        spec = spec_by_name("tiny", dtype=jnp.float32)
        lspec = LoraSpec(rank=4, alpha=8.0, dtype=jnp.float32)
        ds = make_synthetic_mcq(n=32, bias_fraction=0.5, seed=1)
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=512)
        k = 2
        fid = kfold_assign(ds, k, seed=0)
        steps = 4
        batches = make_fold_batches(fid, k, batch_size=4, epochs=1, seed=0)[:steps]
        params = init_params(jax.random.key(0), spec)
        tokens = jnp.asarray(tb.tokens)
        mask = jnp.asarray(tb.loss_mask)
        pos = jnp.asarray(tb.answer_pos)
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))

        # parallel: one program, k folds
        tr = FoldTrainer(spec, lspec, k=k, lr=1e-3, total_steps=steps, t_max=t_max)
        lora0, opt0 = tr.init_state(jax.random.key(7))
        lora_p, _, _ = tr.fit(params, lora0, opt0, tokens, mask, batches,
                              all_pos=pos, log_every=1)

        # sequential: k single-fold programs from identical per-fold states
        tr1 = FoldTrainer(spec, lspec, k=1, lr=1e-3, total_steps=steps, t_max=t_max)
        lora0, opt0 = tr.init_state(jax.random.key(7))  # same init
        seq_results = []
        for f in range(k):
            lf = jax.tree.map(lambda x: x[f : f + 1], lora0)
            of = jax.tree.map(
                lambda x: x[f : f + 1] if hasattr(x, "shape") and x.ndim > 0 else x,
                opt0,
            )
            lf, _, _ = tr1.fit(params, lf, of, tokens, mask,
                               batches[:, f : f + 1], all_pos=pos, log_every=1)
            seq_results.append(lf)
        lora_s = jax.tree.map(lambda *xs: jnp.concatenate(xs), *seq_results)
        for a, b in zip(jax.tree.leaves(lora_p), jax.tree.leaves(lora_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestFoldScaling:
    """VERDICT r1 item 2: the signature fold axis, asserted at fold=8 on the
    8-device mesh — all k folds train as ONE compiled program with adapter
    and optimizer state physically sharded over the fold axis."""

    def test_fold8_one_program_fold_sharded_state(self):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        lspec = LoraSpec(rank=4, alpha=8.0, dtype=jnp.float32)
        k = 8
        mesh = mesh_mod.make_mesh(fold=8, data=1, tensor=1)
        ds = make_synthetic_mcq(n=64, bias_fraction=0.5, seed=3)
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=256)
        fid = kfold_assign(ds, k, seed=0)
        batches = make_fold_batches(fid, k, batch_size=2, epochs=1, seed=0)[:3]
        params = init_params(jax.random.key(0), spec)
        params = mesh_mod.shard_tree(params, mesh_mod.param_pspec_tree(params), mesh)
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
        trainer = FoldTrainer(spec, lspec, k=k, lr=1e-3, total_steps=3,
                              mesh=mesh, t_max=t_max)
        lora, opt = trainer.init_state(jax.random.key(1))
        tokens = jax.device_put(jnp.asarray(tb.tokens), mesh_mod.replicated(mesh))
        mask = jax.device_put(jnp.asarray(tb.loss_mask), mesh_mod.replicated(mesh))
        pos = jax.device_put(jnp.asarray(tb.answer_pos), mesh_mod.replicated(mesh))
        lora, opt, log = trainer.fit(params, lora, opt, tokens, mask, batches,
                                     all_pos=pos, log_every=1)
        assert np.isfinite(log.losses).all()

        # adapter AND optimizer state live sharded over the fold axis after
        # training (GSPMD kept the fold axis, it didn't silently replicate)
        for leaf in jax.tree.leaves(lora):
            assert isinstance(leaf.sharding, NamedSharding)
            assert leaf.sharding.spec[0] == "fold", leaf.sharding.spec
        opt_leaves = [l for l in jax.tree.leaves(opt)
                      if hasattr(l, "sharding") and l.ndim > 0 and l.shape[0] == k]
        assert opt_leaves
        for leaf in opt_leaves:
            assert leaf.sharding.spec[0] == "fold", leaf.sharding.spec

        # ONE steady-state program trains all 8 folds (the compile-count
        # claim: reference-style fold jobs would pay k compiles). The first
        # step may add one transitional trace while GSPMD commits the fresh
        # optimizer state's shardings; after that the cache must not grow.
        size_after_fit = trainer._step_fn._cache_size()
        assert size_after_fit <= 2, size_after_fit
        more = make_fold_batches(fid, k, batch_size=2, epochs=1, seed=1)[:2]
        lora, opt, _ = trainer.fit(params, lora, opt, tokens, mask, more,
                                   all_pos=pos, log_every=1)
        assert trainer._step_fn._cache_size() == size_after_fit

        # base stays UNsharded over fold: one physical copy serves all folds
        wq = params["layers"]["wq"]
        assert "fold" not in jax.tree.leaves(wq)[0].sharding.spec \
            if isinstance(wq, dict) else "fold" not in wq.sharding.spec


class TestMultiSlice:
    """Multi-slice (DCN) mesh layout: the fold axis maps across slices; all
    other axes stay intra-slice (SURVEY.md §5 comms backend). Real slices
    don't exist here — the dispatch + layout contract is tested by faking
    device.slice_index."""

    class _FakeSliceDev:
        def __init__(self, dev, slice_index):
            self._dev = dev
            self.slice_index = slice_index

        def __getattr__(self, name):
            return getattr(self._dev, name)

    def test_fold_axis_spans_slices(self, monkeypatch):
        from jax.experimental import mesh_utils

        devs = jax.devices()[:8]
        fake = [self._FakeSliceDev(d, i // 4) for i, d in enumerate(devs)]

        captured = {}

        def stub(mesh_shape, dcn_mesh_shape, devices):
            captured["mesh_shape"] = tuple(mesh_shape)
            captured["dcn_mesh_shape"] = tuple(dcn_mesh_shape)
            # return the underlying REAL devices so Mesh() accepts the grid
            real = np.asarray([d._dev for d in devices])
            shape = tuple(m * d for m, d in zip(mesh_shape, dcn_mesh_shape))
            return real.reshape(shape)

        monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", stub)
        mesh = mesh_mod.make_mesh(fold=2, data=2, tensor=2, devices=fake)
        assert captured["dcn_mesh_shape"] == (2, 1, 1, 1)  # fold across DCN
        assert captured["mesh_shape"] == (1, 2, 1, 2)  # per-slice layout
        assert mesh.shape["fold"] == 2

    def test_indivisible_fold_rejected(self):
        devs = jax.devices()[:6]
        fake = [self._FakeSliceDev(d, i // 2) for i, d in enumerate(devs)]  # 3 slices
        with pytest.raises(ValueError, match="divisible by the 3 slices"):
            mesh_mod.make_mesh(fold=2, data=3, tensor=1, devices=fake)

    def test_single_slice_unchanged(self):
        mesh = mesh_mod.make_mesh(fold=2, data=2, tensor=2)
        assert mesh.devices.shape == (2, 2, 1, 2)

    def test_init_distributed_noop_without_env(self, monkeypatch):
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("NUM_PROCESSES", raising=False)
        assert mesh_mod.init_distributed() is False
