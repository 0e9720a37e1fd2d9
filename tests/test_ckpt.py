"""Checkpoint / resume / fault-injection tests (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.data.folds import kfold_assign
from tst.data.synthetic import make_synthetic_mcq
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.sft import FoldTrainer, make_fold_batches


@pytest.fixture
def setup():
    ds = make_synthetic_mcq(n=32, bias_fraction=0.5, seed=0)
    tb = tokenize_dataset(ds, ByteTokenizer(), max_len=512)
    fid = kfold_assign(ds, 2, seed=0)
    spec = spec_by_name("tiny", dtype=jnp.float32)
    lspec = LoraSpec(rank=2, alpha=4.0, dtype=jnp.float32)
    params = init_params(jax.random.key(0), spec)
    batches = make_fold_batches(fid, 2, batch_size=4, epochs=2, seed=0)[:8]
    t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
    trainer = FoldTrainer(spec, lspec, k=2, lr=1e-3, total_steps=8, t_max=t_max)
    data = (jnp.asarray(tb.tokens), jnp.asarray(tb.loss_mask), jnp.asarray(tb.answer_pos))
    return trainer, params, batches, data


class TestCheckpointResume:
    def test_save_restore_roundtrip(self, setup, tmp_path):
        from tst.aux.ckpt import load_train_state, save_train_state

        trainer, params, batches, (tokens, mask, pos) = setup
        lora, opt = trainer.init_state(jax.random.key(1))
        save_train_state(str(tmp_path / "ck"), lora, opt, extra={"step": 3})
        lora2, opt2, extra = load_train_state(str(tmp_path / "ck"), lora, opt)
        assert extra["step"] == 3
        for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(lora2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sharded_save_restore(self, setup, tmp_path):
        """Orbax roundtrip of mesh-sharded adapter state (fold×tensor)."""
        import jax
        import jax.numpy as jnp

        from tst.aux.ckpt import load_train_state, save_train_state
        from tst.runtime import mesh as mesh_mod

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 fake devices")
        trainer, params, batches, _ = setup
        mesh = mesh_mod.make_mesh(fold=2, data=2, tensor=2)
        lora, opt = trainer.init_state(jax.random.key(3))
        lora = mesh_mod.shard_tree(lora, mesh_mod.lora_pspec_tree(lora), mesh)
        save_train_state(str(tmp_path / "shck"), lora, opt, extra={"step": 1})
        lora2, opt2, extra = load_train_state(str(tmp_path / "shck"), lora, opt)
        assert extra["step"] == 1
        for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(lora2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored with the donor's shardings
        assert jax.tree.leaves(lora2)[0].sharding == jax.tree.leaves(lora)[0].sharding

    @pytest.mark.slow  # ~17 s on the 1-core host
    def test_crash_resume_matches_uninterrupted(self, setup, tmp_path):
        """Fault-inject at step 4 of 8; resume must reproduce the full run."""
        trainer, params, batches, (tokens, mask, pos) = setup
        ck = str(tmp_path / "ck")

        # uninterrupted reference
        lora0, opt0 = trainer.init_state(jax.random.key(1))
        ref_lora, _, _ = trainer.fit(params, lora0, opt0, tokens, mask, batches,
                                     all_pos=pos, log_every=2)

        # crash at step 4 (checkpoint_every=2 → last ckpt at step 4)
        lora0, opt0 = trainer.init_state(jax.random.key(1))
        with pytest.raises(RuntimeError, match="injected failure"):
            trainer.fit(params, lora0, opt0, tokens, mask, batches,
                        all_pos=pos, log_every=2, checkpoint_dir=ck,
                        checkpoint_every=2, fail_after_step=4)

        # resume: restores step-4 state, runs steps 5..8
        lora0, opt0 = trainer.init_state(jax.random.key(1))
        res_lora, _, log = trainer.fit(params, lora0, opt0, tokens, mask, batches,
                                       all_pos=pos, log_every=2,
                                       checkpoint_dir=ck, checkpoint_every=2)
        for a, b in zip(jax.tree.leaves(ref_lora), jax.tree.leaves(res_lora)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
