"""Train-transfer experiment: fine-tune on a TRAINING set, blind-eval a
test set.

The reference releases VSI-Train-10k (reference README.md:15) exactly for
this control [paper]: if blind accuracy on the test set rises after
fine-tuning on *independent* training data, the model is learning the task's
text priors; if it only rises when fine-tuning on the test set itself
(`diagnose-sft`), the benchmark leaks test-set-specific shortcuts. The gap
between the two is the clean attribution.

Implementation: the fold machinery with k=1 and an all-rows train stream
(no held-out split — evaluation is a different dataset), then the standard
single-forward MCQ scorer over the eval set with the trained adapter.
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from tst.config import RunConfig
from tst.data.schema import BlindDataset
from tst.data.tokenize import tokenize_dataset
from tst.eval import metrics
from tst.models.lora import LoraSpec
from tst.runtime import mesh as mesh_mod
from tst.train.infer import score_heldout_mcq
from tst.train.pipeline import (_device_data, build_model, build_tokenizer,
                                lora_spec_from_cfg)
from tst.train.sft import FoldTrainer, make_fold_batches


def run_train_transfer(train_ds: BlindDataset, eval_ds: BlindDataset,
                       cfg: RunConfig) -> Dict[str, Any]:
    """SFT on ``train_ds`` (all rows), blind-score ``eval_ds``. Returns the
    report; compare its blind_accuracy against (a) the zero-shot baseline
    and (b) `diagnose-sft` on the eval set itself."""
    t_start = time.time()
    tokenizer = build_tokenizer(cfg)
    tb_train = tokenize_dataset(train_ds, tokenizer, max_len=cfg.data.max_len,
                                include_context=cfg.data.include_context)
    tb_eval = tokenize_dataset(eval_ds, tokenizer, max_len=cfg.data.max_len,
                               include_context=cfg.data.include_context)
    mesh = None
    if cfg.mesh.fold * cfg.mesh.data * cfg.mesh.seq * cfg.mesh.tensor > 1:
        mesh = mesh_mod.from_config(cfg.mesh)
    spec, params = build_model(cfg, tokenizer, mesh)
    lspec = lora_spec_from_cfg(cfg, spec.dtype)

    # k=1, every row trains: fold ids of -1 never match fold 0
    pseudo_fold = np.full(tb_train.n, -1, np.int32)
    pack = None
    if cfg.optim.pack:  # sequence packing (tst.data.packing)
        from tst.data.packing import (make_packed_fold_batches,
                                      pack_fold_datasets)

        pack_len = int(cfg.optim.pack_len) or 2 * tb_train.seq_len
        pack = pack_fold_datasets(tb_train, pseudo_fold, 1, pack_len)
        batches = make_packed_fold_batches(
            pack.n_rows, cfg.optim.batch_size, cfg.optim.epochs,
            cfg.data.seed, batch_multiple=cfg.mesh.data)
    else:
        batches = make_fold_batches(pseudo_fold, 1, cfg.optim.batch_size,
                                    cfg.optim.epochs, cfg.data.seed,
                                    batch_multiple=cfg.mesh.data)
    t_max = int(max(
        np.max(tb_train.lengths - tb_train.answer_pos - 1),
        np.max(tb_eval.lengths - tb_eval.answer_pos - 1),
    ))
    on_tpu = cfg.model.use_pallas and jax.default_backend() == "tpu"
    trainer = FoldTrainer(
        spec, lspec, k=1, lr=cfg.optim.lr, total_steps=batches.shape[0],
        warmup_frac=cfg.optim.warmup_frac, weight_decay=cfg.optim.weight_decay,
        use_pallas=on_tpu, remat=cfg.model.remat, mesh=mesh, t_max=t_max,
        ring=cfg.mesh.seq > 1, b1=cfg.optim.b1, b2=cfg.optim.b2,
        packed=pack is not None,
    )
    lora, opt = trainer.init_state(jax.random.key(cfg.data.seed + 1))
    if pack is not None:
        lora, opt, tlog = trainer.fit(
            params, lora, opt, jnp.asarray(pack.tokens),
            jnp.asarray(pack.loss_mask), batches,
            all_pos=jnp.asarray(pack.answer_pos),
            all_segs=jnp.asarray(pack.seg_starts), n_segs=pack.n_segs,
            log_every=cfg.log_every)
    else:
        tokens_tr, mask_tr, pos_tr = _device_data(tb_train, mesh)
        lora, opt, tlog = trainer.fit(params, lora, opt, tokens_tr, mask_tr,
                                      batches, all_pos=pos_tr,
                                      log_every=cfg.log_every)

    # blind-score the EVAL set with the trained adapter (all rows "held out")
    tokens_ev, _, pos_ev = _device_data(tb_eval, mesh)
    probs = score_heldout_mcq(
        params, lora, spec, lspec, tokens_ev, pos_ev,
        tb_eval.option_token_ids, tb_eval.n_options,
        fold_id=np.zeros(tb_eval.n, np.int32), k=1, use_pallas=on_tpu,
        option_seqs=tb_eval.option_token_seqs,
    )
    pred = probs.argmax(-1).astype(np.int32)
    blind_acc = float(metrics.accuracy(pred, tb_eval.gold))
    chance = float(metrics.chance_accuracy(tb_eval.n_options))
    report = metrics.blind_report(blind_acc, chance, name=eval_ds.name)
    report.update(
        experiment="train_transfer",
        train_benchmark=train_ds.name,
        n_train=len(train_ds),
        n_eval=len(eval_ds),
        final_loss=tlog.losses[-1] if tlog.losses else None,
        train_steps=tlog.steps,
        wall_seconds=round(time.time() - t_start, 2),
    )
    from tst.io import outputs

    outputs.write_report(cfg.out_dir, report, name="transfer_report.json")
    return report
