"""End-to-end SFT diagnostic pipeline: `tst diagnose-sft` / `eval-blind`.

Orchestrates SURVEY.md call stack §3.1: load → blind-render → tokenize →
fold split → mesh → fold-parallel LoRA SFT → held-out scoring → s(x) →
metrics/artifacts. Also the zero-shot blind baseline (§3.4).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tst.config import RunConfig
from tst.data.folds import kfold_assign
from tst.data.packing import make_packed_fold_batches
from tst.data.schema import BlindDataset
from tst.data.tokenize import ByteTokenizer, HFTokenizer, TokenBatch, tokenize_dataset
from tst.diagnose.score import bias_scores
from tst.eval import metrics
from tst.models.decoder import ModelSpec, init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.runtime import mesh as mesh_mod
from tst.train.infer import (score_all_mcq, score_heldout_mcq,
                             score_heldout_mcq_packed,
                             score_heldout_numeric, score_heldout_open)
from tst.train.sft import FoldTrainer, make_fold_batches


def build_tokenizer(cfg: RunConfig):
    t = cfg.model.tokenizer
    style = cfg.data.prompt_style
    if style not in ("completion", "chat"):
        raise ValueError(f"unknown data.prompt_style {style!r}")
    chat = style == "chat"
    if t == "byte":
        if chat:
            raise ValueError("data.prompt_style='chat' needs an HF tokenizer "
                             "with a chat template (byte tokenizer has none)")
        return ByteTokenizer()
    if t == "hf":
        path = cfg.model.path
        if path is None:
            raise ValueError("model.tokenizer='hf' needs model.path (local checkpoint dir)")
        return HFTokenizer(path, chat=chat)
    return HFTokenizer(t, chat=chat)  # explicit tokenizer path


def lora_spec_from_cfg(cfg: RunConfig, dtype) -> LoraSpec:
    """Build the LoraSpec (same validation for every entry point)."""
    if not 0.0 <= float(cfg.lora.dropout) < 1.0:
        raise ValueError(f"lora.dropout must be in [0, 1), got {cfg.lora.dropout}")
    return LoraSpec(rank=cfg.lora.rank, alpha=cfg.lora.alpha,
                    targets=tuple(cfg.lora.targets), dtype=dtype,
                    dropout=float(cfg.lora.dropout))


def build_model(cfg: RunConfig, tokenizer, mesh=None) -> Tuple[ModelSpec, Dict[str, Any]]:
    """ModelSpec + params: HF checkpoint when model.path is set, random
    init otherwise (tests / synthetic runs). Params are FSDP/TP-sharded over
    the mesh as they are created. ``model.quantize='int8'`` converts each
    tensor AS IT IS CREATED/STREAMED — a full-precision 8B tree (16.1 GB,
    over one v5e's HBM) never materializes on device."""
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.model.dtype]
    quant_bits = {"none": None, "int8": 8, "int4": 4}.get(cfg.model.quantize, -1)
    if quant_bits == -1:
        raise ValueError(f"unknown model.quantize {cfg.model.quantize!r}")
    quantize = quant_bits is not None

    def _place(path, leaf):
        """device_put a (possibly quantized) leaf with its mesh sharding."""
        if mesh is None:
            return leaf
        from jax.sharding import NamedSharding

        if isinstance(leaf, dict):  # quantized {"q","scale"}
            wspec = mesh_mod.base_param_pspec(path)
            from jax.sharding import PartitionSpec as P

            # int8 scale is [*, 1, out]; grouped int4 scale [*, in/g, 1, out]
            # (one rank higher) — shard the out axis either way.
            sspec = P(*([None] * (leaf["scale"].ndim - 1) + [wspec[-1]]))
            return {
                "q": jax.device_put(leaf["q"], NamedSharding(mesh, wspec)),
                "scale": jax.device_put(leaf["scale"], NamedSharding(mesh, sspec)),
            }
        return jax.device_put(
            leaf, NamedSharding(mesh, mesh_mod.base_param_pspec(path)))

    if cfg.model.path:
        from tst.models.hf_load import load_checkpoint, spec_from_hf_config
        from tst.models.quant import quantizing_put

        spec = spec_from_hf_config(cfg.model.path, name=cfg.model.name)
        spec = type(spec)(**{**spec.__dict__, "dtype": dtype})
        base_put = quantizing_put(dtype, bits=quant_bits) if quantize else (
            lambda path, a: jnp.asarray(a, dtype))

        def put(path, a):
            return _place(path, base_put(path, a))

        params = load_checkpoint(cfg.model.path, spec, dtype=dtype, put=put)
    else:
        spec = spec_by_name(cfg.model.name, dtype=dtype)
        if spec.vocab_size < tokenizer.vocab_size:
            spec = spec_by_name(cfg.model.name, dtype=dtype, vocab_size=tokenizer.vocab_size)
        params = init_params(jax.random.key(cfg.data.seed), spec,
                             quantize=quantize, bits=quant_bits or 8)
        if mesh is not None:
            params = mesh_mod.shard_tree(params, mesh_mod.param_pspec_tree(params), mesh)
    return spec, params


def build_draft_model(cfg: RunConfig, tokenizer):
    """(draft_spec, draft_params) for ``perf.spec_draft_*``, or None.

    The draft shares the target's tokenizer (a hard requirement of exact
    speculative decoding) and is base-weighted — it never sees adapters.
    """
    if not (cfg.perf.spec_draft_model or cfg.perf.spec_draft_path):
        return None
    import dataclasses

    dcfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, name=cfg.perf.spec_draft_model or cfg.model.name,
        path=cfg.perf.spec_draft_path,
        quantize=cfg.perf.spec_draft_quantize))
    return build_model(dcfg, tokenizer)


def _merge_logs(a, b):
    """Concatenate per-epoch TrainLogs into one run-level log."""
    if a is None:
        return b
    a.losses += b.losses
    a.fold_losses += b.fold_losses
    a.steps += b.steps
    a.first_step_seconds += b.first_step_seconds
    a.wall_seconds += b.wall_seconds
    total_samples = (a.samples_per_sec * (a.wall_seconds - b.wall_seconds)
                     + b.samples_per_sec * b.wall_seconds)
    a.samples_per_sec = total_samples / max(a.wall_seconds, 1e-9)
    return a


def _device_data(tb: TokenBatch, mesh=None):
    """Dataset arrays → device (replicated: every fold/chip gathers rows)."""
    kw = {}
    if mesh is not None:
        kw["device"] = mesh_mod.replicated(mesh)
    tokens = jax.device_put(jnp.asarray(tb.tokens), **kw)
    mask = jax.device_put(jnp.asarray(tb.loss_mask), **kw)
    pos = jax.device_put(jnp.asarray(tb.answer_pos), **kw)
    return tokens, mask, pos


class _SftRunState:
    """Everything a diagnose-sft run constructs before its first jitted call.

    Built by :func:`_build_sft_state` and shared by ``run_sft_diagnostic``
    and ``run_warmup`` so the warmup compiles programs through the EXACT
    same constructors/shapes as the timed run — a hand-kept duplicate of
    this setup is how warmup silently drifts from the run it exists to
    pre-compile."""

    __slots__ = ("tokenizer", "tb", "fold_id", "mesh", "spec", "params",
                 "lspec", "batches", "t_max", "trainer", "lora", "opt_state",
                 "tokens", "loss_mask", "answer_pos", "on_tpu",
                 "pack", "ptokens", "pmask", "ppos", "psegs")


def _build_sft_state(ds: BlindDataset, cfg: RunConfig) -> _SftRunState:
    st = _SftRunState()
    k = cfg.data.k
    st.tokenizer = build_tokenizer(cfg)
    st.tb = tokenize_dataset(ds, st.tokenizer, max_len=cfg.data.max_len,
                             include_context=cfg.data.include_context)
    st.fold_id = kfold_assign(ds, k, cfg.data.seed)
    st.mesh = None
    if cfg.mesh.fold * cfg.mesh.data * cfg.mesh.seq * cfg.mesh.tensor > 1:
        st.mesh = mesh_mod.from_config(cfg.mesh)
    st.spec, st.params = build_model(cfg, st.tokenizer, st.mesh)
    st.lspec = lora_spec_from_cfg(cfg, st.spec.dtype)
    st.pack = None
    if cfg.optim.pack:
        st.pack = _pack_train_data(st.tb, st.fold_id, cfg)
        st.batches = make_packed_fold_batches(
            st.pack.n_rows, cfg.optim.batch_size, cfg.optim.epochs,
            cfg.data.seed, batch_multiple=cfg.mesh.data,
        )
    else:
        st.batches = make_fold_batches(
            st.fold_id, k, cfg.optim.batch_size, cfg.optim.epochs, cfg.data.seed,
            batch_multiple=cfg.mesh.data,
        )
    # answer-window length: longest target (+1 margin), 2D-padded to even
    st.t_max = int(np.max(st.tb.lengths - st.tb.answer_pos - 1))
    st.on_tpu = cfg.model.use_pallas and jax.default_backend() == "tpu"
    st.trainer = FoldTrainer(
        st.spec, st.lspec, k, lr=cfg.optim.lr, total_steps=st.batches.shape[0],
        warmup_frac=cfg.optim.warmup_frac, weight_decay=cfg.optim.weight_decay,
        use_pallas=st.on_tpu, remat=cfg.model.remat, mesh=st.mesh,
        t_max=st.t_max, ring=cfg.mesh.seq > 1, b1=cfg.optim.b1,
        b2=cfg.optim.b2, fused_mlp=cfg.model.fused_mlp,
        packed=st.pack is not None,
    )
    st.lora, st.opt_state = st.trainer.init_state(
        jax.random.key(cfg.data.seed + 1))
    st.tokens, st.loss_mask, st.answer_pos = _device_data(st.tb, st.mesh)
    if st.pack is not None:
        kw = {}
        if st.mesh is not None:
            kw["device"] = mesh_mod.replicated(st.mesh)
        st.ptokens = jax.device_put(jnp.asarray(st.pack.tokens), **kw)
        st.pmask = jax.device_put(jnp.asarray(st.pack.loss_mask), **kw)
        st.ppos = jax.device_put(jnp.asarray(st.pack.answer_pos), **kw)
        st.psegs = jax.device_put(jnp.asarray(st.pack.seg_starts), **kw)
    return st


def _pack_train_data(tb: TokenBatch, fold_id: np.ndarray, cfg: RunConfig):
    """Per-fold packed train splits for ``optim.pack`` (tst.data.packing)."""
    from tst.data.packing import pack_fold_datasets

    pack_len = int(cfg.optim.pack_len) or 2 * tb.seq_len
    if pack_len < tb.seq_len:
        raise ValueError(
            f"optim.pack_len {pack_len} < tokenized bucket {tb.seq_len} — "
            "the longest sample would not fit a packed row")
    return pack_fold_datasets(tb, fold_id, cfg.data.k, pack_len)


def run_warmup(ds: BlindDataset, cfg: RunConfig,
               ibp: bool = False) -> Dict[str, Any]:
    """AOT-compile every program a ``diagnose-sft`` run of this config would
    execute — train step, held-out MCQ scorer, numeric/open decode — WITHOUT
    running them (`tst warmup`; VERDICT r2 weak #3: cold compiles through
    this environment's remote tunnel cost ~10 min of silence at the top of
    the first timed run).

    Programs are built through the exact same code path as the real run
    (same trainer/scorer constructors, same shapes/shardings from the same
    dataset+config), then ``.lower(...).compile()``d so the persistent
    compilation cache (aux.ckpt.enable_compilation_cache) is populated; the
    subsequent timed run hits the disk cache instead of compiling.

    ``ibp=True`` (`tst warmup --ibp`) warms the ``debias-ibp`` round
    programs instead: the loop pins its shapes at round 0
    (`tst.debias.ibp.round0_sizing` — pad_m-padded scorer grid,
    pad_numeric/pad_open-bounded decode chunks, and a total_steps0 LR
    constant that is an upper bound over rounds, not the diagnose step
    count), so the diagnose-shaped programs never match and round 0 pays
    the compile wall anyway (measured: 171 s at n=300 AFTER a plain
    warmup). One warmed round-0 program set covers every later round by
    the same pinning invariant.
    """
    from tst.train.infer import (_make_decode_fn, decode_chunk_rows,
                                 heldout_index_grid, make_mcq_scorer,
                                 make_mcq_scorer_multitoken)

    t_start = time.time()
    k = cfg.data.k
    st = _build_sft_state(ds, cfg)
    tb, spec, lspec, on_tpu = st.tb, st.spec, st.lspec, st.on_tpu

    report: Dict[str, Any] = {"model": spec.name, "k": k,
                              "seq_len": tb.seq_len, "n_samples": len(ds),
                              "target": "debias-ibp" if ibp else
                                        "diagnose-sft"}
    sizing = None
    trainer = st.trainer
    if ibp:
        from tst.debias.ibp import round0_sizing
        from tst.train.sft import FoldTrainer

        sizing = round0_sizing(ds, cfg, k)
        if sizing["total_steps0"] != st.batches.shape[0]:
            # the IBP trainer bakes the across-rounds total_steps0 bound
            # into its LR schedule — a different constant is a different
            # program, so lower THAT one, not the diagnose trainer's
            trainer = FoldTrainer(
                spec, lspec, k, lr=cfg.optim.lr,
                total_steps=sizing["total_steps0"],
                warmup_frac=cfg.optim.warmup_frac,
                weight_decay=cfg.optim.weight_decay, use_pallas=on_tpu,
                remat=cfg.model.remat, mesh=st.mesh, t_max=st.t_max,
                ring=cfg.mesh.seq > 1, b1=cfg.optim.b1, b2=cfg.optim.b2,
                fused_mlp=cfg.model.fused_mlp, packed=st.pack is not None,
            )
    t0 = time.time()
    if st.pack is not None:
        trainer._step_fn.lower(
            st.params, st.lora, st.opt_state, st.ptokens, st.pmask,
            st.ppos, st.psegs, jnp.asarray(st.batches[0]),
        ).compile()
    else:
        trainer._step_fn.lower(
            st.params, st.lora, st.opt_state, st.tokens, st.loss_mask,
            st.answer_pos, jnp.asarray(st.batches[0]),
        ).compile()
    report["train_step_compile_s"] = round(time.time() - t0, 2)

    if bool((tb.gold >= 0).any()):
        # the run scores MCQ rows only (numeric/open rows are decode-scored),
        # so warm the same masked grid — and the same packed/unpacked variant
        mcq_fold = np.where(tb.gold >= 0, st.fold_id, -1)
        # the IBP loop scores through a pad_m-pinned grid (constant shape
        # across shrinking rounds); warm that shape, not the tight one
        pad_m = sizing["pad_m"] if ibp else None
        t0 = time.time()
        if tb.option_token_seqs is not None and tb.option_token_seqs.shape[-1] > 1:
            idx, _ = heldout_index_grid(mcq_fold, k, pad_to=pad_m)
            scorer = make_mcq_scorer_multitoken(spec, lspec, on_tpu, batch=8)
            scorer.lower(st.params, st.lora, st.tokens, st.answer_pos,
                         jnp.asarray(tb.option_token_seqs),
                         jnp.asarray(idx)).compile()
        elif st.pack is not None and cfg.optim.packed_scorer:
            from tst.train.infer import (make_mcq_scorer_packed,
                                         pack_heldout_mcq, packed_scorer_batch)

            b = packed_scorer_batch(st.pack.pack_len)
            ptokens, ppos, psegs, _ = pack_heldout_mcq(
                tb, mcq_fold, k, st.pack.pack_len, b)
            scorer = make_mcq_scorer_packed(spec, lspec, on_tpu, batch=b)
            scorer.lower(st.params, st.lora, jnp.asarray(ptokens),
                         jnp.asarray(ppos), jnp.asarray(psegs),
                         jnp.asarray(tb.option_token_ids)).compile()
        else:
            idx, _ = heldout_index_grid(mcq_fold, k, pad_to=pad_m)
            scorer = make_mcq_scorer(spec, lspec, on_tpu, 32)
            scorer.lower(st.params, st.lora, st.tokens, st.answer_pos,
                         jnp.asarray(tb.option_token_ids),
                         jnp.asarray(idx)).compile()
        report["scorer_compile_s"] = round(time.time() - t0, 2)

    draft = build_draft_model(cfg, st.tokenizer)  # perf.spec_draft_*
    for kind, max_new in (("numeric", 12), ("open", 16)):
        rows = np.flatnonzero(
            np.array([s.answer_type == kind for s in ds], bool))
        if rows.size == 0:
            continue
        m = max(max((int((st.fold_id[rows] == f).sum()) for f in range(k)),
                    default=1), 1)
        if ibp:
            # the loop bounds these grids by the round-0 stratified-split
            # pin (pad_numeric/pad_open), not the tight per-fold max
            m = sizing[f"pad_{kind}"] or m
        # the real run decodes fixed-shape [k, min(m, chunk)] programs
        # (tst.train.infer._decode_heldout_rows) — warm THAT grid, not the
        # unchunked [k, m] one the run never executes
        from tst.models.quant import quantized_bytes

        bb = quantized_bytes(st.params)
        if draft is not None:
            bb += quantized_bytes(draft[1])
        mc = min(m, decode_chunk_rows(
            spec, tb.seq_len, max_new, k, base_bytes=bb,
            draft_spec=draft[0] if draft else None))
        t0 = time.time()
        if draft is not None:
            # the run routes these legs through fold-vmapped speculative
            # decode — warm THAT program, not the plain one it never runs
            from tst.train.infer import _make_spec_decode_fn

            fn = _make_spec_decode_fn(spec, draft[0], lspec, max_new,
                                      cfg.perf.spec_gamma, on_tpu,
                                      with_lora=True)
            fn.lower(st.params, draft[1], st.lora, st.tokens,
                     st.answer_pos + 1, jnp.zeros((k, mc), jnp.int32)
                     ).compile()
        else:
            fn = _make_decode_fn(spec, lspec, max_new, on_tpu, with_lora=True)
            fn.lower(st.params, st.lora, st.tokens, st.answer_pos + 1,
                     jnp.zeros((k, mc), jnp.int32)).compile()
        report[f"decode_{kind}_compile_s"] = round(time.time() - t0, 2)

    report["wall_seconds"] = round(time.time() - t_start, 2)
    from tst.io import outputs

    outputs.write_report(cfg.out_dir, report, name="warmup_report.json")
    return report


def run_sft_diagnostic(ds: BlindDataset, cfg: RunConfig,
                       return_state: bool = False) -> Dict[str, Any]:
    """The core diagnostic (BASELINE.json configs 2/3): k-fold blind LoRA SFT
    → held-out s(x) → report. Returns the report dict (artifacts on disk)."""
    t_start = time.time()
    k = cfg.data.k
    st = _build_sft_state(ds, cfg)
    setup_wall = time.time() - t_start
    tokenizer, tb, fold_id = st.tokenizer, st.tb, st.fold_id
    spec, params, lspec = st.spec, st.params, st.lspec
    batches, trainer, on_tpu = st.batches, st.trainer, st.on_tpu
    lora, opt_state = st.lora, st.opt_state
    tokens, loss_mask, answer_pos = st.tokens, st.loss_mask, st.answer_pos

    from tst.aux.log import JsonlLogger

    logger = JsonlLogger(cfg.out_dir)
    from tst.aux.profile import trace

    has_mcq = bool((tb.gold >= 0).any())
    stage_walls: Dict[str, float] = {}

    def _timed(name, fn):
        t0 = time.time()
        out = fn()
        stage_walls[name] = stage_walls.get(name, 0.0) + (time.time() - t0)
        return out

    single_token_opts = (tb.option_token_seqs is None
                         or tb.option_token_seqs.shape[-1] == 1)
    # numeric/open rows are decode-scored (below); keeping them out of the
    # MCQ scorer grid drops ~25% of its forwards at the VSI mix
    mcq_fold_id = np.where(tb.gold >= 0, fold_id, -1)

    def _score_mcq(lora_now):
        if not has_mcq:  # all-numeric/open dataset: no letter columns to read
            return np.zeros((tb.n, 1), np.float32)
        if (st.pack is not None and single_token_opts
                and cfg.optim.packed_scorer):
            return score_heldout_mcq_packed(
                params, lora_now, spec, lspec, tb, mcq_fold_id, k,
                pack_len=st.pack.pack_len, use_pallas=on_tpu,
            )
        return score_heldout_mcq(
            params, lora_now, spec, lspec, tokens, answer_pos,
            tb.option_token_ids, tb.n_options, mcq_fold_id, k,
            use_pallas=on_tpu, option_seqs=tb.option_token_seqs,
        )

    def score_now(lora_now):
        return _timed("score_mcq", lambda: _score_mcq(lora_now))

    # s(x) aggregation over epochs AND independent seed restarts (paper:
    # scores averaged over training snapshots/seeds for stability; pluggable
    # — SURVEY.md §7 hard part 3). The final epoch of every seed is always
    # scored; cfg.optim.score_epochs adds earlier snapshots.
    score_after = {int(e) for e in cfg.optim.score_epochs if 1 <= int(e) < cfg.optim.epochs}
    epoch_probs = []
    seed_final_probs = []  # final snapshot per seed, for stability reporting
    steps_per_epoch = max(batches.shape[0] // max(cfg.optim.epochs, 1), 1)
    n_seeds = max(int(cfg.optim.n_seeds), 1)
    with trace(cfg.profile_dir):
        tlog = None
        for s_i in range(n_seeds):
            if s_i > 0:  # fresh adapters + fresh batch order, same folds
                lora, opt_state = trainer.init_state(
                    jax.random.key(cfg.data.seed + 1 + 7919 * s_i))
                if st.pack is not None:
                    batches = make_packed_fold_batches(
                        st.pack.n_rows, cfg.optim.batch_size, cfg.optim.epochs,
                        cfg.data.seed + s_i, batch_multiple=cfg.mesh.data,
                    )
                else:
                    batches = make_fold_batches(
                        fold_id, k, cfg.optim.batch_size, cfg.optim.epochs,
                        cfg.data.seed + s_i, batch_multiple=cfg.mesh.data,
                    )
            for e in range(cfg.optim.epochs):
                chunk = batches[e * steps_per_epoch: (e + 1) * steps_per_epoch]
                if e == cfg.optim.epochs - 1:  # last epoch takes any remainder
                    chunk = batches[e * steps_per_epoch:]
                if chunk.shape[0] == 0:
                    continue
                fit_kw = dict(
                    log_every=cfg.log_every,
                    log_fn=lambda step, loss: logger.log(
                        event="train", seed=s_i, epoch=e, step=step, loss=loss),
                    checkpoint_dir=(f"{cfg.checkpoint_dir}/seed_{s_i}_epoch_{e:03d}"
                                    if cfg.checkpoint_dir else None),
                )
                if st.pack is not None:
                    lora, opt_state, elog = trainer.fit(
                        params, lora, opt_state, st.ptokens, st.pmask, chunk,
                        all_pos=st.ppos, all_segs=st.psegs,
                        n_segs=st.pack.n_segs, **fit_kw,
                    )
                else:
                    lora, opt_state, elog = trainer.fit(
                        params, lora, opt_state, tokens, loss_mask, chunk,
                        all_pos=answer_pos, **fit_kw,
                    )
                tlog = _merge_logs(tlog, elog)
                if (e + 1) in score_after:
                    epoch_probs.append(score_now(lora))
            final = score_now(lora)
            epoch_probs.append(final)
            seed_final_probs.append(final)

    probs = np.mean(epoch_probs, axis=0) if len(epoch_probs) > 1 else epoch_probs[0]

    # seed-stability: mean pairwise Spearman of per-seed s(x) rankings — the
    # self-measured analogue of the cross-implementation parity metric
    # (BASELINE.json: "s(x) Spearman"); low values mean more epochs/seeds are
    # needed before the ranking is trustworthy.
    sx_seed_spearman = None
    sx_seed_top_jaccard = None
    if len(seed_final_probs) > 1:
        from tst.eval.parity import spearman

        per_seed_sx = [
            bias_scores(p_i, tb.gold, tb.n_options, rule=cfg.rf.score_rule)
            for p_i in seed_final_probs
        ]
        rhos = [
            spearman(per_seed_sx[i], per_seed_sx[j])
            for i in range(len(per_seed_sx)) for j in range(i + 1, len(per_seed_sx))
        ]
        sx_seed_spearman = float(np.nanmean(rhos))
        # prune-set stability: the product of the s(x) ranking is its top
        # tail (IBP removes the top prune_rate slice), so report the mean
        # pairwise Jaccard of each pair of seeds' top-q sets — rank noise
        # among near-tied clean rows does not move this number, shortcut
        # rows swapping in/out of the prune set does.
        mcq_rows = np.flatnonzero(tb.gold >= 0)  # per-seed tables are
        # MCQ-only at this point (numeric/open s(x) merges in below)

        def _top_jaccard(q):
            m = max(int(round(q * len(mcq_rows))), 1)
            tops = [set(mcq_rows[np.argsort(-sx_i[mcq_rows],
                                            kind="stable")[:m]])
                    for sx_i in per_seed_sx]
            js = [len(tops[i] & tops[j]) / len(tops[i] | tops[j])
                  for i in range(len(tops)) for j in range(i + 1, len(tops))]
            return float(np.mean(js))

        if len(mcq_rows):
            sx_seed_top_jaccard = {"0.1": round(_top_jaccard(0.1), 4),
                                   "0.2": round(_top_jaccard(0.2), 4)}
    s_x = bias_scores(probs, tb.gold, tb.n_options, rule=cfg.rf.score_rule)
    pred = probs.argmax(-1).astype(np.int32)
    is_mcq = tb.gold >= 0

    # numeric (NA) samples: held-out greedy decode → per-sample MRA as s(x)
    gold_values = np.array(
        [s.answer_value if s.answer_type == "numeric" else np.nan for s in ds],
        np.float32,
    )
    numeric_mra = None
    _gold_texts = [s.answer if s.answer_type == "open" else None for s in ds]
    draft = None  # perf.spec_draft_*; only built when a decode leg runs
    if np.isfinite(gold_values).any() or any(g is not None
                                             for g in _gold_texts):
        draft = build_draft_model(cfg, tokenizer)
    if np.isfinite(gold_values).any():
        pred_values, s_num = _timed("numeric_decode", lambda: score_heldout_numeric(
            params, lora, spec, lspec, tokens, answer_pos, gold_values,
            fold_id, k, tokenizer=tokenizer, use_pallas=on_tpu,
            draft=draft, gamma=cfg.perf.spec_gamma,
        ))
        s_x = np.where(np.isfinite(s_num), s_num, s_x)
        numeric_mra = float(metrics.mra(np.nan_to_num(pred_values), gold_values))

    # open (free-form) samples: held-out greedy decode → normalized
    # exact-match s(x) (MMMU's open split, reference README.md:35)
    gold_texts = [s.answer if s.answer_type == "open" else None for s in ds]
    open_acc = None
    if any(g is not None for g in gold_texts):
        _, s_open = _timed("open_decode", lambda: score_heldout_open(
            params, lora, spec, lspec, tokens, answer_pos, gold_texts,
            fold_id, k, tokenizer=tokenizer, use_pallas=on_tpu,
            draft=draft, gamma=cfg.perf.spec_gamma,
        ))
        s_x = np.where(np.isfinite(s_open), s_open, s_x)
        open_acc = float(np.nanmean(s_open))

    blind_acc = float(metrics.accuracy(pred, tb.gold))
    chance = float(metrics.chance_accuracy(tb.n_options))
    fold_accs = [
        float(metrics.accuracy(pred[fold_id == f], tb.gold[fold_id == f]))
        for f in range(k)
    ]
    # per-category shortcut breakdown (interpretable auditing,
    # reference README.md:35)
    cat_names = ds.categories
    cat_ids = np.array([cat_names.index(s.category) for s in ds])
    cat_acc = np.asarray(metrics.per_category_accuracy(
        pred, tb.gold, cat_ids, len(cat_names)))
    per_category = {
        c: round(float(a), 4) for c, a in zip(cat_names, cat_acc) if np.isfinite(a)
    }

    report = metrics.blind_report(blind_acc, chance, name=ds.name)
    report["per_category_blind_accuracy"] = per_category
    if sx_seed_spearman is not None and np.isfinite(sx_seed_spearman):
        # (finite guard: an all-numeric set has no MCQ s(x) to rank — the
        # spearman degenerates to NaN, which is not valid strict JSON)
        report["sx_seed_spearman"] = round(sx_seed_spearman, 4)
    if sx_seed_top_jaccard is not None:
        report["sx_seed_top_jaccard"] = sx_seed_top_jaccard

    # RF-vs-SFT cross-diagnostic agreement (the self-measured analogue of the
    # BASELINE.json "s(x) Spearman" parity metric): the fast interpretable
    # auditor and the SFT engine should rank the same samples as biased.
    # sklearn backend keeps this host-side (no extra XLA programs).
    if cfg.rf.cross_check and has_mcq:
        from tst.diagnose.rf import run_rf_diagnostic
        from tst.eval.parity import spearman as _spearman

        rf_d = _timed("rf_cross_check", lambda: run_rf_diagnostic(
            ds, k=cfg.data.k, seed=cfg.data.seed,
            n_estimators=cfg.rf.n_estimators, max_depth=cfg.rf.max_depth,
            backend="sklearn", score_rule=cfg.rf.score_rule,
        ))
        report["rf_sft_spearman"] = round(_spearman(rf_d.s_x, s_x), 4)
        report["rf_blind_accuracy"] = round(float(rf_d.blind_accuracy), 4)
    if numeric_mra is not None:
        report["numeric_blind_mra"] = numeric_mra
        report["n_numeric"] = int(np.isfinite(gold_values).sum())
    if open_acc is not None:
        report["open_blind_accuracy"] = round(open_acc, 4)
        report["n_open"] = int(sum(g is not None for g in gold_texts))
    report.update(
        n_samples=len(ds),
        n_mcq=int(is_mcq.sum()),
        k=k,
        model=spec.name,
        fold_accuracies=[round(a, 4) for a in fold_accs],
        train_steps=tlog.steps,
        final_loss=tlog.losses[-1] if tlog.losses else None,
        train_wall_seconds=round(tlog.wall_seconds, 2),
        # compile + first-step wall, summed over fit calls; fit #1 carries the
        # XLA remote-compile wall on a cache miss (minutes) — subtract from
        # train_wall_seconds for the steady-state throughput
        train_first_step_seconds=round(tlog.first_step_seconds, 2),
        train_samples_per_sec=round(tlog.samples_per_sec, 2),
        wall_seconds=round(time.time() - t_start, 2),
        # non-train wall decomposition (round-4 scoring-leg campaign):
        # setup = tokenize/pack/weights; the rest are cumulative stage walls
        setup_wall_seconds=round(setup_wall, 2),
        **{f"{name}_wall_seconds": round(w, 2)
           for name, w in sorted(stage_walls.items())},
    )
    if st.pack is not None:
        report["pack_len"] = st.pack.pack_len
        report["pack_fill_fraction"] = round(st.pack.fill_fraction, 4)
    from tst.io import outputs

    outputs.write_sx_table(cfg.out_dir, ds, s_x, fold_id, pred=pred)
    outputs.write_report(cfg.out_dir, report)
    ds.save_jsonl(f"{cfg.out_dir}/dataset.jsonl")
    cfg.save(f"{cfg.out_dir}/config.json")
    logger.log(event="done", **{k2: v for k2, v in report.items()
                                if isinstance(v, (int, float, str))})
    if return_state:
        report["_state"] = dict(params=params, lora=lora, spec=spec, lspec=lspec,
                                tb=tb, fold_id=fold_id, probs=probs, s_x=s_x)
    return report


def _read_adapter_meta(adapter_dir: str, cfg: RunConfig, dtype) -> Tuple[int, LoraSpec]:
    """(k, LoraSpec) for a serving checkpoint, from its extra.json stamp.

    Checkpoints written by FoldTrainer record k / model / LoRA geometry
    (FoldTrainer.ckpt_extra), so an adapter trained with ANY k restores
    correctly regardless of the serving config. Legacy checkpoints without
    the stamp fall back to the serving config (the old guessing behavior).
    """
    import json
    import os

    meta_path = os.path.join(adapter_dir, "extra.json")
    if not os.path.exists(meta_path):
        from tst.train.pipeline import lora_spec_from_cfg  # self-import ok

        return cfg.data.k, lora_spec_from_cfg(cfg, dtype)
    with open(meta_path) as f:
        extra = json.load(f)
    if "k" not in extra:  # legacy stamp with only {"step": N}
        return cfg.data.k, lora_spec_from_cfg(cfg, dtype)
    if extra.get("model_name") and cfg.model.name != extra["model_name"]:
        raise ValueError(
            f"adapter {adapter_dir} was trained on model "
            f"{extra['model_name']!r} but serving config says "
            f"{cfg.model.name!r} — pass the matching --set model.name"
        )
    lspec = LoraSpec(
        rank=int(extra["lora_rank"]), alpha=float(extra["lora_alpha"]),
        targets=tuple(extra["lora_targets"]), dtype=dtype,
    )
    return int(extra["k"]), lspec


def load_adapter_lora(adapter_dir: str, cfg: RunConfig, spec,
                      fold: str = "0", keep_fold_axis: bool = True):
    """Load a FoldTrainer Orbax LoRA checkpoint for serving → (lora, lspec).

    Template pytrees carry the fold leading axis the checkpoint has; k and
    LoRA geometry come from the checkpoint's own stamp, not the serving
    config (VERDICT r1 item 8). ``fold`` selects which trained adapter
    serves: an integer index, or ``"mean"`` to average adapter weights
    across folds (sensible because all folds share the zero-init-B LoRA
    parametrization). ``keep_fold_axis``: True → a [1, ...] fold axis (the
    shape the k=1 scorers take); False → no fold axis (the shape
    greedy/speculative decode take).
    """
    from tst.aux.ckpt import load_train_state
    from tst.models.lora import init_lora
    from tst.train.sft import make_optimizer

    k_ckpt, lspec = _read_adapter_meta(adapter_dir, cfg, spec.dtype)
    keys = jax.random.split(jax.random.key(0), k_ckpt)
    like_lora = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[init_lora(key, spec, lspec) for key in keys])
    like_opt = jax.vmap(make_optimizer(1e-4, 10).init)(like_lora)
    lora_k, _, _ = load_train_state(adapter_dir, like_lora, like_opt)
    if fold == "mean":
        one = jax.tree.map(lambda x: x.mean(0, keepdims=True), lora_k)
    else:
        f = int(fold)
        if not 0 <= f < k_ckpt:
            raise ValueError(
                f"--fold {f} out of range: checkpoint has k={k_ckpt}")
        one = jax.tree.map(lambda x: x[f : f + 1], lora_k)
    if not keep_fold_axis:
        one = jax.tree.map(lambda x: x[0], one)
    return one, lspec


def run_blind_eval(ds: BlindDataset, cfg: RunConfig,
                   adapter_dir: Optional[str] = None,
                   fold: str = "0",
                   full_accuracy: Optional[float] = None) -> Dict[str, Any]:
    """Blind scoring of every sample with the base model — the zero-shot
    baseline leg of the vision-blind gap (SURVEY.md §3.4) — or, with
    ``adapter_dir``, with a trained LoRA checkpoint (the serving leg:
    adapters trained once are evaluated anywhere).

    ``fold`` selects which trained adapter serves: an integer index, or
    ``"mean"`` to average adapter weights across folds (cheap ensemble —
    sensible because all folds share the zero-init-B LoRA parametrization).

    ``full_accuracy``: the WITH-vision accuracy of the model on this
    benchmark (measured externally — this framework is text-only by
    design). When given, the report carries the paper's headline
    ``vision_blind_gap`` = full - blind (reference README.md:35).
    """
    t_start = time.time()
    tokenizer = build_tokenizer(cfg)
    tb = tokenize_dataset(ds, tokenizer, max_len=cfg.data.max_len,
                          include_context=cfg.data.include_context)
    mesh = None
    if cfg.mesh.fold * cfg.mesh.data * cfg.mesh.seq * cfg.mesh.tensor > 1:
        mesh = mesh_mod.from_config(cfg.mesh)
    spec, params = build_model(cfg, tokenizer, mesh)
    tokens, _, answer_pos = _device_data(tb, mesh)
    on_tpu = cfg.model.use_pallas and jax.default_backend() == "tpu"
    if adapter_dir:
        one, lspec = load_adapter_lora(adapter_dir, cfg, spec, fold=fold)
    # MCQ leg only when the set HAS options: an all-numeric/all-open set
    # (synthetic-numeric, numeric-only VSI slices) has max n_options == 0
    # and probs would be [n, 0] (VERDICT r3 missing #2)
    if int(np.max(tb.n_options, initial=0)) > 0:
        if adapter_dir:
            probs = score_heldout_mcq(
                params, one, spec, lspec, tokens, answer_pos,
                tb.option_token_ids, tb.n_options,
                fold_id=np.zeros(tb.n, np.int32), k=1, use_pallas=on_tpu,
                option_seqs=tb.option_token_seqs,
            )
        else:
            probs = score_all_mcq(
                params, spec, tokens, answer_pos, tb.option_token_ids,
                tb.n_options, use_pallas=on_tpu,
                option_seqs=tb.option_token_seqs,
            )
        pred = probs.argmax(-1).astype(np.int32)
        blind_acc = float(metrics.accuracy(pred, tb.gold))
        chance = float(metrics.chance_accuracy(tb.n_options))
    else:
        blind_acc, chance = 0.0, 0.0
    report = metrics.blind_report(blind_acc, chance, full_acc=full_accuracy,
                                  name=ds.name)
    report["n_mcq"] = int((np.asarray(tb.n_options) > 0).sum())
    gold_texts = [s.answer if s.answer_type == "open" else None for s in ds]
    draft = None  # perf.spec_draft_*: exact speculative decode legs
    if (any(g is not None for g in gold_texts)
            or np.isfinite(np.asarray(
                [s.answer_value if s.answer_type == "numeric" else np.nan
                 for s in ds], np.float64)).any()):
        draft = build_draft_model(cfg, tokenizer)
    if any(g is not None for g in gold_texts):
        # with an adapter: decode open answers through the same fold-0 adapter
        _, s_open = score_heldout_open(
            params, one if adapter_dir else None, spec,
            lspec if adapter_dir else None, tokens, answer_pos, gold_texts,
            fold_id=np.zeros(tb.n, np.int32), k=1, tokenizer=tokenizer,
            use_pallas=on_tpu, draft=draft, gamma=cfg.perf.spec_gamma,
        )
        report["open_blind_accuracy"] = round(float(np.nanmean(s_open)), 4)
        report["n_open"] = int(sum(g is not None for g in gold_texts))
    # numeric (NA) rows: greedy decode → MRA, the VSI-Bench numeric metric
    # (VERDICT r3 missing #2: ~25% of VSI-Bench is numeric; the blind-eval
    # leg previously reported MCQ/open only)
    gold_values = np.asarray(
        [s.answer_value if s.answer_type == "numeric" else np.nan for s in ds],
        np.float64)
    if np.isfinite(gold_values).any():
        pred_values, _ = score_heldout_numeric(
            params, one if adapter_dir else None, spec,
            lspec if adapter_dir else None, tokens, answer_pos, gold_values,
            fold_id=np.zeros(tb.n, np.int32), k=1, tokenizer=tokenizer,
            use_pallas=on_tpu, draft=draft, gamma=cfg.perf.spec_gamma,
        )
        report["numeric_blind_mra"] = round(
            float(metrics.mra(np.nan_to_num(pred_values), gold_values)), 4)
        report["n_numeric"] = int(np.isfinite(gold_values).sum())
    report.update(n_samples=len(ds), model=spec.name,
                  zero_shot=adapter_dir is None,
                  adapter=adapter_dir,
                  adapter_fold=fold if adapter_dir else None,
                  wall_seconds=round(time.time() - t_start, 2))
    from tst.io import outputs

    outputs.write_report(cfg.out_dir, report, name="blind_eval.json")
    return report


def run_generate(ds: BlindDataset, cfg: RunConfig,
                 max_new: int = 16,
                 draft_model: Optional[str] = None,
                 draft_path: Optional[str] = None,
                 draft_quantize: Optional[str] = None,
                 gamma: int = 4,
                 adapter_dir: Optional[str] = None,
                 fold: str = "0") -> Dict[str, Any]:
    """Greedy continuations of every sample's blind prompt — the serving
    surface of the decode stack (``tst generate``).

    With a draft model (``--draft-model``/``--draft-path``) the run uses
    EXACT speculative decoding (tst/models/spec_decode.py): outputs are
    bit-identical to the plain run, and the report carries the measured
    acceptance so the speedup is auditable (committed/round = accepted + 1;
    break-even curves in scripts/probe_spec_decode.py). The draft must share
    the target's tokenizer (e.g. llama3.2-1b drafting for llama3-8b).

    With ``adapter_dir`` the run serves a pipeline-trained Orbax LoRA
    checkpoint (the artifact ``diagnose-sft``/``debias-ibp`` write):
    ``fold`` selects the adapter exactly as eval-blind's ``--fold`` does.
    The adapter applies to the TARGET model only — a speculative draft
    stays base-weighted, which is fine: draft quality affects acceptance,
    never correctness.

    Artifacts: ``generations.jsonl`` (id, answer_type, text, parsed numeric
    value) + ``generate_report.json``.
    """
    import dataclasses

    from tst.models.decode import (decode_numeric, decode_text, greedy_decode,
                                   layer_loop_for)
    from tst.models.quant import quantized_bytes
    from tst.train.infer import decode_chunk_rows

    t_start = time.time()
    tokenizer = build_tokenizer(cfg)
    tb = tokenize_dataset(ds, tokenizer, max_len=cfg.data.max_len,
                          include_context=cfg.data.include_context)
    spec, params = build_model(cfg, tokenizer)
    on_tpu = cfg.model.use_pallas and jax.default_backend() == "tpu"
    base_bytes = quantized_bytes(params)

    dspec = dparams = None
    if draft_model or draft_path:
        dcfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, name=draft_model or cfg.model.name, path=draft_path,
            quantize=draft_quantize or "none"))
        dspec, dparams = build_model(dcfg, tokenizer)
        base_bytes += quantized_bytes(dparams)

    lora = lspec = None
    if adapter_dir:
        lora, lspec = load_adapter_lora(adapter_dir, cfg, spec, fold=fold,
                                        keep_fold_axis=False)

    chunk = min(decode_chunk_rows(spec, tb.seq_len, max_new, k=1,
                                  base_bytes=base_bytes), tb.n)
    tokens = jnp.asarray(tb.tokens)
    prompt_len = jnp.asarray(tb.answer_pos) + 1

    if dparams is not None:
        from tst.models.spec_decode import speculative_greedy_decode

        # lora flows through the jit boundary as an argument like the model
        # params do — closed-over arrays become literal constants in the
        # lowered module (see _make_decode_fn's compile-time note)
        fn0 = jax.jit(lambda dp, tp, la, t, pl: speculative_greedy_decode(
            dp, dspec, tp, spec, t, pl, max_new, gamma=gamma,
            lora=la, lora_spec=lspec,
            use_pallas=on_tpu, return_stats=True))
        fn = lambda dp, tp, t, pl: fn0(dp, tp, lora, t, pl)
    else:
        loop = layer_loop_for(spec)
        fn0 = jax.jit(lambda tp, la, t, pl: greedy_decode(
            tp, t, pl, max_new, spec, lora=la, lora_spec=lspec,
            use_pallas=on_tpu, layer_loop=loop))
        fn = lambda tp, t, pl: fn0(tp, lora, t, pl)

    gen = np.zeros((tb.n, max_new), np.int32)
    rounds_total = 0
    committed_total = 0.0  # exact-greedy tokens committed via rounds, real rows
    round_rows = 0  # sum over chunks of n_real_rows x that chunk's rounds
    t_first = None
    for lo in range(0, tb.n, chunk):
        n_real = min(lo + chunk, tb.n) - lo
        rows = np.arange(lo, min(lo + chunk, tb.n))
        if rows.size < chunk:  # pad the tail chunk to the compiled shape
            rows = np.pad(rows, (0, chunk - rows.size), mode="edge")
        t0 = time.time()
        if dparams is not None:
            out, stats = fn(dparams, params, tokens[rows], prompt_len[rows])
            chunk_rounds = int(stats["rounds"])
            rounds_total += chunk_rounds
            # per-row committed counts keep growing past max_new (capped rows
            # still verify), so summing committed-1 over REAL rows gives the
            # unbiased per-round commit rate — not gated by the slowest row,
            # and tail-pad duplicates excluded.
            committed_total += float(
                np.sum(np.asarray(stats["committed"])[:n_real]) - n_real)
            round_rows += n_real * chunk_rounds
        else:
            out = fn(params, tokens[rows], prompt_len[rows])
        out = np.asarray(out)
        if t_first is None:
            t_first = time.time() - t0
        gen[lo: lo + chunk] = out[: tb.n - lo]

    texts = decode_text(gen, tokenizer)
    values = decode_numeric(gen, tokenizer)
    import json as _json
    import os

    os.makedirs(cfg.out_dir, exist_ok=True)
    with open(f"{cfg.out_dir}/generations.jsonl", "w") as f:
        for s, text, val in zip(ds, texts, values):
            row = {"id": s.id, "answer_type": s.answer_type, "text": text}
            if s.answer_type == "numeric":
                row["value"] = None if np.isnan(val) else float(val)
            f.write(_json.dumps(row) + "\n")

    wall = time.time() - t_start
    report: Dict[str, Any] = {
        "n_samples": len(ds), "model": spec.name, "max_new": max_new,
        "chunk_rows": int(chunk),
        "first_call_seconds": round(t_first or 0.0, 2),
        "tokens_generated": int(tb.n * max_new),
        "wall_seconds": round(wall, 2),
        "adapter": adapter_dir,
        "adapter_fold": fold if adapter_dir else None,
    }
    if dparams is not None:
        # mean exact-greedy tokens each row commits per verify round
        # (1 = bonus only, gamma+1 = full acceptance): each round adds
        # accepted+1 to a row's committed counter, so the ratio of
        # committed-beyond-the-first to row-rounds IS tokens/round.
        per_round = committed_total / max(round_rows, 1)
        report.update(
            draft=dspec.name, gamma=gamma, spec_rounds=int(rounds_total),
            committed_per_round=round(per_round, 3),
            draft_acceptance=round(max(per_round - 1.0, 0.0) / gamma, 3),
        )
    from tst.io import outputs

    outputs.write_report(cfg.out_dir, report, name="generate_report.json")
    return report
