"""Fold-parallel blind LoRA SFT engine (SURVEY.md §2b B14, call stack §3.1).

Requirement: "fine-tuning a powerful Large Language Model ... on exclusively
the non-visual, textual inputs of the test set" under k-fold CV (reference
README.md:35). TPU realization per the north-star: ALL k fold-models train
simultaneously as one jitted program —

  * the frozen base is ONE copy, FSDP-sharded over the ``data`` mesh axis and
    closed over (vmap ``in_axes=None``) so XLA shares its per-layer
    all-gathers across folds (SURVEY.md §7 hard part 1);
  * LoRA adapters + optimizer states carry a leading ``[k]`` fold axis,
    sharded over the ``fold`` mesh axis, trained by ``vmap(train_step)``;
  * each fold sees only its k-1 training folds via per-fold *index streams*
    (host-precomputed epoch permutations of each fold's train rows); the
    dataset itself stays device-resident — the jitted step gathers its
    ``[k, B, S]`` batch from the resident token array by index, so no
    per-step host transfers occur;
  * loss = cross-entropy on answer tokens only (prompt-masked labels),
    computed in f32 off bf16 activations; AdamW + cosine schedule via optax;
    adapter/optimizer buffers are donated.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tst.models.decoder import ModelSpec, apply_model, lm_head_weight
from tst.models.lora import LoraSpec, init_lora

Params = Dict[str, Any]


def sft_loss(
    base: Params,
    lora: Params,
    tokens: jnp.ndarray,  # int32 [B, S]
    loss_mask: jnp.ndarray,  # f32 [B, S] — 1.0 on target tokens
    spec: ModelSpec,
    lora_spec: LoraSpec,
    use_pallas: bool = False,
    remat: bool = False,
    ring_mesh=None,
    fused_mlp: bool = False,
    lora_rng=None,
    seg_starts=None,
) -> jnp.ndarray:
    """Prompt-masked causal-LM cross entropy (mean over target tokens).

    ``seg_starts``: optional int32 [B, n_segs] packed-row segment starts
    (tst.data.packing) — the loss is already packing-correct as-is because
    the mask covers every segment's answer tokens; the starts only steer the
    model's attention/positions. NB a packed batch normalizes over the UNION
    of its samples' target tokens, identical to the same samples unpacked in
    one batch (tests/test_packing.py pins this equality).
    """
    logits = apply_model(base, tokens, spec, lora=lora, lora_spec=lora_spec,
                         use_pallas=use_pallas, remat=remat,
                         ring_mesh=ring_mesh, fused_mlp=fused_mlp,
                         lora_rng=lora_rng, seg_starts=seg_starts)  # [B, S, V] f32
    labels = tokens[:, 1:]
    # No cross-boundary term needs masking: a segment's first token is its
    # BOS (loss_mask 0), so the shifted loss never pays for predicting one
    # sample's start from another's end.
    w = loss_mask[:, 1:]
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    gold_lp = jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
    return -(gold_lp * w).sum() / jnp.maximum(w.sum(), 1.0)


def sft_loss_window(
    base: Params,
    lora: Params,
    tokens: jnp.ndarray,  # int32 [B, S]
    loss_mask: jnp.ndarray,  # f32 [B, S]
    answer_pos: jnp.ndarray,  # int32 [B] or [B, G] — last prompt-token index
    t_max: int,  # static: max target length in tokens
    spec: ModelSpec,
    lora_spec: LoraSpec,
    use_pallas: bool = False,
    remat: bool = False,
    ring_mesh=None,
    fused_mlp: bool = False,
    lora_rng=None,
    seg_starts=None,
) -> jnp.ndarray:
    """Same loss as :func:`sft_loss`, but the vocab projection runs only on
    the ``t_max``-token answer window instead of all S positions.

    Targets are contiguous from ``answer_pos+1`` (tst.data.tokenize), so
    logits are needed only at rows ``answer_pos + [0, t_max)``. For S=512,
    t_max≈4 this shrinks the [B, S, V] f32 logits (the largest buffer in the
    program, ~5 GB for Qwen-0.5B at B=16) by S/t_max≈128× and cuts the head
    matmul FLOPs equally. Numerically identical: loss_mask is zero outside
    the window.

    Packed rows (tst.data.packing): pass ``seg_starts`` [B, n_segs] and a 2-D
    ``answer_pos`` [B, G] with one window per packed sample (-1 on unused
    slots — those windows are weight-zeroed). G·t_max positions project per
    row instead of t_max.
    """
    h = apply_model(base, tokens, spec, lora=lora, lora_spec=lora_spec,
                    use_pallas=use_pallas, remat=remat, return_hidden=True,
                    ring_mesh=ring_mesh, fused_mlp=fused_mlp,
                    lora_rng=lora_rng, seg_starts=seg_starts)
    b, s = tokens.shape
    ap = answer_pos if answer_pos.ndim == 2 else answer_pos[:, None]  # [B, G]
    g = ap.shape[1]
    valid = ap >= 0  # [B, G] — unused packed slots
    rows3 = (jnp.maximum(ap, 0)[:, :, None]
             + jnp.arange(t_max, dtype=jnp.int32)[None, None, :])  # [B, G, T]
    ok3 = (rows3 <= s - 2) & valid[:, :, None]
    if seg_starts is not None:
        # a window must not cross its segment's end: label position rows+1
        # stays below the next segment's start (else a long t_max could
        # double-count the NEXT packed sample's early tokens)
        seg = jnp.asarray(seg_starts, jnp.int32)  # [B, n_segs]
        later = jnp.where(seg[:, None, :] > jnp.maximum(ap, 0)[:, :, None],
                          seg[:, None, :], s)
        seg_end = jnp.min(later, axis=-1)  # [B, G] — next start, else S
        ok3 = ok3 & (rows3 + 1 < seg_end[:, :, None])
    rows = rows3.reshape(b, g * t_max)
    in_range = ok3.reshape(b, g * t_max)
    rows_c = jnp.minimum(rows, s - 2)
    hsel = jnp.take_along_axis(h, rows_c[..., None], axis=1)  # [B, G*T, D]
    logits = jnp.einsum(
        "btd,dv->btv", hsel, lm_head_weight(base, spec).astype(spec.dtype),
        preferred_element_type=jnp.float32,
    )
    labels = jnp.take_along_axis(tokens, rows_c + 1, axis=1)  # [B, G*T]
    w = jnp.take_along_axis(loss_mask, rows_c + 1, axis=1) * in_range
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    gold_lp = jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
    return -(gold_lp * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_optimizer(lr: float, total_steps: int, warmup_frac: float = 0.03,
                   weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999):
    warmup = max(int(total_steps * warmup_frac), 1)
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1), end_value=lr * 0.05,
    )
    return optax.adamw(sched, b1=b1, b2=b2, weight_decay=weight_decay)


def make_fold_batches(
    fold_id: np.ndarray,
    k: int,
    batch_size: int,
    epochs: int,
    seed: int,
    batch_multiple: int = 1,
    include_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-fold epoch index streams: int32 [total_steps, k, B].

    Fold f trains on rows with ``fold_id != f``. Every fold must execute the
    same number of steps (one shared program), so steps_per_epoch is set by
    the largest train split; smaller splits wrap around (re-sampling a fresh
    permutation per wrap). ``batch_size`` is rounded up to ``batch_multiple``
    (the ``data`` mesh axis size) so batches shard evenly.

    ``include_mask`` (bool [N]) restricts training to a surviving subset
    without reshaping the device-resident dataset — how IBP rounds train on
    shrinking sets with zero re-uploads (SURVEY.md §3.3).
    """
    b = batch_size + (-batch_size) % batch_multiple
    rng = np.random.default_rng(seed)
    keep = np.ones_like(fold_id, bool) if include_mask is None else np.asarray(include_mask, bool)
    train_rows: List[np.ndarray] = [
        np.flatnonzero((fold_id != f) & keep) for f in range(k)
    ]
    for f, rows in enumerate(train_rows):
        if len(rows) == 0:
            raise ValueError(f"fold {f} has an empty train split")
    steps_per_epoch = max(int(np.ceil(len(r) / b)) for r in train_rows)
    total = steps_per_epoch * epochs
    out = np.zeros((total, k, b), np.int32)
    for f, rows in enumerate(train_rows):
        stream = []
        while len(stream) < total * b:
            stream.extend(rng.permutation(rows).tolist())
        out[:, f, :] = np.asarray(stream[: total * b], np.int32).reshape(total, b)
    return out


def _opt_count(opt_state) -> jnp.ndarray:
    """First ``count`` field in an optax state tree (the optimizer step).
    optax.tree_utils.tree_get raises on adamw (two counts: adam + schedule);
    either one is the step index."""
    # NB: plain tuples expose a builtin .count METHOD — only namedtuple
    # states (ScaleByAdamState etc.) carry a real count field
    if hasattr(opt_state, "_fields") and "count" in opt_state._fields:
        return opt_state.count
    if isinstance(opt_state, (tuple, list)):
        for item in opt_state:
            found = _opt_count(item)
            if found is not None:
                return found
    return None


#: (spec, lora_spec, optimizer hyperparams, flags) → jitted fold-train step
_STEP_CACHE: Dict[Any, Callable] = {}


@dataclasses.dataclass
class TrainLog:
    losses: List[float] = dataclasses.field(default_factory=list)  # mean over folds
    fold_losses: List[List[float]] = dataclasses.field(default_factory=list)
    steps: int = 0
    wall_seconds: float = 0.0
    samples_per_sec: float = 0.0
    # wall of the first step of each fit call, hard-synced: fit #1's entry is
    # dominated by the XLA remote-compile wall (minutes on a cache miss —
    # docs/RESULTS.md round-4 anchor decomposition), later entries are ~one
    # steady step. Lets reports split compile wall from steady throughput.
    first_step_seconds: float = 0.0


class FoldTrainer:
    """Owns the jitted fold-parallel train step and the training loop.

    Construction compiles nothing; the first ``.fit`` step triggers XLA
    compilation (cache it via aux.ckpt.enable_compilation_cache for 8B).
    """

    def __init__(
        self,
        spec: ModelSpec,
        lora_spec: LoraSpec,
        k: int,
        lr: float = 1e-4,
        total_steps: int = 100,
        warmup_frac: float = 0.03,
        weight_decay: float = 0.0,
        use_pallas: bool = False,
        remat: bool = False,
        mesh=None,
        t_max: Optional[int] = None,
        ring: bool = False,
        b1: float = 0.9,
        b2: float = 0.999,
        fused_mlp: bool = False,
        packed: bool = False,
    ):
        self.spec = spec
        self.lora_spec = lora_spec
        self.k = k
        self.mesh = mesh
        #: packed-sequence mode (tst.data.packing): ``fit`` takes PER-FOLD
        #: stacked arrays [k, Np, ...] plus seg_starts, and answer_pos is
        #: [k, Np, MAX_SEGS] (one window per packed sample)
        self.packed = packed
        self._opt_key = (lr, total_steps, warmup_frac, weight_decay, b1, b2)
        self.tx = make_optimizer(lr, total_steps, warmup_frac, weight_decay, b1, b2)
        self.use_pallas = use_pallas
        self.remat = remat
        #: fuse the SwiGLU MLP into one Pallas kernel (B12; only applies on
        #: the pallas path and when no LoRA adapter targets the MLP)
        self.fused_mlp = fused_mlp
        #: answer-window length; None = full-sequence loss (debug/fallback)
        self.t_max = t_max
        #: sequence-parallel training: ring attention over mesh's "seq" axis
        self.ring_mesh = mesh if (ring and mesh is not None) else None
        self._step_fn = self._build_step()

    def ckpt_extra(self, **kw) -> Dict[str, Any]:
        """Host metadata stamped into every checkpoint's extra.json so
        serving (eval-blind --adapter) can rebuild the exact adapter pytree
        instead of guessing k / LoRA geometry from the serving config."""
        return {
            "k": self.k,
            "model_name": self.spec.name,
            "lora_rank": self.lora_spec.rank,
            "lora_alpha": self.lora_spec.alpha,
            "lora_targets": list(self.lora_spec.targets),
            **kw,
        }

    def init_state(self, rng: jax.Array) -> Tuple[Params, Params]:
        """(stacked lora [k,...], stacked opt state). Per-fold RNGs differ so
        fold adapters start decorrelated."""
        keys = jax.random.split(rng, self.k)
        loras = [init_lora(key, self.spec, self.lora_spec) for key in keys]
        lora = jax.tree.map(lambda *xs: jnp.stack(xs), *loras)
        if self.mesh is not None:
            from tst.runtime import mesh as mesh_mod

            lora = mesh_mod.shard_tree(lora, mesh_mod.lora_pspec_tree(lora), self.mesh)
        # optimizer moments mirror the (already sharded) adapter leaves, so
        # vmapped init inherits their shardings via GSPMD propagation.
        opt_state = jax.vmap(self.tx.init)(lora)
        return lora, opt_state

    def _build_step(self) -> Callable:
        # Memoize compiled programs on the training hyperparams: repeated
        # trainers with identical configs (IBP rounds, test suites) must hit
        # jax's jit cache instead of re-tracing a fresh closure.
        ring_key = None
        if self.ring_mesh is not None:
            ring_key = (self.ring_mesh.axis_names, self.ring_mesh.devices.shape)
        key = (self.spec, self.lora_spec, self._opt_key, self.use_pallas,
               self.remat, self.t_max, ring_key, self.fused_mlp, self.packed)
        cached = _STEP_CACHE.get(key)
        if cached is not None:
            return cached

        spec, lspec = self.spec, self.lora_spec
        use_pallas, remat = self.use_pallas, self.remat
        fused_mlp = self.fused_mlp
        t_max = self.t_max
        ring_mesh = self.ring_mesh
        tx = self.tx

        dropout = getattr(lspec, "dropout", 0.0) > 0.0

        packed = self.packed

        def one_fold(base, lora, opt_state, tokens, mask, pos, segs, fold_idx):
            lora_rng = None
            if dropout:
                # deterministic in (fold, optimizer step): fresh masks every
                # step with no change to the jitted step's signature
                count = _opt_count(opt_state)
                if count is None:
                    raise ValueError(
                        "LoRA dropout needs an optimizer whose state carries "
                        "a step `count` field (adamw/adam/sgd-with-schedule do; "
                        "a bare optax.sgd does not) — the count seeds the "
                        "per-step dropout masks")
                lora_rng = jax.random.fold_in(
                    jax.random.fold_in(jax.random.key(0x10A0), fold_idx),
                    count)
            if t_max is None:
                loss, grads = jax.value_and_grad(sft_loss, argnums=1)(
                    base, lora, tokens, mask, spec, lspec, use_pallas, remat,
                    ring_mesh, fused_mlp, lora_rng, segs
                )
            else:
                loss, grads = jax.value_and_grad(sft_loss_window, argnums=1)(
                    base, lora, tokens, mask, pos, t_max, spec, lspec,
                    use_pallas, remat, ring_mesh, fused_mlp, lora_rng, segs
                )
            updates, opt_state = tx.update(grads, opt_state, lora)
            lora = optax.apply_updates(lora, updates)
            return lora, opt_state, loss

        if packed:
            # per-fold datasets carry a leading [k] axis (each fold packs its
            # own k-1 train folds); the gather picks each fold's own rows
            @partial(jax.jit, donate_argnums=(1, 2))
            def step(base, lora_k, opt_k, all_tokens, all_mask, all_pos,
                     all_segs, idx_kB):
                ka = jnp.arange(idx_kB.shape[0], dtype=jnp.int32)[:, None]
                tokens = all_tokens[ka, idx_kB]  # [k, B, S]
                mask = all_mask[ka, idx_kB]
                pos = all_pos[ka, idx_kB]  # [k, B, MAX_SEGS]
                segs = all_segs[ka, idx_kB]  # [k, B, MAX_SEGS]
                folds = jnp.arange(idx_kB.shape[0], dtype=jnp.uint32)
                return jax.vmap(one_fold, in_axes=(None, 0, 0, 0, 0, 0, 0, 0))(
                    base, lora_k, opt_k, tokens, mask, pos, segs, folds
                )
        else:
            @partial(jax.jit, donate_argnums=(1, 2))
            def step(base, lora_k, opt_k, all_tokens, all_mask, all_pos, idx_kB):
                tokens = all_tokens[idx_kB]  # [k, B, S] — on-device gather
                mask = all_mask[idx_kB]
                pos = all_pos[idx_kB]
                folds = jnp.arange(idx_kB.shape[0], dtype=jnp.uint32)
                return jax.vmap(one_fold,
                                in_axes=(None, 0, 0, 0, 0, 0, None, 0))(
                    base, lora_k, opt_k, tokens, mask, pos, None, folds
                )

        _STEP_CACHE[key] = step
        return step

    def fit(
        self,
        base: Params,
        lora: Params,
        opt_state,
        all_tokens: jnp.ndarray,
        all_mask: jnp.ndarray,
        batches: np.ndarray,  # [steps, k, B]
        all_pos: Optional[jnp.ndarray] = None,  # int32 [N]; required if t_max set
        log_every: int = 10,
        log_fn: Optional[Callable[[int, float], None]] = None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 50,
        fail_after_step: Optional[int] = None,  # fault injection for resume tests
        all_segs: Optional[jnp.ndarray] = None,  # int32 [k, Np, MAX_SEGS] (packed)
        n_segs: Optional[np.ndarray] = None,  # int32 [k, Np] host-side (packed)
    ) -> Tuple[Params, Any, TrainLog]:
        if self.packed:
            if all_segs is None or all_pos is None:
                raise ValueError("packed mode needs all_segs and all_pos "
                                 "(tst.data.packing.pack_fold_datasets arrays)")
        elif all_segs is not None:
            raise ValueError("all_segs passed to an unpacked FoldTrainer — "
                             "construct it with packed=True")
        if all_pos is None:
            if self.t_max is not None:
                raise ValueError("windowed loss (t_max set) needs all_pos")
            all_pos = jnp.zeros(all_tokens.shape[0], jnp.int32)
        start_step = 0
        if checkpoint_dir is not None:
            from tst.aux import ckpt as ckpt_mod
            import os

            if os.path.exists(os.path.join(checkpoint_dir, "extra.json")):
                lora, opt_state, extra = ckpt_mod.load_train_state(
                    checkpoint_dir, lora, opt_state
                )
                start_step = int((extra or {}).get("step", 0))
        log = TrainLog()
        t0 = time.time()
        pending = []
        for t in range(start_step, batches.shape[0]):
            if self.packed:
                lora, opt_state, loss = self._step_fn(
                    base, lora, opt_state, all_tokens, all_mask, all_pos,
                    all_segs, jnp.asarray(batches[t])
                )
            else:
                lora, opt_state, loss = self._step_fn(
                    base, lora, opt_state, all_tokens, all_mask, all_pos,
                    jnp.asarray(batches[t])
                )
            pending.append(loss)
            if t == start_step:
                np.asarray(loss)  # hard sync: capture compile + step-1 wall
                log.first_step_seconds = time.time() - t0
            if (t + 1) % log_every == 0 or t == batches.shape[0] - 1:
                fold_loss = np.asarray(pending[-1])  # sync point
                mean = float(fold_loss.mean())
                log.losses.append(mean)
                log.fold_losses.append([float(x) for x in fold_loss])
                if log_fn:
                    log_fn(t + 1, mean)
                pending.clear()
            if checkpoint_dir is not None and (t + 1) % checkpoint_every == 0:
                from tst.aux import ckpt as ckpt_mod

                ckpt_mod.save_train_state(checkpoint_dir, lora, opt_state,
                                          extra=self.ckpt_extra(step=t + 1))
            if fail_after_step is not None and t + 1 >= fail_after_step:
                raise RuntimeError(f"injected failure after step {t + 1}")
        # hard sync (block_until_ready may return early under remote PJRT)
        np.asarray(jax.tree.leaves(lora)[0])
        if checkpoint_dir is not None:
            from tst.aux import ckpt as ckpt_mod

            ckpt_mod.save_train_state(checkpoint_dir, lora, opt_state,
                                      extra=self.ckpt_extra(step=int(batches.shape[0])))
        log.steps = int(batches.shape[0])
        log.wall_seconds = time.time() - t0
        if self.packed and n_segs is not None:
            # count REAL samples (segments), not packed rows
            idx = np.asarray(batches)  # [steps, k, B]
            fold_ax = np.arange(idx.shape[1])[None, :, None]
            n_samples = int(np.asarray(n_segs)[fold_ax, idx].sum())
        else:
            n_samples = int(batches.shape[0]) * int(batches.shape[1]) * int(batches.shape[2])
        log.samples_per_sec = n_samples / max(log.wall_seconds, 1e-9)
        return lora, opt_state, log
