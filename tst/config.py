"""Typed run configuration (SURVEY.md §5 config system).

Dataclass tree ``RunConfig``; values come from (lowest → highest precedence)
defaults → preset → JSON config file → CLI ``--set dotted.key=value``
overrides. Every run serializes its resolved config next to its outputs for
reproducibility. Presets mirror the five BASELINE.json configs.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Tuple


@dataclasses.dataclass
class DataConfig:
    bench: str = "synthetic:0.5"
    source: Optional[str] = None  # local dataset dir / jsonl; None = hub id
    split: Optional[str] = None
    k: int = 5
    seed: int = 0
    max_len: Optional[int] = None  # None = smallest bucket that fits
    include_context: bool = True
    include_open: bool = True  # load open-answer questions (MMMU) — scored
    # by held-out greedy decode + normalized exact match
    n: int = 256  # synthetic size
    #: "completion" renders the raw blind prompt (base checkpoints);
    #: "chat" wraps it in the tokenizer's chat template (instruct
    #: checkpoints — Qwen2.5-*-Instruct etc. see mis-formatted prompts and
    #: silently depressed blind accuracy without this; VERDICT r2 missing #4)
    prompt_style: str = "completion"


@dataclasses.dataclass
class RFConfig:
    n_estimators: int = 200
    max_depth: Optional[int] = 12
    backend: str = "jax"  # "jax" | "sklearn"
    score_rule: str = "gold_prob"
    cross_check: bool = True  # diagnose-sft also runs the (cheap, host-side)
    # RF auditor and reports Spearman(s_x_rf, s_x_sft) — the self-measured
    # analogue of the cross-implementation parity metric


@dataclasses.dataclass
class ModelConfig:
    name: str = "tiny"  # "tiny" | "qwen2.5-0.5b" | "llama3-8b" | HF dir path
    path: Optional[str] = None  # local checkpoint dir (safetensors)
    dtype: str = "bfloat16"
    tokenizer: str = "byte"  # "byte" | path to HF tokenizer
    use_pallas: bool = True  # fused kernels on TPU; XLA fallback otherwise
    fused_mlp: bool = False  # Pallas fused SwiGLU MLP (B12); measured slower
    # than XLA's own fusion in the train step on v5e — see docs/RESULTS.md
    remat: Any = False  # False | True (full) | "dots" (save matmul outputs)
    # | "dots_attn" / "dots_flash" (dots + attention output / + flash
    #   residuals) | "light" (all but the [S, d_ff] MLP hiddens) | "attn"
    #   (only the attention tensors — the long-seq middle ground);
    # measured guidance in docs/RESULTS.md: "dots" for short seq, True for
    # 16k+ (the dots-family exceeds the schedulable HBM there)
    quantize: str = "none"  # "none" | "int8" | "int4" — weights-only base quantization
    # ("int4" = RTN-g128 on the stacked layer matrices, embed/lm_head stay int8)
    # (int8 halves base HBM: Llama-3-8B fits a single 16 GB v5e chip)


@dataclasses.dataclass
class LoraConfig:
    rank: int = 16
    alpha: float = 32.0
    dropout: float = 0.0
    targets: Tuple[str, ...] = ("q_proj", "k_proj", "v_proj", "o_proj")


@dataclasses.dataclass
class OptimConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    warmup_frac: float = 0.03
    epochs: int = 3
    batch_size: int = 8  # per fold
    b1: float = 0.9
    b2: float = 0.999
    score_epochs: Tuple[int, ...] = ()  # extra epochs whose heldout probs average into s(x); () = final only
    n_seeds: int = 1  # independent SFT restarts averaged into s(x) (epochs/seeds aggregation)
    #: sequence packing (tst.data.packing): several samples per train row,
    #: attention confined per segment. batch_size then counts PACKED rows —
    #: each carries ~pack_len/mean_sample_len samples.
    pack: bool = False
    pack_len: int = 0  # packed row length; 0 = 2x the tokenized bucket
    #: score held-out MCQ rows through the packed scorer too (measured 1.73x
    #: on the 8B scoring wall; single-token-option tokenizers only — the
    #: multi-token fallback keeps the unpacked grid). Only read when pack is
    #: on. NOT a perf.* knob: packed letter probs differ from unpacked at
    #: ~1e-2, which can flip near-boundary prune order, so the choice rides
    #: the IBP config hash / the run's config.json.
    packed_scorer: bool = True


@dataclasses.dataclass
class MeshConfig:
    fold: int = 1  # fold-parallel axis (vmapped LoRA states)
    data: int = 1  # DP/FSDP axis
    seq: int = 1  # sequence-parallel axis (ring attention, long transcripts)
    tensor: int = 1  # TP axis (innermost, fastest ICI ring)


@dataclasses.dataclass
class IBPConfig:
    rounds: int = 4
    prune_rate: float = 0.1  # fraction of surviving set pruned per round
    category_balanced: bool = True
    stop_epsilon: float = 0.02  # stop when blind_acc <= chance + eps
    diagnostic: str = "sft"  # "sft" | "rf"
    #: resume a killed run from out_dir/ibp_state.json (written after every
    #: round; SURVEY §5 failure recovery — at north-star scale one 8B round
    #: costs tens of minutes). The state is keyed by benchmark + a config
    #: hash: a mismatch starts fresh instead of resuming someone else's loop.
    resume: bool = True
    #: fault injection for tests: raise after persisting this many rounds
    fail_after_rounds: int = 0


@dataclasses.dataclass
class PerfConfig:
    """Per-run kernel/dispatch tuning (VERDICT r3 weak #5: these lived only
    as mutable module globals, so a production run could not select them
    and have them recorded in the run's config.json artifact). ``None``
    keeps the measured auto default. Applied once per process by
    ``tst.runtime.knobs.apply_perf_config`` (the CLI does this right after
    config resolution); the globals stay as the substrate so interactive
    sweeps still work."""

    #: decode layer iteration: "auto" (unroll iff the geometry is
    #: measured-safe for the compile helper), "scan", or "unroll"
    decode_layer_loop: str = "auto"
    #: folded-GQA flash dispatch thresholds/tiles (flash_attention.FOLD_*)
    fold_max_rows: Optional[int] = None
    fold_block_q: Optional[int] = None
    fold_block_k: Optional[int] = None
    fold_bwd_block_q: Optional[int] = None
    #: segment-sparse chunked schedule (flash_attention.SEG_*)
    seg_sparse_min_s: Optional[int] = None
    seg_block_q: Optional[int] = None
    seg_chunk: Optional[int] = None
    #: flash ablation switches (flash_attention.PRESCALE_Q / FUSED_BWD)
    prescale_q: Optional[bool] = None
    fused_bwd: Optional[bool] = None
    #: software-pipelined int4 dequant-matmul body (quant_matmul.PIPELINE)
    quant_pipeline: Optional[bool] = None
    #: EXACT speculative decoding for the numeric/open held-out decode legs
    #: (tst/models/spec_decode.py): outputs are bit-identical to plain
    #: greedy decode, so these ride perf.* — trajectory-neutral and
    #: excluded from the IBP config hash like every kernel knob. Empty =
    #: plain decode. Measured round costs: scripts/probe_spec_decode.py.
    spec_draft_model: str = ""
    spec_draft_path: Optional[str] = None
    spec_draft_quantize: str = "int4"
    spec_gamma: int = 2


@dataclasses.dataclass
class RunConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    rf: RFConfig = dataclasses.field(default_factory=RFConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    lora: LoraConfig = dataclasses.field(default_factory=LoraConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    ibp: IBPConfig = dataclasses.field(default_factory=IBPConfig)
    perf: PerfConfig = dataclasses.field(default_factory=PerfConfig)
    out_dir: str = "runs/latest"
    profile_dir: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    log_every: int = 10

    def to_json(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_json(), f, indent=2)

    @classmethod
    def from_json(cls, d: Dict[str, Any]) -> "RunConfig":
        cfg = cls()
        _apply_nested(cfg, d)
        return cfg

    @classmethod
    def load(cls, path: str) -> "RunConfig":
        with open(path) as f:
            return cls.from_json(json.load(f))

    def override(self, assignments: List[str]) -> "RunConfig":
        """Apply ``dotted.key=value`` overrides (values parsed as JSON,
        falling back to string)."""
        for a in assignments:
            if "=" not in a:
                raise ValueError(f"override must be key=value, got {a!r}")
            key, _, raw = a.partition("=")
            try:
                value = json.loads(raw)
            except json.JSONDecodeError:
                value = raw
            obj = self
            parts = key.split(".")
            for p in parts[:-1]:
                obj = getattr(obj, p)
            leaf = parts[-1]
            if not hasattr(obj, leaf):
                raise AttributeError(f"no config field {key!r}")
            current = getattr(obj, leaf)
            if isinstance(current, tuple) and isinstance(value, list):
                value = tuple(value)
            setattr(obj, leaf, value)
        return self


def _apply_nested(obj, d: Dict[str, Any]) -> None:
    for key, value in d.items():
        if not hasattr(obj, key):
            raise AttributeError(f"unknown config field {key!r} on {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _apply_nested(current, value)
        else:
            if isinstance(current, tuple) and isinstance(value, list):
                value = tuple(value)
            setattr(obj, key, value)


#: Presets mirroring the five BASELINE.json configs.
PRESETS: Dict[str, Dict[str, Any]] = {
    # 1. Random Forest diagnostic on CV-Bench text-only features (CPU parity)
    "rf-cvbench": {"data": {"bench": "cv_bench", "k": 5}},
    # 2. Qwen2.5-0.5B 2-fold blind SFT on CV-Bench MCQs + s(x)
    "sft-cvbench-qwen": {
        "data": {"bench": "cv_bench", "k": 2},
        "model": {"name": "qwen2.5-0.5b", "tokenizer": "hf"},
        "optim": {"epochs": 3, "batch_size": 16},
    },
    # 3. Llama-3-8B k=5-fold blind LoRA SFT on MMMU (fold-parallel over mesh)
    "sft-mmmu-llama8b": {
        "data": {"bench": "mmmu", "k": 5},
        "model": {"name": "llama3-8b", "tokenizer": "hf", "remat": True},
        "mesh": {"fold": 1, "data": 4, "tensor": 4},
        "optim": {"epochs": 2, "batch_size": 8},
    },
    # 4. VideoMME long-text stress-test
    "sft-videomme-long": {
        "data": {"bench": "video_mme", "k": 5, "max_len": 16384},
        "model": {"name": "qwen2.5-0.5b", "tokenizer": "hf"},
        "optim": {"batch_size": 2},
    },
    # 5. Full IBP pipeline regenerating VSI-Bench-Debiased
    "ibp-vsibench": {
        "data": {"bench": "vsi_bench", "k": 5},
        "model": {"name": "llama3-8b", "tokenizer": "hf", "remat": True},
        "mesh": {"fold": 1, "data": 4, "tensor": 4},
        "ibp": {"rounds": 4, "prune_rate": 0.1, "diagnostic": "sft"},
    },
}


def resolve(preset: Optional[str] = None, config_file: Optional[str] = None,
            overrides: Optional[List[str]] = None) -> RunConfig:
    cfg = RunConfig()
    if preset:
        if preset not in PRESETS:
            raise KeyError(f"unknown preset {preset!r}; have {sorted(PRESETS)}")
        _apply_nested(cfg, PRESETS[preset])
    if config_file:
        with open(config_file) as f:
            _apply_nested(cfg, json.load(f))
    if overrides:
        cfg.override(overrides)
    return cfg
