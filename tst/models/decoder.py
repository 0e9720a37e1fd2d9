"""Decoder-only LM core: RMSNorm + RoPE + GQA attention + SwiGLU, TPU-first.

Requirement: "fine-tuning a powerful Large Language Model" on blind text
(reference README.md:35); model families Llama-3-8B / Qwen2.5-0.5B from
BASELINE.json configs. Both are the same architecture family; a single pure
functional core serves both, parameterized by :class:`ModelSpec` (Qwen2 adds
QKV biases; Llama-3 ties nothing and uses a separate lm_head).

TPU-first design decisions (SURVEY.md §1 L2/L3):

  * **Layers are stacked**: every per-layer weight carries a leading
    ``[n_layers, ...]`` axis and the forward pass is one ``lax.scan`` over
    that axis. XLA compiles ONE layer body instead of L copies — compile
    time for the 8B model is a known hard part (SURVEY.md §7) — and FSDP
    sharding of the stacked arrays is uniform.
  * **Pure pytrees**: params are plain nested dicts of jnp arrays; ``apply``
    is a pure function — vmap over a fold axis of LoRA adapters (B11) and
    pjit/GSPMD over the mesh compose trivially.
  * **bf16 weights / f32 accumulation**: matmuls run in bfloat16 on the MXU
    with ``preferred_element_type=float32``; norms/softmax/logits in f32.
  * **Attention is pluggable**: dense XLA einsum path (always available) or
    the Pallas flash kernel (tst.kernels, M4) selected per call.
  * Optional ``jax.checkpoint`` (remat) around the scanned layer body trades
    FLOPs for HBM on the 8B config.

Weight-name mapping from HF checkpoints lives in tst/models/hf_load.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    d_head: int
    d_ff: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    qkv_bias: bool = False  # Qwen2 style
    tie_embeddings: bool = False
    max_seq_len: int = 32768
    dtype: Any = jnp.bfloat16
    #: optional RoPE frequency scaling, e.g. Llama-3.1/3.2's
    #: ("llama3", factor, low_freq_factor, high_freq_factor, original_ctx) —
    #: a hashable tuple (the frozen spec doubles as a jit cache key)
    rope_scaling: Optional[tuple] = None

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.d_head

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.d_head


_SPECS: Dict[str, ModelSpec] = {
    # test-scale model; byte-tokenizer vocab
    "tiny": ModelSpec("tiny", vocab_size=384, d_model=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, d_head=16, d_ff=128, tie_embeddings=True),
    # slightly bigger CPU-integration scale
    "small": ModelSpec("small", vocab_size=384, d_model=128, n_layers=4, n_heads=8,
                       n_kv_heads=4, d_head=16, d_ff=512, tie_embeddings=True),
    # HF Qwen/Qwen2.5-0.5B-Instruct geometry (BASELINE.json config 2)
    "qwen2.5-0.5b": ModelSpec("qwen2.5-0.5b", vocab_size=151936, d_model=896,
                              n_layers=24, n_heads=14, n_kv_heads=2, d_head=64,
                              d_ff=4864, rope_theta=1000000.0, qkv_bias=True,
                              tie_embeddings=True),
    # HF Qwen/Qwen2.5-1.5B(-Instruct) geometry
    "qwen2.5-1.5b": ModelSpec("qwen2.5-1.5b", vocab_size=151936, d_model=1536,
                              n_layers=28, n_heads=12, n_kv_heads=2, d_head=128,
                              d_ff=8960, rope_theta=1000000.0, qkv_bias=True,
                              tie_embeddings=True),
    # HF Qwen/Qwen2.5-3B(-Instruct) geometry
    "qwen2.5-3b": ModelSpec("qwen2.5-3b", vocab_size=151936, d_model=2048,
                            n_layers=36, n_heads=16, n_kv_heads=2, d_head=128,
                            d_ff=11008, rope_theta=1000000.0, qkv_bias=True,
                            tie_embeddings=True),
    # HF Qwen/Qwen2.5-7B(-Instruct) geometry (untied lm_head)
    "qwen2.5-7b": ModelSpec("qwen2.5-7b", vocab_size=152064, d_model=3584,
                            n_layers=28, n_heads=28, n_kv_heads=4, d_head=128,
                            d_ff=18944, rope_theta=1000000.0, qkv_bias=True),
    # HF meta-llama/Meta-Llama-3-8B geometry (BASELINE.json configs 3/5)
    "llama3-8b": ModelSpec("llama3-8b", vocab_size=128256, d_model=4096,
                           n_layers=32, n_heads=32, n_kv_heads=8, d_head=128,
                           d_ff=14336, rope_theta=500000.0, rms_eps=1e-5),
    # HF meta-llama/Llama-3.1-8B geometry: Llama-3-8B + llama3 rope scaling
    "llama3.1-8b": ModelSpec("llama3.1-8b", vocab_size=128256, d_model=4096,
                             n_layers=32, n_heads=32, n_kv_heads=8, d_head=128,
                             d_ff=14336, rope_theta=500000.0, rms_eps=1e-5,
                             rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192)),
    # HF meta-llama/Llama-3.2-1B geometry (tied embeddings)
    "llama3.2-1b": ModelSpec("llama3.2-1b", vocab_size=128256, d_model=2048,
                             n_layers=16, n_heads=32, n_kv_heads=8, d_head=64,
                             d_ff=8192, rope_theta=500000.0, rms_eps=1e-5,
                             tie_embeddings=True,
                             rope_scaling=("llama3", 32.0, 1.0, 4.0, 8192)),
    # HF meta-llama/Llama-3.2-3B geometry (tied embeddings)
    "llama3.2-3b": ModelSpec("llama3.2-3b", vocab_size=128256, d_model=3072,
                             n_layers=28, n_heads=24, n_kv_heads=8, d_head=128,
                             d_ff=8192, rope_theta=500000.0, rms_eps=1e-5,
                             tie_embeddings=True,
                             rope_scaling=("llama3", 32.0, 1.0, 4.0, 8192)),
}


def spec_by_name(name: str, **overrides) -> ModelSpec:
    if name not in _SPECS:
        raise KeyError(f"unknown model {name!r}; have {sorted(_SPECS)}")
    spec = _SPECS[name]
    return dataclasses.replace(spec, **overrides) if overrides else spec


#: stable per-projection ids for LoRA-dropout rng folding
_PROJ_IDS = {n: i for i, n in enumerate(
    ("q", "k", "v", "o", "gate", "up", "down"))}

#: Logical sharding axes per parameter path (mesh rules live in runtime/mesh.py).
#: Convention: linear weights are stored [in, out] ("x @ w" orientation).
PARAM_AXES: Dict[str, tuple] = {
    "embed": ("vocab", "embed"),
    "final_norm": (None,),
    "lm_head": ("embed", "vocab"),
    "layers.attn_norm": ("layer", None),
    "layers.wq": ("layer", "embed", "heads"),
    "layers.wk": ("layer", "embed", "heads"),
    "layers.wv": ("layer", "embed", "heads"),
    "layers.wo": ("layer", "heads", "embed"),
    "layers.bq": ("layer", "heads"),
    "layers.bk": ("layer", "heads"),
    "layers.bv": ("layer", "heads"),
    "layers.mlp_norm": ("layer", None),
    "layers.w_gate": ("layer", "embed", "ffn"),
    "layers.w_up": ("layer", "embed", "ffn"),
    "layers.w_down": ("layer", "ffn", "embed"),
}


def init_params(rng: jax.Array, spec: ModelSpec, quantize: bool = False,
                bits: int = 8) -> Params:
    """Random init (scaled normal), used for tests and as the load target.

    ``quantize=True`` converts each big matrix to int8 (or, with ``bits=4``,
    RTN-g128 int4 for the stacked layer matrices — embed/lm_head stay int8,
    see tst.models.quant.leaf_bits) the moment it is created, so the
    full-precision tree never exists at once (an 8B bf16 tree alone exceeds
    a single v5e's HBM)."""
    k_embed, k_layers, k_head = jax.random.split(rng, 3)
    d, L = spec.d_model, spec.n_layers
    dt = spec.dtype

    def norm_init(shape):
        return jnp.ones(shape, dt)

    def dense(key, shape, fan_in, name):
        if not quantize:
            return (jax.random.normal(key, shape, jnp.float32) / np.sqrt(fan_in)).astype(dt)
        # quantized init: generate + quantize layer-by-layer so neither the
        # f32 RNG transient nor a full-precision stack ever materializes
        from tst.models.quant import leaf_bits, quantize_leaf

        b = leaf_bits(name, bits)
        if len(shape) == 3:
            parts = [
                quantize_leaf(
                    (jax.random.normal(k, shape[1:], jnp.float32) / np.sqrt(fan_in)).astype(dt),
                    bits=b,
                )
                for k in jax.random.split(key, shape[0])
            ]
            return {
                "q": jnp.stack([p["q"] for p in parts]),
                "scale": jnp.stack([p["scale"] for p in parts]),
            }
        return quantize_leaf(
            (jax.random.normal(key, shape, jnp.float32) / np.sqrt(fan_in)).astype(dt),
            bits=b,
        )

    ks = jax.random.split(k_layers, 7)
    layers = {
        "attn_norm": norm_init((L, d)),
        "wq": dense(ks[0], (L, d, spec.q_dim), d, "wq"),
        "wk": dense(ks[1], (L, d, spec.kv_dim), d, "wk"),
        "wv": dense(ks[2], (L, d, spec.kv_dim), d, "wv"),
        "wo": dense(ks[3], (L, spec.q_dim, d), spec.q_dim, "wo"),
        "mlp_norm": norm_init((L, d)),
        "w_gate": dense(ks[4], (L, d, spec.d_ff), d, "w_gate"),
        "w_up": dense(ks[5], (L, d, spec.d_ff), d, "w_up"),
        "w_down": dense(ks[6], (L, spec.d_ff, d), spec.d_ff, "w_down"),
    }
    if spec.qkv_bias:
        layers["bq"] = jnp.zeros((L, spec.q_dim), dt)
        layers["bk"] = jnp.zeros((L, spec.kv_dim), dt)
        layers["bv"] = jnp.zeros((L, spec.kv_dim), dt)
    params: Params = {
        "embed": dense(k_embed, (spec.vocab_size, d), d, "embed"),
        "layers": layers,
        "final_norm": norm_init((d,)),
    }
    if not spec.tie_embeddings:
        params["lm_head"] = dense(k_head, (d, spec.vocab_size), d, "lm_head")
    return params


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """f32 statistics, output in x.dtype (keeps the scan carry bf16)."""
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale * weight.astype(jnp.float32)).astype(x.dtype)


def rope_tables(seq_len: int, d_head: int, theta: float,
                scaling: Optional[tuple] = None) -> tuple:
    """cos/sin tables [S, d_head//2] — HF "split-half" RoPE convention.

    ``scaling``: optional frequency-scaling rule. The Llama-3.1/3.2 family
    ships ``rope_type="llama3"`` — low-frequency bands are slowed by
    ``factor``, high-frequency bands kept, the middle smoothly interpolated
    (matches HF transformers ``_compute_llama3_parameters``). Encoded as the
    hashable tuple ("llama3", factor, low_freq_factor, high_freq_factor,
    original_max_position_embeddings) so ModelSpec stays usable as a jit
    static / cache key.
    """
    inv_freq = 1.0 / (theta ** (np.arange(0, d_head, 2, dtype=np.float64) / d_head))
    if scaling is not None:
        kind, factor, low_f, high_f, orig_ctx = scaling
        if kind != "llama3":
            raise ValueError(f"unknown rope scaling {kind!r}")
        wavelen = 2.0 * np.pi / inv_freq
        low_wl = orig_ctx / low_f
        high_wl = orig_ctx / high_f
        smooth = (orig_ctx / wavelen - low_f) / (high_f - low_f)
        smoothed = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = np.where(wavelen > low_wl, inv_freq / factor,
                            np.where(wavelen < high_wl, inv_freq, smoothed))
    pos = np.arange(seq_len, dtype=np.float64)
    angles = np.outer(pos, inv_freq)  # [S, d_head/2]
    return jnp.asarray(np.cos(angles), jnp.float32), jnp.asarray(np.sin(angles), jnp.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, dh]; rotate the two halves (HF non-interleaved layout).

    cos/sin: [S, dh/2] shared tables, or [B, S, dh/2] per-row tables (packed
    sequences gather them at per-segment-restarted positions)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    if cos.ndim == 2:
        c = cos[None, :, None, :].astype(x.dtype)
        s = sin[None, :, None, :].astype(x.dtype)
    else:
        c = cos[:, :, None, :].astype(x.dtype)
        s = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _remat_policy(remat):
    """Map a ``remat`` config value to a jax.checkpoint policy (None = save
    nothing, i.e. full remat)."""
    cp = jax.checkpoint_policies
    if remat in (True, "full"):
        return None
    if remat == "dots":
        return cp.dots_saveable
    if remat == "dots_attn":
        return cp.save_from_both_policies(
            cp.dots_saveable, cp.save_only_these_names("attn_out"))
    if remat == "light":
        return cp.save_anything_except_these_names(
            "mlp_gate", "mlp_up", "mlp_act")
    if remat == "dots_flash":
        # dots + the flash kernel's (output, logsumexp) residuals — the only
        # non-dot values the attention backward needs. Kills the per-layer
        # flash-forward re-run that "dots"/"dots_attn" pay (the residuals
        # are named inside the kernel's custom_vjp forward).
        return cp.save_from_both_policies(
            cp.dots_saveable,
            cp.save_only_these_names("flash_out", "flash_lse"))
    if remat == "attn":
        # long-sequence mode: save ONLY the attention tensors — the flash
        # kernel's inputs (post-RoPE q/k, v), its residuals (output +
        # logsumexp: without these the backward re-runs the forward kernel),
        # and the reshaped attention output. Recomputes the MLP and
        # projections; ~2x q_dim + kv_dim per token/layer of saved bytes vs
        # "dots"' 2x d_ff — the only policy between "full" and "dots" that
        # fits 16k sequences.
        return cp.save_only_these_names(
            "q_rope", "k_rope", "v_proj", "attn_out",
            "flash_out", "flash_lse")
    if remat == "flash":
        # 32k mode: full remat EXCEPT the flash kernel's own residuals.
        # At long sequence the quadratic attention kernel dominates layer
        # FLOPs, so its forward re-run is the expensive part of full remat —
        # but "attn"'s q/k/v + attn_out saves (~414 MB/layer at 32k) no
        # longer fit HBM. Saving only (flash_out, flash_lse) (~146 MB/layer)
        # skips the kernel re-run while projections/RoPE/MLP recompute like
        # full remat. (attn_out is NOT saved: it is a cheap transpose of
        # flash_out, and saving both would double the big buffer.)
        return cp.save_only_these_names("flash_out", "flash_lse")
    raise ValueError(f"unknown remat mode {remat!r}; use True/'full', "
                     "'dots', 'dots_attn', 'dots_flash', 'light', 'attn', "
                     "or 'flash'")


def _dense_attention(q, k, v, causal_mask):
    """XLA fallback attention. q: [B,S,H,dh]; k/v: [B,S,K,dh] (GQA).
    ``causal_mask``: [S, S] shared, or [B, S, S] per-row (packed segments)."""
    b, s, h, dh = q.shape
    kv_heads = k.shape[2]
    groups = h // kv_heads
    qg = q.reshape(b, s, kv_heads, groups, dh)
    scores = jnp.einsum("bqkgd,bskd->bkgqs", qg, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    mask = (causal_mask[None, None, None, :, :] if causal_mask.ndim == 2
            else causal_mask[:, None, None, :, :])
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, s, h, dh).astype(q.dtype)


def _flash_attention(q, k, v, seg_starts=None):
    from tst.kernels.flash_attention import flash_attention

    return flash_attention(q, k, v, causal=True, seg_starts=seg_starts)


#: layer-scan unroll factor (lax.scan unroll=). >1 gives XLA a window of
#: consecutive layers to schedule across — in particular the remat-save
#: dynamic-update-slice writes (the "dots" policy stacks ~130 MB/layer of
#: saved activations; profiled at ~1 ms/layer of DUS fusions). Read at
#: TRACE time — clear tst.train.sft._STEP_CACHE when flipping mid-process.
SCAN_UNROLL = 1

#: layer-loop strategy: "scan" (one lax.scan over stacked layer params — one
#: compiled body, stacked remat saves written via dynamic-update-slice) or
#: "unroll" (a Python loop over static layer indices — n_layers copies of the
#: body in the HLO, but each layer's remat saves are INDIVIDUAL buffers XLA
#: can fuse into their producing matmuls, removing the ~1 ms/layer DUS
#: double-write the scan pays under remat; see docs/RESULTS.md round 3).
#: Read at TRACE time — clear tst.train.sft._STEP_CACHE when flipping.
LAYER_LOOP = "scan"


def apply_model(
    params: Params,
    tokens: jnp.ndarray,  # int32 [B, S]
    spec: ModelSpec,
    lora: Optional[Params] = None,
    lora_spec=None,
    use_pallas: bool = False,
    remat: bool = False,
    return_hidden: bool = False,
    return_kv: bool = False,
    fused_mlp: bool = False,
    ring_mesh=None,
    ring_axis: str = "seq",
    lora_rng: Optional[jax.Array] = None,
    seg_starts: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Forward pass → logits f32 [B, S, V].

    ``seg_starts``: optional int32 [B, n_segs] packed-sequence segment start
    offsets (tst.data.packing; unused slots >= SEG_PAD). Attention is
    confined to each token's own segment and RoPE positions restart at each
    segment start, so a packed row is numerically a batch of independent
    samples (tests/test_packing.py pins this).

    ``lora``: optional adapter pytree from tst.models.lora, applied inside
    the layer scan (stacked on the same leading layer axis).

    ``return_hidden=True`` returns the final-norm hidden states [B, S, D]
    *before* the vocabulary projection — callers that only need logits at a
    few positions (answer-token loss, MCQ scoring) project a gathered window
    themselves instead of materializing [B, S, V] f32 (HBM-bandwidth win;
    the vocab matmul is the single largest activation in the program).

    ``return_kv=True`` additionally returns the post-RoPE per-layer K/V
    ([L, B, S, KVH, dh] each) — the prefill leg of KV-cached greedy decoding
    (tst.models.decode, for numeric/open answers).
    """
    b, s = tokens.shape
    x = embed_lookup(params, tokens, spec)  # [B, S, D]
    cos, sin = rope_tables(s, spec.d_head, spec.rope_theta, spec.rope_scaling)
    if seg_starts is not None:
        if ring_mesh is not None and ring_mesh.shape.get(ring_axis, 1) > 1:
            raise ValueError("packed sequences (seg_starts) and ring "
                             "attention are mutually exclusive — packing is "
                             "for short rows, the ring for long ones")
        from tst.kernels.flash_attention import (segment_mask,
                                                 segment_starts_per_pos)

        seg_starts = jnp.asarray(seg_starts, jnp.int32)
        # per-segment-restarted positions: RoPE sees each sample at offset 0
        positions = (jnp.arange(s, dtype=jnp.int32)[None, :]
                     - segment_starts_per_pos(seg_starts, s))  # [B, S]
        cos, sin = cos[positions], sin[positions]  # [B, S, dh/2]
        causal = segment_mask(seg_starts, s)  # [B, S, S]
    else:
        causal = jnp.tril(jnp.ones((s, s), bool))

    from tst.models.lora import apply_lora_delta  # circular-safe local import

    def layer_body(carry, scanned):
        h_in = carry
        lw = scanned["w"]
        la = scanned.get("lora")
        layer_rng = scanned.get("lora_rng")

        def proj(name, y, w_key):
            # bf16-out dot == f32-out dot + astype ON TPU (the MXU always
            # accumulates f32 internally; output rounds once either way) but
            # the remat-saved value is half the bytes — the dominant HBM
            # write at 0.5B (profiled: two f32 [B,S,d_ff] saves = 24 ms/step).
            # NB TPU-only assumption: other XLA backends may legally
            # accumulate a bf16-out dot in reduced precision.
            # qdot: packed-int4 leaves split into two planar-half dots so
            # the dequant fuses (tst.models.quant); plain/int8 leaves take
            # the ordinary fused-dequant einsum.
            out = _qdot(y, lw[w_key], spec.dtype)
            if la is not None and name in la:
                rng = None
                if layer_rng is not None:
                    # distinct mask per projection, deterministic in
                    # (step, layer, projection)
                    rng = jax.random.fold_in(layer_rng, _PROJ_IDS[name])
                out = out + apply_lora_delta(la[name], y, lora_spec, rng=rng)
            bias_key = {"q": "bq", "k": "bk", "v": "bv"}.get(name)
            if bias_key and bias_key in lw:
                out = out + lw[bias_key].astype(spec.dtype)
            return out

        # attention
        h = rms_norm(h_in, lw["attn_norm"], spec.rms_eps)
        q = proj("q", h, "wq").reshape(b, s, spec.n_heads, spec.d_head)
        k = proj("k", h, "wk").reshape(b, s, spec.n_kv_heads, spec.d_head)
        v = proj("v", h, "wv").reshape(b, s, spec.n_kv_heads, spec.d_head)
        q = checkpoint_name(apply_rope(q, cos, sin), "q_rope")
        k = checkpoint_name(apply_rope(k, cos, sin), "k_rope")
        v = checkpoint_name(v, "v_proj")
        if ring_mesh is not None and ring_mesh.shape.get(ring_axis, 1) > 1:
            # sequence-parallel path: ring attention over the seq mesh axis
            from tst.kernels.ring_attention import ring_attention

            attn = ring_attention(q, k, v, ring_mesh, seq_axis=ring_axis,
                                  causal=True)
        elif use_pallas:
            attn = _flash_attention(q, k, v, seg_starts=seg_starts)
        else:
            attn = _dense_attention(q, k, v, causal)
        attn = checkpoint_name(attn.reshape(b, s, spec.q_dim), "attn_out")
        o = proj("o", attn, "wo")
        h_mid = h_in + o
        # MLP (SwiGLU). The fused Pallas kernel applies only when no LoRA
        # adapter targets the MLP (adapters on gate/up change the hidden
        # nonlinearly and cannot be added post hoc); qkvo-only LoRA — the
        # default — takes the fused path.
        h = rms_norm(h_mid, lw["mlp_norm"], spec.rms_eps)
        mlp_lora = la is not None and any(t in la for t in ("gate", "up", "down"))
        if use_pallas is True and fused_mlp and not mlp_lora:
            from tst.kernels.fused_mlp import fused_swiglu_mlp

            down = fused_swiglu_mlp(
                h, _w(lw["w_gate"], spec.dtype), _w(lw["w_up"], spec.dtype),
                _w(lw["w_down"], spec.dtype),
            )
        else:
            gate = checkpoint_name(proj("gate", h, "w_gate"), "mlp_gate")
            up = checkpoint_name(proj("up", h, "w_up"), "mlp_up")
            act = checkpoint_name(
                jax.nn.silu(gate.astype(jnp.float32)).astype(spec.dtype) * up,
                "mlp_act")
            down = proj("down", act, "w_down")
        ys = (k, v) if return_kv else None
        return h_mid + down, ys

    body = layer_body
    if remat:
        # remat=True/"full": save only layer boundaries (max memory savings).
        # remat="dots": save matmul outputs, recompute elementwise-only ops —
        # much cheaper backward than full remat, still avoids the big
        # silu/up-product and norm intermediates. NB: the Pallas flash output
        # is NOT a dot_general, so "dots" recomputes the flash forward in the
        # backward pass.
        # remat="dots_attn": dots + the reshaped attention output (saves the
        # o-projection's input; the flash kernel still re-runs in backward —
        # its residuals are only saved by "dots_flash").
        # remat="light": save every intermediate EXCEPT the [S, d_ff] MLP
        # hiddens (~77% of dots-saved bytes at Qwen-0.5B geometry); backward
        # re-runs only the gate/up matmuls + silu.
        body = jax.checkpoint(layer_body, prevent_cse=False,
                              policy=_remat_policy(remat))

    scanned = {"w": params["layers"]}
    if lora is not None:
        scanned["lora"] = lora
        if lora_rng is not None and getattr(lora_spec, "dropout", 0.0) > 0.0:
            scanned["lora_rng"] = jax.random.split(lora_rng, spec.n_layers)
    if LAYER_LOOP == "unroll":
        ks, vs = [], []
        for i in range(spec.n_layers):
            sl = jax.tree.map(lambda a, _i=i: a[_i], scanned)
            x, ys = body(x, sl)
            if return_kv:
                ks.append(ys[0])
                vs.append(ys[1])
        kv = (jnp.stack(ks), jnp.stack(vs)) if return_kv else (None, None)
    else:
        x, kv = jax.lax.scan(body, x, scanned, unroll=SCAN_UNROLL)

    x = rms_norm(x, params["final_norm"], spec.rms_eps)
    if return_kv:
        return x, kv[0], kv[1]
    if return_hidden:
        return x
    logits = jnp.einsum("bsd,dv->bsv", x, lm_head_weight(params, spec).astype(spec.dtype),
                        preferred_element_type=jnp.float32)
    return logits


def _is_q(leaf) -> bool:
    from tst.models.quant import is_quantized_leaf

    return is_quantized_leaf(leaf)


def _w(leaf, dtype) -> jnp.ndarray:
    """Materialize a (possibly int8-quantized) weight in the working dtype.

    For quantized leaves the dequant multiply fuses into the consuming
    matmul's prologue — no persistent bf16 copy (tst.models.quant)."""
    from tst.models.quant import dequantize_leaf

    return dequantize_leaf(leaf, dtype)


def _qdot(y, leaf, dtype, preferred=None) -> jnp.ndarray:
    """y @ W for plain / int8 / packed-int4 weight leaves (tst.models.quant:
    packed leaves run one fused dot per planar nibble half)."""
    from tst.models.quant import qdot

    return qdot(y, leaf, dtype, preferred=preferred)


def embed_lookup(params: Params, tokens: jnp.ndarray, spec: ModelSpec) -> jnp.ndarray:
    """Token embedding gather, quantization-aware: int8 rows are gathered
    first and only the gathered rows dequantized."""
    embed = params["embed"]
    if _is_q(embed):
        x = embed["q"][tokens].astype(jnp.float32) * embed["scale"][0]
        return x.astype(spec.dtype)
    return embed.astype(spec.dtype)[tokens]


def lm_head_weight(params: Params, spec: ModelSpec) -> jnp.ndarray:
    """[D, V] vocabulary projection (embed transpose when tied)."""
    if spec.tie_embeddings:
        embed = params["embed"]
        return _w(embed, spec.dtype).T if _is_q(embed) else embed.T
    return _w(params["lm_head"], spec.dtype) if _is_q(params["lm_head"]) else params["lm_head"]


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
