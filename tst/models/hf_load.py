"""HF checkpoint → stacked-layer sharded pytree loading.

SURVEY.md §7 hard part 2: load an 8B HF checkpoint without host OOM by
streaming tensor-by-tensor (safetensors lazy slices): each layer tensor is
converted/quantized/sharded on arrival and written into a preallocated
stacked DEVICE buffer via a donated in-place update — host never holds more
than one tensor.

Name mapping covers the Llama/Qwen2 families (``LlamaForCausalLM`` /
``Qwen2ForCausalLM``). Our convention: linear weights are [in, out]
(HF stores [out, in] — transposed on load); per-layer weights stack on a
leading layer axis to match the decoder's ``lax.scan``.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tst.models.decoder import ModelSpec, Params

#: HF tensor name templates → (our path, needs_transpose). {i} = layer index.
_LAYER_MAP = {
    "model.layers.{i}.input_layernorm.weight": ("attn_norm", False),
    "model.layers.{i}.self_attn.q_proj.weight": ("wq", True),
    "model.layers.{i}.self_attn.k_proj.weight": ("wk", True),
    "model.layers.{i}.self_attn.v_proj.weight": ("wv", True),
    "model.layers.{i}.self_attn.o_proj.weight": ("wo", True),
    "model.layers.{i}.self_attn.q_proj.bias": ("bq", False),
    "model.layers.{i}.self_attn.k_proj.bias": ("bk", False),
    "model.layers.{i}.self_attn.v_proj.bias": ("bv", False),
    "model.layers.{i}.post_attention_layernorm.weight": ("mlp_norm", False),
    "model.layers.{i}.mlp.gate_proj.weight": ("w_gate", True),
    "model.layers.{i}.mlp.up_proj.weight": ("w_up", True),
    "model.layers.{i}.mlp.down_proj.weight": ("w_down", True),
}
_TOP_MAP = {
    "model.embed_tokens.weight": ("embed", False),
    "model.norm.weight": ("final_norm", False),
    "lm_head.weight": ("lm_head", True),
}


def _to_numpy(t) -> np.ndarray:
    """torch tensor / np array / jnp array → np array (bf16 → f32)."""
    if isinstance(t, np.ndarray):
        return t
    if isinstance(t, jnp.ndarray):
        return np.asarray(t.astype(jnp.float32) if t.dtype == jnp.bfloat16 else t)
    # torch tensor without importing torch at module level
    if hasattr(t, "detach"):
        t = t.detach()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    return np.asarray(t)


def _stacked_zeros_like(slice_leaf, n_layers: int):
    """Device-allocated [L, ...] zeros matching a [1, ...] slice's dtype and
    sharding — built under jit with out_shardings so no host-side full-size
    buffer ever exists."""

    def alloc(s):
        shape = (n_layers,) + tuple(s.shape[1:])
        return jax.jit(lambda: jnp.zeros(shape, s.dtype),
                       out_shardings=s.sharding)()

    return jax.tree.map(alloc, slice_leaf)


#: buf[i] = sl[0]; the stacked buffer is donated so XLA writes in place
#: (jit caches one program per leaf shape/dtype/sharding; i stays traced so
#: L layers share one program per family)
_write_layer_slice = jax.jit(
    lambda buf, sl, i: jax.lax.dynamic_update_index_in_dim(buf, sl[0], i, 0),
    donate_argnums=0,
)


def convert_state_dict(
    sd: Mapping[str, Any],
    spec: ModelSpec,
    dtype=None,
    put: Optional[Callable[[str, np.ndarray], jax.Array]] = None,
) -> Params:
    """Convert an HF state dict (name → tensor) to our pytree, STREAMING:
    each per-layer tensor is converted/quantized/sharded by ``put`` as a
    [1, ...] slice the moment it arrives and written into a preallocated
    stacked device buffer (donated dynamic_update_index_in_dim) — peak host
    memory is ONE tensor, never a full-model f32 stack (VERDICT r1 item 7;
    an 8B all-family f32 host stack is ~30 GB).

    ``put(path, array)`` lets callers control placement/sharding per leaf;
    default is plain jnp.asarray. For stacked layer families it receives
    [1, ...] slices (same rank as the stacked leaf, so sharding specs apply
    unchanged).
    """
    dt = dtype or spec.dtype
    put = put or (lambda path, a: jnp.asarray(a, dt))
    L = spec.n_layers

    layers_dev: Dict[str, Any] = {}

    def write_layer(key: str, i: int, a: np.ndarray) -> None:
        sl = put(f"layers.{key}", a[None])  # convert/quantize/shard one layer
        if key not in layers_dev:
            layers_dev[key] = _stacked_zeros_like(sl, L)
        layers_dev[key] = jax.tree.map(
            lambda buf, s: _write_layer_slice(buf, s, i), layers_dev[key], sl)

    params: Params = {}
    for name, tensor in sd.items():
        if name == "lm_head.weight" and spec.tie_embeddings:
            continue  # tied checkpoints reuse embed; don't transpose/quantize it
        hit = _TOP_MAP.get(name)
        if hit:
            path, transpose = hit
            a = _to_numpy(tensor)
            params[path] = put(path, a.T if transpose else a)
            continue
        parts = name.split(".")
        if len(parts) > 2 and parts[1] == "layers":
            i = int(parts[2])
            template = ".".join(parts[:2] + ["{i}"] + parts[3:])
            hit = _LAYER_MAP.get(template)
            if hit is None:
                continue  # e.g. rotary inv_freq buffers
            key, transpose = hit
            a = _to_numpy(tensor)
            write_layer(key, i, a.T if transpose else a)
    params["layers"] = {k: layers_dev[k] for k in sorted(layers_dev)}
    _check_shapes(params, spec)
    return params


def _leaf_shape(leaf) -> tuple:
    """Logical (pre-quantization) shape of a plain or quantized leaf —
    packed-int4 leaves store in/2 rows, so q.shape alone would be wrong."""
    from tst.models.quant import leaf_logical_shape

    return leaf_logical_shape(leaf)


def _check_shapes(params: Params, spec: ModelSpec) -> None:
    expect = {
        "embed": (spec.vocab_size, spec.d_model),
        "final_norm": (spec.d_model,),
    }
    for k, shape in expect.items():
        got = _leaf_shape(params[k])
        if got != shape:
            raise ValueError(f"{k}: shape {got} != spec {shape}")
    wq = _leaf_shape(params["layers"]["wq"])
    if wq != (spec.n_layers, spec.d_model, spec.q_dim):
        raise ValueError(f"wq: {wq} != {(spec.n_layers, spec.d_model, spec.q_dim)}")
    if spec.qkv_bias and "bq" not in params["layers"]:
        raise ValueError("spec expects qkv biases but checkpoint has none")


def load_checkpoint(
    ckpt_dir: str,
    spec: ModelSpec,
    dtype=None,
    put: Optional[Callable[[str, np.ndarray], jax.Array]] = None,
) -> Params:
    """Stream a safetensors checkpoint directory into the param pytree.

    Handles single-file and sharded (``model.safetensors.index.json``)
    layouts. Tensors are read lazily one at a time and streamed straight to
    device buffers — peak host memory is ONE tensor (asserted by
    tests/test_streaming_load.py), never the whole checkpoint.
    """
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(ckpt_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {ckpt_dir}")

    class _LazySD(Mapping):
        def __init__(self):
            self._index: Dict[str, str] = {}
            for f in files:
                with safe_open(f, framework="numpy") as sf:
                    for name in sf.keys():
                        self._index[name] = f

        def __getitem__(self, name):
            with safe_open(self._index[name], framework="flax") as sf:
                return sf.get_tensor(name)

        def __iter__(self):
            return iter(self._index)

        def __len__(self):
            return len(self._index)

        def items(self):
            for name in self._index:
                yield name, self[name]

    return convert_state_dict(_LazySD(), spec, dtype=dtype, put=put)


def spec_from_hf_config(ckpt_dir: str, name: str = "custom") -> ModelSpec:
    """Build a ModelSpec from an HF ``config.json`` (local dir)."""
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        cfg = json.load(f)
    arch = (cfg.get("architectures") or ["?"])[0]
    rs = cfg.get("rope_scaling")
    rope_scaling = None
    if rs:
        kind = rs.get("rope_type", rs.get("type"))
        if kind != "llama3":
            raise ValueError(f"unsupported rope_scaling type {kind!r} "
                             "(supported: llama3)")
        rope_scaling = (
            "llama3", float(rs["factor"]), float(rs["low_freq_factor"]),
            float(rs["high_freq_factor"]),
            int(rs["original_max_position_embeddings"]),
        )
    return ModelSpec(
        name=name,
        vocab_size=cfg["vocab_size"],
        d_model=cfg["hidden_size"],
        n_layers=cfg["num_hidden_layers"],
        n_heads=cfg["num_attention_heads"],
        n_kv_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
        d_head=cfg.get("head_dim", cfg["hidden_size"] // cfg["num_attention_heads"]),
        d_ff=cfg["intermediate_size"],
        rope_theta=cfg.get("rope_theta", 10000.0),
        rms_eps=cfg.get("rms_norm_eps", 1e-6),
        qkv_bias="Qwen2" in arch,
        tie_embeddings=cfg.get("tie_word_embeddings", False),
        max_seq_len=cfg.get("max_position_embeddings", 32768),
        rope_scaling=rope_scaling,
    )
