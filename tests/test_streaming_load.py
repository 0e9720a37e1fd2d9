"""Streaming HF checkpoint load: peak host RSS ≈ one tensor (VERDICT r1
item 7). The loader must never accumulate full-model f32 host stacks —
layer tensors stream to preallocated device buffers one by one.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_checkpoint(path, *, d=1024, L=12, H=16, KV=4, dh=64, F=4096,
                      V=32000, shards=3):
    """Multi-shard Llama-geometry safetensors checkpoint (f16 on disk,
    ~0.55 GB) with an index file, written layer by layer."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(0)

    def mat(r, c):
        # low-rank plus noise is cheap to generate at this size
        return (rng.normal(size=(r, c)) * 0.02).astype(np.float16)

    weight_map = {}
    shard_sds = [dict() for _ in range(shards)]

    def put(name, arr, shard):
        shard_sds[shard][name] = arr
        weight_map[name] = f"model-{shard:05d}.safetensors"

    put("model.embed_tokens.weight", mat(V, d), 0)
    put("model.norm.weight", np.ones(d, np.float16), shards - 1)
    put("lm_head.weight", mat(V, d), shards - 1)
    for i in range(L):
        s = min(i * shards // L, shards - 1)
        pre = f"model.layers.{i}."
        put(pre + "input_layernorm.weight", np.ones(d, np.float16), s)
        put(pre + "post_attention_layernorm.weight", np.ones(d, np.float16), s)
        put(pre + "self_attn.q_proj.weight", mat(H * dh, d), s)
        put(pre + "self_attn.k_proj.weight", mat(KV * dh, d), s)
        put(pre + "self_attn.v_proj.weight", mat(KV * dh, d), s)
        put(pre + "self_attn.o_proj.weight", mat(d, H * dh), s)
        put(pre + "mlp.gate_proj.weight", mat(F, d), s)
        put(pre + "mlp.up_proj.weight", mat(F, d), s)
        put(pre + "mlp.down_proj.weight", mat(d, F), s)
    for si, sd in enumerate(shard_sds):
        save_file(sd, os.path.join(path, f"model-{si:05d}.safetensors"))
    with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
        json.dump({"weight_map": weight_map}, f)
    cfg = {
        "architectures": ["LlamaForCausalLM"], "vocab_size": V,
        "hidden_size": d, "num_hidden_layers": L, "num_attention_heads": H,
        "num_key_value_heads": KV, "intermediate_size": F,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "tie_word_embeddings": False, "max_position_embeddings": 2048,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    # full-model f32 size: the old accumulate-then-put path's host footprint
    n_params = V * d * 2 + L * (
        2 * d + (H + 2 * KV) * dh * d + d * H * dh + 3 * d * F) + d
    return n_params * 4


_LOAD_SNIPPET = """
import resource, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
import jax.numpy as jnp
from tst.models.hf_load import load_checkpoint, spec_from_hf_config
spec = spec_from_hf_config({ckpt!r}, name="rss-test")
params = load_checkpoint({ckpt!r}, spec, dtype=jnp.float32)
import numpy as np
np.asarray(jax.tree.leaves(params)[0]).sum()  # force materialization
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(json.dumps({{"base_kib": base, "peak_kib": peak,
                   "wq00": float(np.asarray(params["layers"]["wq"][0, 0, :3]).sum())}}))
"""


@pytest.mark.slow
def test_peak_rss_is_one_tensor_not_full_stack(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    full_f32_bytes = _write_checkpoint(ckpt)
    assert full_f32_bytes > 0.9e9  # the geometry is big enough to be a test

    proc = subprocess.run(
        [sys.executable, "-c",
         _LOAD_SNIPPET.format(repo=REPO, ckpt=ckpt)],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    growth_bytes = (out["peak_kib"] - out["base_kib"]) * 1024
    # NB: on CPU the "device" buffers themselves live in host RAM (~1.1 GB
    # f32 model) — that part is real model storage, not loader waste. The
    # old accumulate-everything path additionally held the full f32 host
    # stacks (+1.1 GB => growth ~2.3+ GB). Streaming must stay well below
    # model + 0.35 GB of transients.
    model_bytes = full_f32_bytes
    assert growth_bytes < model_bytes + 0.35e9, (
        f"loader RSS growth {growth_bytes/1e9:.2f} GB suggests host-side "
        f"accumulation (model itself is {model_bytes/1e9:.2f} GB)")


def test_streaming_load_correctness_small(tmp_path):
    """Streamed pytree == reference accumulate-then-convert pytree."""
    from safetensors import safe_open

    import jax.numpy as jnp

    from tst.models.hf_load import load_checkpoint, spec_from_hf_config

    ckpt = str(tmp_path / "ckpt")
    _write_checkpoint(ckpt, d=64, L=3, H=4, KV=2, dh=16, F=128, V=320, shards=2)
    spec = spec_from_hf_config(ckpt, name="small-test")
    params = load_checkpoint(ckpt, spec, dtype=jnp.float32)

    # independent reference read of one tensor per family
    with safe_open(os.path.join(ckpt, "model-00001.safetensors"),
                   framework="numpy") as sf:
        names = list(sf.keys())
        for name in names:
            if ".layers." not in name or "norm" in name:
                continue
            i = int(name.split(".")[2])
            raw = sf.get_tensor(name).astype(np.float32).T
            key = {
                "q_proj": "wq", "k_proj": "wk", "v_proj": "wv",
                "o_proj": "wo", "gate_proj": "w_gate", "up_proj": "w_up",
                "down_proj": "w_down",
            }[name.split(".")[-2]]
            got = np.asarray(params["layers"][key][i])
            np.testing.assert_allclose(got, raw, rtol=1e-6)
