"""Analytic FLOPs accounting for the fold-parallel train step.

Why not XLA's own numbers: ``compiled.cost_analysis()["flops"]`` counts the
body of a ``lax.while``/``lax.scan`` ONCE, not per trip — our scan-over-
layers decoder (tst/models/decoder.py) underreports by ~n_layers (measured
24x on the v5e bench program, while the same API is exact on loop-free
programs). So the bench computes matmul-dominated FLOPs by hand from the
model geometry; the formulas below are the standard 2*m*n*k count.

Conventions:
  * ``model_flops`` — the MFU convention: forward + backward of the MODEL's
    matmuls, NOT counting remat recomputation. With a frozen base (LoRA-only
    training) backward costs one dgrad matmul per base matmul (no wgrad), so
    backward ~= forward, unlike the full-training 2x.
  * ``hardware_flops`` — what the chip actually executes: adds one forward
    recompute under full remat ("dots" policy recomputes only elementwise
    ops — no extra matmuls).
"""

from __future__ import annotations

from typing import Dict

from tst.models.decoder import ModelSpec
from tst.models.lora import LoraSpec

#: d_in/d_out factors per LoRA target, resolved against the spec at call time.


def train_step_flops(
    spec: ModelSpec,
    lora_spec: LoraSpec,
    n_rows: int,
    seq: int,
    t_max: int,
    remat=False,
) -> Dict[str, float]:
    """FLOPs of one fold-parallel train step over ``n_rows`` sequences.

    n_rows = k * batch_per_fold (every fold's rows run the same program).
    """
    d, q, kv = spec.d_model, spec.q_dim, spec.n_kv_heads * spec.d_head
    f, L, v = spec.d_ff, spec.n_layers, spec.vocab_size
    tokens = n_rows * seq

    # per-token per-layer matmul params: qkvo + SwiGLU gate/up/down
    m_layer = 2 * d * q + 2 * d * kv + 3 * d * f
    fwd_matmul = 2.0 * m_layer * L * tokens

    # causal attention: qk^T and pv, each 2*S*(H*dh) per token, half masked
    attn_fwd = 2.0 * 2 * q * seq * 0.5 * tokens
    # flash backward recomputes probabilities and runs dQ/dKV/dV ~ 2.5x fwd
    attn_bwd = 2.5 * attn_fwd

    # LoRA adapters: fwd + dgrad + wgrad (adapters DO take weight grads)
    lora_dims = {"q_proj": (d, q), "k_proj": (d, kv), "v_proj": (d, kv),
                 "o_proj": (q, d), "gate_proj": (d, f), "up_proj": (d, f),
                 "down_proj": (f, d)}
    r = lora_spec.rank
    m_lora = sum(r * (lora_dims[t][0] + lora_dims[t][1])
                 for t in lora_spec.targets if t in lora_dims)
    lora_flops = 3 * 2.0 * m_lora * L * tokens

    # answer-window head: t_max positions per row, fwd + dgrad
    head_flops = 2 * 2.0 * d * v * t_max * n_rows

    model = (2 * fwd_matmul        # fwd + dgrad (frozen base: no wgrad)
             + attn_fwd + attn_bwd + lora_flops + head_flops)
    hardware = model
    if remat is True:  # full remat: one extra forward during backward
        hardware = model + fwd_matmul + attn_fwd
    elif remat in ("dots", "dots_attn"):
        # dots saves matmul outputs but NOT the Pallas flash residuals
        # (o/lse are not dot_generals) — the flash forward re-runs during
        # backward. "dots_attn" additionally saves the reshaped attention
        # output, which helps the o-proj grad but does NOT avoid the kernel
        # re-run (only "dots_flash" saves the residuals).
        hardware = model + attn_fwd
    elif remat == "light":
        # save-all-but-MLP-hiddens: backward re-runs gate/up matmuls + silu
        hardware = model + 2.0 * (2 * d * f) * L * tokens
    elif remat == "attn":
        # saves q/k/v + flash residuals (no kernel re-run); backward re-runs
        # the o-projection and the MLP matmuls
        hardware = model + 2.0 * (d * q + 3 * d * f) * L * tokens
    # "dots_flash" and False recompute no matmuls and no flash kernels
    return {"model_flops": model, "hardware_flops": hardware,
            "fwd_flops": fwd_matmul + attn_fwd}
