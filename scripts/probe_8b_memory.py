"""Probe: where does the 8B k=5 full-remat program's HBM actually go?

The bench (docs/RESULTS.md) measures the 8B int8 k=5 full-remat train step
at 15.73 GB compiled memory, but analytic accounting (base 8.04 GB + scan
carry saves + backward working set at M=2560 tokens) lands near ~10 GB.
Hypothesis: XLA hoists loop-invariant weight dequantization out of the
layer scan under remat, materializing multi-GB bf16 copies (gate+up alone
would be 7.5 GB at 8B).

Method: lower + compile the REAL FoldTrainer step fully abstractly
(jax.eval_shape / ShapeDtypeStruct — zero device allocation) and read
compiled.memory_analysis() while sweeping the token count M. A large
M-independent intercept in temp bytes = hoisted loop-invariant buffers.

Run: python scripts/probe_8b_memory.py [quick]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from tst.aux.ckpt import enable_compilation_cache
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.sft import FoldTrainer


def abstract_case(spec_name, k, batch, seq, remat, bits=8, t_max=4,
                  n_rows=64, use_pallas=True):
    spec = spec_by_name(spec_name)
    lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
    tr = FoldTrainer(spec, lspec, k=k, lr=1e-4, total_steps=100,
                     use_pallas=use_pallas, remat=remat, t_max=t_max)
    params = jax.eval_shape(
        lambda key: init_params(key, spec, quantize=bits is not None,
                                bits=bits or 8),
        jax.random.key(0))
    lora, opt = jax.eval_shape(tr.init_state, jax.random.key(1))
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    args = (params, lora, opt,
            sds((n_rows, seq), jnp.int32),      # tokens
            sds((n_rows, seq), jnp.float32),    # loss mask
            sds((n_rows,), jnp.int32),          # answer pos
            sds((k, batch), jnp.int32))         # idx
    return tr, args


def compile_and_report(tag, tr, args):
    t0 = time.perf_counter()
    compiled = tr._step_fn.lower(*args).compile()
    wall = time.perf_counter() - t0
    m = compiled.memory_analysis()
    arg = getattr(m, "argument_size_in_bytes", 0)
    out = getattr(m, "output_size_in_bytes", 0)
    tmp = getattr(m, "temp_size_in_bytes", 0)
    alias = getattr(m, "alias_size_in_bytes", 0)
    print(f"{tag:>36}  arg {arg/1e9:7.2f}  out {out/1e9:7.2f}  "
          f"temp {tmp/1e9:7.2f}  alias {alias/1e9:7.2f}  "
          f"total {(arg+out+tmp)/1e9:7.2f} GB   (compile {wall:.0f}s)",
          flush=True)
    return {"arg": arg, "out": out, "temp": tmp}


def main():
    enable_compilation_cache()
    quick = "quick" in sys.argv[1:]
    print(f"backend={jax.default_backend()}", flush=True)

    cases = [
        # the anomalous leg: temp vs M sweep (full remat, int8, k=5 B=1)
        ("8b int8 k5xB1 S=128 full", "llama3-8b", 5, 1, 128, True, 8),
        ("8b int8 k5xB1 S=256 full", "llama3-8b", 5, 1, 256, True, 8),
        ("8b int8 k5xB1 S=512 full", "llama3-8b", 5, 1, 512, True, 8),
    ]
    if not quick:
        cases += [
            # the dots leg whose measured 9.5 GB total also disagrees with
            # naive dots-save accounting (5.6 GB of saves + 8.04 base)
            ("8b int8 k2xB2 S=512 dots", "llama3-8b", 2, 2, 512, "dots", 8),
            # bf16-base control at tiny M: does the intercept vanish when
            # there is nothing to dequantize? (args alone are 16.1 GB — the
            # compiler may reject; report whatever it says)
            ("8b bf16 k5xB1 S=128 full", "llama3-8b", 5, 1, 128, True, None),
        ]
    for tag, name, k, b, s, remat, bits in cases:
        try:
            tr, args = abstract_case(name, k, b, s, remat, bits=bits)
            compile_and_report(tag, tr, args)
        except Exception as e:
            print(f"{tag:>36}  FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
