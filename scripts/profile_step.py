"""Profile the fold-parallel 0.5B train step and print the top HLO ops.

Captures an XProf trace of a few steady-state steps, then converts the
xplane with tensorboard_plugin_profile into per-op statistics — where the
190 ms actually goes (matmul vs elementwise recompute vs flash kernels vs
optimizer). Run: python scripts/profile_step.py [n_top]
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tst.aux.ckpt import enable_compilation_cache
from tst.data.folds import kfold_assign
from tst.data.synthetic import make_synthetic_mcq
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.sft import FoldTrainer, make_fold_batches


def main():
    enable_compilation_cache()
    on_tpu = jax.default_backend() in ("tpu", "axon")
    spec = spec_by_name("qwen2.5-0.5b" if on_tpu else "small")
    K, BATCH, SEQ = 5, 4, 512

    ds = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
    tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
    fold_id = kfold_assign(ds, K, seed=0)
    lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
    t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
    params = init_params(jax.random.key(0), spec)
    tokens = jnp.asarray(tb.tokens)
    mask = jnp.asarray(tb.loss_mask)
    pos = jnp.asarray(tb.answer_pos)
    batches = make_fold_batches(fold_id, K, BATCH, epochs=10, seed=0)

    tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=16,
                     use_pallas=on_tpu, remat="dots" if on_tpu else False,
                     t_max=t_max)
    lora, opt = tr.init_state(jax.random.key(1))
    for t in range(3):  # compile + warm
        lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask, pos,
                                      jnp.asarray(batches[t]))
    np.asarray(loss)

    trace_dir = "/tmp/tst_profile"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for t in range(3, 8):
            lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask,
                                          pos, jnp.asarray(batches[t]))
        np.asarray(loss)

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print(f"xplane files: {xplanes}")
    if not xplanes:
        print("no xplane captured (remote PJRT may not support profiling)")
        return

    from tst.aux.xplane import device_op_summary

    ops = device_op_summary(xplanes[-1])
    print(f"top device ops ({len(ops)} total):")
    for r in ops[:20]:
        print(f"  {r['name']:<45} {r['total_us']:>10.1f} us "
              f"x{r['occurrences']:<5} avg {r['avg_us']:>8.1f} us")


if __name__ == "__main__":
    main()
