"""Long-sequence remat comparison at S=16384/32768 through the flash path.

At 16k the attention forward is ~half the model FLOPs; policies compared:
full remat (re-runs everything), "attn" (saves flash inputs+residuals,
re-runs MLP/projections), and the dots family (saves matmul outputs —
measured: exceeds schedulable HBM at 16k+, kept for the record).
Measured conclusions live in docs/RESULTS.md.

Run: python scripts/sweep_longseq_remat.py
"""

from __future__ import annotations

from _workload import make_workload, time_train_steps

import jax

from tst.train.sft import FoldTrainer

K, B, STEPS, WARM = 2, 1, 4, 2


def main():
    on_tpu = jax.default_backend() in ("tpu", "axon")
    seqs = [16384, 32768] if on_tpu else [1024]
    print(f"{'seq':>6} {'remat':>10} {'compile_s':>9} {'step_ms':>8} "
          f"{'tok/s':>9} {'hbm_gb':>7}")
    for seq in seqs:
        w = make_workload(seq=seq, n=64, k=K, batch=B)
        for remat in (True, "attn", "flash", "dots", "dots_flash"):
            try:
                tr = FoldTrainer(w.spec, w.lspec, k=K, lr=1e-4,
                                 total_steps=STEPS + WARM, use_pallas=on_tpu,
                                 remat=remat, t_max=w.t_max)
                batches = w.batches(epochs=10)
                compile_s, dt = time_train_steps(w, tr, batches, STEPS, WARM)
                try:
                    import jax.numpy as jnp
                    import numpy as np  # noqa: F401

                    m = tr._step_fn.lower(
                        w.params, *tr.init_state(jax.random.key(1)),
                        w.tokens, w.mask, w.pos, jnp.asarray(batches[0])
                    ).compile().memory_analysis()
                    hbm = (m.argument_size_in_bytes + m.output_size_in_bytes
                           + m.temp_size_in_bytes) / 1e9
                except Exception:
                    hbm = float("nan")
                print(f"{seq:>6} {str(remat):>10} {compile_s:>9.1f} "
                      f"{dt*1e3:>8.1f} {K*B*seq/dt:>9.1f} {hbm:>7.2f}")
            except Exception as e:
                print(f"{seq:>6} {str(remat):>10}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
