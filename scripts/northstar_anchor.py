"""North-star wall-clock anchor runs (VERDICT r2 missing #2).

BASELINE.json north-star: "k=5 Llama-3-8B blind stress-test of VSI-Bench
(<~5k samples) in <30 min on v5p-16". This script measures the anchor legs
on the ONE v5e this environment has:

  1. 0.5B, k=5, n=5000 synthetic-vsi (VSI sample count, ~3:1 MCQ+numeric)
  2. 8B-int8, k=5, n as large as a 30-min single-chip budget allows

and prints the walls; docs/RESULTS.md derives the v5p-16 projection from
them (fold/data-axis scaling model — zero cross-fold collectives).

Run: python scripts/northstar_anchor.py [n_05b] [n_8b] [pack]
  n_8b=0 skips the 8B leg; a literal "pack" third arg runs the 0.5B leg
  with sequence packing (optim.pack, loss/grad-exact — RESULTS.md).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

N_05B = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_8B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
PACK = "pack" in sys.argv[3:]


def run(tag, args):
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m", "tst"] + args,
                       capture_output=True, text=True)
    wall = time.time() - t0
    if r.returncode != 0:
        print(f"{tag}: FAILED rc={r.returncode}\n{r.stderr[-2000:]}")
        return None
    rep = json.loads(r.stdout)
    print(json.dumps({
        "leg": tag,
        "wall_s": round(wall, 1),
        "train_wall_s": rep.get("train_wall_seconds"),
        "pipeline_wall_s": rep.get("wall_seconds"),
        "n": rep.get("n_samples"), "k": rep.get("k"),
        "blind_accuracy": rep.get("blind_accuracy"),
        "chance": rep.get("chance_accuracy"),
        "numeric_mra": rep.get("numeric_blind_mra"),
        "samples_per_s": rep.get("train_samples_per_sec"),
    }), flush=True)
    return rep


def main():
    # packed rows carry ~3 samples each; batch 3 rows/fold ~= the
    # unpacked 4×512 token budget (bench.py packed leg shape)
    bs05 = 3 if PACK else 4
    leg05 = [
        "diagnose-sft", "--bench", "synthetic-vsi:0.4", "--k", "5",
        "--set", f"data.n={N_05B}", "--set", "model.name=qwen2.5-0.5b",
        "--set", "optim.epochs=3", "--set", f"optim.batch_size={bs05}",
        "--set", 'model.remat="dots"', "--out", "/tmp/ns_05b",
    ]
    if PACK:
        leg05 += ["--set", "optim.pack=true", "--set", "optim.pack_len=1024"]
    run("0.5b_vsi5k_k5" + ("_packed" if PACK else ""), leg05)
    if N_8B > 0:
        # the SHIPPED best 8B config (VERDICT r3 weak #2: the anchored leg
        # ran full-remat unpacked at 5.05 samples/s while the repo's own
        # round-3 campaigns measured attn-remat + packing at 12.1):
        # attn remat + pack_len 1024 + B=1 rows/fold (B>1 compile-OOMs)
        leg8 = [
            "diagnose-sft", "--bench", "synthetic-vsi:0.4", "--k", "5",
            "--set", f"data.n={N_8B}", "--set", "model.name=llama3-8b",
            "--set", "model.quantize=int8", "--set", 'model.remat="attn"',
            "--set", "optim.epochs=2", "--set", "optim.batch_size=1",
            "--out", "/tmp/ns_8b",
        ]
        if PACK:
            leg8 += ["--set", "optim.pack=true",
                     "--set", "optim.pack_len=1024"]
        run("8b_int8_k5" + ("_packed" if PACK else ""), leg8)


if __name__ == "__main__":
    main()
