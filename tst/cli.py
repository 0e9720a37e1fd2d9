"""``tst`` command-line interface (SURVEY.md §2b B19, layer L8).

Subcommands (the runnable pipeline implied by "Applying this framework to
four benchmarks", reference README.md:35):

  * ``diagnose-rf``  — lightweight Random-Forest shortcut audit
  * ``diagnose-sft`` — k-fold blind LoRA SFT diagnostic (the core method)
  * ``warmup``       — AOT-compile a config's programs into the persistent
                        cache (kills the cold-compile wall of a timed run)
  * ``debias-ibp``   — Iterative Bias Pruning → debiased split
  * ``eval-blind``   — zero-shot blind evaluation (vision-blind-gap leg)
  * ``generate``     — greedy continuations (serving; optional exact
                        speculative decoding via ``--draft-model``)
  * ``export``       — re-emit artifacts from a previous run directory

Run as ``python -m tst <subcommand> ...``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List, Optional

from tst import config as config_mod
from tst.config import RunConfig


def _common_flags(p: argparse.ArgumentParser, default_platform: str = "auto") -> None:
    p.add_argument("--platform", default=default_platform, choices=["auto", "cpu", "tpu"],
                   help="JAX backend (diagnose-rf defaults to cpu per its CPU-parity config)")
    p.add_argument("--preset", default=None, help=f"one of {sorted(config_mod.PRESETS)}")
    p.add_argument("--config", default=None, help="JSON config file")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="dotted config override, repeatable")
    p.add_argument("--bench", default=None, help="benchmark name (shorthand for data.bench)")
    p.add_argument("--source", default=None, help="local dataset dir/jsonl (shorthand)")
    p.add_argument("--k", type=int, default=None, help="number of folds (shorthand)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--out", default=None, help="output directory (shorthand for out_dir)")
    p.add_argument("--profile-dir", default=None, help="dump XProf traces here")
    p.add_argument("--debug-nans", action="store_true",
                   help="jax debug_nans mode (the TPU-functional analogue of a sanitizer)")


def _resolve(args) -> RunConfig:
    from tst.aux.ckpt import enable_compilation_cache
    from tst.runtime.platform import select_platform

    select_platform(getattr(args, "platform", None))
    enable_compilation_cache()
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    cfg = config_mod.resolve(args.preset, args.config, args.overrides)
    if getattr(args, "profile_dir", None):
        cfg.profile_dir = args.profile_dir
    if args.bench is not None:
        cfg.data.bench = args.bench
    if args.source is not None:
        cfg.data.source = args.source
    if args.k is not None:
        cfg.data.k = args.k
    if args.seed is not None:
        cfg.data.seed = args.seed
    if args.out is not None:
        cfg.out_dir = args.out
    from tst.runtime.knobs import apply_perf_config

    apply_perf_config(cfg.perf)  # --set perf.* → kernel/dispatch knobs
    return cfg


def _load_dataset(cfg: RunConfig):
    from tst.data.adapters import load_benchmark

    return load_benchmark(
        cfg.data.bench, source=cfg.data.source, split=cfg.data.split,
        include_open=cfg.data.include_open,
        **({"n": cfg.data.n, "seed": cfg.data.seed} if cfg.data.bench.startswith("synthetic") else {}),
    )


def cmd_diagnose_rf(args) -> int:
    from tst.diagnose.rf import run_rf_diagnostic
    from tst.io import outputs

    cfg = _resolve(args)
    ds = _load_dataset(cfg)
    t0 = time.time()
    d = run_rf_diagnostic(
        ds, k=cfg.data.k, seed=cfg.data.seed,
        n_estimators=cfg.rf.n_estimators, max_depth=cfg.rf.max_depth,
        backend=cfg.rf.backend, score_rule=cfg.rf.score_rule,
    )
    report = d.report()
    report["wall_seconds"] = round(time.time() - t0, 2)
    report["n_samples"] = len(ds)
    outputs.write_sx_table(cfg.out_dir, ds, d.s_x, d.fold_id, pred=d.pred)
    outputs.write_report(cfg.out_dir, report)
    ds.save_jsonl(f"{cfg.out_dir}/dataset.jsonl")
    cfg.save(f"{cfg.out_dir}/config.json")
    print(json.dumps(report, indent=2, default=float))
    return 0


def cmd_diagnose_sft(args) -> int:
    from tst.train.pipeline import run_sft_diagnostic

    cfg = _resolve(args)
    ds = _load_dataset(cfg)
    report = run_sft_diagnostic(ds, cfg)
    print(json.dumps(report, indent=2, default=float))
    return 0


def cmd_warmup(args) -> int:
    """AOT-compile every program a diagnose-sft run of this config would
    execute, populating the persistent compilation cache so the timed run
    never pays the cold-compile wall (minutes per program through a remote
    compile tunnel)."""
    from tst.train.pipeline import run_warmup

    cfg = _resolve(args)
    ds = _load_dataset(cfg)
    report = run_warmup(ds, cfg, ibp=args.ibp)
    print(json.dumps(report, indent=2, default=float))
    return 0


def cmd_debias_ibp(args) -> int:
    from tst.debias.ibp import run_ibp

    cfg = _resolve(args)
    ds = _load_dataset(cfg)
    report = run_ibp(ds, cfg)
    print(json.dumps(report, indent=2, default=float))
    return 0


def cmd_eval_blind(args) -> int:
    from tst.train.pipeline import run_blind_eval

    cfg = _resolve(args)
    ds = _load_dataset(cfg)
    report = run_blind_eval(ds, cfg, adapter_dir=args.adapter, fold=args.fold,
                            full_accuracy=args.full_accuracy)
    print(json.dumps(report, indent=2, default=float))
    return 0


def cmd_train_transfer(args) -> int:
    """Fine-tune on a TRAINING set, blind-eval a test set (the VSI-Train-10k
    control experiment — reference README.md:15)."""
    from tst.data.adapters import load_benchmark
    from tst.train.transfer import run_train_transfer

    cfg = _resolve(args)
    eval_ds = _load_dataset(cfg)
    train_ds = load_benchmark(
        args.train_bench, source=args.train_source,
        **({"n": cfg.data.n, "seed": cfg.data.seed + 99}
           if args.train_bench.startswith("synthetic") else {}),
    )
    report = run_train_transfer(train_ds, eval_ds, cfg)
    print(json.dumps(report, indent=2, default=float))
    return 0


def cmd_generate(args) -> int:
    """Greedy continuations for every sample's blind prompt (the serving
    surface). ``--draft-model``/``--draft-path`` switch to EXACT speculative
    decoding — bit-identical output, with the measured acceptance in the
    report (tst/models/spec_decode.py)."""
    from tst.train.pipeline import run_generate

    cfg = _resolve(args)
    ds = _load_dataset(cfg)
    report = run_generate(
        ds, cfg, max_new=args.max_new, draft_model=args.draft_model,
        draft_path=args.draft_path, draft_quantize=args.draft_quantize,
        gamma=args.gamma, adapter_dir=args.adapter, fold=args.fold)
    print(json.dumps(report, indent=2, default=float))
    return 0


def cmd_export(args) -> int:
    """Re-emit artifacts (sx table / debiased split) from a run directory."""
    import numpy as np

    from tst.data.schema import BlindDataset
    from tst.io import outputs

    run_dir = args.run_dir
    ds = BlindDataset.load_jsonl(f"{run_dir}/dataset.jsonl")
    sx, fold = [], []
    with open(f"{run_dir}/sx.jsonl") as f:
        for line in f:
            row = json.loads(line)
            sx.append(row["s_x"] if row["s_x"] is not None else float("nan"))
            fold.append(row["fold"])
    sx = np.asarray(sx, dtype=np.float32)
    out = args.out or run_dir
    if args.prune_fraction:
        order = np.argsort(-np.where(np.isnan(sx), -np.inf, sx), kind="stable")
        n_prune = int(round(args.prune_fraction * len(ds)))
        keep = np.ones(len(ds), bool)
        keep[order[:n_prune]] = False
        outputs.write_debiased_split(out, ds, keep,
                                     audit={"pruned": int(n_prune), "rule": "top-s_x"})
    outputs.write_sx_table(out, ds, sx, np.asarray(fold))
    print(json.dumps({"exported_to": out, "n": len(ds)}))
    return 0


def _load_reference_kept(path: str, bench: Optional[str]) -> List[str]:
    """Sample ids of a reference kept-split file.

    Two accepted layouts (docs/PARITY.md):
      * our own jsonl schema (a BlindDataset dump);
      * with ``--bench <name>``, the RAW HuggingFace row schema of that
        benchmark — i.e. the released debiased split as downloaded
        (reference README.md:14), parsed through the same adapter that
        parsed the original run, so sample ids line up by construction.
        Rows must carry an explicit id field (the released artifacts do).
    """
    if bench:
        from tst.data.adapters import ADAPTERS

        if bench not in ADAPTERS:
            raise KeyError(f"unknown benchmark {bench!r}; have {sorted(ADAPTERS)}")
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        samples = ADAPTERS[bench].rows_to_samples(rows)
        return [s.id for s in samples]
    from tst.data.schema import BlindDataset

    return [s.id for s in BlindDataset.load_jsonl(path)]


def cmd_compare(args) -> int:
    """Ranking-parity report: our s(x) vs a reference kept-split (and,
    when available, a reference s(x) vector) — the BASELINE.json metric."""
    import numpy as np

    from tst.eval.parity import membership_agreement, spearman

    ids, sx = [], []
    with open(f"{args.run_dir}/sx.jsonl") as f:
        for line in f:
            row = json.loads(line)
            ids.append(row["id"])
            sx.append(row["s_x"] if row["s_x"] is not None else float("nan"))
    sx = np.asarray(sx, np.float32)
    kept_ids = _load_reference_kept(args.reference_kept, args.bench)
    report = membership_agreement(sx, ids, kept_ids)
    if args.reference_sx:
        ref = {}
        with open(args.reference_sx) as f:
            for line in f:
                row = json.loads(line)
                ref[row["id"]] = row["s_x"]
        ref_v = np.asarray([ref.get(i, float("nan")) for i in ids], np.float32)
        report["spearman"] = round(spearman(sx, ref_v), 4)
    # the north-star metric's own tool writes a machine-checkable artifact
    # into the run dir, like every other stage (VERDICT r2 weak #7)
    report["run_dir"] = args.run_dir
    report["reference_kept"] = args.reference_kept
    out_dir = args.out or args.run_dir
    from tst.io import outputs

    outputs.write_report(out_dir, report, name="parity.json")
    print(json.dumps(report, indent=2))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tst", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn, plat in [
        ("diagnose-rf", cmd_diagnose_rf, "cpu"),
        ("diagnose-sft", cmd_diagnose_sft, "auto"),
        ("warmup", cmd_warmup, "auto"),
        ("debias-ibp", cmd_debias_ibp, "auto"),
        ("eval-blind", cmd_eval_blind, "auto"),
        ("train-transfer", cmd_train_transfer, "auto"),
        ("generate", cmd_generate, "auto"),
    ]:
        sp = sub.add_parser(name)
        _common_flags(sp, default_platform=plat)
        if name == "warmup":
            sp.add_argument("--ibp", action="store_true",
                            help="warm the debias-ibp round programs "
                                 "(round-0-pinned shapes + total_steps0 LR "
                                 "constant) instead of the diagnose-sft ones")
        if name == "train-transfer":
            sp.add_argument("--train-bench", required=True,
                            help="training benchmark (e.g. a VSI-Train-10k jsonl)")
            sp.add_argument("--train-source", default=None)
        if name == "generate":
            sp.add_argument("--max-new", type=int, default=16)
            sp.add_argument("--draft-model", default=None,
                            help="draft geometry name for speculative "
                                 "decoding (must share the tokenizer, e.g. "
                                 "llama3.2-1b for llama3-8b)")
            sp.add_argument("--draft-path", default=None,
                            help="local HF checkpoint dir for the draft")
            sp.add_argument("--draft-quantize", default=None,
                            choices=["none", "int8", "int4"],
                            help="draft weight storage (decode is weight-"
                                 "read-bound; int8 halves the draft steps)")
            sp.add_argument("--gamma", type=int, default=4,
                            help="draft tokens proposed per verify round")
        if name in ("eval-blind", "generate"):
            sp.add_argument("--adapter", default=None,
                            help="Orbax LoRA checkpoint dir to serve "
                                 "(default: zero-shot base model)")
            sp.add_argument("--fold", default="0",
                            help="which fold's adapter serves: an index, or "
                                 "'mean' to average adapters across folds")
        if name == "eval-blind":
            sp.add_argument("--full-accuracy", type=float, default=None,
                            help="externally measured WITH-vision accuracy; "
                                 "adds the vision_blind_gap to the report")
        sp.set_defaults(fn=fn)
    sp = sub.add_parser("export")
    sp.add_argument("run_dir")
    sp.add_argument("--out", default=None)
    sp.add_argument("--prune-fraction", type=float, default=None)
    sp.set_defaults(fn=cmd_export)
    sp = sub.add_parser("compare", help="ranking parity vs a reference artifact")
    sp.add_argument("run_dir", help="run dir containing sx.jsonl")
    sp.add_argument("--out", default=None,
                    help="directory for parity.json (default: run_dir)")
    sp.add_argument("--reference-kept", required=True,
                    help="jsonl of the reference's kept (debiased) samples")
    sp.add_argument("--bench", default=None,
                    help="parse --reference-kept as RAW HF rows of this "
                         "benchmark (e.g. vsi_bench for the released "
                         "VSI-Bench-Debiased) instead of our jsonl schema")
    sp.add_argument("--reference-sx", default=None,
                    help="optional jsonl with a reference s_x column for Spearman")
    sp.set_defaults(fn=cmd_compare)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
