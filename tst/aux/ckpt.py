"""Checkpoint/resume + persistent compilation cache (SURVEY.md §5, B21)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

_CACHE_ENABLED = False


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Persistent XLA compilation cache — mandatory at 0.5B+ scale here: a
    cold fold-parallel train-step compile takes ~7.5 min through this
    environment's remote-compile tunnel; warm hits are seconds (SURVEY.md §7
    hard part 6)."""
    global _CACHE_ENABLED
    import jax

    cache_dir = cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".xla_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    if not _CACHE_ENABLED:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _CACHE_ENABLED = True
    return cache_dir


def save_train_state(path: str, lora, opt_state, extra: Optional[Dict[str, Any]] = None) -> None:
    """Orbax checkpoint of (adapters, optimizer state, host metadata).

    The frozen base is never checkpointed — reloadable from HF (SURVEY.md §5).
    """
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = {"lora": lora, "opt_state": opt_state}
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if extra is not None:
        import json

        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f, default=float)


def load_train_state(path: str, like_lora, like_opt_state):
    """Restore (lora, opt_state, extra) — ``like_*`` provide target shapes/
    shardings (abstract pytrees from init_state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = {"lora": like_lora, "opt_state": like_opt_state}
    state = ckptr.restore(path, target)
    extra = None
    extra_path = os.path.join(path, "extra.json")
    if os.path.exists(extra_path):
        import json

        with open(extra_path) as f:
            extra = json.load(f)
    return state["lora"], state["opt_state"], extra
