"""Device mesh, sharding rules, and collectives policy (SURVEY.md §2b B13).

This module IS the distributed-communication backend of the framework: there
is no NCCL/MPI equivalent to write on TPU — collectives are *emitted by XLA*
from GSPMD sharding annotations, riding ICI within a slice and DCN across
slices (SURVEY.md §5). What we own is:

  * mesh construction with the axis convention ``(fold, data, tensor)``:
      - ``fold``   — the workload's signature axis: k cross-validation fold
                     models training simultaneously (outermost; maps to DCN
                     if ever multi-slice),
      - ``data``   — DP batch axis, doubling as the FSDP shard axis for the
                     frozen base weights,
      - ``tensor`` — Megatron-style TP (innermost, fastest ICI ring);
  * PartitionSpec rules per parameter (column-parallel in-projections,
    row-parallel out-projections, vocab-sharded embeddings);
  * LoRA sharding that introduces NO extra collectives: adapter B shards
    over ``tensor`` exactly like the base weight it patches (block-diagonal
    LoRA insight, PAPERS.md:9); adapter A is tiny and replicated.

With a single device every spec collapses to replicated — the same program
runs on 1 chip, 8 fake CPU devices, or a v5p pod without code changes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("fold", "data", "seq", "tensor")


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host / multi-slice bring-up (SURVEY.md §5 comms backend).

    Call BEFORE any other jax use on every host of a multi-host TPU pod or
    multi-slice (megascale) deployment; after it, ``jax.devices()`` spans
    all hosts and GSPMD emits DCN collectives across slices automatically.
    Arguments default to the standard JAX env vars
    (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID — on Cloud TPU all three
    are auto-detected and may be omitted). Returns False (no-op) when
    nothing indicates a multi-process launch — single-chip/CI runs are
    unaffected. Not exercisable in this 1-chip environment; the multi-slice
    mesh LAYOUT is tested via make_mesh's hybrid path on fake devices.
    """
    import os

    multi = (coordinator_address or num_processes
             or os.environ.get("COORDINATOR_ADDRESS")
             or os.environ.get("NUM_PROCESSES"))
    if not multi:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def _slice_ids(devs) -> list:
    return sorted({getattr(d, "slice_index", 0) or 0 for d in devs})


def make_mesh(
    fold: int = 1,
    data: int = 1,
    tensor: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the ``(fold, data, seq, tensor)`` mesh over the product of
    devices (defaults to all available). Axis sizes of 1 are legal and
    collapse that axis to "unsharded". ``seq`` is the ring-attention
    sequence-parallel axis (SURVEY.md §5 long-context); it sits next to
    ``tensor`` so KV rotation rides nearest-neighbor ICI links.

    Multi-slice: when the devices span multiple TPU slices (megascale,
    ``device.slice_index``), the FOLD axis is laid out across slices — fold
    models never exchange tensors mid-step, so the only cross-slice (DCN)
    traffic is optimizer-free per-fold streams, while FSDP gathers and TP
    reductions stay on intra-slice ICI. Requires fold % n_slices == 0.
    """
    devs = list(devices if devices is not None else jax.devices())
    need = fold * data * seq * tensor
    if need > len(devs):
        raise ValueError(
            f"mesh {fold}x{data}x{seq}x{tensor} needs {need} devices, have {len(devs)}"
        )
    devs = devs[:need]
    slices = _slice_ids(devs)
    if len(slices) > 1:
        n_slices = len(slices)
        if fold % n_slices:
            raise ValueError(
                f"multi-slice mesh: fold={fold} must be divisible by the "
                f"{n_slices} slices (the fold axis is the DCN axis)"
            )
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(fold // n_slices, data, seq, tensor),
            dcn_mesh_shape=(n_slices, 1, 1, 1),
            devices=devs,
        )
        return Mesh(grid, AXES)
    grid = np.asarray(devs).reshape(fold, data, seq, tensor)
    return Mesh(grid, AXES)


def from_config(mesh_cfg, devices=None) -> Mesh:
    return make_mesh(mesh_cfg.fold, mesh_cfg.data, mesh_cfg.tensor,
                     getattr(mesh_cfg, "seq", 1), devices)


#: logical model axis (tst.models.decoder.PARAM_AXES) → mesh axis
LOGICAL_RULES: Dict[str, Optional[str]] = {
    "vocab": "tensor",
    "embed": "data",  # FSDP: base weights sharded over the data axis
    "heads": "tensor",
    "ffn": "tensor",
    "layer": None,  # the scan axis is never sharded
}


def base_param_pspec(path: str) -> P:
    """PartitionSpec for a base-model parameter by its pytree path."""
    from tst.models.decoder import PARAM_AXES

    axes = PARAM_AXES.get(path)
    if axes is None:
        raise KeyError(f"no sharding axes registered for param {path!r}")
    return P(*(LOGICAL_RULES.get(a) for a in axes))


def lora_param_pspec(leaf_name: str, with_fold_axis: bool = True) -> P:
    """LoRA adapters: [fold?, L, r, in] for A (replicated), [fold?, L, out, r]
    for B (out-dim sharded over ``tensor``, matching the base projection —
    no extra collectives)."""
    if leaf_name == "a":
        inner = (None, None, None)
    elif leaf_name == "b":
        inner = (None, "tensor", None)
    else:
        raise KeyError(f"unexpected LoRA leaf {leaf_name!r}")
    return P(*((("fold",) if with_fold_axis else ()) + inner))


def param_pspec_tree(params) -> Any:
    """Map a base-param pytree to a matching tree of PartitionSpecs.

    Layer dict leaves resolve as ``layers.<name>``; top-level as their key.
    """

    def walk(node, path):
        if isinstance(node, dict):
            if "q" in node and "scale" in node:  # int8/int4-quantized leaf
                wspec = base_param_pspec(path)
                # scale is [*, 1, out] for int8 (keepdims over the input
                # axis) or [*, in/g, 1, out] for grouped int4 — one rank
                # higher. Either way: shard only the out axis, like the
                # weight's last axis.
                srank = node["scale"].ndim
                sspec = P(*([None] * (srank - 1) + [wspec[-1]]))
                return {"q": wspec, "scale": sspec}
            return {k: walk(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        return base_param_pspec(path)

    return walk(params, "")


def lora_pspec_tree(lora, with_fold_axis: bool = True) -> Any:
    def walk(node, leaf_name=None):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return lora_param_pspec(leaf_name, with_fold_axis)

    return walk(lora)


def shard_tree(tree, pspecs, mesh: Mesh):
    """device_put every leaf with its NamedSharding."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, pspecs
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_pspec(with_fold_axis: bool = True) -> P:
    """Token batches: [fold?, batch, seq] → fold × data sharding."""
    return P(*((("fold",) if with_fold_axis else ()) + ("data", None)))


def mesh_axis_sizes(mesh: Mesh) -> Dict[str, int]:
    return dict(zip(mesh.axis_names, mesh.devices.shape))
