"""Backend platform selection.

This environment registers the TPU through a PJRT plugin loaded by a global
``sitecustomize`` which force-sets ``jax_platforms`` at interpreter start, so
``JAX_PLATFORMS=cpu`` in the environment is silently overridden. The only
reliable switch is ``jax.config.update`` before first backend use — this
module owns that call so CLI commands can pick the right platform (the RF
diagnostic is a CPU workload per BASELINE.json config 1; SFT/IBP want the
TPU).
"""

from __future__ import annotations

import os
from typing import Optional


def select_platform(platform: Optional[str]) -> str:
    """Pick the JAX backend: "cpu", "tpu", or None/"auto" (leave as-is).

    Must be called before any jax computation. Returns the effective platform
    string of the default backend after selection.
    """
    import jax

    if platform and platform != "auto":
        want = platform
        if want == "tpu" and os.environ.get("JAX_PLATFORMS", "").startswith("axon"):
            # the TPU is registered under the experimental 'axon' plugin name
            want = "axon,cpu"
        jax.config.update("jax_platforms", want)
    return jax.default_backend()


def fake_devices(n: int = 8) -> None:
    """Request ``n`` fake CPU devices (only effective before backend init) —
    the standard JAX answer to testing multi-chip sharding without a cluster
    (SURVEY.md §4.3)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
