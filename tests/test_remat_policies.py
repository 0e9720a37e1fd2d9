"""Remat policies are numerics-preserving: every mode computes the same loss
and LoRA grads as no-remat (they only change WHAT is saved for backward).

Covers the round-2 additions "dots_attn" (dots + saved attention output — the
Pallas flash output is not a dot_general, so plain "dots" re-runs the flash
forward in backward) and "light" (save all but the [S, d_ff] MLP hiddens).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec, init_lora
from tst.train.sft import sft_loss_window

SPEC = spec_by_name("tiny")
LSPEC = LoraSpec(rank=4, alpha=8.0, dtype=SPEC.dtype)


def _loss_and_grads(remat):
    tokens = jax.random.randint(jax.random.key(0), (2, 128), 0, SPEC.vocab_size)
    mask = jnp.zeros((2, 128), jnp.float32).at[:, 100:104].set(1.0)
    pos = jnp.full((2,), 99, jnp.int32)
    base = init_params(jax.random.key(1), SPEC)
    lora = init_lora(jax.random.key(2), SPEC, LSPEC)
    # adapters start at zero-B; nudge so grads flow through both A and B
    lora = jax.tree.map(lambda x: x + 0.01, lora)

    def loss_fn(lo):
        return sft_loss_window(base, lo, tokens, mask, pos, 4, SPEC, LSPEC,
                               use_pallas=False, remat=remat)

    return jax.jit(jax.value_and_grad(loss_fn))(lora)


@pytest.mark.parametrize("remat", [True, "dots", "dots_attn", "dots_flash",
                                   "light", "attn", "flash"])
def test_remat_modes_match_no_remat(remat):
    loss0, g0 = _loss_and_grads(False)
    loss1, g1 = _loss_and_grads(remat)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss0),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("remat", ["dots", "attn", "flash"])
@pytest.mark.parametrize("use_pallas", [
    False,
    pytest.param(True, marks=pytest.mark.slow),  # interpret-mode: ~8-13 s each
])
def test_remat_modes_with_packed_rows(remat, use_pallas, monkeypatch):
    """Packed rows (seg_starts + per-segment answer windows) under each remat
    policy match the same packed loss with no remat — the 8B k=5 packed leg
    runs exactly this combination (attn remat + segment-masked flash)."""
    from tst.kernels import flash_attention as fa

    if use_pallas:
        monkeypatch.setattr(fa, "_INTERPRET", True)
    tokens = jax.random.randint(jax.random.key(0), (2, 256), 0, SPEC.vocab_size)
    # two segments per row: starts at 0 and 128; one answer window each
    seg = jnp.asarray([[0, 128] + [int(fa.SEG_PAD)] * 6] * 2, jnp.int32)
    pos = jnp.asarray([[99, 227], [90, 200]], jnp.int32)  # [B, G]
    mask = jnp.zeros((2, 256), jnp.float32)
    for b in range(2):
        for g in range(2):
            p = int(pos[b, g])
            mask = mask.at[b, p + 1:p + 5].set(1.0)
    base = init_params(jax.random.key(1), SPEC)
    lora = init_lora(jax.random.key(2), SPEC, LSPEC)
    lora = jax.tree.map(lambda x: x + 0.01, lora)

    def run(remat_mode):
        def loss_fn(lo):
            return sft_loss_window(base, lo, tokens, mask, pos, 4, SPEC,
                                   LSPEC, use_pallas=use_pallas,
                                   remat=remat_mode, seg_starts=seg)

        return jax.jit(jax.value_and_grad(loss_fn))(lora)

    loss0, g0 = run(False)
    loss1, g1 = run(remat)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss0),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_unknown_remat_mode_rejected():
    with pytest.raises(ValueError, match="unknown remat mode"):
        _loss_and_grads("bogus")


@pytest.mark.parametrize("remat", [
    pytest.param("dots_flash", marks=pytest.mark.slow),  # ~12 s interpret-mode
    "attn", "flash",
])
def test_flash_residual_remat_modes_with_pallas(remat, monkeypatch):
    """The dots_flash/attn policies exist to SAVE the Pallas kernel's
    checkpoint_name residuals (flash_out/flash_lse inside the custom_vjp) —
    exercise that path with the real kernel in interpret mode, not just the
    XLA fallback (ADVICE r2)."""
    from tst.kernels import flash_attention as fa

    monkeypatch.setattr(fa, "_INTERPRET", True)
    tokens = jax.random.randint(jax.random.key(0), (2, 128), 0, SPEC.vocab_size)
    mask = jnp.zeros((2, 128), jnp.float32).at[:, 100:104].set(1.0)
    pos = jnp.full((2,), 99, jnp.int32)
    base = init_params(jax.random.key(1), SPEC)
    lora = init_lora(jax.random.key(2), SPEC, LSPEC)
    lora = jax.tree.map(lambda x: x + 0.01, lora)

    def run(remat_mode):
        def loss_fn(lo):
            return sft_loss_window(base, lo, tokens, mask, pos, 4, SPEC, LSPEC,
                                   use_pallas=True, remat=remat_mode)

        return jax.jit(jax.value_and_grad(loss_fn))(lora)

    loss0, g0 = run(False)
    loss1, g1 = run(remat)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss0),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
