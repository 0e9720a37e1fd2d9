"""Packed-sequence (segment-masked) attention + packing pipeline tests.

Sequence packing places several short samples in one fixed-shape row
(SURVEY.md §7 hard part 5: TPU programs are compiled per shape, and padding
waste is the price — packing converts it back into useful compute). The
kernels confine attention to each query's own contiguous segment via a
per-row starts tile; these tests pin the mask numerics against the dense
reference on CPU (interpret mode), fwd + grads, on both kernel schedules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tst.kernels.flash_attention as fa

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _interpret():
    old = fa._INTERPRET
    fa._INTERPRET = True
    yield
    fa._INTERPRET = old


def _qkv(b=2, s=256, h=4, kvh=2, d=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, s, kvh, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, s, kvh, d)), dtype)
    return q, k, v


def _starts(s=256):
    pad = int(fa.SEG_PAD)
    return jnp.asarray(
        [[0, 100, 180] + [pad] * 5, [0, 128] + [pad] * 6], jnp.int32)


class TestSegmentMask:
    def test_segment_starts_per_pos(self):
        seg = jnp.asarray([[0, 3, 7, int(fa.SEG_PAD)]], jnp.int32)
        out = fa.segment_starts_per_pos(seg, 10)[0]
        assert out.tolist() == [0, 0, 0, 3, 3, 3, 3, 7, 7, 7]

    def test_segment_mask_blocks_cross_segment(self):
        seg = jnp.asarray([[0, 4] + [int(fa.SEG_PAD)] * 6], jnp.int32)
        m = fa.segment_mask(seg, 8)[0]
        assert bool(m[3, 0])          # within segment 0, causal
        assert not bool(m[4, 3])      # segment 1 must not see segment 0
        assert bool(m[6, 4])          # within segment 1
        assert not bool(m[2, 5])      # causal still holds

    def test_seg_tile_shape_and_padding(self):
        tile = fa.seg_tile(_starts())
        assert tile.shape == (2, 8, fa.SEG_LANES)
        assert int(tile[0, 0, 2]) == 180
        assert int(tile[0, 0, 3]) == int(fa.SEG_PAD)
        assert int(tile[0, 7, 1]) == 100  # sublane-replicated

    def test_too_many_segments_rejected(self):
        seg = jnp.zeros((1, fa.MAX_SEGS + 1), jnp.int32)
        with pytest.raises(ValueError, match="MAX_SEGS"):
            fa.seg_tile(seg)

    def test_non_causal_rejected(self):
        q, k, v = _qkv()
        with pytest.raises(ValueError, match="causal"):
            fa.flash_attention(q, k, v, causal=False, seg_starts=_starts())


class TestSegmentedKernelParity:
    @pytest.mark.parametrize("blocks", [None, (128, 128)],
                             ids=["folded", "tiled"])
    def test_forward_matches_reference(self, blocks):
        q, k, v = _qkv()
        seg = _starts()
        kw = {} if blocks is None else {"block_q": blocks[0], "block_k": blocks[1]}
        out = fa.flash_attention(q, k, v, causal=True, seg_starts=seg, **kw)
        ref = fa.mha_reference(q, k, v, causal=True, seg_starts=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("blocks", [None, (128, 128)],
                             ids=["folded", "tiled"])
    @pytest.mark.parametrize("fused", [True, False], ids=["fused", "split"])
    def test_grads_match_reference(self, blocks, fused):
        q, k, v = _qkv()
        seg = _starts()
        kw = {} if blocks is None else {"block_q": blocks[0], "block_k": blocks[1]}
        old = fa.FUSED_BWD
        fa.FUSED_BWD = fused
        try:
            def loss_f(q, k, v):
                return (fa.flash_attention(
                    q, k, v, causal=True, seg_starts=seg, **kw) ** 2).sum()

            def loss_r(q, k, v):
                return (fa.mha_reference(
                    q, k, v, causal=True, seg_starts=seg) ** 2).sum()

            gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
            gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
        finally:
            fa.FUSED_BWD = old
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_single_segment_equals_plain_causal(self):
        # a row whose only segment starts at 0 must be bit-close to no-seg
        q, k, v = _qkv(b=1, s=128)
        seg = jnp.asarray([[0] + [int(fa.SEG_PAD)] * 7], jnp.int32)
        out = fa.flash_attention(q, k, v, causal=True, seg_starts=seg)
        ref = fa.flash_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_packed_rows_match_per_sample_rows(self):
        # two samples packed into one row == the same samples in separate
        # rows, at their positions (the end-to-end packing invariant)
        d, h, kvh = 32, 4, 2
        rng = np.random.default_rng(1)
        sa, sb = 128, 128
        qa = jnp.asarray(rng.normal(size=(1, sa, h, d)), jnp.float32)
        ka = jnp.asarray(rng.normal(size=(1, sa, kvh, d)), jnp.float32)
        va = jnp.asarray(rng.normal(size=(1, sa, kvh, d)), jnp.float32)
        qb = jnp.asarray(rng.normal(size=(1, sb, h, d)), jnp.float32)
        kb = jnp.asarray(rng.normal(size=(1, sb, kvh, d)), jnp.float32)
        vb = jnp.asarray(rng.normal(size=(1, sb, kvh, d)), jnp.float32)
        qp = jnp.concatenate([qa, qb], axis=1)
        kp = jnp.concatenate([ka, kb], axis=1)
        vp = jnp.concatenate([va, vb], axis=1)
        seg = jnp.asarray([[0, sa] + [int(fa.SEG_PAD)] * 6], jnp.int32)
        packed = fa.flash_attention(qp, kp, vp, causal=True, seg_starts=seg)
        oa = fa.flash_attention(qa, ka, va, causal=True)
        ob = fa.flash_attention(qb, kb, vb, causal=True)
        np.testing.assert_allclose(np.asarray(packed[:, :sa]), np.asarray(oa),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(packed[:, sa:]), np.asarray(ob),
                                   atol=2e-5, rtol=2e-5)
