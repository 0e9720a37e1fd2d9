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
def _interpret(monkeypatch):
    monkeypatch.setattr(fa, "_INTERPRET", True)


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
    def test_grads_match_reference(self, blocks, fused, monkeypatch):
        q, k, v = _qkv()
        seg = _starts()
        kw = {} if blocks is None else {"block_q": blocks[0], "block_k": blocks[1]}
        monkeypatch.setattr(fa, "FUSED_BWD", fused)

        def loss_f(q, k, v):
            return (fa.flash_attention(
                q, k, v, causal=True, seg_starts=seg, **kw) ** 2).sum()

        def loss_r(q, k, v):
            return (fa.mha_reference(
                q, k, v, causal=True, seg_starts=seg) ** 2).sum()

        gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
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


# ───────────────────────── packer + model integration ─────────────────────────

from tst.data.packing import (FoldPacked, pack_fold_datasets,  # noqa: E402
                              make_packed_fold_batches, pack_rows)
from tst.data.synthetic import make_synthetic_mcq  # noqa: E402
from tst.data.tokenize import ByteTokenizer, tokenize_dataset  # noqa: E402
from tst.models.decoder import apply_model, init_params, spec_by_name  # noqa: E402


def _tiny_tb(n=12, seed=0, max_len=512):
    ds = make_synthetic_mcq(n=n, bias_fraction=0.5, seed=seed)
    return tokenize_dataset(ds, ByteTokenizer(), max_len=max_len)


class TestPacker:
    def test_pack_rows_roundtrip(self):
        tb = _tiny_tb()
        pb = pack_rows(tb, np.arange(tb.n), pack_len=1024)
        assert pb.n_rows < tb.n  # actually packed something
        assert int(pb.n_segs.sum()) == tb.n  # every sample placed once
        seen = pb.sample_rows[pb.sample_rows >= 0]
        assert sorted(seen.tolist()) == list(range(tb.n))
        for i in range(pb.n_rows):
            for j in range(int(pb.n_segs[i])):
                row = int(pb.sample_rows[i, j])
                off = int(pb.seg_starts[i, j])
                ln = int(tb.lengths[row])
                np.testing.assert_array_equal(
                    pb.tokens[i, off:off + ln], tb.tokens[row, :ln])
                np.testing.assert_array_equal(
                    pb.loss_mask[i, off:off + ln], tb.loss_mask[row, :ln])
                assert int(pb.answer_pos[i, j]) == off + int(tb.answer_pos[row])
        # starts ascend; unused slots are SEG_PAD
        for i in range(pb.n_rows):
            ns = int(pb.n_segs[i])
            starts = pb.seg_starts[i, :ns]
            assert (np.diff(starts) > 0).all() or ns == 1
            assert (pb.seg_starts[i, ns:] == fa.SEG_PAD).all()

    def test_pack_len_too_small_rejected(self):
        tb = _tiny_tb()
        with pytest.raises(ValueError, match="exceeds pack_len"):
            pack_rows(tb, np.arange(tb.n), pack_len=128)

    def test_max_segs_respected(self):
        tb = _tiny_tb()
        pb = pack_rows(tb, np.arange(tb.n), pack_len=4096, max_segs=2)
        assert int(pb.n_segs.max()) <= 2

    def test_fold_packing_excludes_own_fold(self):
        tb = _tiny_tb()
        k = 3
        fold_id = np.arange(tb.n) % k
        fp = pack_fold_datasets(tb, fold_id, k, pack_len=1024)
        assert isinstance(fp, FoldPacked) and fp.k == k
        assert 0.5 < fp.fill_fraction <= 1.0
        for f in range(k):
            nr = int(fp.n_rows[f])
            # only rows with a different fold id appear in fold f's pack
            segs = fp.n_segs[f, :nr]
            assert int(segs.sum()) == int((fold_id != f).sum())
            # padding rows beyond nr carry no segments
            assert (fp.n_segs[f, nr:] == 0).all()

    def test_packed_batches_index_real_rows(self):
        idx = make_packed_fold_batches(np.array([5, 3, 4]), batch_size=2,
                                       epochs=2, seed=0)
        assert idx.shape[1:] == (3, 2)
        for f, nr in enumerate([5, 3, 4]):
            assert idx[:, f].max() < nr


class TestPackedModelParity:
    def test_packed_forward_matches_per_sample(self):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        rng = np.random.default_rng(3)
        la, lb = 100, 70
        ta = rng.integers(1, 250, size=la).astype(np.int32)
        tc = rng.integers(1, 250, size=lb).astype(np.int32)
        packed = np.full((1, 256), 256, np.int32)  # pad_id
        packed[0, :la] = ta
        packed[0, la:la + lb] = tc
        seg = jnp.asarray([[0, la] + [int(fa.SEG_PAD)] * 6], jnp.int32)
        out = apply_model(params, jnp.asarray(packed), spec, seg_starts=seg)
        # per-sample forwards at bucket lengths matching each sample
        pa = np.full((1, 128), 256, np.int32)
        pa[0, :la] = ta
        oa = apply_model(params, jnp.asarray(pa), spec)
        pb = np.full((1, 128), 256, np.int32)
        pb[0, :lb] = tc
        ob = apply_model(params, jnp.asarray(pb), spec)
        np.testing.assert_allclose(np.asarray(out[0, :la]),
                                   np.asarray(oa[0, :la]), atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(out[0, la:la + lb]),
                                   np.asarray(ob[0, :lb]), atol=2e-4, rtol=2e-4)

    def test_packed_forward_matches_per_sample_pallas_interpret(self):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        rng = np.random.default_rng(4)
        la, lb = 128, 128
        ta = rng.integers(1, 250, size=la).astype(np.int32)
        tc = rng.integers(1, 250, size=lb).astype(np.int32)
        packed = np.concatenate([ta, tc])[None]
        seg = jnp.asarray([[0, la] + [int(fa.SEG_PAD)] * 6], jnp.int32)
        out = apply_model(params, jnp.asarray(packed), spec, seg_starts=seg,
                          use_pallas=True)
        ref = apply_model(params, jnp.asarray(packed), spec, seg_starts=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


from tst.models.lora import LoraSpec, init_lora  # noqa: E402
from tst.train.sft import (FoldTrainer, sft_loss,  # noqa: E402
                           sft_loss_window)


def _packed_vs_flat_setup():
    spec = spec_by_name("tiny", dtype=jnp.float32)
    params = init_params(jax.random.key(0), spec)
    lspec = LoraSpec(rank=4, alpha=8.0, targets=("q_proj", "v_proj"),
                     dtype=jnp.float32)
    lora = init_lora(jax.random.key(1), spec, lspec)
    # make B nonzero so the adapter actually contributes to the loss/grads
    lora = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.key(2), x.shape,
                                               x.dtype), lora)
    tb = _tiny_tb(n=8, max_len=256)
    pb = pack_rows(tb, np.arange(tb.n), pack_len=512)
    return spec, params, lspec, lora, tb, pb


class TestPackedLossParity:
    @pytest.mark.slow  # ~7-9 s on the 1-core host
    def test_full_loss_equal(self):
        spec, params, lspec, lora, tb, pb = _packed_vs_flat_setup()
        flat = sft_loss(params, lora, jnp.asarray(tb.tokens),
                        jnp.asarray(tb.loss_mask), spec, lspec)
        packed = sft_loss(params, lora, jnp.asarray(pb.tokens),
                          jnp.asarray(pb.loss_mask), spec, lspec,
                          seg_starts=jnp.asarray(pb.seg_starts))
        np.testing.assert_allclose(float(packed), float(flat), rtol=2e-5)

    def test_window_loss_equal(self):
        spec, params, lspec, lora, tb, pb = _packed_vs_flat_setup()
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
        flat = sft_loss_window(params, lora, jnp.asarray(tb.tokens),
                               jnp.asarray(tb.loss_mask),
                               jnp.asarray(tb.answer_pos), t_max, spec, lspec)
        packed = sft_loss_window(params, lora, jnp.asarray(pb.tokens),
                                 jnp.asarray(pb.loss_mask),
                                 jnp.asarray(pb.answer_pos), t_max, spec,
                                 lspec, seg_starts=jnp.asarray(pb.seg_starts))
        np.testing.assert_allclose(float(packed), float(flat), rtol=2e-5)

    @pytest.mark.slow  # ~9 s on the 1-core host
    def test_window_grads_equal(self):
        spec, params, lspec, lora, tb, pb = _packed_vs_flat_setup()
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
        gf = jax.grad(sft_loss_window, argnums=1)(
            params, lora, jnp.asarray(tb.tokens), jnp.asarray(tb.loss_mask),
            jnp.asarray(tb.answer_pos), t_max, spec, lspec)
        gp = jax.grad(
            lambda p, l: sft_loss_window(
                p, l, jnp.asarray(pb.tokens), jnp.asarray(pb.loss_mask),
                jnp.asarray(pb.answer_pos), t_max, spec, lspec,
                seg_starts=jnp.asarray(pb.seg_starts)),
            argnums=1)(params, lora)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)


class TestPackedTrainer:
    @pytest.mark.slow  # ~7-9 s on the 1-core host
    def test_packed_training_learns(self):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        lspec = LoraSpec(rank=4, alpha=8.0, targets=("q_proj", "v_proj"),
                         dtype=jnp.float32)
        tb = _tiny_tb(n=12, max_len=256)
        k = 3
        fold_id = np.arange(tb.n) % k
        fp = pack_fold_datasets(tb, fold_id, k, pack_len=512)
        batches = make_packed_fold_batches(fp.n_rows, batch_size=2, epochs=4,
                                           seed=0)
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
        tr = FoldTrainer(spec, lspec, k, lr=5e-3,
                         total_steps=batches.shape[0], t_max=t_max,
                         packed=True)
        lora, opt = tr.init_state(jax.random.key(1))
        lora, opt, log = tr.fit(
            params, lora, opt, jnp.asarray(fp.tokens),
            jnp.asarray(fp.loss_mask), batches,
            all_pos=jnp.asarray(fp.answer_pos),
            all_segs=jnp.asarray(fp.seg_starts), n_segs=fp.n_segs,
            log_every=1)
        assert log.losses[-1] < log.losses[0]
        # samples/s counts real segments, not packed rows
        idx = np.asarray(batches)
        fold_ax = np.arange(k)[None, :, None]
        expect = int(fp.n_segs[fold_ax, idx].sum())
        assert abs(log.samples_per_sec * log.wall_seconds - expect) < 1.0

    def test_segs_without_packed_flag_rejected(self):
        spec = spec_by_name("tiny", dtype=jnp.float32)
        lspec = LoraSpec(rank=4, alpha=8.0, targets=("q_proj",),
                         dtype=jnp.float32)
        tr = FoldTrainer(spec, lspec, 2, total_steps=2)
        with pytest.raises(ValueError, match="packed=True"):
            tr.fit(None, None, None, jnp.zeros((2, 4), jnp.int32),
                   jnp.zeros((2, 4)), np.zeros((1, 2, 1), np.int32),
                   all_segs=jnp.zeros((2, 1, 8), jnp.int32))


@pytest.mark.slow  # ~40 s on the 1-core host (full packed diagnose-sft)
class TestPackedPipeline:
    def test_diagnose_sft_with_packing(self, tmp_path):
        from tst.config import RunConfig
        from tst.data.adapters import load_benchmark
        from tst.train.pipeline import run_sft_diagnostic

        cfg = RunConfig()
        cfg.data.bench = "synthetic:0.8"
        cfg.data.k = 3
        cfg.data.n = 24
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.optim.epochs = 1
        cfg.optim.batch_size = 2
        cfg.optim.pack = True
        cfg.out_dir = str(tmp_path)
        ds = load_benchmark("synthetic:0.8", n=24, seed=0)
        report = run_sft_diagnostic(ds, cfg)
        assert report["pack_len"] % 128 == 0
        assert 0.3 < report["pack_fill_fraction"] <= 1.0
        assert report["n_samples"] == 24
        assert np.isfinite(report["final_loss"])


@pytest.mark.slow  # ~8 s on the 1-core host
class TestRowTiledFoldedOneshot:
    """The groups*S > FOLD_MAX_ROWS, S <= FOLD_ONESHOT_MAX_S auto branch:
    folded schedule with one group per row tile and a whole-KV tile."""

    def test_forward_and_grads_match_reference(self):
        # groups=9, s=512 -> 4608 folded rows > FOLD_MAX_ROWS(4096)
        q, k, v = _qkv(b=1, s=512, h=18, kvh=2, d=32)
        seg = jnp.asarray([[0, 300] + [int(fa.SEG_PAD)] * 6], jnp.int32)
        out = fa.flash_attention(q, k, v, causal=True, seg_starts=seg)
        ref = fa.mha_reference(q, k, v, causal=True, seg_starts=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        gf = jax.grad(lambda q, k, v: (fa.flash_attention(
            q, k, v, causal=True, seg_starts=seg) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: (fa.mha_reference(
            q, k, v, causal=True, seg_starts=seg) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_no_seg_matches_reference(self):
        q, k, v = _qkv(b=1, s=512, h=18, kvh=2, d=32)
        out = fa.flash_attention(q, k, v, causal=True)
        ref = fa.mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


class TestSegmentSparseSchedule:
    """The segment-sparse packed schedule (position-contiguous row tiles +
    KV tiles, dynamic causal/segment tile skipping — VERDICT r3 weak #1):
    parity vs the dense reference across tile sizes and segment layouts,
    including segments that straddle and align with tile boundaries."""

    def _sparse(self, monkeypatch, min_s=256, bq=128, chunk=64):
        monkeypatch.setattr(fa, "SEG_SPARSE_MIN_S", min_s)
        monkeypatch.setattr(fa, "SEG_BLOCK_Q", bq)
        monkeypatch.setattr(fa, "SEG_CHUNK", chunk)

    @pytest.mark.parametrize("starts", [
        [0],                  # single segment: pure causal
        [0, 100, 180],        # segments straddling the 128-tile boundary
        [0, 128],             # segment aligned exactly with a tile boundary
        [0, 30, 60, 90, 120, 150, 180, 210],  # MAX_SEGS tiny segments
    ])
    def test_forward_and_grads_match_reference(self, monkeypatch, starts):
        self._sparse(monkeypatch)
        q, k, v = _qkv(b=2, s=256, h=6, kvh=2, d=32)
        pad = int(fa.SEG_PAD)
        row = starts + [pad] * (fa.MAX_SEGS - len(starts))
        seg = jnp.asarray([row, [0, 96] + [pad] * 6], jnp.int32)
        out = fa.flash_attention(q, k, v, causal=True, seg_starts=seg)
        ref = fa.mha_reference(q, k, v, causal=True, seg_starts=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        gf = jax.grad(lambda a, b_, c: (fa.flash_attention(
            a, b_, c, causal=True, seg_starts=seg) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda a, b_, c: (fa.mha_reference(
            a, b_, c, causal=True, seg_starts=seg) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)
        for x, y in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-4, rtol=1e-4)

    def test_sparse_equals_oneshot_dispatch(self, monkeypatch):
        """Same numbers from the sparse schedule and the row-tiled one-shot
        it replaces (dispatch is a pure perf decision)."""
        q, k, v = _qkv(b=1, s=256, h=4, kvh=2, d=32)
        seg = jnp.asarray([[0, 90, 200] + [int(fa.SEG_PAD)] * 5], jnp.int32)
        monkeypatch.setattr(fa, "SEG_SPARSE_MIN_S", 1 << 30)  # off
        oneshot = fa.flash_attention(q, k, v, causal=True, seg_starts=seg)
        self._sparse(monkeypatch)
        sparse = fa.flash_attention(q, k, v, causal=True, seg_starts=seg)
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(oneshot),
                                   atol=2e-5, rtol=2e-5)

    def test_unaligned_tile_sizes_fall_back(self, monkeypatch):
        """S not divisible by the sparse tiles → the dispatch must fall back
        to a valid schedule, not error."""
        self._sparse(monkeypatch, min_s=256, bq=192, chunk=192)
        q, k, v = _qkv(b=1, s=256, h=4, kvh=2, d=32)
        seg = jnp.asarray([[0, 100] + [int(fa.SEG_PAD)] * 6], jnp.int32)
        out = fa.flash_attention(q, k, v, causal=True, seg_starts=seg)
        ref = fa.mha_reference(q, k, v, causal=True, seg_starts=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_padding_row_all_causal(self, monkeypatch):
        """The fold-padding rows' starts tile is [0, PAD...]: the sparse
        schedule must degrade to plain causal there, as the one-shot does."""
        self._sparse(monkeypatch)
        q, k, v = _qkv(b=1, s=256, h=4, kvh=2, d=32)
        seg = jnp.asarray([[0] + [int(fa.SEG_PAD)] * 7], jnp.int32)
        out = fa.flash_attention(q, k, v, causal=True, seg_starts=seg)
        ref = fa.flash_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.slow  # ~270 s on the 1-core host (multi-round packed IBP)
class TestPackedIBP:
    def test_ibp_with_packing_pins_shapes_and_prunes(self, tmp_path):
        import tempfile

        from tst.config import RunConfig
        from tst.debias.ibp import run_ibp

        cfg = RunConfig()
        cfg.data.k = 2
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.lora.rank = 4
        cfg.lora.alpha = 8.0
        cfg.lora.targets = ("q_proj", "v_proj")
        cfg.optim.lr = 5e-3
        cfg.optim.epochs = 5
        # batch_size counts PACKED ROWS (~3 samples each): 4 rows ≈ the
        # unpacked IBP test's per-step sample count at similar step counts
        cfg.optim.batch_size = 4
        cfg.optim.pack = True
        cfg.ibp.diagnostic = "sft"
        cfg.ibp.rounds = 3
        cfg.ibp.prune_rate = 0.25
        cfg.ibp.stop_epsilon = 0.05
        cfg.rf.cross_check = False
        cfg.out_dir = str(tmp_path)
        ds = make_synthetic_mcq(n=96, bias_fraction=0.5,
                                bias_kind="position", seed=0)
        rep = run_ibp(ds, cfg)
        assert rep["rounds_run"] >= 2
        accs = [a["blind_accuracy"] for a in rep["per_round"]]
        assert accs[0] > 0.4  # position shortcut learned in round 0
        assert accs[-1] < accs[0]  # pruning reduces exploitability
        assert rep["fraction_kept"] < 1.0

    def test_packed_scorer_trajectory_matches_unpacked(self, tmp_path):
        """optim.packed_scorer routes IBP's held-out MCQ scoring through the
        packed grid (VERDICT r4 item 2). Packed letter probs can differ from
        unpacked at ~1e-2, so the gate rides the config hash — this pins
        that on a planted-bias set (where s(x) gaps are far wider than the
        scorer delta) both runners prune the SAME rows every round."""
        from tst.config import RunConfig
        from tst.debias.ibp import run_ibp

        def run(packed_scorer: bool, out):
            cfg = RunConfig()
            cfg.data.k = 2
            cfg.model.name = "tiny"
            cfg.model.dtype = "float32"
            cfg.model.use_pallas = False
            cfg.lora.rank = 4
            cfg.lora.alpha = 8.0
            cfg.lora.targets = ("q_proj", "v_proj")
            cfg.optim.lr = 5e-3
            cfg.optim.epochs = 3
            cfg.optim.batch_size = 4
            cfg.optim.pack = True
            cfg.optim.packed_scorer = packed_scorer
            cfg.ibp.diagnostic = "sft"
            cfg.ibp.rounds = 2
            cfg.ibp.prune_rate = 0.25
            cfg.ibp.stop_epsilon = 0.0  # same round count in both runs
            cfg.rf.cross_check = False
            cfg.out_dir = str(out)
            ds = make_synthetic_mcq(n=64, bias_fraction=0.5,
                                    bias_kind="position", seed=0)
            return run_ibp(ds, cfg)

        rep_p = run(True, tmp_path / "packed")
        rep_u = run(False, tmp_path / "unpacked")
        assert rep_p["rounds_run"] == rep_u["rounds_run"]
        assert rep_p["n_debiased"] == rep_u["n_debiased"]
        kept_p = (tmp_path / "packed" / "debiased.jsonl").read_text()
        kept_u = (tmp_path / "unpacked" / "debiased.jsonl").read_text()
        assert kept_p == kept_u  # identical rows pruned, identical order


@pytest.mark.slow  # ~12 s on the 1-core host
class TestPackedTransfer:
    def test_train_transfer_with_packing(self, tmp_path):
        from tst.config import RunConfig
        from tst.data.adapters import load_benchmark
        from tst.train.transfer import run_train_transfer

        cfg = RunConfig()
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.optim.epochs = 1
        cfg.optim.batch_size = 2
        cfg.optim.pack = True
        cfg.out_dir = str(tmp_path)
        train_ds = load_benchmark("synthetic:0.8", n=24, seed=0)
        eval_ds = load_benchmark("synthetic:0.8", n=16, seed=1)
        rep = run_train_transfer(train_ds, eval_ds, cfg)
        assert rep["experiment"] == "train_transfer"
        assert np.isfinite(rep["final_loss"])
        assert 0.0 <= rep["blind_accuracy"] <= 1.0


@pytest.mark.slow  # ~7 s on the 1-core host
class TestMidSeqFoldedDispatch:
    """groups*S <= FOLD_MAX_ROWS but S >= 1024: the dispatch now takes the
    row-tiled one-shot (whole-rows + kv tiles VMEM-OOMs at d=128 on 8B
    geometry and measured slower at 0.5B)."""

    def test_s1024_parity(self):
        q, k, v = _qkv(b=1, s=1024, h=4, kvh=2, d=32)  # rows 2048 <= 4096
        seg = jnp.asarray([[0, 700] + [int(fa.SEG_PAD)] * 6], jnp.int32)
        out = fa.flash_attention(q, k, v, causal=True, seg_starts=seg)
        ref = fa.mha_reference(q, k, v, causal=True, seg_starts=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        gf = jax.grad(lambda a, b_, c: (fa.flash_attention(
            a, b_, c, causal=True, seg_starts=seg) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda a, b_, c: (fa.mha_reference(
            a, b_, c, causal=True, seg_starts=seg) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)
        for x, y in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-4, rtol=1e-4)
