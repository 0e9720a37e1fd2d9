"""Native C++ packing kernel: byte-identical to the Python path + faster."""

import time

import numpy as np
import pytest

from tst.data.schema import BlindDataset, Sample
from tst.data.synthetic import make_synthetic_mcq, make_synthetic_numeric
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.native.fast_pack import native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++")


def _assert_identical(ds, **kw):
    t = ByteTokenizer()
    py = tokenize_dataset(ds, t, backend="python", **kw)
    nat = tokenize_dataset(ds, t, backend="native", **kw)
    np.testing.assert_array_equal(py.tokens, nat.tokens)
    np.testing.assert_array_equal(py.loss_mask, nat.loss_mask)
    np.testing.assert_array_equal(py.answer_pos, nat.answer_pos)
    np.testing.assert_array_equal(py.lengths, nat.lengths)
    np.testing.assert_array_equal(py.gold, nat.gold)
    np.testing.assert_array_equal(py.n_options, nat.n_options)
    np.testing.assert_array_equal(py.option_token_ids, nat.option_token_ids)


class TestNativeParity:
    def test_mcq(self):
        _assert_identical(make_synthetic_mcq(n=64, bias_fraction=0.5, seed=0))

    def test_numeric_and_mixed(self):
        mcq = make_synthetic_mcq(n=16, seed=1)
        num = make_synthetic_numeric(n=16, seed=1)
        _assert_identical(BlindDataset("mixed", list(mcq) + list(num)))

    def test_truncation(self):
        ds = BlindDataset("t", [
            Sample(id=f"s{i}", question="pick B", options=["a", "b", "c", "d"],
                   answer="B", context="x" * (3000 + 517 * i), category="c")
            for i in range(8)
        ])
        _assert_identical(ds, max_len=256)

    def test_unicode(self):
        ds = BlindDataset("t", [
            Sample(id="u", question="什么颜色 é ü?", options=["红", "蓝"],
                   answer="A", category="c")
        ])
        _assert_identical(ds)

    def test_target_too_large_error(self):
        # public API rounds L up to >=128, so drive the kernel directly
        from tst.native.fast_pack import pack_byte_batch

        p = b"a" * 20
        t = b"bbbb"
        with pytest.raises(ValueError, match="nearly fills"):
            pack_byte_batch(p, np.array([0, 20], np.int64),
                            t, np.array([0, 4], np.int64),
                            L=8, pad_id=256, bos_id=257, eos_id=258)

    def test_default_routes_native(self):
        ds = make_synthetic_mcq(n=8, seed=0)
        tb = tokenize_dataset(ds, ByteTokenizer())  # backend="auto"
        py = tokenize_dataset(ds, ByteTokenizer(), backend="python")
        np.testing.assert_array_equal(tb.tokens, py.tokens)


class TestNativeSpeed:
    def test_faster_on_long_transcripts(self):
        ds = BlindDataset("t", [
            Sample(id=f"s{i}", question="Which speaker said X?",
                   options=["alice", "bob", "carol", "dan"],
                   answer="B", category="c",
                   context=("[%05d] lorem ipsum dolor sit amet " % i) * 1500)
            for i in range(64)
        ])  # ~48k chars each
        t = ByteTokenizer()
        t0 = time.perf_counter()
        tokenize_dataset(ds, t, backend="python")
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        tokenize_dataset(ds, t, backend="native")
        t_nat = time.perf_counter() - t0
        assert t_nat < t_py, (t_py, t_nat)
        print(f"python {t_py:.2f}s vs native {t_nat:.2f}s ({t_py/t_nat:.1f}x)")
