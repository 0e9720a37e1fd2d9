"""HFTokenizer adapter test with a programmatically-built BPE tokenizer
(no network in this environment — we construct a byte-level BPE whose merges
make " A".." J" single tokens, exactly like Llama/Qwen BPE vocabularies)."""

import numpy as np
import pytest

from tst.data.schema import OPTION_LETTERS, BlindDataset, Sample
from tst.data.tokenize import HFTokenizer, tokenize_dataset


@pytest.fixture(scope="module")
def hf_tok():
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders
    from transformers import PreTrainedTokenizerFast

    # byte-level alphabet + merges for "Ġ<letter>" (Ġ = leading space)
    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    merges = []
    for letter in OPTION_LETTERS:
        pair = ("Ġ", letter)
        merged = "Ġ" + letter
        vocab[merged] = len(vocab)
        merges.append(pair)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok)
    fast.add_special_tokens({"pad_token": "<pad>", "eos_token": "<eos>",
                             "bos_token": "<bos>"})
    return fast


class TestHFTokenizer:
    def test_single_token_invariant_verified(self, hf_tok):
        t = HFTokenizer(hf_tok)
        ids = t.option_token_ids(10)
        assert len(set(ids.tolist())) == 10
        for letter, tid in zip(OPTION_LETTERS, ids):
            assert t.tok.decode([int(tid)]).strip() == letter

    def test_encode_example(self, hf_tok):
        t = HFTokenizer(hf_tok)
        p, tgt = t.encode_example("Question: q?\nAnswer:", " B")
        assert p[0] == t.bos_id
        assert tgt[0] == t.option_token_ids(4)[1]
        assert tgt[-1] == t.eos_id

    def test_tokenize_dataset_roundtrip(self, hf_tok):
        t = HFTokenizer(hf_tok)
        ds = BlindDataset("t", [
            Sample(id=f"s{i}", question="Which one?", options=["aa", "bb", "cc"],
                   answer=OPTION_LETTERS[i % 3], category="c")
            for i in range(6)
        ])
        tb = tokenize_dataset(ds, t)
        for i, s in enumerate(ds):
            first_target = tb.tokens[i, tb.answer_pos[i] + 1]
            assert first_target == tb.option_token_ids[s.answer_index]

    def test_rejects_tokenizer_without_invariant(self, hf_tok):
        """A tokenizer splitting ' A' into two tokens must be refused."""
        class Fake:
            pad_token_id, bos_token_id, eos_token_id = 0, 1, 2

            def encode(self, text, add_special_tokens=False):
                return [ord(c) for c in text]  # char-level: ' A' -> 2 tokens

            def __len__(self):
                return 300

        with pytest.raises(ValueError, match="one token"):
            HFTokenizer(Fake())
