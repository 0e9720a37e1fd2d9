"""End-to-end diagnose-sft with data.prompt_style='chat' (VERDICT r2 #4).

Builds a real (offline) HF fast tokenizer with a chat template, saves it to
disk, and runs the full k-fold SFT diagnostic through it — verifying the
chat-rendered prompts flow through tokenize → train → held-out scoring.
"""

import numpy as np
import pytest

from tst.config import RunConfig
from tst.data.schema import OPTION_LETTERS
from tst.data.synthetic import make_synthetic_mcq
from tst.train.pipeline import build_tokenizer, run_sft_diagnostic


@pytest.fixture(scope="module")
def chat_tok_dir(tmp_path_factory):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    merges = []
    for letter in OPTION_LETTERS:  # bare letters are single tokens already
        pair = ("Ġ", letter)
        vocab["Ġ" + letter] = len(vocab)
        merges.append(pair)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok)
    fast.add_special_tokens({"pad_token": "<pad>", "eos_token": "<eos>",
                             "bos_token": "<bos>"})
    fast.chat_template = (
        "{% for m in messages %}<|{{ m.role }}|>{{ m.content }}<|end|>"
        "{% endfor %}{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    d = tmp_path_factory.mktemp("chat_tok")
    fast.save_pretrained(str(d))
    return str(d)


def _cfg(chat_tok_dir, tmp_path, style):
    cfg = RunConfig()
    cfg.data.k = 2
    cfg.data.prompt_style = style
    cfg.model.name = "tiny"
    cfg.model.dtype = "float32"
    cfg.model.use_pallas = False
    cfg.model.tokenizer = chat_tok_dir
    cfg.lora.rank = 4
    cfg.lora.alpha = 8.0
    cfg.lora.targets = ("q_proj", "v_proj")
    cfg.optim.lr = 5e-3
    cfg.optim.epochs = 3
    cfg.optim.batch_size = 8
    cfg.rf.cross_check = False
    cfg.out_dir = str(tmp_path)
    return cfg


@pytest.mark.slow  # ~23 s on the 1-core host
def test_chat_pipeline_detects_planted_bias(chat_tok_dir, tmp_path):
    ds = make_synthetic_mcq(n=48, bias_fraction=1.0, bias_kind="position",
                            seed=0)
    cfg = _cfg(chat_tok_dir, tmp_path / "chat", "chat")
    tok = build_tokenizer(cfg)
    assert tok.chat is True and tok.single_token_options is True
    rep = run_sft_diagnostic(ds, cfg)
    # the chat-rendered pipeline must still learn the planted position
    # shortcut well above chance
    assert rep["blind_accuracy"] > rep["chance_accuracy"] + 0.2, rep


@pytest.mark.slow  # ~31 s on the 1-core host
def test_chat_and_completion_agree_on_shape(chat_tok_dir, tmp_path):
    """Same dataset, both prompt styles: both must produce a full report
    with per-sample s(x) (smoke that nothing silently drops rows)."""
    ds = make_synthetic_mcq(n=24, bias_fraction=0.5, seed=1)
    for style in ("completion", "chat"):
        cfg = _cfg(chat_tok_dir, tmp_path / style, style)
        rep = run_sft_diagnostic(ds, cfg)
        assert rep["n_samples"] == 24
        sx = np.loadtxt(f"{cfg.out_dir}/sx.jsonl", dtype=str)
        assert len(sx) == 24
