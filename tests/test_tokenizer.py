"""Tokenizer conformance vs the reference's ggml-vocab-*.{inp,out} fixtures
(the test-tokenizer-0.cpp analog) plus roundtrip/unit tests."""

import os
from pathlib import Path

import pytest

import tpullm.tokenizer as tok

MODELS_DIR = Path("/root/reference/models")

# fixtures with both a .gguf and .inp/.out conformance pairs
FIXTURES = [
    "llama-spm",
    "phi-3",
    "gpt-2",
    "deepseek-coder",
    "deepseek-llm",
    "falcon",
    "mpt",
    "refact",
    "starcoder",
    "bert-bge",
]


def load_pairs(name: str):
    inp = (MODELS_DIR / f"ggml-vocab-{name}.gguf.inp").read_text(encoding="utf-8")
    out = (MODELS_DIR / f"ggml-vocab-{name}.gguf.out").read_text(encoding="utf-8")
    texts = inp.split("\n__ggml_vocab_test__\n")
    expected = [
        [int(x) for x in line.split()] for line in out.split("\n")
    ]
    # trailing newline handling: .out has one line per test
    expected = expected[: len(texts)]
    return list(zip(texts, expected))


@pytest.mark.parametrize("name", FIXTURES)
def test_tokenizer_conformance(name):
    gguf_path = MODELS_DIR / f"ggml-vocab-{name}.gguf"
    if not gguf_path.exists():
        pytest.skip("reference fixtures not available")
    t = tok.load(gguf_path)
    pairs = load_pairs(name)
    assert pairs, "no test pairs parsed"
    bad = []
    for text, want in pairs:
        got = t.tokenize(text, add_special=False, parse_special=False)
        if got != want:
            bad.append((text, want, got))
    assert not bad, f"{len(bad)}/{len(pairs)} mismatches; first: {bad[0]!r}"


@pytest.mark.parametrize("name", ["llama-spm", "gpt-2", "starcoder"])
def test_detokenize_roundtrip(name):
    gguf_path = MODELS_DIR / f"ggml-vocab-{name}.gguf"
    if not gguf_path.exists():
        pytest.skip("reference fixtures not available")
    t = tok.load(gguf_path)
    for text in ["Hello world", "  leading spaces", "tabs\tand\nnewlines", "números àccênts"]:
        ids = t.tokenize(text, add_special=False)
        rt = t.detokenize(ids)
        assert rt == text, f"{name}: {text!r} -> {ids} -> {rt!r}"


def test_special_token_partition():
    gguf_path = MODELS_DIR / "ggml-vocab-llama-spm.gguf"
    if not gguf_path.exists():
        pytest.skip("reference fixtures not available")
    t = tok.load(gguf_path)
    v = t.vocab
    # parse_special=True turns <s>/</s> into control ids
    ids = t.tokenize("<s>hi</s>", add_special=False, parse_special=True)
    assert ids[0] == v.special.bos
    assert ids[-1] == v.special.eos
    # parse_special=False keeps them as text
    ids2 = t.tokenize("<s>hi</s>", add_special=False, parse_special=False)
    assert v.special.bos not in ids2


def test_add_bos():
    gguf_path = MODELS_DIR / "ggml-vocab-llama-spm.gguf"
    if not gguf_path.exists():
        pytest.skip("reference fixtures not available")
    t = tok.load(gguf_path)
    ids = t.tokenize("hello", add_special=True)
    assert ids[0] == t.vocab.special.bos


def test_ugm_viterbi_segmentation():
    """UGM picks the max-score segmentation (≡ llm_tokenizer_ugm Viterbi)."""
    import numpy as np

    from tpullm.gguf.constants import TokenType
    from tpullm.tokenizer.ugm import UGMTokenizer
    from tpullm.tokenizer.vocab import SpecialIds, Vocab

    tokens = ["<unk>", "</s>", "▁", "▁he", "llo", "▁hello", "▁hell", "o",
              "▁wor", "ld", "▁world", "h", "e", "l", "w", "r", "d"]
    scores = np.array([-20, 0, -5, -4, -4, -3, -6, -3,
                       -4, -3, -2.5, -8, -8, -8, -8, -8, -8], dtype=np.float32)
    types = np.array([TokenType.UNKNOWN, TokenType.CONTROL] + [TokenType.NORMAL] * 15,
                     dtype=np.int32)
    vocab = Vocab(model="t5", pre="default", tokens=tokens, scores=scores,
                  token_types=types,
                  special=SpecialIds(unk=0, eos=1), add_eos=True,
                  add_space_prefix=True)
    tok = UGMTokenizer(vocab)
    ids = tok.tokenize("hello world", add_special=True)
    # best segmentation: ▁hello (-3) + ▁world (-2.5), then </s>
    assert ids == [tokens.index("▁hello"), tokens.index("▁world"), 1]
    assert tok.detokenize(ids, remove_special=True) == "hello world"


def test_ugm_unknown_fallback():
    import numpy as np

    from tpullm.gguf.constants import TokenType
    from tpullm.tokenizer.ugm import UGMTokenizer
    from tpullm.tokenizer.vocab import SpecialIds, Vocab

    tokens = ["<unk>", "▁", "a", "b"]
    scores = np.array([-20, -1, -1, -1], dtype=np.float32)
    types = np.array([TokenType.UNKNOWN] + [TokenType.NORMAL] * 3, dtype=np.int32)
    vocab = Vocab(model="t5", pre="default", tokens=tokens, scores=scores,
                  token_types=types, special=SpecialIds(unk=0),
                  add_space_prefix=False)
    tok = UGMTokenizer(vocab)
    ids = tok.tokenize("aXYb", add_special=False)
    # consecutive unknowns collapse into one UNK (reference behavior)
    assert ids == [tokens.index("a"), 0, tokens.index("b")]
