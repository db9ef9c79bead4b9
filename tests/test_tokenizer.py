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


# -- RWKV trie tokenizer (≡ llm_tokenizer_rwkv, src/llama-vocab.cpp) ----------


def _rwkv_vocab():
    from tpullm.tokenizer.vocab import SpecialIds, Vocab

    # escaped byte strings, as stored in RWKV world GGUFs
    tokens = [
        "<unk>",      # 0 (unk)
        "a", "b", "c",
        "ab", "abc",
        "\\n", "\\t",
        "\\x41\\x42",  # "AB"
        " ", "the", " the",
    ]
    return Vocab(model="rwkv", pre="", tokens=tokens, scores=None,
                 token_types=None,
                 special=SpecialIds(unk=0), add_bos=False, add_eos=False)


def test_rwkv_unescape():
    from tpullm.tokenizer.rwkv import unescape_rwkv_token

    assert unescape_rwkv_token("abc") == b"abc"
    assert unescape_rwkv_token("\\n\\t\\r") == b"\n\t\r"
    assert unescape_rwkv_token("\\x41\\xff") == b"A\xff"
    assert unescape_rwkv_token("\\\\") == b"\\"


def test_rwkv_greedy_longest_match():
    from tpullm.tokenizer import from_vocab

    tok = from_vocab(_rwkv_vocab())
    v = _rwkv_vocab().tokens
    # "abc" matches the 3-byte token, not a+b+c
    assert tok.tokenize("abc", add_special=False) == [v.index("abc")]
    # "abab" -> ab + ab (no "abab" entry)
    assert tok.tokenize("abab", add_special=False) == [v.index("ab")] * 2
    # longest match wins mid-string: "ab" then "c" not in "abc..." context
    assert tok.tokenize("abca", add_special=False) == [
        v.index("abc"), v.index("a")]
    # escaped-byte token "AB"
    assert tok.tokenize("AB", add_special=False) == [v.index("\\x41\\x42")]
    # space-prefixed word beats space + word
    assert tok.tokenize(" the", add_special=False) == [v.index(" the")]


def test_rwkv_unknown_bytes():
    from tpullm.tokenizer import from_vocab

    tok = from_vocab(_rwkv_vocab())
    ids = tok.tokenize("a?b", add_special=False)
    assert ids == [1, 0, 2]  # '?' has no entry -> unk


def test_rwkv_detokenize_roundtrip():
    from tpullm.tokenizer import from_vocab

    tok = from_vocab(_rwkv_vocab())
    text = "abc ab the\n\tab"
    ids = tok.tokenize(text, add_special=False)
    assert tok.detokenize(ids) == text


def test_plamo2_tokenizer_viterbi_and_byte_fallback():
    """PLaMo-2 suffix-DP tokenizer (llm_tokenizer_plamo2): min-cost piece
    segmentation with longest-wins ties and UTF-8 byte fallback."""
    import numpy as np
    from tpullm.tokenizer import from_vocab
    from tpullm.tokenizer.vocab import Vocab, TokenType

    tokens = ["<unk>", "<s>", "</s>"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TokenType.BYTE)
        scores.append(0.0)
    pieces = [("hello", -1.0), ("hell", -0.5), ("o", -0.8), ("he", -0.7),
              ("llo", -0.2), (" world", -1.5), (" ", -3.0), ("world", -2.0)]
    for text, sc in pieces:
        tokens.append(text)
        types.append(TokenType.NORMAL)
        scores.append(sc)
    v = Vocab(model="plamo2", pre="default", tokens=tokens,
              scores=np.asarray(scores, dtype=np.float32),
              token_types=np.asarray([int(t) for t in types], dtype=np.int32),
              add_bos=True)
    v.special.bos = 1
    v.special.eos = 2
    v.special.unk = 0
    tok = from_vocab(v)
    base = 259  # first piece id

    # "hello world": maximize total score — he(-0.7)+llo(-0.2) = -0.9 beats
    # hello(-1.0) and hell(-0.5)+o(-0.8) = -1.3
    ids = tok.tokenize("hello world", add_special=False)
    assert ids == [base + 3, base + 4, base + 5]  # he, llo, " world"
    assert tok.detokenize(ids) == "hello world"

    # unknown char → byte fallback: "é" = 0xC3 0xA9
    ids = tok.tokenize("é", add_special=False)
    assert ids == [3 + 0xC3, 3 + 0xA9]
    assert tok.detokenize(ids) == "é"

    # bos prepended with add_special
    ids = tok.tokenize("hello", add_special=True)
    assert ids[0] == 1
