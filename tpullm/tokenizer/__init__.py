"""Tokenizers: SPM (SentencePiece-style) and byte-level BPE, loaded from GGUF
metadata. WPM/UGM/RWKV-trie families follow (reference supports 7 families,
llama.h:71-79)."""

from __future__ import annotations

from ..gguf.reader import GGUFReader
from .bpe import BPETokenizer
from .spm import SPMTokenizer
from .vocab import SpecialIds, Vocab
from .ugm import UGMTokenizer
from .wpm import WPMTokenizer

Tokenizer = SPMTokenizer | BPETokenizer | WPMTokenizer | UGMTokenizer


def from_vocab(vocab: Vocab) -> Tokenizer:
    if vocab.model in ("llama", "spm"):
        return SPMTokenizer(vocab)
    if vocab.model in ("gpt2", "bpe"):
        return BPETokenizer(vocab)
    if vocab.model in ("bert", "wpm"):
        return WPMTokenizer(vocab)
    if vocab.model in ("t5", "ugm"):
        return UGMTokenizer(vocab)
    if vocab.model == "rwkv":
        from .rwkv import RWKVTokenizer

        return RWKVTokenizer(vocab)
    if vocab.model == "plamo2":
        from .plamo2 import Plamo2Tokenizer

        return Plamo2Tokenizer(vocab)
    raise NotImplementedError(f"tokenizer model {vocab.model!r} not supported yet")


def from_gguf(r: GGUFReader) -> Tokenizer:
    return from_vocab(Vocab.from_gguf(r))


def load(path) -> Tokenizer:
    return from_gguf(GGUFReader(path))


__all__ = [
    "Vocab",
    "SpecialIds",
    "SPMTokenizer",
    "BPETokenizer",
    "WPMTokenizer",
    "UGMTokenizer",
    "Tokenizer",
    "from_vocab",
    "from_gguf",
    "load",
]
