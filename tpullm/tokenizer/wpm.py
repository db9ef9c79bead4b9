"""WordPiece (WPM/BERT) tokenizer.

Behavioral equivalent of the reference llm_tokenizer_wpm_session
(src/llama-vocab.cpp:670-790): NFD-normalize + lowercase, split on
whitespace with punctuation/ascii-symbols/CJK as single-char words, then
greedy longest-match against the vocab with a phantom "▁" word prefix.
"""

from __future__ import annotations

import unicodedata

from .vocab import Vocab

PHANTOM = "▁"

_CJK_RANGES = (
    (0x04E00, 0x09FFF),
    (0x03400, 0x04DBF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B920, 0x2CEAF),
    (0x0F900, 0x0FAFF),
    (0x2F800, 0x2FA1F),
)


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


class WPMTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.max_token_len = max((len(t) for t in vocab.tokens), default=1)

    @staticmethod
    def preprocess(text: str) -> list[str]:
        # per-codepoint lossy NFD: keep only the first codepoint of each
        # decomposition (the reference's unicode_cpts_normalize_nfd maps each
        # codepoint to a single replacement, dropping combining marks)
        norm = "".join(unicodedata.normalize("NFD", ch)[0] for ch in text)
        words: list[str] = [""]
        for ch in norm:
            cp = ord(ch)
            if ch.isspace():
                if words[-1]:
                    words.append("")
                continue
            cat = unicodedata.category(ch)
            if cp == 0 or cp == 0xFFFD or cat.startswith("C"):
                continue
            s = ch.lower()
            if cat.startswith("P") or (cp < 0x7F and cat.startswith("S")) or _is_cjk(cp):
                if words[-1]:
                    words.append("")
                words[-1] = s
                words.append("")
            else:
                words[-1] += s
        if words and not words[-1]:
            words.pop()
        return words

    def tokenize_fragment(self, text: str) -> list[int]:
        vocab = self.vocab
        out: list[int] = []
        for word in self.preprocess(text):
            if not word:
                continue
            word1 = PHANTOM + word
            n = len(word1)
            start_len = len(out)
            i = 0
            failed = False
            while i < n:
                match = False
                for j in range(min(n, i + self.max_token_len + 1), i, -1):
                    tid = vocab.token_to_id.get(word1[i:j])
                    if tid is not None:
                        out.append(tid)
                        i = j
                        match = True
                        break
                if not match:
                    del out[start_len:]
                    failed = True
                    break
            if failed or len(out) == start_len:
                if vocab.special.unk >= 0:
                    out.append(vocab.special.unk)
        return out

    def tokenize(
        self, text: str, add_special: bool = True, parse_special: bool = False
    ) -> list[int]:
        vocab = self.vocab
        out: list[int] = []
        # BERT-style: [CLS] text [SEP] — bos/eos carry cls/sep ids in GGUF
        if add_special and vocab.special.bos >= 0:
            out.append(vocab.special.bos)
        for frag in vocab.partition_specials(text, parse_special):
            if isinstance(frag, int):
                out.append(frag)
            else:
                out.extend(self.tokenize_fragment(frag))
        if add_special and vocab.special.sep >= 0:
            out.append(vocab.special.sep)
        return out

    def piece_bytes(self, tid: int) -> bytes:
        vocab = self.vocab
        ttype = vocab.token_type(tid)
        if ttype.name in ("CONTROL", "UNKNOWN"):
            return b""
        return vocab.tokens[tid].replace(PHANTOM, " ").encode("utf-8")

    def detokenize(self, ids, remove_special: bool = False, unparse_special: bool = False) -> str:
        vocab = self.vocab
        pieces = []
        for tid in ids:
            text = vocab.tokens[tid]
            ttype = vocab.token_type(tid)
            if ttype.name in ("CONTROL", "UNKNOWN") and not unparse_special:
                continue
            pieces.append(text.replace(PHANTOM, " "))
        return "".join(pieces).strip()
