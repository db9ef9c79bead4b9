"""PLaMo-2 tokenizer (suffix-automaton Viterbi).

Reference: llm_tokenizer_plamo2 (src/llama-vocab.cpp:1242) — a
minimum-cost dynamic program from the end of the text where every vocab
piece (non-byte, finite score) matching at position i costs
−round(score·1e4) and a single-codepoint "unknown" fallback costs 1e7 and
is emitted as UTF-8 byte tokens (<0xNN>). Ties prefer the LONGEST piece
(the reference's table orders pieces by decreasing length and updates on
strict improvement only).
"""

from __future__ import annotations

from .vocab import Vocab

UNKNOWN_COST = 10_000_000  # −UNKNOWN_SCORE


class Plamo2Tokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.bytes_ = [0] * 256
        self.pieces: dict[str, tuple[int, int]] = {}  # text → (token_id, cost)
        self.max_len = 1
        for tid, text in enumerate(vocab.tokens):
            ttype = vocab.token_type(tid).name
            if ttype == "BYTE":
                if len(text) == 6 and text.startswith("<0x") and text.endswith(">"):
                    self.bytes_[int(text[3:5], 16)] = tid
                continue
            score = float(vocab.scores[tid]) if vocab.scores is not None else 0.0
            if score != score:  # NaN → structural suffix, not a token
                continue
            self.pieces[text] = (tid, -int(round(score * 1e4)))
            self.max_len = max(self.max_len, len(text))

    def tokenize_fragment(self, text: str) -> list[int]:
        if text and text[0] == "﻿":  # strip BOM
            text = text[1:]
        if not text:
            return []
        n = len(text)
        INF = 1 << 60
        scores = [INF] * (n + 1)
        scores[n] = 0
        back: list[tuple[int, int] | None] = [None] * n  # (length, token_id)
        for i in range(n - 1, -1, -1):
            # vocab pieces, longest first (ties prefer longer per reference)
            hi = min(n, i + self.max_len)
            for j in range(hi, i, -1):
                hit = self.pieces.get(text[i:j])
                if hit is None:
                    continue
                tid, cost = hit
                s = scores[j] + cost
                if s < scores[i]:
                    scores[i] = s
                    back[i] = (j - i, tid)
            # single-codepoint unknown fallback (byte emission)
            s = scores[i + 1] + UNKNOWN_COST
            if s < scores[i]:
                scores[i] = s
                back[i] = (1, -1)
        out: list[int] = []
        pos = 0
        while pos < n:
            length, tid = back[pos]
            if tid >= 0:
                out.append(tid)
            else:
                for b in text[pos].encode("utf-8"):
                    out.append(self.bytes_[b])
            pos += length
        return out

    def tokenize(self, text: str, add_special: bool = True,
                 parse_special: bool = False) -> list[int]:
        vocab = self.vocab
        out: list[int] = []
        for frag in vocab.partition_specials(text, parse_special):
            if isinstance(frag, int):
                out.append(frag)
            else:
                out.extend(self.tokenize_fragment(frag))
        if add_special and vocab.add_bos and vocab.special.bos >= 0:
            if not out or out[0] != vocab.special.bos:
                out.insert(0, vocab.special.bos)
        if add_special and vocab.add_eos and vocab.special.eos >= 0:
            out.append(vocab.special.eos)
        return out

    def detokenize(
        self, ids: list[int], remove_special: bool = False,
        unparse_special: bool = False,
    ) -> str:
        vocab = self.vocab
        ids = list(ids)
        if remove_special:
            if vocab.add_bos and ids and ids[0] == vocab.special.bos:
                ids = ids[1:]
            if vocab.add_eos and ids and ids[-1] == vocab.special.eos:
                ids = ids[:-1]
        buf = bytearray()
        for tid in ids:
            text = vocab.tokens[tid]
            ttype = vocab.token_type(tid).name
            if ttype == "BYTE":
                buf += bytes([int(text[3:5], 16)])
            elif ttype in ("CONTROL", "UNKNOWN"):
                if unparse_special:
                    buf += text.encode("utf-8")
            else:
                buf += text.encode("utf-8")
        return buf.decode("utf-8", errors="replace")
