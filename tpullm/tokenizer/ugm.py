"""UGM (SentencePiece Unigram, T5-family) tokenizer.

Reference: llm_tokenizer_ugm_session (src/llama-vocab.cpp) — Viterbi
maximum-score segmentation over the scored vocab with byte/unknown fallback.
The precompiled_charsmap normalization table is not applied (plain
whitespace-escape normalization, which covers the common T5 checkpoints).
"""

from __future__ import annotations

from .vocab import Vocab

SPM_SPACE = "▁"  # ▁


class UGMTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.max_len = max((len(t) for t in vocab.tokens), default=1)
        scores = vocab.scores
        self.min_score = float(scores.min()) if scores is not None else -20.0
        self.unk_penalty = self.min_score - 10.0

    def tokenize_fragment(self, text: str) -> list[int]:
        vocab = self.vocab
        if not text:
            return []
        n = len(text)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: list[tuple[int, int] | None] = [None] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == NEG:
                continue
            hi = min(n, i + self.max_len)
            matched = False
            for j in range(i + 1, hi + 1):
                tid = vocab.token_to_id.get(text[i:j])
                if tid is None:
                    continue
                sc = float(vocab.scores[tid]) if vocab.scores is not None else 0.0
                if vocab.token_type(tid).name in ("CONTROL", "UNKNOWN"):
                    continue
                matched = True
                cand = best[i] + sc
                if cand > best[j]:
                    best[j] = cand
                    back[j] = (i, tid)
            if not matched or best[i + 1] == NEG:
                # unknown single char fallback (merged later like the reference)
                cand = best[i] + self.unk_penalty
                if cand > best[i + 1]:
                    best[i + 1] = cand
                    back[i + 1] = (i, vocab.special.unk)
        # trace back
        out: list[int] = []
        pos = n
        while pos > 0:
            i, tid = back[pos]
            out.append(tid)
            pos = i
        out.reverse()
        # merge consecutive unk tokens (reference collapses runs of unknowns)
        merged: list[int] = []
        for tid in out:
            if (
                tid == self.vocab.special.unk
                and merged
                and merged[-1] == self.vocab.special.unk
            ):
                continue
            merged.append(tid)
        return merged

    def tokenize(self, text: str, add_special: bool = True,
                 parse_special: bool = False) -> list[int]:
        vocab = self.vocab
        out: list[int] = []
        for frag in vocab.partition_specials(text, parse_special):
            if isinstance(frag, int):
                out.append(frag)
                continue
            raw = frag
            if vocab.add_space_prefix and (not out):
                raw = " " + raw
            raw = raw.replace(" ", SPM_SPACE)
            out.extend(self.tokenize_fragment(raw))
        if add_special and vocab.add_eos and vocab.special.eos >= 0:
            out.append(vocab.special.eos)
        if add_special and vocab.add_bos and vocab.special.bos >= 0:
            out.insert(0, vocab.special.bos)
        return out

    def piece_bytes(self, tid: int) -> bytes:
        vocab = self.vocab
        if vocab.token_type(tid).name in ("CONTROL", "UNKNOWN"):
            return b""
        return vocab.tokens[tid].replace(SPM_SPACE, " ").encode("utf-8")

    def detokenize(self, ids, remove_special: bool = False,
                   unparse_special: bool = False) -> str:
        vocab = self.vocab
        ids = list(ids)
        if remove_special and ids and ids[-1] == vocab.special.eos:
            ids = ids[:-1]
        pieces = []
        for tid in ids:
            ttype = vocab.token_type(tid).name
            if ttype in ("CONTROL", "UNKNOWN"):
                if unparse_special:
                    pieces.append(vocab.tokens[tid])
                continue
            pieces.append(vocab.tokens[tid].replace(SPM_SPACE, " "))
        s = "".join(pieces)
        if vocab.add_space_prefix and s.startswith(" "):
            s = s[1:]
        return s
