"""RWKV "World" tokenizer: greedy longest-match over a byte trie.

Reference: llm_tokenizer_rwkv / llm_tokenizer_rwkv_session +
llama_unescape_rwkv_token (src/llama-vocab.cpp, the RWKV tokenizer section).
Vocab entries are escaped byte strings (\\t \\n \\r \\xNN \\\\); tokenization
walks raw UTF-8 bytes taking the longest vocab entry at each position, with
the unk token covering bytes no entry starts with.
"""

from __future__ import annotations

from .vocab import Vocab


def unescape_rwkv_token(escaped: str) -> bytes:
    """Decode the GGUF-stored escaped form into raw bytes
    (≡ llama_unescape_rwkv_token)."""
    out = bytearray()
    i = 0
    n = len(escaped)
    while i < n:
        c = escaped[i]
        if c != "\\":
            out += c.encode("utf-8", errors="replace")
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = escaped[i]
        if e == "t":
            out.append(0x09)
        elif e == "n":
            out.append(0x0A)
        elif e == "r":
            out.append(0x0D)
        elif e == "x":
            out.append(int(escaped[i + 1 : i + 3], 16))
            i += 2
        else:
            out += e.encode("utf-8", errors="replace")
        i += 1
    return bytes(out)


class RWKVTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        # trie as nested dicts: byte -> child; token id under the None key
        self.trie: dict = {}
        self._bytes: list[bytes] = []
        for tid, text in enumerate(vocab.tokens):
            raw = unescape_rwkv_token(text)
            self._bytes.append(raw)
            if not raw:
                continue
            node = self.trie
            for b in raw:
                node = node.setdefault(b, {})
            node[None] = tid

    def piece_bytes(self, tid: int) -> bytes:
        return self._bytes[tid]

    def tokenize_fragment(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        out: list[int] = []
        pos = 0
        n = len(data)
        while pos < n:
            node = self.trie.get(data[pos])
            if node is None:
                out.append(self.vocab.special.unk)
                pos += 1
                continue
            best_id, best_end = None, pos + 1
            scan = pos + 1
            while True:
                if None in node:
                    best_id, best_end = node[None], scan
                if scan >= n:
                    break
                node = node.get(data[scan])
                if node is None:
                    break
                scan += 1
            if best_id is None:  # prefix exists but no complete token
                out.append(self.vocab.special.unk)
                pos += 1
            else:
                out.append(best_id)
                pos = best_end
        return out

    def tokenize(
        self, text: str, add_special: bool = True, parse_special: bool = False
    ) -> list[int]:
        vocab = self.vocab
        out: list[int] = []
        if add_special and vocab.add_bos and vocab.special.bos >= 0:
            out.append(vocab.special.bos)
        for frag in vocab.partition_specials(text, parse_special):
            if isinstance(frag, int):
                out.append(frag)
            else:
                out.extend(self.tokenize_fragment(frag))
        if add_special and vocab.add_eos and vocab.special.eos >= 0:
            out.append(vocab.special.eos)
        return out

    def detokenize(
        self, ids, remove_special: bool = False, unparse_special: bool = False
    ) -> str:
        vocab = self.vocab
        ids = list(ids)
        if remove_special:
            if vocab.add_bos and ids and ids[0] == vocab.special.bos:
                ids = ids[1:]
            if vocab.add_eos and ids and ids[-1] == vocab.special.eos:
                ids = ids[:-1]
        buf = b"".join(
            self._bytes[t] for t in ids if 0 <= t < len(self._bytes)
        )
        return buf.decode("utf-8", errors="replace")
