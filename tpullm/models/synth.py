"""Synthesis of large random *packed* models for benchmarking.

Generates GGUF files with directly-synthesized packed quant payloads (random
codes + sane scales) — numerically meaningless but byte-layout-identical to
real models, so load/repack/kernel/bench paths measure true speeds without
downloading weights. Shapes below mirror the reference bench configs
(BASELINE.md: Llama-3-8B / TinyLlama-1.1B)."""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, TYPE_TRAITS
from ..gguf.writer import GGUFWriter
from .testing import _byte_vocab, DEFAULT_WORDS

# (n_layer, n_embd, n_head, n_head_kv, n_ff, n_vocab, rope_base)
SHAPES = {
    "llama-3-8b": dict(n_layer=32, n_embd=4096, n_head=32, n_head_kv=8,
                       n_ff=14336, n_vocab=128256, rope_base=500000.0),
    "llama-2-7b": dict(n_layer=32, n_embd=4096, n_head=32, n_head_kv=32,
                       n_ff=11008, n_vocab=32000, rope_base=10000.0),
    "tinyllama-1.1b": dict(n_layer=22, n_embd=2048, n_head=32, n_head_kv=4,
                           n_ff=5632, n_vocab=32000, rope_base=10000.0),
    "llama-3-70b": dict(n_layer=80, n_embd=8192, n_head=64, n_head_kv=8,
                        n_ff=28672, n_vocab=128256, rope_base=500000.0),
}

_SCALE_FIELDS = {
    # byte offsets of f16 scale fields per block that must be finite/small
    GGMLType.Q4_0: (0,),
    GGMLType.Q4_1: (0, 2),
    GGMLType.Q5_0: (0,),
    GGMLType.Q5_1: (0, 2),
    GGMLType.Q8_0: (0,),
    GGMLType.Q4_K: (0, 2),
    GGMLType.Q5_K: (0, 2),
    GGMLType.Q6_K: (208,),
    GGMLType.Q2_K: (80, 82),
    GGMLType.Q3_K: (108,),
    GGMLType.IQ4_NL: (0,),
    GGMLType.IQ4_XS: (0,),
}


def random_packed(rng: np.random.Generator, gtype: GGMLType, n_elements: int,
                  scale: float = 0.02) -> bytes:
    tt = TYPE_TRAITS[gtype]
    nb = n_elements // tt.block_size
    raw = rng.integers(0, 256, size=(nb, tt.type_size), dtype=np.uint8)
    if gtype == GGMLType.MXFP4:
        raw[:, 0] = 121  # modest shared exponent
    else:
        d = (rng.uniform(0.5, 1.5, size=nb) * scale).astype(np.float16)
        db = d.view(np.uint8).reshape(nb, 2)
        for off in _SCALE_FIELDS[gtype]:
            raw[:, off : off + 2] = db
    return raw.reshape(-1).tobytes()


def make_synthetic_llama_gguf(
    path,
    shape: str = "llama-3-8b",
    weight_type: GGMLType = GGMLType.Q4_K,
    head_type: GGMLType | None = GGMLType.Q6_K,  # Q4_K_M puts output at Q6_K
    seed: int = 0,
) -> str:
    cfg = SHAPES[shape]
    rng = np.random.default_rng(seed)
    n_layer, n_embd = cfg["n_layer"], cfg["n_embd"]
    n_head, n_head_kv, n_ff = cfg["n_head"], cfg["n_head_kv"], cfg["n_ff"]
    n_vocab = cfg["n_vocab"]
    head_dim = n_embd // n_head
    head_type = head_type or weight_type

    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    # pad vocab to the target size with filler tokens
    while len(tokens) < n_vocab:
        tokens.append(f"<extra_{len(tokens)}>")
        scores.append(-1e6)
        types.append(4)  # USER_DEFINED

    w = GGUFWriter(path, architecture="llama")
    w.add_kv("general.name", f"tpullm-synth-{shape}")
    w.add_kv("llama.block_count", n_layer)
    w.add_kv("llama.context_length", 8192)
    w.add_kv("llama.embedding_length", n_embd)
    w.add_kv("llama.feed_forward_length", n_ff)
    w.add_kv("llama.attention.head_count", n_head)
    w.add_kv("llama.attention.head_count_kv", n_head_kv)
    w.add_kv("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("llama.rope.freq_base", cfg["rope_base"])
    w.add_kv("llama.rope.dimension_count", head_dim)
    w.add_kv("llama.vocab_size", n_vocab)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens[:n_vocab])
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores[:n_vocab], dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types[:n_vocab], dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def packed(name, n_out, n_in, gtype):
        payload = random_packed(rng, gtype, n_out * n_in)
        w.add_packed_tensor(name, (n_in, n_out), gtype, payload)

    def norm(name, n):
        w.add_tensor(name, np.ones(n, dtype=np.float32), GGMLType.F32)

    # Q4_K_M recipe parity: attn_v and ffn_down upgrade to Q6_K on the
    # use_more_bits layer pattern (llama-quant.cpp:185-187, :303, :363) —
    # matches the published 4.58 GiB Llama-3-8B Q4_K_M footprint the bench
    # baseline was measured on (tools/quantize/README.md:142-145)
    from ..tools.quantize import use_more_bits

    def bump(i):
        if head_type != weight_type and use_more_bits(i, n_layer) and \
                weight_type in (GGMLType.Q4_K, GGMLType.Q5_K):
            return GGMLType.Q6_K
        return weight_type

    packed("token_embd.weight", n_vocab, n_embd, weight_type)
    for i in range(n_layer):
        p = f"blk.{i}."
        norm(p + "attn_norm.weight", n_embd)
        packed(p + "attn_q.weight", n_head * head_dim, n_embd, weight_type)
        packed(p + "attn_k.weight", n_head_kv * head_dim, n_embd, weight_type)
        packed(p + "attn_v.weight", n_head_kv * head_dim, n_embd, bump(i))
        packed(p + "attn_output.weight", n_embd, n_head * head_dim, weight_type)
        norm(p + "ffn_norm.weight", n_embd)
        packed(p + "ffn_gate.weight", n_ff, n_embd, weight_type)
        packed(p + "ffn_up.weight", n_ff, n_embd, weight_type)
        packed(p + "ffn_down.weight", n_embd, n_ff, bump(i))
    norm("output_norm.weight", n_embd)
    packed("output.weight", n_vocab, n_embd, head_type)
    w.write()
    return str(path)
