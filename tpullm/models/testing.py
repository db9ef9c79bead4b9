"""Test-model synthesis: tiny random llama GGUFs with a functional SPM vocab.

Plays the role of the reference's vocab-only fixture GGUFs (models/
ggml-vocab-*.gguf) and stories260K-style tiny models used by the server tests
— lets the whole pipeline (load → tokenize → forward → sample) run hermetically.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, TokenType
from ..gguf.writer import GGUFWriter


def _byte_vocab(extra_words: list[str]) -> tuple[list[str], list[float], list[int]]:
    tokens = ["<unk>", "<s>", "</s>"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    scores = [-99.0, -99.0, -99.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TokenType.BYTE)
        scores.append(-98.0)
    for i, w in enumerate(extra_words):
        tokens.append(w)
        types.append(TokenType.NORMAL)
        scores.append(-float(i))
    return tokens, scores, types


DEFAULT_WORDS = [
    "▁the", "▁quick", "▁brown", "▁fox", "▁jumps", "▁over", "▁lazy", "▁dog",
    "▁hello", "▁world", "he", "ll", "o", "wor", "ld", "▁a", "▁an", "ing", "ed",
    "▁", "t", "h", "e", "a", "s", "d", "f", "g",
]


def make_tiny_llama_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    weight_type: GGMLType = GGMLType.F32,
    tie_embeddings: bool = False,
    rope_scaling: str | None = None,
    seed: int = 0,
    arch: str = "llama",
    extra_kv: dict | None = None,
    with_qk_norm: bool = False,  # per-head q/k RMS norms
    with_qkv_bias: bool = False,  # qwen2/dream-style attn biases
    with_bo: bool = False,  # attn output bias (pangu/maincoder)
    ffn_norm_tensor: str = "ffn_norm",  # seed_oss: post_attention_norm
) -> str:
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    if rope_scaling == "yarn":
        w.add_kv(f"{arch}.rope.scaling.type", "yarn")
        w.add_kv(f"{arch}.rope.scaling.factor", 2.0)
        w.add_kv(f"{arch}.rope.scaling.original_context_length", n_ctx // 2)
        w.add_kv(f"{arch}.rope.scaling.yarn_ext_factor", 1.0)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)
    for k, v in (extra_kv or {}).items():
        w.add_kv(k, v)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def add_w(name, arr, qtype=weight_type):
        w.add_tensor(name, arr, qtype)

    add_w("token_embd.weight", rand((n_vocab, n_embd)), weight_type)
    for i in range(n_layer):
        p = f"blk.{i}."
        add_w(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32), GGMLType.F32)
        add_w(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        add_w(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        add_w(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        add_w(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        if with_qkv_bias:
            add_w(p + "attn_q.bias", rand((n_head * head_dim,)), GGMLType.F32)
            add_w(p + "attn_k.bias", rand((n_head_kv * head_dim,)), GGMLType.F32)
            add_w(p + "attn_v.bias", rand((n_head_kv * head_dim,)), GGMLType.F32)
        if with_qk_norm:
            add_w(p + "attn_q_norm.weight",
                  (1.0 + rand((head_dim,))).astype(np.float32), GGMLType.F32)
            add_w(p + "attn_k_norm.weight",
                  (1.0 + rand((head_dim,))).astype(np.float32), GGMLType.F32)
        if with_bo:
            add_w(p + "attn_output.bias", rand((n_embd,)), GGMLType.F32)
        add_w(p + ffn_norm_tensor + ".weight", np.ones(n_embd, dtype=np.float32), GGMLType.F32)
        add_w(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        add_w(p + "ffn_up.weight", rand((n_ff, n_embd)))
        add_w(p + "ffn_down.weight", rand((n_embd, n_ff)))
    add_w("output_norm.weight", np.ones(n_embd, dtype=np.float32), GGMLType.F32)
    if not tie_embeddings:
        add_w("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_bert_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 128,
    n_ctx: int = 128,
    seed: int = 0,
) -> str:
    """Tiny BERT-shaped GGUF with a WPM vocab (embedding-model fixture)."""
    rng = np.random.default_rng(seed)
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    types = [TokenType.CONTROL] * 5
    words = ["the", "quick", "brown", "fox", "hello", "world", "dog", "cat",
             "a", "an", "and", "of"]
    tokens += ["▁" + w for w in words]
    types += [TokenType.NORMAL] * len(words)
    for ch in "abcdefghijklmnopqrstuvwxyz":
        tokens += ["▁" + ch, ch]
        types += [TokenType.NORMAL, TokenType.NORMAL]
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture="bert")
    w.add_kv("general.name", "tpullm-tiny-bert")
    w.add_kv("bert.block_count", n_layer)
    w.add_kv("bert.context_length", n_ctx)
    w.add_kv("bert.embedding_length", n_embd)
    w.add_kv("bert.feed_forward_length", n_ff)
    w.add_kv("bert.attention.head_count", n_head)
    w.add_kv("bert.attention.layer_norm_epsilon", 1e-12)
    w.add_kv("bert.attention.causal", False)
    w.add_kv("bert.pooling_type", 1)  # mean
    w.add_kv("tokenizer.ggml.model", "bert")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.token_type",
             np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.cls_token_id", 2)
    w.add_kv("tokenizer.ggml.seperator_token_id", 3)
    w.add_kv("tokenizer.ggml.unknown_token_id", 1)
    w.add_kv("tokenizer.ggml.padding_token_id", 0)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    w.add_tensor("position_embd.weight", rand((n_ctx, n_embd)))
    w.add_tensor("token_types.weight", rand((2, n_embd)))
    w.add_tensor("token_embd_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("token_embd_norm.bias", rand((n_embd,)))
    for i in range(n_layer):
        p = f"blk.{i}."
        for nm in ("attn_q", "attn_k", "attn_v"):
            w.add_tensor(p + nm + ".weight", rand((n_embd, n_embd)))
            w.add_tensor(p + nm + ".bias", rand((n_embd,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_output_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_output_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
        w.add_tensor(p + "layer_output_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "layer_output_norm.bias", rand((n_embd,)))
    w.write()
    return str(path)


def make_tiny_gemma_gguf(
    path,
    *,
    arch: str = "gemma3",
    n_layer: int = 6,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    sliding_window: int = 16,
    seed: int = 0,
) -> str:
    """Tiny gemma2/gemma3-shaped GGUF: pre+post norms, iSWA, qk-norm (g3),
    softcaps (g2)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-gemma")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    if arch != "gemma":  # gemma v1: full attention, no softcaps
        w.add_kv(f"{arch}.attention.sliding_window", sliding_window)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    if arch == "gemma3":
        w.add_kv(f"{arch}.rope.freq_base", 1_000_000.0)
        w.add_kv(f"{arch}.rope.freq_base_swa", 10000.0)
    elif arch == "gemma":
        w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    else:
        w.add_kv(f"{arch}.rope.freq_base", 10000.0)
        w.add_kv(f"{arch}.attn_logit_softcapping", 50.0)
        w.add_kv(f"{arch}.final_logit_softcapping", 30.0)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        if arch != "gemma":
            w.add_tensor(p + "post_attention_norm.weight", np.ones(n_embd, dtype=np.float32))
        if arch == "gemma3":
            w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, dtype=np.float32))
            w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, dtype=np.float32))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        if arch != "gemma":
            w.add_tensor(p + "post_ffw_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.write()  # tied embeddings (gemma always ties)
    return str(path)


def make_tiny_gpt2_gguf(
    path,
    *,
    arch: str = "gpt2",
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 128,
    n_ctx: int = 128,
    seed: int = 0,
) -> str:
    """Tiny gpt2-shaped GGUF: LayerNorm+bias, learned positions, fused qkv."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-gpt2")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", False)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    w.add_tensor("position_embd.weight", rand((n_ctx, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight", rand((3 * n_embd, n_embd)))
        w.add_tensor(p + "attn_qkv.bias", rand((3 * n_embd,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "ffn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output_norm.bias", rand((n_embd,)))
    w.write()  # tied output head
    return str(path)


def make_tiny_moe_gguf(
    path,
    *,
    arch: str = "qwen3moe",
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 96,
    n_ff_shexp: int = 0,  # >0 adds a qwen2moe-style shared expert
    gated_shexp: bool = True,  # False: deepseek/granitemoe ungated shexp
    with_probs_bias: bool = False,  # ernie4_5-moe exp_probs_b selection bias
    ffn_norm_name: str = "ffn_norm",  # glm4-moe: post_attention_norm
    n_dense_lead: int = 0,  # deepseek leading dense layers
    expert_weights_scale: float = 0.0,  # >0 writes the deepseek scale key
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny qwen2moe/qwen3moe/deepseek/granitemoe-shaped GGUF with stacked
    expert tensors."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-moe")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff_exp)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv(f"{arch}.expert_feed_forward_length", n_ff_exp)
    if n_dense_lead:
        w.add_kv(f"{arch}.leading_dense_block_count", n_dense_lead)
    if arch == "glm4moe":
        w.add_kv(f"{arch}.expert_weights_norm", True)
    if expert_weights_scale:
        w.add_kv(f"{arch}.expert_weights_scale", expert_weights_scale)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        if arch == "qwen3moe":
            w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, dtype=np.float32))
            w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, dtype=np.float32))
        elif arch == "olmoe":  # full-projection q/k norms (pre-head-split)
            w.add_tensor(p + "attn_q_norm.weight",
                         rand((n_head * head_dim,), 1.0) * 0.1 + 1.0)
            w.add_tensor(p + "attn_k_norm.weight",
                         rand((n_head_kv * head_dim,), 1.0) * 0.1 + 1.0)
        w.add_tensor(p + ffn_norm_name + ".weight", np.ones(n_embd, dtype=np.float32))
        if i < n_dense_lead:  # deepseek dense lead layer
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_up.weight", rand((n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff_exp)))
            continue
        w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
        if with_probs_bias:
            w.add_tensor(p + "exp_probs_b.bias", rand((n_expert,), 1.0))
        w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
        if n_ff_shexp:
            if gated_shexp:
                w.add_tensor(p + "ffn_gate_inp_shexp.weight", rand((n_embd,)))
            w.add_tensor(p + "ffn_gate_shexp.weight", rand((n_ff_shexp, n_embd)))
            w.add_tensor(p + "ffn_up_shexp.weight", rand((n_ff_shexp, n_embd)))
            w.add_tensor(p + "ffn_down_shexp.weight", rand((n_embd, n_ff_shexp)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_mamba_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    d_inner: int = 128,
    d_state: int = 16,
    d_conv: int = 4,
    dt_rank: int = 4,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny mamba-shaped GGUF (ssm_* tensor set, recurrent state family)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)

    w = GGUFWriter(path, architecture="mamba")
    w.add_kv("general.name", "tpullm-tiny-mamba")
    w.add_kv("mamba.block_count", n_layer)
    w.add_kv("mamba.context_length", n_ctx)
    w.add_kv("mamba.embedding_length", n_embd)
    w.add_kv("mamba.feed_forward_length", 0)
    w.add_kv("mamba.attention.head_count", 0)
    w.add_kv("mamba.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("mamba.ssm.conv_kernel", d_conv)
    w.add_kv("mamba.ssm.inner_size", d_inner)
    w.add_kv("mamba.ssm.state_size", d_state)
    w.add_kv("mamba.ssm.time_step_rank", dt_rank)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "ssm_in.weight", rand((2 * d_inner, n_embd)))
        w.add_tensor(p + "ssm_conv1d.weight", rand((d_inner, d_conv), 0.2))
        w.add_tensor(p + "ssm_conv1d.bias", rand((d_inner,)))
        w.add_tensor(p + "ssm_x.weight", rand((dt_rank + 2 * d_state, d_inner)))
        w.add_tensor(p + "ssm_dt.weight", rand((d_inner, dt_rank)))
        w.add_tensor(p + "ssm_dt.bias", rand((d_inner,)) + 0.5)
        # A_log > 0 so A = -exp(A_log) is stable
        w.add_tensor(p + "ssm_a", -np.exp(np.abs(rand((d_inner, d_state), 1.0)) + 0.1))
        w.add_tensor(p + "ssm_d", rand((d_inner,)) + 1.0)
        w.add_tensor(p + "ssm_out.weight", rand((n_embd, d_inner)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_phi3_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny phi3-shaped GGUF: fused attn_qkv + fused gate/up ffn_up."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture="phi3")
    w.add_kv("general.name", "tpullm-tiny-phi3")
    w.add_kv("phi3.block_count", n_layer)
    w.add_kv("phi3.context_length", n_ctx)
    w.add_kv("phi3.embedding_length", n_embd)
    w.add_kv("phi3.feed_forward_length", n_ff)
    w.add_kv("phi3.attention.head_count", n_head)
    w.add_kv("phi3.attention.head_count_kv", n_head_kv)
    w.add_kv("phi3.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("phi3.rope.freq_base", 10000.0)
    w.add_kv("phi3.rope.dimension_count", head_dim)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    n_q = n_head * head_dim
    n_kv = n_head_kv * head_dim
    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_qkv.weight", rand((n_q + 2 * n_kv, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_q)))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "ffn_up.weight", rand((2 * n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_deepseek2_gguf(
    path,
    *,
    arch: str = "deepseek2",
    n_layer: int = 3,
    n_embd: int = 64,
    n_head: int = 4,
    qk_nope: int = 16,
    qk_rope: int = 8,
    v_dim: int = 16,
    q_lora: int = 24,
    kv_lora: int = 24,
    n_dense_lead: int = 1,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff: int = 96,
    n_ff_exp: int = 48,
    n_ff_shexp: int = 48,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny deepseek2-shaped GGUF: MLA q/kv compression + bias-gated MoE."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    dk = qk_nope + qk_rope

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-ds2")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head)
    w.add_kv(f"{arch}.attention.key_length", dk)
    w.add_kv(f"{arch}.attention.value_length", v_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.attention.q_lora_rank", q_lora)
    w.add_kv(f"{arch}.attention.kv_lora_rank", kv_lora)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", qk_rope)
    w.add_kv(f"{arch}.leading_dense_block_count", n_dense_lead)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add_kv(f"{arch}.expert_shared_count", 1)
    w.add_kv(f"{arch}.expert_weights_scale", 2.0)
    w.add_kv(f"{arch}.expert_weights_norm", True)
    w.add_kv(f"{arch}.expert_gating_func", 2)  # sigmoid
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_q_a.weight", rand((q_lora, n_embd)))
        w.add_tensor(p + "attn_q_a_norm.weight", np.ones(q_lora, dtype=np.float32))
        w.add_tensor(p + "attn_q_b.weight", rand((n_head * dk, q_lora)))
        w.add_tensor(p + "attn_kv_a_mqa.weight", rand((kv_lora + qk_rope, n_embd)))
        w.add_tensor(p + "attn_kv_a_norm.weight", np.ones(kv_lora, dtype=np.float32))
        w.add_tensor(p + "attn_kv_b.weight", rand((n_head * (qk_nope + v_dim), kv_lora)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * v_dim)))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, dtype=np.float32))
        if i < n_dense_lead:
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        else:
            w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
            w.add_tensor(p + "exp_probs_b.bias", rand((n_expert,), 0.5))
            w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
            w.add_tensor(p + "ffn_gate_shexp.weight", rand((n_ff_shexp, n_embd)))
            w.add_tensor(p + "ffn_up_shexp.weight", rand((n_ff_shexp, n_embd)))
            w.add_tensor(p + "ffn_down_shexp.weight", rand((n_embd, n_ff_shexp)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_mmproj_gguf(
    path,
    *,
    image_size: int = 28,
    patch_size: int = 7,
    n_embd: int = 32,
    n_ff: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_embd_llm: int = 64,
    seed: int = 0,
    projector: str = "mlp",  # "mlp" (llava) or "mlp_norm" (Yi-VL)
) -> str:
    """Tiny CLIP ViT mmproj GGUF (llava projector), ≡ clip.cpp model files."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("general.name", "tpullm-tiny-clip")
    w.add_kv("clip.vision.image_size", image_size)
    w.add_kv("clip.vision.patch_size", patch_size)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", n_ff)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", n_head)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.vision.image_mean", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_kv("clip.vision.image_std", np.asarray([0.5, 0.5, 0.5], np.float32))

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    n_patches = (image_size // patch_size) ** 2
    w.add_tensor("v.patch_embd.weight", rand((n_embd, 3 * patch_size * patch_size)))
    w.add_tensor("v.patch_embd.bias", rand((n_embd,)))
    w.add_tensor("v.class_embd", rand((n_embd,)))
    w.add_tensor("v.position_embd.weight", rand((n_patches + 1, n_embd)))
    w.add_tensor("v.pre_ln.weight", np.ones(n_embd, np.float32))
    w.add_tensor("v.pre_ln.bias", rand((n_embd,)))
    for i in range(n_layer):
        p = f"v.blk.{i}."
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", rand((n_embd, n_embd)))
            w.add_tensor(p + nm + ".bias", rand((n_embd,)))
        w.add_tensor(p + "ln1.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ln1.bias", rand((n_embd,)))
        w.add_tensor(p + "ln2.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ln2.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
    w.add_tensor("v.post_ln.weight", np.ones(n_embd, np.float32))
    w.add_tensor("v.post_ln.bias", rand((n_embd,)))
    if projector == "mlp_norm":
        # Yi-VL: mm.0 → LN(mm.1) → GELU → mm.3 → LN(mm.4)
        w.add_tensor("mm.0.weight", rand((n_embd_llm, n_embd)))
        w.add_tensor("mm.0.bias", rand((n_embd_llm,)))
        w.add_tensor("mm.1.weight", rand((n_embd_llm,)) + 1.0)
        w.add_tensor("mm.1.bias", rand((n_embd_llm,)))
        w.add_tensor("mm.3.weight", rand((n_embd_llm, n_embd_llm)))
        w.add_tensor("mm.3.bias", rand((n_embd_llm,)))
        w.add_tensor("mm.4.weight", rand((n_embd_llm,)) + 1.0)
        w.add_tensor("mm.4.bias", rand((n_embd_llm,)))
        w.write()
        return str(path)
    w.add_tensor("mm.0.weight", rand((n_embd_llm, n_embd)))
    w.add_tensor("mm.0.bias", rand((n_embd_llm,)))
    w.add_tensor("mm.2.weight", rand((n_embd_llm, n_embd_llm)))
    w.add_tensor("mm.2.bias", rand((n_embd_llm,)))
    w.write()
    return str(path)


def make_tiny_rwkv6_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 32,
    head_size: int = 8,
    n_ff: int = 64,
    lora_rank: int = 4,
    decay_rank: int = 4,
    n_ctx: int = 256,
    rescale_every: int = 2,
    seed: int = 0,
) -> str:
    """Tiny RWKV6-shaped GGUF (time-mix + channel-mix tensor set)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)

    w = GGUFWriter(path, architecture="rwkv6")
    w.add_kv("general.name", "tpullm-tiny-rwkv6")
    w.add_kv("rwkv6.block_count", n_layer)
    w.add_kv("rwkv6.context_length", n_ctx)
    w.add_kv("rwkv6.embedding_length", n_embd)
    w.add_kv("rwkv6.feed_forward_length", n_ff)
    w.add_kv("rwkv6.attention.head_count", 0)
    w.add_kv("rwkv6.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("rwkv6.wkv.head_size", head_size)
    w.add_kv("rwkv6.rescale_every_n_layers", rescale_every)
    w.add_kv("rwkv6.token_shift_count", 2)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    H = n_embd // head_size
    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    w.add_tensor("token_embd_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("token_embd_norm.bias", rand((n_embd,)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "attn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_norm_2.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "attn_norm_2.bias", rand((n_embd,)))
        w.add_tensor(p + "time_mix_lerp_x.weight", rand((n_embd,)))
        w.add_tensor(p + "time_mix_lerp_fused.weight", rand((5, 1, n_embd)))
        w.add_tensor(p + "time_mix_w1.weight", rand((5 * lora_rank, n_embd)))
        w.add_tensor(p + "time_mix_w2.weight", rand((5, n_embd, lora_rank)))
        w.add_tensor(p + "time_mix_first.weight", rand((H, head_size)))
        w.add_tensor(p + "time_mix_decay.weight", rand((n_embd,)) - 4.0)
        w.add_tensor(p + "time_mix_decay_w1.weight", rand((decay_rank, n_embd)))
        w.add_tensor(p + "time_mix_decay_w2.weight", rand((n_embd, decay_rank)))
        for nm in ("time_mix_key", "time_mix_value", "time_mix_receptance",
                   "time_mix_gate", "time_mix_output"):
            w.add_tensor(p + nm + ".weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "time_mix_ln.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "time_mix_ln.bias", rand((n_embd,)))
        w.add_tensor(p + "channel_mix_lerp_k.weight", rand((n_embd,)))
        w.add_tensor(p + "channel_mix_lerp_r.weight", rand((n_embd,)))
        w.add_tensor(p + "channel_mix_key.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "channel_mix_receptance.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "channel_mix_value.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("output_norm.bias", rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_starcoder2_gguf(
    path,
    *,
    arch: str = "starcoder2",
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    with_bias: bool = True,
    gated: bool = False,  # orion: SiLU-gated FFN instead of sequential
    seed: int = 0,
) -> str:
    """Tiny starcoder2/nemotron-shaped GGUF: LayerNorm+bias, biased attn,
    sequential no-gate FFN (or orion's gated swiglu with gated=True)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", f"tpullm-tiny-{arch}")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        if with_bias:
            w.add_tensor(p + "attn_q.bias", rand((n_head * head_dim,)))
            w.add_tensor(p + "attn_k.bias", rand((n_head_kv * head_dim,)))
            w.add_tensor(p + "attn_v.bias", rand((n_head_kv * head_dim,)))
            w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_norm.bias", rand((n_embd,)))
        if gated:
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        if with_bias:
            w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
            w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output_norm.bias", rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_phi2_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 4,
    n_ff: int = 128,
    n_ctx: int = 256,
    n_rot: int = 8,  # partial rope: first n_rot of head_dim dims
    seed: int = 0,
) -> str:
    """Tiny phi2-shaped GGUF: fused qkv+bias, LN+bias, parallel block,
    partial neox rope, biased output head."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture="phi2")
    w.add_kv("general.name", "tpullm-tiny-phi2")
    w.add_kv("phi2.block_count", n_layer)
    w.add_kv("phi2.context_length", n_ctx)
    w.add_kv("phi2.embedding_length", n_embd)
    w.add_kv("phi2.feed_forward_length", n_ff)
    w.add_kv("phi2.attention.head_count", n_head)
    w.add_kv("phi2.attention.head_count_kv", n_head_kv)
    w.add_kv("phi2.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("phi2.rope.freq_base", 10000.0)
    w.add_kv("phi2.rope.dimension_count", n_rot)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    n_q = n_head * head_dim
    n_kv = n_head_kv * head_dim
    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight", rand((n_q + 2 * n_kv, n_embd)))
        w.add_tensor(p + "attn_qkv.bias", rand((n_q + 2 * n_kv,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_q)))
        w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output_norm.bias", rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.add_tensor("output.bias", rand((n_vocab,)))
    w.write()
    return str(path)


def make_tiny_stablelm_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    n_rot: int = 8,
    parallel: bool = False,  # drop ffn_norm → parallel-residual variant
    seed: int = 0,
) -> str:
    """Tiny stablelm-shaped GGUF: LN+bias, per-head q/k LN, partial rope."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture="stablelm")
    w.add_kv("general.name", "tpullm-tiny-stablelm")
    w.add_kv("stablelm.block_count", n_layer)
    w.add_kv("stablelm.context_length", n_ctx)
    w.add_kv("stablelm.embedding_length", n_embd)
    w.add_kv("stablelm.feed_forward_length", n_ff)
    w.add_kv("stablelm.attention.head_count", n_head)
    w.add_kv("stablelm.attention.head_count_kv", n_head_kv)
    w.add_kv("stablelm.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("stablelm.rope.freq_base", 10000.0)
    w.add_kv("stablelm.rope.dimension_count", n_rot)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((n_head * head_dim,)))
        w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((n_head_kv * head_dim,)))
        if not parallel:
            w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
            w.add_tensor(p + "ffn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output_norm.bias", rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_audio_mmproj_gguf(
    path,
    *,
    n_mel: int = 16,
    n_embd: int = 32,
    n_ff: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_embd_llm: int = 64,
    n_pos: int = 1500,
    projector: str = "qwen2a",  # qwen2a | ultravox
    stack_factor: int = 4,
    seed: int = 0,
) -> str:
    """Tiny whisper-encoder mmproj GGUF (≡ clip.cpp audio model files)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("general.name", "tpullm-tiny-whisper")
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.projector_type", projector)
    w.add_kv("clip.audio.num_mel_bins", n_mel)
    w.add_kv("clip.audio.embedding_length", n_embd)
    w.add_kv("clip.audio.feed_forward_length", n_ff)
    w.add_kv("clip.audio.block_count", n_layer)
    w.add_kv("clip.audio.attention.head_count", n_head)
    w.add_kv("clip.audio.attention.layer_norm_epsilon", 1e-5)
    if projector in ("ultravox", "glma"):
        w.add_kv("clip.audio.projector.stack_factor", stack_factor)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("a.conv1d.1.weight", rand((n_embd, n_mel, 3)))
    w.add_tensor("a.conv1d.1.bias", rand((n_embd,)))
    w.add_tensor("a.conv1d.2.weight", rand((n_embd, n_embd, 3)))
    w.add_tensor("a.conv1d.2.bias", rand((n_embd,)))
    w.add_tensor("a.position_embd.weight", rand((n_pos, n_embd)))
    for i in range(n_layer):
        p = f"a.blk.{i}."
        for nm in ("attn_q", "attn_v"):
            w.add_tensor(p + nm + ".weight", rand((n_embd, n_embd)))
            w.add_tensor(p + nm + ".bias", rand((n_embd,)))
        w.add_tensor(p + "attn_k.weight", rand((n_embd, n_embd)))  # no bias
        w.add_tensor(p + "attn_out.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "attn_out.bias", rand((n_embd,)))
        w.add_tensor(p + "ln1.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ln1.bias", rand((n_embd,)))
        w.add_tensor(p + "ln2.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ln2.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
    w.add_tensor("a.post_ln.weight", np.ones(n_embd, np.float32))
    w.add_tensor("a.post_ln.bias", rand((n_embd,)))
    if projector == "ultravox":
        hidden = 2 * n_embd
        w.add_tensor("mm.a.norm_pre.weight",
                     np.ones(stack_factor * n_embd, np.float32))
        w.add_tensor("mm.a.mlp.1.weight", rand((2 * hidden, stack_factor * n_embd)))
        w.add_tensor("mm.a.norm_mid.weight", np.ones(hidden, np.float32))
        w.add_tensor("mm.a.mlp.2.weight", rand((n_embd_llm, hidden)))
    elif projector == "music_flamingo":
        hidden = 2 * n_embd
        w.add_tensor("mm.a.mlp.1.weight", rand((hidden, n_embd)))
        w.add_tensor("mm.a.mlp.1.bias", rand((hidden,)))
        w.add_tensor("mm.a.mlp.2.weight", rand((n_embd_llm, hidden)))
        w.add_tensor("mm.a.mlp.2.bias", rand((n_embd_llm,)))
    elif projector == "glma":
        hidden = 2 * n_embd
        w.add_tensor("mm.a.norm_pre.weight", np.ones(n_embd, np.float32))
        w.add_tensor("mm.a.norm_pre.bias", rand((n_embd,)))
        w.add_tensor("mm.a.mlp.1.weight",
                     rand((hidden, stack_factor * n_embd)))
        w.add_tensor("mm.a.mlp.1.bias", rand((hidden,)))
        w.add_tensor("mm.a.mlp.2.weight", rand((n_embd_llm, hidden)))
        w.add_tensor("mm.a.mlp.2.bias", rand((n_embd_llm,)))
        w.add_tensor("v.boi", rand((1, n_embd_llm)))
        w.add_tensor("v.eoi", rand((1, n_embd_llm)))
    else:
        w.add_tensor("mm.a.fc.weight", rand((n_embd_llm, n_embd)))
        w.add_tensor("mm.a.fc.bias", rand((n_embd_llm,)))
    w.write()
    return str(path)


def make_tiny_gpt_oss_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 96,
    n_ctx: int = 256,
    sliding_window: int = 16,
    seed: int = 0,
) -> str:
    """Tiny gpt-oss-shaped GGUF: attention sinks, alternating SWA, biased
    MoE with swiglu_oai."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    arch = "gpt-oss"

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-gptoss")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff_exp)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.attention.sliding_window", sliding_window)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_q.bias", rand((n_head * head_dim,)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.bias", rand((n_head_kv * head_dim,)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.bias", rand((n_head_kv * head_dim,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_sinks.weight", rand((n_head,), 1.0))
        w.add_tensor(p + "post_attention_norm.weight",
                     np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
        w.add_tensor(p + "ffn_gate_inp.bias", rand((n_expert,)))
        w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_gate_exps.bias", rand((n_expert, n_ff_exp)))
        w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_up_exps.bias", rand((n_expert, n_ff_exp)))
        w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
        w.add_tensor(p + "ffn_down_exps.bias", rand((n_expert, n_embd)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_dbrx_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 96,
    n_ctx: int = 256,
    clamp_kqv: float = 8.0,
    seed: int = 0,
) -> str:
    """Tiny dbrx-shaped GGUF: fused clamped qkv, LN norms, MoE."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture="dbrx")
    w.add_kv("general.name", "tpullm-tiny-dbrx")
    w.add_kv("dbrx.block_count", n_layer)
    w.add_kv("dbrx.context_length", n_ctx)
    w.add_kv("dbrx.embedding_length", n_embd)
    w.add_kv("dbrx.feed_forward_length", n_ff_exp)
    w.add_kv("dbrx.attention.head_count", n_head)
    w.add_kv("dbrx.attention.head_count_kv", n_head_kv)
    w.add_kv("dbrx.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("dbrx.attention.clamp_kqv", clamp_kqv)
    w.add_kv("dbrx.rope.freq_base", 10000.0)
    w.add_kv("dbrx.rope.dimension_count", head_dim)
    w.add_kv("dbrx.expert_count", n_expert)
    w.add_kv("dbrx.expert_used_count", n_expert_used)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    n_q = n_head * head_dim
    n_kv = n_head_kv * head_dim
    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight", rand((n_q + 2 * n_kv, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_q)))
        w.add_tensor(p + "attn_output_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
        w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_qwen_gguf(
    path,
    *,
    split_path=None,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 128,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny Qwen-v1-shaped GGUF: fused attn_qkv(+bias) over the llama graph
    (llm_build_qwen, src/models/qwen.cpp; MHA so q/k/v spans are equal).

    With split_path, also writes a byte-equivalent qwen2-arch file whose
    q/k/v are the row-slices of the fused tensor — the two models must
    produce identical logits (fused-split correctness check).
    """
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tensors: dict[str, np.ndarray] = {"token_embd.weight": rand((n_vocab, n_embd))}
    for i in range(n_layer):
        p = f"blk.{i}."
        tensors[p + "attn_norm.weight"] = 1.0 + rand((n_embd,))
        tensors[p + "attn_qkv.weight"] = rand((3 * n_embd, n_embd))
        tensors[p + "attn_qkv.bias"] = rand((3 * n_embd,))
        tensors[p + "attn_output.weight"] = rand((n_embd, n_embd))
        tensors[p + "ffn_norm.weight"] = 1.0 + rand((n_embd,))
        tensors[p + "ffn_gate.weight"] = rand((n_ff, n_embd))
        tensors[p + "ffn_up.weight"] = rand((n_ff, n_embd))
        tensors[p + "ffn_down.weight"] = rand((n_embd, n_ff))
    tensors["output_norm.weight"] = 1.0 + rand((n_embd,))
    tensors["output.weight"] = rand((n_vocab, n_embd))

    def write(out_path, arch, split_qkv):
        w = GGUFWriter(out_path, architecture=arch)
        w.add_kv("general.name", f"tpullm-tiny-{arch}")
        w.add_kv(f"{arch}.block_count", n_layer)
        w.add_kv(f"{arch}.context_length", n_ctx)
        w.add_kv(f"{arch}.embedding_length", n_embd)
        w.add_kv(f"{arch}.feed_forward_length", n_ff)
        w.add_kv(f"{arch}.attention.head_count", n_head)
        w.add_kv(f"{arch}.attention.head_count_kv", n_head)
        w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
        w.add_kv(f"{arch}.rope.freq_base", 10000.0)
        w.add_kv(f"{arch}.rope.dimension_count", head_dim)
        w.add_kv("tokenizer.ggml.model", "llama")
        w.add_kv("tokenizer.ggml.tokens", tokens)
        w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
        w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
        w.add_kv("tokenizer.ggml.bos_token_id", 1)
        w.add_kv("tokenizer.ggml.eos_token_id", 2)
        w.add_kv("tokenizer.ggml.unknown_token_id", 0)
        w.add_kv("tokenizer.ggml.add_bos_token", True)
        for name, arr in tensors.items():
            if split_qkv and name.endswith("attn_qkv.weight"):
                p = name[: -len("attn_qkv.weight")]
                w.add_tensor(p + "attn_q.weight", arr[:n_embd])
                w.add_tensor(p + "attn_k.weight", arr[n_embd:2 * n_embd])
                w.add_tensor(p + "attn_v.weight", arr[2 * n_embd:])
            elif split_qkv and name.endswith("attn_qkv.bias"):
                p = name[: -len("attn_qkv.bias")]
                w.add_tensor(p + "attn_q.bias", arr[:n_embd])
                w.add_tensor(p + "attn_k.bias", arr[n_embd:2 * n_embd])
                w.add_tensor(p + "attn_v.bias", arr[2 * n_embd:])
            else:
                w.add_tensor(name, arr)
        w.write()

    write(path, "qwen", split_qkv=False)
    if split_path is not None:
        write(split_path, "qwen2", split_qkv=True)
    return str(path)


def make_tiny_falcon_gguf(
    path,
    *,
    arch: str = "falcon",
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    norm2: bool = False,  # falcon-40B dual attention norms
    par_residual: bool = False,  # gptneox use_parallel_residual
    rot_frac: float = 1.0,  # gptneox partial rotary fraction
    seed: int = 0,
) -> str:
    """Tiny falcon/gptneox-shaped GGUF: LN+bias, fused attn_qkv, neox rope,
    sequential GELU FFN (llm_build_falcon / llm_build_gptneox shapes)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    neox = arch in ("gptneox", "codeshell")

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", f"tpullm-tiny-{arch}")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", int(head_dim * rot_frac))
    if arch == "gptneox":
        w.add_kv(f"{arch}.use_parallel_residual", par_residual)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    n_q = n_head * head_dim
    n_kv = n_head_kv * head_dim
    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_norm.bias", rand((n_embd,)))
        if norm2:
            w.add_tensor(p + "attn_norm_2.weight", 1.0 + rand((n_embd,)))
            w.add_tensor(p + "attn_norm_2.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight", rand((n_q + 2 * n_kv, n_embd)))
        if neox:
            w.add_tensor(p + "attn_qkv.bias", rand((n_q + 2 * n_kv,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_q)))
        if neox:
            w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
            w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
            w.add_tensor(p + "ffn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        if neox:
            w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
            w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output_norm.bias", rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_bloom_gguf(
    path,
    *,
    arch: str = "bloom",
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 128,
    n_ctx: int = 256,
    max_alibi_bias: float = 8.0,
    seed: int = 0,
) -> str:
    """Tiny bloom/mpt/jais-shaped GGUF (ALiBi fused-qkv family).

    bloom: token_embd_norm + biases everywhere; mpt: bias-free with
    full-width qk LayerNorm, clamp_kqv and a learned pos_embd; jais:
    biased + SiLU-gated FFN.
    """
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    biased = arch in ("bloom", "jais")

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", f"tpullm-tiny-{arch}")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    if arch in ("mpt", "jais"):
        w.add_kv(f"{arch}.attention.max_alibi_bias", max_alibi_bias)
    if arch == "mpt":
        w.add_kv(f"{arch}.attention.clamp_kqv", 2.0)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    if arch == "bloom":
        w.add_tensor("token_embd_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor("token_embd_norm.bias", rand((n_embd,)))
    if arch == "mpt":
        w.add_tensor("position_embd.weight", rand((n_ctx, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        if biased:
            w.add_tensor(p + "attn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight", rand((3 * n_embd, n_embd)))
        if biased:
            w.add_tensor(p + "attn_qkv.bias", rand((3 * n_embd,)))
        if arch == "mpt":
            w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((n_embd,)))
            w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_embd)))
        if biased:
            w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        if biased:
            w.add_tensor(p + "ffn_norm.bias", rand((n_embd,)))
        if arch == "jais":
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_gate.bias", rand((n_ff,)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        if biased:
            w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
            w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    if biased:
        w.add_tensor("output_norm.bias", rand((n_embd,)))
    if arch != "mpt":  # mpt ties the output head to the embedding
        w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_chatglm_gguf(
    path,
    *,
    arch: str = "chatglm",
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny chatglm/glm4-shaped GGUF: RMS norms, partial NORM rope, fused
    gate_up swiglu. chatglm = fused biased qkv; glm4 = split qkv + post-norms."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    glm4 = arch == "glm4"

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", f"tpullm-tiny-{arch}")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim // 2)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    n_q = n_head * head_dim
    n_kv = n_head_kv * head_dim
    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        if glm4:
            w.add_tensor(p + "attn_q.weight", rand((n_q, n_embd)))
            w.add_tensor(p + "attn_k.weight", rand((n_kv, n_embd)))
            w.add_tensor(p + "attn_v.weight", rand((n_kv, n_embd)))
            w.add_tensor(p + "post_attention_norm.weight", 1.0 + rand((n_embd,)))
            w.add_tensor(p + "post_ffw_norm.weight", 1.0 + rand((n_embd,)))
        else:
            w.add_tensor(p + "attn_qkv.weight", rand((n_q + 2 * n_kv, n_embd)))
            w.add_tensor(p + "attn_qkv.bias", rand((n_q + 2 * n_kv,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_q)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((2 * n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_deci_gguf(
    path,
    *,
    n_embd: int = 64,
    n_ctx: int = 256,
    ffs: list | None = None,  # per-layer ffn dims (0 = dummy layer)
    seed: int = 0,
) -> str:
    """Tiny deci-shaped GGUF with NAS'd per-layer shapes (llm_build_deci):
    layer 0 = GQA 4/2, layer 1 = GQA 4/1, layer 2 = attention-free,
    layer 3 = linear-attention (wo only), layer 4 = dummy (no attn, no ffn).
    """
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    heads = [4, 4, 0, 4, 0]
    kv_heads = [2, 1, 0, 0, 0]
    ffs = list(ffs) if ffs is not None else [128, 128, 128, 128, 0]
    n_layer = len(heads)
    head_dim = n_embd // 4

    arch = "deci"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-deci")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", np.asarray(ffs, dtype=np.int32))
    w.add_kv(f"{arch}.attention.head_count", np.asarray(heads, dtype=np.int32))
    w.add_kv(f"{arch}.attention.head_count_kv", np.asarray(kv_heads, dtype=np.int32))
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        nh, nkv, nf = heads[i], kv_heads[i], ffs[i]
        if nh > 0:
            w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
            w.add_tensor(p + "attn_output.weight",
                         rand((n_embd, nh * head_dim if nkv else n_embd)))
            if nkv > 0:
                w.add_tensor(p + "attn_q.weight", rand((nh * head_dim, n_embd)))
                w.add_tensor(p + "attn_k.weight", rand((nkv * head_dim, n_embd)))
                w.add_tensor(p + "attn_v.weight", rand((nkv * head_dim, n_embd)))
        if nf > 0:
            w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
            w.add_tensor(p + "ffn_gate.weight", rand((nf, n_embd)))
            w.add_tensor(p + "ffn_up.weight", rand((nf, n_embd)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, nf)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_openelm_gguf(
    path,
    *,
    n_embd: int = 64,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny openelm-shaped GGUF: per-layer head counts, fused qkv, per-head
    q/k RMS norms, swiglu FFN, tied head (llm_build_openelm shapes)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    heads = [2, 4]
    kv_heads = [1, 2]
    ffs = [96, 128]
    n_layer = len(heads)
    head_dim = 16

    arch = "openelm"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-openelm")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", np.asarray(ffs, dtype=np.int32))
    w.add_kv(f"{arch}.attention.head_count", np.asarray(heads, dtype=np.int32))
    w.add_kv(f"{arch}.attention.head_count_kv", np.asarray(kv_heads, dtype=np.int32))
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        nh, nkv, nf = heads[i], kv_heads[i], ffs[i]
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight", rand(((nh + 2 * nkv) * head_dim, n_embd)))
        w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, nh * head_dim)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_gate.weight", rand((nf, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((nf, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, nf)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.write()
    return str(path)


def make_tiny_mamba2_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    d_inner: int = 128,
    d_state: int = 16,
    d_conv: int = 4,
    n_head: int = 4,
    n_group: int = 2,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny mamba2-shaped GGUF: fused [z|xBC|dt] ssm_in, grouped B/C,
    per-head scalar A/D, grouped ssm_norm (build_mamba2_layer shapes)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    conv_w = d_inner + 2 * n_group * d_state

    w = GGUFWriter(path, architecture="mamba2")
    w.add_kv("general.name", "tpullm-tiny-mamba2")
    w.add_kv("mamba2.block_count", n_layer)
    w.add_kv("mamba2.context_length", n_ctx)
    w.add_kv("mamba2.embedding_length", n_embd)
    w.add_kv("mamba2.feed_forward_length", 0)
    w.add_kv("mamba2.attention.head_count", 0)
    w.add_kv("mamba2.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("mamba2.ssm.conv_kernel", d_conv)
    w.add_kv("mamba2.ssm.inner_size", d_inner)
    w.add_kv("mamba2.ssm.state_size", d_state)
    w.add_kv("mamba2.ssm.time_step_rank", n_head)
    w.add_kv("mamba2.ssm.group_count", n_group)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ssm_in.weight",
                     rand((2 * d_inner + 2 * n_group * d_state + n_head, n_embd)))
        w.add_tensor(p + "ssm_conv1d.weight", rand((conv_w, d_conv)))
        w.add_tensor(p + "ssm_conv1d.bias", rand((conv_w,)))
        w.add_tensor(p + "ssm_dt.bias", rand((n_head,)))
        w.add_tensor(p + "ssm_a", -np.exp(rand((n_head,))))
        w.add_tensor(p + "ssm_d", rand((n_head,)))
        w.add_tensor(p + "ssm_norm.weight", 1.0 + rand((d_inner,)))
        w.add_tensor(p + "ssm_out.weight", rand((n_embd, d_inner)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_bitnet_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny bitnet-shaped GGUF: per-projection scales, sub-norms, tied head
    (llm_build_bitnet shapes)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    arch = "bitnet"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-bitnet")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def sc():
        return np.asarray([abs(float(rng.standard_normal())) + 0.5], dtype=np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_q.scale", sc())
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.scale", sc())
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.scale", sc())
        w.add_tensor(p + "attn_sub_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "attn_output.scale", sc())
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_gate.scale", sc())
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.scale", sc())
        w.add_tensor(p + "ffn_sub_norm.weight", 1.0 + rand((n_ff,)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "ffn_down.scale", sc())
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.write()
    return str(path)


def make_tiny_t5_gguf(
    path,
    *,
    arch: str = "t5",
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 128,
    n_rel_buckets: int = 32,
    n_ctx: int = 256,
    gated: bool = True,
    seed: int = 0,
) -> str:
    """Tiny t5/t5encoder-shaped GGUF: enc./dec. tensor stacks, layer-0
    relative-position bias tables, gated-gelu (v1.1) or relu FFN."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", f"tpullm-tiny-{arch}")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.attention.relative_buckets_count", n_rel_buckets)
    if arch == "t5":
        w.add_kv(f"{arch}.decoder_block_count", n_layer)
        w.add_kv(f"{arch}.decoder_start_token_id", 1)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", False)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def stack(prefix, cross=False, rel=False):
        w.add_tensor(prefix + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(prefix + "attn_q.weight", rand((n_embd, n_embd)))
        w.add_tensor(prefix + "attn_k.weight", rand((n_embd, n_embd)))
        w.add_tensor(prefix + "attn_v.weight", rand((n_embd, n_embd)))
        w.add_tensor(prefix + "attn_o.weight", rand((n_embd, n_embd)))
        if rel:
            w.add_tensor(prefix + "attn_rel_b.weight",
                         rand((n_rel_buckets, n_head), 0.3))
        if cross:
            w.add_tensor(prefix + "cross_attn_norm.weight", 1.0 + rand((n_embd,)))
            w.add_tensor(prefix + "cross_attn_q.weight", rand((n_embd, n_embd)))
            w.add_tensor(prefix + "cross_attn_k.weight", rand((n_embd, n_embd)))
            w.add_tensor(prefix + "cross_attn_v.weight", rand((n_embd, n_embd)))
            w.add_tensor(prefix + "cross_attn_o.weight", rand((n_embd, n_embd)))
        w.add_tensor(prefix + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        if gated:
            w.add_tensor(prefix + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(prefix + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(prefix + "ffn_down.weight", rand((n_embd, n_ff)))

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        stack(f"enc.blk.{i}.", rel=(i == 0))
    w.add_tensor("enc.output_norm.weight", 1.0 + rand((n_embd,)))
    if arch == "t5":
        for i in range(n_layer):
            stack(f"dec.blk.{i}.", cross=True, rel=(i == 0))
        w.add_tensor("dec.output_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_rwkv7_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 32,
    head_size: int = 8,
    n_ff: int = 64,
    rank: int = 4,
    n_ctx: int = 256,
    gated: bool = True,
    seed: int = 0,
) -> str:
    """Tiny RWKV7-shaped GGUF (delta-rule time-mix tensor set)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)

    w = GGUFWriter(path, architecture="rwkv7")
    w.add_kv("general.name", "tpullm-tiny-rwkv7")
    w.add_kv("rwkv7.block_count", n_layer)
    w.add_kv("rwkv7.context_length", n_ctx)
    w.add_kv("rwkv7.embedding_length", n_embd)
    w.add_kv("rwkv7.feed_forward_length", n_ff)
    w.add_kv("rwkv7.attention.head_count", 0)
    w.add_kv("rwkv7.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("rwkv7.wkv.head_size", head_size)
    w.add_kv("rwkv7.token_shift_count", 2)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    H = n_embd // head_size
    n_fused = 6 if gated else 5
    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    w.add_tensor("token_embd_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("token_embd_norm.bias", rand((n_embd,)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "attn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_norm_2.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "attn_norm_2.bias", rand((n_embd,)))
        w.add_tensor(p + "time_mix_lerp_fused.weight", rand((n_fused, 1, n_embd)))
        w.add_tensor(p + "time_mix_w0.weight", rand((n_embd,)))
        w.add_tensor(p + "time_mix_w1.weight", rand((rank, n_embd)))
        w.add_tensor(p + "time_mix_w2.weight", rand((n_embd, rank)))
        w.add_tensor(p + "time_mix_a0.weight", rand((n_embd,)))
        w.add_tensor(p + "time_mix_a1.weight", rand((rank, n_embd)))
        w.add_tensor(p + "time_mix_a2.weight", rand((n_embd, rank)))
        if i > 0:
            w.add_tensor(p + "time_mix_v0.weight", rand((n_embd,)))
            w.add_tensor(p + "time_mix_v1.weight", rand((rank, n_embd)))
            w.add_tensor(p + "time_mix_v2.weight", rand((n_embd, rank)))
        if gated:
            w.add_tensor(p + "time_mix_g1.weight", rand((rank, n_embd)))
            w.add_tensor(p + "time_mix_g2.weight", rand((n_embd, rank)))
        w.add_tensor(p + "time_mix_k_k.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "time_mix_k_a.weight", rand((n_embd,)))
        w.add_tensor(p + "time_mix_r_k.weight", rand((H, head_size)))
        w.add_tensor(p + "time_mix_receptance.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "time_mix_key.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "time_mix_value.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "time_mix_ln.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "time_mix_ln.bias", rand((n_embd,)))
        w.add_tensor(p + "time_mix_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "channel_mix_lerp_k.weight", rand((n_embd,)))
        w.add_tensor(p + "channel_mix_key.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "channel_mix_value.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("output_norm.bias", rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_jamba_gguf(
    path,
    *,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_inner: int = 128,
    d_state: int = 16,
    d_conv: int = 4,
    dt_rank: int = 4,
    n_ff: int = 96,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ctx: int = 256,
    seed: int = 0,
    with_moe: bool = True,
) -> str:
    """Tiny jamba-shaped GGUF: 4 layers = [mamba+dense, attn+dense,
    mamba+moe, attn+moe] (llm_build_jamba hybrid dispatch); with_moe=False
    makes every FFN slot dense (the hybrid-pipeline-servable shape)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    kinds = ["mamba", "attn", "mamba", "attn"]
    moe = [False, False, with_moe, with_moe]
    kv_arr = [0 if k == "mamba" else n_head_kv for k in kinds]
    n_layer = len(kinds)

    arch = "jamba"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-jamba")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, dtype=np.int32))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.ssm.state_size", d_state)
    w.add_kv(f"{arch}.ssm.time_step_rank", dt_rank)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        if kinds[i] == "mamba":
            w.add_tensor(p + "ssm_in.weight", rand((2 * d_inner, n_embd)))
            w.add_tensor(p + "ssm_conv1d.weight", rand((d_inner, d_conv)))
            w.add_tensor(p + "ssm_conv1d.bias", rand((d_inner,)))
            w.add_tensor(p + "ssm_x.weight", rand((dt_rank + 2 * d_state, d_inner)))
            w.add_tensor(p + "ssm_dt.weight", rand((d_inner, dt_rank)))
            w.add_tensor(p + "ssm_dt.bias", rand((d_inner,)))
            w.add_tensor(p + "ssm_dt_norm.weight", 1.0 + rand((dt_rank,)))
            w.add_tensor(p + "ssm_b_norm.weight", 1.0 + rand((d_state,)))
            w.add_tensor(p + "ssm_c_norm.weight", 1.0 + rand((d_state,)))
            w.add_tensor(p + "ssm_a", -np.exp(rand((d_inner, d_state)) - 1.0))
            w.add_tensor(p + "ssm_d", 1.0 + rand((d_inner,)))
            w.add_tensor(p + "ssm_out.weight", rand((n_embd, d_inner)))
        else:
            w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
            w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
            w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
            w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        if moe[i]:
            w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
            w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff, n_embd)))
            w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff, n_embd)))
            w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff)))
        else:
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_arwkv7_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 32,
    head_size: int = 8,
    n_ff: int = 64,
    rank: int = 4,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny arwkv7-shaped GGUF: rwkv7 time-mix + RMS norms + swiglu FFN."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)

    arch = "arwkv7"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-arwkv7")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", 0)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.wkv.head_size", head_size)
    w.add_kv(f"{arch}.token_shift_count", 1)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    H = n_embd // head_size
    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "time_mix_lerp_fused.weight", rand((6, 1, n_embd)))
        w.add_tensor(p + "time_mix_w0.weight", rand((n_embd,)))
        w.add_tensor(p + "time_mix_w1.weight", rand((rank, n_embd)))
        w.add_tensor(p + "time_mix_w2.weight", rand((n_embd, rank)))
        w.add_tensor(p + "time_mix_a0.weight", rand((n_embd,)))
        w.add_tensor(p + "time_mix_a1.weight", rand((rank, n_embd)))
        w.add_tensor(p + "time_mix_a2.weight", rand((n_embd, rank)))
        if i > 0:
            w.add_tensor(p + "time_mix_v0.weight", rand((n_embd,)))
            w.add_tensor(p + "time_mix_v1.weight", rand((rank, n_embd)))
            w.add_tensor(p + "time_mix_v2.weight", rand((n_embd, rank)))
        w.add_tensor(p + "time_mix_g1.weight", rand((rank, n_embd)))
        w.add_tensor(p + "time_mix_g2.weight", rand((n_embd, rank)))
        w.add_tensor(p + "time_mix_k_k.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "time_mix_k_a.weight", rand((n_embd,)))
        w.add_tensor(p + "time_mix_r_k.weight", rand((H, head_size)))
        w.add_tensor(p + "time_mix_receptance.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "time_mix_key.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "time_mix_value.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "time_mix_ln.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "time_mix_ln.bias", rand((n_embd,)))
        w.add_tensor(p + "time_mix_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_wavtokenizer_gguf(
    path,
    *,
    n_vocab_codes: int = 64,
    n_feat: int = 16,
    n_posnet_embd: int = 16,
    n_convnext_embd: int = 16,
    n_out: int = 34,  # spectral head width (2 * (n_fft/2+1) scaled down)
    n_groups: int = 4,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny wavtokenizer-dec-shaped GGUF (posnet + convnext vocoder)."""
    rng = np.random.default_rng(seed)

    arch = "wavtokenizer-dec"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-wavtok")
    w.add_kv(f"{arch}.block_count", 1)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_feat)
    w.add_kv(f"{arch}.feed_forward_length", 0)
    w.add_kv(f"{arch}.vocab_size", n_vocab_codes)
    w.add_kv(f"{arch}.attention.head_count", 1)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_kv(f"{arch}.attention.group_norm_epsilon", 1e-6)
    w.add_kv(f"{arch}.attention.group_norm_groups", n_groups)
    w.add_kv(f"{arch}.attention.causal", False)
    w.add_kv(f"{arch}.features_length", n_feat)
    w.add_kv(f"{arch}.posnet.embedding_length", n_posnet_embd)
    w.add_kv(f"{arch}.posnet.block_count", 6)
    w.add_kv(f"{arch}.convnext.embedding_length", n_convnext_embd)
    w.add_kv(f"{arch}.convnext.block_count", 2)
    w.add_kv("tokenizer.ggml.model", "none")

    def rand(shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    C = n_posnet_embd
    w.add_tensor("token_embd.weight", rand((n_vocab_codes, n_feat)))
    w.add_tensor("conv1d.weight", rand((C, n_feat, 7)))
    w.add_tensor("conv1d.bias", rand((C,)))
    for i in range(6):
        p = f"posnet.{i}."
        if i == 2:  # attention block
            w.add_tensor(p + "attn_norm.weight", 1.0 + rand((C,)))
            w.add_tensor(p + "attn_norm.bias", rand((C,)))
            for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
                w.add_tensor(p + nm + ".weight", rand((C, C, 1)))
                w.add_tensor(p + nm + ".bias", rand((C,)))
        elif i == 5:  # trailing group norm
            w.add_tensor(p + "norm.weight", 1.0 + rand((C,)))
            w.add_tensor(p + "norm.bias", rand((C,)))
        else:  # resnet block
            w.add_tensor(p + "norm1.weight", 1.0 + rand((C,)))
            w.add_tensor(p + "norm1.bias", rand((C,)))
            w.add_tensor(p + "conv1.weight", rand((C, C, 3)))
            w.add_tensor(p + "conv1.bias", rand((C,)))
            w.add_tensor(p + "norm2.weight", 1.0 + rand((C,)))
            w.add_tensor(p + "norm2.bias", rand((C,)))
            w.add_tensor(p + "conv2.weight", rand((C, C, 3)))
            w.add_tensor(p + "conv2.bias", rand((C,)))
    w.add_tensor("token_embd_norm.weight", 1.0 + rand((C,)))
    w.add_tensor("token_embd_norm.bias", rand((C,)))
    D = n_convnext_embd
    for i in range(2):
        p = f"convnext.{i}."
        w.add_tensor(p + "dw.weight", rand((D, 1, 7)))
        w.add_tensor(p + "dw.bias", rand((D,)))
        w.add_tensor(p + "norm.weight", 1.0 + rand((D,)))
        w.add_tensor(p + "norm.bias", rand((D,)))
        w.add_tensor(p + "pw1.weight", rand((3 * D, D)))
        w.add_tensor(p + "pw1.bias", rand((3 * D,)))
        w.add_tensor(p + "pw2.weight", rand((D, 3 * D)))
        w.add_tensor(p + "pw2.bias", rand((D,)))
        w.add_tensor(p + "gamma.weight", 1.0 + rand((D,)))
    w.add_tensor("output_norm.weight", 1.0 + rand((D,)))
    w.add_tensor("output_norm.bias", rand((D,)))
    w.add_tensor("output.weight", rand((n_out, D)))
    w.add_tensor("output.bias", rand((n_out,)))
    w.write()
    return str(path)


def make_tiny_hybrid2_gguf(
    path,
    *,
    arch: str = "nemotron_h",
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_inner: int = 64,
    d_state: int = 16,
    d_conv: int = 4,
    n_ssm_head: int = 4,
    n_group: int = 2,
    n_ff: int = 96,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny mamba2-hybrid GGUF. nemotron_h: one block per layer
    [mamba2, attn, relu²-ffn]; granitehybrid: mixer+swiglu per layer."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    conv_w = d_inner + 2 * n_group * d_state
    if arch in ("nemotron_h", "nemotron_h_moe"):
        kinds = ["mamba2", "attn", "ffn"]
    else:
        kinds = ["mamba2", "attn"]
    kv_arr = [n_head_kv if k == "attn" else 0 for k in kinds]
    n_layer = len(kinds)

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", f"tpullm-tiny-{arch}")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, dtype=np.int32))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.ssm.state_size", d_state)
    w.add_kv(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_kv(f"{arch}.ssm.group_count", n_group)
    if arch == "granitehybrid":
        w.add_kv(f"{arch}.residual_scale", 0.5)
        w.add_kv(f"{arch}.embedding_scale", 2.0)
        w.add_kv(f"{arch}.logit_scale", 4.0)
    if arch == "nemotron_h_moe":
        w.add_kv(f"{arch}.expert_count", 4)
        w.add_kv(f"{arch}.expert_used_count", 2)
        w.add_kv(f"{arch}.expert_gating_func", 2)  # sigmoid
        w.add_kv(f"{arch}.expert_weights_norm", True)
        w.add_kv(f"{arch}.expert_weights_scale", 2.0)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i, kind in enumerate(kinds):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        if kind == "mamba2":
            w.add_tensor(p + "ssm_in.weight",
                         rand((2 * d_inner + 2 * n_group * d_state + n_ssm_head, n_embd)))
            w.add_tensor(p + "ssm_conv1d.weight", rand((conv_w, d_conv)))
            w.add_tensor(p + "ssm_conv1d.bias", rand((conv_w,)))
            w.add_tensor(p + "ssm_dt.bias", rand((n_ssm_head,)))
            w.add_tensor(p + "ssm_a", -np.exp(rand((n_ssm_head,))))
            w.add_tensor(p + "ssm_d", rand((n_ssm_head,)))
            w.add_tensor(p + "ssm_norm.weight", 1.0 + rand((d_inner,)))
            w.add_tensor(p + "ssm_out.weight", rand((n_embd, d_inner)))
        elif kind == "attn":
            w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
            w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
            w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
            w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        if arch == "nemotron_h":
            if kind == "ffn":  # relu² sequential with biases
                w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
                w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
                w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
                w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
        elif arch == "nemotron_h_moe":
            if kind == "ffn":  # gateless ReLU² MoE + gateless shexp
                w.add_tensor(p + "ffn_gate_inp.weight", rand((4, n_embd)))
                w.add_tensor(p + "exp_probs_b.bias", rand((4,), 0.5))
                w.add_tensor(p + "ffn_up_exps.weight", rand((4, n_ff, n_embd)))
                w.add_tensor(p + "ffn_down_exps.weight", rand((4, n_embd, n_ff)))
                w.add_tensor(p + "ffn_up_shexp.weight", rand((n_ff, n_embd)))
                w.add_tensor(p + "ffn_down_shexp.weight", rand((n_embd, n_ff)))
        else:  # granitehybrid: swiglu FFN paired with every mixer
            w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_lfm2_gguf(
    path,
    *,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 96,
    l_cache: int = 3,
    n_ctx: int = 256,
    n_expert: int = 0,  # >0: lfm2moe (sigmoid-routed w1/w2/w3 experts)
    n_expert_used: int = 2,
    n_ff_exp: int = 32,
    n_dense_lead: int = 1,
    seed: int = 0,
) -> str:
    """Tiny lfm2-shaped GGUF: [shortconv, attn, shortconv] layers + swiglu
    FFN each (llm_build_lfm2 shapes); n_expert>0 makes it lfm2moe with a
    dense lead and sigmoid-routed renormalized experts + selection bias."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    kinds = ["conv", "attn", "conv"]
    kv_arr = [n_head_kv if k == "attn" else 0 for k in kinds]
    n_layer = len(kinds)

    arch = "lfm2moe" if n_expert else "lfm2"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-lfm2")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, dtype=np.int32))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.shortconv.l_cache", l_cache)
    if n_expert:
        w.add_kv(f"{arch}.expert_count", n_expert)
        w.add_kv(f"{arch}.expert_used_count", n_expert_used)
        w.add_kv(f"{arch}.expert_feed_forward_length", n_ff_exp)
        w.add_kv(f"{arch}.leading_dense_block_count", n_dense_lead)
        w.add_kv(f"{arch}.expert_gating_func", 2)  # sigmoid
        w.add_kv(f"{arch}.expert_weights_norm", True)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    w.add_tensor("token_embd_norm.weight", 1.0 + rand((n_embd,)))
    for i, kind in enumerate(kinds):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        if kind == "conv":
            w.add_tensor(p + "shortconv.in_proj.weight", rand((3 * n_embd, n_embd)))
            w.add_tensor(p + "shortconv.conv.weight", rand((n_embd, l_cache)))
            w.add_tensor(p + "shortconv.out_proj.weight", rand((n_embd, n_embd)))
        else:
            w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
            w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
            w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
            w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
            w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
            w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        if n_expert and i >= n_dense_lead:
            w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
            w.add_tensor(p + "exp_probs_b.bias", rand((n_expert,), 0.5))
            w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
        else:
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_qwen3next_gguf(
    path,
    *,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    head_dim: int = 16,
    lin_k_heads: int = 2,   # ssm.group_count (linear key heads)
    lin_v_heads: int = 4,   # ssm.time_step_rank (linear value heads)
    lin_k_dim: int = 16,    # ssm.state_size
    lin_v_dim: int = 16,
    d_conv: int = 4,
    n_ff_exp: int = 32,
    n_ff_shexp: int = 48,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny qwen3next-shaped GGUF: 3 gated-DeltaNet layers + 1 full-attention
    layer (fused per-head query gate), MoE + sigmoid-gated shared expert on
    every layer. Tensor layout matches the reference converter's restructure
    (attn_qkv = flat [Q|K|V], attn_gate = z, ssm_a = -exp(A_log))."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    d_inner = lin_v_heads * lin_v_dim
    conv_ch = d_inner + 2 * lin_k_heads * lin_k_dim
    r = lin_v_heads // lin_k_heads
    kinds = ["lin", "lin", "lin", "attn"]
    kv_arr = [0 if k == "lin" else n_head_kv for k in kinds]
    n_layer = len(kinds)

    arch = "qwen3next"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-qwen3next")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff_exp)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, dtype=np.int32))
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.value_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim // 4)
    w.add_kv(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_kv(f"{arch}.ssm.state_size", lin_k_dim)
    w.add_kv(f"{arch}.ssm.group_count", lin_k_heads)
    w.add_kv(f"{arch}.ssm.time_step_rank", lin_v_heads)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add_kv(f"{arch}.expert_shared_feed_forward_length", n_ff_shexp)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i, kind in enumerate(kinds):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "post_attention_norm.weight", 1.0 + rand((n_embd,)))
        if kind == "lin":
            w.add_tensor(p + "attn_qkv.weight", rand((conv_ch, n_embd)))
            w.add_tensor(p + "attn_gate.weight", rand((d_inner, n_embd)))
            w.add_tensor(p + "ssm_ba.weight", rand((lin_k_heads * 2 * r, n_embd)))
            w.add_tensor(p + "ssm_conv1d.weight", rand((conv_ch, d_conv)))
            w.add_tensor(p + "ssm_dt.bias", rand((lin_v_heads,)))
            w.add_tensor(p + "ssm_a", -np.exp(rand((lin_v_heads,))))
            w.add_tensor(p + "ssm_norm.weight", 1.0 + rand((lin_v_dim,)))
            w.add_tensor(p + "ssm_out.weight", rand((n_embd, d_inner)))
        else:
            w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim * 2, n_embd)))
            w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
            w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
            w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
            w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
            w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
        w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
        w.add_tensor(p + "ffn_gate_inp_shexp.weight", rand((n_embd,)))
        w.add_tensor(p + "ffn_gate_shexp.weight", rand((n_ff_shexp, n_embd)))
        w.add_tensor(p + "ffn_up_shexp.weight", rand((n_ff_shexp, n_embd)))
        w.add_tensor(p + "ffn_down_shexp.weight", rand((n_embd, n_ff_shexp)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_chameleon_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 96,
    swin_norm: bool = False,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny chameleon-shaped GGUF: llama body + per-head LayerNorm qk norms
    (weight+bias) and the optional swin_norm post-norm ordering."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    arch = "chameleon"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-chameleon")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.swin_norm", swin_norm)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_q_norm.bias", rand((head_dim,)))
        w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_k_norm.bias", rand((head_dim,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_plm_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    qk_nope: int = 16,
    qk_rope: int = 8,
    v_dim: int = 16,
    kv_lora: int = 24,
    n_ff: int = 96,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny plm-shaped GGUF: MLA attention (direct wq, kv compression) with
    an all-dense gateless ReLU² FFN (llm_build_plm)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    dk = qk_nope + qk_rope

    arch = "plm"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-plm")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head)
    w.add_kv(f"{arch}.attention.key_length", dk)
    w.add_kv(f"{arch}.attention.value_length", v_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.attention.kv_lora_rank", kv_lora)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", qk_rope)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_q.weight", rand((n_head * dk, n_embd)))
        w.add_tensor(p + "attn_kv_a_mqa.weight", rand((kv_lora + qk_rope, n_embd)))
        w.add_tensor(p + "attn_kv_a_norm.weight", np.ones(kv_lora, dtype=np.float32))
        w.add_tensor(p + "attn_kv_b.weight", rand((n_head * (qk_nope + v_dim), kv_lora)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * v_dim)))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_phimoe_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 48,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny phimoe-shaped GGUF: RMS+bias norms, split biased qkv, softmax
    renormalized MoE, biased output head (LLM_ARCH_PHIMOE tensor set)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    arch = "phimoe"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-phimoe")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_q.bias", rand((n_head * head_dim,)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.bias", rand((n_head_kv * head_dim,)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.bias", rand((n_head_kv * head_dim,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
        w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff, n_embd)))
        w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff, n_embd)))
        w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output_norm.bias", rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.add_tensor("output.bias", rand((n_vocab,)))
    w.write()
    return str(path)


def make_tiny_rwkv6qwen2_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 32,
    head_size: int = 8,
    n_head_kv: int = 2,
    n_ff: int = 64,
    lora_rank: int = 4,
    decay_rank: int = 4,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny rwkv6qwen2-shaped GGUF: qrwkv time-mix (GQA k/v with biases, no
    bonus) on a qwen2 swiglu body."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    H = n_embd // head_size
    kv_size = n_head_kv * head_size

    arch = "rwkv6qwen2"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-rwkv6qwen2")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", H)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.wkv.head_size", head_size)
    w.add_kv(f"{arch}.token_shift_count", 1)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "time_mix_lerp_x.weight", rand((n_embd,)))
        w.add_tensor(p + "time_mix_lerp_fused.weight", rand((5, 1, n_embd)))
        w.add_tensor(p + "time_mix_w1.weight", rand((5 * lora_rank, n_embd)))
        w.add_tensor(p + "time_mix_w2.weight", rand((5, n_embd, lora_rank)))
        w.add_tensor(p + "time_mix_decay.weight", rand((n_embd,)) - 4.0)
        w.add_tensor(p + "time_mix_decay_w1.weight", rand((decay_rank, n_embd)))
        w.add_tensor(p + "time_mix_decay_w2.weight", rand((n_embd, decay_rank)))
        w.add_tensor(p + "time_mix_key.weight", rand((kv_size, n_embd)))
        w.add_tensor(p + "time_mix_key.bias", rand((kv_size,)))
        w.add_tensor(p + "time_mix_value.weight", rand((kv_size, n_embd)))
        w.add_tensor(p + "time_mix_value.bias", rand((kv_size,)))
        w.add_tensor(p + "time_mix_receptance.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "time_mix_receptance.bias", rand((n_embd,)))
        w.add_tensor(p + "time_mix_gate.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "time_mix_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def _wpm_vocab():
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    types = [TokenType.CONTROL] * 5
    words = ["the", "quick", "brown", "fox", "hello", "world", "dog", "cat",
             "a", "an", "and", "of"]
    tokens += ["▁" + w for w in words]
    types += [TokenType.NORMAL] * len(words)
    for ch in "abcdefghijklmnopqrstuvwxyz":
        tokens += ["▁" + ch, ch]
        types += [TokenType.NORMAL, TokenType.NORMAL]
    return tokens, types


def _encoder_header(w, arch, *, n_layer, n_ctx, n_embd, n_ff, n_head,
                    n_head_kv=None, eps=1e-12):
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    if n_head_kv is not None:
        w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", eps)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", eps)
    w.add_kv(f"{arch}.attention.causal", False)
    w.add_kv(f"{arch}.pooling_type", 1)  # mean
    tokens, types = _wpm_vocab()
    w.add_kv("tokenizer.ggml.model", "bert")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.cls_token_id", 2)
    w.add_kv("tokenizer.ggml.seperator_token_id", 3)
    w.add_kv("tokenizer.ggml.unknown_token_id", 1)
    w.add_kv("tokenizer.ggml.padding_token_id", 0)
    return len(tokens)


def make_tiny_nomic_moe_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 96,
    n_expert: int = 4,
    n_expert_used: int = 2,
    moe_every_n: int = 2,
    n_ctx: int = 128,
    seed: int = 0,
) -> str:
    """Tiny nomic-bert-moe GGUF: fused biased qkv + rope, GELU up/down-only
    MoE on layers il % n == 1, GELU sequential elsewhere."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head

    arch = "nomic-bert-moe"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-nomic-moe")
    n_vocab = _encoder_header(w, arch, n_layer=n_layer, n_ctx=n_ctx,
                              n_embd=n_embd, n_ff=n_ff, n_head=n_head)
    w.add_kv(f"{arch}.moe_every_n_layers", moe_every_n)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv(f"{arch}.rope.freq_base", 1000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    w.add_tensor("token_types.weight", rand((2, n_embd)))
    w.add_tensor("token_embd_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("token_embd_norm.bias", rand((n_embd,)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_qkv.weight", rand((3 * n_embd, n_embd)))
        w.add_tensor(p + "attn_qkv.bias", rand((3 * n_embd,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_output_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_output_norm.bias", rand((n_embd,)))
        if moe_every_n > 0 and i % moe_every_n == 1:
            w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
            w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff, n_embd)))
            w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff)))
        else:
            w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
            w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
        w.add_tensor(p + "layer_output_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "layer_output_norm.bias", rand((n_embd,)))
    w.write()
    return str(path)


def make_tiny_neo_bert_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 48,
    n_ctx: int = 128,
    seed: int = 0,
) -> str:
    """Tiny neo-bert GGUF: pre-norm RMS, fused qkv, NORM rope, fused swiglu."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head

    arch = "neo-bert"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-neo-bert")
    n_vocab = _encoder_header(w, arch, n_layer=n_layer, n_ctx=n_ctx,
                              n_embd=n_embd, n_ff=n_ff, n_head=n_head,
                              eps=1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight", rand((3 * n_embd, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((2 * n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("enc.output_norm.weight", 1.0 + rand((n_embd,)))
    w.write()
    return str(path)


def make_tiny_modern_bert_gguf(
    path,
    *,
    n_layer: int = 3,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 48,
    n_ctx: int = 128,
    sliding_window: int = 8,
    seed: int = 0,
) -> str:
    """Tiny modern-bert GGUF: pre-norm LN (layer 0 skips the attn norm),
    fused qkv, symmetric sliding window on local layers, fused GEGLU FFN."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head

    arch = "modern-bert"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-modern-bert")
    n_vocab = _encoder_header(w, arch, n_layer=n_layer, n_ctx=n_ctx,
                              n_embd=n_embd, n_ff=n_ff, n_head=n_head,
                              eps=1e-5)
    w.add_kv(f"{arch}.attention.sliding_window", sliding_window)
    w.add_kv(f"{arch}.attention.sliding_window_pattern", 3)
    w.add_kv(f"{arch}.rope.freq_base", 160000.0)
    w.add_kv(f"{arch}.rope.freq_base_swa", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    w.add_tensor("token_embd_norm.weight", np.ones(n_embd, dtype=np.float32))
    for i in range(n_layer):
        p = f"blk.{i}."
        if i > 0:  # layer 0 has no attention norm
            w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight", rand((3 * n_embd, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((2 * n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.write()
    return str(path)


def make_tiny_gemma_embedding_gguf(
    path,
    *,
    n_layer: int = 6,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 96,
    n_ctx: int = 128,
    sliding_window: int = 8,
    seed: int = 0,
) -> str:
    """Tiny gemma-embedding GGUF: the gemma3 tensor set with bidirectional
    attention metadata (llm_build_gemma_embedding)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head

    arch = "gemma-embedding"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-gemma-embedding")
    n_vocab = _encoder_header(w, arch, n_layer=n_layer, n_ctx=n_ctx,
                              n_embd=n_embd, n_ff=n_ff, n_head=n_head,
                              n_head_kv=n_head_kv, eps=1e-5)
    w.add_kv(f"{arch}.attention.sliding_window", sliding_window)
    w.add_kv(f"{arch}.attention.sliding_window_pattern", 6)
    w.add_kv(f"{arch}.rope.freq_base", 1_000_000.0)
    w.add_kv(f"{arch}.rope.freq_base_swa", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.attention.scale", head_dim ** -0.5)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, dtype=np.float32))
        w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, dtype=np.float32))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "post_attention_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "post_ffw_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.write()
    return str(path)


def make_tiny_falcon_h1_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_inner: int = 64,
    d_state: int = 16,
    d_conv: int = 4,
    n_ssm_head: int = 4,
    n_group: int = 2,
    n_ff: int = 96,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny falcon-h1 GGUF: every layer = attention + mamba2 mixer in
    parallel, then swiglu FFN (llm_build_falcon_h1)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    conv_w = d_inner + 2 * n_group * d_state

    arch = "falcon-h1"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-falcon-h1")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.ssm.state_size", d_state)
    w.add_kv(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_kv(f"{arch}.ssm.group_count", n_group)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "ssm_in.weight",
                     rand((2 * d_inner + 2 * n_group * d_state + n_ssm_head, n_embd)))
        w.add_tensor(p + "ssm_conv1d.weight", rand((conv_w, d_conv)))
        w.add_tensor(p + "ssm_conv1d.bias", rand((conv_w,)))
        w.add_tensor(p + "ssm_dt.bias", rand((n_ssm_head,)))
        w.add_tensor(p + "ssm_a", -np.exp(rand((n_ssm_head,))))
        w.add_tensor(p + "ssm_d", rand((n_ssm_head,)))
        w.add_tensor(p + "ssm_norm.weight", 1.0 + rand((d_inner,)))
        w.add_tensor(p + "ssm_out.weight", rand((n_embd, d_inner)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_plamo_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 4,
    n_ff: int = 96,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny plamo v1 GGUF: parallel attention+FFN residual."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    arch = "plamo"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-plamo")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_plamo2_gguf(
    path,
    *,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_mamba_head: int = 4,
    mamba_head_dim: int = 16,
    d_state: int = 16,
    d_conv: int = 4,
    dt_dim: int = 8,
    n_ff: int = 48,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny plamo2 GGUF: [mamba, attn] hybrid with pre+post norm sandwiches
    and fused-swiglu FFN sub-blocks."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    d_inner = n_mamba_head * mamba_head_dim
    kinds = ["mamba", "attn"]
    kv_arr = [0 if k == "mamba" else n_head_kv for k in kinds]
    n_layer = len(kinds)

    arch = "plamo2"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-plamo2")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, dtype=np.int32))
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.value_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.ssm.state_size", d_state)
    w.add_kv(f"{arch}.ssm.time_step_rank", n_mamba_head)
    w.add_kv(f"{arch}.ssm.group_count", 0)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i, kind in enumerate(kinds):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "post_attention_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "post_ffw_norm.weight", 1.0 + rand((n_embd,)))
        if kind == "mamba":
            w.add_tensor(p + "ssm_in.weight", rand((2 * d_inner, n_embd)))
            w.add_tensor(p + "ssm_conv1d.weight", rand((d_inner, d_conv)))
            w.add_tensor(p + "ssm_x.weight", rand((2 * d_state + dt_dim, d_inner)))
            w.add_tensor(p + "ssm_b_norm.weight", 1.0 + rand((d_state,)))
            w.add_tensor(p + "ssm_c_norm.weight", 1.0 + rand((d_state,)))
            w.add_tensor(p + "ssm_dt_norm.weight", 1.0 + rand((dt_dim,)))
            w.add_tensor(p + "ssm_dt.weight", rand((n_mamba_head, dt_dim)))
            w.add_tensor(p + "ssm_dt.bias", rand((n_mamba_head,)))
            w.add_tensor(p + "ssm_a", -np.exp(rand((n_mamba_head,))))
            w.add_tensor(p + "ssm_d", 1.0 + rand((n_mamba_head,)))
            w.add_tensor(p + "ssm_out.weight", rand((n_embd, d_inner)))
        else:
            w.add_tensor(p + "attn_qkv.weight",
                         rand(((n_head + 2 * n_head_kv) * head_dim, n_embd)))
            w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
            w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
            w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "ffn_up.weight", rand((2 * n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_plamo3_gguf(
    path,
    *,
    n_layer: int = 3,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 48,
    n_ctx: int = 256,
    sliding_window: int = 8,
    seed: int = 0,
) -> str:
    """Tiny plamo3 GGUF: fused qkv + per-head qk norms, pre+post norm
    sandwich, fused swiglu, iSWA local layers."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    arch = "plamo3"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-plamo3")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.value_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.attention.sliding_window", sliding_window)
    w.add_kv(f"{arch}.attention.sliding_window_pattern", 3)
    w.add_kv(f"{arch}.rope.freq_base", 1000000.0)
    w.add_kv(f"{arch}.rope.freq_base_swa", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "post_attention_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight",
                     rand(((n_head + 2 * n_head_kv) * head_dim, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "post_ffw_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((2 * n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_grovemoe_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_expert: int = 8,
    n_expert_used: int = 2,
    n_group_experts: int = 4,  # chunk experts = n_expert / this = 2
    n_ff_exp: int = 32,
    n_ff_chexp: int = 16,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny grovemoe GGUF: qwen3 attention + adjugate-expert double MoE."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    n_chunk = n_expert // n_group_experts

    arch = "grovemoe"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-grovemoe")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff_exp)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add_kv(f"{arch}.expert_chunk_feed_forward_length", n_ff_chexp)
    w.add_kv(f"{arch}.experts_per_group", n_group_experts)
    w.add_kv(f"{arch}.expert_group_scale", 0.05)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
        w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
        w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
        w.add_tensor(p + "ffn_gate_chexps.weight", rand((n_chunk, n_ff_chexp, n_embd)))
        w.add_tensor(p + "ffn_up_chexps.weight", rand((n_chunk, n_ff_chexp, n_embd)))
        w.add_tensor(p + "ffn_down_chexps.weight", rand((n_chunk, n_embd, n_ff_chexp)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_afmoe_gguf(
    path,
    *,
    n_layer: int = 3,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 64,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 32,
    n_dense_lead: int = 1,
    n_ctx: int = 256,
    sliding_window: int = 8,
    seed: int = 0,
) -> str:
    """Tiny afmoe GGUF: gated attention + dual norm sandwiches + sigmoid MoE
    with selection bias and gated shexp; NoPE+full-attn every 2nd layer."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    arch = "afmoe"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-afmoe")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.attention.sliding_window", sliding_window)
    w.add_kv(f"{arch}.attention.sliding_window_pattern", 2)
    w.add_kv(f"{arch}.attention.no_rope_layer_step", 2)
    w.add_kv(f"{arch}.rope.freq_base", 1000000.0)
    w.add_kv(f"{arch}.rope.freq_base_swa", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.leading_dense_block_count", n_dense_lead)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add_kv(f"{arch}.expert_shared_count", 1)
    w.add_kv(f"{arch}.expert_weights_norm", True)
    w.add_kv(f"{arch}.expert_weights_scale", 2.826)
    w.add_kv(f"{arch}.expert_gating_func", 2)  # sigmoid
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "post_attention_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_gate.weight", rand((n_head * head_dim, n_embd)))
        w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "post_ffw_norm.weight", 1.0 + rand((n_embd,)))
        if i < n_dense_lead:
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        else:
            w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
            w.add_tensor(p + "exp_probs_b.bias", rand((n_expert,), 0.5))
            w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
            w.add_tensor(p + "ffn_gate_shexp.weight", rand((n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_up_shexp.weight", rand((n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_down_shexp.weight", rand((n_embd, n_ff_exp)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_mimo2_gguf(
    path,
    *,
    arch: str = "mimo2",
    n_embd: int = 64,
    head_dim: int = 16,
    n_ff: int = 64,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 32,
    n_ctx: int = 256,
    sliding_window: int = 8,
    seed: int = 0,
) -> str:
    """Tiny mimo2/step35 GGUF: iSWA with per-layer head counts; mimo2 adds
    attention sinks + sigmoid MoE, step35 adds qk norms + head-wise gate +
    gated shexp + half-rot global rope."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    step35 = arch == "step35"
    heads = [4, 2, 4]  # per-layer NAS head counts
    kv = [2, 1, 2]
    moe = [False, True, True]
    n_layer = len(heads)
    return _write_mimo2(path, arch, rng, tokens, scores, types, n_vocab,
                        step35, heads, kv, moe, n_layer, n_embd, head_dim,
                        n_ff, n_expert, n_expert_used, n_ff_exp, n_ctx,
                        sliding_window, swa_layers=None)


def make_tiny_mimo2_nas_gguf(path, *, arch="mimo2", heads, kv, swa_layers,
                             moe=None, n_embd=64, head_dim=16, n_ff=64,
                             n_expert=4, n_expert_used=2, n_ff_exp=32,
                             n_ctx=256, sliding_window=8, seed=0) -> str:
    """mimo2/step35 fixture with explicit per-layer head/kv/SWA layouts
    (converter round-trip tests need reference-expressible shapes)."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    step35 = arch == "step35"
    moe = moe if moe is not None else [False, True, True]
    n_layer = len(heads)
    return _write_mimo2(path, arch, rng, tokens, scores, types, n_vocab,
                        step35, list(heads), list(kv), moe, n_layer, n_embd,
                        head_dim, n_ff, n_expert, n_expert_used, n_ff_exp,
                        n_ctx, sliding_window, swa_layers=list(swa_layers))


def _write_mimo2(path, arch, rng, tokens, scores, types, n_vocab, step35,
                 heads, kv, moe, n_layer, n_embd, head_dim, n_ff, n_expert,
                 n_expert_used, n_ff_exp, n_ctx, sliding_window,
                 swa_layers):

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", f"tpullm-tiny-{arch}")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", np.asarray(heads, dtype=np.int32))
    w.add_kv(f"{arch}.attention.head_count_kv", np.asarray(kv, dtype=np.int32))
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.value_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.attention.sliding_window", sliding_window)
    if swa_layers is None:
        w.add_kv(f"{arch}.attention.sliding_window_pattern", 3)
    else:
        w.add_kv(f"{arch}.attention.sliding_window_pattern",
                 np.asarray(swa_layers, dtype=bool))
    w.add_kv(f"{arch}.rope.freq_base", 1000000.0)
    w.add_kv(f"{arch}.rope.freq_base_swa", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv(f"{arch}.expert_feed_forward_length", n_ff_exp)
    if step35:
        w.add_kv(f"{arch}.expert_weights_norm", True)
        w.add_kv(f"{arch}.expert_weights_scale", 1.5)
        w.add_kv(f"{arch}.expert_gating_func", 2)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        nh, nkv = heads[i], kv[i]
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((nh * head_dim, n_embd)))
        w.add_tensor(p + "attn_k.weight", rand((nkv * head_dim, n_embd)))
        w.add_tensor(p + "attn_v.weight", rand((nkv * head_dim, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, nh * head_dim)))
        if step35:
            w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
            w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
            w.add_tensor(p + "attn_gate.weight", rand((nh, n_embd)))
        else:
            w.add_tensor(p + "attn_sinks.weight", rand((nh,), 1.0))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        if moe[i]:
            w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
            w.add_tensor(p + "exp_probs_b.bias", rand((n_expert,), 0.5))
            w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
            if step35:
                w.add_tensor(p + "ffn_gate_shexp.weight", rand((n_ff_exp, n_embd)))
                w.add_tensor(p + "ffn_up_shexp.weight", rand((n_ff_exp, n_embd)))
                w.add_tensor(p + "ffn_down_shexp.weight", rand((n_embd, n_ff_exp)))
        else:
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_gate.bias", rand((n_ff,)))
            w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
            w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_cogvlm_gguf(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 96,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny cogvlm GGUF: fused qkv + parallel visual-expert weight set."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    arch = "cogvlm"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-cogvlm")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_qkv.weight", rand((3 * n_embd, n_embd)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "vis_attn_qkv.weight", rand((3 * n_embd, n_embd)))
        w.add_tensor(p + "vis_attn_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "vis_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "vis_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "vis_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_kimi_linear_gguf(
    path,
    *,
    n_embd: int = 64,
    n_head: int = 4,
    kda_head_dim: int = 16,
    k_mla: int = 24,   # qk_nope(16) + qk_rope(8)
    v_mla: int = 16,
    qk_rope: int = 8,
    kv_lora: int = 24,
    d_conv: int = 4,
    n_ff: int = 64,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 32,
    n_ctx: int = 256,
    seed: int = 0,
) -> str:
    """Tiny kimi-linear GGUF: [KDA, MLA, KDA] layers with dense-lead FFN then
    MoE + gated shexp; MLA layers are rope-free with split wk_b/wv_b."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    d_inner = n_head * kda_head_dim
    nope = k_mla - qk_rope
    kinds = ["kda", "mla", "kda"]
    kv_arr = [0 if k == "kda" else n_head for k in kinds]
    moe = [False, True, True]
    n_layer = len(kinds)

    arch = "kimi-linear"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-kimi-linear")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, dtype=np.int32))
    w.add_kv(f"{arch}.attention.key_length_mla", k_mla)
    w.add_kv(f"{arch}.attention.value_length_mla", v_mla)
    w.add_kv(f"{arch}.attention.kv_lora_rank", kv_lora)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.rope.dimension_count", qk_rope)
    w.add_kv(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_kv(f"{arch}.kda.head_dim", kda_head_dim)
    w.add_kv(f"{arch}.leading_dense_block_count", 1)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    w.add_kv(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add_kv(f"{arch}.expert_shared_count", 1)
    w.add_kv(f"{arch}.expert_weights_scale", 2.446)
    w.add_kv(f"{arch}.expert_gating_func", 2)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    for i, kind in enumerate(kinds):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        if kind == "kda":
            w.add_tensor(p + "attn_q.weight", rand((d_inner, n_embd)))
            w.add_tensor(p + "attn_k.weight", rand((d_inner, n_embd)))
            w.add_tensor(p + "attn_v.weight", rand((d_inner, n_embd)))
            for nm in ("ssm_conv1d_q", "ssm_conv1d_k", "ssm_conv1d_v"):
                w.add_tensor(p + nm + ".weight", rand((d_inner, 1, d_conv)))
            w.add_tensor(p + "ssm_f_a.weight", rand((kda_head_dim, n_embd)))
            w.add_tensor(p + "ssm_f_b.weight", rand((d_inner, kda_head_dim)))
            w.add_tensor(p + "ssm_beta.weight", rand((n_head, n_embd)))
            w.add_tensor(p + "ssm_a", -np.exp(rand((1, n_head))))
            w.add_tensor(p + "ssm_dt.bias", rand((d_inner,)))
            w.add_tensor(p + "ssm_g_a.weight", rand((kda_head_dim, n_embd)))
            w.add_tensor(p + "ssm_g_b.weight", rand((d_inner, kda_head_dim)))
            w.add_tensor(p + "ssm_norm.weight", 1.0 + rand((kda_head_dim,)))
            w.add_tensor(p + "attn_output.weight", rand((n_embd, d_inner)))
        else:
            w.add_tensor(p + "attn_q.weight", rand((n_head * k_mla, n_embd)))
            w.add_tensor(p + "attn_kv_a_mqa.weight", rand((kv_lora + qk_rope, n_embd)))
            w.add_tensor(p + "attn_kv_a_norm.weight", 1.0 + rand((kv_lora,)))
            # ggml ne {nope, kv_lora, H} → numpy (H, kv_lora, nope)
            w.add_tensor(p + "attn_k_b.weight", rand((n_head, kv_lora, nope)))
            # ggml ne {kv_lora, v_mla, H} → numpy (H, v_mla, kv_lora)
            w.add_tensor(p + "attn_v_b.weight", rand((n_head, v_mla, kv_lora)))
            w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * v_mla)))
        if moe[i]:
            w.add_tensor(p + "ffn_gate_inp.weight", rand((n_expert, n_embd)))
            w.add_tensor(p + "exp_probs_b.bias", rand((n_expert,), 0.5))
            w.add_tensor(p + "ffn_gate_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_up_exps.weight", rand((n_expert, n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_down_exps.weight", rand((n_expert, n_embd, n_ff_exp)))
            w.add_tensor(p + "ffn_gate_shexp.weight", rand((n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_up_shexp.weight", rand((n_ff_exp, n_embd)))
            w.add_tensor(p + "ffn_down_shexp.weight", rand((n_embd, n_ff_exp)))
        else:
            w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
            w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output.weight", rand((n_vocab, n_embd)))
    w.write()
    return str(path)


def make_tiny_gemma3n_gguf(
    path,
    *,
    n_layer: int = 6,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    head_dim: int = 16,
    n_ff: int = 96,
    n_altup: int = 2,
    n_embd_altup: int = 16,
    laurel_rank: int = 8,
    n_kv_shared: int = 2,
    n_ctx: int = 256,
    sliding_window: int = 8,
    seed: int = 0,
) -> str:
    """Tiny gemma3n GGUF: altup stack, laurel, per-layer embeddings,
    trailing shared-KV layers, iSWA pattern 5."""
    rng = np.random.default_rng(seed)
    tokens, scores, types = _byte_vocab(DEFAULT_WORDS)
    n_vocab = len(tokens)
    kv_from_start = n_layer - n_kv_shared

    arch = "gemma3n"
    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.name", "tpullm-tiny-gemma3n")
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.value_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.attention.sliding_window", sliding_window)
    w.add_kv(f"{arch}.attention.shared_kv_layers", n_kv_shared)
    w.add_kv(f"{arch}.rope.freq_base", 1000000.0)
    w.add_kv(f"{arch}.rope.freq_base_swa", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", head_dim)
    w.add_kv(f"{arch}.altup.num_inputs", n_altup)
    w.add_kv(f"{arch}.altup.active_idx", 0)
    w.add_kv(f"{arch}.embedding_length_per_layer_input", n_embd_altup)
    w.add_kv(f"{arch}.final_logit_softcapping", 30.0)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    w.add_tensor("per_layer_token_embd.weight",
                 rand((n_vocab, n_embd_altup * n_layer)))
    w.add_tensor("altup_proj.weight", rand((n_altup - 1, n_embd, n_embd)))
    w.add_tensor("altup_unembd_proj.weight", rand((n_altup - 1, n_embd, n_embd)))
    w.add_tensor("per_layer_model_proj.weight",
                 rand((n_embd_altup * n_layer, n_embd)))
    w.add_tensor("per_layer_proj_norm.weight", 1.0 + rand((n_embd_altup,)))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "post_attention_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "attn_q.weight", rand((n_head * head_dim, n_embd)))
        if i < kv_from_start:
            w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd)))
            w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd)))
        w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand((head_dim,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_head * head_dim)))
        w.add_tensor(p + "ffn_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "post_ffw_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "inp_gate.weight", rand((n_embd_altup, n_embd)))
        w.add_tensor(p + "proj.weight", rand((n_embd, n_embd_altup)))
        w.add_tensor(p + "post_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "altup_correct_coef.weight", rand((n_altup, n_altup)))
        w.add_tensor(p + "altup_correct_scale.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "altup_predict_coef.weight",
                     rand((n_altup * n_altup, n_altup)))
        w.add_tensor(p + "altup_router.weight", rand((n_altup, n_embd)))
        w.add_tensor(p + "altup_router_norm.weight", 1.0 + rand((n_embd,)))
        w.add_tensor(p + "laurel_l.weight", rand((laurel_rank, n_embd)))
        w.add_tensor(p + "laurel_r.weight", rand((n_embd, laurel_rank)))
        w.add_tensor(p + "laurel_post_norm.weight", 1.0 + rand((n_embd,)))
    w.add_tensor("output_norm.weight", 1.0 + rand((n_embd,)))
    w.write()  # tied output head
    return str(path)
