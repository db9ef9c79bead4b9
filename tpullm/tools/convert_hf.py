"""tpullm-convert-hf: HuggingFace checkpoint → GGUF.

Reference: convert_hf_to_gguf.py (301 registered model classes; here the
llama/mistral/qwen2/qwen3(+moe)/gemma2/gemma3/gpt2 families) — config.json →
GGUF metadata, safetensors/bin weights → (optionally f16) tensors with the
llama-family QK rope permute, tokenizer.json (byte-level BPE) or
tokenizer.model (SentencePiece) → GGUF vocab.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

from ..gguf.constants import GGMLType, TokenType
from ..gguf.writer import GGUFWriter

# model_type → GGUF architecture
ARCH_MAP = {
    "llama": "llama",
    "mistral": "llama",
    "mixtral": "llama",
    "qwen2": "qwen2",
    "qwen3": "qwen3",
    "qwen2_moe": "qwen2moe",
    "qwen3_moe": "qwen3moe",
    "gemma": "gemma",
    "gemma2": "gemma2",
    "gemma3": "gemma3",
    "gemma3_text": "gemma3",
    "gpt2": "gpt2",
    "phi3": "phi3",
    "olmo2": "olmo2",
    "cohere": "command-r",
    "granite": "granite",
    "gpt_oss": "gpt-oss",
    "starcoder2": "starcoder2",
    "stablelm": "stablelm",
    "olmoe": "olmoe",
    "gpt_neox": "gptneox",
    "smollm3": "smollm3",
    "minicpm": "minicpm",
    "arcee": "arcee",
    "dream": "dream",
    "llada": "llada",
    "t5": "t5",
    "mamba": "mamba",
    "mamba2": "mamba2",
    "qwen3_next": "qwen3next",
    "deepseek_v2": "deepseek2",
    "deepseek_v3": "deepseek2",
    "gemma3n": "gemma3n",
    "gemma3n_text": "gemma3n",
    "falcon_h1": "falcon-h1",
    "glm4_moe": "glm4moe",
    "olmo": "olmo",
    "phi": "phi2",
    "exaone4": "exaone4",
    "nemotron": "nemotron",
    "glm4": "glm4",
    "cohere2": "cohere2",
    "dots1": "dots1",
    "seed_oss": "seed_oss",
    "ernie4_5": "ernie4_5",
    "ernie4_5_moe": "ernie4_5-moe",
    "qwen2_vl": "qwen2vl",  # text stack; --mmproj exports the vision tower
    "qwen2_5_vl": "qwen2vl",
    "qwen3_vl": "qwen3vl",
    "qwen3_vl_moe": "qwen3vlmoe",
    "mistral3": "mistral3",  # Mistral-Small-3.1: mistral text + pixtral vision
    "hunyuan_v1_dense": "hunyuan-dense",
    "hunyuan_v1_moe": "hunyuan-moe",
    "bitnet": "bitnet",
    "apertus": "apertus",
    "jamba": "jamba",
    "falcon_mamba": "falcon-mamba",
    "granitemoe": "granitemoe",
    "granitemoeshared": "granitemoe",  # + shared_mlp fused gate|up tensors
    "granitemoehybrid": "granitehybrid",
    "phimoe": "phimoe",
    "llama4": "llama4",
    "llama4_text": "llama4",
    "olmo3": "olmo2",
    "lfm2": "lfm2",
    "dbrx": "dbrx",
    "falcon": "falcon",
    "mpt": "mpt",
    "bloom": "bloom",
    "gpt_bigcode": "starcoder",
    "bert": "bert",
    "modernbert": "modern-bert",
    "glm": "chatglm",  # GlmForCausalLM (glm-4-hf) rides CHATGLM (ref :8701)
    "chameleon": "chameleon",
    "ministral": "llama",  # Ministral-8B: llama body + SWA (ref LlamaModel)
}

# long-tail custom-code families (RWKV, PLaMo, Baichuan, InternLM2, ...)
# live in convert_families.py; merge their model_type → arch entries
from .convert_families import FAMILIES as _FAMILIES  # noqa: E402

ARCH_MAP.update({mt: fam.arch for mt, fam in _FAMILIES.items()})

# archs whose norms are LayerNorm (write layer_norm_epsilon, not RMS)
LN_ARCHS = {"gpt2", "stablelm", "starcoder2", "gptneox", "phi2", "nemotron",
            "dbrx", "falcon", "mpt", "bloom", "starcoder", "bert"}

# NORM-rope archs whose HF sources use rotate_half (halves) need the
# HF→GGUF QK permutation, exactly mirroring which reference convert classes
# call LlamaModel.permute (convert_hf_to_gguf.py: LlamaModel undo_permute,
# GraniteModel/GraniteMoeModel, Cohere2Model, OlmoModel, SmolLM3Model,
# ArceeModel, MiniCPMModel, DeciModel…). NORM archs whose HF modeling is
# natively interleaved (llama4, command-r, cohere2, glm4, chatglm) must NOT
# permute.
PERMUTE_QK_ARCHS = {"llama", "granite", "granitemoe", "olmo",
                    "smollm3", "arcee", "minicpm", "deci", "mistral3",
                    "chameleon"}


class _LazyF32(np.lib.mixins.NDArrayOperatorsMixin):
    """Deferred-cast float32 view of a checkpoint tensor for family mappers.

    Pure renames / transposes / reshapes / slices stay zero-copy views of
    the source dtype — the old eager `np.asarray(arr, float32)` doubled
    peak host memory per tensor on bf16/f16 checkpoints of large
    custom-code models (Grok/Arctic expert stacks are GBs each) even when
    the mapper passed the data through unchanged or ignored the name.
    Any arithmetic (ufunc) or coercion (`np.asarray`, writer add_tensor)
    materializes float32 at that point, so mapper math still runs at full
    f32 precision on exactly the slice it needs.
    """

    def __init__(self, arr: np.ndarray):
        self._arr = arr

    # shape-only ops stay lazy (views of the source dtype)
    def reshape(self, *s):
        return _LazyF32(self._arr.reshape(*s))

    def transpose(self, *axes):
        return _LazyF32(self._arr.transpose(*axes))

    def swapaxes(self, a, b):
        return _LazyF32(self._arr.swapaxes(a, b))

    def __getattr__(self, name):
        # any other ndarray API: materialize float32 and delegate —
        # correctness first; only the common shape-ops stay lazy
        return getattr(self.__array__(), name)

    @property
    def T(self):
        return _LazyF32(self._arr.T)

    def __getitem__(self, key):
        return _LazyF32(self._arr[key])

    @property
    def shape(self):
        return self._arr.shape

    @property
    def ndim(self):
        return self._arr.ndim

    @property
    def size(self):
        return self._arr.size

    def __len__(self):
        return len(self._arr)

    @property
    def dtype(self):
        return np.dtype(np.float32)

    def astype(self, dt):
        return np.asarray(self._arr, dtype=dt)

    def copy(self):
        return np.asarray(self._arr, dtype=np.float32)

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self._arr,
                          dtype=np.float32 if dtype is None else dtype)

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        conv = [np.asarray(i._arr, np.float32) if isinstance(i, _LazyF32)
                else i for i in inputs]
        return getattr(ufunc, method)(*conv, **kwargs)


def _permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF half-rotation layout → GGUF interleaved-pair layout
    (convert_hf_to_gguf.py LlamaModel.permute)."""
    shape = w.shape
    return (
        w.reshape(n_head, 2, shape[0] // n_head // 2, *shape[1:])
        .swapaxes(1, 2)
        .reshape(shape)
    )


def _load_tensors(src_dir: str):
    """Yield (name, numpy array) from safetensors shards or torch bins."""
    st = sorted(glob.glob(os.path.join(src_dir, "*.safetensors")))
    if st:
        from safetensors import safe_open

        for shard in st:
            with safe_open(shard, framework="np") as f:
                for name in f.keys():
                    yield name, f.get_tensor(name)
        return
    bins = sorted(glob.glob(os.path.join(src_dir, "pytorch_model*.bin")))
    if not bins:
        raise FileNotFoundError(f"no safetensors/bin weights under {src_dir}")
    import torch

    for shard in bins:
        sd = torch.load(shard, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.float().numpy()


# HF suffix → GGUF suffix for per-layer tensors (llama/qwen/gemma families)
_LAYER_MAP = {
    # phi3 fused projections stay fused (the loader splits at build time)
    "self_attn.qkv_proj.weight": "attn_qkv.weight",
    "mlp.gate_up_proj.weight": "ffn_up.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.o_proj.bias": "attn_output.bias",
    "self_attn.sinks": "attn_sinks.weight",
    "mlp.router.weight": "ffn_gate_inp.weight",
    "mlp.router.bias": "ffn_gate_inp.bias",
    "block_sparse_moe.gate.weight": "ffn_gate_inp.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "self_attn.q_norm.bias": "attn_q_norm.bias",  # chameleon per-head LN
    "self_attn.k_norm.bias": "attn_k_norm.bias",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "mlp.gate_proj.bias": "ffn_gate.bias",
    "mlp.up_proj.bias": "ffn_up.bias",
    "mlp.down_proj.bias": "ffn_down.bias",
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    # falcon-h1 (parallel attn+mamba2 per layer)
    "pre_ff_layernorm.weight": "ffn_norm.weight",
    "feed_forward.gate_proj.weight": "ffn_gate.weight",
    "feed_forward.up_proj.weight": "ffn_up.weight",
    "feed_forward.down_proj.weight": "ffn_down.weight",
    "mamba.in_proj.weight": "ssm_in.weight",
    "mamba.conv1d.weight": "ssm_conv1d.weight",
    "mamba.conv1d.bias": "ssm_conv1d.bias",
    "mamba.dt_bias": "ssm_dt.bias",
    "mamba.A_log": "ssm_a",
    "mamba.D": "ssm_d",
    "mamba.norm.weight": "ssm_norm.weight",
    "mamba.out_proj.weight": "ssm_out.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    # starcoder2 sequential FFN
    "mlp.c_fc.weight": "ffn_up.weight",
    "mlp.c_fc.bias": "ffn_up.bias",
    "mlp.c_proj.weight": "ffn_down.weight",
    "mlp.c_proj.bias": "ffn_down.bias",
    # gemma2/3 extra norms
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
    # MoE (qwen2_moe/qwen3_moe)
    "mlp.gate.weight": "ffn_gate_inp.weight",
    "mlp.gate.wg.weight": "ffn_gate_inp.weight",  # hunyuan-moe router
    "mlp.shared_mlp.gate_proj.weight": "ffn_gate_shexp.weight",
    "mlp.shared_mlp.up_proj.weight": "ffn_up_shexp.weight",
    "mlp.shared_mlp.down_proj.weight": "ffn_down_shexp.weight",
    "mlp.shared_expert_gate.weight": "ffn_gate_inp_shexp.weight",
    "mlp.shared_expert.gate_proj.weight": "ffn_gate_shexp.weight",
    "mlp.shared_expert.up_proj.weight": "ffn_up_shexp.weight",
    "mlp.shared_expert.down_proj.weight": "ffn_down_shexp.weight",
    # deepseek2/3 MLA projections (DeepseekV2Model in convert_hf_to_gguf.py)
    "self_attn.q_a_proj.weight": "attn_q_a.weight",
    "self_attn.q_a_layernorm.weight": "attn_q_a_norm.weight",
    "self_attn.q_b_proj.weight": "attn_q_b.weight",
    "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
    "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
    "self_attn.kv_b_proj.weight": "attn_kv_b.weight",
    "mlp.gate.e_score_correction_bias": "exp_probs_b.bias",
    "block_sparse_moe.gate.e_score_correction_bias": "exp_probs_b.bias",
    "mlp.shared_experts.gate_proj.weight": "ffn_gate_shexp.weight",
    "mlp.shared_experts.up_proj.weight": "ffn_up_shexp.weight",
    "mlp.shared_experts.down_proj.weight": "ffn_down_shexp.weight",
    # hunyuan post-rope qk norms
    "self_attn.query_layernorm.weight": "attn_q_norm.weight",
    "self_attn.key_layernorm.weight": "attn_k_norm.weight",
    # lfm2 (per-head qk norms, shortconv mixer, llama1-style w1/w2/w3 FFN)
    "self_attn.out_proj.weight": "attn_output.weight",
    "self_attn.q_layernorm.weight": "attn_q_norm.weight",
    "self_attn.k_layernorm.weight": "attn_k_norm.weight",
    "conv.in_proj.weight": "shortconv.in_proj.weight",
    "conv.out_proj.weight": "shortconv.out_proj.weight",
    "feed_forward.w1.weight": "ffn_gate.weight",
    "feed_forward.w3.weight": "ffn_up.weight",
    "feed_forward.w2.weight": "ffn_down.weight",
    "operator_norm.weight": "attn_norm.weight",
    "ffn_norm.weight": "ffn_norm.weight",
    # jamba mamba mixer (dt/b/c norms + x/dt projections)
    "mamba.x_proj.weight": "ssm_x.weight",
    "mamba.dt_proj.weight": "ssm_dt.weight",
    "mamba.dt_proj.bias": "ssm_dt.bias",
    "mamba.dt_layernorm.weight": "ssm_dt_norm.weight",
    "mamba.b_layernorm.weight": "ssm_b_norm.weight",
    "mamba.c_layernorm.weight": "ssm_c_norm.weight",
    # jamba / llama4 routers + shared expert
    "feed_forward.router.weight": "ffn_gate_inp.weight",
    "block_sparse_moe.router.layer.weight": "ffn_gate_inp.weight",
    "feed_forward.shared_expert.gate_proj.weight": "ffn_gate_shexp.weight",
    "feed_forward.shared_expert.up_proj.weight": "ffn_up_shexp.weight",
    "feed_forward.shared_expert.down_proj.weight": "ffn_down_shexp.weight",
    # bitnet sub-norms (llm_build_bitnet)
    "self_attn.attn_sub_norm.weight": "attn_sub_norm.weight",
    "mlp.ffn_sub_norm.weight": "ffn_sub_norm.weight",
    # apertus norms (gateless xIELU FFN)
    "attention_layernorm.weight": "attn_norm.weight",
    "feedforward_layernorm.weight": "ffn_norm.weight",
}


def _map_t5_name(name: str) -> str | None:
    """HF T5 names → GGUF enc./dec. names (convert_hf_to_gguf T5Model)."""
    if name in ("shared.weight", "encoder.embed_tokens.weight"):
        return "token_embd.weight" if name == "shared.weight" else None
    if name == "lm_head.weight":
        return "output.weight"
    if name == "encoder.final_layer_norm.weight":
        return "enc.output_norm.weight"
    if name == "decoder.final_layer_norm.weight":
        return "dec.output_norm.weight"
    for side, pfx in (("encoder", "enc"), ("decoder", "dec")):
        if not name.startswith(side + ".block."):
            continue
        parts = name.split(".")
        bid, sub = parts[2], ".".join(parts[3:])
        base = f"{pfx}.blk.{bid}."
        attn = {
            "layer.0.SelfAttention.q.weight": "attn_q.weight",
            "layer.0.SelfAttention.k.weight": "attn_k.weight",
            "layer.0.SelfAttention.v.weight": "attn_v.weight",
            "layer.0.SelfAttention.o.weight": "attn_o.weight",
            "layer.0.SelfAttention.relative_attention_bias.weight": "attn_rel_b.weight",
            "layer.0.layer_norm.weight": "attn_norm.weight",
        }
        cross = {
            "layer.1.EncDecAttention.q.weight": "cross_attn_q.weight",
            "layer.1.EncDecAttention.k.weight": "cross_attn_k.weight",
            "layer.1.EncDecAttention.v.weight": "cross_attn_v.weight",
            "layer.1.EncDecAttention.o.weight": "cross_attn_o.weight",
            "layer.1.layer_norm.weight": "cross_attn_norm.weight",
        }
        ffn_idx = "2" if side == "decoder" else "1"
        ffn = {
            f"layer.{ffn_idx}.DenseReluDense.wi.weight": "ffn_up.weight",
            f"layer.{ffn_idx}.DenseReluDense.wi_0.weight": "ffn_gate.weight",
            f"layer.{ffn_idx}.DenseReluDense.wi_1.weight": "ffn_up.weight",
            f"layer.{ffn_idx}.DenseReluDense.wo.weight": "ffn_down.weight",
            f"layer.{ffn_idx}.layer_norm.weight": "ffn_norm.weight",
        }
        if sub in attn:
            return base + attn[sub]
        if side == "decoder" and sub in cross:
            return base + cross[sub]
        if sub in ffn:
            return base + ffn[sub]
    return None


def _map_mamba_name(name: str) -> str | None:
    """HF Mamba names → GGUF ssm_* names (convert_hf_to_gguf MambaModel)."""
    if name == "backbone.embeddings.weight":
        return "token_embd.weight"
    if name == "backbone.norm_f.weight":
        return "output_norm.weight"
    if name == "lm_head.weight":
        return "output.weight"
    if name.startswith("backbone.layers."):
        parts = name.split(".")
        bid, sub = parts[2], ".".join(parts[3:])
        m = {
            "norm.weight": "attn_norm.weight",
            "mixer.in_proj.weight": "ssm_in.weight",
            "mixer.conv1d.weight": "ssm_conv1d.weight",
            "mixer.conv1d.bias": "ssm_conv1d.bias",
            "mixer.x_proj.weight": "ssm_x.weight",
            "mixer.dt_proj.weight": "ssm_dt.weight",
            "mixer.dt_proj.bias": "ssm_dt.bias",
            "mixer.dt_bias": "ssm_dt.bias",  # mamba2 fused dt bias
            "mixer.A_log": "ssm_a",
            "mixer.D": "ssm_d",
            "mixer.norm.weight": "ssm_norm.weight",  # mamba2 gated norm
            "mixer.out_proj.weight": "ssm_out.weight",
        }.get(sub)
        if m:
            return f"blk.{bid}.{m}"
    return None


def _erfinv(x: float) -> float:
    """Inverse error function (Winitzki approximation + one Newton step) —
    enough precision for the sparsity std multipliers."""
    import math

    a = 0.147
    ln1mx2 = math.log(max(1.0 - x * x, 1e-300))
    t = 2.0 / (math.pi * a) + ln1mx2 / 2.0
    y = math.copysign(math.sqrt(math.sqrt(t * t - ln1mx2 / a) - t), x)
    for _ in range(2):  # Newton refinement on erf(y) = x
        err = math.erf(y) - x
        y -= err / (2.0 / math.sqrt(math.pi) * math.exp(-y * y))
    return y


def _qwen3next_tensors(name: str, arr: np.ndarray, cfg: dict):
    """HF Qwen3Next → GGUF tensor(s) (≡ convert_hf_to_gguf.py
    Qwen3NextModel.modify_tensors): A_log sign-folded into ssm_a,
    zero-centered RMSNorm weights stored +1 (all norms except the gated
    linear_attn.norm), conv kernel squeezed, and in_proj_qkvz — whose rows
    are grouped per k-head as [q|k|v|z] — reordered into a flat [Q|K|V]
    attn_qkv plus a separate attn_gate (z)."""
    if name.startswith("mtp"):
        return []
    if name == "model.embed_tokens.weight":
        return [("token_embd.weight", arr)]
    if name == "model.norm.weight":
        return [("output_norm.weight", arr + 1.0)]
    if name == "lm_head.weight":
        return [("output.weight", arr)]
    if not name.startswith("model.layers."):
        return []
    parts = name.split(".")
    bid = parts[2]
    sub = ".".join(parts[3:])
    p = f"blk.{bid}."
    if sub == "linear_attn.in_proj_qkvz.weight":
        hk = int(cfg["linear_key_head_dim"])
        hv = int(cfg["linear_value_head_dim"])
        Hk = int(cfg["linear_num_key_heads"])
        Hv = int(cfg["linear_num_value_heads"])
        r = Hv // Hk
        n_embd = arr.shape[1]
        g = arr.reshape(Hk, 2 * hk + 2 * r * hv, n_embd)
        q = g[:, :hk].reshape(-1, n_embd)
        k = g[:, hk:2 * hk].reshape(-1, n_embd)
        v = g[:, 2 * hk:2 * hk + r * hv].reshape(-1, n_embd)
        z = g[:, 2 * hk + r * hv:].reshape(-1, n_embd)
        return [
            (p + "attn_qkv.weight",
             np.ascontiguousarray(np.concatenate([q, k, v], axis=0))),
            (p + "attn_gate.weight", np.ascontiguousarray(z)),
        ]
    m = {
        "linear_attn.in_proj_ba.weight": ("ssm_ba.weight", None),
        "linear_attn.conv1d.weight": ("ssm_conv1d.weight", "squeeze"),
        "linear_attn.dt_bias": ("ssm_dt.bias", None),
        "linear_attn.A_log": ("ssm_a", "neg_exp"),
        "linear_attn.norm.weight": ("ssm_norm.weight", None),
        "linear_attn.out_proj.weight": ("ssm_out.weight", None),
        "input_layernorm.weight": ("attn_norm.weight", "plus1"),
        "post_attention_layernorm.weight": ("post_attention_norm.weight", "plus1"),
        "self_attn.q_proj.weight": ("attn_q.weight", None),
        "self_attn.k_proj.weight": ("attn_k.weight", None),
        "self_attn.v_proj.weight": ("attn_v.weight", None),
        "self_attn.o_proj.weight": ("attn_output.weight", None),
        "self_attn.q_norm.weight": ("attn_q_norm.weight", "plus1"),
        "self_attn.k_norm.weight": ("attn_k_norm.weight", "plus1"),
        "mlp.gate.weight": ("ffn_gate_inp.weight", None),
        "mlp.shared_expert_gate.weight": ("ffn_gate_inp_shexp.weight", None),
        "mlp.shared_expert.gate_proj.weight": ("ffn_gate_shexp.weight", None),
        "mlp.shared_expert.up_proj.weight": ("ffn_up_shexp.weight", None),
        "mlp.shared_expert.down_proj.weight": ("ffn_down_shexp.weight", None),
    }.get(sub)
    if m is None:
        return []
    gname, op = m
    if op == "squeeze":
        arr = arr.reshape(arr.shape[0], arr.shape[-1])
    elif op == "neg_exp":
        arr = -np.exp(arr)
    elif op == "plus1":
        arr = arr + 1.0
    return [(p + gname, arr)]


_GEMMA3N_LAYER = {
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "post_attention_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "altup.correct_output_scale": "altup_correct_scale.weight",
    "altup.correction_coefs.weight": "altup_correct_coef.weight",
    "altup.prediction_coefs.weight": "altup_predict_coef.weight",
    "altup.modality_router.weight": "altup_router.weight",
    "altup.router_norm.weight": "altup_router_norm.weight",
    "laurel.linear_left.weight": "laurel_l.weight",
    "laurel.linear_right.weight": "laurel_r.weight",
    "laurel.post_laurel_norm.weight": "laurel_post_norm.weight",
    "per_layer_input_gate.weight": "inp_gate.weight",
    "per_layer_projection.weight": "proj.weight",
    "post_per_layer_input_norm.weight": "post_norm.weight",
}


def _map_gemma3n_name(name: str) -> str | None:
    """HF Gemma3n text names → GGUF (≡ Gemma3NModel; altup projection
    stacking is handled in the conversion loop). norm_shift is 0 for
    gemma3n, so norm weights are stored raw."""
    if name.startswith("model.language_model."):
        name = "model." + name[len("model.language_model."):]
    if name == "model.embed_tokens.weight":
        return "token_embd.weight"
    if name == "model.embed_tokens_per_layer.weight":
        return "per_layer_token_embd.weight"
    if name in ("model.per_layer_model_projection.weight",
                # transformers' save-time key remap mangles this name
                "model.per_layer_model.language_model_projection.weight"):
        return "per_layer_model_proj.weight"
    if name == "model.per_layer_projection_norm.weight":
        return "per_layer_proj_norm.weight"
    if name == "model.norm.weight":
        return "output_norm.weight"
    if name == "lm_head.weight":
        return "output.weight"
    if name.startswith("model.layers."):
        parts = name.split(".", 3)
        bid, rest = parts[2], parts[3]
        mapped = _GEMMA3N_LAYER.get(rest)
        if mapped:
            return f"blk.{bid}.{mapped}"
    return None


# "transformer."-prefixed family (falcon/mpt/bloom/dbrx/gpt2/starcoder):
# per-layer suffix → GGUF suffix
_TRANSFORMER_LAYER_MAP = {
    # falcon / bloom
    "self_attention.query_key_value.weight": "attn_qkv.weight",
    "self_attention.query_key_value.bias": "attn_qkv.bias",
    "self_attention.dense.weight": "attn_output.weight",
    "self_attention.dense.bias": "attn_output.bias",
    "ln_attn.weight": "attn_norm.weight",
    "ln_attn.bias": "attn_norm.bias",
    "ln_mlp.weight": "attn_norm_2.weight",
    "ln_mlp.bias": "attn_norm_2.bias",
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    "mlp.dense_h_to_4h.weight": "ffn_up.weight",
    "mlp.dense_h_to_4h.bias": "ffn_up.bias",
    "mlp.dense_4h_to_h.weight": "ffn_down.weight",
    "mlp.dense_4h_to_h.bias": "ffn_down.bias",
    # mpt
    "norm_1.weight": "attn_norm.weight",
    "attn.Wqkv.weight": "attn_qkv.weight",
    "attn.out_proj.weight": "attn_output.weight",
    "norm_2.weight": "ffn_norm.weight",
    "ffn.up_proj.weight": "ffn_up.weight",
    "ffn.down_proj.weight": "ffn_down.weight",
    "attn.q_ln.weight": "attn_q_norm.weight",
    "attn.k_ln.weight": "attn_k_norm.weight",
    # dbrx (block sits under norm_attn_norm; norm_2 is the POST-attn norm)
    "norm_attn_norm.norm_1.weight": "attn_norm.weight",
    "norm_attn_norm.attn.Wqkv.weight": "attn_qkv.weight",
    "norm_attn_norm.attn.out_proj.weight": "attn_output.weight",
    "norm_attn_norm.norm_2.weight": "attn_output_norm.weight",
    "ffn.router.layer.weight": "ffn_gate_inp.weight",
    # gpt2 / gpt_bigcode (starcoder)
    "ln_1.weight": "attn_norm.weight",
    "ln_1.bias": "attn_norm.bias",
    "attn.c_attn.weight": "attn_qkv.weight",
    "attn.c_attn.bias": "attn_qkv.bias",
    "attn.c_proj.weight": "attn_output.weight",
    "attn.c_proj.bias": "attn_output.bias",
    "ln_2.weight": "ffn_norm.weight",
    "ln_2.bias": "ffn_norm.bias",
    "mlp.c_fc.weight": "ffn_up.weight",
    "mlp.c_fc.bias": "ffn_up.bias",
    "mlp.c_proj.weight": "ffn_down.weight",
    "mlp.c_proj.bias": "ffn_down.bias",
}


_BERT_LAYER_MAP = {
    "attention.self.query.weight": "attn_q.weight",
    "attention.self.query.bias": "attn_q.bias",
    "attention.self.key.weight": "attn_k.weight",
    "attention.self.key.bias": "attn_k.bias",
    "attention.self.value.weight": "attn_v.weight",
    "attention.self.value.bias": "attn_v.bias",
    "attention.output.dense.weight": "attn_output.weight",
    "attention.output.dense.bias": "attn_output.bias",
    "attention.output.LayerNorm.weight": "attn_output_norm.weight",
    "attention.output.LayerNorm.bias": "attn_output_norm.bias",
    "intermediate.dense.weight": "ffn_up.weight",
    "intermediate.dense.bias": "ffn_up.bias",
    "output.dense.weight": "ffn_down.weight",
    "output.dense.bias": "ffn_down.bias",
    "output.LayerNorm.weight": "layer_output_norm.weight",
    "output.LayerNorm.bias": "layer_output_norm.bias",
}


def _map_bert_name(name: str) -> str | None:
    """BERT encoder (BertModel in convert_hf_to_gguf.py)."""
    if name.startswith("bert."):
        name = name[len("bert."):]
    top = {
        "embeddings.word_embeddings.weight": "token_embd.weight",
        "embeddings.position_embeddings.weight": "position_embd.weight",
        "embeddings.token_type_embeddings.weight": "token_types.weight",
        "embeddings.LayerNorm.weight": "token_embd_norm.weight",
        "embeddings.LayerNorm.bias": "token_embd_norm.bias",
    }
    if name in top:
        return top[name]
    if name.startswith("encoder.layer."):
        _, _, bid, rest = name.split(".", 3)
        mapped = _BERT_LAYER_MAP.get(rest)
        return f"blk.{bid}.{mapped}" if mapped else None
    return None  # cls.predictions head is not part of the embedding graph


def _map_modern_bert_name(name: str) -> str | None:
    """ModernBERT encoder (ModernBertModel in convert_hf_to_gguf.py)."""
    if name.startswith("model."):
        name = name[len("model."):]
    top = {
        "embeddings.tok_embeddings.weight": "token_embd.weight",
        "embeddings.norm.weight": "token_embd_norm.weight",
        "final_norm.weight": "output_norm.weight",
    }
    if name in top:
        return top[name]
    if name.startswith("layers."):
        _, bid, rest = name.split(".", 2)
        mapped = {
            "attn.Wqkv.weight": "attn_qkv.weight",
            "attn.Wo.weight": "attn_output.weight",
            "attn_norm.weight": "attn_norm.weight",
            "mlp_norm.weight": "ffn_norm.weight",
            "mlp.Wi.weight": "ffn_up.weight",
            "mlp.Wo.weight": "ffn_down.weight",
        }.get(rest)
        return f"blk.{bid}.{mapped}" if mapped else None
    return None  # decoder/head tensors are not part of the embedding graph


def _map_transformer_name(name: str) -> str | None:
    """transformer.* family (falcon/mpt/bloom/dbrx/gpt2/gpt_bigcode)."""
    if name.startswith("transformer."):
        name = name[len("transformer."):]
    top = {
        "wte.weight": "token_embd.weight",
        "word_embeddings.weight": "token_embd.weight",
        "wpe.weight": "position_embd.weight",
        "word_embeddings_layernorm.weight": "token_embd_norm.weight",
        "word_embeddings_layernorm.bias": "token_embd_norm.bias",
        "ln_f.weight": "output_norm.weight",
        "ln_f.bias": "output_norm.bias",
        "norm_f.weight": "output_norm.weight",
        "norm_f.bias": "output_norm.bias",
        "lm_head.weight": "output.weight",
    }
    if name in top:
        return top[name]
    for pfx in ("h.", "blocks."):
        if name.startswith(pfx):
            _, bid, rest = name.split(".", 2)
            mapped = _TRANSFORMER_LAYER_MAP.get(rest)
            return f"blk.{bid}.{mapped}" if mapped else None
    return None


def map_tensor_name(name: str, arch: str) -> str | None:
    """HF tensor name → GGUF name; None = skip (≡ gguf-py tensor_mapping)."""
    if arch == "t5":
        return _map_t5_name(name)
    if arch in ("mamba", "mamba2", "falcon-mamba"):
        return _map_mamba_name(name)
    if arch in ("falcon", "mpt", "bloom", "dbrx", "starcoder", "gpt2",
                "codeshell"):
        return _map_transformer_name(name)
    if arch == "bert":
        return _map_bert_name(name)
    if arch == "modern-bert":
        return _map_modern_bert_name(name)
    if name.startswith("model."):
        name = name[len("model."):]
    if name.startswith("gpt_neox."):
        name = name[len("gpt_neox."):]
    if name in ("embed_tokens.weight", "embed_in.weight"):
        return "token_embd.weight"
    if name in ("norm.weight", "final_layer_norm.weight",
                "final_layernorm.weight"):
        return "output_norm.weight"
    if name in ("norm.bias", "final_layer_norm.bias", "final_layernorm.bias"):
        return "output_norm.bias"
    if name in ("lm_head.weight", "embed_out.weight"):
        return "output.weight"
    if name == "lm_head.bias":
        return "output.bias"
    if name == "embedding_norm.weight":  # lfm2
        return "token_embd_norm.weight"
    if name.startswith("layers.") and ".conv.conv." in name:  # lfm2 mixer
        bid = name.split(".")[1]
        return f"blk.{bid}.shortconv.conv.weight"
    if name.startswith("layers."):
        parts = name.split(".", 2)
        bid, rest = parts[1], parts[2]
        # gemma2/3: post_attention_layernorm is the POST norm; the pre-FFN
        # norm is pre_feedforward_layernorm (gemma v1 has no post-norms, so
        # its post_attention_layernorm is the ordinary ffn_norm)
        if arch in ("gemma2", "gemma3") and rest == "post_attention_layernorm.weight":
            return f"blk.{bid}.post_attention_norm.weight"
        # olmo2/exaone4 are post-norm only: both "post" layernorms are real
        # post-norms (llm_build_olmo2 / llm_build_exaone4)
        if arch in ("olmo2", "exaone4") and rest == "post_attention_layernorm.weight":
            return f"blk.{bid}.post_attention_norm.weight"
        if arch == "exaone4" and rest == "post_feedforward_layernorm.weight":
            return f"blk.{bid}.post_ffw_norm.weight"
        # glm4 post-norms sit AFTER the attn/ffn outputs; its pre-FFN norm
        # arrives as post_attention_layernorm via the generic map
        if arch == "glm4" and rest == "post_self_attn_layernorm.weight":
            return f"blk.{bid}.post_attention_norm.weight"
        if arch == "glm4" and rest == "post_mlp_layernorm.weight":
            return f"blk.{bid}.post_ffw_norm.weight"
        # phi2 names (PhiModel in convert_hf_to_gguf.py)
        phi2 = {
            "self_attn.dense.weight": "attn_output.weight",
            "self_attn.dense.bias": "attn_output.bias",
            "mlp.fc1.weight": "ffn_up.weight",
            "mlp.fc1.bias": "ffn_up.bias",
            "mlp.fc2.weight": "ffn_down.weight",
            "mlp.fc2.bias": "ffn_down.bias",
        }
        if arch == "phi2" and rest in phi2:
            return f"blk.{bid}.{phi2[rest]}"
        # gpt-oss: the pre-MoE norm is stored as post_attention_norm
        if arch == "gpt-oss" and rest == "post_attention_layernorm.weight":
            return f"blk.{bid}.post_attention_norm.weight"
        if arch == "olmo2" and rest == "post_feedforward_layernorm.weight":
            return f"blk.{bid}.post_ffw_norm.weight"
        neox = {
            "attention.query_key_value.weight": "attn_qkv.weight",
            "attention.query_key_value.bias": "attn_qkv.bias",
            "attention.dense.weight": "attn_output.weight",
            "attention.dense.bias": "attn_output.bias",
            "mlp.dense_h_to_4h.weight": "ffn_up.weight",
            "mlp.dense_h_to_4h.bias": "ffn_up.bias",
            "mlp.dense_4h_to_h.weight": "ffn_down.weight",
            "mlp.dense_4h_to_h.bias": "ffn_down.bias",
        }
        mapped = _LAYER_MAP.get(rest) or neox.get(rest)
        if mapped:
            return f"blk.{bid}.{mapped}"
        if rest in ("attention.bias", "attention.masked_bias"):
            return None
    if name == "rotary_emb.inv_freq" or name.endswith(".rotary_emb.inv_freq"):
        return None
    return None


def _convert_vocab_bpe(w: GGUFWriter, tok_json: dict, cfg: dict):
    model = tok_json.get("model", {})
    vocab = model.get("vocab", {})
    id_to_tok = {int(i): t for t, i in vocab.items()}
    added = {int(a["id"]): a for a in tok_json.get("added_tokens", [])}
    n = max(max(id_to_tok, default=-1), max(added, default=-1)) + 1
    tokens, types = [], []
    for i in range(n):
        if i in added:
            tokens.append(added[i]["content"])
            types.append(TokenType.CONTROL if added[i].get("special") else TokenType.USER_DEFINED)
        elif i in id_to_tok:
            tokens.append(id_to_tok[i])
            types.append(TokenType.NORMAL)
        else:
            tokens.append(f"[PAD{i}]")
            types.append(TokenType.UNUSED)
    merges = model.get("merges", [])
    merges = [" ".join(m) if isinstance(m, list) else m for m in merges]
    w.add_kv("tokenizer.ggml.model", "gpt2")
    w.add_kv("tokenizer.ggml.pre", "llama3" if cfg.get("model_type") == "llama" else "default")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.merges", merges)
    return len(tokens)


def _parse_spm(path: str):
    """Minimal SentencePiece .model protobuf parse: repeated SentencePiece
    {piece=1 string, score=2 float, type=3 enum} under field 1."""
    import struct

    data = open(path, "rb").read()
    pieces = []

    def read_varint(buf, i):
        shift = 0
        val = 0
        while True:
            b = buf[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val, i
            shift += 7

    i = 0
    while i < len(data):
        tag, i = read_varint(data, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # SentencePiece message
            ln, i = read_varint(data, i)
            sub = data[i : i + ln]
            i += ln
            piece, score, ptype = "", 0.0, 1
            j = 0
            while j < len(sub):
                t2, j = read_varint(sub, j)
                f2, w2 = t2 >> 3, t2 & 7
                if f2 == 1 and w2 == 2:
                    l2, j = read_varint(sub, j)
                    piece = sub[j : j + l2].decode("utf-8", errors="replace")
                    j += l2
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", sub[j : j + 4])[0]
                    j += 4
                elif f2 == 3 and w2 == 0:
                    ptype, j = read_varint(sub, j)
                else:  # skip unknown
                    if w2 == 0:
                        _, j = read_varint(sub, j)
                    elif w2 == 2:
                        l2, j = read_varint(sub, j)
                        j += l2
                    elif w2 == 5:
                        j += 4
                    elif w2 == 1:
                        j += 8
            pieces.append((piece, score, ptype))
        else:  # skip other top-level fields
            if wire == 0:
                _, i = read_varint(data, i)
            elif wire == 2:
                ln, i = read_varint(data, i)
                i += ln
            elif wire == 5:
                i += 4
            elif wire == 1:
                i += 8
    return pieces


_SPM_TYPE_MAP = {
    1: TokenType.NORMAL, 2: TokenType.UNKNOWN, 3: TokenType.CONTROL,
    4: TokenType.USER_DEFINED, 5: TokenType.UNUSED, 6: TokenType.BYTE,
}


def _convert_vocab_spm(w: GGUFWriter, model_path: str):
    pieces = _parse_spm(model_path)
    tokens = [p[0] for p in pieces]
    scores = np.asarray([p[1] for p in pieces], dtype=np.float32)
    types = np.asarray(
        [int(_SPM_TYPE_MAP.get(p[2], TokenType.NORMAL)) for p in pieces],
        dtype=np.int32,
    )
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", scores)
    w.add_kv("tokenizer.ggml.token_type", types)
    return len(tokens)


# --------------------------------------------------------------------------
# architectures-class fallback: custom-code HF repos often ship a
# nonstandard (or missing) config.json model_type while the architectures
# class name is canonical. This table maps EVERY class name registered by
# the reference converter (@ModelBase.register sweep of
# /root/reference/convert_hf_to_gguf.py, 191 unique names) onto an
# existing tpullm model_type; it is consulted only when the model_type
# itself resolves nothing, so canonical checkpoints are unaffected.
# Multimodal wrapper classes (Llava*/Ultravox/Qwen2Audio/Glm4v/...) are
# handled upstream by the vl_wrapped text_config unwrapping instead.
CLASS_FALLBACK = {
    "AfmoeForCausalLM": "afmoe",
    "ApertusForCausalLM": "apertus",
    "ArceeForCausalLM": "arcee",
    "ArcticForCausalLM": "arctic",
    "BaiChuanForCausalLM": "baichuan",
    "BaichuanForCausalLM": "baichuan",
    "BailingMoeForCausalLM": "bailing_moe",
    "BailingMoeV2ForCausalLM": "bailing_moe_v2",
    "BambaForCausalLM": "granitemoehybrid",
    "BertForMaskedLM": "bert",
    "BertForSequenceClassification": "bert",
    "BertModel": "bert",
    "BitnetForCausalLM": "bitnet",
    "BloomForCausalLM": "bloom",
    "BloomModel": "bloom",
    "CamembertModel": "xlm-roberta",
    "ChatGLMForConditionalGeneration": "chatglm",
    "ChatGLMModel": "chatglm",
    "CodeShellForCausalLM": "codeshell",
    "CogVLMForCausalLM": "cogvlm",
    "Cohere2ForCausalLM": "cohere2",
    "CohereForCausalLM": "cohere",
    "DbrxForCausalLM": "dbrx",
    "DeciLMForCausalLM": "deci",
    "DeepseekForCausalLM": "deepseek",
    "DeepseekV2ForCausalLM": "deepseek_v2",
    "DeepseekV3ForCausalLM": "deepseek_v3",
    "DistilBertForMaskedLM": "bert",
    "DistilBertForSequenceClassification": "bert",
    "DistilBertModel": "bert",
    "Dots1ForCausalLM": "dots1",
    "DreamModel": "dream",
    "Ernie4_5ForCausalLM": "ernie4_5",
    "Ernie4_5_ForCausalLM": "ernie4_5",
    "Ernie4_5_MoeForCausalLM": "ernie4_5_moe",
    "Exaone4ForCausalLM": "exaone4",
    "ExaoneForCausalLM": "exaone",
    "ExaoneMoEForCausalLM": "exaone_moe",
    "FalconForCausalLM": "falcon",
    "FalconH1ForCausalLM": "falcon_h1",
    "FalconMambaForCausalLM": "falcon_mamba",
    "GPT2LMHeadModel": "gpt2",
    "GPTBigCodeForCausalLM": "gpt_bigcode",
    "GPTNeoXForCausalLM": "gpt_neox",
    "Gemma2ForCausalLM": "gemma2",
    "Gemma3ForCausalLM": "gemma3",
    "Gemma3ForConditionalGeneration": "gemma3",
    "Gemma3nForCausalLM": "gemma3n",
    "Gemma3nForConditionalGeneration": "gemma3n",
    "GemmaForCausalLM": "gemma",
    "Glm4ForCausalLM": "glm4",
    "Glm4MoeForCausalLM": "glm4_moe",
    "Glm4MoeLiteForCausalLM": "deepseek_v3",
    "GlmForCausalLM": "glm",
    "GptOssForCausalLM": "gpt_oss",
    "GraniteForCausalLM": "granite",
    "GraniteMoeForCausalLM": "granitemoe",
    "GraniteMoeHybridForCausalLM": "granitemoehybrid",
    "GraniteMoeSharedForCausalLM": "granitemoeshared",
    "Grok1ForCausalLM": "grok-1",
    "GrokForCausalLM": "grok",
    "GroveMoeForCausalLM": "grovemoe",
    "HunYuanDenseV1ForCausalLM": "hunyuan_v1_dense",
    "HunYuanMoEV1ForCausalLM": "hunyuan_v1_moe",
    "IQuestCoderForCausalLM": "llama",
    "InternLM2ForCausalLM": "internlm2",
    "InternLM3ForCausalLM": "llama",
    "JAISLMHeadModel": "jais",
    "JambaForCausalLM": "jamba",
    "KORMoForCausalLM": "qwen2",
    "KimiLinearForCausalLM": "kimi_linear",
    "KimiLinearModel": "kimi_linear",
    "LFM2ForCausalLM": "lfm2",
    "LLaDAMoEModel": "llada_moe",
    "LLaDAMoEModelLM": "llada_moe",
    "LLaDAModelLM": "llada",
    "LLaMAForCausalLM": "llama",
    "Lfm2ForCausalLM": "lfm2",
    "Lfm2Model": "lfm2",
    "Lfm2MoeForCausalLM": "lfm2_moe",
    "Llama4ForCausalLM": "llama4",
    "Llama4ForConditionalGeneration": "llama4",
    "LlamaBidirectionalModel": "llama_embed",
    "LlamaForCausalLM": "llama",
    "LlavaStableLMEpochForCausalLM": "stablelm",
    "MPTForCausalLM": "mpt",
    "MaincoderForCausalLM": "maincoder",
    "Mamba2ForCausalLM": "mamba2",
    "MambaForCausalLM": "mamba",
    "MambaLMHeadModel": "mamba",
    "MiniCPM3ForCausalLM": "minicpm3",
    "MiniCPMForCausalLM": "minicpm",
    "Ministral3ForCausalLM": "mistral3",
    "Mistral3ForConditionalGeneration": "mistral3",
    "MistralForCausalLM": "mistral",
    "MixtralForCausalLM": "mixtral",
    "ModernBertForMaskedLM": "modernbert",
    "ModernBertForSequenceClassification": "modernbert",
    "ModernBertModel": "modernbert",
    "NemotronForCausalLM": "nemotron",
    "NemotronHForCausalLM": "nemotron_h",
    "NeoBERTForSequenceClassification": "neobert",
    "OLMoForCausalLM": "olmo",
    "Olmo3ForCausalLM": "olmo3",
    "OlmoeForCausalLM": "olmoe",
    "OpenELMForCausalLM": "openelm",
    "OrionForCausalLM": "orion",
    "PLMForCausalLM": "plm",
    "PLaMo2ForCausalLM": "plamo2",
    "PLaMo3ForCausalLM": "plamo3",
    "PanguEmbeddedForCausalLM": "PanguEmbedded",
    "Phi3ForCausalLM": "phi3",
    "PhiForCausalLM": "phi",
    "PhiMoEForCausalLM": "phimoe",
    "Plamo2ForCausalLM": "plamo2",
    "Plamo3ForCausalLM": "plamo3",
    "PlamoForCausalLM": "plamo",
    "QWenLMHeadModel": "qwen",
    "Qwen2ForCausalLM": "qwen2",
    "Qwen2Model": "qwen2",
    "Qwen2MoeForCausalLM": "qwen2_moe",
    "Qwen2VLForConditionalGeneration": "qwen2_vl",
    "Qwen2VLModel": "qwen2_vl",
    "Qwen2_5_VLForConditionalGeneration": "qwen2_5_vl",
    "Qwen3ForCausalLM": "qwen3",
    "Qwen3MoeForCausalLM": "qwen3_moe",
    "Qwen3NextForCausalLM": "qwen3_next",
    "Qwen3VLForConditionalGeneration": "qwen3_vl",
    "Qwen3VLMoeForConditionalGeneration": "qwen3_vl_moe",
    "RND1": "rnd1",
    "RWForCausalLM": "falcon",
    "RWKV6Qwen2ForCausalLM": "rwkv6qwen2",
    "RWKV7ForCausalLM": "rwkv7",
    "RobertaForSequenceClassification": "xlm-roberta",
    "RobertaModel": "xlm-roberta",
    "Rwkv6ForCausalLM": "rwkv6",
    "Rwkv7ForCausalLM": "rwkv7",
    "RwkvHybridForCausalLM": "rwkv_hybrid",
    "SeedOssForCausalLM": "seed_oss",
    "SmallThinkerForCausalLM": "smallthinker",
    "SmolLM3ForCausalLM": "smollm3",
    "SolarOpenForCausalLM": "glm4_moe",
    "StableLMEpochForCausalLM": "stablelm",
    "StableLmForCausalLM": "stablelm",
    "Starcoder2ForCausalLM": "starcoder2",
    "UMT5Model": "t5",
    "VLlama3ForCausalLM": "llama",
    "XverseForCausalLM": "xverse",
    "YoutuForCausalLM": "deepseek_v2",
    "modeling_grove_moe.GroveMoeForCausalLM": "grovemoe",
    # enc-dec + stragglers (classes whose canonical model_type also
    # resolves; listed so nonstandard forks still dispatch)
    "T5ForConditionalGeneration": "t5",
    "T5WithLMHeadModel": "t5",
    "MT5ForConditionalGeneration": "t5",
    "UMT5ForConditionalGeneration": "t5",
    "OlmoForCausalLM": "olmo",
    "Olmo2ForCausalLM": "olmo2",
    "ChameleonForCausalLM": "chameleon",
    "ChameleonForConditionalGeneration": "chameleon",
}


def resolve_alias(model_type: str, architectures) -> str:
    """Resolve a checkpoint's model_type through the class-alias fallback
    (unit-testable core of the converter's arch dispatch)."""
    if ARCH_MAP.get(model_type) is not None:
        return model_type
    for cls in architectures or []:
        if cls in CLASS_FALLBACK:
            return CLASS_FALLBACK[cls]
    return model_type


def convert_hf_to_gguf(src_dir: str, dst: str, outtype: str = "f16",
                       verbose: bool = True) -> dict:
    cfg = json.load(open(os.path.join(src_dir, "config.json")))
    model_type = cfg.get("model_type", "llama")
    vl_wrapped = model_type in ("qwen2_vl", "qwen2_5_vl", "mistral3",
                                "qwen3_vl", "qwen3_vl_moe",
                                "qwen2_5_omni", "qwen2_5_omni_thinker",
                                "internvl", "llava", "qwen2_audio",
                                "voxtral", "idefics3", "janus",
                                "lfm2_vl", "lfm2-vl", "kimi_vl",
                                "youtu_vl", "youtuvl",
                                "glm4v", "glm4v_moe",
                                "smolvlm", "ultravox", "audio_flamingo3",
                                "glmasr", "lfm2_audio", "lightonocr") or (
        model_type in ("gemma3", "llama4") and "vision_config" in cfg)
    if model_type == "llava":
        # LLaVA wraps an ordinary llama/mistral/vicuna text model
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "llama")
    if model_type in ("qwen2_audio", "voxtral"):
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "qwen2")
    if model_type in ("idefics3", "janus"):
        # SmolVLM and Janus-Pro wrap a llama text model
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "llama")
    if model_type in ("lfm2_vl", "lfm2-vl", "lfm2_audio"):
        # lfm2-vl / lfm2-audio wrap an lfm2 hybrid text model
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "lfm2")
    if model_type in ("smolvlm", "ultravox"):
        # SmolVLM (idefics3-style) and Ultravox wrap a llama text model
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "llama")
    if model_type in ("audio_flamingo3",):  # qwen2 text + audio tower
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "qwen2")
    if model_type in ("glmasr",):  # glm4 text + audio tower
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "glm4")
    if model_type in ("lightonocr",):  # pixtral-style mistral3 text stack
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "mistral")
    if model_type in ("kimi_vl", "youtu_vl", "youtuvl"):
        # Kimi-VL's and Youtu-VL's text models are DeepSeek-V2/V3 MLA stacks
        # (reference registers both ForConditionalGeneration classes under
        # DeepseekV2Model)
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "deepseek_v2")
    if model_type in ("glm4v", "glm4v_moe"):
        # GLM-4V text is an ordinary glm4 / glm4-moe stack (the reference
        # converts it under those archs; text-only M-RoPE ≡ standard rope)
        model_type = "glm4" if model_type == "glm4v" else "glm4_moe"
    if model_type in ("qwen2_5_omni", "qwen2_5_omni_thinker"):
        # the omni thinker text rides the qwen2vl arch (≡ Qwen2VLModel
        # registered for Qwen2_5OmniModel); talker/token2wav are skipped
        for k_, v_ in (cfg.get("thinker_config") or {}).items():
            cfg.setdefault(k_, v_)
        model_type = "qwen2_vl"
    if model_type == "internvl":
        # the InternVL wrapper's text model is an ordinary qwen2/llama —
        # convert the language model under ITS arch; --mmproj exports the
        # InternViT tower
        model_type = (cfg.get("text_config") or {}).get("model_type",
                                                        "qwen2")
    # class-name disambiguation where one model_type covers two archs
    _BY_CLASS = {"MiniMaxM2ForCausalLM": "minimax_m2",
                 "MiMoV2FlashForCausalLM": "mimo2",
                 "Step3p5ForCausalLM": "step35",
                 # encoder-only exports of decoder configs
                 "Gemma3TextModel": "gemma_embedding",
                 "T5EncoderModel": "t5encoder",
                 "JinaBertModel": "jina_bert_v2",
                 "JinaBertForMaskedLM": "jina_bert_v2",
                 "NomicBertModel": "nomic_bert",
                 "NeoBERT": "neobert", "NeoBERTLMHead": "neobert",
                 "LlamaModel": "llama_embed",
                 "XLMRobertaModel": "xlm-roberta",
                 "XLMRobertaForSequenceClassification": "xlm-roberta",
                 "GPTRefactForCausalLM": "gpt_refact",
                 "WavTokenizerDec": "wavtokenizer-dec"}
    for cls in cfg.get("architectures") or []:
        if cls in _BY_CLASS:
            model_type = _BY_CLASS[cls]
    model_type = resolve_alias(model_type, cfg.get("architectures"))
    arch = ARCH_MAP.get(model_type)
    if arch is None:
        raise NotImplementedError(f"model_type {model_type!r} not supported yet "
                                  f"(have: {sorted(ARCH_MAP)})")
    fam = _FAMILIES.get(model_type)
    if fam is not None and fam.pick_arch is not None:
        arch = fam.pick_arch(cfg)  # e.g. nemotron_h vs nemotron_h_moe
    if vl_wrapped:
        # multimodal checkpoints nest the text config; flatten it for the
        # generic kv writer (vision tensors are skipped here — --mmproj
        # exports them)
        for k_, v_ in (cfg.get("text_config") or {}).items():
            cfg.setdefault(k_, v_)
    if model_type == "dbrx":
        # flatten MosaicML's nested config (≡ DbrxModel.set_gguf_parameters)
        ac = cfg.get("attn_config") or {}
        fc = cfg.get("ffn_config") or {}
        cfg.setdefault("hidden_size", cfg.get("d_model"))
        cfg.setdefault("num_hidden_layers", cfg.get("n_layers"))
        cfg.setdefault("num_attention_heads", cfg.get("n_heads"))
        cfg.setdefault("num_key_value_heads", ac.get("kv_n_heads", 1))
        cfg.setdefault("max_position_embeddings", cfg.get("max_seq_len"))
        cfg.setdefault("rope_theta", ac.get("rope_theta", 10000.0))
        cfg.setdefault("clip_qkv", ac.get("clip_qkv"))
        cfg.setdefault("num_experts", fc.get("moe_num_experts"))
        cfg.setdefault("num_experts_per_tok", fc.get("moe_top_k"))
        cfg.setdefault("intermediate_size", fc.get("ffn_hidden_size"))
    if model_type == "mpt":
        ac = cfg.get("attn_config") or {}
        cfg.setdefault("hidden_size", cfg.get("d_model"))
        cfg.setdefault("num_hidden_layers", cfg.get("n_layers"))
        cfg.setdefault("num_attention_heads", cfg.get("n_heads"))
        cfg.setdefault("max_position_embeddings", cfg.get("max_seq_len"))
        cfg.setdefault("intermediate_size",
                       int(cfg.get("expansion_ratio", 4)) * int(cfg["d_model"]))
        cfg.setdefault("clip_qkv", ac.get("clip_qkv"))
        if ac.get("alibi", True):
            cfg.setdefault("alibi_bias_max", ac.get("alibi_bias_max", 8.0))
    if model_type == "falcon":
        cfg.setdefault("intermediate_size",
                       cfg.get("ffn_hidden_size", 4 * int(cfg["hidden_size"])))
        if cfg.get("new_decoder_architecture"):
            cfg.setdefault("num_key_value_heads",
                           cfg.get("num_kv_heads", cfg.get("n_head_kv", 8)))
        elif cfg.get("multi_query", True):
            cfg.setdefault("num_key_value_heads", 1)
    if model_type == "gpt_bigcode":
        cfg.setdefault("num_key_value_heads",
                       1 if cfg.get("multi_query", True)
                       else cfg.get("n_head"))
    n_head = int(cfg.get("num_attention_heads",
                         cfg.get("n_head", cfg.get("num_heads", 1)) or 1))
    n_kv = int(cfg.get("num_key_value_heads", n_head))
    n_embd = int(cfg.get("hidden_size", cfg.get("n_embd", cfg.get("d_model", 0))))
    n_layer = int(cfg.get("num_hidden_layers",
                          cfg.get("n_layer", cfg.get("num_layers", 0)) or 0)
                  )
    head_dim = int(cfg.get("head_dim")
                   or cfg.get("d_kv")
                   or n_embd // max(n_head, 1))
    head_dim_v = head_dim
    if arch == "deepseek2":
        # MQA-form lengths (≡ DeepseekV2Model: head_count_kv=1, key =
        # kv_lora + rope, value = kv_lora); MLA per-head dims written below
        n_kv = 1
        head_dim = int(cfg["kv_lora_rank"]) + int(cfg["qk_rope_head_dim"])
        head_dim_v = int(cfg["kv_lora_rank"])

    w = GGUFWriter(dst, architecture=arch)
    w.add_kv("general.name", os.path.basename(os.path.abspath(src_dir)))
    w.add_kv(f"{arch}.block_count", n_layer)
    w.add_kv(f"{arch}.context_length", int(cfg.get("max_position_embeddings", 2048)))
    w.add_kv(f"{arch}.embedding_length", n_embd)
    n_ff_raw = cfg.get("intermediate_size", cfg.get("n_inner", 4 * n_embd) or 4 * n_embd)
    if isinstance(n_ff_raw, list):  # gemma3n per-layer list (uniform here)
        n_ff_raw = n_ff_raw[0]
    w.add_kv(f"{arch}.feed_forward_length", int(n_ff_raw))
    w.add_kv(f"{arch}.attention.head_count", n_head)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv)
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.value_length", head_dim_v)
    eps = cfg.get("rms_norm_eps",
                  cfg.get("layer_norm_epsilon",
                          cfg.get("layer_norm_eps", cfg.get("norm_eps", 1e-5))))
    if arch in LN_ARCHS or (fam is not None and fam.ln):
        w.add_kv(f"{arch}.attention.layer_norm_epsilon", float(eps))
    else:
        w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", float(eps))
    if arch != "gpt2":
        theta = cfg.get("rope_theta", 10000.0)
        if isinstance(theta, list):  # step35 ships a [global, swa] pair
            theta = theta[0]
        w.add_kv(f"{arch}.rope.freq_base", float(theta))
        if arch != "deepseek2":  # deepseek2 writes qk_rope_head_dim below
            # stablelm/gptneox partial rotary (partial_rotary_factor/rotary_pct)
            rot_pct = cfg.get("partial_rotary_factor", cfg.get("rotary_pct", 1.0))
            w.add_kv(f"{arch}.rope.dimension_count", int(head_dim * float(rot_pct)))
    if cfg.get("use_parallel_residual") is not None:
        w.add_kv(f"{arch}.use_parallel_residual",
                 bool(cfg["use_parallel_residual"]))
    if cfg.get("norm_topk_prob") is not None:
        w.add_kv(f"{arch}.expert_weights_norm", bool(cfg["norm_topk_prob"]))
    if cfg.get("logit_scale"):
        w.add_kv(f"{arch}.logit_scale", float(cfg["logit_scale"]))
    if arch in ("gemma2", "gemma3") and cfg.get("query_pre_attn_scalar"):
        # gemma scales attention by query_pre_attn_scalar**-0.5, which on
        # gemma2-27b / gemma3 differs from head_dim**-0.5
        w.add_kv(f"{arch}.attention.scale",
                 float(cfg["query_pre_attn_scalar"]) ** -0.5)
    # granite multipliers (≡ GraniteModel in convert_hf_to_gguf.py)
    if cfg.get("logits_scaling"):
        w.add_kv(f"{arch}.logit_scale", float(cfg["logits_scaling"]))
    if cfg.get("residual_multiplier"):
        w.add_kv(f"{arch}.residual_scale", float(cfg["residual_multiplier"]))
    if cfg.get("embedding_multiplier"):
        w.add_kv(f"{arch}.embedding_scale", float(cfg["embedding_multiplier"]))
    if cfg.get("attention_multiplier"):
        w.add_kv(f"{arch}.attention.scale", float(cfg["attention_multiplier"]))
    if cfg.get("sliding_window"):
        w.add_kv(f"{arch}.attention.sliding_window", int(cfg["sliding_window"]))
    swp = cfg.get("sliding_window_pattern")
    if swp:
        # "LLLG" string (exaone4) or int N: every Nth layer is global
        w.add_kv(f"{arch}.attention.sliding_window_pattern",
                 len(swp) if isinstance(swp, str) else int(swp))
    if cfg.get("clip_qkv"):  # olmo/dbrx/mpt qkv clamping
        w.add_kv(f"{arch}.attention.clamp_kqv", float(cfg["clip_qkv"]))
    if cfg.get("alibi_bias_max"):  # mpt/jais
        w.add_kv(f"{arch}.attention.max_alibi_bias",
                 float(cfg["alibi_bias_max"]))
    if arch == "chameleon":
        w.add_kv(f"{arch}.swin_norm", bool(cfg.get("swin_norm", False)))
    if cfg.get("attn_logit_softcapping"):
        w.add_kv(f"{arch}.attn_logit_softcapping", float(cfg["attn_logit_softcapping"]))
    if cfg.get("final_logit_softcapping"):
        w.add_kv(f"{arch}.final_logit_softcapping", float(cfg["final_logit_softcapping"]))
    rope_scaling = cfg.get("rope_scaling") or {}
    if rope_scaling.get("rope_type", rope_scaling.get("type")) == "yarn":
        w.add_kv(f"{arch}.rope.scaling.type", "yarn")
        w.add_kv(f"{arch}.rope.scaling.factor", float(rope_scaling.get("factor", 1.0)))
        w.add_kv(f"{arch}.rope.scaling.original_context_length",
                 int(rope_scaling.get("original_max_position_embeddings", 0)))
    # MoE
    if cfg.get("num_experts") or cfg.get("num_local_experts"):
        w.add_kv(f"{arch}.expert_count",
                 int(cfg.get("num_experts", cfg.get("num_local_experts"))))
        w.add_kv(f"{arch}.expert_used_count", int(cfg.get("num_experts_per_tok", 2)))
        if cfg.get("moe_intermediate_size"):
            w.add_kv(f"{arch}.expert_feed_forward_length",
                     int(cfg["moe_intermediate_size"]))
        if cfg.get("shared_expert_intermediate_size"):
            w.add_kv(f"{arch}.expert_shared_feed_forward_length",
                     int(cfg["shared_expert_intermediate_size"]))

    # vocab
    from .convert_families import convert_vocab_rwkv_world

    n_vocab = int(cfg.get("vocab_size", 0))
    tok_json_path = os.path.join(src_dir, "tokenizer.json")
    spm_path = os.path.join(src_dir, "tokenizer.model")
    from .convert_families import convert_vocab_xlmroberta

    if convert_vocab_rwkv_world(w, src_dir, cfg):
        pass  # RWKV world trie vocab shipped as rwkv_vocab_v20230424.txt
    elif convert_vocab_xlmroberta(w, src_dir, cfg):
        pass  # sentencepiece.bpe.model (fairseq-aligned UGM, bge-m3/jina-v3)
    elif os.path.exists(tok_json_path):
        _convert_vocab_bpe(w, json.load(open(tok_json_path)), cfg)
    elif os.path.exists(spm_path):
        _convert_vocab_spm(w, spm_path)
    elif verbose:
        print("warning: no tokenizer files found; writing weights only",
              file=sys.stderr)
    w.add_kv(f"{arch}.vocab_size", n_vocab)
    for key, kv in (("bos_token_id", "tokenizer.ggml.bos_token_id"),
                    ("eos_token_id", "tokenizer.ggml.eos_token_id"),
                    ("pad_token_id", "tokenizer.ggml.padding_token_id")):
        v = cfg.get(key)
        if isinstance(v, list):
            v = v[0] if v else None
        if v is not None:
            w.add_kv(kv, int(v))

    if arch == "t5":
        w.add_kv("t5.attention.relative_buckets_count",
                 int(cfg.get("relative_attention_num_buckets", 32)))
        w.add_kv("t5.decoder_block_count", int(cfg.get("num_decoder_layers", n_layer)))
        w.add_kv("t5.decoder_start_token_id",
                 int(cfg.get("decoder_start_token_id", cfg.get("pad_token_id", 0))))
        w.add_kv("t5.feed_forward_length", int(cfg.get("d_ff", 4 * n_embd)))
    if arch in ("mamba", "falcon-mamba"):
        d_inner = int(cfg.get("intermediate_size",
                              int(cfg.get("expand", 2)) * n_embd))
        w.add_kv(f"{arch}.ssm.conv_kernel", int(cfg.get("conv_kernel", cfg.get("d_conv", 4))))
        w.add_kv(f"{arch}.ssm.inner_size", d_inner)
        w.add_kv(f"{arch}.ssm.state_size", int(cfg.get("state_size", cfg.get("d_state", 16))))
        tsr = cfg.get("time_step_rank", "auto")
        if tsr == "auto" or tsr is None:
            import math as _math

            tsr = _math.ceil(n_embd / 16)
        w.add_kv(f"{arch}.ssm.time_step_rank", int(tsr))
        if arch == "falcon-mamba":
            w.add_kv("falcon-mamba.ssm.dt_b_c_rms", True)
    if arch == "mamba2":
        # ≡ Mamba2Model.set_gguf_parameters: time_step_rank carries the SSD
        # head count (d_inner / head_dim)
        d_inner = int(cfg.get("intermediate_size")
                      or int(cfg.get("expand", 2)) * n_embd)
        hd = int(cfg.get("head_dim", 64))
        w.add_kv("mamba2.ssm.conv_kernel", int(cfg.get("conv_kernel", 4)))
        w.add_kv("mamba2.ssm.inner_size", d_inner)
        w.add_kv("mamba2.ssm.state_size", int(cfg.get("state_size", 128)))
        w.add_kv("mamba2.ssm.time_step_rank", d_inner // hd)
        w.add_kv("mamba2.ssm.group_count", int(cfg.get("n_groups", 1)))
    if arch == "deepseek2":
        # ≡ DeepseekV2Model.set_gguf_parameters: MQA-form key/value lengths
        # plus the true per-head MLA dims; head_count_kv forced to 1
        qk_nope = int(cfg["qk_nope_head_dim"])
        qk_rope = int(cfg["qk_rope_head_dim"])
        kv_lora = int(cfg["kv_lora_rank"])
        if cfg.get("q_lora_rank"):
            w.add_kv(f"{arch}.attention.q_lora_rank", int(cfg["q_lora_rank"]))
        w.add_kv(f"{arch}.attention.kv_lora_rank", kv_lora)
        w.add_kv(f"{arch}.attention.key_length_mla", qk_nope + qk_rope)
        w.add_kv(f"{arch}.attention.value_length_mla", int(cfg["v_head_dim"]))
        w.add_kv(f"{arch}.rope.dimension_count", qk_rope)
        w.add_kv(f"{arch}.leading_dense_block_count",
                 int(cfg.get("first_k_dense_replace", 0)))
        if cfg.get("n_routed_experts"):
            w.add_kv(f"{arch}.expert_count", int(cfg["n_routed_experts"]))
            w.add_kv(f"{arch}.expert_used_count",
                     int(cfg.get("num_experts_per_tok", 2)))
        w.add_kv(f"{arch}.expert_shared_count",
                 int(cfg.get("n_shared_experts", 0) or 0))
        if cfg.get("routed_scaling_factor") is not None:
            w.add_kv(f"{arch}.expert_weights_scale",
                     float(cfg["routed_scaling_factor"]))
        # (expert_weights_norm comes from the generic norm_topk_prob write)
        if cfg.get("scoring_func") == "sigmoid":
            w.add_kv(f"{arch}.expert_gating_func", 2)
    if arch == "gemma3n":
        # ≡ Gemma3NModel.set_gguf_parameters
        import math as _math

        w.add_kv(f"{arch}.altup.active_idx", int(cfg.get("altup_active_idx", 0)))
        w.add_kv(f"{arch}.altup.num_inputs", int(cfg.get("altup_num_inputs", 4)))
        w.add_kv(f"{arch}.embedding_length_per_layer_input",
                 int(cfg["hidden_size_per_layer_input"]))
        w.add_kv(f"{arch}.attention.shared_kv_layers",
                 int(cfg.get("num_kv_shared_layers", 0)))
        pat = cfg.get("activation_sparsity_pattern") or []
        if pat:
            # icdf of a standard normal via the inverse error function
            def _icdf(p):
                return _math.sqrt(2.0) * _erfinv(2.0 * p - 1.0)

            w.add_kv(f"{arch}.activation_sparsity_scale",
                     np.asarray([(_icdf(p) if p > 0 else 0.0) for p in pat],
                                dtype=np.float32))
        lt = cfg.get("layer_types") or []
        if lt:
            w.add_kv(f"{arch}.attention.sliding_window_pattern",
                     np.asarray([t == "sliding_attention" for t in lt],
                                dtype=bool))
        if cfg.get("rope_local_base_freq"):
            w.add_kv(f"{arch}.rope.freq_base_swa",
                     float(cfg["rope_local_base_freq"]))
    if arch == "glm4moe":
        # ≡ Glm4MoeModel: deepseek-style routed MoE keys
        w.add_kv(f"{arch}.expert_count", int(cfg["n_routed_experts"]))
        w.add_kv(f"{arch}.expert_used_count", int(cfg.get("num_experts_per_tok", 8)))
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg["moe_intermediate_size"]))
        w.add_kv(f"{arch}.expert_shared_count",
                 int(cfg.get("n_shared_experts", 0) or 0))
        w.add_kv(f"{arch}.leading_dense_block_count",
                 int(cfg.get("first_k_dense_replace", 0)))
        if cfg.get("routed_scaling_factor") is not None:
            w.add_kv(f"{arch}.expert_weights_scale",
                     float(cfg["routed_scaling_factor"]))
        w.add_kv(f"{arch}.expert_gating_func", 2)  # sigmoid scoring
    if arch == "glm4moe":
        # ≡ Glm4MoeModel: deepseek-style routed MoE keys
        w.add_kv(f"{arch}.expert_count", int(cfg["n_routed_experts"]))
        w.add_kv(f"{arch}.expert_used_count",
                 int(cfg.get("num_experts_per_tok", 8)))
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg["moe_intermediate_size"]))
        w.add_kv(f"{arch}.expert_shared_count",
                 int(cfg.get("n_shared_experts", 0) or 0))
        w.add_kv(f"{arch}.leading_dense_block_count",
                 int(cfg.get("first_k_dense_replace", 0)))
        if cfg.get("routed_scaling_factor") is not None:
            w.add_kv(f"{arch}.expert_weights_scale",
                     float(cfg["routed_scaling_factor"]))
        w.add_kv(f"{arch}.expert_gating_func", 2)  # sigmoid scoring
    if arch == "jamba":
        # ≡ JambaModel.set_gguf_parameters: mamba geometry + per-layer kv
        # head array (0 on mamba layers)
        import math as _math

        d_inner = int(cfg.get("mamba_expand", 2)) * n_embd
        tsr = cfg.get("mamba_dt_rank", "auto")
        if tsr in ("auto", None):
            tsr = _math.ceil(n_embd / 16)
        w.add_kv("jamba.ssm.conv_kernel", int(cfg.get("mamba_d_conv", 4)))
        w.add_kv("jamba.ssm.inner_size", d_inner)
        w.add_kv("jamba.ssm.state_size", int(cfg.get("mamba_d_state", 16)))
        w.add_kv("jamba.ssm.time_step_rank", int(tsr))
        ao, ap = int(cfg.get("attn_layer_offset", 4)), int(
            cfg.get("attn_layer_period", 8))
        kv_arr = [n_kv if (i % ap) == ao else 0 for i in range(n_layer)]
        w.add_kv("jamba.attention.head_count_kv",
                 np.asarray(kv_arr, dtype=np.int32))
    if arch == "lfm2":
        # ≡ LFM2Model: shortconv length + per-layer kv head array (0 on
        # conv layers)
        w.add_kv("lfm2.shortconv.l_cache", int(cfg.get("conv_L_cache", 3)))
        lt = cfg.get("layer_types") or []
        if lt:
            kv_arr = [n_kv if t == "full_attention" else 0 for t in lt]
            w.add_kv("lfm2.attention.head_count_kv",
                     np.asarray(kv_arr, dtype=np.int32))
    if arch == "llama4":
        # ≡ Llama4Model: chunked-attention window; expert ffn width is
        # intermediate_size, dense width intermediate_size_mlp
        if cfg.get("attention_chunk_size"):
            w.add_kv("llama4.attention.sliding_window",
                     int(cfg["attention_chunk_size"]))
        if cfg.get("intermediate_size_mlp"):
            w.add_kv("llama4.expert_feed_forward_length",
                     int(cfg["intermediate_size"]))
    if arch == "bert":
        w.add_kv("bert.attention.causal", False)
    if arch == "modern-bert":
        # ≡ ModernBertModel: dual rope bases, local/global interleave;
        # GGUF sliding_window is the one-sided half of HF local_attention
        w.add_kv("modern-bert.attention.causal", False)
        # full two-sided width; SYMMETRIC masking halves it per side
        w.add_kv("modern-bert.attention.sliding_window",
                 int(cfg.get("local_attention", 128)))
        w.add_kv("modern-bert.attention.sliding_window_pattern",
                 int(cfg.get("global_attn_every_n_layers", 3)))
        w.add_kv("modern-bert.rope.freq_base",
                 float(cfg.get("global_rope_theta", 160000.0)))
        w.add_kv("modern-bert.rope.freq_base_swa",
                 float(cfg.get("local_rope_theta", 10000.0)))
    if arch == "granitemoe":
        # renormalized softmax routing (GraniteMoeTopKGating softmax over
        # the top-k logits)
        w.add_kv("granitemoe.expert_weights_norm", True)
    if arch == "granitehybrid":
        # ≡ GraniteMoeHybrid (granite-4.0-h): mamba2/attention mixer per
        # layer_types, granitemoe-style fused MoE + shared mlp, NoPE attn
        lt = cfg.get("layer_types")
        if not lt:
            raise NotImplementedError(
                "granitemoehybrid: config.layer_types is required")
        kv_arr = [n_kv if t == "attention" else 0 for t in lt]
        w.add_kv(f"{arch}.attention.head_count_kv",
                 np.asarray(kv_arr, dtype=np.int32))
        d_inner = int(cfg["mamba_n_heads"]) * int(cfg["mamba_d_head"])
        w.add_kv(f"{arch}.ssm.conv_kernel", int(cfg.get("mamba_d_conv", 4)))
        w.add_kv(f"{arch}.ssm.inner_size", d_inner)
        w.add_kv(f"{arch}.ssm.state_size", int(cfg.get("mamba_d_state", 128)))
        w.add_kv(f"{arch}.ssm.time_step_rank", int(cfg["mamba_n_heads"]))
        w.add_kv(f"{arch}.ssm.group_count", int(cfg.get("mamba_n_groups", 1)))
        w.add_kv(f"{arch}.expert_count", int(cfg["num_local_experts"]))
        w.add_kv(f"{arch}.expert_used_count",
                 int(cfg.get("num_experts_per_tok", 2)))
        # GraniteMoeHybridTopKGating: softmax over the top-k logits
        w.add_kv(f"{arch}.expert_weights_norm", True)
    if arch in ("qwen2vl", "qwen3vl", "qwen3vlmoe"):
        rs = cfg.get("rope_scaling") or {}
        sec = rs.get("mrope_section")
        if sec:
            w.add_kv(f"{arch}.rope.dimension_sections",
                     np.asarray(list(sec) + [0], dtype=np.int32))
        nds = len((cfg.get("vision_config") or {})
                  .get("deepstack_visual_indexes", []))
        if nds:
            w.add_kv(f"{arch}.n_deepstack_layers", nds)
    if arch == "hunyuan-moe":
        # ≡ HunYuanMoEV1: renormalized top-k softmax + always-on shared mlp
        w.add_kv(f"{arch}.expert_count", int(cfg["num_experts"]))
        w.add_kv(f"{arch}.expert_used_count", int(cfg.get("moe_topk", 1)))
    if arch == "ernie4_5-moe":
        # ≡ Ernie4_5MoeModel.set_gguf_parameters: moe_* config keys; the
        # leading dense block count comes from moe_layer_start_index
        if int(cfg.get("moe_layer_interval", 1)) != 1:
            raise NotImplementedError("ernie4_5-moe: interleaved MoE layers "
                                      "(moe_layer_interval != 1)")
        w.add_kv(f"{arch}.expert_count", int(cfg["moe_num_experts"]))
        w.add_kv(f"{arch}.expert_used_count", int(cfg.get("moe_k", 2)))
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg.get("moe_intermediate_size", 0)))
        w.add_kv(f"{arch}.expert_shared_count",
                 int(cfg.get("moe_num_shared_experts", 0) or 0))
        w.add_kv(f"{arch}.leading_dense_block_count",
                 int(cfg.get("moe_layer_start_index", 0)))
    if arch == "bitnet" and cfg.get("hidden_act") == "relu2":
        # microsoft BitNet-b1.58 uses gated ReLU² (beyond the reference,
        # which only converts the 1bitLLM silu variant)
        w.add_kv("bitnet.activation", "relu2")
    if arch == "dots1":
        # ≡ Dots1Model: deepseek-style routed MoE keys; the noaux_tc router
        # scores with sigmoid + e_score_correction bias
        w.add_kv(f"{arch}.expert_count", int(cfg["n_routed_experts"]))
        w.add_kv(f"{arch}.expert_used_count",
                 int(cfg.get("num_experts_per_tok", 8)))
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg["moe_intermediate_size"]))
        w.add_kv(f"{arch}.expert_shared_count",
                 int(cfg.get("n_shared_experts", 0) or 0))
        w.add_kv(f"{arch}.leading_dense_block_count",
                 int(cfg.get("first_k_dense_replace", 0)))
        if cfg.get("routed_scaling_factor") is not None:
            w.add_kv(f"{arch}.expert_weights_scale",
                     float(cfg["routed_scaling_factor"]))
        if cfg.get("scoring_func", "noaux_tc") == "noaux_tc":
            w.add_kv(f"{arch}.expert_gating_func", 2)  # sigmoid scoring
    if arch == "falcon-h1":
        # ≡ FalconH1Model.set_gguf_parameters (mamba2-style ssm keys)
        w.add_kv(f"{arch}.ssm.conv_kernel", int(cfg.get("mamba_d_conv", 4)))
        w.add_kv(f"{arch}.ssm.inner_size", int(cfg["mamba_d_ssm"]))
        w.add_kv(f"{arch}.ssm.state_size", int(cfg.get("mamba_d_state", 128)))
        w.add_kv(f"{arch}.ssm.time_step_rank", int(cfg["mamba_n_heads"]))
        w.add_kv(f"{arch}.ssm.group_count", int(cfg.get("mamba_n_groups", 1)))
    if arch == "qwen3next":
        # ≡ Qwen3NextModel.set_gguf_parameters: ssm.* keys carry the gated
        # DeltaNet geometry (group_count = key heads, time_step_rank = value
        # heads, state_size = key head dim)
        w.add_kv(f"{arch}.ssm.conv_kernel", int(cfg["linear_conv_kernel_dim"]))
        w.add_kv(f"{arch}.ssm.state_size", int(cfg["linear_key_head_dim"]))
        w.add_kv(f"{arch}.ssm.group_count", int(cfg["linear_num_key_heads"]))
        w.add_kv(f"{arch}.ssm.time_step_rank", int(cfg["linear_num_value_heads"]))
        w.add_kv(f"{arch}.ssm.inner_size",
                 int(cfg["linear_value_head_dim"]) * int(cfg["linear_num_value_heads"]))
    hp_info = {"arch": arch, "n_embd": n_embd, "n_head": n_head,
               "n_kv": n_kv, "n_layer": n_layer, "head_dim": head_dim}
    if fam is not None and fam.set_kv is not None:
        fam.set_kv(w, cfg, hp_info)
    fam_mapper = (fam.make_mapper(cfg, hp_info)
                  if fam is not None and fam.make_mapper is not None else None)

    gtype = {"f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16}[outtype]
    n_tensors = 0
    # stack MoE experts: collect experts.N.* into 3D tensors
    expert_acc: dict[str, dict[int, np.ndarray]] = {}
    altup_acc: dict[str, dict[int, np.ndarray]] = {}  # gemma3n projections
    xielu_acc: dict[str, dict[int, float]] = {}  # apertus activation params
    for name, arr in _load_tensors(src_dir):
        if vl_wrapped:
            if name.startswith(("talker.", "token2wav.")):
                continue  # omni speech stack (not a text-LM component)
            if name.startswith("thinker."):
                name = name[len("thinker."):]
            if name.startswith(("model.visual.", "visual.",
                                "model.vision_tower.", "vision_tower.",
                                "model.audio_tower.", "audio_tower.",
                                "model.vision_model.", "vision_model.",
                                "model.connector.", "connector.",
                                "model.multi_modal_projector.",
                                "multi_modal_projector.",
                                # janus aligner + image-generation stack
                                "model.aligner.", "aligner.",
                                "model.vqmodel.", "vqmodel.",
                                "model.generation_embeddings.",
                                "model.generation_aligner.",
                                "model.generation_head.")):
                continue  # vision tower lives in the --mmproj output
            # serializations: model.language_model.* (new),
            # language_model.model.* / language_model.lm_head (legacy),
            # model.text_model.* (idefics3)
            if name.startswith("model.language_model."):
                name = "model." + name[len("model.language_model."):]
            elif name.startswith("language_model."):
                name = name[len("language_model."):]
            elif name.startswith("model.text_model."):
                name = "model." + name[len("model.text_model."):]
        if fam_mapper is not None:
            out = fam_mapper(name, _LazyF32(np.asarray(arr)))
            if out is not None:
                for gname, a in out:
                    w.add_tensor(gname, a,
                                 gtype if a.ndim >= 2 else GGMLType.F32)
                    n_tensors += 1
                    if verbose:
                        print(f"{name} -> {gname} {tuple(a.shape)}",
                              file=sys.stderr)
                continue
        if ".mlp.experts." in name and name.split(".")[5] in (
            "gate_up_proj", "gate_up_proj_bias", "down_proj", "down_proj_bias"
        ):
            # gpt-oss pre-stacked expert tensors (interleaved gate/up)
            li = name.split(".")[2]
            kind = name.split(".")[5]
            a = np.asarray(arr, dtype=np.float32)
            pfx = f"blk.{li}."
            if kind == "gate_up_proj":  # [E, h, 2F] interleaved
                gate = np.ascontiguousarray(a[:, :, 0::2].transpose(0, 2, 1))
                up = np.ascontiguousarray(a[:, :, 1::2].transpose(0, 2, 1))
                w.add_tensor(pfx + "ffn_gate_exps.weight", gate, gtype)
                w.add_tensor(pfx + "ffn_up_exps.weight", up, gtype)
                n_tensors += 2
            elif kind == "gate_up_proj_bias":  # [E, 2F]
                w.add_tensor(pfx + "ffn_gate_exps.bias", np.ascontiguousarray(a[:, 0::2]))
                w.add_tensor(pfx + "ffn_up_exps.bias", np.ascontiguousarray(a[:, 1::2]))
                n_tensors += 2
            elif kind == "down_proj":  # [E, F, h]
                w.add_tensor(pfx + "ffn_down_exps.weight",
                             np.ascontiguousarray(a.transpose(0, 2, 1)), gtype)
                n_tensors += 1
            else:  # down_proj_bias [E, h]
                w.add_tensor(pfx + "ffn_down_exps.bias", a)
                n_tensors += 1
            continue
        if arch == "llama4" and ".feed_forward.experts." in name:
            # pre-stacked llama4 experts: gate_up_proj (E, d, 2F) halves,
            # down_proj (E, F, d) — GGUF wants (E, F, d)/(E, d, F)
            li = name.split(".")[2]
            kind = name.split(".")[5]
            a = np.asarray(arr, dtype=np.float32)
            if kind == "gate_up_proj":
                F = a.shape[2] // 2
                w.add_tensor(f"blk.{li}.ffn_gate_exps.weight",
                             np.ascontiguousarray(a[:, :, :F].transpose(0, 2, 1)), gtype)
                w.add_tensor(f"blk.{li}.ffn_up_exps.weight",
                             np.ascontiguousarray(a[:, :, F:].transpose(0, 2, 1)), gtype)
                n_tensors += 2
            else:  # down_proj
                w.add_tensor(f"blk.{li}.ffn_down_exps.weight",
                             np.ascontiguousarray(a.transpose(0, 2, 1)), gtype)
                n_tensors += 1
            continue
        if arch in ("granitemoe", "granitehybrid") and \
                ".block_sparse_moe." in name and (
                "input_linear" in name or "output_linear" in name):
            # GraniteMoeParallelExperts: input_linear (E, 2F, d) fused
            # [gate; up], output_linear (E, d, F)
            li = name.split(".")[2]
            a = np.asarray(arr, dtype=np.float32)
            if "input_linear" in name:
                F = a.shape[1] // 2
                w.add_tensor(f"blk.{li}.ffn_gate_exps.weight",
                             np.ascontiguousarray(a[:, :F, :]), gtype)
                w.add_tensor(f"blk.{li}.ffn_up_exps.weight",
                             np.ascontiguousarray(a[:, F:, :]), gtype)
                n_tensors += 2
            else:
                w.add_tensor(f"blk.{li}.ffn_down_exps.weight", a, gtype)
                n_tensors += 1
            continue
        if name.endswith(".mlp.moe_statics.e_score_correction_bias"):
            # ernie4_5-moe selection bias (ranked by probs+bias, weighted by
            # probs — qwen_moe.forward select_bias); HF shape (1, E)
            li = name.split(".")[2]
            w.add_tensor(f"blk.{li}.exp_probs_b.bias",
                         np.asarray(arr, np.float32).reshape(-1))
            n_tensors += 1
            continue
        if ".mlp.experts." in name or ".feed_forward.experts." in name:
            # model.layers.L.{mlp|feed_forward}.experts.E.{gate,up,down}_proj.weight
            parts = name.split(".")
            li = parts[2]; ei = int(parts[5]); proj = parts[6]
            key = {"gate_proj": f"blk.{li}.ffn_gate_exps.weight",
                   "up_proj": f"blk.{li}.ffn_up_exps.weight",
                   "down_proj": f"blk.{li}.ffn_down_exps.weight"}.get(proj)
            if key:
                expert_acc.setdefault(key, {})[ei] = np.asarray(arr, dtype=np.float32)
            continue
        if ".shared_mlp.input_linear.weight" in name and \
                arch in ("granitemoe", "granitehybrid"):
            # GraniteMoeShared: layer-level fused [gate; up] shared expert
            li = name.split(".")[2]
            a = np.asarray(arr, dtype=np.float32)
            F = a.shape[0] // 2
            w.add_tensor(f"blk.{li}.ffn_gate_shexp.weight", a[:F], gtype)
            w.add_tensor(f"blk.{li}.ffn_up_shexp.weight", a[F:], gtype)
            n_tensors += 2
            continue
        if ".shared_mlp.output_linear.weight" in name and \
                arch in ("granitemoe", "granitehybrid"):
            li = name.split(".")[2]
            w.add_tensor(f"blk.{li}.ffn_down_shexp.weight",
                         np.asarray(arr, dtype=np.float32), gtype)
            n_tensors += 1
            continue
        if ".block_sparse_moe.experts." in name:
            # mixtral: model.layers.L.block_sparse_moe.experts.E.w{1,2,3}
            parts = name.split(".")
            li = parts[2]; ei = int(parts[5]); proj = parts[6]
            key = {"w1": f"blk.{li}.ffn_gate_exps.weight",
                   "w2": f"blk.{li}.ffn_down_exps.weight",
                   "w3": f"blk.{li}.ffn_up_exps.weight"}.get(proj)
            if key:
                expert_acc.setdefault(key, {})[ei] = np.asarray(arr, dtype=np.float32)
            continue
        if arch == "gemma3n":
            nm = name
            if nm.startswith("model.language_model."):
                nm = "model." + nm[len("model.language_model."):]
            if ".altup_projections." in nm or ".altup_unembed_projections." in nm:
                # stack the A-1 projection matrices into one 3D tensor
                parts = nm.split(".")
                idx = int(parts[2])
                key = ("altup_proj.weight" if "altup_projections" in nm
                       else "altup_unembd_proj.weight")
                altup_acc.setdefault(key, {})[idx] = np.asarray(
                    arr, dtype=np.float32)
                continue
            gname = _map_gemma3n_name(nm)
            if gname is None:
                if verbose:
                    print(f"skip {name}", file=sys.stderr)
                continue
            a = np.asarray(arr, dtype=np.float32)
            w.add_tensor(gname, a, gtype if a.ndim >= 2 else GGMLType.F32)
            n_tensors += 1
            continue
        if arch == "qwen3next":
            for gname, a in _qwen3next_tensors(
                name, np.asarray(arr, dtype=np.float32), cfg
            ):
                w.add_tensor(gname, a, gtype if a.ndim >= 2 else GGMLType.F32)
                n_tensors += 1
                if verbose:
                    print(f"{name} -> {gname} {tuple(a.shape)}", file=sys.stderr)
            continue
        if arch == "dbrx" and ".ffn.experts.mlp." in name:
            # pre-stacked (E·ff, d) planes; w2 is stored input-major
            li = name.split(".")[2]
            kind = name.split(".")[-1]
            a = np.asarray(arr, dtype=np.float32).reshape(
                int(cfg["num_experts"]), -1, n_embd)
            if kind == "w1":
                gname = f"blk.{li}.ffn_gate_exps.weight"
            elif kind == "v1":
                gname = f"blk.{li}.ffn_up_exps.weight"
            else:  # w2 → (E, d, ff)
                gname = f"blk.{li}.ffn_down_exps.weight"
                a = a.transpose(0, 2, 1)
            w.add_tensor(gname, np.ascontiguousarray(a), gtype)
            n_tensors += 1
            continue
        if arch == "apertus" and ".mlp.act_fn." in name:
            # xIELU scalars → global per-layer xielu.* KV arrays
            parts = name.split(".")
            xielu_acc.setdefault(parts[-1], {})[int(parts[2])] = float(
                np.asarray(arr, dtype=np.float32).reshape(-1)[0])
            continue
        if arch == "chameleon":
            if name.startswith("model.vqmodel"):
                continue  # image tokenizer (ChameleonModel.modify_tensors)
            if ".q_norm." in name or ".k_norm." in name:
                # per-head LN qk-norms ride the same within-head pair
                # interleave as the permuted q/k (ChameleonModel.
                # _reverse_hf_permute, convert_hf_to_gguf.py:9786 — kept
                # per-head instead of replicating head 0, matching the HF
                # module's distinct per-head weights)
                a = np.asarray(arr, np.float32)
                hd = a.shape[-1]
                arr = a.reshape(-1, 2, hd // 2).swapaxes(1, 2).reshape(a.shape)
        gname = map_tensor_name(name, arch)
        if gname is not None and arch in ("gptneox", "bloom") and "attn_qkv" in gname:
            # HF GPTNeoX/Bloom fuse qkv per head [(q,k,v)×head_dim]·n_head;
            # GGUF expects [Q|K|V] blocks (convert_hf_to_gguf GPTNeoXModel /
            # BloomModel)
            a = np.asarray(arr, dtype=np.float32)
            hd = n_embd // n_head
            qkv = a.reshape((n_head, 3, hd) + a.shape[1:])
            arr = np.concatenate(
                [qkv[:, 0].reshape((n_embd,) + a.shape[1:]),
                 qkv[:, 1].reshape((n_embd,) + a.shape[1:]),
                 qkv[:, 2].reshape((n_embd,) + a.shape[1:])], axis=0)
        if gname is not None and arch == "falcon" and "attn_qkv" in gname:
            # HF Falcon interleaves q/k/v per kv group
            # [(q×g)|k|v]·n_kv_head; GGUF expects [Q|K|V] (FalconModel)
            a = np.asarray(arr, dtype=np.float32)
            hd = n_embd // n_head
            g = n_head // n_kv
            qkv = a.reshape((n_kv, g + 2, hd) + a.shape[1:])
            arr = np.concatenate(
                [qkv[:, :g].reshape((n_head * hd,) + a.shape[1:]),
                 qkv[:, g].reshape((n_kv * hd,) + a.shape[1:]),
                 qkv[:, g + 1].reshape((n_kv * hd,) + a.shape[1:])], axis=0)
        if gname is None:
            if verbose and "inv_freq" not in name:
                print(f"skip {name}", file=sys.stderr)
            continue
        arr = np.asarray(arr, dtype=np.float32)
        if arch in ("mamba", "mamba2", "falcon-h1", "falcon-mamba", "jamba") and gname.endswith("ssm_conv1d.weight"):
            arr = arr.reshape(arr.shape[0], arr.shape[-1])
        if arch in ("mamba", "mamba2", "falcon-h1", "falcon-mamba", "jamba") and gname.endswith("ssm_a"):
            arr = -np.exp(arr)  # gguf convention (MambaModel A_log fold)
        if arch == "mamba2" and gname.endswith("ssm_norm.weight"):
            arr = arr.reshape(int(cfg.get("n_groups", 1)), -1)
        if arch == "falcon-h1":
            # fold the MuP multipliers into the weights (FalconH1Model)
            if gname.endswith("ssm_norm.weight"):
                arr = arr.reshape(int(cfg.get("mamba_n_groups", 1)), -1)
            mlp_m = cfg.get("mlp_multipliers") or [1.0, 1.0]
            if gname.endswith("ffn_gate.weight"):
                arr = arr * float(mlp_m[0])
            elif gname.endswith("ffn_down.weight"):
                arr = arr * float(mlp_m[1])
            elif gname.endswith("attn_k.weight"):
                arr = arr * float(cfg.get("key_multiplier", 1.0)) \
                    * float(cfg.get("attention_in_multiplier", 1.0))
            elif gname.endswith(("attn_q.weight", "attn_v.weight")):
                arr = arr * float(cfg.get("attention_in_multiplier", 1.0))
            elif gname.endswith("attn_output.weight"):
                arr = arr * float(cfg.get("attention_out_multiplier", 1.0))
            elif gname.endswith("ssm_out.weight"):
                arr = arr * float(cfg.get("ssm_out_multiplier", 1.0))
            elif gname.endswith("ssm_in.weight"):
                arr = arr * float(cfg.get("ssm_in_multiplier", 1.0))
                zx_m = cfg.get("ssm_multipliers") or [1.0] * 5
                d_ssm = int(cfg["mamba_d_ssm"])
                gts = int(cfg.get("mamba_n_groups", 1)) * int(cfg.get("mamba_d_state", 128))
                arr = arr.copy()
                arr[:d_ssm] *= float(zx_m[0])
                arr[d_ssm:2 * d_ssm] *= float(zx_m[1])
                arr[2 * d_ssm:2 * d_ssm + gts] *= float(zx_m[2])
                arr[2 * d_ssm + gts:2 * d_ssm + 2 * gts] *= float(zx_m[3])
                arr[2 * d_ssm + 2 * gts:] *= float(zx_m[4])
            elif gname == "output.weight":
                arr = arr * float(cfg.get("lm_head_multiplier", 1.0))
            elif gname == "token_embd.weight":
                arr = arr * float(cfg.get("embedding_multiplier", 1.0))
        permute = arch in PERMUTE_QK_ARCHS or (fam is not None
                                               and fam.permute_qk)
        if permute and gname.endswith("attn_q.weight"):
            arr = _permute_qk(arr, n_head)
        elif permute and gname.endswith("attn_k.weight"):
            arr = _permute_qk(arr, n_kv)
        if arch.startswith("gemma") and gname.endswith("norm.weight"):
            arr = arr + 1.0  # gemma norms store w-1 in HF
        if arch == "nemotron" and gname.endswith("norm.weight"):
            arr = arr + 1.0  # LayerNorm1P (NemotronModel.modify_tensors)
        if arch == "lfm2" and gname.endswith("shortconv.conv.weight"):
            arr = arr.reshape(arr.shape[0], arr.shape[-1])  # (d,1,L)→(d,L)
        # norms/1-d stay f32
        t = gtype if arr.ndim >= 2 else GGMLType.F32
        w.add_tensor(gname, arr, t)
        n_tensors += 1
        if verbose:
            print(f"{name} -> {gname} {tuple(arr.shape)}", file=sys.stderr)
    for key, experts in expert_acc.items():
        stacked = np.stack([experts[i] for i in sorted(experts)], axis=0)
        w.add_tensor(key, stacked, gtype)
        n_tensors += 1
    for key, mats in altup_acc.items():
        stacked = np.stack([mats[i] for i in sorted(mats)], axis=0)
        w.add_tensor(key, stacked, gtype)
        n_tensors += 1
    for kind, by_layer in xielu_acc.items():
        w.add_kv(f"xielu.{kind}",
                 np.asarray([by_layer[i] for i in sorted(by_layer)],
                            dtype=np.float32))
    w.write()
    return {"n_tensors": n_tensors, "arch": arch, "out": dst}


_MMPROJ_VISION_TYPES = ("qwen2_vl", "qwen2_5_vl", "gemma3", "mistral3",
                        "internvl", "llava", "qwen2_audio", "voxtral",
                        "idefics3", "janus", "lfm2_vl", "lfm2-vl", "glm4v",
                        "glm4v_moe", "llama4", "qwen3_vl", "qwen3_vl_moe",
                        "qwen2_5_omni", "qwen2_5_omni_thinker", "kimi_vl",
                        "youtu_vl", "youtuvl", "gemma3n")


def convert_hf_mmproj(src_dir: str, dst: str, verbose: bool = True) -> dict:
    """Export the VISION tower of an HF VL checkpoint as an mmproj GGUF
    (≡ convert_hf_to_gguf.py --mmproj → tools/mtmd/clip-impl.h naming).
    Currently: qwen2_vl (quick-gelu MLP merger) and qwen2_5_vl (RMS norms,
    gated silu, windowed attention)."""
    cfg = json.load(open(os.path.join(src_dir, "config.json")))
    model_type = cfg.get("model_type")
    if model_type not in _MMPROJ_VISION_TYPES:
        raise NotImplementedError(
            f"--mmproj supports {_MMPROJ_VISION_TYPES}, got {model_type!r}")
    if model_type == "gemma3":
        return _convert_gemma3_mmproj(src_dir, dst, cfg, verbose)
    if model_type == "mistral3":
        return _convert_pixtral_mmproj(src_dir, dst, cfg, verbose)
    if model_type == "internvl":
        return _convert_internvl_mmproj(src_dir, dst, cfg, verbose)
    if model_type == "llava":
        return _convert_llava_mmproj(src_dir, dst, cfg, verbose)
    if model_type in ("qwen2_audio", "voxtral"):
        return _convert_whisper_audio_mmproj(src_dir, dst, cfg, model_type,
                                             verbose)
    if model_type == "idefics3":
        return _convert_idefics3_mmproj(src_dir, dst, cfg, verbose)
    if model_type == "janus":
        return _convert_janus_mmproj(src_dir, dst, cfg, verbose)
    if model_type in ("lfm2_vl", "lfm2-vl"):
        return _convert_lfm2_mmproj(src_dir, dst, cfg, verbose)
    if model_type in ("glm4v", "glm4v_moe"):
        return _convert_glm4v_mmproj(src_dir, dst, cfg, verbose)
    if model_type == "llama4":
        return _convert_llama4_mmproj(src_dir, dst, cfg, verbose)
    if model_type in ("qwen3_vl", "qwen3_vl_moe"):
        return _convert_qwen3vl_mmproj(src_dir, dst, cfg, verbose)
    if model_type in ("qwen2_5_omni", "qwen2_5_omni_thinker"):
        return _convert_qwen25o_mmproj(src_dir, dst, cfg, verbose)
    if model_type == "kimi_vl":
        return _convert_kimivl_mmproj(src_dir, dst, cfg, verbose)
    if model_type in ("youtu_vl", "youtuvl"):
        return _convert_youtuvl_mmproj(src_dir, dst, cfg, verbose)
    if model_type == "gemma3n":
        return _convert_gemma3n_mmproj(src_dir, dst, cfg, verbose)
    is25 = model_type == "qwen2_5_vl"
    vc = cfg["vision_config"]
    # 2.0: embed_dim is the tower width (hidden_size = LLM dim for the
    # merger); 2.5: hidden_size is the tower width
    n_embd = int(vc.get("embed_dim") or vc["hidden_size"])
    depth = int(vc["depth"])
    n_head = int(vc["num_heads"])
    n_ff = int(vc.get("intermediate_size",
                      n_embd * float(vc.get("mlp_ratio", 4))))
    patch = int(vc.get("patch_size", 14))
    merge = int(vc.get("spatial_merge_size", 2))

    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type",
             "qwen2.5vl_merger" if is25 else "qwen2vl_merger")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", n_ff)
    w.add_kv("clip.vision.block_count", depth)
    w.add_kv("clip.vision.attention.head_count", n_head)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.spatial_merge_size", merge)
    if is25:
        idx = sorted(vc.get("fullatt_block_indexes", []))
        # clip.cpp models the full-attention interleave as every
        # n_wa_pattern-th block; HF stores the explicit index list
        pattern = (idx[0] + 1) if idx else 0
        if any((i + 1) % pattern for i in idx):
            raise NotImplementedError(
                f"irregular fullatt_block_indexes {idx}")
        w.add_kv("clip.vision.n_wa_pattern", pattern)
        w.add_kv("clip.vision.window_size", int(vc.get("window_size", 112)))

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.visual.", "visual."):
            if name.startswith(pfx):
                sd[name[len(pfx):]] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no visual.* tensors found under {src_dir}")

    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    pw = sd["patch_embed.proj.weight"]  # [C, 3, tps, P, P]
    put("v.patch_embd.weight", pw[:, :, 0].reshape(n_embd, -1))
    if pw.shape[2] > 1:  # temporal_patch_size 2: second frame plane
        put("v.patch_embd.weight.1", pw[:, :, 1].reshape(n_embd, -1))
    for i in range(depth):
        hp_, gp = f"blocks.{i}.", f"v.blk.{i}."
        qkv_w, qkv_b = sd[hp_ + "attn.qkv.weight"], sd[hp_ + "attn.qkv.bias"]
        for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            put(gp + nm + ".weight", qkv_w[j * n_embd:(j + 1) * n_embd])
            put(gp + nm + ".bias", qkv_b[j * n_embd:(j + 1) * n_embd])
        put(gp + "attn_out.weight", sd[hp_ + "attn.proj.weight"])
        put(gp + "attn_out.bias", sd[hp_ + "attn.proj.bias"])
        put(gp + "ln1.weight", sd[hp_ + "norm1.weight"])
        if hp_ + "norm1.bias" in sd:
            put(gp + "ln1.bias", sd[hp_ + "norm1.bias"])
        put(gp + "ln2.weight", sd[hp_ + "norm2.weight"])
        if hp_ + "norm2.bias" in sd:
            put(gp + "ln2.bias", sd[hp_ + "norm2.bias"])
        if hp_ + "mlp.fc1.weight" in sd:  # 2.0 quick-gelu MLP
            put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc1.weight"])
            put(gp + "ffn_up.bias", sd[hp_ + "mlp.fc1.bias"])
            put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc2.weight"])
            put(gp + "ffn_down.bias", sd[hp_ + "mlp.fc2.bias"])
        else:  # 2.5 gated silu
            for g_, h_ in (("ffn_gate", "mlp.gate_proj"),
                           ("ffn_up", "mlp.up_proj"),
                           ("ffn_down", "mlp.down_proj")):
                put(gp + g_ + ".weight", sd[hp_ + h_ + ".weight"])
                put(gp + g_ + ".bias", sd[hp_ + h_ + ".bias"])
    put("v.post_ln.weight", sd["merger.ln_q.weight"])
    if "merger.ln_q.bias" in sd:
        put("v.post_ln.bias", sd["merger.ln_q.bias"])
    put("mm.0.weight", sd["merger.mlp.0.weight"])
    put("mm.0.bias", sd["merger.mlp.0.bias"])
    put("mm.2.weight", sd["merger.mlp.2.weight"])
    put("mm.2.bias", sd["merger.mlp.2.bias"])
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_gemma3_mmproj(src_dir: str, dst: str, cfg: dict,
                           verbose: bool) -> dict:
    """Gemma3 SigLIP tower + AvgPool projector → mmproj GGUF
    (≡ Gemma3VisionModel in convert_hf_to_gguf.py / clip.cpp gemma3)."""
    import math as _math

    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc["num_hidden_layers"])
    size = int(vc.get("image_size", 896))
    patch = int(vc.get("patch_size", 14))
    side = size // patch
    tokens = int(cfg.get("mm_tokens_per_image", 256))
    sf = side // int(_math.isqrt(tokens))

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.vision_tower.vision_model.",
                    "vision_tower.vision_model.",
                    "model.multi_modal_projector.",
                    "multi_modal_projector."):
            if name.startswith(pfx):
                sd[name[len(pfx):]] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no vision_tower tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "gemma3")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", size)
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", int(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count",
             int(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("layer_norm_eps", 1e-6)))
    w.add_kv("clip.vision.projector.scale_factor", sf)
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    put("v.patch_embd.weight",
        sd["embeddings.patch_embedding.weight"].reshape(n_embd, -1))
    put("v.patch_embd.bias", sd["embeddings.patch_embedding.bias"])
    put("v.position_embd.weight", sd["embeddings.position_embedding.weight"])
    for i in range(n_layer):
        hp_, gp = f"encoder.layers.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "layer_norm1.weight"])
        put(gp + "ln1.bias", sd[hp_ + "layer_norm1.bias"])
        put(gp + "ln2.weight", sd[hp_ + "layer_norm2.weight"])
        put(gp + "ln2.bias", sd[hp_ + "layer_norm2.bias"])
        for hf_nm, gg_nm in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                             ("v_proj", "attn_v"), ("out_proj", "attn_out")):
            put(gp + gg_nm + ".weight", sd[hp_ + f"self_attn.{hf_nm}.weight"])
            put(gp + gg_nm + ".bias", sd[hp_ + f"self_attn.{hf_nm}.bias"])
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc1.weight"])
        put(gp + "ffn_up.bias", sd[hp_ + "mlp.fc1.bias"])
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc2.weight"])
        put(gp + "ffn_down.bias", sd[hp_ + "mlp.fc2.bias"])
    put("v.post_ln.weight", sd["post_layernorm.weight"])
    put("v.post_ln.bias", sd["post_layernorm.bias"])
    # gemma folds the +1 of its RMSNorm into the stored mmproj weight
    put("mm.soft_emb_norm.weight", 1.0 + sd["mm_soft_emb_norm.weight"])
    put("mm.input_projection.weight", sd["mm_input_projection_weight"])
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_pixtral_mmproj(src_dir: str, dst: str, cfg: dict,
                            verbose: bool) -> dict:
    """Mistral-Small-3.1 pixtral tower + Mistral3 patch merger/projector →
    mmproj GGUF (≡ clip.cpp pixtral / mistral3 graph)."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc["num_hidden_layers"])
    head_dim = int(vc.get("head_dim", n_embd // int(vc["num_attention_heads"])))
    patch = int(vc.get("patch_size", 16))
    merge = int(cfg.get("spatial_merge_size", 1))

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.vision_tower.", "vision_tower.",
                    "model.multi_modal_projector.", "multi_modal_projector."):
            if name.startswith(pfx):
                sd[name[len(pfx):]] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no vision_tower tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "pixtral")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", n_embd // head_dim)
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("rms_norm_eps", 1e-5)))
    w.add_kv("clip.vision.rope.freq_base",
             float(vc.get("rope_theta", 10000.0)))
    if merge > 1:
        w.add_kv("clip.vision.spatial_merge_size", merge)
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    put("v.patch_embd.weight", sd["patch_conv.weight"].reshape(n_embd, -1))
    put("v.pre_ln.weight", sd["ln_pre.weight"])
    for i in range(n_layer):
        hp_, gp = f"transformer.layers.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "attention_norm.weight"])
        put(gp + "attn_q.weight", sd[hp_ + "attention.q_proj.weight"])
        put(gp + "attn_k.weight", sd[hp_ + "attention.k_proj.weight"])
        put(gp + "attn_v.weight", sd[hp_ + "attention.v_proj.weight"])
        put(gp + "attn_out.weight", sd[hp_ + "attention.o_proj.weight"])
        put(gp + "ln2.weight", sd[hp_ + "ffn_norm.weight"])
        put(gp + "ffn_gate.weight", sd[hp_ + "feed_forward.gate_proj.weight"])
        put(gp + "ffn_up.weight", sd[hp_ + "feed_forward.up_proj.weight"])
        put(gp + "ffn_down.weight", sd[hp_ + "feed_forward.down_proj.weight"])
    if merge > 1:
        put("mm.input_norm.weight", sd["norm.weight"])
        put("mm.patch_merger.weight", sd["patch_merger.merging_layer.weight"])
    put("mm.1.weight", sd["linear_1.weight"])
    if "linear_1.bias" in sd:
        put("mm.1.bias", sd["linear_1.bias"])
    put("mm.2.weight", sd["linear_2.weight"])
    if "linear_2.bias" in sd:
        put("mm.2.bias", sd["linear_2.bias"])
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_internvl_mmproj(src_dir: str, dst: str, cfg: dict,
                             verbose: bool) -> dict:
    """InternVL InternViT tower (CLS token, layer scales, optional qk
    norms) + pixel-shuffle MLP projector → mmproj GGUF (≡ clip.cpp
    internvl graph)."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc["num_hidden_layers"])

    def first(v):
        return int(v[0]) if isinstance(v, (list, tuple)) else int(v)

    patch = first(vc.get("patch_size", 14))
    size = first(vc.get("image_size", 448))
    m = int(round(1.0 / float(cfg.get("downsample_ratio", 0.5))))

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.vision_tower.", "vision_tower.",
                    "model.multi_modal_projector.", "multi_modal_projector."):
            if name.startswith(pfx):
                sd[name[len(pfx):]] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no vision_tower tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "internvl")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", size)
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", int(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count",
             int(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("layer_norm_eps", 1e-6)))
    w.add_kv("clip.vision.projector.scale_factor", m)
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    put("v.patch_embd.weight",
        sd["embeddings.patch_embeddings.projection.weight"].reshape(
            n_embd, -1))
    put_if("v.patch_embd.bias", "embeddings.patch_embeddings.projection.bias")
    put("v.class_embd", sd["embeddings.cls_token"].reshape(-1))
    put("v.position_embd.weight",
        sd["embeddings.position_embeddings"].reshape(-1, n_embd))
    for i in range(n_layer):
        hp_, gp = f"encoder.layer.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "layernorm_before.weight"])
        put_if(gp + "ln1.bias", hp_ + "layernorm_before.bias")
        for hf_nm, gg_nm in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                             ("v_proj", "attn_v")):
            put(gp + gg_nm + ".weight",
                sd[hp_ + f"attention.{hf_nm}.weight"])
            put_if(gp + gg_nm + ".bias", hp_ + f"attention.{hf_nm}.bias")
        put_if(gp + "attn_q_norm.weight", hp_ + "attention.q_norm.weight")
        put_if(gp + "attn_k_norm.weight", hp_ + "attention.k_norm.weight")
        put(gp + "attn_out.weight",
            sd[hp_ + "attention.projection_layer.weight"])
        put_if(gp + "attn_out.bias", hp_ + "attention.projection_layer.bias")
        put_if(gp + "ls1.weight", hp_ + "lambda_1")
        put(gp + "ln2.weight", sd[hp_ + "layernorm_after.weight"])
        put_if(gp + "ln2.bias", hp_ + "layernorm_after.bias")
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc1.weight"])
        put_if(gp + "ffn_up.bias", hp_ + "mlp.fc1.bias")
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc2.weight"])
        put_if(gp + "ffn_down.bias", hp_ + "mlp.fc2.bias")
        put_if(gp + "ls2.weight", hp_ + "lambda_2")
    put("mm.model.mlp.0.weight", sd["layer_norm.weight"])
    put("mm.model.mlp.0.bias", sd["layer_norm.bias"])
    put("mm.model.mlp.1.weight", sd["linear_1.weight"])
    put_if("mm.model.mlp.1.bias", "linear_1.bias")
    put("mm.model.mlp.3.weight", sd["linear_2.weight"])
    put_if("mm.model.mlp.3.bias", "linear_2.bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_llava_mmproj(src_dir: str, dst: str, cfg: dict,
                          verbose: bool) -> dict:
    """LLaVA CLIP ViT + 2-layer MLP projector → mmproj GGUF. The tower is
    truncated at vision_feature_layer (default −2: drop the last block —
    HF reads hidden_states[vfl], never the post layernorm), and
    clip.use_gelu records the activation (CLIP ViTs use quick_gelu)."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    depth = int(vc["num_hidden_layers"])
    vfl = int(cfg.get("vision_feature_layer", -2))
    n_keep = depth + vfl + 1 if vfl < 0 else vfl
    if not 0 < n_keep <= depth:
        raise ValueError(f"vision_feature_layer {vfl} out of range")

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.vision_tower.vision_model.",
                    "vision_tower.vision_model.",
                    "model.multi_modal_projector.",
                    "multi_modal_projector."):
            if name.startswith(pfx):
                sd[name[len(pfx):]] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no vision_tower tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "mlp")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.use_gelu",
             vc.get("hidden_act", "quick_gelu") != "quick_gelu")
    w.add_kv("clip.vision.image_size", int(vc.get("image_size", 336)))
    w.add_kv("clip.vision.patch_size", int(vc.get("patch_size", 14)))
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", int(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", n_keep)
    w.add_kv("clip.vision.attention.head_count",
             int(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("layer_norm_eps", 1e-5)))
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    put("v.patch_embd.weight",
        sd["embeddings.patch_embedding.weight"].reshape(n_embd, -1))
    put_if("v.patch_embd.bias", "embeddings.patch_embedding.bias")
    put("v.class_embd", sd["embeddings.class_embedding"].reshape(-1))
    put("v.position_embd.weight", sd["embeddings.position_embedding.weight"])
    put_if("v.pre_ln.weight", "pre_layrnorm.weight")
    put_if("v.pre_ln.bias", "pre_layrnorm.bias")
    for i in range(n_keep):
        hp_, gp = f"encoder.layers.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "layer_norm1.weight"])
        put(gp + "ln1.bias", sd[hp_ + "layer_norm1.bias"])
        for hf_nm, gg_nm in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                             ("v_proj", "attn_v"), ("out_proj", "attn_out")):
            put(gp + gg_nm + ".weight", sd[hp_ + f"self_attn.{hf_nm}.weight"])
            put_if(gp + gg_nm + ".bias", hp_ + f"self_attn.{hf_nm}.bias")
        put(gp + "ln2.weight", sd[hp_ + "layer_norm2.weight"])
        put(gp + "ln2.bias", sd[hp_ + "layer_norm2.bias"])
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc1.weight"])
        put_if(gp + "ffn_up.bias", hp_ + "mlp.fc1.bias")
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc2.weight"])
        put_if(gp + "ffn_down.bias", hp_ + "mlp.fc2.bias")
    put("mm.0.weight", sd["linear_1.weight"])
    put_if("mm.0.bias", "linear_1.bias")
    put("mm.2.weight", sd["linear_2.weight"])
    put_if("mm.2.bias", "linear_2.bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_whisper_audio_mmproj(src_dir: str, dst: str, cfg: dict,
                                  model_type: str,
                                  verbose: bool = True) -> dict:
    """Whisper-encoder audio towers → mmproj GGUF: qwen2_audio (fc
    projector) and voxtral (frame stacking + 2-layer GELU-erf MLP); both
    stride-2 avg pool before the post-LN (clip.cpp audio_has_avgpool)."""
    from ..gguf.writer import GGUFWriter

    ac = cfg["audio_config"]
    # whisper configs serialize either classic (d_model/encoder_*) or
    # canonical (hidden_size/num_*) attribute names
    n_embd = int(ac.get("d_model") or ac["hidden_size"])
    n_layer = int(ac.get("encoder_layers") or ac["num_hidden_layers"])
    n_ff = int(ac.get("encoder_ffn_dim") or ac["intermediate_size"])
    n_head = int(ac.get("encoder_attention_heads")
                 or ac["num_attention_heads"])
    voxtral = model_type == "voxtral"

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.audio_tower.", "audio_tower.",
                    "model.multi_modal_projector.", "multi_modal_projector."):
            if name.startswith(pfx):
                sd[name[len(pfx):]] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no audio_tower tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "voxtral" if voxtral else "qwen2a")
    w.add_kv("clip.has_audio_encoder", True)
    if voxtral:  # stacked frames per projector input row
        w.add_kv("clip.audio.projector.stack_factor",
                 int(ac["intermediate_size"]) // n_embd)
    w.add_kv("clip.audio.num_mel_bins", int(ac.get("num_mel_bins", 128)))
    w.add_kv("clip.audio.embedding_length", n_embd)
    w.add_kv("clip.audio.feed_forward_length", n_ff)
    w.add_kv("clip.audio.block_count", n_layer)
    w.add_kv("clip.audio.attention.head_count", n_head)
    w.add_kv("clip.audio.attention.layer_norm_epsilon", 1e-5)
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    put("a.conv1d.1.weight", sd["conv1.weight"])
    put("a.conv1d.1.bias", sd["conv1.bias"])
    put("a.conv1d.2.weight", sd["conv2.weight"])
    put("a.conv1d.2.bias", sd["conv2.bias"])
    put("a.position_embd.weight", sd["embed_positions.weight"])
    for i in range(n_layer):
        hp_, gp = f"layers.{i}.", f"a.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "self_attn_layer_norm.weight"])
        put(gp + "ln1.bias", sd[hp_ + "self_attn_layer_norm.bias"])
        put(gp + "attn_q.weight", sd[hp_ + "self_attn.q_proj.weight"])
        put(gp + "attn_q.bias", sd[hp_ + "self_attn.q_proj.bias"])
        put(gp + "attn_k.weight", sd[hp_ + "self_attn.k_proj.weight"])
        put(gp + "attn_v.weight", sd[hp_ + "self_attn.v_proj.weight"])
        put(gp + "attn_v.bias", sd[hp_ + "self_attn.v_proj.bias"])
        put(gp + "attn_out.weight", sd[hp_ + "self_attn.out_proj.weight"])
        put(gp + "attn_out.bias", sd[hp_ + "self_attn.out_proj.bias"])
        put(gp + "ln2.weight", sd[hp_ + "final_layer_norm.weight"])
        put(gp + "ln2.bias", sd[hp_ + "final_layer_norm.bias"])
        put(gp + "ffn_up.weight", sd[hp_ + "fc1.weight"])
        put(gp + "ffn_up.bias", sd[hp_ + "fc1.bias"])
        put(gp + "ffn_down.weight", sd[hp_ + "fc2.weight"])
        put(gp + "ffn_down.bias", sd[hp_ + "fc2.bias"])
    put("a.post_ln.weight", sd["layer_norm.weight"])
    put("a.post_ln.bias", sd["layer_norm.bias"])
    if voxtral:
        put("mm.a.mlp.1.weight", sd["linear_1.weight"])
        put("mm.a.mlp.2.weight", sd["linear_2.weight"])
    else:
        put("mm.a.fc.weight", sd["linear.weight"])
        put_if("mm.a.fc.bias", "linear.bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_idefics3_mmproj(src_dir: str, dst: str, cfg: dict,
                             verbose: bool) -> dict:
    """SmolVLM/Idefics3 SigLIP tower + pixel-shuffle fc projector →
    mmproj GGUF (≡ clip.cpp PROJECTOR_TYPE_IDEFICS3)."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc["num_hidden_layers"])

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.vision_model.", "vision_model.",
                    "model.connector.", "connector."):
            if name.startswith(pfx):
                sd[name[len(pfx):]] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no vision_model tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "idefics3")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", int(vc.get("image_size", 512)))
    w.add_kv("clip.vision.patch_size", int(vc.get("patch_size", 16)))
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", int(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count",
             int(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("layer_norm_eps", 1e-6)))
    w.add_kv("clip.vision.projector.scale_factor",
             int(cfg.get("scale_factor", 2)))
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    put("v.patch_embd.weight",
        sd["embeddings.patch_embedding.weight"].reshape(n_embd, -1))
    put_if("v.patch_embd.bias", "embeddings.patch_embedding.bias")
    put("v.position_embd.weight", sd["embeddings.position_embedding.weight"])
    for i in range(n_layer):
        hp_, gp = f"encoder.layers.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "layer_norm1.weight"])
        put(gp + "ln1.bias", sd[hp_ + "layer_norm1.bias"])
        for hf_nm, gg_nm in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                             ("v_proj", "attn_v"), ("out_proj", "attn_out")):
            put(gp + gg_nm + ".weight", sd[hp_ + f"self_attn.{hf_nm}.weight"])
            put_if(gp + gg_nm + ".bias", hp_ + f"self_attn.{hf_nm}.bias")
        put(gp + "ln2.weight", sd[hp_ + "layer_norm2.weight"])
        put(gp + "ln2.bias", sd[hp_ + "layer_norm2.bias"])
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc1.weight"])
        put_if(gp + "ffn_up.bias", hp_ + "mlp.fc1.bias")
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc2.weight"])
        put_if(gp + "ffn_down.bias", hp_ + "mlp.fc2.bias")
    put("v.post_ln.weight", sd["post_layernorm.weight"])
    put("v.post_ln.bias", sd["post_layernorm.bias"])
    put("mm.model.fc.weight", sd["modality_projection.proj.weight"])
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_janus_mmproj(src_dir: str, dst: str, cfg: dict,
                          verbose: bool) -> dict:
    """Janus-Pro SigLIP tower + 2-layer MLP aligner → mmproj GGUF
    (≡ clip.cpp PROJECTOR_TYPE_JANUS_PRO: aligner.fc1 → mm.0,
    aligner.hidden_layers.N → mm.N+1; convert_hf_to_gguf.py
    JanusProVisionModel)."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc["num_hidden_layers"])
    n_ff = int(vc.get("intermediate_size") or
               round(float(vc.get("mlp_ratio", 4)) * n_embd))

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.vision_model.", "vision_model.",
                    "model.aligner.", "aligner."):
            if name.startswith(pfx):
                key = name[len(pfx):]
                if pfx.endswith("aligner."):
                    key = "aligner." + key
                sd[key] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no vision_model tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "janus_pro")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", int(vc.get("image_size", 384)))
    w.add_kv("clip.vision.patch_size", int(vc.get("patch_size", 16)))
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", n_ff)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count",
             int(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("layer_norm_eps", 1e-6)))
    act = str(vc.get("hidden_act", "")).lower()
    if act == "gelu":
        w.add_kv("clip.use_gelu", True)
    elif act == "silu":
        w.add_kv("clip.use_silu", True)
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    put("v.patch_embd.weight",
        sd["embeddings.patch_embedding.weight"].reshape(n_embd, -1))
    put_if("v.patch_embd.bias", "embeddings.patch_embedding.bias")
    put("v.position_embd.weight", sd["embeddings.position_embedding.weight"])
    for i in range(n_layer):
        hp_, gp = f"encoder.layers.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "layer_norm1.weight"])
        put(gp + "ln1.bias", sd[hp_ + "layer_norm1.bias"])
        # the output projection is named projection_layer in HF Janus
        for hf_nm, gg_nm in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                             ("v_proj", "attn_v"),
                             ("projection_layer", "attn_out")):
            put(gp + gg_nm + ".weight", sd[hp_ + f"self_attn.{hf_nm}.weight"])
            put_if(gp + gg_nm + ".bias", hp_ + f"self_attn.{hf_nm}.bias")
        put(gp + "ln2.weight", sd[hp_ + "layer_norm2.weight"])
        put(gp + "ln2.bias", sd[hp_ + "layer_norm2.bias"])
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc1.weight"])
        put_if(gp + "ffn_up.bias", hp_ + "mlp.fc1.bias")
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc2.weight"])
        put_if(gp + "ffn_down.bias", hp_ + "mlp.fc2.bias")
    put("v.post_ln.weight", sd["post_layernorm.weight"])
    put("v.post_ln.bias", sd["post_layernorm.bias"])
    put("mm.0.weight", sd["aligner.fc1.weight"])
    put_if("mm.0.bias", "aligner.fc1.bias")
    for key in sorted(k for k in sd if k.startswith("aligner.hidden_layers.")
                      and k.endswith(".weight")):
        idx = int(key.split(".")[2])
        put(f"mm.{idx + 1}.weight", sd[key])
        put_if(f"mm.{idx + 1}.bias", key[:-len("weight")] + "bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_lfm2_mmproj(src_dir: str, dst: str, cfg: dict,
                         verbose: bool) -> dict:
    """LFM2-VL SigLIP2-NaFlex tower + pixel-unshuffle MLP projector →
    mmproj GGUF (≡ clip.cpp PROJECTOR_TYPE_LFM2: multi_modal_projector
    layer_norm → mm.input_norm, linear_1/2 → mm.1/mm.2; the unused
    attention-pooling head is skipped)."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    # vision_feature_layer == -K drops the last K-1 encoder blocks
    # (≡ convert_hf_to_gguf.py LFM2VLModel.set_gguf_parameters)
    drop = -(int(cfg.get("vision_feature_layer", -1)) + 1)
    n_layer = int(vc["num_hidden_layers"]) - drop
    patch = int(vc.get("patch_size", 16))
    # NaFlex: the learned position grid is sqrt(num_patches) per side
    nps = int(round(float(vc.get("num_patches", 256)) ** 0.5))

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.vision_tower.vision_model.",
                    "vision_tower.vision_model.",
                    "model.multi_modal_projector.",
                    "multi_modal_projector."):
            if name.startswith(pfx):
                key = name[len(pfx):]
                if pfx.endswith("multi_modal_projector."):
                    key = "proj." + key
                if key.startswith("head."):
                    break  # attention-pooling head unused by LFM2-VL
                sd[key] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no vision_tower tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "lfm2")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", nps * patch)
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", int(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count",
             int(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("layer_norm_eps", 1e-6)))
    w.add_kv("clip.vision.projector.scale_factor",
             int(cfg.get("downsample_factor", 2)))
    act = str(vc.get("hidden_act", "")).lower()
    if act == "gelu":
        w.add_kv("clip.use_gelu", True)
    elif act == "silu":
        w.add_kv("clip.use_silu", True)
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    # SigLIP2's patch embedding is a Linear over HWC-flattened (P, P, 3)
    # patches; repack its columns to the conv/CHW layout the runtime
    # patchify uses (≡ LFM2VLModel.modify_tensors view+permute)
    pe = sd["embeddings.patch_embedding.weight"]
    pe = pe.reshape(n_embd, patch, patch, 3).transpose(0, 3, 1, 2)
    put("v.patch_embd.weight", pe.reshape(n_embd, -1))
    put_if("v.patch_embd.bias", "embeddings.patch_embedding.bias")
    put("v.position_embd.weight", sd["embeddings.position_embedding.weight"])
    for i in range(n_layer):
        hp_, gp = f"encoder.layers.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "layer_norm1.weight"])
        put(gp + "ln1.bias", sd[hp_ + "layer_norm1.bias"])
        for hf_nm, gg_nm in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                             ("v_proj", "attn_v"), ("out_proj", "attn_out")):
            put(gp + gg_nm + ".weight", sd[hp_ + f"self_attn.{hf_nm}.weight"])
            put_if(gp + gg_nm + ".bias", hp_ + f"self_attn.{hf_nm}.bias")
        put(gp + "ln2.weight", sd[hp_ + "layer_norm2.weight"])
        put(gp + "ln2.bias", sd[hp_ + "layer_norm2.bias"])
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc1.weight"])
        put_if(gp + "ffn_up.bias", hp_ + "mlp.fc1.bias")
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc2.weight"])
        put_if(gp + "ffn_down.bias", hp_ + "mlp.fc2.bias")
    put("v.post_ln.weight", sd["post_layernorm.weight"])
    put("v.post_ln.bias", sd["post_layernorm.bias"])
    put("mm.input_norm.weight", sd["proj.layer_norm.weight"])
    put_if("mm.input_norm.bias", "proj.layer_norm.bias")
    put("mm.1.weight", sd["proj.linear_1.weight"])
    put_if("mm.1.bias", "proj.linear_1.bias")
    put("mm.2.weight", sd["proj.linear_2.weight"])
    put_if("mm.2.bias", "proj.linear_2.bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_kimivl_mmproj(src_dir: str, dst: str, cfg: dict,
                           verbose: bool) -> dict:
    """Kimi-VL MoonViT tower → mmproj GGUF (≡ clip.cpp PROJECTOR_TYPE_KIMIVL /
    convert_hf_to_gguf.py KimiVLModel): fused wqkv split into q/k/v,
    (H, W, C) learned pos_emb flattened, encoder.final_layernorm →
    v.post_ln, projector pre_norm/linear_1/linear_2 → mm.input_norm/mm.1/
    mm.2."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc.get("num_hidden_layers", vc.get("depth", 27)))
    patch = int(vc.get("patch_size", 14))
    merge = (vc.get("merge_kernel_size") or [2, 2])[0]

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("vision_tower.", "multi_modal_projector."):
            if name.startswith(pfx):
                key = name[len(pfx):]
                if pfx == "multi_modal_projector.":
                    key = "proj." + key
                sd[key] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no vision_tower tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "kimivl")
    w.add_kv("clip.has_vision_encoder", True)
    # image_size is nominal for KIMIVL (dynamic resolution); the reference
    # converter writes 64·14 "for compatibility"
    w.add_kv("clip.vision.image_size", 64 * patch)
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length",
             int(vc.get("intermediate_size", 4 * n_embd)))
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count",
             int(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("layer_norm_eps", 1e-5)))
    w.add_kv("clip.vision.projector.scale_factor", int(merge))
    w.add_kv("clip.use_gelu", True)
    if "image_mean" in cfg:
        w.add_kv("clip.vision.image_mean", list(cfg["image_mean"]))
        w.add_kv("clip.vision.image_std", list(cfg["image_std"]))
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    pe = sd["patch_embed.proj.weight"]  # conv (E, 3, P, P)
    put("v.patch_embd.weight", pe.reshape(n_embd, -1))
    put_if("v.patch_embd.bias", "patch_embed.proj.bias")
    pos = sd["patch_embed.pos_emb"]  # (H, W, C) → (H·W, C)
    put("v.position_embd.weight", pos.reshape(-1, pos.shape[-1]))
    for i in range(n_layer):
        hp_, gp = f"encoder.blocks.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "norm0.weight"])
        put_if(gp + "ln1.bias", hp_ + "norm0.bias")
        # fused wqkv (3E, E) → q/k/v (reference KimiVLModel chunk(3, dim=0))
        wq, wk, wv = np.split(sd[hp_ + "wqkv.weight"], 3, axis=0)
        put(gp + "attn_q.weight", wq)
        put(gp + "attn_k.weight", wk)
        put(gp + "attn_v.weight", wv)
        if hp_ + "wqkv.bias" in sd:
            bq, bk, bv = np.split(sd[hp_ + "wqkv.bias"], 3, axis=0)
            put(gp + "attn_q.bias", bq)
            put(gp + "attn_k.bias", bk)
            put(gp + "attn_v.bias", bv)
        put(gp + "attn_out.weight", sd[hp_ + "wo.weight"])
        put_if(gp + "attn_out.bias", hp_ + "wo.bias")
        put(gp + "ln2.weight", sd[hp_ + "norm1.weight"])
        put_if(gp + "ln2.bias", hp_ + "norm1.bias")
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc0.weight"])
        put_if(gp + "ffn_up.bias", hp_ + "mlp.fc0.bias")
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc1.weight"])
        put_if(gp + "ffn_down.bias", hp_ + "mlp.fc1.bias")
    put("v.post_ln.weight", sd["encoder.final_layernorm.weight"])
    put_if("v.post_ln.bias", "encoder.final_layernorm.bias")
    put("mm.input_norm.weight", sd["proj.pre_norm.weight"])
    put_if("mm.input_norm.bias", "proj.pre_norm.bias")
    put("mm.1.weight", sd["proj.linear_1.weight"])
    put_if("mm.1.bias", "proj.linear_1.bias")
    put("mm.2.weight", sd["proj.linear_2.weight"])
    put_if("mm.2.bias", "proj.linear_2.bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_youtuvl_mmproj(src_dir: str, dst: str, cfg: dict,
                            verbose: bool) -> dict:
    """Youtu-VL SigLIP2 tower + VLPatchMerger → mmproj GGUF
    (≡ clip.cpp PROJECTOR_TYPE_YOUTUVL / convert_hf_to_gguf.py
    YoutuVLVisionModel): explicit full-attention layer indexes
    (clip.vision.wa_layer_indexes), merger.ln_q → mm.input_norm (RMS),
    merger.mlp.{0,2} → mm.{0,2}. The NaFlex linear patch embedding is
    repacked from HWC columns to the conv/CHW layout the runtime patchify
    produces (same treatment as the LFM2 exporter)."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc.get("num_hidden_layers", vc.get("depth", 27)))
    patch = int(vc.get("patch_size", 16))

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.siglip2.vision_model.", "siglip2.vision_model.",
                    "model.merger.", "merger."):
            if name.startswith(pfx):
                key = name[len(pfx):]
                if pfx.endswith("merger."):
                    key = "merger." + key
                sd[key] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no siglip2 vision tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "youtuvl")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", int(vc.get("image_size", 560)))
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length",
             int(vc.get("intermediate_size", 4 * n_embd)))
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count",
             int(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(cfg.get("layer_norm_eps", vc.get("layer_norm_eps", 1e-6))))
    w.add_kv("clip.vision.spatial_merge_size",
             int(vc.get("spatial_merge_size", 2)))
    if vc.get("window_size") is not None:
        w.add_kv("clip.vision.window_size", int(vc["window_size"]))
    idx = vc.get("fullatt_block_indexes")
    if idx is None:
        raise ValueError("fullatt_block_indexes is required for youtuvl")
    w.add_kv("clip.vision.wa_layer_indexes",
             np.asarray(sorted(int(i) for i in idx), np.int32))
    act = str(vc.get("hidden_act", "gelu_pytorch_tanh")).lower()
    if act.startswith("gelu"):
        w.add_kv("clip.use_gelu", True)
    elif act == "silu":
        w.add_kv("clip.use_silu", True)
    else:
        raise ValueError(f"unsupported youtuvl activation {act!r}")
    if "image_mean" in cfg:
        w.add_kv("clip.vision.image_mean", list(cfg["image_mean"]))
        w.add_kv("clip.vision.image_std", list(cfg["image_std"]))
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    pe = sd["embeddings.patch_embedding.weight"]
    pe = pe.reshape(n_embd, patch, patch, 3).transpose(0, 3, 1, 2)
    put("v.patch_embd.weight", pe.reshape(n_embd, -1))
    put_if("v.patch_embd.bias", "embeddings.patch_embedding.bias")
    for i in range(n_layer):
        hp_, gp = f"encoder.layers.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "layer_norm1.weight"])
        put(gp + "ln1.bias", sd[hp_ + "layer_norm1.bias"])
        for hf_nm, gg_nm in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                             ("v_proj", "attn_v"), ("out_proj", "attn_out")):
            put(gp + gg_nm + ".weight", sd[hp_ + f"self_attn.{hf_nm}.weight"])
            put_if(gp + gg_nm + ".bias", hp_ + f"self_attn.{hf_nm}.bias")
        put(gp + "ln2.weight", sd[hp_ + "layer_norm2.weight"])
        put(gp + "ln2.bias", sd[hp_ + "layer_norm2.bias"])
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc1.weight"])
        put_if(gp + "ffn_up.bias", hp_ + "mlp.fc1.bias")
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc2.weight"])
        put_if(gp + "ffn_down.bias", hp_ + "mlp.fc2.bias")
    put("v.post_ln.weight", sd["post_layernorm.weight"])
    put_if("v.post_ln.bias", "post_layernorm.bias")
    put("mm.input_norm.weight", sd["merger.ln_q.weight"])
    put("mm.0.weight", sd["merger.mlp.0.weight"])
    put_if("mm.0.bias", "merger.mlp.0.bias")
    put("mm.2.weight", sd["merger.mlp.2.weight"])
    put_if("mm.2.bias", "merger.mlp.2.bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


# MobileNetV5 block-tensor suffixes pass through unchanged
# (≡ Gemma3nVisionAudioModel.block_tensor_mapping, convert_hf_to_gguf.py:6267)
_GEMMA3N_BLK_SUFFIXES = frozenset({
    "conv_exp.weight", "bn1.weight", "conv_pwl.weight", "bn2.weight",
    "dw_start.conv.weight", "dw_start.bn.weight",
    "dw_mid.conv.weight", "dw_mid.bn.weight",
    "pw_exp.conv.weight", "pw_exp.bn.weight",
    "pw_proj.conv.weight", "pw_proj.bn.weight",
    "layer_scale.gamma", "norm.weight",
    "attn.query.proj.weight", "attn.key.proj.weight",
    "attn.value.proj.weight", "attn.output.proj.weight",
    "attn.key.down_conv.weight", "attn.key.norm.weight",
    "attn.value.down_conv.weight", "attn.value.norm.weight",
})


def _convert_gemma3n_mmproj(src_dir: str, dst: str, cfg: dict,
                            verbose: bool) -> dict:
    """Gemma3n MobileNetV5 vision tower → mmproj GGUF
    (≡ convert_hf_to_gguf.py Gemma3nVisionAudioModel, vision half;
    PROJECTOR_TYPE_GEMMA3NV in clip.cpp). Double-indexed timm block names
    map v.blk.{stage}.{idx}.<suffix> with identity suffixes; conv_stem
    bias and layer_scale gammas are stored [1,C,1,1] like the reference;
    the embedder rides model.embed_vision.* → mm.*."""
    from ..gguf.writer import GGUFWriter

    vc = cfg.get("vision_config") or {}
    # preprocessor_config.json carries the 768×768 size + 256-token length
    pp = {}
    pp_path = os.path.join(src_dir, "preprocessor_config.json")
    if os.path.exists(pp_path):
        pp = json.load(open(pp_path))
    image_size = int((pp.get("size") or {}).get("height", 768))
    seq_len = int(pp.get("image_seq_length", 256))
    n_embd = int(vc.get("hidden_size", 2048))

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "gemma3nv")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", image_size)
    # patch_size is a bookkeeping value: image_size/seq_len, so the runtime
    # n_patches = image_size/patch_size recovers the 256-token grid
    w.add_kv("clip.vision.patch_size", max(1, image_size // seq_len))
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.block_count", 0)  # no uniform layer structure
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(cfg.get("layer_norm_eps", 1e-6)))
    # MobileNetV5 takes raw 0..1 pixels (reference zeroes mean/unit std)
    w.add_kv("clip.vision.image_mean", [0.0, 0.0, 0.0])
    w.add_kv("clip.vision.image_std", [1.0, 1.0, 1.0])
    w.add_kv("clip.use_gelu", True)
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(np.asarray(a, np.float32)))
        n_tensors += 1

    unsqueeze = ("v.conv_stem.conv.bias",)
    flat_map = {
        "model.vision_tower.timm_model.conv_stem.conv.weight":
            "v.conv_stem.conv.weight",
        "model.vision_tower.timm_model.conv_stem.conv.bias":
            "v.conv_stem.conv.bias",
        "model.vision_tower.timm_model.conv_stem.bn.weight":
            "v.conv_stem.bn.weight",
        "model.vision_tower.timm_model.msfa.ffn.pw_exp.conv.weight":
            "v.msfa.ffn.pw_exp.conv.weight",
        "model.vision_tower.timm_model.msfa.ffn.pw_exp.bn.weight":
            "v.msfa.ffn.pw_exp.bn.weight",
        "model.vision_tower.timm_model.msfa.ffn.pw_proj.conv.weight":
            "v.msfa.ffn.pw_proj.conv.weight",
        "model.vision_tower.timm_model.msfa.ffn.pw_proj.bn.weight":
            "v.msfa.ffn.pw_proj.bn.weight",
        "model.vision_tower.timm_model.msfa.norm.weight":
            "v.msfa.norm.weight",
        "model.embed_vision.embedding_projection.weight":
            "mm.input_projection.weight",
        "model.embed_vision.soft_embedding_norm.weight":
            "mm.soft_emb_norm.weight",
        "model.embed_vision.embedding.weight": "mm.embedding.weight",
        "model.embed_vision.hard_embedding_norm.weight":
            "mm.hard_emb_norm.weight",
    }
    blk_pfx = "model.vision_tower.timm_model.blocks."
    for name, arr in _load_tensors(src_dir):
        if name in flat_map:
            gname = flat_map[name]
            a = np.asarray(arr, np.float32)
            if gname in unsqueeze:
                a = a.reshape(1, -1, 1, 1)
            put(gname, a)
        elif name.startswith(blk_pfx):
            rest = name[len(blk_pfx):]
            stage, idx, suffix = rest.split(".", 2)
            if suffix not in _GEMMA3N_BLK_SUFFIXES:
                raise ValueError(f"unknown MobileNetV5 block tensor {name}")
            a = np.asarray(arr, np.float32)
            if suffix == "layer_scale.gamma":
                a = a.reshape(1, -1, 1, 1)
            put(f"v.blk.{stage}.{idx}.{suffix}", a)
        # audio tower + text stack tensors are not part of the vision mmproj
    if n_tensors == 0:
        raise ValueError(f"no vision_tower tensors found under {src_dir}")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_glm4v_mmproj(src_dir: str, dst: str, cfg: dict,
                          verbose: bool) -> dict:
    """GLM-4V vision tower → mmproj GGUF (≡ clip.cpp PROJECTOR_TYPE_GLM4V /
    convert_hf_to_gguf.py Glm4VVisionModel): conv3d patch embed split into
    temporal slices, fused qkv split into q/k/v, downsample conv →
    mm.patch_merger, merger MLP → mm.model.fc + mm.post_norm +
    mm.gate/up/down."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc["depth"])
    patch = int(vc.get("patch_size", 14))

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.visual.", "visual."):
            if name.startswith(pfx):
                sd[name[len(pfx):]] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no visual tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "glm4v")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", int(vc.get("image_size", 336)))
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length",
             int(vc.get("intermediate_size", 4 * n_embd)))
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", int(vc["num_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("rms_norm_eps", 1e-5)))
    w.add_kv("clip.vision.spatial_merge_size",
             int(vc.get("spatial_merge_size", 2)))
    act = str(vc.get("hidden_act", "")).lower()
    if act == "gelu":
        w.add_kv("clip.use_gelu", True)
    elif act == "silu":
        w.add_kv("clip.use_silu", True)
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    # conv3d [C, 3, T, P, P]: one gguf tensor per temporal slice
    pe = sd["patch_embed.proj.weight"]
    put("v.patch_embd.weight", pe[:, :, 0].reshape(n_embd, -1))
    if pe.shape[2] > 1:
        put("v.patch_embd.weight.1", pe[:, :, 1].reshape(n_embd, -1))
    put_if("v.patch_embd.bias", "patch_embed.proj.bias")
    put("v.norm_embd.weight", sd["post_conv_layernorm.weight"])
    put("v.position_embd.weight", sd["embeddings.position_embedding.weight"])
    for i in range(n_layer):
        hp_, gp = f"blocks.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "norm1.weight"])
        put(gp + "ln2.weight", sd[hp_ + "norm2.weight"])
        qkv = sd[hp_ + "attn.qkv.weight"]
        for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            put(gp + nm + ".weight", qkv[j * n_embd:(j + 1) * n_embd])
        if hp_ + "attn.qkv.bias" in sd:
            qb = sd[hp_ + "attn.qkv.bias"]
            for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                put(gp + nm + ".bias", qb[j * n_embd:(j + 1) * n_embd])
        put(gp + "attn_out.weight", sd[hp_ + "attn.proj.weight"])
        put(gp + "ffn_gate.weight", sd[hp_ + "mlp.gate_proj.weight"])
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.up_proj.weight"])
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.down_proj.weight"])
    put("v.post_ln.weight", sd["post_layernorm.weight"])
    put("mm.patch_merger.weight", sd["downsample.weight"])
    put_if("mm.patch_merger.bias", "downsample.bias")
    put("mm.model.fc.weight", sd["merger.proj.weight"])
    put("mm.post_norm.weight", sd["merger.post_projection_norm.weight"])
    put_if("mm.post_norm.bias", "merger.post_projection_norm.bias")
    put("mm.gate.weight", sd["merger.gate_proj.weight"])
    put_if("mm.gate.bias", "merger.gate_proj.bias")
    put("mm.up.weight", sd["merger.up_proj.weight"])
    put_if("mm.up.bias", "merger.up_proj.bias")
    put("mm.down.weight", sd["merger.down_proj.weight"])
    put_if("mm.down.bias", "merger.down_proj.bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_llama4_mmproj(src_dir: str, dst: str, cfg: dict,
                           verbose: bool) -> dict:
    """Llama-4 vision tower → mmproj GGUF (≡ clip.cpp PROJECTOR_TYPE_LLAMA4 /
    convert_hf_to_gguf.py Llama4VisionModel): unfold-conv patch linear,
    trailing CLS, adapter MLP → mm.model.mlp.1/2, multi_modal_projector
    linear_1 → mm.model.fc."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc["num_hidden_layers"])

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.vision_model.", "vision_model.",
                    "model.multi_modal_projector.", "multi_modal_projector."):
            if name.startswith(pfx):
                key = name[len(pfx):]
                if pfx.endswith("multi_modal_projector."):
                    key = "proj." + key
                sd[key] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no vision_model tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "llama4")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", int(vc.get("image_size", 336)))
    w.add_kv("clip.vision.patch_size", int(vc.get("patch_size", 14)))
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length",
             int(vc.get("intermediate_size", 4 * n_embd)))
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count",
             int(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(vc.get("norm_eps", 1e-5)))
    w.add_kv("clip.vision.projector.scale_factor",
             int(round(1.0 / float(vc.get("pixel_shuffle_ratio", 0.5)))))
    w.add_kv("clip.use_gelu", True)
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    # unfold-conv = Linear over CHW-flattened patches — layout matches
    put("v.patch_embd.weight", sd["patch_embedding.linear.weight"])
    put_if("v.patch_embd.bias", "patch_embedding.linear.bias")
    put("v.class_embd", sd["class_embedding"])
    put("v.position_embd.weight", sd["positional_embedding_vlm"])
    put("v.pre_ln.weight", sd["layernorm_pre.weight"])
    put_if("v.pre_ln.bias", "layernorm_pre.bias")
    for i in range(n_layer):
        hp_, gp = f"model.layers.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "input_layernorm.weight"])
        put_if(gp + "ln1.bias", hp_ + "input_layernorm.bias")
        for hf_nm, gg_nm in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                             ("v_proj", "attn_v"), ("o_proj", "attn_out")):
            put(gp + gg_nm + ".weight", sd[hp_ + f"self_attn.{hf_nm}.weight"])
            put_if(gp + gg_nm + ".bias", hp_ + f"self_attn.{hf_nm}.bias")
        put(gp + "ln2.weight", sd[hp_ + "post_attention_layernorm.weight"])
        put_if(gp + "ln2.bias", hp_ + "post_attention_layernorm.bias")
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.fc1.weight"])
        put_if(gp + "ffn_up.bias", hp_ + "mlp.fc1.bias")
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.fc2.weight"])
        put_if(gp + "ffn_down.bias", hp_ + "mlp.fc2.bias")
    put("v.post_ln.weight", sd["layernorm_post.weight"])
    put_if("v.post_ln.bias", "layernorm_post.bias")
    put("mm.model.mlp.1.weight", sd["vision_adapter.mlp.fc1.weight"])
    put("mm.model.mlp.2.weight", sd["vision_adapter.mlp.fc2.weight"])
    put("mm.model.fc.weight", sd["proj.linear_1.weight"])
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_qwen3vl_mmproj(src_dir: str, dst: str, cfg: dict,
                            verbose: bool) -> dict:
    """Qwen3-VL vision tower → mmproj GGUF (≡ clip.cpp
    PROJECTOR_TYPE_QWEN3VL / convert_hf_to_gguf.py Qwen3VLVisionModel):
    conv3d patch embed split into temporal slices, fused qkv split,
    deepstack mergers at clip.vision.is_deepstack_layers, main merger →
    v.post_ln + mm.0/mm.1."""
    from ..gguf.writer import GGUFWriter

    vc = cfg["vision_config"]
    n_embd = int(vc["hidden_size"])
    n_layer = int(vc["depth"])
    patch = int(vc.get("patch_size", 16))
    ds_idx = [int(i) for i in vc.get("deepstack_visual_indexes", [])]

    sd = {}
    for name, arr in _load_tensors(src_dir):
        for pfx in ("model.visual.", "visual."):
            if name.startswith(pfx):
                sd[name[len(pfx):]] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no visual tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "qwen3vl_merger")
    w.add_kv("clip.has_vision_encoder", True)
    # NaFlex-style: image_size is nominal; the position grid is
    # num_position_embeddings per side
    npos = int(vc.get("num_position_embeddings", 2304))
    nside = int(round(npos ** 0.5))
    w.add_kv("clip.vision.image_size", nside * patch)
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length",
             int(vc.get("intermediate_size", 4 * n_embd)))
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", int(vc["num_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.spatial_merge_size",
             int(vc.get("spatial_merge_size", 2)))
    w.add_kv("clip.vision.is_deepstack_layers",
             [i in ds_idx for i in range(n_layer)])
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    pe = sd["patch_embed.proj.weight"].reshape(n_embd, 3, -1, patch, patch)
    put("v.patch_embd.weight", pe[:, :, 0].reshape(n_embd, -1))
    if pe.shape[2] > 1:
        put("v.patch_embd.weight.1", pe[:, :, 1].reshape(n_embd, -1))
    put_if("v.patch_embd.bias", "patch_embed.proj.bias")
    put("v.position_embd.weight", sd["pos_embed.weight"])
    for i in range(n_layer):
        hp_, gp = f"blocks.{i}.", f"v.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "norm1.weight"])
        put_if(gp + "ln1.bias", hp_ + "norm1.bias")
        put(gp + "ln2.weight", sd[hp_ + "norm2.weight"])
        put_if(gp + "ln2.bias", hp_ + "norm2.bias")
        qkv = sd[hp_ + "attn.qkv.weight"]
        for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            put(gp + nm + ".weight", qkv[j * n_embd:(j + 1) * n_embd])
        if hp_ + "attn.qkv.bias" in sd:
            qb = sd[hp_ + "attn.qkv.bias"]
            for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                put(gp + nm + ".bias", qb[j * n_embd:(j + 1) * n_embd])
        put(gp + "attn_out.weight", sd[hp_ + "attn.proj.weight"])
        put_if(gp + "attn_out.bias", hp_ + "attn.proj.bias")
        put(gp + "ffn_up.weight", sd[hp_ + "mlp.linear_fc1.weight"])
        put_if(gp + "ffn_up.bias", hp_ + "mlp.linear_fc1.bias")
        put(gp + "ffn_down.weight", sd[hp_ + "mlp.linear_fc2.weight"])
        put_if(gp + "ffn_down.bias", hp_ + "mlp.linear_fc2.bias")
    for k, il in enumerate(ds_idx):
        hp_, gp = f"deepstack_merger_list.{k}.", f"v.deepstack.{il}."
        put(gp + "norm.weight", sd[hp_ + "norm.weight"])
        put_if(gp + "norm.bias", hp_ + "norm.bias")
        put(gp + "fc1.weight", sd[hp_ + "linear_fc1.weight"])
        put_if(gp + "fc1.bias", hp_ + "linear_fc1.bias")
        put(gp + "fc2.weight", sd[hp_ + "linear_fc2.weight"])
        put_if(gp + "fc2.bias", hp_ + "linear_fc2.bias")
    put("v.post_ln.weight", sd["merger.norm.weight"])
    put_if("v.post_ln.bias", "merger.norm.bias")
    put("mm.0.weight", sd["merger.linear_fc1.weight"])
    put_if("mm.0.bias", "merger.linear_fc1.bias")
    put("mm.1.weight", sd["merger.linear_fc2.weight"])
    put_if("mm.1.bias", "merger.linear_fc2.bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def _convert_qwen25o_mmproj(src_dir: str, dst: str, cfg: dict,
                            verbose: bool) -> dict:
    """Qwen2.5-Omni thinker towers → ONE dual-modality mmproj GGUF
    (≡ convert_hf_to_gguf.py Qwen25OmniModel / clip.cpp
    PROJECTOR_TYPE_QWEN25O, resolved to QWEN25VL or QWEN2A per modality):
    the 2.5-VL vision tower (separate q/k/v here) plus the windowed whisper
    audio tower with generated sinusoidal positions."""
    from ..gguf.writer import GGUFWriter

    th = cfg.get("thinker_config") or cfg
    vc = th["vision_config"]
    ac = th["audio_config"]
    v_embd = int(vc["hidden_size"])
    v_depth = int(vc["depth"])
    a_embd = int(ac.get("d_model") or ac["hidden_size"])
    a_layer = int(ac.get("encoder_layers") or ac["num_hidden_layers"])

    sd = {}
    for name, arr in _load_tensors(src_dir):
        if name.startswith("thinker."):
            name = name[len("thinker."):]
        for pfx in ("visual.", "audio_tower."):
            if name.startswith(pfx):
                sd[name] = np.asarray(arr, dtype=np.float32)
                break
    if not sd:
        raise ValueError(f"no thinker tower tensors found under {src_dir}")

    w = GGUFWriter(dst, architecture="clip")
    w.add_kv("clip.projector_type", "qwen2.5o")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.has_audio_encoder", True)
    # vision half (≡ the qwen2.5vl mmproj kvs)
    w.add_kv("clip.vision.patch_size", int(vc.get("patch_size", 14)))
    w.add_kv("clip.vision.embedding_length", v_embd)
    w.add_kv("clip.vision.feed_forward_length",
             int(vc.get("intermediate_size", 4 * v_embd)))
    w.add_kv("clip.vision.block_count", v_depth)
    w.add_kv("clip.vision.attention.head_count", int(vc["num_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.spatial_merge_size",
             int(vc.get("spatial_merge_size", 2)))
    idx = sorted(vc.get("fullatt_block_indexes", []))
    pattern = (idx[0] + 1) if idx else 0
    if any((i + 1) % pattern for i in idx):
        raise NotImplementedError(f"irregular fullatt_block_indexes {idx}")
    w.add_kv("clip.vision.n_wa_pattern", pattern)
    w.add_kv("clip.vision.window_size", int(vc.get("window_size", 112)))
    # audio half (≡ the qwen2a mmproj kvs + the omni attention window)
    w.add_kv("clip.audio.num_mel_bins", int(ac.get("num_mel_bins", 128)))
    w.add_kv("clip.audio.embedding_length", a_embd)
    w.add_kv("clip.audio.feed_forward_length",
             int(ac.get("encoder_ffn_dim") or ac["intermediate_size"]))
    w.add_kv("clip.audio.block_count", a_layer)
    w.add_kv("clip.audio.attention.head_count",
             int(ac.get("encoder_attention_heads")
                 or ac["num_attention_heads"]))
    w.add_kv("clip.audio.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.audio.window_size", int(ac.get("n_window", 100)))
    n_tensors = 0

    def put(gname, a):
        nonlocal n_tensors
        w.add_tensor(gname, np.ascontiguousarray(a))
        n_tensors += 1

    def put_if(gname, key):
        if key in sd:
            put(gname, sd[key])

    # ---- vision tensors
    pw = sd["visual.patch_embed.proj.weight"]  # [C, 3, tps, P, P]
    put("v.patch_embd.weight", pw[:, :, 0].reshape(v_embd, -1))
    if pw.shape[2] > 1:
        put("v.patch_embd.weight.1", pw[:, :, 1].reshape(v_embd, -1))
    put_if("v.patch_embd.bias", "visual.patch_embed.proj.bias")
    for i in range(v_depth):
        hp_, gp = f"visual.blocks.{i}.", f"v.blk.{i}."
        # omni splits the attention into separate q/k/v modules
        for hf_nm, gg_nm in (("q", "attn_q"), ("k", "attn_k"),
                             ("v", "attn_v")):
            put(gp + gg_nm + ".weight", sd[hp_ + f"attn.{hf_nm}.weight"])
            put_if(gp + gg_nm + ".bias", hp_ + f"attn.{hf_nm}.bias")
        put(gp + "attn_out.weight", sd[hp_ + "attn.proj.weight"])
        put_if(gp + "attn_out.bias", hp_ + "attn.proj.bias")
        put(gp + "ln1.weight", sd[hp_ + "norm1.weight"])
        put_if(gp + "ln1.bias", hp_ + "norm1.bias")
        put(gp + "ln2.weight", sd[hp_ + "norm2.weight"])
        put_if(gp + "ln2.bias", hp_ + "norm2.bias")
        for g_, h_ in (("ffn_gate", "mlp.gate_proj"), ("ffn_up", "mlp.up_proj"),
                       ("ffn_down", "mlp.down_proj")):
            put(gp + g_ + ".weight", sd[hp_ + h_ + ".weight"])
            put_if(gp + g_ + ".bias", hp_ + h_ + ".bias")
    put("v.post_ln.weight", sd["visual.merger.ln_q.weight"])
    put_if("v.post_ln.bias", "visual.merger.ln_q.bias")
    put("mm.0.weight", sd["visual.merger.mlp.0.weight"])
    put_if("mm.0.bias", "visual.merger.mlp.0.bias")
    put("mm.2.weight", sd["visual.merger.mlp.2.weight"])
    put_if("mm.2.bias", "visual.merger.mlp.2.bias")

    # ---- audio tensors (SinusoidsPositionEmbedding is a buffer the HF
    # checkpoint omits — regenerate it, ≡ Qwen25OmniModel
    # generate_extra_tensors)
    put("a.conv1d.1.weight", sd["audio_tower.conv1.weight"])
    put("a.conv1d.1.bias", sd["audio_tower.conv1.bias"])
    put("a.conv1d.2.weight", sd["audio_tower.conv2.weight"])
    put("a.conv1d.2.bias", sd["audio_tower.conv2.bias"])
    length = int(ac.get("max_source_positions", 1500))
    half = a_embd // 2
    log_inc = np.log(10000.0) / (half - 1)
    inv = np.exp(-log_inc * np.arange(half))
    t = np.arange(length)[:, None] * inv[None, :]
    put("a.position_embd.weight",
        np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32))
    for i in range(a_layer):
        hp_, gp = f"audio_tower.layers.{i}.", f"a.blk.{i}."
        put(gp + "ln1.weight", sd[hp_ + "self_attn_layer_norm.weight"])
        put(gp + "ln1.bias", sd[hp_ + "self_attn_layer_norm.bias"])
        put(gp + "attn_q.weight", sd[hp_ + "self_attn.q_proj.weight"])
        put(gp + "attn_q.bias", sd[hp_ + "self_attn.q_proj.bias"])
        put(gp + "attn_k.weight", sd[hp_ + "self_attn.k_proj.weight"])
        put(gp + "attn_v.weight", sd[hp_ + "self_attn.v_proj.weight"])
        put(gp + "attn_v.bias", sd[hp_ + "self_attn.v_proj.bias"])
        put(gp + "attn_out.weight", sd[hp_ + "self_attn.out_proj.weight"])
        put(gp + "attn_out.bias", sd[hp_ + "self_attn.out_proj.bias"])
        put(gp + "ln2.weight", sd[hp_ + "final_layer_norm.weight"])
        put(gp + "ln2.bias", sd[hp_ + "final_layer_norm.bias"])
        put(gp + "ffn_up.weight", sd[hp_ + "fc1.weight"])
        put(gp + "ffn_up.bias", sd[hp_ + "fc1.bias"])
        put(gp + "ffn_down.weight", sd[hp_ + "fc2.weight"])
        put(gp + "ffn_down.bias", sd[hp_ + "fc2.bias"])
    put("a.post_ln.weight", sd["audio_tower.ln_post.weight"])
    put("a.post_ln.bias", sd["audio_tower.ln_post.bias"])
    put("mm.a.fc.weight", sd["audio_tower.proj.weight"])
    put_if("mm.a.fc.bias", "audio_tower.proj.bias")
    w.write()
    if verbose:
        print(f"wrote mmproj {dst} ({n_tensors} tensors)")
    return {"out": dst, "arch": "clip", "n_tensors": n_tensors}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-convert-hf")
    ap.add_argument("model_dir")
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--outtype", default="f16", choices=["f32", "f16", "bf16"])
    ap.add_argument("-q", "--quiet", action="store_true")
    ap.add_argument("--mmproj", action="store_true",
                    help="export the VISION tower as an mmproj GGUF instead "
                         "of the text model (≡ convert_hf_to_gguf --mmproj)")
    args = ap.parse_args(argv)
    if args.mmproj:
        stats = convert_hf_mmproj(args.model_dir, args.outfile,
                                  verbose=not args.quiet)
        print(f"wrote {stats['out']} (mmproj, {stats['n_tensors']} tensors)")
        return 0
    stats = convert_hf_to_gguf(args.model_dir, args.outfile, args.outtype,
                               verbose=not args.quiet)
    print(f"wrote {stats['out']} ({stats['arch']}, {stats['n_tensors']} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
