"""Converter family registry: the long tail of HF model families.

Each entry maps one HF ``model_type`` to a GGUF architecture plus optional
hooks for metadata and tensor-name translation. convert_hf.py consults this
registry after its built-in families, so adding a family here is additive.

Reference parity: convert_hf_to_gguf.py registers 301 model classes; the
families here cover the custom-code checkpoints (RWKV, PLaMo, Baichuan,
InternLM2, ...) that transformers-the-library does not ship classes for.
Per-family citations are on the register() calls. The HF tensor names are
wire-format facts of the public checkpoints (mirrored in gguf-py
tensor_mapping.py); the translation code is original.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

Mapper = Callable[[str, np.ndarray], "list[tuple[str, np.ndarray]] | None"]


@dataclass
class Family:
    """One HF model_type → GGUF arch conversion recipe.

    arch:        GGUF architecture string.
    ln:          arch's norm-eps key is attention.layer_norm_epsilon
                 (LayerNorm) instead of the RMS key.
    permute_qk:  apply the llama rotate-half → interleaved QK permute.
    set_kv:      fn(w, cfg, hp) writing arch-specific metadata after the
                 generic header (use w.set_kv to override generic keys).
    make_mapper: fn(cfg, hp) -> mapper(name, arr). The mapper returns a
                 list of (gguf_name, array) — [] skips the tensor — or
                 None to fall through to the generic name mapping.
    """

    arch: str
    ln: bool = False
    permute_qk: bool = False
    set_kv: Callable[[Any, dict, dict], None] | None = None
    make_mapper: Callable[[dict, dict], Mapper] | None = None
    pick_arch: Callable[[dict], str] | None = None  # config-dependent arch


FAMILIES: dict[str, Family] = {}


def register(model_type: str, **kw) -> None:
    FAMILIES[model_type] = Family(**kw)


def _wb(sub: str) -> str:
    """'foo.weight'/'foo.bias' → trailing component."""
    return sub.rsplit(".", 1)[-1]


# ---------------------------------------------------------------------------
# RWKV world vocab (rwkv_vocab_v20230424.txt shipped next to the weights)
# ---------------------------------------------------------------------------


def convert_vocab_rwkv_world(w, src_dir: str, cfg: dict) -> bool:
    """Write the RWKV world-vocab trie tokenizer if its vocab file is
    present (≡ convert_hf_to_gguf.py _set_vocab_rwkv_world :1477)."""
    import ast
    import os

    path = os.path.join(src_dir, "rwkv_vocab_v20230424.txt")
    if not os.path.exists(path):
        return False
    from ..gguf.constants import TokenType

    tokens: list[str] = ["<s>"]
    types: list[int] = [int(TokenType.CONTROL)]
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split(" ")
            if len(parts) < 3:
                continue
            tok = ast.literal_eval(" ".join(parts[1:-1]))
            blen = int(parts[-1])
            tok = tok.encode("utf-8") if isinstance(tok, str) else tok
            assert isinstance(tok, bytes) and len(tok) == blen
            tokens.append(repr(tok)[2:-1])  # b'\xff' -> \xff escape text
            types.append(int(TokenType.NORMAL))
    vocab_size = int(cfg.get("vocab_size", 65536))
    for i in range(len(tokens), vocab_size):
        tokens.append(f"[PAD{i}]")
        types.append(int(TokenType.UNUSED))
    w.add_kv("tokenizer.ggml.model", "rwkv")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 0)
    w.add_kv("tokenizer.ggml.eos_token_id", 0)
    w.add_kv("tokenizer.ggml.eot_token_id", 261)  # '\n\n'
    return True


# ---------------------------------------------------------------------------
# RWKV6 (Rwkv6ForCausalLM — RWKV/v6-Finch HF checkpoints)
# ≡ convert_hf_to_gguf.py Rwkv6Model (:6524)
# ---------------------------------------------------------------------------


def _rwkv6_kv(w, cfg: dict, hp: dict) -> None:
    E = hp["n_embd"]
    ffn = cfg.get("intermediate_size") or int((E * 3.5) // 32 * 32)
    w.set_kv("rwkv6.context_length", 1 << 20)  # not context limited
    w.set_kv("rwkv6.feed_forward_length", int(ffn))
    w.set_kv("rwkv6.attention.head_count", 0)
    w.add_kv("rwkv6.wkv.head_size", int(cfg.get("head_size", 64)))
    w.add_kv("rwkv6.rescale_every_n_layers", int(cfg.get("rescale_every", 6)))
    w.add_kv("rwkv6.token_shift_count", 2)
    # lora ranks are shape-derived at load; record the reference defaults
    w.add_kv("rwkv6.time_mix_extra_dim", 64 if E == 4096 else 32)
    w.add_kv("rwkv6.time_decay_extra_dim", 128 if E == 4096 else 64)


def _rwkv6_mapper(cfg: dict, hp: dict) -> Mapper:
    rescale = int(cfg.get("rescale_every", 6))
    lerp: dict[int, dict[str, np.ndarray]] = {}
    ORDER = "wkvrg"  # fused-lerp stack order (≡ Rwkv6Model.modify_tensors)

    def m(name: str, arr: np.ndarray):
        if name == "rwkv.embeddings.weight":
            return [("token_embd.weight", arr)]
        if name.startswith("rwkv.ln_out."):
            return [("output_norm." + _wb(name), arr)]
        if name == "head.weight":
            return [("output.weight", arr)]
        if not name.startswith("rwkv.blocks."):
            return []
        parts = name.split(".")
        bid = int(parts[2])
        sub = ".".join(parts[3:])
        p = f"blk.{bid}."
        if sub.startswith("pre_ln."):
            return [("token_embd_norm." + _wb(sub), arr)] if bid == 0 else []
        if sub.startswith("ln1."):
            return [(p + "attn_norm." + _wb(sub), arr)]
        if sub.startswith("ln2."):
            return [(p + "attn_norm_2." + _wb(sub), arr)]
        if sub.startswith("attention.ln_x."):
            return [(p + "time_mix_ln." + _wb(sub), arr)]
        if sub == "attention.time_maa_x":
            return [(p + "time_mix_lerp_x.weight", arr.reshape(-1))]
        if sub.startswith("attention.time_maa_") and sub[-1] in ORDER \
                and len(sub) == len("attention.time_maa_") + 1:
            d = lerp.setdefault(bid, {})
            d[sub[-1]] = arr.reshape(-1)
            if len(d) == 5:
                fused = np.stack([d[c][None, :] for c in ORDER], axis=0)
                return [(p + "time_mix_lerp_fused.weight", fused)]
            return []
        if sub == "attention.time_maa_w1":  # (E, 5r) → (5r, E)
            return [(p + "time_mix_w1.weight", arr.T)]
        if sub == "attention.time_maa_w2":  # (5, r, E) → (5, E, r)
            return [(p + "time_mix_w2.weight", arr.transpose(0, 2, 1))]
        if sub == "attention.time_decay":
            return [(p + "time_mix_decay.weight", arr.reshape(-1))]
        if sub == "attention.time_decay_w1":  # (E, dr) → (dr, E)
            return [(p + "time_mix_decay_w1.weight", arr.T)]
        if sub == "attention.time_decay_w2":  # (dr, E) → (E, dr)
            return [(p + "time_mix_decay_w2.weight", arr.T)]
        if sub == "attention.time_faaaa":
            return [(p + "time_mix_first.weight", arr)]
        for nm in ("receptance", "key", "value", "gate", "output"):
            if sub == f"attention.{nm}.weight":
                if nm == "output" and rescale > 0:
                    arr = arr / 2.0 ** (bid // rescale)
                return [(p + f"time_mix_{nm}.weight", arr)]
        if sub == "feed_forward.time_maa_k":
            return [(p + "channel_mix_lerp_k.weight", arr.reshape(-1))]
        if sub == "feed_forward.time_maa_r":
            return [(p + "channel_mix_lerp_r.weight", arr.reshape(-1))]
        for nm in ("key", "receptance", "value"):
            if sub == f"feed_forward.{nm}.weight":
                if nm == "value" and rescale > 0:
                    arr = arr / 2.0 ** (bid // rescale)
                return [(p + f"channel_mix_{nm}.weight", arr)]
        return []

    return m


register(
    "rwkv6",
    arch="rwkv6",
    ln=True,
    set_kv=_rwkv6_kv,
    make_mapper=_rwkv6_mapper,
)


# ---------------------------------------------------------------------------
# RWKV6Qwen2 (RWKV6Qwen2ForCausalLM — recursal/QRWKV6 linearized qwen2)
# ≡ convert_hf_to_gguf.py RWKV6Qwen2Model (:6596)
# ---------------------------------------------------------------------------


def _rwkv6qwen2_kv(w, cfg: dict, hp: dict) -> None:
    E = hp["n_embd"]
    head_size = E // hp["n_head"]
    w.set_kv("rwkv6qwen2.context_length", 1 << 20)
    w.add_kv("rwkv6qwen2.wkv.head_size", head_size)
    w.add_kv("rwkv6qwen2.token_shift_count", 1)
    w.add_kv("rwkv6qwen2.time_mix_extra_dim",
             int(cfg.get("lora_rank_tokenshift",
                         64 if E >= 4096 else 32)))
    w.add_kv("rwkv6qwen2.time_decay_extra_dim",
             int(cfg.get("lora_rank_decay", 128 if E >= 4096 else 64)))


def _rwkv6qwen2_mapper(cfg: dict, hp: dict) -> Mapper:
    lerp: dict[int, dict[str, np.ndarray]] = {}
    ORDER = "wkvrg"
    # HF groups the w1/w2 loras as r,k,v,w,g; GGUF keeps the finch w,k,v,r,g
    PERM = [3, 1, 2, 0, 4]

    def m(name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("token_embd.weight", arr)]
        if name == "model.norm.weight":
            return [("output_norm.weight", arr)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if not name.startswith("model.layers."):
            return []
        parts = name.split(".")
        bid = int(parts[2])
        sub = ".".join(parts[3:])
        p = f"blk.{bid}."
        generic = {
            "input_layernorm.weight": "attn_norm.weight",
            "post_attention_layernorm.weight": "ffn_norm.weight",
            "mlp.gate_proj.weight": "ffn_gate.weight",
            "mlp.up_proj.weight": "ffn_up.weight",
            "mlp.down_proj.weight": "ffn_down.weight",
            "self_attn.gate.weight": "time_mix_gate.weight",
            "self_attn.o_proj.weight": "time_mix_output.weight",
        }
        if sub in generic:
            return [(p + generic[sub], arr)]
        for proj, gg in (("q_proj", "receptance"), ("k_proj", "key"),
                         ("v_proj", "value")):
            for kind in ("weight", "bias"):
                if sub == f"self_attn.{proj}.{kind}":
                    return [(p + f"time_mix_{gg}.{kind}", arr)]
        if sub == "self_attn.time_maa_x":
            return [(p + "time_mix_lerp_x.weight", arr.reshape(-1))]
        if sub.startswith("self_attn.time_maa_") and sub[-1] in ORDER \
                and len(sub) == len("self_attn.time_maa_") + 1:
            d = lerp.setdefault(bid, {})
            d[sub[-1]] = arr.reshape(-1)
            if len(d) == 5:
                fused = np.stack([d[c][None, :] for c in ORDER], axis=0)
                return [(p + "time_mix_lerp_fused.weight", fused)]
            return []
        if sub == "self_attn.time_maa_w1":
            # (E, 5r) → (5r, E), then permute the 5 groups r,k,v,w,g → wkvrg
            a = arr.T
            a = a.reshape(5, -1, a.shape[-1])[PERM].reshape(-1, a.shape[-1])
            return [(p + "time_mix_w1.weight", a)]
        if sub == "self_attn.time_maa_w2":
            # (5, r, E) → (5, E, r) with the same group permute
            a = arr.transpose(0, 2, 1)[PERM]
            return [(p + "time_mix_w2.weight", a)]
        if sub == "self_attn.time_decay":
            return [(p + "time_mix_decay.weight", arr.reshape(-1))]
        if sub == "self_attn.time_decay_w1":
            return [(p + "time_mix_decay_w1.weight", arr.T)]
        if sub == "self_attn.time_decay_w2":
            return [(p + "time_mix_decay_w2.weight", arr.T)]
        return []

    return m


register(
    "rwkv6qwen2",
    arch="rwkv6qwen2",
    set_kv=_rwkv6qwen2_kv,
    make_mapper=_rwkv6qwen2_mapper,
)


# ---------------------------------------------------------------------------
# RWKV7 (Rwkv7ForCausalLM / RWKV7ForCausalLM — Goose world + fla-hub)
# ≡ convert_hf_to_gguf.py Rwkv7Model (:6649)
# ---------------------------------------------------------------------------


def _rwkv7_unify(name: str) -> str:
    """Normalize the two public RWKV7 naming dialects (world HF release vs
    fla-hub) to one internal form (≡ Rwkv7Model.modify_tensors renames)."""
    name = name.replace("blocks", "layers").replace("ffn", "feed_forward")
    name = name.replace("self_attn", "attention").replace("attn", "attention")
    name = name.replace("time_mixer.", "")
    name = name.replace("feed_forward_norm", "ln2")
    name = name.replace("g_norm", "ln_x")
    return name


def _rwkv7_kv_for(arch: str):
    def kv(w, cfg: dict, hp: dict) -> None:
        E = hp["n_embd"]
        head_size = int(cfg.get("head_size", cfg.get("head_dim", 64)))
        eps = float(cfg.get("layer_norm_epsilon", cfg.get("norm_eps", 1e-5)))
        ffn = cfg.get("intermediate_size") or E * 4

        def rank(keys: list[str], exp: float, mult: float) -> int:
            for k in keys:
                if cfg.get(k) is not None:
                    return int(cfg[k])
            return max(1, round(E ** exp * mult / 32)) * 32

        w.set_kv(f"{arch}.context_length", 1 << 20)
        w.set_kv(f"{arch}.feed_forward_length", int(ffn))
        w.set_kv(f"{arch}.attention.head_count", 0)
        w.add_kv(f"{arch}.wkv.head_size", head_size)
        w.add_kv(f"{arch}.attention.decay_lora_rank",
                 rank(["lora_rank_decay", "decay_low_rank_dim"], 0.5, 1.8))
        w.add_kv(f"{arch}.attention.iclr_lora_rank",
                 rank(["lora_rank_iclr", "a_low_rank_dim"], 0.5, 1.8))
        w.add_kv(f"{arch}.attention.value_residual_mix_lora_rank",
                 rank(["lora_rank_value_residual_mix", "v_low_rank_dim"],
                      0.5, 1.3))
        w.add_kv(f"{arch}.attention.gate_lora_rank",
                 rank(["lora_rank_gate", "gate_low_rank_dim"], 0.8, 0.6))
        if arch == "arwkv7":
            w.add_kv("arwkv7.token_shift_count", 1)

    return kv


def _rwkv7_mapper_for(arch: str):
    def make(cfg: dict, hp: dict) -> Mapper:
        has_gate = bool(cfg.get("wkv_has_gate", True))
        lerp_list = "rwkva" + ("g" if has_gate else "")
        lerp: dict[int, dict[str, np.ndarray]] = {}
        # fla-hub splits each lora as _lora.lora.{0,2}; those arrive
        # already in GGUF orientation (no transpose)
        state = {"needs_t": True}

        def m(name: str, arr: np.ndarray):
            if "_lora.lora" in name:
                state["needs_t"] = False
            name = name.replace("_lora.lora.0.weight", "1.weight")
            name = name.replace("_lora.lora.2.weight", "2.weight")
            name = name.replace("_lora.lora.2.bias", "0.weight")
            name = _rwkv7_unify(name)
            if name in ("model.embeddings.weight", "model.embed_tokens.weight"):
                return [("token_embd.weight", arr)]
            if name.startswith("model.pre_ln."):
                return [("token_embd_norm." + _wb(name), arr)]
            if name.startswith("model.ln_out."):
                return [("output_norm." + _wb(name), arr)]
            if name in ("lm_head.weight", "head.weight"):
                return [("output.weight", arr)]
            if name == "model.norm.weight":  # arwkv7 RMS final norm
                return [("output_norm.weight", arr)]
            if not name.startswith("model.layers."):
                return []
            parts = name.split(".")
            bid = int(parts[2])
            sub = ".".join(parts[3:])
            p = f"blk.{bid}."
            if sub.startswith("pre_norm.") and bid == 0:
                return [("token_embd_norm." + _wb(sub), arr)]
            if sub.startswith("ln1."):
                return [(p + "attn_norm." + _wb(sub), arr)]
            if sub.startswith("ln2."):
                return [(p + "attn_norm_2." + _wb(sub), arr)]
            if sub.startswith("input_layernorm."):  # arwkv7 RMS norms
                return [(p + "attn_norm." + _wb(sub), arr)]
            if sub.startswith("post_attention_layernorm."):
                return [(p + "ffn_norm." + _wb(sub), arr)]
            if sub.startswith("attention.ln_x."):
                return [(p + "time_mix_ln." + _wb(sub), arr)]
            if sub == "attention.x_x":  # fused lerp, already stacked
                return [(p + "time_mix_lerp_fused.weight",
                         arr.reshape(len(lerp_list), 1, -1))]
            if sub.startswith("attention.x_") and sub[-1] in lerp_list \
                    and len(sub) == len("attention.x_") + 1:
                d = lerp.setdefault(bid, {})
                d[sub[-1]] = arr.reshape(-1)
                if len(d) == len(lerp_list):
                    fused = np.stack([d[c][None, :] for c in lerp_list],
                                     axis=0)
                    return [(p + "time_mix_lerp_fused.weight", fused)]
                return []
            # low-rank pairs: w/a/v/g (+ scalar offsets w0/a0/v0)
            for grp in "wavg":
                if sub == f"attention.{grp}0":
                    if grp == "v" and bid == 0:
                        return []  # dummy v* on the first layer
                    return [(p + f"time_mix_{grp}0.weight", arr.reshape(-1))]
                for idx in "12":
                    if sub == f"attention.{grp}{idx}":
                        if grp == "v" and bid == 0:
                            return []
                        a = arr.T if state["needs_t"] else arr
                        return [(p + f"time_mix_{grp}{idx}.weight", a)]
            if sub == "attention.k_k":
                return [(p + "time_mix_k_k.weight", arr.reshape(-1))]
            if sub == "attention.k_a":
                return [(p + "time_mix_k_a.weight", arr.reshape(-1))]
            if sub == "attention.r_k":
                return [(p + "time_mix_r_k.weight", arr.reshape(-1))]
            for hf, gg in (("receptance", "receptance"), ("r_proj", "receptance"),
                           ("key", "key"), ("k_proj", "key"),
                           ("value", "value"), ("v_proj", "value"),
                           ("output", "output"), ("o_proj", "output")):
                if sub == f"attention.{hf}.weight":
                    return [(p + f"time_mix_{gg}.weight", arr)]
            if sub == "feed_forward.x_k":
                return [(p + "channel_mix_lerp_k.weight", arr.reshape(-1))]
            if sub == "feed_forward.key.weight":
                return [(p + "channel_mix_key.weight", arr)]
            if sub == "feed_forward.value.weight":
                return [(p + "channel_mix_value.weight", arr)]
            # arwkv7 swiglu FFN (qwen body)
            ffn = {
                "mlp.gate_proj.weight": "ffn_gate.weight",
                "mlp.up_proj.weight": "ffn_up.weight",
                "mlp.down_proj.weight": "ffn_down.weight",
            }.get(sub)
            if ffn:
                return [(p + ffn, arr)]
            return []

        return m

    return make


register(
    "rwkv7",
    arch="rwkv7",
    ln=True,
    set_kv=_rwkv7_kv_for("rwkv7"),
    make_mapper=_rwkv7_mapper_for("rwkv7"),
)

# ARWKV-7 (RwkvHybridForCausalLM — rwkv7 time mix on a qwen swiglu body)
# ≡ convert_hf_to_gguf.py ARwkv7Model (:6767)
register(
    "rwkv_hybrid",
    arch="arwkv7",
    set_kv=_rwkv7_kv_for("arwkv7"),
    make_mapper=_rwkv7_mapper_for("arwkv7"),
)
register(
    "arwkv7",
    arch="arwkv7",
    set_kv=_rwkv7_kv_for("arwkv7"),
    make_mapper=_rwkv7_mapper_for("arwkv7"),
)


# ---------------------------------------------------------------------------
# llama-graph aliases with custom checkpoint naming
# ---------------------------------------------------------------------------


def _exaone_mapper(cfg: dict, hp: dict) -> Mapper:
    """EXAONE-3.x (ExaoneForCausalLM) — gpt2-style prefixes around a llama
    graph (≡ convert_hf_to_gguf.py ExaoneModel :8896; NEOX rope, no
    permute)."""
    LAYER = {
        "ln_1.weight": "attn_norm.weight",
        "ln_2.weight": "ffn_norm.weight",
        "attn.attention.q_proj.weight": "attn_q.weight",
        "attn.attention.k_proj.weight": "attn_k.weight",
        "attn.attention.v_proj.weight": "attn_v.weight",
        "attn.attention.out_proj.weight": "attn_output.weight",
        "mlp.c_fc_0.weight": "ffn_gate.weight",
        "mlp.c_fc_1.weight": "ffn_up.weight",
        "mlp.c_proj.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name == "transformer.wte.weight":
            return [("token_embd.weight", arr)]
        if name.startswith("transformer.ln_f."):
            return [("output_norm." + _wb(name), arr)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if name.startswith("transformer.h."):
            parts = name.split(".", 3)
            mapped = LAYER.get(parts[3])
            return [(f"blk.{parts[2]}.{mapped}", arr)] if mapped else []
        return []

    return m


def _exaone_kv(w, cfg: dict, hp: dict) -> None:
    rot = float(cfg.get("partial_rotary_factor", cfg.get("rope_pct", 1.0)))
    w.set_kv("exaone.rope.dimension_count", int(rot * hp["head_dim"]))


register("exaone", arch="exaone", set_kv=_exaone_kv,
         make_mapper=_exaone_mapper)


def _internlm2_mapper(cfg: dict, hp: dict) -> Mapper:
    """InternLM2ForCausalLM — wqkv is grouped per kv-head as
    [q×g | k | v]·head_dim; split + NORM-rope permute
    (≡ InternLM2Model.modify_tensors)."""
    from .convert_hf import _permute_qk

    n_head, n_kv, hd = hp["n_head"], hp["n_kv"], hp["head_dim"]
    q_per_kv = n_head // n_kv
    LAYER = {
        "attention_norm.weight": "attn_norm.weight",
        "ffn_norm.weight": "ffn_norm.weight",
        "attention.wo.weight": "attn_output.weight",
        "feed_forward.w1.weight": "ffn_gate.weight",
        "feed_forward.w3.weight": "ffn_up.weight",
        "feed_forward.w2.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name == "model.tok_embeddings.weight":
            return [("token_embd.weight", arr)]
        if name == "model.norm.weight":
            return [("output_norm.weight", arr)]
        if name == "output.weight":
            return [("output.weight", arr)]
        if not name.startswith("model.layers."):
            return []
        parts = name.split(".", 3)
        bid, rest = parts[2], parts[3]
        p = f"blk.{bid}."
        if rest == "attention.wqkv.weight":
            qkv = arr.reshape(n_kv, q_per_kv + 2, hd, arr.shape[-1])
            q = qkv[:, :q_per_kv].reshape(-1, arr.shape[-1])
            k = qkv[:, -2].reshape(-1, arr.shape[-1])
            v = qkv[:, -1].reshape(-1, arr.shape[-1])
            return [
                (p + "attn_q.weight", _permute_qk(q, n_head)),
                (p + "attn_k.weight", _permute_qk(k, n_kv)),
                (p + "attn_v.weight", v),
            ]
        mapped = LAYER.get(rest)
        return [(p + mapped, arr)] if mapped else []

    return m


register("internlm2", arch="internlm2", make_mapper=_internlm2_mapper)


def _minicpm3_kv(w, cfg: dict, hp: dict) -> None:
    """MiniCPM3 MLA dims (≡ MiniCPM3Model.set_gguf_parameters :3418);
    tensor names are the deepseek2 set, handled by the generic map."""
    qk_nope = int(cfg["qk_nope_head_dim"])
    qk_rope = int(cfg["qk_rope_head_dim"])
    if cfg.get("q_lora_rank"):
        w.add_kv("minicpm3.attention.q_lora_rank", int(cfg["q_lora_rank"]))
    w.add_kv("minicpm3.attention.kv_lora_rank", int(cfg["kv_lora_rank"]))
    w.set_kv("minicpm3.attention.key_length", qk_nope + qk_rope)
    w.set_kv("minicpm3.attention.value_length",
             int(cfg.get("v_head_dim", qk_nope)))
    w.set_kv("minicpm3.rope.dimension_count", qk_rope)


register("minicpm3", arch="minicpm3", set_kv=_minicpm3_kv)


def _openelm_ffn_dims(cfg: dict) -> list[int]:
    """≡ OpenELMModel._make_divisible over ffn_multipliers."""
    div = int(cfg["ffn_dim_divisor"])
    E = int(cfg["model_dim"])
    dims = []
    for mult in cfg["ffn_multipliers"]:
        v = mult * E
        new_v = max(div, int(v + div / 2) // div * div)
        if new_v < 0.9 * v:
            new_v += div
        dims.append(int(new_v))
    return dims


def _openelm_kv(w, cfg: dict, hp: dict) -> None:
    arch = "openelm"
    w.set_kv(f"{arch}.block_count", int(cfg["num_transformer_layers"]))
    w.set_kv(f"{arch}.context_length", int(cfg["max_context_length"]))
    w.set_kv(f"{arch}.embedding_length", int(cfg["model_dim"]))
    w.set_kv(f"{arch}.feed_forward_length",
             np.asarray(_openelm_ffn_dims(cfg), dtype=np.int32))
    w.set_kv(f"{arch}.attention.head_count",
             np.asarray(cfg["num_query_heads"], dtype=np.int32))
    w.set_kv(f"{arch}.attention.head_count_kv",
             np.asarray(cfg["num_kv_heads"], dtype=np.int32))
    hd = int(cfg["head_dim"])
    w.set_kv(f"{arch}.attention.key_length", hd)
    w.set_kv(f"{arch}.attention.value_length", hd)
    w.set_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.set_kv(f"{arch}.rope.freq_base", float(cfg["rope_freq_constant"]))
    w.set_kv(f"{arch}.rope.dimension_count", hd)


def _openelm_mapper(cfg: dict, hp: dict) -> Mapper:
    """apple/OpenELM (≡ OpenELMModel :7272): transformer.layers.* naming,
    fused qkv kept fused, ffn.proj_1 split into gate|up at the per-layer
    ffn dim."""
    ffn_dims = _openelm_ffn_dims(cfg)
    LAYER = {
        "attn_norm.weight": "attn_norm.weight",
        "ffn_norm.weight": "ffn_norm.weight",
        "attn.qkv_proj.weight": "attn_qkv.weight",
        "attn.out_proj.weight": "attn_output.weight",
        "attn.q_norm.weight": "attn_q_norm.weight",
        "attn.k_norm.weight": "attn_k_norm.weight",
        "ffn.proj_2.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name == "transformer.token_embeddings.weight":
            return [("token_embd.weight", arr)]
        if name == "transformer.norm.weight":
            return [("output_norm.weight", arr)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if not name.startswith("transformer.layers."):
            return []
        parts = name.split(".", 3)
        bid, rest = int(parts[2]), parts[3]
        p = f"blk.{bid}."
        if rest == "ffn.proj_1.weight":
            ff = ffn_dims[bid]
            return [(p + "ffn_gate.weight", arr[:ff]),
                    (p + "ffn_up.weight", arr[ff:])]
        mapped = LAYER.get(rest)
        return [(p + mapped, arr)] if mapped else []

    return m


register("openelm", arch="openelm", set_kv=_openelm_kv,
         make_mapper=_openelm_mapper)


# ---------------------------------------------------------------------------
# PLaMo family (pfnet) — model.layers.layers.* naming
# ---------------------------------------------------------------------------


def _plamo1_mapper(cfg: dict, hp: dict) -> Mapper:
    """PLaMo-13B (≡ PlamoModel :4820): GQA weights stored q-major
    [q_per_kv, n_kv, hd]; GGUF wants kv-major [n_kv, q_per_kv, hd]."""
    n_head = hp["n_head"]
    n_kv = int(cfg.get("num_key_value_heads") or n_head)
    hd = hp["head_dim"]
    q_per_kv = max(1, n_head // max(n_kv, 1))
    LAYER = {
        "norm.weight": "attn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("token_embd.weight", arr)]
        if name == "model.norm.weight":
            return [("output_norm.weight", arr)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if not name.startswith("model.layers.layers."):
            return []
        parts = name.split(".", 4)
        bid, rest = parts[3], parts[4]
        mapped = LAYER.get(rest)
        if not mapped:
            return []
        if mapped == "attn_q.weight" and q_per_kv > 1:
            E = arr.shape[-1]
            arr = (arr.reshape(q_per_kv, n_kv, hd, E)
                   .transpose(1, 0, 2, 3).reshape(-1, E))
        elif mapped == "attn_output.weight" and q_per_kv > 1:
            E = arr.shape[0]
            arr = (arr.reshape(E, q_per_kv, n_kv, hd)
                   .transpose(0, 2, 1, 3).reshape(E, -1))
        return [(f"blk.{bid}.{mapped}", arr)]

    return m


register("plamo", arch="plamo", make_mapper=_plamo1_mapper)


def _plamo2_is_mamba(cfg: dict, i: int, n_layer: int) -> bool:
    """≡ Plamo2Model.set_gguf_parameters / modeling_plamo is_mamba."""
    step = int(cfg.get("mamba_step", 2))
    if not cfg.get("mamba_enabled", True):
        return False
    if n_layer <= step // 2:
        return i != n_layer - 1
    return (i % step) != (step // 2)


def _plamo2_kv(w, cfg: dict, hp: dict) -> None:
    arch = "plamo2"
    n_layer = hp["n_layer"]
    n_head = int(cfg.get("num_attention_heads", 32))
    n_kv = int(cfg.get("num_key_value_heads", 4))
    kv_arr = [0 if _plamo2_is_mamba(cfg, i, n_layer) else n_kv
              for i in range(n_layer)]
    hd = int(cfg.get("hidden_size_per_head", 128))
    w.set_kv(f"{arch}.attention.head_count", n_head)
    w.set_kv(f"{arch}.attention.head_count_kv",
             np.asarray(kv_arr, dtype=np.int32))
    w.set_kv(f"{arch}.attention.key_length", hd)
    w.set_kv(f"{arch}.attention.value_length", hd)
    w.set_kv(f"{arch}.rope.dimension_count", hd)
    w.add_kv(f"{arch}.ssm.state_size", int(cfg.get("mamba_d_state", 64)))
    w.add_kv(f"{arch}.ssm.conv_kernel", int(cfg.get("mamba_d_conv", 4)))
    w.add_kv(f"{arch}.ssm.time_step_rank", int(cfg.get("mamba_num_heads", 64)))
    w.add_kv(f"{arch}.ssm.inner_size",
             int(cfg.get("mamba_num_heads", 64)) * hd)
    w.add_kv(f"{arch}.ssm.group_count", 0)


_PLAMO2_NORM_OFFSET = {
    "pre_mixer_norm.weight": ("attn_norm.weight", 1.0),
    "post_mixer_norm.weight": ("post_attention_norm.weight", 1.0 / 5),
    "pre_mlp_norm.weight": ("ffn_norm.weight", 1.0),
    "post_mlp_norm.weight": ("post_ffw_norm.weight", 1.0 / 5 ** 1.5),
}


def _plamo2_mapper(cfg: dict, hp: dict) -> Mapper:
    """PLaMo2 hybrid (≡ Plamo2Model :4865): mamba/attn mixers under
    model.layers.layers.*, norm weights stored with offsets, fused swiglu
    gate_up, per-head q/k RMS norms."""
    MIXER = {
        "mixer.qkv_proj.weight": "attn_qkv.weight",
        "mixer.o_proj.weight": "attn_output.weight",
        "mixer.q.weight": "attn_q_norm.weight",
        "mixer.q_weight": "attn_q_norm.weight",
        "mixer.k.weight": "attn_k_norm.weight",
        "mixer.k_weight": "attn_k_norm.weight",
        "mixer.in_proj.weight": "ssm_in.weight",
        "mixer.bcdt_proj.weight": "ssm_x.weight",
        "mixer.dt_proj.weight": "ssm_dt.weight",
        "mixer.dt_bias": "ssm_dt.bias",
        "mixer.dt_norm_weight": "ssm_dt_norm.weight",
        "mixer.dt_norm.weight": "ssm_dt_norm.weight",
        "mixer.B_norm_weight": "ssm_b_norm.weight",
        "mixer.B_norm.weight": "ssm_b_norm.weight",
        "mixer.C_norm_weight": "ssm_c_norm.weight",
        "mixer.C_norm.weight": "ssm_c_norm.weight",
        "mixer.D": "ssm_d",
        "mixer.out_proj.weight": "ssm_out.weight",
        "mlp.gate_up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("token_embd.weight", arr)]
        if name == "model.norm.weight":
            return [("output_norm.weight", arr + 1.0)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if not name.startswith("model.layers.layers."):
            return []
        parts = name.split(".", 4)
        bid, rest = parts[3], parts[4]
        p = f"blk.{bid}."
        if rest in _PLAMO2_NORM_OFFSET:
            gname, off = _PLAMO2_NORM_OFFSET[rest]
            return [(p + gname, arr + off)]
        if rest == "mixer.conv1d.weight":
            return [(p + "ssm_conv1d.weight",
                     arr.reshape(arr.shape[0], arr.shape[-1]))]
        if rest == "mixer.A_log":
            return [(p + "ssm_a", -np.exp(arr))]
        mapped = MIXER.get(rest)
        return [(p + mapped, arr)] if mapped else []

    return m


register("plamo2", arch="plamo2", make_mapper=_plamo2_mapper,
         set_kv=_plamo2_kv)


def _plamo3_kv(w, cfg: dict, hp: dict) -> None:
    sw = cfg.get("window_size", cfg.get("sliding_window"))
    if sw:
        w.set_kv("plamo3.attention.sliding_window", int(sw))
        if cfg.get("sliding_window_pattern"):
            w.set_kv("plamo3.attention.sliding_window_pattern",
                     int(cfg["sliding_window_pattern"]))
    if cfg.get("rope_local_theta"):
        w.add_kv("plamo3.rope.freq_base_swa", float(cfg["rope_local_theta"]))
    hd = int(cfg.get("hidden_size_per_head",
                     hp["n_embd"] // max(hp["n_head"], 1)))
    w.set_kv("plamo3.attention.key_length", hd)
    w.set_kv("plamo3.attention.value_length", hd)
    w.set_kv("plamo3.rope.dimension_count", hd)


def _plamo3_mapper(cfg: dict, hp: dict) -> Mapper:
    """PLaMo3 (≡ Plamo3Model :4954): plamo2's attention block everywhere
    (no mamba), q/k norms stored -1."""
    MIXER = {
        "mixer.qkv_proj.weight": "attn_qkv.weight",
        "mixer.o_proj.weight": "attn_output.weight",
        "mlp.gate_up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("token_embd.weight", arr)]
        if name == "model.norm.weight":
            return [("output_norm.weight", arr + 1.0)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if not name.startswith("model.layers.layers."):
            return []
        parts = name.split(".", 4)
        bid, rest = parts[3], parts[4]
        p = f"blk.{bid}."
        if rest in _PLAMO2_NORM_OFFSET:
            gname, off = _PLAMO2_NORM_OFFSET[rest]
            return [(p + gname, arr + off)]
        if rest == "mixer.q_norm.weight":
            return [(p + "attn_q_norm.weight", arr + 1.0)]
        if rest == "mixer.k_norm.weight":
            return [(p + "attn_k_norm.weight", arr + 1.0)]
        mapped = MIXER.get(rest)
        return [(p + mapped, arr)] if mapped else []

    return m


register("plamo3", arch="plamo3", make_mapper=_plamo3_mapper,
         set_kv=_plamo3_kv)


# ---------------------------------------------------------------------------
# Baichuan / Xverse / Orion (llama graphs, custom packing or norms)
# ---------------------------------------------------------------------------


def _baichuan_mapper(cfg: dict, hp: dict) -> Mapper:
    """BaichuanForCausalLM (≡ BaichuanModel :2146): fused W_pack split into
    thirds, q/k NORM-rope permuted; everything else is llama naming (fall
    through to the generic map)."""
    from .convert_hf import _permute_qk

    n_head, n_kv = hp["n_head"], hp["n_kv"]

    def m(name: str, arr: np.ndarray):
        if name.endswith("self_attn.W_pack.weight"):
            bid = name.split(".")[2]
            r = arr.shape[0] // 3
            p = f"blk.{bid}."
            return [
                (p + "attn_q.weight", _permute_qk(arr[:r], n_head)),
                (p + "attn_k.weight", _permute_qk(arr[r:2 * r], n_kv)),
                (p + "attn_v.weight", arr[2 * r:]),
            ]
        return None  # generic llama mapping

    return m


def _baichuan_kv(w, cfg: dict, hp: dict) -> None:
    if cfg.get("model_max_length") and not cfg.get("max_position_embeddings"):
        w.set_kv("baichuan.context_length", int(cfg["model_max_length"]))


register("baichuan", arch="baichuan", set_kv=_baichuan_kv,
         make_mapper=_baichuan_mapper)

# XverseForCausalLM (≡ XverseModel :2197): pure llama naming + QK permute
register("xverse", arch="xverse", permute_qk=True)

# OrionForCausalLM (≡ OrionModel :2112): llama naming, but the norms are
# LayerNorm with bias despite the config's rms_norm_eps name; NEOX rope
register("orion", arch="orion", ln=True)


# ---------------------------------------------------------------------------
# Qwen v1 / CodeShell / Jais (transformer.h.* family)
# ---------------------------------------------------------------------------


def _qwen_v1_mapper(cfg: dict, hp: dict) -> Mapper:
    """QWenLMHeadModel (≡ QwenModel :3477): gpt2-style prefixes, fused
    c_attn Linear (no transpose), w2=gate / w1=up swiglu."""
    LAYER = {
        "ln_1.weight": "attn_norm.weight",
        "ln_2.weight": "ffn_norm.weight",
        "attn.c_attn.weight": "attn_qkv.weight",
        "attn.c_attn.bias": "attn_qkv.bias",
        "attn.c_proj.weight": "attn_output.weight",
        "mlp.w1.weight": "ffn_up.weight",
        "mlp.w2.weight": "ffn_gate.weight",
        "mlp.c_proj.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name == "transformer.wte.weight":
            return [("token_embd.weight", arr)]
        if name == "transformer.ln_f.weight":
            return [("output_norm.weight", arr)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if name.startswith("transformer.h."):
            parts = name.split(".", 3)
            mapped = LAYER.get(parts[3])
            return [(f"blk.{parts[2]}.{mapped}", arr)] if mapped else []
        return []

    return m


def _qwen_v1_kv(w, cfg: dict, hp: dict) -> None:
    # HF intermediate_size counts w1+w2 together; each is half
    w.set_kv("qwen.feed_forward_length", int(cfg["intermediate_size"]) // 2)
    if cfg.get("seq_length"):
        w.set_kv("qwen.context_length", int(cfg["seq_length"]))


register("qwen", arch="qwen", set_kv=_qwen_v1_kv,
         make_mapper=_qwen_v1_mapper)


def _codeshell_kv(w, cfg: dict, hp: dict) -> None:
    arch = "codeshell"
    w.set_kv(f"{arch}.context_length", int(cfg.get("n_positions", 8192)))
    w.set_kv(f"{arch}.feed_forward_length",
             int(cfg.get("n_inner") or 4 * hp["n_embd"]))
    w.set_kv(f"{arch}.attention.head_count_kv",
             int(cfg.get("num_query_groups", 1)))
    w.set_kv(f"{arch}.rope.freq_base", float(cfg.get("rope_theta", 10000.0)))
    # partial rotary (codeshell rope_scaling=linear 1.0 over rot dims)
    w.set_kv(f"{arch}.rope.dimension_count",
             int(hp["head_dim"] * float(cfg.get("rotary_pct", 0.5))))


# CodeShellForCausalLM (≡ CodeShellModel :5008): gpt_bigcode layout —
# mapper always defers to the generic transformer.* path
register("codeshell", arch="codeshell", ln=True, set_kv=_codeshell_kv,
         make_mapper=lambda cfg, hp: lambda name, arr: None)


def _jais_mapper(cfg: dict, hp: dict) -> Mapper:
    """JAIS (≡ JaisModel :8403): gpt2 Conv1D weights need transposing, muP
    scales fold into the embeddings/head, ALiBi slopes fold into
    max_alibi_bias metadata (written by set_kv from config)."""
    emb_scale = float(cfg.get("mup_embeddings_scale",
                              cfg.get("embeddings_scale", 1.0)))
    if cfg.get("mup_output_alpha") is not None:
        width_scale = float(cfg["mup_output_alpha"]) * float(
            cfg.get("mup_width_scale", 1.0))
    else:
        width_scale = float(cfg.get("width_scale", 1.0))
    LAYER = {
        "ln_1.weight": ("attn_norm.weight", False),
        "ln_1.bias": ("attn_norm.bias", False),
        "ln_2.weight": ("ffn_norm.weight", False),
        "ln_2.bias": ("ffn_norm.bias", False),
        "attn.c_attn.weight": ("attn_qkv.weight", True),
        "attn.c_attn.bias": ("attn_qkv.bias", False),
        "attn.c_proj.weight": ("attn_output.weight", True),
        "attn.c_proj.bias": ("attn_output.bias", False),
        "mlp.c_fc.weight": ("ffn_up.weight", True),
        "mlp.c_fc.bias": ("ffn_up.bias", False),
        "mlp.c_fc2.weight": ("ffn_gate.weight", True),
        "mlp.c_fc2.bias": ("ffn_gate.bias", False),
        "mlp.c_proj.weight": ("ffn_down.weight", True),
        "mlp.c_proj.bias": ("ffn_down.bias", False),
    }

    def m(name: str, arr: np.ndarray):
        if name.endswith(".attn.bias") or name.endswith("relative_pe.slopes"):
            return []
        if name == "transformer.wte.weight":
            return [("token_embd.weight", arr * emb_scale)]
        if name.startswith("transformer.ln_f."):
            return [("output_norm." + _wb(name), arr)]
        if name == "lm_head.weight":
            return [("output.weight", arr * width_scale)]
        if name.startswith("transformer.h."):
            parts = name.split(".", 3)
            entry = LAYER.get(parts[3])
            if entry is None:
                return []
            gname, transpose = entry
            return [(f"blk.{parts[2]}.{gname}", arr.T if transpose else arr)]
        return []

    return m


def _jais_kv(w, cfg: dict, hp: dict) -> None:
    w.set_kv("jais.context_length", int(cfg.get("n_positions", 2048)))
    w.set_kv("jais.feed_forward_length",
             int(cfg.get("n_inner") or 4 * hp["n_embd"]))
    w.add_kv("jais.attention.max_alibi_bias",
             float(cfg.get("max_alibi_bias", 8.0)))


register("jais", arch="jais", ln=True, set_kv=_jais_kv,
         make_mapper=_jais_mapper)


# ---------------------------------------------------------------------------
# MoE and hybrid families
# ---------------------------------------------------------------------------


def _deepseek_v1_kv(w, cfg: dict, hp: dict) -> None:
    """DeepSeek-MoE v1 (≡ DeepseekModel :7493): llama tensors + routed
    experts with ungated shared experts and unit routing scale."""
    arch = "deepseek"
    w.set_kv(f"{arch}.rope.dimension_count", hp["head_dim"])
    w.add_kv(f"{arch}.leading_dense_block_count",
             int(cfg.get("first_k_dense_replace", 0)))
    w.set_kv(f"{arch}.expert_count", int(cfg.get("n_routed_experts", 0)))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    w.add_kv(f"{arch}.expert_feed_forward_length",
             int(cfg.get("moe_intermediate_size", 0)))
    w.add_kv(f"{arch}.expert_shared_count",
             int(cfg.get("n_shared_experts", 0) or 0))
    w.add_kv(f"{arch}.expert_weights_scale", 1.0)


register("deepseek", arch="deepseek", permute_qk=True,
         set_kv=_deepseek_v1_kv)


def _chatglm_kv(w, cfg: dict, hp: dict) -> None:
    """ChatGLM3 / GLM-4 custom-code checkpoints (≡ ChatGLMModel :8701)."""
    arch = "chatglm"
    E = hp["n_embd"]
    w.set_kv(f"{arch}.context_length", int(cfg.get("seq_length", E)))
    w.set_kv(f"{arch}.feed_forward_length",
             int(cfg.get("ffn_hidden_size",
                         cfg.get("intermediate_size", 4 * E))))
    w.set_kv(f"{arch}.attention.head_count_kv",
             int(cfg.get("multi_query_group_num",
                         cfg.get("num_key_value_heads", hp["n_head"]))))
    w.set_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(cfg.get("layernorm_epsilon", 1e-5)))
    rope_dim = int(cfg.get("attention_dim", hp["head_dim"]))
    w.set_kv(f"{arch}.rope.dimension_count",
             int(rope_dim * float(cfg.get("partial_rotary_factor", 0.5))))
    w.set_kv(f"{arch}.rope.freq_base",
             10000.0 * float(cfg.get("rope_ratio", 1.0)))
    if cfg.get("padded_vocab_size"):
        w.set_kv(f"{arch}.vocab_size", int(cfg["padded_vocab_size"]))


def _chatglm_mapper(cfg: dict, hp: dict) -> Mapper:
    LAYER = {
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "self_attention.query_key_value.weight": "attn_qkv.weight",
        "self_attention.query_key_value.bias": "attn_qkv.bias",
        "self_attention.dense.weight": "attn_output.weight",
        "mlp.dense_h_to_4h.weight": "ffn_up.weight",  # fused [gate|up]
        "mlp.dense_4h_to_h.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        name = name.removeprefix("transformer.")
        if name.endswith("rotary_pos_emb.inv_freq"):
            return []
        if name == "embedding.word_embeddings.weight":
            return [("token_embd.weight", arr)]
        if name.startswith("encoder.final_layernorm."):
            return [("output_norm." + _wb(name), arr)]
        if name == "output_layer.weight":
            return [("output.weight", arr)]
        if name.startswith("encoder.layers."):
            parts = name.split(".", 3)
            mapped = LAYER.get(parts[3])
            return [(f"blk.{parts[2]}.{mapped}", arr)] if mapped else []
        return []

    return m


register("chatglm", arch="chatglm", set_kv=_chatglm_kv,
         make_mapper=_chatglm_mapper)


def _bailingmoe_kv(w, cfg: dict, hp: dict) -> None:
    """Ling / BailingMoe (≡ BailingMoeModel :9479)."""
    arch = "bailingmoe"
    w.set_kv(f"{arch}.rope.dimension_count", hp["head_dim"])
    w.add_kv(f"{arch}.leading_dense_block_count",
             int(cfg.get("first_k_dense_replace", 0)))
    w.set_kv(f"{arch}.expert_count", int(cfg.get("num_experts", 0)))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    w.add_kv(f"{arch}.expert_feed_forward_length",
             int(cfg.get("moe_intermediate_size", 0)))
    w.add_kv(f"{arch}.expert_shared_count",
             int(cfg.get("num_shared_experts", 0) or 0))
    w.add_kv(f"{arch}.expert_weights_scale", 1.0)
    w.set_kv(f"{arch}.expert_weights_norm",
             bool(cfg.get("norm_topk_prob", False)))


def _bailingmoe_mapper(cfg: dict, hp: dict) -> Mapper:
    from .convert_hf import _permute_qk

    n_head, n_kv = hp["n_head"], hp["n_kv"]
    hd = int(cfg.get("head_dim") or hp["n_embd"] // n_head)
    norm_head = bool(cfg.get("norm_head"))

    def m(name: str, arr: np.ndarray):
        if name == "model.word_embeddings.weight":
            return [("token_embd.weight", arr)]
        if name == "lm_head.weight":
            if norm_head:  # folded output norm (BailingMoeModel norm_head)
                arr = arr / (np.linalg.norm(arr, axis=0, keepdims=True)
                             + 1e-7)
            return [("output.weight", arr)]
        if name.endswith("attention.dense.weight"):
            bid = name.split(".")[2]
            return [(f"blk.{bid}.attn_output.weight", arr)]
        if name.endswith("attention.query_key_value.weight"):
            bid = name.split(".")[2]
            p = f"blk.{bid}."
            q = arr[: n_head * hd]
            k = arr[n_head * hd: (n_head + n_kv) * hd]
            v = arr[(n_head + n_kv) * hd:]
            return [
                (p + "attn_q.weight", _permute_qk(q, n_head)),
                (p + "attn_k.weight", _permute_qk(k, n_kv)),
                (p + "attn_v.weight", v),
            ]
        return None  # generic llama/MoE mapping for everything else

    return m


register("bailing_moe", arch="bailingmoe", set_kv=_bailingmoe_kv,
         make_mapper=_bailingmoe_mapper)


def _llada_moe_kv(w, cfg: dict, hp: dict) -> None:
    """LLaDA-MoE diffusion LM (≡ LLaDAMoEModel :10180): qwen-moe tensor set
    + bidirectional diffusion metadata."""
    arch = "llada-moe"
    w.set_kv(f"{arch}.expert_count", int(cfg.get("num_experts", 0)))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    w.set_kv(f"{arch}.expert_feed_forward_length",
             int(cfg.get("expert_intermediate_size",
                         cfg.get("moe_intermediate_size", 0))))
    w.add_kv(f"{arch}.attention.causal", False)
    w.add_kv(f"{arch}.diffusion.shift_logits", False)
    w.add_kv("tokenizer.ggml.mask_token_id", 156895)


register("llada_moe", arch="llada-moe", set_kv=_llada_moe_kv)


def _afmoe_kv(w, cfg: dict, hp: dict) -> None:
    """AFMoE (≡ AfmoeModel :2692): gated attention, dual norm sandwiches,
    sigmoid-routed MoE with selection bias."""
    arch = "afmoe"
    for hf_key, gg_key in (("num_experts", "expert_count"),
                           ("num_experts_per_tok", "expert_used_count")):
        if cfg.get(hf_key) is not None:
            w.set_kv(f"{arch}.{gg_key}", int(cfg[hf_key]))
    if cfg.get("moe_intermediate_size") is not None:
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg["moe_intermediate_size"]))
    if cfg.get("num_shared_experts") is not None:
        w.add_kv(f"{arch}.expert_shared_count",
                 int(cfg["num_shared_experts"]))
    if cfg.get("num_dense_layers") is not None:
        w.add_kv(f"{arch}.leading_dense_block_count",
                 int(cfg["num_dense_layers"]))
    if cfg.get("route_norm") is not None:
        w.add_kv(f"{arch}.expert_weights_norm", bool(cfg["route_norm"]))
    if cfg.get("route_scale") is not None:
        w.add_kv(f"{arch}.expert_weights_scale", float(cfg["route_scale"]))
    if cfg.get("score_func", "sigmoid") == "sigmoid":
        w.add_kv(f"{arch}.expert_gating_func", 2)
    if cfg.get("global_attn_every_n_layers"):
        w.add_kv(f"{arch}.attention.sliding_window_pattern",
                 int(cfg["global_attn_every_n_layers"]))
        w.add_kv(f"{arch}.attention.no_rope_layer_step",
                 int(cfg["global_attn_every_n_layers"]))
    if cfg.get("rope_local_base_freq"):
        w.add_kv(f"{arch}.rope.freq_base_swa",
                 float(cfg["rope_local_base_freq"]))


def _afmoe_mapper(cfg: dict, hp: dict) -> Mapper:
    RENAME = {
        "post_attention_layernorm.weight": "post_attention_norm.weight",
        "pre_mlp_layernorm.weight": "ffn_norm.weight",
        "post_mlp_layernorm.weight": "post_ffw_norm.weight",
        "self_attn.gate_proj.weight": "attn_gate.weight",
        "mlp.router.gate.weight": "ffn_gate_inp.weight",
        "mlp.expert_bias": "exp_probs_b.bias",
        "mlp.shared_experts.gate_proj.weight": "ffn_gate_shexp.weight",
        "mlp.shared_experts.up_proj.weight": "ffn_up_shexp.weight",
        "mlp.shared_experts.down_proj.weight": "ffn_down_shexp.weight",
    }

    def m(name: str, arr: np.ndarray):
        if not name.startswith("model.layers."):
            return None
        parts = name.split(".", 3)
        mapped = RENAME.get(parts[3])
        if mapped:
            return [(f"blk.{parts[2]}.{mapped}", arr)]
        return None  # generic: q/k/v/o, norms, experts stacking

    return m


register("afmoe", arch="afmoe", set_kv=_afmoe_kv, make_mapper=_afmoe_mapper)


def _minimax_m2_kv(w, cfg: dict, hp: dict) -> None:
    """MiniMax-M2 (≡ MiniMaxM2Model :7784): mixtral-style expert tensors
    with a noaux_tc selection bias."""
    arch = "minimax-m2"
    w.set_kv(f"{arch}.expert_count", int(cfg.get("num_local_experts", 0)))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    w.add_kv(f"{arch}.expert_feed_forward_length",
             int(cfg.get("intermediate_size", 0)))
    if cfg.get("rotary_dim"):
        w.set_kv(f"{arch}.rope.dimension_count", int(cfg["rotary_dim"]))
    w.set_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(cfg.get("layernorm_epsilon",
                           cfg.get("rms_norm_eps", 1e-5))))


register("minimax_m2", arch="minimax-m2", set_kv=_minimax_m2_kv)


def _grovemoe_kv(w, cfg: dict, hp: dict) -> None:
    """GroveMoE (≡ GroveMoeModel :9653): adjugate chunk experts; group
    size / chunk ffn / scale are modeling-code constants."""
    arch = "grovemoe"
    w.set_kv(f"{arch}.expert_count", int(cfg.get("num_experts", 0)))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    if cfg.get("moe_intermediate_size") is not None:
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg["moe_intermediate_size"]))
    w.add_kv(f"{arch}.expert_chunk_feed_forward_length",
             int(cfg.get("head_dim") or 128))
    w.add_kv(f"{arch}.experts_per_group", 2)
    w.add_kv(f"{arch}.expert_group_scale", 0.05)


def _grovemoe_mapper(cfg: dict, hp: dict) -> Mapper:
    chunks: dict[str, dict[int, np.ndarray]] = {}

    def m(name: str, arr: np.ndarray):
        if name.endswith(".expert_bias"):
            return []  # unused in the modeling code
        if ".mlp.chunk_experts." in name:
            parts = name.split(".")
            li, ei, proj = parts[2], int(parts[5]), parts[6]
            key = {"gate_proj": f"blk.{li}.ffn_gate_chexps.weight",
                   "up_proj": f"blk.{li}.ffn_up_chexps.weight",
                   "down_proj": f"blk.{li}.ffn_down_chexps.weight"}.get(proj)
            if key is None:
                return []
            d = chunks.setdefault(key, {})
            d[ei] = arr
            n_chunk = int(cfg.get("num_experts", 0)) // 2
            if len(d) == n_chunk:
                return [(key, np.stack([d[i] for i in sorted(d)], axis=0))]
            return []
        return None  # generic qwen3-style attention + expert stacking

    return m


register("grove_moe", arch="grovemoe", set_kv=_grovemoe_kv,
         make_mapper=_grovemoe_mapper)
register("grovemoe", arch="grovemoe", set_kv=_grovemoe_kv,
         make_mapper=_grovemoe_mapper)


# ---------------------------------------------------------------------------
# Nemotron-H (+MoE): mamba2/attention/FFN hybrid under backbone.* naming
# ≡ convert_hf_to_gguf.py NemotronHModel (:9323)
# ---------------------------------------------------------------------------


def _nemotron_h_arch(cfg: dict) -> str:
    return ("nemotron_h_moe" if cfg.get("num_experts_per_tok") is not None
            else "nemotron_h")


def _nemotron_h_kv(w, cfg: dict, hp: dict) -> None:
    arch = _nemotron_h_arch(cfg)
    pattern = cfg["hybrid_override_pattern"]
    n_kv = int(cfg.get("num_key_value_heads", hp["n_head"]))
    kv_arr = [n_kv if c == "*" else 0 for c in pattern]
    w.set_kv(f"{arch}.attention.head_count_kv",
             np.asarray(kv_arr, dtype=np.int32))
    hd = int(cfg.get("head_dim", cfg.get("attention_head_dim", 128)))
    w.set_kv(f"{arch}.attention.key_length", hd)
    w.set_kv(f"{arch}.attention.value_length", hd)
    mamba_heads = int(cfg.get("mamba_num_heads",
                              cfg.get("num_heads", 128)))
    mamba_hd = int(cfg.get("mamba_head_dim", 64))
    w.add_kv(f"{arch}.ssm.conv_kernel", int(cfg.get("conv_kernel", 4)))
    w.add_kv(f"{arch}.ssm.inner_size", mamba_heads * mamba_hd)
    w.add_kv(f"{arch}.ssm.state_size", int(cfg.get("ssm_state_size", 128)))
    w.add_kv(f"{arch}.ssm.time_step_rank", mamba_heads)
    w.add_kv(f"{arch}.ssm.group_count", int(cfg.get("n_groups", 8)))
    if arch == "nemotron_h_moe":
        w.set_kv(f"{arch}.expert_count", int(cfg["n_routed_experts"]))
        w.set_kv(f"{arch}.expert_used_count",
                 int(cfg["num_experts_per_tok"]))
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg["moe_intermediate_size"]))
        w.add_kv(f"{arch}.expert_shared_count",
                 int(cfg.get("n_shared_experts", 0) or 0))
        if cfg.get("norm_topk_prob") is not None:
            w.set_kv(f"{arch}.expert_weights_norm",
                     bool(cfg["norm_topk_prob"]))
        if cfg.get("routed_scaling_factor") is not None:
            w.add_kv(f"{arch}.expert_weights_scale",
                     float(cfg["routed_scaling_factor"]))
        w.add_kv(f"{arch}.expert_gating_func", 2)


def _nemotron_h_mapper(cfg: dict, hp: dict) -> Mapper:
    n_expert = int(cfg.get("n_routed_experts", 0) or 0)
    experts: dict[str, dict[int, np.ndarray]] = {}
    MIX = {
        "mixer.in_proj.weight": "ssm_in.weight",
        "mixer.dt_bias": "ssm_dt.bias",
        "mixer.dt.bias": "ssm_dt.bias",
        "mixer.norm.weight": "ssm_norm.weight",
        "mixer.out_proj.weight": "ssm_out.weight",
        "mixer.q_proj.weight": "attn_q.weight",
        "mixer.k_proj.weight": "attn_k.weight",
        "mixer.v_proj.weight": "attn_v.weight",
        "mixer.o_proj.weight": "attn_output.weight",
        "mixer.up_proj.weight": "ffn_up.weight",
        "mixer.up_proj.bias": "ffn_up.bias",
        "mixer.down_proj.weight": "ffn_down.weight",
        "mixer.down_proj.bias": "ffn_down.bias",
        "mixer.gate.weight": "ffn_gate_inp.weight",
        "mixer.gate.e_score_correction_bias": "exp_probs_b.bias",
        "mixer.shared_experts.up_proj.weight": "ffn_up_shexp.weight",
        "mixer.shared_experts.down_proj.weight": "ffn_down_shexp.weight",
        "norm.weight": "attn_norm.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name == "backbone.embeddings.weight":
            return [("token_embd.weight", arr)]
        if name.startswith("backbone.norm_f."):
            return [("output_norm." + _wb(name), arr)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if not name.startswith("backbone.layers."):
            return []
        parts = name.split(".", 3)
        bid, rest = parts[2], parts[3]
        p = f"blk.{bid}."
        if rest == "mixer.conv1d.weight":
            return [(p + "ssm_conv1d.weight",
                     arr.reshape(arr.shape[0], arr.shape[-1]))]
        if rest == "mixer.conv1d.bias":
            return [(p + "ssm_conv1d.bias", arr)]
        if rest == "mixer.A_log":
            return [(p + "ssm_a", -np.exp(arr))]
        if rest == "mixer.D":
            return [(p + "ssm_d", arr)]
        if ".experts." in rest and "shared" not in rest:
            sub = rest.split(".")
            if sub[2].isdigit():  # per-expert mixer.experts.E.{up,down}_proj
                ei, proj = int(sub[2]), sub[3]
                key = {"up_proj": p + "ffn_up_exps.weight",
                       "down_proj": p + "ffn_down_exps.weight"}.get(proj)
                if key is None:
                    return []
                d = experts.setdefault(key, {})
                d[ei] = arr
                if n_expert and len(d) == n_expert:
                    return [(key,
                             np.stack([d[i] for i in sorted(d)], axis=0))]
                return []
            # pre-merged mixer.experts.{up,down}_proj 3-D tensors
            key = {"up_proj": p + "ffn_up_exps.weight",
                   "down_proj": p + "ffn_down_exps.weight"}.get(sub[2])
            return [(key, arr)] if key else []
        mapped = MIX.get(rest)
        return [(p + mapped, arr)] if mapped else []

    return m


register("nemotron_h", arch="nemotron_h", set_kv=_nemotron_h_kv,
         make_mapper=_nemotron_h_mapper, pick_arch=_nemotron_h_arch)


# ---------------------------------------------------------------------------
# simple llama-naming tails
# ---------------------------------------------------------------------------


def _maincoder_kv(w, cfg: dict, hp: dict) -> None:
    # ≡ MaincoderModel (:6808): rope dims = head_dim when config carries it
    if cfg.get("head_dim") is not None:
        w.set_kv("maincoder.rope.dimension_count", int(cfg["head_dim"]))


register("maincoder", arch="maincoder", set_kv=_maincoder_kv)


def _pangu_kv(w, cfg: dict, hp: dict) -> None:
    # ≡ PanguEmbeddedModel (:8044)
    w.set_kv("pangu-embedded.rope.dimension_count", hp["head_dim"])


register("pangu_embedded", arch="pangu-embedded", set_kv=_pangu_kv)
register("PanguEmbedded", arch="pangu-embedded", set_kv=_pangu_kv)


def _plm_kv(w, cfg: dict, hp: dict) -> None:
    """PLM (≡ PLMModel :8109): MLA attention dims + gateless ReLU² FFN;
    tensors ride the generic deepseek2-style map."""
    arch = "plm"
    qk_nope = int(cfg["qk_nope_head_dim"])
    qk_rope = int(cfg["qk_rope_head_dim"])
    w.add_kv(f"{arch}.attention.kv_lora_rank", int(cfg["kv_lora_rank"]))
    w.set_kv(f"{arch}.attention.key_length", qk_nope + qk_rope)
    w.set_kv(f"{arch}.attention.value_length",
             int(cfg.get("v_head_dim", qk_nope)))
    w.set_kv(f"{arch}.rope.dimension_count", qk_rope)


register("plm", arch="plm", set_kv=_plm_kv)


# ---------------------------------------------------------------------------
# Kimi-Linear (KDA + MLA hybrid) ≡ convert_hf_to_gguf.py KimiLinearModel
# (:5020). head_count_kv keeps the true MLA head count (the runtime's MLA
# cache stores the compressed latent per layer already).
# ---------------------------------------------------------------------------


def _kimi_linear_kv(w, cfg: dict, hp: dict) -> None:
    arch = "kimi-linear"
    lac = cfg.get("linear_attn_config") or {}
    full = set(lac.get("full_attn_layers") or [])
    n_layer = hp["n_layer"]
    kv_arr = [hp["n_head"] if (il + 1) in full else 0
              for il in range(n_layer)]
    w.set_kv(f"{arch}.attention.head_count_kv",
             np.asarray(kv_arr, dtype=np.int32))
    if lac.get("short_conv_kernel_size"):
        w.add_kv(f"{arch}.ssm.conv_kernel",
                 int(lac["short_conv_kernel_size"]))
    if lac.get("head_dim"):
        w.add_kv(f"{arch}.kda.head_dim", int(lac["head_dim"]))
    qk_nope = int(cfg["qk_nope_head_dim"])
    qk_rope = int(cfg["qk_rope_head_dim"])
    if cfg.get("q_lora_rank"):
        w.add_kv(f"{arch}.attention.q_lora_rank", int(cfg["q_lora_rank"]))
    w.add_kv(f"{arch}.attention.kv_lora_rank", int(cfg["kv_lora_rank"]))
    w.add_kv(f"{arch}.attention.key_length_mla", qk_nope + qk_rope)
    w.add_kv(f"{arch}.attention.value_length_mla", int(cfg["v_head_dim"]))
    w.set_kv(f"{arch}.rope.dimension_count", qk_rope)
    w.add_kv(f"{arch}.leading_dense_block_count",
             int(cfg.get("first_k_dense_replace", 0)))
    w.set_kv(f"{arch}.expert_count",
             int(cfg.get("num_local_experts", cfg.get("num_experts", 0))))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    w.add_kv(f"{arch}.expert_feed_forward_length",
             int(cfg["moe_intermediate_size"]))
    w.add_kv(f"{arch}.expert_shared_count",
             int(cfg.get("num_shared_experts", 0) or 0))
    if cfg.get("routed_scaling_factor") is not None:
        w.add_kv(f"{arch}.expert_weights_scale",
                 float(cfg["routed_scaling_factor"]))
    w.add_kv(f"{arch}.expert_gating_func", 2)


def _kimi_linear_mapper(cfg: dict, hp: dict) -> Mapper:
    n_head = hp["n_head"]
    qk_nope = int(cfg["qk_nope_head_dim"])
    v_dim = int(cfg["v_head_dim"])
    n_expert = int(cfg.get("num_local_experts", cfg.get("num_experts", 0)))
    experts: dict[str, dict[int, np.ndarray]] = {}
    KDA = {
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.q_conv1d.weight": "ssm_conv1d_q.weight",
        "self_attn.k_conv1d.weight": "ssm_conv1d_k.weight",
        "self_attn.v_conv1d.weight": "ssm_conv1d_v.weight",
        "self_attn.f_a_proj.weight": "ssm_f_a.weight",
        "self_attn.f_b_proj.weight": "ssm_f_b.weight",
        "self_attn.b_proj.weight": "ssm_beta.weight",
        "self_attn.g_a_proj.weight": "ssm_g_a.weight",
        "self_attn.g_b_proj.weight": "ssm_g_b.weight",
        "self_attn.o_norm.weight": "ssm_norm.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        # MLA layers
        "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
        "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
        "self_attn.q_a_proj.weight": "attn_q_a.weight",
        "self_attn.q_a_layernorm.weight": "attn_q_a_norm.weight",
        "self_attn.q_b_proj.weight": "attn_q_b.weight",
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
        "block_sparse_moe.gate.weight": "ffn_gate_inp.weight",
        "block_sparse_moe.gate.e_score_correction_bias": "exp_probs_b.bias",
        "block_sparse_moe.shared_experts.gate_proj.weight":
            "ffn_gate_shexp.weight",
        "block_sparse_moe.shared_experts.up_proj.weight":
            "ffn_up_shexp.weight",
        "block_sparse_moe.shared_experts.down_proj.weight":
            "ffn_down_shexp.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("token_embd.weight", arr)]
        if name == "model.norm.weight":
            return [("output_norm.weight", arr)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if not name.startswith("model.layers."):
            return []
        parts = name.split(".", 3)
        bid, rest = parts[2], parts[3]
        p = f"blk.{bid}."
        if rest.endswith("conv1d.weight") and arr.ndim == 2:
            arr = arr[:, None, :]  # (d_inner, d_conv) → (d_inner, 1, d_conv)
        if rest == "self_attn.A_log":
            return [(p + "ssm_a", -np.exp(arr).reshape(1, -1))]
        if rest == "self_attn.dt_bias":
            return [(p + "ssm_dt.bias", arr.reshape(-1))]
        if rest == "self_attn.kv_b_proj.weight":
            kv_b = arr.reshape(n_head, qk_nope + v_dim, arr.shape[-1])
            k_b = kv_b[:, :qk_nope].transpose(0, 2, 1)  # (H, kv_lora, nope)
            v_b = kv_b[:, qk_nope:]                     # (H, v, kv_lora)
            return [(p + "attn_k_b.weight", np.ascontiguousarray(k_b)),
                    (p + "attn_v_b.weight", np.ascontiguousarray(v_b))]
        if ".block_sparse_moe.experts." in name:
            sub = rest.split(".")
            ei, wid = int(sub[2]), sub[3]
            key = {"w1": p + "ffn_gate_exps.weight",
                   "w2": p + "ffn_down_exps.weight",
                   "w3": p + "ffn_up_exps.weight"}.get(wid)
            if key is None:
                return []
            d = experts.setdefault(key, {})
            d[ei] = arr
            if n_expert and len(d) == n_expert:
                return [(key, np.stack([d[i] for i in sorted(d)], axis=0))]
            return []
        mapped = KDA.get(rest)
        return [(p + mapped, arr)] if mapped else []

    return m


register("kimi_linear", arch="kimi-linear", set_kv=_kimi_linear_kv,
         make_mapper=_kimi_linear_mapper)


# ---------------------------------------------------------------------------
# LFM2-MoE ≡ LFM2MoeModel (:10530): lfm2 shortconv/attention hybrid whose
# FFN is a sigmoid-routed MoE with w1/w2/w3 experts and a selection bias
# ---------------------------------------------------------------------------


def _lfm2moe_kv(w, cfg: dict, hp: dict) -> None:
    arch = "lfm2moe"
    lt = cfg.get("layer_types") or []
    if lt:
        kv_arr = [hp["n_kv"] if t == "full_attention" else 0 for t in lt]
        w.set_kv(f"{arch}.attention.head_count_kv",
                 np.asarray(kv_arr, dtype=np.int32))
    w.add_kv(f"{arch}.shortconv.l_cache", int(cfg.get("conv_L_cache", 3)))
    w.set_kv(f"{arch}.expert_count", int(cfg["num_experts"]))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    w.add_kv(f"{arch}.expert_feed_forward_length",
             int(cfg["moe_intermediate_size"]))
    w.add_kv(f"{arch}.leading_dense_block_count",
             int(cfg.get("num_dense_layers", 0)))
    w.add_kv(f"{arch}.expert_gating_func", 2)
    if cfg.get("norm_topk_prob") is not None:
        w.set_kv(f"{arch}.expert_weights_norm", bool(cfg["norm_topk_prob"]))


def _lfm2moe_mapper(cfg: dict, hp: dict) -> Mapper:
    n_expert = int(cfg["num_experts"])
    experts: dict[str, dict[int, np.ndarray]] = {}

    def m(name: str, arr: np.ndarray):
        name = name.removeprefix("model.")
        if "conv.conv" in name and arr.ndim == 3:
            bid = name.split(".")[1]
            return [(f"blk.{bid}.shortconv.conv.weight",
                     arr.reshape(arr.shape[0], arr.shape[-1]))]
        if name.endswith(".feed_forward.gate.weight"):
            bid = name.split(".")[1]
            return [(f"blk.{bid}.ffn_gate_inp.weight", arr)]
        if name.endswith(".feed_forward.expert_bias"):
            bid = name.split(".")[1]
            return [(f"blk.{bid}.exp_probs_b.bias", arr)]
        if ".feed_forward.experts." in name:
            parts = name.split(".")
            bid, ei, wid = parts[1], int(parts[4]), parts[5]
            p = f"blk.{bid}."
            key = {"w1": p + "ffn_gate_exps.weight",
                   "w2": p + "ffn_down_exps.weight",
                   "w3": p + "ffn_up_exps.weight"}.get(wid)
            if key is None:
                return []
            d = experts.setdefault(key, {})
            d[ei] = arr
            if len(d) == n_expert:
                return [(key, np.stack([d[i] for i in sorted(d)], axis=0))]
            return []
        return None  # lfm2 naming handled by the generic map

    return m


register("lfm2_moe", arch="lfm2moe", set_kv=_lfm2moe_kv,
         make_mapper=_lfm2moe_mapper)


# ---------------------------------------------------------------------------
# Arctic / SmallThinker / RND1 / Deci
# ---------------------------------------------------------------------------


def _arctic_kv(w, cfg: dict, hp: dict) -> None:
    # ≡ ArcticModel (:7346): dense residual FFN + parallel MoE
    w.set_kv("arctic.expert_count", int(cfg.get("num_local_experts", 0)))
    w.set_kv("arctic.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    w.add_kv("arctic.expert_feed_forward_length",
             int(cfg.get("moe_intermediate_size",
                         cfg.get("intermediate_size", 0))))


def _arctic_mapper(cfg: dict, hp: dict) -> Mapper:
    from .convert_hf import _permute_qk

    n_head, n_kv = hp["n_head"], hp["n_kv"]
    n_expert = int(cfg.get("num_local_experts", 0))
    experts: dict[str, dict[int, np.ndarray]] = {}
    RENAME = {
        "residual_layernorm.weight": "ffn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm_exps.weight",
        "residual_mlp.w1.weight": "ffn_gate.weight",
        "residual_mlp.w2.weight": "ffn_down.weight",
        "residual_mlp.w3.weight": "ffn_up.weight",
    }

    def m(name: str, arr: np.ndarray):
        if not name.startswith("model.layers."):
            return None
        parts = name.split(".", 3)
        bid, rest = parts[2], parts[3]
        p = f"blk.{bid}."
        if rest.endswith("q_proj.weight"):
            return [(p + "attn_q.weight", _permute_qk(arr, n_head))]
        if rest.endswith("k_proj.weight"):
            return [(p + "attn_k.weight", _permute_qk(arr, n_kv))]
        mapped = RENAME.get(rest)
        if mapped:
            return [(p + mapped, arr)]
        if ".block_sparse_moe.experts." in name:
            sub = rest.split(".")
            ei, wid = int(sub[2]), sub[3]
            key = {"w1": p + "ffn_gate_exps.weight",
                   "w2": p + "ffn_down_exps.weight",
                   "w3": p + "ffn_up_exps.weight"}.get(wid)
            if key is None:
                return []
            d = experts.setdefault(key, {})
            d[ei] = arr
            if n_expert and len(d) == n_expert:
                return [(key, np.stack([d[i] for i in sorted(d)], axis=0))]
            return []
        return None

    return m


register("arctic", arch="arctic", set_kv=_arctic_kv,
         make_mapper=_arctic_mapper)


def _smallthinker_kv(w, cfg: dict, hp: dict) -> None:
    # ≡ SmallThinkerModel (:10669)
    arch = "smallthinker"
    n_exp = cfg.get("num_experts", cfg.get("moe_num_primary_experts"))
    if n_exp is not None:
        w.set_kv(f"{arch}.expert_count", int(n_exp))
    used = cfg.get("num_experts_per_tok",
                   cfg.get("moe_num_active_primary_experts"))
    if used is not None:
        w.set_kv(f"{arch}.expert_used_count", int(used))
    if cfg.get("moe_ffn_hidden_size") is not None:
        w.set_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg["moe_ffn_hidden_size"]))
        w.set_kv(f"{arch}.feed_forward_length",
                 int(cfg["moe_ffn_hidden_size"]))
    w.add_kv(f"{arch}.expert_gating_func",
             1 if cfg.get("moe_primary_router_apply_softmax") else 2)
    if any(cfg.get("sliding_window_layout") or []):
        if cfg.get("sliding_window_size"):
            w.add_kv(f"{arch}.attention.sliding_window",
                     int(cfg["sliding_window_size"]))


def _smallthinker_mapper(cfg: dict, hp: dict) -> Mapper:
    n_expert = int(cfg.get("num_experts",
                           cfg.get("moe_num_primary_experts", 0)) or 0)
    experts: dict[str, dict[int, np.ndarray]] = {}

    def m(name: str, arr: np.ndarray):
        if not name.startswith("model.layers."):
            return None
        parts = name.split(".", 3)
        bid, rest = parts[2], parts[3]
        p = f"blk.{bid}."
        if rest == "block_sparse_moe.primary_router.weight":
            return [(p + "ffn_gate_inp.weight", arr)]
        if ".block_sparse_moe.experts." in name:
            sub = rest.split(".")
            ei, wid = int(sub[2]), sub[3]
            key = {"gate": p + "ffn_gate_exps.weight",
                   "up": p + "ffn_up_exps.weight",
                   "down": p + "ffn_down_exps.weight"}.get(wid)
            if key is None:
                return []
            d = experts.setdefault(key, {})
            d[ei] = arr
            if n_expert and len(d) == n_expert:
                return [(key, np.stack([d[i] for i in sorted(d)], axis=0))]
            return []
        return None

    return m


register("smallthinker", arch="smallthinker", set_kv=_smallthinker_kv,
         make_mapper=_smallthinker_mapper)


def _rnd1_kv(w, cfg: dict, hp: dict) -> None:
    # ≡ RND1Model (:4347): qwen2moe tensor set, bidirectional denoiser
    arch = "rnd1"
    w.set_kv(f"{arch}.expert_count", int(cfg.get("num_experts", 0)))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    if cfg.get("moe_intermediate_size"):
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg["moe_intermediate_size"]))
    w.add_kv(f"{arch}.attention.causal", False)
    if cfg.get("mask_token_id") is not None:
        w.add_kv("tokenizer.ggml.mask_token_id", int(cfg["mask_token_id"]))


register("rnd1", arch="rnd1", set_kv=_rnd1_kv)


def _deci_ffn_dim(mult: float, n_embd: int) -> int:
    size = int(2 * mult * n_embd / 3)
    return size if size % 256 == 0 else size + 256 - (size % 256)


def _deci_kv(w, cfg: dict, hp: dict) -> None:
    """DeciLM / Llama-3_1-Nemotron NAS (≡ DeciModel :2984): per-layer
    attention/FFN shapes from block_configs."""
    arch = "deci"
    E = hp["n_embd"]
    n_head = hp["n_head"]
    if "block_configs" in cfg:
        heads, kvs, ffs = [], [], []
        for bc in cfg["block_configs"]:
            g = bc["attention"].get("n_heads_in_group")
            if g is None:
                kvs.append(0)
                heads.append(n_head if bc["attention"].get(
                    "replace_with_linear") else 0)
            else:
                kvs.append(n_head // int(g))
                heads.append(n_head)
            mult = bc["ffn"].get("ffn_mult")
            ffs.append(0 if mult is None else _deci_ffn_dim(float(mult), E))
        w.set_kv(f"{arch}.attention.head_count",
                 np.asarray(heads, dtype=np.int32))
        w.set_kv(f"{arch}.attention.head_count_kv",
                 np.asarray(kvs, dtype=np.int32))
        w.set_kv(f"{arch}.feed_forward_length",
                 np.asarray(ffs, dtype=np.int32))
    elif "num_key_value_heads_per_layer" in cfg:  # DeciLM-7B
        w.set_kv(f"{arch}.attention.head_count_kv",
                 np.asarray(cfg["num_key_value_heads_per_layer"],
                            dtype=np.int32))
    w.set_kv(f"{arch}.rope.dimension_count",
             int(cfg.get("head_dim") or E // n_head))


def _deci_mapper(cfg: dict, hp: dict) -> Mapper:
    from .convert_hf import _permute_qk

    n_head = hp["n_head"]
    kvs = []
    for bc in cfg.get("block_configs") or []:
        g = bc["attention"].get("n_heads_in_group")
        kvs.append(0 if g is None else n_head // int(g))

    def m(name: str, arr: np.ndarray):
        if not name.startswith("model.layers."):
            return None
        parts = name.split(".", 3)
        bid, rest = int(parts[2]), parts[3]
        p = f"blk.{bid}."
        if rest == "self_attn.linear_attn.weight":  # linear-attention layer
            return [(p + "attn_output.weight", arr)]
        if rest.endswith("q_proj.weight"):
            return [(p + "attn_q.weight", _permute_qk(arr, n_head))]
        if rest.endswith("k_proj.weight"):
            n_kv = kvs[bid] if bid < len(kvs) else hp["n_kv"]
            return [(p + "attn_k.weight", _permute_qk(arr, max(n_kv, 1)))]
        return None

    return m


register("nemotron-nas", arch="deci", set_kv=_deci_kv,
         make_mapper=_deci_mapper)
register("deci", arch="deci", set_kv=_deci_kv, make_mapper=_deci_mapper)


# ---------------------------------------------------------------------------
# Encoder tail: Nomic-BERT (+MoE), NeoBERT, Jina-BERT-v2, EmbeddingGemma,
# T5-encoder, CogVLM text stack
# ---------------------------------------------------------------------------


def _nomic_arch(cfg: dict) -> str:
    return ("nomic-bert-moe" if cfg.get("moe_every_n_layers")
            else "nomic-bert")


def _nomic_kv(w, cfg: dict, hp: dict) -> None:
    arch = _nomic_arch(cfg)
    # nomic configs use gpt2-style keys (n_embd/n_head/n_layer handled by
    # the generic header); trained positions cap the usable context
    # (≡ NomicBertModel.__init__ :5736)
    npos = int(cfg.get("n_positions", 2048))
    mtp = int(cfg.get("max_trained_positions", 2048))
    w.set_kv(f"{arch}.context_length",
             2048 if (npos == 8192 and mtp == 2048) else 512)
    w.add_kv(f"{arch}.attention.causal", False)
    w.add_kv(f"{arch}.pooling_type", 1)  # mean
    if cfg.get("rotary_emb_base"):
        w.set_kv(f"{arch}.rope.freq_base", float(cfg["rotary_emb_base"]))
    if cfg.get("moe_every_n_layers"):
        w.add_kv(f"{arch}.moe_every_n_layers",
                 int(cfg["moe_every_n_layers"]))
        w.set_kv(f"{arch}.expert_count", int(cfg["num_experts"]))
        w.set_kv(f"{arch}.expert_used_count", int(cfg.get("moe_top_k", 2)))


def _nomic_mapper(cfg: dict, hp: dict) -> Mapper:
    E = hp["n_embd"]
    n_expert = int(cfg.get("num_experts", 0) or 0)
    n_inner = int(cfg.get("n_inner", 4 * E))
    LAYER = {
        "attn.Wqkv.weight": "attn_qkv.weight",
        "attn.Wqkv.bias": "attn_qkv.bias",
        "attn.out_proj.weight": "attn_output.weight",
        "attn.out_proj.bias": "attn_output.bias",
        "norm1.weight": "attn_output_norm.weight",
        "norm1.bias": "attn_output_norm.bias",
        "norm2.weight": "layer_output_norm.weight",
        "norm2.bias": "layer_output_norm.bias",
        "mlp.fc11.weight": "ffn_up.weight",  # swiglu (v1)
        "mlp.fc12.weight": "ffn_gate.weight",
        "mlp.fc1.weight": "ffn_up.weight",  # gelu (moe dense layers)
        "mlp.fc1.bias": "ffn_up.bias",
        "mlp.fc2.weight": "ffn_down.weight",
        "mlp.fc2.bias": "ffn_down.bias",
        "mlp.router.layer.weight": "ffn_gate_inp.weight",
    }

    def m(name: str, arr: np.ndarray):
        top = {
            "embeddings.word_embeddings.weight": "token_embd.weight",
            "embeddings.token_type_embeddings.weight": "token_types.weight",
            "emb_ln.weight": "token_embd_norm.weight",
            "emb_ln.bias": "token_embd_norm.bias",
        }
        if name in top:
            return [(top[name], arr)]
        if not name.startswith("encoder.layers."):
            return []
        parts = name.split(".", 3)
        bid, rest = parts[2], parts[3]
        p = f"blk.{bid}."
        if rest == "mlp.experts.bias":
            return []
        if rest == "mlp.experts.mlp.w1":  # (E_out·ff, E) flat → stacked
            return [(p + "ffn_up_exps.weight",
                     arr.reshape(n_expert, n_inner, E))]
        if rest == "mlp.experts.mlp.w2":
            a = arr.reshape(n_expert, n_inner, E).transpose(0, 2, 1)
            return [(p + "ffn_down_exps.weight", np.ascontiguousarray(a))]
        mapped = LAYER.get(rest)
        return [(p + mapped, arr)] if mapped else []

    return m


register("nomic_bert", arch="nomic-bert", ln=True, set_kv=_nomic_kv,
         make_mapper=_nomic_mapper, pick_arch=_nomic_arch)


def _neobert_kv(w, cfg: dict, hp: dict) -> None:
    arch = "neo-bert"
    # ≡ NeoBert (:5817): ffn is 2/3 of intermediate_size, CLS pooling
    w.set_kv(f"{arch}.feed_forward_length",
             int(2 * int(cfg["intermediate_size"]) / 3))
    w.set_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(cfg.get("norm_eps", 1e-6)))
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.attention.causal", False)
    w.add_kv(f"{arch}.pooling_type", 2)  # cls


def _neobert_mapper(cfg: dict, hp: dict) -> Mapper:
    LAYER = {
        "attention_norm.weight": "attn_norm.weight",
        "qkv.weight": "attn_qkv.weight",
        "wo.weight": "attn_output.weight",
        "ffn_norm.weight": "ffn_norm.weight",
        "ffn.w12.weight": "ffn_up.weight",  # fused [gate|up]
        "ffn.w3.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        name = name.removeprefix("model.")
        if name.startswith("decoder."):
            return []
        if name == "encoder.weight":
            return [("token_embd.weight", arr)]
        if name == "layer_norm.weight":
            return [("enc.output_norm.weight", arr)]
        if name.startswith("transformer_encoder."):
            parts = name.split(".", 2)
            mapped = LAYER.get(parts[2])
            return [(f"blk.{parts[1]}.{mapped}", arr)] if mapped else []
        return []

    return m


register("neobert", arch="neo-bert", set_kv=_neobert_kv,
         make_mapper=_neobert_mapper)


def _jina_bert_v2_kv(w, cfg: dict, hp: dict) -> None:
    arch = "jina-bert-v2"
    w.add_kv(f"{arch}.attention.causal", False)
    w.add_kv(f"{arch}.pooling_type", 1)  # mean
    w.add_kv(f"{arch}.attention.max_alibi_bias", 8.0)


def _jina_bert_v2_mapper(cfg: dict, hp: dict) -> Mapper:
    LAYER = {
        "attention.self.query.weight": "attn_q.weight",
        "attention.self.query.bias": "attn_q.bias",
        "attention.self.key.weight": "attn_k.weight",
        "attention.self.key.bias": "attn_k.bias",
        "attention.self.value.weight": "attn_v.weight",
        "attention.self.value.bias": "attn_v.bias",
        "attention.self.layer_norm_q.weight": "attn_q_norm.weight",
        "attention.self.layer_norm_q.bias": "attn_q_norm.bias",
        "attention.self.layer_norm_k.weight": "attn_k_norm.weight",
        "attention.self.layer_norm_k.bias": "attn_k_norm.bias",
        "attention.output.dense.weight": "attn_output.weight",
        "attention.output.dense.bias": "attn_output.bias",
        "attention.output.LayerNorm.weight": "attn_output_norm.weight",
        "attention.output.LayerNorm.bias": "attn_output_norm.bias",
        "mlp.gated_layers.weight": "ffn_up.weight",  # fused GEGLU
        "mlp.gated_layers_w.weight": "ffn_gate.weight",
        "mlp.gated_layers_v.weight": "ffn_up.weight",
        "mlp.up_gated_layer.weight": "ffn_up.weight",
        "mlp.wo.weight": "ffn_down.weight",
        "mlp.wo.bias": "ffn_down.bias",
        "mlp.down_layer.weight": "ffn_down.weight",
        "mlp.layernorm.weight": "layer_output_norm.weight",
        "mlp.layernorm.bias": "layer_output_norm.bias",
    }

    def m(name: str, arr: np.ndarray):
        if name.startswith("bert."):
            name = name[len("bert."):]
        top = {
            "embeddings.word_embeddings.weight": "token_embd.weight",
            "embeddings.token_type_embeddings.weight": "token_types.weight",
            "embeddings.LayerNorm.weight": "token_embd_norm.weight",
            "embeddings.LayerNorm.bias": "token_embd_norm.bias",
        }
        if name in top:
            return [(top[name], arr)]
        if name.startswith("encoder.layer."):
            parts = name.split(".", 3)
            mapped = LAYER.get(parts[3])
            return [(f"blk.{parts[2]}.{mapped}", arr)] if mapped else []
        return []

    return m


register("jina_bert_v2", arch="jina-bert-v2", ln=True,
         set_kv=_jina_bert_v2_kv, make_mapper=_jina_bert_v2_mapper)


def _gemma_embedding_kv(w, cfg: dict, hp: dict) -> None:
    # EmbeddingGemma (≡ reference :6088 Gemma3TextModel registration):
    # gemma3 tensor set, bidirectional mean pooling
    arch = "gemma-embedding"
    if cfg.get("query_pre_attn_scalar"):
        w.add_kv(f"{arch}.attention.scale",
                 float(cfg["query_pre_attn_scalar"]) ** -0.5)
    if cfg.get("rope_local_base_freq"):
        w.add_kv(f"{arch}.rope.freq_base_swa",
                 float(cfg["rope_local_base_freq"]))
    swp = cfg.get("sliding_window_pattern")
    if swp and f"{arch}.attention.sliding_window_pattern" not in [
            k for k, _, _ in w._kv]:
        w.add_kv(f"{arch}.attention.sliding_window_pattern", int(swp))
    w.add_kv(f"{arch}.attention.causal", False)
    w.add_kv(f"{arch}.pooling_type", 1)  # mean


def _gemma_embedding_mapper(cfg: dict, hp: dict) -> Mapper:
    LAYER = {
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
    }

    def m(name: str, arr: np.ndarray):
        name = name.removeprefix("model.")
        if name == "embed_tokens.weight":
            return [("token_embd.weight", arr)]
        if name == "norm.weight":
            return [("output_norm.weight", arr + 1.0)]
        if name.startswith("layers."):
            parts = name.split(".", 2)
            mapped = LAYER.get(parts[2])
            if mapped is None:
                return []
            if mapped.endswith("norm.weight"):
                arr = arr + 1.0  # gemma stores w-1
            return [(f"blk.{parts[1]}.{mapped}", arr)]
        return []

    return m


register("gemma_embedding", arch="gemma-embedding",
         set_kv=_gemma_embedding_kv, make_mapper=_gemma_embedding_mapper)


def _t5encoder_mapper(cfg: dict, hp: dict) -> Mapper:
    from .convert_hf import _map_t5_name

    def m(name: str, arr: np.ndarray):
        if name == "shared.weight":
            return [("token_embd.weight", arr)]
        gname = _map_t5_name(name)
        return [(gname, arr)] if gname and not gname.startswith("dec") \
            else []

    return m


def _t5encoder_kv(w, cfg: dict, hp: dict) -> None:
    w.add_kv("t5encoder.attention.relative_buckets_count",
             int(cfg.get("relative_attention_num_buckets", 32)))
    w.set_kv("t5encoder.feed_forward_length",
             int(cfg.get("d_ff", 4 * hp["n_embd"])))
    if cfg.get("n_positions"):
        w.set_kv("t5encoder.context_length", int(cfg["n_positions"]))


register("t5encoder", arch="t5encoder", set_kv=_t5encoder_kv,
         make_mapper=_t5encoder_mapper)


def _cogvlm_mapper(cfg: dict, hp: dict) -> Mapper:
    """CogVLM text stack (≡ CogVLMModel :11079): dual language/vision
    expert projections; the vision tower exports via --mmproj."""
    LAYER = {
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "self_attn.language_expert_query_key_value.weight":
            "attn_qkv.weight",
        "self_attn.language_expert_dense.weight": "attn_output.weight",
        "self_attn.vision_expert_query_key_value.weight":
            "vis_attn_qkv.weight",
        "self_attn.vision_expert_dense.weight": "vis_attn_output.weight",
        "mlp.language_mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.language_mlp.up_proj.weight": "ffn_up.weight",
        "mlp.language_mlp.down_proj.weight": "ffn_down.weight",
        "mlp.vision_mlp.gate_proj.weight": "vis_gate.weight",
        "mlp.vision_mlp.up_proj.weight": "vis_up.weight",
        "mlp.vision_mlp.down_proj.weight": "vis_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name.startswith("model.vision."):
            return []
        name = name.removeprefix("model.")
        if name == "embed_tokens.weight":
            return [("token_embd.weight", arr)]
        if name == "norm.weight":
            return [("output_norm.weight", arr)]
        if name == "lm_head.weight":
            return [("output.weight", arr)]
        if name.startswith("layers."):
            parts = name.split(".", 2)
            mapped = LAYER.get(parts[2])
            return [(f"blk.{parts[1]}.{mapped}", arr)] if mapped else []
        return []

    return m


register("cogvlm", arch="cogvlm", make_mapper=_cogvlm_mapper)


# ---------------------------------------------------------------------------
# final tail: llama-embed, BailingMoeV2, Grok, EXAONE-MoE, MiMo-V2, Step-3.5
# ---------------------------------------------------------------------------

# LlamaModel encoder-only exports (≡ reference LLAMA_EMBED registration):
# plain llama tensors, bidirectional mean-pooled embedding use
register("llama_embed", arch="llama-embed", permute_qk=True)


def _bailingmoe2_kv(w, cfg: dict, hp: dict) -> None:
    """Ling-2.0 / BailingMoeV2 (≡ BailingMoeV2Model :9577)."""
    arch = "bailingmoe2"
    w.set_kv(f"{arch}.rope.dimension_count",
             int(hp["head_dim"] * float(cfg.get("partial_rotary_factor",
                                                0.5))))
    w.add_kv(f"{arch}.leading_dense_block_count",
             int(cfg.get("first_k_dense_replace", 0)))
    w.set_kv(f"{arch}.expert_count", int(cfg["num_experts"]))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    w.add_kv(f"{arch}.expert_feed_forward_length",
             int(cfg["moe_intermediate_size"]))
    w.add_kv(f"{arch}.expert_shared_feed_forward_length",
             int(cfg.get("moe_shared_expert_intermediate_size")
                 or cfg["moe_intermediate_size"]
                 * int(cfg.get("num_shared_experts", 1))))
    w.add_kv(f"{arch}.expert_shared_count",
             int(cfg.get("num_shared_experts", 0) or 0))
    if cfg.get("routed_scaling_factor") is not None:
        w.add_kv(f"{arch}.expert_weights_scale",
                 float(cfg["routed_scaling_factor"]))
    w.set_kv(f"{arch}.expert_weights_norm",
             bool(cfg.get("norm_topk_prob", False)))
    if cfg.get("score_function", "sigmoid") == "sigmoid":
        w.add_kv(f"{arch}.expert_gating_func", 2)


def _bailingmoe2_mapper(cfg: dict, hp: dict) -> Mapper:
    n_head, n_kv = hp["n_head"], hp["n_kv"]
    hd = int(cfg.get("head_dim") or hp["n_embd"] // n_head)
    RENAME = {
        "attention.dense.weight": "attn_output.weight",
        "attention.query_layernorm.weight": "attn_q_norm.weight",
        "attention.key_layernorm.weight": "attn_k_norm.weight",
        "mlp.gate.expert_bias": "exp_probs_b.bias",
    }

    def m(name: str, arr: np.ndarray):
        if name.startswith("model.mtp") or ".mtp." in name:
            return []
        if name == "model.word_embeddings.weight":
            return [("token_embd.weight", arr)]
        if not name.startswith("model.layers."):
            return None
        parts = name.split(".", 3)
        bid, rest = parts[2], parts[3]
        p = f"blk.{bid}."
        if rest == "attention.query_key_value.weight":
            q = arr[: n_head * hd]
            k = arr[n_head * hd: (n_head + n_kv) * hd]
            v = arr[(n_head + n_kv) * hd:]
            return [(p + "attn_q.weight", q), (p + "attn_k.weight", k),
                    (p + "attn_v.weight", v)]  # NEOX rope: no permute
        mapped = RENAME.get(rest)
        if mapped:
            return [(p + mapped, arr)]
        return None  # generic qwen-moe mapping + expert stacking

    return m


register("bailing_moe_v2", arch="bailingmoe2", set_kv=_bailingmoe2_kv,
         make_mapper=_bailingmoe2_mapper)
register("bailing_moe2", arch="bailingmoe2", set_kv=_bailingmoe2_kv,
         make_mapper=_bailingmoe2_mapper)


def _grok_kv(w, cfg: dict, hp: dict) -> None:
    """Grok-1/2 (≡ GrokModel :3197)."""
    arch = "grok"
    w.add_kv(f"{arch}.attn_logit_softcapping",
             float(cfg.get("attn_logit_softcapping", 30.0) or 30.0))
    if cfg.get("final_logit_softcapping"):
        w.add_kv(f"{arch}.final_logit_softcapping",
                 float(cfg["final_logit_softcapping"]))
    if cfg.get("moe_intermediate_size") is not None:
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(cfg["moe_intermediate_size"]))
    w.set_kv(f"{arch}.expert_count", int(cfg.get("num_local_experts",
                                                 cfg.get("num_experts", 0))))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    if cfg.get("embedding_multiplier_scale") is not None:
        w.add_kv(f"{arch}.embedding_scale",
                 float(cfg["embedding_multiplier_scale"]))
    if cfg.get("output_multiplier_scale") is not None:
        w.set_kv(f"{arch}.logit_scale",
                 float(cfg["output_multiplier_scale"]))
    if cfg.get("attn_output_multiplier") is not None:
        w.add_kv(f"{arch}.attention.output_scale",
                 float(cfg["attn_output_multiplier"]))


def _grok_mapper(cfg: dict, hp: dict) -> Mapper:
    """Grok-1 transformer.decoder_layer.* naming with merged moe.linear*
    tensors, plus the grok-2 model.layers.* norm names."""
    L1 = {
        "rms_norm.weight": "attn_norm.weight",
        "rms_norm_1.weight": "attn_output_norm.weight",
        "rms_norm_2.weight": "ffn_norm.weight",
        "rms_norm_3.weight": "layer_output_norm.weight",
        "multi_head_attention.query.weight": "attn_q.weight",
        "multi_head_attention.key.weight": "attn_k.weight",
        "multi_head_attention.value.weight": "attn_v.weight",
        "multi_head_attention.linear.weight": "attn_output.weight",
        "router.weight": "ffn_gate_inp.weight",
        "moe.linear.weight": "ffn_gate_exps.weight",   # merged (E, ff, d)
        "moe.linear_1.weight": "ffn_down_exps.weight",
        "moe.linear_v.weight": "ffn_up_exps.weight",
    }
    L2 = {
        "pre_attn_norm.weight": "attn_norm.weight",
        "post_attn_norm.weight": "attn_output_norm.weight",
        "pre_moe_norm.weight": "ffn_norm.weight",
        "post_moe_norm.weight": "layer_output_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "router.weight": "ffn_gate_inp.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }
    n_expert = int(cfg.get("num_local_experts",
                           cfg.get("num_experts", 0)) or 0)
    experts: dict[str, dict[int, np.ndarray]] = {}

    def m(name: str, arr: np.ndarray):
        if name == "transformer.in_out_embed.weight":
            return [("token_embd.weight", arr)]
        if name == "transformer.rms_norm.weight":
            return [("output_norm.weight", arr)]
        if name in ("lm_head.weight", "model.embed_tokens.weight",
                    "model.norm.weight"):
            gg = {"lm_head.weight": "output.weight",
                  "model.embed_tokens.weight": "token_embd.weight",
                  "model.norm.weight": "output_norm.weight"}[name]
            return [(gg, arr)]
        for pfx, table in (("transformer.decoder_layer.", L1),
                           ("model.layers.", L2)):
            if not name.startswith(pfx):
                continue
            parts = name[len(pfx):].split(".", 1)
            bid, rest = parts[0], parts[1]
            p = f"blk.{bid}."
            if ".block_sparse_moe.experts." in name or \
                    ".moe.experts." in name:
                sub = rest.split(".")
                ei, wid = int(sub[2]), sub[3]
                key = {"w1": p + "ffn_gate_exps.weight",
                       "w2": p + "ffn_down_exps.weight",
                       "w3": p + "ffn_up_exps.weight",
                       "gate_proj": p + "ffn_gate_exps.weight",
                       "down_proj": p + "ffn_down_exps.weight",
                       "up_proj": p + "ffn_up_exps.weight"}.get(wid)
                if key is None:
                    return []
                d = experts.setdefault(key, {})
                d[ei] = arr
                if n_expert and len(d) == n_expert:
                    return [(key,
                             np.stack([d[i] for i in sorted(d)], axis=0))]
                return []
            mapped = table.get(rest)
            return [(p + mapped, arr)] if mapped else []
        return []

    return m


register("grok-1", arch="grok", set_kv=_grok_kv, make_mapper=_grok_mapper)
register("grok", arch="grok", set_kv=_grok_kv, make_mapper=_grok_mapper)


def _exaone_moe_kv(w, cfg: dict, hp: dict) -> None:
    """EXAONE-MoE (≡ ExaoneMoeModel :9004)."""
    arch = "exaone-moe"
    w.set_kv(f"{arch}.expert_count", int(cfg["num_experts"]))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    moe_ff = int(cfg["moe_intermediate_size"])
    n_sh = int(cfg.get("num_shared_experts", 0) or 0)
    w.add_kv(f"{arch}.expert_feed_forward_length", moe_ff)
    w.add_kv(f"{arch}.expert_shared_count", n_sh)
    w.add_kv(f"{arch}.expert_shared_feed_forward_length", moe_ff * n_sh)
    if cfg.get("routed_scaling_factor") is not None:
        w.add_kv(f"{arch}.expert_weights_scale",
                 float(cfg["routed_scaling_factor"]))
    if cfg.get("norm_topk_prob") is not None:
        w.set_kv(f"{arch}.expert_weights_norm", bool(cfg["norm_topk_prob"]))
    w.add_kv(f"{arch}.leading_dense_block_count",
             int(cfg.get("first_k_dense_replace",
                         cfg.get("first_last_k_dense_replace",
                                 cfg.get("num_dense_layers", 0)))))


def _exaone_moe_mapper(cfg: dict, hp: dict) -> Mapper:
    def m(name: str, arr: np.ndarray):
        if name.startswith("mtp."):
            return []  # next-token-prediction head (not served)
        if name.endswith("mlp.e_score_correction_bias") or \
                name.endswith("mlp.gate.e_score_correction_bias"):
            bid = name.split(".")[2]
            return [(f"blk.{bid}.exp_probs_b.bias", arr.reshape(-1))]
        return None  # generic llama/qwen-moe mapping

    return m


register("exaone_moe", arch="exaone-moe", set_kv=_exaone_moe_kv,
         make_mapper=_exaone_moe_mapper)


def _mimo2_kv(w, cfg: dict, hp: dict) -> None:
    """MiMo-V2-Flash (≡ MimoV2Model :7835): hybrid SWA with sinks +
    noaux_tc sigmoid MoE."""
    arch = "mimo2"
    pattern = cfg["hybrid_layer_pattern"]
    n_kv = int(cfg["num_key_value_heads"])
    n_kv_swa = int(cfg.get("swa_num_key_value_heads", n_kv))
    kv_arr = [n_kv_swa if int(s) == 1 else n_kv for s in pattern]
    w.set_kv(f"{arch}.attention.head_count_kv",
             np.asarray(kv_arr, dtype=np.int32))
    w.add_kv(f"{arch}.attention.sliding_window",
             int(cfg["sliding_window"]))
    w.add_kv(f"{arch}.attention.sliding_window_pattern",
             np.asarray([int(s) == 1 for s in pattern], dtype=bool))
    w.set_kv(f"{arch}.attention.value_length", int(cfg["v_head_dim"]))
    w.set_kv(f"{arch}.expert_count", int(cfg["n_routed_experts"]))
    w.set_kv(f"{arch}.expert_used_count",
             int(cfg.get("num_experts_per_tok", 2)))
    w.add_kv(f"{arch}.expert_feed_forward_length",
             int(cfg["moe_intermediate_size"]))
    w.set_kv(f"{arch}.rope.dimension_count",
             int(int(cfg["head_dim"])
                 * float(cfg.get("partial_rotary_factor", 1.0))))
    w.set_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(cfg.get("layernorm_epsilon", 1e-5)))
    if cfg.get("rope_theta_swa"):
        w.add_kv(f"{arch}.rope.freq_base_swa", float(cfg["rope_theta_swa"]))
    w.add_kv(f"{arch}.expert_gating_func", 2)  # noaux_tc sigmoid


def _mimo2_mapper(cfg: dict, hp: dict) -> Mapper:
    def m(name: str, arr: np.ndarray):
        if "model.mtp." in name:
            return []
        if name.endswith("self_attn.attention_sink") or \
                name.endswith("self_attn.attention_sink_bias"):
            bid = name.split(".")[2]
            return [(f"blk.{bid}.attn_sinks.weight", arr.reshape(-1))]
        if name.endswith("mlp.gate.e_score_correction_bias"):
            bid = name.split(".")[2]
            return [(f"blk.{bid}.exp_probs_b.bias", arr.reshape(-1))]
        return None  # generic llama/qwen-moe mapping + expert stacking

    return m


register("mimo2", arch="mimo2", set_kv=_mimo2_kv, make_mapper=_mimo2_mapper)
register("mimo_v2_flash", arch="mimo2", set_kv=_mimo2_kv,
         make_mapper=_mimo2_mapper)


def _step35_kv(w, cfg: dict, hp: dict) -> None:
    """Step-3.5 (≡ Step35Model :7915): NAS'd SWA head counts, head-wise
    attention gate, merged MoE tensors with a router bias."""
    arch = "step35"
    layer_types = (cfg.get("layer_types") or [])[: hp["n_layer"]]
    other = cfg.get("attention_other_setting") or {}
    n_head = hp["n_head"]
    n_kv = int(cfg.get("num_attention_groups",
                       cfg.get("num_key_value_heads", n_head)))
    n_head_swa = int(other.get("num_attention_heads", n_head))
    n_kv_swa = int(other.get("num_attention_groups", n_kv))
    head_arr = [n_head_swa if t == "sliding_attention" else n_head
                for t in layer_types]
    kv_arr = [n_kv_swa if t == "sliding_attention" else n_kv
              for t in layer_types]
    if head_arr:
        w.set_kv(f"{arch}.attention.head_count",
                 np.asarray(head_arr, dtype=np.int32))
        w.set_kv(f"{arch}.attention.head_count_kv",
                 np.asarray(kv_arr, dtype=np.int32))
        w.add_kv(f"{arch}.attention.sliding_window_pattern",
                 np.asarray([t == "sliding_attention" for t in layer_types],
                            dtype=bool))
    if cfg.get("sliding_window"):
        w.add_kv(f"{arch}.attention.sliding_window",
                 int(cfg["sliding_window"]))
    hd = int(cfg.get("head_dim", hp["head_dim"]))
    w.set_kv(f"{arch}.attention.key_length", hd)
    w.set_kv(f"{arch}.attention.value_length", hd)
    w.set_kv(f"{arch}.expert_count", int(cfg["moe_num_experts"]))
    w.set_kv(f"{arch}.expert_used_count", int(cfg.get("moe_top_k", 2)))
    w.add_kv(f"{arch}.expert_feed_forward_length",
             int(cfg["moe_intermediate_size"]))
    if cfg.get("share_expert_dim"):
        w.add_kv(f"{arch}.expert_shared_feed_forward_length",
                 int(cfg["share_expert_dim"]))
    if cfg.get("moe_router_scaling_factor") is not None:
        w.add_kv(f"{arch}.expert_weights_scale",
                 float(cfg["moe_router_scaling_factor"]))
    if cfg.get("norm_expert_weight") is not None:
        w.set_kv(f"{arch}.expert_weights_norm",
                 bool(cfg["norm_expert_weight"]))
    w.add_kv(f"{arch}.expert_gating_func", 2)
    rt = cfg.get("rope_theta")
    if isinstance(rt, list):
        w.set_kv(f"{arch}.rope.freq_base", float(rt[0]))
        w.add_kv(f"{arch}.rope.freq_base_swa", float(rt[1]))


def _step35_mapper(cfg: dict, hp: dict) -> Mapper:
    n_main = int(cfg.get("num_hidden_layers", hp["n_layer"]))
    RENAME = {
        "self_attn.g_proj.weight": "attn_gate.weight",
        "moe.gate.weight": "ffn_gate_inp.weight",
        "moe.router_bias": "exp_probs_b.bias",
        "moe.gate_proj.weight": "ffn_gate_exps.weight",  # merged (E,ff,d)
        "moe.up_proj.weight": "ffn_up_exps.weight",
        "moe.down_proj.weight": "ffn_down_exps.weight",
        "share_expert.gate_proj.weight": "ffn_gate_shexp.weight",
        "share_expert.up_proj.weight": "ffn_up_shexp.weight",
        "share_expert.down_proj.weight": "ffn_down_shexp.weight",
    }

    SQUEEZED = {"self_attn.g_proj.weight", "moe.gate.weight",
                "moe.up_proj.weight", "moe.gate_proj.weight",
                "moe.down_proj.weight"}

    def m(name: str, arr: np.ndarray):
        if name == "model.norm.weight":  # all norms store w+1 (≡ Step35)
            return [("output_norm.weight", arr + 1.0)]
        if not name.startswith("model.layers."):
            return None
        parts = name.split(".", 3)
        bid, rest = int(parts[2]), parts[3]
        if bid >= n_main:
            return []  # mtp layers
        p = f"blk.{bid}."
        if rest.endswith("norm.weight"):
            gg = {"input_layernorm.weight": "attn_norm.weight",
                  "post_attention_layernorm.weight": "ffn_norm.weight",
                  "self_attn.q_norm.weight": "attn_q_norm.weight",
                  "self_attn.k_norm.weight": "attn_k_norm.weight"}.get(rest)
            return [(p + gg, arr + 1.0)] if gg else []
        mapped = RENAME.get(rest)
        if mapped:
            if rest in SQUEEZED:
                arr = arr.squeeze()
            return [(p + mapped, arr)]
        return None  # q/k/v/o via the generic map

    return m


register("step3p5", arch="step35", set_kv=_step35_kv,
         make_mapper=_step35_mapper)
register("step35", arch="step35", set_kv=_step35_kv,
         make_mapper=_step35_mapper)


# ---------------------------------------------------------------------------
# Refact, XLM-RoBERTa (bge-m3 / jina-embeddings-v3), WavTokenizer decoder
# ---------------------------------------------------------------------------


def _refact_ff(cfg: dict) -> int:
    """Refact derives n_ff from n_embd (≡ RefactModel :2339: 2/3 of 4E
    rounded up to 256)."""
    hidden = int(2 * (4 * int(cfg["n_embd"])) / 3)
    return 256 * ((hidden + 255) // 256)


def _refact_kv(w, cfg: dict, hp: dict) -> None:
    arch = "refact"
    w.set_kv(f"{arch}.context_length", int(cfg.get("n_positions", 4096)))
    w.set_kv(f"{arch}.feed_forward_length", _refact_ff(cfg))
    w.set_kv(f"{arch}.attention.head_count_kv", 1)  # MQA
    w.set_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(cfg.get("layer_norm_epsilon", 1e-5)))


def _refact_mapper(cfg: dict, hp: dict) -> Mapper:
    E = int(cfg["n_embd"])
    hd = E // int(cfg["n_head"])
    ff = _refact_ff(cfg)
    TOP = {
        "transformer.wte.weight": "token_embd.weight",
        "transformer.ln_f.weight": "output_norm.weight",
        "lm_head.weight": "output.weight",
    }
    L = {
        "ln_1.weight": "attn_norm.weight",
        "ln_2.weight": "ffn_norm.weight",
        "attn.q.weight": "attn_q.weight",
        "attn.c_proj.weight": "attn_output.weight",
        "mlp.c_proj.weight": "ffn_down.weight",
    }

    def m(name: str, arr: np.ndarray):
        if name in TOP:
            return [(TOP[name], arr)]
        if not name.startswith("transformer.h."):
            return []
        parts = name.split(".", 3)
        p = f"blk.{parts[2]}."
        rest = parts[3]
        if rest == "attn.kv.weight":  # fused single-head K|V
            return [(p + "attn_k.weight", arr[:hd]),
                    (p + "attn_v.weight", arr[hd:])]
        if rest == "mlp.gate_up_proj.weight":  # fused gate|up at derived ff
            return [(p + "ffn_gate.weight", arr[:ff]),
                    (p + "ffn_up.weight", arr[ff:])]
        mapped = L.get(rest)
        return [(p + mapped, arr)] if mapped else []

    return m


register("gpt_refact", arch="refact", set_kv=_refact_kv,
         make_mapper=_refact_mapper)


def _xlmr_arch(cfg: dict) -> str:
    """jina-embeddings-v3 announces itself via lora_adaptations
    (≡ XLMRobertaModel :5845 → JINA_BERT_V3); plain XLM-RoBERTa
    (bge-m3 etc.) is the bert graph."""
    return "jina-bert-v3" if cfg.get("lora_adaptations") else "bert"


def _xlmr_kv(w, cfg: dict, hp: dict) -> None:
    arch = _xlmr_arch(cfg)
    w.add_kv(f"{arch}.attention.causal", False)
    w.add_kv(f"{arch}.pooling_type", 1)  # mean
    # fairseq position convention: ids start at pad+1, so usable context
    # shrinks by the offset (≡ _xlmroberta_tokenizer_init :5534)
    pad = cfg.get("pad_token_id")
    pad = 1 if pad is None else int(pad)  # 0 is a legal pad id
    w.set_kv(f"{arch}.context_length",
             int(cfg.get("max_position_embeddings", 514)) - (pad + 1))
    if arch == "jina-bert-v3" and cfg.get("rotary_emb_base"):
        w.set_kv(f"{arch}.rope.freq_base", float(cfg["rotary_emb_base"]))


def _xlmr_mapper(cfg: dict, hp: dict) -> Mapper:
    from .convert_hf import _map_bert_name

    pad = cfg.get("pad_token_id")
    pad = 1 if pad is None else int(pad)  # 0 is a legal pad id
    jina = bool(cfg.get("lora_adaptations"))

    def m(name: str, arr: np.ndarray):
        if name.startswith("roberta."):
            name = name[len("roberta."):]
        if ".parametrizations." in name:  # jina-v3 torch parametrize wrap
            name = name.replace(".parametrizations.", ".")
            if name.endswith(".original"):
                name = name[: -len(".original")]
        if (".lora_A" in name or ".lora_B" in name
                or name.startswith(("pooler.", "lm_head.", "classifier."))):
            return []  # per-task adapters + heads: not the embedding graph
        if name == "embeddings.position_embeddings.weight":
            if jina:
                return []  # v3 ropes; no learned positions
            return [("position_embd.weight", arr[pad + 1:])]
        mapped = _map_bert_name(name)
        return [(mapped, arr)] if mapped else []

    return m


register("xlm-roberta", arch="bert", ln=True, pick_arch=_xlmr_arch,
         set_kv=_xlmr_kv, make_mapper=_xlmr_mapper)


def convert_vocab_xlmroberta(w, src_dir: str, cfg: dict) -> bool:
    """UGM vocab from sentencepiece.bpe.model with the fairseq realignment
    (≡ _xlmroberta_set_vocab :5543: [<s>, <pad>, </s>, <unk>] + pieces[3:],
    tokenizer model "t5")."""
    import os

    # only XLM-R-family checkpoints use the fairseq-aligned vocab; other
    # models may legitimately ship a legacy sentencepiece.bpe.model next to
    # their real tokenizer.json and must NOT take this branch
    if cfg.get("model_type") not in ("xlm-roberta", "roberta", "bert"):
        return False
    path = os.path.join(src_dir, "sentencepiece.bpe.model")
    if not os.path.exists(path):
        return False
    from ..gguf.constants import TokenType
    from .convert_hf import _SPM_TYPE_MAP, _parse_spm

    pieces = _parse_spm(path)
    toks = [p[0] for p in pieces]
    scores = [p[1] for p in pieces]
    types = [int(_SPM_TYPE_MAP.get(p[2], TokenType.NORMAL)) for p in pieces]
    # realign: fairseq specials take ids 0-3, spm's own specials drop
    toks = ["<s>", "<pad>", "</s>", "<unk>"] + toks[3:]
    scores = [0.0, 0.0, 0.0, 0.0] + scores[3:]
    types = [int(TokenType.CONTROL)] * 3 + [int(TokenType.UNKNOWN)] \
        + types[3:]
    n_vocab = int(cfg.get("vocab_size", 0) or 0)
    while n_vocab and len(toks) < n_vocab:
        toks.append(f"[PAD{len(toks)}]")
        scores.append(-10000.0)
        types.append(int(TokenType.UNUSED))
    w.add_kv("tokenizer.ggml.model", "t5")
    w.add_kv("tokenizer.ggml.pre", "default")
    w.add_kv("tokenizer.ggml.tokens", toks)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.add_space_prefix", True)
    w.add_kv("tokenizer.ggml.bos_token_id", 0)
    w.add_kv("tokenizer.ggml.padding_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 3)
    return True


def _wavtok_kv(w, cfg: dict, hp: dict) -> None:
    """WavTokenizer decoder metadata (≡ WavTokenizerDecModel :4049)."""
    arch = "wavtokenizer-dec"
    w.set_kv(f"{arch}.vocab_size", int(cfg["vocab_size"]))
    w.set_kv(f"{arch}.features_length", int(cfg["n_embd_features"]))
    w.set_kv(f"{arch}.feed_forward_length", int(cfg.get("n_ff", 0)))
    w.add_kv(f"{arch}.attention.group_norm_epsilon",
             float(cfg.get("group_norm_epsilon", 1e-6)))
    w.add_kv(f"{arch}.attention.group_norm_groups",
             int(cfg.get("group_norm_groups", 32)))
    w.set_kv(f"{arch}.posnet.embedding_length",
             int(cfg["posnet"]["n_embd"]))
    w.set_kv(f"{arch}.posnet.block_count", int(cfg["posnet"]["n_layer"]))
    w.set_kv(f"{arch}.convnext.embedding_length",
             int(cfg["convnext"]["n_embd"]))
    w.set_kv(f"{arch}.convnext.block_count",
             int(cfg["convnext"]["n_layer"]))
    w.add_kv(f"{arch}.attention.causal", False)
    w.set_kv("tokenizer.ggml.model", "none")


def _wavtok_mapper(cfg: dict, hp: dict) -> Mapper:
    # posnet block layout is fixed: [res, res, ATTENTION, res, res, NORM]
    # (WavTokenizerDec's 6-block posnet) — both the attention block's
    # group-norm and the final norm are called "norm" in the checkpoint,
    # so the block index disambiguates (gguf-py's tensor map carries the
    # same collision, tensor_mapping.py:1251 vs :1263)
    n_pos = int((cfg.get("posnet") or {}).get("n_layer", 6))
    attn_blocks = {str(i) for i in range(n_pos) if i % 3 == 2 and
                   i != n_pos - 1}
    POS = {"conv1": "conv1", "conv2": "conv2", "norm": "norm",
           "norm1": "norm1", "norm2": "norm2", "q": "attn_q",
           "k": "attn_k", "v": "attn_v", "proj_out": "attn_output"}
    CNX = {"dwconv": "dw", "norm": "norm", "pwconv1": "pw1",
           "pwconv2": "pw2", "gamma": "gamma"}

    def m(name: str, arr: np.ndarray):
        if name.endswith(("codebook.cluster_size", "codebook.embed_avg",
                          "codebook.inited")):
            return []
        if name.endswith("codebook.embed"):  # VQ codes table
            return [("token_embd.weight", arr)]
        if name.startswith("backbone.embed."):  # input conv
            return [("conv1d." + _wb(name), arr)]
        if name.startswith("backbone.norm."):
            return [("token_embd_norm." + _wb(name), arr)]
        if name.startswith("backbone.final_layer_norm."):
            return [("output_norm." + _wb(name), arr)]
        if name.startswith("head.out."):
            return [("output." + _wb(name), arr)]
        for pfx, table, gg in (("backbone.posnet.", POS, "posnet"),
                               ("backbone.convnext.", CNX, "convnext")):
            if not name.startswith(pfx):
                continue
            parts = name[len(pfx):].split(".")
            bid = parts[0]
            stem = parts[1]
            suffix = parts[2] if len(parts) > 2 else "weight"
            mapped = table.get(stem)
            if gg == "posnet" and stem == "norm" and bid in attn_blocks:
                mapped = "attn_norm"
            if mapped is None:
                return []
            return [(f"{gg}.{bid}.{mapped}.{suffix}", arr)]
        return []

    return m


register("wavtokenizer-dec", arch="wavtokenizer-dec", set_kv=_wavtok_kv,
         make_mapper=_wavtok_mapper)
register("wavtokenizer", arch="wavtokenizer-dec", set_kv=_wavtok_kv,
         make_mapper=_wavtok_mapper)
