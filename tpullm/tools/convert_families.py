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
