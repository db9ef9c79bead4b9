"""Write trained dense params back to a GGUF.

Role of the reference's llama_model_save_to_file (include/llama.h:461,
src/llama-model-saver.cpp): every tensor of the source model is re-emitted,
with trained values replacing the originals. The finetune CLI uses this to
produce a GGUF that reloads and generates (examples/training/finetune.cpp
writes `-checkpoint.gguf`).

Covers the llama/qwen-moe-family param layout (the finetune CLI's target
set); other arches raise so a silent partial save can't happen.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType

# llama-family param key -> blk tensor stem (weights stored x@w as
# [n_in, n_out]; GGUF wants the logical (n_out, n_in) row-major layout)
_LAYER_WEIGHTS = {
    "wq": "attn_q.weight", "wk": "attn_k.weight", "wv": "attn_v.weight",
    "wo": "attn_output.weight", "w_gate": "ffn_gate.weight",
    "w_up": "ffn_up.weight", "w_down": "ffn_down.weight",
}
_LAYER_VECTORS = {
    "attn_norm": "attn_norm.weight", "ffn_norm": "ffn_norm.weight",
    "q_norm": "attn_q_norm.weight", "k_norm": "attn_k_norm.weight",
    "bq": "attn_q.bias", "bk": "attn_k.bias", "bv": "attn_v.bias",
    "bo": "attn_output.bias",
}
_MOE_WEIGHTS = {
    "w_gate_exps": "ffn_gate_exps.weight",
    "w_up_exps": "ffn_up_exps.weight",
    "w_down_exps": "ffn_down_exps.weight",
}


def _trained_tensors(hp, params) -> dict[str, np.ndarray]:
    """Flatten a llama-family params tree into GGUF-named (n_out, n_in)
    float32 arrays."""
    from ..models.weights import DenseLinear

    def mat(lin):
        if not isinstance(lin, DenseLinear):
            raise NotImplementedError(
                f"save_dense_gguf needs dense weights (got {type(lin).__name__}"
                " — load with mode='dense', or export LoRA factors instead)")
        return np.asarray(lin.w, np.float32).T  # [n_in,n_out] -> (n_out,n_in)

    out: dict[str, np.ndarray] = {}
    out["token_embd.weight"] = np.asarray(params["tok_embd"], np.float32)
    out["output_norm.weight"] = np.asarray(params["output_norm"], np.float32)
    if params.get("output") is not None:
        out["output.weight"] = mat(params["output"])
    handled = set(_LAYER_WEIGHTS) | set(_LAYER_VECTORS) | set(_MOE_WEIGHTS)
    for i, layer in enumerate(params["layers"]):
        p = f"blk.{i}."
        for key, stem in _LAYER_WEIGHTS.items():
            if layer.get(key) is not None:
                out[p + stem] = mat(layer[key])
        for key, stem in _LAYER_VECTORS.items():
            if layer.get(key) is not None:
                out[p + stem] = np.asarray(layer[key], np.float32)
        # MoE FFN (mixtral / qwen-moe families): router + stacked experts
        # train like any other leaf, so they must save like one
        if layer.get("router") is not None:
            out[p + "ffn_gate_inp.weight"] = mat(layer["router"])
        for key, stem in _MOE_WEIGHTS.items():
            if layer.get(key) is not None:
                # [E, n_in, n_out] device stack -> GGUF (E, n_out, n_in)
                out[p + stem] = np.asarray(
                    layer[key], np.float32).transpose(0, 2, 1)
        for key, stem in (("w_gate_shexp", "ffn_gate_shexp.weight"),
                          ("w_up_shexp", "ffn_up_shexp.weight"),
                          ("w_down_shexp", "ffn_down_shexp.weight")):
            if layer.get(key) is not None:
                out[p + stem] = mat(layer[key])
        if layer.get("shexp_gate_inp") is not None:
            out[p + "ffn_gate_inp_shexp.weight"] = np.asarray(
                layer["shexp_gate_inp"], np.float32)
        if layer.get("exp_probs_b") is not None:
            out[p + "exp_probs_b.bias"] = np.asarray(
                layer["exp_probs_b"], np.float32)
        unhandled = [k for k, v in layer.items()
                     if v is not None and k not in handled
                     and k not in ("router", "w_gate_shexp", "w_up_shexp",
                                   "w_down_shexp", "shexp_gate_inp",
                                   "exp_probs_b")]
        if unhandled:  # a silent partial save must be impossible
            raise NotImplementedError(
                f"save_dense_gguf: layer {i} has trained weights with no "
                f"save mapping: {unhandled}")
    return out


def save_dense_gguf(reader, hp, params, path, outtype: str = "f16") -> str:
    """Re-emit the source GGUF with trained tensor values.

    Metadata and any tensor the params tree does not carry (rope_freqs,
    expert stacks of untouched layers, ...) copy through from the source
    unchanged; trained tensors write at `outtype` (f32/f16/bf16 — run
    tpullm-quantize for block-quant outputs)."""
    from ..gguf.writer import GGUFWriter
    from ..models import llama as _llama
    from ..models import qwen_moe as _qwen_moe
    from ..models.registry import get_arch

    if get_arch(hp.arch).forward not in (_llama.forward, _qwen_moe.forward):
        raise NotImplementedError(
            f"{hp.arch}: save_dense_gguf covers the llama/qwen-moe families")
    gg_type = {"f32": GGMLType.F32, "f16": GGMLType.F16,
               "bf16": GGMLType.BF16}[outtype]
    trained = _trained_tensors(hp, params)
    w = GGUFWriter(path, architecture=hp.arch)
    for k, v in reader.metadata.items():
        if k != "general.architecture":
            w.add_kv(k, v)
    seen = set()
    for name, info in reader.tensors.items():
        if name in trained:
            w.add_tensor(name, trained[name], gg_type)
            seen.add(name)
        else:
            w.add_packed_tensor(name, info.shape, info.ggml_type,
                                info.data.tobytes())
    missing = sorted(set(trained) - seen)
    if missing:  # trained weights the source never had would vanish silently
        raise ValueError(f"trained tensors absent from source GGUF: {missing}")
    w.write()
    return str(path)
