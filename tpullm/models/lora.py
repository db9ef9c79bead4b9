"""LoRA adapters (reference: src/llama-adapter.cpp + convert_lora_to_gguf.py).

GGUF adapter files carry general.type="adapter", adapter.type="lora",
adapter.lora.alpha, and per-weight low-rank factors named
"<base_tensor>.lora_a" (r, n_in) / "<base_tensor>.lora_b" (n_out, r).

Applied at runtime as a wrapper linear — y = base(x) + scale·((x A^T) B^T),
scale = user_scale · alpha / r (llama_adapter_lora_weight::get_scale) — which
works over both dense and packed-quantized base weights (the reference
likewise keeps LoRA unmerged at runtime; merging is export-lora's job).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader


@jax.tree_util.register_pytree_node_class
@dataclass
class LoraLinear:
    """base(x) + scale * x @ a_t @ b_t."""

    base: Any  # DenseLinear | QuantLinear
    a_t: jax.Array  # [n_in, r]
    b_t: jax.Array  # [r, n_out]
    scale: float

    def __call__(self, x: jax.Array) -> jax.Array:
        y = self.base(x)
        lo = jnp.dot(
            jnp.dot(x, self.a_t.astype(x.dtype)), self.b_t.astype(x.dtype)
        )
        return y + (lo.astype(jnp.float32) * self.scale).astype(y.dtype)

    def tree_flatten(self):
        return (self.base, self.a_t, self.b_t), self.scale

    @classmethod
    def tree_unflatten(cls, scale, children):
        return cls(children[0], children[1], children[2], scale)


@dataclass
class LoraAdapter:
    alpha: float
    # base tensor name (".weight" suffix kept) → (a (r, n_in), b (n_out, r))
    tensors: dict[str, tuple[np.ndarray, np.ndarray]]

    def scale_for(self, name: str, user_scale: float) -> float:
        a, _ = self.tensors[name]
        r = a.shape[0]
        return user_scale * self.alpha / r if self.alpha else user_scale


def load_lora_gguf(path) -> LoraAdapter:
    r = GGUFReader(path)
    md = r.metadata
    gtype = md.get("general.type")
    atype = md.get("adapter.type")
    if gtype not in (None, "adapter") or (atype not in (None, "lora")):
        raise ValueError(f"not a LoRA adapter GGUF: type={gtype}/{atype}")
    alpha = float(md.get("adapter.lora.alpha", 0.0))
    pairs: dict[str, dict[str, np.ndarray]] = {}
    for name, info in r.tensors.items():
        if name.endswith(".lora_a"):
            pairs.setdefault(name[: -len(".lora_a")], {})["a"] = info.to_numpy()
        elif name.endswith(".lora_b"):
            pairs.setdefault(name[: -len(".lora_b")], {})["b"] = info.to_numpy()
    tensors = {}
    for base, ab in pairs.items():
        if "a" not in ab or "b" not in ab:
            raise ValueError(f"LoRA tensor {base} missing lora_a or lora_b")
        tensors[base] = (ab["a"], ab["b"])
    return LoraAdapter(alpha=alpha, tensors=tensors)


# GGUF tensor-name stem → param-dict key used by the model modules
_LAYER_KEYS = {
    "attn_q": "wq",
    "attn_k": "wk",
    "attn_v": "wv",
    "attn_output": "wo",
    "ffn_gate": "w_gate",
    "ffn_up": "w_up",
    "ffn_down": "w_down",
}


def apply_lora(params: dict, adapter: LoraAdapter, user_scale: float = 1.0,
               dtype=jnp.bfloat16) -> dict:
    """Wrap matched linears in params with LoraLinear. Unmatched adapter
    tensors raise (same strictness as llama_adapter_lora init)."""
    unmatched = []
    for name, (a, b) in adapter.tensors.items():
        scale = adapter.scale_for(name, user_scale)
        a_t = jnp.asarray(np.ascontiguousarray(a.T), dtype=dtype)
        b_t = jnp.asarray(np.ascontiguousarray(b.T), dtype=dtype)
        parts = name.split(".")
        if parts[0] == "blk" and len(parts) >= 3:
            li = int(parts[1])
            key = _LAYER_KEYS.get(parts[2])
            if key is None or li >= len(params["layers"]) or params["layers"][li].get(key) is None:
                unmatched.append(name)
                continue
            params["layers"][li][key] = LoraLinear(
                params["layers"][li][key], a_t, b_t, scale
            )
        elif parts[0] == "output" and params.get("output") is not None:
            params["output"] = LoraLinear(params["output"], a_t, b_t, scale)
        else:
            unmatched.append(name)
    if unmatched:
        raise ValueError(f"LoRA tensors with no matching base weight: {unmatched}")
    return params


def merge_lora_dense(base_w: np.ndarray, a: np.ndarray, b: np.ndarray,
                     scale: float) -> np.ndarray:
    """W' = W + scale·(B A) for export-lora (base_w (n_out, n_in))."""
    return base_w + scale * (b.astype(np.float32) @ a.astype(np.float32))


def save_lora_gguf(path, tensors: dict[str, tuple[np.ndarray, np.ndarray]],
                   alpha: float = 0.0, arch: str = "llama"):
    """Write a LoRA adapter GGUF (test fixture / converter output)."""
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", float(alpha))
    for base, (a, b) in tensors.items():
        w.add_tensor(base + ".lora_a", a.astype(np.float32), GGMLType.F32)
        w.add_tensor(base + ".lora_b", b.astype(np.float32), GGMLType.F32)
    w.write()
    return str(path)
