"""Weight containers: dense (dequantized-at-load) and packed-quantized linears.

Both are registered JAX pytrees so parameter trees jit/shard transparently.
`QuantLinear` keeps the ggml-packed planes HBM-resident and computes through
the fused dequant matmul in tpullm.ops.qmatmul (the MMQ/MMVQ analog — see
SURVEY.md §2.3); `DenseLinear` is the F16/BF16 fallback (≡ mmf/mmvf path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType, TYPE_TRAITS
from ..gguf.reader import GGUFTensorInfo
from ..quant import codecs


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseLinear:
    """y = x @ w, w: [n_in, n_out]."""

    w: jax.Array

    @property
    def n_in(self) -> int:
        return self.w.shape[0]

    @property
    def n_out(self) -> int:
        return self.w.shape[1]

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.dot(x, self.w.astype(x.dtype), preferred_element_type=x.dtype)

    def tree_flatten(self):
        return (self.w,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantLinear:
    """Packed-quantized weight of logical shape (n_out, n_in).

    `planes` holds the repacked device arrays whose layout is defined by
    tpullm.ops.qmatmul for the given ggml type. Matmul dispatches to the
    Pallas fused dequant kernel (jnp fallback on CPU/interpret).
    """

    gtype: GGMLType
    n_out: int
    n_in: int
    planes: dict[str, jax.Array]

    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops import qmatmul

        return qmatmul.matmul(x, self)

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (self.gtype, self.n_out, self.n_in, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        gtype, n_out, n_in, keys = aux
        return cls(gtype, n_out, n_in, dict(zip(keys, children)))


Linear = Any  # DenseLinear | QuantLinear


def dense_from_info(info: GGUFTensorInfo, dtype=jnp.bfloat16) -> DenseLinear:
    """Dequantize a GGUF 2-D weight (logical (n_out, n_in)) to a dense [n_in, n_out]."""
    w = info.to_numpy()  # (n_out, n_in) float32
    return DenseLinear(jnp.asarray(np.ascontiguousarray(w.T), dtype=dtype))


def quant_from_info(info: GGUFTensorInfo) -> QuantLinear:
    from ..ops import qmatmul

    n_out, n_in = info.shape[1], info.shape[0]
    planes = qmatmul.repack(info.data, info.ggml_type, n_out, n_in)
    return QuantLinear(info.ggml_type, n_out, n_in, planes)


def load_linear(info: GGUFTensorInfo, mode: str = "auto", dtype=jnp.bfloat16) -> Linear:
    """mode: 'dense' forces dequant-at-load; 'quant' keeps packed planes;
    'auto' keeps quantized types packed when a fused kernel exists."""
    from ..ops import qmatmul

    tt = TYPE_TRAITS[info.ggml_type]
    if mode == "dense" or not tt.is_quantized:
        return dense_from_info(info, dtype)
    if mode == "quant" or (mode == "auto" and qmatmul.supports(info.ggml_type)):
        return quant_from_info(info)
    return dense_from_info(info, dtype)


def load_embedding(info: GGUFTensorInfo, dtype=jnp.bfloat16) -> jax.Array:
    """Embedding table as [n_vocab, n_embd] (row gather needs dense rows)."""
    return jnp.asarray(info.to_numpy(), dtype=dtype)


def load_vector(info: GGUFTensorInfo, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(info.to_numpy(), dtype=dtype)
