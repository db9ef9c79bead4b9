"""Tensor-parallel sharding rules for model parameters and KV cache.

Megatron-style TP expressed as NamedShardings (the role the reference's
LLAMA_SPLIT_MODE_ROW split-buffer plays on CUDA, ggml-cuda.cu:812-860 —
but with XLA-inserted, compute-overlapped collectives instead of explicit
gather/concat):

  - attn q/k/v and ffn gate/up: output-feature (head) sharded → column-parallel
  - attn output and ffn down:   input-feature sharded → row-parallel (psum)
  - embeddings / norms:         replicated
  - KV cache:                   sharded over kv heads

A rule falls back to replication when the dimension doesn't divide the mesh
axis, so odd vocab heads or small test models still run.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.weights import DenseLinear, QuantExpertStack, QuantLinear
from ..runtime.kvcache import KVCache, QuantKVCache, SWACache
from .mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS

# tensor-name patterns → (dense spec over [n_in, n_out], quant plane row/col)
COL_PARALLEL = re.compile(r"(wq|wk|wv|w_gate|w_up|output)$")
ROW_PARALLEL = re.compile(r"(wo|w_down)$")
# stacked MoE expert tensors [E, ...] → sharded over the expert axis when
# the mesh has one: each device holds E/ep experts; the all-experts combine
# (ops/moe._moe_dense final contraction over E) becomes a psum over "expert"
EXPERT_STACKED = re.compile(r"_exps$")


def _axis_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def _ep_size(mesh: Mesh) -> int:
    return mesh.shape.get(EXPERT_AXIS, 1) if hasattr(mesh.shape, "get") else (
        mesh.shape[EXPERT_AXIS] if EXPERT_AXIS in mesh.axis_names else 1
    )


def _put(x, mesh, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _shard_linear(lin, mesh: Mesh, kind: str):
    tp = _axis_size(mesh)
    if isinstance(lin, DenseLinear):
        n_in, n_out = lin.w.shape
        if kind == "col" and n_out % tp == 0:
            return DenseLinear(_put(lin.w, mesh, P(None, MODEL_AXIS)))
        if kind == "row" and n_in % tp == 0:
            return DenseLinear(_put(lin.w, mesh, P(MODEL_AXIS, None)))
        return DenseLinear(_put(lin.w, mesh, P()))
    if isinstance(lin, QuantLinear):
        planes = {}
        for name, arr in lin.planes.items():
            if kind == "col" and arr.shape[1] % tp == 0:
                planes[name] = _put(arr, mesh, P(None, MODEL_AXIS))
            elif kind == "row" and arr.shape[0] % tp == 0:
                # every plane's row count is K/const, so row-sharding stays
                # aligned across planes when divisible
                planes[name] = _put(arr, mesh, P(MODEL_AXIS, None))
            else:
                planes[name] = _put(arr, mesh, P())
        return QuantLinear(lin.gtype, lin.n_out, lin.n_in, planes)
    return lin


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a llama-family param tree onto the mesh with TP rules."""

    def place(obj, kind=None):
        if isinstance(obj, (DenseLinear, QuantLinear)):
            return _shard_linear(obj, mesh, kind or "col")
        if obj is None:
            return None
        return _put(obj, mesh, P())

    out = {
        "tok_embd": place(params["tok_embd"]),
        "output_norm": place(params["output_norm"]),
        "output": _shard_linear(params["output"], mesh, "col")
        if params["output"] is not None
        else None,
        "layers": [],
    }
    ep = _ep_size(mesh)
    for layer in params["layers"]:
        new = {}
        for name, val in layer.items():
            if val is None:
                new[name] = None
            elif (
                EXPERT_STACKED.search(name)
                and isinstance(val, QuantExpertStack)
                and ep > 1
                and val.n_expert % ep == 0
            ):
                # packed planes shard on their leading expert axis: each
                # device holds E/ep experts' PACKED bytes (the widened-stack
                # 3.3x inflation never happens on the expert mesh either).
                # CAVEAT (unverifiable on this 1-chip sandbox): under plain
                # jit GSPMD the pallas stack/gather kernels have no
                # partitioning rule, so on real multi-chip XLA may
                # all-gather the planes; the virtual-mesh dryrun runs them
                # in interpret mode where partitioning works. If real-HW EP
                # profiling shows gathers, move the MoE block under
                # shard_map like the pipeline path.
                new[name] = QuantExpertStack(
                    val.gtype, val.n_expert, val.n_out, val.n_in,
                    {nm: _put(a, mesh, P(EXPERT_AXIS))
                     for nm, a in val.planes.items()})
            elif (
                EXPERT_STACKED.search(name)
                and isinstance(val, jax.Array)
                and ep > 1
                and val.shape[0] % ep == 0
            ):
                new[name] = _put(val, mesh, P(EXPERT_AXIS))
            elif COL_PARALLEL.search(name):
                new[name] = _shard_linear(val, mesh, "col")
            elif ROW_PARALLEL.search(name):
                new[name] = _shard_linear(val, mesh, "row")
            else:
                new[name] = _put(val, mesh, P())
        out["layers"].append(new)
    return out


def shard_cache(cache, mesh: Mesh, data_batch: bool = False):
    """Shard a KV cache over the mesh.

    KV heads (dim 2 of [L,B,Hkv,S,D]) go over the tensor axis when
    divisible. With `data_batch=True` (serving: BatchEngine slots) the
    batch/slot dim additionally shards over the data axis, so each
    data-parallel group holds its own slice of the continuous-batching
    slots — the TPU translation of running dp replicas of the reference
    server behind one endpoint.
    """
    tp = _axis_size(mesh)
    dp = mesh.shape.get(DATA_AXIS, 1) if hasattr(mesh.shape, "get") else (
        mesh.shape[DATA_AXIS] if DATA_AXIS in mesh.axis_names else 1
    )

    def axes(arr, head_dim: int | None, batch_dim: int = 1):
        spec = [None] * arr.ndim
        if head_dim is not None and arr.shape[head_dim] % tp == 0:
            spec[head_dim] = MODEL_AXIS
        if data_batch and dp > 1 and arr.shape[batch_dim] % dp == 0:
            spec[batch_dim] = DATA_AXIS
        return P(*spec)

    if isinstance(cache, KVCache):
        return KVCache(
            _put(cache.k, mesh, axes(cache.k, 2)),
            _put(cache.v, mesh, axes(cache.v, 2)),
        )
    if isinstance(cache, QuantKVCache):
        return QuantKVCache(
            _put(cache.k_q, mesh, axes(cache.k_q, 2)),
            _put(cache.v_q, mesh, axes(cache.v_q, 2)),
            _put(cache.k_s, mesh, axes(cache.k_s, 2)),
            _put(cache.v_s, mesh, axes(cache.v_s, 2)),
        )
    if isinstance(cache, SWACache):
        return SWACache(
            _put(cache.full_k, mesh, axes(cache.full_k, 2)),
            _put(cache.full_v, mesh, axes(cache.full_v, 2)),
            _put(cache.swa_k, mesh, axes(cache.swa_k, 2)),
            _put(cache.swa_v, mesh, axes(cache.swa_v, 2)),
            _put(cache.slot_pos, mesh, axes(cache.slot_pos, None, 0)),
            cache.layer_map, cache.window,
        )
    # recurrent / hybrid cache pytrees (mamba conv+ssm states, rwkv wkv
    # state, MLA latents): every leaf is [L, B, ...] (see
    # runtime/recurrent.py), so serving shards the slot dim over "data"
    # and replicates the rest — dp recurrent serving without arch-specific
    # rules. TP stays replicated (the inner-state contraction is arch
    # specific; BatchEngine gates tp>1 off for recurrent archs).
    def place(a):
        if (data_batch and dp > 1 and a.ndim >= 2
                and a.shape[1] % dp == 0):
            return _put(a, mesh, P(None, DATA_AXIS))
        return _put(a, mesh, P())

    return jax.tree_util.tree_map(place, cache)
