"""Pipeline-parallel INFERENCE for the llama family: layer-split stages over
a ("pipe", "model") mesh with a stage-resident KV cache.

This is the serving-side analog of the reference's LLAMA_SPLIT_MODE_LAYER +
GGML_SCHED_MAX_COPIES pipelining (ggml/src/ggml-backend.cpp:1157 — the
scheduler splits the graph at layer boundaries and overlaps micro-batch
activation copies between GPUs). Re-designed for TPU:

  - each pipe stage holds a contiguous [L/pp] slice of the stacked layer
    weights AND of the KV cache (the cache never leaves its stage — only
    [b, T, E] activations cross ICI, exactly the reference's inter-GPU
    traffic shape),
  - the batch is split into M = pp microbatches that rotate through stages
    via ppermute; after the pp-1-tick fill, every stage computes every tick
    (the GPipe bubble is (pp-1)/(M+pp-1), identical to the reference's
    n_copies overlap math),
  - the "model" mesh axis runs Megatron TP *inside* each stage (column-split
    qkv/gate/up, row-split wo/down, one psum per half) so pp×tp composes.

The step function speaks the BatchEngine serving contract
(runtime/batch_engine.py): per-row int32 offsets where −1 marks an idle slot
whose cache write is masked out, positions given per row, and either int32
tokens [B, T] or precomputed embeddings [B, T, E] as input — so the whole
continuous-batching scheduler (prefill chunks, decode, speculative verify)
runs unchanged on a layer-split mesh, ≡ the reference server with
--split-mode layer (tools/server/server-context.cpp update_slots over a
layer-split llama_model, src/llama-model.cpp:2616).

Coverage boundary (each gate raises with the reason at load): the stage
program scans ONE homogeneous stacked-layer structure, so it serves every
arch whose forward is llama.forward — plain llama/mistral-SWA/qwen(2/3)/
granite/ALiBi/gateless/xielu variants plus all-MoE mixtral-style FFNs —
and the gemma family (gemma.forward: gelu FFN, sandwich post-norms,
per-layer SWA interleave with a dual rope base, qk-norms, attn/final
softcaps, sqrt(E) embedding scale; the stage cache is full-size ≡
--swa-full), with tokens OR precomputed [B, T, E] embedding prompts and
the pooled embeddings endpoint. Structurally outside the uniform scan:
per-layer NAS shapes (deci), hybrid SSM/linear-attention layers,
recurrent caches, M-RoPE 4-stream positions and deepstack per-layer
residual injection. The reference's --split-mode layer splits an
arbitrary graph at layer boundaries because its scheduler interprets
per-layer subgraphs; the TPU design instead compiles one scanned program
per stage — widening it means teaching the scan that arch's layer body,
not lifting a whitelist.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .pipeline import (
    MODEL_AXIS,
    PIPE_AXIS,
    param_specs,
    shard_map_compat,
    _rms,
)


def mla_cache_specs():
    """Spec tree for the MLA stage cache dict: the scanned layers' latent
    planes shard on the pipe axis; the dense-lead planes replicate (lead
    layers run on every stage — see make_pipeline_step's prologue)."""
    return {"lead": P(), "stage": P(PIPE_AXIS)}


def make_mla_stacked_cache(hp, batch: int, max_seq: int, mesh: Mesh,
                           dtype=jnp.bfloat16):
    """Absorbed-MLA latent cache split into replicated lead + pipe-sharded
    scanned planes ([n, B, 1, S, kvr+n_rot] each, ≡ runtime.kvcache.MLACache
    with the layer dim split at n_layer_dense_lead)."""
    if isinstance(dtype, str):
        raise NotImplementedError(
            "MLA pipeline serving stores the latent at a float dtype "
            "(the latent is already ~71x smaller than decompressed KV)")
    W = hp.n_lora_kv + hp.rope.dims
    n_lead = hp.n_layer_dense_lead
    cache = {
        "lead": jnp.zeros((n_lead, batch, 1, max_seq, W), dtype),
        "stage": jnp.zeros((hp.n_layer - n_lead, batch, 1, max_seq, W),
                           dtype),
    }
    specs = mla_cache_specs()
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in cache.items()}


def cache_specs(quant: bool = False):
    """Spec tree for the stacked cache: layer dim on the pipe axis, kv-head
    dim on the model axis ([L, B, Hkv, S, D] arrays; q8 adds [L, B, Hkv, S]
    scale planes)."""
    spec = P(PIPE_AXIS, None, MODEL_AXIS)
    if quant:
        from ..runtime.kvcache import QuantKVCache

        return QuantKVCache(spec, spec, spec, spec)
    return KVCache(spec, spec)


def make_stacked_cache(hp, batch: int, max_seq: int, mesh: Mesh,
                       dtype=jnp.bfloat16):
    """Stage-resident cache; dtype 'q8_0' keeps int8 codes + per-vector
    scales in HBM (≡ the fork's -ctk q8_0 headline config)."""
    if isinstance(dtype, str):
        if dtype != "q8_0":
            raise NotImplementedError(f"pipe KV dtype {dtype!r}")
        from ..runtime.kvcache import QuantKVCache

        cache = QuantKVCache.new(hp, batch, max_seq)
    else:
        cache = KVCache.new(hp, batch, max_seq, dtype)
    specs = cache_specs(isinstance(dtype, str))
    leaves, treedef = jax.tree.flatten(cache)
    spec_leaves = jax.tree.flatten(specs)[0]
    placed = [jax.device_put(a, NamedSharding(mesh, s))
              for a, s in zip(leaves, spec_leaves)]
    return jax.tree.unflatten(treedef, placed)


# GGUF tensor stems for the stacked per-layer weights
_STACK_TENSORS = {
    "wq": "attn_q", "wk": "attn_k", "wv": "attn_v", "wo": "attn_output",
    "w_gate": "ffn_gate", "w_up": "ffn_up", "w_down": "ffn_down",
}
_STACK_NORMS = {"attn_norm": "attn_norm", "ffn_norm": "ffn_norm"}
# optional per-layer vector stacks and their shardings
_OPT_STACK_SPECS = {
    "bq": P(PIPE_AXIS, MODEL_AXIS),
    "bk": P(PIPE_AXIS, MODEL_AXIS),
    "bv": P(PIPE_AXIS, MODEL_AXIS),
    "bo": P(PIPE_AXIS),
    "q_norm": P(PIPE_AXIS),
    "k_norm": P(PIPE_AXIS),
    "xielu": P(PIPE_AXIS),
    # gemma-family sandwich norms + the per-layer SWA interleave flag
    "attn_post_norm": P(PIPE_AXIS),
    "ffn_post_norm": P(PIPE_AXIS),
    "swa_on": P(PIPE_AXIS),
    # MoE extras (qwen2/3-moe family, tp=1 stages): per-layer selection
    # bias, shared-expert weights, qwen2moe's sigmoid shexp gate vector
    "exp_probs_b": P(PIPE_AXIS),
    "w_gate_shexp": P(PIPE_AXIS),
    "w_up_shexp": P(PIPE_AXIS),
    "w_down_shexp": P(PIPE_AXIS),
    "shexp_gate_inp": P(PIPE_AXIS),
}


# memo for _stack_planes_np: a loader's per-plane put_stacked callbacks
# each re-request the SAME layer tensor (once per plane name), and the
# repack is the expensive half of loading multi-GB expert stacks — without
# this the work ran n_planes times. Keyed by tensor identity; the loaders
# clear it when placement finishes, so peak host RAM is bounded by one
# load's packed planes (≈ the packed file size, transient).
_STACK_PLANES_MEMO: dict = {}


def _stack_planes_np(inf, n_out: int, n_in: int, e: int) -> dict | None:
    """Host repack of a stacked (E, n_out, n_in) quantized expert tensor →
    numpy planes with a leading expert axis ([E, rows, N] each; scale/minus
    at bf16, matching ops.qmatmul.upload_planes). None when the type/shape
    can't ride the stack/gather kernels."""
    import os

    from ..gguf.constants import TYPE_TRAITS
    from ..ops import qmatmul as qm
    from ..ops.pallas import qmm as qmm_pallas

    if os.environ.get("TPULLM_PACKED_MOE", "1") == "0":
        return None
    if not (TYPE_TRAITS[inf.ggml_type].is_quantized
            and qm.supports(inf.ggml_type)
            and qmm_pallas.supports(inf.ggml_type, n_in, n_out)):
        return None
    key = (inf.name, int(inf.ggml_type), n_out, n_in, e)
    hit = _STACK_PLANES_MEMO.get(key)
    if hit is not None:
        return hit
    data = np.ascontiguousarray(inf.data, dtype=np.uint8).reshape(e, -1)
    per = [qm.repack_np(data[x], inf.ggml_type, n_out, n_in)
           for x in range(e)]
    stacked = {nm: np.stack([p[nm] for p in per]) for nm in per[0]}
    out = {nm: (np.asarray(jnp.asarray(v, jnp.bfloat16))
                if nm in ("scale", "minus") else v)
           for nm, v in stacked.items()}
    _STACK_PLANES_MEMO[key] = out
    return out


def load_stacked_serving(reader, hp, mesh: Mesh, dtype=jnp.bfloat16,
                         mode: str = "auto"):
    """Load + stack llama-family weights for pipeline serving straight from
    the GGUF, keeping quantized plane streams packed where possible.

    Per weight name: when every layer shares one kernel-supported quant type
    (and the stage runs tp=1 — plane row/column layouts don't shard), the
    packed planes stack to [L, rows, N] and decode through the fused qmm
    kernel stage-locally; otherwise that name widens to a dense [L, K, N]
    stack. (Q4_K_M mixes attn_v/ffn_down types across layers, so those
    names widen while attn_q/attn_k/ffn_gate/ffn_up stay packed — ≡ the
    reference running a quantized model under --split-mode layer.)

    Returns (placed_params, qmeta, n_vocab_padded); qmeta maps weight name →
    (gtype, n_out, n_in) for packed names (static kernel metadata).
    """
    from ..gguf.constants import TYPE_TRAITS
    from ..models import llama as _llama
    from ..models.registry import get_arch
    from ..ops import qmatmul as qm

    t = reader.tensors
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    if hp.n_layer % pp:
        raise ValueError(f"pp {pp} must divide n_layer {hp.n_layer}")
    # the stage program hard-codes the layer math — sharing llama TENSOR
    # NAMES is not enough (an unknown forward would load but diverge
    # silently). The scan body implements llama.forward exactly plus the
    # gemma deltas (gelu FFN, sandwich post-norms, per-layer SWA/rope
    # interleave, attn/final softcaps); reject every other forward.
    from ..models import gemma as _gemma, qwen_moe as _qwen_moe

    if get_arch(hp.arch).forward not in (_llama.forward, _gemma.forward,
                                         _qwen_moe.forward):
        raise NotImplementedError(
            f"{hp.arch}: pipeline serving covers the llama, gemma and "
            "qwen-moe families"
        )
    if hp.nextn_layers:
        raise NotImplementedError(
            f"{hp.arch}: pipeline serving does not stack trailing NextN/MTP "
            "predictor layers"
        )
    if not hp.causal:
        raise NotImplementedError(
            f"{hp.arch}: pipeline serving is causal-decoder only"
        )
    if (f"blk.0.attn_q_norm.weight" in t
            and t["blk.0.attn_q_norm.weight"].shape[0] != hp.head_dim
            and tp > 1):
        raise NotImplementedError(
            "pipeline serving: full-projection qk norms (olmoe/minimax "
            "style) need tp=1 stages (the RMS reduces over the sharded dim)"
        )
    # mixtral-style MoE FFN (llama arch + ffn_gate_inp router): every layer
    # must be MoE (a scan over stacked layers needs one homogeneous
    # structure — deepseek dense-lead mixes are out). With tp > 1 the
    # experts shard over the stage's model axis (expert parallelism inside
    # a stage: each rank computes its E/tp experts, a psum combines — the
    # routing weights of non-local experts are zeroed, so the combine is
    # exact); attention stays head-sharded as usual.
    moe = f"blk.0.ffn_gate_inp.weight" in t
    if moe:
        if tp > 1 and hp.n_expert % tp:
            raise NotImplementedError(
                f"MoE pipeline serving with tp={tp}: tp must divide "
                f"n_expert {hp.n_expert} (experts shard over the stage "
                "model axis)"
            )
        missing = [i for i in range(hp.n_layer)
                   if f"blk.{i}.ffn_gate_inp.weight" not in t]
        if missing:
            raise NotImplementedError(
                f"MoE pipeline serving needs every layer MoE (dense layers "
                f"{missing[:4]}…)"
            )
    weight_stems = dict(_STACK_TENSORS)
    if moe:
        for k in ("w_gate", "w_up", "w_down"):
            del weight_stems[k]
    elif f"blk.0.ffn_gate.weight" not in t:
        # gateless FFN (arcee ReLU², apertus xIELU): no gate tensor
        del weight_stems["w_gate"]
    for stem in list(weight_stems.values()) + list(_STACK_NORMS.values()):
        if f"blk.0.{stem}.weight" not in t:
            raise NotImplementedError(
                f"{hp.arch}: pipeline serving needs blk.*.{stem}.weight"
            )
    specs = param_specs(hp, pp, tp)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_stacked(spec, leaf_shape, dtype_, layer_fn):
        """Place an [L, ...] stack shard-by-shard: each device shard is
        built from only ITS layers (read lazily off the mmap), so the full
        unsharded stack never materializes in host RAM or on one device —
        a dense-widened 70B ffn_down stack would otherwise be ~75 GB f32 on
        the host and >HBM on one chip before resharding."""
        shape = (hp.n_layer,) + tuple(leaf_shape)
        sharding = NamedSharding(mesh, spec)

        def cb(index):
            ls = index[0]
            start = 0 if ls.start is None else ls.start
            stop = shape[0] if ls.stop is None else ls.stop
            block = np.stack([np.asarray(layer_fn(i), dtype_)
                              for i in range(start, stop)])
            return block[(slice(None),) + tuple(index[1:])]

        return jax.make_array_from_callback(shape, sharding, cb)

    qmeta: dict = {}
    stack: dict = {}
    if moe:
        stack["router"] = put_stacked(
            P(PIPE_AXIS), (hp.n_embd, hp.n_expert), dtype,
            lambda i: t[f"blk.{i}.ffn_gate_inp.weight"].to_numpy().T,
        )
        for key, stem in (("w_gate_exps", "ffn_gate_exps"),
                          ("w_up_exps", "ffn_up_exps"),
                          ("w_down_exps", "ffn_down_exps")):
            inf0 = t[f"blk.0.{stem}.weight"]
            # shape from metadata only — to_numpy() would dequantize a
            # multi-GB expert tensor just to read its dims. GGUF ne order
            # is (n_in, n_out, E); moe_ffn wants [E, n_in, n_out]
            # (models/llama.py experts())
            n_in3, n_out3, e = inf0.shape
            exp_gtypes = {t[f"blk.{i}.{stem}.weight"].ggml_type
                          for i in range(hp.n_layer)}
            # tp > 1: experts shard over the stage model axis (dim 1 = E)
            exp_spec = P(PIPE_AXIS, MODEL_AXIS) if tp > 1 else P(PIPE_AXIS)
            packed = _stack_planes_np(inf0, n_out3, n_in3, e)
            if (mode != "dense" and len(exp_gtypes) == 1
                    and packed is not None):
                # experts stay GGUF-packed in stage HBM, stacked
                # [L, E, rows, N] per plane, decoded by the stack/gather
                # kernels in the scan (≡ MUL_MAT_ID consuming quantized
                # experts in place, ggml-cuda/mmid.cu + mmq.cu:220)
                stack[key] = {
                    nm: put_stacked(
                        exp_spec, v0.shape, v0.dtype,
                        lambda i, nm=nm, stem=stem: _stack_planes_np(
                            t[f"blk.{i}.{stem}.weight"],
                            n_out3, n_in3, e)[nm])
                    for nm, v0 in packed.items()
                }
                qmeta[key] = (inf0.ggml_type, n_out3, n_in3, e)
                continue
            if TYPE_TRAITS[inf0.ggml_type].is_quantized:
                import logging

                logging.getLogger(__name__).warning(
                    "pipeline serving widens quantized MoE expert stacks "
                    "(%s, %s) to %s — HBM grows ~%dx vs the packed file "
                    "(heterogeneous layer types or a kernel-unsupported "
                    "shape)",
                    stem, inf0.ggml_type.name, np.dtype(dtype).name,
                    max(1, int(np.dtype(dtype).itemsize * 8
                               / max(TYPE_TRAITS[inf0.ggml_type].bits_per_weight, 1))),
                )
            stack[key] = put_stacked(
                exp_spec, (e, n_in3, n_out3), dtype,
                lambda i, stem=stem: np.ascontiguousarray(
                    t[f"blk.{i}.{stem}.weight"].to_numpy().transpose(0, 2, 1)
                ),
            )
        # per-layer structural extras must be homogeneous for the scan
        for stem in ("exp_probs_b.bias", "ffn_gate_shexp.weight",
                     "ffn_gate_inp_shexp.weight"):
            have = [i for i in range(hp.n_layer) if f"blk.{i}.{stem}" in t]
            if have and len(have) != hp.n_layer:
                raise NotImplementedError(
                    f"pipeline serving: blk.*.{stem} on layers {have[:4]}… "
                    "only — the stage scan needs one homogeneous structure"
                )
        if f"blk.0.exp_probs_b.bias" in t:  # deepseek-v3/ernie selection bias
            stack["exp_probs_b"] = put(
                jnp.asarray(np.stack(
                    [t[f"blk.{i}.exp_probs_b.bias"].to_numpy()
                     for i in range(hp.n_layer)]), jnp.float32),
                P(PIPE_AXIS))
        if f"blk.0.ffn_gate_shexp.weight" in t:  # shared expert (dense)
            for key, stem in (("w_gate_shexp", "ffn_gate_shexp"),
                              ("w_up_shexp", "ffn_up_shexp"),
                              ("w_down_shexp", "ffn_down_shexp")):
                inf0 = t[f"blk.0.{stem}.weight"]
                stack[key] = put_stacked(
                    P(PIPE_AXIS), (inf0.shape[0], inf0.shape[1]), dtype,
                    lambda i, stem=stem:
                        t[f"blk.{i}.{stem}.weight"].to_numpy().T,
                )
            if f"blk.0.ffn_gate_inp_shexp.weight" in t:  # qwen2moe gate
                stack["shexp_gate_inp"] = put(
                    jnp.asarray(np.stack(
                        [t[f"blk.{i}.ffn_gate_inp_shexp.weight"].to_numpy()
                         .reshape(-1) for i in range(hp.n_layer)]),
                        jnp.float32),
                    P(PIPE_AXIS))
    for key, stem in weight_stems.items():
        infos = [t[f"blk.{i}.{stem}.weight"] for i in range(hp.n_layer)]
        gtypes = {inf.ggml_type for inf in infos}
        quantized = TYPE_TRAITS[infos[0].ggml_type].is_quantized
        if (mode != "dense" and tp == 1 and len(gtypes) == 1 and quantized
                and qm.supports(infos[0].ggml_type)):
            gtype = infos[0].ggml_type
            n_in, n_out = infos[0].shape[0], infos[0].shape[1]
            # stage planes at packed size on host, then shard the stacks
            per_layer = [
                {nm: np.asarray(v)
                 for nm, v in qm.repack(inf.data, gtype, n_out, n_in).items()}
                for inf in infos
            ]
            stack[key] = {
                nm: put_stacked(P(PIPE_AXIS), v0.shape, v0.dtype,
                                lambda i, nm=nm: per_layer[i][nm])
                for nm, v0 in per_layer[0].items()
            }
            qmeta[key] = (gtype, n_out, n_in)
        else:
            n_in, n_out = infos[0].shape[0], infos[0].shape[1]
            stack[key] = put_stacked(
                specs["stack"][key], (n_in, n_out), dtype,
                lambda i, infos=infos: infos[i].to_numpy().T,
            )
    for key, stem in _STACK_NORMS.items():
        vs = np.stack([t[f"blk.{i}.{stem}.weight"].to_numpy()
                       for i in range(hp.n_layer)])
        stack[key] = put(jnp.asarray(vs, jnp.float32), P(PIPE_AXIS))
    # per-layer rope gate (smollm3/llama4 skip rope every no_rope_step-th
    # layer — the scan treats layers uniformly, so the flag rides the stack)
    rope_on = np.ones(hp.n_layer, bool)
    if hp.no_rope_step:
        rope_on = (np.arange(1, hp.n_layer + 1) % hp.no_rope_step) != 0
    stack["rope_on"] = put(jnp.asarray(rope_on), P(PIPE_AXIS))
    if hp.sliding_window > 0:
        # per-layer SWA interleave: gemma.forward keys off hp.is_swa
        # (gemma2 1:1, gemma3 5:1); llama.forward windows EVERY layer when
        # sliding_window>0 (mistral-style — is_swa is all-False there since
        # plain llama GGUFs carry no interleave pattern). The stage scan
        # must mirror whichever forward it replaces.
        if get_arch(hp.arch).forward is _gemma.forward:
            swa_flags = [hp.is_swa(i) for i in range(hp.n_layer)]
        else:
            swa_flags = [True] * hp.n_layer
        stack["swa_on"] = put(jnp.asarray(swa_flags), P(PIPE_AXIS))
    if hp.xielu is not None:  # apertus per-layer (αn, αp, β, ε) constants
        stack["xielu"] = put(
            jnp.asarray(np.asarray(hp.xielu, np.float32)), P(PIPE_AXIS))
    # optional per-layer vectors: qwen2-style attn biases, qwen3-style
    # per-head qk norms (qkv biases shard with their column-parallel
    # projections; bo is added after the wo psum, norms are per-head)
    for key, stem in (("bq", "attn_q.bias"), ("bk", "attn_k.bias"),
                      ("bv", "attn_v.bias"), ("bo", "attn_output.bias"),
                      ("q_norm", "attn_q_norm.weight"),
                      ("k_norm", "attn_k_norm.weight"),
                      ("attn_post_norm", "post_attention_norm.weight"),
                      ("ffn_post_norm", "post_ffw_norm.weight")):
        if f"blk.0.{stem}" in t:
            vs = np.stack([t[f"blk.{i}.{stem}"].to_numpy()
                           for i in range(hp.n_layer)])
            stack[key] = put(jnp.asarray(vs, jnp.float32),
                             _OPT_STACK_SPECS[key])

    emb = jnp.asarray(t["token_embd.weight"].to_numpy(), dtype)
    if "output.weight" in t:
        w_out = jnp.asarray(t["output.weight"].to_numpy().T, dtype)
    else:
        w_out = emb.T
    pad = (-w_out.shape[1]) % tp
    if pad:
        w_out = jnp.pad(w_out, ((0, 0), (0, pad)))
    params = {
        "tok_embd": put(emb, P()),
        "output_norm": put(
            jnp.asarray(t["output_norm.weight"].to_numpy(), jnp.float32),
            P()),
        "output": put(w_out, P(None, MODEL_AXIS)),
        "stack": stack,
    }
    _STACK_PLANES_MEMO.clear()  # callbacks all ran (make_array is eager)
    return params, qmeta, w_out.shape[1]


def load_mla_stacked_serving(reader, hp, mesh: Mesh, dtype=jnp.bfloat16,
                             mode: str = "auto"):
    """Load + stack deepseek2-family (absorbed MLA) weights for pipeline
    serving: the n_layer_dense_lead leading layers replicate on every stage
    (they are tiny next to the expert stacks and their MQA latent cache is
    ~71x smaller than decompressed KV), the remaining layers stack
    [L_m, ...] sharded on the pipe axis. Attention weights widen to `dtype`
    (they are small next to the experts); quantized EXPERT stacks stay
    GGUF-packed per stage ([L, E, rows, N] plane dicts → stack/gather
    kernels) when uniform and kernel-shaped, else widen.

    Returns (params, qmeta, n_vocab_padded): params = {tok_embd,
    output_norm, output, stack, lead?}; qmeta maps packed expert keys →
    (gtype, n_out, n_in, E).
    """
    from ..models import deepseek2 as _ds2
    from ..models.deepseek2 import _mla_dims
    from ..models.registry import get_arch

    qmeta: dict = {}
    t = reader.tensors
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    if get_arch(hp.arch).forward is not _ds2.forward:
        raise NotImplementedError(
            f"{hp.arch}: not a deepseek2-family (MLA) arch")
    if not _ds2.mla_absorbed(hp):
        raise NotImplementedError(
            "MLA pipeline serving needs the absorbed-latent path "
            "(kv_lora_rank > 0, TPULLM_MLA != 0)")
    if tp > 1:
        raise NotImplementedError(
            "MLA pipeline serving runs tp=1 stages (the latent is MQA — "
            "there is no head axis to shard)")
    if hp.nextn_layers:
        raise NotImplementedError(
            f"{hp.arch}: pipeline serving does not stack NextN/MTP layers")
    n_lead = hp.n_layer_dense_lead
    # tensor-presence is the ground truth for the lead/MoE boundary
    # (llm_build_deepseek2 switches on ffn_gate_inp per layer)
    first_moe = next((i for i in range(hp.n_layer)
                      if f"blk.{i}.ffn_gate_inp.weight" in t), None)
    if first_moe is not None and first_moe != n_lead:
        raise NotImplementedError(
            f"MLA pipeline serving: MoE starts at layer {first_moe} but "
            f"leading_dense_block_count is {n_lead}")
    moe = first_moe is not None
    L_m = hp.n_layer - n_lead
    if L_m <= 0 or L_m % pp:
        raise ValueError(
            f"scanned layers {L_m} (= n_layer {hp.n_layer} - dense lead "
            f"{n_lead}) must be a positive multiple of pp {pp}")
    if moe:
        bad = [i for i in range(n_lead, hp.n_layer)
               if f"blk.{i}.ffn_gate_inp.weight" not in t]
        if bad:
            raise NotImplementedError(
                f"MLA pipeline serving needs every post-lead layer MoE "
                f"(dense layers {bad[:4]}…)")
    q_lora = f"blk.0.attn_q_a.weight" in t
    Dk, Dv, n_rot, n_nope = _mla_dims(hp)
    H = hp.n_head

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_stacked(first, n, spec, leaf_shape, dtype_, layer_fn):
        """[n, ...] stack whose shard is built lazily from its own layers
        (layer_fn takes the GLOBAL block index = first + stack index)."""
        shape = (n,) + tuple(leaf_shape)
        sharding = NamedSharding(mesh, spec)

        def cb(index):
            ls = index[0]
            start = 0 if ls.start is None else ls.start
            stop = shape[0] if ls.stop is None else ls.stop
            block = np.stack([np.asarray(layer_fn(first + i), dtype_)
                              for i in range(start, stop)])
            return block[(slice(None),) + tuple(index[1:])]

        return jax.make_array_from_callback(shape, sharding, cb)

    def wT(i, stem):
        return lambda j, i=i, stem=stem: \
            t[f"blk.{j}.{stem}.weight"].to_numpy().T

    def kvb_half(which):
        def fn(j):
            kvb = t[f"blk.{j}.attn_kv_b.weight"].to_numpy()
            kvb = kvb.reshape(H, n_nope + Dv, hp.n_lora_kv)
            return kvb[:, :n_nope] if which == "k" else kvb[:, n_nope:]
        return fn

    def group(first: int, n: int, spec, group_moe: bool) -> dict:
        """Stack layers [first, first+n) into one weight dict."""
        g: dict = {}
        p0 = f"blk.{first}."

        def stk(key, stem):
            inf = t[f"{p0}{stem}.weight"]
            g[key] = put_stacked(first, n, spec,
                                 (inf.shape[0], inf.shape[1]), dtype,
                                 wT(first, stem))

        def vecs(key, stem, np_dtype=np.float32):
            g[key] = put(jnp.asarray(np.stack(
                [t[f"blk.{i}.{stem}"].to_numpy()
                 for i in range(first, first + n)]), jnp.float32), spec)

        vecs("attn_norm", "attn_norm.weight")
        vecs("ffn_norm", "ffn_norm.weight")
        vecs("kv_a_norm", "attn_kv_a_norm.weight")
        if q_lora:
            stk("wq_a", "attn_q_a")
            vecs("q_a_norm", "attn_q_a_norm.weight")
            stk("wq_b", "attn_q_b")
        else:
            stk("wq", "attn_q")
        stk("wkv_a", "attn_kv_a_mqa")
        stk("wo", "attn_output")
        g["wk_b"] = put_stacked(first, n, spec, (H, n_nope, hp.n_lora_kv),
                                dtype, kvb_half("k"))
        g["wv_b"] = put_stacked(first, n, spec, (H, Dv, hp.n_lora_kv),
                                dtype, kvb_half("v"))
        if group_moe:
            stk("router", "ffn_gate_inp")
            for key, stem in (("w_gate_exps", "ffn_gate_exps"),
                              ("w_up_exps", "ffn_up_exps"),
                              ("w_down_exps", "ffn_down_exps")):
                inf = t[f"{p0}{stem}.weight"]
                n_in3, n_out3, e3 = inf.shape
                same_type = len({t[f"blk.{j}.{stem}.weight"].ggml_type
                                 for j in range(first, first + n)}) == 1
                packed = (_stack_planes_np(inf, n_out3, n_in3, e3)
                          if mode != "dense" and same_type else None)
                if packed is not None:
                    # experts stay GGUF-packed per stage (see
                    # load_stacked_serving — the MUL_MAT_ID property)
                    g[key] = {
                        nm: put_stacked(
                            first, n, spec, v0.shape, v0.dtype,
                            lambda j, nm=nm, stem=stem: _stack_planes_np(
                                t[f"blk.{j}.{stem}.weight"],
                                n_out3, n_in3, e3)[nm])
                        for nm, v0 in packed.items()
                    }
                    qmeta[key] = (inf.ggml_type, n_out3, n_in3, e3)
                    continue
                g[key] = put_stacked(
                    first, n, spec,
                    (inf.shape[2], inf.shape[0], inf.shape[1]), dtype,
                    lambda j, stem=stem: np.ascontiguousarray(
                        t[f"blk.{j}.{stem}.weight"].to_numpy()
                        .transpose(0, 2, 1)))
            if f"{p0}exp_probs_b.bias" in t:
                vecs("exp_probs_b", "exp_probs_b.bias")
            for key, stem in (("w_gate_shexp", "ffn_gate_shexp"),
                              ("w_up_shexp", "ffn_up_shexp"),
                              ("w_down_shexp", "ffn_down_shexp")):
                if f"{p0}{stem}.weight" in t:
                    stk(key, stem)
        else:
            if f"{p0}ffn_gate.weight" in t:
                stk("w_gate", "ffn_gate")
            stk("w_up", "ffn_up")
            stk("w_down", "ffn_down")
        return g

    stack = group(n_lead, L_m, P(PIPE_AXIS), moe)
    params = {
        "tok_embd": put(
            jnp.asarray(t["token_embd.weight"].to_numpy(), dtype), P()),
        "output_norm": put(
            jnp.asarray(t["output_norm.weight"].to_numpy(), jnp.float32),
            P()),
        "stack": stack,
    }
    if n_lead:
        params["lead"] = group(0, n_lead, P(), False)
    if "output.weight" in t:
        w_out = jnp.asarray(t["output.weight"].to_numpy().T, dtype)
    else:
        w_out = params["tok_embd"].T
    params["output"] = put(w_out, P())
    _STACK_PLANES_MEMO.clear()  # callbacks all ran (make_array is eager)
    return params, qmeta, w_out.shape[1]


def step_flags(stack: dict, hp=None) -> dict:
    """Derive make_pipeline_step's structural flags from a loaded stack —
    single source of truth for both BatchEngine._init_pipeline and
    PipelineEngine. `hp` selects the FFN activation (gemma family = gelu)."""
    moe = "router" in stack
    act = "silu"
    if hp is not None:
        from ..models import gemma as _gemma
        from ..models.registry import get_arch

        if get_arch(hp.arch).forward is _gemma.forward:
            act = "gelu"
    return {
        "moe": moe,
        "gateless": not moe and "w_gate" not in stack,
        "opt_keys": tuple(k for k in _OPT_STACK_SPECS if k in stack),
        "act": act,
    }


def _mm(x, w, meta):
    """x @ weight where `w` is a dense [K, N] array or a packed-plane dict
    (meta = static (gtype, n_out, n_in) → fused dequant matmul)."""
    if meta is None:
        return x @ w
    from ..models.weights import QuantLinear
    from ..ops import qmatmul as qm

    return qm.matmul(x, QuantLinear(*meta, w)).astype(x.dtype)


def _layer_cached(hp, tp: int, w, x, positions, c_l, offs, batch_start,
                  tick_valid, qmeta, act: str = "silu"):
    """One llama block against a stage-local cache slice.

    x: [b, T, E]; positions: [b, T]; c_l: this stage's layer cache leaves —
    (k, v) bf16 [B, Hkv_local, S, D], or (k_q, v_q, k_s, v_s) for q8 KV
    (int8 codes + per-vector scales). The microbatch occupies rows
    [batch_start, batch_start+b). `offs` is the per-row write offset (−1 =
    idle slot, write masked). When `tick_valid` is false (pipeline fill /
    drain tick) every cache row is written back unchanged, so bubble ticks
    are pure no-ops on state.
    """
    b, T, E = x.shape
    n_head_l = hp.n_head // tp
    n_kv_l = max(hp.n_head_kv // tp, 1)
    hd = hp.head_dim
    hd_v = hp.head_dim_v
    quant = len(c_l) == 4
    S = c_l[0].shape[2]

    h = _rms(x, w["attn_norm"], hp.rms_eps)
    q = _mm(h, w["wq"], qmeta.get("wq"))
    k = _mm(h, w["wk"], qmeta.get("wk"))
    v = _mm(h, w["wv"], qmeta.get("wv"))
    if "bq" in w:  # qwen2-style attn biases (column-sharded with qkv)
        q = q + w["bq"].astype(q.dtype)
        k = k + w["bk"].astype(k.dtype)
        v = v + w["bv"].astype(v.dtype)
    full_qk_norm = ("q_norm" in w
                    and w["q_norm"].shape[-1] == hp.n_head * hd
                    and hd != hp.n_head * hd)
    if full_qk_norm:  # olmoe/minimax: norm spans the whole projection
        q = _rms(q, w["q_norm"], hp.rms_eps).astype(q.dtype)
        k = _rms(k, w["k_norm"], hp.rms_eps).astype(k.dtype)
    q = q.reshape(b, T, n_head_l, hd)
    k = k.reshape(b, T, n_kv_l, hd)
    v = v.reshape(b, T, n_kv_l, hd_v)

    def qk_norms(q, k):
        if "q_norm" in w and not full_qk_norm:  # qwen3 per-head RMS norms
            q = _rms(q, w["q_norm"], hp.rms_eps).astype(q.dtype)
            k = _rms(k, w["k_norm"], hp.rms_eps).astype(k.dtype)
        return q, k

    use_alibi = hp.max_alibi_bias > 0.0  # refact/baichuan-13B: no rope
    if not hp.qk_norm_post_rope:
        q, k = qk_norms(q, k)
    if use_alibi:
        pass
    elif hp.no_rope_step:  # smollm3-style rope-skip layers (per-layer gate)
        q = jnp.where(w["rope_on"], apply_rope(q, positions, hp.rope), q)
        k = jnp.where(w["rope_on"], apply_rope(k, positions, hp.rope), k)
    elif "swa_on" in w and hp.rope_freq_base_swa > 0:
        # gemma3: SWA layers rope at their own (local) freq base
        from dataclasses import replace as _replace

        rope_swa = _replace(hp.rope, freq_base=hp.rope_freq_base_swa)
        q = jnp.where(w["swa_on"], apply_rope(q, positions, rope_swa),
                      apply_rope(q, positions, hp.rope))
        k = jnp.where(w["swa_on"], apply_rope(k, positions, rope_swa),
                      apply_rope(k, positions, hp.rope))
    else:
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
    if hp.qk_norm_post_rope:  # maincoder / hunyuan-dense ordering
        q, k = qk_norms(q, k)

    k = k.transpose(0, 2, 1, 3)  # [b, Hkv, T, D]
    v = v.transpose(0, 2, 1, 3)
    row_ok = tick_valid & (offs >= 0)  # [b]
    start = jnp.maximum(offs, 0)

    def upd(row_cache, new_row, off, ok):
        # row_cache [Hkv, S, ...], new_row [Hkv, T, ...]; clamp-and-roll
        # write (runtime.kvcache._seq_write): bucket padding near the
        # context end must not clobber earlier positions
        from ..runtime.kvcache import _seq_write

        return _seq_write(row_cache, new_row, jnp.where(ok, off, -1),
                          seq_axis=1)

    def rw(leaf, new_row):
        """Write the microbatch's rows into one cache leaf and return
        (updated leaf, this microbatch's full-S row block)."""
        blk_shape = (b,) + leaf.shape[1:]
        blk = jax.lax.dynamic_slice(
            leaf, (batch_start,) + (0,) * (leaf.ndim - 1), blk_shape)
        blk = jax.vmap(upd)(blk, new_row, start, row_ok)
        leaf = jax.lax.dynamic_update_slice(
            leaf, blk, (batch_start,) + (0,) * (leaf.ndim - 1))
        return leaf, blk

    if quant:
        from ..runtime.kvcache import QuantKVCache

        k_codes, k_scale = QuantKVCache._quantize(k)  # [b,H,T,D], [b,H,T]
        v_codes, v_scale = QuantKVCache._quantize(v)
        kq_l, kq_b = rw(c_l[0], k_codes)
        vq_l, vq_b = rw(c_l[1], v_codes)
        ks_l, ks_b = rw(c_l[2], k_scale)
        vs_l, vs_b = rw(c_l[3], v_scale)
        c_l = (kq_l, vq_l, ks_l, vs_l)
        kb = kq_b.astype(jnp.float32) * ks_b[..., None]
        vb = vq_b.astype(jnp.float32) * vs_b[..., None]
    else:
        k_l, kb = rw(c_l[0], k)
        v_l, vb = rw(c_l[1], v)
        c_l = (k_l, v_l)

    g = n_head_l // n_kv_l
    qf = q.reshape(b, T, n_kv_l, g, hd).astype(jnp.float32)
    scores = jnp.einsum("bthgd,bhsd->bhgts", qf, kb.astype(jnp.float32))
    scale = hp.attn_scale if hp.attn_scale is not None else hd ** -0.5
    scores = scores * scale
    if hp.softcap_attn:  # gemma2 attention logit softcap
        scores = jnp.tanh(scores / hp.softcap_attn) * hp.softcap_attn
    if use_alibi:  # slope·(−|q_pos − key_slot|), local head slice under tp
        from ..ops.attention import alibi_slopes

        slopes = alibi_slopes(hp.n_head, hp.max_alibi_bias)
        h0 = jax.lax.axis_index(MODEL_AXIS) * n_head_l
        sl = jax.lax.dynamic_slice_in_dim(slopes, h0, n_head_l)
        sl = sl.reshape(n_kv_l, n_head_l // n_kv_l)
        dist = -jnp.abs(
            positions[:, :, None].astype(jnp.float32)
            - jnp.arange(S, dtype=jnp.float32)[None, None, :]
        )
        scores = scores + sl[None, :, :, None, None] * dist[:, None, None]
    slot = start[:, None] + jnp.arange(T, dtype=jnp.int32)[None]  # [b, T]
    key_idx = jnp.arange(S, dtype=jnp.int32)
    mask = key_idx[None, None, :] <= slot[:, :, None]  # [b, T, S] causal
    if hp.sliding_window > 0:  # SWA via mask (≡ ops.attention.causal_mask;
        # the stage cache stays full-size, rows past the window just unread;
        # the stacked swa_on flag gates the interleaved patterns)
        mask_w = mask & (
            key_idx[None, None, :] > slot[:, :, None] - hp.sliding_window)
        mask = jnp.where(w["swa_on"], mask_w, mask) if "swa_on" in w \
            else mask_w
    scores = jnp.where(mask[:, None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("bhgts,bhsd->bthgd", probs,
                      vb.astype(jnp.float32)).astype(x.dtype)
    attn = attn.reshape(b, T, n_head_l * hd_v)
    attn_out = jax.lax.psum(_mm(attn, w["wo"], qmeta.get("wo")), MODEL_AXIS)
    if "bo" in w:  # output bias added once, after the tp psum
        attn_out = attn_out + w["bo"].astype(attn_out.dtype)
    if "attn_post_norm" in w:  # gemma sandwich norm (after wo, pre-residual)
        attn_out = _rms(attn_out, w["attn_post_norm"],
                        hp.rms_eps).astype(x.dtype)
    if hp.residual_scale != 1.0:  # granite residual multiplier
        attn_out = attn_out * hp.residual_scale
    x = x + attn_out

    h = _rms(x, w["ffn_norm"], hp.rms_eps)
    if "router" in w:  # routed MoE FFN (llama mixtral / qwen-moe family)
        from ..models import llama as _llama
        from ..models.registry import get_arch

        llama_moe = get_arch(hp.arch).forward is _llama.forward
        ffn = _moe_ffn_tokens(hp, w, h.reshape(b * T, E),
                              llama_moe=llama_moe,
                              qmeta=qmeta, tp=tp).reshape(b, T, E)
        if hp.residual_scale != 1.0:
            ffn = ffn * hp.residual_scale
        return x + ffn, c_l
    if "w_gate" in w:
        gate32 = _mm(h, w["w_gate"], qmeta.get("w_gate")).astype(jnp.float32)
        if act == "gelu":  # gemma family
            g = jax.nn.gelu(gate32, approximate=True)
        else:
            g = jax.nn.silu(gate32)
        a = g.astype(h.dtype) * _mm(h, w["w_up"], qmeta.get("w_up"))
    else:  # gateless FFN: apertus xIELU / arcee ReLU²
        up = _mm(h, w["w_up"], qmeta.get("w_up"))
        uf = up.astype(jnp.float32)
        if "xielu" in w:
            an, ap, bb, ee = (w["xielu"][0], w["xielu"][1],
                              w["xielu"][2], w["xielu"][3])
            a = jnp.where(
                uf > 0.0,
                ap * uf * uf + bb * uf,
                (jnp.expm1(jnp.minimum(uf, ee)) - uf) * an + bb * uf,
            ).astype(up.dtype)
        else:
            a = jnp.square(jax.nn.relu(uf)).astype(up.dtype)
    ffn = jax.lax.psum(_mm(a, w["w_down"], qmeta.get("w_down")),
                       MODEL_AXIS)
    if "ffn_post_norm" in w:  # gemma sandwich norm (after down, pre-residual)
        ffn = _rms(ffn, w["ffn_post_norm"], hp.rms_eps).astype(x.dtype)
    if hp.residual_scale != 1.0:
        ffn = ffn * hp.residual_scale
    return x + ffn, c_l


def _cache_rw(leaf, new_row, batch_start, start, row_ok):
    """Write a microbatch's rows into one cache leaf [B, H, S, ...] and
    return (updated leaf, the microbatch's full-S block). Rows with
    row_ok=False are written back unchanged (fill/drain ticks, idle slots)."""
    from ..runtime.kvcache import _seq_write

    b = new_row.shape[0]
    blk_shape = (b,) + leaf.shape[1:]
    blk = jax.lax.dynamic_slice(
        leaf, (batch_start,) + (0,) * (leaf.ndim - 1), blk_shape)
    blk = jax.vmap(
        lambda rc, nr, off, ok: _seq_write(rc, nr, jnp.where(ok, off, -1),
                                           seq_axis=1)
    )(blk, new_row, start, row_ok)
    leaf = jax.lax.dynamic_update_slice(
        leaf, blk, (batch_start,) + (0,) * (leaf.ndim - 1))
    return leaf, blk


def _moe_ffn_tokens(hp, w, hs, llama_moe: bool = False,
                    qmeta: dict | None = None, tp: int = 1):
    """Routed-MoE FFN over token rows hs [N, E] (shared by the generic and
    MLA scan bodies): hparams-driven routing + optional selection bias and
    shared expert (≡ build_moe_ffn, llama-graph.h:785). Expert stacks whose
    name carries qmeta are stage-local PACKED plane dicts [E, rows, N]
    (≡ MUL_MAT_ID running quantized experts in place, mmid.cu) — they are
    re-wrapped as QuantExpertStack so ops/moe dispatches to the stack/gather
    kernels; otherwise the entries are widened dense [E, K, N] arrays.

    tp > 1 = expert parallelism inside the stage: this rank holds E/tp
    experts (sharded on the leading expert dim); routing runs replicated,
    non-local experts' routing weights are zeroed and their slots clamped
    onto local ids (a zero weight nullifies whatever the clamped expert
    computes — exact algebra), and a psum over the model axis combines."""
    from ..models.qwen_moe import norm_weights_policy
    from ..models.weights import QuantExpertStack
    from ..ops.moe import moe_ffn, route

    def exps(key):
        meta = (qmeta or {}).get(key)
        if meta is None:
            return w[key]
        gtype, n_out, n_in, _e = meta
        # leading dim of the LOCAL shard (E/tp under expert parallelism)
        e_local = next(iter(w[key].values())).shape[0]
        return QuantExpertStack(gtype, e_local, n_out, n_in, w[key])

    rl = (hs @ w["router"]).astype(jnp.float32)
    if llama_moe:  # mixtral-on-llama: softmax + renorm (llama.forward)
        gating, norm_w = "softmax", True
    else:
        gating, norm_w = hp.expert_gating_func, norm_weights_policy(hp)
    weights, idx = route(rl, hp.n_expert_used, gating=gating,
                         norm_weights=norm_w,
                         scale=hp.expert_weights_scale,
                         select_bias=w.get("exp_probs_b"))
    gate_s = exps("w_gate_exps")
    up_s = exps("w_up_exps")
    down_s = exps("w_down_exps")
    if tp > 1:
        e_local = (up_s.n_expert if isinstance(up_s, QuantExpertStack)
                   else up_s.shape[0])
        base = jax.lax.axis_index(MODEL_AXIS) * e_local
        local = (idx >= base) & (idx < base + e_local)
        idx = jnp.clip(idx - base, 0, e_local - 1)
        weights = jnp.where(local, weights, 0.0)
    ffn = moe_ffn(hs, weights, idx, gate_s, up_s, down_s)
    if tp > 1:
        ffn = jax.lax.psum(ffn, MODEL_AXIS)
    if "w_gate_shexp" in w:  # shared expert (qwen2moe gated / plain)
        hd_ = hs.astype(w["w_gate_shexp"].dtype)
        g32 = (hd_ @ w["w_gate_shexp"]).astype(jnp.float32)
        up = hd_ @ w["w_up_shexp"]
        sh = (jax.nn.silu(g32).astype(up.dtype) * up) @ w["w_down_shexp"]
        if "shexp_gate_inp" in w:  # qwen2moe sigmoid gate
            gg = jax.nn.sigmoid(
                hs.astype(jnp.float32) @ w["shexp_gate_inp"])[:, None]
            sh = (sh.astype(jnp.float32) * gg).astype(sh.dtype)
        ffn = ffn + sh.astype(ffn.dtype)
    return ffn


def _mla_layer_cached(hp, w, x, positions, c_l, offs, batch_start,
                      tick_valid, moe: bool, qmeta: dict | None = None):
    """One absorbed-MLA deepseek2 block against a stage-local latent plane.

    ≡ llm_build_deepseek2's is_mla=true branch (src/models/deepseek2.cpp,
    models/deepseek2.py forward): MQA over the cached [kv_cmpr | k_pe]
    latent with wk_b folded into the query side and wv_b projecting the
    latent attention output. c_l: this layer's plane [B, 1, S, kvr+n_rot].
    FFN is dense swiglu (lead layers / minicpm3) or deepseek MoE + shared
    experts (moe=True).
    """
    from ..models.deepseek2 import _mla_dims

    b, T, E = x.shape
    H = hp.n_head
    kvr = hp.n_lora_kv
    Dk, Dv, n_rot, n_nope = _mla_dims(hp)
    S = c_l.shape[2]
    scale = hp.attn_scale if hp.attn_scale is not None else Dk ** -0.5
    res_scale = hp.residual_scale

    h = _rms(x, w["attn_norm"], hp.rms_eps)
    if "wq" in w:  # deepseek2-lite: direct q projection
        q = h @ w["wq"]
    else:  # q LoRA compression
        q = _rms(h @ w["wq_a"], w["q_a_norm"], hp.rms_eps) @ w["wq_b"]
    q = q.reshape(b, T, H, Dk)
    q_nope, q_pe = q[..., :n_nope], q[..., n_nope:]
    q_pe = apply_rope(q_pe, positions, hp.rope)

    kv_pe = h @ w["wkv_a"]  # [b, T, kvr + n_rot]
    kv_cmpr = _rms(kv_pe[..., :kvr], w["kv_a_norm"], hp.rms_eps)
    k_pe = apply_rope(kv_pe[..., kvr:].reshape(b, T, 1, n_rot),
                      positions, hp.rope)

    q_abs = jnp.einsum("bthd,hdc->bthc", q_nope.astype(jnp.float32),
                       w["wk_b"].astype(jnp.float32))
    qf = jnp.concatenate([q_abs, q_pe.astype(jnp.float32)], axis=-1)
    latent = jnp.concatenate(
        [kv_cmpr.reshape(b, T, 1, kvr), k_pe], axis=-1)  # [b, T, 1, W]
    row_ok = tick_valid & (offs >= 0)
    start = jnp.maximum(offs, 0)
    c_l, blk = _cache_rw(c_l, latent.transpose(0, 2, 1, 3).astype(c_l.dtype),
                         batch_start, start, row_ok)
    kb = blk[:, 0].astype(jnp.float32)  # [b, S, W]

    scores = jnp.einsum("bthw,bsw->bhts", qf, kb) * scale
    slot = start[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    key_idx = jnp.arange(S, dtype=jnp.int32)
    mask = key_idx[None, None, :] <= slot[:, :, None]  # [b, T, S]
    scores = jnp.where(mask[:, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhts,bsc->bthc", probs, kb[..., :kvr])  # [b, T, H, kvr]
    attn = jnp.einsum("bthc,hec->bthe", o,
                      w["wv_b"].astype(jnp.float32)).reshape(b, T, H * Dv)
    attn_out = attn.astype(x.dtype) @ w["wo"].astype(x.dtype)
    if res_scale != 1.0:  # minicpm3 scale_depth
        attn_out = attn_out * res_scale
    x = x + attn_out

    h = _rms(x, w["ffn_norm"], hp.rms_eps)
    if moe:
        ffn = _moe_ffn_tokens(hp, w, h.reshape(b * T, E),
                              qmeta=qmeta).reshape(b, T, E)
    else:
        up = h @ w["w_up"]
        if "w_gate" in w:
            g32 = (h @ w["w_gate"]).astype(jnp.float32)
            act = jax.nn.silu(g32).astype(up.dtype) * up
        else:  # plm gateless ReLU² (LLM_FFN_RELU_SQR)
            act = jnp.square(jax.nn.relu(up.astype(jnp.float32)))
        ffn = act.astype(h.dtype) @ w["w_down"]
    if res_scale != 1.0:
        ffn = ffn * res_scale
    return x + ffn.astype(x.dtype), c_l


def make_pipeline_step(hp, mesh: Mesh, qmeta: dict | None = None,
                       last_only: bool = False, quant_kv: bool = False,
                       moe: bool = False, opt_keys: tuple = (),
                       gateless: bool = False, return_hidden: bool = False,
                       act: str = "silu"):
    """Jitted serving step with the BatchEngine contract:

        step(params, tokens [B,T] int32 | embds [B,T,E], positions [B,T],
             cache KVCache, offsets [B] int32) → (logits [B,T,V] f32, cache)

    B must divide into M = pp microbatches; rows with offset −1 are idle
    (cache write masked, their logits are garbage the caller ignores). One
    program per (B, T, input-rank) via jit retracing; the cache is donated
    so decode runs in place. `qmeta` marks weight names whose stack entries
    are packed quant planes (see load_stacked_serving).

    With last_only the step takes a trailing n_last scalar and computes the
    lm_head for that row alone, returning [B, 1, V] — the prefill fast path
    (≡ llama_batch.logits flagging one token). Without it, a 512-token
    prefill would carry a [M, b, T, V] f32 accumulator through the scan and
    psum it across the pipe axis just to have the caller keep one row.
    """
    qmeta = qmeta or {}
    assert not (last_only and return_hidden)
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    specs = param_specs(hp, pp, tp)
    stack_specs = {
        k: (P(PIPE_AXIS) if k in (qmeta or {}) else v)
        for k, v in specs["stack"].items()
    }
    if moe:  # router + expert stacks replace the dense FFN weights
        for k in ("w_gate", "w_up", "w_down"):
            del stack_specs[k]
        stack_specs["router"] = P(PIPE_AXIS)
        for k in ("w_gate_exps", "w_up_exps", "w_down_exps"):
            # tp > 1: expert parallelism inside the stage (E shards over
            # the model axis; _moe_ffn_tokens psums the combine)
            stack_specs[k] = (P(PIPE_AXIS, MODEL_AXIS) if tp > 1
                              else P(PIPE_AXIS))
    if gateless:  # arcee/apertus: no ffn_gate stack
        stack_specs.pop("w_gate", None)
    stack_specs["rope_on"] = P(PIPE_AXIS)
    for k in opt_keys:
        stack_specs[k] = _OPT_STACK_SPECS[k]
    specs = {**specs, "stack": stack_specs}
    c_specs = cache_specs(quant_kv)

    def spmd(params, tokens, positions, cache, offsets, n_last):
        stage = jax.lax.axis_index(PIPE_AXIS)
        emb = params["tok_embd"]
        stack = params["stack"]
        B, T = tokens.shape[:2]
        if B % pp:
            raise ValueError(f"batch {B} must be divisible by pp {pp}")
        M = pp
        b = B // M
        is_embd = tokens.ndim == 3
        mb_toks = tokens.reshape((M, b, T) + tokens.shape[2:])
        mb_pos = positions.reshape(M, b, T)
        mb_offs = offsets.reshape(M, b)
        n_ticks = M + pp - 1
        E = hp.n_embd
        T_out = 1 if last_only else T
        v_loc = E if return_hidden else params["output"].shape[1]
        logits_acc = jnp.zeros((M, b, T_out, v_loc), jnp.float32)
        x0 = jnp.zeros((b, T, E), jnp.float32)
        c_leaves, c_def = jax.tree.flatten(cache)
        c_leaves = tuple(c_leaves)

        def tick(carry, t):
            x, c_leaves, acc = carry
            ti = jnp.clip(t, 0, M - 1)
            feed = mb_toks[ti] if is_embd else emb[mb_toks[ti]]
            if hp.embd_scale != 1.0 and not is_embd:  # granite multiplier
                feed = feed * jnp.asarray(hp.embd_scale, feed.dtype)
            x = jnp.where((stage == 0) & (t < M), feed.astype(jnp.float32), x)
            m = t - stage  # microbatch this stage works on now
            tick_valid = (m >= 0) & (m < M)
            mi = jnp.clip(m, 0, M - 1)
            pos = mb_pos[mi]
            offs = mb_offs[mi]
            bs = mi * b

            def body(xc, layer_state):
                w = layer_state[0]
                xn, c_l = _layer_cached(
                    hp, tp, w, xc, pos, layer_state[1:], offs, bs,
                    tick_valid, qmeta, act=act)
                return xn, c_l

            x_out, c_leaves = jax.lax.scan(
                body, x, (stack,) + c_leaves)
            # last stage emits logits for the microbatch that just left;
            # lax.cond skips the head matmul on every other (stage, tick)
            m_out = t - (pp - 1)
            use = (stage == pp - 1) & (m_out >= 0) & (m_out < M)
            mo = jnp.clip(m_out, 0, M - 1)

            def do_head(acc):
                xr = x_out
                if last_only:  # per-row flagged position through the head
                    rows = n_last.reshape(M, b)[mo]
                    xr = jax.vmap(
                        lambda xrow, i: jax.lax.dynamic_slice_in_dim(
                            xrow, i, 1, axis=0)
                    )(x_out, rows)
                h = _rms(xr, params["output_norm"], hp.rms_eps)
                if return_hidden:  # embeddings endpoint: final-norm states
                    lg = h.astype(jnp.float32)
                else:
                    lg = (h @ params["output"]).astype(jnp.float32)
                    if hp.logit_scale != 1.0:  # granite: / f_logit_scale
                        lg = lg / hp.logit_scale
                    if hp.softcap_final:  # gemma2 final-logit softcap
                        lg = jnp.tanh(lg / hp.softcap_final) \
                            * hp.softcap_final
                return jax.lax.dynamic_update_slice(
                    acc, lg[None], (mo, 0, 0, 0))

            acc = jax.lax.cond(use, do_head, lambda a: a, acc)
            x = jax.lax.ppermute(
                x_out, PIPE_AXIS, [(i, (i + 1) % pp) for i in range(pp)])
            return (x, c_leaves, acc), None

        (x, c_leaves, logits_acc), _ = jax.lax.scan(
            tick, (x0, c_leaves, logits_acc), jnp.arange(n_ticks))
        # logits live on the last stage only; replicate across pipe
        logits_acc = jax.lax.psum(logits_acc, PIPE_AXIS)
        return (logits_acc.reshape((B, T_out, v_loc)),
                jax.tree.unflatten(c_def, list(c_leaves)))

    out_spec = P() if return_hidden else P(None, None, MODEL_AXIS)
    fn = shard_map_compat(
        spmd, mesh=mesh,
        in_specs=(specs, P(), P(), c_specs, P(), P()),
        out_specs=(out_spec, c_specs),
    )

    if return_hidden:
        @functools.partial(jax.jit, donate_argnames=("cache",))
        def step(params, tokens, positions, cache, offsets):
            return fn(params, tokens, positions, cache, offsets,
                      jnp.int32(0))
    elif last_only:
        @functools.partial(jax.jit, donate_argnames=("cache",))
        def step(params, tokens, positions, cache, offsets, n_last):
            n_last = jnp.asarray(n_last, jnp.int32)
            if n_last.ndim == 0:  # scalar = same flagged row for all slots
                n_last = jnp.broadcast_to(n_last, (tokens.shape[0],))
            logits, cache = fn(params, tokens, positions, cache, offsets,
                               n_last)
            return logits[:, :, : hp.n_vocab], cache
    else:
        @functools.partial(jax.jit, donate_argnames=("cache",))
        def step(params, tokens, positions, cache, offsets):
            logits, cache = fn(params, tokens, positions, cache, offsets,
                               jnp.int32(0))
            return logits[:, :, : hp.n_vocab], cache

    return step


def make_mla_pipeline_step(hp, mesh: Mesh, params: dict,
                           qmeta: dict | None = None,
                           last_only: bool = False,
                           return_hidden: bool = False):
    """Jitted deepseek2-family (absorbed MLA) serving step with the
    BatchEngine contract (see make_pipeline_step). The dense-lead layers run
    replicated on every stage as a prologue when stage 0 feeds a microbatch
    (they are 1-3 layers against 27-61 scanned ones); the scanned layers
    rotate through stages exactly like the generic step. Cache is the
    {"lead", "stage"} dict from make_mla_stacked_cache.
    """
    assert not (last_only and return_hidden)
    pp = mesh.shape[PIPE_AXIS]
    n_lead = hp.n_layer_dense_lead
    moe = "router" in params["stack"]
    specs = {
        "tok_embd": P(), "output_norm": P(), "output": P(),
        "stack": {k: P(PIPE_AXIS) for k in params["stack"]},
    }
    if "lead" in params:
        specs["lead"] = {k: P() for k in params["lead"]}
    c_specs = mla_cache_specs()

    def spmd(params, tokens, positions, cache, offsets, n_last):
        stage = jax.lax.axis_index(PIPE_AXIS)
        emb = params["tok_embd"]
        stack = params["stack"]
        B, T = tokens.shape[:2]
        if B % pp:
            raise ValueError(f"batch {B} must be divisible by pp {pp}")
        M = pp
        b = B // M
        is_embd = tokens.ndim == 3
        mb_toks = tokens.reshape((M, b, T) + tokens.shape[2:])
        mb_pos = positions.reshape(M, b, T)
        mb_offs = offsets.reshape(M, b)
        n_ticks = M + pp - 1
        E = hp.n_embd
        T_out = 1 if last_only else T
        v_loc = E if return_hidden else params["output"].shape[1]
        logits_acc = jnp.zeros((M, b, T_out, v_loc), jnp.float32)
        x0 = jnp.zeros((b, T, E), jnp.float32)
        c_lead = cache["lead"]
        c_stage = cache["stage"]

        def tick(carry, t):
            x, c_lead, c_stage, acc = carry
            ti = jnp.clip(t, 0, M - 1)
            feed = mb_toks[ti] if is_embd else emb[mb_toks[ti]]
            if hp.embd_scale != 1.0 and not is_embd:  # minicpm3 scale_embd
                feed = feed * jnp.asarray(hp.embd_scale, feed.dtype)
            feed = feed.astype(jnp.float32)
            feed_valid = t < M
            if n_lead:
                # replicated dense-lead prologue: every stage computes the
                # same result against the replicated lead cache, so the fed
                # microbatch arrives at stage 0 already past the lead layers
                def lead_body(xc, ls):
                    xn, c_l = _mla_layer_cached(
                        hp, ls[0], xc, mb_pos[ti], ls[1], mb_offs[ti],
                        ti * b, feed_valid, moe=False)
                    return xn, c_l

                feed, c_lead = jax.lax.scan(
                    lead_body, feed, (params["lead"], c_lead))
            x = jnp.where((stage == 0) & feed_valid, feed, x)
            m = t - stage
            tick_valid = (m >= 0) & (m < M)
            mi = jnp.clip(m, 0, M - 1)
            pos = mb_pos[mi]
            offs = mb_offs[mi]
            bs = mi * b

            def body(xc, ls):
                xn, c_l = _mla_layer_cached(
                    hp, ls[0], xc, pos, ls[1], offs, bs, tick_valid,
                    moe=moe, qmeta=qmeta)
                return xn, c_l

            x_out, c_stage = jax.lax.scan(body, x, (stack, c_stage))
            m_out = t - (pp - 1)
            use = (stage == pp - 1) & (m_out >= 0) & (m_out < M)
            mo = jnp.clip(m_out, 0, M - 1)

            def do_head(acc):
                xr = x_out
                if last_only:
                    rows = n_last.reshape(M, b)[mo]
                    xr = jax.vmap(
                        lambda xrow, i: jax.lax.dynamic_slice_in_dim(
                            xrow, i, 1, axis=0)
                    )(x_out, rows)
                h = _rms(xr, params["output_norm"], hp.rms_eps)
                if return_hidden:
                    lg = h.astype(jnp.float32)
                else:
                    lg = (h @ params["output"]).astype(jnp.float32)
                    if hp.logit_scale != 1.0:
                        lg = lg / hp.logit_scale
                    if hp.softcap_final:
                        lg = jnp.tanh(lg / hp.softcap_final) \
                            * hp.softcap_final
                return jax.lax.dynamic_update_slice(
                    acc, lg[None], (mo, 0, 0, 0))

            acc = jax.lax.cond(use, do_head, lambda a: a, acc)
            x = jax.lax.ppermute(
                x_out, PIPE_AXIS, [(i, (i + 1) % pp) for i in range(pp)])
            return (x, c_lead, c_stage, acc), None

        (x, c_lead, c_stage, logits_acc), _ = jax.lax.scan(
            tick, (x0, c_lead, c_stage, logits_acc), jnp.arange(n_ticks))
        logits_acc = jax.lax.psum(logits_acc, PIPE_AXIS)
        return (logits_acc.reshape((B, T_out, v_loc)),
                {"lead": c_lead, "stage": c_stage})

    fn = shard_map_compat(
        spmd, mesh=mesh,
        in_specs=(specs, P(), P(), c_specs, P(), P()),
        out_specs=(P(), c_specs),
    )

    if return_hidden:
        @functools.partial(jax.jit, donate_argnames=("cache",))
        def step(params, tokens, positions, cache, offsets):
            return fn(params, tokens, positions, cache, offsets,
                      jnp.int32(0))
    elif last_only:
        @functools.partial(jax.jit, donate_argnames=("cache",))
        def step(params, tokens, positions, cache, offsets, n_last):
            n_last = jnp.asarray(n_last, jnp.int32)
            if n_last.ndim == 0:
                n_last = jnp.broadcast_to(n_last, (tokens.shape[0],))
            logits, cache = fn(params, tokens, positions, cache, offsets,
                               n_last)
            return logits[:, :, : hp.n_vocab], cache
    else:
        @functools.partial(jax.jit, donate_argnames=("cache",))
        def step(params, tokens, positions, cache, offsets):
            logits, cache = fn(params, tokens, positions, cache, offsets,
                               jnp.int32(0))
            return logits[:, :, : hp.n_vocab], cache

    return step


class PipelineEngine:
    """Layer-split (+ optional TP) inference over a pipe×model mesh.

    The multi-stage serving path the reference reaches with
    --split-mode layer over N GPUs (src/llama-model.cpp:2616). Plain
    llama-family graphs (no MoE/bias variants); weights enter dense. For
    continuous batching on a pipe mesh, use BatchEngine(mesh=...) which
    drives the same step function through the server scheduler.
    """

    def __init__(self, model_path, *, mesh: Mesh, batch: int | None = None,
                 max_seq: int = 2048, dtype=jnp.bfloat16, mode: str = "auto"):
        from ..gguf.reader import GGUFReader
        from ..models.registry import load_hparams
        from .. import tokenizer as tokenizer_mod

        self.reader = GGUFReader(model_path)
        self.hp = load_hparams(self.reader)
        self.tokenizer = tokenizer_mod.from_gguf(self.reader)
        self.mesh = mesh
        self.pp = mesh.shape[PIPE_AXIS]
        self.batch = batch if batch is not None else self.pp
        self.max_seq = max_seq
        self.params, self.qmeta, self.n_vocab_pad = load_stacked_serving(
            self.reader, self.hp, mesh, dtype=dtype, mode=mode)
        self.cache = make_stacked_cache(self.hp, self.batch, max_seq, mesh,
                                        dtype=dtype)
        self.n_past = np.zeros((self.batch,), np.int64)
        if isinstance(dtype, str):
            raise NotImplementedError(
                "PipelineEngine stores its cache at the weight dtype; use "
                "BatchEngine(kv_dtype='q8_0', mesh=...) for quantized KV"
            )
        self._step = make_pipeline_step(
            self.hp, mesh, self.qmeta,
            **step_flags(self.params["stack"], self.hp))

    def forward_batch(self, tokens: np.ndarray) -> np.ndarray:
        """Run [B, T] tokens through the pipeline; rows may sit at different
        positions (per-row offsets); returns logits [B, T, n_vocab] f32."""
        B, T = tokens.shape
        if B != self.batch:
            raise ValueError(f"batch {B} != engine batch {self.batch}")
        offs = self.n_past.astype(np.int32)
        pos = offs[:, None] + np.arange(T, dtype=np.int32)[None]
        logits, self.cache = self._step(
            self.params, jnp.asarray(tokens.astype(np.int32)),
            jnp.asarray(pos), self.cache, jnp.asarray(offs))
        self.n_past += T
        return np.asarray(logits)
