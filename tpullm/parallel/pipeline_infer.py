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

Prefill and decode are the same program at different T; both are jitted once
per (B, T) and reused for the whole session.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.rope import apply_rope
from .pipeline import (
    MODEL_AXIS,
    PIPE_AXIS,
    STACKED_WEIGHTS,
    param_specs,
    stack_llama_params,
    _rms,
)


def cache_specs() -> tuple:
    """(k, v) stacked cache [L, B, Hkv, S, D]: layer dim on the pipe axis,
    kv-head dim on the model axis."""
    return (P(PIPE_AXIS, None, MODEL_AXIS), P(PIPE_AXIS, None, MODEL_AXIS))


def make_stacked_cache(hp, batch: int, max_seq: int, mesh: Mesh,
                       dtype=jnp.bfloat16) -> tuple:
    n_kv = max(hp.n_head_kv, 1)
    shape = (hp.n_layer, batch, n_kv, max_seq, hp.head_dim)
    k_spec, v_spec = cache_specs()
    k = jax.device_put(jnp.zeros(shape, dtype), NamedSharding(mesh, k_spec))
    v = jax.device_put(jnp.zeros(shape, dtype), NamedSharding(mesh, v_spec))
    return (k, v)


def place_stacked_infer(params: dict, hp, mesh: Mesh, dtype=jnp.bfloat16):
    """Stack per-layer params and place them with pipe/TP shardings.

    Returns (stacked_params, n_vocab_padded). The output head's vocab dim is
    padded up to a tp multiple; padded logit columns are sliced off on the
    host side.
    """
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    if hp.n_layer % pp:
        raise ValueError(f"n_layer {hp.n_layer} must divide pp {pp}")
    stacked = stack_llama_params(params)
    specs = param_specs(hp, pp, tp)

    def put(x, spec):
        return jax.device_put(jnp.asarray(x, dtype), NamedSharding(mesh, spec))

    w_out = stacked["output"]
    if w_out is None:
        w_out = stacked["tok_embd"].T
    pad = (-w_out.shape[1]) % tp
    if pad:
        w_out = jnp.pad(w_out, ((0, 0), (0, pad)))
    placed = {
        "tok_embd": put(stacked["tok_embd"], specs["tok_embd"]),
        "output_norm": put(stacked["output_norm"], specs["output_norm"]),
        "output": put(w_out, specs["output"]),
        "stack": {
            k: put(v, specs["stack"][k]) for k, v in stacked["stack"].items()
        },
    }
    return placed, w_out.shape[1]


def _layer_cached(hp, tp: int, w, x, positions, k_l, v_l, offset,
                  batch_start, valid):
    """One llama block against a stage-local cache slice.

    x: [b, T, E]; k_l/v_l: [B, Hkv_local, S, D] (full batch rows, this
    stage's layer); the microbatch occupies rows [batch_start, batch_start+b).
    When `valid` is false (pipeline fill/drain tick) the cache row is written
    back unchanged, so bubble ticks are pure no-ops on state.
    """
    b, T, E = x.shape
    n_head_l = hp.n_head // tp
    n_kv_l = max(hp.n_head_kv // tp, 1)
    hd = hp.head_dim
    S = k_l.shape[2]

    h = _rms(x, w["attn_norm"], hp.rms_eps)
    q = (h @ w["wq"]).reshape(b, T, n_head_l, hd)
    k = (h @ w["wk"]).reshape(b, T, n_kv_l, hd)
    v = (h @ w["wv"]).reshape(b, T, n_kv_l, hd)
    q = apply_rope(q, positions, hp.rope)
    k = apply_rope(k, positions, hp.rope)

    k = k.transpose(0, 2, 1, 3)  # [b, Hkv, T, D]
    v = v.transpose(0, 2, 1, 3)
    old_k = jax.lax.dynamic_slice(
        k_l, (batch_start, 0, offset, 0), (b, n_kv_l, T, hd))
    old_v = jax.lax.dynamic_slice(
        v_l, (batch_start, 0, offset, 0), (b, n_kv_l, T, hd))
    k_w = jnp.where(valid, k.astype(k_l.dtype), old_k)
    v_w = jnp.where(valid, v.astype(v_l.dtype), old_v)
    k_l = jax.lax.dynamic_update_slice(k_l, k_w, (batch_start, 0, offset, 0))
    v_l = jax.lax.dynamic_update_slice(v_l, v_w, (batch_start, 0, offset, 0))

    keys = jax.lax.dynamic_slice(
        k_l, (batch_start, 0, 0, 0), (b, n_kv_l, S, hd))
    vals = jax.lax.dynamic_slice(
        v_l, (batch_start, 0, 0, 0), (b, n_kv_l, S, hd))
    g = n_head_l // n_kv_l
    qf = q.reshape(b, T, n_kv_l, g, hd).astype(jnp.float32)
    scores = jnp.einsum("bthgd,bhsd->bhgts", qf, keys.astype(jnp.float32))
    scores = scores * (hd ** -0.5)
    slot = offset + jnp.arange(T, dtype=jnp.int32)  # query slots
    key_idx = jnp.arange(S, dtype=jnp.int32)
    mask = key_idx[None, :] <= slot[:, None]  # [T, S] causal over slots
    scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("bhgts,bhsd->bthgd", probs,
                      vals.astype(jnp.float32)).astype(x.dtype)
    attn = attn.reshape(b, T, n_head_l * hd)
    x = x + jax.lax.psum(attn @ w["wo"], MODEL_AXIS)

    h = _rms(x, w["ffn_norm"], hp.rms_eps)
    act = jax.nn.silu((h @ w["w_gate"]).astype(jnp.float32)).astype(h.dtype) \
        * (h @ w["w_up"])
    x = x + jax.lax.psum(act @ w["w_down"], MODEL_AXIS)
    return x, k_l, v_l


def make_pipeline_infer_step(hp, mesh: Mesh, batch: int, seq: int):
    """Jitted (params, tokens [B,T], positions [B,T], (k,v), offset) →
    (logits [B,T,Vpad] f32, (k,v)).

    B must divide into M = pp microbatches. The cache is donated, so decode
    steps run in place.
    """
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    if batch % pp:
        raise ValueError(f"batch {batch} must be divisible by pp {pp}")
    M = pp
    b = batch // M
    specs = param_specs(hp, pp, tp)
    k_spec, v_spec = cache_specs()

    def spmd(params, tokens, positions, k_c, v_c, offset):
        stage = jax.lax.axis_index(PIPE_AXIS)
        emb = params["tok_embd"]
        stack = params["stack"]
        B, T = tokens.shape
        mb_toks = tokens.reshape(M, b, T)
        mb_pos = positions.reshape(M, b, T)
        n_ticks = M + pp - 1
        E = hp.n_embd
        v_loc = params["output"].shape[1]
        logits_acc = jnp.zeros((M, b, T, v_loc), jnp.float32)
        x0 = jnp.zeros((b, T, E), jnp.float32)

        def tick(carry, t):
            x, k_c, v_c, acc = carry
            feed = emb[mb_toks[jnp.clip(t, 0, M - 1)]].astype(jnp.float32)
            x = jnp.where((stage == 0) & (t < M), feed, x)
            m = t - stage  # microbatch this stage works on now
            valid = (m >= 0) & (m < M)
            mi = jnp.clip(m, 0, M - 1)
            pos = mb_pos[mi]
            bs = mi * b

            def body(xc, layer_state):
                w, k_l, v_l = layer_state
                xn, k_l, v_l = _layer_cached(
                    hp, tp, w, xc, pos, k_l, v_l, offset, bs, valid)
                return xn, (k_l, v_l)

            x_out, (k_c, v_c) = jax.lax.scan(body, x, (stack, k_c, v_c))
            # last stage emits logits for the microbatch that just left
            h = _rms(x_out, params["output_norm"], hp.rms_eps)
            lg = (h @ params["output"]).astype(jnp.float32)
            m_out = t - (pp - 1)
            use = (stage == pp - 1) & (m_out >= 0) & (m_out < M)
            mo = jnp.clip(m_out, 0, M - 1)
            old = jax.lax.dynamic_slice(
                acc, (mo, 0, 0, 0), (1, b, T, v_loc))
            upd = jnp.where(use, lg[None], old)
            acc = jax.lax.dynamic_update_slice(acc, upd, (mo, 0, 0, 0))
            x = jax.lax.ppermute(
                x_out, PIPE_AXIS, [(i, (i + 1) % pp) for i in range(pp)])
            return (x, k_c, v_c, acc), None

        (x, k_c, v_c, logits_acc), _ = jax.lax.scan(
            tick, (x0, k_c, v_c, logits_acc), jnp.arange(n_ticks))
        # logits live on the last stage only; replicate across pipe
        logits_acc = jax.lax.psum(logits_acc, PIPE_AXIS)
        return logits_acc.reshape(B, T, v_loc), k_c, v_c

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        spmd, mesh=mesh,
        in_specs=(specs, P(), P(), k_spec, v_spec, P()),
        out_specs=(P(None, None, MODEL_AXIS), k_spec, v_spec),
        check_rep=False,
    )

    @functools.partial(jax.jit, donate_argnums=(3, 4))
    def step(params, tokens, positions, k_c, v_c, offset):
        return fn(params, tokens, positions, k_c, v_c, offset)

    return step


class PipelineEngine:
    """Layer-split (+ optional TP) inference over a pipe×model mesh.

    The multi-stage serving path the reference reaches with
    --split-mode layer over N GPUs (src/llama-model.cpp:2616). Plain
    llama-family graphs (no MoE/bias variants); weights enter dense.
    """

    def __init__(self, model_path, *, mesh: Mesh, batch: int | None = None,
                 max_seq: int = 2048, dtype=jnp.bfloat16):
        from ..gguf.reader import GGUFReader
        from ..models.registry import get_arch, load_hparams
        from .. import tokenizer as tokenizer_mod

        self.reader = GGUFReader(model_path)
        self.hp = load_hparams(self.reader)
        arch = get_arch(self.hp.arch)
        self.tokenizer = tokenizer_mod.from_gguf(self.reader)
        raw = arch.build_params(self.reader, self.hp, mode="dense",
                                dtype=jnp.float32)
        self.mesh = mesh
        self.pp = mesh.shape[PIPE_AXIS]
        self.batch = batch if batch is not None else self.pp
        self.max_seq = max_seq
        self.params, self.n_vocab_pad = place_stacked_infer(
            raw, self.hp, mesh, dtype=dtype)
        self.cache = make_stacked_cache(self.hp, self.batch, max_seq, mesh,
                                        dtype=dtype)
        self.n_past = np.zeros((self.batch,), np.int64)
        self._steps: dict = {}

    def _step_for(self, T: int):
        fn = self._steps.get(T)
        if fn is None:
            fn = make_pipeline_infer_step(self.hp, self.mesh, self.batch, T)
            self._steps[T] = fn
        return fn

    def forward_batch(self, tokens: np.ndarray) -> np.ndarray:
        """Run [B, T] tokens through the pipeline (all rows advance in
        lockstep); returns logits [B, T, n_vocab] f32."""
        B, T = tokens.shape
        if B != self.batch:
            raise ValueError(f"batch {B} != engine batch {self.batch}")
        off = int(self.n_past[0])
        if not (self.n_past == off).all():
            raise ValueError("pipeline rows must advance in lockstep")
        pos = np.broadcast_to(
            np.arange(off, off + T, dtype=np.int32), (B, T))
        step = self._step_for(T)
        k, v = self.cache
        logits, k, v = step(
            self.params, jnp.asarray(tokens.astype(np.int32)),
            jnp.asarray(pos), k, v, jnp.int32(off))
        self.cache = (k, v)
        self.n_past += T
        return np.asarray(logits[:, :, : self.hp.n_vocab])
