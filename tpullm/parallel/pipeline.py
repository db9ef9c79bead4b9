"""4-D-parallel llama training step: dp × pp × tp (× sp on activations).

The reference's multi-device story is scheduler-driven layer splits with
micro-batch copy overlap (SURVEY.md §2.9: LLAMA_SPLIT_MODE_LAYER +
GGML_SCHED_MAX_COPIES pipelining) over PCIe/NVLink. The TPU-native
re-design uses one `shard_map` SPMD program over a ("data", "pipe", "model")
mesh:

  data  — batch sharding; gradients all-reduced over the axis (psum)
  pipe  — GPipe-style stage parallelism: each stage holds a contiguous slice
          of the stacked layer weights; microbatch activations rotate through
          stages with ppermute (the ICI analog of the scheduler's inter-GPU
          activation copies), M = n_pipe microbatches fill the pipeline
  model — Megatron tensor parallelism with EXPLICIT collectives: column-split
          qkv/gate/up, row-split wo/down, one psum per block half

Everything is differentiable; jax.grad runs through ppermute/psum, giving the
standard reverse pipeline schedule for free.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


def shard_map_compat(fn, mesh, in_specs, out_specs):
    """jax.shard_map across the 0.8 API move (check_rep → check_vma)."""
    try:
        from jax import shard_map as sm

        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except (ImportError, TypeError):  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map as sm

        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def make_mesh3(dp: int, pp: int, tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * pp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, pp, tp)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# stacked parameter layout: every per-layer weight as one [n_layer, ...] array
# (scan-over-layers form; the pipe axis shards dim 0 in layer-contiguous
# stages, the model axis shards the TP dimension)


@dataclass(frozen=True)
class StackSpec:
    key: str
    tp_dim: int | None  # dim sharded over MODEL_AXIS (after the layer dim)


STACKED_WEIGHTS = (
    StackSpec("attn_norm", None),
    StackSpec("wq", 2),      # [L, E, H*D] col-parallel
    StackSpec("wk", 2),
    StackSpec("wv", 2),
    StackSpec("wo", 1),      # [L, H*D, E] row-parallel
    StackSpec("ffn_norm", None),
    StackSpec("w_gate", 2),
    StackSpec("w_up", 2),
    StackSpec("w_down", 1),
)


def stack_llama_params(params: dict) -> dict:
    """Per-layer dict params (dense f32) → stacked arrays for scan/pipe."""
    layers = params["layers"]

    def get(key):
        vals = []
        for lyr in layers:
            v = lyr[key]
            vals.append(v.w if hasattr(v, "w") else v)
        return jnp.stack(vals, axis=0)

    return {
        "tok_embd": params["tok_embd"].astype(jnp.float32),
        "output_norm": params["output_norm"],
        "output": (params["output"].w if params["output"] is not None else None),
        "stack": {s.key: get(s.key) for s in STACKED_WEIGHTS},
    }


def param_specs(hp, pp: int, tp: int) -> dict:
    """PartitionSpecs: stage-sharded layer stacks + TP dims."""
    stack_specs = {}
    for s in STACKED_WEIGHTS:
        spec = [PIPE_AXIS, None, None][: 2 if s.tp_dim is None else 3]
        if s.tp_dim is not None:
            spec = [PIPE_AXIS, None, None]
            spec[s.tp_dim] = MODEL_AXIS
        stack_specs[s.key] = P(*spec)
    return {
        "tok_embd": P(),
        "output_norm": P(),
        "output": P(None, MODEL_AXIS),
        "stack": stack_specs,
    }


# ---------------------------------------------------------------------------
# the SPMD program (runs per device under shard_map)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * w


def _rope(x, base):
    # neox-free "norm"-style rope over [B, T, H, D]
    B, T, H, D = x.shape
    pos = jnp.arange(T, dtype=jnp.float32)
    inv = base ** (-jnp.arange(0, D // 2, dtype=jnp.float32) * 2.0 / D)
    theta = pos[:, None] * inv[None, :]
    c, s = jnp.cos(theta), jnp.sin(theta)
    x0, x1 = x[..., 0::2], x[..., 1::2]
    c = c[None, :, None, :]
    s = s[None, :, None, :]
    ro = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return ro.reshape(B, T, H, D)


def _layer(hp, tp: int, w, x):
    """One llama block with explicit TP collectives (x: [B, T, E] local)."""
    B, T, E = x.shape
    n_head_l = hp.n_head // tp      # heads per model shard
    n_kv_l = max(hp.n_head_kv // tp, 1)
    hd = hp.head_dim

    h = _rms(x, w["attn_norm"], hp.rms_eps)
    q = (h @ w["wq"]).reshape(B, T, n_head_l, hd)
    k = (h @ w["wk"]).reshape(B, T, n_kv_l, hd)
    v = (h @ w["wv"]).reshape(B, T, n_kv_l, hd)
    q = _rope(q, hp.rope.freq_base)
    k = _rope(k, hp.rope.freq_base)
    g = n_head_l // n_kv_l
    qf = q.reshape(B, T, n_kv_l, g, hd)
    scores = jnp.einsum("bthgd,bshd->bhgts", qf, k) * (hd ** -0.5)
    mask = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("bhgts,bshd->bthgd", probs, v).reshape(B, T, n_head_l * hd)
    # row-parallel wo: local partial matmul + psum over the model axis
    x = x + jax.lax.psum(attn @ w["wo"], MODEL_AXIS)

    h = _rms(x, w["ffn_norm"], hp.rms_eps)
    act = jax.nn.silu(h @ w["w_gate"]) * (h @ w["w_up"])
    x = x + jax.lax.psum(act @ w["w_down"], MODEL_AXIS)
    return x


def _stage(hp, tp, stack, x):
    """Apply this pipe stage's local layers (scan over the leading dim)."""

    def body(xc, w):
        return _layer(hp, tp, w, xc), None

    x, _ = jax.lax.scan(body, x, stack)
    return x


def make_pipeline_train_step(hp, mesh: Mesh, lr: float = 1e-3):
    """Returns (stacked_params, tokens [B, T]) → (new_params, loss).

    GPipe schedule with M = pp microbatches: tokens are split into M
    microbatches; activations enter at stage 0, rotate via ppermute each
    tick, logits/loss are computed when a microbatch leaves the last stage.
    SGD update with gradients psum-ed over data axis (dp) — pp/tp gradients
    are already local to their shards.
    """
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    specs = param_specs(hp, pp, tp)
    token_spec = P(DATA_AXIS, None)

    def spmd(params, tokens):
        stage_idx = jax.lax.axis_index(PIPE_AXIS)
        B, T = tokens.shape
        M = pp  # microbatches
        assert B % M == 0, f"batch {B} must divide into {M} microbatches"
        mb = tokens.reshape(M, B // M, T)

        def loss_fn(params):
            emb = params["tok_embd"]
            out_norm = params["output_norm"]
            w_out = params["output"]
            stack = params["stack"]

            n_ticks = 2 * M - 1  # fill + drain
            x_cur = jnp.zeros((B // M, T, hp.n_embd), jnp.float32)
            total_nll = jnp.zeros((), jnp.float32)

            def tick(carry, t):
                x_cur, total = carry
                # stage 0 ingests microbatch t (when in range)
                feed = emb[mb[jnp.clip(t, 0, M - 1)]]
                x_in = jnp.where(
                    (stage_idx == 0) & (t < M), feed.astype(jnp.float32), x_cur
                )
                x_out = _stage(hp, tp, stack, x_in)
                # last stage: compute loss for the microbatch that entered at
                # tick t - (pp - 1)
                mb_idx = t - (pp - 1)
                h = _rms(x_out, out_norm, hp.rms_eps)
                logits = h @ w_out  # [b, T, V/tp] column-sharded
                # cross-entropy over the tp-sharded vocab: max/sum via psum
                tgt = mb[jnp.clip(mb_idx, 0, M - 1)][:, 1:]
                lg = logits[:, :-1]
                # mask vocab-padding columns (head padded to a tp multiple)
                v_loc = lg.shape[-1]
                col = jax.lax.axis_index(MODEL_AXIS) * v_loc + jnp.arange(v_loc)
                lg = jnp.where(col < hp.n_vocab, lg, -1e30)
                # stop_gradient: logsumexp is shift-invariant, so the max
                # term carries no gradient (and pmax has no JVP rule)
                mx = jax.lax.pmax(
                    jax.lax.stop_gradient(lg).max(axis=-1), MODEL_AXIS
                )
                ex = jnp.exp(lg - mx[..., None])
                z = jax.lax.psum(ex.sum(axis=-1), MODEL_AXIS)
                v_local = lg.shape[-1]
                off = stage_idx * 0 + jax.lax.axis_index(MODEL_AXIS) * v_local
                idx = tgt - off
                in_shard = (idx >= 0) & (idx < v_local)
                picked = jnp.take_along_axis(
                    lg, jnp.clip(idx, 0, v_local - 1)[..., None], axis=-1
                )[..., 0]
                picked = jax.lax.psum(jnp.where(in_shard, picked, 0.0), MODEL_AXIS)
                nll = (jnp.log(z) + mx - picked).mean()
                use = (stage_idx == pp - 1) & (mb_idx >= 0)
                total = total + jnp.where(use, nll, 0.0)
                # rotate activations to the next stage
                x_next = jax.lax.ppermute(
                    x_out, PIPE_AXIS,
                    [(i, (i + 1) % pp) for i in range(pp)],
                )
                return (x_next, total), None

            (x_cur, total_nll), _ = jax.lax.scan(
                tick, (x_cur, total_nll), jnp.arange(n_ticks)
            )
            # loss lives on the last stage; broadcast it across pipe so every
            # shard optimizes the same scalar, and average over data axis
            total_nll = jax.lax.psum(total_nll, PIPE_AXIS) / M
            return jax.lax.pmean(total_nll, DATA_AXIS)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, DATA_AXIS), grads)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    fn = shard_map_compat(
        spmd, mesh=mesh,
        in_specs=(specs, token_spec),
        out_specs=(specs, P()),
    )
    return jax.jit(fn)


def place_stacked(params: dict, hp, mesh: Mesh) -> dict:
    """Device-put the stacked params with their pipeline/TP shardings."""
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    specs = param_specs(hp, pp, tp)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    # pad the vocab dim up to a multiple of tp (padded logit columns are
    # masked to -inf in the loss)
    w_out = params["output"]
    if w_out is None:
        w_out = params["tok_embd"].T
    pad = (-w_out.shape[1]) % tp
    if pad:
        w_out = jnp.pad(w_out, ((0, 0), (0, pad)))

    return {
        "tok_embd": put(params["tok_embd"], specs["tok_embd"]),
        "output_norm": put(params["output_norm"], specs["output_norm"]),
        "output": put(w_out, specs["output"]),
        "stack": {
            k: put(v, specs["stack"][k]) for k, v in params["stack"].items()
        },
    }
