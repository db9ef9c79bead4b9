"""Layer-split pipeline serving for hybrid attention+SSM archs.

The generic pipeline scan (pipeline_infer.make_pipeline_step) requires one
homogeneous per-layer structure; hybrid archs (nemotron-h, granite-hybrid,
jamba) interleave mamba mixers, attention blocks and FFN-only sandwich
layers. This module stacks the UNION tensor set per layer (absent tensors
zero-padded — the reference's scheduler splits any graph because ggml
re-plans per layer, ggml-backend.cpp:1157; under XLA's static shapes the
union+flag encoding buys the same generality) and dispatches per layer
inside the stage scan with `lax.switch` on a stacked kind flag:

    kind 0 = attention (GQA, rope-free unless granite rope_finetuned)
    kind 1 = mamba mixer (mamba2 SSD for nemotron-h / granite-hybrid,
             mamba1 selective scan for jamba — model-level switch)
    kind 2 = FFN-only sandwich layer (nemotron-h ReLU²)
    kind 3 = PARALLEL attention + mamba2 summed per layer (falcon-h1)

plus an optional PAIRED second FFN sub-block after the mixer
(granite-hybrid / jamba layer shape). The stage cache carries all four
hybrid state leaves pipe-sharded on the layer dim; conv/ssm states update
masked (idle rows and fill/drain ticks write back unchanged).

Scope: hybrids with dense FFN slots, tp=1 stages (mamba inner state has
no natural head axis to shard), dense (widened) weights. MoE FFN slots
(nemotron_h_moe, jamba-moe) stay on the --dp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hparams import HParams
from .mesh import MODEL_AXIS
from .pipeline import shard_map_compat
from .pipeline_infer import PIPE_AXIS, _rms

K_ATTN, K_MAMBA2, K_FFN, K_PARALLEL = 0, 1, 2, 3

# per-layer weight slots: name -> shape builder (zero-padded when absent)
_VEC = "vec"


def hybrid_cache_specs():
    return (P(PIPE_AXIS), P(PIPE_AXIS), P(PIPE_AXIS), P(PIPE_AXIS))


def make_hybrid_stacked_cache(hp: HParams, batch: int, max_seq: int,
                              mesh: Mesh, dtype=jnp.bfloat16):
    """HybridCache leaves stacked [L, B, ...], pipe-sharded on dim 0."""
    if isinstance(dtype, str):
        raise NotImplementedError(
            "hybrid pipeline serving: q8 KV stage cache not wired")
    conv_w = hp.ssm_d_inner + 2 * hp.ssm_n_group * hp.ssm_d_state
    L = hp.n_layer

    def put(shape, dt):
        return jax.device_put(
            jnp.zeros(shape, dt), NamedSharding(mesh, P(PIPE_AXIS)))

    return (
        put((L, batch, hp.n_head_kv, max_seq, hp.head_dim), dtype),
        put((L, batch, hp.n_head_kv, max_seq, hp.head_dim_v), dtype),
        put((L, batch, conv_w, hp.ssm_d_conv - 1), jnp.float32),
        put((L, batch, hp.ssm_d_inner, hp.ssm_d_state), jnp.float32),
    )


def load_hybrid_stacked_serving(reader, hp: HParams, mesh: Mesh,
                                dtype=jnp.bfloat16, mode: str = "auto"):
    """Stack hybrid-layer weights (union set, zero-padded) pipe-sharded.

    Returns (params, n_vocab_padded). Reference: llm_build_nemotron_h /
    llm_build_granite_hybrid over llama-memory-hybrid.
    """
    from ..models import jamba as _jamba
    from ..models.registry import get_arch

    t = reader.tensors
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    fwd = get_arch(hp.arch).forward
    if fwd not in (_jamba.forward, _jamba.forward_falcon_h1):
        raise NotImplementedError(
            f"{hp.arch}: not a hybrid attention+SSM arch")
    parallel_mixers = fwd is _jamba.forward_falcon_h1
    if tp > 1:
        raise NotImplementedError(
            "hybrid pipeline serving runs tp=1 stages (mamba inner state "
            "has no head axis to shard)")
    if hp.n_layer % pp:
        raise ValueError(f"pp {pp} must divide n_layer {hp.n_layer}")
    if any(f"blk.{i}.ffn_gate_inp.weight" in t for i in range(hp.n_layer)):
        raise NotImplementedError(
            "hybrid pipeline serving covers dense FFN slots; MoE hybrids "
            "(nemotron_h_moe, jamba-moe) serve with --dp")
    # a model's mixers are ALL mamba1 (jamba) or ALL mamba2 (nemotron-h /
    # granite-hybrid) — group_count is the model-level switch, so one slot
    # table per model suffices
    mamba1 = not hp.ssm_n_group

    E = hp.n_embd
    D = hp.ssm_d_inner
    G = hp.ssm_n_group
    S = hp.ssm_d_state
    H = hp.ssm_dt_rank
    conv_w = D + 2 * G * S
    zxbcdt_w = 2 * D + 2 * G * S + H
    n_ff = hp.n_ff
    hq = hp.n_head * hp.head_dim
    hkv = hp.n_head_kv * hp.head_dim
    hv = hp.n_head * hp.head_dim_v

    kinds = np.zeros(hp.n_layer, np.int32)
    has_ffn2 = np.zeros(hp.n_layer, bool)
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        if p + "ssm_in.weight" in t:
            if (p + "ssm_x.weight" in t) != mamba1:
                raise NotImplementedError(
                    "hybrid pipeline serving: mixed mamba1/mamba2 mixers")
            # falcon-h1: attention and the mamba2 mixer run in PARALLEL
            # (their outputs sum) on every layer
            kinds[i] = (K_PARALLEL if parallel_mixers
                        and p + "attn_q.weight" in t else K_MAMBA2)
            has_ffn2[i] = p + "ffn_up.weight" in t  # jamba/granite pair FFN
        elif p + "attn_q.weight" in t:
            kinds[i] = K_ATTN
            has_ffn2[i] = p + "ffn_up.weight" in t
        elif p + "ffn_up.weight" in t:
            kinds[i] = K_FFN
        else:
            raise NotImplementedError(f"layer {i}: no mixer and no FFN")

    # union per-layer tensor table: key -> (gguf stem, leaf shape,
    # transpose-to [n_in, n_out]?); the mixer slots switch model-wide
    # between mamba1 (jamba) and mamba2 (SSD) shapes
    R = hp.ssm_dt_rank
    if mamba1:
        mixer_slots = {
            "ssm_in": ("ssm_in.weight", (E, 2 * D), True),
            "conv_w": ("ssm_conv1d.weight", (D, hp.ssm_d_conv), False),
            "conv_b": ("ssm_conv1d.bias", (D,), False),
            "ssm_x": ("ssm_x.weight", (D, R + 2 * S), True),
            "ssm_dt": ("ssm_dt.weight", (R, D), True),
            "dt_bias": ("ssm_dt.bias", (D,), False),
            "dt_norm": ("ssm_dt_norm.weight", (R,), False),
            "b_norm": ("ssm_b_norm.weight", (S,), False),
            "c_norm": ("ssm_c_norm.weight", (S,), False),
            "A_log": ("ssm_a", (D, S), False),
            "D": ("ssm_d", (D,), False),
            "ssm_out": ("ssm_out.weight", (D, E), True),
        }
    else:
        mixer_slots = {
            "ssm_in": ("ssm_in.weight", (E, zxbcdt_w), True),
            "conv_w": ("ssm_conv1d.weight", (conv_w, hp.ssm_d_conv), False),
            "conv_b": ("ssm_conv1d.bias", (conv_w,), False),
            "dt_bias": ("ssm_dt.bias", (H,), False),
            "A_log": ("ssm_a", (H,), False),
            "D": ("ssm_d", (H,), False),
            "ssm_norm": ("ssm_norm.weight", (D,), False),
            "ssm_out": ("ssm_out.weight", (D, E), True),
        }
    slots = {
        "wq": ("attn_q.weight", (E, hq), True),
        "wk": ("attn_k.weight", (E, hkv), True),
        "wv": ("attn_v.weight", (E, hp.n_head_kv * hp.head_dim_v), True),
        "wo": ("attn_output.weight", (hv, E), True),
        **mixer_slots,
        "w_up": ("ffn_up.weight", (E, n_ff), True),
        "w_down": ("ffn_down.weight", (n_ff, E), True),
        "w_gate": ("ffn_gate.weight", (E, n_ff), True),
        "b_up": ("ffn_up.bias", (n_ff,), False),
        "b_down": ("ffn_down.bias", (E,), False),
        "attn_norm": ("attn_norm.weight", (E,), False),
        "ffn_norm": ("ffn_norm.weight", (E,), False),
    }
    present = {key: any(_name(t, i, stem) is not None
                        for i in range(hp.n_layer))
               for key, (stem, _, _) in slots.items()}
    # structural flags the step compiles against
    gated = present["w_gate"]
    biased = present["b_up"]

    def put(x, spec=P()):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_stacked(leaf_shape, dtype_, layer_fn):
        shape = (hp.n_layer,) + tuple(leaf_shape)
        sharding = NamedSharding(mesh, P(PIPE_AXIS))

        def cb(index):
            ls = index[0]
            start = 0 if ls.start is None else ls.start
            stop = shape[0] if ls.stop is None else ls.stop
            block = np.stack([np.asarray(layer_fn(i), dtype_)
                              for i in range(start, stop)])
            return block[(slice(None),) + tuple(index[1:])]

        return jax.make_array_from_callback(shape, sharding, cb)

    stack: dict = {}
    for key, (stem, leaf_shape, transpose) in slots.items():
        if not present[key]:
            continue

        def layer_fn(i, stem=stem, leaf_shape=leaf_shape,
                     transpose=transpose, key=key):
            name = _name(t, i, stem)
            if name is None:
                return np.zeros(leaf_shape, np.float32)
            arr = t[name].to_numpy()
            if key == "conv_w":
                return arr.reshape(leaf_shape)
            if transpose and arr.ndim == 2:
                return np.ascontiguousarray(arr.T)
            return arr.reshape(leaf_shape)

        # norms/vectors ride f32; matrices at the engine dtype
        dt = jnp.float32 if len(leaf_shape) == 1 or key in (
            "conv_w", "A_log", "D") else dtype
        stack[key] = put_stacked(leaf_shape, dt, layer_fn)
    stack["kind"] = put(jnp.asarray(kinds), P(PIPE_AXIS))
    stack["ffn2"] = put(jnp.asarray(has_ffn2), P(PIPE_AXIS))

    emb = jnp.asarray(t["token_embd.weight"].to_numpy(), dtype)
    w_out = (jnp.asarray(t["output.weight"].to_numpy().T, dtype)
             if "output.weight" in t else emb.T)
    params = {
        "tok_embd": put(emb),
        "output_norm": put(
            jnp.asarray(t["output_norm.weight"].to_numpy(), jnp.float32)),
        "output": put(w_out),
        "stack": stack,
        "flags": {"gated": gated, "biased": biased, "mamba1": mamba1,
                  "use_rope": parallel_mixers or hp.rope_finetuned},
    }
    return params, w_out.shape[1]


def _name(t, i, stem):
    for cand in (f"blk.{i}.{stem}", f"blk.{i}.{stem}.weight"):
        if cand in t:
            return cand
    return None


def _ffn(hp, w, h, gated: bool, biased: bool):
    up = h @ w["w_up"].astype(h.dtype)
    if biased and "b_up" in w:
        up = up + w["b_up"].astype(up.dtype)
    if gated and "w_gate" in w:
        g32 = (h @ w["w_gate"].astype(h.dtype)).astype(jnp.float32)
        mid = jax.nn.silu(g32).astype(up.dtype) * up
    else:  # nemotron-h ReLU²
        mid = jnp.square(jax.nn.relu(up.astype(jnp.float32))).astype(up.dtype)
    down = mid @ w["w_down"].astype(mid.dtype)
    if biased and "b_down" in w:
        down = down + w["b_down"].astype(down.dtype)
    return down


def _mamba1(hp, w, h, conv0, ssm0):
    """Mamba-1 selective-scan mixer (jamba) against explicit weight
    arrays, incl. the optional dt/B/C RMS norms."""
    from ..models.mamba import _causal_conv, _selective_scan

    D = hp.ssm_d_inner
    R = hp.ssm_dt_rank
    S = hp.ssm_d_state
    xz = (h @ w["ssm_in"].astype(h.dtype)).astype(jnp.float32)
    xin, z = xz[..., :D], xz[..., D:]
    conv_out, conv_state = _causal_conv(xin, conv0, w["conv_w"],
                                        w["conv_b"])
    xc = jax.nn.silu(conv_out)
    x_db = (xc.astype(h.dtype) @ w["ssm_x"].astype(h.dtype)
            ).astype(jnp.float32)
    dt_raw = x_db[..., :R]
    Bm = x_db[..., R: R + S]
    Cm = x_db[..., R + S:]
    if "dt_norm" in w:
        dt_raw = _rms(dt_raw, w["dt_norm"], hp.rms_eps)
        Bm = _rms(Bm, w["b_norm"], hp.rms_eps)
        Cm = _rms(Cm, w["c_norm"], hp.rms_eps)
    dt = jax.nn.softplus(
        (dt_raw.astype(h.dtype) @ w["ssm_dt"].astype(h.dtype)
         ).astype(jnp.float32) + w["dt_bias"])
    y, ssm_state = _selective_scan(xc, dt, w["A_log"], Bm, Cm, ssm0)
    y = y + xc * w["D"][None, None]
    y = y * jax.nn.silu(z)
    out = y.astype(h.dtype) @ w["ssm_out"].astype(h.dtype)
    return out, conv_state, ssm_state


def _mamba2(hp, w, h, conv0, ssm0):
    """Mamba-2 SSD mixer against explicit weight arrays (mirror of
    models/jamba._mamba2_mixer, which consumes Linear callables)."""
    from ..models.mamba import _causal_conv, _ssd_scan

    b, T, _ = h.shape
    D = hp.ssm_d_inner
    H = hp.ssm_dt_rank
    S = hp.ssm_d_state
    G = hp.ssm_n_group
    hd = D // H
    zxBCdt = (h @ w["ssm_in"].astype(h.dtype)).astype(jnp.float32)
    z = zxBCdt[..., :D]
    xBC = zxBCdt[..., D: 2 * D + 2 * G * S]
    dt_raw = zxBCdt[..., 2 * D + 2 * G * S:]
    conv_out, conv_state = _causal_conv(xBC, conv0, w["conv_w"], w["conv_b"])
    xBC = jax.nn.silu(conv_out)
    xin = xBC[..., :D].reshape(b, T, H, hd)
    Bm = xBC[..., D: D + G * S].reshape(b, T, G, S)
    Cm = xBC[..., D + G * S:].reshape(b, T, G, S)
    dt = jax.nn.softplus(dt_raw + w["dt_bias"][None, None])
    h0 = ssm0.reshape(b, H, hd, S)
    y, ssm_state = _ssd_scan(xin, dt, w["A_log"], Bm, Cm, h0, G)
    y = y + xin * w["D"][None, None, :, None]
    y = y.reshape(b, T, D) * jax.nn.silu(z)
    if "ssm_norm" in w:
        yg = y.reshape(b, T, G, D // G)
        wg = w["ssm_norm"].reshape(G, D // G)
        yg = yg / jnp.sqrt((yg * yg).mean(-1, keepdims=True) + hp.rms_eps) \
            * wg[None, None]
        y = yg.reshape(b, T, D)
    out = (y.astype(h.dtype) @ w["ssm_out"].astype(h.dtype))
    return out, conv_state, ssm_state.reshape(b, D, S)


def _hybrid_layer(hp, w, x, positions, c_l, offs, batch_start, tick_valid,
                  gated: bool, biased: bool, mamba1: bool = False,
                  use_rope: bool = False):
    """One hybrid layer (kind-dispatched) against stage-local cache leaves
    c_l = (k, v, conv, ssm), each [B, ...]; the microbatch occupies rows
    [batch_start, batch_start+b). State writes are masked for idle rows
    and fill/drain ticks."""
    b, T, E = x.shape
    k_l, v_l, conv_l, ssm_l = c_l
    S_ctx = k_l.shape[2]
    row_ok = tick_valid & (offs >= 0)
    start = jnp.maximum(offs, 0)
    h = _rms(x, w["attn_norm"], hp.rms_eps)
    res_scale = hp.residual_scale

    def attn_case(_):
        n_kv = hp.n_head_kv
        q = (h @ w["wq"].astype(h.dtype)).reshape(
            b, T, hp.n_head, hp.head_dim)
        k = (h @ w["wk"].astype(h.dtype)).reshape(
            b, T, n_kv, hp.head_dim)
        v = (h @ w["wv"].astype(h.dtype)).reshape(
            b, T, n_kv, hp.head_dim_v)
        if use_rope:  # granite-hybrid rope_finetuned / falcon-h1 always
            from ..ops.rope import apply_rope

            q = apply_rope(q, positions, hp.rope)
            k = apply_rope(k, positions, hp.rope)
        # masked cache write at each row's offset (≡ pipeline_infer
        # _cache_rw, kept inline for the [B,H,S,D] slice pair)
        kb = jax.vmap(
            lambda buf, kn, st, ok: jnp.where(
                ok,
                jax.lax.dynamic_update_slice(
                    buf, kn.astype(buf.dtype), (0, st, 0)),
                buf))(
            jax.lax.dynamic_slice_in_dim(k_l, batch_start, b, 0),
            k.transpose(0, 2, 1, 3), start, row_ok)
        vb = jax.vmap(
            lambda buf, vn, st, ok: jnp.where(
                ok,
                jax.lax.dynamic_update_slice(
                    buf, vn.astype(buf.dtype), (0, st, 0)),
                buf))(
            jax.lax.dynamic_slice_in_dim(v_l, batch_start, b, 0),
            v.transpose(0, 2, 1, 3), start, row_ok)
        g = hp.n_head // n_kv
        kf = jnp.repeat(kb.astype(jnp.float32), g, axis=1)  # [b, H, S, D]
        vf = jnp.repeat(vb.astype(jnp.float32), g, axis=1)
        scale = (hp.attn_scale if hp.attn_scale is not None
                 else hp.head_dim ** -0.5)
        scores = jnp.einsum("bthd,bhsd->bhts", q.astype(jnp.float32),
                            kf) * scale
        slot = start[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
        key_idx = jnp.arange(S_ctx, dtype=jnp.int32)
        mask = key_idx[None, None, :] <= slot[:, :, None]
        scores = jnp.where(mask[:, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhts,bhsd->bthd", probs, vf).reshape(
            b, T, hp.n_head * hp.head_dim_v)
        out = o.astype(x.dtype) @ w["wo"].astype(x.dtype)
        knew = jax.lax.dynamic_update_slice_in_dim(k_l, kb, batch_start, 0)
        vnew = jax.lax.dynamic_update_slice_in_dim(v_l, vb, batch_start, 0)
        return out, knew, vnew, conv_l, ssm_l

    def mamba_case(_):
        conv0 = jax.lax.dynamic_slice_in_dim(conv_l, batch_start, b, 0)
        ssm0 = jax.lax.dynamic_slice_in_dim(ssm_l, batch_start, b, 0)
        mixer = _mamba1 if mamba1 else _mamba2
        out, conv_new, ssm_new = mixer(hp, w, h, conv0, ssm0)
        conv_new = jnp.where(row_ok[:, None, None],
                             conv_new.astype(conv_l.dtype), conv0)
        ssm_new = jnp.where(row_ok[:, None, None],
                            ssm_new.astype(ssm_l.dtype), ssm0)
        return (out,
                k_l, v_l,
                jax.lax.dynamic_update_slice_in_dim(
                    conv_l, conv_new, batch_start, 0),
                jax.lax.dynamic_update_slice_in_dim(
                    ssm_l, ssm_new, batch_start, 0))

    def ffn_case(_):
        return _ffn(hp, w, h, gated, biased), k_l, v_l, conv_l, ssm_l

    def parallel_case(_):
        # falcon-h1: attention + mamba2 outputs sum; each branch updates
        # its own cache leaves
        oa, kn, vn, _, _ = attn_case(None)
        om, _, _, cn, sn = mamba_case(None)
        return oa + om, kn, vn, cn, sn

    out, k_l, v_l, conv_l, ssm_l = jax.lax.switch(
        w["kind"], (attn_case, mamba_case, ffn_case, parallel_case), None)
    if res_scale != 1.0:
        out = out * jnp.asarray(res_scale, out.dtype)
    x = x + out

    # granite-hybrid / jamba: paired second FFN sub-block after the mixer
    def ffn2(_):
        h2 = _rms(x, w["ffn_norm"], hp.rms_eps) if "ffn_norm" in w else x
        o2 = _ffn(hp, w, h2, gated, biased)
        if res_scale != 1.0:
            o2 = o2 * jnp.asarray(res_scale, o2.dtype)
        return x + o2

    x = jax.lax.cond(w["ffn2"], ffn2, lambda _: x, None)
    return x, (k_l, v_l, conv_l, ssm_l)


def make_hybrid_pipeline_step(hp: HParams, mesh: Mesh, params: dict,
                              last_only: bool = False,
                              return_hidden: bool = False):
    """Jitted hybrid serving step with the BatchEngine contract
    (see pipeline_infer.make_pipeline_step)."""
    assert not (last_only and return_hidden)
    pp = mesh.shape[PIPE_AXIS]
    gated = params["flags"]["gated"]
    biased = params["flags"]["biased"]
    mamba1 = params["flags"].get("mamba1", False)
    use_rope = params["flags"].get("use_rope", False)
    specs = {
        "tok_embd": P(), "output_norm": P(), "output": P(),
        "stack": {k: P(PIPE_AXIS) for k in params["stack"]},
        "flags": {k: P() for k in params["flags"]},
    }
    c_specs = hybrid_cache_specs()

    def spmd(params, tokens, positions, cache, offsets, n_last):
        stage = jax.lax.axis_index(PIPE_AXIS)
        emb = params["tok_embd"]
        stack = {k: v for k, v in params["stack"].items()}
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
        c_leaves = tuple(cache)

        def tick(carry, tt):
            x, c_leaves, acc = carry
            ti = jnp.clip(tt, 0, M - 1)
            feed = mb_toks[ti] if is_embd else emb[mb_toks[ti]]
            if hp.embd_scale != 1.0 and not is_embd:
                feed = feed * jnp.asarray(hp.embd_scale, feed.dtype)
            x = jnp.where((stage == 0) & (tt < M),
                          feed.astype(jnp.float32), x)
            m = tt - stage
            tick_valid = (m >= 0) & (m < M)
            mi = jnp.clip(m, 0, M - 1)
            pos = mb_pos[mi]
            offs = mb_offs[mi]
            bs = mi * b

            def body(xc, layer_state):
                w = layer_state[0]
                xn, c_l = _hybrid_layer(
                    hp, w, xc, pos, layer_state[1:], offs, bs, tick_valid,
                    gated, biased, mamba1, use_rope)
                return xn, c_l

            x_out, c_leaves = jax.lax.scan(body, x, (stack,) + c_leaves)
            m_out = tt - (pp - 1)
            use = (stage == pp - 1) & (m_out >= 0) & (m_out < M)
            mo = jnp.clip(m_out, 0, M - 1)

            def do_head(acc):
                xr = x_out
                if last_only:
                    rows = n_last.reshape(M, b)[mo]
                    xr = jax.vmap(
                        lambda xrow, i: jax.lax.dynamic_slice_in_dim(
                            xrow, i, 1, axis=0))(x_out, rows)
                hh = _rms(xr, params["output_norm"], hp.rms_eps)
                if return_hidden:
                    lg = hh.astype(jnp.float32)
                else:
                    lg = (hh @ params["output"]).astype(jnp.float32)
                    if hp.logit_scale != 1.0:
                        lg = lg / hp.logit_scale
                return jax.lax.dynamic_update_slice(
                    acc, lg[None], (mo, 0, 0, 0))

            acc = jax.lax.cond(use, do_head, lambda a: a, acc)
            x = jax.lax.ppermute(
                x_out, PIPE_AXIS, [(i, (i + 1) % pp) for i in range(pp)])
            return (x, c_leaves, acc), None

        (x, c_leaves, logits_acc), _ = jax.lax.scan(
            tick, (x0, c_leaves, logits_acc), jnp.arange(n_ticks))
        logits_acc = jax.lax.psum(logits_acc, PIPE_AXIS)
        return logits_acc.reshape((B, T_out, v_loc)), tuple(c_leaves)

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
