"""MoE correctness: routed FFN vs numpy reference; qwen2moe/qwen3moe
end-to-end (≡ reference src/models/qwen2moe.cpp graph + mmid/topk-moe
kernels validated by test-backend-ops)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_moe_gguf
from tpullm.runtime import Engine


# -- op-level: route + moe_ffn vs numpy ------------------------------------------


def np_moe(x, router_w, gate, up, down, k, norm_w, scale=1.0, sel_bias=None):
    """x [N,E], router_w [n_exp, n_embd], experts (E, F, embd)/(E, embd, F)."""
    logits = x @ router_w.T
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ranked = p + sel_bias if sel_bias is not None else p
    order = np.argsort(-ranked, axis=-1, kind="stable")[:, :k]
    out = np.zeros_like(x)
    for n in range(x.shape[0]):
        ws = p[n, order[n]]
        if norm_w:
            ws = ws / ws.sum()
        for j, e in enumerate(order[n]):
            g = x[n] @ gate[e].T
            u = x[n] @ up[e].T
            act = g / (1 + np.exp(-g)) * u
            out[n] += scale * ws[j] * (act @ down[e].T)
    return out


@pytest.mark.parametrize("n_tokens", [2, 40])  # gather regime and dense regime
def test_moe_ffn_matches_numpy(n_tokens):
    from tpullm.ops.moe import moe_ffn, route

    rng = np.random.default_rng(0)
    E, F, D, K = 4, 16, 8, 2
    x = rng.standard_normal((n_tokens, D)).astype(np.float32) * 0.3
    router_w = rng.standard_normal((E, D)).astype(np.float32)
    gate = rng.standard_normal((E, F, D)).astype(np.float32) * 0.2
    up = rng.standard_normal((E, F, D)).astype(np.float32) * 0.2
    down = rng.standard_normal((E, D, F)).astype(np.float32) * 0.2

    ref = np_moe(x, router_w, gate, up, down, K, norm_w=True)

    logits = jnp.asarray(x @ router_w.T)
    w, idx = route(logits, K, norm_weights=True)
    out = moe_ffn(
        jnp.asarray(x), w, idx,
        jnp.asarray(gate.transpose(0, 2, 1)),
        jnp.asarray(up.transpose(0, 2, 1)),
        jnp.asarray(down.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_route_sigmoid_and_scale():
    from tpullm.ops.moe import route

    logits = jnp.asarray(np.random.default_rng(1).standard_normal((3, 8)).astype(np.float32))
    w, idx = route(logits, 2, gating="sigmoid", scale=2.5)
    assert w.shape == (3, 2) and idx.shape == (3, 2)
    # sigmoid top-k weights times scale stay in (0, 2.5)
    assert np.all(np.asarray(w) > 0) and np.all(np.asarray(w) < 2.5)


# -- model-level ------------------------------------------------------------------


def np_moe_forward(reader: GGUFReader, tokens: np.ndarray) -> np.ndarray:
    """Independent numpy qwen-moe forward (norm-style rope or neox per arch)."""
    md = reader.metadata
    arch = md["general.architecture"]
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_head_kv = md[f"{arch}.attention.head_count_kv"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    n_used = md[f"{arch}.expert_used_count"]
    scale = md.get(f"{arch}.expert_weights_scale", 1.0) or 1.0
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def has(name):
        return name in reader.tensors

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def rope_neox(x, pos):
        # halves rotation (qwen family); deepseek v1 is a NORM-rope arch
        # (interleaved pairs)
        T, H, D = x.shape
        half = D // 2
        inv = base ** (-np.arange(half) * 2.0 / D)
        theta = pos[:, None] * inv
        c, s = np.cos(theta), np.sin(theta)
        out = x.copy()
        if arch in ("deepseek", "granitemoe", "ernie4_5-moe",
                    "bailingmoe"):  # NORM-rope archs
            x0, x1 = x[..., 0::2], x[..., 1::2]
            out[..., 0::2] = x0 * c[:, None, :] - x1 * s[:, None, :]
            out[..., 1::2] = x0 * s[:, None, :] + x1 * c[:, None, :]
        else:
            x0, x1 = x[..., :half], x[..., half:]
            out[..., :half] = x0 * c[:, None, :] - x1 * s[:, None, :]
            out[..., half:] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        qf = h @ t(p + "attn_q.weight").T
        kf = h @ t(p + "attn_k.weight").T
        if arch == "olmoe" and has(p + "attn_q_norm.weight"):
            # olmoe: full-projection q/k norm before the head split
            qf = rms(qf, t(p + "attn_q_norm.weight"))
            kf = rms(kf, t(p + "attn_k_norm.weight"))
        q = qf.reshape(T, n_head, hd)
        k = kf.reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, n_head_kv, hd)
        if arch != "olmoe" and has(p + "attn_q_norm.weight"):
            q = rms(q, t(p + "attn_q_norm.weight"))
            k = rms(k, t(p + "attn_k_norm.weight"))
        q, k = rope_neox(q, pos), rope_neox(k, pos)
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        h = rms(x, t(p + "ffn_norm.weight") if has(p + "ffn_norm.weight")
                else t(p + "post_attention_norm.weight"))
        if has(p + "ffn_gate.weight"):  # deepseek dense lead layer
            gd = h @ t(p + "ffn_gate.weight").T
            ud = h @ t(p + "ffn_up.weight").T
            moe = (gd / (1 + np.exp(-gd)) * ud) @ t(p + "ffn_down.weight").T
        else:
            moe = np_moe(
                h,
                t(p + "ffn_gate_inp.weight"),
                t(p + "ffn_gate_exps.weight"),
                t(p + "ffn_up_exps.weight"),
                t(p + "ffn_down_exps.weight"),
                n_used,
                norm_w=arch in ("qwen3moe", "granitemoe", "ernie4_5-moe",
                                "hunyuan-moe", "minimax-m2", "dots1")
                or bool(md.get(f"{arch}.expert_weights_norm", False)),
                scale=scale,
                sel_bias=(t(p + "exp_probs_b.bias")
                          if has(p + "exp_probs_b.bias") else None),
            )
        if has(p + "ffn_gate_shexp.weight"):
            gsh = h @ t(p + "ffn_gate_shexp.weight").T
            ush = h @ t(p + "ffn_up_shexp.weight").T
            act = gsh / (1 + np.exp(-gsh)) * ush
            sh = act @ t(p + "ffn_down_shexp.weight").T
            if has(p + "ffn_gate_inp_shexp.weight"):
                gate_in = 1 / (1 + np.exp(-(h @ t(p + "ffn_gate_inp_shexp.weight"))))
                sh = sh * gate_in[:, None]
            moe = moe + sh
        x = x + moe
    x = rms(x, t("output_norm.weight"))
    return x @ t("output.weight").T


@pytest.mark.parametrize("arch,shexp,kw", [
    ("qwen3moe", 0, {}),
    ("qwen2moe", 48, {}),
    ("olmoe", 0, {}),
    # deepseek v1: dense lead layer + ungated shared expert + routed-weight
    # scale, NORM-style rope (llm_build_deepseek)
    ("deepseek", 48, {"gated_shexp": False, "n_dense_lead": 1,
                      "expert_weights_scale": 2.0}),
    # granitemoe: renormalized routing + optional ungated shared expert
    ("granitemoe", 48, {"gated_shexp": False}),
    # ernie4_5-moe: dense lead + selection-biased renormalized routing +
    # ungated shared expert, NORM rope (llm_build_ernie4_5_moe)
    ("ernie4_5-moe", 48, {"gated_shexp": False, "n_dense_lead": 1,
                          "with_probs_bias": True}),
    # hunyuan-moe: ungated shexp + renormalized softmax; minimax-m2:
    # exp_probs_b, no shexp; dots1: dense lead + bias + shexp
    ("hunyuan-moe", 48, {"gated_shexp": False}),
    ("minimax-m2", 0, {"with_probs_bias": True}),
    ("dots1", 48, {"gated_shexp": False, "n_dense_lead": 1,
                   "with_probs_bias": True}),
    ("bailingmoe", 48, {"gated_shexp": False}),
    ("glm4moe", 48, {"gated_shexp": False, "n_dense_lead": 1,
                      "with_probs_bias": True, "ffn_norm_name": "post_attention_norm"}),
])
def test_moe_forward_matches_numpy(tmp_path, arch, shexp, kw):
    path = make_tiny_moe_gguf(tmp_path / f"{arch}.gguf", arch=arch,
                              n_ff_shexp=shexp, **kw)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_moe_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_moe_generation_runs(tmp_path):
    path = make_tiny_moe_gguf(tmp_path / "m.gguf")
    eng = Engine(path, mode="dense", max_seq=64)
    out = eng.generate("the quick", max_new_tokens=8)
    assert isinstance(out, str)


def test_moe_decode_matches_prefill(tmp_path):
    """Decode path (gather regime) must agree with prefill logits."""
    path = make_tiny_moe_gguf(tmp_path / "m.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    all_logits = eng.prefill_all_logits(toks)

    eng2 = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    eng2.prefill(toks[:-1])
    last = eng2.decode_step(toks[-1])
    np.testing.assert_allclose(last, all_logits[-1], rtol=2e-3, atol=2e-3)


# -- gpt-oss (openai-moe): sinks + alternating SWA + biased swiglu_oai MoE ----


def np_gpt_oss_forward(reader: GGUFReader, tokens: np.ndarray) -> np.ndarray:
    md = reader.metadata
    arch = "gpt-oss"
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_head_kv = md[f"{arch}.attention.head_count_kv"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    n_used = md[f"{arch}.expert_used_count"]
    window = md[f"{arch}.attention.sliding_window"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def rope_neox(x, pos):
        T, H, D = x.shape
        half = D // 2
        inv = base ** (-np.arange(half) * 2.0 / D)
        theta = pos[:, None] * inv
        c, s = np.cos(theta), np.sin(theta)
        x0, x1 = x[..., :half], x[..., half:]
        out = x.copy()
        out[..., :half] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out[..., half:] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        swa = (i + 1) % 2 != 0
        h = rms(x, t(p + "attn_norm.weight"))
        q = (h @ t(p + "attn_q.weight").T + t(p + "attn_q.bias")).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T + t(p + "attn_k.bias")).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T + t(p + "attn_v.bias")).reshape(T, n_head_kv, hd)
        q, k = rope_neox(q, pos), rope_neox(k, pos)
        sinks = t(p + "attn_sinks.weight")
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            if swa and window:
                scores += np.tril(np.full((T, T), -np.inf), k=-window)
            m = np.maximum(scores.max(-1), sinks[hh])
            e = np.exp(scores - m[:, None])
            denom = e.sum(-1) + np.exp(sinks[hh] - m)
            out[:, hh] = (e / denom[:, None]) @ vv
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T \
              + t(p + "attn_output.bias")

        h = rms(x, t(p + "post_attention_norm.weight"))
        logits = h @ t(p + "ffn_gate_inp.weight").T + t(p + "ffn_gate_inp.bias")
        # top-k by raw logits, softmax over selected
        idx = np.argsort(-logits, axis=1)[:, :n_used]
        sel = np.take_along_axis(logits, idx, axis=1)
        wts = np.exp(sel - sel.max(1, keepdims=True))
        wts /= wts.sum(1, keepdims=True)
        gate_w = t(p + "ffn_gate_exps.weight")
        gate_b = t(p + "ffn_gate_exps.bias")
        up_w = t(p + "ffn_up_exps.weight")
        up_b = t(p + "ffn_up_exps.bias")
        down_w = t(p + "ffn_down_exps.weight")
        down_b = t(p + "ffn_down_exps.bias")
        moe = np.zeros((T, n_embd))
        for ti in range(T):
            for kk_ in range(n_used):
                e_ = idx[ti, kk_]
                gate = gate_w[e_] @ h[ti] + gate_b[e_]
                up = up_w[e_] @ h[ti] + up_b[e_]
                gmin = np.minimum(gate, 7.0)
                uclip = np.clip(up, -7.0, 7.0)
                act = gmin / (1 + np.exp(-1.702 * gmin)) * (uclip + 1.0)
                moe[ti] += wts[ti, kk_] * (down_w[e_] @ act + down_b[e_])
        x = x + moe
    x = rms(x, t("output_norm.weight"))
    return x @ t("output.weight").T


def test_gpt_oss_forward_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_gpt_oss_gguf

    path = make_tiny_gpt_oss_gguf(tmp_path / "oss.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox jumps over", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_gpt_oss_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_gpt_oss_decode_matches_prefill(tmp_path):
    from tpullm.models.testing import make_tiny_gpt_oss_gguf

    path = make_tiny_gpt_oss_gguf(tmp_path / "oss2.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    all_logits = eng.prefill_all_logits(toks)
    eng2 = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    logits = None
    for tk in toks:
        logits = eng2.decode_step(tk)
    np.testing.assert_allclose(logits, all_logits[-1], rtol=2e-3, atol=2e-3)


def np_dbrx_forward(reader: GGUFReader, tokens: np.ndarray) -> np.ndarray:
    md = reader.metadata
    n_layer = md["dbrx.block_count"]
    n_head = md["dbrx.attention.head_count"]
    n_head_kv = md["dbrx.attention.head_count_kv"]
    n_embd = md["dbrx.embedding_length"]
    eps = md["dbrx.attention.layer_norm_epsilon"]
    base = md["dbrx.rope.freq_base"]
    n_used = md["dbrx.expert_used_count"]
    clamp = md["dbrx.attention.clamp_kqv"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def ln(x, w):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w

    def rope_neox(x, pos):
        T, H, D = x.shape
        half = D // 2
        inv = base ** (-np.arange(half) * 2.0 / D)
        theta = pos[:, None] * inv
        c, s = np.cos(theta), np.sin(theta)
        x0, x1 = x[..., :half], x[..., half:]
        out = x.copy()
        out[..., :half] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out[..., half:] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    T = len(tokens)
    pos = np.arange(T)
    n_q = n_head * hd
    n_kv = n_head_kv * hd
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = ln(x, t(p + "attn_norm.weight"))
        qkv = np.clip(h @ t(p + "attn_qkv.weight").T, -clamp, clamp)
        q = rope_neox(qkv[:, :n_q].reshape(T, n_head, hd), pos)
        k = rope_neox(qkv[:, n_q:n_q + n_kv].reshape(T, n_head_kv, hd), pos)
        v = qkv[:, n_q + n_kv:].reshape(T, n_head_kv, hd)
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        h = ln(x, t(p + "attn_output_norm.weight"))
        moe = np_moe(
            h, t(p + "ffn_gate_inp.weight"), t(p + "ffn_gate_exps.weight"),
            t(p + "ffn_up_exps.weight"), t(p + "ffn_down_exps.weight"),
            n_used, norm_w=True,
        )
        x = x + moe
    x = ln(x, t("output_norm.weight"))
    return x @ t("output.weight").T


def test_dbrx_forward_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_dbrx_gguf

    path = make_tiny_dbrx_gguf(tmp_path / "dbrx.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox jumps over", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_dbrx_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_grok_generates(tmp_path):
    """grok: GELU experts, attn-output/ffn post-norms, multiplied logit
    scale + final softcap (llm_build_grok)."""
    from tpullm.gguf import GGUFReader, GGUFWriter
    from tpullm.models.testing import make_tiny_moe_gguf

    base = make_tiny_moe_gguf(tmp_path / "g_base.gguf", arch="grok")
    r = GGUFReader(base)
    out = tmp_path / "grok.gguf"
    w = GGUFWriter(out, architecture="grok")
    for k, v in r.metadata.items():
        if k != "general.architecture":
            w.add_kv(k, v)
    w.add_kv("grok.logit_scale", 0.5773)
    w.add_kv("grok.final_logit_softcapping", 30.0)
    n_layer = r.metadata["grok.block_count"]
    n_embd = r.metadata["grok.embedding_length"]
    for name, t_ in r.tensors.items():
        w.add_packed_tensor(name, t_.shape, t_.ggml_type, t_.data.tobytes())
    for i in range(n_layer):
        w.add_tensor(f"blk.{i}.attn_output_norm.weight",
                     np.ones(n_embd, dtype=np.float32))
        w.add_tensor(f"blk.{i}.layer_output_norm.weight",
                     np.ones(n_embd, dtype=np.float32))
    w.write()
    eng = Engine(str(out), mode="dense", max_seq=64)
    assert eng.hp.softcap_final == 30.0
    text = eng.generate("the quick", max_new_tokens=4)
    assert isinstance(text, str)


def test_arctic_forward_matches_numpy(tmp_path):
    """arctic: dense residual-FFN + parallel MoE over the pre-attention
    stream with its own norm (llm_build_arctic)."""
    from tpullm.gguf import GGUFReader, GGUFWriter
    from tpullm.models.testing import make_tiny_moe_gguf

    base = make_tiny_moe_gguf(tmp_path / "a_base.gguf", arch="arctic")
    r = GGUFReader(base)
    out = tmp_path / "arctic.gguf"
    w = GGUFWriter(out, architecture="arctic")
    for k, v in r.metadata.items():
        if k != "general.architecture":
            w.add_kv(k, v)
    n_layer = r.metadata["arctic.block_count"]
    n_embd = r.metadata["arctic.embedding_length"]
    rng = np.random.default_rng(11)
    for name, t_ in r.tensors.items():
        w.add_packed_tensor(name, t_.shape, t_.ggml_type, t_.data.tobytes())
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "ffn_gate.weight",
                     (rng.standard_normal((32, n_embd)) * 0.05).astype(np.float32))
        w.add_tensor(p + "ffn_up.weight",
                     (rng.standard_normal((32, n_embd)) * 0.05).astype(np.float32))
        w.add_tensor(p + "ffn_down.weight",
                     (rng.standard_normal((n_embd, 32)) * 0.05).astype(np.float32))
        w.add_tensor(p + "ffn_norm_exps.weight",
                     np.ones(n_embd, dtype=np.float32))
    w.write()
    eng = Engine(str(out), mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    got = eng.prefill_all_logits(toks)

    md = eng.reader.metadata
    r2 = eng.reader
    n_head = md["arctic.attention.head_count"]
    n_head_kv = md["arctic.attention.head_count_kv"]
    eps = md["arctic.attention.layer_norm_rms_epsilon"]
    base_f = md["arctic.rope.freq_base"]
    n_used = md["arctic.expert_used_count"]
    hd = n_embd // n_head

    def t(name):
        return r2.tensors[name].to_numpy().astype(np.float64)

    def rms(x, wt):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * wt

    def silu(z):
        return z / (1 + np.exp(-z))

    def rope_norm(x, pos):
        T_, H, D = x.shape
        half = D // 2
        inv = base_f ** (-np.arange(half) * 2.0 / D)
        th = pos[:, None] * inv
        c, s = np.cos(th), np.sin(th)
        out2 = x.copy()
        x0, x1 = x[..., 0::2], x[..., 1::2]
        out2[..., 0::2] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out2[..., 1::2] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out2

    tokens = np.asarray(toks)
    T_ = len(tokens)
    pos = np.arange(T_)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        inp_sa = x
        h = rms(x, t(p + "attn_norm.weight"))
        q = rope_norm((h @ t(p + "attn_q.weight").T).reshape(T_, n_head, hd), pos)
        kk = rope_norm((h @ t(p + "attn_k.weight").T).reshape(T_, n_head_kv, hd), pos)
        vv = (h @ t(p + "attn_v.weight").T).reshape(T_, n_head_kv, hd)
        g = n_head // n_head_kv
        o = np.zeros((T_, n_head, hd))
        for hh in range(n_head):
            sc = q[:, hh] @ kk[:, hh // g].T / np.sqrt(hd)
            sc += np.triu(np.full((T_, T_), -np.inf), k=1)
            e = np.exp(sc - sc.max(-1, keepdims=True))
            o[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv[:, hh // g]
        ffn_inp = inp_sa + o.reshape(T_, n_embd) @ t(p + "attn_output.weight").T
        h2 = rms(ffn_inp, t(p + "ffn_norm.weight"))
        dense = (silu(h2 @ t(p + "ffn_gate.weight").T)
                 * (h2 @ t(p + "ffn_up.weight").T)) @ t(p + "ffn_down.weight").T
        ffn_out = ffn_inp + dense
        h3 = rms(inp_sa, t(p + "ffn_norm_exps.weight"))
        moe = np_moe(h3, t(p + "ffn_gate_inp.weight"),
                     t(p + "ffn_gate_exps.weight"), t(p + "ffn_up_exps.weight"),
                     t(p + "ffn_down_exps.weight"), n_used, norm_w=True)
        x = moe + ffn_out
    x = rms(x, t("output_norm.weight"))
    ref = x @ t("output.weight").T
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_llama4_chunked_iswa_moe(tmp_path):
    """llama4: chunked-SWA + NoPE-every-4th layers, sigmoid MoE + ungated
    shexp (llm_build_llama_iswa)."""
    from tpullm.models.testing import make_tiny_moe_gguf

    path = make_tiny_moe_gguf(tmp_path / "l4.gguf", arch="llama4",
                              n_ff_shexp=48, gated_shexp=False)
    # add chunk size via override
    eng = Engine(path, mode="dense", max_seq=64,
                 override_kv={"llama4.attention.sliding_window": 16})
    assert eng.hp.swa_pattern == 4
    assert eng.hp.is_swa(0) and not eng.hp.is_swa(3)
    out = eng.generate("the quick brown fox jumps over the lazy dog",
                       max_new_tokens=6)
    assert isinstance(out, str)


def test_smallthinker_generates(tmp_path):
    """smallthinker: raw-stream router, ReLU-gated experts, NoPE steps
    (llm_build_smallthinker)."""
    from tpullm.models.testing import make_tiny_moe_gguf

    path = make_tiny_moe_gguf(tmp_path / "st.gguf", arch="smallthinker")
    eng = Engine(path, mode="dense", max_seq=64,
                 override_kv={"smallthinker.attention.no_rope_layer_step": 2})
    assert eng.hp.no_rope_step == 2
    out = eng.generate("the quick", max_new_tokens=4)
    assert isinstance(out, str)


def test_gpt_oss_packed_experts_match_dense(tmp_path):
    """gpt-oss with PACKED expert stacks (kernel-shaped dims, Q8_0-quantized
    experts) matches the widened-dense engine in both MoE regimes — the
    headline MXFP4-MoE family no longer widens its experts."""
    import jax.numpy as jnp

    from tpullm.models.testing import make_tiny_gpt_oss_gguf
    from tpullm.models.weights import QuantExpertStack
    from tpullm.runtime import Engine
    from tpullm.tools.quantize import quantize_model

    path = make_tiny_gpt_oss_gguf(tmp_path / "oss.gguf", n_embd=256,
                                  n_ff_exp=256, n_head=4, n_head_kv=2)
    qpath = tmp_path / "oss-q8.gguf"
    quantize_model(str(path), str(qpath), "Q8_0", verbose=False)

    eng_d = Engine(qpath, mode="dense", dtype=jnp.float32, max_seq=64,
                   kv_dtype=jnp.float32)
    eng_q = Engine(qpath, mode="quant", dtype=jnp.float32, max_seq=64,
                   kv_dtype=jnp.float32)
    assert isinstance(
        eng_q.params["layers"][0]["w_up_exps"], QuantExpertStack)

    toks = [3, 17, 42, 7, 19, 55, 9, 2] * 4  # 32 tokens → dense regime
    ref = eng_d.prefill(toks)
    got = eng_q.prefill(toks)
    assert int(np.argmax(got)) == int(np.argmax(ref))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
    # decode step → gather regime through the scalar-prefetch kernel
    nxt = int(np.argmax(ref))
    ref_d = eng_d.decode_step(nxt)
    got_d = eng_q.decode_step(nxt)
    assert int(np.argmax(got_d)) == int(np.argmax(ref_d))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=3e-2, atol=3e-2)
