"""Architecture correctness: gemma2/gemma3/gpt2 vs independent numpy
references (≡ reference per-arch graph builders in src/models/)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_gemma_gguf, make_tiny_gpt2_gguf
from tpullm.runtime import Engine


def _rms(x, w, eps):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _rope_neox(x, pos, base):
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


def _rope_norm(x, pos, base):
    # NORM style: interleaved (x0,x1),(x2,x3)… pairs — the reference's rope
    # type for command-r/deci (llama_model_rope_type)
    T, H, D = x.shape
    half = D // 2
    inv = base ** (-np.arange(half) * 2.0 / D)
    theta = pos[:, None] * inv
    c, s = np.cos(theta), np.sin(theta)
    x0, x1 = x[..., 0::2], x[..., 1::2]
    out = x.copy()
    out[..., 0::2] = x0 * c[:, None, :] - x1 * s[:, None, :]
    out[..., 1::2] = x0 * s[:, None, :] + x1 * c[:, None, :]
    return out


def _gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def _mha(q, k, v, n_head, n_head_kv, scale, window=0, softcap=0.0):
    T, _, hd = q.shape
    g = n_head // n_head_kv
    out = np.zeros((T, n_head, v.shape[-1]))
    for hh in range(n_head):
        kk, vv = k[:, hh // g], v[:, hh // g]
        scores = q[:, hh] @ kk.T * scale
        if softcap:
            scores = np.tanh(scores / softcap) * softcap
        mask = np.triu(np.full((T, T), -np.inf), k=1)
        if window > 0:
            qpos = np.arange(T)[:, None]
            kpos = np.arange(T)[None, :]
            mask = np.where(kpos <= qpos - window, -np.inf, mask)
        scores = scores + mask
        e = np.exp(scores - scores.max(-1, keepdims=True))
        out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
    return out


def np_gemma_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = md["general.architecture"]
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_head_kv = md[f"{arch}.attention.head_count_kv"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    base_swa = md.get(f"{arch}.rope.freq_base_swa", base)
    window = md[f"{arch}.attention.sliding_window"]
    pattern = 6 if arch == "gemma3" else 2
    cap_attn = md.get(f"{arch}.attn_logit_softcapping", 0.0)
    cap_final = md.get(f"{arch}.final_logit_softcapping", 0.0)
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def has(name):
        return name in reader.tensors

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens] * np.sqrt(n_embd)
    for i in range(n_layer):
        p = f"blk.{i}."
        swa = (i + 1) % pattern != 0
        b = base_swa if swa else base
        h = _rms(x, t(p + "attn_norm.weight"), eps)
        q = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, n_head_kv, hd)
        if has(p + "attn_q_norm.weight"):
            q = _rms(q, t(p + "attn_q_norm.weight"), eps)
            k = _rms(k, t(p + "attn_k_norm.weight"), eps)
        q, k = _rope_neox(q, pos, b), _rope_neox(k, pos, b)
        out = _mha(q, k, v, n_head, n_head_kv, 1 / np.sqrt(hd),
                   window=window if swa else 0, softcap=cap_attn)
        attn = out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        attn = _rms(attn, t(p + "post_attention_norm.weight"), eps)
        x = x + attn
        h = _rms(x, t(p + "ffn_norm.weight"), eps)
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        ffn = (_gelu_tanh(gate) * up) @ t(p + "ffn_down.weight").T
        ffn = _rms(ffn, t(p + "post_ffw_norm.weight"), eps)
        x = x + ffn
    x = _rms(x, t("output_norm.weight"), eps)
    logits = x @ t("token_embd.weight").T
    if cap_final:
        logits = np.tanh(logits / cap_final) * cap_final
    return logits


def np_gpt2_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    n_layer = md["gpt2.block_count"]
    n_head = md["gpt2.attention.head_count"]
    n_embd = md["gpt2.embedding_length"]
    eps = md["gpt2.attention.layer_norm_epsilon"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    T = len(tokens)
    x = t("token_embd.weight")[tokens] + t("position_embd.weight")[:T]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = _ln(x, t(p + "attn_norm.weight"), t(p + "attn_norm.bias"), eps)
        qkv = h @ t(p + "attn_qkv.weight").T + t(p + "attn_qkv.bias")
        q = qkv[:, :n_embd].reshape(T, n_head, hd)
        k = qkv[:, n_embd:2 * n_embd].reshape(T, n_head, hd)
        v = qkv[:, 2 * n_embd:].reshape(T, n_head, hd)
        out = _mha(q, k, v, n_head, n_head, 1 / np.sqrt(hd))
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T + t(p + "attn_output.bias")
        h = _ln(x, t(p + "ffn_norm.weight"), t(p + "ffn_norm.bias"), eps)
        up = h @ t(p + "ffn_up.weight").T + t(p + "ffn_up.bias")
        act = _gelu_tanh(up)
        x = x + act @ t(p + "ffn_down.weight").T + t(p + "ffn_down.bias")
    x = _ln(x, t("output_norm.weight"), t("output_norm.bias"), eps)
    return x @ t("token_embd.weight").T


@pytest.mark.parametrize("arch", ["gemma2", "gemma3"])
def test_gemma_forward_matches_numpy(tmp_path, arch):
    path = make_tiny_gemma_gguf(tmp_path / f"{arch}.gguf", arch=arch,
                                n_layer=3, sliding_window=8)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox jumps over", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_gemma_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_gemma3_swa_pattern():
    from tpullm.models.hparams import HParams, RopeParams

    hp = HParams(arch="gemma3", n_vocab=1, n_ctx_train=1, n_embd=1, n_layer=6,
                 n_head=1, n_head_kv=1, n_ff=1, head_dim=1, head_dim_v=1,
                 rms_eps=1e-5, rope=RopeParams(), sliding_window=16,
                 swa_pattern=6)
    assert [hp.is_swa(i) for i in range(6)] == [True] * 5 + [False]


def test_gemma_decode_matches_prefill(tmp_path):
    path = make_tiny_gemma_gguf(tmp_path / "g.gguf", arch="gemma3", n_layer=3,
                                sliding_window=8)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    all_logits = eng.prefill_all_logits(toks)
    eng2 = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    eng2.prefill(toks[:-1])
    last = eng2.decode_step(toks[-1])
    np.testing.assert_allclose(last, all_logits[-1], rtol=2e-3, atol=2e-3)


def test_gpt2_forward_matches_numpy(tmp_path):
    path = make_tiny_gpt2_gguf(tmp_path / "gpt2.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("hello world", add_special=False)
    got = eng.prefill_all_logits(toks)
    ref = np_gpt2_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_gpt2_generation_runs(tmp_path):
    path = make_tiny_gpt2_gguf(tmp_path / "gpt2.gguf")
    eng = Engine(path, mode="dense", max_seq=64)
    out = eng.generate("hello", max_new_tokens=6)
    assert isinstance(out, str)


def np_phi3_forward(reader, tokens):
    """Independent numpy phi3 forward (fused qkv/gate_up split, neox rope)."""
    md = reader.metadata
    n_layer = md["phi3.block_count"]
    n_head = md["phi3.attention.head_count"]
    n_head_kv = md["phi3.attention.head_count_kv"]
    n_embd = md["phi3.embedding_length"]
    eps = md["phi3.attention.layer_norm_rms_epsilon"]
    base = md["phi3.rope.freq_base"]
    hd = n_embd // n_head
    n_q, n_kv = n_head * hd, n_head_kv * hd

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = _rms(x, t(p + "attn_norm.weight"), eps)
        qkv = h @ t(p + "attn_qkv.weight").T
        q = qkv[:, :n_q].reshape(T, n_head, hd)
        k = qkv[:, n_q:n_q + n_kv].reshape(T, n_head_kv, hd)
        v = qkv[:, n_q + n_kv:].reshape(T, n_head_kv, hd)
        q, k = _rope_neox(q, pos, base), _rope_neox(k, pos, base)
        out = _mha(q, k, v, n_head, n_head_kv, 1 / np.sqrt(hd))
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        h = _rms(x, t(p + "ffn_norm.weight"), eps)
        gu = h @ t(p + "ffn_up.weight").T
        n_ff = gu.shape[1] // 2
        gate, up = gu[:, :n_ff], gu[:, n_ff:]
        act = gate / (1 + np.exp(-gate)) * up
        x = x + act @ t(p + "ffn_down.weight").T
    x = _rms(x, t("output_norm.weight"), eps)
    return x @ t("output.weight").T


def test_phi3_forward_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_phi3_gguf

    path = make_tiny_phi3_gguf(tmp_path / "phi3.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_phi3_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_phi3_quantized_runs(tmp_path):
    """Fused-tensor row slicing works on packed quant payloads too."""
    from tpullm.models.testing import make_tiny_phi3_gguf
    from tpullm.tools.quantize import quantize_model

    path = make_tiny_phi3_gguf(tmp_path / "phi3.gguf", n_embd=256, n_ff=256)
    qpath = tmp_path / "phi3.q.gguf"
    quantize_model(str(path), str(qpath), "Q8_0", verbose=False)
    eng = Engine(str(qpath), mode="quant", max_seq=64)
    assert isinstance(eng.generate("the quick", max_new_tokens=4), str)


def _make_tiny_variant(tmp_path, arch, extra_kv=None, post_norms=False,
                       qk_norm_full=False, qk_norm_head=False):
    """Reuse the llama fixture skeleton with arch-specific extra tensors."""
    from tpullm.gguf import GGUFReader, GGUFWriter
    from tpullm.models.testing import make_tiny_llama_gguf

    base = make_tiny_llama_gguf(tmp_path / f"{arch}_base.gguf", arch=arch,
                                extra_kv=extra_kv or {})
    if not post_norms and not qk_norm_full and not qk_norm_head:
        return base
    # rewrite with extra norm tensors
    r = GGUFReader(base)
    out = tmp_path / f"{arch}.gguf"
    w = GGUFWriter(out, architecture=arch)
    for k, v in r.metadata.items():
        if k != "general.architecture":
            w.add_kv(k, v)
    n_layer = r.metadata[f"{arch}.block_count"]
    n_embd = r.metadata[f"{arch}.embedding_length"]
    for name, t in r.tensors.items():
        w.add_packed_tensor(name, t.shape, t.ggml_type, t.data.tobytes())
    for i in range(n_layer):
        p = f"blk.{i}."
        if post_norms:
            w.add_tensor(p + "post_attention_norm.weight",
                         np.ones(n_embd, dtype=np.float32))
            w.add_tensor(p + "post_ffw_norm.weight",
                         np.ones(n_embd, dtype=np.float32))
        if qk_norm_full:
            w.add_tensor(p + "attn_q_norm.weight", np.ones(n_embd, dtype=np.float32))
            w.add_tensor(p + "attn_k_norm.weight",
                         np.ones(n_embd // 2, dtype=np.float32))
        if qk_norm_head:  # per-head norms (exaone4)
            hd = n_embd // r.metadata[f"{arch}.attention.head_count"]
            w.add_tensor(p + "attn_q_norm.weight", np.ones(hd, dtype=np.float32))
            w.add_tensor(p + "attn_k_norm.weight", np.ones(hd, dtype=np.float32))
    w.write()
    return str(out)


def test_olmo2_forward_matches_numpy(tmp_path):
    path = _make_tiny_variant(tmp_path, "olmo2", post_norms=True,
                              qk_norm_full=True)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    got = eng.prefill_all_logits(toks)

    # numpy reference (post-norm structure)
    r = eng.reader
    md = r.metadata
    n_layer, n_head = md["olmo2.block_count"], md["olmo2.attention.head_count"]
    n_head_kv = md["olmo2.attention.head_count_kv"]
    n_embd = md["olmo2.embedding_length"]
    eps = md["olmo2.attention.layer_norm_rms_epsilon"]
    base = md["olmo2.rope.freq_base"]
    hd = n_embd // n_head

    def t(name):
        return r.tensors[name].to_numpy().astype(np.float64)

    T = len(toks)
    pos = np.arange(T)
    x = t("token_embd.weight")[np.asarray(toks)]
    for i in range(n_layer):
        p = f"blk.{i}."
        q = _rms(x @ t(p + "attn_q.weight").T, t(p + "attn_q_norm.weight"), eps)
        k = _rms(x @ t(p + "attn_k.weight").T, t(p + "attn_k_norm.weight"), eps)
        v = (x @ t(p + "attn_v.weight").T).reshape(T, n_head_kv, hd)
        q = _rope_neox(q.reshape(T, n_head, hd), pos, base)
        k = _rope_neox(k.reshape(T, n_head_kv, hd), pos, base)
        out = _mha(q, k, v, n_head, n_head_kv, 1 / np.sqrt(hd))
        attn = out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        x = x + _rms(attn, t(p + "post_attention_norm.weight"), eps)
        gate = x @ t(p + "ffn_gate.weight").T
        up = x @ t(p + "ffn_up.weight").T
        ffn = (gate / (1 + np.exp(-gate)) * up) @ t(p + "ffn_down.weight").T
        x = x + _rms(ffn, t(p + "post_ffw_norm.weight"), eps)
    x = _rms(x, t("output_norm.weight"), eps)
    ref = x @ t("output.weight").T
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_command_r_forward_matches_numpy(tmp_path):
    path = _make_tiny_variant(tmp_path, "command-r",
                              extra_kv={"command-r.logit_scale": 0.75,
                                        "command-r.attention.layer_norm_epsilon": 1e-5})
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    got = eng.prefill_all_logits(toks)

    r = eng.reader
    md = r.metadata
    n_layer, n_head = md["command-r.block_count"], md["command-r.attention.head_count"]
    n_head_kv = md["command-r.attention.head_count_kv"]
    n_embd = md["command-r.embedding_length"]
    eps = 1e-5
    base = md["command-r.rope.freq_base"]
    hd = n_embd // n_head

    def t(name):
        return r.tensors[name].to_numpy().astype(np.float64)

    T = len(toks)
    pos = np.arange(T)
    x = t("token_embd.weight")[np.asarray(toks)]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = _ln(x, t(p + "attn_norm.weight"), 0.0, eps)
        q = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, n_head_kv, hd)
        q, k = _rope_norm(q, pos, base), _rope_norm(k, pos, base)
        out = _mha(q, k, v, n_head, n_head_kv, 1 / np.sqrt(hd))
        attn = out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        ffn = (gate / (1 + np.exp(-gate)) * up) @ t(p + "ffn_down.weight").T
        x = x + attn + ffn
    x = _ln(x, t("output_norm.weight"), 0.0, eps)
    ref = (x @ t("output.weight").T) * 0.75
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# -- starcoder2 / nemotron (LN+bias, biased attn, sequential no-gate FFN) -----


def np_starcoder2_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = md["general.architecture"]
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_head_kv = md[f"{arch}.attention.head_count_kv"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def b(name):  # orion ships no biases
        return t(name) if name in reader.tensors else 0.0

    def ln(x, w, bias):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + bias

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
        h = ln(x, t(p + "attn_norm.weight"), b(p + "attn_norm.bias"))
        q = (h @ t(p + "attn_q.weight").T + b(p + "attn_q.bias")).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T + b(p + "attn_k.bias")).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T + b(p + "attn_v.bias")).reshape(T, n_head_kv, hd)
        q, k = rope_neox(q, pos), rope_neox(k, pos)
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T \
              + b(p + "attn_output.bias")
        h = ln(x, t(p + "ffn_norm.weight"), b(p + "ffn_norm.bias"))
        up = h @ t(p + "ffn_up.weight").T + b(p + "ffn_up.bias")
        if p + "ffn_gate.weight" in reader.tensors:  # orion swiglu
            gate = h @ t(p + "ffn_gate.weight").T
            act = gate / (1 + np.exp(-gate)) * up
        elif arch == "nemotron":
            act = np.square(np.maximum(up, 0.0))
        else:
            from scipy.special import erf  # noqa — fallback below if absent
            act = 0.5 * up * (1 + erf(up / np.sqrt(2)))
        x = x + act @ t(p + "ffn_down.weight").T + b(p + "ffn_down.bias")
    x = ln(x, t("output_norm.weight"), b("output_norm.bias"))
    return x @ t("output.weight").T


@pytest.mark.parametrize("arch", ["starcoder2", "nemotron"])
def test_starcoder2_family_matches_numpy(tmp_path, arch):
    from tpullm.models.testing import make_tiny_starcoder2_gguf

    path = make_tiny_starcoder2_gguf(tmp_path / f"{arch}.gguf", arch=arch)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_starcoder2_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("arch", ["internlm2", "exaone", "granite", "xverse",
                                  "ernie4_5", "refact"])
def test_llama_alias_archs_load_and_generate(tmp_path, arch):
    """Aliased llama-graph archs load through the registry and run
    (llm_build_internlm2 / llm_build_exaone / llm_build_xverse /
    llm_build_ernie4_5 are byte-identical llama graphs; granite adds the
    scale multipliers; refact swaps rope for ALiBi)."""
    from tpullm.models.testing import make_tiny_llama_gguf

    extra = {}
    if arch == "granite":
        extra = {f"{arch}.residual_scale": 0.5,
                 f"{arch}.embedding_scale": 4.0,
                 f"{arch}.logit_scale": 2.0}
    path = make_tiny_llama_gguf(tmp_path / f"{arch}.gguf", arch=arch,
                                extra_kv=extra)
    eng = Engine(path, mode="dense", max_seq=64)
    out = eng.generate("the quick", max_new_tokens=4)
    assert isinstance(out, str)
    if arch == "granite":
        assert eng.hp.residual_scale == 0.5


def np_phi2_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    n_layer = md["phi2.block_count"]
    n_head = md["phi2.attention.head_count"]
    n_head_kv = md["phi2.attention.head_count_kv"]
    n_embd = md["phi2.embedding_length"]
    eps = md["phi2.attention.layer_norm_epsilon"]
    base = md["phi2.rope.freq_base"]
    n_rot = md["phi2.rope.dimension_count"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    def rope_partial_neox(x, pos):
        T, H, D = x.shape
        half = n_rot // 2
        inv = base ** (-np.arange(half) * 2.0 / n_rot)
        theta = pos[:, None] * inv
        c, s = np.cos(theta), np.sin(theta)
        out = x.copy()
        x0, x1 = x[..., :half], x[..., half:n_rot]
        out[..., :half] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out[..., half:n_rot] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    n_q = n_head * hd
    n_kv = n_head_kv * hd
    for i in range(n_layer):
        p = f"blk.{i}."
        h = ln(x, t(p + "attn_norm.weight"), t(p + "attn_norm.bias"))
        qkv = h @ t(p + "attn_qkv.weight").T + t(p + "attn_qkv.bias")
        q = qkv[:, :n_q].reshape(T, n_head, hd)
        k = qkv[:, n_q:n_q + n_kv].reshape(T, n_head_kv, hd)
        v = qkv[:, n_q + n_kv:].reshape(T, n_head_kv, hd)
        q, k = rope_partial_neox(q, pos), rope_partial_neox(k, pos)
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        attn = out.reshape(T, n_embd) @ t(p + "attn_output.weight").T \
             + t(p + "attn_output.bias")
        up = h @ t(p + "ffn_up.weight").T + t(p + "ffn_up.bias")
        from scipy.special import erf
        act = 0.5 * up * (1 + erf(up / np.sqrt(2)))
        ffn = act @ t(p + "ffn_down.weight").T + t(p + "ffn_down.bias")
        x = x + attn + ffn  # parallel block
    x = ln(x, t("output_norm.weight"), t("output_norm.bias"))
    return x @ t("output.weight").T + t("output.bias")


def test_phi2_forward_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_phi2_gguf

    path = make_tiny_phi2_gguf(tmp_path / "phi2.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_phi2_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def np_olmo_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    n_layer = md["olmo.block_count"]
    n_head = md["olmo.attention.head_count"]
    n_head_kv = md["olmo.attention.head_count_kv"]
    n_embd = md["olmo.embedding_length"]
    eps = md["olmo.attention.layer_norm_rms_epsilon"]
    base = md["olmo.rope.freq_base"]
    clamp = md.get("olmo.attention.clamp_kqv", 0.0)
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def ln(x):  # non-parametric LayerNorm
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps)

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
        h = ln(x)
        q = h @ t(p + "attn_q.weight").T
        k = h @ t(p + "attn_k.weight").T
        v = h @ t(p + "attn_v.weight").T
        if clamp:
            q, k, v = (np.clip(a, -clamp, clamp) for a in (q, k, v))
        q = rope_neox(q.reshape(T, n_head, hd), pos)
        k = rope_neox(k.reshape(T, n_head_kv, hd), pos)
        v = v.reshape(T, n_head_kv, hd)
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        h = ln(x)
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        x = x + (gate / (1 + np.exp(-gate)) * up) @ t(p + "ffn_down.weight").T
    return ln(x) @ t("output.weight").T


def test_olmo_forward_matches_numpy(tmp_path):
    """OLMo v1: non-parametric LN + clamped qkv (norm tensors absent)."""
    from tpullm.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(
        tmp_path / "olmo.gguf", arch="olmo",
        extra_kv={"olmo.attention.clamp_kqv": 0.08},
    )
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_olmo_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_smollm3_nope_layers_differ_from_llama(tmp_path):
    """smollm3: every 4th layer skips rope — logits must differ from an
    identically-weighted llama, and generation runs."""
    from tpullm.models.testing import make_tiny_llama_gguf

    p1 = make_tiny_llama_gguf(tmp_path / "s3.gguf", arch="smollm3", n_layer=4)
    p2 = make_tiny_llama_gguf(tmp_path / "ll.gguf", arch="llama", n_layer=4)
    e1 = Engine(p1, mode="dense", dtype=jnp.float32, max_seq=64,
                kv_dtype=jnp.float32)
    e2 = Engine(p2, mode="dense", dtype=jnp.float32, max_seq=64,
                kv_dtype=jnp.float32)
    assert e1.hp.no_rope_step == 4 and e2.hp.no_rope_step == 0
    toks = e1.tokenizer.tokenize("the quick brown fox", add_special=True)
    l1 = e1.prefill(toks)
    l2 = e2.prefill(toks)
    # same weights, different rope schedule (and rope style) → different logits
    assert not np.allclose(l1, l2, atol=1e-3)
    assert isinstance(e1.generate("hello", max_new_tokens=4), str)


def test_arcee_gateless_relu2_ffn(tmp_path):
    """arcee: no ffn_gate tensor → ReLU² sequential FFN; verify against a
    direct numpy computation of one layer's FFN path."""
    from tpullm.gguf import GGUFReader
    from tpullm.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "arc.gguf", arch="arcee", n_layer=1)
    # rewrite without the gate tensor: build a copy minus ffn_gate
    r = GGUFReader(path)
    from tpullm.gguf.writer import GGUFWriter

    path2 = str(tmp_path / "arc2.gguf")
    w = GGUFWriter(path2, architecture="arcee")
    for key, val in r.metadata.items():
        if key != "general.architecture":
            w.add_kv(key, val)
    for name, info in r.tensors.items():
        if name.endswith("ffn_gate.weight"):
            continue
        w.add_tensor(name, info.to_numpy())
    w.write()

    eng = Engine(path2, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.params["layers"][0]["w_gate"] is None
    toks = eng.tokenizer.tokenize("the quick", add_special=True)
    logits = eng.prefill(toks)
    assert np.isfinite(logits).all()
    assert isinstance(eng.generate("hello", max_new_tokens=4), str)


def np_stablelm_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    n_layer = md["stablelm.block_count"]
    n_head = md["stablelm.attention.head_count"]
    n_head_kv = md["stablelm.attention.head_count_kv"]
    n_embd = md["stablelm.embedding_length"]
    eps = md["stablelm.attention.layer_norm_epsilon"]
    base = md["stablelm.rope.freq_base"]
    n_rot = md["stablelm.rope.dimension_count"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def has(name):
        return name in reader.tensors

    def ln(x, w, b=None):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        out = (x - mu) / np.sqrt(var + eps) * w
        return out + b if b is not None else out

    def rope_partial(x, pos):
        T, H, D = x.shape
        half = n_rot // 2
        inv = base ** (-np.arange(half) * 2.0 / n_rot)
        theta = pos[:, None] * inv
        c, s = np.cos(theta), np.sin(theta)
        out = x.copy()
        x0, x1 = x[..., :half], x[..., half:n_rot]
        out[..., :half] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out[..., half:n_rot] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = ln(x, t(p + "attn_norm.weight"), t(p + "attn_norm.bias"))
        q = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, n_head_kv, hd)
        if has(p + "attn_q_norm.weight"):
            q = ln(q, t(p + "attn_q_norm.weight").reshape(n_head, hd))
            k = ln(k, t(p + "attn_k_norm.weight").reshape(n_head_kv, hd))
        q, k = rope_partial(q, pos), rope_partial(k, pos)
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        ffn_inp = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        if has(p + "ffn_norm.weight"):
            hf = ln(ffn_inp, t(p + "ffn_norm.weight"), t(p + "ffn_norm.bias"))
        else:
            hf = h  # parallel residual
        gate = hf @ t(p + "ffn_gate.weight").T
        up = hf @ t(p + "ffn_up.weight").T
        x = ffn_inp + (gate / (1 + np.exp(-gate)) * up) @ t(p + "ffn_down.weight").T
    x = ln(x, t("output_norm.weight"), t("output_norm.bias"))
    return x @ t("output.weight").T


@pytest.mark.parametrize("parallel", [False, True])
def test_stablelm_forward_matches_numpy(tmp_path, parallel):
    """stablelm: LN+bias, per-head q/k LN, partial rope; `parallel` drops
    ffn_norm to exercise the parallel-residual variant."""
    from tpullm.models.testing import make_tiny_stablelm_gguf

    path = make_tiny_stablelm_gguf(tmp_path / "st.gguf", parallel=parallel)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_stablelm_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_minicpm_defaults_and_generation(tmp_path):
    """minicpm rides the granite-scaled llama graph with legacy default
    multipliers (embd 12, residual 1.4/sqrt(L), logits 256/n_embd)."""
    from tpullm.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "mc.gguf", arch="minicpm", n_layer=2)
    eng = Engine(path, mode="dense", max_seq=64)
    hp = eng.hp
    assert hp.embd_scale == 12.0
    assert abs(hp.residual_scale - 1.4 / np.sqrt(2)) < 1e-6
    assert abs(hp.logit_scale - 256.0 / 64) < 1e-6
    assert isinstance(eng.generate("the quick", max_new_tokens=4), str)


# -- orion (LN+bias norms, unbiased attn, swiglu FFN) --------------------------


def test_orion_forward_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_starcoder2_gguf

    path = make_tiny_starcoder2_gguf(tmp_path / "orion.gguf", arch="orion",
                                     with_bias=False, gated=True)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_starcoder2_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# -- qwen v1 (fused attn_qkv over the llama graph) -----------------------------


def test_qwen_fused_qkv_matches_split(tmp_path):
    """llm_build_qwen's fused attn_qkv views must equal a split-tensor qwen2
    model built from the same arrays (row-split at load is exact)."""
    from tpullm.models.testing import make_tiny_qwen_gguf

    fused = tmp_path / "qwen.gguf"
    split = tmp_path / "qwen2.gguf"
    make_tiny_qwen_gguf(fused, split_path=split)
    e1 = Engine(str(fused), mode="dense", dtype=jnp.float32, max_seq=64,
                kv_dtype=jnp.float32)
    e2 = Engine(str(split), mode="dense", dtype=jnp.float32, max_seq=64,
                kv_dtype=jnp.float32)
    toks = e1.tokenizer.tokenize("hello world", add_special=True)
    np.testing.assert_allclose(
        e1.prefill_all_logits(toks), e2.prefill_all_logits(toks),
        rtol=1e-6, atol=1e-6,
    )


# -- refact (llama graph + ALiBi instead of rope) ------------------------------


def np_alibi_llama_forward(reader: GGUFReader, tokens, max_bias=8.0):
    """llama graph, no rope, ALiBi bias (llm_build_refact; ggml soft_max_ext
    slope ladder)."""
    md = reader.metadata
    arch = md["general.architecture"]
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_head_kv = md[f"{arch}.attention.head_count_kv"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    n_log2 = 1 << int(np.floor(np.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_log2)
    m1 = 2.0 ** (-max_bias / 2.0 / n_log2)
    slopes = [m0 ** (h + 1) if h < n_log2 else m1 ** (2 * (h - n_log2) + 1)
              for h in range(n_head)]

    T = len(tokens)
    x = t("token_embd.weight")[tokens]
    dist = -np.abs(np.arange(T)[:, None] - np.arange(T)[None, :])
    for i in range(n_layer):
        p = f"blk.{i}."
        h = _rms(x, t(p + "attn_norm.weight"), eps)
        q = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, n_head_kv, hd)
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd) + slopes[hh] * dist
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        h = _rms(x, t(p + "ffn_norm.weight"), eps)
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        act = gate / (1 + np.exp(-gate)) * up
        x = x + act @ t(p + "ffn_down.weight").T
    x = _rms(x, t("output_norm.weight"), eps)
    return x @ t("output.weight").T


def test_refact_alibi_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "refact.gguf", arch="refact")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.max_alibi_bias == 8.0
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_alibi_llama_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# -- falcon / gptneox (LN+bias, fused qkv, neox rope, sequential GELU FFN) -----


def np_falcon_neox_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = md["general.architecture"]
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_head_kv = md[f"{arch}.attention.head_count_kv"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    n_rot = md[f"{arch}.rope.dimension_count"]
    par_res = bool(md.get(f"{arch}.use_parallel_residual", False))
    hd = n_embd // n_head
    n_q, n_kv = n_head * hd, n_head_kv * hd

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def b(name):
        return t(name) if name in reader.tensors else 0.0

    def ln(x, w, bias):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + bias

    def rope_partial_neox(x, pos):
        T, H, D = x.shape
        half = n_rot // 2
        inv = base ** (-np.arange(half) * 2.0 / n_rot)
        theta = pos[:, None] * inv
        c, s = np.cos(theta), np.sin(theta)
        out = x.copy()
        x0, x1 = x[..., :half], x[..., half:n_rot]
        out[..., :half] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out[..., half:n_rot] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    def gelu(z):
        from scipy.special import erf
        return 0.5 * z * (1 + erf(z / np.sqrt(2)))

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        a_norm = ln(x, t(p + "attn_norm.weight"), t(p + "attn_norm.bias"))
        if p + "attn_norm_2.weight" in reader.tensors:
            h = ln(x, t(p + "attn_norm_2.weight"), t(p + "attn_norm_2.bias"))
        else:
            h = a_norm
        qkv = h @ t(p + "attn_qkv.weight").T + b(p + "attn_qkv.bias")
        q = qkv[:, :n_q].reshape(T, n_head, hd)
        k = qkv[:, n_q:n_q + n_kv].reshape(T, n_head_kv, hd)
        v = qkv[:, n_q + n_kv:].reshape(T, n_head_kv, hd)
        q, k = rope_partial_neox(q, pos), rope_partial_neox(k, pos)
        out = _mha(q, k, v, n_head, n_head_kv, 1.0 / np.sqrt(hd))
        attn = out.reshape(T, n_q) @ t(p + "attn_output.weight").T \
             + b(p + "attn_output.bias")

        def ffn(z):
            up = z @ t(p + "ffn_up.weight").T + b(p + "ffn_up.bias")
            return gelu(up) @ t(p + "ffn_down.weight").T + b(p + "ffn_down.bias")

        if arch == "falcon":
            x = x + attn + ffn(a_norm)
        elif par_res:
            f_norm = ln(x, t(p + "ffn_norm.weight"), t(p + "ffn_norm.bias"))
            x = x + attn + ffn(f_norm)
        else:
            x = x + attn
            f_norm = ln(x, t(p + "ffn_norm.weight"), t(p + "ffn_norm.bias"))
            x = x + ffn(f_norm)
    x = ln(x, t("output_norm.weight"), t("output_norm.bias"))
    return x @ t("output.weight").T


@pytest.mark.parametrize("arch,kw", [
    ("falcon", {}),
    ("falcon", {"norm2": True}),  # falcon-40B dual-norm layout
    ("gptneox", {"rot_frac": 0.5}),  # sequential residual, partial rope
    ("gptneox", {"rot_frac": 0.5, "par_residual": True}),
])
def test_falcon_neox_matches_numpy(tmp_path, arch, kw):
    from tpullm.models.testing import make_tiny_falcon_gguf

    path = make_tiny_falcon_gguf(tmp_path / f"{arch}.gguf", arch=arch, **kw)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_falcon_neox_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# -- bloom / mpt / jais (ALiBi fused-qkv family) -------------------------------


def np_bloom_family_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = md["general.architecture"]
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_epsilon"]
    max_bias = md.get(f"{arch}.attention.max_alibi_bias", 8.0)
    clamp = md.get(f"{arch}.attention.clamp_kqv", 0.0)
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def b(name):
        return t(name) if name in reader.tensors else 0.0

    def ln(x, w, bias):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + bias

    n_log2 = 1 << int(np.floor(np.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_log2)
    m1 = 2.0 ** (-max_bias / 2.0 / n_log2)
    slopes = [m0 ** (h + 1) if h < n_log2 else m1 ** (2 * (h - n_log2) + 1)
              for h in range(n_head)]

    T = len(tokens)
    x = t("token_embd.weight")[tokens]
    if "token_embd_norm.weight" in reader.tensors:
        x = ln(x, t("token_embd_norm.weight"), b("token_embd_norm.bias"))
    if "position_embd.weight" in reader.tensors:
        x = x + t("position_embd.weight")[np.arange(T)]
    dist = -np.abs(np.arange(T)[:, None] - np.arange(T)[None, :])
    scale = (1.0 / hd) if arch == "jais" else 1.0 / np.sqrt(hd)
    for i in range(n_layer):
        p = f"blk.{i}."
        h = ln(x, t(p + "attn_norm.weight"), b(p + "attn_norm.bias"))
        qkv = h @ t(p + "attn_qkv.weight").T + b(p + "attn_qkv.bias")
        if clamp:
            qkv = np.clip(qkv, -clamp, clamp)
        q, k, v = qkv[:, :n_embd], qkv[:, n_embd:2 * n_embd], qkv[:, 2 * n_embd:]
        if p + "attn_q_norm.weight" in reader.tensors:
            q = ln(q, t(p + "attn_q_norm.weight"), b(p + "attn_q_norm.bias"))
            k = ln(k, t(p + "attn_k_norm.weight"), b(p + "attn_k_norm.bias"))
        q = q.reshape(T, n_head, hd)
        k = k.reshape(T, n_head, hd)
        v = v.reshape(T, n_head, hd)
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            scores = q[:, hh] @ k[:, hh].T * scale + slopes[hh] * dist
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ v[:, hh]
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T \
              + b(p + "attn_output.bias")
        h = ln(x, t(p + "ffn_norm.weight"), b(p + "ffn_norm.bias"))
        up = h @ t(p + "ffn_up.weight").T + b(p + "ffn_up.bias")
        if p + "ffn_gate.weight" in reader.tensors:  # jais swiglu
            gate = h @ t(p + "ffn_gate.weight").T + b(p + "ffn_gate.bias")
            act = gate / (1 + np.exp(-gate)) * up
        else:
            from scipy.special import erf
            act = 0.5 * up * (1 + erf(up / np.sqrt(2)))
        x = x + act @ t(p + "ffn_down.weight").T + b(p + "ffn_down.bias")
    x = ln(x, t("output_norm.weight"), b("output_norm.bias"))
    if "output.weight" in reader.tensors:
        return x @ t("output.weight").T
    return x @ t("token_embd.weight").T


@pytest.mark.parametrize("arch", ["bloom", "mpt", "jais"])
def test_bloom_family_matches_numpy(tmp_path, arch):
    from tpullm.models.testing import make_tiny_bloom_gguf

    path = make_tiny_bloom_gguf(tmp_path / f"{arch}.gguf", arch=arch)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.max_alibi_bias == 8.0
    if arch == "mpt":
        assert eng.hp.clamp_kqv == 2.0
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_bloom_family_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# -- chatglm / glm4 (partial NORM rope, fused gate_up swiglu, glm4 post-norms) -


def np_chatglm_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = md["general.architecture"]
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_head_kv = md[f"{arch}.attention.head_count_kv"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    n_rot = md[f"{arch}.rope.dimension_count"]
    hd = n_embd // n_head
    n_q, n_kv = n_head * hd, n_head_kv * hd

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def rope_partial_norm(x, pos):
        # interleaved pairs over the first n_rot dims (ggml NORM style)
        T, H, D = x.shape
        half = n_rot // 2
        inv = base ** (-np.arange(half) * 2.0 / n_rot)
        theta = pos[:, None] * inv
        c, s = np.cos(theta), np.sin(theta)
        out = x.copy()
        x0 = x[..., 0:n_rot:2]
        x1 = x[..., 1:n_rot:2]
        out[..., 0:n_rot:2] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out[..., 1:n_rot:2] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = _rms(x, t(p + "attn_norm.weight"), eps)
        if p + "attn_qkv.weight" in reader.tensors:
            qkv = h @ t(p + "attn_qkv.weight").T + t(p + "attn_qkv.bias")
            q, k, v = qkv[:, :n_q], qkv[:, n_q:n_q + n_kv], qkv[:, n_q + n_kv:]
        else:
            q = h @ t(p + "attn_q.weight").T
            k = h @ t(p + "attn_k.weight").T
            v = h @ t(p + "attn_v.weight").T
        q = rope_partial_norm(q.reshape(T, n_head, hd), pos)
        k = rope_partial_norm(k.reshape(T, n_head_kv, hd), pos)
        v = v.reshape(T, n_head_kv, hd)
        out = _mha(q, k, v, n_head, n_head_kv, 1.0 / np.sqrt(hd))
        attn = out.reshape(T, n_q) @ t(p + "attn_output.weight").T
        if p + "post_attention_norm.weight" in reader.tensors:
            attn = _rms(attn, t(p + "post_attention_norm.weight"), eps)
        x = x + attn
        h = _rms(x, t(p + "ffn_norm.weight"), eps)
        gate_up = h @ t(p + "ffn_up.weight").T
        n_ff = gate_up.shape[1] // 2
        gate, up = gate_up[:, :n_ff], gate_up[:, n_ff:]
        ffn = (gate / (1 + np.exp(-gate)) * up) @ t(p + "ffn_down.weight").T
        if p + "post_ffw_norm.weight" in reader.tensors:
            ffn = _rms(ffn, t(p + "post_ffw_norm.weight"), eps)
        x = x + ffn
    x = _rms(x, t("output_norm.weight"), eps)
    return x @ t("output.weight").T


@pytest.mark.parametrize("arch", ["chatglm", "glm4"])
def test_chatglm_family_matches_numpy(tmp_path, arch):
    from tpullm.models.testing import make_tiny_chatglm_gguf

    path = make_tiny_chatglm_gguf(tmp_path / f"{arch}.gguf", arch=arch)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_chatglm_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_codeshell_matches_numpy(tmp_path):
    """codeshell rides the gptneox sequential graph (llm_build_codeshell)."""
    from tpullm.models.testing import make_tiny_falcon_gguf

    path = make_tiny_falcon_gguf(tmp_path / "codeshell.gguf", arch="codeshell",
                                 rot_frac=0.5)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_falcon_neox_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_starcoder_v1_loads_and_generates(tmp_path):
    """starcoder (v1) rides the gpt2 wpe + fused-qkv graph
    (llm_build_starcoder)."""
    from tpullm.models.testing import make_tiny_gpt2_gguf

    path = make_tiny_gpt2_gguf(tmp_path / "starcoder.gguf", arch="starcoder")
    eng = Engine(path, mode="dense", max_seq=64)
    out = eng.generate("the quick", max_new_tokens=4)
    assert isinstance(out, str)


# -- deci (NAS per-layer shapes: variable GQA, dummy/linear-attn layers) -------


def np_deci_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = "deci"
    heads = list(md[f"{arch}.attention.head_count"])
    kv_heads = list(md[f"{arch}.attention.head_count_kv"])
    ffs = list(md[f"{arch}.feed_forward_length"])
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    hd = md[f"{arch}.attention.key_length"]

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    for i, (nh, nkv, nf) in enumerate(zip(heads, kv_heads, ffs)):
        p = f"blk.{i}."
        if nh == 0:
            attn = None
            cur = x
        else:
            h = _rms(x, t(p + "attn_norm.weight"), eps)
            if nkv == 0:
                attn = h @ t(p + "attn_output.weight").T
            else:
                q = _rope_norm((h @ t(p + "attn_q.weight").T).reshape(T, nh, hd), pos, base)
                k = _rope_norm((h @ t(p + "attn_k.weight").T).reshape(T, nkv, hd), pos, base)
                v = (h @ t(p + "attn_v.weight").T).reshape(T, nkv, hd)
                out = _mha(q, k, v, nh, nkv, 1.0 / np.sqrt(hd))
                attn = out.reshape(T, nh * hd) @ t(p + "attn_output.weight").T
            cur = attn
        if nf == 0:
            continue  # layer output discarded (llm_build_deci n_ff==0)
        ffn_inp = cur + x if nh > 0 else cur
        h2 = _rms(ffn_inp, t(p + "ffn_norm.weight"), eps)
        gate = h2 @ t(p + "ffn_gate.weight").T
        up = h2 @ t(p + "ffn_up.weight").T
        ffn = (gate / (1 + np.exp(-gate)) * up) @ t(p + "ffn_down.weight").T
        x = ffn + ffn_inp
    x = _rms(x, t("output_norm.weight"), eps)
    return x @ t("output.weight").T


def test_deci_forward_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_deci_gguf

    path = make_tiny_deci_gguf(tmp_path / "deci.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.n_head_kv_arr == (2, 1, 0, 0, 0)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_deci_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# -- openelm (per-layer heads, fused qkv, per-head qk norms, tied head) --------


def np_openelm_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = "openelm"
    heads = list(md[f"{arch}.attention.head_count"])
    kv_heads = list(md[f"{arch}.attention.head_count_kv"])
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    hd = md[f"{arch}.attention.key_length"]

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    T = len(tokens)
    pos = np.arange(T)
    emb = t("token_embd.weight")
    x = emb[tokens]
    for i, (nh, nkv) in enumerate(zip(heads, kv_heads)):
        p = f"blk.{i}."
        h = _rms(x, t(p + "attn_norm.weight"), eps)
        qkv = h @ t(p + "attn_qkv.weight").T
        q = qkv[:, :nh * hd].reshape(T, nh, hd)
        k = qkv[:, nh * hd:(nh + nkv) * hd].reshape(T, nkv, hd)
        v = qkv[:, (nh + nkv) * hd:].reshape(T, nkv, hd)
        q = _rms(q, t(p + "attn_q_norm.weight"), eps)
        k = _rms(k, t(p + "attn_k_norm.weight"), eps)
        q, k = _rope_neox(q, pos, base), _rope_neox(k, pos, base)
        out = _mha(q, k, v, nh, nkv, 1.0 / np.sqrt(hd))
        x = x + out.reshape(T, nh * hd) @ t(p + "attn_output.weight").T
        h = _rms(x, t(p + "ffn_norm.weight"), eps)
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        x = x + (gate / (1 + np.exp(-gate)) * up) @ t(p + "ffn_down.weight").T
    x = _rms(x, t("output_norm.weight"), eps)
    return x @ emb.T


def test_openelm_forward_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_openelm_gguf

    path = make_tiny_openelm_gguf(tmp_path / "openelm.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.n_head_arr == (2, 4)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_openelm_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# -- llama-alias long tail ----------------------------------------------------


@pytest.mark.parametrize("arch,kw", [
    ("mistral3", {}),
    ("seed_oss", {"ffn_norm_tensor": "post_attention_norm"}),
    ("pangu-embedded", {"with_bo": True}),
    ("hunyuan-dense", {"with_qk_norm": True, "with_bo": True}),
])
def test_llama_alias_tail_loads_and_generates(tmp_path, arch, kw):
    from tpullm.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "m.gguf", arch=arch, **kw)
    eng = Engine(path, mode="dense", max_seq=64)
    out = eng.generate("the quick", max_new_tokens=4)
    assert isinstance(out, str)


def test_maincoder_post_rope_qk_norm_matches_numpy(tmp_path):
    """maincoder: NORM rope applied BEFORE the per-head qk RMS norms, plus
    an attn output bias (llm_build_maincoder ordering)."""
    from tpullm.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "mc.gguf", arch="maincoder",
                                with_qk_norm=True, with_bo=True)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.qk_norm_post_rope
    r = eng.reader
    md = r.metadata
    n_layer = md["maincoder.block_count"]
    n_head = md["maincoder.attention.head_count"]
    n_head_kv = md["maincoder.attention.head_count_kv"]
    n_embd = md["maincoder.embedding_length"]
    eps = md["maincoder.attention.layer_norm_rms_epsilon"]
    base = md["maincoder.rope.freq_base"]
    hd = n_embd // n_head

    def t(name):
        return r.tensors[name].to_numpy().astype(np.float64)

    def rope_norm(x, pos):  # interleaved pairs, full head dim
        T, H, D = x.shape
        half = D // 2
        inv = base ** (-np.arange(half) * 2.0 / D)
        theta = pos[:, None] * inv
        c, s = np.cos(theta), np.sin(theta)
        out = x.copy()
        x0, x1 = x[..., 0::2], x[..., 1::2]
        out[..., 0::2] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out[..., 1::2] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    tokens = np.asarray(toks)
    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = _rms(x, t(p + "attn_norm.weight"), eps)
        q = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, n_head_kv, hd)
        q = _rms(rope_norm(q, pos), t(p + "attn_q_norm.weight"), eps)
        k = _rms(rope_norm(k, pos), t(p + "attn_k_norm.weight"), eps)
        out = _mha(q, k, v, n_head, n_head_kv, 1.0 / np.sqrt(hd))
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T \
              + t(p + "attn_output.bias")
        h = _rms(x, t(p + "ffn_norm.weight"), eps)
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        x = x + (gate / (1 + np.exp(-gate)) * up) @ t(p + "ffn_down.weight").T
    x = _rms(x, t("output_norm.weight"), eps)
    ref = x @ t("output.weight").T
    got = eng.prefill_all_logits(toks)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# -- bitnet (ternary llama: per-projection scales + sub-norms, tied head) ------


def np_bitnet_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = "bitnet"
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_head_kv = md[f"{arch}.attention.head_count_kv"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def s(name):
        return float(t(name).reshape(-1)[0])

    T = len(tokens)
    pos = np.arange(T)
    emb = t("token_embd.weight")
    x = emb[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = _rms(x, t(p + "attn_norm.weight"), eps)
        q = (h @ t(p + "attn_q.weight").T * s(p + "attn_q.scale")).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T * s(p + "attn_k.scale")).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T * s(p + "attn_v.scale")).reshape(T, n_head_kv, hd)
        q, k = _rope_neox(q, pos, base), _rope_neox(k, pos, base)
        out = _mha(q, k, v, n_head, n_head_kv, 1.0 / np.sqrt(hd)).reshape(T, n_embd)
        out = _rms(out, t(p + "attn_sub_norm.weight"), eps)
        x = x + out @ t(p + "attn_output.weight").T * s(p + "attn_output.scale")
        h = _rms(x, t(p + "ffn_norm.weight"), eps)
        gate = h @ t(p + "ffn_gate.weight").T * s(p + "ffn_gate.scale")
        up = h @ t(p + "ffn_up.weight").T * s(p + "ffn_up.scale")
        act = gate / (1 + np.exp(-gate)) * up
        act = _rms(act, t(p + "ffn_sub_norm.weight"), eps)
        x = x + act @ t(p + "ffn_down.weight").T * s(p + "ffn_down.scale")
    x = _rms(x, t("output_norm.weight"), eps)
    return x @ emb.T


def test_bitnet_forward_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_bitnet_gguf

    path = make_tiny_bitnet_gguf(tmp_path / "bitnet.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_bitnet_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# -- dream / llada (bidirectional diffusion denoisers) -------------------------


def test_dream_bidirectional_matches_numpy(tmp_path):
    """Dream: qwen2-style biased qkv, neox rope, NON-causal full attention
    (llm_build_dream over build_attn_inp_no_cache)."""
    from tpullm.models.registry import get_arch, load_hparams
    from tpullm.models.testing import make_tiny_llama_gguf
    import jax

    path = make_tiny_llama_gguf(
        tmp_path / "dream.gguf", arch="dream", with_qkv_bias=True,
        extra_kv={"tokenizer.ggml.mask_token_id": 0},
    )
    r = GGUFReader(path)
    hp = load_hparams(r)
    spec = get_arch(hp.arch)
    params = spec.build_params(r, hp, mode="dense", dtype=jnp.float32)
    toks = np.asarray([5, 9, 3, 7, 11, 2], np.int32)
    pos = jnp.asarray(np.arange(len(toks))[None])
    logits, _ = jax.jit(
        lambda p, t_: spec.forward(hp, p, t_, pos, jnp.zeros(()), 0)
    )(params, jnp.asarray(toks[None]))
    got = np.asarray(logits[0])

    md = r.metadata
    n_layer = md["dream.block_count"]
    n_head = md["dream.attention.head_count"]
    n_head_kv = md["dream.attention.head_count_kv"]
    n_embd = md["dream.embedding_length"]
    eps = md["dream.attention.layer_norm_rms_epsilon"]
    base = md["dream.rope.freq_base"]
    hd = n_embd // n_head

    def t(name):
        return r.tensors[name].to_numpy().astype(np.float64)

    T = len(toks)
    posn = np.arange(T)
    x = t("token_embd.weight")[toks]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = _rms(x, t(p + "attn_norm.weight"), eps)
        q = (h @ t(p + "attn_q.weight").T + t(p + "attn_q.bias")).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T + t(p + "attn_k.bias")).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T + t(p + "attn_v.bias")).reshape(T, n_head_kv, hd)
        q, k = _rope_neox(q, posn, base), _rope_neox(k, posn, base)
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)  # NO causal mask
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        h = _rms(x, t(p + "ffn_norm.weight"), eps)
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        x = x + (gate / (1 + np.exp(-gate)) * up) @ t(p + "ffn_down.weight").T
    x = _rms(x, t("output_norm.weight"), eps)
    ref = x @ t("output.weight").T
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_diffusion_generate_fills_canvas(tmp_path):
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.tools.diffusion import diffusion_generate

    path = make_tiny_llama_gguf(
        tmp_path / "llada.gguf", arch="llada",
        extra_kv={"tokenizer.ggml.mask_token_id": 0},
    )
    eng = Engine(path, mode="dense", max_seq=64)
    ids = eng.tokenizer.tokenize("the quick", add_special=True)
    out = diffusion_generate(eng, ids, max_length=len(ids) + 8, steps=4)
    assert len(out) == 8
    assert all(t != 0 for t in out)  # every mask slot committed


def test_exaone4_iswa_loads_and_generates(tmp_path):
    """exaone4 = olmo2's post-norm skeleton + per-head qk norms + iSWA with
    rope only on sliding-window layers (llm_build_exaone4)."""
    path = _make_tiny_variant(
        tmp_path, "exaone4", post_norms=True, qk_norm_head=True,
        extra_kv={"exaone4.attention.sliding_window": 8,
                  "exaone4.attention.sliding_window_pattern": 4},
    )
    eng = Engine(path, mode="dense", max_seq=64)
    assert eng.hp.sliding_window == 8 and eng.hp.swa_pattern == 4
    assert eng.hp.is_swa(0) and not eng.hp.is_swa(3)
    out = eng.generate("the quick brown fox jumps over", max_new_tokens=6)
    assert isinstance(out, str)


def test_llada_moe_diffusion(tmp_path):
    """llada-moe: bidirectional denoiser over the qwen-moe tensor set."""
    from tpullm.models.testing import make_tiny_moe_gguf
    from tpullm.tools.diffusion import diffusion_generate

    path = make_tiny_moe_gguf(
        tmp_path / "lm.gguf", arch="llada-moe",
    )
    # inject the mask token id
    from tpullm.gguf import GGUFReader
    eng = Engine(path, mode="dense", max_seq=64)
    ids = eng.tokenizer.tokenize("the quick", add_special=True)
    out = diffusion_generate(eng, ids, max_length=len(ids) + 6, steps=3,
                             mask_token_id=0)
    assert len(out) == 6 and all(t != 0 for t in out)


# slow: alias-loading breadth (~100s); the qwen-vl forward test is fast
@pytest.mark.slow
def test_qwen_vl_text_aliases(tmp_path):
    """qwen2vl/qwen3vl text stacks ride the qwen2/qwen3 graphs (m-rope with
    equal text-position streams ≡ standard neox rope)."""
    from tpullm.models.testing import make_tiny_llama_gguf

    for arch in ("qwen2vl", "qwen3vl"):
        path = make_tiny_llama_gguf(tmp_path / f"{arch}.gguf", arch=arch)
        eng = Engine(path, mode="dense", max_seq=64)
        assert eng.hp.rope.style == "neox"
        out = eng.generate("the quick", max_new_tokens=3)
        assert isinstance(out, str)


# -- chameleon / plm / rnd1 ----------------------------------------------------


def test_chameleon_matches_numpy(tmp_path):
    """Chameleon pre-norm path with per-head LayerNorm qk norms (pre-rope)."""
    from tpullm.models.testing import make_tiny_chameleon_gguf

    path = make_tiny_chameleon_gguf(tmp_path / "cham.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    got = eng.prefill_all_logits(toks)

    r = eng.reader
    md = r.metadata
    n_head = md["chameleon.attention.head_count"]
    n_kv = md["chameleon.attention.head_count_kv"]
    n_embd = md["chameleon.embedding_length"]
    eps = md["chameleon.attention.layer_norm_rms_epsilon"]
    hd = n_embd // n_head

    def t(name):
        return r.tensors[name].to_numpy().astype(np.float64)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    def silu(z):
        return z / (1 + np.exp(-z))

    def rope_norm(x, pos):  # interleaved-pair NORM rope
        out = x.copy()
        half = hd // 2
        inv = 10000.0 ** (-np.arange(half) * 2.0 / hd)
        ang = pos[:, None] * inv[None, :]
        cos, sin = np.cos(ang), np.sin(ang)
        a, b = x[..., 0::2], x[..., 1::2]
        out[..., 0::2] = a * cos[:, None, :] - b * sin[:, None, :]
        out[..., 1::2] = a * sin[:, None, :] + b * cos[:, None, :]
        return out

    T = len(toks)
    pos = np.arange(T, dtype=np.float64)
    x = t("token_embd.weight")[np.asarray(toks)]
    for i in range(md["chameleon.block_count"]):
        p = f"blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        q = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(T, n_kv, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, n_kv, hd)
        q = ln(q, t(p + "attn_q_norm.weight"), t(p + "attn_q_norm.bias"))
        k = ln(k, t(p + "attn_k_norm.weight"), t(p + "attn_k_norm.bias"))
        q = rope_norm(q, pos)
        k = rope_norm(k, pos)
        g = n_head // n_kv
        o = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            o[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        x = x + o.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        h = rms(x, t(p + "ffn_norm.weight"))
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        x = x + (silu(gate) * up) @ t(p + "ffn_down.weight").T
    ref = rms(x, t("output_norm.weight")) @ t("output.weight").T
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_chameleon_swin_norm_generates(tmp_path):
    """swin_norm=true: norms move AFTER the attention/FFN sub-blocks."""
    from tpullm.models.testing import make_tiny_chameleon_gguf

    path = make_tiny_chameleon_gguf(tmp_path / "chams.gguf", swin_norm=True)
    eng = Engine(path, mode="dense", max_seq=64)
    assert eng.hp.swin_norm
    full = eng.prefill_all_logits(
        eng.tokenizer.tokenize("the quick brown", add_special=True))
    assert np.isfinite(full).all()
    out = eng.generate("the quick brown", max_new_tokens=4)
    assert isinstance(out, str)


def test_plm_mla_dense_relu2(tmp_path):
    """plm: deepseek2 MLA attention + gateless ReLU² dense FFN."""
    from tpullm.models.testing import make_tiny_plm_gguf

    path = make_tiny_plm_gguf(tmp_path / "plm.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_rnd1_diffusion(tmp_path):
    """rnd1: qwen3moe converted to a bidirectional diffusion denoiser with
    renormalized softmax routing hardcoded in the graph (llm_build_rnd1)."""
    from tpullm.models.testing import make_tiny_moe_gguf
    from tpullm.tools.diffusion import diffusion_generate

    path = make_tiny_moe_gguf(tmp_path / "rnd1.gguf", arch="rnd1")
    eng = Engine(path, mode="dense", max_seq=64)
    assert eng.hp.expert_weights_norm  # no GGUF key: graph default
    ids = eng.tokenizer.tokenize("the quick", add_special=True)
    out = diffusion_generate(eng, ids, max_length=len(ids) + 6, steps=3,
                             mask_token_id=0)
    assert len(out) == 6 and all(t != 0 for t in out)


def test_gemma1_generates_and_scales(tmp_path):
    """gemma v1: sqrt(n_embd) embedding scale, no post-norms/softcaps/SWA
    (llm_build_gemma)."""
    from tpullm.models.testing import make_tiny_gemma_gguf

    path = make_tiny_gemma_gguf(tmp_path / "g1.gguf", arch="gemma")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.sliding_window == 0
    assert abs(eng.hp.embd_scale - 8.0) < 1e-6  # sqrt(64)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_phimoe_decode_matches_prefill(tmp_path):
    """phimoe: phi3 attention with RMS+bias norms, biased projections,
    renormalized softmax MoE, biased output head."""
    from tpullm.models.testing import make_tiny_phimoe_gguf

    path = make_tiny_phimoe_gguf(tmp_path / "phimoe.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.rope.style == "neox"
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_rwkv6qwen2_decode_matches_prefill(tmp_path):
    """rwkv6qwen2 (qrwkv): gated linear attention without bonus term on a
    qwen2 swiglu body; carried state must make decode ≡ prefill."""
    from tpullm.models.testing import make_tiny_rwkv6qwen2_gguf

    path = make_tiny_rwkv6qwen2_gguf(tmp_path / "qrwkv.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_plamo_parallel_residual(tmp_path):
    """plamo v1: attention and FFN both consume the same normed input."""
    from tpullm.models.testing import make_tiny_plamo_gguf

    path = make_tiny_plamo_gguf(tmp_path / "plamo.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


# slow: long decode-vs-prefill sweep; the plamo2 forward parity test
# stays fast
@pytest.mark.slow
def test_plamo2_hybrid_decode_matches_prefill(tmp_path):
    """plamo2: mamba (per-head scalar A/dt, normed B/C/dt) + fused-qkv
    attention hybrid with pre+post norm sandwiches."""
    from tpullm.models.testing import make_tiny_plamo2_gguf

    path = make_tiny_plamo2_gguf(tmp_path / "plamo2.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.n_head_kv_arr == (0, 2)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_plamo3_iswa_decode_matches_prefill(tmp_path):
    from tpullm.models.testing import make_tiny_plamo3_gguf

    path = make_tiny_plamo3_gguf(tmp_path / "plamo3.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.is_swa(0) and not eng.hp.is_swa(2)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_grovemoe_adjugate_experts(tmp_path):
    """grovemoe: sigmoid selection + softmax weights, adjugate chunk experts
    consume the regular MoE output (llm_build_grovemoe)."""
    from tpullm.models.testing import make_tiny_grovemoe_gguf

    path = make_tiny_grovemoe_gguf(tmp_path / "grove.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.n_group_experts == 4
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_apertus_xielu_ffn(tmp_path):
    """apertus: llama graph with per-head qk norms and a gateless xIELU FFN
    whose per-layer params come from the global xielu.* GGUF keys."""
    from tpullm.gguf import GGUFReader
    from tpullm.gguf.writer import GGUFWriter
    from tpullm.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "ap.gguf", arch="apertus",
                                n_layer=2, with_qk_norm=True)
    r = GGUFReader(path)
    path2 = str(tmp_path / "ap2.gguf")
    w = GGUFWriter(path2, architecture="apertus")
    for key, val in r.metadata.items():
        if key != "general.architecture":
            w.add_kv(key, val)
    w.add_kv("xielu.alpha_n", [0.8, 0.8])
    w.add_kv("xielu.alpha_p", [0.8, 0.8])
    w.add_kv("xielu.beta", [0.5, 0.5])
    w.add_kv("xielu.eps", [-1e-6, -1e-6])
    for name, info in r.tensors.items():
        if name.endswith("ffn_gate.weight"):
            continue  # gateless
        w.add_tensor(name, info.to_numpy())
    w.write()

    eng = Engine(path2, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.xielu is not None and len(eng.hp.xielu) == 2
    an, ap, bb, ee = eng.hp.xielu[0]
    assert abs(an - (0.5 + np.log1p(np.exp(0.8)))) < 1e-6  # β+softplus(αn)
    assert abs(ap - np.log1p(np.exp(0.8))) < 1e-6
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_afmoe_gated_attention_moe(tmp_path):
    """afmoe: sigmoid-gated attention pre-wo, dual norm sandwiches, sigmoid
    MoE with selection bias + gated shexp, NoPE on full-attn layers."""
    from tpullm.models.testing import make_tiny_afmoe_gguf

    path = make_tiny_afmoe_gguf(tmp_path / "afmoe.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.no_rope_step == 2 and eng.hp.is_swa(0)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_mimo2_sinks_nas_iswa(tmp_path):
    """mimo2: per-layer head counts, attention sinks, sigmoid MoE."""
    from tpullm.models.testing import make_tiny_mimo2_gguf

    path = make_tiny_mimo2_gguf(tmp_path / "mimo2.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.n_head_arr == (4, 2, 4)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_step35_gate_and_half_rot(tmp_path):
    """step35: head-wise scalar attn gate, qk norms, half-rot global rope,
    gated shexp on MoE layers."""
    from tpullm.models.testing import make_tiny_mimo2_gguf

    path = make_tiny_mimo2_gguf(tmp_path / "step35.gguf", arch="step35")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_cogvlm_text_and_visual_expert_paths(tmp_path):
    """cogvlm: text tokens use the text weights; float embedding inputs use
    the parallel visual-expert weights (llm_build_cogvlm is_text switch)."""
    from tpullm.gguf import GGUFReader
    from tpullm.models.testing import make_tiny_cogvlm_gguf
    from tpullm.models.registry import get_arch
    from tpullm.models.hparams import hparams_from_gguf
    from tpullm.runtime.kvcache import KVCache

    path = make_tiny_cogvlm_gguf(tmp_path / "cog.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)

    # visual path: float embeddings route through vis_* weights and must
    # differ from the text path on identical hidden inputs
    r = GGUFReader(path)
    hp = hparams_from_gguf(r)
    spec = get_arch("cogvlm")
    params = spec.build_params(r, hp, mode="dense", dtype=jnp.float32)
    embd = params["tok_embd"][jnp.asarray([toks])]
    cache1 = KVCache.new(hp, 1, 32, jnp.float32)
    cache2 = KVCache.new(hp, 1, 32, jnp.float32)
    pos = jnp.arange(len(toks), dtype=jnp.int32)[None]
    txt_logits, _ = spec.forward(hp, params, jnp.asarray([toks]), pos, cache1, 0)
    vis_logits, _ = spec.forward(hp, params, embd, pos, cache2, 0)
    assert np.isfinite(np.asarray(vis_logits)).all()
    assert not np.allclose(np.asarray(txt_logits), np.asarray(vis_logits))


# slow: heaviest linear-attention arch sweep (~150s); the kda/mla
# pieces are covered by deepseek2 + qwen3next fast tests
@pytest.mark.slow
def test_kimi_linear_kda_mla_hybrid(tmp_path):
    """kimi-linear: KDA delta rule with per-channel decay + rope-free MLA;
    carried conv/delta state must make decode ≡ prefill."""
    from tpullm.models.testing import make_tiny_kimi_linear_gguf

    path = make_tiny_kimi_linear_gguf(tmp_path / "kimi.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.head_dim_kda == 16 and eng.hp.head_dim_k_mla == 24
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    from tpullm.models.kimi_linear import make_cache as _kimi_cache

    eng.cache = _kimi_cache(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


# slow: the altup/laurel stack is the single heaviest arch forward
@pytest.mark.slow
def test_gemma3n_altup_laurel(tmp_path):
    """gemma3n: altup stacked hidden state, laurel residual, per-layer
    embeddings, trailing shared-KV layers (llm_build_gemma3n_iswa)."""
    from tpullm.models.testing import make_tiny_gemma3n_gguf

    path = make_tiny_gemma3n_gguf(tmp_path / "g3n.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.n_altup == 2 and eng.hp.n_kv_shared == 2
    assert eng.hp.swa_pattern == 5
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    assert np.abs(full).max() <= 30.0 + 1e-3  # final softcap
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)
