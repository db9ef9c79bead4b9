"""Model hyperparameters read from GGUF metadata.

Role of the reference's llama_hparams (src/llama-hparams.h) + the metadata →
hparams mapping in llama_model::load_hparams (src/llama-model.cpp).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..gguf.constants import Keys
from ..gguf.reader import GGUFReader


@dataclass(frozen=True)
class RopeParams:
    dims: int = 0  # rotary dims (<= head_dim)
    freq_base: float = 10000.0
    scaling_type: str = "none"  # none | linear | yarn | longrope
    scale_factor: float = 1.0
    orig_ctx: int = 0
    attn_factor: float = 1.0
    ext_factor: float = 0.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    # "norm" = rotate adjacent pairs (GGML interleaved, llama GGUF layout);
    # "neox" = rotate halves (GPT-NeoX/HF layout, qwen/gemma/phi GGUFs)
    style: str = "norm"
    # M-RoPE (qwen2vl/qwen3vl/glm4v): per-stream frequency sections
    # (t, h, w, extra) from {arch}.rope.dimension_sections; empty = classic
    sections: tuple = ()
    # qwen3vl IMROPE: sections interleave [THW THW …] over the frequency
    # dims instead of contiguous chunks (HF apply_interleaved_mrope)
    mrope_interleaved: bool = False


@dataclass(frozen=True)
class HParams:
    arch: str
    n_vocab: int
    n_ctx_train: int
    n_embd: int
    n_layer: int
    n_head: int
    n_head_kv: int
    n_ff: int
    head_dim: int
    head_dim_v: int
    rms_eps: float
    rope: RopeParams
    # MoE
    n_expert: int = 0
    n_expert_used: int = 0
    n_ff_exp: int = 0
    expert_weights_scale: float = 1.0
    expert_weights_norm: bool = False
    expert_gating_func: str = "softmax"  # softmax | sigmoid
    # attention extras
    # ALiBi: >0 replaces rope with per-head linear position bias
    # (hparams.f_max_alibi_bias; bloom/refact/baichuan-13B = 8.0)
    max_alibi_bias: float = 0.0
    sliding_window: int = 0
    # SWA layer interleave: is_swa(il) = (il + 1) % swa_pattern != 0
    # (1 = every layer when sliding_window > 0; gemma2 = 2; gemma3 = 6)
    swa_pattern: int = 1
    # explicit per-layer SWA booleans (gemma3n writes an array pattern)
    swa_layers: tuple[int, ...] | None = None
    # per-layer activation-sparsity std multipliers (gemma3n; 0 = dense)
    sparsity_scale: tuple[float, ...] | None = None
    attn_scale: float | None = None
    causal: bool = True
    swin_norm: bool = False  # chameleon: norms after attn/ffn (%s.swin_norm)
    moe_every_n: int = 0  # nomic-bert-moe: MoE FFN on layers il % n == 1
    # apertus xIELU: per-layer (alpha_n_eff, alpha_p_eff, beta, eps) with the
    # ggml_xielu softplus folding already applied
    xielu: tuple | None = None
    # grovemoe adjugate experts
    n_group_experts: int = 0  # %s.experts_per_group
    expert_group_scale: float = 0.05  # %s.expert_group_scale
    # gemma3n altup / per-layer-embedding geometry
    n_altup: int = 0  # %s.altup.num_inputs
    i_altup_act: int = 0  # %s.altup.active_idx
    n_embd_altup: int = 0  # %s.embedding_length_per_layer_input
    n_kv_shared: int = 0  # %s.attention.shared_kv_layers (trailing layers)
    # gemma-family extras
    softcap_attn: float = 0.0
    softcap_final: float = 0.0
    rope_freq_base_swa: float = 0.0  # per-layer rope base for SWA layers
    embd_scale: float = 1.0  # token-embedding multiplier (gemma: sqrt(n_embd))
    # granite-family multipliers (llm_build_granite: f_residual_scale,
    # f_logit_scale; attention scale rides attn_scale)
    residual_scale: float = 1.0
    logit_scale: float = 1.0
    clamp_kqv: float = 0.0  # olmo/mpt qkv clamping
    # gptneox hparams.use_par_res: x + attn(ln1(x)) + ffn(ln2(x))
    par_residual: bool = False
    # maincoder/hunyuan-dense apply the per-head qk RMS norms AFTER rope
    # (llm_build_maincoder / llm_build_hunyuan_dense ordering)
    qk_norm_post_rope: bool = False
    # NoPE interleave (smollm3/llama4: every Nth layer skips rope; 0 = never)
    no_rope_step: int = 0
    # default pooling for embeddings (llama_pooling_type):
    # none | mean | cls | last | rank
    pooling: str = "none"
    # deepseek2 / MLA family
    n_lora_q: int = 0
    n_lora_kv: int = 0
    # kimi-linear: KDA head dim + MLA head dims (%s.kda.head_dim,
    # %s.attention.{key,value}_length_mla)
    head_dim_kda: int = 0
    head_dim_k_mla: int = 0
    head_dim_v_mla: int = 0
    n_layer_dense_lead: int = 0
    n_expert_shared: int = 0
    # granite-hybrid: rope only when rope.scaling.finetuned is set
    rope_finetuned: bool = False
    # bailingmoe2/glm4-moe trailing NextN/MTP layers excluded from the
    # main forward pass (hparams.nextn_predict_layers)
    nextn_layers: int = 0
    # wavtokenizer group-norm params (LLM_KV_ATTENTION_GROUPNORM_*)
    n_norm_groups: int = 0
    norm_group_eps: float = 1e-6
    # T5 family (relative-position buckets, separate decoder stack)
    n_rel_buckets: int = 0
    dec_n_layer: int = 0
    dec_start_token: int = -1
    # rwkv family
    rescale_every: int = 0  # halve activations every N layers
    # per-layer shape arrays (deci/openelm NAS models: llama_hparams
    # n_head_arr/n_head_kv_arr/n_ff_arr); None = uniform layers. The scalar
    # n_head/n_head_kv/n_ff fields hold the per-layer maxima (cache sizing)
    n_head_arr: tuple[int, ...] | None = None
    n_head_kv_arr: tuple[int, ...] | None = None
    n_ff_arr: tuple[int, ...] | None = None
    # SSM (mamba family): llama_hparams ssm_* (src/llama-hparams.h);
    # ssm_d_state doubles as the RWKV wkv head size
    ssm_d_conv: int = 0
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_dt_rank: int = 0  # mamba2: the SSD head count
    ssm_n_group: int = 0  # mamba2 B/C group count (ssm.group_count)
    # falcon-mamba: weightless RMS on dt/B/C before the scan
    # (llama-hparams.h ssm_dt_b_c_rms, graph-context-mamba.cpp:94)
    ssm_dt_b_c_rms: bool = False

    # dense-first pattern: global layers sit at il % n == 0 instead of
    # il % n == n-1 (llama_hparams::set_swa_pattern dense_first; used by
    # smallthinker — and by HF ModernBERT, whose layer 0 is global)
    swa_dense_first: bool = False

    def is_swa(self, il: int) -> bool:
        if self.swa_layers is not None:  # explicit per-layer bool pattern
            return self.sliding_window > 0 and bool(self.swa_layers[il])
        if self.swa_dense_first:
            return self.sliding_window > 0 and il % self.swa_pattern != 0
        return self.sliding_window > 0 and (il + 1) % self.swa_pattern != 0

    # per-layer accessors (≡ llama_hparams::n_head(il) etc.)
    def n_head_l(self, il: int) -> int:
        return self.n_head_arr[il] if self.n_head_arr else self.n_head

    def n_head_kv_l(self, il: int) -> int:
        return self.n_head_kv_arr[il] if self.n_head_kv_arr else self.n_head_kv

    def n_ff_l(self, il: int) -> int:
        return self.n_ff_arr[il] if self.n_ff_arr else self.n_ff

    @property
    def n_gqa(self) -> int:
        return self.n_head // max(self.n_head_kv, 1)

    @property
    def n_embd_k(self) -> int:
        return self.head_dim * self.n_head_kv

    @property
    def n_embd_v(self) -> int:
        return self.head_dim_v * self.n_head_kv


# arch → rope style, copied VERBATIM from llama_model_rope_type
# (src/llama-model.cpp:8488-8626). Everything not listed here is NORM
# (interleaved pairs) or rope-free. Getting this exactly right is a
# wire-format requirement: reference-produced GGUFs for NORM archs carry
# PERMUTED q/k weights (LlamaModel.permute in convert_hf_to_gguf.py), so a
# wrong style here silently garbles real checkpoints. NOTE llama4/deci/
# command-r/cohere2/olmo/smollm3/internlm2 are NORM in the reference —
# their HF sources are either natively interleaved (command-r, llama4) or
# permuted at conversion (cohere2, olmo, smollm3, granite…).
NEOX_ROPE_ARCHS = {
    "falcon", "falcon-h1", "grok", "dbrx", "bert", "jina-bert-v3",
    "modern-bert", "nomic-bert", "nomic-bert-moe", "stablelm", "bitnet",
    "qwen", "qwen2", "dream", "qwen2moe", "qwen3", "qwen3moe", "llada-moe",
    "rnd1", "olmo2", "olmoe", "phi2", "phi3", "phimoe", "plamo", "plamo2",
    "plamo3", "gemma", "gemma2", "gemma3", "gemma3n", "gemma-embedding",
    "starcoder2", "openelm", "gptneox", "codeshell", "orion", "nemotron",
    "exaone", "exaone4", "exaone-moe", "minicpm3", "bailingmoe2", "dots1",
    "hunyuan-moe", "gpt-oss", "hunyuan-dense", "lfm2", "lfm2moe",
    "smallthinker", "seed_oss", "grovemoe", "apertus", "minimax-m2",
    "cogvlm", "pangu-embedded", "afmoe", "qwen3next", "mimo2", "step35",
    "glm4moe",
    # MROPE/IMROPE archs degenerate to neox for text-only streams
    "qwen2vl", "qwen3vl", "qwen3vlmoe",
}


def _read_xielu(r: GGUFReader, n_layer: int):
    """Apertus xIELU per-layer params from global xielu.* keys, with the
    ggml_xielu folding: alpha_n ← beta + softplus(alpha_n),
    alpha_p ← softplus(alpha_p)."""
    raw_n = r.metadata.get("xielu.alpha_n")
    if raw_n is None or n_layer == 0:
        return None

    def arr(key, default):
        v = r.metadata.get(key, default)
        if isinstance(v, (list, tuple, np.ndarray)):
            return [float(x) for x in v]
        return [float(v)] * n_layer

    def softplus(v):
        return float(np.log1p(np.exp(v)))

    a_n = arr("xielu.alpha_n", 0.0)
    a_p = arr("xielu.alpha_p", 0.0)
    beta = arr("xielu.beta", 0.5)
    eps = arr("xielu.eps", -1e-6)
    return tuple(
        (beta[i] + softplus(a_n[i]), softplus(a_p[i]), beta[i], eps[i])
        for i in range(n_layer)
    )


def hparams_from_gguf(r: GGUFReader) -> HParams:
    arch = r.architecture

    def k(template, default=None):
        v = r.metadata.get(template.format(arch=arch))
        return default if v is None else v

    n_embd = int(k(Keys.LLM.EMBEDDING_LENGTH))

    def scalar_or_arr(raw, default=None):
        """GGUF stores per-layer shapes as int arrays for NAS archs (deci);
        returns (max_scalar, tuple_or_None)."""
        if raw is None:
            return default, None
        if isinstance(raw, (list, tuple, np.ndarray)):
            arr = tuple(int(v) for v in raw)
            return max(arr), arr
        return int(raw), None

    n_head, n_head_arr = scalar_or_arr(k(Keys.Attention.HEAD_COUNT))
    n_head_kv, n_head_kv_arr = scalar_or_arr(k(Keys.Attention.HEAD_COUNT_KV), n_head)
    n_ff, n_ff_arr = scalar_or_arr(k(Keys.LLM.FEED_FORWARD_LENGTH), 0)
    head_dim = int(k(Keys.Attention.KEY_LENGTH, n_embd // max(n_head, 1)))
    head_dim_v = int(k(Keys.Attention.VALUE_LENGTH, head_dim))

    n_vocab = k(Keys.LLM.VOCAB_SIZE)
    if n_vocab is None:
        toks = r.metadata.get(Keys.Tokenizer.LIST)
        n_vocab = len(toks) if toks is not None else 0
    n_vocab = int(n_vocab)

    scaling = k(Keys.Rope.SCALING_TYPE, "none") or "none"
    rope = RopeParams(
        dims=int(k(Keys.Rope.DIMENSION_COUNT, head_dim)),
        freq_base=float(k(Keys.Rope.FREQ_BASE, 10000.0)),
        scaling_type=str(scaling),
        scale_factor=float(k(Keys.Rope.SCALING_FACTOR, 1.0)),
        orig_ctx=int(k(Keys.Rope.SCALING_ORIG_CTX_LEN, 0)),
        attn_factor=float(k(Keys.Rope.SCALING_ATTN_FACTOR, 1.0)),
        ext_factor=float(k(Keys.Rope.SCALING_YARN_EXT_FACTOR, 0.0)),
        beta_fast=float(k(Keys.Rope.SCALING_YARN_BETA_FAST, 32.0)),
        beta_slow=float(k(Keys.Rope.SCALING_YARN_BETA_SLOW, 1.0)),
        style="neox" if arch in NEOX_ROPE_ARCHS else "norm",
        sections=tuple(
            int(v) for v in np.atleast_1d(
                k("{arch}.rope.dimension_sections", ()))
        ),
        mrope_interleaved=arch in ("qwen3vl", "qwen3vlmoe"),
    )

    return HParams(
        arch=arch,
        n_vocab=n_vocab,
        n_ctx_train=int(k(Keys.LLM.CONTEXT_LENGTH, 2048)),
        n_embd=n_embd,
        n_layer=int(k(Keys.LLM.BLOCK_COUNT)),
        n_head=n_head,
        n_head_kv=n_head_kv,
        n_ff=n_ff,
        n_head_arr=n_head_arr,
        n_head_kv_arr=n_head_kv_arr,
        n_ff_arr=n_ff_arr,
        head_dim=head_dim,
        head_dim_v=head_dim_v,
        rms_eps=float(k(
            Keys.Attention.LAYERNORM_RMS_EPS,
            k(Keys.Attention.LAYERNORM_EPS, 1e-5),
        )),
        rope=rope,
        n_expert=int(k(Keys.LLM.EXPERT_COUNT, 0)),
        n_expert_used=int(k(Keys.LLM.EXPERT_USED_COUNT, 0)),
        n_ff_exp=int(k(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, 0)),
        expert_weights_scale=float(k(Keys.LLM.EXPERT_WEIGHTS_SCALE, 1.0)),
        # rnd1's graph hardcodes renormalized top-k (llm_build_rnd1
        # build_moe_ffn norm_w=true) with no GGUF key written
        expert_weights_norm=bool(k(Keys.LLM.EXPERT_WEIGHTS_NORM,
                                   arch == "rnd1")),
        expert_gating_func={1: "softmax", 2: "sigmoid"}.get(
            int(k("{arch}.expert_gating_func", 1) or 1), "softmax"
        ),
        # bloom/refact hardcode 8.0; baichuan only for the 40-layer 13B;
        # mpt/jais read the GGUF key (llama-model.cpp load_hparams cases)
        max_alibi_bias=float(k(
            Keys.Attention.MAX_ALIBI_BIAS,
            8.0 if arch in ("bloom", "refact")
            or (arch == "baichuan" and int(k(Keys.LLM.BLOCK_COUNT)) == 40)
            else 0.0,
        )),
        sliding_window=int(k(Keys.Attention.SLIDING_WINDOW, 0)),
        swa_pattern=(lambda v: 1 if isinstance(v, (list, tuple, np.ndarray))
                     else int(v))(k(
            Keys.Attention.SLIDING_WINDOW_PATTERN,
            {"gemma2": 2, "gemma3": 6, "gemma3n": 5, "gemma-embedding": 6,
             "gpt-oss": 2, "llama4": 4, "modern-bert": 3}.get(arch, 1),
        )),
        swa_layers=(lambda v: tuple(int(b) for b in v)
                    if isinstance(v, (list, tuple, np.ndarray)) else None)(
            k(Keys.Attention.SLIDING_WINDOW_PATTERN)),
        sparsity_scale=(lambda v: tuple(float(s) for s in v)
                        if isinstance(v, (list, tuple, np.ndarray)) else None)(
            k("{arch}.activation_sparsity_scale")),
        attn_scale=(float(k(Keys.Attention.SCALE)) if k(Keys.Attention.SCALE) is not None else None),
        causal=bool(k(
            Keys.Attention.CAUSAL,
            arch not in ("bert", "nomic-bert", "nomic-bert-moe",
                         "jina-bert-v2", "jina-bert-v3", "neo-bert",
                         "modern-bert", "gemma-embedding", "llama-embed"),
        )),
        moe_every_n=int(k("{arch}.moe_every_n_layers", 0)),
        xielu=_read_xielu(r, int(k(Keys.LLM.BLOCK_COUNT, 0) or 0)),
        n_group_experts=int(k("{arch}.experts_per_group", 0) or 0),
        expert_group_scale=float(k("{arch}.expert_group_scale", 0.05) or 0.05),
        n_altup=int(k("{arch}.altup.num_inputs",
                      4 if arch == "gemma3n" else 0) or 0),
        i_altup_act=int(k("{arch}.altup.active_idx", 0) or 0),
        n_embd_altup=int(k("{arch}.embedding_length_per_layer_input",
                           256 if arch == "gemma3n" else 0) or 0),
        n_kv_shared=int(k("{arch}.attention.shared_kv_layers", 0) or 0),
        softcap_attn=float(k(Keys.LLM.ATTN_LOGIT_SOFTCAPPING, 0.0)),
        softcap_final=float(k(Keys.LLM.FINAL_LOGIT_SOFTCAPPING, 0.0)),
        rope_freq_base_swa=float(k(
            Keys.Rope.FREQ_BASE_SWA,
            10000.0 if arch in ("gemma3", "gemma3n", "gemma-embedding") else 0.0,
        )),
        # minicpm ships granite-style multipliers with legacy defaults
        # (llama-model.cpp LLM_ARCH_MINICPM hparams block)
        embd_scale=float(k(
            "{arch}.embedding_scale",
            12.0 if arch in ("minicpm", "minicpm3")
            else float(np.sqrt(n_embd)) if arch.startswith("gemma") else 1.0,
        )),
        residual_scale=float(k(
            "{arch}.residual_scale",
            1.4 / float(np.sqrt(int(k(Keys.LLM.BLOCK_COUNT))))
            if arch in ("minicpm", "minicpm3") else 1.0,
        )),
        logit_scale=float(k(
            "{arch}.logit_scale",
            (256.0 / n_embd) if arch in ("minicpm", "minicpm3") and n_embd else 1.0,
        )),
        clamp_kqv=float(k("{arch}.attention.clamp_kqv", 0.0) or 0.0),
        par_residual=bool(k(Keys.LLM.USE_PARALLEL_RESIDUAL, False)),
        swin_norm=bool(k("{arch}.swin_norm", False)),
        qk_norm_post_rope=arch in ("maincoder", "hunyuan-dense", "hunyuan-moe"),
        no_rope_step=int(k(
            "{arch}.attention.no_rope_layer_step",
            4 if arch == "smollm3" else 0,
        )),
        pooling={0: "none", 1: "mean", 2: "cls", 3: "last", 4: "rank"}.get(
            int(k("{arch}.pooling_type",
                  1 if arch in ("bert", "nomic-bert", "jina-bert-v2",
                                "llama-embed") else 0)),
            "none",
        ),
        n_lora_q=int(k("{arch}.attention.q_lora_rank", 0) or 0),
        n_lora_kv=int(k("{arch}.attention.kv_lora_rank", 0) or 0),
        head_dim_kda=int(k("{arch}.kda.head_dim", 0) or 0),
        head_dim_k_mla=int(k("{arch}.attention.key_length_mla", 0) or 0),
        head_dim_v_mla=int(k("{arch}.attention.value_length_mla", 0) or 0),
        n_layer_dense_lead=int(k("{arch}.leading_dense_block_count", 0)),
        n_expert_shared=int(k("{arch}.expert_shared_count", 0)),
        # lfm2's shortconv state rides the ssm fields: conv width l_cache
        # over an n_embd-wide plane (LLM_KV_SHORTCONV_L_CACHE)
        ssm_d_conv=int(k("{arch}.ssm.conv_kernel",
                         k("{arch}.shortconv.l_cache", 0))),
        ssm_d_inner=int(k("{arch}.ssm.inner_size",
                          n_embd if k("{arch}.shortconv.l_cache") else 0)),
        ssm_d_state=int(k("{arch}.ssm.state_size",
                          k("{arch}.wkv.head_size", 0))),
        rescale_every=int(k("{arch}.rescale_every_n_layers", 0)),
        ssm_dt_rank=int(k("{arch}.ssm.time_step_rank", 0)),
        ssm_n_group=int(k("{arch}.ssm.group_count", 0)),
        ssm_dt_b_c_rms=bool(k("{arch}.ssm.dt_b_c_rms",
                              arch == "falcon-mamba")),
        swa_dense_first=arch in ("modern-bert", "smallthinker"),
        rope_finetuned=bool(k("{arch}.rope.scaling.finetuned", False)),
        nextn_layers=int(k("{arch}.nextn_predict_layers", 0)),
        n_norm_groups=int(k("{arch}.attention.group_norm_groups", 0)),
        norm_group_eps=float(k("{arch}.attention.group_norm_epsilon", 1e-6)),
        n_rel_buckets=int(k("{arch}.attention.relative_buckets_count", 0)),
        dec_n_layer=int(k("{arch}.decoder_block_count", 0)),
        dec_start_token=int(k("{arch}.decoder_start_token_id", -1)),
    )
