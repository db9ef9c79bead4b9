"""Architecture registry: GGUF `general.architecture` → (build_params, forward).

The growth pattern mirrors the reference's src/models/ directory (one build
function per family, llama-model.cpp build_graph dispatch); new archs register
with @register_arch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..gguf.reader import GGUFReader
from .hparams import HParams, hparams_from_gguf


@dataclass(frozen=True)
class ArchSpec:
    name: str
    build_params: Callable
    forward: Callable
    # recurrent-state models (SSM/linear attention): no KV cache, exact-length
    # prefills (≡ llama_memory_recurrent vs llama_kv_cache)
    recurrent: bool = False
    make_cache: Callable | None = None  # (hp, batch, max_len, dtype) -> cache
    # interleaved-SWA models whose forward understands the dual ring cache
    iswa: bool = False
    # encoder-decoder models (T5): `encode` fills the cache's cross K/V from
    # the prompt; the decoder then runs through the standard forward
    enc_dec: bool = False
    encode: Callable | None = None  # (hp, params, tokens, enc_len, cache) -> cache


_REGISTRY: dict[str, ArchSpec] = {}


def register_arch(name: str, build_params, forward, aliases: tuple[str, ...] = (),
                  recurrent: bool = False, make_cache=None, iswa: bool = False,
                  enc_dec: bool = False, encode=None):
    spec = ArchSpec(name, build_params, forward, recurrent, make_cache, iswa,
                    enc_dec, encode)
    _REGISTRY[name] = spec
    for a in aliases:
        _REGISTRY[a] = spec
    return spec


def get_arch(name: str) -> ArchSpec:
    _ensure_builtin()
    spec = _REGISTRY.get(name)
    if spec is None:
        raise NotImplementedError(
            f"architecture {name!r} not implemented (have: {sorted(set(s.name for s in _REGISTRY.values()))})"
        )
    return spec


def supported_archs() -> list[str]:
    _ensure_builtin()
    return sorted(_REGISTRY)


_BUILTIN_DONE = False


def _ensure_builtin():
    # lazy: model modules import runtime pieces, so registering at import
    # time would create a cycle
    global _BUILTIN_DONE
    if _BUILTIN_DONE:
        return
    _BUILTIN_DONE = True
    from . import llama, qwen_moe

    register_arch(
        "llama",
        llama.build_params,
        llama.forward,
        # same graph family: biases/qk-norm handled by optional tensors;
        # granite = llama graph + embedding/residual/attention/logit
        # multipliers (llm_build_granite), loaded via hparams;
        # internlm2/exaone are byte-identical llama graphs
        # (src/models/{internlm2,exaone}.cpp)
        # smollm3 = llama + NoPE every 4th layer; arcee = llama with a
        # gateless ReLU² FFN — both ride hparams/optional-tensor switches
        # xverse/ernie4_5 are byte-identical llama graphs
        # (src/models/{xverse,ernie4-5}.cpp); refact = llama graph minus rope
        # plus ALiBi (llm_build_refact, f_max_alibi_bias=8); baichuan = llama
        # graph with the 13B variant swapping rope for ALiBi
        # (llm_build_baichuan LLM_TYPE_13B branch) — both ride the
        # hp.max_alibi_bias switch in llama.forward
        # mistral3/pangu-embedded = llama graphs (± biases); seed_oss =
        # llama with post_attention_norm in the ffn-norm slot; maincoder/
        # hunyuan-dense = llama + post-rope qk norms + output bias
        # (hp.qk_norm_post_rope)
        aliases=("mistral", "qwen2", "qwen3", "granite", "internlm2",
                 "exaone", "smollm3", "arcee", "minicpm", "xverse",
                 "ernie4_5", "refact", "baichuan", "mistral3", "seed_oss",
                 "pangu-embedded", "maincoder", "hunyuan-dense",
                 # qwen-VL text stacks: for text-only positions the
                 # m-rope/interleaved-m-rope streams are all equal, so the
                 # rotation degenerates to standard neox rope (vision
                 # encoding rides mtmd separately)
                 # apertus = llama + per-head qk norms + gateless xIELU FFN
                 # (llm_build_apertus; hp.xielu drives the activation)
                 "llama-embed", "qwen2vl", "qwen3vl", "apertus"),
    )
    from . import grovemoe

    register_arch("grovemoe", grovemoe.build_params, grovemoe.forward)
    from . import afmoe

    register_arch("afmoe", afmoe.build_params, afmoe.forward)
    from . import mimo2

    register_arch("mimo2", mimo2.build_params, mimo2.forward)
    register_arch("step35", mimo2.build_params, mimo2.forward_step35)
    from . import cogvlm

    register_arch("cogvlm", cogvlm.build_params, cogvlm.forward)
    from . import kimi_linear

    register_arch(
        "kimi-linear",
        kimi_linear.build_params,
        kimi_linear.forward,
        recurrent=True,  # KDA layers carry conv tails + delta-rule state
        make_cache=lambda hp, batch, max_len, dtype: kimi_linear.make_cache(
            hp, batch, max_len, dtype
        ),
    )
    from . import falcon

    # codeshell = the gptneox sequential layout with neox partial rope
    # (llm_build_codeshell)
    register_arch("falcon", falcon.build_params, falcon.forward,
                  aliases=("gptneox", "codeshell"))
    from . import bloom

    # the ALiBi fused-qkv family (llm_build_{bloom,mpt,jais})
    register_arch("bloom", bloom.build_params, bloom.forward,
                  aliases=("mpt", "jais"))
    from . import chatglm

    register_arch("chatglm", chatglm.build_params, chatglm.forward,
                  aliases=("glm4",))
    from . import deci

    register_arch("deci", deci.build_params, deci.forward)
    from . import openelm

    register_arch("openelm", openelm.build_params, openelm.forward)
    from . import bitnet

    register_arch("bitnet", bitnet.build_params, bitnet.forward)
    from . import qwen

    # qwen v1 = llama graph with fused attn_qkv (llm_build_qwen); the fused
    # tensor is row-split at load and the llama forward is reused
    register_arch("qwen", qwen.build_params, llama.forward)
    register_arch(
        "qwen3moe",
        qwen_moe.build_params,
        qwen_moe.forward,
        # deepseek v1 = same graph + dense-lead layers + ungated shared
        # expert (llm_build_deepseek); granite-moe = renormalized routing +
        # granite multipliers (llm_build_granite MoE branch)
        # ernie4_5-moe: dense-lead + every-Nth MoE layers (tensor-presence
        # driven), exp_probs_b selection bias, renormalized routing, ungated
        # shared expert (llm_build_ernie4_5_moe)
        # dots1 (dense-lead + exp_probs_b + gguf gating), hunyuan-moe
        # (post-rope qk norms + ungated shexp), minimax-m2 (full-width qk
        # norms + exp_probs_b) all ride the same graph
        # bailingmoe = gguf-driven norm/scale + ungated shexp (NORM rope);
        # bailingmoe2 adds full-width qk norms, dense lead, exp_probs_b and
        # trailing NextN layers (hp.nextn_layers)
        # glm4-moe: post_attention_norm ffn-norm slot, dense lead,
        # exp_probs_b, gguf-driven norm/scale/gating, NextN layers
        # exaone-moe: per-head qk norms + dense lead + exp_probs_b +
        # ungated shexp (llm_build_exaone_moe)
        aliases=("qwen2moe", "deepseek", "granitemoe", "ernie4_5-moe",
                 "dots1", "hunyuan-moe", "minimax-m2", "bailingmoe",
                 "bailingmoe2", "glm4moe", "exaone-moe", "qwen3vlmoe"),
    )
    from . import gemma, gpt2

    register_arch(
        "gemma3",
        gemma.build_params,
        gemma.forward,
        aliases=("gemma2",),
        iswa=True,
    )
    # gemma v1: same graph minus post-norms/softcaps/SWA (llm_build_gemma —
    # sqrt(n_embd) embedding scale + GELU PAR FFN come through hparams and
    # tensor presence)
    register_arch("gemma", gemma.build_params, gemma.forward)
    from . import gemma3n

    register_arch("gemma3n", gemma3n.build_params, gemma3n.forward)
    # starcoder (v1) is the same wpe + fused-qkv + LN + seq-GELU graph
    # (llm_build_starcoder ≡ llm_build_gpt2 modulo tensor presence)
    register_arch("gpt2", gpt2.build_params, gpt2.forward,
                  aliases=("starcoder",))
    from . import phi3

    register_arch("phi3", phi3.build_params, llama.forward)
    # phimoe rides the phi3 graph with RMS+bias norms and a renormalized
    # softmax MoE FFN (llama-model.cpp LLM_ARCH_PHIMOE → llm_build_phi3)
    register_arch("phimoe", phi3.build_params_moe, phi3.forward_moe)
    from . import phi2

    register_arch("phi2", phi2.build_params, phi2.forward)
    from . import deepseek2

    # minicpm3 = the MLA graph + minicpm multipliers (llm_build_minicpm3);
    # plm = all-dense MLA with gateless ReLU² FFN (llm_build_plm)
    def _mla_cache(hp, batch, max_len, dtype):
        import jax.numpy as _j

        dt = _j.bfloat16 if isinstance(dtype, str) else dtype
        if deepseek2.mla_absorbed(hp):
            # absorbed path: cache the kv_lora_rank+rope latent, MQA-style
            # (≡ llama-kv-cache.cpp:138 MLA cache; ~71× less HBM than the
            # decompressed form for DeepSeek-V2). A string kv dtype (q8)
            # falls back to bf16 — the latent is already 71× smaller.
            from ..runtime.kvcache import MLACache

            return MLACache.new(hp.n_layer, batch, max_len, hp.n_lora_kv,
                                hp.rope.dims, dt)
        # decompressed oracle (TPULLM_MLA=0): converted deepseek2 GGUFs store
        # head_count_kv=1 (MQA form) but this branch caches full per-head
        # k/v at the MLA dims
        from ..runtime.kvcache import KVCache, make_cache as _mk

        if not hp.head_dim_k_mla:
            return _mk(hp, batch, max_len, dtype)
        return KVCache(
            _jnp.zeros((hp.n_layer, batch, hp.n_head, max_len,
                        hp.head_dim_k_mla), dt),
            _jnp.zeros((hp.n_layer, batch, hp.n_head, max_len,
                        hp.head_dim_v_mla), dt),
        )

    register_arch("deepseek2", deepseek2.build_params, deepseek2.forward,
                  aliases=("minicpm3", "plm"), make_cache=_mla_cache)
    from . import chameleon

    register_arch("chameleon", chameleon.build_params, chameleon.forward)
    from . import plamo

    register_arch("plamo", plamo.build_params, plamo.forward)
    register_arch(
        "plamo2",
        plamo.build_params2,
        plamo.forward2,
        recurrent=True,
        make_cache=lambda hp, batch, max_len, dtype: jamba.HybridCache.new(
            hp, batch, max_len, dtype
        ),
    )
    register_arch("plamo3", plamo.build_params3, plamo.forward3)
    from . import command_r, olmo2

    # exaone4 = the same post-norm skeleton with per-head qk norms and
    # iSWA rope-skip (llm_build_exaone4)
    register_arch("olmo2", olmo2.build_params, olmo2.forward,
                  aliases=("exaone4",))
    from . import olmoe

    register_arch("olmoe", olmoe.build_params, olmoe.forward)
    from . import olmo

    register_arch("olmo", olmo.build_params, olmo.forward)
    from . import stablelm

    register_arch("stablelm", stablelm.build_params, stablelm.forward)
    from . import gpt_oss

    register_arch("gpt-oss", gpt_oss.build_params, gpt_oss.forward)
    from . import grok

    register_arch("grok", grok.build_params, grok.forward)
    from . import arctic

    register_arch("arctic", arctic.build_params, arctic.forward)
    from . import smallthinker

    register_arch("smallthinker", smallthinker.build_params, smallthinker.forward)
    from . import llama4

    register_arch("llama4", llama4.build_params, llama4.forward)
    from . import lfm2

    register_arch(
        "lfm2",
        lfm2.build_params,
        lfm2.forward,
        aliases=("lfm2moe",),
        recurrent=True,  # shortconv tails carry state
        make_cache=lambda hp, batch, max_len, dtype: jamba.HybridCache.new(
            hp, batch, max_len, dtype
        ),
    )
    from . import dbrx

    register_arch("dbrx", dbrx.build_params, dbrx.forward)
    from . import starcoder2

    register_arch(
        "starcoder2",
        starcoder2.build_params,
        starcoder2.forward,
        # same LN+bias skeleton; nemotron swaps GELU→ReLU²; orion swaps the
        # sequential FFN for SiLU-gated swiglu (llm_build_orion)
        aliases=("nemotron", "orion"),
    )
    register_arch(
        "command-r",
        command_r.build_params,
        command_r.forward,
        aliases=("cohere2",),
    )
    from . import rwkv6

    register_arch(
        "rwkv6",
        rwkv6.build_params,
        rwkv6.forward,
        recurrent=True,
        make_cache=lambda hp, batch, max_len, dtype: rwkv6.Rwkv6Cache.new(hp, batch),
    )
    # rwkv6qwen2 (qrwkv): rwkv6 time-mix on a qwen2 swiglu body, gated
    # linear attention without the bonus term (llm_build_rwkv6qwen2)
    register_arch(
        "rwkv6qwen2",
        rwkv6.build_params_qwen2,
        rwkv6.forward_qwen2,
        recurrent=True,
        make_cache=lambda hp, batch, max_len, dtype: rwkv6.Rwkv6Cache.new(hp, batch),
    )
    from . import diffusion_lm

    import jax.numpy as _jnp2

    # diffusion denoisers: full-canvas bidirectional forwards, no KV cache
    # (llm_build_dream / llm_build_llada + examples/diffusion loop)
    register_arch(
        "dream",
        diffusion_lm.build_params,
        diffusion_lm.forward,
        aliases=("llada",),
        recurrent=True,  # exact-length canvases, no incremental state
        make_cache=lambda hp, batch, max_len, dtype: _jnp2.zeros(()),
    )
    # llada-moe = the same bidirectional denoiser over the qwen-moe tensor
    # set (llm_build_llada_moe)
    register_arch(
        "llada-moe",
        diffusion_lm.build_params_moe,
        diffusion_lm.forward,
        # rnd1 = qwen3moe converted to a diffusion model (llm_build_rnd1:
        # same bidirectional graph, renormalized softmax routing)
        aliases=("rnd1",),
        recurrent=True,
        make_cache=lambda hp, batch, max_len, dtype: _jnp2.zeros(()),
    )
    from . import wavtokenizer

    import jax.numpy as _jnp

    register_arch(
        "wavtokenizer-dec",
        wavtokenizer.build_params,
        wavtokenizer.forward,
        recurrent=True,  # convolutional: exact-length inputs, no KV cache
        make_cache=lambda hp, batch, max_len, dtype: _jnp.zeros(()),
    )
    from . import jamba

    register_arch(
        "jamba",
        jamba.build_params,
        jamba.forward,
        # nemotron-h = one block per layer (mamba2 | attn | relu² ffn);
        # granitehybrid = mamba2/attn mixers + granite multipliers
        # nemotron_h_moe = nemotron_h with sigmoid-routed gateless ReLU²
        # experts + gateless shexp in the FFN slots
        aliases=("nemotron_h", "granitehybrid", "nemotron_h_moe"),
        recurrent=True,  # exact-length prefills protect the carried state
        make_cache=lambda hp, batch, max_len, dtype: jamba.HybridCache.new(
            hp, batch, max_len, dtype
        ),
    )
    # falcon-h1: attention + mamba2 mixer run in PARALLEL on every layer
    register_arch(
        "falcon-h1",
        jamba.build_params,
        jamba.forward_falcon_h1,
        recurrent=True,
        make_cache=lambda hp, batch, max_len, dtype: jamba.HybridCache.new(
            hp, batch, max_len, dtype
        ),
    )
    from . import qwen3next

    register_arch(
        "qwen3next",
        qwen3next.build_params,
        qwen3next.forward,
        recurrent=True,  # gated DeltaNet layers carry state across steps
        make_cache=lambda hp, batch, max_len, dtype: jamba.HybridCache.new(
            hp, batch, max_len, dtype
        ),
    )
    from . import rwkv7

    register_arch(
        "rwkv7",
        rwkv7.build_params,
        rwkv7.forward,
        recurrent=True,
        make_cache=lambda hp, batch, max_len, dtype: rwkv6.Rwkv6Cache.new(hp, batch),
    )
    # arwkv7 = rwkv7 time-mix on a llama-style body (llm_build_arwkv7)
    register_arch(
        "arwkv7",
        rwkv7.build_params_arwkv,
        rwkv7.forward_arwkv,
        recurrent=True,
        make_cache=lambda hp, batch, max_len, dtype: rwkv6.Rwkv6Cache.new(hp, batch),
    )
    from . import mamba
    from ..runtime.recurrent import RecurrentCache

    register_arch(
        "mamba",
        mamba.build_params,
        mamba.forward,
        aliases=("falcon-mamba",),
        recurrent=True,
        make_cache=lambda hp, batch, max_len, dtype: RecurrentCache.new(hp, batch),
    )
    register_arch(
        "mamba2",
        mamba.build_params2,
        mamba.forward2,
        recurrent=True,
        make_cache=lambda hp, batch, max_len, dtype: RecurrentCache.new(hp, batch),
    )
    from . import t5

    register_arch(
        "t5",
        t5.build_params,
        t5.forward,
        enc_dec=True,
        encode=t5.encode_with_cross,
        make_cache=lambda hp, batch, max_len, dtype: t5.T5Cache.new(
            hp, batch, max_len, dtype
        ),
    )
    register_arch("t5encoder", t5.build_params, t5.encoder_forward,
                  make_cache=lambda hp, batch, max_len, dtype: t5.T5Cache.new(
                      hp, batch, max_len, dtype))
    from . import bert

    register_arch(
        "bert",
        bert.build_params,
        bert.forward,
        # nomic-bert-moe adds fused biased qkv + every-Nth GELU MoE;
        # jina-bert-v3 adds rope — all ride llm_build_bert's branches
        aliases=("nomic-bert", "jina-bert-v2", "nomic-bert-moe",
                 "jina-bert-v3"),
    )
    register_arch("neo-bert", bert.build_params_neo, bert.forward_neo)
    register_arch("modern-bert", bert.build_params_modern, bert.forward_modern)
    # EmbeddingGemma: gemma3 stack run bidirectionally (llm_build_gemma_embedding)
    register_arch("gemma-embedding", gemma.build_params, gemma.forward_embedding)


def load_hparams(r: GGUFReader) -> HParams:
    return hparams_from_gguf(r)
