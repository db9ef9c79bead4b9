"""Media-chunk pipeline: text with <__media__> markers + images → one
embedding sequence fed through Engine.prefill_embeddings.

Reference: tools/mtmd/mtmd.h (mtmd_tokenize splits the prompt on the media
marker into text/image chunks; mtmd_helper_eval feeds them through
llama_batch with embd entries for image chunks, and 4-D M-RoPE positions
for qwen-VL grids — mtmd-helper.cpp set_position_mrope_2d)."""

from __future__ import annotations

import inspect

import numpy as np

MEDIA_MARKER = "<__media__>"


def _encode_media(engine, clip, audio, item):
    """→ (embeddings [n, *], llm grid (gh, gw) | None)."""
    if isinstance(item, np.ndarray) and item.ndim == 1:
        if audio is None:
            raise ValueError("audio media given but no audio encoder")
        return np.asarray(audio.encode_audio(item), np.float32), None
    emb = np.asarray(clip.encode_image(item), np.float32)
    return emb, getattr(clip, "last_grid", None)


def build_multimodal_inputs(engine, clip, text: str, images: list,
                            audio=None):
    """→ (embeds [n, E], positions [4, n] | None, deepstack [k, n, E] | None).

    Token embeddings for text segments interleaved with projected media
    embeddings (≡ mtmd.cpp chunk dispatch). For M-RoPE text stacks
    (hp.rope.sections — qwen2vl/qwen3vl) the position streams follow
    get_rope_index: text runs advance all streams together; an image grid
    (gh, gw) pins t = st and sweeps h/w by row/column, after which the
    counter jumps by max(gh, gw). Towers that emit deepstack features
    (qwen3vl, output dim E·(1+k)) are split into the main embedding plus
    per-layer residuals, zero at text positions."""
    segments = text.split(MEDIA_MARKER)
    if len(segments) - 1 != len(images):
        raise ValueError(
            f"prompt has {len(segments) - 1} {MEDIA_MARKER} markers but "
            f"{len(images)} media items were given"
        )
    tok_embd = np.asarray(engine.params["tok_embd"], dtype=np.float32)
    E = tok_embd.shape[1]
    use_mrope = bool(engine.hp.rope.sections) and "deepstack" in (
        inspect.signature(engine.arch.forward).parameters)
    parts: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []  # [4, L] chunks
    ds_parts: list[tuple[int, np.ndarray | None]] = []  # (length, [L,k,E])
    st = 0

    def text_pos(L):
        nonlocal st
        run = np.arange(st, st + L, dtype=np.int32)
        st += L
        return np.broadcast_to(run, (4, L)).copy()

    for i, seg in enumerate(segments):
        add_special = i == 0  # BOS only at the very start
        if seg:
            ids = engine.tokenizer.tokenize(seg, add_special=add_special,
                                            parse_special=True)
            parts.append(tok_embd[np.asarray(ids, np.int64)])
            pos_parts.append(text_pos(len(ids)))
            ds_parts.append((len(ids), None))
        elif add_special and engine.tokenizer.vocab.add_bos:
            parts.append(tok_embd[[engine.tokenizer.vocab.special.bos]])
            pos_parts.append(text_pos(1))
            ds_parts.append((1, None))
        if i < len(images):
            emb, grid = _encode_media(engine, clip, audio, images[i])
            ds = None
            if emb.shape[1] > E and emb.shape[1] % E == 0:
                k = emb.shape[1] // E - 1
                ds = emb[:, E:].reshape(emb.shape[0], k, E)
                emb = emb[:, :E]
            parts.append(emb)
            ds_parts.append((emb.shape[0], ds))
            if grid is not None and grid[0] * grid[1] == emb.shape[0]:
                gh, gw = grid
                g = np.arange(gh * gw, dtype=np.int32)
                pos_parts.append(np.stack([
                    np.full(gh * gw, st, np.int32),  # t
                    st + g // gw,                    # h
                    st + g % gw,                     # w
                    np.full(gh * gw, st, np.int32),  # extra (unused)
                ]))
                st += int(max(gh, gw))
            else:  # unknown grid (plain CLIP towers, audio): text-like run
                pos_parts.append(text_pos(emb.shape[0]))

    embds = np.concatenate(parts, axis=0)
    n = embds.shape[0]
    positions = np.concatenate(pos_parts, axis=1) if use_mrope else None
    n_ds = max((d.shape[1] for _, d in ds_parts if d is not None), default=0)
    deepstack = None
    if n_ds:
        deepstack = np.zeros((n_ds, n, E), np.float32)
        off = 0
        for length, d in ds_parts:
            if d is not None:
                deepstack[:, off:off + length] = d.transpose(1, 0, 2)
            off += length
    return embds, positions, deepstack


def build_multimodal_embeddings(engine, clip, text: str, images: list,
                                audio=None) -> np.ndarray:
    """[n, n_embd] input-embedding sequence (legacy single-array view of
    build_multimodal_inputs — positions/deepstack dropped)."""
    return build_multimodal_inputs(engine, clip, text, images, audio=audio)[0]


def generate_mtmd(engine, clip, text: str, images: list,
                  max_new_tokens: int = 128, sampler=None,
                  stop_on_eog: bool = True, audio=None) -> str:
    """Prefill the multimodal sequence, then decode as usual
    (≡ mtmd-cli.cpp flow; decode rope positions continue from the M-RoPE
    counter, which trails the cache slot count after image grids)."""
    from ..runtime.sampling import Sampler, SamplerParams

    sampler = sampler or Sampler(SamplerParams(temp=0.0))
    embds, positions, deepstack = build_multimodal_inputs(
        engine, clip, text, images, audio=audio)
    if positions is not None:
        # continuation: streams restart at 0 per build; shift them to the
        # engine's current rope counter (n_past + delta)
        positions = positions + engine.n_past + engine.rope_pos_delta
    logits = engine.prefill_embeddings(embds, positions=positions,
                                       deepstack=deepstack)
    if positions is not None:
        engine.rope_pos_delta = int(positions[:, -1].max()) + 1 - engine.n_past
    vocab = engine.tokenizer.vocab
    out: list[int] = []
    for _ in range(max_new_tokens):
        token = sampler.sample(logits)
        sampler.accept(token)
        if stop_on_eog and vocab.is_eog(token):
            break
        out.append(token)
        if engine.n_past >= engine.max_seq:
            break
        logits = engine.decode_step(token)
    return engine.tokenizer.detokenize(out)
