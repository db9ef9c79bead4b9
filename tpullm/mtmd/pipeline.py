"""Media-chunk pipeline: text with <__media__> markers + images → one
embedding sequence fed through Engine.prefill_embeddings.

Reference: tools/mtmd/mtmd.h (mtmd_tokenize splits the prompt on the media
marker into text/image chunks; mtmd_helper_eval feeds them through
llama_batch with embd entries for image chunks)."""

from __future__ import annotations

import numpy as np

MEDIA_MARKER = "<__media__>"


def build_multimodal_embeddings(engine, clip, text: str, images: list,
                                audio=None) -> np.ndarray:
    """[n, n_embd] input-embedding sequence: token embeddings for text
    segments interleaved with projected media embeddings.

    Media items are PIL images / HWC arrays (routed through `clip`) or 1-D
    f32 sample arrays at 16 kHz (routed through `audio`, a
    WhisperAudioEncoder) — ≡ mtmd.cpp image/audio chunk dispatch."""
    segments = text.split(MEDIA_MARKER)
    if len(segments) - 1 != len(images):
        raise ValueError(
            f"prompt has {len(segments) - 1} {MEDIA_MARKER} markers but "
            f"{len(images)} media items were given"
        )
    tok_embd = np.asarray(engine.params["tok_embd"], dtype=np.float32)
    parts: list[np.ndarray] = []
    for i, seg in enumerate(segments):
        add_special = i == 0  # BOS only at the very start
        if seg:
            ids = engine.tokenizer.tokenize(seg, add_special=add_special,
                                            parse_special=True)
            parts.append(tok_embd[np.asarray(ids, np.int64)])
        elif add_special and engine.tokenizer.vocab.add_bos:
            parts.append(tok_embd[[engine.tokenizer.vocab.special.bos]])
        if i < len(images):
            item = images[i]
            if isinstance(item, np.ndarray) and item.ndim == 1:
                if audio is None:
                    raise ValueError("audio media given but no audio encoder")
                emb = audio.encode_audio(item)
            else:
                emb = clip.encode_image(item)
            parts.append(np.asarray(emb, np.float32))
    return np.concatenate(parts, axis=0)


def generate_mtmd(engine, clip, text: str, images: list,
                  max_new_tokens: int = 128, sampler=None,
                  stop_on_eog: bool = True, audio=None) -> str:
    """Prefill the multimodal sequence, then decode as usual
    (≡ mtmd-cli.cpp flow)."""
    from ..runtime.sampling import Sampler, SamplerParams

    sampler = sampler or Sampler(SamplerParams(temp=0.0))
    embds = build_multimodal_embeddings(engine, clip, text, images, audio=audio)
    logits = engine.prefill_embeddings(embds)
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
