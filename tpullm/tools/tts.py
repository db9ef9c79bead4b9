"""OuteTTS text-to-speech CLI (≡ tools/tts/tts.cpp).

Two-model pipeline: an OuteTTS voice LLM turns the text prompt into
WavTokenizer audio codes (special tokens 151672..155772), then the
wavtokenizer-dec vocoder (tpullm/models/wavtokenizer.py) renders the codes
to a 24 kHz mono waveform written as WAV.

  tpullm-tts -m voice.gguf -mv wavtokenizer.gguf -p "Hello world" -o out.wav
"""

from __future__ import annotations

import argparse
import re
import struct
import sys
import wave

import numpy as np

CODE_TOKEN_MIN = 151672  # tts.cpp:1002 — audio-code token id range
CODE_TOKEN_MAX = 155772
SAMPLE_RATE = 24000


def process_text(text: str, version: str = "0.2") -> str:
    """≡ tts.cpp process_text: lowercase, strip punctuation, collapse
    whitespace (number expansion is left to the caller's prompt)."""
    text = text.lower()
    text = re.sub(r"[-_/,\.\\]", " ", text)
    text = re.sub(r"[^a-z\s]", "", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text


def build_prompt(text: str, version: str = "0.2") -> str:
    """OuteTTS v0.2/v0.3 prompt shape (tts.cpp audio_text/main prompt)."""
    sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
    words = process_text(text, version).split()
    body = sep.join(words) + sep if words else ""
    return "<|im_start|>\n<|text_start|>" + body + "<|text_end|>\n<|audio_start|>\n"


def codes_from_tokens(tokens: list[int]) -> list[int]:
    """Keep audio-code tokens and rebase them to vocoder codes
    (tts.cpp:1002-1012)."""
    return [t - CODE_TOKEN_MIN for t in tokens
            if CODE_TOKEN_MIN <= t <= CODE_TOKEN_MAX]


def decode_codes(vocoder_path: str, codes: list[int]) -> np.ndarray:
    """Run the wavtokenizer-dec vocoder over audio codes → waveform."""
    import jax
    import jax.numpy as jnp

    from ..gguf.reader import GGUFReader
    from ..models.registry import get_arch, load_hparams
    from ..models.wavtokenizer import embd_to_audio

    reader = GGUFReader(vocoder_path)
    hp = load_hparams(reader)
    spec = get_arch(hp.arch)
    params = spec.build_params(reader, hp)
    toks = jnp.asarray(np.asarray(codes, np.int32)[None])
    pos = jnp.zeros_like(toks)
    embd, _ = jax.jit(
        lambda p, t, q: spec.forward(hp, p, t, q, jnp.zeros(()), 0)
    )(params, toks, pos)
    return embd_to_audio(np.asarray(embd[0]))


def write_wav(path: str, audio: np.ndarray, sample_rate: int = SAMPLE_RATE):
    pcm = np.clip(audio, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(struct.pack(f"<{len(pcm16)}h", *pcm16))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-tts", description=__doc__)
    ap.add_argument("-m", "--model", required=True, help="OuteTTS voice LLM GGUF")
    ap.add_argument("-mv", "--model-vocoder", required=True,
                    help="WavTokenizer decoder GGUF")
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("-n", "--max-tokens", type=int, default=768)
    ap.add_argument("--tts-version", default="0.2", choices=["0.2", "0.3"])
    ap.add_argument("--temp", type=float, default=0.4)
    ap.add_argument("--top-k", type=int, default=40)
    args = ap.parse_args(argv)

    from ..runtime.engine import Engine
    from ..runtime.sampling import Sampler, SamplerParams

    eng = Engine(args.model)
    prompt = build_prompt(args.prompt, args.tts_version)
    ids = eng.tokenizer.tokenize(prompt, add_special=True)
    sampler = Sampler(SamplerParams(temp=args.temp, top_k=args.top_k))
    generated = list(eng.generate_tokens(ids, max_new_tokens=args.max_tokens,
                                         sampler=sampler))
    codes = codes_from_tokens(generated)
    if not codes:
        print("no audio codes generated", file=sys.stderr)
        return 1
    print(f"generated {len(codes)} audio codes", file=sys.stderr)
    audio = decode_codes(args.model_vocoder, codes)
    write_wav(args.output, audio)
    print(f"wrote {args.output}: {len(audio)} samples "
          f"({len(audio)/SAMPLE_RATE:.2f}s @ {SAMPLE_RATE} Hz)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
