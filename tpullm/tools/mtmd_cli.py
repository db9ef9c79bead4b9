"""tpullm-mtmd: multimodal CLI (≡ reference tools/mtmd/mtmd-cli.cpp)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-mtmd")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--mmproj", required=True, help="CLIP mmproj GGUF")
    ap.add_argument("--image", action="append", default=[])
    ap.add_argument("--audio", action="append", default=[],
                    help="16 kHz wav file(s), each consuming one media marker")
    ap.add_argument("-p", "--prompt", required=True,
                    help="prompt; use <__media__> per image (appended if absent)")
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.2)
    ap.add_argument("--mode", choices=["auto", "quant", "dense"], default="auto")
    args = ap.parse_args(argv)

    from ..mtmd import MEDIA_MARKER, ClipVision, generate_mtmd
    from ..runtime import Engine, Sampler, SamplerParams

    if not args.image and not args.audio:
        ap.error("need at least one --image or --audio")

    media = []
    if args.image:
        from PIL import Image

        media += [Image.open(p) for p in args.image]
    if args.audio:
        from ..mtmd.audio import load_wav

        media += [load_wav(p) for p in args.audio]

    prompt = args.prompt
    missing = len(media) - prompt.count(MEDIA_MARKER)
    if missing > 0:
        prompt = MEDIA_MARKER * missing + prompt

    engine = Engine(args.model, mode=args.mode, max_seq=args.ctx_size)
    reader_keys = __import__("tpullm.gguf", fromlist=["GGUFReader"]).GGUFReader(
        args.mmproj).metadata
    clip = audio_enc = None
    if reader_keys.get("clip.has_audio_encoder"):
        from ..mtmd import load_audio

        audio_enc = load_audio(args.mmproj)
    if reader_keys.get("clip.has_vision_encoder") or not audio_enc:
        clip = ClipVision(args.mmproj)
    sampler = Sampler(SamplerParams(temp=args.temp))
    out = generate_mtmd(engine, clip, prompt, media,
                        max_new_tokens=args.n_predict, sampler=sampler,
                        audio=audio_enc)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
