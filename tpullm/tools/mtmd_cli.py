"""tpullm-mtmd: multimodal CLI (≡ reference tools/mtmd/mtmd-cli.cpp)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-mtmd")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--mmproj", required=True, help="CLIP mmproj GGUF")
    ap.add_argument("--image", action="append", default=[], required=True)
    ap.add_argument("-p", "--prompt", required=True,
                    help="prompt; use <__media__> per image (appended if absent)")
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.2)
    ap.add_argument("--mode", choices=["auto", "quant", "dense"], default="auto")
    args = ap.parse_args(argv)

    from ..mtmd import MEDIA_MARKER, ClipVision, generate_mtmd
    from ..runtime import Engine, Sampler, SamplerParams

    prompt = args.prompt
    missing = len(args.image) - prompt.count(MEDIA_MARKER)
    if missing > 0:
        prompt = MEDIA_MARKER * missing + prompt

    from PIL import Image

    images = [Image.open(p) for p in args.image]
    engine = Engine(args.model, mode=args.mode, max_seq=args.ctx_size)
    clip = ClipVision(args.mmproj)
    sampler = Sampler(SamplerParams(temp=args.temp))
    out = generate_mtmd(engine, clip, prompt, images,
                        max_new_tokens=args.n_predict, sampler=sampler)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
