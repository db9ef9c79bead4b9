"""tpullm-server entry point (≡ reference llama-server CLI)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-server")
    ap.add_argument("-m", "--model", required=True, action="append",
                    help="model path, or NAME=PATH (repeat for multi-model "
                         "routing, ≡ server-models router)")
    ap.add_argument("--max-loaded", type=int, default=1,
                    help="resident models before LRU eviction (router mode)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("-c", "--ctx-size", type=int, default=4096)
    ap.add_argument("-np", "--parallel", type=int, default=4, help="number of slots")
    ap.add_argument("--mode", choices=["auto", "quant", "dense"], default="auto")
    ap.add_argument("--prefill-chunk", type=int, default=512)
    ap.add_argument("--mmproj", default=None,
                    help="CLIP mmproj GGUF for vision requests")
    ap.add_argument("--slot-save-path", default=None,
                    help="directory for /slots/:id?action=save|restore files")
    args = ap.parse_args(argv)

    from aiohttp import web

    engine_kw = dict(n_slots=args.parallel, max_seq=args.ctx_size,
                     mode=args.mode, prefill_chunk=args.prefill_chunk)

    if len(args.model) > 1 or "=" in args.model[0]:
        from .router import make_router_app

        models = {}
        for spec in args.model:
            name, _, path = spec.partition("=")
            if not path:
                name, path = spec, spec
            models[name] = path
        router = make_router_app(models, max_loaded=args.max_loaded, **engine_kw)
        print(f"tpullm-server router on http://{args.host}:{args.port} "
              f"({len(models)} models)", file=sys.stderr)
        try:
            web.run_app(router.app, host=args.host, port=args.port, print=None)
        finally:
            router.shutdown()
        return 0

    from .api import make_app

    app, sched = make_app(
        args.model[0],
        slot_save_path=args.slot_save_path,
        mmproj_path=args.mmproj,
        **engine_kw,
    )
    print(f"tpullm-server listening on http://{args.host}:{args.port} "
          f"({sched.engine.hp.arch}, {sched.engine.n_slots} slots, "
          f"ctx {sched.engine.max_seq})", file=sys.stderr)
    try:
        web.run_app(app, host=args.host, port=args.port, print=None)
    finally:
        sched.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
