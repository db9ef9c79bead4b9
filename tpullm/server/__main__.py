"""tpullm-server entry point (≡ reference llama-server CLI)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-server")
    ap.add_argument("-m", "--model", action="append", default=None,
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
    ap.add_argument("--api-key", action="append", default=None,
                    help="require this bearer token on non-public endpoints "
                         "(repeatable; env TPULLM_API_KEY, ≡ --api-key)")
    ap.add_argument("--api-key-file", default=None,
                    help="file with one accepted API key per line")
    ap.add_argument("--slot-save-path", default=None,
                    help="directory for /slots/:id?action=save|restore files")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ways over the device mesh "
                         "(≡ --split-mode row over ICI)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel ways: serving slots shard over "
                         "replica groups")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline-parallel stages: layer-split serving "
                         "with a stage-resident KV cache (≡ --split-mode "
                         "layer; composes with --tp, excludes --dp)")
    ap.add_argument("--ep", type=int, default=1,
                    help="expert-parallel ways for MoE models: expert "
                         "stacks shard over a dedicated mesh axis "
                         "(composes with --tp/--dp, excludes --pp)")
    ap.add_argument("--kv-type", default=None, choices=["f16", "bf16", "f32", "q8_0"],
                    help="KV cache storage type (≡ -ctk/-ctv)")
    ap.add_argument("--draft-model", default=None,
                    help="draft model GGUF for in-scheduler speculative "
                         "decoding (≡ -md)")
    ap.add_argument("--draft-max", type=int, default=8,
                    help="max draft tokens per speculation step (≡ --draft-max)")
    ap.add_argument("--spec-type", default=None,
                    choices=["draft", "ngram_simple", "ngram_cache",
                             "ngram_mod", "ngram_map_k", "ngram_map_k4v"],
                    help="speculation strategy (default: draft if --draft-model "
                         "given, else off)")
    ap.add_argument("--cache-reuse", type=int, default=0,
                    help="min chunk size for mid-prompt cache reuse via "
                         "position shifting (≡ --cache-reuse)")
    ap.add_argument("--dist-coordinator", default=None,
                    help="multi-host: coordinator host:port for "
                         "jax.distributed (see docs/multihost.md)")
    ap.add_argument("--dist-nprocs", type=int, default=None,
                    help="multi-host: total process count")
    ap.add_argument("--dist-procid", type=int, default=None,
                    help="multi-host: this process's rank")
    from ..tools.download import add_hf_args, model_path_from_args

    add_hf_args(ap)
    args = ap.parse_args(argv)
    hf_path = model_path_from_args(args)
    if hf_path:
        args.model = (args.model or []) + [hf_path]
    if not args.model:
        ap.error("one of -m/--model or -hf/--hf-repo is required")
    import os as _os

    api_keys = list(args.api_key or [])
    if _os.environ.get("TPULLM_API_KEY"):
        api_keys.append(_os.environ["TPULLM_API_KEY"])
    if args.api_key_file:
        with open(args.api_key_file) as f:
            api_keys += [ln.strip() for ln in f if ln.strip()]

    from aiohttp import web

    from ..utils.platform import honor_jax_platforms

    honor_jax_platforms()

    if args.dist_coordinator is not None or args.dist_nprocs is not None:
        from ..parallel.distributed import init_distributed

        info = init_distributed(args.dist_coordinator, args.dist_nprocs,
                                args.dist_procid)
        print(f"tpullm-server joined process group: rank "
              f"{info['process_id']}/{info['num_processes']}, "
              f"{info['global_devices']} global devices", file=sys.stderr)

    mesh = None
    if args.pp > 1:
        if args.dp > 1 or args.ep > 1:
            ap.error("--pp shards slots as microbatches; it composes with "
                     "--tp but not --dp/--ep")
        import jax as _jax
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        n = args.pp * args.tp
        mesh = _Mesh(
            _np.asarray(_jax.devices()[:n]).reshape(args.pp, args.tp),
            ("pipe", "model"),
        )
    elif args.ep > 1:
        from ..parallel import make_mesh_ep

        mesh = make_mesh_ep(dp=args.dp, ep=args.ep, tp=args.tp)
    elif args.tp > 1 or args.dp > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(tp=args.tp, dp=args.dp)

    engine_kw = dict(n_slots=args.parallel, max_seq=args.ctx_size,
                     mode=args.mode, prefill_chunk=args.prefill_chunk,
                     mesh=mesh)
    if args.kv_type:
        engine_kw["kv_dtype"] = args.kv_type

    if len(args.model) > 1 or "=" in args.model[0]:
        from .router import make_router_app

        models = {}
        for spec in args.model:
            name, _, path = spec.partition("=")
            if not path:
                name, path = spec, spec
            models[name] = path
        router = make_router_app(models, max_loaded=args.max_loaded,
                                 api_keys=api_keys, **engine_kw)
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
        spec_type=args.spec_type,
        draft_model_path=args.draft_model,
        n_draft=args.draft_max,
        cache_reuse=args.cache_reuse,
        api_keys=api_keys,
        **engine_kw,
    )
    sched.precompile(background=True)
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
