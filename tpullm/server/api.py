"""OpenAI-compatible HTTP server (≡ reference tools/server REST surface:
/v1/completions, /v1/chat/completions, /health, /metrics, /slots, /props,
/tokenize, /detokenize), on aiohttp over the continuous-batching scheduler."""

from __future__ import annotations

import os
import asyncio
import json
import time
import uuid

from aiohttp import web

from ..chat import apply_chat_template, extract_reasoning, parse_tool_calls
from ..runtime.sampling import SamplerParams
from .scheduler import GenRequest, Scheduler


def _sampling_from_body(body: dict) -> SamplerParams:
    bias = body.get("logit_bias") or {}
    if isinstance(bias, list):  # llama.cpp style [[id, bias], ...]
        bias = {int(t): float(b) for t, b in bias}
    else:
        bias = {int(t): float(b) for t, b in bias.items()}
    return SamplerParams(
        temp=float(body.get("temperature", 0.8)),
        top_k=int(body.get("top_k", 40)),
        top_p=float(body.get("top_p", 0.95)),
        min_p=float(body.get("min_p", 0.05)),
        typical_p=float(body.get("typical_p", 1.0)),
        seed=int(body.get("seed", 0xFFFFFFFF)),
        penalty_last_n=int(body.get("repeat_last_n", 64)),
        penalty_repeat=float(body.get("repeat_penalty", 1.0)),
        penalty_freq=float(body.get("frequency_penalty", 0.0)),
        penalty_present=float(body.get("presence_penalty", 0.0)),
        dry_multiplier=float(body.get("dry_multiplier", 0.0)),
        dry_base=float(body.get("dry_base", 1.75)),
        dry_allowed_length=int(body.get("dry_allowed_length", 2)),
        dry_penalty_last_n=int(body.get("dry_penalty_last_n", -1)),
        xtc_probability=float(body.get("xtc_probability", 0.0)),
        xtc_threshold=float(body.get("xtc_threshold", 0.1)),
        top_n_sigma=float(body.get("top_n_sigma", 0.0)),
        dynatemp_range=float(body.get("dynatemp_range", 0.0)),
        dynatemp_exponent=float(body.get("dynatemp_exponent", 1.0)),
        mirostat=int(body.get("mirostat", 0)),
        mirostat_tau=float(body.get("mirostat_tau", 5.0)),
        mirostat_eta=float(body.get("mirostat_eta", 0.1)),
        logit_bias=bias,
    )


def _grammar_from_body(body: dict) -> str | None:
    """Resolve grammar/json_schema/response_format params to GBNF text
    (≡ server's params_from_json_cmpl grammar handling)."""
    if body.get("grammar"):
        return str(body["grammar"])
    schema = body.get("json_schema")
    rf = body.get("response_format") or {}
    if not schema and isinstance(rf, dict):
        if rf.get("type") == "json_schema":
            schema = (rf.get("json_schema") or {}).get("schema", {})
        elif rf.get("type") == "json_object":
            schema = rf.get("schema", {})
    if schema is not None:
        from ..grammar import json_schema_to_gbnf

        return json_schema_to_gbnf(schema)
    return None


def _grammar_triggers_from_body(body: dict) -> list:
    """grammar_lazy + grammar_triggers request params (≡ the reference
    server's lazy grammar: triggers are [{type, value}] with type one of
    word/pattern/pattern_full/token; token values may be token ids)."""
    if not body.get("grammar_lazy") and not body.get("grammar_triggers"):
        return []
    out = []
    for trig in body.get("grammar_triggers") or []:
        if isinstance(trig, str):  # bare word shorthand
            out.append({"type": "word", "value": trig})
        elif isinstance(trig, dict):
            kind = trig.get("type", "word")
            if isinstance(kind, int):  # reference enum numbering
                kind = {0: "token", 1: "word", 2: "pattern",
                        3: "pattern_full"}.get(kind, "word")
            out.append({"type": kind, "value": trig.get("value", "")})
    return out


@web.middleware
async def _json_errors(request, handler):
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except (json.JSONDecodeError, ValueError, KeyError, TypeError) as e:
        return web.json_response(
            {"error": {"message": f"invalid request: {e}", "type": "invalid_request_error"}},
            status=400,
        )


# endpoints reachable without a key when --api-key is set (≡ the reference
# middleware_validate_api_key, tools/server/server-http.cpp:126-143)
_WEBUI_SW = """\
// tpullm webui service worker: offline app shell (network-first, cache
// fallback). Conversations/settings live in localStorage, so the whole UI
// works offline; only generation needs the server.
const CACHE = "tpullm-webui-v1";
const ASSETS = ["/", "/icon.svg", "/manifest.webmanifest"];
self.addEventListener("install", e => {
  e.waitUntil(caches.open(CACHE).then(c => c.addAll(ASSETS))
    .then(() => self.skipWaiting()));
});
self.addEventListener("activate", e => {
  e.waitUntil(self.clients.claim());
});
self.addEventListener("fetch", e => {
  const url = new URL(e.request.url);
  if (e.request.method !== "GET" || !ASSETS.includes(url.pathname)) return;
  e.respondWith(
    fetch(e.request).then(r => {
      const copy = r.clone();
      caches.open(CACHE).then(c => c.put(e.request, copy));
      return r;
    }).catch(() => caches.match(e.request))
  );
});
"""

_WEBUI_ICON = """\
<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 64 64">
<rect width="64" height="64" rx="14" fill="#11141a"/>
<rect x="10" y="14" width="44" height="28" rx="6" fill="none"
      stroke="#4f8cff" stroke-width="3"/>
<circle cx="22" cy="28" r="3.5" fill="#4f8cff"/>
<circle cx="42" cy="28" r="3.5" fill="#4f8cff"/>
<path d="M24 50h16" stroke="#4f8cff" stroke-width="3" stroke-linecap="round"/>
<path d="M32 42v8" stroke="#4f8cff" stroke-width="3" stroke-linecap="round"/>
</svg>
"""

_PUBLIC_ENDPOINTS = {"/health", "/v1/health", "/models", "/v1/models",
                     "/api/tags", "/", "/index.html",
                     "/manifest.webmanifest", "/sw.js", "/icon.svg"}


def _api_key_middleware(api_keys: list[str]):
    keys = set(api_keys)

    @web.middleware
    async def check(request, handler):
        if request.path in _PUBLIC_ENDPOINTS:
            return await handler(request)
        got = request.headers.get("Authorization", "")
        if not got:  # anthropic-style header
            got = request.headers.get("X-Api-Key", "")
        if got.startswith("Bearer "):
            got = got[len("Bearer "):]
        if got in keys:
            return await handler(request)
        return web.json_response(
            {"error": {"message": "Invalid API Key",
                       "type": "authentication_error", "code": 401}},
            status=401,
        )

    return check


class Server:
    def __init__(self, scheduler: Scheduler, model_name: str = "tpullm",
                 slot_save_path: str | None = None,
                 mmproj_path: str | None = None,
                 api_keys: list[str] | None = None):
        self.sched = scheduler
        self.model_name = model_name
        self.slot_save_path = slot_save_path
        self.api_keys = list(api_keys or [])
        self.t_start = time.time()
        self.clip = None
        self.audio_enc = None
        if mmproj_path:
            from ..gguf import GGUFReader

            md = GGUFReader(mmproj_path).metadata
            if md.get("clip.has_audio_encoder"):
                from ..mtmd import load_audio

                self.audio_enc = load_audio(mmproj_path)
            if md.get("clip.has_vision_encoder") or not self.audio_enc:
                from ..mtmd import load_vision

                self.clip = load_vision(mmproj_path)
        mw = [_json_errors]
        if self.api_keys:
            mw.insert(0, _api_key_middleware(self.api_keys))
        self.app = web.Application(middlewares=mw)
        r = self.app.router
        # webui (≡ tools/server/webui, served at / like the reference;
        # dependency-free single file instead of the Svelte bundle)
        r.add_get("/", self.webui)
        r.add_get("/index.html", self.webui)
        # PWA surface (≡ reference webui static/manifest.json + its vite-pwa
        # service worker): offline-installable without a build step
        r.add_get("/manifest.webmanifest", self.webui_manifest)
        r.add_get("/sw.js", self.webui_sw)
        r.add_get("/icon.svg", self.webui_icon)
        r.add_get("/health", self.health)
        r.add_get("/v1/health", self.health)  # llama.cpp alias
        r.add_get("/v1/models", self.models)
        r.add_get("/models", self.models)  # llama.cpp alias
        r.add_get("/api/tags", self.api_tags)  # ollama compat
        r.add_post("/api/show", self.api_show)  # ollama compat
        r.add_get("/props", self.props)
        r.add_get("/metrics", self.metrics)
        r.add_get("/slots", self.slots)
        r.add_post("/slots/{slot_id}", self.slot_action)
        r.add_post("/tokenize", self.tokenize)
        r.add_post("/detokenize", self.detokenize)
        r.add_post("/apply-template", self.apply_template)
        r.add_get("/lora-adapters", self.lora_adapters)
        r.add_post("/embedding", self.embeddings)  # llama.cpp alias
        r.add_post("/embeddings", self.embeddings)  # llama.cpp alias
        r.add_post("/v1/embeddings", self.embeddings)
        r.add_post("/rerank", self.rerank)  # llama.cpp alias
        r.add_post("/reranking", self.rerank)  # llama.cpp alias
        r.add_post("/v1/rerank", self.rerank)
        r.add_post("/v1/reranking", self.rerank)  # llama.cpp alias
        r.add_post("/infill", self.infill)
        r.add_post("/completion", self.completions)  # llama.cpp alias
        r.add_post("/completions", self.completions)  # llama.cpp alias
        r.add_post("/v1/completions", self.completions)
        r.add_post("/v1/chat/completions", self.chat_completions)
        r.add_post("/chat/completions", self.chat_completions)  # alias
        r.add_post("/v1/messages", self.anthropic_messages)
        r.add_post("/v1/messages/count_tokens", self.anthropic_count_tokens)
        r.add_post("/v1/responses", self.responses)

    # -- info endpoints ------------------------------------------------------------

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def models(self, request):
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "created": int(self.t_start), "owned_by": "tpullm"}],
        })

    async def webui(self, request):
        path = os.path.join(os.path.dirname(__file__), "webui", "index.html")
        return web.FileResponse(path,
                                headers={"Cache-Control": "no-cache"})

    async def webui_manifest(self, request):
        return web.json_response({
            "name": "tpullm", "short_name": "tpullm",
            "description": "tpullm server chat UI",
            "start_url": "/", "display": "standalone",
            "background_color": "#11141a", "theme_color": "#11141a",
            "icons": [{"src": "/icon.svg", "sizes": "any",
                       "type": "image/svg+xml", "purpose": "any"}],
        }, content_type="application/manifest+json")

    async def webui_sw(self, request):
        # network-first with cache fallback: UI updates land when online,
        # the app shell keeps working offline (conversations live in
        # localStorage so history survives too)
        return web.Response(text=_WEBUI_SW, content_type="text/javascript",
                            headers={"Cache-Control": "no-cache"})

    async def webui_icon(self, request):
        return web.Response(text=_WEBUI_ICON,
                            content_type="image/svg+xml")

    async def props(self, request):
        eng = self.sched.engine
        return web.json_response({
            "model": self.model_name,
            "n_ctx": eng.max_seq,
            "n_slots": eng.n_slots,
            "arch": eng.hp.arch,
            "n_vocab": eng.hp.n_vocab,
        })

    async def metrics(self, request):
        s = self.sched
        eng = s.engine
        busy = sum(1 for x in s.slots_info() if x["state"] != "idle")
        lines = [
            "# TYPE tpullm_requests_total counter",
            f"tpullm_requests_total {s.n_requests}",
            "# TYPE tpullm_tokens_generated_total counter",
            f"tpullm_tokens_generated_total {s.n_tokens_generated}",
            "# TYPE tpullm_prompt_tokens_total counter",
            f"tpullm_prompt_tokens_total {s.n_prompt_tokens}",
            "# TYPE tpullm_slots_busy gauge",
            f"tpullm_slots_busy {busy}",
            "# TYPE tpullm_slots_total gauge",
            f"tpullm_slots_total {eng.n_slots}",
            "# TYPE tpullm_prompt_tokens_reused_total counter",
            f"tpullm_prompt_tokens_reused_total {s.n_reused_tokens}",
            "# TYPE tpullm_context_shifts_total counter",
            f"tpullm_context_shifts_total {s.n_context_shifts}",
            "# TYPE tpullm_spec_tokens_drafted_total counter",
            f"tpullm_spec_tokens_drafted_total {s.n_spec_drafted}",
            "# TYPE tpullm_spec_tokens_accepted_total counter",
            f"tpullm_spec_tokens_accepted_total {s.n_spec_accepted}",
            "# TYPE tpullm_spec_accept_rate gauge",
            f"tpullm_spec_accept_rate "
            f"{s.n_spec_accepted / s.n_spec_drafted if s.n_spec_drafted else 0.0}",
        ]
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def slots(self, request):
        return web.json_response(self.sched.slots_info())

    async def slot_action(self, request):
        """POST /slots/:id?action=save|restore|erase (≡ server slot-save API;
        requires --slot-save-path for save/restore)."""
        import os

        slot_id = int(request.match_info["slot_id"])
        action = request.query.get("action", "")
        if slot_id < 0 or slot_id >= self.sched.engine.n_slots:
            return web.json_response({"error": {"message": "invalid slot"}}, status=400)
        if action == "erase":
            return web.json_response(self.sched.slot_erase(slot_id))
        if action not in ("save", "restore"):
            return web.json_response({"error": {"message": "unknown action"}}, status=400)
        if not self.slot_save_path:
            return web.json_response(
                {"error": {"message": "server started without --slot-save-path"}},
                status=400,
            )
        body = await request.json()
        fname = os.path.basename(str(body.get("filename", f"slot{slot_id}.npz")))
        path = os.path.join(self.slot_save_path, fname)
        loop = asyncio.get_event_loop()
        if action == "save":
            out = await loop.run_in_executor(None, self.sched.slot_save, slot_id, path)
        else:
            out = await loop.run_in_executor(None, self.sched.slot_restore, slot_id, path)
        return web.json_response(out)

    async def apply_template(self, request):
        """POST /apply-template: render the chat template without generating
        (≡ server handle_apply_template)."""
        body = await request.json()
        messages = body.get("messages", [])
        vocab = self.sched.engine.tokenizer.vocab
        prompt = apply_chat_template(
            vocab.chat_template, messages, add_generation_prompt=True
        )
        return web.json_response({"prompt": prompt})

    async def api_tags(self, request):
        """GET /api/tags: ollama-compatible model listing."""
        return web.json_response({"models": [{
            "name": self.model_name,
            "model": self.model_name,
            "modified_at": "",
            "size": 0,
            "details": {"family": "gguf", "format": "gguf"},
        }]})

    async def api_show(self, request):
        """POST /api/show: ollama-compatible model info."""
        hp = self.sched.engine.hp
        return web.json_response({
            "model_info": {
                "general.architecture": hp.arch,
                f"{hp.arch}.context_length": hp.n_ctx_train,
                f"{hp.arch}.embedding_length": hp.n_embd,
                f"{hp.arch}.block_count": hp.n_layer,
            },
            "capabilities": ["completion"],
        })

    async def lora_adapters(self, request):
        """GET /lora-adapters: adapters were folded at load (apply_lora) —
        report them with their scales (≡ server handle_lora_adapters_list)."""
        loras = getattr(self.sched.engine, "lora_info", []) or []
        return web.json_response([
            {"id": i, "path": p, "scale": s} for i, (p, s) in enumerate(loras)
        ])

    async def tokenize(self, request):
        body = await request.json()
        ids = self.sched.engine.tokenizer.tokenize(
            body.get("content", ""), add_special=bool(body.get("add_special", False)),
            parse_special=bool(body.get("parse_special", True)),
        )
        return web.json_response({"tokens": ids})

    async def detokenize(self, request):
        body = await request.json()
        text = self.sched.engine.tokenizer.detokenize(body.get("tokens", []))
        return web.json_response({"content": text})

    # -- embeddings ------------------------------------------------------------------

    async def embeddings(self, request):
        """OpenAI-compatible /v1/embeddings: input str or [str]."""
        body = await request.json()
        inputs = body.get("input", body.get("content", ""))
        if isinstance(inputs, str):
            inputs = [inputs]
        tok = self.sched.engine.tokenizer
        loop = asyncio.get_event_loop()
        data = []
        n_prompt_tokens = 0
        for i, text in enumerate(inputs):
            ids = tok.tokenize(str(text), add_special=True, parse_special=True)
            n_prompt_tokens += len(ids)
            vec = await loop.run_in_executor(None, self.sched.embed, ids)
            data.append({"object": "embedding", "index": i,
                         "embedding": [float(x) for x in vec]})
        return web.json_response({
            "object": "list", "model": self.model_name, "data": data,
            "usage": {"prompt_tokens": n_prompt_tokens,
                      "total_tokens": n_prompt_tokens},
        })

    async def rerank(self, request):
        """Rerank via embedding cosine similarity. NOTE: the reference uses
        rank-head (pooling=rank) models; this endpoint serves the same API
        shape with bi-encoder scoring until a rank head lands."""
        import numpy as _np

        body = await request.json()
        query = str(body.get("query", ""))
        docs = [str(d) for d in body.get("documents", [])]
        top_n = int(body.get("top_n", len(docs)))
        tok = self.sched.engine.tokenizer
        loop = asyncio.get_event_loop()

        async def emb(text):
            ids = tok.tokenize(text, add_special=True, parse_special=True)
            return await loop.run_in_executor(None, self.sched.embed, ids)

        qv = await emb(query)
        results = []
        for i, d in enumerate(docs):
            dv = await emb(d)
            results.append({"index": i,
                            "relevance_score": float(_np.dot(qv, dv))})
        results.sort(key=lambda r: -r["relevance_score"])
        return web.json_response({
            "model": self.model_name, "object": "list",
            "results": results[:top_n],
        })

    # -- generation ------------------------------------------------------------------

    async def infill(self, request):
        """Fill-in-the-middle completion (≡ server /infill): builds
        <fim_pre>prefix<fim_suf>suffix<fim_mid> from the model's FIM
        special tokens."""
        body = await request.json()
        tok = self.sched.engine.tokenizer
        sp = tok.vocab.special
        if sp.fim_pre < 0 or sp.fim_suf < 0 or sp.fim_mid < 0:
            return web.json_response(
                {"error": {"message": "model has no FIM tokens"}}, status=400)
        prefix = str(body.get("input_prefix", ""))
        suffix = str(body.get("input_suffix", ""))
        extra = str(body.get("prompt", ""))
        ids = [sp.fim_pre]
        ids += tok.tokenize(prefix + extra, add_special=False)
        ids += [sp.fim_suf]
        ids += tok.tokenize(suffix, add_special=False)
        ids += [sp.fim_mid]
        req = GenRequest(
            prompt_ids=ids,
            max_tokens=int(body.get("max_tokens", body.get("n_predict", 128))),
            sampling=_sampling_from_body(body),
            stop=body.get("stop") or [],
        )
        rid = f"infill-{uuid.uuid4().hex[:12]}"
        self.sched.submit(req)
        if body.get("stream"):
            return await self._stream(request, req, rid, chat=False)
        text, reason, stats = await self._collect(req)
        return web.json_response({
            "id": rid, "object": "text_completion", "created": int(time.time()),
            "model": self.model_name,
            "choices": [{"index": 0, "text": text, "finish_reason": reason}],
            "timings": stats,
        })

    async def completions(self, request):
        body = await request.json()
        prompt = body.get("prompt", "")
        if isinstance(prompt, list):
            prompt = prompt[0] if prompt else ""
        tok = self.sched.engine.tokenizer
        ids = tok.tokenize(prompt, add_special=True, parse_special=True)
        n_probs = int(body.get("n_probs", 0) or body.get("logprobs") or 0)
        req = GenRequest(
            prompt_ids=ids,
            max_tokens=int(body.get("max_tokens", body.get("n_predict", 128))),
            sampling=_sampling_from_body(body),
            stop=body.get("stop") or [],
            grammar=_grammar_from_body(body),
            grammar_triggers=_grammar_triggers_from_body(body),
            n_probs=n_probs,
        )
        rid = f"cmpl-{uuid.uuid4().hex[:12]}"
        self.sched.submit(req)
        if body.get("stream"):
            return await self._stream(request, req, rid, chat=False)
        text, reason, stats, probs = await self._collect_probs(req)
        choice = {"index": 0, "text": text, "finish_reason": reason}
        if n_probs:
            choice["logprobs"] = {
                "tokens": [p["token"] for p in probs],
                "token_logprobs": [p["logprob"] for p in probs],
                "top_logprobs": [
                    {t["token"]: t["logprob"] for t in p["top"]} for p in probs
                ],
            }
        return web.json_response({
            "id": rid, "object": "text_completion", "created": int(time.time()),
            "model": self.model_name,
            "choices": [choice],
            "usage": {
                "prompt_tokens": stats.get("prompt_n", len(ids)),
                "completion_tokens": stats.get("predicted_n", 0),
                "total_tokens": stats.get("prompt_n", 0) + stats.get("predicted_n", 0),
            },
            "timings": stats,
        })

    def _extract_images(self, messages: list) -> tuple[list, list]:
        """OpenAI vision content blocks → (text-only messages with
        <__media__> markers, decoded images). ≡ server's mtmd media chunks."""
        import base64
        import io

        from ..mtmd import MEDIA_MARKER

        images = []
        out = []
        for m in messages:
            content = m.get("content", "")
            if not isinstance(content, list):
                out.append(m)
                continue
            parts = []
            for block in content:
                btype = block.get("type")
                if btype == "text":
                    parts.append(block.get("text", ""))
                elif btype == "image_url":
                    url = block.get("image_url", {}).get("url", "")
                    if not url.startswith("data:"):
                        raise ValueError("only data: image URLs are supported")
                    b64 = url.split(",", 1)[1]
                    from PIL import Image

                    images.append(Image.open(io.BytesIO(base64.b64decode(b64))))
                    parts.append(MEDIA_MARKER)
                elif btype == "input_audio":
                    # OpenAI audio block: {"input_audio": {"data": b64 wav,
                    # "format": "wav"}}
                    import tempfile

                    blk = block.get("input_audio", {})
                    if blk.get("format", "wav") != "wav":
                        raise ValueError("only wav input_audio is supported")
                    from ..mtmd.audio import load_wav

                    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                        f.write(base64.b64decode(blk.get("data", "")))
                        f.flush()
                        images.append(load_wav(f.name))
                    parts.append(MEDIA_MARKER)
            out.append({**m, "content": "".join(parts)})
        return out, images

    async def chat_completions(self, request):
        body = await request.json()
        messages = body.get("messages", [])
        vocab = self.sched.engine.tokenizer.vocab
        messages, images = self._extract_images(messages)
        if images and self.clip is None and self.audio_enc is None:
            return web.json_response(
                {"error": {"message": "server started without --mmproj"}},
                status=400,
            )
        prompt = apply_chat_template(
            vocab.chat_template, messages, add_generation_prompt=True,
            tools=body.get("tools"),
        )
        tok = self.sched.engine.tokenizer
        ids = tok.tokenize(prompt, add_special=True, parse_special=True)
        prompt_embds = prompt_pos = prompt_ds = None
        if images:
            from ..mtmd.pipeline import build_multimodal_inputs

            prompt_embds, prompt_pos, prompt_ds = build_multimodal_inputs(
                self.sched.engine, self.clip, prompt, images,
                audio=self.audio_enc,
            )
        grammar = _grammar_from_body(body)
        triggers = _grammar_triggers_from_body(body)
        tool_choice = body.get("tool_choice")
        if grammar is None and body.get("tools") and tool_choice != "none":
            # constrain decoding to a valid tool call (≡ common/chat.cpp
            # grammar construction). tool_choice=required forces the grammar
            # from token 0; auto attaches it lazily so the model can answer
            # in prose until it opens a <tool_call> (≡ grammar_lazy +
            # "<tool_call>" trigger in the reference's hermes format)
            from ..chat import tool_call_grammar

            grammar = tool_call_grammar(body["tools"], tool_choice)
            if not (tool_choice == "required" or isinstance(tool_choice, dict)):
                triggers = [{"type": "word", "value": "<tool_call>"}]
        req = GenRequest(
            prompt_ids=ids,
            max_tokens=int(body.get("max_tokens", 128)),
            sampling=_sampling_from_body(body),
            stop=body.get("stop") or [],
            grammar=grammar,
            grammar_triggers=triggers,
            prompt_embds=prompt_embds,
            prompt_positions=prompt_pos,
            prompt_deepstack=prompt_ds,
        )
        rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
        self.sched.submit(req)
        if body.get("stream"):
            return await self._stream(request, req, rid, chat=True,
                                      tools=bool(body.get("tools")))
        text, reason, stats = await self._collect(req)
        # tool-call + reasoning extraction (≡ common/chat-parser)
        reasoning, text = extract_reasoning(text)
        tool_calls = []
        if body.get("tools"):
            text, tool_calls = parse_tool_calls(text)
        message = {"role": "assistant", "content": text or None}
        if reasoning is not None:
            message["reasoning_content"] = reasoning
        if tool_calls:
            message["tool_calls"] = tool_calls
            reason = "tool_calls"
        return web.json_response({
            "id": rid, "object": "chat.completion", "created": int(time.time()),
            "model": self.model_name,
            "choices": [{
                "index": 0,
                "message": message,
                "finish_reason": reason,
            }],
            "usage": {
                "prompt_tokens": stats.get("prompt_n", len(ids)),
                "completion_tokens": stats.get("predicted_n", 0),
                "total_tokens": stats.get("prompt_n", 0) + stats.get("predicted_n", 0),
            },
            "timings": stats,
        })

    # -- OpenAI responses API (≡ server convert_responses_to_chatcmpl +
    # to_json_oaicompat_resp) ------------------------------------------------------

    @staticmethod
    def _responses_to_messages(body: dict) -> list[dict]:
        if "input" not in body:
            raise ValueError("'input' is required")
        if body.get("previous_response_id"):
            raise ValueError("'previous_response_id' is not supported")
        messages: list[dict] = []
        if body.get("instructions"):
            messages.append({"role": "system", "content": body["instructions"]})
        inp = body["input"]
        if isinstance(inp, str):
            messages.append({"role": "user", "content": inp})
            return messages
        for item in inp:
            content = item.get("content", "")
            if isinstance(content, str):
                content = [{"type": "input_text", "text": content}]
            role = item.get("role", "user")
            if role == "assistant":
                text = "".join(b.get("text", "") for b in content
                               if b.get("type") in ("output_text", "input_text"))
                messages.append({"role": "assistant", "content": text})
                continue
            parts = []
            for b in content:
                btype = b.get("type")
                if btype == "input_text":
                    parts.append({"type": "text", "text": b.get("text", "")})
                elif btype == "input_image":
                    parts.append({"type": "image_url",
                                  "image_url": {"url": b.get("image_url", "")}})
                else:
                    raise ValueError(f"unsupported input item type {btype!r}")
            if len(parts) == 1 and parts[0]["type"] == "text":
                messages.append({"role": role, "content": parts[0]["text"]})
            else:
                messages.append({"role": role, "content": parts})
        return messages

    async def responses(self, request):
        body = await request.json()
        try:
            messages = self._responses_to_messages(body)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        for m in messages:  # normalize the developer role
            if m["role"] == "developer":
                m["role"] = "system"
        vocab = self.sched.engine.tokenizer.vocab
        messages, images = self._extract_images(messages)
        if images and self.clip is None and self.audio_enc is None:
            return web.json_response(
                {"error": {"message": "server started without --mmproj"}},
                status=400,
            )
        prompt = apply_chat_template(
            vocab.chat_template, messages, add_generation_prompt=True)
        tok = self.sched.engine.tokenizer
        ids = tok.tokenize(prompt, add_special=True, parse_special=True)
        prompt_embds = prompt_pos = prompt_ds = None
        if images:
            from ..mtmd.pipeline import build_multimodal_inputs

            prompt_embds, prompt_pos, prompt_ds = build_multimodal_inputs(
                self.sched.engine, self.clip, prompt, images,
                audio=self.audio_enc,
            )
        req = GenRequest(
            prompt_ids=ids,
            max_tokens=int(body.get("max_output_tokens",
                                    body.get("max_tokens", 128))),
            sampling=_sampling_from_body(body),
            stop=body.get("stop") or [],
            prompt_embds=prompt_embds,
            prompt_positions=prompt_pos,
            prompt_deepstack=prompt_ds,
        )
        rid = f"resp_{uuid.uuid4().hex[:16]}"
        self.sched.submit(req)
        if body.get("stream"):
            return await self._stream_responses(request, req, rid)
        text, reason, stats = await self._collect(req)
        reasoning, text = extract_reasoning(text)
        return web.json_response(
            self._responses_json(rid, text, reasoning, stats))

    def _responses_json(self, rid, text, reasoning, stats):
        output = []
        if reasoning:
            output.append({
                "id": f"rs_{uuid.uuid4().hex[:12]}",
                "summary": [], "type": "reasoning",
                "content": [{"text": reasoning, "type": "reasoning_text"}],
                "encrypted_content": "", "status": "completed",
            })
        output.append({
            "content": [{"type": "output_text", "annotations": [],
                         "logprobs": [], "text": text}],
            "id": f"msg_{uuid.uuid4().hex[:12]}",
            "role": "assistant", "status": "completed", "type": "message",
        })
        now = int(time.time())
        return {
            "id": rid, "object": "response", "created_at": now,
            "completed_at": now, "model": self.model_name,
            "status": "completed", "output": output,
            "usage": {
                "input_tokens": stats.get("prompt_n", 0),
                "output_tokens": stats.get("predicted_n", 0),
                "total_tokens": stats.get("prompt_n", 0)
                + stats.get("predicted_n", 0),
            },
        }

    async def _stream_responses(self, request, req: GenRequest, rid: str):
        """SSE stream: response.created → response.output_text.delta* →
        response.completed."""
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)

        async def emit(event, data):
            await resp.write(
                f"event: {event}\ndata: {json.dumps(data)}\n\n".encode())

        await emit("response.created",
                   {"type": "response.created",
                    "response": {"id": rid, "object": "response",
                                 "status": "in_progress"}})
        loop = asyncio.get_event_loop()
        parts = []
        stats = {}
        while True:
            ev = await loop.run_in_executor(None, req.out.get)
            if ev[0] == "token":
                parts.append(ev[2])
                await emit("response.output_text.delta",
                           {"type": "response.output_text.delta",
                            "item_id": rid, "delta": ev[2]})
            else:
                stats = ev[2]
                break
        text = "".join(parts)
        reasoning, text = extract_reasoning(text)
        await emit("response.completed",
                   {"type": "response.completed",
                    "response": self._responses_json(rid, text, reasoning,
                                                     stats)})
        await resp.write_eof()
        return resp

    # -- anthropic-compatible messages API (≡ server's /v1/messages route) ---------

    def _anthropic_to_messages(self, body: dict) -> list[dict]:
        messages = []
        sys_prompt = body.get("system")
        if sys_prompt:
            if isinstance(sys_prompt, list):  # content-block form
                sys_prompt = "".join(b.get("text", "") for b in sys_prompt)
            messages.append({"role": "system", "content": sys_prompt})
        for m in body.get("messages", []):
            content = m.get("content", "")
            if isinstance(content, list):
                content = "".join(
                    b.get("text", "") for b in content if b.get("type") == "text"
                )
            messages.append({"role": m["role"], "content": content})
        return messages

    async def anthropic_messages(self, request):
        body = await request.json()
        messages = self._anthropic_to_messages(body)
        vocab = self.sched.engine.tokenizer.vocab
        prompt = apply_chat_template(vocab.chat_template, messages,
                                     add_generation_prompt=True)
        tok = self.sched.engine.tokenizer
        ids = tok.tokenize(prompt, add_special=True, parse_special=True)
        sampling = _sampling_from_body(body)
        if "max_tokens" not in body:
            return web.json_response(
                {"type": "error",
                 "error": {"type": "invalid_request_error",
                           "message": "max_tokens is required"}}, status=400)
        req = GenRequest(
            prompt_ids=ids,
            max_tokens=int(body["max_tokens"]),
            sampling=sampling,
            stop=body.get("stop_sequences") or [],
        )
        self.sched.submit(req)
        text, reason, stats = await self._collect(req)
        stop_reason = {"stop": "end_turn", "length": "max_tokens"}.get(reason, reason)
        if reason == "stop" and stats.get("stopping_word"):
            stop_reason = "stop_sequence"
        return web.json_response({
            "id": f"msg_{uuid.uuid4().hex[:16]}",
            "type": "message",
            "role": "assistant",
            "model": self.model_name,
            "content": [{"type": "text", "text": text}],
            "stop_reason": stop_reason,
            "stop_sequence": None,
            "usage": {"input_tokens": stats.get("prompt_n", len(ids)),
                      "output_tokens": stats.get("predicted_n", 0)},
        })

    async def anthropic_count_tokens(self, request):
        body = await request.json()
        messages = self._anthropic_to_messages(body)
        vocab = self.sched.engine.tokenizer.vocab
        prompt = apply_chat_template(vocab.chat_template, messages,
                                     add_generation_prompt=True)
        ids = self.sched.engine.tokenizer.tokenize(prompt, add_special=True,
                                                   parse_special=True)
        return web.json_response({"input_tokens": len(ids)})

    async def _collect(self, req: GenRequest):
        text, reason, stats, _ = await self._collect_probs(req)
        return text, reason, stats

    async def _collect_probs(self, req: GenRequest):
        loop = asyncio.get_event_loop()
        pieces, probs = [], []
        while True:
            ev = await loop.run_in_executor(None, req.out.get)
            if ev[0] == "token":
                pieces.append(ev[2])
                if len(ev) > 3:
                    probs.append({"token": ev[2], **ev[3]})
            else:
                return "".join(pieces), ev[1], ev[2], probs

    async def _stream(self, request, req: GenRequest, rid: str, chat: bool,
                      tools: bool = False):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)
        loop = asyncio.get_event_loop()
        obj = "chat.completion.chunk" if chat else "text_completion"
        # tool-call argument streaming (≡ common/chat-parser incremental
        # parsing): content vs tool_calls deltas split as tokens arrive
        parser = None
        if chat and tools:
            from ..chat import StreamingToolCallParser

            parser = StreamingToolCallParser()

        async def emit(delta_obj):
            delta_obj.update({"id": rid, "object": obj, "model": self.model_name})
            await resp.write(f"data: {json.dumps(delta_obj)}\n\n".encode())

        async def emit_events(events):
            for kind, *rest in events:
                if kind == "content":
                    d = {"content": rest[0]}
                elif kind == "tool_start":
                    idx, name = rest
                    d = {"tool_calls": [{"index": idx, "id": f"call_{idx}",
                                         "type": "function",
                                         "function": {"name": name,
                                                      "arguments": ""}}]}
                else:  # tool_args
                    idx, args_delta = rest
                    d = {"tool_calls": [{"index": idx,
                                         "function": {"arguments": args_delta}}]}
                await emit({"choices": [{"index": 0, "delta": d,
                                         "finish_reason": None}]})

        while True:
            ev = await loop.run_in_executor(None, req.out.get)
            if ev[0] == "token":
                if parser is not None:
                    await emit_events(parser.feed(ev[2]))
                elif chat:
                    await emit({"choices": [{"index": 0,
                                             "delta": {"content": ev[2]},
                                             "finish_reason": None}]})
                else:
                    await emit({"choices": [{"index": 0, "text": ev[2],
                                             "finish_reason": None}]})
            else:
                reason = ev[1]
                if parser is not None:
                    await emit_events(parser.flush())
                    if parser.saw_tool_call:
                        reason = "tool_calls"
                final = {"id": rid, "object": obj, "model": self.model_name,
                         "choices": [{"index": 0, "finish_reason": reason,
                                      **({"delta": {}} if chat else {"text": ""})}],
                         "timings": ev[2]}
                await resp.write(f"data: {json.dumps(final)}\n\n".encode())
                await resp.write(b"data: [DONE]\n\n")
                break
        await resp.write_eof()
        return resp


def make_app(model_path, slot_save_path: str | None = None,
             mmproj_path: str | None = None,
             spec_type: str | None = None, draft_model_path=None,
             n_draft: int = 8, cache_reuse: int = 0,
             api_keys: list[str] | None = None,
             **engine_kw) -> tuple[web.Application, Scheduler]:
    from ..runtime.batch_engine import BatchEngine

    engine = BatchEngine(model_path, **engine_kw)
    draft_engine = None
    if draft_model_path is not None:
        # the draft model shares slot layout with the target so one batched
        # draft step serves every speculating slot (≡ server -md)
        draft_engine = BatchEngine(draft_model_path, **engine_kw)
    sched = Scheduler(engine, spec_type=spec_type, draft_engine=draft_engine,
                      n_draft=n_draft, cache_reuse=cache_reuse)
    sched.start()
    server = Server(sched, slot_save_path=slot_save_path,
                    mmproj_path=mmproj_path, api_keys=api_keys)
    return server.app, sched
