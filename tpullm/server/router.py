"""Multi-model router (≡ reference tools/server server-models.cpp: the
/models registry that spawns/proxies per-model servers and switches on the
request's "model" field).

In-process variant: each model gets its own BatchEngine+Scheduler+Server,
created lazily on first use; `max_loaded` bounds resident models (LRU
eviction frees the previous engine's HBM before the next loads — the single
chip analog of the reference killing idle children).
"""

from __future__ import annotations

import time

from aiohttp import web

from .api import Server, _json_errors
from .scheduler import Scheduler


class ModelEntry:
    def __init__(self, name: str, path: str, engine_kw: dict):
        self.name = name
        self.path = path
        self.engine_kw = engine_kw
        self.server: Server | None = None
        self.sched: Scheduler | None = None
        self.last_used = 0.0

    @property
    def loaded(self) -> bool:
        return self.server is not None


class Router:
    def __init__(self, models: dict[str, str], max_loaded: int = 1,
                 api_keys: list[str] | None = None, **engine_kw):
        self.api_keys = list(api_keys or [])
        self.entries = {
            name: ModelEntry(name, path, engine_kw)
            for name, path in models.items()
        }
        if not self.entries:
            raise ValueError("router needs at least one model")
        self.default = next(iter(self.entries))
        self.max_loaded = max_loaded

        mw = [_json_errors]
        if self.api_keys:
            from .api import _api_key_middleware

            mw.insert(0, _api_key_middleware(self.api_keys))
        self.app = web.Application(middlewares=mw)
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/v1/models", self.models)
        r.add_get("/models", self.models)
        r.add_post("/models/{name}/load", self.load_model)
        r.add_post("/models/{name}/unload", self.unload_model)
        for route in ("/v1/completions", "/completion", "/v1/chat/completions",
                      "/v1/embeddings", "/embedding", "/v1/rerank", "/rerank",
                      "/v1/messages", "/v1/messages/count_tokens",
                      "/tokenize", "/detokenize"):
            r.add_post(route, self.proxy)

    # -- lifecycle ----------------------------------------------------------------

    def _ensure_loaded(self, name: str) -> ModelEntry:
        entry = self.entries.get(name) or self.entries[self.default]
        if not entry.loaded:
            self._evict_for(entry)
            from ..runtime.batch_engine import BatchEngine

            engine = BatchEngine(entry.path, **entry.engine_kw)
            entry.sched = Scheduler(engine)
            entry.sched.start()
            entry.server = Server(entry.sched, model_name=entry.name)
        entry.last_used = time.time()
        return entry

    def _evict_for(self, incoming: ModelEntry):
        loaded = [e for e in self.entries.values() if e.loaded]
        while len(loaded) >= self.max_loaded:
            victim = min(loaded, key=lambda e: e.last_used)
            self._unload(victim)
            loaded.remove(victim)

    def _unload(self, entry: ModelEntry):
        if entry.sched:
            entry.sched.stop()
        entry.sched = None
        entry.server = None

    def shutdown(self):
        for entry in self.entries.values():
            self._unload(entry)

    # -- handlers -----------------------------------------------------------------

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def models(self, request):
        return web.json_response({
            "object": "list",
            "data": [
                {"id": e.name, "object": "model", "owned_by": "tpullm",
                 "meta": {"path": e.path, "loaded": e.loaded}}
                for e in self.entries.values()
            ],
        })

    async def load_model(self, request):
        name = request.match_info["name"]
        if name not in self.entries:
            return web.json_response({"error": {"message": f"unknown model {name}"}},
                                     status=404)
        import asyncio

        await asyncio.get_event_loop().run_in_executor(
            None, self._ensure_loaded, name
        )
        return web.json_response({"model": name, "loaded": True})

    async def unload_model(self, request):
        name = request.match_info["name"]
        entry = self.entries.get(name)
        if entry is None:
            return web.json_response({"error": {"message": f"unknown model {name}"}},
                                     status=404)
        self._unload(entry)
        return web.json_response({"model": name, "loaded": False})

    async def proxy(self, request):
        """Dispatch by the request body's "model" field (default: first)."""
        import asyncio

        body = await request.json()
        name = str(body.get("model") or self.default)
        entry = await asyncio.get_event_loop().run_in_executor(
            None, self._ensure_loaded, name
        )
        handler = {
            "/v1/completions": entry.server.completions,
            "/completion": entry.server.completions,
            "/v1/chat/completions": entry.server.chat_completions,
            "/v1/embeddings": entry.server.embeddings,
            "/embedding": entry.server.embeddings,
            "/v1/rerank": entry.server.rerank,
            "/rerank": entry.server.rerank,
            "/v1/messages": entry.server.anthropic_messages,
            "/v1/messages/count_tokens": entry.server.anthropic_count_tokens,
            "/tokenize": entry.server.tokenize,
            "/detokenize": entry.server.detokenize,
        }[request.path]
        return await handler(_Replayed(request, body))


class _Replayed:
    """Request wrapper replaying an already-consumed JSON body."""

    def __init__(self, request, body):
        self._request = request
        self._body = body

    async def json(self):
        return self._body

    def __getattr__(self, name):
        return getattr(self._request, name)


def make_router_app(models: dict[str, str], max_loaded: int = 1,
                    api_keys: list[str] | None = None, **engine_kw) -> Router:
    return Router(models, max_loaded=max_loaded, api_keys=api_keys,
                  **engine_kw)
