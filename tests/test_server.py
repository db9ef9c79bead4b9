"""Server tests: continuous-batching scheduler + REST API over a tiny model
(≡ reference tools/server/tests pytest suite on stories260K)."""

import queue
import time

import numpy as np
import pytest

from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.runtime.batch_engine import BatchEngine
from tpullm.runtime.sampling import SamplerParams
from tpullm.server.scheduler import GenRequest, Scheduler


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = make_tiny_llama_gguf(
        tmp_path_factory.mktemp("srv") / "tiny.gguf",
        n_embd=64, n_head=4, n_head_kv=2, n_ff=128, n_layer=2,
    )
    return BatchEngine(path, n_slots=3, max_seq=128, mode="dense",
                       prefill_chunk=32)


@pytest.fixture(autouse=True)
def _fresh_engine_state(request):
    """Reset the shared module engine's slot state before every test.

    The engine is module-scoped (compiling it per test would triple the
    suite time) but many tests assume empty slots; under pytest-xdist each
    worker runs an arbitrary SUBSET of the module in arbitrary order, so
    any state a previous test leaves (n_past offsets, slot tenancy) breaks
    order-sensitive tests that pass serially. ≡ the reference server tests
    booting a fresh ServerProcess per scenario."""
    if "engine" in request.fixturenames:
        eng = request.getfixturevalue("engine")
        for s in range(eng.n_slots):
            eng.free_slot(s)
        eng.n_past[:] = 0
        eng.rope_delta[:] = 0
    yield


def _drain(req: GenRequest, timeout=300):
    # generous: under pytest-xdist 8 workers share this box's cores, so a
    # first-compile that takes 30s serial can take minutes — a short drain
    # timeout turns CPU starvation into bogus output-mismatch failures
    pieces, reason, stats = [], None, None
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            ev = req.out.get(timeout=timeout)
        except queue.Empty:
            break
        if ev[0] == "token":
            pieces.append(ev[1])
        else:
            reason, stats = ev[1], ev[2]
            break
    return pieces, reason, stats


def test_batch_engine_matches_single_slot(engine):
    toks = engine.tokenizer.tokenize("the quick brown fox", add_special=True)
    l0 = engine.prefill_slot(0, toks)
    l2 = engine.prefill_slot(2, toks)
    np.testing.assert_allclose(l0, l2, rtol=2e-2, atol=2e-2)
    # decode both slots together; equal states → equal logits
    out = engine.decode_batch({0: 7, 2: 7})
    np.testing.assert_allclose(out[0], out[2], rtol=2e-2, atol=2e-2)
    engine.free_slot(0)
    engine.free_slot(2)


def test_slot_isolation(engine):
    """Generating in one slot must not disturb another slot's state."""
    t1 = engine.tokenizer.tokenize("the quick", add_special=True)
    t2 = engine.tokenizer.tokenize("hello world over the", add_special=True)
    la = engine.prefill_slot(0, t1)
    engine.prefill_slot(1, t2)
    # advance slot 1 a few steps
    for tok in (5, 9, 12):
        engine.decode_batch({1: tok})
    # slot 0's next logits must equal a fresh engine's
    out = engine.decode_batch({0: 4})[0]
    engine2 = BatchEngine(
        engine.reader.path, n_slots=3, max_seq=128, mode="dense", prefill_chunk=32
    )
    engine2.prefill_slot(0, t1)
    ref = engine2.decode_batch({0: 4})[0]
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    engine.free_slot(0)
    engine.free_slot(1)


def test_scheduler_single_request(engine):
    sched = Scheduler(engine)
    sched.start()
    try:
        ids = engine.tokenizer.tokenize("the quick brown", add_special=True)
        req = sched.submit(GenRequest(prompt_ids=ids, max_tokens=8,
                                      sampling=SamplerParams(temp=0.0)))
        toks, reason, stats = _drain(req)
        assert reason in ("stop", "length")
        assert stats["prompt_n"] == len(ids)
        assert stats["predicted_n"] == len(toks)
        assert stats["ttft_ms"] >= 0
    finally:
        sched.stop()


def test_decode_batch_greedy_matches_logits_argmax(engine):
    """The ids-only device-greedy step must equal host argmax of
    decode_batch logits for the same slots."""
    def fresh():
        eng = BatchEngine(engine.reader.path, n_slots=2, max_seq=128,
                          mode="dense")
        lg0 = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        lg1 = eng.prefill_slot(1, [3, 8, 4])
        feed = {0: int(np.argmax(lg0)), 1: int(np.argmax(lg1))}
        return eng, feed

    eng_a, feed = fresh()
    ref = {s: int(np.argmax(l))
           for s, l in eng_a.decode_batch(feed).items()}
    eng_b, feed_b = fresh()
    assert feed_b == feed
    assert eng_b.decode_batch_greedy(feed) == ref


def test_prefill_slots_matches_sequential(engine):
    """Joint multi-slot prefill (one batched step per chunk round) must
    reproduce sequential per-slot prefills exactly."""
    prompts = {0: [1, 5, 9, 2, 7, 11, 4], 1: [3, 8, 4], 2: [6, 2, 9, 9, 1]}

    eng_a = BatchEngine(engine.reader.path, n_slots=3, max_seq=128,
                        mode="dense", prefill_chunk=4)
    ref = {s: eng_a.prefill_slot(s, toks) for s, toks in prompts.items()}

    eng_b = BatchEngine(engine.reader.path, n_slots=3, max_seq=128,
                        mode="dense", prefill_chunk=4)
    got = eng_b.prefill_slots(prompts)
    assert set(got) == set(ref)
    for s in prompts:
        np.testing.assert_allclose(got[s], ref[s], rtol=2e-4, atol=2e-4)
        assert eng_b.n_past[s] == eng_a.n_past[s] == len(prompts[s])
    # the caches must agree too: decode one step per slot and compare
    feed = {s: int(np.argmax(ref[s])) for s in prompts}
    da = eng_a.decode_batch(feed)
    db = eng_b.decode_batch(feed)
    for s in prompts:
        np.testing.assert_allclose(db[s], da[s], rtol=2e-4, atol=2e-4)


def test_scheduler_concurrent_requests(engine):
    sched = Scheduler(engine)
    sched.start()
    try:
        ids = engine.tokenizer.tokenize("the quick", add_special=True)
        reqs = [
            sched.submit(GenRequest(prompt_ids=ids, max_tokens=6,
                                    sampling=SamplerParams(temp=0.0)))
            for _ in range(5)  # more than n_slots → queueing exercised
        ]
        results = [_drain(r) for r in reqs]
        for toks, reason, stats in results:
            assert reason in ("stop", "length")
        # greedy + same prompt → identical outputs across slots
        first = results[0][0]
        for toks, _, _ in results[1:]:
            assert toks == first
    finally:
        sched.stop()


@pytest.mark.parametrize("stream", [False, True])
def test_http_api(engine, stream):
    """Drive the aiohttp app in-process via aiohttp's test utilities."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.api import Server

    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.get("/health")
            assert (await r.json())["status"] == "ok"

            r = await client.get("/v1/models")
            assert (await r.json())["data"][0]["id"] == "tiny"

            r = await client.post("/tokenize", json={"content": "hello"})
            toks = (await r.json())["tokens"]
            assert toks
            r = await client.post("/detokenize", json={"tokens": toks})
            assert "hello" in (await r.json())["content"]

            body = {"prompt": "the quick", "max_tokens": 4, "temperature": 0,
                    "stream": stream}
            r = await client.post("/v1/completions", json=body)
            assert r.status == 200
            if stream:
                raw = await r.text()
                assert "data: [DONE]" in raw
            else:
                data = await r.json()
                assert data["choices"][0]["finish_reason"] in ("stop", "length")
                assert data["usage"]["prompt_tokens"] > 0

            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0,
            })
            data = await r.json()
            assert data["choices"][0]["message"]["role"] == "assistant"

            r = await client.get("/metrics")
            assert "tpullm_requests_total" in await r.text()

            r = await client.get("/slots")
            assert len(await r.json()) == engine.n_slots
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()

def test_scheduler_grammar_constrained(engine):
    """json-schema grammar forces valid JSON output regardless of weights."""
    import json as _json

    from tpullm.grammar import json_schema_to_gbnf

    gbnf = json_schema_to_gbnf({
        "type": "object",
        "properties": {"n": {"type": "integer"}},
        "required": ["n"],
        "additionalProperties": False,
    })
    sched = Scheduler(engine)
    sched.start()
    try:
        ids = engine.tokenizer.tokenize("the quick", add_special=True)
        req = sched.submit(GenRequest(
            prompt_ids=ids, max_tokens=48,
            sampling=SamplerParams(temp=0.0), grammar=gbnf,
        ))
        toks, reason, stats = _drain(req)
        text = engine.tokenizer.detokenize(toks)
        # output must be a valid prefix of the grammar language in all cases
        from tpullm.grammar import GrammarMatcher, parse_gbnf

        m = GrammarMatcher(parse_gbnf(gbnf))
        assert m.accept_text(text), f"grammar rejected output {text!r}"
        if reason == "stop":  # EOG only allowed at grammar completion
            obj = _json.loads(text)
            assert isinstance(obj["n"], int)
    finally:
        sched.stop()


def test_prompt_prefix_reuse(engine):
    """Second request sharing a prompt prefix reuses the slot's KV cache
    (≡ server cache_prompt common-prefix reuse)."""
    sched = Scheduler(engine)
    sched.start()
    try:
        tok = engine.tokenizer
        ids1 = tok.tokenize("the quick brown fox jumps over the lazy dog",
                            add_special=True)
        r1 = sched.submit(GenRequest(prompt_ids=ids1, max_tokens=4,
                                     sampling=SamplerParams(temp=0.0)))
        toks1, _, _ = _drain(r1)
        assert sched.n_reused_tokens == 0

        ids2 = ids1 + toks1 + tok.tokenize(" and then", add_special=False)
        r2 = sched.submit(GenRequest(prompt_ids=ids2, max_tokens=4,
                                     sampling=SamplerParams(temp=0.0)))
        toks2, _, _ = _drain(r2)
        assert sched.n_reused_tokens > 0

        # correctness: reused-cache output equals fresh-engine output
        eng2 = BatchEngine(engine.reader.path, n_slots=1, max_seq=128,
                           mode="dense", prefill_chunk=32)
        sched2 = Scheduler(eng2)
        sched2.start()
        try:
            r3 = sched2.submit(GenRequest(prompt_ids=ids2, max_tokens=4,
                                          sampling=SamplerParams(temp=0.0)))
            toks3, _, _ = _drain(r3)
            assert toks2 == toks3
        finally:
            sched2.stop()
    finally:
        sched.stop()


def test_context_shift_long_generation(tmp_path):
    """Generation past the context window survives via context shift
    (≡ server context-shift, test_ctx_shift.py)."""
    path = make_tiny_llama_gguf(tmp_path / "cs.gguf", n_embd=64, n_head=4,
                                n_head_kv=2, n_ff=128, n_layer=2)
    eng = BatchEngine(path, n_slots=1, max_seq=48, mode="dense",
                      prefill_chunk=16)
    sched = Scheduler(eng)
    sched.start()
    try:
        ids = eng.tokenizer.tokenize("the quick brown", add_special=True)
        req = sched.submit(GenRequest(prompt_ids=ids, max_tokens=100,
                                      sampling=SamplerParams(temp=0.0)))
        toks, reason, stats = _drain(req, timeout=300)
        assert len(toks) == 100  # well past max_seq=48
        assert reason == "length"
        assert sched.n_context_shifts >= 1
    finally:
        sched.stop()


def test_anthropic_messages_api(engine):
    """/v1/messages + count_tokens (≡ reference test_compat_anthropic.py)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.api import Server

    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/v1/messages", json={
                "model": "tiny", "max_tokens": 4,
                "system": "be brief",
                "messages": [{"role": "user", "content": "hi"}],
                "temperature": 0,
            })
            assert r.status == 200
            data = await r.json()
            assert data["type"] == "message"
            assert data["role"] == "assistant"
            assert data["content"][0]["type"] == "text"
            assert data["stop_reason"] in ("end_turn", "max_tokens")
            assert data["usage"]["input_tokens"] > 0

            # content-block input form
            r = await client.post("/v1/messages/count_tokens", json={
                "model": "tiny",
                "messages": [{"role": "user",
                              "content": [{"type": "text", "text": "hello"}]}],
            })
            assert (await r.json())["input_tokens"] > 0

            # max_tokens required
            r = await client.post("/v1/messages", json={
                "model": "tiny", "messages": [{"role": "user", "content": "x"}],
            })
            assert r.status == 400
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()


def test_completions_logprobs(engine):
    """OpenAI logprobs in /v1/completions (≡ server n_probs)."""
    import asyncio
    import math

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.api import Server

    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/v1/completions", json={
                "prompt": "the quick", "max_tokens": 3, "temperature": 0,
                "logprobs": 3,
            })
            assert r.status == 200
            lp = (await r.json())["choices"][0]["logprobs"]
            assert len(lp["tokens"]) == len(lp["token_logprobs"])
            # dict keys may collide when byte tokens render identically
            assert 1 <= len(lp["top_logprobs"][0]) <= 3
            assert all(v <= 0 or math.isclose(v, 0, abs_tol=1e-5)
                       for v in lp["token_logprobs"])
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()


def test_multi_model_router(tmp_path):
    """Router switches models by request body, lazily loads, LRU-evicts
    (≡ server-models.cpp /models switching)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.router import make_router_app

    p1 = make_tiny_llama_gguf(tmp_path / "a.gguf", n_embd=64, n_head=4,
                              n_head_kv=2, n_ff=128, n_layer=2, seed=1)
    p2 = make_tiny_llama_gguf(tmp_path / "b.gguf", n_embd=64, n_head=4,
                              n_head_kv=2, n_ff=128, n_layer=2, seed=2)
    router = make_router_app({"alpha": str(p1), "beta": str(p2)},
                             max_loaded=1, n_slots=1, max_seq=64,
                             mode="dense", prefill_chunk=32)

    async def run():
        client = TestClient(TestServer(router.app))
        await client.start_server()
        try:
            r = await client.get("/v1/models")
            data = (await r.json())["data"]
            assert {m["id"] for m in data} == {"alpha", "beta"}
            assert not any(m["meta"]["loaded"] for m in data)

            r = await client.post("/v1/completions", json={
                "model": "alpha", "prompt": "the quick", "max_tokens": 2,
                "temperature": 0})
            assert r.status == 200

            r = await client.post("/v1/completions", json={
                "model": "beta", "prompt": "the quick", "max_tokens": 2,
                "temperature": 0})
            assert r.status == 200

            # max_loaded=1 → alpha was evicted when beta loaded
            r = await client.get("/models")
            loaded = {m["id"]: m["meta"]["loaded"] for m in (await r.json())["data"]}
            assert loaded == {"alpha": False, "beta": True}

            r = await client.post("/models/alpha/load", json={})
            assert (await r.json())["loaded"] is True
            r = await client.post("/models/alpha/unload", json={})
            assert (await r.json())["loaded"] is False
            r = await client.post("/models/nope/load", json={})
            assert r.status == 404
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        router.shutdown()


def test_thread_safety_stress(engine):
    """Concurrent submits from many threads + interleaved embedding jobs
    (≡ reference test-thread-safety.cpp: parallel sequences on one context)."""
    import threading

    sched = Scheduler(engine)
    sched.start()
    errors = []
    results = {}

    def worker(i):
        try:
            ids = engine.tokenizer.tokenize(f"the quick brown number {i}",
                                            add_special=True)
            req = sched.submit(GenRequest(prompt_ids=ids, max_tokens=4,
                                          sampling=SamplerParams(temp=0.0)))
            toks, reason, stats = _drain(req, timeout=300)
            assert reason in ("stop", "length"), reason
            results[i] = toks
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def embed_worker():
        try:
            ids = engine.tokenizer.tokenize("embedding probe", add_special=True)
            v = sched.embed(ids)
            assert v.shape[-1] == engine.hp.n_embd
        except Exception as e:  # pragma: no cover
            errors.append(e)

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        threads += [threading.Thread(target=embed_worker) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        assert len(results) == 8
        # determinism: same prompt index → same output across repeat run
        rerun = {}
        for i in (0, 3):
            ids = engine.tokenizer.tokenize(f"the quick brown number {i}",
                                            add_special=True)
            req = sched.submit(GenRequest(prompt_ids=ids, max_tokens=4,
                                          sampling=SamplerParams(temp=0.0)))
            toks, _, _ = _drain(req, timeout=300)
            rerun[i] = toks
        assert rerun[0] == results[0] and rerun[3] == results[3]
    finally:
        sched.stop()


def test_chat_tool_choice_required_forces_tool_call(engine):
    """tool_choice=required constrains decoding to a grammatical hermes
    tool call; the response parses into tool_calls (≡ common/chat.cpp
    grammar-forced tool calling)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.api import Server

    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            body = {
                "messages": [{"role": "user", "content": "weather in Paris?"}],
                "tools": [{
                    "type": "function",
                    "function": {
                        "name": "get_weather",
                        "parameters": {
                            "type": "object",
                            "properties": {"city": {"enum": ["Paris", "Tokyo"]}},
                            "required": ["city"],
                        },
                    },
                }],
                "tool_choice": "required",
                "max_tokens": 160,
                "temperature": 0.8,
                "seed": 7,
            }
            r = await client.post("/v1/chat/completions", json=body)
            assert r.status == 200
            data = await r.json()
            msg = data["choices"][0]["message"]
            calls = msg.get("tool_calls") or []
            assert calls, data
            assert calls[0]["function"]["name"] == "get_weather"
            import json as _json

            args = _json.loads(calls[0]["function"]["arguments"])
            assert set(args) == {"city"} and args["city"] in ("Paris", "Tokyo")
            assert data["choices"][0]["finish_reason"] == "tool_calls"
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()


def test_infill_endpoint(tmp_path):
    """/infill builds <fim_pre>prefix<fim_suf>suffix<fim_mid> from the
    model's FIM specials (≡ server /infill)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.server.api import Server

    # byte vocab starts at id 3; reuse three byte tokens as FIM specials
    path = make_tiny_llama_gguf(
        tmp_path / "fim.gguf",
        extra_kv={
            "tokenizer.ggml.fim_pre_token_id": 3,
            "tokenizer.ggml.fim_suf_token_id": 4,
            "tokenizer.ggml.fim_mid_token_id": 5,
        },
    )
    eng = BatchEngine(path, mode="dense", n_slots=2, max_seq=256)
    sched = Scheduler(eng)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/infill", json={
                "input_prefix": "def add(a, b):\n    ",
                "input_suffix": "\n    return out",
                "max_tokens": 4, "temperature": 0,
            })
            assert r.status == 200, await r.text()
            data = await r.json()
            assert isinstance(data["choices"][0]["text"], str)
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()


def test_infill_requires_fim_tokens(engine):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.api import Server

    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/infill", json={"input_prefix": "x"})
            assert r.status == 400
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()


def test_http_alias_and_compat_endpoints(engine):
    """llama.cpp aliases + ollama compat + /apply-template + /lora-adapters."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.api import Server

    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            for path in ("/v1/health", "/models", "/api/tags"):
                r = await client.get(path)
                assert r.status == 200, path
            r = await client.post("/api/show", json={"model": "tiny"})
            info = await r.json()
            assert info["model_info"]["general.architecture"]
            r = await client.post("/apply-template", json={"messages": [
                {"role": "user", "content": "hi"}]})
            assert "hi" in (await r.json())["prompt"]
            r = await client.get("/lora-adapters")
            assert (await r.json()) == []
            r = await client.post("/completions", json={
                "prompt": "the quick", "max_tokens": 2})
            assert r.status == 200
            r = await client.post("/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 2})
            assert r.status == 200
        finally:
            await client.close()

    try:
        asyncio.new_event_loop().run_until_complete(run())
    finally:
        sched.stop()


def test_http_responses_api(engine):
    """OpenAI /v1/responses: text + item-list input, non-stream and SSE."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.api import Server

    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/v1/responses", json={
                "input": "the quick brown", "max_output_tokens": 4})
            body = await r.json()
            assert body["object"] == "response" and body["status"] == "completed"
            msg = [o for o in body["output"] if o["type"] == "message"][0]
            assert msg["content"][0]["type"] == "output_text"
            assert body["usage"]["output_tokens"] >= 1

            r = await client.post("/v1/responses", json={
                "instructions": "be brief",
                "input": [{"role": "user", "content": "hello"}],
                "max_output_tokens": 3})
            assert (await r.json())["status"] == "completed"

            # streaming SSE
            r = await client.post("/v1/responses", json={
                "input": "hello", "max_output_tokens": 3, "stream": True})
            raw = (await r.read()).decode()
            assert "response.created" in raw
            assert "response.output_text.delta" in raw
            assert "response.completed" in raw

            # errors
            r = await client.post("/v1/responses", json={})
            assert r.status == 400
        finally:
            await client.close()

    try:
        asyncio.new_event_loop().run_until_complete(run())
    finally:
        sched.stop()


# -- in-scheduler speculative decoding (≡ server-context.cpp can_speculate) ----


def _greedy_tokens(sched, ids, n):
    req = sched.submit(GenRequest(prompt_ids=ids, max_tokens=n,
                                  sampling=SamplerParams(temp=0.0)))
    toks, reason, _ = _drain(req)
    assert reason in ("stop", "length")
    return toks


@pytest.mark.parametrize("spec_type", ["ngram_simple", "ngram_mod"])
def test_scheduler_speculation_matches_plain(engine, spec_type):
    """Greedy output with in-scheduler speculation must be identical to the
    non-speculative scheduler; a repetitive prompt must yield accepted
    drafts (>0 tokens per verify step on average for the ngram family)."""
    ids = engine.tokenizer.tokenize(
        "the quick brown fox the quick brown fox the quick brown fox",
        add_special=True,
    )
    sched0 = Scheduler(engine)
    sched0.start()
    try:
        ref = _greedy_tokens(sched0, ids, 24)
    finally:
        sched0.stop()
    for s in sched0.slots:
        engine.free_slot(s.index)
        s.tokens = []

    sched = Scheduler(engine, spec_type=spec_type, n_draft=4)
    sched.start()
    try:
        out = _greedy_tokens(sched, ids, 24)
    finally:
        sched.stop()
    assert out == ref
    assert sched.n_spec_drafted >= 0  # drafting may or may not trigger…
    for s in sched.slots:
        engine.free_slot(s.index)
        s.tokens = []


def test_scheduler_draft_model_speculation(engine):
    """Draft == target → near-total acceptance; concurrent slots all match
    the plain scheduler's greedy output."""
    draft = BatchEngine(engine.reader.path, n_slots=3, max_seq=128,
                        mode="dense", prefill_chunk=32)
    ids = engine.tokenizer.tokenize("the quick brown fox", add_special=True)
    sched0 = Scheduler(engine)
    sched0.start()
    try:
        ref = _greedy_tokens(sched0, ids, 16)
    finally:
        sched0.stop()
    for s in sched0.slots:
        engine.free_slot(s.index)
        s.tokens = []

    sched = Scheduler(engine, draft_engine=draft, n_draft=4)
    sched.start()
    try:
        reqs = [sched.submit(GenRequest(prompt_ids=ids, max_tokens=16,
                                        sampling=SamplerParams(temp=0.0)))
                for _ in range(3)]
        results = [_drain(r) for r in reqs]
    finally:
        sched.stop()
    for toks, reason, _ in results:
        assert reason in ("stop", "length")
        assert toks == ref
    assert sched.n_spec_drafted > 0
    # identical draft/target agree: >1 token per verify round on average
    assert sched.n_spec_accepted > 0
    assert sched.n_spec_accepted / sched.n_spec_drafted > 0.9
    for s in sched.slots:
        engine.free_slot(s.index)
        s.tokens = []


def test_scheduler_speculation_respects_sampling_and_stop(engine):
    """Stochastic sampling + speculation still terminates and emits valid
    events (acceptance is exact-match so any sampler is safe)."""
    ids = engine.tokenizer.tokenize("hello world hello world", add_special=True)
    sched = Scheduler(engine, spec_type="ngram_cache", n_draft=3)
    sched.start()
    try:
        req = sched.submit(GenRequest(prompt_ids=ids, max_tokens=10,
                                      sampling=SamplerParams(temp=0.9, seed=3)))
        toks, reason, stats = _drain(req)
    finally:
        sched.stop()
    assert reason in ("stop", "length")
    assert len(toks) == stats["predicted_n"] <= 10
    for s in sched.slots:
        engine.free_slot(s.index)
        s.tokens = []


# -- --cache-reuse hole punching (≡ server-context.cpp:2228-2271) -------------


def test_shift_slot_matches_recompute(tmp_path):
    """Engine-level check of the rope re-rotation math: with ONE layer each
    cached K/V row depends only on its own token, so compacting cached rows
    leftward must equal prefilling the compacted sequence from scratch.
    (With deeper models cache-reuse is approximate by design, exactly like
    the reference's --cache-reuse.)"""
    path = make_tiny_llama_gguf(
        tmp_path / "tiny1l.gguf",
        n_embd=64, n_head=4, n_head_kv=2, n_ff=128, n_layer=1,
    )
    eng = BatchEngine(path, n_slots=2, max_seq=128, mode="dense",
                      prefill_chunk=32)
    toks = eng.tokenizer.tokenize(
        "the quick brown fox jumps over the lazy dog", add_special=True
    )
    assert eng.can_shift
    a, b = toks[:4], toks[-4:]
    # slot 0: full prompt, then drop the middle via shift
    eng.prefill_slot(0, toks)
    S = eng.max_seq
    idx = np.arange(S, dtype=np.int32)
    delta = np.zeros(S, dtype=np.int32)
    src = len(toks) - 4
    idx[4:8] = np.arange(src, src + 4)
    delta[4:8] = 4 - src
    eng.shift_slot(0, idx, delta)
    eng.rewind(0, 8)
    out_shift = eng.decode_batch({0: 7})[0]
    # slot 1: prefill the compacted sequence directly
    eng.prefill_slot(1, a + b)
    out_ref = eng.decode_batch({1: 7})[1]
    np.testing.assert_allclose(out_shift, out_ref, rtol=5e-2, atol=5e-2)


def test_scheduler_cache_reuse_punches_holes(engine):
    """A second prompt sharing a long mid-section with the first reuses the
    shifted chunk instead of recomputing it."""
    sched = Scheduler(engine, cache_reuse=4)
    assert sched.cache_reuse == 4
    sched.start()
    try:
        tok = engine.tokenizer.tokenize
        base = tok("the quick brown fox jumps over the lazy dog again and again",
                   add_special=True)
        _greedy_tokens(sched, base, 2)
        reused_before = sched.n_reused_tokens
        # drop a middle token → prefix match ends early, suffix chunk shifts
        drop = len(base) // 2
        prompt2 = base[:drop] + base[drop + 1:]
        toks = _greedy_tokens(sched, prompt2, 2)
        assert len(toks) >= 1
        # reuse must exceed the plain common prefix (= drop tokens)
        assert sched.n_reused_tokens - reused_before > drop
    finally:
        sched.stop()
    for s in sched.slots:
        engine.free_slot(s.index)
        s.tokens = []


# -- serving-engine arch breadth: iSWA + recurrent caches ------------------------
# (≡ the reference server running llama_kv_cache_unified_iswa and
# llama_memory_recurrent models through the same update_slots loop)


# slow: iswa dual-cache serving e2e; swa ring/full parity is covered
# fast in test_swa_cache
@pytest.mark.slow
def test_serve_iswa_dual_cache(tmp_path):
    from tpullm.models.testing import make_tiny_gemma_gguf
    from tpullm.runtime.engine import Engine
    from tpullm.runtime.kvcache import SWACache

    path = make_tiny_gemma_gguf(tmp_path / "g3.gguf", n_layer=4,
                                sliding_window=16)
    eng = BatchEngine(path, n_slots=2, max_seq=64, mode="dense",
                      prefill_chunk=16)
    assert isinstance(eng.cache, SWACache)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    l0 = eng.prefill_slot(0, toks)
    l1 = eng.prefill_slot(1, toks)
    np.testing.assert_allclose(l0, l1, rtol=2e-2, atol=2e-2)
    # decode past the sliding window so the ring evicts; both slots stay equal
    tok = 7
    for _ in range(24):
        out = eng.decode_batch({0: tok, 1: tok})
        np.testing.assert_allclose(out[0], out[1], rtol=2e-2, atol=2e-2)
        tok = int(np.argmax(out[0]))
    # parity with the single-stream Engine over the same trajectory
    ref = Engine(path, max_seq=64, mode="dense")
    ref.prefill(toks)
    tok_b, tok_s = 7, 7
    eng.free_slot(0)
    eng.prefill_slot(0, toks)
    for _ in range(24):
        lb = eng.decode_batch({0: tok_b})[0]
        ls = np.asarray(ref.decode_step(tok_s))
        tok_b, tok_s = int(np.argmax(lb)), int(np.argmax(ls))
        assert tok_b == tok_s
    # free_slot must clear the ring positions: a fresh identical prefill
    # reproduces the original logits even after the long generation above
    eng.free_slot(0)
    l0b = eng.prefill_slot(0, toks)
    np.testing.assert_allclose(l0b, l0, rtol=2e-2, atol=2e-2)


def test_serve_recurrent_mamba(tmp_path):
    from tpullm.models.testing import make_tiny_mamba_gguf

    path = make_tiny_mamba_gguf(tmp_path / "mamba.gguf")
    eng = BatchEngine(path, n_slots=2, max_seq=64, mode="dense",
                      prefill_chunk=16)
    t1 = eng.tokenizer.tokenize("the quick brown", add_special=True)
    t2 = eng.tokenizer.tokenize("hello world over the lazy", add_special=True)
    l0 = eng.prefill_slot(0, t1)
    # prefilling/decoding another slot must not disturb slot 0's carried state
    eng.prefill_slot(1, t2)
    for t in (5, 9):
        eng.decode_batch({1: t})
    out = eng.decode_batch({0: 4})[0]
    ref_eng = BatchEngine(path, n_slots=2, max_seq=64, mode="dense",
                          prefill_chunk=16)
    ref_eng.prefill_slot(0, t1)
    ref = ref_eng.decode_batch({0: 4})[0]
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    # free_slot must zero the cumulative state: re-prefill reproduces l0
    eng.free_slot(0)
    l0b = eng.prefill_slot(0, t1)
    np.testing.assert_allclose(l0b, l0, rtol=2e-2, atol=2e-2)


def test_scheduler_recurrent_generation(tmp_path):
    from tpullm.models.testing import make_tiny_mamba_gguf
    from tpullm.runtime.engine import Engine

    path = make_tiny_mamba_gguf(tmp_path / "mamba_s.gguf")
    eng = BatchEngine(path, n_slots=2, max_seq=64, mode="dense",
                      prefill_chunk=16)
    # speculation silently degrades to plain decoding: recurrent state
    # cannot roll back a rejected draft
    sched = Scheduler(eng, spec_type="ngram_simple")
    assert sched.spec_type is None
    sched.start()
    try:
        tok = eng.tokenizer.tokenize
        ids_a = tok("the quick brown", add_special=True)
        ids_b = tok("hello world over", add_special=True)
        got_a = _greedy_tokens(sched, ids_a, 6)
        got_b = _greedy_tokens(sched, ids_b, 6)
        ref = Engine(path, max_seq=64, mode="dense")
        ref_a = list(ref.generate_tokens(ids_a, 6, stop_on_eog=True))
        ref2 = Engine(path, max_seq=64, mode="dense")
        ref_b = list(ref2.generate_tokens(ids_b, 6, stop_on_eog=True))
        assert got_a == ref_a
        assert got_b == ref_b
    finally:
        sched.stop()


def test_scheduler_lazy_grammar_stays_inactive(engine):
    """A lazy grammar whose trigger never fires must leave generation
    unconstrained (≡ grammar_lazy: the grammar applies only post-trigger)."""
    req = Scheduler(engine)
    sched = req
    sched.start()
    try:
        ids = engine.tokenizer.tokenize("the quick brown", add_special=True)
        r = sched.submit(GenRequest(
            prompt_ids=ids, max_tokens=8,
            sampling=SamplerParams(temp=0.0),
            grammar='root ::= "\x00unreachable\x00"',
            grammar_triggers=[{"type": "word", "value": "\x00never\x00"}],
        ))
        toks, reason, _ = _drain(r)
        assert reason == "length"
        assert len(toks) == 8
    finally:
        sched.stop()
    for s in sched.slots:
        engine.free_slot(s.index)
        s.tokens = []


# slow: compiles every scheduler shape bucket (~220s); the live-server
# and scheduler suites exercise the same shapes functionally
@pytest.mark.slow
def test_precompile_covers_scheduler_shapes(engine):
    """precompile() must lower+compile without error for every shape the
    loop issues, including the speculative verify width."""
    sched = Scheduler(engine, spec_type="ngram_simple", n_draft=4)
    th = sched.precompile(background=True)
    th.join(timeout=600)  # xdist workers contend for compile cores
    assert not th.is_alive()
    # compiled shapes actually serve a request end-to-end
    sched.start()
    try:
        ids = engine.tokenizer.tokenize("the quick brown fox", add_special=True)
        toks = _greedy_tokens(sched, ids, 4)
        assert len(toks) == 4
    finally:
        sched.stop()
    for s in sched.slots:
        engine.free_slot(s.index)
        s.tokens = []


def test_webui_served_at_root(engine):
    """The webui single-file SPA is served at / (≡ tools/server/webui)."""
    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.api import Server

    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            for path in ("/", "/index.html"):
                r = await client.get(path)
                assert r.status == 200
                html = await r.text()
                assert "tpullm" in html
                assert "/v1/chat/completions" in html
                # round-5 capability hooks (docs/WEBUI_PARITY.md): syntax
                # highlighting, LaTeX subset, sampling presets, paste/drop
                # attachments, live slots dashboard, voice recording, code
                # preview, in-app confirmations, i18n, PWA registration
                for hook in ("function hl(", "function texToHtml(",
                             "renderPresets", "addEventListener(\"paste\"",
                             "addEventListener(\"drop\"", "refreshSlots",
                             "MediaRecorder", "blobToWavDataUrl",
                             "prevframe", "uiConfirm", "const I18N",
                             "serviceWorker"):
                    assert hook in html, hook
            # PWA surface: manifest + service worker + icon (≡ reference
            # webui static assets; installable/offline app shell)
            r = await client.get("/manifest.webmanifest")
            assert r.status == 200
            man = await r.json()
            assert man["display"] == "standalone"
            assert man["icons"][0]["src"] == "/icon.svg"
            r = await client.get("/sw.js")
            assert r.status == 200
            assert "caches.open" in await r.text()
            r = await client.get("/icon.svg")
            assert r.status == 200
            assert (await r.text()).startswith("<svg")
        finally:
            await client.close()

    try:
        import asyncio

        asyncio.new_event_loop().run_until_complete(run())
    finally:
        sched.stop()


def test_prefill_bucket_overshoot_near_context_end(engine):
    """Bucket padding past max_seq must not clobber earlier cache rows
    (kvcache._seq_write clamp-and-roll): a 1-token tail at offset 29 of a
    32-slot cache rides an 8-wide bucket — logits must match a run where
    the bucket fits."""
    import jax.numpy as jnp

    from tpullm.runtime import Engine

    toks = list(range(3, 32))  # 29 tokens

    def run(max_seq):
        eng = Engine(engine.reader.path, mode="dense", dtype=jnp.float32,
                     kv_dtype=jnp.float32, max_seq=max_seq)
        eng.prefill(toks)
        lg = eng.prefill([40])  # bucket 8 at offset 29 overshoots max_seq 32
        nxt = eng.decode_step(int(np.argmax(lg)))
        return [lg, nxt]

    ref = run(64)   # 29+8 fits: no clamp
    got = run(32)   # 29+8 > 32: clamped window, rolled payload
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_joint_round_mixed_offsets_near_context_end(engine):
    """The confirmed review repro: a short reuse-tail admission near the
    context end shares a joint round with a longer chunk; the shared bucket
    must not corrupt the short slot's cache."""
    import jax.numpy as jnp

    def fresh():
        return BatchEngine(engine.reader.path, n_slots=2, max_seq=32,
                           mode="dense", dtype=jnp.float32,
                           kv_dtype=jnp.float32, prefill_chunk=16)

    long_toks = list(range(3, 19))  # 16
    head = list(range(3, 32))  # 29 cached tokens for slot 0

    eng_a = fresh()
    eng_a.prefill_slot(0, head)
    ref0 = eng_a.prefill_slot(0, [40])       # sequential reference
    ref1 = eng_a.prefill_slot(1, long_toks)

    eng_b = fresh()
    eng_b.prefill_slot(0, head)
    got = eng_b.prefill_slots({0: [40], 1: long_toks})  # one joint round
    np.testing.assert_allclose(got[0], ref0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1], ref1, rtol=2e-4, atol=2e-4)
    da = eng_a.decode_batch({0: int(np.argmax(ref0)), 1: int(np.argmax(ref1))})
    db = eng_b.decode_batch({0: int(np.argmax(ref0)), 1: int(np.argmax(ref1))})
    for s in (0, 1):
        np.testing.assert_allclose(db[s], da[s], rtol=2e-4, atol=2e-4)


def test_api_key_auth(engine):
    """--api-key security (≡ reference tools/server/tests test_security.py +
    middleware_validate_api_key, server-http.cpp:126-170): public endpoints
    stay open, everything else requires Bearer or X-Api-Key."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.server.api import Server

    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny", api_keys=["sk-test"])
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.get("/health")  # public
            assert r.status == 200
            r = await client.get("/v1/models")  # public
            assert r.status == 200

            body = {"prompt": "hi", "max_tokens": 2, "temperature": 0}
            r = await client.post("/v1/completions", json=body)
            assert r.status == 401
            err = (await r.json())["error"]
            assert err["type"] == "authentication_error"

            r = await client.post("/v1/completions", json=body, headers={
                "Authorization": "Bearer sk-wrong"})
            assert r.status == 401
            r = await client.post("/v1/completions", json=body, headers={
                "Authorization": "Bearer sk-test"})
            assert r.status == 200
            r = await client.post("/v1/completions", json=body, headers={
                "X-Api-Key": "sk-test"})
            assert r.status == 200
            r = await client.get("/metrics", headers={
                "Authorization": "Bearer sk-test"})
            assert r.status == 200
        finally:
            await client.close()

    try:
        asyncio.new_event_loop().run_until_complete(run())
    finally:
        sched.stop()
