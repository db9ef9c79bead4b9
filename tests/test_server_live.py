"""True concurrent-clients test against a LIVE tpullm-server process
(≡ reference tests/test-thread-safety.cpp run with -np 4 parallel streams +
tools/server/tests' ServerProcess harness): boot the real server on a tiny
model, fire parallel streaming HTTP requests, assert per-stream determinism
and no cross-slot bleed."""

import asyncio
import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

aiohttp = pytest.importorskip("aiohttp")

from tpullm.models.testing import make_tiny_llama_gguf  # noqa: E402


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    path = make_tiny_llama_gguf(
        tmp_path_factory.mktemp("live") / "tiny.gguf",
        n_embd=64, n_head=4, n_head_kv=2, n_ff=128, n_layer=2,
    )
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never grab the TPU from tests
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "tpullm.server", "-m", str(path),
         "--port", str(port), "-np", "4", "--mode", "dense",
         "-c", "256", "--prefill-chunk", "32"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 300  # first compile under xdist contention
    last_err = None
    import urllib.request

    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            raise RuntimeError(f"server died rc={proc.returncode}:\n{out}")
        try:
            with urllib.request.urlopen(base + "/health", timeout=2) as r:
                if r.status == 200:
                    break
        except Exception as e:  # noqa: BLE001
            last_err = e
            time.sleep(1.0)
    else:
        raise TimeoutError(f"server never became healthy: {last_err}")
    yield base
    os.killpg(proc.pid, signal.SIGTERM)
    proc.wait(timeout=30)


async def _stream_completion(session, base, prompt, max_tokens=8):
    """POST /v1/completions stream:true → (list of text chunks, finish)."""
    chunks, finish = [], None
    async with session.post(
        base + "/v1/completions",
        json={"prompt": prompt, "max_tokens": max_tokens,
              "temperature": 0.0, "stream": True},
    ) as resp:
        assert resp.status == 200, await resp.text()
        async for raw in resp.content:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            d = json.loads(payload)
            ch = d["choices"][0]
            if ch.get("text"):
                chunks.append(ch["text"])
            if ch.get("finish_reason"):
                finish = ch["finish_reason"]
    return chunks, finish


def test_concurrent_streams_deterministic(live_server):
    """8 greedy streams of the SAME prompt (2x the server's 4 slots, so
    queueing + slot reuse are exercised) must produce identical text."""

    async def run():
        async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=600)
        ) as s:
            return await asyncio.gather(*[
                _stream_completion(s, live_server, "the quick brown fox")
                for _ in range(8)
            ])

    results = asyncio.new_event_loop().run_until_complete(run())
    texts = ["".join(c) for c, _ in results]
    assert all(f == "length" for _, f in results)
    assert len(set(texts)) == 1, texts


def test_concurrent_streams_no_cross_slot_bleed(live_server):
    """Distinct prompts decoded concurrently must each match their own
    serial (single-request) output — per-slot state never leaks."""

    prompts = ["the quick brown", "hello world over", "fox jumps the",
               "lazy dog sleeps", "over the lazy", "quick quick quick"]

    async def serial():
        async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=600)
        ) as s:
            out = []
            for p in prompts:
                out.append(await _stream_completion(s, live_server, p))
            return out

    async def parallel():
        async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=600)
        ) as s:
            return await asyncio.gather(*[
                _stream_completion(s, live_server, p) for p in prompts
            ])

    loop = asyncio.new_event_loop()
    ref = loop.run_until_complete(serial())
    got = loop.run_until_complete(parallel())
    for p, (rc, _), (gc, _) in zip(prompts, ref, got):
        assert "".join(gc) == "".join(rc), f"stream for {p!r} diverged"


def test_metrics_and_slots_under_load(live_server):
    """/metrics and /slots stay consistent while streams run."""

    async def run():
        async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=600)
        ) as s:
            task = asyncio.gather(*[
                _stream_completion(s, live_server, "the quick", max_tokens=6)
                for _ in range(4)
            ])
            async with s.get(live_server + "/metrics") as r:
                assert r.status == 200
                body = await r.text()
                assert "tpullm:" in body or "prompt_tokens" in body
            async with s.get(live_server + "/slots") as r:
                assert r.status == 200
                slots = await r.json()
                assert len(slots) == 4
            await task

    asyncio.new_event_loop().run_until_complete(run())
