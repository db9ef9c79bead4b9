"""On-disk repack cache + thread-parallel prewarm (models/weights.py).

The blocks→planes repack dominates cold weight loading (~300 s of host work
for an 8B model); the cache keys planes by content hash so a second load of
the same file — or the same tensor under a different name — streams mmap'd
planes straight to the device. ≡ the reference's load-once mmap property
(src/llama-mmap.cpp) restored for the TPU plane format.
"""

import numpy as np
import pytest

from tpullm.gguf.constants import GGMLType
from tpullm.gguf.reader import GGUFReader
from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.models.weights import (
    _repack_key,
    planes_np_for,
    prewarm_quant_planes,
)
from tpullm.ops import qmatmul


@pytest.fixture
def quant_gguf(tmp_path):
    return make_tiny_llama_gguf(tmp_path / "m.gguf", n_embd=256, n_ff=512,
                                n_head=4, n_head_kv=2,
                                weight_type=GGMLType.Q4_K)


def _first_quant_info(path):
    r = GGUFReader(path)
    for ti in r.tensors.values():
        if ti.ggml_type == GGMLType.Q4_K and len(ti.shape) == 2:
            return ti
    raise AssertionError("fixture has no Q4_K tensor")


def test_cache_roundtrip_matches_direct(quant_gguf, tmp_path, monkeypatch):
    monkeypatch.setenv("TPULLM_REPACK_CACHE_DIR", str(tmp_path / "rc"))
    ti = _first_quant_info(quant_gguf)
    direct = qmatmul.repack_np(ti.data, ti.ggml_type,
                               ti.shape[1], ti.shape[0])
    miss = planes_np_for(ti)  # writes the entry
    ti2 = _first_quant_info(quant_gguf)
    hit = planes_np_for(ti2)  # reads it back mmap'd
    assert set(direct) == set(miss) == set(hit)
    for nm in direct:
        np.testing.assert_array_equal(direct[nm], miss[nm])
        np.testing.assert_array_equal(direct[nm], np.asarray(hit[nm]))
        assert hit[nm].dtype == direct[nm].dtype


def test_key_tracks_content_and_layout(quant_gguf, tmp_path):
    ti = _first_quant_info(quant_gguf)
    k1 = _repack_key(ti)
    # same bytes, same layout → same key (what makes the cache hit)
    assert _repack_key(ti) == k1
    flipped = ti.data.copy()
    flipped[0] ^= 0xFF
    ti_mut = type(ti)(name=ti.name, ggml_type=ti.ggml_type, shape=ti.shape,
                      offset=ti.offset, data=flipped)
    assert _repack_key(ti_mut) != k1


def test_prewarm_attaches_and_quant_load_consumes(quant_gguf, tmp_path,
                                                  monkeypatch):
    monkeypatch.setenv("TPULLM_REPACK_CACHE_DIR", str(tmp_path / "rc"))
    r = GGUFReader(quant_gguf)
    th = prewarm_quant_planes(r, "quant")
    quant_infos = [ti for ti in r.tensors.values()
                   if ti.ggml_type == GGMLType.Q4_K and len(ti.shape) == 2]
    assert quant_infos
    # prewarm is async and bounded: futures attach up to max_inflight ahead
    # of consumption; consuming releases permits so the rest follow. The
    # submitter exposes a deterministic first-attach handshake (a 60s poll
    # here was an xdist core-contention flake).
    assert th is not None
    assert th.first_attached.wait(timeout=120)
    assert any("_planes_fut" in ti.__dict__ for ti in quant_infos)
    from tpullm.models.weights import quant_from_info

    for ti in quant_infos:  # consume ALL — exercises the bounded pipeline
        ql = quant_from_info(ti)
        assert "_planes_np" not in ti.__dict__  # consumed + dropped
        assert "_planes_fut" not in ti.__dict__
        assert ql.n_in == ti.shape[0]


def test_disabled_cache_still_loads(quant_gguf, monkeypatch):
    monkeypatch.setenv("TPULLM_NO_REPACK_CACHE", "1")
    ti = _first_quant_info(quant_gguf)
    planes = planes_np_for(ti)
    direct = qmatmul.repack_np(ti.data, ti.ggml_type,
                               ti.shape[1], ti.shape[0])
    for nm in direct:
        np.testing.assert_array_equal(direct[nm], planes[nm])


def test_engine_logits_unchanged_by_cache(quant_gguf, tmp_path, monkeypatch):
    """End-to-end: cold (miss) and warm (hit) loads produce equal logits."""
    import jax.numpy as jnp

    from tpullm.runtime import Engine

    monkeypatch.setenv("TPULLM_REPACK_CACHE_DIR", str(tmp_path / "rc"))
    eng1 = Engine(quant_gguf, mode="quant", max_seq=32)
    ids = [3, 9, 4]
    l1 = np.asarray(eng1.prefill(ids), np.float32)
    eng2 = Engine(quant_gguf, mode="quant", max_seq=32)
    l2 = np.asarray(eng2.prefill(ids), np.float32)
    np.testing.assert_array_equal(l1, l2)


def test_repack_cache_eviction(tmp_path):
    """Size cap deletes oldest entries first (ADVICE r3: unbounded growth)."""
    import os
    import time

    import numpy as np

    from tpullm.models.weights import evict_repack_cache

    root = tmp_path / "repack"
    root.mkdir()
    for i, age in enumerate([30, 20, 10]):  # older → smaller mtime
        d = root / f"entry{i}"
        d.mkdir()
        np.save(d / "qs.npy", np.zeros(256, np.uint8))
        (d / "manifest.txt").write_text("qs\n")
        t = time.time() - age
        os.utime(d, (t, t))
    sizes = sum(
        f.stat().st_size for d in root.iterdir() for f in d.iterdir())
    freed = evict_repack_cache(str(root), max_bytes=sizes // 2)
    assert freed > 0
    left = sorted(p.name for p in root.iterdir())
    assert "entry0" not in left  # oldest gone
    assert "entry2" in left  # newest kept
