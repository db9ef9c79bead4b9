"""imatrix collection/weighted-quantization + bench tool tests
(≡ reference tools/imatrix + tools/llama-bench smoke coverage)."""

import numpy as np
import pytest

from tpullm.models.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("im") / "m.gguf",
        n_embd=64, n_head=4, n_head_kv=2, n_ff=128, n_layer=2,
    )


def test_imatrix_collect_and_roundtrip(model, tmp_path):
    from tpullm.tools.imatrix import collect_imatrix, load_imatrix, save_imatrix

    rng = np.random.default_rng(0)
    tokens = rng.integers(3, 200, size=96).tolist()
    stats = collect_imatrix(model, tokens, chunk_size=32, verbose=False)
    assert stats["chunk_count"] == 3
    assert "blk.0.ffn_up.weight" in stats["sums"]
    assert stats["sums"]["blk.0.ffn_up.weight"].shape == (64,)
    assert (stats["sums"]["blk.0.ffn_up.weight"] >= 0).all()

    f = tmp_path / "im.gguf"
    save_imatrix(f, stats, dataset="synthetic")
    loaded = load_imatrix(f)
    np.testing.assert_allclose(
        loaded["blk.0.ffn_up.weight"],
        stats["sums"]["blk.0.ffn_up.weight"] / stats["counts"]["blk.0.ffn_up.weight"],
        rtol=1e-5,
    )


def test_imatrix_weighted_quantization_improves_weighted_error(tmp_path):
    """Channels marked important by the imatrix must quantize better."""
    from tpullm.gguf.constants import GGMLType, TYPE_TRAITS
    from tpullm.quant import codecs

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((8, 256)) * 0.2).astype(np.float32)
    qw = np.ones((8, 256), dtype=np.float32)
    qw[:, :64] = 100.0  # first channels matter most

    plain = codecs.quantize(x.reshape(-1), GGMLType.Q4_K)
    weighted = codecs.quantize(x.reshape(-1), GGMLType.Q4_K, qw=qw.reshape(-1))
    assert not np.array_equal(plain, weighted)

    tt = TYPE_TRAITS[GGMLType.Q4_K]

    def werr(packed):
        y = codecs.dequantize(packed, GGMLType.Q4_K, x.size).reshape(8, 256)
        return float((qw * (y - x) ** 2).sum())

    assert werr(weighted) <= werr(plain)


def test_quantize_model_with_imatrix(tmp_path):
    from tpullm.tools.imatrix import collect_imatrix, save_imatrix, load_imatrix
    from tpullm.tools.quantize import quantize_model
    from tpullm.runtime import Engine

    # rows must divide the 256-element superblock for K-quants to apply
    model = make_tiny_llama_gguf(tmp_path / "m256.gguf", n_embd=256, n_head=4,
                                 n_head_kv=2, n_ff=256, n_layer=2)
    tokens = np.random.default_rng(0).integers(3, 200, size=64).tolist()
    stats = collect_imatrix(model, tokens, chunk_size=32, verbose=False)
    imf = tmp_path / "im.gguf"
    save_imatrix(imf, stats)

    dst = tmp_path / "q.gguf"
    out = quantize_model(model, str(dst), "Q4_K_M", verbose=False,
                         imatrix=load_imatrix(imf))
    assert out["out_bytes"] < out["in_bytes"]
    eng = Engine(str(dst), mode="quant", max_seq=64)
    assert isinstance(eng.generate("the quick", max_new_tokens=4), str)


def test_bench_tool_runs(model, capsys):
    from tpullm.tools.bench import main

    rc = main(["-m", str(model), "-p", "16", "-n", "4", "-r", "1",
               "-c", "64", "--mode", "dense", "-o", "json"])
    assert rc == 0
    import json

    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["pp_ts"] > 0 and rows[0]["tg_ts"] > 0


# slow: runs the fork's verbatim bench recipe end-to-end (~130s);
# test_batched_bench_tool_runs keeps the tool fast-covered
@pytest.mark.slow
def test_bench_fork_recipe_flags(model, capsys):
    """The MI50 fork's exact bench recipe must run: -fa 1 -ctk q8_0 with
    depth rows and sql/jsonl history output (≡ llama-bench.cpp:313-356,403
    + SCRIPT_llama_bench.sh), shrunk to fixture sizes."""
    from tpullm.tools.bench import main

    rc = main(["-m", str(model), "-fa", "1", "-ctk", "q8_0",
               "-p", "8", "-n", "2", "-d", "0,8", "-r", "1",
               "-c", "64", "--mode", "dense", "-o", "jsonl"])
    assert rc == 0
    import json

    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["n_depth"] for r in rows} == {0, 8}
    assert all(r["type_kv"] == "q8_0" and r["fa"] == 1 for r in rows)
    assert all(r["tg_ts"] > 0 for r in rows)

    rc = main(["-m", str(model), "-p", "8", "-n", "0", "-r", "1",
               "-c", "64", "--mode", "dense", "-o", "sql"])
    assert rc == 0
    sql = capsys.readouterr().out
    assert "CREATE TABLE IF NOT EXISTS bench" in sql
    assert "INSERT INTO bench" in sql
    import sqlite3

    db = sqlite3.connect(":memory:")
    db.executescript(sql)  # the dump must be valid SQLite
    assert db.execute("SELECT COUNT(*) FROM bench").fetchone()[0] == 1


def test_batched_bench_tool_runs(model, capsys):
    from tpullm.tools.batched_bench import main

    rc = main(["-m", str(model), "-npp", "8", "-ntg", "4", "-npl", "1,2",
               "-c", "64", "--mode", "dense", "-o", "json"])
    assert rc == 0
    import json

    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 2
    assert all(r["tg_ts"] > 0 for r in rows)


def test_kl_divergence_base_and_compare(tmp_path):
    """--kl-divergence-base then --kl-divergence: same model → KLD ~0,
    quantized model → small positive KLD (≡ reference perplexity KLD mode)."""
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.tools.perplexity import main as ppl_main

    model = make_tiny_llama_gguf(tmp_path / "m.gguf")
    corpus = tmp_path / "c.txt"
    corpus.write_text("the quick brown fox jumps over the lazy dog " * 40)
    base = str(tmp_path / "base.npz")
    rc = ppl_main(["-m", model, "-f", str(corpus), "-c", "32",
                   "--max-windows", "2", "--kl-divergence-base", base])
    assert rc == 0
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = ppl_main(["-m", model, "-f", str(corpus), "-c", "32",
                       "--max-windows", "2", "--kl-divergence", base,
                       "--json"])
    assert rc == 0
    import json as _json

    res = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["kld"] < 1e-3  # same model, f16-rounded logits
    assert res["same_top_p"] > 0.99


def test_compare_bench_tool(tmp_path, capsys):
    """tpullm-compare-bench diffs two bench JSON runs with noise-band
    significance (≡ scripts/compare-llama-bench.py)."""
    import json

    from tpullm.tools.compare_bench import main as cmp_main

    old = [{"model": "m.gguf", "mode": "dense", "n_prompt": 32, "n_gen": 8,
            "pp_ts": 100.0, "pp_stddev": 2.0, "tg_ts": 10.0,
            "tg_stddev": 0.5}]
    new = [{"model": "/elsewhere/m.gguf", "mode": "dense", "n_prompt": 32,
            "n_gen": 8, "pp_ts": 120.0, "pp_stddev": 2.0, "tg_ts": 10.2,
            "tg_stddev": 0.5}]
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    assert cmp_main([str(a), str(b), "-o", "json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["pp_ts"]["speedup"] == 1.2
    assert rows[0]["pp_ts"]["significant"] is True  # 20 > 2+2
    assert rows[0]["tg_ts"]["significant"] is False  # 0.2 < 0.5+0.5
    assert cmp_main([str(a), str(b)]) == 0  # markdown mode renders
