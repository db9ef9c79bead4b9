"""CLI tools smoke tests: gguf-dump, quantize (roundtrip), cli generation,
perplexity, chat templates."""

import json
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.chat import apply_chat_template
from tpullm.gguf import GGMLType, GGUFReader
from tpullm.models.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("t") / "tiny.gguf",
        n_embd=256, n_head=4, n_head_kv=2, n_ff=256, n_layer=2,
    )


def test_gguf_dump(tiny, capsys):
    from tpullm.tools.gguf_dump import main

    assert main([str(tiny), "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["version"] == 3
    assert any(t["name"] == "token_embd.weight" for t in out["tensors"])


def test_quantize_roundtrip(tiny, tmp_path):
    from tpullm.tools.quantize import quantize_model

    dst = tmp_path / "q4km.gguf"
    stats = quantize_model(str(tiny), str(dst), "Q4_K_M", verbose=False)
    assert stats["out_bytes"] < stats["in_bytes"] / 2

    r = GGUFReader(dst)
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q4_K
    # _M recipe upgrades attn_v on the use_more_bits layer pattern
    # (llama-quant.cpp:185-187): for n_layer=2 that is the last layer only;
    # output head goes to Q6_K
    assert r.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.Q4_K
    assert r.tensors["blk.1.attn_v.weight"].ggml_type == GGMLType.Q6_K
    assert r.tensors["blk.1.ffn_down.weight"].ggml_type == GGMLType.Q6_K
    assert r.tensors["output.weight"].ggml_type == GGMLType.Q6_K
    assert r.tensors["output_norm.weight"].ggml_type == GGMLType.F32
    assert r.metadata["general.file_type"] == 15

    # the quantized model still loads and runs
    from tpullm.runtime import Engine

    eng = Engine(dst, mode="quant", max_seq=64)
    ids = eng.tokenizer.tokenize("hello", add_special=True)
    logits = eng.prefill(ids)
    assert np.isfinite(logits).all()


def test_cli_completion(tiny, capsys, monkeypatch):
    from tpullm.tools.cli import main

    rc = main(["-m", str(tiny), "-p", "the quick", "-n", "4", "--temp", "0",
               "--mode", "dense"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("the quick")


def test_perplexity_runs(tiny):
    from tpullm.runtime import Engine
    from tpullm.tools.perplexity import perplexity

    eng = Engine(tiny, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    text = "the quick brown fox jumps over the lazy dog " * 40
    ppl, n = perplexity(eng, text, n_ctx=32, max_windows=2)
    assert np.isfinite(ppl) and ppl > 1.0
    assert n > 0


def test_chat_template_builtin():
    msgs = [{"role": "system", "content": "be nice"},
            {"role": "user", "content": "hi"}]
    out = apply_chat_template(None, msgs)
    assert "<|im_start|>user\nhi<|im_end|>" in out
    assert out.endswith("<|im_start|>assistant\n")

    out = apply_chat_template("...<|start_header_id|>...", msgs, add_generation_prompt=True)
    assert "<|start_header_id|>user<|end_header_id|>" in out


def test_chat_template_jinja():
    tpl = (
        "{% for m in messages %}<{{ m.role }}>{{ m.content }}</{{ m.role }}>"
        "{% endfor %}{% if add_generation_prompt %}<assistant>{% endif %}"
    )
    out = apply_chat_template(tpl, [{"role": "user", "content": "yo"}])
    assert out == "<user>yo</user><assistant>"


def test_gguf_split_merge_roundtrip(tiny, tmp_path):
    """Shard, transparently load shard-1, merge back (≡ tools/gguf-split)."""
    import numpy as np

    from tpullm.tools.gguf_split import merge_model, split_model

    paths = split_model(str(tiny), str(tmp_path / "shard"), max_tensors=5,
                        verbose=False)
    assert len(paths) > 1
    assert paths[0].endswith("-00001-of-%05d.gguf" % len(paths))

    # reader absorbs all shards from shard 1
    r_full = GGUFReader(tiny)
    r_split = GGUFReader(paths[0])
    assert set(r_split.tensors) == set(r_full.tensors)
    np.testing.assert_array_equal(
        r_split.tensors["token_embd.weight"].to_numpy(),
        r_full.tensors["token_embd.weight"].to_numpy(),
    )

    # the engine can run straight off the sharded file
    from tpullm.runtime import Engine

    eng = Engine(paths[0], mode="dense", max_seq=64)
    assert isinstance(eng.generate("the quick", max_new_tokens=2), str)

    merged = tmp_path / "merged.gguf"
    merge_model(paths[0], str(merged), verbose=False)
    r_m = GGUFReader(merged)
    assert set(r_m.tensors) == set(r_full.tensors)
    assert "split.count" not in r_m.metadata


def test_tokenize_cli(tiny, capsys):
    from tpullm.tools.tokenize import main

    assert main(["-m", str(tiny), "-p", "hello world", "--ids"]) == 0
    out = capsys.readouterr().out
    ids = eval(out.strip())
    assert isinstance(ids, list) and len(ids) > 0


def test_fit_params(tiny):
    from tpullm.runtime.fit import fit_params

    res = fit_params(tiny, want_seq=4096, want_slots=2, hbm_bytes=16 * 2**30)
    assert res.fits
    assert res.max_seq == 4096 and res.n_slots == 2
    assert res.weight_bytes > 0 and res.kv_bytes_per_token > 0

    # tiny HBM: sheds slots, then context
    res2 = fit_params(tiny, want_seq=4096, want_slots=4,
                      hbm_bytes=int(res.weight_bytes * 1.2)
                      + 2 * res.kv_bytes_per_token * 4096)
    assert res2.max_seq < 4096 or res2.n_slots < 4


def test_cli_prompt_cache_roundtrip(tiny, tmp_path, capsys, monkeypatch):
    """--prompt-cache restores a prefix on the second run (≡ completion
    --prompt-cache session files)."""
    from tpullm.tools.cli import main as cli_main

    cache = str(tmp_path / "session.npz")
    args = ["-m", str(tiny), "-p", "the quick brown", "-n", "4", "--temp", "0",
            "--mode", "dense", "-c", "128", "--prompt-cache", cache,
            "--no-display-prompt"]
    assert cli_main(args) == 0
    out1 = capsys.readouterr()
    assert "saved" in out1.err

    assert cli_main(args) == 0
    out2 = capsys.readouterr()
    assert "reused" in out2.err
    assert out2.out == out1.out  # deterministic greedy continuation


def test_override_kv_and_preset(tiny, tmp_path, capsys):
    from tpullm.runtime import Engine
    from tpullm.tools.cli import main as cli_main, parse_kv_overrides

    ov = parse_kv_overrides(["llama.rope.freq_base=float:99.5",
                             "x.flag=bool:true", "x.n=int:7", "x.s=str:hi"])
    assert ov == {"llama.rope.freq_base": 99.5, "x.flag": True,
                  "x.n": 7, "x.s": "hi"}

    eng = Engine(tiny, mode="dense", max_seq=64,
                 override_kv={"llama.rope.freq_base": 99.5})
    assert eng.hp.rope.freq_base == 99.5

    preset = tmp_path / "p.ini"
    preset.write_text("n-predict = 3\ntemp = 0\nmode = dense\n")
    rc = cli_main(["-m", str(tiny), "-p", "the quick", "--preset", str(preset),
                   "--no-display-prompt"])
    assert rc == 0


def test_multiple_choice_scoring(tiny):
    """Ending = the model's own greedy continuation must win the choice
    (≡ perplexity.cpp hellaswag scoring mechanics)."""
    from tpullm.runtime import Engine, Sampler, SamplerParams
    from tpullm.tools.perplexity import multiple_choice_accuracy

    eng = Engine(tiny, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    context = "the quick brown"
    ids = eng.tokenizer.tokenize(context, add_special=True)
    greedy = list(eng.generate_tokens(ids, 4, Sampler(SamplerParams(temp=0.0)),
                                      stop_on_eog=False))
    good = eng.tokenizer.detokenize(greedy)
    tasks = [{"context": context,
              "endings": [" zxqj vvk wqx", good, " lorem ipsum dolor"],
              "label": 1}]
    acc = multiple_choice_accuracy(eng, tasks)
    assert acc == 1.0


def test_streaming_tool_call_parser():
    """Token-by-token feed splits content from incremental tool-call
    argument deltas (≡ chat-parser streaming)."""
    from tpullm.chat import StreamingToolCallParser

    text = ('I will check. <tool_call>{"name": "get_weather", '
            '"arguments": {"city": "Paris", "unit": "C"}}</tool_call> done')
    p = StreamingToolCallParser()
    events = []
    for i in range(0, len(text), 3):  # jagged 3-char pieces
        events.extend(p.feed(text[i:i + 3]))
    events.extend(p.flush())

    content = "".join(e[1] for e in events if e[0] == "content")
    assert content == "I will check.  done"
    starts = [e for e in events if e[0] == "tool_start"]
    assert starts == [("tool_start", 0, "get_weather")]
    args = "".join(e[2] for e in events if e[0] == "tool_args")
    import json as _json
    assert _json.loads(args) == {"city": "Paris", "unit": "C"}
    assert p.saw_tool_call


def test_streaming_tool_call_parser_truncated():
    """A call cut off mid-arguments still finalizes via partial-JSON
    healing on flush."""
    from tpullm.chat import StreamingToolCallParser

    p = StreamingToolCallParser()
    events = list(p.feed('<tool_call>{"name": "f", "arguments": {"x": 1'))
    events += p.flush()
    assert ("tool_start", 0, "f") in events
    args = "".join(e[2] for e in events if e[0] == "tool_args")
    import json as _json
    assert _json.loads(args) == {"x": 1}


def test_streaming_tool_call_parser_plain_content():
    from tpullm.chat import StreamingToolCallParser

    p = StreamingToolCallParser()
    events = list(p.feed("hello <tool")) + list(p.feed("ish> world"))
    events += p.flush()
    assert "".join(e[1] for e in events if e[0] == "content") == "hello <toolish> world"
    assert not p.saw_tool_call


def test_eval_callback_dump(tmp_path, capsys):
    """Per-op tensor dump (≡ examples/eval-callback): instrumented eager
    forward prints one row per shared-op invocation, logits last."""
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.tools import eval_callback

    path = make_tiny_llama_gguf(tmp_path / "m.gguf")
    rc = eval_callback.main(["-m", str(path), "-p", "the quick", "--limit", "9"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) >= 9
    assert any("rms_norm" in ln for ln in lines)
    assert any("apply_rope" in ln for ln in lines)
    # instrumentation must fully unwind
    from tpullm.ops import norms

    assert norms.rms_norm.__name__ == "rms_norm"


def test_gguf_hash_tool(tiny, capsys):
    """Per-tensor + overall hashes are deterministic and value-sensitive
    (≡ gguf-py gguf_hash.py)."""
    from tpullm.tools.gguf_hash import hash_gguf

    h1 = hash_gguf(tiny, ["blake2b64", "sha256"])
    capsys.readouterr()
    h2 = hash_gguf(tiny, ["blake2b64", "sha256"])
    assert h1 == h2 and len(h1["sha256"]) == 64 and "uuid" in h1


def test_gguf_metadata_tool(tiny, tmp_path, capsys):
    """KV add/override/remove with tensor passthrough; edited file still
    loads and generates (≡ gguf_new_metadata.py / gguf_set_metadata.py)."""
    import jax.numpy as jnp

    from tpullm.gguf.reader import GGUFReader
    from tpullm.runtime import Engine
    from tpullm.tools.gguf_metadata import main as meta_main

    out = str(tmp_path / "edited.gguf")
    rc = meta_main([tiny, out, "--set", "general.name=renamed",
                    "--set", "custom.answer=42",
                    "--remove", "general.name_missing_ok"])
    assert rc == 0
    r = GGUFReader(out)
    assert r.metadata["general.name"] == "renamed"
    assert r.metadata["custom.answer"] == 42
    src = GGUFReader(tiny)
    assert set(r.tensors) == set(src.tensors)
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert isinstance(eng.generate("the quick", max_new_tokens=2), str)
