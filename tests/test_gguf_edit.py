"""Interactive GGUF editor (≡ gguf_editor_gui.py as a REPL): staged edits,
atomic save, reload."""

import io

from tpullm.gguf.reader import GGUFReader
from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.tools.gguf_edit import Editor


def test_editor_session_roundtrip(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "t.gguf", n_layer=1, n_embd=64,
                                n_head=4, n_head_kv=2, n_ff=96)
    script = "\n".join([
        "list general.",
        "get general.name",
        "set general.name edited-model",
        "set custom.answer 42",
        "set custom.floats [1.5, 2.5]",
        "rename general.name general.renamed",
        "del tokenizer.ggml.add_bos_token",
        "tensors blk.0.attn",
        "save",
        "quit",
    ]) + "\n"
    out = io.StringIO()
    ed = Editor(str(path))
    ed.run(inp=io.StringIO(script), out=out)
    text = out.getvalue()
    assert "staged: general.name" in text
    assert "wrote" in text

    r = GGUFReader(str(path))
    assert r.metadata["general.renamed"] == "edited-model"
    assert r.metadata["custom.answer"] == 42
    assert list(r.metadata["custom.floats"]) == [1.5, 2.5]
    assert "general.name" not in r.metadata
    assert "tokenizer.ggml.add_bos_token" not in r.metadata
    # tensors copied through untouched; the file still loads end to end
    assert len(r.tensors) == 12


def test_editor_quit_discards(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "t2.gguf", n_layer=1, n_embd=64,
                                n_head=4, n_head_kv=2, n_ff=96)
    out = io.StringIO()
    Editor(str(path)).run(
        inp=io.StringIO("set general.name nope\nquit\n"), out=out)
    assert "unsaved changes discarded" in out.getvalue()
    assert GGUFReader(str(path)).metadata["general.name"] != "nope"
