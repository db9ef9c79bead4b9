"""Training subsystem: dataset, fit() loop, finetune CLI, LoRA-only
training (≡ the reference's ggml-opt dataset/epoch/fit APIs and
examples/training/finetune.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.training import Dataset


def test_dataset_windows_split_batches():
    toks = np.arange(100)
    ds = Dataset.from_tokens(toks, seq_len=10)
    assert ds.ndata == 10 and ds.seq_len == 10
    train, ev = ds.split(0.2)
    assert train.ndata == 8 and ev.ndata == 2
    # eval is the BACK of the dataset (ggml_opt_epoch idata_split)
    np.testing.assert_array_equal(ev.windows[0], toks[80:90])
    batches = list(train.batches(3, rng=np.random.default_rng(0)))
    assert len(batches) == 2 and batches[0].shape == (3, 10)
    # shuffle covers datapoints without duplication
    seen = {tuple(w) for b in batches for w in b}
    assert len(seen) == 6


def test_dataset_overlap_stride():
    ds = Dataset.from_tokens(np.arange(30), seq_len=10, stride=5)
    assert ds.ndata == 5
    np.testing.assert_array_equal(ds.windows[1], np.arange(5, 15))


def _corpus():
    return "the quick brown fox jumps over the lazy dog " * 30


def test_fit_loss_decreases(tmp_path):
    from tpullm.gguf.reader import GGUFReader
    from tpullm.models.registry import get_arch, load_hparams
    from tpullm import tokenizer as tokenizer_mod
    from tpullm.training import OptimConfig, fit

    path = make_tiny_llama_gguf(tmp_path / "m.gguf")
    r = GGUFReader(path)
    hp = load_hparams(r)
    arch = get_arch(hp.arch)
    tok = tokenizer_mod.from_gguf(r)
    params = arch.build_params(r, hp, mode="dense", dtype=jnp.float32)
    ds = Dataset.from_text(tok, _corpus(), seq_len=32)
    stats_seen = []
    params, hist = fit(arch.forward, hp, params, ds,
                       cfg=OptimConfig(lr=3e-3), epochs=3, batch_size=2,
                       val_split=0.2, callback=stats_seen.append)
    assert len(hist) == 3 == len(stats_seen)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert "eval_loss" in hist[-1] and np.isfinite(hist[-1]["eval_loss"])
    assert 0.0 <= hist[-1]["eval_accuracy"] <= 1.0


def test_finetune_cli_full_roundtrip(tmp_path):
    """finetune → saved GGUF reloads and generates (≡ finetune.cpp
    checkpoint flow)."""
    from tpullm.runtime import Engine
    from tpullm.training.finetune import main as ft_main

    path = make_tiny_llama_gguf(tmp_path / "m.gguf")
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(_corpus())
    out = tmp_path / "trained.gguf"
    rc = ft_main(["-m", str(path), "-f", str(corpus), "-o", str(out),
                  "--epochs", "1", "--batch", "2", "--seq-len", "32",
                  "--lr", "1e-3", "--val-split", "0.2",
                  "--outtype", "f32"])
    assert rc == 0 and out.exists()
    eng = Engine(str(out), mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    text = eng.generate("the quick", max_new_tokens=4)
    assert isinstance(text, str)


def test_finetune_cli_lora_only(tmp_path):
    """--lora-rank trains ONLY adapter factors; base weights stay
    bit-identical; the adapter GGUF applies through --lora machinery and
    changes logits."""
    from tpullm.gguf.reader import GGUFReader
    from tpullm.models.lora import apply_lora, load_lora_gguf
    from tpullm.models.registry import get_arch, load_hparams
    from tpullm.runtime import Engine
    from tpullm.training.finetune import main as ft_main

    path = make_tiny_llama_gguf(tmp_path / "m.gguf")
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(_corpus())
    out = tmp_path / "adapter.gguf"
    rc = ft_main(["-m", str(path), "-f", str(corpus), "-o", str(out),
                  "--epochs", "2", "--batch", "2", "--seq-len", "32",
                  "--lr", "5e-3", "--val-split", "0.0",
                  "--lora-rank", "4"])
    assert rc == 0 and out.exists()
    ad = load_lora_gguf(str(out))
    assert ad.tensors and all(a.shape[0] == 4 for a, _ in ad.tensors.values())
    # b started zero and trained away from it
    assert any(np.abs(b).max() > 0 for _, b in ad.tensors.values())

    ids = [3, 17, 42, 7]
    base = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    ref = np.asarray(base.prefill_all_logits(ids))
    r = GGUFReader(path)
    hp = load_hparams(r)
    arch = get_arch(hp.arch)
    params = arch.build_params(r, hp, mode="dense", dtype=jnp.float32)
    params = apply_lora(params, ad, dtype=jnp.float32)
    adapted = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                     kv_dtype=jnp.float32)
    adapted.params = params
    got = np.asarray(adapted.prefill_all_logits(ids))
    assert np.abs(got - ref).max() > 1e-5  # the adapter does something


def test_fit_trainable_mask_freezes(tmp_path):
    """fit(trainable=...) leaves masked-out leaves bit-identical
    (≡ llama_opt_init param filtering)."""
    from tpullm.gguf.reader import GGUFReader
    from tpullm.models.registry import get_arch, load_hparams
    from tpullm import tokenizer as tokenizer_mod
    from tpullm.training import OptimConfig, fit

    path = make_tiny_llama_gguf(tmp_path / "m.gguf")
    r = GGUFReader(path)
    hp = load_hparams(r)
    arch = get_arch(hp.arch)
    tok = tokenizer_mod.from_gguf(r)
    params = arch.build_params(r, hp, mode="dense", dtype=jnp.float32)
    emb_before = np.asarray(params["tok_embd"]).copy()
    wq_before = np.asarray(params["layers"][0]["wq"].w).copy()
    ds = Dataset.from_text(tok, _corpus(), seq_len=32)

    from jax.tree_util import DictKey

    def only_embedding(path_, leaf):
        return any(isinstance(k, DictKey) and k.key == "tok_embd"
                   for k in path_)

    params, hist = fit(arch.forward, hp, params, ds,
                       cfg=OptimConfig(lr=3e-3), epochs=1, batch_size=2,
                       trainable=only_embedding)
    assert np.abs(np.asarray(params["tok_embd"]) - emb_before).max() > 0
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["wq"].w), wq_before)


def test_finetune_moe_save_roundtrip(tmp_path):
    """Full-weight finetune of a MoE model saves router/expert/shexp
    tensors (review finding: they previously copied through untrained)."""
    from tpullm.gguf.reader import GGUFReader
    from tpullm.models.registry import get_arch, load_hparams
    from tpullm.models.testing import make_tiny_moe_gguf
    from tpullm import tokenizer as tokenizer_mod
    from tpullm.training import Dataset, OptimConfig, fit
    from tpullm.training.save import save_dense_gguf

    path = make_tiny_moe_gguf(tmp_path / "m.gguf", arch="qwen2moe",
                              n_layer=2, n_ff_shexp=48, gated_shexp=True)
    r = GGUFReader(path)
    hp = load_hparams(r)
    arch = get_arch(hp.arch)
    tok = tokenizer_mod.from_gguf(r)
    params = arch.build_params(r, hp, mode="dense", dtype=jnp.float32)
    before = np.asarray(
        r.tensors["blk.0.ffn_gate_exps.weight"].to_numpy(), np.float32)
    ds = Dataset.from_text(tok, _corpus(), seq_len=32)
    params, _ = fit(arch.forward, hp, params, ds,
                    cfg=OptimConfig(lr=5e-3), epochs=1, batch_size=2)
    out = str(tmp_path / "trained.gguf")
    save_dense_gguf(r, hp, params, out, outtype="f32")
    r2 = GGUFReader(out)
    after = np.asarray(
        r2.tensors["blk.0.ffn_gate_exps.weight"].to_numpy(), np.float32)
    assert np.abs(after - before).max() > 0  # experts actually trained
    for stem in ("ffn_gate_inp.weight", "ffn_gate_shexp.weight",
                 "ffn_gate_inp_shexp.weight"):
        assert f"blk.0.{stem}" in r2.tensors


def test_fit_raises_on_empty_train_split(tmp_path):
    from tpullm.gguf.reader import GGUFReader
    from tpullm.models.registry import get_arch, load_hparams
    from tpullm.training import Dataset, fit

    path = make_tiny_llama_gguf(tmp_path / "m.gguf")
    r = GGUFReader(path)
    hp = load_hparams(r)
    arch = get_arch(hp.arch)
    params = arch.build_params(r, hp, mode="dense", dtype=jnp.float32)
    ds = Dataset.from_tokens(np.arange(40), seq_len=32)  # one window
    with pytest.raises(ValueError, match="zero optimizer steps"):
        fit(arch.forward, hp, params, ds, epochs=1, batch_size=2)
