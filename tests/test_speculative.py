"""Speculative decoding tests (≡ reference tools/server/tests
unit/test_speculative.py + common/speculative.cpp semantics)."""

import numpy as np
import pytest

from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.runtime import Engine, Sampler, SamplerParams
from tpullm.runtime.speculative import (
    DraftModelSpeculator,
    NgramSpeculator,
    SpecStats,
    generate_speculative,
)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("spec") / "tiny.gguf",
        n_embd=64, n_head=4, n_head_kv=2, n_ff=128, n_layer=2,
    )


def greedy_reference(path, prompt, n):
    eng = Engine(path, mode="dense", max_seq=256)
    ids = eng.tokenizer.tokenize(prompt, add_special=True)
    return ids, list(eng.generate_tokens(ids, n, Sampler(SamplerParams(temp=0.0)),
                                         stop_on_eog=False))


def test_draft_model_same_model_full_acceptance(model_path):
    """Draft == target → every draft accepted, output == plain greedy."""
    ids, ref = greedy_reference(model_path, "the quick brown", 16)

    target = Engine(model_path, mode="dense", max_seq=256)
    draft = Engine(model_path, mode="dense", max_seq=256)
    spec = DraftModelSpeculator(draft, n_draft=4)
    out, stats = generate_speculative(target, spec, ids, max_new_tokens=16,
                                      stop_on_eog=False)
    assert out == ref
    # identical models agree, so acceptance should be (near-)total
    assert stats.n_drafted > 0
    assert stats.accept_rate > 0.9
    # speculative must take far fewer target passes than tokens generated
    assert stats.n_rounds < len(out)


def test_ngram_speculator_matches_greedy(model_path):
    """Ngram drafts may hit or miss, but output must equal plain greedy."""
    ids, ref = greedy_reference(model_path, "the quick brown fox the quick brown", 20)

    target = Engine(model_path, mode="dense", max_seq=256)
    spec = NgramSpeculator(n=3, n_draft=4)
    out, stats = generate_speculative(target, spec, ids, max_new_tokens=20,
                                      stop_on_eog=False)
    assert out == ref


def test_ngram_proposes_on_repetition():
    spec = NgramSpeculator(n=2, n_draft=3, n_min=1)
    # history: A B C A B → propose(B's continuation) after seeing "A B"
    spec.resync([10, 11, 12, 10, 11, 99])  # feeds history [10,11,12,10,11]
    drafts = spec.propose(12, 3)  # sim suffix ...11, 12 → after (11,12) → 10
    assert drafts[:2] == [10, 11]


def test_spec_stats():
    s = SpecStats(n_drafted=10, n_accepted=7)
    assert s.accept_rate == pytest.approx(0.7)


def test_speculative_with_sampling_seeded(model_path):
    """Stochastic sampler: speculative output matches non-speculative output
    for the same seed only when acceptance is exact-match — just check it
    produces valid tokens and respects max_new_tokens."""
    target = Engine(model_path, mode="dense", max_seq=256)
    ids = target.tokenizer.tokenize("hello world", add_special=True)
    spec = NgramSpeculator(n=2, n_draft=3)
    out, stats = generate_speculative(
        target, spec, ids, max_new_tokens=12,
        sampler=Sampler(SamplerParams(temp=0.8, seed=7)), stop_on_eog=False,
    )
    assert 0 < len(out) <= 12
    assert all(0 <= t < target.hp.n_vocab for t in out)


# -- persistent n-gram caches (≡ common/ngram-cache.cpp + tools/lookup) -------


def test_ngram_cache_update_and_vote():
    from tpullm.runtime.ngram_cache import NgramCache, draft_token

    cache = NgramCache()
    seq = [1, 2, 3, 4] * 10  # strongly periodic
    cache.update(seq)
    # after [3, 4] the corpus always continues with 1
    assert draft_token(cache, [3, 4]) == 1
    assert draft_token(cache, [2, 3, 4]) == 1
    # unseen history → no draft
    assert draft_token(cache, [99, 98]) is None


def test_ngram_cache_threshold_rejects_noise():
    from tpullm.runtime.ngram_cache import NgramCache, draft_token

    cache = NgramCache()
    # after (5,) the next token is an even split 6/7 → below min_percent
    cache.update([5, 6, 5, 7, 5, 6, 5, 7])
    assert draft_token(cache, [5]) is None


def test_ngram_cache_save_load_merge(tmp_path):
    from tpullm.runtime.ngram_cache import NgramCache

    a = NgramCache()
    a.update([1, 2, 3, 1, 2, 3])
    b = NgramCache()
    b.update([1, 2, 4])
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    a.save(pa)
    b.save(pb)
    a2 = NgramCache.load(pa)
    assert a2.grams == a.grams
    a2.merge(NgramCache.load(pb))
    # counts add up: (1,2)→3 twice in a, →4 once in b
    assert a2.grams[(1, 2)] == {3: 2, 4: 1}


def test_ngram_cache_speculator_matches_greedy(model_path):
    from tpullm.runtime.ngram_cache import NgramCacheSpeculator

    eng = Engine(model_path, mode="dense", max_seq=256)
    ids = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    base = list(eng.generate_tokens(list(ids), max_new_tokens=16))

    eng.reset()
    spec = NgramCacheSpeculator(n_draft=4)
    out, stats = generate_speculative(eng, spec, list(ids), max_new_tokens=16)
    assert out == base
    assert stats.n_accepted <= stats.n_drafted


def test_lookup_cli_create_merge_stats(model_path, tmp_path, capsys):
    from tpullm.tools.lookup import main as lookup_main

    corpus = tmp_path / "c.txt"
    corpus.write_text("the quick brown fox jumps over the lazy dog " * 5)
    c1 = str(tmp_path / "c1.npz")
    c2 = str(tmp_path / "c2.npz")
    merged = str(tmp_path / "m.npz")
    assert lookup_main(["create", "-m", model_path, "-f", str(corpus), "-o", c1]) == 0
    assert lookup_main(["create", "-m", model_path, "-f", str(corpus), "-o", c2]) == 0
    assert lookup_main(["merge", c1, c2, "-o", merged]) == 0
    assert lookup_main(["stats", merged]) == 0
    out = capsys.readouterr().out
    assert "n-grams:" in out


# -- ngram_mod / ngram_map_k4v strategies (≡ common/ngram-mod.h, ngram-map.h) --


def test_ngram_mod_proposes_on_repetition():
    from tpullm.runtime.speculative import NgramModSpeculator

    spec = NgramModSpeculator(n=2, n_draft=4)
    seq = [1, 2, 3, 4] * 5 + [1]
    spec.resync(seq + [0])  # observe the periodic history (ends ...4 1)
    drafts = spec.propose(2, 4)  # (1,2)→3, (2,3)→4, (3,4)→1
    assert drafts[:3] == [3, 4, 1]


def test_ngram_mod_collision_overwrite():
    from tpullm.runtime.speculative import NgramModSpeculator

    spec = NgramModSpeculator(n=2, n_draft=2, size=1)  # every gram collides
    spec.resync([1, 2, 9, 3, 4, 8, 0])
    # table slot holds only the newest gram (3,4)→8
    assert spec.propose(4, 2) == []  # sim suffix (0,4) ≠ stored key
    spec2 = NgramModSpeculator(n=2, n_draft=2, size=1)
    spec2.resync([1, 2, 9, 3, 4, 8, 0])
    assert spec2.propose(8, 1) == []  # (0,8) not the stored key either


def test_ngram_map_k4v_learns_and_feeds_back():
    from tpullm.runtime.speculative import NgramMapSpeculator

    spec = NgramMapSpeculator(size_ngram=2, size_mgram=3, max_values=4,
                              min_hits=2)
    seq = [7, 8, 1, 2, 3] * 4 + [7]
    spec.resync(seq + [0])  # history ends ...2 3 7
    # cur=8 → key (7,8) has value (1,2,3) with count ≥2 → whole m-gram drafted
    drafts = spec.propose(8, 3)
    assert drafts == [1, 2, 3]
    spec.accept(3)
    key = (7, 8)
    assert spec.map[key][0][2] == 3  # acceptance feedback recorded


def test_ngram_map_k_single_value():
    from tpullm.runtime.speculative import make_speculator

    spec = make_speculator("ngram_map_k")
    assert spec.max_values == 1


def test_make_speculator_names():
    from tpullm.runtime.speculative import make_speculator

    for name in ("ngram_simple", "ngram_mod", "ngram_map_k",
                 "ngram_map_k4v", "ngram_cache"):
        assert make_speculator(name) is not None
    with pytest.raises(ValueError):
        make_speculator("bogus")
    with pytest.raises(ValueError):
        make_speculator("draft")  # needs an engine


def test_align_history_handles_divergence():
    from tpullm.runtime.speculative import _align_history

    h = [1, 2, 3, 4, 5]
    tail = _align_history(h, [1, 2, 9, 10])
    assert h == [1, 2]
    assert tail == [9, 10]
    # plain append case
    h2 = [1, 2]
    assert _align_history(h2, [1, 2, 3]) == [3]


def test_ngram_mod_matches_greedy(model_path):
    from tpullm.runtime.speculative import NgramModSpeculator

    ids, ref = greedy_reference(model_path, "the quick brown fox the quick brown", 20)
    target = Engine(model_path, mode="dense", max_seq=256)
    out, stats = generate_speculative(target, NgramModSpeculator(n=2, n_draft=4),
                                      ids, max_new_tokens=20, stop_on_eog=False)
    assert out == ref
