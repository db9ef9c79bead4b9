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
