"""Sampler chain unit tests (≡ reference tests/test-sampling.cpp)."""

import numpy as np
import pytest

from tpullm.runtime.sampling import (
    Sampler,
    SamplerParams,
    apply_dry,
    apply_min_p,
    apply_penalties,
    apply_temp_ext,
    apply_top_k,
    apply_top_n_sigma,
    apply_top_p,
    apply_typical,
    apply_xtc,
    _softmax,
)


def logits_from_probs(probs):
    p = np.asarray(probs, dtype=np.float32)
    return np.log(p / p.sum())


def surviving(logits):
    return set(np.flatnonzero(np.isfinite(logits)).tolist())


def test_top_k():
    l = logits_from_probs([0.1, 0.2, 0.3, 0.4])
    assert surviving(apply_top_k(l.copy(), 2)) == {2, 3}
    assert surviving(apply_top_k(l.copy(), 0)) == {0, 1, 2, 3}  # disabled
    assert surviving(apply_top_k(l.copy(), 100)) == {0, 1, 2, 3}


def test_top_p():
    l = logits_from_probs([0.1, 0.2, 0.3, 0.4])
    # 0.4 + 0.3 >= 0.65 → keep top-2
    assert surviving(apply_top_p(l.copy(), 0.65)) == {2, 3}
    assert surviving(apply_top_p(l.copy(), 1.0)) == {0, 1, 2, 3}


def test_min_p():
    l = logits_from_probs([0.01, 0.19, 0.4, 0.4])
    out = apply_min_p(l.copy(), 0.1)  # keep >= 0.04
    assert surviving(out) == {1, 2, 3}


def test_typical_keeps_mass():
    l = logits_from_probs([0.97, 0.01, 0.01, 0.01])
    out = apply_typical(l.copy(), 0.5)
    assert len(surviving(out)) >= 1
    # uniform distribution: everything is equally typical, all survive
    l = logits_from_probs([0.25] * 4)
    assert surviving(apply_typical(l.copy(), 0.999)) == {0, 1, 2, 3}


def test_top_n_sigma():
    l = np.array([10.0, 9.9, 0.0, -5.0], dtype=np.float32)
    out = apply_top_n_sigma(l.copy(), 1.0)
    assert 0 in surviving(out) and 1 in surviving(out)
    assert 3 not in surviving(out)


def test_xtc_removes_top_keeps_least_probable_above_threshold():
    rng = np.random.default_rng(0)

    class AlwaysFire:
        def random(self):
            return 0.0

    l = logits_from_probs([0.5, 0.3, 0.15, 0.05])
    out = apply_xtc(l.copy(), probability=1.0, threshold=0.2, rng=AlwaysFire())
    # tokens 0 and 1 above threshold → keep only 1 (least probable above)
    assert surviving(out) == {1, 2, 3}
    # never fires when rng >= probability
    out = apply_xtc(l.copy(), probability=0.5, threshold=0.2, rng=type("R", (), {"random": lambda s: 0.9})())
    assert surviving(out) == {0, 1, 2, 3}


def test_penalties_repeat():
    l = np.array([1.0, 2.0, -1.0], dtype=np.float32)
    out = apply_penalties(l.copy(), [1, 2, 2], last_n=10, repeat=2.0, freq=0.0, present=0.0)
    assert out[1] == pytest.approx(1.0)   # positive → divided
    assert out[2] == pytest.approx(-2.0)  # negative → multiplied
    assert out[0] == pytest.approx(1.0)   # untouched


def test_penalties_freq_present():
    l = np.zeros(4, dtype=np.float32)
    out = apply_penalties(l.copy(), [3, 3, 3], last_n=10, repeat=1.0, freq=0.5, present=1.0)
    assert out[3] == pytest.approx(-(0.5 * 3 + 1.0))


def test_dry_penalizes_repetition():
    # context: A B C A B → next "C" would extend a 2-match ("A B")
    ctx = [10, 11, 12, 10, 11]
    l = np.zeros(20, dtype=np.float32)
    out = apply_dry(l.copy(), ctx, multiplier=1.0, base=2.0,
                    allowed_length=2, penalty_last_n=-1, breakers=())
    assert out[12] == pytest.approx(-1.0 * 2.0 ** (2 - 2))
    # other tokens untouched
    assert out[5] == 0.0


def test_dry_respects_breakers():
    ctx = [10, 11, 12, 10, 11]
    l = np.zeros(20, dtype=np.float32)
    out = apply_dry(l.copy(), ctx, multiplier=1.0, base=2.0,
                    allowed_length=2, penalty_last_n=-1, breakers=(11,))
    assert out[12] == 0.0  # match broken at token 11


def test_temp_ext_bounds():
    l = logits_from_probs([0.25] * 4)  # max entropy → temp = temp + delta
    hot = apply_temp_ext(l.copy(), temp=1.0, delta=0.5, exponent=1.0)
    np.testing.assert_allclose(hot, l / 1.5, rtol=1e-5)


def test_logit_bias_and_greedy():
    s = Sampler(SamplerParams(temp=0.0, logit_bias={3: 100.0}))
    assert s.sample(np.zeros(10, dtype=np.float32)) == 3


def test_mirostat_v2_runs_and_adapts():
    s = Sampler(SamplerParams(temp=1.0, mirostat=2, seed=42))
    rng = np.random.default_rng(0)
    toks = []
    for _ in range(20):
        logits = rng.normal(size=100).astype(np.float32)
        t = s.sample(logits)
        s.accept(t)
        toks.append(t)
    assert all(0 <= t < 100 for t in toks)
    assert s._mu is not None and np.isfinite(s._mu)


def test_mirostat_v1_runs():
    s = Sampler(SamplerParams(temp=1.0, mirostat=1, seed=42))
    rng = np.random.default_rng(1)
    for _ in range(10):
        t = s.sample(rng.normal(size=50).astype(np.float32))
        assert 0 <= t < 50
        s.accept(t)


def test_chain_determinism_with_seed():
    logits = np.random.default_rng(7).normal(size=200).astype(np.float32)
    a = Sampler(SamplerParams(temp=0.9, seed=123))
    b = Sampler(SamplerParams(temp=0.9, seed=123))
    assert [a.sample(logits) for _ in range(10)] == [
        b.sample(logits) for _ in range(10)
    ]


def test_constraint_fn_masks():
    calls = []

    def constrain(logits):
        logits[:5] = -np.inf
        return logits

    s = Sampler(SamplerParams(temp=0.0), constraint_fn=constrain,
                constraint_accept=calls.append)
    l = np.zeros(10, dtype=np.float32)
    l[2] = 5.0  # best token, but masked
    tok = s.sample(l)
    assert tok >= 5
    s.accept(tok)
    assert calls == [tok]


def test_softmax_normalizes():
    p = _softmax(np.array([1.0, 2.0, -np.inf], dtype=np.float32))
    assert p[2] == 0.0
    assert p.sum() == pytest.approx(1.0)
