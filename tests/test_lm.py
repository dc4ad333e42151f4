"""Unigram-LM quality scoring (webval.lm): exact parity with a pure-Python
oracle, vocabulary truncation determinism, and model serialization."""

import math

import numpy as np
import pyarrow as pa
import pytest

from webval.lm import UnigramLM, fit_unigram_lm, score_unigram_lm

TEXTS = [
    "the cat sat on the mat",
    "the dog ate the cat",
    "a b c a b a",
    "",           # zero tokens
    None,         # null text
    "THE Cat!",   # case + punctuation fold into the same tokens
]


def _tok(t):
    import re
    if t is None:
        return []
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _oracle_lm(texts, vocab_size=None):
    from collections import Counter
    c = Counter(w for t in texts for w in _tok(t))
    total = sum(c.values())
    items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    if vocab_size is not None:
        items = items[:vocab_size]
    v = len(items)
    denom = total + v + 1
    logp = {w: math.log((n + 1) / denom) for w, n in items}
    return logp, math.log(1 / denom), total


def _ds(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_fit_matches_oracle(ray_session):
    lm = fit_unigram_lm(_ds(TEXTS), "text")
    want_logp, want_oov, want_total = _oracle_lm(TEXTS)
    assert lm.total_tokens == want_total
    assert lm.oov_logp == pytest.approx(want_oov, abs=1e-12)
    got = dict(zip(lm.vocab.column("term").to_pylist(),
                   lm.vocab.column("logp").to_pylist()))
    assert got.keys() == want_logp.keys()
    for w, lp in want_logp.items():
        assert got[w] == pytest.approx(lp, abs=1e-12)


def test_score_matches_oracle(ray_session):
    lm = fit_unigram_lm(_ds(TEXTS), "text")
    logp, oov, _ = _oracle_lm(TEXTS)
    out = score_unigram_lm(_ds(TEXTS), lm).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(TEXTS):
        toks = _tok(t)
        assert out["n_tokens"][i] == len(toks)
        if not toks:
            assert np.isnan(out["nll"][i])
        else:
            want = -sum(logp.get(w, oov) for w in toks) / len(toks)
            assert out["nll"][i] == pytest.approx(want, abs=1e-12)


def test_vocab_truncation_scores_oov(ray_session):
    # vocab_size=2 keeps ("the", "a"? ...) by (count DESC, term ASC);
    # everything else scores as OOV but total_tokens still counts them
    lm = fit_unigram_lm(_ds(TEXTS), "text", vocab_size=2)
    logp, oov, total = _oracle_lm(TEXTS, vocab_size=2)
    assert lm.vocab.num_rows == 2
    assert lm.total_tokens == total
    assert set(lm.vocab.column("term").to_pylist()) == set(logp)
    out = score_unigram_lm(_ds(TEXTS), lm).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    toks = _tok(TEXTS[0])
    want = -sum(logp.get(w, oov) for w in toks) / len(toks)
    assert out["nll"][0] == pytest.approx(want, abs=1e-12)


def test_model_round_trip(ray_session):
    lm = fit_unigram_lm(_ds(TEXTS), "text", vocab_size=3)
    lm2 = UnigramLM.from_dict(lm.to_dict())
    assert lm2.vocab.equals(lm.vocab)
    assert lm2.oov_logp == lm.oov_logp
    assert lm2.total_tokens == lm.total_tokens
    a = score_unigram_lm(_ds(TEXTS), lm).to_pandas().sort_values("doc_id")
    b = score_unigram_lm(_ds(TEXTS), lm2).to_pandas().sort_values("doc_id")
    assert np.array_equal(a["nll"].to_numpy(), b["nll"].to_numpy(),
                          equal_nan=True)


def test_empty_corpus(ray_session):
    lm = fit_unigram_lm(_ds(["", None]), "text")
    assert lm.total_tokens == 0 and lm.vocab.num_rows == 0
    out = score_unigram_lm(_ds(["", None]), lm).to_pandas()
    assert (out["n_tokens"] == 0).all() and out["nll"].isna().all()

def test_fit_distributed_topk_no_driver_concat(ray_session, monkeypatch):
    """Above the driver_vocab_max gate the fit must (a) use the
    distributed top-k selection, (b) never concat the full term table on
    the driver, and (c) produce the model the driver-sort path produces."""
    import webval.lm as lm_mod

    rng = np.random.default_rng(7)
    # ~600 distinct terms with a zipf-ish skew, across 300 docs
    words = [f"w{i:03d}" for i in range(600)]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 30),
                                 p=None).tolist()) for _ in range(300)]
    ds = _ds(texts)

    calls = {"distributed": 0}
    real = lm_mod._collect_topk_distributed

    def spy(counts, k):
        calls["distributed"] += 1
        out = real(counts, k)
        # the pruned collect is bounded by 4k, never the full vocabulary
        assert out.num_rows <= k
        return out

    monkeypatch.setattr(lm_mod, "_collect_topk_distributed", spy)
    # gate of 50 distinct terms forces the distributed path (vocab ~600)
    got = fit_unigram_lm(ds, "text", vocab_size=40, driver_vocab_max=50)
    assert calls["distributed"] == 1
    want = fit_unigram_lm(ds, "text", vocab_size=40)   # driver-sort path
    assert got.total_tokens == want.total_tokens
    assert got.oov_logp == want.oov_logp
    assert got.vocab.column("term").to_pylist() == \
        want.vocab.column("term").to_pylist()
    assert got.vocab.column("logp").to_pylist() == \
        want.vocab.column("logp").to_pylist()


def test_fit_default_vocab_bounded_above_gate(ray_session, monkeypatch):
    """vocab_size=None above the gate must cap at DEFAULT_VOCAB_CAP via
    the distributed path instead of collecting the open vocabulary."""
    import webval.lm as lm_mod

    texts = [" ".join(f"t{i}x{j}" for j in range(20)) for i in range(50)]
    seen = {}
    real = lm_mod._collect_topk_distributed

    def spy(counts, k):
        seen["k"] = k
        return real(counts, k)

    monkeypatch.setattr(lm_mod, "_collect_topk_distributed", spy)
    lm = fit_unigram_lm(_ds(texts), "text", driver_vocab_max=10)
    assert seen["k"] == lm_mod.DEFAULT_VOCAB_CAP
    assert lm.vocab.num_rows == 1000          # full vocab < cap: all kept
    assert lm.total_tokens == 1000


def _oracle_bigram_nll(texts, lam=0.5):
    """Pure-python interpolated bigram scores per doc."""
    from collections import Counter
    uni = Counter(w for t in texts for w in _tok(t))
    big = Counter()
    for t in texts:
        ws = _tok(t)
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    total = sum(uni.values())
    v = len(uni)
    out = []
    for t in texts:
        ws = _tok(t)
        if not ws:
            out.append((0, None))
            continue
        s = [math.log((uni[ws[0]] + 1) / (total + v + 1))]
        for a, b in zip(ws, ws[1:]):
            p2 = (big[(a, b)] + 1) / (uni[a] + v + 1)
            p1 = (uni[b] + 1) / (total + v + 1)
            s.append(math.log(lam * p2 + (1 - lam) * p1))
        out.append((len(ws), -sum(s) / len(ws)))
    return out


def test_bigram_fit_and_score_match_oracle(ray_session):
    from webval.lm import fit_bigram_lm, score_bigram_lm

    blm = fit_bigram_lm(_ds(TEXTS), "text", lam=0.5)
    got = (score_bigram_lm(_ds(TEXTS), blm, text_col="text")
           .to_pandas().set_index("doc_id").sort_index())
    want = _oracle_bigram_nll(TEXTS)
    for i, (n, nll) in enumerate(want):
        assert got.loc[i, "n_tokens"] == n
        if nll is None:
            assert np.isnan(got.loc[i, "nll"]) or got.loc[i, "nll"] is None
        else:
            # engine interpolates with exp(ln(p1)) — 1-ulp tolerance
            assert got.loc[i, "nll"] == pytest.approx(nll, abs=1e-12)
    # repeated bigram ("the cat": docs 0, 1 and "THE Cat!") carries
    # conditional evidence the unigram model cannot express
    pair_cnt = dict(zip(blm.pairs.column("pair").to_pylist(),
                        blm.pairs.column("count").to_pylist()))
    assert pair_cnt["the cat"] == 3


def test_bigram_pairs_never_cross_documents(ray_session):
    from webval.lm import bigram_counts

    ds = _ds(["x y", "y x"])   # "y x"-doc pair but no "y" -> "x" crossing
    t = bigram_counts(ds, "text").to_pandas().set_index("pair")["count"]
    assert t.to_dict() == {"x y": 1, "y x": 1}


def test_bigram_pair_cap_truncates_deterministically(ray_session):
    from webval.lm import fit_bigram_lm

    blm = fit_bigram_lm(_ds(TEXTS), "text", pair_cap=3)
    assert blm.pairs.num_rows == 3
    # top pairs by (count DESC, pair ASC): "the cat" counts 3
    pairs = blm.pairs.to_pydict()
    assert pairs["pair"][0] == "the cat"
    assert all(c >= 1 for c in pairs["count"])


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_matches_hand_reference():
    import ray.data as rd

    from webval.lm import bpe_apply, bpe_train

    # classic Sennrich toy corpus: low/lower/newest/widest with counts
    docs = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)}))
    m = bpe_train(ds, "text", n_merges=4, vocab_size=None)

    # hand-derived: counts over word freqs {low:5, lower:2, newest:6,
    # widest:3}; e+s</w>? no — last char carries </w>: low -> l o w</w>
    # pair counts round 1: (e,s)=9? newest: n e w e s t</w>; widest:
    # w i d e s t</w> -> (e,s) = 6+3 = 9 is the max -> merge ('e','s')
    assert m["merges"][0] == ("e", "s")
    # round 2: (es, t</w>) = 9 -> merge
    assert m["merges"][1] == ("es", "t</w>")
    # round 3: (l, o) = 7 from low+lower
    assert m["merges"][2] == ("l", "o")
    # round 4: three pairs tie at 6 ((n,e), (e,w), (w,est</w>));
    # the documented lexicographic tiebreak picks ('e','w')
    assert m["merges"][3] == ("e", "w")
    # vocab ranks: chars first, merges appended in order
    assert m["vocab"]["es"] < m["vocab"]["est</w>"] < m["vocab"]["lo"]

    # apply: newest -> [n, ew, est</w>] = 3 tokens;
    # low -> [lo, w</w>] = 2; lower -> [lo, w, e, r</w>] = 4
    counted = bpe_apply(
        rd.from_arrow(pa.table({"text": pa.array(
            ["newest", "low", "lower", "newest low", None, ""])})),
        "text", m["merges"]).to_pandas()
    assert list(counted["bpe_tokens"]) == [3, 2, 4, 5, 0, 0]

    # deterministic across reruns / parallelism
    m2 = bpe_train(ds.repartition(4), "text", n_merges=4,
                   vocab_size=None)
    assert m2["merges"] == m["merges"]

    # vocab_size cap drops rare words from the statistics
    capped = bpe_train(ds, "text", n_merges=2, vocab_size=1)
    # only 'newest' (count 6) survives -> first merge from it
    assert capped["merges"][0] == ("e", "s")

    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(ds, "text", n_merges=-1)
