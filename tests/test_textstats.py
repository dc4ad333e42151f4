"""Text-analysis operators: token counts, fingerprints, quality, rolling
hashes."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from webval.textstats import QualityScorer, add_fingerprints, add_token_counts, rolling_hashes


@pytest.mark.usefixtures("ray_session")
def test_token_counts_match_python():
    import ray.data as rd

    texts = ["hello world", "  padded   spaces  ", "one", "", None,
             "punct, stuff! x2 (parens)", "a b c d e"]
    ds = add_token_counts(rd.from_arrow(pa.table({"text": texts})))
    rows = {i: r for i, r in enumerate(ds.take_all())}
    for i, t in enumerate(texts):
        if t is None:
            assert rows[i]["ws_tokens"] is None
        else:
            assert rows[i]["ws_tokens"] == len(t.split()), (i, t)
    # bpe-ish: "punct, stuff! x2 (parens)" → punct , stuff ! x 2 ( parens )
    assert rows[5]["bpeish_tokens"] == 9


@pytest.mark.usefixtures("ray_session")
def test_fingerprints_normalize():
    import ray.data as rd

    texts = ["Hello  World", "hello world", "HELLO\tWORLD ", "different", None]
    ds = add_fingerprints(rd.from_arrow(pa.table({"text": texts})))
    fps = [r["fingerprint"] for r in ds.take_all()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]
    assert fps[4] is None
    # non-normalized: case matters
    ds2 = add_fingerprints(rd.from_arrow(pa.table({"text": texts})), normalize=False)
    fps2 = [r["fingerprint"] for r in ds2.take_all()]
    assert fps2[0] != fps2[1]


def test_quality_scorer():
    s = QualityScorer()
    good = s.score_one("The quick brown fox jumps over the lazy dog and runs away.")
    junk = s.score_one("@@@@ #### $$$$ 1234 %%%% ^^^^ &&&& ****")
    assert good["quality"] > junk["quality"]
    assert 0.0 <= junk["quality"] <= 1.0 and 0.0 <= good["quality"] <= 1.0
    assert s.score_one(None) is None
    assert s.score_one("")["quality"] == 0.0
    assert good["stopword_ratio"] > 0.2


def test_quality_scorer_vectorized_matches_reference():
    import pyarrow as pa

    s = QualityScorer()
    texts = ["The quick brown fox jumps over the lazy dog and runs away.",
             "@@@@ #### $$$$ 1234 %%%% ^^^^ &&&& ****", "", None,
             "les données du marché sont dans la page et pour le sport"]
    out = s(pa.table({"text": texts}))
    feats = out.column("quality_features").to_pylist()
    quals = out.column("quality").to_pylist()
    assert feats[3] is None and quals[3] is None
    for i, t in enumerate(texts):
        if t is None:
            continue
        ref = s.score_one(t)
        got = feats[i]
        assert got["n_chars"] == ref["n_chars"]
        assert got["alpha_ratio"] == pytest.approx(ref["alpha_ratio"], abs=1e-9)
        assert got["punct_ratio"] == pytest.approx(ref["punct_ratio"], abs=1e-9)
        assert got["mean_word_len"] == pytest.approx(ref["mean_word_len"], abs=1e-9)
        # stopword ratio: occurrence-count vs token-set can differ around
        # apostrophes; none here, so exact
        assert got["stopword_ratio"] == pytest.approx(ref["stopword_ratio"], abs=1e-9)
        assert quals[i] == pytest.approx(ref["quality"], abs=1e-5)


def test_rolling_hashes():
    h1 = rolling_hashes("abcdefghij", window=4)
    assert len(h1) == 7  # n - window + 1
    # shared windows between overlapping strings hash identically
    h2 = rolling_hashes("Xbcdefghij", window=4)
    assert np.array_equal(h1[1:], h2[1:])
    assert h1[0] != h2[0]
    assert len(rolling_hashes("abc", window=8)) == 0
    assert len(rolling_hashes(None, window=4)) == 0


@pytest.mark.usefixtures("ray_session")
def test_redact_pii():
    import pyarrow as pa
    import ray.data as rd

    from webval.textstats import redact_pii

    t = pa.table({"text": pa.array([
        "mail me at jo.doe+x@sub.example.co.uk today",
        "call +1 555-010-9999 or (44) 20 7946-0958 now",
        "both a@b.io and +1 555-010-1234 here",
        "clean text with no pii",
        None,
    ], pa.large_string())})
    out = redact_pii(rd.from_arrow(t)).take_all()
    assert out[0]["text"] == "mail me at [EMAIL] today"
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 0
    assert out[1]["text"].count("[PHONE]") == 2
    assert out[2]["text"] == "both [EMAIL] and [PHONE] here"
    assert out[3]["n_emails"] == 0 and out[3]["n_phones"] == 0
    assert out[4]["text"] is None


@pytest.mark.usefixtures("ray_session")
def test_canonicalize_urls():
    import pyarrow as pa
    import ray.data as rd

    from webval.textstats import canonicalize_urls

    urls = [
        "https://a.com/p?x=1&utm_source=g&y=2#frag",
        "https://a.com/p?utm_medium=m&b=2",
        "https://a.com/p#only-frag",
        "https://a.com/p?keep=1",
        "https://a.com/p?utm_only=1",
    ]
    want = [
        "https://a.com/p?x=1&y=2",
        "https://a.com/p?b=2",
        "https://a.com/p",
        "https://a.com/p?keep=1",
        "https://a.com/p",
    ]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls)}))
    got = [r["canon_url"] for r in canonicalize_urls(ds).take_all()]
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_c4_quality_filter():
    import pyarrow as pa
    import ray.data as rd

    from webval.textstats import c4_quality_filter

    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array([
                      "a solid normal sentence with enough words here",
                      "short one",                       # < 5 words
                      "@@@@ #### $$$$ %%%% ^^^^ &&&&",   # symbols
                      "a b c d e f g h",                 # mean word len 1
                      None,
                  ], pa.large_string())})
    kept = c4_quality_filter(rd.from_arrow(t)).take_all()
    assert [r["doc_id"] for r in kept] == [0]
    assert kept[0]["word_count"] == 8


def test_rolling_hashes_batch_matches_per_doc():
    import numpy as np

    from webval.textstats import rolling_hashes, rolling_hashes_batch

    texts = ["hello world this is a document", "short", None, "",
             "another web page body with more text in it",
             "hello world this is a document",  # duplicate content
             "tiny", "exactly8",
             # ADVICE r2: <window CHARS but >=window utf-8 bytes — both
             # paths must gate on character length and skip these
             "日本語テスト", "éèêëàâäî", "日本語テキスト測定法", "ab日本語x"]
    kept, counts, hashes = rolling_hashes_batch(texts, 8)
    ends = np.cumsum(counts)
    got = {int(k): hashes[e - c:e] for k, c, e in zip(kept, counts, ends)}
    for i, t in enumerate(texts):
        want = np.unique(rolling_hashes(t, 8)) if t is not None else np.empty(0)
        if len(want) == 0:
            assert i not in got, i
        else:
            assert (got[i] == want).all(), i


def test_rolling_hashes_arrow_matches_batch():
    """The zero-copy Arrow-buffer path must return the identical
    (kept, counts, hashes) triple as the list path — for string AND
    large_string, sliced arrays, nulls, and multibyte docs."""
    import numpy as np
    import pyarrow as pa

    from webval.textstats import rolling_hashes_arrow, rolling_hashes_batch

    texts = ["hello world this is a document", "short", None, "",
             "another web page body with more text in it",
             "hello world this is a document", "tiny", "exactly8",
             "日本語テスト", "日本語テキスト測定法", "ab日本語x",
             "x" * 500, None]
    want = rolling_hashes_batch(texts, 8)
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(texts, type=typ)
        got = rolling_hashes_arrow(arr, 8)
        for w, g in zip(want, got):
            assert (w == g).all(), typ
        # sliced array: offsets no longer start at 0
        sl = arr.slice(2, 9)
        want_sl = rolling_hashes_batch(texts[2:11], 8)
        got_sl = rolling_hashes_arrow(sl, 8)
        for w, g in zip(want_sl, got_sl):
            assert (w == g).all(), (typ, "sliced")
    # chunked input
    ch = pa.chunked_array([pa.array(texts[:6]), pa.array(texts[6:])])
    got_ch = rolling_hashes_arrow(ch, 8)
    for w, g in zip(want, got_ch):
        assert (w == g).all()


def test_vocab_overlap_null_ids_and_text(ray_session):
    """Null ids/text are dropped (review r3s5: a null id used to NaN-crash
    the presence-flag rollup)."""
    import ray.data as rd

    from webval.textstats import vocab_overlap

    t = pa.table({
        "id": pa.array([0, 1, 2, 3, None], pa.int64()),
        "txt": pa.array(["aa bb", "bb cc", None, "dd", "ee"]),
    })
    nb, na, nn = vocab_overlap(rd.from_arrow(t).repartition(2), "id", "txt")
    # even ids: {aa, bb}; odd ids: {bb, cc, dd}; new in odd: {cc, dd}
    assert (nb, na, nn) == (2, 3, 2)


def test_assign_split_rejects_sql_overflow_ids(ray_session):
    """ADVICE r3: ids >= 2**63 // multiplier overflow BIGINT in SQL
    engines (numpy wraps mod 2**64) — the cross-engine membership claim
    only holds under the bound, so assign_split must reject them loudly."""
    import ray.data as rd

    from webval.pipelines import assign_split

    bound = (1 << 63) // 2654435761
    ok = rd.from_arrow(pa.table({"id": pa.array([0, 1, bound - 1],
                                                pa.int64())}))
    out = assign_split(ok, "id").to_pandas()
    assert set(out["split"]) <= {"train", "val", "test"}

    bad = rd.from_arrow(pa.table({"id": pa.array([bound], pa.int64())}))
    with pytest.raises(Exception, match="overflows SQL BIGINT"):
        assign_split(bad, "id").materialize()


def test_vocab_overlap_offset_safe_on_sliced_lists():
    """The toks() parent/value pairing must be correct even for sliced
    ListArrays (pc.list_parent_indices / list_flatten honor offsets)."""
    la = pa.array([["a", "b"], ["c"], ["d", "e", "f"]])
    sliced = la.slice(1, 2)   # [["c"], ["d","e","f"]]
    parent = pc.list_parent_indices(sliced).to_pylist()
    flat = pc.list_flatten(sliced).to_pylist()
    assert flat == ["c", "d", "e", "f"]
    assert parent == [0, 1, 1, 1]


def test_term_enrichment_matches_brute_force(ray_session):
    """One-vs-rest chi-square enrichment vs a plain-Python oracle:
    counts, chi2 values, enrichment gate and top-k tie order."""
    import collections
    import itertools

    import ray.data as rd

    from webval.textstats import term_enrichment

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs, grps = [], []
    for g, bias in (("a", 0), ("b", 2), ("c", 4)):
        for _ in range(40):
            n = int(rng.integers(3, 9))
            probs = np.ones(5)
            probs[bias] = 4.0
            words = rng.choice(vocab, size=n, p=probs / probs.sum())
            docs.append(" ".join(words))
            grps.append(g)

    ds = rd.from_arrow(pa.table({"g": pa.array(grps),
                                 "text": pa.array(docs)}))
    out = term_enrichment(ds, "g", "text", min_count=5, top_k=3) \
        .to_pandas().sort_values(["g", "chi2", "term"],
                                 ascending=[True, False, True]) \
        .reset_index(drop=True)

    # brute-force oracle
    gt = collections.Counter()
    for g, d in zip(grps, docs):
        for w in d.split():
            gt[(g, w)] += 1
    tt = collections.Counter()
    gtot = collections.Counter()
    for (g, w), c in gt.items():
        tt[w] += c
        gtot[g] += c
    N = sum(tt.values())
    rows = []
    for (g, w), a in gt.items():
        if tt[w] < 5:
            continue
        b, c = tt[w] - a, gtot[g] - a
        d = N - tt[w] - gtot[g] + a
        den = (a + b) * (c + d) * (a + c) * (b + d)
        chi2 = N * (a * d - b * c) ** 2 / den if den > 0 else 0.0
        if a * N > tt[w] * gtot[g]:
            rows.append((g, w, a, tt[w], chi2))
    expected = []
    rows.sort(key=lambda r: (r[0], -r[4], r[1]))
    for g, grp_rows in itertools.groupby(rows, key=lambda r: r[0]):
        expected.extend(list(grp_rows)[:3])

    assert len(out) == len(expected)
    for got, exp in zip(out.itertuples(index=False), expected):
        assert (got.g, got.term, got.n_in_group, got.n_total) == exp[:4]
        assert got.chi2 == pytest.approx(exp[4], rel=1e-12)
