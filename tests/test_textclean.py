"""Corpus line dedup + repetition metrics vs brute-force Python oracles."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from webval.textclean import (
    frequent_lines,
    remove_boilerplate_lines,
    repetition_stats,
)


def _docs():
    rng = np.random.default_rng(41)
    boiler = ["cookie banner", "nav home about", "(c) footer 2024"]
    texts, ids = [], []
    for i in range(400):
        lines = [f"unique line {i} {j}" for j in range(rng.integers(1, 5))]
        # every doc gets 1-3 boilerplate lines, possibly repeated in-doc
        for b in rng.choice(boiler, rng.integers(1, 4), replace=True):
            lines.insert(rng.integers(0, len(lines) + 1), b)
        # a line shared by only TWO docs must survive min_docs=5
        if i in (10, 11):
            lines.append("rare shared line")
        texts.append("\n".join(lines))
        ids.append(i)
    texts.append("")  # fully-empty doc
    ids.append(400)
    return ids, texts


@pytest.mark.usefixtures("ray_session")
def test_frequent_lines_and_removal_match_oracle():
    import ray.data as rd

    ids, texts = _docs()
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ds = rd.from_arrow(t).repartition(6)
    min_docs = 5

    # oracle: distinct-doc counts per line
    from collections import Counter
    c = Counter()
    for txt in texts:
        c.update(set(txt.split("\n")))
    boiler = {ln for ln, n in c.items() if n >= min_docs}

    freq = frequent_lines(ds, "text", min_docs=min_docs).to_pandas()
    assert len(freq) == len(boiler)
    assert (freq["n_docs"] >= min_docs).all()

    got = remove_boilerplate_lines(ds, "doc_id", "text",
                                   min_docs=min_docs).to_pandas() \
        .set_index("doc_id").sort_index()
    for i, txt in zip(ids, texts):
        lines = txt.split("\n")
        kept = [ln for ln in lines if ln not in boiler]
        assert got.loc[i, "clean_text"] == "\n".join(kept), i
        assert got.loc[i, "n_removed"] == len(lines) - len(kept)
    # the 2-doc shared line survives
    assert "rare shared line" in got.loc[10, "clean_text"]


@pytest.mark.usefixtures("ray_session")
def test_frequent_lines_rejects_min_docs_one():
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": ["a"]}))
    with pytest.raises(ValueError, match="min_docs"):
        frequent_lines(ds, "text", min_docs=1)


@pytest.mark.usefixtures("ray_session")
def test_repetition_stats_match_oracle():
    import ray.data as rd

    texts = ["a b a c",          # one dup 'a' (1 char of 4)
             "x y",              # no dups
             "a a a",            # 2 dups; top bigram 'a a' x2 overlap
             "",                 # single empty line, zero chars
             "solo",             # one line, no bigrams
             "ab ab cd ab cd"]   # dups: ab x2 extra, cd x1 extra
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    got = repetition_stats(rd.from_arrow(t).repartition(3), "doc_id",
                           "text", delimiter=" ").to_pandas() \
        .set_index("doc_id").sort_index()

    def oracle(txt):
        lines = txt.split(" ")
        from collections import Counter
        c = Counter(lines)
        n_dup = sum(v - 1 for v in c.values())
        tot = sum(len(x) for x in lines)
        dupc = sum((v - 1) * len(k) for k, v in c.items())
        frac = None if tot == 0 else dupc / tot
        bigs = Counter(" ".join(p) for p in zip(lines, lines[1:]))
        top = max((v * len(k) for k, v in bigs.items()), default=None)
        return len(lines), n_dup, frac, top

    for i, txt in enumerate(texts):
        n_lines, n_dup, frac, top = oracle(txt)
        assert got.loc[i, "n_lines"] == n_lines, i
        assert got.loc[i, "n_dup_lines"] == n_dup, i
        if frac is None:
            assert np.isnan(got.loc[i, "dup_char_frac"]), i
        else:
            assert abs(got.loc[i, "dup_char_frac"] - frac) < 1e-12, i
        if top is None:
            assert np.isnan(got.loc[i, "top_bigram_chars"]), i
        else:
            assert got.loc[i, "top_bigram_chars"] == top, i


@pytest.mark.usefixtures("ray_session")
def test_chunk_text_matches_oracle():
    import ray.data as rd

    from webval.textclean import chunk_text

    rng = np.random.default_rng(47)
    texts = [" ".join(f"w{i}_{j}" for j in range(rng.integers(1, 90)))
             for i in range(200)]
    texts += ["", "single"]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    W, O = 16, 4
    got = chunk_text(rd.from_arrow(t).repartition(5), "doc_id", "text",
                     window=W, overlap=O).to_pandas()

    def oracle(txt):
        ws = txt.split(" ")
        step = W - O
        out = []
        for k, s in enumerate(range(0, max(len(ws) - O, 1), step)):
            ck = ws[s:s + W]
            out.append((k, " ".join(ck), len(ck)))
        return out

    got = got.sort_values(["doc_id", "chunk_id"])
    rows = list(zip(got["doc_id"], got["chunk_id"], got["chunk_text"],
                    got["n_tokens"]))
    want = [(i, k, c, n) for i, txt in zip(ids, texts)
            for k, c, n in oracle(txt)]
    assert rows == want
    # every token is covered: reassembling de-overlapped chunks == source
    for i, txt in zip(ids, texts):
        parts = got[got["doc_id"] == i]["chunk_text"].tolist()
        ws = []
        for k, p in enumerate(parts):
            toks = p.split(" ")
            ws.extend(toks if k == 0 else toks[O:])
        assert " ".join(ws) == txt, i


@pytest.mark.usefixtures("ray_session")
def test_chunk_text_rejects_bad_window():
    import ray.data as rd

    from webval.textclean import chunk_text

    ds = rd.from_arrow(pa.table({"id": [1], "text": ["a"]}))
    with pytest.raises(ValueError, match="overlap < window"):
        chunk_text(ds, "id", "text", window=4, overlap=4)


@pytest.mark.usefixtures("ray_session")
def test_contamination_check_matches_oracle():
    import ray.data as rd

    from webval.textclean import contamination_check

    eval_texts = ["the quick brown fox jumps", "lorem ipsum dolor sit amet"]
    texts = [
        "a document containing the quick brown fox jumps right here",  # hit
        "clean text with nothing shared at all ok",                    # clean
        "partial overlap: lorem ipsum dolor only",                     # hit
        "short",                                                       # <8 chars
        None,                                                          # null
        "quick brown"                                                  # 8-gram overlap? see oracle
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = contamination_check(rd.from_arrow(t).repartition(3), "doc_id",
                              "text", eval_texts=eval_texts, window=8) \
        .to_pandas().set_index("doc_id").sort_index()

    def shingles(s):
        if s is None or len(s) < 8:
            return set()
        return {s[i:i + 8] for i in range(len(s) - 7)}

    ev = set().union(*(shingles(e) for e in eval_texts))
    for i, txt in enumerate(texts):
        sh = shingles(txt)
        assert got.loc[i, "n_shingles"] == len(sh), i
        assert got.loc[i, "n_contaminated"] == len(sh & ev), i
        assert bool(got.loc[i, "contaminated"]) == bool(sh & ev), i
    assert bool(got.loc[0, "contaminated"]) is True
    assert bool(got.loc[1, "contaminated"]) is False
    assert got.loc[3, "n_shingles"] == 0


@pytest.mark.usefixtures("ray_session")
def test_textclean_multibyte_text():
    """utf-8 multibyte content: line hashing, chunk reassembly, and char
    (not byte) length accounting must all hold."""
    import ray.data as rd

    from webval.textclean import chunk_text, remove_boilerplate_lines

    boiler = "котики и щенки"
    texts = [f"уникальная строка {i}\n{boiler}\n日本語のテキスト {i}"
             for i in range(10)]
    t = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                  "text": texts})
    ds = rd.from_arrow(t).repartition(3)
    got = remove_boilerplate_lines(ds, "doc_id", "text", min_docs=5) \
        .to_pandas().set_index("doc_id").sort_index()
    for i in range(10):
        assert got.loc[i, "clean_text"] == \
            f"уникальная строка {i}\n日本語のテキスト {i}"
        assert got.loc[i, "n_removed"] == 1

    chunks = chunk_text(ds, "doc_id", "text", window=2, overlap=1,
                        delimiter="\n").to_pandas()
    by_doc = chunks.sort_values(["doc_id", "chunk_id"]).groupby("doc_id")
    for i, grp in by_doc:
        lines = []
        for k, p in enumerate(grp["chunk_text"]):
            seg = p.split("\n")
            lines.extend(seg if k == 0 else seg[1:])
        assert "\n".join(lines) == texts[i]


@pytest.mark.usefixtures("ray_session")
def test_curate_web_text_equals_stepwise():
    import ray.data as rd

    from webval.textclean import (chunk_text, curate_web_text,
                                  remove_boilerplate_lines,
                                  repetition_stats)

    ids, texts = _docs()
    # plant a highly-repetitive doc the filter must drop
    ids.append(500)
    texts.append("\n".join(["same line"] * 20 + ["other"]))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ds = rd.from_arrow(t).repartition(5)
    got = curate_web_text(ds, "doc_id", "text", min_docs=5, window=3,
                          overlap=1, delimiter="\n").to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)

    clean = remove_boilerplate_lines(ds, "doc_id", "text", min_docs=5,
                                     delimiter="\n")
    stats = repetition_stats(clean, "doc_id", "clean_text",
                             delimiter="\n",
                             keep_cols=["clean_text"]).to_pandas()
    kept = stats[stats["dup_chars"] * 4 <= stats["total_chars"]]
    import ray.data as rd2
    want = chunk_text(
        rd2.from_arrow(pa.Table.from_pandas(
            kept[["doc_id", "clean_text"]], preserve_index=False)),
        "doc_id", "clean_text", window=3, overlap=1,
        delimiter="\n").to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert got.equals(want)
    assert 500 not in set(got["doc_id"])   # repetitive doc filtered
    assert len(got) > len(set(got["doc_id"]))  # real multi-chunk docs


def test_frequent_ngrams_brute_force(ray_session):
    import ray.data as rd
    from collections import Counter

    from webval.textclean import frequent_ngrams

    texts = ["a b c a b", "a b a b", "c", "", None, "x y z x y z"]
    for n in (1, 2, 3):
        want = Counter()
        for t in texts:
            if t is None:
                continue
            ws = t.split(" ")
            for i in range(len(ws) - n + 1):
                want[" ".join(ws[i:i + n])] += 1
        want = {g: c for g, c in want.items() if c >= 2}
        got = frequent_ngrams(rd.from_arrow(
            pa.table({"text": pa.array(texts, pa.string())})),
            "text", n=n, min_count=2).to_pandas()
        assert dict(zip(got["ngram"], got["cnt"])) == want


def test_frequent_ngrams_multibyte(ray_session):
    import ray.data as rd

    from webval.textclean import frequent_ngrams

    texts = ["héllo wörld héllo wörld", "héllo wörld"]
    got = frequent_ngrams(rd.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})),
        "text", n=2, min_count=2).to_pandas()
    assert dict(zip(got["ngram"], got["cnt"])) == {"héllo wörld": 3}


def test_normalize_unicode_tiers(ray_session):
    import unicodedata

    import ray.data as rd

    from webval.textclean import normalize_unicode

    decomposed = "Café du monde"      # e + combining acute (NFD-ish)
    texts = ["plain ascii stays", decomposed, "", None, "héllo"]
    got = normalize_unicode(rd.from_arrow(pa.table({
        "id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string())})), "text",
        form="NFC", out_col="norm").to_pandas().sort_values("id")
    assert got["norm"][0] == texts[0]
    assert got["norm"][1] == unicodedata.normalize("NFC", decomposed)
    assert got["norm"][1] != decomposed          # actually changed
    assert got["norm"][2] == ""
    assert got["norm"][3] is None or got["norm"].isna()[3]
    assert got["norm"][4] == "héllo"             # already NFC: unchanged


def test_normalize_unicode_suspect_gate_sound_and_equivalent(ray_session):
    """Property sweep: (a) any string NOT flagged by the suspect-class
    regex is a fixed point of the form (soundness of the vectorized
    skip), and (b) normalize_unicode output == a full unicodedata loop
    on a mixed-script fixture, for all four forms."""
    import random
    import unicodedata

    import ray.data as rd

    from webval.textclean import _norm_suspect_pattern, normalize_unicode

    random.seed(42)
    # mixed scripts: ascii, precomposed latin, decomposed latin, Hangul
    # jamo (L,V,T), precomposed Hangul, Tamil matras (ccc=0 composition
    # seconds), compat chars + singletons, CJK/kana
    pool = (
        "abc XYZ 012 \t"
        "\u00e9\u00c5\u00f1"            # precomposed latin
        "e\u0301A\u030an\u0303"          # decomposed latin
        "\u1100\u1161\u11a8"            # jamo L V T
        "\uac00\ud7a3"                  # precomposed syllables
        "\u0b92\u0bd7\u0bc6\u0bbe"      # tamil au/o pieces
        "\ufb01\u212b\u2126\u3300"      # compat + singletons
        "\u4e2d\u6587\u3042"            # CJK / kana
    )
    strs = ["".join(random.choice(pool) for _ in range(12))
            for _ in range(2000)] + ["", "ascii only"]
    arr = pa.array(strs, pa.string())
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        pat = _norm_suspect_pattern(form)
        flagged = pc.match_substring_regex(arr, pat).to_pylist()
        for s, f in zip(strs, flagged):
            if not f:
                assert unicodedata.normalize(form, s) == s, (form, s)
        got = normalize_unicode(
            rd.from_arrow(pa.table({
                "id": pa.array(range(len(strs)), pa.int64()),
                "text": arr})),
            "text", form=form, out_col="norm",
        ).to_pandas().sort_values("id")["norm"].tolist()
        want = [unicodedata.normalize(form, s) for s in strs]
        assert got == want, form


def test_pyarrow_utf8_normalize_kernel_still_broken():
    """pyarrow 16.1's pc.utf8_normalize does NOT compose: form="NFC"
    returns NFD output (caf\u00e9 -> cafe + U+0301).  normalize_unicode
    therefore derives its vectorized gate from unicodedata instead of
    calling the kernel.  If this test ever FAILS, the kernel has been
    fixed -- re-evaluate using it directly for the composing forms."""
    import unicodedata

    composed = "caf\u00e9"
    decomposed = "cafe\u0301"
    out = pc.utf8_normalize(pa.array([composed]), form="NFC")[0].as_py()
    assert out == decomposed                   # kernel: no composition
    assert unicodedata.normalize("NFC", decomposed) == composed


@pytest.mark.usefixtures("ray_session")
def test_prefix_rule_match_longest_wins():
    """Longest matching prefix wins; ties break to the LOWER rule_id;
    unmatched and null rows get (-1, default_action); row-oracle parity
    with a per-row Python reference."""
    import ray.data as rd

    from webval.textclean import prefix_rule_match

    rules = [("ab", "deny", 5), ("abc", "allow", 2), ("a", "deny", 9),
             ("abcd", "deny", 1), ("zz", "allow", 3), ("abX", "allow", 4)]
    vals = ["abcde", "abc", "ab", "a", "zzz", "q", None, "", "abX", "abcd"]
    out = prefix_rule_match(
        rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())})),
        "v", rules, default_action="keep").take_all()
    got = {(r["v"], r["rule_id"], r["action"]) for r in out}

    def ref(v):
        if v is None:
            return (-1, "keep")
        m = [(p, a, i) for p, a, i in rules if v.startswith(p)]
        if not m:
            return (-1, "keep")
        p, a, i = sorted(m, key=lambda r: (-len(r[0]), r[2]))[0]
        return (i, a)

    want = {(v, *ref(v)) for v in vals}
    assert got == want

    with pytest.raises(ValueError, match="duplicate"):
        prefix_rule_match(rd.from_arrow(pa.table({"v": ["x"]})), "v",
                          [("a", "deny", 0), ("a", "allow", 1)])
