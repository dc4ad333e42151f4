"""C1/C2 extractor stages + the byte-identical-per-url determinism invariant
(BASELINE.json input_hint; SURVEY.md §5.3)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from webval.extract import HtmlTextExtractor, LangTagger, extract_text
from webval.synth import gen_webpages_table


def test_extract_text_rules():
    html = (b"<html><head><title>T</title><style>p{}</style></head>"
            b"<body><p>Hello   <b>world</b></p><script>x=1</script>"
            b"<noscript>no</noscript></body></html>")
    assert extract_text(html) == "T Hello world"
    assert extract_text(None) is None
    assert extract_text(b"") == ""
    # malformed html must not raise — violation rows, not task errors
    assert extract_text(b"<p>unclosed <b>tag") == "unclosed tag"
    assert extract_text(b"\xff\xfe garbage <p>ok</p>") .endswith("ok")


def test_fast_path_equivalent_to_parser():
    """The vectorized RE2 fast path must agree with html.parser on every
    gate-passing row; gated-out rows go through the parser anyway, so the
    stage output must ALWAYS equal the parser output."""
    import pyarrow as pa

    from webval.synth import gen_webpages_table

    adversarial = [
        b"<html><head><title>T</title></head><body><p>x &amp; y</p></body></html>",
        b"<title>Outside</title><p>body</p>",               # title not in head
        b"<head><style>p{}</style><title>A</title></head><p>b</p>",
        b"<p>unclosed <b>tag",
        b"<head><title>A</title><p>leaky head",              # unbalanced head
        b"<!-- comment --><p>c</p>",
        b"<SCRIPT>var x=1</SCRIPT><p>up</p>",
        b"<a href=\"x>y\">link</a> text",                    # > in attribute
        b"<title>A</title><title>B</title><p>two titles</p>",
        b"\xff\xfe bad utf8 <p>ok</p>",
        b"",
        None,
        b"<body><p>plain</p><noscript>no</noscript></body>",
        # ADVICE r1: stray '<' — regex strip would swallow "< 2" without the
        # tag-count gate clause
        b"<p>1 < 2</p>",
        b"a < b and c > d",
        b"trailing <",
        b"<p>unterminated <b attr",
        b"<a<b>weird</a>",
        # ADVICE r1: nested same-tag containers — balanced counts but the
        # non-greedy strip leaves inner trailing content
        b"<template>a<template>b</template>c</template>",
        b"<head>x<head>y</head>z</head><p>t</p>",
        b"<noscript>a<noscript>b</noscript>c</noscript><p>k</p>",
        b"<script>a</script><template>x<script>y</script></template><p>q</p>",
        # comments: stripped vectorized when well-formed; markers/spans
        # crossing container or attribute boundaries gate to the parser
        b"<p>a<!--x-->b</p>",
        b"ab<!--x-->cd",
        b"<title>a<!--x-->b</title><p>t</p>",
        b"<p>unterminated <!-- comment",
        b"stray --> arrow",
        b"<script>a<!--</script>--><p>x</p>",
        b"<a title=\"<!--\">x</a>y<!--z-->w",
        b"<!--<script>alert(1)</script>--><p>safe</p>",
        b"<!--c1--><head><title>T</title></head><!--c2--><p>b</p>",
        # entity fast path: decodable set, unknown refs, double-encoding
        b"<p>x &amp; y &lt;tag&gt; &quot;q&quot; it&#39;s</p>",
        b"<p>&amp;lt; stays literal</p>",
        b"<p>&amp;amp;</p>",
        b"<p>&nbsp;unknown</p>",
        b"<p>&#x27;hex ref</p>",
        b"<p>bare & ampersand</p>",
        b"<p>&lt;script&gt;alert(1)&lt;/script&gt;</p>",
        b"<title>A &amp; B</title><p>t</p>",
        b"<head><title>A &lt;B&gt;</title></head><p>c &amp; d</p>",
        b"&&amp;",
        b"<!DOCTYPE html><p>doc</p>",
        # extended entity table: named + numeric decode vectorized; hex
        # refs and semicolonless refs gate to the parser
        b"<p>a&nbsp;b</p>",
        b"<p>a&nbsp;&nbsp;b</p>",
        b"x &nbsp;",
        b"<p>a&mdash;b &ndash; c&hellip;</p>",
        b"<p>&ldquo;q&rdquo; &lsquo;w&rsquo; &copy;2026 &reg; &trade;</p>",
        b"<p>a&#8212;b &#8211; &#8230; &#160;x</p>",
        b"<p>&middot;&bull;</p>",
        b"<p>hex &#x2014; ref</p>",
        # repair tier: structurally clean + exotic charrefs -> vectorized
        # strip + per-row html.unescape (incl. ws-decoding refs)
        b"<p>a&#32;b</p>",
        b"<p>a&Tab;b</p>",
        b"<p>a&#xa0;b</p>",
        b"<p>&notarealentity; x</p>",
        b"<p>&frac12; cup</p>",
        b"<p>&#x1F600; emoji</p>",
        b"<p>mix &#x2014; and &amp; both</p>",
        b"<title>T&#x2014;X</title><p>b</p>",
        b"x&#32;&#32;y",
        b"&#32;",
        b"<p>&amp;nbsp; literal</p>",
        b"<p>semicolonless &amp here</p>",
        b"<p>&#0160;</p>",
        # ADVICE r2: <head> AFTER visible text — fast path would prepend the
        # title where the parser emits it in document order
        b"<body><p>x y</p></body><head><title>t</title></head>",
        b"<body>x</body><head><title>t</title></head>",
        b"text first <head><title>t</title></head><p>rest</p>",
        b"<p>a</p><head><title>t</title></head><p>b</p>",
        b"<body></body><head><title>t</title></head>",      # no text: ok
        b"<html><body><head><title>t</title></head>x</body></html>",
        b"<header>x</header><p>y</p>",                      # <header> != <head>
        b"<p>a</p><header>h</header><head><title>t</title></head>",
        b"<HEAD><TITLE>T</TITLE></HEAD><p>b</p>",
        b"<!DOCTYPE html><html lang=\"en\"><head><title>t</title></head>x",
        # unicode whitespace: str.split() splits on these, RE2 \s does not
        b"<p>a\xc2\xa0b</p>",          # NBSP
        b"<p>a\xe2\x80\x83b</p>",      # em space
        b"<p>a\x1cb</p>",              # file separator
        b"<p>a\x0bb</p>",              # vertical tab
        b"<p>a\xc2\x85b</p>",          # NEL
        b"<p>a\xe2\x80\xa9b</p>",      # paragraph separator
    ]
    synth = gen_webpages_table(np.arange(500)).column("html").to_pylist()
    payloads = adversarial + synth
    ext = HtmlTextExtractor()
    t = pa.table({"html": pa.array(payloads, type=pa.large_binary())})
    got = ext(t).column("text").to_pylist()
    want = [extract_text(b) for b in payloads]
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, (i, payloads[i], g, w)


def test_fast_path_fuzz_equivalent_to_parser():
    """Random compositions of markup fragments: stage output (fast path +
    parser fallback) must equal the parser on every row."""
    import random

    rng = random.Random(1234)
    frags = [
        "<p>", "</p>", "<b>", "</b>", "<head>", "</head>", "<title>",
        "</title>", "<script>", "</script>", "<style>", "</style>",
        "<template>", "</template>", "<noscript>", "</noscript>",
        "<!-- c -->", "<!--", "-->", "<!-- a <p> b -->", "&amp;", "&lt;",
        "&gt;", "&quot;", "&#39;", "&nbsp;", "&mdash;", "&hellip;",
        "&#8212;", "&#x2014;", "&rsquo;", "&copy;", "&amp", "&#160;",
        "&", "<", ">", "txt", "a b", " ", "1 < 2", "x>y", "<a href=\"u\">",
        "<br/>", "<!DOCTYPE html>", "é", "日本",
        "<a href=\"x>y\">", "<p class='c1'>", "<a href=\"a<b\">",
        "<a href=\"unterminated>", "it's", "say \"hi\"",
        "<img src='u' alt=\"a&amp;b\">", "<p data-x=\"1\" data-y='2'>",
    ]
    payloads = ["".join(rng.choice(frags) for _ in range(rng.randint(1, 12)))
                .encode() for _ in range(400)]
    ext = HtmlTextExtractor()
    t = pa.table({"html": pa.array(payloads, type=pa.large_binary())})
    got = ext(t).column("text").to_pylist()
    for i, (g, b) in enumerate(zip(got, payloads)):
        assert g == extract_text(b), (i, b, g, extract_text(b))


def test_synth_text_is_extraction_ground_truth():
    """The synth `text` column and extract.py's parser are independent
    derivations of the same bytes — they must agree byte-for-byte."""
    t = gen_webpages_table(np.arange(3000))
    for h, txt in zip(t.column("html").to_pylist(), t.column("text").to_pylist()):
        assert extract_text(h) == txt


def _text_hash_sorted_by_url(ds) -> str:
    rows = sorted(
        (r["url"], r["text"]) for r in ds.select_columns(["url", "text"]).take_all())
    h = hashlib.sha256()
    for url, text in rows:
        h.update(url.encode())
        h.update(b"\x00" if text is None else text.encode())
    return h.hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_extraction_deterministic_across_parallelism():
    """Run the C1 actor-pool extraction at two parallelism levels; the hash
    of url-sorted extracted text must be identical (SURVEY.md §4 row
    'Determinism')."""
    import ray.data as rd

    t = gen_webpages_table(np.arange(4000)).drop_columns(["text"])
    hashes = []
    for nblocks, conc in ((2, 1), (8, 3)):
        # num_cpus=0.5 so the pool never starves upstream tasks on the
        # 4-CPU test cluster (actor pools reserve CPUs greedily)
        ds = (rd.from_arrow(t).repartition(nblocks)
                .map_batches(HtmlTextExtractor, batch_format="pyarrow",
                             batch_size=500, concurrency=conc, num_cpus=0.5))
        hashes.append(_text_hash_sorted_by_url(ds))
    assert hashes[0] == hashes[1]
    # and it matches the ground-truth text column
    truth = gen_webpages_table(np.arange(4000))
    h = hashlib.sha256()
    for url, text in sorted(zip(truth.column("url").to_pylist(),
                                truth.column("text").to_pylist())):
        h.update(url.encode())
        h.update(b"\x00" if text is None else text.encode())
    assert hashes[0] == h.hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_lang_tagger_recovers_planted_lang():
    import ray.data as rd

    t = gen_webpages_table(np.arange(2000))
    ds = rd.from_arrow(t).map_batches(LangTagger, batch_format="pyarrow",
                                      batch_size=512, concurrency=2, num_cpus=0.5)
    ok = tot = 0
    for r in ds.select_columns(["lang", "lang_pred", "text"]).take_all():
        if r["text"] is None or r["lang"] is None:
            assert (r["lang_pred"] is None) == (r["text"] is None)
            continue
        expect = "unk" if r["lang"] == "__unk__" else r["lang"]
        tot += 1
        ok += (r["lang_pred"] == expect)
    assert ok / tot > 0.98, (ok, tot)
