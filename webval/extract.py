"""Stateful extractor stages (SURVEY.md §2-C) — the rdv Extractor analog
[rdv:rdv/extractors, UNVERIFIED — reference checkout empty, SURVEY.md §0].

rdv's vision extractors load a model once and score rows; here the stages are
callable CLASSES handed to ``ds.map_batches(Cls, concurrency=N, ...)`` so Ray
runs them on an actor pool — setup in ``__init__`` once per actor, work in
``__call__`` per Arrow batch (ray/data/_internal/compute.py ActorPoolStrategy).

Determinism contract (BASELINE.json input_hint): extracted text is a pure
function of the ``html`` bytes alone — no cross-row state, no ordering
dependence — so the output is byte-identical per url across runs and
parallelism levels by construction; tests/test_extract.py proves it by
hashing url-sorted output at two parallelism levels.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

from webval._langdata import STOPWORDS

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "head"})
_KEEP_IN_HEAD = frozenset({"title"})


class _TextHTMLParser(HTMLParser):
    """Visible-text extractor over stdlib html.parser (no bs4 in sandbox).

    Rules (fixed — they define the byte-identical contract):
    - skip content inside script/style/noscript/template
    - inside <head>, keep only <title> text
    - each text node is whitespace-normalized (split/join)
    - non-empty chunks joined with a single space
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip_depth = 0
        self._in_head = False
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag == "head":
            self._in_head = True
        elif tag == "title":
            self._in_title = True
        elif tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag == "head":
            self._in_head = False
        elif tag == "title":
            self._in_title = False
        elif tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_head and not self._in_title:
            return
        t = " ".join(data.split())
        if t:
            self.chunks.append(t)


def extract_text(html_bytes: bytes | None) -> str | None:
    """Pure function of the html bytes → visible text (None propagates)."""
    if html_bytes is None:
        return None
    s = html_bytes.decode("utf-8", errors="replace")
    p = _TextHTMLParser()
    p.feed(s)
    p.close()
    return " ".join(p.chunks)


_CONTAINER_TAGS = ("head", "script", "style", "noscript", "template")
# quote-aware tag interior: a '>' inside a quoted attribute value does not
# terminate the tag (matches html.parser's attribute scanning); an unmatched
# quote means no match → the '<'-count gate clause sends the row to the parser
_TAG_INNER = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"
_TAG_RE = rf"<{_TAG_INNER}>"
# one fused alternation pass removes every container span (RE2 has no
# backreferences, so each tag's complete span pattern is spelled out);
# leftmost-match semantics equal the sequential per-tag strips on every
# gate-passing row — interleaved/overlapping spans leave leftover markers
# or unbalanced counts behind, which the gate routes to the parser
_CONTAINER_STRIP_RE = "(?is)" + "|".join(
    rf"<{t}\b{_TAG_INNER}>.*?</{t}\s*>" for t in _CONTAINER_TAGS)


# entities the fast path decodes itself — the common named + numeric refs
# of real crawl HTML; anything else (hex refs &#x2014;, rare names, a bare
# or semicolonless &) falls to the parser.  Decode AFTER tag stripping —
# html.parser never re-parses decoded '<'/'>' as markup — BEFORE whitespace
# normalization (&nbsp;/&#160; decode to the separator the parser's \xa0
# becomes under str.split), and &amp; LAST so "&amp;lt;" yields the literal
# "&lt;" exactly like convert_charrefs' single pass.
_FAST_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&nbsp;", " "), ("&#160;", " "),
    ("&mdash;", "\u2014"), ("&#8212;", "\u2014"),
    ("&ndash;", "\u2013"), ("&#8211;", "\u2013"),
    ("&hellip;", "\u2026"), ("&#8230;", "\u2026"),
    ("&rsquo;", "\u2019"), ("&lsquo;", "\u2018"),
    ("&ldquo;", "\u201c"), ("&rdquo;", "\u201d"),
    ("&copy;", "\u00a9"), ("&reg;", "\u00ae"), ("&trade;", "\u2122"),
    ("&middot;", "\u00b7"), ("&bull;", "\u2022"),
    ("&amp;", "&"),
)
_ENTITY_ALT_RE = "&(" + "|".join(
    e[1:-1].replace("#", "#") for e, _ in _FAST_ENTITIES) + ");"

# every char Python's str.split() treats as whitespace but RE2's \s does
# not: such a row's normalization differs between the two paths
_EXOTIC_WS_RE = ("[\x0b\x1c-\x1f\x85\xa0\u1680\u2000-\u200a"
                 "\u2028\u2029\u202f\u205f\u3000]")


def _fast_extract_gated(s: pa.Array):
    """Vectorized extraction (RE2 kernels only) + equivalence gate.

    Returns (texts, undecoded, ok_mask, repair_mask):
    - ok rows (``ok_mask``) are PROVABLY equivalent to extract_text
      (html.parser) as ``texts``;
    - repair rows (``repair_mask``) are structurally clean but contain
      charrefs outside the vectorized decode table — their ``undecoded``
      text (tags stripped, ASCII-ws normalized, charrefs intact) becomes
      parser-equivalent after a per-row ``html.unescape`` + unicode
      re-split (the SAME html.unescape convert_charrefs uses), done by the
      caller on the short extracted strings;
    - everything else (stray/unterminated '<', unmatched attribute quotes,
      comment spans crossing boundaries, unbalanced or nested containers,
      exotic whitespace, multiple titles, title outside <head>) takes the
      full parser path."""
    import pyarrow.compute as _pc

    # strip well-formed comments FIRST — html.parser emits nothing for
    # comment content, so removing <!--...--> (ending at the FIRST -->,
    # like the parser) before any gating is equivalent; a comment spanning
    # a container/attribute boundary leaves unbalanced tags or quotes
    # behind, which the gates below push to the parser.  Leftover '<!--'
    # (unterminated / inside attributes without a closer) is flagged.
    s = _pc.replace_substring_regex(s, r"(?s)<!--.*?-->", " ")

    # '&' allowed only when every occurrence is one of the decodable
    # entities (counts must reconcile; each entity holds exactly one '&',
    # and matches are non-overlapping — one fused alternation scan).
    # Failing ONLY this clause routes to the cheap unescape-repair tier,
    # not the full parser.
    bad_entity = _pc.not_equal(
        _pc.count_substring(s, "&"),
        _pc.count_substring_regex(s, _ENTITY_ALT_RE))
    # every '<' must open a completed tag: a stray '<' ("1 < 2"), an
    # unterminated tag at EOF, or a '<' inside a quoted attribute value
    # makes the raw '<' count differ from the number of tags the strip will
    # consume (conservative: also flags "<a<b>"-style malformed tags)
    bad = _pc.not_equal(
        _pc.count_substring(s, "<"),
        _pc.count_substring_regex(s, _TAG_RE))
    # html.parser treats '<' as literal text unless followed by a tag-start
    # char — but the tag strip would swallow "< b ... >" anyway; flag it
    bad = _pc.or_(bad, _pc.match_substring_regex(s, r"<([^a-zA-Z/!?]|$)"))
    bad = _pc.or_(bad, _pc.match_substring_regex(s, r"<!--|-->|<!\["))
    # the fast path PREPENDS the title text; html.parser emits it at its
    # document position — equivalent only when nothing visible precedes
    # <head> (ADVICE r2: '<body>x</body><head><title>t</title></head>'
    # reorders).  Allow only complete tags + whitespace before '<head';
    # any <head> preceded by text (incl. one after <body> content) falls
    # back to the parser.  \b keeps <header> from aliasing.
    has_head = _pc.match_substring_regex(s, r"(?i)<head\b")
    head_first = _pc.match_substring_regex(
        s, rf"(?is)^(?:\s*<{_TAG_INNER}>)*\s*<head\b")
    bad = _pc.or_(bad, _pc.and_(has_head, _pc.invert(head_first)))
    # Python's str.split() (the parser's whitespace normalizer) splits on
    # unicode whitespace; RE2's \s is ASCII [\t\n\f\r ] only — rows with
    # any other whitespace char (NBSP, em-space, \x0b, \x1c-\x1f, NEL,
    # line/para separators, ...) must take the parser path
    bad = _pc.or_(bad, _pc.match_substring_regex(s, _EXOTIC_WS_RE))
    for t in _CONTAINER_TAGS + ("title",):
        opens = _pc.count_substring(s, f"<{t}", ignore_case=True)
        closes = _pc.count_substring(s, f"</{t}", ignore_case=True)
        bad = _pc.or_(bad, _pc.not_equal(opens, closes))
        if t == "title":
            bad = _pc.or_(bad, _pc.greater(opens, 1))

    title = _pc.extract_regex(
        s, rf"(?is)<title{_TAG_INNER}>(?P<t>.*?)</title\s*>")
    title_txt = _pc.if_else(_pc.is_valid(title),
                            _pc.struct_field(title, "t"), "")
    body = _pc.replace_substring_regex(s, _CONTAINER_STRIP_RE, " ")
    # any container/title tag surviving the non-greedy strip means nesting
    # (<template>a<template>b</template>c</template> leaves c</template>)
    # or a title outside <head> — the parser's depth tracking differs from
    # the regex there, so fall back (one fused alternation scan)
    bad = _pc.or_(bad, _pc.match_substring_regex(
        body, r"(?i)</?(head|script|style|noscript|template|title)"))
    body = _pc.replace_substring_regex(body, _TAG_RE, " ")
    combined = _pc.binary_join_element_wise(
        title_txt, body, pa.scalar(" ", type=pa.large_string()))
    undecoded = _pc.utf8_trim_whitespace(
        _pc.replace_substring_regex(combined, r"\s+", " "))
    norm = undecoded
    for ent, rep in _FAST_ENTITIES:
        norm = _pc.replace_substring(norm, ent, rep)
    # &nbsp;/&#160; decode to spaces — collapse any runs they introduced
    # (cheap: runs over the short extracted text)
    norm = _pc.utf8_trim_whitespace(
        _pc.replace_substring_regex(norm, r"  +", " "))
    ok = _pc.invert(_pc.or_(bad, bad_entity))
    repair = _pc.and_(_pc.invert(bad), bad_entity)
    return norm, undecoded, ok, repair


def _unescape_repair(text: str) -> str:
    """Parser-equivalent finish for a structurally-clean extracted string
    whose charrefs are outside the vectorized table: html.unescape is the
    exact routine convert_charrefs applies per data node, and the unicode
    re-split mirrors the parser's per-node str.split() normalization
    (decoded whitespace chars become separators)."""
    import html as _html

    return " ".join(_html.unescape(text).split())


class HtmlTextExtractor:
    """Actor-pool stage: html:binary → text:string (C1).

    Semantics are DEFINED by ``extract_text`` (stdlib html.parser — pure
    function of the bytes, so byte-identical per url at any parallelism).
    Implementation is two-path for throughput: rows whose markup passes a
    conservative structural gate run through vectorized RE2 kernels
    (~10× faster than the parser, proven equivalent under the gate by
    tests/test_extract.py adversarial cases); everything else — entities,
    comments, unbalanced containers, attribute edge cases, undecodable
    bytes — falls back to the per-row parser.  Both paths are pure
    functions of the bytes, so determinism is unaffected.

    Usage::

        ds.map_batches(HtmlTextExtractor, batch_format="pyarrow",
                       batch_size=1024, concurrency=(2, 8), num_cpus=1)
    """

    def __init__(self, html_col: str = "html", out_col: str = "text",
                 fast_path: bool = True):
        self.html_col = html_col
        self.out_col = out_col
        self.fast_path = fast_path

    def _extract_column(self, col) -> pa.Array:
        import numpy as np
        import pyarrow.compute as _pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not self.fast_path:
            return pa.array([extract_text(b) for b in col.to_pylist()],
                            type=pa.large_string())
        # common case: whole batch is valid UTF-8 → one vectorized cast and
        # NO per-row Python at all unless the gate rejects rows
        try:
            s = _pc.cast(col, pa.large_string())
        except pa.ArrowInvalid:
            return self._extract_mixed(col)
        fast, undec, ok, repair = _fast_extract_gated(s)
        ok_np = _pc.fill_null(ok, True).to_numpy(zero_copy_only=False)
        rep_np = _pc.fill_null(repair, False).to_numpy(zero_copy_only=False)
        slow_idx = np.flatnonzero(~ok_np & ~rep_np)
        rep_idx = np.flatnonzero(rep_np)
        if not len(slow_idx) and not len(rep_idx):
            return fast if not isinstance(fast, pa.ChunkedArray) \
                else fast.combine_chunks()
        texts = fast.to_pylist()
        if len(rep_idx):
            # structurally clean, exotic charrefs: unescape the SHORT
            # extracted text (µs/row) instead of re-parsing the html
            undec_py = undec.take(pa.array(rep_idx)).to_pylist()
            for i, u in zip(rep_idx, undec_py):
                texts[i] = _unescape_repair(u)
        if len(slow_idx):
            raw = col.to_pylist()
            for i in slow_idx:
                texts[i] = extract_text(raw[i])
        return pa.array(texts, type=pa.large_string())

    def _extract_mixed(self, col) -> pa.Array:
        """Fallback when the batch contains undecodable bytes."""
        import numpy as np

        raw = col.to_pylist()
        n = len(raw)
        texts: list[str | None] = [None] * n
        decoded: list[str] = []
        dec_idx: list[int] = []
        slow_idx: list[int] = []
        for i, b in enumerate(raw):
            if b is None:
                continue
            try:
                decoded.append(b.decode("utf-8"))
                dec_idx.append(i)
            except UnicodeDecodeError:
                slow_idx.append(i)
        if decoded:
            s = pa.array(decoded, type=pa.large_string())
            fast, undec, ok, repair = _fast_extract_gated(s)
            ok_np = np.asarray(ok, dtype=bool)
            rep_np = np.asarray(repair, dtype=bool)
            fast_py = fast.to_pylist()
            undec_py = undec.to_pylist()
            for j, i in enumerate(dec_idx):
                if ok_np[j]:
                    texts[i] = fast_py[j]
                elif rep_np[j]:
                    texts[i] = _unescape_repair(undec_py[j])
                else:
                    slow_idx.append(i)
        for i in slow_idx:
            texts[i] = extract_text(raw[i])
        return pa.array(texts, type=pa.large_string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = self._extract_column(batch.column(self.html_col))
        if self.out_col in batch.column_names:
            return batch.set_column(
                batch.column_names.index(self.out_col), self.out_col, arr)
        return batch.append_column(self.out_col, arr)


_WORD_RE = re.compile(r"[\w']+", re.UNICODE)
_CJK_RE = re.compile(r"[一-鿿]")
_CYR_RE = re.compile(r"[Ѐ-ӿ]")


class LangTagger:
    """Actor-pool stage: text → lang code (C2).

    Deterministic heuristic (no external models in sandbox): CJK chars → zh,
    Cyrillic → ru, else function-word voting over the per-language tables in
    _langdata.py; zero votes → "unk".  Fully vectorized: one RE2
    count-matches kernel per latin language (7 kernels/batch) + two script
    regex matches — no per-row Python.  Patterns built once per actor in
    __init__.  ``tag_one`` is the row-wise reference implementation
    (token-based; can differ on apostrophe-adjacent words — the vectorized
    word-boundary count is the canonical semantic).
    """

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred",
                 min_votes: int = 1):
        self.text_col = text_col
        self.out_col = out_col
        self.min_votes = min_votes
        self.word_re = _WORD_RE
        from webval.textstats import word_pattern

        self.latin_langs = sorted(l for l in STOPWORDS if l not in ("ru", "zh"))
        self.patterns = {lang: word_pattern(STOPWORDS[lang])
                         for lang in self.latin_langs}
        # word → list of langs claiming it (tag_one reference path)
        self.claims: dict[str, list[str]] = {}
        for lang in self.latin_langs:
            for w in STOPWORDS[lang]:
                self.claims.setdefault(w, []).append(lang)

    def tag_one(self, text: str | None) -> str | None:
        if text is None:
            return None
        if _CJK_RE.search(text):
            return "zh"
        if _CYR_RE.search(text):
            return "ru"
        votes: dict[str, int] = {}
        for w in self.word_re.findall(text.lower()):
            for lang in self.claims.get(w, ()):
                votes[lang] = votes.get(lang, 0) + 1
        if not votes:
            return "unk"
        # deterministic tie-break: highest votes, then alphabetical
        best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        return best[0] if best[1] >= self.min_votes else "unk"

    def tag_column(self, col) -> pa.Array:
        import numpy as np
        import pyarrow.compute as _pc

        from webval.textstats import token_padded

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        padded = token_padded(col)  # unicode-safe token boundaries for RE2
        votes = np.zeros((n, len(self.latin_langs)), dtype=np.int64)
        for j, lang in enumerate(self.latin_langs):
            c = _pc.count_substring_regex(padded, self.patterns[lang])
            votes[:, j] = _pc.fill_null(c, 0).to_numpy(zero_copy_only=False)
        # langs sorted → numpy argmax returns the first (alphabetically
        # smallest) maximal index, matching tag_one's tie-break
        best_j = votes.argmax(axis=1)
        best_votes = votes.max(axis=1)
        names = np.array(self.latin_langs)
        out = np.where(best_votes >= self.min_votes, names[best_j], "unk")
        cjk = _pc.fill_null(_pc.match_substring_regex(col, "[一-鿿]"), False)
        cyr = _pc.fill_null(_pc.match_substring_regex(col, "[Ѐ-ӿ]"), False)
        out = np.where(cjk.to_numpy(zero_copy_only=False), "zh", out)
        out = np.where(cyr.to_numpy(zero_copy_only=False) &
                       ~cjk.to_numpy(zero_copy_only=False), "ru", out)
        arr = pa.array(out, type=pa.string())
        null_mask = _pc.is_null(col)
        return _pc.if_else(null_mask, pa.scalar(None, pa.string()), arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = self.tag_column(batch.column(self.text_col))
        if self.out_col in batch.column_names:
            return batch.set_column(
                batch.column_names.index(self.out_col), self.out_col, arr)
        return batch.append_column(self.out_col, arr)
