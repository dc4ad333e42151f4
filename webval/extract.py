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


class HtmlTextExtractor:
    """Actor-pool stage: html:binary → text:string (C1).

    Usage::

        ds.map_batches(HtmlTextExtractor, batch_format="pyarrow",
                       batch_size=256, concurrency=(2, 8), num_cpus=1)

    batch_size is small because html rows are wide (binary payload); the
    per-row Python parse is the irreducible cost — the actor pool provides
    the parallelism, state (nothing heavy here, but the slot is where a real
    parser/model would load) amortizes per actor.
    """

    def __init__(self, html_col: str = "html", out_col: str = "text"):
        self.html_col = html_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text(b) for b in batch.column(self.html_col).to_pylist()]
        arr = pa.array(texts, type=pa.large_string())
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
    _langdata.py; below-threshold → "unk".  Tables/regexes built once per
    actor in __init__.
    """

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred",
                 min_votes: int = 1):
        self.text_col = text_col
        self.out_col = out_col
        self.min_votes = min_votes
        self.word_re = _WORD_RE
        # word → list of langs claiming it
        self.claims: dict[str, list[str]] = {}
        for lang, words in STOPWORDS.items():
            if lang in ("ru", "zh"):
                continue  # script-detected
            for w in words:
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.tag_one(t) for t in batch.column(self.text_col).to_pylist()]
        arr = pa.array(langs, type=pa.string())
        if self.out_col in batch.column_names:
            return batch.set_column(
                batch.column_names.index(self.out_col), self.out_col, arr)
        return batch.append_column(self.out_col, arr)
