"""Static-HTML rendering of contrast / partition drift reports — the
analog of rdv's report viewer (the reference feeds its contrast JSON to an
HTML viewer; this repo's reports are plain dicts, so the renderer is a
driver-side pure function over them: no data touched, no dependencies,
one self-contained file a browser or an S3 static site can serve).

Usage: ``jobs/run_contrast.py --html out.html`` writes it next to the JSON;
``render_contrast_html(report)`` returns the document as a string.
"""

from __future__ import annotations

import html as _html

_CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 2rem auto; max-width: 72rem; color: #1a1a2e; }
h1 { font-size: 1.4rem; } h2 { font-size: 1.1rem; margin-top: 2rem; }
table { border-collapse: collapse; width: 100%; font-size: 0.9rem; }
th, td { text-align: left; padding: 0.35rem 0.6rem;
         border-bottom: 1px solid #e3e3ef; }
th { background: #f4f4fb; font-weight: 600; }
td.num { text-align: right; font-variant-numeric: tabular-nums; }
tr.drifted { background: #fdecec; }
.badge { display: inline-block; padding: 0.15rem 0.55rem;
         border-radius: 0.8rem; font-size: 0.8rem; font-weight: 600; }
.badge.ok { background: #e3f6e8; color: #176632; }
.badge.bad { background: #fbdcdc; color: #8f1d1d; }
.meta { color: #6b6b80; font-size: 0.85rem; }
"""


def _fmt(v) -> str:
    if v is None:
        return "–"
    if isinstance(v, bool):
        return "yes" if v else "no"
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v)


def _badge(drifted: bool) -> str:
    return ('<span class="badge bad">DRIFTED</span>' if drifted
            else '<span class="badge ok">ok</span>')


def _row(cells: list[str], *, drifted: bool = False, header: bool = False) -> str:
    tag = "th" if header else "td"
    tds = "".join(
        f"<{tag}{'' if header or i == 0 else ' class=num'}>{c}</{tag}>"
        for i, c in enumerate(cells))
    cls = ' class="drifted"' if drifted else ""
    return f"<tr{cls}>{tds}</tr>"


_COL_METRICS = ["js", "psi", "ks", "chi2_p", "null_rate_a", "null_rate_b",
                "mean_shift"]


def render_contrast_html(report: dict, *, title: str = "Drift report") -> str:
    """Contrast-report dict (``pipelines.contrast`` output, optionally with
    a ``partitions`` list from ``partition_report``) → one self-contained
    HTML document string."""
    esc = _html.escape
    parts: list[str] = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{esc(title)}</title><style>{_CSS}</style></head><body>",
        f"<h1>{esc(title)} {_badge(bool(report.get('drifted')))}</h1>",
        f"<p class=meta>baseline <b>{esc(str(report.get('schema_a')))}</b>"
        f" vs current <b>{esc(str(report.get('schema_b')))}</b></p>",
        "<h2>Per-column drift</h2><table>",
        _row(["column"] + _COL_METRICS + ["drifted"], header=True),
    ]
    for name, col in sorted((report.get("columns") or {}).items()):
        parts.append(_row(
            [esc(str(name))] + [_fmt(col.get(m)) for m in _COL_METRICS]
            + [_fmt(bool(col.get("drifted")))],
            drifted=bool(col.get("drifted"))))
    parts.append("</table>")

    partitions = report.get("partitions") or []
    if partitions:
        keys = sorted({k for p in partitions for k in p
                       if k not in ("part_id", "drifted")})
        parts.append("<h2>Per-partition drift</h2><table>")
        parts.append(_row(["part_id"] + keys + ["drifted"], header=True))
        for p in sorted(partitions, key=lambda r: str(r.get("part_id"))):
            parts.append(_row(
                [esc(str(p.get("part_id")))]
                + [_fmt(p.get(k)) for k in keys]
                + [_fmt(bool(p.get("drifted")))],
                drifted=bool(p.get("drifted"))))
        parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)
