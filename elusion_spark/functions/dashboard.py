"""Plots & HTML reports — parity with the reference's plotly dashboard
(elusion.rs:7780-8039; features/dashboard.rs).

The plotly *Python* package is absent here, but the reference's output is
a self-contained HTML file driven by plotly.js — so we build the figure
JSON (plain dicts, same trace schema) ourselves and emit an HTML page
that loads plotly.js.  ``offline=False`` (default) references the CDN;
pass a local bundle path for air-gapped use.

Every plot collects exactly two columns with an explicit row cap —
plots are driver-bounded BY DESIGN (dashboards visualize aggregates, not
raw 100 TB scans; aggregate first with the builder, then plot)."""

from __future__ import annotations

import json
from html import escape

_MAX_POINTS = 50_000


def _two_cols(df, x: str, y: str | None, limit: int = _MAX_POINTS):
    from ..dataframe import CustomDataFrame

    sdf = df._assemble() if isinstance(df, CustomDataFrame) else df
    cols = [x] if y is None else [x, y]
    rows = sdf.select(*cols).limit(limit).collect()
    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows] if y else None
    return xs, ys


def _fig(traces: list[dict], title: str, **layout) -> dict:
    return {"data": traces, "layout": {"title": {"text": title}, **layout}}


def plot_line(df, x: str, y: str, title: str = "Line") -> dict:
    xs, ys = _two_cols(df, x, y)
    return _fig([{"type": "scatter", "mode": "lines", "x": xs, "y": ys,
                  "name": y}], title)


def plot_time_series(df, x: str, y: str, title: str = "Time series") -> dict:
    xs, ys = _two_cols(df, x, y)
    xs = [str(v) for v in xs]
    return _fig([{"type": "scatter", "mode": "lines", "x": xs, "y": ys,
                  "name": y}], title, xaxis={"type": "date"})


def plot_bar(df, x: str, y: str, title: str = "Bar") -> dict:
    xs, ys = _two_cols(df, x, y)
    return _fig([{"type": "bar", "x": xs, "y": ys, "name": y}], title)


def plot_scatter(df, x: str, y: str, title: str = "Scatter") -> dict:
    xs, ys = _two_cols(df, x, y)
    return _fig([{"type": "scatter", "mode": "markers", "x": xs, "y": ys,
                  "name": y}], title)


def plot_histogram(df, x: str, title: str = "Histogram") -> dict:
    xs, _ = _two_cols(df, x, None)
    return _fig([{"type": "histogram", "x": xs, "name": x}], title)


def plot_box(df, x: str, title: str = "Box") -> dict:
    xs, _ = _two_cols(df, x, None)
    return _fig([{"type": "box", "y": xs, "name": x}], title)


def plot_pie(df, labels: str, values: str, title: str = "Pie") -> dict:
    ls, vs = _two_cols(df, labels, values)
    return _fig([{"type": "pie", "labels": ls, "values": vs}], title)


def plot_donut(df, labels: str, values: str, title: str = "Donut") -> dict:
    ls, vs = _two_cols(df, labels, values)
    return _fig([{"type": "pie", "labels": ls, "values": vs, "hole": 0.4}],
                title)


def plot_waterfall(df, x: str, y: str, title: str = "Waterfall") -> dict:
    xs, ys = _two_cols(df, x, y)
    return _fig([{"type": "waterfall", "x": xs, "y": ys}], title)


# ------------------------------------------------------------------ report

_PLOTLY_CDN = "https://cdn.plot.ly/plotly-2.32.0.min.js"


def _table_html(name: str, df, limit: int = 1000) -> str:
    from ..dataframe import CustomDataFrame

    sdf = df._assemble() if isinstance(df, CustomDataFrame) else df
    rows = sdf.limit(limit).collect()
    cols = sdf.columns
    head = "".join(f"<th>{escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{escape(str(r[c]))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    return (
        f"<h2>{escape(name)}</h2>"
        f"<table border='1' cellspacing='0' cellpadding='4'>"
        f"<thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
    )


def create_report(
    plots: list[tuple[str, dict]] | None = None,
    tables: list[tuple[str, object]] | None = None,
    report_title: str = "Elusion report",
    filename: str = "report.html",
    plotly_js_src: str = _PLOTLY_CDN,
) -> str:
    """Self-contained HTML report (elusion.rs:7963-8039): figure JSON is
    embedded inline; plotly.js renders client-side.  Returns the path."""
    divs, scripts = [], []
    for i, (name, fig) in enumerate(plots or []):
        divs.append(f"<h2>{escape(name)}</h2><div id='plot{i}'></div>")
        scripts.append(
            f"Plotly.newPlot('plot{i}', {json.dumps(fig['data'])}, "
            f"{json.dumps(fig['layout'])});"
        )
    table_html = "".join(_table_html(n, d) for n, d in (tables or []))
    html = f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>{escape(report_title)}</title>
<script src="{escape(plotly_js_src)}"></script>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
th{{background:#eee}}</style></head>
<body><h1>{escape(report_title)}</h1>
{''.join(divs)}
{table_html}
<script>{''.join(scripts)}</script>
</body></html>"""
    with open(filename, "w") as f:
        f.write(html)
    return filename


def export_report_to_pdf(html_path: str, pdf_path: str) -> str:
    """elusion.rs:7990-8039 (headless_chrome render).  Needs a headless
    chromium or weasyprint — neither ships in this container."""
    from ..errors import FeatureNotAvailable

    raise FeatureNotAvailable(
        "PDF export needs headless chromium (or weasyprint)",
        "chromium --headless --print-to-pdf=<out> <report.html>, or "
        "pip install weasyprint && weasyprint report.html out.pdf.",
    )
