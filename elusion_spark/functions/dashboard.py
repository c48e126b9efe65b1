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
import os
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
_AGGRID_CDN = ("https://cdn.jsdelivr.net/npm/ag-grid-community@31.0.1/"
               "dist/ag-grid-community.min.js")
_AGGRID_CSS = [
    "https://cdn.jsdelivr.net/npm/ag-grid-community@31.0.1/styles/ag-grid.css",
    "https://cdn.jsdelivr.net/npm/ag-grid-community@31.0.1/styles/ag-theme-alpine.css",
]
_SHEETJS_CDN = ("https://cdn.sheetjs.com/xlsx-0.20.1/package/dist/"
                "xlsx.full.min.js")


class ReportLayout:
    """Grid layout knobs (dashboard.rs:1700-1707)."""

    def __init__(self, grid_columns: int = 2, grid_gap: int = 20,
                 max_width: int = 1400, plot_height: int = 400,
                 table_height: int = 420):
        self.grid_columns = grid_columns
        self.grid_gap = grid_gap
        self.max_width = max_width
        self.plot_height = plot_height
        self.table_height = table_height


class TableOptions:
    """Interactive-table knobs (dashboard.rs:1711-1732)."""

    def __init__(self, pagination: bool = True, page_size: int = 10,
                 enable_sorting: bool = True, enable_filtering: bool = True,
                 enable_column_menu: bool = True,
                 theme: str = "ag-theme-alpine"):
        self.pagination = pagination
        self.page_size = page_size
        self.enable_sorting = enable_sorting
        self.enable_filtering = enable_filtering
        self.enable_column_menu = enable_column_menu
        self.theme = theme


def _table_payload(df, limit: int = 10_000) -> tuple[list[dict], list[dict]]:
    """(column defs, row data) for one interactive table.  Date-typed —
    and date-NAMED string — columns get the date filter, mirroring the
    reference's Arrow-type switch (dashboard.rs:1204-1242)."""
    from ..dataframe import CustomDataFrame

    sdf = df._assemble() if isinstance(df, CustomDataFrame) else df
    rows = sdf.limit(limit).collect()
    date_types = {"date", "timestamp", "timestamp_ntz"}
    col_defs = []
    for fld in sdf.schema.fields:
        d = {"field": fld.name, "headerName": fld.name, "sortable": True,
             "filter": True, "resizable": True}
        tn = fld.dataType.typeName()
        if tn in date_types or (
            tn == "string"
            and ("date" in fld.name.lower() or "time" in fld.name.lower())
        ):
            d["filter"] = "agDateColumnFilter"
        col_defs.append(d)
    data = [
        {c: (v if isinstance(v, (int, float, bool)) or v is None else str(v))
         for c, v in r.asDict().items()}
        for r in rows
    ]
    return col_defs, data


# Client-side interactivity: grid init, date-range + category
# cross-filtering, layout toggle, Excel export.  Mirrors the reference's
# feature set (dashboard.rs:1745-1960); plain JS, no build step.
_REPORT_JS = """
var gridApis = [];
var globalFilters = {dateStart: null, dateEnd: null, categories: new Set()};
var originalPlotData = {};

function initTables() {
  document.querySelectorAll('.table-container').forEach(function (el) {
    var defs = JSON.parse(el.dataset.columnDefs);
    var rows = JSON.parse(el.dataset.rowData);
    var opts = JSON.parse(el.dataset.tableOptions);
    var gridOptions = {
      columnDefs: defs, rowData: rows,
      pagination: opts.pagination, paginationPageSize: opts.page_size,
      defaultColDef: {sortable: opts.enable_sorting,
                      filter: opts.enable_filtering,
                      menuTabs: opts.enable_column_menu ? undefined : []},
      isExternalFilterPresent: function () {
        return globalFilters.dateStart !== null ||
               globalFilters.categories.size > 0;
      },
      doesExternalFilterPass: function (node) {
        if (globalFilters.categories.size > 0) {
          var hit = Object.values(node.data).some(function (v) {
            return globalFilters.categories.has(String(v));
          });
          if (!hit) return false;
        }
        if (globalFilters.dateStart !== null) {
          var dateFields = defs.filter(function (d) {
            return d.filter === 'agDateColumnFilter';
          });
          if (dateFields.length > 0) {
            return dateFields.some(function (d) {
              var t = new Date(node.data[d.field]);
              return !isNaN(t) && t >= globalFilters.dateStart &&
                     t <= globalFilters.dateEnd;
            });
          }
        }
        return true;
      },
    };
    gridApis.push(agGrid.createGrid(el.querySelector('.grid'), gridOptions));
  });
}

function initPlots() {
  document.querySelectorAll('.plot-container').forEach(function (el) {
    var data = JSON.parse(el.dataset.plotData);
    var layout = JSON.parse(el.dataset.plotLayout);
    var div = el.querySelector('.plot');
    originalPlotData[div.id] = JSON.parse(el.dataset.plotData);
    Plotly.newPlot(div.id, data, layout, {responsive: true}).then(function () {
      div.on('plotly_click', function (ev) {
        var p = ev.points[0];
        var cat = String(p.label !== undefined ? p.label : p.x);
        if (globalFilters.categories.has(cat)) {
          globalFilters.categories.delete(cat);
        } else {
          globalFilters.categories.add(cat);
        }
        applyFilters();
      });
    });
  });
  var hasDate = Array.from(
    document.querySelectorAll('.plot-container')).some(function (el) {
      var l = JSON.parse(el.dataset.plotLayout);
      return l.xaxis && l.xaxis.type === 'date';
    });
  var df = document.getElementById('date-filter');
  if (df && !hasDate) df.style.display = 'none';
}

function filterTraces(data, start, end, cats) {
  return data.map(function (tr) {
    var xs = tr.x || tr.labels;
    if (!xs) return tr;
    var keep = xs.map(function (xv, i) {
      var ok = true;
      if (start !== null) {
        var t = new Date(xv);
        if (!isNaN(t)) ok = t >= start && t <= end;
      }
      if (ok && cats.size > 0) {
        var label = tr.labels ? tr.labels[i] : xv;
        ok = cats.has(String(label));
      }
      return ok;
    });
    var out = Object.assign({}, tr);
    ['x', 'y', 'labels', 'values'].forEach(function (k) {
      if (tr[k]) out[k] = tr[k].filter(function (_, i) { return keep[i]; });
    });
    return out;
  });
}

function applyFilters() {
  document.querySelectorAll('.plot-container').forEach(function (el) {
    var div = el.querySelector('.plot');
    var layout = JSON.parse(el.dataset.plotLayout);
    var isDate = layout.xaxis && layout.xaxis.type === 'date';
    var filtered = filterTraces(
      originalPlotData[div.id],
      isDate ? globalFilters.dateStart : null,
      isDate ? globalFilters.dateEnd : null,
      globalFilters.categories);
    Plotly.react(div.id, filtered, layout);
  });
  gridApis.forEach(function (api) { api.onFilterChanged(); });
  var badge = document.getElementById('active-cats');
  if (badge) {
    badge.textContent = Array.from(globalFilters.categories).join(', ');
  }
}

function applyDateFilter() {
  var s = document.getElementById('startDate').value;
  var e = document.getElementById('endDate').value;
  if (s && e) {
    globalFilters.dateStart = new Date(s);
    globalFilters.dateEnd = new Date(e);
    applyFilters();
  }
}

function clearDateFilter() {
  globalFilters.dateStart = null;
  globalFilters.dateEnd = null;
  var s = document.getElementById('startDate');
  var e = document.getElementById('endDate');
  if (s) s.value = '';
  if (e) e.value = '';
  applyFilters();
}

function resetAllFilters() {
  globalFilters.categories.clear();
  gridApis.forEach(function (api) { api.setFilterModel(null); });
  clearDateFilter();
}

function toggleGrid() {
  document.querySelector('.grid-layout').classList.toggle('single-column');
}

function exportToExcel() {
  var wb = XLSX.utils.book_new();
  document.querySelectorAll('.table-container').forEach(function (el, i) {
    var rows = [];
    gridApis[i].forEachNodeAfterFilterAndSort(function (n) {
      rows.push(n.data);
    });
    var ws = XLSX.utils.json_to_sheet(rows);
    var name = (el.dataset.tableName || ('table' + i)).slice(0, 31);
    XLSX.utils.book_append_sheet(wb, ws, name);
  });
  XLSX.writeFile(wb, 'report_tables.xlsx');
}

document.addEventListener('DOMContentLoaded', function () {
  initTables();
  initPlots();
});
"""


def create_report(
    plots: list[tuple[str, dict]] | None = None,
    tables: list[tuple[str, object]] | None = None,
    report_title: str = "Elusion report",
    filename: str = "report.html",
    plotly_js_src: str = _PLOTLY_CDN,
    layout_config: ReportLayout | None = None,
    table_options: TableOptions | None = None,
) -> str:
    """Interactive self-contained HTML report — parity with
    create_report_impl (dashboard.rs:1130-1960 / elusion.rs:7963-8039):
    grid layout with toggle, ag-grid tables (sortable / filterable /
    paginated, date filters on date-ish columns), date-range + category
    cross-filtering across plots AND tables, and client-side Excel
    export of the filtered tables.  Figure/table JSON is embedded
    inline; JS libraries load from CDNs exactly like the reference.
    Returns the path."""
    import os

    layout = layout_config or ReportLayout()
    topts = table_options or TableOptions()
    topts_json = json.dumps(topts.__dict__)

    plot_divs = []
    for i, (name, fig) in enumerate(plots or []):
        plot_divs.append(
            f"<div class='plot-container' "
            f"data-plot-data='{escape(json.dumps(fig['data']), quote=True)}' "
            f"data-plot-layout='{escape(json.dumps(fig['layout']), quote=True)}'>"
            f"<div class='plot-title'>{escape(name)}</div>"
            f"<div class='plot' id='plot_{i}' "
            f"style='width:100%;height:{layout.plot_height}px;'></div></div>"
        )
    table_divs = []
    for i, (name, d) in enumerate(tables or []):
        col_defs, data = _table_payload(d)
        table_divs.append(
            f"<div class='table-container' "
            f"data-table-name='{escape(name, quote=True)}' "
            f"data-column-defs='{escape(json.dumps(col_defs), quote=True)}' "
            f"data-row-data='{escape(json.dumps(data, default=str), quote=True)}' "
            f"data-table-options='{escape(topts_json, quote=True)}'>"
            f"<div class='plot-title'>{escape(name)}</div>"
            f"<div class='grid {escape(topts.theme)}' "
            f"style='height:{layout.table_height}px;'></div></div>"
        )

    controls = []
    if plot_divs:
        controls.append("<button onclick='toggleGrid()'>Toggle Layout</button>")
        controls.append(
            "<button onclick='resetAllFilters()'>Reset All Filters</button>")
    if table_divs:
        controls.append(
            "<button onclick='exportToExcel()' class='export-button'>"
            "Export tables to Excel</button>")

    date_filter = (
        "<div id='date-filter'><h3>Date Range Filter</h3>"
        "<input type='date' id='startDate'> <span>to</span> "
        "<input type='date' id='endDate'> "
        "<button onclick='applyDateFilter()'>Apply Filter</button> "
        "<button onclick='clearDateFilter()'>Clear</button>"
        "<div id='active-cats'></div></div>"
        if plot_divs else ""
    )

    css_links = "".join(
        f"<link rel='stylesheet' href='{u}'>" for u in _AGGRID_CSS)
    html = f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>{escape(report_title)}</title>
<script src="{escape(plotly_js_src)}"></script>
<script src="{_AGGRID_CDN}"></script>
<script src="{_SHEETJS_CDN}"></script>
{css_links}
<style>
body{{font-family:sans-serif;margin:2em}}
.container{{max-width:{layout.max_width}px;margin:auto}}
.grid-layout{{display:grid;grid-template-columns:repeat({layout.grid_columns},1fr);
gap:{layout.grid_gap}px}}
.grid-layout.single-column{{grid-template-columns:1fr}}
.plot-title{{font-weight:bold;margin:8px 0}}
.controls{{margin:12px 0}}
.controls button{{margin-right:8px;padding:6px 12px}}
#date-filter{{padding:12px;background:#f8f9fa;border-radius:8px;margin:12px 0}}
</style></head>
<body><div class="container"><h1>{escape(report_title)}</h1>
<div class="controls">{''.join(controls)}</div>
{date_filter}
<div class="grid-layout">
{''.join(plot_divs)}
{''.join(table_divs)}
</div></div>
<script>{_REPORT_JS}</script>
</body></html>"""
    parent = os.path.dirname(filename)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(filename, "w") as f:
        f.write(html)
    return filename


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _write_text_pdf(lines: list[str], path: str,
                    lines_per_page: int = 58) -> None:
    """Minimal dependency-free PDF writer: Helvetica text lines, one
    content stream per page, uncompressed (text greppable), correct
    xref table.  Built from the public PDF 1.4 structure."""
    pages = [lines[i:i + lines_per_page]
             for i in range(0, max(len(lines), 1), lines_per_page)]
    n_pages = len(pages)
    # object ids: 1 catalog, 2 pages, 3..3+n-1 page objs,
    # 3+n..3+2n-1 content streams, 3+2n font
    font_id = 3 + 2 * n_pages
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
               ).encode()
    for i, page_lines in enumerate(pages):
        objs[3 + i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {3 + n_pages + i} 0 R "
            f"/Resources << /Font << /F1 {font_id} 0 R >> >> >>"
        ).encode()
        body = "BT /F1 9 Tf 40 750 Td 12 TL\n" + "\n".join(
            f"({_pdf_escape(ln[:110])}) Tj T*" for ln in page_lines
        ) + "\nET"
        stream = body.encode("latin-1", errors="replace")
        objs[3 + n_pages + i] = (
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream + b"\nendstream"
        )
    objs[font_id] = (b"<< /Type /Font /Subtype /Type1 "
                     b"/BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = font_id + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for oid in range(1, n_objs):
        out += f"{offsets[oid]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    with open(path, "wb") as f:
        f.write(bytes(out))


def _report_tables_as_lines(html: str) -> list[str]:
    """Pull title, plot titles, and embedded table payloads back out of a
    generated report (they ride in data attributes)."""
    import re
    from html import unescape

    lines: list[str] = []
    m = re.search(r"<title>(.*?)</title>", html, re.S)
    if m:
        lines += [unescape(m.group(1)), ""]
    for pm in re.finditer(
            r"<div class='plot-container'.*?<div class='plot-title'>(.*?)</div>",
            html, re.S):
        lines.append(f"[plot] {unescape(pm.group(1))} "
                     f"(interactive — see the HTML report)")
    for tm in re.finditer(
            r"data-table-name='([^']*)'.*?data-column-defs='([^']*)'"
            r".*?data-row-data='([^']*)'", html, re.S):
        name = unescape(tm.group(1))
        cols = [d["field"] for d in json.loads(unescape(tm.group(2)))]
        rows = json.loads(unescape(tm.group(3)))
        widths = {c: max(len(c), *(len(str(r.get(c))) for r in rows), 1)
                  if rows else len(c) for c in cols}
        lines += ["", name,
                  "  ".join(c.ljust(widths[c]) for c in cols),
                  "  ".join("-" * widths[c] for c in cols)]
        for r in rows[:500]:
            lines.append("  ".join(str(r.get(c)).ljust(widths[c])
                                   for c in cols))
        if len(rows) > 500:
            lines.append(f"... {len(rows) - 500} more rows")
    return lines


def export_report_to_pdf(html_path: str, pdf_path: str) -> str:
    """elusion.rs:7990-8039 (headless_chrome render).  Uses a headless
    chromium when one is installed (full-fidelity render, like the
    reference); otherwise falls back to a dependency-free text PDF of
    the report's title + tables (plots noted by title) built from the
    payloads embedded in the HTML."""
    import shutil
    import subprocess

    for exe in ("chromium", "chromium-browser", "google-chrome", "chrome"):
        binpath = shutil.which(exe)
        if binpath:
            subprocess.run(
                [binpath, "--headless", "--disable-gpu",
                 f"--print-to-pdf={pdf_path}", html_path],
                check=True, capture_output=True, timeout=120,
            )
            return pdf_path
    lines = _report_tables_as_lines(open(html_path).read())
    if not lines:
        lines = ["(report contained no extractable content)"]
    _write_text_pdf(lines, pdf_path)
    return pdf_path


def export_plot_to_png(
    plot: dict,
    png_path: str,
    width: int = 900,
    height: int = 600,
) -> str:
    """Single-plot PNG export (elusion.rs:7990-8039 parity — the
    reference screenshots a rendered plot with headless_chrome).

    Renders the plot's plotly-JSON into a minimal self-contained HTML
    page and screenshots it with a headless chromium when one is
    installed — the same binary-discovery path as
    ``export_report_to_pdf``.  Without a chromium there is no honest
    raster path (a PNG encoder is not worth faking), so this raises
    ``FeatureNotAvailable`` with the setup recipe instead of producing
    a lookalike file."""
    import shutil
    import subprocess
    import tempfile

    binpath = None
    for exe in ("chromium", "chromium-browser", "google-chrome", "chrome"):
        binpath = shutil.which(exe)
        if binpath:
            break
    if not binpath:
        from ..errors import FeatureNotAvailable

        raise FeatureNotAvailable(
            "export_plot_to_png needs a headless chromium",
            "Install one (apt install chromium) — the plot renders via "
            "plotly.js and is screenshotted with --headless "
            "--screenshot, mirroring the reference's headless_chrome "
            "path (elusion.rs:7990-8039).  export_report_to_pdf with "
            "its text fallback works without it.",
        )
    html = (
        "<!DOCTYPE html><html><head>"
        f"<script src='{_PLOTLY_CDN}'></script></head>"
        f"<body style='margin:0'><div id='p' "
        f"style='width:{width}px;height:{height}px'></div>"
        f"<script>Plotly.newPlot('p', {json.dumps(plot.get('data', []))}, "
        f"{json.dumps(plot.get('layout', {}))}, "
        "{staticPlot: true});</script></body></html>"
    )
    with tempfile.NamedTemporaryFile(
        "w", suffix=".html", delete=False
    ) as f:
        f.write(html)
        tmp_html = f.name
    try:
        subprocess.run(
            [binpath, "--headless", "--disable-gpu",
             f"--window-size={width},{height}",
             "--virtual-time-budget=5000",
             f"--screenshot={png_path}", tmp_html],
            check=True, capture_output=True, timeout=120,
        )
    finally:
        os.unlink(tmp_html)
    return png_path
