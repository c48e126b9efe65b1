"""Dependency-free minimal XLSX codec (stdlib ``zipfile`` + ElementTree).

XLSX is a ZIP of SpreadsheetML XML parts; the subset a data table needs —
shared strings, inline strings, numbers, booleans, date-styled serials —
requires no external engine.  This backs ``load_excel`` /
``write_to_excel`` when openpyxl is absent (openpyxl stays the preferred
engine when importable; reference behavior: features/excel.rs:385-645
reads via calamine, elusion.rs:5767-5783 writes via rust_xlsxwriter —
both of which are also self-contained codecs, so a stdlib fallback is
the faithful parity move, not a shortcut).

Scale note: Excel is inherently a driver-sided, bounded format (~1M-row
sheet cap); nothing here touches the distributed path.
"""

from __future__ import annotations

import datetime as _dt
import re as _re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_EPOCH = _dt.datetime(1899, 12, 30)  # Excel 1900 date system (with the
# Lotus leap-year bug baked in: serial 60 never existed, hence Dec 30)

# builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30)
_DATE_FMT_IDS = set(range(14, 23)) | set(range(45, 48))
_DATE_TOKEN_RE = _re.compile(r"(?<!\\)[ymdhs]", _re.I)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'BC12' -> 0-based column 54."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _col_letters(idx: int) -> str:
    """0-based column 54 -> 'BC'."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


# OOXML escapes characters XML 1.0 cannot carry (control chars, lone
# surrogates) as _xHHHH_; a literal "_xHHHH_" is protected as _x005F_x...
_X_ESC_RE = _re.compile(r"_x([0-9A-Fa-f]{4})_")
_XML_BAD_RE = _re.compile(  # \r included: XML parsers normalize it to \n
    "[\x00-\x08\x0b-\x0d\x0e-\x1f\x7f\ud800-\udfff￾￿]")


def _x_escape(s: str) -> str:
    s = _X_ESC_RE.sub(lambda m: f"_x005F_x{m.group(1)}_", s)
    return _XML_BAD_RE.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)


def _x_unescape(s: str) -> str:
    return _X_ESC_RE.sub(lambda m: chr(int(m.group(1), 16)), s)


def _si_text(si: ET.Element) -> str:
    """A shared-string item is either one <t> or rich-text runs of <r><t>."""
    return _x_unescape("".join(
        t.text or "" for t in si.iter() if _local(t.tag) == "t"))


def _parse_number(raw: str):
    try:
        return int(raw)
    except ValueError:
        return float(raw)


def _sheet_paths(z: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member)] in workbook order, resolved through
    workbook.xml.rels (sheet order and r:id -> target mapping)."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target") for r in rels
        if _local(r.tag) == "Relationship"
    }
    out = []
    for sheet in wb.iter():
        if _local(sheet.tag) != "sheet":
            continue
        rid = next((v for k, v in sheet.attrib.items()
                    if _local(k) == "id" and "}" in k), None)
        target = rid_to_target.get(rid, f"worksheets/sheet{len(out) + 1}.xml")
        if target.startswith("/"):
            member = target.lstrip("/")
        elif target.startswith("xl/"):
            member = target
        else:
            member = "xl/" + target
        out.append((sheet.get("name", f"Sheet{len(out) + 1}"), member))
    return out


_TIME_FMT_IDS = set(range(18, 23)) | set(range(45, 48))
_TIME_TOKEN_RE = _re.compile(r"(?<!\\)[hs]", _re.I)


def _date_styles(z: zipfile.ZipFile) -> dict[int, bool]:
    """Style (xf) index → True when the number format carries a TIME
    component (so midnight serials stay datetimes), False for date-only
    formats (14-17 and custom y/m/d-without-h/s codes)."""
    try:
        styles = ET.fromstring(z.read("xl/styles.xml"))
    except KeyError:
        return {}
    custom = {}
    for nf in styles.iter():
        if _local(nf.tag) == "numFmt":
            code = nf.get("formatCode", "")
            if _DATE_TOKEN_RE.search(code):
                custom[int(nf.get("numFmtId"))] = bool(
                    _TIME_TOKEN_RE.search(code))
    has_time = {**{i: False for i in _DATE_FMT_IDS},
                **{i: True for i in _TIME_FMT_IDS}, **custom}
    out = {}
    for node in styles.iter():
        if _local(node.tag) == "cellXfs":
            for i, xf in enumerate(x for x in node
                                   if _local(x.tag) == "xf"):
                fmt = int(xf.get("numFmtId", "0"))
                if fmt in has_time:
                    out[i] = has_time[fmt]
    return out


def read_xlsx(path: str, sheet: str | int = 0) -> list[list]:
    """Parse one worksheet into a row-major list of lists (``None`` for
    absent cells, rows padded to the widest row).  Cell types handled:
    shared string (t="s"), formula/inline string (t="str"/"inlineStr"),
    boolean (t="b"), error (t="e" -> None), and numbers — date-styled
    numeric cells become ``datetime`` (midnight-exact ones ``date``)."""
    with zipfile.ZipFile(path) as z:
        sheets = _sheet_paths(z)
        if isinstance(sheet, int):
            if not -len(sheets) <= sheet < len(sheets):
                raise ValueError(f"sheet index {sheet} out of range "
                                 f"({len(sheets)} sheets)")
            member = sheets[sheet][1]
        else:
            by_name = dict(sheets)
            if sheet not in by_name:
                raise ValueError(f"no sheet named {sheet!r}; have "
                                 f"{[n for n, _ in sheets]}")
            member = by_name[sheet]
        try:
            shared = [
                _si_text(si)
                for si in ET.fromstring(z.read("xl/sharedStrings.xml"))
                if _local(si.tag) == "si"
            ]
        except KeyError:
            shared = []
        date_xfs = _date_styles(z)

        rows: list[list] = []
        for row_el in ET.fromstring(z.read(member)).iter():
            if _local(row_el.tag) != "row":
                continue
            row: list = []
            next_col = 0
            for c in row_el:
                if _local(c.tag) != "c":
                    continue
                ref = c.get("r")
                col = _col_index(ref) if ref else next_col
                while len(row) < col:
                    row.append(None)
                row.append(_cell_value(c, shared, date_xfs))
                next_col = col + 1
            rows.append(row)
    width = max((len(r) for r in rows), default=0)
    for r in rows:
        r.extend([None] * (width - len(r)))
    return rows


def _cell_value(c: ET.Element, shared: list[str], date_xfs: dict[int, bool]):
    ctype = c.get("t", "n")
    v_el = next((ch for ch in c if _local(ch.tag) == "v"), None)
    if ctype == "inlineStr":
        is_el = next((ch for ch in c if _local(ch.tag) == "is"), None)
        return _si_text(is_el) if is_el is not None else None
    if v_el is None or v_el.text is None:
        return None
    raw = v_el.text
    if ctype == "s":
        return shared[int(raw)]
    if ctype == "str":
        return raw
    if ctype == "b":
        return raw not in ("0", "false", "FALSE")
    if ctype == "e":
        return None
    num = _parse_number(raw)
    with_time = date_xfs.get(int(c.get("s", "0")))
    if with_time is not None:
        dt = _EPOCH + _dt.timedelta(days=float(num))
        # serials carry ~µs/day float error: snap to the nearest millisecond
        ms = int(round(dt.microsecond / 1000.0))
        dt = dt.replace(microsecond=0) + _dt.timedelta(milliseconds=ms)
        if not with_time and dt.time() == _dt.time.min:
            return dt.date()
        return dt
    return num


# ------------------------------------------------------------------ write

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    "</Relationships>"
)

# xf 0 = general; xf 1 = date (builtin numFmt 14); xf 2 = datetime (22)
_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    "<fonts count=\"1\"><font/></fonts>"
    "<fills count=\"1\"><fill/></fills>"
    "<borders count=\"1\"><border/></borders>"
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="3"><xf numFmtId="0"/>'
    '<xf numFmtId="14" applyNumberFormat="1"/>'
    '<xf numFmtId="22" applyNumberFormat="1"/></cellXfs>'
    "</styleSheet>"
)


def _wb_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        if value != value or value in (float("inf"), float("-inf")):
            # IEEE specials have no xlsx numeric representation
            return (f'<c r="{ref}" t="inlineStr"><is><t>{value}</t></is></c>')
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    if isinstance(value, _dt.datetime):
        serial = (value.replace(tzinfo=None) - _EPOCH).total_seconds() / 86400
        return f'<c r="{ref}" s="2"><v>{serial!r}</v></c>'
    if isinstance(value, _dt.date):
        return f'<c r="{ref}" s="1"><v>{(value - _EPOCH.date()).days}</v></c>'
    txt = escape(_x_escape(str(value)))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{txt}</t></is></c>'


def write_xlsx(path: str, header: list[str], rows, sheet_name: str = "Sheet1"
               ) -> int:
    """Write header + rows (any iterable of sequences) as a single-sheet
    xlsx using inline strings (no shared-string table to accumulate —
    the writer streams rows without holding the sheet in memory).
    Returns the number of data rows written."""
    n = 0
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _wb_xml(sheet_name))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/styles.xml", _STYLES)
        with z.open("xl/worksheets/sheet1.xml", "w") as f:
            f.write(
                b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                b'<worksheet xmlns="http://schemas.openxmlformats.org/'
                b'spreadsheetml/2006/main"><sheetData>'
            )
            def emit(r_idx: int, values) -> None:
                cells = "".join(
                    _cell_xml(f"{_col_letters(ci)}{r_idx}", v)
                    for ci, v in enumerate(values)
                )
                f.write(f'<row r="{r_idx}">{cells}</row>'.encode())
            emit(1, list(header))
            for i, row in enumerate(rows, start=2):
                emit(i, row)
                n += 1
            f.write(b"</sheetData></worksheet>")
    return n
