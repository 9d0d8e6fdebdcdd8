"""Excel (.xlsx) source — the one SURVEY §2.1 row scoped out in round 1.

The reference treats Excel as a first-class SSIS source but its own
advice is "convert to CSV for anything bulk" (PRO/Глава 13:30-36: the
Excel driver's first-rows type guessing and 255-char truncation are the
documented hazards).  This implementation takes the same posture:

  read_excel    distributed parse — Spark's built-in ``binaryFile``
                source lists and reads the files (so globs, folders and
                any Hadoop-compatible FS work), and each file's bytes
                are parsed INSIDE an Arrow ``mapInPandas`` task with
                stdlib ``zipfile`` + ``ElementTree`` (xlsx is zip+XML;
                no third-party Excel package exists in this
                environment, and none is needed).  Every cell comes
                back as a STRING — exactly the reference's
                anti-type-guessing stance; callers cast explicitly
                (ddl ``schema=`` casts in-plan).
  write_excel   minimal driver-side xlsx writer (inline strings,
                deterministic zip timestamps) for round-trip tests and
                small exports.  Deliberately collect-based: Excel is a
                ≤1M-row format by spec, not a 100 TB sink — bulk export
                is ``write_csv``.

Scale notes: one xlsx == one zip == one task (the format is not
splittable — same class as gzip CSV).  Parallelism comes from the file
count, which is how Excel data arrives in practice (one workbook per
partner/day).  A 100 TB pipeline ingests xlsx at the edge and lands
parquet immediately (``staged_roundtrip``).
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CELL_REF = re.compile(r"([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    """A1-style column letters -> 0-based index (``'A'``→0, ``'AB'``→27)."""
    m = _CELL_REF.match(ref)
    if not m:
        raise ValueError(f"bad cell ref {ref!r}")
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _si_text(si) -> str:
    """A sharedStrings <si> is either one <t> or rich-text <r> runs —
    concatenate every descendant <t> either way."""
    return "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")


def _sheet_target(z: zipfile.ZipFile, sheet: int | str) -> str:
    """Resolve a sheet index (workbook order) or name to its part path
    via workbook.xml + its rels — sheetN.xml file names are NOT
    guaranteed to match workbook order."""
    wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
    sheets = [e for e in wb.iter() if _local(e.tag) == "sheet"]
    if not sheets:
        raise ValueError("workbook has no sheets")
    if isinstance(sheet, int):
        if not 0 <= sheet < len(sheets):
            raise ValueError(f"sheet index {sheet} out of range "
                             f"({len(sheets)} sheets)")
        chosen = sheets[sheet]
    else:
        named = [e for e in sheets if e.get("name") == sheet]
        if not named:
            raise ValueError(f"no sheet named {sheet!r}; have "
                             f"{[e.get('name') for e in sheets]}")
        chosen = named[0]
    rid = next(v for k, v in chosen.attrib.items() if _local(k) == "id")
    rels = ElementTree.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.iter():
        if _local(rel.tag) == "Relationship" and rel.get("Id") == rid:
            target = rel.get("Target", "")
            return target[1:] if target.startswith("/") \
                else "xl/" + target
    raise ValueError(f"workbook rels missing {rid}")


def parse_xlsx(data: bytes, sheet: int | str = 0) -> list[list[str | None]]:
    """Parse one workbook's bytes into rows of optional strings.

    Cell handling mirrors the OOXML cell types: ``t="s"`` shared-string
    index, ``t="inlineStr"``, ``t="str"`` (cached formula string),
    ``t="b"`` boolean (→ ``"true"``/``"false"``), ``t="e"`` error
    (→ None), anything else the raw ``<v>`` text (numbers keep their
    stored lexical form; Excel date serials come back as the serial —
    deliberate, casting is the caller's explicit step).  Sparse rows
    (missing ``<c>`` elements) yield None in the skipped positions."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sroot = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_si_text(si) for si in sroot.iter()
                      if _local(si.tag) == "si"]
        root = ElementTree.fromstring(z.read(_sheet_target(z, sheet)))
        rows: list[list[str | None]] = []
        for row in root.iter():
            if _local(row.tag) != "row":
                continue
            out: list[str | None] = []
            for c in row:
                if _local(c.tag) != "c":
                    continue
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(out)
                while len(out) < idx:       # sparse gap → None padding
                    out.append(None)
                ctype = c.get("t", "n")
                v = None
                for child in c:
                    lc = _local(child.tag)
                    if lc == "v":
                        v = child.text
                    elif lc == "is":
                        v = "".join(t.text or "" for t in child.iter()
                                    if _local(t.tag) == "t")
                if ctype == "s" and v is not None:
                    v = shared[int(v)]
                elif ctype == "b" and v is not None:
                    v = "true" if v.strip() == "1" else "false"
                elif ctype == "e":
                    v = None
                out.append(v)
            rows.append(out)
        return rows


def read_excel(spark: SparkSession, path: str, *,
               sheet: int | str = 0, header: bool = True,
               columns: list[str] | None = None,
               schema: T.StructType | str | None = None) -> DataFrame:
    """Excel Source (PRO/Глава 13:30-36).

    ``path`` is anything ``binaryFile`` accepts (file, folder, glob).
    Column names come from ``columns`` if given, else the header row of
    the first file (one small driver-side probe; every file must share
    the layout — the multi-file contract every Spark source has).
    All columns parse as strings; pass ``schema`` (DDL or StructType)
    to cast in-plan — explicit types, never inference, per the
    reference's own warning about the Excel driver's type guessing."""
    bin_df = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    if columns is None:
        probe = bin_df.select("content").head()
        if probe is None:
            raise ValueError(f"no files matched {path!r}")
        first = parse_xlsx(bytes(probe[0]), sheet)
        if not first:
            raise ValueError("first workbook has no rows to name "
                             "columns from; pass columns=")
        if header:
            columns = [c if c is not None else f"_c{i}"
                       for i, c in enumerate(first[0])]
        else:
            columns = [f"_c{i}" for i in range(len(first[0]))]
    names = list(columns)
    out_schema = T.StructType(
        [T.StructField(n, T.StringType(), True) for n in names])
    n_cols, skip = len(names), 1 if header else 0

    def parse_files(batches):
        import pandas as pd
        for pdf in batches:
            for blob in pdf["content"]:
                rows = parse_xlsx(bytes(blob), sheet)[skip:]
                fixed = [(r + [None] * (n_cols - len(r)))[:n_cols]
                         for r in rows]
                yield pd.DataFrame(fixed or None, columns=names,
                                   dtype="object")

    df = bin_df.mapInPandas(parse_files, out_schema)
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if [f.name for f in schema.fields] != names:
            raise ValueError(f"schema names {[f.name for f in schema]} "
                             f"!= sheet columns {names}")
        df = df.select(*[F.col(f.name).cast(f.dataType).alias(f.name)
                         for f in schema.fields])
    return df


_XLSX_EPOCH = (1980, 1, 1, 0, 0, 0)          # fixed → byte-stable output

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
    '</Types>')

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/>'
    '</Relationships>')

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
    '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships">'
    '<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>'
    '</workbook>')

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/>'
    '</Relationships>')

_NUMERIC = re.compile(r"-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def xlsx_bytes(rows, columns: list[str] | None = None,
               sheet_name: str = "Sheet1") -> bytes:
    """Serialize rows (iterable of sequences) to workbook bytes.
    Numbers are written as number cells, everything else as inline
    strings (self-contained — no sharedStrings part), None as a blank.
    Deterministic: fixed zip timestamps, no compression-level drift."""
    sheet = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    all_rows = ([columns] if columns is not None else []) + \
        [list(r) for r in rows]
    for r_i, row in enumerate(all_rows, start=1):
        cells = []
        for c_i, val in enumerate(row):
            if val is None:
                continue
            col = ""
            n = c_i + 1
            while n:
                n, rem = divmod(n - 1, 26)
                col = chr(ord("A") + rem) + col
            ref = f"{col}{r_i}"
            sval = str(val)
            if not isinstance(val, (bool, str)) and (
                    isinstance(val, (int, float)) or _NUMERIC.match(sval)):
                cells.append(f'<c r="{ref}"><v>{sval}</v></c>')
            elif isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b">'
                             f'<v>{1 if val else 0}</v></c>')
            else:
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>'
                             f'{_xml_escape(sval)}</t></is></c>')
        sheet.append(f'<row r="{r_i}">{"".join(cells)}</row>')
    sheet.append("</sheetData></worksheet>")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, text in [
                ("[Content_Types].xml", _CONTENT_TYPES),
                ("_rels/.rels", _ROOT_RELS),
                ("xl/workbook.xml",
                 _WORKBOOK.format(name=_xml_escape(sheet_name))),
                ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
                ("xl/worksheets/sheet1.xml", "".join(sheet))]:
            zi = zipfile.ZipInfo(name, date_time=_XLSX_EPOCH)
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, text)
    return buf.getvalue()


def write_excel(df: DataFrame, path: str, *,
                sheet_name: str = "Sheet1",
                max_rows: int = 1_048_576) -> int:
    """Excel Destination — export-scale by design (the xlsx spec caps a
    sheet at 1,048,576 rows; this collects to the driver and refuses
    anything larger).  Bulk paths belong to ``write_csv``/parquet.
    Atomic: temp file + rename.  Returns the row count written."""
    import os
    import tempfile
    rows = df.collect()
    if len(rows) > max_rows - 1:
        raise ValueError(f"{len(rows)} rows exceed the xlsx sheet cap; "
                         "use write_csv for bulk export")
    data = xlsx_bytes([list(r) for r in rows], columns=df.columns,
                      sheet_name=sheet_name)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".xlsx.tmp")
    with os.fdopen(fd, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)
    return len(rows)
