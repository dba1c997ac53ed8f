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

The width scan is a mapPartitions over raw lines with a real CSV parser
— per-partition imperative logic that DataFrame expressions genuinely
cannot express (quote-aware field counting). It returns one int per
partition. Embedded newlines inside quoted fields are not supported by
the line-based scan (same limitation as Spark's default csv mode).
"""

from __future__ import annotations

import csv as _csv
import io
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


def scan_width(spark: SparkSession, path: str, fmt: CsvFormat) -> tuple[int, list[str]]:
    """Distributed max-width scan + driver-side header/peek.

    Returns (max_field_count, header_fields_or_empty). The mapPartitions
    emits one count per partition; the driver reduces #partitions ints.
    """
    lines = spark.read.text(path)
    delim, quote = fmt.delimiter, fmt.quote

    def part_max(rows):
        best = 0
        reader = _csv.reader(
            (r.value.rstrip("\r") for r in rows),
            delimiter=delim,
            quotechar=quote if quote else None,
            quoting=_csv.QUOTE_NONE if quote is None else _csv.QUOTE_MINIMAL,
        )
        for fields in reader:
            if len(fields) > best:
                best = len(fields)
        yield best

    width = max(lines.rdd.mapPartitions(part_max).collect() or [0])

    header: list[str] = []
    if fmt.has_headers:
        first = lines.limit(1).collect()
        if first:
            header = _parse_line(first[0].value.rstrip("\r"), fmt)
    return width, header


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
