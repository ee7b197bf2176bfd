"""JSONL corpus source/sink — the interchange format training corpora
actually arrive in (one JSON object per line, usually gzipped).

Spark's native json reader does the heavy lifting (distributed, splittable
for plain text, per-file-parallel for .gz); what this module adds is the
CONTRACT a 100 TB ingest needs and tests pin:

* an explicit schema is REQUIRED — schema inference is a full extra pass
  over the data (Spark samples, but at PB scale even the sample is a
  cluster job) and silently widens types per-batch, so the corpus schema
  is an input, not a discovery;
* corrupt lines cost ONE ROW, never the task: PERMISSIVE mode with a
  captured ``_corrupt_record`` column, split into a clean frame and a
  quarantine frame so the pipeline can count/inspect bad lines instead of
  choosing between crashing (FAILFAST) and silent loss (DROPMALFORMED);
* round-trip writer emitting one JSON object per line (optionally
  gzipped), partitioned like every other sink here.

Reference parity note: the reference ingests line-oriented logs with
regex/JSON field extraction (``log2csv.py``); this is the same contract
generalized to whole-object lines for corpus tables.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: column capturing unparseable lines (quarantine key)
CORRUPT_COL = "_corrupt_record"


def _corrupt_capturing_schema(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL}")
    # StructType.add MUTATES self; build the corrupt-capturing schema as a
    # fresh struct so the caller's schema (and the clean projection below)
    # stay corrupt-free
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def _split_parsed(
    raw: DataFrame, parsed_col, schema: T.StructType, part_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    parsed = raw.select(
        parsed_col.alias("_j"), F.col("value"), *part_cols
    )
    bad = F.col(f"_j.{CORRUPT_COL}").isNotNull() | F.col("_j").isNull()
    fields = [
        F.coalesce(
            F.col(f"_j.{f.name}"), F.col(f.name).cast(f.dataType)
        ).alias(f.name)
        if f.name in part_cols
        else F.col(f"_j.{f.name}").alias(f.name)
        for f in schema.fields
    ]
    clean = parsed.filter(~bad).select(*fields)
    quarantine = parsed.filter(bad).select(F.col("value").alias(CORRUPT_COL))
    return clean, quarantine


def parse_jsonl_lines(
    lines: DataFrame, schema: T.StructType | str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a frame of raw text lines (column
    ``value`` plus any hive-partition columns) — the parsing core of
    :func:`read_jsonl`, factored out so the STREAMING ingest gate
    (streaming/ingest_stream.py) applies the identical contract to each
    micro-batch. Works on batch and streaming frames alike (pure
    per-row expressions)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    full = _corrupt_capturing_schema(schema)
    part_cols = [c for c in lines.columns if c != "value"]
    parsed_col = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return _split_parsed(lines, parsed_col, schema, part_cols)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) frames for a JSONL path (plain or .gz).

    ``clean`` has exactly the requested schema; ``quarantine`` is
    ``(_corrupt_record string)`` — the RAW text of every line that failed
    to parse or type-check, for counting and inspection. A line missing a
    field parses clean with NULLs (JSON semantics); only malformed JSON or
    type-mismatched values quarantine.

    Implementation note: this parses a TEXT scan through ``from_json``
    rather than ``spark.read.json`` because Spark disallows queries that
    reference only the internal corrupt-record column of a raw JSON scan
    (the documented alternative is caching the whole parse — a non-starter
    at corpus scale). The text-scan form keeps each returned frame one
    plain pass, and the quarantine keeps the verbatim line. A
    hive-partitioned layout (write_jsonl(partition_by=...)) surfaces the
    partition keys as scan columns the JSON lines don't carry — those
    schema fields fill from the directory structure."""
    return parse_jsonl_lines(spark.read.text(path), schema)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compress: bool = False,
    partition_by: list[str] | None = None,
) -> None:
    """One JSON object per line (gzip per file when ``compress``) — the
    round-trip partner of :func:`read_jsonl`."""
    w = df.write.mode(mode)
    if compress:
        w = w.option("compression", "gzip")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) for a CSV path — the read-side partner of
    ``sinks.write_csv`` (S10) under the same contract as :func:`read_jsonl`:
    schema required, malformed / type-mismatched / wrong-arity lines
    quarantine with the verbatim line, one bad line costs one row. Built
    on the same text-scan + ``from_csv`` shape (and for the same reason:
    the native reader cannot serve a corrupt-only projection without
    caching the parse). Header lines are dropped by NORMALIZED match
    against the schema's field names — each candidate field is trimmed
    and stripped of one surrounding double-quote pair before the compare,
    so ``"doc_id", "lang"`` and ``doc_id,lang`` both drop — INCLUDING
    mid-file headers from concatenated exports (the classic crawl-dump
    artifact), which the native reader would quarantine as data. A
    header-like line that differs beyond quoting/whitespace is data and
    parses/quarantines normally; a DATA row whose fields literally equal
    the column names is indistinguishable from a header and drops (CSV
    carries no types to tell them apart — same ambiguity every
    header-dropping reader has).

    Out of contract: multi-line quoted records. The scan is
    line-oriented (that is what makes it splittable at 100 TB), so each
    physical line parses alone — a record with an embedded newline
    inside quotes becomes two lines that each parse or quarantine on
    their own. Exports with embedded newlines must escape them (the
    ``sinks.write_csv`` partner never emits them)."""
    return parse_csv_lines(spark.read.text(path), schema, header, sep)


def parse_csv_lines(
    lines: DataFrame,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a frame of raw text lines — the parsing
    core of :func:`read_csv_quarantined` (same contract, including the
    normalized header drop), factored out for the streaming ingest gate.
    Works on batch and streaming frames alike."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    full = _corrupt_capturing_schema(schema)
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        "sep": sep,
    }
    part_cols = [c for c in lines.columns if c != "value"]
    header_line = sep.join(f.name for f in schema.fields)
    if header:
        # normalized header candidate: split on the separator, trim each
        # field, strip ONE surrounding double-quote pair — so quoted /
        # space-padded header styles from foreign exporters drop too
        # (r10 review find: an exact-string match mislabeled them, they
        # type-mismatched into quarantine)
        normalized = F.array_join(
            F.transform(
                F.split(F.col("value"), re.escape(sep), -1),
                lambda t: F.regexp_replace(F.trim(t), '^"(.*)"$', "$1"),
            ),
            sep,
        )
        lines = lines.filter(normalized != header_line)
    parsed_col = F.from_csv(F.col("value"), full.simpleString(), opts)
    return _split_parsed(lines, parsed_col, schema, part_cols)
