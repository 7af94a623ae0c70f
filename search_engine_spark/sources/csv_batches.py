"""CSV batch source/sink for the pages and documents tables.

The reference ingests its corpus as directory-of-CSV batches
(`/root/reference/backend/utils/batch_maker.py:4-24` writes
REVIEW_BATCH_SIZE-hotel CSV files; `create_parallel_lexicon.py` then fans
one OS process out per batch file). The Spark-native equivalent is simply
`spark.read.csv` over the batch DIRECTORY with an explicit schema — Spark
assigns one task per file split, which IS the reference's
process-per-batch-file parallelism, minus the hand-rolled process pool.

Two wrinkles the reference never hits:

- **Binary columns.** CSV cannot carry the pages table's `html binary`
  column; it rides as base64 text and is decoded back on load (`unbase64`
  is JVM-side, so the round-trip never touches Python).
- **Schema drift.** CSV has no embedded schema, so both loaders take
  `enforce=True` explicit schemas with FAILFAST mode — a malformed batch
  fails the job instead of silently nulling columns (the reference's
  pandas `read_csv` would coerce and continue).

Round-trip (write → read) is asserted bit-identical to the parquet frame
in tests/test_csv_source.py, including timestamps (ISO-8601 with
microseconds) and the html binary payload.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# pages: BASELINE.json input_hint shape, html carried as base64 in CSV
_PAGES_CSV_SCHEMA = (
    "url string, warc_ts timestamp, html_b64 string, text string, lang string"
)
_DOCS_CSV_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_pages_csv(pages: DataFrame, path: str) -> None:
    """Write a pages DataFrame as a directory of CSV batch files (one
    file per partition — the reference's batch_maker layout)."""
    (
        pages.select(
            "url",
            F.date_format("warc_ts", _TS_FMT).alias("warc_ts"),
            # base64() MIME-wraps at 76 chars; strip the newlines so every
            # record stays one physical line and the CSV remains SPLITTABLE
            # (multiLine reads are one-task-per-file — a scale killer)
            F.regexp_replace(F.base64("html"), "[\\r\\n]", "").alias(
                "html_b64"
            ),
            "text",
            "lang",
        )
        .write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(path)
    )


def load_pages_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a CSV batch directory back into the canonical pages shape
    (url, warc_ts, html binary, text, lang). FAILFAST: a malformed batch
    is an error, not silent nulls."""
    raw = (
        spark.read.schema(_PAGES_CSV_SCHEMA)
        .option("header", True)
        .option("escape", '"')
        .option("timestampFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .csv(path)
    )
    return raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def write_documents_csv(docs: DataFrame, path: str) -> None:
    """Write a documents DataFrame (driver-testdata shape) as CSV batches."""
    (
        docs.select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(path)
    )


def load_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a CSV batch directory back into the canonical documents shape
    (doc_id, text, lang, source, n_chars)."""
    return (
        spark.read.schema(_DOCS_CSV_SCHEMA)
        .option("header", True)
        .option("escape", '"')
        .option("mode", "FAILFAST")
        .csv(path)
    )
