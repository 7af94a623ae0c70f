"""JSON-lines source/sink for the documents table.

The reference persists its artifacts as JSON (lexicon, barrels —
`/root/reference/backend/utils/lexicon_loader.py`, `barrel_manager.py`)
and its upload endpoints accept JSON bodies (`app.py:1134-1244`); the
Spark-native corpus equivalent is newline-delimited JSON read with an
EXPLICIT schema + FAILFAST — schema inference would cost a full extra
pass over 100 TB and silently widen types on dirty batches.

Same layout contract as `csv_batches`: a directory of part files, one
record per line (splittable), round-trip asserted bit-identical in
tests/test_csv_source.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    (
        docs.select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite")
        .json(path)
    )


def load_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(_DOCS_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )
