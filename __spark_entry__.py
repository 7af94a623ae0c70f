"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in search_engine_spark/:
- operators/corpus.py — fulltext pipeline (tokenize → tf → lexicon →
  BM25 top-k) + training-data ops (dedup exact/MinHash-LSH/SimHash/
  n-gram Jaccard, embedding cosine top-k, lang-ID, quality scoring,
  token counting, fingerprinting) over documents/embeddings.
- operators/relational.py — SURVEY.md §2.2-2.8 relational inventory
  over the TPC-H-ish tables.
- operators/{index_build,query}.py — the physical engine (compressed
  salted barrels + block-max WAND); its parity gate is the single-node
  oracle in tests/ (non-SQL-expressible: binary posting blobs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.operators import corpus, relational

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over the documents table at sf0.001 (the full
    declarative pipeline — tokenize, tf agg, df/idf, length-normalized
    scoring, distributed top-k)."""
    return corpus.q_bm25_topk_or(spark, SF0001)


def _utc(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin the session timezone for the duration of the query build: Spark
    interprets parquet timestamps in session-local time while DuckDB reads
    wall-clock, so a non-UTC driver session would shift hour-truncations
    and date comparisons away from the oracle."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(corpus.QUERIES)
    out.update(relational.QUERIES)
    return {name: _utc(fn) for name, fn in out.items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(corpus.ORACLE_SQL)
    out.update(relational.ORACLE_SQL)
    return out
