"""CSV batch source round-trip: the reference's directory-of-CSV-batches
ingestion layout (batch_maker.py) must load back bit-identical to the
parquet frame — including the html BINARY payload (base64 ride-along) and
microsecond timestamps — and feed the operators unchanged."""

from __future__ import annotations

import pyspark.sql.functions as F

from search_engine_spark.sources.csv_batches import (
    load_documents_csv,
    load_pages_csv,
    write_documents_csv,
    write_pages_csv,
)
from search_engine_spark.sources.pages import generate_pages_df

SF = "/root/testdata/sf0.01"


def _rows(df, key):
    return sorted(map(tuple, df.collect()), key=lambda r: r[: key])


def test_pages_csv_round_trip_bit_identical(spark, tmp_path):
    pages = generate_pages_df(spark, 500)
    d = str(tmp_path / "pages_csv")
    write_pages_csv(pages, d)
    back = load_pages_csv(spark, d)
    assert back.schema == pages.schema
    orig = {r["url"]: r for r in pages.collect()}
    got = {r["url"]: r for r in back.collect()}
    assert set(orig) == set(got)
    for url, r in orig.items():
        g = got[url]
        assert g["html"] == r["html"], url  # binary survives base64
        assert g["text"] == r["text"], url
        assert g["warc_ts"] == r["warc_ts"], url  # microsecond precision
        assert g["lang"] == r["lang"], url


def test_documents_csv_feeds_operators_identically(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "docs_csv")
    write_documents_csv(docs, d)
    back = load_documents_csv(spark, d)
    assert back.schema == docs.select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).schema
    a = sorted(map(tuple, docs.select("doc_id", "text", "lang").collect()))
    b = sorted(map(tuple, back.select("doc_id", "text", "lang").collect()))
    assert a == b
    # an operator over the CSV-loaded frame == over parquet: term_tf shape
    tf_csv = (
        back.filter(F.col("lang") == "en")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .count()
    )
    tf_pq = (
        docs.filter(F.col("lang") == "en")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .count()
    )
    assert sorted(map(tuple, tf_csv.collect())) == sorted(
        map(tuple, tf_pq.collect())
    )


def test_csv_upload_to_index_end_to_end(spark, tmp_path):
    """The reference's POST /hotels/upload + /reviews/upload semantics
    end-to-end: a CSV batch directory is loaded (base64 html → binary),
    ingested through the real Structured Streaming path, compacted, and
    the result is BIT-EQUAL to a fresh batch build over the same corpus."""
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.query import SearchIndex, search_topk
    from search_engine_spark.sources.pages import PAGES_SCHEMA
    from search_engine_spark.streaming.incremental import compact
    from search_engine_spark.streaming.jobs import ingest_stream

    full = generate_pages_df(spark, 260, partitions=4)
    pdf = full.toPandas()
    base = spark.createDataFrame(pdf.iloc[:200], PAGES_SCHEMA)
    upload = spark.createDataFrame(pdf.iloc[200:], PAGES_SCHEMA)

    # the "upload": a CSV batch directory, round-tripped through the source
    csv_dir = str(tmp_path / "upload_csv")
    write_pages_csv(upload, csv_dir)
    uploaded = load_pages_csv(spark, csv_dir)
    stream_in = str(tmp_path / "stream_in")
    uploaded.write.parquet(stream_in)

    paths = ib.IndexPaths(str(tmp_path / "index"))
    ib.build_index(
        spark, base, paths, n_salts=4, salt_threshold=60, n_barrels=8,
        id_partitions=8,
    )
    ingest_stream(spark, stream_in, paths, str(tmp_path / "ckpt"))
    assert compact(spark, paths)["compacted_barrels"] > 0

    fresh_paths = ib.IndexPaths(str(tmp_path / "fresh"))
    ib.build_index(
        spark, full, fresh_paths, n_salts=4, salt_threshold=60,
        n_barrels=8, id_partitions=8,
    )
    idx_up = SearchIndex(spark, paths)
    idx_fresh = SearchIndex(spark, fresh_paths)
    for q in ("best western", "good well", "best"):
        assert search_topk(idx_up, q, k=10) == search_topk(idx_fresh, q, k=10), q


def test_documents_jsonl_round_trip(spark, tmp_path):
    """JSONL variant: same directory-of-part-files contract, explicit
    schema + FAILFAST (no inference pass), bit-identical round-trip."""
    from search_engine_spark.sources.jsonl import (
        load_documents_jsonl,
        write_documents_jsonl,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, d)
    back = load_documents_jsonl(spark, d)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    assert back.schema == docs.select(*cols).schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.select(*cols).collect())
    )
