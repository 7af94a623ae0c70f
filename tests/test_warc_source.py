"""WARC-lite source round-trip: write the pages table as record-delimited
WARC-style files, read it back, and require bit-identity on every column
(url, timestamp, html bytes, text, lang) — plus the multi-file layout
that keeps the read parallel, and an index-build smoke over the loaded
frame equal to one over the original."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from search_engine_spark.sources.pages import generate_pages_df
from search_engine_spark.sources.warc_lite import (
    load_warc_lite,
    write_warc_lite,
)


def _rows(df):
    return sorted(
        (
            r["url"],
            r["warc_ts"],
            bytes(r["html"]),
            r["text"],
            r["lang"],
        )
        for r in df.collect()
    )


def test_warc_lite_round_trip_bit_identical(spark, tmp_path):
    pages = generate_pages_df(spark, 300, partitions=4)
    d = str(tmp_path / "warc")
    write_warc_lite(pages, d)
    # one file per partition: the read fans out (splittable container)
    assert len([f for f in os.listdir(d) if f.startswith("part-")]) == 4
    back = load_warc_lite(spark, d)
    assert _rows(back) == _rows(pages)


def test_warc_lite_feeds_the_build(spark, tmp_path):
    """The loaded frame is a drop-in pages source: normalize over it is
    byte-identical to normalize over the original frame."""
    from search_engine_spark.operators import index_build as ib

    pages = generate_pages_df(spark, 200, partitions=4)
    d = str(tmp_path / "warc2")
    write_warc_lite(pages, d)
    a = sorted(
        (r["doc_id"], r["norm"])
        for r in ib.normalize_pages(load_warc_lite(spark, d))
        .select("doc_id", "norm")
        .collect()
    )
    b = sorted(
        (r["doc_id"], r["norm"])
        for r in ib.normalize_pages(pages).select("doc_id", "norm").collect()
    )
    assert a == b and len(a) > 0


def test_warc_lite_unicode_and_empty_payloads(spark, tmp_path):
    rows = [
        ("http://a", "2024-01-02 03:04:05.000006", b"", "", "en"),
        (
            "http://b",
            "2024-06-07 08:09:10.111213",
            "<p>naïve 日本語</p>".encode(),
            "naïve 日本語 text",
            "ja",
        ),
    ]
    pages = spark.createDataFrame(
        [(u, __import__("datetime").datetime.fromisoformat(t), h, x, l)
         for u, t, h, x, l in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = str(tmp_path / "warc3")
    write_warc_lite(pages, d)
    assert _rows(load_warc_lite(spark, d)) == _rows(pages)


def test_warc_lite_gzip_round_trip(spark, tmp_path):
    """.warc.gz reality: gzipped record files read back bit-identical
    (transparently decompressed; parallelism via file count — the writer
    keeps one file per partition)."""
    pages = generate_pages_df(spark, 200, partitions=4)
    d = str(tmp_path / "warcgz")
    write_warc_lite(pages, d, compression="gzip")
    assert len([f for f in os.listdir(d) if f.endswith(".gz")]) == 4
    assert _rows(load_warc_lite(spark, d)) == _rows(pages)
