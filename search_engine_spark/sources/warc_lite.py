"""WARC-style record source/sink for the pages table.

Common-Crawl ships as WARC: a header stanza per record
(WARC-Target-URI, WARC-Date, ...) followed by the payload. The real
format needs a streaming parser (warcio — not in this environment), but
the SHAPE of the problem — a record-delimited text container holding
binary payloads, split across many multi-GB files — is exactly what a
100 TB crawl ingest reads, so this module implements a faithful "lite"
dialect end-to-end:

- **Record-delimited reads stay SPLITTABLE.** ``spark.read.text`` with
  ``lineSep="WARC/1.0\\n"`` hands Hadoop's record reader the record
  delimiter, so one 10-GB file still fans out across tasks at split
  boundaries (vs wholeTextFiles' one-task-per-file, a scale killer).
- **Binary payloads ride as newline-free base64** (same discipline as
  sources/csv_batches.py: ``F.base64`` MIME-wraps at 76 chars; the
  wrap newlines would corrupt record framing).
- **One Arrow parse pass.** Header parsing + base64 decode happen in a
  single mapInPandas over the record column — the only Python in the
  path, batch-vectorized.

Round-trip (write → read) is asserted bit-identical to the original
pages frame — url, timestamp, html bytes, text, lang — in
tests/test_warc_source.py, which also asserts the multi-file layout
that makes the read parallel.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.sources.pages import PAGES_SCHEMA

_DELIM = "WARC/1.0\n"
_TS_FMT_W = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
_TS_FMT_P = "%Y-%m-%dT%H:%M:%S.%fZ"


def _b64(col) -> F.Column:
    # strip the MIME wrap newlines: every field must stay on one line so
    # the record framing (and file splittability) survives
    return F.regexp_replace(F.base64(col), "[\\r\\n]", "")


def write_warc_lite(
    pages: DataFrame, path: str, compression: str | None = None
) -> None:
    """pages (url, warc_ts, html binary, text, lang) -> directory of
    WARC-lite record files (one file per partition).

    compression="gzip" mirrors Common-Crawl's .warc.gz reality: a
    gzipped text file is NOT splittable (one task per file), so at scale
    parallelism must come from FILE COUNT — repartition the frame to the
    intended task count before writing, exactly as Common Crawl ships
    ~60k gz segments per crawl. The loader reads both transparently."""
    # framing guards: header VALUES must be single-line (a newline in a
    # url would split the record and corrupt every later field), and
    # F.concat is null-propagating (one NULL field would null the whole
    # record) — so headers are newline-stripped and every field
    # null-coalesces to its empty value
    hdr = lambda c: F.regexp_replace(  # noqa: E731
        F.coalesce(c, F.lit("")), "[\\r\\n]", ""
    )
    rec = F.concat(
        F.lit("WARC/1.0\nWARC-Target-URI: "),
        hdr(F.col("url")),
        F.lit("\nWARC-Date: "),
        F.coalesce(
            F.date_format("warc_ts", _TS_FMT_W),
            F.lit("1970-01-01T00:00:00.000000Z"),
        ),
        F.lit("\nContent-Language: "),
        hdr(F.col("lang")),
        F.lit("\nX-Text-B64: "),
        _b64(F.coalesce(F.col("text"), F.lit("")).cast("binary")),
        F.lit("\n\n"),
        _b64(F.coalesce(F.col("html"), F.lit(b""))),
    )
    # the text sink appends "\n" per row, closing each record before the
    # next "WARC/1.0" magic
    w = pages.select(rec.alias("value")).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def load_warc_lite(spark: SparkSession, path: str) -> DataFrame:
    """WARC-lite directory -> canonical pages frame (PAGES_SCHEMA).
    Malformed records (missing header / undecodable payload) raise —
    FAILFAST semantics, matching the CSV loader."""
    raw = spark.read.option("lineSep", _DELIM).text(path)
    recs = raw.filter(F.length(F.trim(F.col("value"))) > 0)

    def parse(batches):
        import base64

        for pdf in batches:
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for body in pdf["value"]:
                head, _, payload = body.partition("\n\n")
                h = dict(
                    line.split(": ", 1)
                    for line in head.split("\n")
                    if ": " in line
                )
                urls.append(h["WARC-Target-URI"])
                tss.append(h["WARC-Date"])
                langs.append(h["Content-Language"])
                texts.append(
                    base64.b64decode(h["X-Text-B64"]).decode("utf-8")
                )
                htmls.append(base64.b64decode(payload.strip()))
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": pd.to_datetime(tss, format=_TS_FMT_P),
                    "html": htmls,
                    "text": texts,
                    "lang": langs,
                }
            )

    return recs.mapInPandas(parse, schema=PAGES_SCHEMA)
