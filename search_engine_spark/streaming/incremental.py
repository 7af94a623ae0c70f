"""Incremental index maintenance — the Spark rebuild of the reference's
single-document background upsert (SURVEY.md §2.9 St1,
/root/reference/backend/app.py:921-1061), restructured as an LSM-style
delta log + partition-level compaction, the shape that works at
10^12-doc scale:

  ingest (per micro-batch, cheap, append-only):
    new pages -> normalize -> forward rows (term, doc_id, tf, dl)
      1. doc_stats      += new rows                        (append)
      2. lexicon        += NEW terms with ids max_id+1...  (append;
         the reference's "extend with fresh max ids" semantics,
         app.py:928-944 — incremental ids are NOT re-sorted)
      3. postings delta += uncompressed (term_id, doc_id, tf, dl)
         rows partitioned by barrel                        (append)
      4. stats          rewritten (N, avgdl from doc_stats)

  compact (amortized, rewrites ONLY affected barrels):
      5. decode base blobs of affected barrels -> rows, union deltas,
         re-encode via the same sort+mapInPandas path as the batch build
         (index_build.encode_postings) with refreshed per-term df
      6. lexicon df/cf refreshed for affected terms
      7. delta log truncated

  Because block metadata is (max_tf, min_dl) — not frozen scores —
  queries stay exact between compactions for all untouched terms, and
  WAND bounds recompute from the live (N, avgdl, df) at query time
  (functions/compression.py design note).

Parquet directories stand in for Iceberg tables (per-barrel overwrite ==
rewrite-data-files of one partition; delta append == snapshot append);
the write layout is isolated here so an Iceberg catalog is a drop-in.

Correctness gate (tests/test_streaming.py): base build + streamed batches
+ compact must return BM25 top-k with scores EQUAL to a from-scratch
batch build over the union corpus (doc sets and float64 scores; term_ids
may differ — scores never depend on them).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.operators import index_build as ib

DELTA_SCHEMA = "term_id long, doc_id long, tf int, dl long, barrel int"


def delta_dir(paths: ib.IndexPaths) -> str:
    return f"{paths.root}/postings_delta"


def _n_barrels(spark: SparkSession, paths: ib.IndexPaths) -> int:
    return int(ib.read_stats(spark, paths)["n_barrels"])


def apply_incremental_batch(
    spark: SparkSession, new_pages: DataFrame, paths: ib.IndexPaths
) -> dict:
    """Ingest one micro-batch of new pages (steps 1-4 above). Runs inside
    Structured Streaming foreachBatch (jobs.ingest_stream) or standalone."""
    stats = ib.read_stats(spark, paths)
    n_barrels = int(stats["n_barrels"])

    docs = ib.normalize_pages(new_pages)
    docs.cache()
    forward = ib.build_forward(docs, with_positions=False)
    forward = forward.select("doc_id", "term", "tf", "dl")
    forward.cache()
    n_new = docs.count()

    # 1. doc_stats append
    ib.build_doc_stats(docs).write.mode("append").parquet(paths.doc_stats)

    # 2. lexicon extension: new terms -> max_id+1.. (app.py:928-944)
    lexicon = spark.read.parquet(paths.lexicon)
    max_id = lexicon.agg(F.max("term_id")).collect()[0][0] or 0
    batch_terms = forward.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    new_terms = batch_terms.join(
        lexicon.select("term"), "term", "left_anti"
    )
    # dense ids continuing after max_id — same two-phase assignment as the
    # batch build (no single-reducer sort). df/cf enter as 0: the lexicon
    # counts COMPACTED postings only (compact() folds the delta counts in;
    # writing batch counts here would double-count at compaction). Until
    # then a new term binds but matches nothing — consistent, since its
    # postings live only in the delta log the query engine doesn't read.
    new_ids = ib.assign_dense_ids(new_terms.select("term"), "term", "term_id")
    new_lex = (
        new_ids.withColumn("term_id", F.col("term_id") + F.lit(int(max_id) + 1))
        .select(
            "term", "term_id",
            F.lit(0).cast("long").alias("df"),
            F.lit(0).cast("long").alias("cf"),
            F.lit(0).cast("long").alias("max_tf"),
            F.lit(0).cast("long").alias("min_dl"),
        )
    )
    new_lex.write.mode("append").parquet(paths.lexicon)
    lexicon = spark.read.parquet(paths.lexicon)

    # 3. delta postings append (uncompressed rows, barrel-partitioned so
    # compaction and fresh-term queries prune)
    delta = (
        forward.join(lexicon.select("term", "term_id"), "term")
        .select(
            "term_id",
            "doc_id",
            "tf",
            "dl",
            F.pmod("term_id", F.lit(n_barrels)).cast("int").alias("barrel"),
        )
    )
    delta.write.mode("append").partitionBy("barrel").parquet(delta_dir(paths))

    # 4. refresh corpus stats (N, avgdl)
    n_docs, avgdl = ib.corpus_stats(spark.read.parquet(paths.doc_stats))
    spark.createDataFrame(
        [(n_docs, avgdl, int(stats["n_salts"]), int(stats["salt_threshold"]),
          n_barrels)],
        "n_docs long, avgdl double, n_salts int, salt_threshold long, n_barrels int",
    ).write.mode("overwrite").parquet(paths.stats)

    docs.unpersist()
    forward.unpersist()
    return {"new_docs": int(n_new), "n_docs": n_docs, "avgdl": avgdl}


def decode_postings_rows(postings: DataFrame) -> DataFrame:
    """Inverse of encode: blob rows -> (term_id, doc_id, tf, dl) rows.
    mapInPandas, numpy-vectorized decode (compression.py)."""
    import numpy as np
    import pandas as pd

    from search_engine_spark.functions.compression import decode_posting_blocks

    def decode(batches):
        for pdf in batches:
            tids, docs_, tfs, dls = [], [], [], []
            for row in pdf.itertuples(index=False):
                d, t, l = decode_posting_blocks(
                    row.doc_deltas, row.tfs, row.dls,
                    row.db_lens, row.tf_lens, row.dl_lens,
                )
                tids.append(np.full(len(d), int(row.term_id), dtype=np.int64))
                docs_.append(d)
                tfs.append(t)
                dls.append(l)
            if tids:
                yield pd.DataFrame(
                    {
                        "term_id": np.concatenate(tids),
                        "doc_id": np.concatenate(docs_),
                        "tf": np.concatenate(tfs).astype(np.int32),
                        "dl": np.concatenate(dls),
                    }
                )

    return postings.mapInPandas(decode, schema="term_id long, doc_id long, tf int, dl long")


def compact(spark: SparkSession, paths: ib.IndexPaths) -> dict:
    """Fold the delta log into the compressed barrels (steps 5-7 above).
    Rewrites ONLY the barrels that received deltas — the parquet-directory
    equivalent of Iceberg rewrite-data-files on affected partitions."""
    ddir = delta_dir(paths)
    if not os.path.exists(ddir):
        return {"compacted_barrels": 0}
    stats = ib.read_stats(spark, paths)
    n_barrels = int(stats["n_barrels"])
    n_salts = int(stats["n_salts"])
    salt_threshold = int(stats["salt_threshold"])

    deltas = spark.read.parquet(ddir)
    affected_barrels = sorted(
        r["barrel"] for r in deltas.select("barrel").distinct().collect()
    )
    if not affected_barrels:
        return {"compacted_barrels": 0}
    affected_terms = deltas.select("term_id").distinct()

    postings = ib.read_postings(spark, paths.postings)
    base_in_barrels = postings.filter(F.col("barrel").isin(affected_barrels))
    base_affected = base_in_barrels.join(
        F.broadcast(affected_terms), "term_id", "left_semi"
    )
    base_untouched = base_in_barrels.join(
        F.broadcast(affected_terms), "term_id", "left_anti"
    )

    # union decoded base + delta rows, refresh df per term, re-encode
    base_rows = decode_postings_rows(base_affected)
    all_rows = base_rows.unionByName(
        deltas.select("term_id", "doc_id", "tf", "dl")
    )
    all_rows.cache()
    # absolute per-term stats over the merged rows — authoritative df/cf
    # for both the re-encode and the lexicon refresh
    term_stats = all_rows.groupBy("term_id").agg(
        F.count("*").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.max("tf").cast("long").alias("max_tf"),
        F.min("dl").cast("long").alias("min_dl"),
    )
    term_stats.cache()
    joined = (
        all_rows.join(term_stats.select("term_id", "df"), "term_id")
        .select(
            "term_id", "df", "doc_id", "tf", "dl",
            ib.salt_col(n_salts, salt_threshold),
        )
    )
    re_encoded = ib.encode_postings(joined, n_barrels)

    merged = base_untouched.unionByName(re_encoded)

    # 6. refreshed lexicon: absolute df/cf recount from the merged rows
    # (no additive drift)
    lexicon = spark.read.parquet(paths.lexicon)
    upd = term_stats.withColumnsRenamed(
        {"df": "df_new", "cf": "cf_new", "max_tf": "mt_new", "min_dl": "md_new"}
    )
    new_lex = (
        lexicon.join(upd, "term_id", "left")
        .select(
            "term",
            "term_id",
            F.coalesce("df_new", F.col("df")).cast("long").alias("df"),
            F.coalesce("cf_new", F.col("cf")).cast("long").alias("cf"),
            F.coalesce("mt_new", F.col("max_tf")).cast("long").alias("max_tf"),
            F.coalesce("md_new", F.col("min_dl")).cast("long").alias("min_dl"),
        )
    )

    # Stage EVERYTHING before swapping anything — every read above is lazy
    # against the live directories, so all writes must materialize first
    # (the Iceberg equivalent is one multi-table snapshot commit).
    staging = f"{paths.postings}_compact_staging"
    merged.write.mode("overwrite").partitionBy("barrel").parquet(staging)
    lex_staging = f"{paths.lexicon}_staging"
    new_lex.write.mode("overwrite").parquet(lex_staging)

    for b in affected_barrels:
        src = f"{staging}/barrel={b}"
        dst = f"{paths.postings}/barrel={b}"
        shutil.rmtree(dst, ignore_errors=True)
        os.replace(src, dst)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(paths.lexicon)
    os.replace(lex_staging, paths.lexicon)

    # refresh the hot-term theta sketches from the compacted postings
    # (metadata-only scan: theta_* columns + df, pruned by parquet)
    hb = ib.build_hot_bounds(
        ib.read_postings(spark, paths.postings), salt_threshold
    )
    hb.write.mode("overwrite").parquet(paths.hot_bounds)

    # 7. truncate the delta log
    shutil.rmtree(ddir)
    all_rows.unpersist()
    term_stats.unpersist()
    return {"compacted_barrels": len(affected_barrels)}
