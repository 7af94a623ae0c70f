"""LSH banding scale-shape guards (VERDICT r1: the round-1 band-size-1
candidate generator produced ~92% of all pairs — correct per oracle but
defeating the purpose of LSH at 100 TB).

With b=4 bands × r=4 rows the candidate probability is 1-(1-s^4)^4 — an
S-curve that passes random Zipf-text pairs (s ≈ 0.0x) with probability
~4·s^4 ≈ 0, while near-dup pairs (s → 1) almost always collide. Both ends
are asserted: sparsity against all-pairs, and recall against the
EXHAUSTIVE (all-pairs) 3-gram Jaccard ground truth — feasible at test
scale precisely because the corpus is small; at 100 TB only the banded
path exists, which is the point."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from search_engine_spark.operators import corpus

# sf0.01 — the driver's correctness-gate scale; sf0.001 contains no
# near-dup pairs at all, which would make the recall half vacuous
SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def cand_pairs(spark):
    return {
        (r["doc_a"], r["doc_b"])
        for r in corpus.q_lsh_candidate_pairs(spark, SF).collect()
    }


def test_lsh_candidates_sparse(spark, cand_pairs):
    n = corpus.documents(spark, SF).filter(F.col("lang") == "en").count()
    assert len(cand_pairs) < 0.05 * n * (n - 1) / 2, (len(cand_pairs), n)
    assert len(cand_pairs) > 0  # the fixture does contain near-dups


def test_lsh_recall_vs_exhaustive_jaccard(spark, cand_pairs):
    """Every pair whose TRUE 3-gram Jaccard ≥ 0.8 must be a candidate
    (at s=0.8, band-collision probability is 1-(1-0.8^4)^4 ≈ 0.87 per
    the S-curve; the fixture's near-dups are s ≈ 1 where it is ~1)."""
    sh = corpus.shingle_df(spark, SF, 3)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "sh_a"})
    sb = sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "sh_b"})
    truth = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "j",
            F.col("n_inter") / (F.col("sh_a") + F.col("sh_b") - F.col("n_inter")),
        )
        .filter(F.col("j") >= 0.8)
    )
    high = {(r["doc_a"], r["doc_b"]) for r in truth.collect()}
    assert high, "fixture should contain >=0.8-jaccard near-dup pairs"
    assert high <= cand_pairs


def test_simhash_near_dup_sparse(spark):
    """The Hamming-banded SimHash pair generator must stay far from
    all-pairs while still surfacing the near-dup cluster."""
    n = corpus.documents(spark, SF).filter(F.col("lang") == "en").count()
    rows = corpus.q_simhash_near_dup(spark, SF).collect()
    assert 0 < len(rows) < 0.05 * n * (n - 1) / 2
    assert all(r["hamming"] <= corpus._SIMHASH_HAMMING_MAX for r in rows)
