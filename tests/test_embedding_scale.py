"""Scale-shape guards for the random-hyperplane embedding near-dup
operator (q_embedding_rp_near_dup) — the embedding-side twin of
tests/test_dedup_scale.py.

Three properties, mirroring the text-side LSH guards:
- sparsity: banded candidates ≪ all-pairs on the driver-gate corpus;
- O(c) on an exact-duplicate embedding cluster: identical vectors share
  every band key, so banding raw rows would emit c·(c−1)/2 pairs from
  each bucket — the quantized-vector pre-collapse must make candidate
  counts independent of c (VERDICT r2's last quadratic hazard);
- recall: planted true near-dups (cosine ≥ 0.95, bit-collision prob
  1 − θ/π ≈ 0.93 ⇒ ≥1-of-4-bands prob ≈ 0.97) must surface.
"""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.operators import corpus

SF = "/root/testdata/sf0.01"

_CLUSTER_C = 1000
_N_BASE = 60
_N_NEAR = 8  # planted near-dup pairs
_DIMS = corpus._RP_DIMS


@pytest.fixture(scope="module")
def rp_fixture_dir(tmp_path_factory):
    """Synthetic embeddings table (driver parquet shape): one
    1000-member identical-vector cluster + 60 random vectors + 8 planted
    near-dup pairs (unit vector + N(0, 0.02) noise ⇒ cosine ≈ 0.987,
    per-bit collision prob ≈ 0.95, ≥1-of-4-bands ≈ 0.99)."""
    import pandas as pd

    rng = np.random.default_rng(7)
    rows: list[dict] = []

    def add(vec_id: int, v: np.ndarray, label: int) -> None:
        rows.append(
            {
                "vec_id": vec_id,
                "embedding": v.astype(np.float32).tolist(),
                "label": label,
            }
        )

    boiler = rng.normal(size=_DIMS)
    boiler /= np.linalg.norm(boiler)
    for i in range(_CLUSTER_C):
        add(i, boiler, 0)
    for i in range(_N_BASE):
        v = rng.normal(size=_DIMS)
        add(10_000 + i, v / np.linalg.norm(v), 1)
    for i in range(_N_NEAR):
        v = rng.normal(size=_DIMS)
        v /= np.linalg.norm(v)
        w = v + rng.normal(scale=0.02, size=_DIMS)
        w /= np.linalg.norm(w)
        add(20_000 + 2 * i, v, 2)
        add(20_000 + 2 * i + 1, w, 2)
    d = tmp_path_factory.mktemp("rpfixture")
    pd.DataFrame(rows).to_parquet(f"{d}/embeddings.parquet", index=False)
    return str(d)


def test_rp_near_dup_sparse_on_gate_corpus(spark):
    """On the driver-gate embeddings (500 random-ish vectors, max cosine
    ≈ 0.51) the verified output is a SPARSE subset of the exact
    ≥0.35-cosine pairs: every surfaced pair is genuinely ≥ 0.35, and the
    banding keeps the candidate join far from all-pairs."""
    n = corpus.embeddings(spark, SF).count()
    rows = corpus.q_embedding_rp_near_dup(spark, SF).collect()
    assert 0 < len(rows) < 0.05 * n * (n - 1) / 2
    assert all(r["cosine"] >= 0.35 for r in rows)


def test_rp_near_dup_o_of_c_on_dup_cluster(spark, rp_fixture_dir):
    """The 1000-member identical-embedding cluster must contribute ZERO
    intra-cluster pairs (collapsed to one representative before banding)
    and the total output must be bounded by representative pairs — not
    the ~5·10^5 pairs the un-collapsed bucket self-join would emit."""
    rows = corpus.q_embedding_rp_near_dup(spark, rp_fixture_dir).collect()
    assert not any(
        r["vec_a"] < _CLUSTER_C and r["vec_b"] < _CLUSTER_C for r in rows
    )
    n_reps = 1 + _N_BASE + 2 * _N_NEAR
    assert len(rows) <= n_reps * (n_reps - 1) / 2


def test_rp_near_dup_recall_on_planted_pairs(spark, rp_fixture_dir):
    """Planted near-dup pairs (cosine ≈ 0.987) must band-collide and
    surface; ≥ 80% recall is the contract (theory says ≈ 99% at these
    angles — the fixture is deterministic, so this either always passes
    or the geometry is wrong)."""
    rows = corpus.q_embedding_rp_near_dup(spark, rp_fixture_dir).collect()
    found = {(r["vec_a"], r["vec_b"]) for r in rows}
    planted = {
        (20_000 + 2 * i, 20_000 + 2 * i + 1) for i in range(_N_NEAR)
    }
    hit = planted & found
    assert len(hit) >= 0.8 * len(planted), (sorted(planted - found), found)


@pytest.fixture(scope="module")
def ivf_fixture_dir(tmp_path_factory):
    """Embeddings fixture with DIVERSE codebook-init vectors — ids 1..8
    seed the k-means cells and ids 1..4's subvectors seed the PQ
    codebooks (the rp fixture's identical-cluster head would collapse
    both trainings) — plus 5 planted near-dups of the query (id 0,
    noise scale 0.03 ⇒ cosine ≈ 0.97): the exact-cosine top-5. (At
    noise 0.05 the K=4-per-subspace codebook already splits 2 of the 5
    pairs into different code words — the coarse-codebook regime, kept
    out of the recall contract deliberately.)"""
    import pandas as pd

    rng = np.random.default_rng(11)
    rows: list[dict] = []

    def add(vec_id: int, v: np.ndarray, label: int) -> None:
        rows.append(
            {
                "vec_id": vec_id,
                "embedding": v.astype(np.float32).tolist(),
                "label": label,
            }
        )

    q = rng.normal(size=_DIMS)
    q /= np.linalg.norm(q)
    add(0, q, 0)
    for i in range(1, 9):  # codebook-init diversity
        v = rng.normal(size=_DIMS)
        add(i, v / np.linalg.norm(v), 0)
    for i in range(500):  # background corpus
        v = rng.normal(size=_DIMS)
        add(100 + i, v / np.linalg.norm(v), 1)
    for i in range(5):  # planted true neighbors
        w = q + rng.normal(scale=0.03, size=_DIMS)
        add(5000 + i, w / np.linalg.norm(w), 2)
    d = tmp_path_factory.mktemp("ivffixture")
    pd.DataFrame(rows).to_parquet(f"{d}/embeddings.parquet", index=False)
    return str(d)


def test_ivf_adc_recall_on_planted_neighbors(spark, ivf_fixture_dir):
    """IVFADC end-to-end recall vs exact cosine (VERDICT r4 #2): the 5
    planted near-dups of the query are its exact-cosine top-5; the
    composition (k-means cell routing → PQ ADC ranking) must surface at
    least 4 of them in its top-10 — the coarse quantizer has to route
    the query to the cell(s) holding its neighbors AND the shared codes
    have to rank them ahead of the 500-vector background."""
    planted = set(range(5000, 5005))
    got = {
        r["vec_id"]
        for r in corpus.q_ivf_adc_topk(spark, ivf_fixture_dir).collect()
    }
    assert len(planted & got) >= 4, sorted(got)
    # exact rerank inside the same probed cells recovers all 5 at the top
    exact_in_cells = [
        r["vec_id"]
        for r in corpus.q_kmeans_ivf_topk(spark, ivf_fixture_dir).collect()
    ]
    assert set(exact_in_cells[:5]) == planted, exact_in_cells


def test_ivfadc_residual_recall_on_planted_neighbors(spark, ivf_fixture_dir):
    """Residual IVFADC (the true Jégou §IV layout) must clear the same
    recall bar as the non-residual composition on the planted fixture:
    ≥4 of the query's 5 exact-cosine top-5 neighbors in its ADC top-10.
    Residual codebooks quantize x − cell_centroid, so the neighbors
    (which share the query's cell) sit in a tighter code space — recall
    may only improve; the floor is the contract."""
    planted = set(range(5000, 5005))
    got = {
        r["vec_id"]
        for r in corpus.q_ivfadc_residual_topk(spark, ivf_fixture_dir).collect()
    }
    assert len(planted & got) >= 4, sorted(got)


def test_engine_pq_adc_bit_equals_declarative(spark):
    """The packed-codes numpy ADC kernel (operators/ann.py, VERDICT r4
    #5) must return BIT-IDENTICAL rows to the declarative
    q_pq_adc_topk on the driver corpus — same vec_ids, same order, same
    6-dp adc doubles (the determinism argument lives in ann.py's module
    docstring: every summand is a 6-dp decimal, so the exact sum sits a
    full half-quantum from any round-6 boundary and summation order /
    rounding mode cannot move the answer)."""
    decl = [
        (r["vec_id"], r["adc"])
        for r in corpus.q_pq_adc_topk(spark, SF).collect()
    ]
    kern = [
        (r["vec_id"], r["adc"])
        for r in corpus.q_engine_pq_adc_topk(spark, SF).collect()
    ]
    assert kern == decl


def test_pq_pack_roundtrip(spark):
    """Packed blobs decode back to exactly the per-vector code table —
    every vec_id, s-ascending codes, vec_id-sorted within blocks."""
    from search_engine_spark.operators import ann

    codes, _, _ = corpus._pq_fit(spark, SF)
    packed = ann.pack_pq_codes(codes, corpus._PQ_M).collect()
    got = ann.unpack_pq_codes(packed)
    want_rows = codes.collect()
    want: dict[int, list[int]] = {}
    for r in want_rows:
        want.setdefault(int(r["vec_id"]), [0] * corpus._PQ_M)[
            int(r["s"])
        ] = int(r["c"])
    assert got == want
    # blocks are vec_id-sorted internally (the serving-scan contract)
    for r in packed:
        vids = np.frombuffer(r["vec_ids"], dtype="<i8")
        assert list(vids) == sorted(vids)
        assert int(r["block_first"]) == int(vids[0])


def test_pq_kernel_encode_equals_declarative_codes(spark):
    """The numpy encode kernel (ann.encode_pack_pq — one shuffle-free
    Arrow pass from raw embeddings) must assign EXACTLY the codes the
    declarative posexplode-join `_assign` produces, including argmin
    tie direction (lowest c) and the round-before-argmin discipline."""
    from search_engine_spark.operators import ann

    codes, _, cents = corpus._pq_fit(spark, SF)
    want: dict[int, list[int]] = {}
    for r in codes.collect():
        want.setdefault(int(r["vec_id"]), [0] * corpus._PQ_M)[
            int(r["s"])
        ] = int(r["c"])
    emb = corpus.embeddings(spark, SF).select("vec_id", "embedding")
    packed = ann.encode_pack_pq(
        emb, cents.collect(), corpus._PQ_M, corpus._PQ_SUBDIM
    ).collect()
    got = ann.unpack_pq_codes(packed)
    assert got == want


def test_pq_adc_reasonable_vs_exact(spark):
    """PQ-ADC sanity on the driver corpus: the 4×16-dim / K=4 codebook is
    deliberately coarse (deterministic, oracle-mirrored), so assert
    structural properties rather than tight recall — top-k is exactly k,
    query excluded, distances ascending, and the ADC ranking genuinely
    points toward the query: the exact-L2 ranks of the ADC top-10 must
    be strongly better than chance (measured: median exact-rank ≈ 100 of
    499 vs 250 random; best ≈ 29). Bit-exact ADC arithmetic itself is the
    DuckDB parity row's job (oracle:`pq_adc_topk`); a 256-cell codebook
    cannot promise exact-top-10 overlap and this test doesn't claim it."""
    import pyspark.sql.functions as F

    rows = corpus.q_pq_adc_topk(spark, SF).collect()
    assert len(rows) == 10
    assert all(r["vec_id"] != 0 for r in rows)
    dists = [r["adc"] for r in rows]
    assert dists == sorted(dists)
    emb = corpus.embeddings(spark, SF)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    d2 = F.aggregate(
        F.zip_with(
            "embedding", "q_emb",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", d2.alias("d2"))
        .orderBy(F.asc("d2"), F.asc("vec_id"))
        .collect()
    )
    ranks = {r["vec_id"]: i for i, r in enumerate(exact)}
    n = len(exact)
    pq_ranks = sorted(ranks[r["vec_id"]] for r in rows)
    assert pq_ranks[len(pq_ranks) // 2] < 0.35 * n, pq_ranks  # median ≪ chance
    assert pq_ranks[0] < 0.15 * n, pq_ranks  # best member near the true top
