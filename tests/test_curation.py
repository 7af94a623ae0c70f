"""Semantic tests for the web-corpus curation signals
(operators/corpus.py: boilerplate mining, Gopher repetition, per-source
rollup, PII scrub). The driver-gate parity rows check these against DuckDB
on the PII-free synthetic corpus; these tests check the *semantics* on
handcrafted corpora where the expected values are computable by hand —
including the PII recall side the gate corpus cannot exercise."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
import pyspark.sql.functions as F

from search_engine_spark.operators import corpus


def _docs_dir(tmp_path_factory, name, rows):
    pdf = pd.DataFrame(rows)
    if "lang" not in pdf:
        pdf["lang"] = "en"
    if "source" not in pdf:
        pdf["source"] = "src1"
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path_factory.mktemp(name)
    pdf.to_parquet(f"{d}/documents.parquet", index=False)
    return str(d)


# --- repetition signals ---------------------------------------------------


@pytest.fixture(scope="module")
def rep_dir(tmp_path_factory):
    return _docs_dir(
        tmp_path_factory,
        "repetition",
        [
            # 4 tokens, bigrams = [a a, a a, a a]: fully repeated
            {"doc_id": 0, "text": "a a a a"},
            # bigrams = [x y, y z, z w]: all unique
            {"doc_id": 1, "text": "x y z w"},
            # bigrams = [p q, q p, p q]: "p q"×2 + "q p"×1
            {"doc_id": 2, "text": "p q p q"},
            # single token: no bigrams, must emit NO row
            {"doc_id": 3, "text": "lonely"},
        ],
    )


def test_repetition_signals_hand_values(spark, rep_dir):
    rows = {
        r["doc_id"]: r
        for r in corpus.q_repetition_signals(spark, rep_dir).collect()
    }
    assert set(rows) == {0, 1, 2}  # doc 3 has no bigrams
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["top_bigram_frac"] == 1.0
    assert rows[0]["dup_bigram_frac"] == 1.0
    assert rows[1]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert rows[1]["dup_bigram_frac"] == 0.0
    assert rows[2]["n_bigrams"] == 3
    assert rows[2]["top_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert rows[2]["dup_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)


# --- boilerplate mining ---------------------------------------------------


@pytest.fixture(scope="module")
def boiler_dir(tmp_path_factory):
    rows = [
        # the injected banner appears in 30 docs, each followed by a
        # unique tail so the docs are not exact duplicates
        {"doc_id": i, "text": f"accept cookie policy banner unique{i} tail{i}"}
        for i in range(30)
    ]
    rows += [
        {"doc_id": 100 + i, "text": f"organic body{i} content{i} words{i}"}
        for i in range(5)
    ]
    return _docs_dir(tmp_path_factory, "boiler", rows)


def test_boilerplate_ngrams_ranks_banner_first(spark, boiler_dir):
    top = corpus.q_boilerplate_ngrams(spark, boiler_dir).collect()
    by_ngram = {r["ngram"]: r["df"] for r in top}
    # every banner-internal bigram has df=30 and outranks everything else
    for bg in ["accept cookie", "cookie policy", "policy banner"]:
        assert by_ngram[bg] == 30
    head = [r["ngram"] for r in top[:3]]
    assert set(head) == {"accept cookie", "cookie policy", "policy banner"}
    # every per-doc-unique bigram has df=1
    assert by_ngram.get("banner unique0", 1) == 1


# --- per-source rollup ----------------------------------------------------


@pytest.fixture(scope="module")
def source_dir(tmp_path_factory):
    rows = [
        # srcA: 4 docs, 2 of them identical → dup_rate = 1 - 3/4
        {"doc_id": 0, "source": "srcA", "text": "alpha beta gamma delta"},
        {"doc_id": 1, "source": "srcA", "text": "alpha beta gamma delta"},
        {"doc_id": 2, "source": "srcA", "text": "epsilon zeta eta theta"},
        {"doc_id": 3, "source": "srcA", "text": "iota kappa lambda mu"},
        # srcB: 2 distinct docs → dup_rate 0
        {"doc_id": 4, "source": "srcB", "text": "nu xi omicron pi"},
        {"doc_id": 5, "source": "srcB", "text": "rho sigma tau upsilon"},
    ]
    return _docs_dir(tmp_path_factory, "sourcestats", rows)


def test_source_stats_hand_values(spark, source_dir):
    rows = {r["source"]: r for r in corpus.q_source_stats(spark, source_dir).collect()}
    assert rows["srcA"]["n_docs"] == 4
    assert rows["srcA"]["dup_rate"] == pytest.approx(0.25, abs=1e-6)
    assert rows["srcB"]["n_docs"] == 2
    assert rows["srcB"]["dup_rate"] == 0.0
    # all docs: 4 tokens, all distinct → quality = 0.04*0.5 + 1.0*0.5 = 0.52
    assert rows["srcB"]["mean_quality"] == pytest.approx(0.52, abs=1e-6)
    assert rows["srcB"]["mean_tokens"] == 4.0


# --- PII scrub ------------------------------------------------------------

_PII_ROWS = [
    {"doc_id": 0, "text": "contact me at jane.doe+spam@example.co.uk today"},
    {"doc_id": 1, "text": "server 192.168.1.254 and backup 10.0.0.1 are up"},
    {"doc_id": 2, "text": "call 555-867-5309 or 415.555.2671 after noon"},
    {"doc_id": 3, "text": "mixed bob@host.io at 127.0.0.1 dial 800-555-0100"},
    {"doc_id": 4, "text": "clean text with no personal identifiers at all"},
]


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    return _docs_dir(tmp_path_factory, "pii", _PII_ROWS)


def test_pii_scrub_recall_counts(spark, pii_dir):
    rows = {r["doc_id"]: r for r in corpus.q_pii_scrub(spark, pii_dir).collect()}
    assert (rows[0]["n_emails"], rows[0]["n_ips"], rows[0]["n_phones"]) == (1, 0, 0)
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (0, 2, 0)
    assert (rows[2]["n_emails"], rows[2]["n_ips"], rows[2]["n_phones"]) == (0, 0, 2)
    assert (rows[3]["n_emails"], rows[3]["n_ips"], rows[3]["n_phones"]) == (1, 1, 1)
    assert (rows[4]["n_emails"], rows[4]["n_ips"], rows[4]["n_phones"]) == (0, 0, 0)


def test_pii_scrub_masks_text(spark, pii_dir):
    """The masked text (recomputed via the shared column builder) carries
    placeholders and no residual PII literal."""
    masked = {
        r["doc_id"]: r["m"]
        for r in corpus.documents(spark, pii_dir)
        .select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("text"), F.lit(corpus.PII_EMAIL), F.lit("<EMAIL>")
                    ),
                    F.lit(corpus.PII_IP),
                    F.lit("<IP>"),
                ),
                F.lit(corpus.PII_PHONE),
                F.lit("<PHONE>"),
            ).alias("m"),
        )
        .collect()
    }
    assert masked[0] == "contact me at <EMAIL> today"
    assert masked[1] == "server <IP> and backup <IP> are up"
    assert masked[2] == "call <PHONE> or <PHONE> after noon"
    assert masked[3] == "mixed <EMAIL> at <IP> dial <PHONE>"
    assert masked[4] == _PII_ROWS[4]["text"]


def test_pii_scrub_java_vs_re2_on_pii_docs(spark, pii_dir):
    """The gate corpus is PII-free, so its parity row only proves the
    false-positive side. This is the recall-side cross-engine check: the
    full q_pii_scrub output (counts + masked hash) must be identical
    between Spark (Java regex) and DuckDB (RE2) on PII-laden docs."""
    got = {
        r["doc_id"]: (r["n_emails"], r["n_ips"], r["n_phones"], r["masked_hash"])
        for r in corpus.q_pii_scrub(spark, pii_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pii_dir}/documents.parquet'"
    )
    want = {
        int(d): (int(e), int(i), int(p), h)
        for d, e, i, p, h in con.execute(
            corpus.ORACLE_SQL["pii_scrub"]
        ).fetchall()
    }
    assert got == want


# --- benchmark decontamination --------------------------------------------


@pytest.fixture(scope="module")
def decon_dir(tmp_path_factory):
    eval_text = "quick brown fox jumps over lazy dog tonight"
    rows = [
        # doc_id 0 and 97: the deterministic eval set (doc_id % 97 == 0)
        {"doc_id": 0, "text": eval_text},
        {"doc_id": 97, "text": "unrelated benchmark question about math"},
        # doc 1: verbatim leak of the eval text -> many shared shingles
        {"doc_id": 1, "text": eval_text + " plus trailing words here"},
        # doc 2: shares exactly ONE 3-gram ("quick brown fox") -> below
        # the flag threshold
        {"doc_id": 2, "text": "quick brown fox otherwise totally different words"},
        # doc 3: clean
        {"doc_id": 3, "text": "completely separate content nothing shared"},
    ]
    return _docs_dir(tmp_path_factory, "decon", rows)


def test_decontaminate_flags_leaked_docs(spark, decon_dir):
    rows = {
        r["doc_id"]: r for r in corpus.q_decontaminate(spark, decon_dir).collect()
    }
    # eval docs themselves are never in the output
    assert 0 not in rows and 97 not in rows
    # the verbatim leak shares all 6 eval shingles and is flagged
    assert rows[1]["n_shared"] >= corpus._DECON_MIN_SHARED
    assert rows[1]["contaminated"] == 1
    # one shared shingle: reported but not flagged
    assert rows[2]["n_shared"] == 1 and rows[2]["contaminated"] == 0
    # clean doc emits no row
    assert 3 not in rows


def test_decontaminate_bloom_bit_equal_to_exact(spark, decon_dir):
    """The Bloom pre-filter + exact verify must reproduce q_decontaminate
    exactly: no false negatives (a Bloom property) and no surviving
    false positives (the verify join's job)."""
    exact = sorted(
        tuple(r) for r in corpus.q_decontaminate(spark, decon_dir).collect()
    )
    bloom = sorted(
        tuple(r)
        for r in corpus.q_decontaminate_bloom(spark, decon_dir).collect()
    )
    assert bloom == exact


def test_decontaminate_bloom_prefilter_selective(spark, decon_dir):
    """The bitmap probe must actually FILTER (a broken always-true probe
    would hide behind the verify join): doc 3 shares nothing with the
    eval set, and with m=2^17 bits vs ~16 set positions the per-shingle
    fp odds are ~(16/131072)^4 ≈ 2e-16 — ANY doc-3 survivor means the
    probe predicate is wrong. Conversely every truly-shared shingle
    must survive (no false negatives): doc 1's verbatim leak keeps all
    its shared shingles."""
    candidates, eval_sh = corpus._bloom_candidates(spark, decon_dir)
    by_doc = {
        r["doc_id"]: r["n"]
        for r in candidates.groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert 3 not in by_doc  # zero-overlap doc dies at the probe
    # no false negatives: the probe keeps every truly-shared shingle —
    # at least the exact operator's per-doc n_shared (5 for the
    # verbatim leak after stopword filtering, 1 for doc 2); exact
    # counts are the bit-equality test's job
    exact = {
        r["doc_id"]: r["n_shared"]
        for r in corpus.q_decontaminate(spark, decon_dir).collect()
    }
    for doc_id, n_shared in exact.items():
        assert by_doc.get(doc_id, 0) >= n_shared


# --- _ngrams_of executable spec -------------------------------------------


def test_passage_dedup_planted(spark, tmp_path):
    """Passage-level substring dedup: two LONG unique docs sharing one
    45-token quoted run (>= W+S-1 = 44, the guaranteed-detection
    threshold) must surface a shared passage; the unique doc and a
    short doc (< W tokens) must not. Doc-level dedup sees nothing here —
    all four texts are distinct."""
    import pandas as pd

    quote = [f"quoted{i}" for i in range(45)]
    a = [f"alpha{i}" for i in range(40)] + quote + [f"tailA{i}" for i in range(20)]
    b = [f"beta{i}" for i in range(25)] + quote + [f"tailB{i}" for i in range(35)]
    u = [f"unique{i}" for i in range(90)]
    rows = [
        {"doc_id": 1, "text": " ".join(a), "lang": "en"},
        {"doc_id": 2, "text": " ".join(b), "lang": "en"},
        {"doc_id": 3, "text": " ".join(u), "lang": "en"},
        {"doc_id": 4, "text": "tiny doc below window", "lang": "en"},
    ]
    pdf = pd.DataFrame(rows)
    pdf["source"] = "src1"
    pdf["n_chars"] = pdf["text"].str.len()
    d = str(tmp_path / "passage")
    import os

    os.makedirs(d)
    pdf.to_parquet(f"{d}/documents.parquet", index=False)
    out = corpus.q_passage_dedup(spark, d).collect()
    assert out, "the planted 45-token shared run must surface"
    # every duplicated passage involves exactly docs 1 and 2
    assert all(r["n_docs"] == 2 and r["first_doc_id"] == 1 for r in out)
    # exhaustive cross-check: brute-force window sets of docs 1 and 2
    def wins(toks):
        W, S = corpus._PASSAGE_W, corpus._PASSAGE_S
        return {
            " ".join(toks[i : i + W])
            for i in range(0, len(toks) - W + 1, S)
        }
    shared = wins(a) & wins(b)
    assert len(out) == len(shared)


def test_bigram_logprob_detects_shuffled_text(spark, tmp_path_factory):
    """The order-1 signal's reason to exist (round 5): a token-shuffled
    doc has BIT-IDENTICAL unigram logprob to the original (same token
    multiset → same tf, same corpus cf) but scores strictly lower under
    the bigram LM — its transitions are unseen while the original's are
    corpus-frequent. Also: a single-token doc emits no row (no
    bigrams)."""
    sent = "the cat sat on the mat and the dog ran to the house"
    rows = [{"doc_id": i, "text": sent} for i in range(20)]
    rows.append({"doc_id": 100, "text": sent})
    rows.append(
        {"doc_id": 101, "text": " ".join(reversed(sent.split(" ")))}
    )
    rows.append({"doc_id": 102, "text": "lonely"})
    d = _docs_dir(tmp_path_factory, "bigramlm", rows)
    uni = {
        int(r["doc_id"]): float(r["mean_logprob"])
        for r in corpus.q_unigram_logprob(spark, d).collect()
    }
    assert uni[100] == uni[101]  # order-0 is blind to the shuffle
    bi = {
        int(r["doc_id"]): float(r["mean_logprob"])
        for r in corpus.q_bigram_logprob(spark, d).collect()
    }
    assert bi[100] > bi[101]  # order-1 sees it
    assert 102 not in bi and 102 in uni


def test_ngrams_of_matches_python_spec(spark):
    """The iterated-zip_with n-gram constructor has a subtle contract
    (zip_with null-pads the shorter side; concat_ws silently skips nulls;
    the tail slice must drop exactly the padded suffix). Batch-property
    test: 300 seeded random token arrays — including empties, 1-token,
    double-space (empty-string tokens) and unicode — must equal the
    obvious Python spec for n = 2, 3, 4 in ONE Spark job."""
    import random

    rng = random.Random(42)
    vocab = ["a", "bb", "ccc", "", "naïve", "x1", "日本", "z"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    arr = F.split(F.col("text"), " ")
    out = df.select(
        "doc_id",
        "text",
        *[corpus._ngrams_of(arr, n).alias(f"g{n}") for n in (2, 3, 4)],
    ).collect()
    assert len(out) == 300
    for r in out:
        toks = r["text"].split(" ")
        for n in (2, 3, 4):
            want = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            assert list(r[f"g{n}"]) == want, (r["text"], n)


# --- HyperLogLog distinct sketch -------------------------------------------


@pytest.fixture(scope="module")
def hll_dir(tmp_path_factory):
    """Two sources straddling the estimator's two branches: 'big' has
    5000 distinct tokens (all 64 registers hit -> raw harmonic-mean
    branch), 'small' has 30 (mostly-empty registers -> linear-counting
    branch)."""
    big = [
        {
            "doc_id": i,
            "source": "big",
            "text": " ".join(f"tok{i * 500 + j}" for j in range(500)),
        }
        for i in range(10)
    ]
    small = [
        {
            "doc_id": 100 + i,
            "source": "small",
            # overlapping windows: 30 distinct tokens total, repeated
            "text": " ".join(f"word{(i * 7 + j) % 30}" for j in range(40)),
        }
        for i in range(5)
    ]
    return _docs_dir(tmp_path_factory, "hll", big + small)


def test_hll_estimate_accuracy_both_branches(spark, hll_dir):
    """The deterministic-HLL estimate must land within the published
    error envelope on both branches: ~3σ = 39% for the raw branch at
    m=64 (md5 is fixed, so the observed error is deterministic — the
    bound just documents the contract), and much tighter for linear
    counting at low fill."""
    rows = {
        r["source"]: r
        for r in corpus.q_hll_distinct_tokens(spark, hll_dir).collect()
    }
    assert set(rows) == {"big", "small"}
    big = rows["big"]
    assert big["n_registers"] == 64  # 5000 tokens saturate 64 buckets
    assert abs(big["est_distinct"] - 5000) / 5000 < 0.39, big
    small = rows["small"]
    assert small["n_registers"] < 64  # LC regime
    assert abs(small["est_distinct"] - 30) / 30 < 0.15, small


# --- source-authority PageRank ---------------------------------------------


@pytest.fixture(scope="module")
def pr_dir(tmp_path_factory):
    """5 sources: hub/s1/s2 syndicate one 10-token passage (rare
    shingles -> a K3 edge clique, weight 8 each way); iso1/iso2 have
    unique text (dangling nodes)."""
    shared = (
        "quantum ledger photon matrix krypton vector nebula cosmic "
        "turbine piston"
    )
    rows = [
        {"doc_id": 0, "source": "hub", "text": shared + " hubextra"},
        {"doc_id": 1, "source": "s1", "text": shared + " oneextra"},
        {"doc_id": 2, "source": "s2", "text": shared + " twoextra"},
        {"doc_id": 3, "source": "iso1", "text": "lonely island coconut palm drift"},
        {"doc_id": 4, "source": "iso2", "text": "desert dune cactus mirage sand"},
    ]
    return _docs_dir(tmp_path_factory, "pagerank", rows)


def test_source_pagerank_syndication_clique(spark, pr_dir):
    """Syndicating sources must outrank isolated ones, probability mass
    must be conserved (sum == 1 up to the 8-dp per-iteration rounding),
    and the K3 members are symmetric so their ranks must be equal."""
    rows = {
        r["source"]: r["pagerank"]
        for r in corpus.q_source_pagerank(spark, pr_dir).collect()
    }
    assert set(rows) == {"hub", "s1", "s2", "iso1", "iso2"}
    assert abs(sum(rows.values()) - 1.0) < 1e-6, rows
    assert rows["hub"] == rows["s1"] == rows["s2"]
    assert rows["iso1"] == rows["iso2"]
    assert rows["hub"] > rows["iso1"] * 2, rows


def test_source_pagerank_no_edges_is_uniform(spark, tmp_path_factory):
    """With no cross-source shingle sharing every node is dangling and
    the damped iteration has the uniform vector as a fixpoint: every
    rank must be exactly 1/n at every iteration (0.15/n + 0.85*(1/n)
    == 1/n -- rounding can't move an exactly-representable 0.2)."""
    d = _docs_dir(
        tmp_path_factory,
        "pagerank_uniform",
        [
            {"doc_id": 0, "source": "u1", "text": "apple banana cherry damson"},
            {"doc_id": 1, "source": "u2", "text": "elder fig grape hazel"},
            {"doc_id": 2, "source": "u3", "text": "iris jasmine kiwi lemon"},
            {"doc_id": 3, "source": "u4", "text": "mango nutmeg olive peach"},
            {"doc_id": 4, "source": "u5", "text": "quince radish sorrel thyme"},
        ],
    )
    rows = corpus.q_source_pagerank(spark, d).collect()
    assert len(rows) == 5
    assert all(r["pagerank"] == 0.2 for r in rows), rows


def test_bm25_authority_blend_reorders_ties(spark, tmp_path_factory):
    """Two docs with IDENTICAL text (equal BM25 for the OR query) but
    different sources: pure BM25 breaks the tie by doc_id; the blend
    must put the syndicated (high-authority) source's doc first even
    though its doc_id is higher — and a doc that doesn't match the
    query must stay absent no matter its authority."""
    shared = (
        "quantum ledger photon matrix krypton vector nebula cosmic "
        "turbine piston"
    )
    rows = [
        # the authority clique (hub syndicates with s1/s2)
        {"doc_id": 0, "source": "hub", "text": shared + " hubpad"},
        {"doc_id": 1, "source": "s1", "text": shared + " onepad"},
        {"doc_id": 2, "source": "s2", "text": shared + " twopad"},
        # equal-BM25 pair: same text, lower id in the ISOLATED source
        {"doc_id": 10, "source": "iso", "text": "fast query scan padding here"},
        {"doc_id": 20, "source": "hub", "text": "fast query scan padding here"},
        # authority without relevance must not surface
        {"doc_id": 30, "source": "hub", "text": "irrelevant filler verbiage"},
    ]
    d = _docs_dir(tmp_path_factory, "authority_blend", rows)
    plain = [r["doc_id"] for r in corpus.q_bm25_topk_or(spark, d).collect()]
    blended = [
        r["doc_id"] for r in corpus.q_bm25_authority_topk(spark, d).collect()
    ]
    assert set(plain) == {10, 20} and set(blended) == {10, 20}
    assert plain.index(10) < plain.index(20)  # tie -> doc_id asc
    assert blended.index(20) < blended.index(10)  # authority wins the tie


def test_cms_overestimate_bound_on_planted_skew(spark, tmp_path_factory):
    """Count-Min contract on a skewed vocabulary: one hot token (5000
    occurrences) among 4000 distinct cold ones. For every returned row
    est >= exact (counters only over-count), and the overestimate is
    within the ε = e/w envelope of total mass N (md5 is fixed, so the
    observed error is deterministic — the bound documents the
    contract). The hot token must rank first with its exact count."""
    import math

    n_cold = 4000
    rows = [
        {
            "doc_id": i,
            "text": " ".join(
                ["hottoken"] * 50 + [f"cold{i * 40 + j}" for j in range(40)]
            ),
        }
        for i in range(100)
    ]
    d = _docs_dir(tmp_path_factory, "cms_skew", rows)
    out = corpus.q_cms_heavy_hitters(spark, d).collect()
    assert len(out) == 20
    by_term = {r["term"]: r for r in out}
    hot = by_term["hottoken"]
    assert hot["exact_cnt"] == 5000
    n_total = 5000 + 100 * 40
    eps_bound = math.e / 256 * n_total
    for r in out:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["cms_est"] - r["exact_cnt"] <= eps_bound, r
    # the hot token dominates: largest exact count in the returned set
    assert hot["exact_cnt"] == max(r["exact_cnt"] for r in out)


def test_pmi_collocations_ranks_planted_pair_first(spark, tmp_path_factory):
    """Planted collocation vs planted independence: "hong" and "kong"
    ONLY appear as the pair (c12 = c1 = c2 → pmi = ln(B/c12), maximal
    for its count), while "alpha" and "beta" are individually twice as
    frequent but co-occur only sometimes — PMI must rank "hong kong"
    above "alpha beta" even though "alpha beta" has the higher raw
    count. Pairs below the min-count floor must not appear at all."""
    rows = []
    for i in range(10):
        # hong kong: always together, 10 occurrences
        rows.append({"doc_id": i, "text": f"hong kong filler{i} mid{i}"})
    for i in range(20):
        # alpha / beta: frequent, mostly apart (6/20 adjacent)
        if i < 6:
            rows.append({"doc_id": 100 + i, "text": f"alpha beta pad{i} tail{i}"})
        else:
            rows.append({"doc_id": 100 + i, "text": f"alpha gap{i} beta end{i}"})
    # a 4-count bigram: below the min-count floor of 5
    for i in range(4):
        rows.append({"doc_id": 200 + i, "text": f"rare pair only{i} four{i}"})
    d = _docs_dir(tmp_path_factory, "pmi", rows)
    out = corpus.q_pmi_collocations(spark, d).collect()
    ranked = [r["bg"] for r in out]
    assert "hong kong" in ranked and "alpha beta" in ranked
    assert ranked.index("hong kong") < ranked.index("alpha beta")
    hk = next(r for r in out if r["bg"] == "hong kong")
    assert hk["n"] == 10
    assert "rare pair" not in ranked  # min-count floor enforced


def test_tfidf_keywords_planted_distinctive_term(spark, tmp_path_factory):
    """A term concentrated in one doc must be that doc's top keyword; a
    term present in EVERY doc has idf = ln(1) = 0 and can never outrank
    a distinctive term with positive score; ranks are dense 1..k per
    doc and capped at 5."""
    rows = [
        {"doc_id": 0, "text": "ubiquitous zebra zebra zebra common1 common2"},
        {"doc_id": 1, "text": "ubiquitous common1 filler1 filler2 filler3"},
        {"doc_id": 2, "text": "ubiquitous common2 other1 other2 other3"},
    ]
    d = _docs_dir(tmp_path_factory, "tfidf", rows)
    out = corpus.q_tfidf_keywords(spark, d).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
    top0 = min(by_doc[0], key=lambda r: r["rank"])
    assert top0["term"] == "zebra"
    # the everywhere-term scores exactly 0 and never ranks above a
    # positive-scoring distinctive term
    for rs in by_doc.values():
        ubiq = [r for r in rs if r["term"] == "ubiquitous"]
        if ubiq:
            assert ubiq[0]["tfidf"] == 0.0
            positives = [r for r in rs if r["tfidf"] > 0]
            assert all(p["rank"] < ubiq[0]["rank"] for p in positives)


def test_quality_quantiles_match_python_type1_spec(spark, tmp_path_factory):
    """Executable spec: the reported quantiles must equal the Python
    type-1 discrete quantile (smallest value whose cumulative count
    reaches ceil(p*n)) computed over q_quality_score's own output —
    ties, duplicate values, and the n=1 edge included."""
    import math

    rows = [
        # srcQ: 10 docs with strictly increasing type-token ratios
        {"doc_id": i, "source": "srcQ",
         "text": " ".join([f"w{j}" for j in range(i + 1)] + ["pad"] * (10 - i))}
        for i in range(10)
    ] + [
        # srcOne: single doc (every quantile = its only value)
        {"doc_id": 100, "source": "srcOne", "text": "solo doc here"},
        # srcTie: 4 identical docs (all quantiles equal)
        *[{"doc_id": 200 + i, "source": "srcTie", "text": "same same text"}
          for i in range(4)],
    ]
    d = _docs_dir(tmp_path_factory, "qquant", rows)
    got = {r["source"]: r for r in corpus.q_quality_quantiles(spark, d).collect()}
    qual = corpus.q_quality_score(spark, d).collect()
    src_of = {r["doc_id"]: next(x["source"] for x in rows if x["doc_id"] == r["doc_id"])
              for r in qual}
    per_src = {}
    for r in qual:
        per_src.setdefault(src_of[r["doc_id"]], []).append(r["quality"])
    for src, vals in per_src.items():
        vals.sort()
        n = len(vals)
        assert got[src]["n_docs"] == n
        for p, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")]:
            expect = vals[math.ceil(p * n) - 1]
            assert got[src][col] == expect, (src, col, got[src][col], expect)


def test_hll_merge_equals_union_sketch(spark, hll_dir):
    """Executable spec for the merge: a pure-Python HLL over the UNION
    of both sources' token streams (md5 → bucket / rho → registers →
    exact-integer harmonic sum) must equal q_hll_merged_distinct —
    which got there by folding PER-SOURCE register tables — register
    count and estimate both. Also: the estimate is within 2× the HLL
    standard error (1.04/√64 ≈ 13%) of the true 5030 (the sources'
    vocabularies are disjoint)."""
    import hashlib
    import math

    merged = corpus.q_hll_merged_distinct(spark, hll_dir).collect()
    assert len(merged) == 1
    # python union-stream recompute (the spec)
    toks = set()
    for r in corpus.documents(spark, hll_dir).select("text").collect():
        for t in r["text"].split(" "):
            if t not in corpus.STOPWORDS_LIST:
                toks.add(t)
    regs = {}
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        bucket = int(h[:8], 16) % 64
        w = int(h[8:23], 16)
        rho = 61 if w == 0 else 61 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    zsum = sum(2 ** (61 - r) for r in regs.values()) + (64 - len(regs)) * 2**61
    raw = corpus._HLL_NUM / float(zsum)
    if raw <= 2.5 * 64 and len(regs) < 64:
        est = 64.0 * math.log(64.0 / (64 - len(regs)))
    else:
        est = raw
    assert merged[0]["n_registers"] == len(regs)
    assert merged[0]["est_distinct"] == round(est, 4)
    true_n = 5030
    assert abs(merged[0]["est_distinct"] - true_n) / true_n < 0.26


def test_hybrid_rrf_matches_python_fusion_spec(spark, sf_dir):
    """Executable spec: recompute the fusion in Python from the two
    component rankings (BM25 top-50 and cosine top-50, both re-derived
    through the operators' own deterministic orderings) and require the
    operator's top-10 to match exactly — doc set, order, and scores."""
    lex = (
        corpus._bm25_scored(spark, sf_dir, corpus.QUERY_OR.split(" "))
        .select("doc_id", "score")
        .collect()
    )
    lex.sort(key=lambda r: (-r["score"], r["doc_id"]))
    r_lex = {r["doc_id"]: i + 1 for i, r in enumerate(lex[: corpus._RRF_POOL])}
    import pyspark.sql.functions as _F

    emb = corpus.embeddings(spark, sf_dir)
    qv = emb.filter(_F.col("vec_id") == 0).select(
        _F.col("embedding").alias("q_emb")
    )
    dense = (
        emb.filter(_F.col("vec_id") != 0)
        .crossJoin(_F.broadcast(qv))
        .select(
            "vec_id",
            _F.round(
                corpus._dot(_F.col("embedding"), _F.col("q_emb"))
                / (
                    _F.sqrt(corpus._dot(_F.col("embedding"), _F.col("embedding")))
                    * _F.sqrt(corpus._dot(_F.col("q_emb"), _F.col("q_emb")))
                ),
                4,
            ).alias("cosine"),
        )
        .collect()
    )
    dense.sort(key=lambda r: (-r["cosine"], r["vec_id"]))
    r_dense = {
        r["vec_id"]: i + 1 for i, r in enumerate(dense[: corpus._RRF_POOL])
    }
    want = {}
    for d in set(r_lex) | set(r_dense):
        s = 0.0
        if d in r_lex:
            s += 1.0 / (corpus._RRF_K + r_lex[d])
        if d in r_dense:
            s = s + 1.0 / (corpus._RRF_K + r_dense[d])
        want[d] = round(s, 6)
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["rrf"])
        for r in corpus.q_hybrid_rrf_topk(spark, sf_dir).collect()
    ]
    assert got == expect


def test_facet_counts_hand_values(spark, tmp_path_factory):
    """Planted facets for QUERY_OR ("fast query scan"): srcA has 2
    matching docs, srcB has 1, srcC none — counts exact, a non-matching
    source absent, and top_score equals the max per-doc BM25 score of
    that source's matches (cross-checked against q_bm25_topk_or)."""
    rows = [
        {"doc_id": 0, "source": "srcA", "text": "fast query scan here today"},
        {"doc_id": 1, "source": "srcA", "text": "a query about filler text"},
        {"doc_id": 2, "source": "srcB", "text": "scan results came back fine"},
        {"doc_id": 3, "source": "srcC", "text": "nothing relevant in here"},
    ]
    d = _docs_dir(tmp_path_factory, "facets", rows)
    facets = {r["source"]: r for r in corpus.q_facet_counts(spark, d).collect()}
    assert facets["srcA"]["n_matches"] == 2
    assert facets["srcB"]["n_matches"] == 1
    assert "srcC" not in facets
    scores = {
        r["doc_id"]: r["score"] for r in corpus.q_bm25_topk_or(spark, d).collect()
    }
    assert facets["srcA"]["top_score"] == max(scores[0], scores[1])
    assert facets["srcB"]["top_score"] == scores[2]


def test_more_like_this_finds_keyword_overlap(spark, tmp_path_factory):
    """The seed (doc 0) is about kryptonite smelting; doc 1 shares its
    distinctive keywords, docs 2-3 do not. MLT must rank doc 1 first,
    exclude the seed itself, and give zero/no rows to docs sharing no
    seed keyword."""
    rows = [
        {"doc_id": 0, "text": "kryptonite smelting furnace kryptonite alloy"},
        {"doc_id": 1, "text": "kryptonite alloy smelting methods overview"},
        {"doc_id": 2, "text": "gardening tips for growing tomatoes nicely"},
        {"doc_id": 3, "text": "a furnace repair manual chapter listing"},
    ]
    d = _docs_dir(tmp_path_factory, "mlt", rows)
    out = corpus.q_more_like_this(spark, d).collect()
    ids = [r["doc_id"] for r in out]
    assert 0 not in ids  # seed excluded
    assert ids[0] == 1  # strongest keyword overlap wins
    assert 2 not in ids  # no shared keyword -> no row
    assert 3 in ids  # shares "furnace"


def test_bm25_not_and_prefix_semantics(spark, tmp_path_factory):
    """Boolean-NOT and prefix-expansion semantics on a planted corpus:
    NOT drops every doc containing the negated term even when it scores
    highest on the positives; the prefix query matches docs through
    DIFFERENT expansions of que* (query/question/queue) with per-term
    df, and non-matching docs are absent."""
    rows = [
        # strongest positive match BUT contains the negated "scan"
        {"doc_id": 0, "text": "fast query scan fast query again"},
        {"doc_id": 1, "text": "fast query without the bad word"},
        {"doc_id": 2, "text": "question about a queue ordering"},
        {"doc_id": 3, "text": "nothing matching anything here"},
    ]
    d = _docs_dir(tmp_path_factory, "notprefix", rows)
    not_ids = [r["doc_id"] for r in corpus.q_bm25_not_topk(spark, d).collect()]
    assert 0 not in not_ids  # negation beats relevance
    assert 1 in not_ids
    pref = {r["doc_id"] for r in corpus.q_bm25_prefix_topk(spark, d).collect()}
    assert pref == {0, 1, 2}  # query/question/queue all expand from que*


# --- round-5 session 2: KWIC / suggest / dup-fraction / buckets / zipf /
# affinity / confusion ------------------------------------------------------


def test_kwic_context_hand_values(spark, tmp_path_factory):
    """First-occurrence position and edge-clamped windows, by hand."""
    d = _docs_dir(
        tmp_path_factory,
        "kwic",
        [
            {"doc_id": 0, "text": "alpha beta vector gamma delta epsilon zeta"},
            {"doc_id": 1, "text": "vector beta gamma"},          # hit at 1
            {"doc_id": 2, "text": "alpha beta gamma vector"},    # hit at end
            {"doc_id": 3, "text": "no match here"},              # absent
            {"doc_id": 4, "text": "x vector y vector z"},        # first only
        ],
    )
    rows = {r["doc_id"]: r for r in corpus.q_kwic_context(spark, d).collect()}
    assert set(rows) == {0, 1, 2, 4}
    assert rows[0]["pos"] == 3
    assert rows[0]["context"] == "alpha beta [vector] gamma delta epsilon"
    assert rows[1]["pos"] == 1
    assert rows[1]["context"] == "[vector] beta gamma"
    assert rows[2]["pos"] == 4
    assert rows[2]["context"] == "alpha beta gamma [vector]"
    assert rows[4]["pos"] == 2  # first occurrence, not the second
    assert rows[4]["context"] == "x [vector] y vector z"


def test_suggest_terms_ranking(spark, tmp_path_factory):
    """df-desc, cf-desc, term-asc ranking over prefix completions."""
    d = _docs_dir(
        tmp_path_factory,
        "suggest",
        [
            {"doc_id": 0, "text": "spark spark scan walrus"},
            {"doc_id": 1, "text": "spark sort walrus walrus"},
            {"doc_id": 2, "text": "walrus only here"},
        ],
    )
    got = [
        (r["term"], r["df"], r["cf"])
        for r in corpus.q_suggest_terms(spark, d).collect()
    ]
    # spark: df 2 cf 3; scan/sort: df 1 cf 1 -> term asc breaks the tie
    assert got == [("spark", 2, 3), ("scan", 1, 1), ("sort", 1, 1)]


def test_dup_fraction_planted_shared_run(spark, tmp_path_factory):
    """Identical 45-token docs -> frac 1.0; a doc sharing only its first
    30 tokens -> exactly the i=1 window dups (frac 0.5); unique doc ->
    0.0; sub-window doc emits nothing."""
    shared = " ".join(f"s{i}" for i in range(45))
    half = " ".join(
        [f"s{i}" for i in range(30)] + [f"u{i}" for i in range(15)]
    )
    d = _docs_dir(
        tmp_path_factory,
        "dupfrac",
        [
            {"doc_id": 0, "text": shared},
            {"doc_id": 1, "text": shared},
            {"doc_id": 2, "text": half},
            {"doc_id": 3, "text": " ".join(f"q{i}" for i in range(45))},
            {"doc_id": 4, "text": "too short"},
        ],
    )
    rows = {
        r["doc_id"]: r for r in corpus.q_dup_fraction(spark, d).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    for did in (0, 1):
        assert rows[did]["n_windows"] == 2
        assert rows[did]["n_dup"] == 2
        assert rows[did]["dup_frac"] == 1.0
    assert rows[2]["n_windows"] == 2
    assert rows[2]["n_dup"] == 1  # only the i=1 window recurs (in 0 and 1)
    assert rows[2]["dup_frac"] == 0.5
    assert rows[3]["n_dup"] == 0 and rows[3]["dup_frac"] == 0.0


def test_ppl_buckets_match_python_spec(spark, sf_dir):
    """Executable spec: recompute the floor-bin histogram cuts and the
    bucket of every doc in pure Python from q_bigram_logprob's output,
    and require exact agreement (same corpus the gate checks)."""
    import math

    blp = {
        r["doc_id"]: r["mean_logprob"]
        for r in corpus.q_bigram_logprob(spark, sf_dir).collect()
    }
    bins = {k: math.floor(v * 100) for k, v in blp.items()}
    n = len(bins)
    hist = {}
    for b in bins.values():
        hist[b] = hist.get(b, 0) + 1
    cum, cut1, cut2 = 0, None, None
    for b in sorted(hist):
        cum += hist[b]
        if cut1 is None and cum >= math.ceil(n / 3.0):
            cut1 = b
        if cut2 is None and cum >= math.ceil(2.0 * n / 3.0):
            cut2 = b
    expected = {
        k: ("tail" if b <= cut1 else "middle" if b <= cut2 else "head")
        for k, b in bins.items()
    }
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in corpus.q_ppl_buckets(spark, sf_dir).collect()
    }
    assert got == expected
    assert set(expected.values()) == {"head", "middle", "tail"}


def test_zipf_slope_on_planted_power_law(spark, tmp_path_factory):
    """A corpus whose term frequencies are exactly floor(1000/i) must fit
    slope ~ -1; the value must match the pure-Python OLS recompute of the
    same formula to the rounded precision."""
    import math

    freqs = [(f"term{i:02d}", 1000 // i) for i in range(1, 21)]
    text = " ".join(t for t, c in freqs for _ in range(c))
    d = _docs_dir(tmp_path_factory, "zipf", [{"doc_id": 0, "text": text}])
    row = corpus.q_zipf_slope(spark, d).collect()[0]
    assert row["n_terms"] == 20
    # Python recompute: same rank order (cf desc, term asc), same sums
    ordered = sorted(freqs, key=lambda tc: (-tc[1], tc[0]))
    xs = [math.log(i + 1) for i in range(len(ordered))]
    ys = [math.log(c) for _, c in ordered]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["slope"] == pytest.approx(round(slope, 6), abs=2e-6)
    assert -1.05 < row["slope"] < -0.95
    assert row["intercept"] == pytest.approx(
        round((sy - slope * sx) / n, 6), abs=2e-6
    )


def test_term_source_affinity_planted_template_term(spark, tmp_path_factory):
    """A term concentrated in one source wins with the right share; an
    even split tie-breaks to the lexicographically smaller source; terms
    under the cf floor are absent."""
    rows = []
    did = 0
    for src, n_zebra, n_tiger in (("s1", 60, 25), ("s2", 40, 25)):
        for _ in range(5):
            rows.append(
                {
                    "doc_id": did,
                    "text": " ".join(
                        ["zebra"] * (n_zebra // 5)
                        + ["tiger"] * (n_tiger // 5)
                        + ["rare"]
                    ),
                    "source": src,
                }
            )
            did += 1
    d = _docs_dir(tmp_path_factory, "affinity", rows)
    got = {
        r["term"]: r
        for r in corpus.q_term_source_affinity(spark, d).collect()
    }
    assert set(got) == {"zebra", "tiger"}  # "rare" (cf=10) under the floor
    assert got["zebra"]["top_source"] == "s1"
    assert got["zebra"]["cf"] == 100 and got["zebra"]["c_top"] == 60
    assert got["zebra"]["share"] == 0.6
    assert got["tiger"]["top_source"] == "s1"  # 25/25 tie -> source asc
    assert got["tiger"]["share"] == 0.5
    # ranking: zebra (0.6) before tiger (0.5)
    ordered = [
        r["term"] for r in corpus.q_term_source_affinity(spark, d).collect()
    ]
    assert ordered == ["zebra", "tiger"]


def test_lang_confusion_hand_counts(spark, tmp_path_factory):
    """Declared-vs-predicted cells: marker-rich text predicts 'en'
    whatever the declared lang; marker-free text predicts 'other'."""
    en_text = "the cat and the dog of the house in the yard"
    xx_text = "zork blap quux fizzle womp grue plugh xyzzy"
    d = _docs_dir(
        tmp_path_factory,
        "confusion",
        [
            {"doc_id": 0, "text": en_text, "lang": "en"},
            {"doc_id": 1, "text": en_text, "lang": "en"},
            {"doc_id": 2, "text": xx_text, "lang": "en"},   # en declared, missed
            {"doc_id": 3, "text": en_text, "lang": "de"},   # de declared, caught
            {"doc_id": 4, "text": xx_text, "lang": "de"},
        ],
    )
    got = {
        (r["lang"], r["lang_pred"]): r["n_docs"]
        for r in corpus.q_lang_confusion(spark, d).collect()
    }
    assert got == {
        ("en", "en"): 2,
        ("en", "other"): 1,
        ("de", "en"): 1,
        ("de", "other"): 1,
    }


# --- as-of + range join semantics on planted event streams -----------------


def _events_dir(tmp_path_factory, name, rows):
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(
        [
            {
                "event_id": i,
                "ts": base + pd.Timedelta(seconds=r["s"]),
                "user_id": r["u"],
                "event_type": r["t"],
                "value": float(r.get("v", 0.0)),
                "props": "{}",
            }
            for i, r in enumerate(rows)
        ]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark can't read NANOS
    d = tmp_path_factory.mktemp(name)
    pdf.to_parquet(f"{d}/events.parquet", index=False)
    return str(d)


def test_asof_join_hand_semantics(spark, tmp_path_factory):
    """Prior-or-EQUAL click lookup, per user, with LEFT semantics."""
    from search_engine_spark.operators import relational

    d = _events_dir(
        tmp_path_factory,
        "asof",
        [
            {"u": 1, "t": "click", "s": 10, "v": 1.0},     # id 0
            {"u": 1, "t": "click", "s": 50, "v": 2.0},     # id 1
            {"u": 1, "t": "purchase", "s": 5},             # id 2: no prior
            {"u": 1, "t": "purchase", "s": 10},            # id 3: equal-ts
            {"u": 1, "t": "purchase", "s": 60},            # id 4: latest=1
            {"u": 2, "t": "purchase", "s": 30},            # id 5: no clicks
            {"u": 2, "t": "click", "s": 40, "v": 9.0},     # id 6: after only
        ],
    )
    rows = {
        r["event_id"]: r for r in relational.q_asof_join(spark, d).collect()
    }
    assert set(rows) == {2, 3, 4, 5}
    assert rows[2]["click_id"] is None and rows[2]["click_value"] is None
    assert rows[3]["click_id"] == 0 and rows[3]["click_value"] == 1.0
    assert rows[4]["click_id"] == 1 and rows[4]["click_value"] == 2.0
    assert rows[5]["click_id"] is None  # user 2's click is in the future


def test_range_join_hand_semantics(spark, tmp_path_factory):
    """±900 s band, inclusive bounds, same-user only, bucket-boundary
    pairs included exactly once."""
    from search_engine_spark.operators import relational

    d = _events_dir(
        tmp_path_factory,
        "range",
        [
            {"u": 1, "t": "signup", "s": 1000},            # id 0
            {"u": 1, "t": "error", "s": 1900},             # id 1: +900 in
            {"u": 1, "t": "error", "s": 100},              # id 2: -900 in
            {"u": 1, "t": "error", "s": 1901},             # id 3: +901 out
            {"u": 2, "t": "error", "s": 1000},             # id 4: other user
            # bucket boundary: signup at 899 (bucket 0), error at 901
            # (bucket 1) — adjacent buckets, gap 2 s, must appear ONCE
            {"u": 3, "t": "signup", "s": 899},             # id 5
            {"u": 3, "t": "error", "s": 901},              # id 6
        ],
    )
    got = sorted(
        (r["signup_id"], r["error_id"])
        for r in relational.q_range_join(spark, d).collect()
    )
    assert got == [(0, 1), (0, 2), (5, 6)]


def test_chunk_documents_boundaries(spark, tmp_path_factory):
    """Stride/back-alignment contract by hand: W=64, S=48."""
    def toks(n, p):
        return " ".join(f"{p}{i}" for i in range(n))

    d = _docs_dir(
        tmp_path_factory,
        "chunks",
        [
            {"doc_id": 0, "text": toks(30, "a")},    # short: one whole chunk
            {"doc_id": 1, "text": toks(100, "b")},   # G=37: starts {1, 37}
            {"doc_id": 2, "text": toks(120, "c")},   # starts {1, 49, 57}
            {"doc_id": 3, "text": toks(64, "d")},    # exact W: one chunk
        ],
    )
    rows = {}
    for r in corpus.q_chunk_documents(spark, d).collect():
        rows.setdefault(r["doc_id"], []).append((r["start"], r["n_tokens"]))
    for v in rows.values():
        v.sort()
    assert rows[0] == [(1, 30)]
    assert rows[1] == [(1, 64), (37, 64)]   # back-aligned tail chunk
    assert rows[2] == [(1, 64), (49, 64), (57, 64)]
    assert rows[3] == [(1, 64)]
    # overlap consistency: doc 2's chunks cover tokens 1..120 exactly
    covered = set()
    for s_, n in rows[2]:
        covered.update(range(s_, s_ + n))
    assert covered == set(range(1, 121))


def test_url_density_recall(spark, tmp_path_factory):
    """Planted URLs (the gate corpus is URL-free — this is the recall
    side): counts and the per-100-token density by hand."""
    d = _docs_dir(
        tmp_path_factory,
        "urls",
        [
            {"doc_id": 0, "text": "see https://a.example/x and www.b.org now"},
            {"doc_id": 1, "text": "plain text with no links at all"},
            {"doc_id": 2, "text": "http://one http://two http://three pad"},
        ],
    )
    rows = {r["doc_id"]: r for r in corpus.q_url_density(spark, d).collect()}
    assert rows[0]["n_urls"] == 2
    assert rows[0]["urls_per_100"] == pytest.approx(2 * 100.0 / 5, abs=1e-6)
    assert rows[1]["n_urls"] == 0 and rows[1]["urls_per_100"] == 0.0
    assert rows[2]["n_urls"] == 3


def test_ngram_containment_asymmetric_pair(spark, tmp_path_factory):
    """A short doc fully embedded in a longer one: containment must be
    1.0 while Jaccard sits strictly below — the case a Jaccard-only
    threshold misses. The planted pair shares enough minhash signature
    to band together (deterministic given the fixed seeds)."""
    short = " ".join(f"w{i}" for i in range(40))
    longer = short + " extra1 extra2 extra3"
    d = _docs_dir(
        tmp_path_factory,
        "containment",
        [
            {"doc_id": 0, "text": short},
            {"doc_id": 1, "text": longer},
            {"doc_id": 2, "text": " ".join(f"z{i}" for i in range(40))},
        ],
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in corpus.q_ngram_containment(spark, d).collect()
    }
    assert (0, 1) in rows, rows  # the embedded pair IS a candidate
    r = rows[(0, 1)]
    assert r["containment"] == 1.0
    assert r["jaccard"] < 0.95  # 38/41 shingles
    assert r["jaccard"] == pytest.approx(round(38 / 41, 6), abs=1e-6)


def test_cluster_size_histogram_planted(spark, tmp_path_factory):
    """A 3-member exact-dup cluster + a 2-member pair + unique docs ->
    one histogram row per size, only involved docs counted."""
    tri = "alpha beta gamma delta epsilon zeta eta theta"
    pair = "one two three four five six seven eight"
    d = _docs_dir(
        tmp_path_factory,
        "csize",
        [
            {"doc_id": 0, "text": tri},
            {"doc_id": 1, "text": tri},
            {"doc_id": 2, "text": tri},
            {"doc_id": 3, "text": pair},
            {"doc_id": 4, "text": pair},
            {"doc_id": 5, "text": "unique gold words here only once ever"},
            {"doc_id": 6, "text": "another entirely different document body"},
        ],
    )
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in corpus.q_cluster_size_histogram(spark, d).collect()
    }
    assert got == {3: (1, 3), 2: (1, 2)}


def test_event_funnel_order_sensitivity(spark, tmp_path_factory):
    """A purchase BEFORE the signup must not convert; strict-after
    semantics at each step."""
    from search_engine_spark.operators import relational

    d = _events_dir(
        tmp_path_factory,
        "funnel",
        [
            # user 1: full ordered funnel
            {"u": 1, "t": "signup", "s": 10},
            {"u": 1, "t": "click", "s": 20},
            {"u": 1, "t": "purchase", "s": 30},
            # user 2: purchase BEFORE signup -> stops at click
            {"u": 2, "t": "purchase", "s": 5},
            {"u": 2, "t": "signup", "s": 10},
            {"u": 2, "t": "click", "s": 20},
            # user 3: click before signup -> stops at signup
            {"u": 3, "t": "click", "s": 5},
            {"u": 3, "t": "signup", "s": 10},
            # user 4: never signs up -> absent everywhere
            {"u": 4, "t": "click", "s": 10},
            {"u": 4, "t": "purchase", "s": 20},
        ],
    )
    got = {
        r["funnel_step"]: r["n_users"]
        for r in relational.q_event_funnel(spark, d).collect()
    }
    assert got == {"signup": 3, "click": 2, "purchase": 1}
