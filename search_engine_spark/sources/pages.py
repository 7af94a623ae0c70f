"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    url string, warc_ts timestamp, html binary, text string, lang string

Generation is **counter-based** (splitmix64 of (row_index, stream)) so row i
is bit-identical no matter how rows are partitioned across executors — the
Spark generator (`generate_pages_df`, mapInPandas over spark.range) and the
single-node oracle (`generate_pages_pandas`) produce identical corpora by
construction, with no RNG state shared between tasks. This mirrors how a
100 TB synthetic load would be generated on a real cluster: embarrassingly
parallel, no driver coordination.

Text is drawn Zipf(s≈1.07) from a vocabulary whose head contains the
reference query terms (best/good/well/western —
/root/reference/backend/tests/test_search.py:639), stopwords, contractions,
URLs, punctuation and mixed case, exercising every tokenizer stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.07
LOGN_MU, LOGN_SIGMA = 4.0, 0.6
LEN_MIN, LEN_MAX = 5, 400
LANGS = ["de", "fr"]

# Curated head tokens: query terms hot (skew path), plus every tokenizer
# stage trigger. Order matters — rank 0 is the most frequent token.
_HEAD = [
    "the", "best", "good", "a", "well", "western", "and", "is", "hotel",
    "The", "don't", "it's", "stay", "room", "of", "to", "in", "great!",
    "good,", "Best", "GOOD", "service.", "https://x.example/y", "was",
    "clean", "staff", "for", "with", "nice", "breakfast", "location",
    "www.ads.example", "I'm", "we're", "that", "very", "not", "but",
    "pool", "view",
]


def _vocab() -> list[str]:
    return _HEAD + [f"w{j}" for j in range(VOCAB_SIZE - len(_HEAD))]


VOCAB = _vocab()


def _zipf_cdf() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = ranks ** (-ZIPF_S)
    p /= p.sum()
    return np.cumsum(p)


_ZIPF_CDF = _zipf_cdf()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain mixer) — counter-based RNG."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(ids: np.ndarray, stream: int) -> np.ndarray:
    """U(0,1) float64 per id for a given stream, deterministic."""
    h = _splitmix64(
        ids.astype(np.uint64) * np.uint64(0x100000001B3)
        + np.uint64(SEED * 1_000_003 + stream)
    )
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _doc_lengths(ids: np.ndarray) -> np.ndarray:
    # lognormal via Box-Muller on two counter-based uniforms
    u1 = np.clip(_uniform(ids, 1), 1e-12, 1.0)
    u2 = _uniform(ids, 2)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    ln = np.exp(LOGN_MU + LOGN_SIGMA * z)
    return np.clip(np.round(ln), LEN_MIN, LEN_MAX).astype(np.int64)


def generate_pages_pandas(ids: np.ndarray) -> pd.DataFrame:
    """Rows for the given row indices. Vectorized; no per-row Python in the
    token-draw hot path (token join is a numpy object-array reduction)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    lengths = _doc_lengths(ids)
    total = int(lengths.sum())
    # flat token stream: token k of doc i keyed by (i, k)
    doc_idx = np.repeat(np.arange(n), lengths)
    flat_ids = np.repeat(ids, lengths)
    pos_in_doc = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(lengths)[:-1])), lengths
    )
    u = _uniform(flat_ids * np.int64(1_000_003) + pos_in_doc, 3)
    vocab_idx = np.searchsorted(_ZIPF_CDF, u, side="left")
    vocab_arr = np.array(VOCAB, dtype=object)
    toks = vocab_arr[vocab_idx]
    # join per doc
    texts = (
        pd.Series(toks)
        .groupby(doc_idx)
        .agg(" ".join)
        .reindex(range(n), fill_value="")
        .to_numpy()
    )
    urls = np.array([f"https://site{i % 97}.example/page/{i}" for i in ids], dtype=object)
    lang_u = _uniform(ids, 4)
    langs = np.where(
        lang_u < 0.95, "en", np.where(lang_u < 0.975, LANGS[0], LANGS[1])
    )
    ts = pd.Timestamp("2024-01-01T00:00:00", tz="UTC") + pd.to_timedelta(ids * 37, unit="s")
    html = np.array(
        [
            b"<html><head><title>t%d</title></head><body><p>" % int(i)
            + t.encode("utf-8")
            + b"</p></body></html>"
            for i, t in zip(ids, texts)
        ],
        dtype=object,
    )
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": html,
            "text": texts,
            "lang": langs,
        }
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_pages_df(spark, n_rows: int, partitions: int | None = None):
    """Distributed generation: spark.range -> mapInPandas, deterministic per
    row index regardless of partitioning."""
    rng = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield generate_pages_pandas(pdf["id"].to_numpy())

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_pages(spark, n_rows: int, path: str, partitions: int | None = None) -> None:
    generate_pages_df(spark, n_rows, partitions).write.mode("overwrite").parquet(path)
