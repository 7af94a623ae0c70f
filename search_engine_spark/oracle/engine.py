"""Single-node reference oracle: pure Python/NumPy extract -> tokenize ->
index -> BM25 pipeline (SURVEY.md §5 item 1, §7).

This is the semantic ground truth the Spark engine must match
rank-identically with bit-equal float64 scores on the reference query set
(["western", "best", "well", "good", "best western"] —
/root/reference/backend/tests/test_search.py:639 + the Postman collection's
"Search Hotel" query).

Query-processing semantics follow the reference engine
(/root/reference/backend/app.py:363-620): tokenize query, bind terms to
term IDs via the lexicon (missing terms silently dropped, app.py:392-401),
union per-term postings with per-doc accumulation (app.py:594-617), score,
sort desc + top-k (app.py:740,504). The scorer is standard BM25
(k1=1.2, b=0.75) per the north rule, upgrading the reference's heuristic
TF formula (app.py:679-725); the heuristic is kept separately as
`reference_heuristic_score` for semantics-parity tests of the
union/filter plumbing.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from search_engine_spark.functions.hashing import doc_id_from_url
from search_engine_spark.functions.text import (
    extract_text,
    extract_title,
    normalize_text,
)

K1 = 1.2
B = 0.75


def _round_half_up6(x: float) -> float:
    """6-dp HALF_UP on the decimal string — Spark's F.round semantics.
    Python's built-in round() is banker's (half-to-even); using it for
    the ranking key would diverge from the engine exactly at the 6-dp
    midpoints the rounded ordering exists to stabilize."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    avgdl1: float = 0.0  # TITLE-field average length (true-BM25F norm)
    avgdlb: float = 0.0  # body-field average length
    lexicon: dict[str, int] = field(default_factory=dict)  # term -> dense id
    term_df: dict[int, int] = field(default_factory=dict)
    term_cf: dict[int, int] = field(default_factory=dict)
    # term_id -> (doc_ids int64 sorted, tfs, dls, tf1s, dl1s int64)
    # tf1/dl1 = TITLE-field tf and length (fields channel — the reference
    # forward index records per-field matches,
    # create_forward_index.py:47-49)
    postings: dict[
        int,
        tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    ] = field(default_factory=dict)
    doc_url: dict[int, str] = field(default_factory=dict)
    doc_dl: dict[int, int] = field(default_factory=dict)
    extracted: dict[str, str] = field(default_factory=dict)  # url -> bytes-identical text
    normalized: dict[str, str] = field(default_factory=dict)

    def idf(self, term_id: int) -> float:
        df = self.term_df[term_id]
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)


def build_index(pages: pd.DataFrame) -> OracleIndex:
    """pages: DataFrame(url, warc_ts, html, text, lang). Indexes lang=='en'
    rows only (FIXTURES.md §1)."""
    idx = OracleIndex()
    en = pages[pages["lang"] == "en"]
    per_term_docs: dict[str, list[tuple[int, int, int, int, int]]] = {}
    dls: list[int] = []
    dl1s: list[int] = []
    for url, html in zip(en["url"], en["html"]):
        extracted = extract_text(html)
        norm = normalize_text(extracted)
        title_norm = normalize_text(extract_title(html))
        title_dl = len(title_norm.split(" ")) if title_norm else 0
        doc_id = doc_id_from_url(url)
        tokens = norm.split(" ") if norm else []
        dl = len(tokens)
        dl1 = min(dl, title_dl)  # title tokens are norm's prefix
        idx.extracted[url] = extracted
        idx.normalized[url] = norm
        idx.doc_url[doc_id] = url
        idx.doc_dl[doc_id] = dl
        dls.append(dl)
        dl1s.append(dl1)
        counts: dict[str, int] = {}
        t1_counts: dict[str, int] = {}
        for pos, t in enumerate(tokens):
            counts[t] = counts.get(t, 0) + 1
            if pos < title_dl:  # title tokens are norm's prefix
                t1_counts[t] = t1_counts.get(t, 0) + 1
        for t, tf in counts.items():
            per_term_docs.setdefault(t, []).append(
                (doc_id, tf, dl, t1_counts.get(t, 0), dl1)
            )
    idx.n_docs = len(en)
    idx.avgdl = float(sum(dls)) / idx.n_docs if idx.n_docs else 0.0
    # per-field averages from EXACT int totals (same derivation as the
    # Spark engine's index_build.field_avgdls)
    idx.avgdl1 = float(sum(dl1s)) / idx.n_docs if idx.n_docs else 0.0
    idx.avgdlb = (
        float(sum(dls) - sum(dl1s)) / idx.n_docs if idx.n_docs else 0.0
    )
    # dense term ids in sorted-term order (reference semantics,
    # create_parallel_lexicon.py:84)
    for tid, term in enumerate(sorted(per_term_docs)):
        idx.lexicon[term] = tid
        rows = sorted(per_term_docs[term])  # by doc_id
        d = np.array([r[0] for r in rows], dtype=np.int64)
        t = np.array([r[1] for r in rows], dtype=np.int64)
        l = np.array([r[2] for r in rows], dtype=np.int64)
        t1 = np.array([r[3] for r in rows], dtype=np.int64)
        d1 = np.array([r[4] for r in rows], dtype=np.int64)
        idx.postings[tid] = (d, t, l, t1, d1)
        idx.term_df[tid] = len(rows)
        idx.term_cf[tid] = int(t.sum())
    return idx


def bm25_contrib(
    tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float
) -> np.ndarray:
    """EXACT float64 expression shape mirrored by the Spark scorer
    (operators/query.py) — do not reorder operations."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl))


def search(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "OR",
    field_weights: tuple[float, float] | None = None,
    doc_filter: set[int] | None = None,
) -> list[tuple[int, float]]:
    """BM25 top-k: [(doc_id, score)] sorted (score desc, doc_id asc).

    mode="OR" is the reference union semantics (app.py:594-617);
    mode="AND" is the north-rule intersection (doc must contain all terms).
    field_weights=(w_title, w_body): TRUE BM25F over the (tf1, dl1)
    field channel — the IDENTICAL float64 expression the Spark engine
    uses (functions.compression.bm25f_score is imported, not mirrored).
    doc_filter: metadata-filtered search — only these doc_ids may appear.
    """
    from search_engine_spark.functions.compression import bm25f_score

    qtokens = normalize_text(query).split(" ")
    term_ids = sorted(
        {idx.lexicon[t] for t in qtokens if t and t in idx.lexicon}
    )
    if not term_ids:
        return []
    acc: dict[int, float] = {}
    seen_count: dict[int, int] = {}
    # accumulate in ascending term_id order -> deterministic float sum order
    for tid in term_ids:
        d, t, l, t1, d1 = idx.postings[tid]
        if field_weights is not None:
            w_t, w_b = field_weights
            contrib = bm25f_score(
                t1, t - t1, d1, l - d1, idx.idf(tid), w_t, w_b,
                idx.avgdl1 or 1.0, idx.avgdlb or 1.0, K1, B,
            )
        else:
            contrib = bm25_contrib(t, l, idx.idf(tid), idx.avgdl)
        for doc, c in zip(d.tolist(), contrib.tolist()):
            if doc_filter is not None and doc not in doc_filter:
                continue
            acc[doc] = acc.get(doc, 0.0) + c
            seen_count[doc] = seen_count.get(doc, 0) + 1
    if mode == "AND":
        n = len(term_ids)
        acc = {doc: s for doc, s in acc.items() if seen_count[doc] == n}
    # rank by the 6-dp ROUNDED score with doc_id tiebreak — the key every
    # engine (Spark top-k, DuckDB oracle) orders by; values stay raw
    ranked = sorted(
        acc.items(), key=lambda kv: (-_round_half_up6(kv[1]), kv[0])
    )
    return ranked[:k]


def search_phrase(
    idx: OracleIndex, phrase: str, k: int = 10
) -> list[tuple[int, float]]:
    """Exact-phrase BM25 top-k ground truth: the phrase is a virtual term
    (tf = adjacent-occurrence count, df = matching docs); identical
    float64 expression shape as bm25_contrib. Mirrored by the engine's
    query.search_phrase."""
    qtokens = [t for t in normalize_text(phrase).split(" ") if t]
    if not qtokens:
        return []
    n = len(qtokens)
    hits: list[tuple[int, int, int]] = []  # (doc_id, tf, dl)
    for doc_id, url in idx.doc_url.items():
        norm = idx.normalized[url]
        toks = norm.split(" ") if norm else []
        tf = sum(
            1
            for i in range(len(toks) - n + 1)
            if toks[i : i + n] == qtokens
        )
        if tf:
            hits.append((doc_id, tf, idx.doc_dl[doc_id]))
    if not hits:
        return []
    df = len(hits)
    idf = math.log((idx.n_docs - df + 0.5) / (df + 0.5) + 1.0)
    scored = []
    for doc_id, tf, dl in hits:
        contrib = bm25_contrib(
            np.array([tf]), np.array([dl]), idf, idx.avgdl
        )[0]
        scored.append((doc_id, float(contrib)))
    scored.sort(key=lambda kv: (-_round_half_up6(kv[1]), kv[0]))
    return scored[:k]


def reference_heuristic_score(tf: int, n_distinct_q: int) -> float:
    """The reference's custom scorer core (app.py:679-725, field weights
    collapsed to the single text field, sentiment off): kept as a plumbing
    parity check, not the production scorer."""
    score = tf * 0.3 + min(n_distinct_q, tf) * 0.2
    score /= 1.0 + 0.05 * tf
    return max(score, 0.3)
