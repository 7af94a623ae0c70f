"""Relational operator coverage (SURVEY.md §2.2-2.8) over the driver's
TPC-H-ish tables — each reference operator re-expressed as a declarative
DataFrame plan with a DuckDB oracle, exercising the engine's cleaning /
metadata-join side (the reference's cleaner.py + app.py filter stages).

Same parity discipline as operators/corpus.py: identical aliases, rounded
floats, integer tie-breaks, BIGINT casts on DuckDB SUMs.

Scale notes: every join here keys on an integer with one small side →
broadcast hash join (the reference's dict-lookup joins, SURVEY.md §2.3 J5);
filters/projections reach the parquet scan (PushedFilters/ReadSchema);
sort+limit compiles to TakeOrderedAndProject.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- P1/P2/P3: projection + range predicate (cleaner.py:65-82,
# batch_maker.py:18) -------------------------------------------------------


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate + projection + rename: the reference's review-batch
    slicing (batch_maker.py:18) + column projection (cleaner.py:65-82).
    Both the filter and the 4-column projection push into the parquet
    scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_quantity") > 30)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("qty"),
            # price(2dp) × (1-disc)(2dp) has ≤4 exact decimals: round(.,4)
            # never lands on a tie, so Spark/DuckDB agree bit-for-bit
            # (round(.,2) WOULD tie on x.xx5 and the engines differ there)
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "net_price"
            ),
        )
    )


# --- J1/J5: left equi-join w/ broadcast small side (cleaner.py:60-62,
# app.py:285-297) ----------------------------------------------------------


def q_join_left_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer (left) — the reviews⋈hotels attach join
    (cleaner.py:60-62). Customer is the small dim → explicit broadcast."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "c_name",
            "c_nationkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


def q_join_map_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rev→hotel→metadata dict-lookup chain (app.py:285-297,432-441) as
    two broadcast joins: lineitem → orders → customer, aggregated per
    nation."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


# --- A1/A2/J4: groupBy means + count-join (cleaner.py:128-155,181-183) ----


def q_groupby_multi_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column groupBy mean (the per-hotel 7-rating mean,
    cleaner.py:128-155) over lineitem by (returnflag, linestatus) — partial
    + final hash agg, map-side combine free."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.round(F.avg("l_tax"), 6).alias("avg_tax"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
    )


def q_count_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join with an agg result — review_count per hotel
    (cleaner.py:181-183): customers with their order count (0 for none)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count("*").alias("order_count"))
    return (
        c.join(counts, c.c_custkey == counts.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("order_count", F.lit(0)).cast("long").alias("order_count"),
        )
    )


# --- A3: row-wise mean (cleaner.py:171-174) -------------------------------


def q_rowwise_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise mean across columns (average_score, cleaner.py:171-174) via
    an array aggregate expression — scalar, no shuffle at all."""
    li = _t(spark, sf_dir, "lineitem")
    arr = F.array(
        F.col("l_quantity").cast("double"),
        F.col("l_discount") * 100.0,
        F.col("l_tax") * 100.0,
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.size(arr), 6
        ).alias("row_mean"),
    )


# --- A9: max aggregate (app.py:256-268) -----------------------------------


def q_max_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global max-id scan (the reference's max(rev_id) restart scan,
    app.py:256-268) — single-row aggregate, parquet stats make this
    near-free."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    mo = o.agg(F.max("o_orderkey").alias("max_orderkey"))
    ml = li.agg(F.max("l_orderkey").alias("max_l_orderkey"))
    return mo.crossJoin(ml)


# --- A10/W1: window functions (app.py:801,902-911; cleaner.py:48) ---------


def q_window_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition count + rank (the multi-review-per-hotel bonus counter,
    app.py:801,902-911): each user's first 3 events by time with their
    total event count. One shuffle on user_id serves both window specs."""
    e = _t(spark, sf_dir, "events")
    w_count = Window.partitionBy("user_id")
    w_rank = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            F.count("*").over(w_count).cast("long").alias("user_event_count"),
            F.row_number().over(w_rank).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- O1/O2: top-k (app.py:740,504) ----------------------------------------


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + top-k — TakeOrderedAndProject (per-partition heaps + driver
    merge), the distributed form of the reference's sort-then-slice
    (app.py:740,504)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey", F.round("o_totalprice", 2).alias("total_price")
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(25)
    )


# --- U1/U2: union + distinct (app.py:312-324; create_parallel_lexicon) ----


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all + distinct (batch concat + lexicon set-union,
    app.py:312-324): all custkeys appearing in either customer or orders,
    tagged with presence counts."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return (
        c.withColumn("src", F.lit("customer"))
        .unionByName(o.withColumn("src", F.lit("orders")))
        .groupBy("custkey")
        .agg(
            F.count_distinct("src").cast("long").alias("n_sources"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


# --- P4/P7: membership semi-join (app.py:818-820) -------------------------


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi membership filter (rev_id ∈ matched set, app.py:818-820):
    lineitems of high-value orders. The IN-set is a DataFrame, not a
    collected driver list — stays distributed at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey"
    )
    return (
        li.join(big, li.l_orderkey == big.o_orderkey, "left_semi")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("order_revenue"),
        )
    )


# --- P5/P6: substring + equality filters (app.py:408-423) -----------------


def q_substring_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring + equality filter (the location/class
    filters, app.py:408-423,459-497)."""
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.lower(F.col("p_name")).contains("red") & (F.col("p_size") >= 10)
    ).select("p_partkey", "p_name", "p_size")


# --- F9: JSON parse (cleaner.py:25-31) ------------------------------------


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string parsing (ratings column, cleaner.py:25-28): extract
    props.k from events, aggregate per event_type."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


# --- F10/F14/P8: rounding + null scrub (cleaner.py:10-11, app.py:43-52) ---


def q_null_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null handling + scrub (dropna/fillna/NaN→None, cleaner.py:177,
    app.py:43-52): per-customer account balance bands with nulls
    coalesced."""
    c = _t(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal").isNull(), F.lit(None).cast("string"))
        .when(F.col("c_acctbal") < 0, F.lit("neg"))
        .when(F.col("c_acctbal") < 5000, F.lit("low"))
        .otherwise(F.lit("high"))
    )
    return (
        c.select(F.coalesce(band, F.lit("unknown")).alias("band"), "c_acctbal")
        .groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
        )
    )


# --- time-window aggregation (Structured-Streaming-shaped, batch checked) --


def q_event_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate — the batch twin of the
    streaming windowed agg (streaming/jobs.py runs the same plan with
    readStream + watermark). window.start == date_trunc('hour', ts) for
    tumbling hour windows."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- sessionization (gap-based) — the batch twin of a stateful streaming
# operator (applyInPandasWithState shape); pure window functions ----------


SESSION_GAP_S = 1800


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-min silence starts a new session.
    lag → gap flag → running sum = session number → per-session stats.
    One shuffle on user_id serves every window; the groupBy reuses the
    same partitioning."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > SESSION_GAP_S),
        1,
    ).otherwise(0)
    sess = e.select(
        "user_id", "ts", "event_id",
        F.sum(new_sess).over(w).cast("long").alias("session_no"),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_s"),
    )


# --- as-of join — the temporal-lookup operator Spark lacks natively,
# re-expressed as a tagged union + one user-keyed window (no join node,
# no per-row range probe — the distributed as-of shape) ---------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (trades-and-quotes shape): for every 'purchase' event,
    the same user's most recent prior-or-equal 'click' — the
    value-at-decision-time read every event pipeline needs and Spark has
    no built-in for. LEFT semantics: purchases with no prior click keep
    NULL click columns.

    Implementation is the scalable distributed form: UNION the two
    tagged streams, ONE user-keyed window ordered (ts, tag, event_id)
    carrying last(click attrs, ignorenulls) up to the current row, then
    filter to purchases — one exchange + one in-partition sort, never a
    per-row range probe or a nested-loop join (plan-guarded: no join
    node at all). Ties: a click at the exact purchase ts sorts FIRST
    (tag 0 < 1), matching the oracle's `p.ts >= c.ts` inclusive bound.

    Oracle is DuckDB's native ASOF LEFT JOIN — the gate row proves the
    window rewrite IS the as-of semantics."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "event_id",
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("long").alias("c_id"),
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .select(
            "user_id",
            "ts",
            "tag",
            "event_id",
            F.last("c_id", ignorenulls=True).over(w).alias("click_id"),
            F.last("c_ts", ignorenulls=True).over(w).alias("click_ts"),
            F.last("c_value", ignorenulls=True).over(w).alias("click_value"),
        )
        .filter(F.col("tag") == 1)
        .select("event_id", "user_id", "ts", "click_id", "click_ts", "click_value")
    )


# --- range (band) join — non-equi interval join re-expressed as a bucketed
# equi-join + residual predicate (never a nested-loop) ----------------------

RANGE_JOIN_WINDOW_S = 900  # ±15 min correlation window


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: every (signup, error) pair for the same user within
    ±RANGE_JOIN_WINDOW_S of each other — the incident-correlation read
    (did signups co-occur with error bursts?). A naive non-equi join
    plans as BroadcastNestedLoopJoin — O(n·m) per user and the classic
    100 TB killer.

    Bucketed band-join rewrite (the standard optimization, e.g.
    Databricks' range-join hints): quantize ts into
    floor(unix_seconds / W) buckets, EXPLODE each signup to its 3
    candidate buckets {b−1, b, b+1} (a ≤W-second gap can never span
    more than adjacent buckets, and each pair meets in exactly ONE
    bucket — the error side keeps a single bucket value, so no dedup
    is needed), hash-equi-join on (user_id, bucket), then the EXACT
    microsecond BETWEEN residual. Plan-guarded: a hash/sort-merge join
    on the bucket key, never a nested loop. The exact predicate uses
    raw timestamp arithmetic (identical microsecond semantics in both
    engines); seconds-truncation only ever widens the candidate set."""
    e = _t(spark, sf_dir, "events")
    sig = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("signup_ts"),
        F.explode(
            F.array(
                *[
                    (
                        F.floor(
                            F.unix_timestamp("ts") / RANGE_JOIN_WINDOW_S
                        )
                        + d
                    ).cast("long")
                    for d in (-1, 0, 1)
                ]
            )
        ).alias("bucket"),
    )
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        F.floor(F.unix_timestamp("ts") / RANGE_JOIN_WINDOW_S)
        .cast("long")
        .alias("bucket"),
    )
    lo = F.col("signup_ts") - F.expr(
        f"INTERVAL {RANGE_JOIN_WINDOW_S} SECONDS"
    )
    hi = F.col("signup_ts") + F.expr(
        f"INTERVAL {RANGE_JOIN_WINDOW_S} SECONDS"
    )
    return (
        sig.join(err, ["user_id", "bucket"])
        .filter(F.col("error_ts").between(lo, hi))
        .select("signup_id", "error_id", "user_id", "signup_ts", "error_ts")
    )


# --- ordered funnel — the sequential-conversion analytics read -------------

_FUNNEL_STEPS = ("signup", "click", "purchase")


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users reaching signup → (later) click → (later)
    purchase, each step strictly after the user's earliest completion of
    the previous one — the product-analytics conversion read (and the
    ordered-sequence semantics a naive per-type count gets wrong: a
    purchase BEFORE the signup must not convert).
    -> (funnel_step, n_users).

    Plan shape: three user-keyed conditional MIN aggs, each joined to
    the previous step's (user, t) table — every exchange is user-keyed
    and ≤1 row per user after the first agg; at scale the three aggs
    reuse one hash partitioning. Earliest-completion semantics make the
    funnel exact (greedy earliest matching is optimal for 3-step
    strict-order funnels: taking the earliest valid step never excludes
    a later completion)."""
    e = _t(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [
        df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(step).alias("funnel_step"), "n_users"
        )
        for step, df in zip(_FUNNEL_STEPS, (s1, s2, s3))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


# ---------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "sessionize": f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR date_diff('second', LAG(ts) OVER w, ts) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS session_no
  FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       COUNT(*) AS n_events,
       date_diff('second', MIN(ts), MAX(ts)) AS duration_s
FROM sessions GROUP BY user_id, session_no
""",
    "filter_project": """
SELECT l_orderkey, l_linenumber, l_quantity AS qty,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_quantity > 30
""",
    "join_left_broadcast": """
SELECT o_orderkey, o_custkey, c_name, c_nationkey,
       ROUND(o_totalprice, 2) AS total_price
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
""",
    "join_map_chain": """
SELECT n_name, COUNT(*) AS n_items,
       ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "groupby_multi_mean": """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       ROUND(AVG(l_tax), 6) AS avg_tax,
       ROUND(CAST(SUM(l_quantity) AS DOUBLE), 6) AS sum_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "count_join": """
SELECT c_custkey, c_name,
       CAST(COALESCE(cnt.order_count, 0) AS BIGINT) AS order_count
FROM customer
LEFT JOIN (SELECT o_custkey, COUNT(*) AS order_count FROM orders GROUP BY o_custkey) cnt
  ON c_custkey = cnt.o_custkey
""",
    "rowwise_mean": """
SELECT l_orderkey, l_linenumber,
       ROUND((CAST(l_quantity AS DOUBLE) + l_discount * 100.0 + l_tax * 100.0) / 3, 6)
         AS row_mean
FROM lineitem
""",
    "max_keys": """
SELECT (SELECT MAX(o_orderkey) FROM orders) AS max_orderkey,
       (SELECT MAX(l_orderkey) FROM lineitem) AS max_l_orderkey
""",
    "window_user_events": """
SELECT user_id, event_id, event_type, user_event_count, rn FROM (
  SELECT user_id, event_id, event_type,
         COUNT(*) OVER (PARTITION BY user_id) AS user_event_count,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) t WHERE rn <= 3
""",
    "topk_orders": """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
FROM orders ORDER BY total_price DESC, o_orderkey ASC LIMIT 25
""",
    "union_distinct": """
WITH u AS (
  SELECT c_custkey AS custkey, 'customer' AS src FROM customer
  UNION ALL
  SELECT o_custkey AS custkey, 'orders' AS src FROM orders
)
SELECT custkey, COUNT(DISTINCT src) AS n_sources, COUNT(*) AS n_rows
FROM u GROUP BY custkey
""",
    "semi_join": """
SELECT l_orderkey, COUNT(*) AS n_items,
       ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS order_revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
GROUP BY l_orderkey
""",
    "substring_filter": """
SELECT p_partkey, p_name, p_size FROM part
WHERE LOWER(p_name) LIKE '%red%' AND p_size >= 10
""",
    "json_extract": """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(props->>'$.k' AS BIGINT)), 6) AS avg_k
FROM events GROUP BY event_type
""",
    "null_scrub": """
WITH banded AS (
  SELECT COALESCE(CASE WHEN c_acctbal IS NULL THEN NULL
                       WHEN c_acctbal < 0 THEN 'neg'
                       WHEN c_acctbal < 5000 THEN 'low'
                       ELSE 'high' END, 'unknown') AS band,
         c_acctbal
  FROM customer
)
SELECT band, COUNT(*) AS n_customers, ROUND(AVG(c_acctbal), 6) AS avg_bal
FROM banded GROUP BY band
""",
    "event_hour_window": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(value) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY date_trunc('hour', ts), event_type
""",
}

QUERIES = {
    "sessionize": q_sessionize,
    "filter_project": q_filter_project,
    "join_left_broadcast": q_join_left_broadcast,
    "join_map_chain": q_join_map_chain,
    "groupby_multi_mean": q_groupby_multi_mean,
    "count_join": q_count_join,
    "rowwise_mean": q_rowwise_mean,
    "max_keys": q_max_keys,
    "window_user_events": q_window_user_events,
    "topk_orders": q_topk_orders,
    "union_distinct": q_union_distinct,
    "semi_join": q_semi_join,
    "substring_filter": q_substring_filter,
    "json_extract": q_json_extract,
    "null_scrub": q_null_scrub,
    "event_hour_window": q_event_hour_window,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "event_funnel": q_event_funnel,
}

ORACLE_SQL["event_funnel"] = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT '{_FUNNEL_STEPS[0]}' AS funnel_step,
       CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT '{_FUNNEL_STEPS[1]}', CAST(COUNT(*) AS BIGINT) FROM s2
UNION ALL
SELECT '{_FUNNEL_STEPS[2]}', CAST(COUNT(*) AS BIGINT) FROM s3
"""

ORACLE_SQL["asof_join"] = """
SELECT p.event_id, p.user_id, p.ts,
       c.event_id AS click_id, c.ts AS click_ts, c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""

ORACLE_SQL["range_join"] = f"""
SELECT s.event_id AS signup_id, e.event_id AS error_id, s.user_id,
       s.ts AS signup_ts, e.ts AS error_ts
FROM (SELECT * FROM events WHERE event_type = 'signup') s
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON s.user_id = e.user_id
 AND e.ts BETWEEN s.ts - INTERVAL {RANGE_JOIN_WINDOW_S} SECONDS
              AND s.ts + INTERVAL {RANGE_JOIN_WINDOW_S} SECONDS
"""
