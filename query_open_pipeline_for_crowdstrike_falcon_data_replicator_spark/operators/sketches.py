"""Mergeable-sketch rollups over the event feed (DataSketches built-ins).

The hypertable rollup (`plans/relational.py`) pre-aggregates sums/counts
per day, but COUNT DISTINCT and quantiles don't pre-aggregate — unless
the daily table stores SKETCHES.  Daily HLL (distinct users) and KLL
(value quantiles) sketches are small (~KB), mergeable, and answer any
date-range question by unioning the covered days' sketches instead of
rescanning the raw 100 TB feed — the standard lakehouse pattern for
"distinct users last N days" dashboards.

Estimates are approximate (HLL lgK=12 -> ~1.6% relative error), so there
is no exact DuckDB oracle; the driver records a rows-only check and
`tests/test_sketches.py` pins merge-consistency (merged daily sketches ==
whole-range sketch) and accuracy vs the exact answers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-rollup shape: per day, an HLL sketch of user_id and a
    KLL sketch of value next to the exact additive aggregates.  One scan,
    one shuffle on day — identical cost profile to a plain daily rollup."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.hll_sketch_agg("user_id").alias("users_hll"),
        F.kll_sketch_agg_double("value").alias("value_kll"),
    )


def sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range query answered FROM the daily sketches: distinct users and
    value quantiles per week, merging each week's 7 daily sketches —
    the raw feed is never rescanned.

    Weeks are keyed by ``date_trunc('week', day)`` (the Monday), not
    ``weekofyear`` alone: a bare ISO week number collides across years
    (week 3 of 2025 merging into week 3 of 2026) and mixes years at the
    52/53 boundary."""
    daily = daily_sketches(spark, sf_dir)
    # KLL ships only a two-sketch scalar merge (no union aggregate like
    # HLL's hll_union_agg), so fold it over the week's collected sketches —
    # at most 7 ~KB blobs per group, driver never involved
    kll_list = F.collect_list("value_kll")
    kll_merged = F.aggregate(
        F.slice(kll_list, 2, 366),
        F.element_at(kll_list, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    return (
        daily.groupBy(F.date_trunc("week", "day").alias("week"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("approx_users"),
            F.round(
                F.kll_sketch_get_quantile_double(kll_merged, F.lit(0.5)), 2
            ).alias("approx_p50_value"),
        )
        .orderBy("week")
    )


def kll_union_tree(
    df: DataFrame, keys: list[str], sketch_col: str, fanin: int = 32
) -> DataFrame:
    """True mergeable KLL union for groups of ANY width: a tree fold in
    ``ceil(log_fanin(n))`` rounds, each round collecting at most ``fanin``
    sketches per reducer and merging them with the two-sketch scalar
    merge.  Bounded state per task at every level — the aggregate a
    year-wide (365-sketch) or corpus-wide union needs, where a flat
    ``collect_list`` would buffer every blob in one row.

    KLL lacks a built-in union aggregate (HLL has ``hll_union_agg``);
    this supplies the equivalent as a plan composition: per round, rows
    are slotted ``row_number() div fanin`` within their key and each slot
    folds its <= fanin sketches.  Returns one (keys..., sketch) row per
    group."""
    from pyspark.sql import Window

    if fanin < 2:
        raise ValueError("fanin must be >= 2")
    out = df.select(*keys, F.col(sketch_col).alias("_kll"))
    # one cheap count pass bounds the number of rounds (the input is a
    # rollup table — days/hours per group — not the raw feed)
    max_n = out.groupBy(*keys).count().agg(F.max("count")).collect()[0][0] or 0
    fold = lambda lst: F.aggregate(  # noqa: E731
        F.slice(lst, 2, 2_000_000_000),
        F.element_at(lst, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    while max_n > 1:
        w = Window.partitionBy(*keys).orderBy(F.monotonically_increasing_id())
        out = (
            out.withColumn(
                "_slot", ((F.row_number().over(w) - 1) / fanin).cast("int")
            )
            .groupBy(*keys, "_slot")
            .agg(F.collect_list("_kll").alias("_lst"))
            .select(*keys, fold(F.col("_lst")).alias("_kll"))
        )
        max_n = -(-max_n // fanin)
    return out.withColumnRenamed("_kll", sketch_col)


def sketch_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-range dashboard answer FROM the daily rollup: distinct users
    (HLL union aggregate) and value quantiles (KLL tree union) over ALL
    days, one output row — the "last N days" query shape where N is wide
    enough that the flat per-group collect would not be bounded.  The raw
    feed is never rescanned; fanin=8 exercises a genuinely multi-level
    tree over the ~30 daily sketches."""
    daily = daily_sketches(spark, sf_dir).withColumn("_all", F.lit(1))
    kll = kll_union_tree(daily, ["_all"], "value_kll", fanin=8)
    hll = daily.groupBy("_all").agg(
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("approx_users"),
    )
    q = lambda p: F.round(  # noqa: E731
        F.kll_sketch_get_quantile_double(F.col("value_kll"), F.lit(p)), 2
    )
    return (
        hll.join(kll, "_all")
        .select(
            "n_events",
            "approx_users",
            q(0.5).alias("approx_p50_value"),
            q(0.99).alias("approx_p99_value"),
        )
    )


# --------------------------------------------------------------------- #
# Count-min: the mergeable FREQUENCY sketch (completes HLL distinct /
# KLL quantile / CM frequency)
# --------------------------------------------------------------------- #
# Spark ships a count_min_sketch aggregate but no SQL-side union for its
# binary blobs.  A CM sketch is just a d x w counter array and merging is
# element-wise addition — both fully relational — so the rollup keeps the
# counters as a plain array<long> column: daily sketches merge with one
# (idx, sum) shuffle of d*w-row granularity, never a rescan of the feed.
# Hashes are md5-derived (the SimHash precedent), so unlike the
# DataSketches blobs the whole pipeline is engine-portable and the DuckDB
# oracle can replay it EXACTLY: Spark estimates from merged daily
# sketches, the oracle counts buckets over the whole range directly —
# equality proves the merge is lossless.
CM_W = 512  # buckets per row
CM_D = 4  # hash rows; est = min over rows (never underestimates)
CM_TOPK = 20


def _cm_bucket(col, j: int):
    """Portable 60-bit md5 hash of the key, salted per CM row, mod W."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cm{j}:"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(CM_W))


def cm_array_agg(ev: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-day CM sketch of ``key`` as a dense d*w array<long> from any
    events-shaped frame — ONE shuffle on (day, idx).  Shared by the batch
    rollup and the streaming maintenance loop."""
    rows = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.explode(
            F.array(
                *[
                    (F.lit(j) * CM_W + _cm_bucket(F.col(key), j)).alias("i")
                    for j in range(CM_D)
                ]
            )
        ).alias("idx"),
    )
    counts = rows.groupBy("day", "idx").agg(F.count(F.lit(1)).alias("cnt"))
    # densify via a (day x idx) grid join + one sorted collect per day —
    # NOT per-element map lookups (element_at on a 2048-entry MAP is a
    # linear scan; 2048 of them per day-row made densification O(W^2))
    spark = ev.sparkSession
    grid = counts.select("day").distinct().crossJoin(
        spark.range(CM_D * CM_W).select(F.col("id").cast("long").alias("idx"))
    )
    filled = grid.join(counts, ["day", "idx"], "left").select(
        "day", "idx", F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt")
    )
    return filled.groupBy("day").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "cnt"))),
            lambda s: s["cnt"],
        ).alias("cm")
    )


def cm_merge_fold(cm_list):
    """Element-wise sum fold over a collected list of CM arrays — the
    linearity that makes CM mergeable, as a reusable column expression."""
    return F.aggregate(
        F.slice(cm_list, 2, 2_000_000_000),
        F.element_at(cm_list, 1),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )


def cm_daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day CM sketch of user_id — the persisted-rollup shape."""
    return cm_array_agg(load_table(spark, sf_dir, "events"))


def cm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters FROM the merged daily CM sketches: daily counter
    arrays merge by (idx, sum) — element-wise addition, the linearity
    that makes CM mergeable — then every candidate key reads its d
    counters from the broadcast 1-row merged sketch (the q11
    scalar-attach pattern) and the estimate is their min.  Top-CM_TOPK
    by (estimate desc, user_id).

    Exact-oracled: DuckDB skips the daily stage and counts buckets over
    the whole range — hash-equality of the outputs proves the
    daily-merge is lossless.  CM over-counts under collisions (est >=
    true count, pinned in tests); both engines over-count identically."""
    daily = cm_daily_sketches(spark, sf_dir)
    # merged sketch as a DENSE idx-ordered array, not a map:
    # element_at on a 2048-entry MAP is a linear scan, and every
    # candidate key paid d of them (8k comparisons/key); array indexing
    # is O(1).  The daily arrays are dense by construction, so every
    # idx 0..d*w-1 is present and the sorted collect is the identity
    # layout the lookups expect.
    merged = (
        daily.select(F.posexplode("cm").alias("idx", "cnt"))
        .groupBy("idx")
        .agg(F.sum("cnt").alias("cnt"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "cnt"))),
                lambda s: s["cnt"],
            ).alias("cma")
        )
    )
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    est = F.least(
        *[
            F.coalesce(
                F.element_at(
                    F.col("cma"),
                    (F.lit(j) * CM_W + _cm_bucket(F.col("user_id"), j) + 1).cast(
                        "int"
                    ),
                ),
                F.lit(0),
            )
            for j in range(CM_D)
        ]
    )
    from pyspark.sql import Window

    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    # no SinglePartition sort of every candidate); the rank window then
    # runs over CM_TOPK rows only
    w = Window.orderBy(F.desc("est_count"), F.asc("user_id"))
    return (
        users.crossJoin(F.broadcast(merged))
        .select("user_id", est.cast("long").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("user_id"))
        .limit(CM_TOPK)
        .withColumn("rank", F.row_number().over(w))
    )


def _cm_oracle_sql() -> str:
    """Direct whole-range bucket counts (no daily stage): equality with
    the Spark daily-merge pipeline proves CM merge losslessness."""
    bucket = (
        "CAST(('0x' || substr(md5('cm{j}:' || CAST(user_id AS VARCHAR)), 1, 15))"
        " AS BIGINT) % {w}"
    )
    union = "\n  UNION ALL\n  ".join(
        f"SELECT {j} AS j, {bucket.format(j=j, w=CM_W)} AS bucket, count(*) AS c"
        f" FROM events GROUP BY 1, 2"
        for j in range(CM_D)
    )
    lookups = "\n    ".join(
        f"JOIN counts c{j} ON c{j}.j = {j} AND c{j}.bucket = "
        + bucket.format(j=j, w=CM_W).replace("user_id", "u.user_id")
        for j in range(CM_D)
    )
    least = ", ".join(f"c{j}.c" for j in range(CM_D))
    return f"""
WITH counts AS (
  {union}
),
users AS (SELECT DISTINCT user_id FROM events),
est AS (
  SELECT u.user_id, CAST(least({least}) AS BIGINT) AS est_count
  FROM users u
    {lookups}
)
SELECT user_id, est_count,
       row_number() OVER (ORDER BY est_count DESC, user_id ASC) AS rank
FROM est
QUALIFY rank <= {CM_TOPK}
"""


SKETCH_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # approximate by construction -> no exact oracle (rows-only check);
    # accuracy + merge-consistency pinned in tests/test_sketches.py
    "events_sketch_rollup": (sketch_rollup, None),
    "events_sketch_range": (sketch_range_query, None),
    "events_cm_topk": (cm_topk, _cm_oracle_sql()),
}
