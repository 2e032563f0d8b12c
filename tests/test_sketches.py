"""Mergeable sketch rollups (operators/sketches.py): merge-consistency
(unioned daily sketches equal the whole-range sketch) and accuracy vs the
exact answers they approximate."""

from __future__ import annotations

from pyspark.sql import functions as F

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.sketches import (
    daily_sketches,
    kll_union_tree,
    sketch_range_query,
    sketch_rollup,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sources.tables import (
    load_table,
)


def test_hll_merge_matches_whole_range_sketch(spark, sf_dir):
    """Merging the daily HLL sketches must give EXACTLY the estimate of one
    sketch built over the whole range (sketch union is lossless wrt the
    sketch state, not just approximately right)."""
    ev = load_table(spark, sf_dir, "events")
    merged = (
        daily_sketches(spark, sf_dir)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("est"))
        .collect()[0]
        .est
    )
    whole = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0]
        .est
    )
    assert merged == whole


def test_kll_tree_union_bounded_and_accurate(spark, sf_dir):
    """The tree union (bounded <= fanin sketches per reducer per round)
    answers rank queries within KLL error of both the exact percentile
    AND the flat single-row fold — lifting the flat fold's
    everything-in-one-row bound without losing accuracy.  fanin=2 over
    ~30 daily sketches forces ~5 tree levels, the deepest recursion the
    local data can produce."""
    daily = daily_sketches(spark, sf_dir).withColumn("_g", F.lit(1))
    merged = kll_union_tree(daily, ["_g"], "value_kll", fanin=2)
    p50 = merged.select(
        F.kll_sketch_get_quantile_double("value_kll", F.lit(0.5)).alias("q")
    ).collect()[0].q

    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(
        F.expr("percentile(value, 0.4)").alias("p40"),
        F.expr("percentile(value, 0.6)").alias("p60"),
    ).collect()[0]
    # KLL k=200 rank error ~1.7%: the tree-merged p50 must land well
    # inside the exact p40..p60 value band
    assert exact.p40 <= p50 <= exact.p60, (p50, exact)

    row = sketch_range_query(spark, sf_dir).collect()[0]
    n_exact = ev.select(F.count_distinct("user_id")).collect()[0][0]
    assert abs(row.approx_users - n_exact) <= max(3, 0.05 * n_exact)
    assert exact.p40 <= row.approx_p50_value <= exact.p60
    assert row.n_events == ev.count()


def test_sketch_rollup_accuracy(spark, sf_dir):
    """Weekly estimates from merged daily sketches sit within sketch error
    of the exact answers (HLL lgK=12 ~1.6%; KLL k=200 rank error ~1.7%)."""
    exact = {
        r.week: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("week", F.date_trunc("day", "ts")).alias("week"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    got = sketch_rollup(spark, sf_dir).collect()
    assert {r.week for r in got} == set(exact)
    for r in got:
        e = exact[r.week]
        assert abs(r.approx_users - e.n_users) <= max(3, 0.05 * e.n_users), r
        # KLL guarantees RANK error, not value error: the estimate must be
        # a plausible mid-range value between the exact p40 and p60 bounds
        span = e.hi - e.lo
        assert e.lo <= r.approx_p50_value <= e.hi, r
        assert abs(r.approx_p50_value - e.p50) <= 0.2 * span, r


def test_streaming_sketch_maintenance_incremental_and_exactly_once(spark, tmp_path):
    """The daily sketch table maintained per micro-batch must equal the
    batch-computed rollup on the same data (counts exactly; HLL estimates
    exactly — union of partials has the same registers; KLL quantiles
    within the rollup tolerance), and a replayed batch must not commit
    twice."""
    import json as _json
    import os as _os
    import time as _time

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.sinks.snapshot import (
        read_snapshot,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.streaming.sketch_maintenance import (
        maintain_batch,
        run_sketch_maintenance,
    )

    src = str(tmp_path / "incoming")
    table = str(tmp_path / "daily")
    ckpt = str(tmp_path / "ckpt")
    _os.makedirs(src)

    def event(i, day, user, val):
        return {
            "event_id": i,
            "ts": f"2024-03-{day:02d}T{i % 24:02d}:00:00Z",
            "user_id": user,
            "event_type": "click",
            "value": val,
        }

    rows, i = [], 0
    for b in range(3):  # 3 files -> 3 micro-batches
        batch = []
        for k in range(200):
            i += 1
            batch.append(event(i, 1 + (i % 4), (i * 7) % 60, float(i % 100)))
        rows.append(batch)
        with open(_os.path.join(src, f"b{b}.json"), "w") as f:
            for e in batch:
                f.write(_json.dumps(e) + "\n")
        _time.sleep(0.05)

    q = run_sketch_maintenance(
        spark, src, table, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(300)
    q.stop()

    got = {
        r.day: r
        for r in read_snapshot(spark, table)
        .select(
            "day",
            "n_events",
            F.hll_sketch_estimate("users_hll").alias("users"),
            F.round(
                F.kll_sketch_get_quantile_double("value_kll", F.lit(0.5)), 2
            ).alias("p50"),
        )
        .collect()
    }
    # exact twin over the full feed
    all_rows = [e for b in rows for e in b]
    import datetime

    exact: dict = {}
    for e in all_rows:
        d = datetime.datetime.fromisoformat(e["ts"]).date()
        exact.setdefault(d, {"n": 0, "users": set(), "vals": []})
        exact[d]["n"] += 1
        exact[d]["users"].add(e["user_id"])
        exact[d]["vals"].append(e["value"])
    assert {d.date() for d in got} == set(exact)
    for day, r in got.items():
        e = exact[day.date()]
        assert r.n_events == e["n"], (day, r.n_events, e["n"])
        assert abs(r.users - len(e["users"])) <= max(3, 0.05 * len(e["users"]))
        vals = sorted(e["vals"])
        lo, hi = vals[int(0.35 * len(vals))], vals[int(0.65 * len(vals))]
        assert lo <= r.p50 <= hi, (day, r.p50, lo, hi)

    # the maintained CM counter arrays must EXACTLY equal a direct
    # per-day CM over the whole feed (CM merge is lossless integer adds)
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.sketches import (
        cm_array_agg,
    )

    whole = spark.createDataFrame(
        [
            (e["event_id"], e["ts"].replace("Z", "+00:00"), e["user_id"],
             e["event_type"], e["value"])
            for e in all_rows
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    want_cm = {r.day: list(r.cm) for r in cm_array_agg(whole).collect()}
    got_cm = {
        r.day: list(r.cm)
        for r in read_snapshot(spark, table).select("day", "cm").collect()
    }
    assert got_cm == want_cm

    # replay the LAST batch id by hand: the txn high-water mark must skip
    # the commit — counts unchanged
    last_batch = spark.createDataFrame(
        [
            (e["event_id"], e["ts"].replace("Z", "+00:00"), e["user_id"],
             e["event_type"], e["value"])
            for e in rows[2]
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    import hashlib as _hashlib

    app = "sketch-" + _hashlib.md5(ckpt.encode()).hexdigest()[:12]
    maintain_batch(spark, last_batch, table, 2, txn_app=app)
    after = {
        r.day: r.n_events
        for r in read_snapshot(spark, table).select("day", "n_events").collect()
    }
    assert after == {d: r.n_events for d, r in got.items()}


def test_cm_estimate_bounds(spark, sf_dir):
    """CM guarantees: est >= true count always (min over rows of an
    over-counted bucket), and est <= true + eN with e = e/W per row at
    failure prob (1/e)^d — checked loosely at e*N with N the stream
    length (the classical bound holds per row; min over 4 rows is far
    inside it)."""
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.sketches import (
        CM_W,
        cm_topk,
    )

    ev = load_table(spark, sf_dir, "events")
    exact = {r.user_id: r.c for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    n = sum(exact.values())
    bound = 2.718 * n / CM_W
    for r in cm_topk(spark, sf_dir).collect():
        t = exact[r.user_id]
        assert r.est_count >= t, (r.user_id, r.est_count, t)
        assert r.est_count <= t + bound, (r.user_id, r.est_count, t, bound)


def test_cm_planted_heavy_hitter_ranks_first(spark, tmp_path):
    """A key with 30% of the stream must surface at rank 1 with an
    estimate within the CM bound of its true count."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(3000):
        uid = 7 if i % 10 < 3 else 1000 + (i % 400)
        rows.append((i, base + dt.timedelta(minutes=i % 600), uid, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.sketches import (
        cm_topk,
    )

    top = cm_topk(spark, str(tmp_path)).collect()
    assert top[0].user_id == 7 and top[0].rank == 1
    assert 900 <= top[0].est_count <= 900 + int(2.718 * 3000 / 512) + 1
