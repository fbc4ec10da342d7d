"""Skew/bucketing utilities: result parity and shuffle-topology proofs."""

from __future__ import annotations

from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators.skew import (
    salted_join,
    write_bucketed,
)
from similarity_search_with_hadoop_mapreduce_spark.plans import (
    shuffle_exchange_count,
)


def _skewed(spark):
    # 90% of rows share key "hot"
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)],
        "id long, key string",
    )
    # covers only every other cold key: k10, k30, ... stay unmatched
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i * 20}", float(i)) for i in range(50)],
        "key string, weight double",
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed(spark)
    plain = sorted(
        (r.id, r.key, r.weight)
        for r in big.join(small, "key").select("id", "key", "weight").collect()
    )
    salted = sorted(
        (r.id, r.key, r.weight)
        for r in salted_join(big, small, "key", n_salts=4)
        .select("id", "key", "weight")
        .collect()
    )
    assert plain == salted
    assert len(plain) > 900  # the hot key really dominated


def test_salted_left_join_preserves_unmatched(spark):
    big, small = _skewed(spark)
    missing = big.filter(F.col("key") == "k10")  # k10 not in small
    assert missing.count() == 1
    out = salted_join(big, small, "key", n_salts=4, how="left")
    row = [r for r in out.collect() if r.key == "k10"]
    assert len(row) == 1 and row[0].weight is None


def test_bucketed_join_has_zero_shuffles(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b",
        "o_custkey",
        n_buckets=4,
    )
    write_bucketed(
        customer.select("c_custkey", "c_name"),
        "customer_b",
        "c_custkey",
        n_buckets=4,
    )
    ob = spark.table("orders_b")
    cb = spark.table("customer_b")
    # disable broadcast so the join must pick sort-merge on the bucketed key
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ob.join(cb, ob.o_custkey == cb.c_custkey)
        assert shuffle_exchange_count(j) == 0  # bucketing pre-paid the shuffle
        assert j.count() == orders.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def _skewed_events(spark, n_hot=400, n_cold=40):
    # one hot user with events spread over many days + a few cold users;
    # timestamps include exact collisions with purchase times
    rows = []
    for i in range(n_hot):
        day, sec = divmod(i, 20)
        rows.append((i, 1, f"2024-01-{day + 1:02d} 00:{sec:02d}:10", "click", None))
    for i in range(n_hot // 4):
        day, sec = divmod(i * 4 + 1, 20)
        rows.append(
            (10_000 + i, 1, f"2024-01-{day + 1:02d} 00:{sec:02d}:10", "purchase",
             float(i))
        )
    for u in range(2, 2 + n_cold):
        rows.append((20_000 + u, u, f"2024-01-03 0{u % 10}:00:00", "click", None))
        if u % 3 == 0:
            rows.append(
                (30_000 + u, u, f"2024-01-01 00:00:00", "purchase", float(u))
            )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, event_type string, value double"
    )
    return df.select(
        "event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type", "value",
    )


def test_bucketed_asof_equals_global_asof_on_skewed_data(spark):
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        asof_join,
        asof_join_bucketed,
    )

    ev = _skewed_events(spark)
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
    )
    kw = dict(on="ts", by=["user_id"], values=["v"])
    want = sorted(
        (r.event_id, r.v) for r in asof_join(clicks, purchases, **kw).collect()
    )
    got_df = asof_join_bucketed(clicks, purchases, **kw)
    got = sorted((r.event_id, r.v) for r in got_df.collect())
    assert got == want
    # the hardened plan's big window must partition by (user_id, _rb) —
    # the hot key spreads across its time buckets
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert any(
        "hashpartitioning(user_id" in ln and "_rb" in ln
        for ln in plan.splitlines()
    ), plan


def test_bucketed_asof_carries_null_values_like_global(spark):
    """A right row whose value is NULL at the latest ts of a bucket must
    not mask an older non-null value for later buckets — the seed is the
    per-column last NON-null, exactly like the global running last. Two
    value columns go null at different times to pin per-column
    independence."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        asof_join,
        asof_join_bucketed,
    )

    clicks = spark.createDataFrame(
        [(i, 1, f"2024-01-{d:02d} 12:00:00") for i, d in enumerate([1, 2, 3, 4, 5])],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    purchases = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10.0, 100.0),
            (1, "2024-01-01 23:00:00", None, 200.0),   # day-1 latest: v1 NULL
            (1, "2024-01-03 23:00:00", 30.0, None),    # day-3 latest: v2 NULL
        ],
        "user_id long, ts_s string, v1 double, v2 double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "v1", "v2")
    kw = dict(on="ts", by=["user_id"], values=["v1", "v2"])
    want = sorted(
        (r.event_id, r.v1, r.v2)
        for r in asof_join(clicks, purchases, **kw).collect()
    )
    got = sorted(
        (r.event_id, r.v1, r.v2)
        for r in asof_join_bucketed(clicks, purchases, **kw).collect()
    )
    assert got == want
    # and the carried values really exercise the per-column paths
    by_id = dict((e, (a, b)) for e, a, b in want)
    assert by_id[1] == (10.0, 200.0)  # day-2 click: v1 from older non-null row
    assert by_id[4] == (30.0, 200.0)  # day-5 click: v2 survives day-3 NULL


def test_gapfill_auto_switches_on_span_and_stays_result_identical(spark):
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        gapfill_locf,
        gapfill_locf_auto,
    )

    ev = _skewed_events(spark).withColumn(
        "event_type", F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string"))
    )
    key = lambda r: (r.event_type, r.bucket_start)
    want = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in gapfill_locf(ev).collect()
    }
    # fixture spans weeks of minutes: default threshold -> global plan
    stats = {}
    got = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in gapfill_locf_auto(ev, stats=stats).collect()
    }
    # createDataFrame input -> min/max aggregate span (exact) -> the
    # r10 bounds-literal global plan
    assert stats["gapfill_plan"] == "global_bounds"
    assert got == want
    # forced-low threshold -> bucketed plan, same result
    stats = {}
    got_b = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in gapfill_locf_auto(ev, hot_window_rows=10, stats=stats).collect()
    }
    assert stats["gapfill_plan"] == "bucketed"
    assert got_b == want


def test_bucketed_gapfill_equals_global_gapfill(spark):
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        gapfill_locf,
        gapfill_locf_bucketed,
    )

    ev = _skewed_events(spark).withColumn(
        "event_type", F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string"))
    )
    key = lambda r: (r.event_type, r.bucket_start)
    want = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in gapfill_locf(ev).collect()
    }
    got = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in gapfill_locf_bucketed(ev).collect()
    }
    assert got == want


def test_aqe_skew_join_split_fires_on_hot_key(spark):
    """The dedup/skew docstrings lean on AQE skew-join splitting for hot
    join keys at scale; observe it actually firing (skew=true in the
    final adaptive SMJ) on a power-law fixture with thresholds scaled
    down to fixture bytes."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(100_000).select(
            F.when(F.col("id") % 10 < 9, "hot")
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
            .alias("key"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
        )
        small = spark.createDataFrame(
            [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(97)],
            "key string, w double",
        )
        # no aggregation downstream: OptimizeSkewedJoin (deliberately)
        # backs off when splitting would invalidate a required child
        # partitioning — the bare join is the shape the docstrings cite
        j = big.join(small, "key")
        n_hot = sum(1 for r in j.collect() if r.key == "hot")
        assert n_hot == 90_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_gapfill_edges_against_hand_grid(spark):
    """Gap-explode gapfill vs a hand-computed dense grid on hostile edges:
    a key that appears only late (head fill-in with null LOCF), a key only
    early (trailing fill carries forward), a null value in a key's FIRST
    observed bucket (LOCF must stay null until a non-null arrives, and a
    later null must not reset it), and a single-observation key."""
    import datetime as dt

    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        gapfill_locf,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        # "late": first event at minute 3
        ("late", m(3), 1.0), ("late", m(5), 2.0),
        # "early": events only in minutes 0-1; grid extends to global hi=5
        ("early", m(0), 10.0), ("early", m(1), None),
        # "nullhead": null value first, then a value, then null again
        ("nullhead", m(0), None), ("nullhead", m(2), 7.0), ("nullhead", m(4), None),
        # "single": one event
        ("single", m(2), 5.0),
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {
        (r.event_type, r.bucket_start.minute): (
            r.n_events, r.total_value, r.locf_value
        )
        for r in gapfill_locf(ev).collect()
    }
    # dense grid: every key x minutes 0..5
    assert len(got) == 4 * 6
    assert got[("late", 0)] == (0, None, None)
    assert got[("late", 2)] == (0, None, None)
    assert got[("late", 3)] == (1, 1.0, 1.0)
    assert got[("late", 4)] == (0, None, 1.0)
    assert got[("late", 5)] == (1, 2.0, 2.0)
    assert got[("early", 0)] == (1, 10.0, 10.0)
    assert got[("early", 1)] == (1, None, 10.0)  # null agg value: carry 10.0
    assert got[("early", 5)] == (0, None, 10.0)  # trailing fill to global hi
    assert got[("nullhead", 0)] == (1, None, None)  # no non-null seen yet
    assert got[("nullhead", 1)] == (0, None, None)
    assert got[("nullhead", 2)] == (1, 7.0, 7.0)
    assert got[("nullhead", 4)] == (1, None, 7.0)  # later null doesn't reset
    assert got[("nullhead", 5)] == (0, None, 7.0)
    assert got[("single", 2)] == (1, 5.0, 5.0)
    assert got[("single", 5)] == (0, None, 5.0)


def test_gapfill_empty_input_is_empty(spark):
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        gapfill_locf,
    )

    ev = spark.createDataFrame([], "event_type string, ts timestamp, value double")
    assert gapfill_locf(ev).count() == 0


def test_gapfill_gap_explode_has_two_exchanges(spark):
    """The gap-explode plan's selling point: agg exchange + window
    exchange only (the bounds aggregate broadcasts; no grid join)."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        gapfill_locf,
    )
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    df = gapfill_locf(ev)
    # bounds subtree: its exchange reuses the agg's; the only remaining
    # exchanges are the (key, minute) aggregation and the per-key window,
    # plus the single-partition exchange feeding the 1-row bounds agg.
    assert shuffle_exchange_count(df) <= 3


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=40),  # minute offset
            st.one_of(st.none(), st.integers(-5, 5)),  # value (None = null)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_gapfill_property_matches_python_oracle(spark, events):
    """Gap-explode gapfill vs a brute-force Python dense-grid LOCF on
    random event sets (multiple events per minute, null values, sparse
    keys)."""
    import datetime as dt

    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        gapfill_locf,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(minutes=minute, seconds=11), None if v is None else float(v))
        for k, minute, v in events
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    got = {
        (r.event_type, int((r.bucket_start - t0).total_seconds() // 60)): (
            r.n_events,
            r.total_value,
            r.locf_value,
        )
        for r in gapfill_locf(ev).collect()
    }

    # python oracle: dense grid over [min, max] observed minute, all keys
    per_bucket: dict = {}
    for k, minute, v in events:
        n, vals = per_bucket.get((k, minute), (0, []))
        per_bucket[(k, minute)] = (n + 1, vals + ([] if v is None else [float(v)]))
    minutes = [m for (_, m) in per_bucket]
    lo, hi = min(minutes), max(minutes)
    keys = {k for (k, _) in per_bucket}
    want = {}
    for k in keys:
        run = None
        for m in range(lo, hi + 1):
            n, vals = per_bucket.get((k, m), (0, []))
            tv = float(sum(vals)) if vals else None
            if tv is not None:
                run = tv
            want[(k, m)] = (n, tv, run)
    assert got == want


def test_footer_span_probe_matches_agg(spark):
    """The parquet-footer span fast path must agree with the aggregate
    probe on the fixture (and the auto entry must still route global)."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        _parquet_footer_span,
    )
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    bounds = _parquet_footer_span(ev, "ts")
    lo_a, hi_a = ev.agg(F.min("ts"), F.max("ts")).first()
    if bounds is None:
        # statistics unavailable for this physical type: fallback path
        # is the agg itself — nothing further to pin
        return
    lo_f, hi_f = bounds
    # footer bounds may be micro-truncated on nanos fixtures; the probe
    # only routes plans, so minute-level agreement is the contract
    assert abs((lo_f - lo_a).total_seconds()) < 60
    assert abs((hi_f - hi_a).total_seconds()) < 60


def test_footer_span_probe_declines_non_parquet(spark):
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        _parquet_footer_span,
    )

    df = spark.createDataFrame(
        [("a", 1.0)], "event_type string, value double"
    )
    assert _parquet_footer_span(df, "ts") is None


def test_gapfill_bounds_injection_exactness_and_plan(spark):
    """r10 bounds-literal path: exact (lo, hi) literals delete the
    bounds subquery + broadcast join from the global plan; the auto
    router only injects when bounds are provably exact (bare parquet
    scan footer stats, or the min/max aggregate) — a FILTERED parquet
    input must NOT use footer bounds (they over-span the filtered rows
    and would widen the grid)."""
    import tempfile

    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        _is_bare_scan,
        gapfill_locf,
        gapfill_locf_auto,
    )

    ev = _skewed_events(spark).withColumn(
        "event_type", F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string"))
    )
    key = lambda r: (r.event_type, r.bucket_start)  # noqa: E731
    want = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in gapfill_locf(ev).collect()
    }
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    with_bounds = gapfill_locf(ev, bounds=(lo, hi))
    got = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in with_bounds.collect()
    }
    assert got == want
    # the literal plan has no bounds subquery join; the default does
    plan_b = with_bounds._jdf.queryExecution().executedPlan().toString()
    plan_d = gapfill_locf(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan_b
    assert "BroadcastNestedLoopJoin" in plan_d

    # Spark-written parquet: INT96 timestamps carry no footer stats, so
    # the probe falls back to the min/max aggregate — exact for ANY
    # input, so bounds inject here too
    with tempfile.TemporaryDirectory(prefix="gapfill-") as d:
        ev.write.parquet(d + "/ev")
        pq = spark.read.parquet(d + "/ev")
        assert _is_bare_scan(pq)
        assert not _is_bare_scan(pq.filter("value > 0"))
        stats = {}
        got_pq = {
            key(r): (r.n_events, r.total_value, r.locf_value)
            for r in gapfill_locf_auto(pq, stats=stats).collect()
        }
        assert stats["gapfill_plan"] == "global_bounds"
        assert got_pq == want

    # footer-statted parquet (testdata, INT64 timestamps): bare scan ->
    # footer bounds are exact -> injected; FILTERED scan -> footer span
    # is an over-bound, routing-only — grid bounds must come from the
    # aggregate over the filtered rows (results == direct gapfill of
    # the filtered frame, NOT of the whole table)
    tev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        _parquet_footer_span,
    )

    assert _parquet_footer_span(tev, "ts") is not None  # stats present
    stats = {}
    out_bare = gapfill_locf_auto(tev, stats=stats)
    assert stats["gapfill_plan"] == "global_bounds"
    assert (
        "BroadcastNestedLoopJoin"
        not in out_bare._jdf.queryExecution().executedPlan().toString()
    )
    half = tev.filter(F.col("ts") < F.lit("2024-01-05"))  # drops rows
    assert half.count() < tev.count()
    stats = {}
    out_half = gapfill_locf_auto(half, stats=stats)
    assert stats["gapfill_plan"] == "global"  # footer over-spans: no inject
    want_half = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in gapfill_locf(half).collect()
    }
    got_half = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in out_half.collect()
    }
    assert got_half == want_half
    # the filtered grid must END at the filtered max, not the table max
    assert max(b for _, b in got_half) < min(
        r.ts for r in tev.agg(F.max("ts").alias("ts")).collect()
    )


def test_gapfill_auto_rejects_redefined_ts(spark):
    """ADVICE r10 (medium): a Project that REDEFINES ts under its
    physical name — select((ts + interval 1 hour).alias('ts')) — keeps
    the plan "bare" by node shape, but the parquet footer still
    describes the RAW values; injecting them as exact grid-bound
    literals would shift/crop the gapfill grid. _is_bare_scan must
    reject any alias onto the probed column, so the auto router falls
    back to the min/max aggregate and results match the direct gapfill
    of the shifted frame."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        _is_bare_scan,
        _parquet_footer_span,
        gapfill_locf,
        gapfill_locf_auto,
    )

    tev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    shifted = tev.select(
        (F.col("ts") + F.expr("interval 1 hour")).alias("ts"),
        "event_type",
        "value",
    )
    # physical column `ts` is still in the footer, so the name-based
    # probe WOULD find raw-value bounds — exactness must be denied
    assert _parquet_footer_span(shifted, "ts") is not None
    assert _is_bare_scan(tev, "ts")
    assert not _is_bare_scan(shifted, "ts")
    # passthrough with extra derived columns stays exact (ts untouched)
    derived = tev.select("ts", "event_type", "value",
                         (F.col("value") * 2).alias("v2"))
    assert _is_bare_scan(derived, "ts")

    stats = {}
    out = gapfill_locf_auto(shifted, stats=stats)
    assert stats["gapfill_plan"] == "global"  # aggregate bounds, no inject
    key = lambda r: (r.event_type, r.bucket_start)  # noqa: E731
    want = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in gapfill_locf(shifted).collect()
    }
    got = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in out.collect()
    }
    assert got == want
    # the shifted grid must START an hour after the raw footer lo —
    # the exact failure the injected raw bounds would have caused
    raw_lo, _ = _parquet_footer_span(tev, "ts")
    grid_lo = min(b for _, b in got)
    assert grid_lo >= raw_lo.replace(second=0, microsecond=0) and (
        grid_lo - raw_lo.replace(second=0, microsecond=0)
    ).total_seconds() >= 3600


def test_bare_scan_sees_aliases_past_tostring_cutoff(spark):
    """ADVICE r11: _is_bare_scan must walk the JVM plan tree, not its
    string render — toString elides Project fields past
    spark.sql.debug.maxToStringFields (default 25), so a wide
    projection redefining ts beyond the cutoff used to hide the alias
    and footer bounds were wrongly claimed exact."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        _is_bare_scan,
    )

    tev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pad = [F.lit(i).alias(f"c{i:02d}") for i in range(30)]
    hidden = tev.select(
        *pad, (F.col("ts") + F.expr("interval 1 hour")).alias("ts")
    )
    # the render really does truncate (the bug's precondition) ...
    assert "more fields" in hidden._jdf.queryExecution().optimizedPlan().toString()
    # ... and the walk still sees the alias
    assert not _is_bare_scan(hidden, "ts")
    # wide passthrough stays exact-eligible
    wide_ok = tev.select(*pad, "ts")
    assert _is_bare_scan(wide_ok, "ts")


def test_bare_scan_whitelists_wall_preserving_ntz_cast(spark):
    """r12: `load_table`'s microsecond-fixture normalization —
    cast(ts TIMESTAMP_NTZ AS TIMESTAMP).alias('ts') — preserves parquet
    footer min/max verbatim (wall-clock reinterpretation in the session
    zone), so _is_bare_scan must accept it; without the whitelist the
    driver's events table NEVER got the literal-bounds gapfill plan and
    always paid the second scan branch + broadcast-nested-loop join.
    Every other redefinition stays rejected."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        _is_bare_scan,
        gapfill_locf,
        gapfill_locf_auto,
    )
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_table,
    )

    tev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # the exact load_table shape (µs fixtures arrive TIMESTAMP_NTZ)
    normalized = tev.withColumn("ts", F.col("ts").cast("timestamp"))
    assert dict(tev.dtypes)["ts"] == "timestamp_ntz"
    assert _is_bare_scan(normalized, "ts")
    # ... and through load_table itself, end to end: literal plan fires
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    stats = {}
    out = gapfill_locf_auto(ev, stats=stats)
    assert stats["gapfill_plan"] == "global_bounds"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    key = lambda r: (r.event_type, r.bucket_start)  # noqa: E731
    want = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in gapfill_locf(ev).collect()
    }
    got = {
        key(r): (r.n_events, r.total_value, r.locf_value)
        for r in out.collect()
    }
    assert got == want

    # near-miss casts stay rejected: a double-cast chain, a cast of a
    # DIFFERENT column aliased onto ts, and a value-shifting expr
    double = tev.withColumn(
        "ts", F.col("ts").cast("timestamp").cast("timestamp_ntz")
    )
    assert not _is_bare_scan(double, "ts")
    other = tev.select(F.col("event_id").cast("timestamp").alias("ts"),
                       "event_type", "value")
    assert not _is_bare_scan(other, "ts")


def test_gapfill_bounds_literals_in_dst_session_timezone(spark):
    """ADVICE r12: the footer-bounds literal path must equal the
    aggregate-bounds path in a NON-UTC, DST-observing session timezone,
    with fixture wall times spanning (and landing inside) the
    spring-forward gap. Two things make this hold and both are pinned
    here: footer statistics are wall values that load_table's NTZ cast
    maps with the session-zone rules, and (r13) gapfill_locf injects
    the bound literals as string->timestamp casts so they go through
    the SAME session-zone mapping — a naive-datetime F.lit() would be
    converted with the driver OS zone instead and shift the grid
    whenever OS zone != session zone."""
    import datetime
    import tempfile

    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        _is_bare_scan,
        gapfill_locf,
        gapfill_locf_auto,
    )

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # wall times around 2024-03-10 02:00 America/New_York (the
        # spring-forward gap: 02:00-03:00 does not exist); 02:15 and
        # 02:45 are nonexistent local times the cast must remap, and
        # one of them is the MIN that becomes the injected grid bound
        rows = [
            ("a", datetime.datetime(2024, 3, 10, 2, 15, 30), 1.0),
            ("a", datetime.datetime(2024, 3, 10, 2, 45, 0), 2.0),
            ("a", datetime.datetime(2024, 3, 10, 3, 30, 0), 3.0),
            ("b", datetime.datetime(2024, 3, 10, 1, 30, 0), 4.0),
            ("b", datetime.datetime(2024, 3, 10, 4, 10, 0), 5.0),
        ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp_ntz, value double"
        )
        with tempfile.TemporaryDirectory(prefix="gapfill-dst-") as d:
            df.coalesce(1).write.parquet(d + "/ev")
            raw = spark.read.parquet(d + "/ev")
            assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
            # the exact load_table normalization shape
            ev = raw.withColumn("ts", F.col("ts").cast("timestamp"))
            assert _is_bare_scan(ev, "ts")
            stats = {}
            out_lit = gapfill_locf_auto(ev, stats=stats)
            assert stats["gapfill_plan"] == "global_bounds"
            key = lambda r: (r.event_type, r.bucket_start)  # noqa: E731
            got = {
                key(r): (r.n_events, r.total_value, r.locf_value)
                for r in out_lit.collect()
            }
            want = {
                key(r): (r.n_events, r.total_value, r.locf_value)
                for r in gapfill_locf(ev).collect()  # aggregate bounds
            }
            assert got == want
            assert len(got) > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
