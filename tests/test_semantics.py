"""Semantics probes (SURVEY §5.2/§5.3): tiny hand-built inputs that
pin each known Spark↔DuckDB dialect hazard. Every probe documents a
rule the operator inventory relies on; if an engine upgrade shifts
one of these, the failing probe names the drifted rule directly.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import Row, functions as F


def test_substring_is_one_based(spark, duck):
    got = spark.sql("SELECT substring('abcdef', 2, 3) AS s").collect()[0]["s"]
    want = duck.execute("SELECT substr('abcdef', 2, 3)").fetchone()[0]
    assert got == want == "bcd"


def test_datediff_argument_order(spark, duck):
    # Spark datediff(end, start); DuckDB date_diff('day', start, end).
    got = spark.sql(
        "SELECT datediff(DATE'1998-09-02', DATE'1998-08-30') AS d"
    ).collect()[0]["d"]
    want = duck.execute(
        "SELECT date_diff('day', DATE '1998-08-30', DATE '1998-09-02')"
    ).fetchone()[0]
    assert got == want == 3


def test_rounding_divergence_at_binary_boundaries(spark, duck):
    """Spark round(x, d) rounds the double's SHORTEST-DECIMAL repr
    (0.285 -> 0.29); DuckDB rounds the BINARY value (0.285 is really
    0.2849999..., -> 0.28). Exactly-representable halves agree
    (2.5 -> 3 on both). This is WHY the inventory never rounds a value
    that can sit on a .5 boundary: floating AGGREGATES of real data
    are never exactly .5eps, and exact rationals (averages, jaccard)
    are left unrounded per functions/exact.py."""
    s = spark.sql("SELECT round(2.5D) a, round(0.285D, 2) b").collect()[0]
    d = duck.execute("SELECT round(2.5::DOUBLE), round(0.285::DOUBLE, 2)").fetchone()
    assert s["a"] == d[0] == 3.0  # representable half: engines agree
    assert s["b"] == 0.29 and d[1] == 0.28  # boundary: documented divergence


def test_posexplode_zero_based_vs_unnest_one_based(spark, duck):
    got = (
        spark.createDataFrame([Row(a=["x", "y"])])
        .select(F.posexplode("a").alias("pos", "val"))
        .collect()
    )
    want = duck.execute(
        "SELECT ordinality, val FROM (SELECT unnest(['x','y']) AS val,"
        " generate_subscripts(['x','y'], 1) AS ordinality)"
    ).fetchall()
    # Spark pos is 0-based, SQL ordinality is 1-based: fixed +1 offset.
    assert [(r["pos"] + 1, r["val"]) for r in got] == [(o, v) for o, v in want]


def test_count_ignores_nulls_sum_of_empty_is_null(spark):
    df = spark.createDataFrame([Row(g=1, v=None), Row(g=1, v=2.0)], "g INT, v DOUBLE")
    r = df.groupBy("g").agg(
        F.count("v").alias("cnt"), F.count("*").alias("cnt_star")
    ).collect()[0]
    assert r["cnt"] == 1 and r["cnt_star"] == 2
    empty = df.filter("v > 100").agg(F.sum("v").alias("s")).collect()[0]
    assert empty["s"] is None  # SUM over empty input is NULL, not 0


def test_ansi_division_guard(spark):
    # ANSI mode errors on x/0; every inventory division goes through
    # NULLIF. The guard must yield NULL, not raise.
    r = spark.sql("SELECT 1.0 / NULLIF(0, 0) AS q").collect()[0]["q"]
    assert r is None


def test_nan_and_null_ordering(spark):
    """Spark sorts NaN greater than any double and NULLs according to
    the explicit nulls_last/nulls_first modifier - the inventory's
    sort keys rely on both."""
    df = spark.createDataFrame(
        [Row(v=1.0), Row(v=float("nan")), Row(v=None), Row(v=-1.0)]
    )
    vals = [r["v"] for r in df.orderBy(F.col("v").asc_nulls_last()).collect()]
    assert vals[0] == -1.0 and vals[1] == 1.0
    assert math.isnan(vals[2]) and vals[3] is None


def test_events_ns_timestamp_truncation(spark, duck):
    """Whatever physical encoding events.ts ships with (TIMESTAMP
    (NANOS) pre-r3, timestamp[us] NTZ since), the loader's normalized
    TIMESTAMP must render the exact same microsecond values DuckDB
    reads from the same file (see tests/test_loader_normalize.py for
    the per-encoding fixtures)."""
    from pudatalake_spark.loaders import table
    from tests.conftest import SF_DIR

    got = (
        table(spark, SF_DIR, "events")
        .select(F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("t"))
        .orderBy("t")
        .limit(3)
        .collect()
    )
    want = duck.execute(
        "SELECT strftime(ts, '%Y-%m-%d %H:%M:%S.%f') FROM events ORDER BY 1 LIMIT 3"
    ).fetchall()
    assert [r["t"] for r in got] == [w[0] for w in want]


def test_timezone_is_utc(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_limit_requires_total_order_for_determinism(spark):
    """q_topk's tie rule: ORDER BY must end in a unique key or LIMIT
    is nondeterministic across partitionings. Probe: duplicate sort
    keys with a unique tiebreak yield a stable frontier."""
    rows = [Row(k=1, u=i) for i in range(10)]
    df = spark.createDataFrame(rows)
    first = [r["u"] for r in df.orderBy("k", "u").limit(3).collect()]
    second = [
        r["u"]
        for r in df.repartition(7).orderBy("k", "u").limit(3).collect()
    ]
    assert first == second == [0, 1, 2]


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("element_at(array(10, 20, 30), 1)", 10),  # Spark arrays are 1-based
        ("size(array())", 0),
        ("array_position(array(5, 6), 6)", 2),  # 1-based position
    ],
)
def test_array_indexing_is_one_based(spark, expr, expected):
    assert spark.sql(f"SELECT {expr} AS v").collect()[0]["v"] == expected


def test_hll_sketch_estimates_within_tolerance(spark, duck):
    """q_agg_hll_sketch is rows-only (approximate by design); pin its
    estimates against exact distincts at the documented DataSketches
    lgK=12 bound (~1.6% relative standard error; assert 5% to avoid
    flakiness), including the merged __ALL__ row, which must estimate
    the UNION of the per-type sketches."""
    from pudatalake_spark import registry

    from tests.conftest import SF_DIR

    got = {
        r["event_type"]: r["approx_users"]
        for r in registry.QUERIES["q_agg_hll_sketch"](spark, SF_DIR).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1 "
            "UNION ALL SELECT '__ALL__', count(DISTINCT user_id) FROM events"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(1, 0.05 * n), (k, got[k], n)


def test_hll_intersect_within_tolerance(spark, duck):
    """q_agg_hll_intersect (inclusion-exclusion over HLL sketches) is
    approximate-by-design; pin it against the exact overlap. The
    intersection inherits the ABSOLUTE error of three estimates, so
    the tolerance is on the union scale (5%), not the overlap's."""
    from pudatalake_spark import registry

    from tests.conftest import SF_DIR

    row = registry.QUERIES["q_agg_hll_intersect"](spark, SF_DIR).first()
    exact_both = duck.execute(
        "SELECT count(*) FROM ("
        " SELECT user_id FROM events WHERE event_type='click'"
        " INTERSECT SELECT user_id FROM events WHERE event_type='purchase')"
    ).fetchone()[0]
    exact_union = duck.execute(
        "SELECT count(DISTINCT user_id) FROM events"
        " WHERE event_type IN ('click','purchase')"
    ).fetchone()[0]
    assert abs(row["approx_both"] - exact_both) <= max(2, 0.05 * exact_union), (
        row["approx_both"],
        exact_both,
    )


def test_interval_bucketization_exact_for_negative_epochs(spark):
    """q_join_range_bucketed's trunc-div bucket math (ADVICE r4 fix)
    must agree with the naive non-equi join even for PRE-1970
    timestamps, where trunc-toward-zero differs from floor: the
    monotone-step argument (both sides share the same div; an
    interval of length w spans <= 2 trunc buckets) is what this probe
    pins, far outside the testdata's positive range."""
    w_us = 1_000  # tiny window so the probe is dense around zero
    pts = list(range(-3_000, 3_001, 137))  # points straddling epoch 0
    ivs = list(range(-2_900, 2_901, 251))  # interval starts
    p = spark.createDataFrame([(t,) for t in pts], "tc long")
    i = spark.createDataFrame([(t,) for t in ivs], "t0 long")
    naive = (
        i.join(p, (F.col("tc") >= F.col("t0")) & (F.col("tc") < F.col("t0") + w_us))
        .groupBy("t0")
        .count()
    )
    pb = p.withColumn("bucket", F.expr(f"tc div {w_us}"))
    ib = i.select(
        "t0",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"t0 div {w_us}"),
                    F.expr(f"(t0 + {w_us}) div {w_us}"),
                )
            )
        ).alias("bucket"),
    )
    bucketed = (
        ib.join(pb, "bucket")
        .filter((F.col("tc") >= F.col("t0")) & (F.col("tc") < F.col("t0") + w_us))
        .groupBy("t0")
        .count()
    )
    got = {r["t0"]: r["count"] for r in bucketed.collect()}
    want = {r["t0"]: r["count"] for r in naive.collect()}
    assert got == want
    assert sum(want.values()) > 0  # the probe actually matched pairs


def test_anomaly_chunked_equals_plain_on_sparse_stream(spark):
    """The overlapping-window decomposition must be output-identical
    to the single window even when buckets hold FAR fewer rows than
    the 51-row frame - the regime where a row's 50 predecessors span
    many buckets and the carry map must replicate across all of them
    (dense testdata never exercises this; a naive 'carry the previous
    bucket's tail' implementation passes there and breaks here)."""
    import datetime

    from pyspark.sql import Window

    from pudatalake_spark.operators.analytics import anomaly_chunked

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    day = 0
    for i in range(240):
        # ragged spacing: bursts of 1-3 events, then multi-day gaps
        day += (i % 7 == 0) * (2 + i % 5)
        ts = t0 + datetime.timedelta(days=day, minutes=(i % 3) * 17)
        base = float((i * 37) % 23) - 11.0
        spike = 250.0 if i % 41 == 0 and i > 60 else 0.0
        rows.append((i, ts, "sparse", base + spike))
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )

    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, -1)
    )
    scored = e.select(
        "event_id",
        "event_type",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n_hist"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    plain = (
        scored.filter((F.col("n_hist") >= 30) & (F.col("sd") > 0) & (F.abs(z) > 3))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("z"),
        )
        .orderBy("event_id")
        .collect()
    )
    chunked = anomaly_chunked(e).collect()
    assert len(plain) > 0  # the fixture actually produces anomalies
    assert [tuple(r) for r in chunked] == [tuple(r) for r in plain]


def test_wap_publish_gates_on_audit(spark, tmp_path):
    """q_lake_wap_publish: the clean fixture batch publishes (all
    rules green, published=1 on every row), and the published copy
    equals staging row-for-row."""
    import pudatalake_spark.sources.ingest as ingest
    from pudatalake_spark import registry
    from tests.conftest import SF_DIR

    registry.load_all()
    rows = registry.QUERIES["q_lake_wap_publish"](spark, SF_DIR).collect()
    assert {r.rule for r in rows} == {
        "orderkey_unique_in_batch",
        "totalprice_positive",
        "custkey_fk_resolves",
        "published",
    }
    assert all(r.published == 1 for r in rows)
    assert all(r.n_violations == 0 for r in rows)
    staged = spark.read.parquet(ingest._scratch("lake", "wap_staging"))
    pub = spark.read.parquet(ingest._scratch("lake", "wap_published"))
    assert staged.count() == pub.count() == rows[0].n_checked


def test_jsonl_roundtrip_lossless(spark):
    from pudatalake_spark import registry

    registry.load_all()
    from tests.conftest import SF_DIR

    rows = registry.QUERIES["sink_jsonl_export"](spark, SF_DIR).collect()
    assert rows  # every lang partition present
    assert all(r.rows_ok and r.content_ok for r in rows)


def test_cross_corpus_is_cross_parity_subset(spark):
    """Every decontamination hit is an odd-id batch doc matched to an
    even-id reference at jaccard >= tau, and it appears in the full
    near-dup pair list (consistency with q_dedup_near_jaccard)."""
    from pudatalake_spark import registry
    from pudatalake_spark.llmops.dedup import JACCARD_TAU
    from tests.conftest import SF_DIR

    hits = registry.QUERIES["q_dedup_cross_corpus"](spark, SF_DIR).collect()
    pairs = {
        (min(r.doc1, r.doc2), max(r.doc1, r.doc2)): r.jaccard
        for r in registry.QUERIES["q_dedup_near_jaccard"](
            spark, SF_DIR
        ).collect()
    }
    assert hits
    seen_batch = set()
    for h in hits:
        assert h.batch_doc % 2 == 1 and h.ref_doc % 2 == 0
        assert h.jaccard >= JACCARD_TAU
        key = (min(h.batch_doc, h.ref_doc), max(h.batch_doc, h.ref_doc))
        assert pairs[key] == h.jaccard
        assert h.batch_doc not in seen_batch  # one best match per doc
        seen_batch.add(h.batch_doc)


def test_clone_shallow_isolation(spark):
    from pudatalake_spark import registry

    registry.load_all()
    from tests.conftest import SF_DIR

    rows = registry.QUERIES["q_lake_clone_shallow"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r.ok == 1 for r in rows)


def test_csv_malformed_modes(spark):
    from pudatalake_spark import registry

    registry.load_all()
    from tests.conftest import SF_DIR

    rows = {r.mode: r for r in registry.QUERIES["src_csv_malformed"](
        spark, SF_DIR).collect()}
    assert rows["PERMISSIVE"].n_rows == 153
    assert rows["PERMISSIVE"].n_flagged == 3
    assert rows["DROPMALFORMED"].n_rows == 150
    assert rows["DROPMALFORMED"].n_flagged == 3
    assert rows["FAILFAST"].n_flagged == 1  # the raise happened


def test_avro_roundtrip_pins_parquet_truth(spark, duck):
    """src_avro's value-proving aggregate must equal the SAME
    aggregate computed straight off the parquet source — count,
    exact-cent acctbal total, and distinct nations all survive the
    stdlib Avro encode → container → decode path (the src_xml
    pinning pattern; codec spec compliance itself is proven against
    org.apache.avro 1.12.1 in test_avro_codec.py)."""
    from pudatalake_spark import registry

    registry.load_all()
    from tests.conftest import SF_DIR

    want = duck.execute(
        f"""SELECT count(*), sum(CAST(round(c_acctbal*100) AS BIGINT)),
                   count(DISTINCT c_nationkey)
            FROM '{SF_DIR}/customer.parquet'"""
    ).fetchone()
    for key in ("src_avro", "src_avro_split"):
        got = registry.QUERIES[key](spark, SF_DIR).collect()[0]
        assert (got.n_rows, got.acctbal_cents, got.n_nations) == want, key


def test_deletion_vectors_equals_cow_delete(spark):
    """Merge-on-read DV result must equal the copy-on-write filtered
    rollup computed directly."""
    from pudatalake_spark import registry
    from pudatalake_spark.loaders import table
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    o = table(spark, SF_DIR, "orders")
    keep = F.expr(
        "((o_orderkey * 2654435761 + 1013904223) % 1000000007) % 13 <> 0"
    )
    ref = {
        r.status: (r.n_rows, r.total_cents)
        for r in o.filter(keep)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
        .collect()
    }
    rows = registry.QUERIES["q_lake_deletion_vectors"](
        spark, SF_DIR
    ).collect()
    assert {r.status: (r.n_rows, r.total_cents) for r in rows} == ref


def test_mixed_layout_prunes_new_branch(spark):
    """The partitioned branch of the mixed-layout read must carry
    PartitionFilters for the event_type predicate; the legacy branch
    cannot (it row-filters) - the asymmetry the operator documents."""
    from pudatalake_spark import registry
    from tests.conftest import SF_DIR

    df = registry.QUERIES["q_lake_mixed_layout"](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters:")[1][:200]


def test_freshness_marks_match_pandas(spark):
    import pandas as pd

    from pudatalake_spark import registry
    from tests.conftest import SF_DIR

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    rows = {r.tbl: r for r in registry.QUERIES["q_quality_freshness"](
        spark, SF_DIR).collect()}
    assert rows["events"].n_rows == len(e)
    assert rows["orders"].n_rows == len(o)
    assert all(r.within_sla == 1 for r in rows.values())
    # events carries the lake-wide max watermark -> staleness 0
    assert rows["events"].staleness_days == 0


def test_crypto_roundtrip_all_rows(spark):
    from pudatalake_spark import registry
    from tests.conftest import SF_DIR

    registry.load_all()
    rows = registry.QUERIES["q_fn_crypto"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_roundtrip_ok == r.n  # decrypt(encrypt(x)) == x
        assert r.ndv_cipher == r.ndv_plain  # ECB determinism
        assert r.ndv_sha == r.ndv_plain


def test_orphan_audit_classification(spark):
    from pudatalake_spark import registry
    from tests.conftest import SF_DIR

    registry.load_all()
    rows = {r.status: r for r in registry.QUERIES["q_lake_orphan_files"](
        spark, SF_DIR).collect()}
    assert rows["orphan"].n_files == 2          # exactly the planted pair
    assert rows["orphan"].total_bytes == 384
    assert rows["committed"].n_files >= 1
    assert "marker" in rows                      # _SUCCESS never vacuumed
