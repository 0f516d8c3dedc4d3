"""Aggregations (SURVEY §2.4): global, grouped, HAVING, distinct,
rollup/cube/grouping sets, collect, percentile, stats, conditional.

Scale notes (100 TB posture): Spark hash aggregation is automatically
two-phase (partial map-side combine -> shuffle on group keys -> final
merge), so these plans scale linearly in input and shuffle only the
per-group partials. High-cardinality groupBy keys (o_custkey) shuffle
more rows but AQE coalesces/splits partitions at runtime. Exact
COUNT(DISTINCT) triggers a two-level expand+agg; at 100 TB prefer
q_agg_approx_distinct (HLL, constant memory per group).

Floating aggregates are rounded to 4 dp on BOTH sides: distributed
reduction order differs from DuckDB's sequential scan, so raw sums
differ in the last ulp (SURVEY §5.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..loaders import cached, load, table
from ..registry import register
from ..functions.exact import avg_exact
from .ranks import global_order, ntile_expr

#: Flagship filter date (TPC-H Q1 style).
Q1_CUTOFF = "1998-09-02"


@register(
    "q_agg_global",
    oracle="""
    SELECT round(sum(l_quantity), 4)        AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
                 / (count(l_extendedprice) * 100.0) AS avg_price,
           round(min(l_extendedprice), 4)   AS min_price,
           round(max(l_extendedprice), 4)   AS max_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_revenue,
           count(*)                         AS n_rows
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        avg_exact("l_extendedprice").alias("avg_price"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("sum_revenue"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)      AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
               AS sum_charge,
           CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
                 / (count(l_quantity) * 100.0) AS avg_qty,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
                 / (count(l_extendedprice) * 100.0) AS avg_price,
           CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE)
                 / (count(l_discount) * 100.0) AS avg_disc,
           count(*)                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary - the flagship query (SURVEY §7.2).

    Scan -> pushed filter -> project -> partial hash agg -> shuffle(2
    keys, 6 groups) -> final agg. The shuffle carries 6 groups x 8
    aggregates regardless of input size: this plan is flat at 100 TB.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            avg_exact("l_quantity").alias("avg_qty"),
            avg_exact("l_extendedprice").alias("avg_price"),
            avg_exact("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "q_agg_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@register("q_agg_approx_distinct")  # approx -> rows-only check
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct: constant memory per group.

    The 100 TB path for distinct-cardinality; rsd=0.01. No oracle
    (approximation differs from DuckDB's HLL by design).
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT n_name, c_mktsegment,
           count(*) AS n_cust,
           round(sum(c_acctbal), 4) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with subtotal rows (NULL marks rolled-up levels; the
    grouping columns are never NULL in data, so NULL is unambiguous)."""
    t = load(spark, sf_dir)
    joined = t["customer"].join(
        F.broadcast(t["nation"]),
        t["customer"].c_nationkey == t["nation"].n_nationkey,
    )
    return joined.rollup("n_name", "c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT n_name, c_mktsegment,
           count(*) AS n_cust,
           CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
                 / (count(c_acctbal) * 100.0) AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY CUBE (n_name, c_mktsegment)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    joined = t["customer"].join(
        F.broadcast(t["nation"]),
        t["customer"].c_nationkey == t["nation"].n_nationkey,
    )
    return joined.cube("n_name", "c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        avg_exact("c_acctbal").alias("avg_bal"),
    )


_GROUPING_SETS_SQL = """
    SELECT n_name, c_mktsegment,
           count(*) AS n_cust,
           round(sum(c_acctbal), 4) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
"""


@register("q_agg_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (EP3: engine SQL == oracle SQL)."""
    load(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "q_agg_collect",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
               AS priorities,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set sorted for determinism (SURVEY §5.2 determinism rule),
    then array_join'd to a plain string: the driver's canonicalizer
    hashes scalar columns only (array cells crashed its pandas
    sort_values in r1 — VERDICT r1 Wrong #1), and a comma-joined
    sorted set carries identical information."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS median,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous-interpolation percentiles (matches
    quantile_cont): rank rows per group with a window, then each
    quantile is the weighted sum of the two rows straddling
    q*(n-1) - Tungsten sort + codegen'd conditional aggregate,
    measured 2.1x faster than the builtin percentile() aggregate
    (which buffers a value->count map per group and merges those
    maps single-threaded per group) at sf0.1, with bit-identical
    output.

    Exact percentile inherently shuffles every value to its group's
    reducer regardless of formulation; the 100 TB path is
    q_agg_approx_percentile (mergeable sketch, map-side combinable).
    """
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("v")
    ranked = (
        li.select("l_returnflag", F.col("l_extendedprice").alias("v"))
        .withColumn("rn", F.row_number().over(w) - 1)
    )
    counts = ranked.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    r = ranked.join(F.broadcast(counts), "l_returnflag")
    aggs = []
    for name, q in [("p25", 0.25), ("median", 0.5), ("p75", 0.75)]:
        pos = F.lit(q) * (F.col("n") - 1).cast("double")
        lo = F.floor(pos).cast("bigint")
        hi = F.ceil(pos).cast("bigint")
        frac = pos - F.floor(pos)
        contrib = (
            F.when((F.col("rn") == lo) & (lo == hi), F.col("v"))
            .when(F.col("rn") == lo, (F.lit(1.0) - frac) * F.col("v"))
            .when(F.col("rn") == hi, frac * F.col("v"))
        )
        aggs.append(F.round(F.sum(contrib), 4).alias(name))
    return r.groupBy("l_returnflag").agg(*aggs)


@register(
    "q_agg_stddev_corr",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4)         AS var_qty,
           round(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS cov_pq
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stddev_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("cov_pq"),
    )


@register(
    "q_agg_conditional",
    oracle="""
    SELECT l_linestatus,
           round(sum(l_extendedprice) FILTER (WHERE l_returnflag = 'A'), 4)
               AS returned_price,
           round(sum(l_extendedprice) FILTER (WHERE l_returnflag = 'N'), 4)
               AS kept_price,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregation as sum(when(cond, x)) (same NULL-skip
    semantics)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "A", F.col("l_extendedprice"))),
            4,
        ).alias("returned_price"),
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "N", F.col("l_extendedprice"))),
            4,
        ).alias("kept_price"),
        F.count(F.when(F.col("l_discount") > 0.05, True)).alias("n_discounted"),
    )


@register("q_agg_approx_percentile")  # sketch-valued -> rows-only check
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (p50/p95/p99 of extendedprice per
    returnflag) via Spark's GK-sketch approx_percentile at accuracy
    10000 - the 100 TB companion to q_agg_percentile: mergeable
    fixed-size sketches per partition instead of a full sort, so the
    shuffle carries sketches, not values. DuckDB's approx_quantile is
    a different sketch (t-digest), so this is declared rows-only; the
    exact variant q_agg_percentile carries the oracle parity."""
    li = table(spark, sf_dir, "lineitem")
    pcts = F.expr(
        "approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)"
    )
    # One scalar column per quantile: the driver canonicalizer can't
    # hash array cells (VERDICT r1 Wrong #2), and element_at on the
    # single sketch result costs nothing extra.
    return li.groupBy("l_returnflag").agg(
        F.element_at(pcts, 1).alias("p50"),
        F.element_at(pcts, 2).alias("p95"),
        F.element_at(pcts, 3).alias("p99"),
        F.count("*").alias("n"),
    )


HIST_BINS = 10
HIST_MAX = 600000.0  # fixture o_totalprice upper bound for fixed-width bins


@register(
    "q_agg_histogram",
    oracle=f"""
    SELECT least(CAST(floor(o_totalprice / ({HIST_MAX} / {HIST_BINS})) AS BIGINT),
                 {HIST_BINS - 1}) AS bin,
           count(*) AS n,
           round(min(o_totalprice), 4) AS lo,
           round(max(o_totalprice), 4) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (10 fixed bins, top bin
    open): one hash aggregate keyed on the bin expression - the
    distribution pass of a profiler. Fixed bin edges make the result
    a pure function of the data (a min/max-derived width would need
    the q_profile_table stats first; at 100 TB that two-pass variant
    reuses the profiler's one-row stats broadcast, same shape as
    sink_zorder_cluster's scaling)."""
    o = table(spark, sf_dir, "orders")
    width = HIST_MAX / HIST_BINS
    bin_col = F.least(
        F.floor(F.col("o_totalprice") / width).cast("bigint"),
        F.lit(HIST_BINS - 1),
    )
    return (
        o.groupBy(bin_col.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
    )


@register(
    "q_agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             row_number() OVER (PARTITION BY o_orderstatus
               ORDER BY count(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group MODE: most frequent order priority per
    order status, ties broken by the value itself. Spark 4 has F.mode
    but its tie choice is unspecified - count + row_number pins the
    answer so both engines agree on every input. Shape: one hash agg
    over (group, value) pairs (map-side combinable), then a window
    over the tiny aggregate - the raw rows are never sorted."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@register("q_agg_hll_sketch")  # approximate + binary intermediate -> rows-only
def q_agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via
    hll_sketch_agg): per-event-type distinct-user sketches, PLUS an
    '__ALL__' row whose estimate comes from hll_union_agg over the
    per-type sketches - NOT from re-scanning the raw data.

    This is the capability approx_count_distinct lacks: the sketch is
    a persistable, mergeable partial. At 100 TB you sketch each
    day/partition once, store bytes, and answer any
    union-of-partitions distinct query by merging sketches - no raw
    re-scan. The union row here proves merge correctness end-to-end
    (its estimate must land on the same distinct-user universe as a
    direct global sketch).

    Approximate by design (DataSketches HLL, lgConfigK=12 default) ->
    rows-only; the relative error bound at lgK=12 is ~1.6%, and
    tests/test_semantics.py pins the estimates against exact distinct
    counts at that tolerance.
    """
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    ).select(F.lit("__ALL__").alias("event_type"), "approx_users")
    return typed.unionByName(merged).orderBy("event_type")


@register("q_agg_hll_intersect")  # approximate -> rows-only
def q_agg_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA on top of q_agg_hll_sketch: estimate the
    distinct users who did BOTH click and purchase by
    inclusion-exclusion over mergeable HLL sketches -
    est(A) + est(B) - est(A u B) - where the union estimate comes
    from hll_union_agg, never a re-scan.

    This is the query shape sketch stores answer at 100 TB ("overlap
    of segment A and segment B across any partition set") from stored
    per-partition sketch bytes alone. Intersection via
    inclusion-exclusion inherits the absolute error of the three
    estimates, so it is honest only when the overlap is not tiny
    relative to the union - tests pin it against the exact overlap at
    a tolerance reflecting that; approximate by design -> rows-only.
    """
    e = table(spark, sf_dir, "events")
    sk = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    est = F.hll_sketch_estimate("sk")
    row = sk.agg(
        F.max(F.when(F.col("event_type") == "click", est)).alias("approx_click"),
        F.max(F.when(F.col("event_type") == "purchase", est)).alias(
            "approx_purchase"
        ),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_union"),
    )
    return row.select(
        "approx_click",
        "approx_purchase",
        (
            F.col("approx_click")
            + F.col("approx_purchase")
            - F.col("approx_union")
        ).alias("approx_both"),
    )


@register(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user count per event type via a roaring-style
    integer bitmap: word = user_id div 64, bit = 1 << (user_id mod
    64); bit_or per (type, word), then sum(bit_count) per type.

    This is the third point on the distinct-count design line next to
    q_agg_count_distinct (exact, one dedup shuffle of raw keys) and
    q_agg_hll_sketch (approximate, mergeable): for BOUNDED-INTEGER key
    domains the bitmap is exact AND mergeable. Both aggregation levels
    are associative/commutative, so partial aggregation collapses each
    map partition to <= |types| x |id-range|/64 words before the
    shuffle, the merged words are re-mergeable across partition sets
    (store them per day, OR them per month - the sketch-store pattern
    with zero error), and the shuffle carries 64 ids per bigint vs one
    id per row for count(DISTINCT). The oracle checks exactness
    against the real COUNT(DISTINCT) - no tolerance.
    """
    e = table(spark, sf_dir, "events")
    words = (
        e.select(
            "event_type",
            F.expr("user_id div 64").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_users")
    )


@register(
    "q_agg_weighted",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
             AS w_avg_price,
           round(sum(l_quantity * l_discount) / sum(l_quantity), 6)
             AS w_avg_discount,
           CAST(sum(l_quantity) AS DOUBLE) AS total_weight
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted averages (quantity-weighted price and discount per
    return flag) - the form every unit-mix-corrected metric takes.
    Expressed as ratios of plain SUMs, so the whole thing is one
    two-phase codegen'd hash agg (no UDAF, no window); both engines
    compute identical double sums in scan order up to the 6-dp round.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity"),
            6,
        ).alias("w_avg_price"),
        F.round(
            F.sum(F.col("l_quantity") * F.col("l_discount"))
            / F.sum("l_quantity"),
            6,
        ).alias("w_avg_discount"),
        F.sum("l_quantity").cast("double").alias("total_weight"),
    )


@register(
    "q_agg_argmax",
    oracle="""
    WITH keyed AS (
      SELECT user_id, event_type, value,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
      FROM events
    )
    SELECT user_id,
           arg_max(event_type, ord_key) AS last_type,
           round(arg_max(value, ord_key), 4) AS last_value,
           arg_min(event_type, ord_key) AS first_type,
           round(arg_min(value, ord_key), 4) AS first_value
    FROM keyed
    GROUP BY user_id
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max aggregates: each user's FIRST and LAST event (type and
    value) in one hash aggregate via max_by/min_by - the agg-native
    alternative to a row_number window for latest-row-per-key (no
    sort, map-side combinable, the same partial/final shape as any
    min/max).

    Determinism hazard pinned here: max_by with a non-unique ordering
    key is engine-arbitrary on ties (and DuckDB 1.0's arg_max cannot
    take a struct key), so the ordering key is a zero-padded
    fixed-width string of (epoch_us, event_id) - lexicographic order
    == numeric order, unique per row, identical in both engines.
    """
    e = table(spark, sf_dir, "events")
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    k = e.select("user_id", "event_type", "value", key.alias("ord_key"))
    return k.groupBy("user_id").agg(
        F.max_by("event_type", F.col("ord_key")).alias("last_type"),
        F.round(F.max_by("value", F.col("ord_key")), 4).alias("last_value"),
        F.min_by("event_type", F.col("ord_key")).alias("first_type"),
        F.round(F.min_by("value", F.col("ord_key")), 4).alias("first_value"),
    )


@register("q_agg_approx_topk")  # sketch-valued -> rows-only + pinned test
def q_agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters via Spark 4's approx_top_k (a
    mergeable frequent-items sketch: per-partition summaries merge
    associatively, like the HLL family): top-10 suppliers by line
    count, flattened to (rank, supplier, cnt) rows.

    Rows-only by design (sketch semantics: counts can undercount once
    cardinality exceeds the tracked capacity and tie order at the
    boundary is unspecified). On THIS schema |suppliers| = 100 <<
    maxItemsTracked = 10000, so every count is exact - pinned against
    the exact groupBy top-10 in tests/test_pipeline_props.py; at true
    scale the same call degrades gracefully to approximate instead of
    shuffling the full distinct-key space.

    Scale shape: ONE pass, map-side sketch build, single merged
    summary on the reducer - no (key, count) shuffle of the full key
    space, which is the point of a sketch at 100 TB key
    cardinalities.
    """
    li = table(spark, sf_dir, "lineitem")
    topk = li.agg(
        F.expr("approx_top_k(l_suppkey, 10, 10000)").alias("tk")
    )
    return topk.select(
        F.posexplode("tk").alias("rank0", "entry")
    ).select(
        (F.col("rank0") + 1).cast("bigint").alias("rank"),
        F.col("entry.item").cast("bigint").alias("supplier"),
        F.col("entry.count").cast("bigint").alias("cnt"),
    )


@register(
    "q_agg_moments",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_quantity), 4) AS s1,
               round(sum(l_quantity * l_quantity), 4) AS s2,
               round(sum(l_quantity * l_quantity * l_quantity), 4) AS s3,
               round(sum(l_quantity * l_quantity * l_quantity * l_quantity),
                     4) AS s4
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           s1 / n AS mean,
           round((s2 / n - (s1 / n) * (s1 / n)), 6) AS var_pop,
           round((s3 / n - 3 * (s1 / n) * s2 / n
                   + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
           round((s4 / n - 4 * (s1 / n) * s3 / n
                   + 6 * (s1 / n) * (s1 / n) * s2 / n
                   - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 6)
               AS excess_kurtosis
    FROM s
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape profiling: population skewness and excess
    kurtosis per group from RAW POWER SUMS (Σx..Σx⁴) - the one-pass,
    map-side-combinable moments formulation. The builtin skewness()/
    kurtosis() are NOT used on purpose: Spark and DuckDB disagree on
    sample-vs-population conventions, while four rounded power sums
    plus identical downstream arithmetic are engine-independent (the
    same trick as q_events_ab_welch's variance).

    Scale shape: one two-phase hash agg carrying 5 numbers per
    group; the central-moment expansion runs on the tiny grouped
    frame. Catastrophic-cancellation caveat: raw power sums lose
    precision when |mean| >> stddev - fine for bounded quantities
    like these (1..50); for ill-conditioned columns, center on a
    first-pass approximate mean before the power sums.
    """
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum(q), 4).alias("s1"),
        F.round(F.sum(q * q), 4).alias("s2"),
        F.round(F.sum(q * q * q), 4).alias("s3"),
        F.round(F.sum(q * q * q * q), 4).alias("s4"),
    )
    m = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - m * m
    m3 = F.col("s3") / F.col("n") - 3 * m * F.col("s2") / F.col("n") + 2 * m * m * m
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * m * F.col("s3") / F.col("n")
        + 6 * m * m * F.col("s2") / F.col("n")
        - 3 * m * m * m * m
    )
    return s.select(
        "l_returnflag",
        "n",
        m.alias("mean"),
        F.round(m2, 6).alias("var_pop"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / F.pow(m2, 2) - 3, 6).alias("excess_kurtosis"),
    )


@register(
    "q_agg_listagg",
    oracle="""
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE user_id < 20
    GROUP BY user_id
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard ordered string aggregation: Spark 4's
    listagg ... WITHIN GROUP (ORDER BY ts, event_id) assembles each
    user's full event path in event-time order - the DECLARATIVE
    form of what q_events_session_path builds manually via
    array_sort(collect_list(struct)). The WITHIN GROUP ordering
    with the unique event_id tie-break makes the string a pure
    function of the data (the determinism rule), and DuckDB's
    string_agg(... ORDER BY) states the same contract.

    Scale shape: ordered aggregation buffers per-group values for
    the sort - fine for bounded per-user event counts; for unbounded
    groups, pre-truncate (e.g. first-K events by window) before the
    agg. One shuffle on user_id either way.
    """
    load(spark, sf_dir)  # registers the events temp view
    return spark.sql("""
        SELECT user_id,
               listagg(event_type, '>')
                   WITHIN GROUP (ORDER BY ts, event_id) AS path,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        WHERE user_id < 20
        GROUP BY user_id
    """)


# Count-Min sketch geometry: d independent rows x w counters. The
# hash family is affine over the bigint key modulo a Mersenne prime -
# pure integer arithmetic, so the SAME sketch (and therefore the
# SAME estimates) is computable in ANSI SQL and the operator keeps a
# full value oracle, unlike the opaque-library sketches (hll/topk).
CMS_W = 64
CMS_D = 4
_CMS_P = 2147483647  # 2^31 - 1
_CMS_A = (1299709, 2750159, 4256233, 5800079)
_CMS_B = (15485863, 32452843, 49979687, 67867967)


def _cms_slot_sql(d: int, key: str) -> str:
    return (
        f"(({_CMS_A[d]} * {key} + {_CMS_B[d]}) % {_CMS_P}) % {CMS_W}"
    )


@register(
    "q_agg_countmin",
    oracle=f"""
    WITH ds AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(d)),
    cells AS (
      SELECT d,
             CASE d
               WHEN 0 THEN {_cms_slot_sql(0, "user_id")}
               WHEN 1 THEN {_cms_slot_sql(1, "user_id")}
               WHEN 2 THEN {_cms_slot_sql(2, "user_id")}
               ELSE {_cms_slot_sql(3, "user_id")} END AS slot,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events CROSS JOIN ds
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
      FROM events GROUP BY user_id
      ORDER BY exact_n DESC, user_id LIMIT 5
    )
    SELECT p.user_id, p.exact_n, min(c.cnt) AS est_n
    FROM probes p
    JOIN cells c
      ON c.slot = CASE c.d
             WHEN 0 THEN {_cms_slot_sql(0, "p.user_id")}
             WHEN 1 THEN {_cms_slot_sql(1, "p.user_id")}
             WHEN 2 THEN {_cms_slot_sql(2, "p.user_id")}
             WHEN 3 THEN {_cms_slot_sql(3, "p.user_id")} END
    GROUP BY p.user_id, p.exact_n
    """,
)
def q_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH point estimation: build a d=4 x w=64 CMS of
    per-user event counts, then estimate the 5 true-heaviest users
    and report exact vs estimate (est >= exact always; the one-sided
    CMS error). The hash family is affine mod a Mersenne prime -
    deterministic integer arithmetic both engines reproduce exactly,
    which is what keeps this sketch FULLY oracled where the opaque
    datasketches aggs (q_agg_hll_sketch, q_agg_approx_topk) are
    rows-only by design.

    Scale shape: the sketch build is ONE map-side-combinable agg with
    a hard 256-cell output regardless of input size - the textbook
    mergeable-summary shape (partials merge by cell addition, so a
    1000-executor build shuffles 256 rows per partition, not keys).
    The probe side is a 5-row broadcast. At 100 TB the sketch replaces
    any exact count over an unbounded keyspace where one-sided
    overestimates are acceptable; width trades error (e/w per row)
    for memory.
    """
    e = table(spark, sf_dir, "events").select("user_id")

    def slot(d: int, key):
        return (
            (F.lit(_CMS_A[d]) * key + F.lit(_CMS_B[d])) % _CMS_P
        ) % CMS_W

    cells = (
        e.select(
            F.posexplode(
                F.array(*[slot(d, F.col("user_id")) for d in range(CMS_D)])
            ).alias("d", "slot")
        )
        .groupBy("d", "slot")
        .agg(F.count("*").alias("cnt"))
    )
    probes = (
        e.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(5)
    )
    probe_slots = probes.select(
        "user_id",
        "exact_n",
        F.posexplode(
            F.array(*[slot(d, F.col("user_id")) for d in range(CMS_D)])
        ).alias("d", "slot"),
    )
    return (
        cells.join(F.broadcast(probe_slots), ["d", "slot"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_sql_pair(a: str, b: str) -> str:
    """Pearson r from the five raw sums - the one-pass identity,
    written out so BOTH engines evaluate the identical expression
    (library corr() implementations differ (Welford vs naive) in
    float detail; explicit sums make the oracle exact)."""
    return f"""
      SELECT '{a}' AS col_a, '{b}' AS col_b,
             round((n * s_{a}_{b} - s_{a} * s_{b})
                   / (sqrt(n * s_{a}_{a} - s_{a} * s_{a})
                      * sqrt(n * s_{b}_{b} - s_{b} * s_{b})), 4) AS r
      FROM sums"""


@register(
    "q_agg_corr_matrix",
    oracle=(
        "WITH sums AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        + ", ".join(
            f"sum({a}) AS s_{a}" for a in _CORR_COLS
        )
        + ", "
        + ", ".join(
            f"sum({a} * {b}) AS s_{a}_{b}"
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i:]
        )
        + " FROM lineitem)\n"
        + "\nUNION ALL".join(
            _corr_sql_pair(a, b)
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i + 1:]
        )
    ),
)
def q_agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise PEARSON CORRELATION matrix over lineitem's four
    numeric measures (quantity, extendedprice, discount, tax) - the
    feature-screening pass before any modeling step, emitted as the
    6-row upper triangle. Correlations come from the one-pass
    five-sums identity, NOT library corr(): Welford-style streaming
    implementations differ across engines in float detail, while
    explicit sums make both sides evaluate the same IEEE expression.

    Scale shape: ONE full-scan aggregate computes all 15 sums
    map-side-combinably (a single 1-row reduce regardless of input
    size); the 6 pair rows are then an EXPLODE of an
    array-of-structs projection on that single aggregate row (the
    q_events_kpi_tree factor-explode rewrite, applied r7 after the
    r6 audit caught the previous union-of-selects re-running the
    full-scan agg 6x) - the covariance matrix for p columns needs
    one pass and O(p^2) accumulators, never p^2 scans.
    """
    li = table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").cast("double").alias("n")]
    aggs += [F.sum(a).alias(f"s_{a}") for a in _CORR_COLS]
    aggs += [
        F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}")
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i:]
    ]
    sums = li.agg(*aggs)

    def r_expr(a: str, b: str):
        n = F.col("n")
        num = n * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        da = F.sqrt(n * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
        db = F.sqrt(n * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        return F.round(num / (da * db), 4)

    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    ]
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                r_expr(a, b).alias("r"),
            )
            for a, b in pairs
        ]
    )
    return sums.select(F.explode(pair_structs).alias("p")).select(
        "p.col_a", "p.col_b", "p.r"
    )


EQUIDEPTH_BUCKETS = 8


@register(
    "q_agg_quantile_bands",
    oracle=f"""
    WITH b AS (
      SELECT o_totalprice,
             ntile({EQUIDEPTH_BUCKETS}) OVER (
               ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(min(o_totalprice), 4) AS lo,
           round(max(o_totalprice), 4) AS hi,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS DOUBLE) / 100.0 AS band_total
    FROM b
    GROUP BY bucket
    """,
)
def q_agg_quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram of order value: ntile-8 bands with their
    boundaries and revenue mass - the feature-binning / fairness-
    banding complement to q_agg_histogram's equi-WIDTH buckets
    (equi-width starves the tail; equi-depth gives every band equal
    support). Ties broken by o_orderkey so the band assignment is a
    pure function of the data.

    Scale shape: ntile needs a total order, but NOT a global window
    (Window.orderBy with no partition spec = Exchange SinglePartition
    = one task sorts everything - the r6 audit finding). Instead the
    shared bucketed two-pass rank (operators/ranks.py) computes the
    global row_number in parallel (equi-depth buckets -> local sort
    per bucket -> broadcast prefix offsets) and the ntile band is
    closed-form arithmetic on (rank, N) - bit-identical to the
    window ntile in both engines. Everything after is a
    |buckets|-row two-phase agg.
    """
    o = table(spark, sf_dir, "orders")
    r = global_order(
        o.select("o_totalprice", "o_orderkey"),
        "o_totalprice",
        [F.col("o_totalprice"), F.col("o_orderkey")],
        rank_name="_i",
        total_name="_n",
    )
    b = r.select(
        "o_totalprice",
        ntile_expr(F.col("_i"), F.col("_n"), EQUIDEPTH_BUCKETS)
        .cast("bigint")
        .alias("bucket"),
    )
    # band_total accumulates exact int64 CENTS (a double sum at 1e9+
    # scale is not reproducible to 4dp across reduction orders - the
    # old single-partition plan masked this by summing in sorted
    # order; functions/exact.py rule).
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_orders"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
        (
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).cast("double")
            / 100.0
        ).alias("band_total"),
    )


@register(
    "q_agg_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, round(sum(o_totalprice), 4) AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i
      FROM spend
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
             sum(i * x) AS six
      FROM ranked
    )
    SELECT n AS n_customers,
           round(sx, 4) AS total_spend,
           round(2.0 * six / (n * sx) - (n + 1.0) / n, 6) AS gini
    FROM s
    """,
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of customer-spend concentration via the
    rank formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over
    ascending-sorted spend - the one-number inequality gauge behind
    whale-dependence and revenue-concentration monitoring (0 =
    uniform, ->1 = one customer is the business).

    Scale shape: per-customer spend is a combinable agg; the global
    rank of |customers| rows comes from the shared bucketed two-pass
    rank (operators/ranks.py - equi-depth buckets, per-bucket local
    sort, broadcast prefix offsets), NOT an unpartitioned window
    (which would be a SinglePartition single-task sort - the r6
    audit finding); the final statistic is three sums on the ranked
    frame collapsed to a 1-row result. Ranks tie-break on custkey,
    and i*x products are summed from 4dp-rounded spends - the 6dp
    final round absorbs ordering ULPs.
    """
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 4).alias("x")
    )
    ranked = global_order(
        spend,
        "x",
        [F.col("x"), F.col("o_custkey")],
        rank_name="i",
    ).select("x", "i")
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("sx"), 4).alias("total_spend"),
        F.round(
            F.lit(2.0) * F.col("six") / (F.col("n") * F.col("sx"))
            - (F.col("n") + F.lit(1.0)) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "q_agg_any_all",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           bool_and(c_acctbal > 0) AS all_positive,
           bool_or(c_acctbal > 9000) AS any_whale,
           CAST(count(*) FILTER (WHERE c_acctbal < 0) AS BIGINT)
               AS n_negative
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_agg_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean quantifier aggregates per segment: every(...) /
    some(...) - 'does EVERY customer have positive balance, does ANY
    exceed 9000?' - the assertion-style rollup data-quality rules
    compile to (bool_and/bool_or in DuckDB, every/some/bool_and in
    Spark - same two-phase combinable semantics).

    Scale shape: booleans partial-aggregate map-side exactly like
    sums (AND/OR are associative+commutative), so the shuffle moves
    one pair of booleans per group per partition.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.every(F.col("c_acctbal") > 0).alias("all_positive"),
            F.some(F.col("c_acctbal") > 9000).alias("any_whale"),
            F.count(F.when(F.col("c_acctbal") < 0, 1))
            .cast("bigint")
            .alias("n_negative"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_agg_weighted_percentile",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             l_extendedprice AS v,
             CAST(round(l_quantity, 0) AS BIGINT) AS wt
      FROM lineitem
    ),
    per_v AS (
      SELECT l_returnflag, v, CAST(sum(wt) AS BIGINT) AS wt
      FROM w GROUP BY l_returnflag, v
    ),
    cum AS (
      SELECT l_returnflag, v, wt,
             CAST(sum(wt) OVER (PARTITION BY l_returnflag ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cw,
             CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
      FROM per_v
    )
    SELECT l_returnflag, any_value(tw) AS total_weight,
           min(v) FILTER (WHERE 2 * cw >= tw) AS weighted_median,
           min(v) FILTER (WHERE 10 * cw >= 9 * tw) AS weighted_p90
    FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED percentiles: median and p90 of line-item price
    weighted by quantity per return flag - 'the price at which half
    the UNITS (not half the rows) ship', the volume-weighted
    distribution read (q_agg_percentile's rows-weighted sibling).
    The selector is the lower weighted percentile: the smallest
    value whose cumulative weight reaches the target fraction,
    expressed as the cross-multiplied integer inequality
    2*cw >= tw (no division, no floats anywhere - quantities round
    to exact integer weights).

    Scale shape: collapse to one row per DISTINCT (flag, value)
    with summed weights (two-phase agg), ONE ordered cumulative
    pass per flag, then a conditional-min agg - the KS/Mann-Whitney
    ordered-pass discipline applied to a weighted quantile.
    """
    li = table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("wt"),
    )
    per_v = w.groupBy("l_returnflag", "v").agg(
        F.sum("wt").cast("bigint").alias("wt")
    )
    win = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = per_v.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(win).cast("bigint").alias("cw"),
        F.sum("wt").over(wall).cast("bigint").alias("tw"),
    )
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.any_value(F.col("tw")).alias("total_weight"),
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v"))).alias(
                "weighted_median"
            ),
            F.min(
                F.when(10 * F.col("cw") >= 9 * F.col("tw"), F.col("v"))
            ).alias("weighted_p90"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_agg_theil",
    oracle="""
    WITH x AS (
      SELECT n.n_name AS nation, c.c_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(cents) AS BIGINT) AS x_g
      FROM x GROUP BY nation
    ),
    t AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(x_g) AS BIGINT) AS xx
      FROM g
    ),
    tw AS (
      SELECT x.nation,
             sum((CAST(x.cents AS DOUBLE) / g.x_g)
                 * ln(g.n_g * (CAST(x.cents AS DOUBLE) / g.x_g)))
                 AS t_within
      FROM x JOIN g ON x.nation = g.nation
      GROUP BY x.nation
    ),
    tt AS (
      SELECT sum((CAST(x.cents AS DOUBLE) / t.xx)
                 * ln(t.n * (CAST(x.cents AS DOUBLE) / t.xx)))
                 AS t_total
      FROM x CROSS JOIN t
    ),
    tb AS (
      SELECT sum((CAST(g.x_g AS DOUBLE) / t.xx)
                 * ln((CAST(g.x_g AS DOUBLE) / t.xx)
                      / (CAST(g.n_g AS DOUBLE) / t.n))) AS t_between
      FROM g CROSS JOIN t
    )
    SELECT g.nation, g.n_g AS n_customers,
           CAST(g.x_g AS DOUBLE) / t.xx AS revenue_share,
           round(tw.t_within, 6) AS t_within,
           round(tb.t_between, 6) AS t_between,
           round(tt.t_total, 6) AS t_total
    FROM g JOIN tw ON g.nation = tw.nation
    CROSS JOIN t CROSS JOIN tb CROSS JOIN tt
    ORDER BY g.nation
    """,
)
def q_agg_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer revenue with the
    within/between-nation decomposition: T_total = T_between +
    sum_g share_g * T_within_g - the additive-decomposable
    inequality measure (Gini, q_agg_gini, famously is NOT), i.e.
    the only standard answer to "how much revenue concentration
    lives INSIDE markets vs BETWEEN them". Per-nation rows carry
    n, revenue share and T_within; T_between / T_total broadcast.

    Float protocol: per-customer cents and all group sums are exact
    int64; every share is ONE integer division and each ln term is
    the identical tree in both engines; the ln-term SUMS (per
    group, 25-group, global) are the group-sum-order surface,
    rounded 6dp (PSI rule). The decomposition identity is pinned in
    tests (t_between + sum share*t_within == t_total to 1e-6).

    Scale shape: one fact->customer two-phase agg (the only big
    shuffle), 25-row group frame, 1-row totals broadcast back onto
    the customer frame for the two ln-sum passes - both map-side
    combinable. 100 TB: identical.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    x = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                n.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            "c_nationkey",
        )
        .groupBy("nation", "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    # x feeds three ln-sum passes (group, global, decomposition):
    # cache the per-customer frame so the orders join+agg runs once
    # (the un-cached diamond re-scanned the fact join 24 times,
    # caught by the plan survey).
    x = cached(x)
    g = x.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("cents").cast("bigint").alias("x_g"),
    )
    t = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("x_g").cast("bigint").alias("xx"),
    )
    share_w = F.col("cents").cast("double") / F.col("x_g")
    tw = (
        x.join(F.broadcast(g), "nation")
        .groupBy("nation")
        .agg(
            F.sum(share_w * F.log(F.col("n_g") * share_w)).alias(
                "t_within"
            )
        )
    )
    share_t = F.col("cents").cast("double") / F.col("xx")
    tt = (
        x.crossJoin(F.broadcast(t))
        .agg(
            F.sum(share_t * F.log(F.col("n") * share_t)).alias("t_total")
        )
    )
    share_g = F.col("x_g").cast("double") / F.col("xx")
    pop_g = F.col("n_g").cast("double") / F.col("n")
    tb = (
        g.crossJoin(F.broadcast(t))
        .agg(F.sum(share_g * F.log(share_g / pop_g)).alias("t_between"))
    )
    return (
        g.join(tw, "nation")
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(tt))
        .select(
            "nation",
            F.col("n_g").alias("n_customers"),
            (F.col("x_g").cast("double") / F.col("xx")).alias(
                "revenue_share"
            ),
            F.round("t_within", 6).alias("t_within"),
            F.round("t_between", 6).alias("t_between"),
            F.round("t_total", 6).alias("t_total"),
        )
        .orderBy("nation")
    )


SKETCH_ERR_QS = (0.1, 0.5, 0.9, 0.99)
SKETCH_ERR_ACC = 1000  # percentile_approx accuracy parameter


@register("q_stats_sketch_error")  # measures an engine sketch -> rows-only
def q_stats_sketch_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-error measurement: percentile_approx (Spark's
    KLL-style quantile sketch at accuracy 1000) evaluated against
    the EXACT rank-picked quantiles of order value at p10/p50/p90/
    p99, reporting absolute and RANK error per quantile - the
    q_sim_recall_eval discipline applied to the approx-aggregate
    family (an approximation you have not measured is a guess;
    the guarantee is on RANK error <= 1/accuracy, which is what
    the bound column checks).

    Rows-only BY DESIGN: the sketch is engine-specific (DuckDB has
    no bit-identical twin); the EXACT side is independently
    computed in-plan and the error bound is asserted in the pinned
    test.

    Scale shape: the exact side is one rank window (the DKW/
    winsorized pick); the sketch side is ONE mergeable two-phase
    agg - the 100 TB path, which is exactly why its error needs
    measuring before it replaces exact ranks at scale.
    """
    o = table(spark, sf_dir, "orders")
    v = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
        F.col("o_orderkey").alias("k"),
    )
    # Distributed rank (r7): bucketed two-pass row_number instead of
    # an unpartitioned window over the fact frame (r6 audit finding).
    r = global_order(
        v, "cents", [F.col("cents"), F.col("k")],
        rank_name="rn", total_name="n",
    ).select("cents", "rn", "n")
    qs = spark.createDataFrame(
        [(q,) for q in SKETCH_ERR_QS], "q double"
    )
    exact = (
        r.crossJoin(F.broadcast(qs))
        .filter(
            F.col("rn")
            == F.greatest(
                F.lit(1),
                F.ceil(F.col("q") * F.col("n")).cast("long"),
            )
        )
        .select(
            "q", F.col("cents").alias("exact_cents"), "n",
            F.col("rn").alias("exact_rank"),
        )
    )
    approx = o.agg(
        F.percentile_approx(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint"),
            list(SKETCH_ERR_QS),
            SKETCH_ERR_ACC,
        ).alias("apx")
    ).select(
        F.posexplode("apx").alias("i", "approx_cents")
    ).join(
        F.broadcast(
            spark.createDataFrame(
                [(i, q) for i, q in enumerate(SKETCH_ERR_QS)],
                "i int, q double",
            )
        ),
        "i",
    )
    # rank of the sketch's answer within the exact order statistics -
    # the 4-row sketch side is BROADCAST into the non-equi probe
    # (without the hint Spark planned a CartesianProduct here; caught
    # by the r7 global plan scan).
    apx_rank = (
        r.join(F.broadcast(approx), F.col("cents") <= F.col("approx_cents"))
        .groupBy("q", "approx_cents")
        .agg(F.max("rn").cast("bigint").alias("approx_rank"))
    )
    return (
        exact.join(apx_rank, "q")
        .select(
            "q",
            "n",
            "exact_cents",
            "approx_cents",
            (F.col("approx_cents") - F.col("exact_cents")).alias(
                "abs_err_cents"
            ),
            (
                F.abs(F.col("approx_rank") - F.col("exact_rank")).cast(
                    "double"
                )
                / F.col("n")
            ).alias("rank_err"),
        )
        .orderBy("q")
    )


@register("q_agg_hll_cumulative")  # engine sketch -> rows-only + bound pin
def q_agg_hll_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day via MERGEABLE HLL sketch
    algebra - hll_sketch_agg per day once, then a running
    hll_union_agg window over the daily sketches - next to the
    EXACT cumulative distinct (min-first-day trick: a user counts
    from their first active day onward), with the per-day relative
    error. This is THE sketch-algebra shape that makes 100 TB
    growth dashboards possible: the fact table is scanned ONCE, and
    every prefix's cardinality comes from merging <= |days| tiny
    sketches - where the exact form must either rescan per prefix
    or carry a distinct-union state that grows with users.

    Rows-only BY DESIGN (HLL binary sketches are engine-specific);
    the exact side is computed in-plan and the pinned test bounds
    the relative error by the sketch's standard-error envelope.

    Scale shape: one fact scan -> per-day sketch agg (map-side
    combinable, sketches are KB); the running union is a window
    over the |days|-row sketch frame. Exact side: per-user min-day
    agg -> day counts -> running sum - also one scan, but its
    shuffle carries every user id; the sketch frame carries none.
    """
    e = table(spark, sf_dir, "events")
    day = F.datediff(
        F.to_date("ts"), F.lit("1970-01-01").cast("date")
    ).alias("ed")
    sketches = e.groupBy(day).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    w = Window.orderBy("ed").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # The running union is hll_union_agg AS A WINDOW FUNCTION; the
    # estimate applies OUTSIDE the window (expr-level SQL because
    # Column.over would wrap the outer estimate call instead).
    approx = sketches.select(
        "ed",
        F.expr(
            "CAST(hll_sketch_estimate(hll_union_agg(sk) OVER "
            "(ORDER BY ed ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW)) AS BIGINT)"
        ).alias("approx_cum"),
    )
    first_day = e.groupBy("user_id").agg(
        F.min(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        ).alias("fd")
    )
    new_users = first_day.groupBy(F.col("fd").alias("ed")).agg(
        F.count("*").alias("new_users")
    )
    # every observed day gets a row (days with no NEW users still
    # advance the curve with +0) - left join from the day frame.
    exact = (
        sketches.select("ed")
        .join(new_users, "ed", "left")
        .select(
            "ed",
            F.sum(F.coalesce("new_users", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("exact_cum"),
        )
    )
    return (
        approx.join(exact, "ed")
        .select(
            F.col("ed").cast("bigint").alias("epoch_day"),
            "exact_cum",
            "approx_cum",
            (
                F.abs(F.col("approx_cum") - F.col("exact_cum")).cast(
                    "double"
                )
                / F.col("exact_cum")
            ).alias("rel_err"),
        )
        .orderBy("epoch_day")
    )


LORENZ_DECILES = 10


@register(
    "q_agg_lorenz_curve",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS xc
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT xc,
             row_number() OVER (ORDER BY xc, o_custkey) AS i,
             CAST(sum(xc) OVER (ORDER BY xc, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumx,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(sum(xc) OVER () AS BIGINT) AS total
      FROM spend
    ),
    ds AS (SELECT CAST(d AS BIGINT) AS d
           FROM generate_series(1, {LORENZ_DECILES}) AS t(d))
    SELECT ds.d AS decile,
           CAST(ranked.i AS BIGINT) AS cum_customers,
           round(CAST(ranked.i AS DOUBLE) / ranked.n, 6) AS pop_share,
           round(CAST(ranked.cumx AS DOUBLE) / ranked.total, 6)
               AS spend_share
    FROM ds JOIN ranked
      ON ranked.i = (ds.d * ranked.n + {LORENZ_DECILES} - 1)
               // {LORENZ_DECILES}
    ORDER BY ds.d
    """,
)
def q_agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE of customer-spend concentration at decile
    points: after ranking customers by ascending spend, the d-th
    point pairs the bottom-d/10 population share with its
    cumulative spend share - the curve whose doubled area-to-
    diagonal IS q_agg_gini's number, and the picture an equity /
    whale-dependence review actually reads ("the bottom 50% of
    customers carry 19% of revenue").

    Exactness: per-customer spend accumulates exact int64 CENTS
    (per-row cents summed - never a rounded double sum); rank and
    cumulative-spend come from ONE bucketed two-pass pass
    (operators/ranks.py: row_number + running sum share the same
    bucket offsets); decile rows are integer rank picks
    ceil(d*n/10); the two shares are single IEEE divisions behind
    6dp rounds.

    Scale shape: combinable spend agg -> one distributed
    rank+cumsum (no unpartitioned window - the r6 audit rule) ->
    10 picked rows against the broadcast decile spine. 100 TB:
    identical.
    """
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).cast("bigint").alias("xc")
    )
    r = global_order(
        spend, "xc", [F.col("xc"), F.col("o_custkey")],
        rank_name="i", cumsum={"xc": "cumx"}, total_name="n",
    )
    tot = spend.agg(F.sum("xc").cast("bigint").alias("total"))
    ds = spark.range(1, LORENZ_DECILES + 1).select(
        F.col("id").cast("bigint").alias("decile")
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(ds),
            F.col("i")
            == F.expr(
                f"(decile * n + {LORENZ_DECILES - 1}) div {LORENZ_DECILES}"
            ),
        )
        .select(
            "decile",
            F.col("i").cast("bigint").alias("cum_customers"),
            F.round(F.col("i").cast("double") / F.col("n"), 6).alias(
                "pop_share"
            ),
            F.round(
                F.col("cumx").cast("double") / F.col("total"), 6
            ).alias("spend_share"),
        )
        .orderBy("decile")
    )
