"""Set operations & deduplication (SURVEY §2.7).

UNION ALL is a zero-shuffle concatenation; UNION/INTERSECT/EXCEPT
dedup via a hash aggregate / join on all columns (one shuffle).
``dropDuplicates`` on a subset of columns keeps an ARBITRARY row per
key - nondeterministic under distribution - so the deterministic
formulation is a row_number()==1 window (SURVEY §2.7 note); exact
full-row dedup via distinct() is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..loaders import table
from ..registry import register


def _slice_high(ev: DataFrame) -> DataFrame:
    return ev.filter(F.col("value") > 90).select("user_id", "event_type")


def _slice_signup(ev: DataFrame) -> DataFrame:
    return ev.filter(F.col("event_type") == "signup").select("user_id", "event_type")


_SLICES_SQL = """
    SELECT user_id, event_type FROM events WHERE value > 90
    {op}
    SELECT user_id, event_type FROM events WHERE event_type = 'signup'
"""


@register("q_union_all", oracle=_SLICES_SQL.format(op="UNION ALL"))
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: preserves duplicates (overlapping slices included twice)."""
    ev = table(spark, sf_dir, "events")
    return _slice_high(ev).unionByName(_slice_signup(ev))


@register("q_union_distinct", oracle=_SLICES_SQL.format(op="UNION"))
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return _slice_high(ev).unionByName(_slice_signup(ev)).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both viewed and purchased (set semantics)."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return views.intersect(buys)


@register(
    "q_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersect: min(multiplicity) copies per user_id."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    return views.intersectAll(clicks)


@register(
    "q_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewers who never made a big (>90) purchase, set semantics.
    (The original viewers-minus-error-users pair was VACUOUS on this
    generator - every viewer also errors, so both engines agreed on
    an empty result and the EXCEPT path went unexercised; the probed
    predicate keeps 3+ rows at every SF.)"""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    big = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 90)
    ).select("user_id")
    return views.subtract(big)


@register(
    "q_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset except: multiplicity max(m1-m2, 0) copies per user_id."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    errs = ev.filter(F.col("event_type") == "error").select("user_id")
    return views.exceptAll(errs)


@register(
    "q_distinct_subset",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_distinct_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user: the deterministic dropDuplicates - a
    row_number()==1 window instead of arbitrary-row dropDuplicates."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )
