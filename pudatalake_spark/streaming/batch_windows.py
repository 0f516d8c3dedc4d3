"""Time-window analytics over the event stream, batch formulation
(SURVEY §2.9): tumbling, sliding, session windows + session stats.

Each query's semantics equal the final state of the corresponding
Structured Streaming query in streams.py (asserted by
tests/test_streaming.py) - this is what makes them oracle-checkable.

Dialect alignment: window starts are exact timestamps (tumbling ->
date_trunc; sliding -> time_bucket minus k*slide, k in 0..3); session
boundaries use exact integer microseconds (unix_micros == epoch_us).

100 TB posture: tumbling/sliding are plain hash aggregates (two-phase,
shuffle only group partials). Sessionization is one shuffle+sort on
user_id, then a linear scan - the canonical scalable formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loaders import load, table
from ..registry import register

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "q_stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts)
             - k * INTERVAL '15 minutes' AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) offsets(k)
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window every 15 minutes: each event lands in 4
    windows (starts = 15-min bucket minus k*15min, k=0..3 - both
    engines align 15-min grids on midnight-aligned epochs)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def _session_sql(epoch_fn: str) -> str:
    """Sessionization SQL shared by engine (Spark) and oracle (DuckDB);
    only the epoch-microseconds function name differs."""
    return f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             {epoch_fn}(ts) AS ts_us,
             lag({epoch_fn}(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT *,
             CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           max(ts_us) - min(ts_us) AS dur_us,
           round(sum(value), 4) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """


@register("q_stream_session", oracle=_session_sql("epoch_us"))
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap
    (lag -> gap flag -> running sum = session id -> aggregate).
    Semantics equal streaming ``session_window(ts, '30 minutes')``."""
    load(spark, sf_dir)
    return spark.sql(_session_sql("unix_micros"))


def _session_stats_sql(epoch_fn: str) -> str:
    return f"""
    WITH per_session AS ({_session_sql(epoch_fn)})
    SELECT count(*) AS n_sessions,
           CAST(sum(n_events) AS DOUBLE) / count(*) AS avg_events,
           CAST(sum(dur_us) AS DOUBLE) / (count(*) * 1000000.0) AS avg_dur_s,
           max(n_events) AS max_events
    FROM per_session
    """


@register("q_stream_sessionize_stats", oracle=_session_stats_sql("epoch_us"))
def q_stream_sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-level aggregate over sessions: volume + duration stats."""
    load(spark, sf_dir)
    return spark.sql(_session_stats_sql("unix_micros"))


WINDOW_TOPK = 3  # event types reported per hour window


@register(
    "q_stream_window_topk",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n, CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY window_start
                    ORDER BY n DESC, event_type) AS rk
      FROM hourly)
    WHERE rk <= {WINDOW_TOPK}
    """,
)
def q_stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window leaderboard: the top-3 event types by volume in
    each 1-hour tumbling window (the 'trending now' panel). Batch
    formulation of the streaming pattern windowed-agg -> per-window
    rank; in Structured Streaming the same rank runs in a
    foreachBatch over the window-complete output mode.

    Scale shape: the fact scan collapses to |windows| x |types| rows
    in one two-phase count agg; rank<=3 runs per window partition
    and pushes into the shuffle as a WindowGroupLimit (only k rows
    per window survive the exchange). Counts are integers; ties
    break on event_type - no floats anywhere.
    """
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n"))
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    )
    return (
        hourly.select("window_start", "event_type", "n", rk.alias("rk"))
        .filter(F.col("rk") <= WINDOW_TOPK)
    )
