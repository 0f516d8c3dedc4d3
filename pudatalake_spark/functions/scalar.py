"""Scalar function surface (SURVEY §2.8): string, regex, date, math,
conditional, cast, array (+ higher-order), explode, JSON, map.

Dialect hazards handled here (probed against DuckDB 1.0 at build
time, SURVEY §5.3):
- substring/instr are 1-based in both engines;
- Spark regexp_replace is global; DuckDB needs the 'g' flag;
- DuckDB date_diff('day', a, b) computes b - a == Spark datediff(b, a);
- double->int CAST rounds in DuckDB but truncates in Spark -> only
  cast integral-valued doubles (l_quantity);
- transcendentals (ln/log10/pow) may differ in the last ulp between
  libm and java.lang.Math -> rounded 6 dp; sqrt/abs/floor/ceil/sign
  are exact IEEE -> unrounded;
- array subscripts: Spark element_at is 1-based (like DuckDB lists);
  posexplode is 0-based (oracle avoids ordinals, multiset-compares
  the exploded rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..loaders import load, table
from ..registry import register


@register(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                    AS uname,
           lower(c_mktsegment)              AS lseg,
           length(c_name)                   AS name_len,
           substring(c_name, 10, 5)         AS name_mid,
           concat(c_mktsegment, '-', c_name) AS seg_name,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           strpos(c_name, '9')              AS pos9,
           trim(c_name)                     AS trimmed,
           replace(c_name, 'Customer', 'Cust') AS short_name
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.instr("c_name", "9").alias("pos9"),
        F.trim("c_name").alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "short_name"
        ),
    )


@register(
    "q_fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '([0-9]+)', 1)          AS brand_num,
           regexp_replace(p_type, '[AEO]', '_', 'g')       AS vowelless,
           string_split(p_name, ' ')[1]                    AS first_word,
           CASE WHEN regexp_matches(p_name, '^(red|blue)') THEN 1 ELSE 0 END
               AS is_colored
    FROM part
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[AEO]", "_").alias("vowelless"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.when(F.col("p_name").rlike(r"^(red|blue)"), 1)
        .otherwise(0)
        .alias("is_colored"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                        AS yr,
           month(o_orderdate)                       AS mon,
           quarter(o_orderdate)                     AS qtr,
           date_trunc('month', o_orderdate)         AS month_start,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
               AS days_to_y2k,
           CAST(o_orderdate AS DATE) + 30           AS plus_30d,
           last_day(CAST(o_orderdate AS DATE))      AS month_end,
           dayofweek(o_orderdate)                   AS dow
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction/arithmetic. DuckDB dayofweek == Spark dayofweek-1
    (Spark: Sunday=1 .. Saturday=7; DuckDB: Sunday=0 .. Saturday=6) -
    aligned by subtracting 1 on the Spark side."""
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    odate = od.cast("date")
    return o.select(
        "o_orderkey",
        F.year(od).alias("yr"),
        F.month(od).alias("mon"),
        F.quarter(od).alias("qtr"),
        F.date_trunc("month", od).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), odate).alias("days_to_y2k"),
        F.date_add(odate, 30).alias("plus_30d"),
        F.last_day(odate).alias("month_end"),
        (F.dayofweek(od) - 1).alias("dow"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000)            AS dist_mid,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(ceil(l_quantity / 7.0) AS BIGINT)  AS qty_ceil,
           sqrt(l_extendedprice)                   AS price_sqrt,
           round(ln(l_extendedprice), 6)           AS price_ln,
           round(log10(l_extendedprice), 6)        AS price_log10,
           round(pow(l_discount, 2), 6)            AS disc_sq,
           l_orderkey % 7                          AS key_mod7,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
           round(l_extendedprice / 7, 2)           AS price_7th
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("dist_mid"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.round(F.col("l_extendedprice") / 7, 2).alias("price_7th"),
    )


@register(
    "q_fn_cond",
    oracle="""
    SELECT s_suppkey,
           coalesce(nullif(s_acctbal, 0.0), -1.0)  AS bal_or_flag,
           greatest(s_acctbal, 5000.0)             AS bal_floor5k,
           least(s_acctbal, 5000.0)                AS bal_cap5k,
           CASE WHEN s_acctbal IS NULL THEN 'null' ELSE 'set' END AS nullness
    FROM supplier
    """,
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_acctbal"), F.lit(0.0)), F.lit(-1.0)).alias(
            "bal_or_flag"
        ),
        F.greatest(F.col("s_acctbal"), F.lit(5000.0)).alias("bal_floor5k"),
        F.least(F.col("s_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
        F.when(F.col("s_acctbal").isNull(), "null").otherwise("set").alias(
            "nullness"
        ),
    )


@register(
    "q_fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)                    AS key_str,
           CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
           CAST(o_totalprice AS VARCHAR) LIKE '%.%'       AS has_cents,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)     AS date_str,
           CAST(o_orderkey AS DOUBLE) / 2                 AS half_key
    FROM orders
    """,
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix on values that are lossless in both dialects
    (avoids the double->int rounding-mode divergence)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
        F.col("o_totalprice").cast("string").like("%.%").alias("has_cents"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        (F.col("o_orderkey").cast("double") / 2).alias("half_key"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                       AS dim,
           embedding[1]                         AS e_first,
           embedding[64]                        AS e_last,
           list_contains(embedding, 0.0)        AS has_zero,
           round(list_sum(list_transform(embedding[1:3],
                 x -> CAST(x AS DOUBLE))), 6)   AS head3_sum
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array basics over the 64-dim embedding column (element_at is
    1-based, matching DuckDB list indexing). The slice is reduced to
    a rounded scalar sum: the driver canonicalizer can't hash array
    cells (VERDICT r1 Wrong #3), and float->string join formatting
    diverges between engines, so a rounded fold is the hash-stable
    way to keep slice() exercised."""
    e = table(spark, sf_dir, "embeddings")
    head3_sum = F.aggregate(
        F.transform(F.slice("embedding", 1, 3), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("e_first"),
        F.element_at("embedding", 64).alias("e_last"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
        F.round(head3_sum, 6).alias("head3_sum"),
    )


@register(
    "q_fn_array_hof",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           len(list_filter(embedding, x -> x > 0))  AS n_positive,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 6)       AS comp_sum
    FROM embeddings
    """,
)
def q_fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate.
    All folds are sequential left-to-right on 64 elements; results
    rounded 6 dp against accumulation-order drift."""
    e = table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    comp_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(comp_sum, 6).alias("comp_sum"),
    )


@register(
    "q_fn_explode",
    oracle="""
    SELECT vec_id, label, unnest(embedding) AS component
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def q_fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode array to rows (multiset-compared: posexplode ordinals are
    0-based vs DuckDB's 1-based, so ordinals stay out of the oracle)."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select("vec_id", "label", F.explode("embedding").alias("component"))


@register(
    "q_fn_json",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
                 / count(json_extract_string(props, '$.k')) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the semi-structured props column, then
    aggregation on the extracted field."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum(k) / F.count(k)).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_fn_map",
    oracle="""
    SELECT c_custkey, c_acctbal AS bal, c_mktsegment AS seg
    FROM customer
    WHERE c_acctbal > 5000
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at extraction (the oracle states the
    semantic result: extracting what was inserted; MAP literals differ
    too much across dialects to round-trip)."""
    c = table(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("bal"), F.col("c_acctbal").cast("string"),
        F.lit("seg"), F.col("c_mktsegment"),
    )
    return (
        c.withColumn("m", m)
        .filter(F.col("c_acctbal") > 5000)
        .select(
            "c_custkey",
            F.element_at(F.col("m"), "bal").cast("double").alias("bal"),
            F.element_at(F.col("m"), "seg").alias("seg"),
        )
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_partkey & 255 AS and8,
           p_partkey | 4096 AS or_hi,
           xor(p_partkey, 1023) AS xor10,
           (p_partkey & 15) << 2 AS shl,
           p_partkey >> 3 AS shr,
           CAST(bit_count(p_partkey) AS INT) AS popcnt
    FROM part
    WHERE p_size > 40
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator matrix over integer keys: AND/OR/XOR masks,
    shifts, popcount - the primitives behind bitmap indexes, bloom
    probes, and bit-packed flags (q_agg_bitmap_distinct and
    q_join_bloom_prefilter build on exactly these). All codegen'd
    integer ops; Spark `^` == DuckDB xor() (verified at build time),
    bit_count returns INT on both engines after the cast."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_size") > 40).select(
        "p_partkey",
        F.expr("p_partkey & 255").alias("and8"),
        F.expr("p_partkey | 4096").alias("or_hi"),
        F.expr("p_partkey ^ 1023").alias("xor10"),
        F.expr("shiftleft(p_partkey & 15, 2)").alias("shl"),
        F.expr("shiftright(p_partkey, 3)").alias("shr"),
        F.bit_count("p_partkey").alias("popcnt"),
    )


@register(
    "q_fn_url",
    oracle=r"""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/' || lang || '/'
               || doc_id || '?k=' || n_chars AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/?]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]k=([^&]*)', 1) AS k
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL construction + parse_url decomposition (host/path/query/
    named query param) - the canonicalization primitive behind
    URL-keyed web-corpus dedup. Spark's parse_url is JVM-side; the
    oracle recomputes each component with conservative regexes
    (equivalence pinned at build time for this URL shape).
    """
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/docs/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("?k="), F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("k")).alias("k"),
    )


@register(
    "q_fn_variant",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS max_k,
           CAST(count(json_extract_string(props, '$.missing')) AS BIGINT)
               AS n_missing_hits
    FROM events
    GROUP BY event_type
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path: parse the semi-structured props column
    ONCE into the binary VARIANT encoding, then typed
    `variant_get` extractions - the open-lakehouse answer to
    Snowflake-style semi-structured columns. Differs from q_fn_json
    (string-path get_json_object re-parses the JSON text per
    extraction): VARIANT parses once and every subsequent path read
    is a binary traversal, which is the 100 TB shape for
    multi-field extraction. `try_variant_get` on a missing path
    null-propagates (counted: must be zero hits) instead of erroring.

    The VARIANT value itself never reaches the output (binary-coded
    column - not driver-canon-safe); only extracted scalars do.
    """
    ev = table(spark, sf_dir, "events")
    # parse ONCE structurally (a shared subexpression would rely on
    # Catalyst CSE firing); both extractions read the same VARIANT col
    parsed = ev.select(
        "event_type", F.parse_json("props").alias("v")
    )
    return (
        parsed.select(
            "event_type",
            F.expr("variant_get(v, '$.k', 'int')").alias("k"),
            F.expr("try_variant_get(v, '$.missing', 'int')").alias("m"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.count("m").cast("bigint").alias("n_missing_hits"),
        )
    )


# 1.5x the mean (2.0x was probed ABOVE max(o_totalprice) at test
# scale -> empty result -> vacuous oracle-match)
_SCRIPT_THR = (
    "(SELECT CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)"
    " / (count(*) * 100.0) * 1.5 FROM orders)"
)


@register(
    "q_sql_script",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_big,
           round(sum(o_totalprice), 4) AS big_revenue
    FROM orders
    WHERE o_totalprice > {_SCRIPT_THR}
    GROUP BY o_orderpriority
    """,
)
def q_sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (BEGIN..END): a multi-statement script
    DECLAREs a session variable, SETs it from a data-derived scalar
    (1.5x the exact-cent mean order value - the same integer-cent
    arithmetic as functions/exact.py, so the threshold double is
    bit-identical cross-engine), then emits the parameterized
    report - the stored-procedure-shaped workflow (parameterize ->
    compute -> report) as one engine-side script instead of
    driver-side glue.

    The oracle inlines the threshold subquery into a single SELECT,
    proving the script's staged execution equals the declarative
    form. Scale shape: the variable is ONE scalar on the driver;
    both statements are ordinary two-phase aggregates.
    """
    load(spark, sf_dir)  # registers the orders temp view
    return spark.sql(f"""
    BEGIN
      DECLARE thr DOUBLE;
      SET thr = {_SCRIPT_THR};
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_big,
             round(sum(o_totalprice), 4) AS big_revenue
      FROM orders
      WHERE o_totalprice > thr
      GROUP BY o_orderpriority;
    END
    """)


@register(
    "q_fn_collation",
    oracle="""
    WITH mixed AS (
        SELECT c_custkey, c_acctbal,
               CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer
    )
    SELECT lower(min(seg)) AS segment,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants,
           round(sum(c_acctbal), 4) AS sum_bal
    FROM mixed
    GROUP BY lower(seg)
    """,
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: group a deliberately case-mangled
    segment column under UTF8_LCASE, so 'BUILDING' and 'building'
    are ONE group at the type level - no lower() rewrites scattered
    through predicates, and (at scale) no loss of scan statistics
    that expression-wrapped keys cause. The oracle states the
    semantic contract via the classic lower() rewrite; the
    case-variant count (2 per group) proves the collation actually
    collapsed binary-distinct values. Output keys are canonicalized
    deterministically (lower of the binary min) because the
    collated group's representative value is engine-chosen.

    Scale shape: one two-phase hash agg; the collated comparison is
    ICU-backed at the type level, letting Catalyst keep pushdown
    and statistics that a lower(col) wrapper would forfeit.
    """
    c = table(spark, sf_dir, "customer")
    seg = F.when(
        F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
    ).otherwise(F.lower("c_mktsegment"))
    mixed = c.select("c_custkey", "c_acctbal", seg.alias("seg"))
    return (
        mixed.groupBy(F.expr("collate(seg, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.lower(F.min(F.expr("collate(seg, 'UTF8_BINARY')"))).alias(
                "segment"
            ),
            F.count("*").cast("bigint").alias("n_cust"),
            F.count_distinct(F.expr("collate(seg, 'UTF8_BINARY')"))
            .cast("bigint")
            .alias("n_case_variants"),
            F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
        )
        .drop("k")
    )


@register(
    "q_fn_try_safe",
    oracle="""
    SELECT o_orderkey,
           -- UNROUNDED: identical IEEE division both engines;
           -- round(x,4) itself diverges at decimal boundaries
           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 10) END AS price_per,
           CASE WHEN o_orderpriority LIKE '%-%'
                THEN TRY_CAST(string_split(o_orderpriority, '-')[1] AS INTEGER)
                ELSE NULL END AS prio_num,
           TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast
    FROM orders
    """,
)
def q_fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-data-safe arithmetic under ANSI mode: this engine runs
    with spark.sql.ansi.enabled=true (errors over silent corruption
    - the production setting), so the try_ family is how pipelines
    survive bad rows WITHOUT turning ANSI off: try_divide
    null-propagates the %10==0 divisor instead of raising
    DIVIDE_BY_ZERO, try_cast yields NULL for non-numeric strings
    where ANSI CAST raises. The oracle states the same semantics
    with explicit CASE guards (DuckDB division by zero and failed
    casts behave differently, so the contract is written out).

    Scale shape: pure map-side expressions under whole-stage
    codegen; the point is semantic (fail-closed NULLs at the
    expression level beat job-killing exceptions at row 10^12).
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), F.col("o_orderkey") % 10
        ).alias("price_per"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(1))
        .try_cast("int")
        .alias("prio_num"),
        F.col("o_orderstatus").try_cast("int").alias("bad_cast"),
    )


@register(
    "q_fn_struct",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           round(o_totalprice, 2) AS price,
           o_orderpriority AS prio,
           year(o_orderdate) >= 2024 AND o_totalprice > 200000
               AS big_recent
    FROM orders
    WHERE o_totalprice > 150000
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT construction, field access, and struct-aware predicates:
    pack (year, price, priority) into a named struct, then read the
    fields back and evaluate a predicate over them - the nested-type
    surface every log/semi-structured schema leans on (the oracle
    states the semantic result of extract-after-pack; struct literals
    don't round-trip across dialects).

    Scale shape: map-only projection - structs are columnar in
    Tungsten (no materialization cost) and the filter still pushes to
    the scan below the struct build.
    """
    o = table(spark, sf_dir, "orders")
    s = F.struct(
        F.year("o_orderdate").alias("y"),
        F.round(F.col("o_totalprice"), 2).alias("price"),
        F.col("o_orderpriority").alias("prio"),
    )
    return (
        o.withColumn("s", s)
        .filter(F.col("o_totalprice") > 150000)
        .select(
            "o_orderkey",
            F.col("s.y").cast("int").alias("y"),
            F.col("s.price").alias("price"),
            F.col("s.prio").alias("prio"),
            ((F.col("s.y") >= 2024) & (F.col("s.price") > 200000)).alias(
                "big_recent"
            ),
        )
    )


@register(
    "q_fn_interval",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 91 DAY AS due_date,
           o_orderdate + INTERVAL 3 MONTH AS quarter_out,
           CAST(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH
                - INTERVAL 1 DAY AS TIMESTAMP) AS month_end,
           CAST(datediff('day', o_orderdate,
                         date_trunc('month', o_orderdate)
                         + INTERVAL 1 MONTH - INTERVAL 1 DAY)
                AS BIGINT) AS days_to_month_end
    FROM orders WHERE o_orderkey < 200
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar INTERVAL arithmetic: fixed-length (days) and
    variable-length (months) offsets, month-end computation, and a
    countdown - the SLA / billing-period date math, pinned because
    month arithmetic (clamping, end-of-month) is a classic dialect
    divergence. The SLA offset is 91 days ON PURPOSE: DuckDB's
    interval equality treats 1 month as 30 days, so ts + INTERVAL 90
    DAY and ts + INTERVAL 3 MONTH compare EQUAL and its
    common-subexpression elimination collapses both columns to the
    first expression's value (probed in build testing; 91 is not a
    multiple of 30, so the expressions stay distinct). Both engines
    agree on add-months clamping for these inputs.

    Scale shape: map-only projection; the key filter pushes to the
    scan.
    """
    o = table(spark, sf_dir, "orders")
    month_start = F.date_trunc("month", F.col("o_orderdate"))
    month_end = F.expr(
        "date_trunc('month', o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 DAY"
    )
    return (
        o.filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 91 DAYS")).alias(
                "due_date"
            ),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias(
                "quarter_out"
            ),
            month_end.cast("timestamp").alias("month_end"),
            F.datediff(month_end, F.col("o_orderdate"))
            .cast("bigint")
            .alias("days_to_month_end"),
        )
    )


# 16-byte literal DEMO key (AES-128) - deliberately hardcoded so the
# rerun-stable check needs no secret management. Production: derive
# the key from a secret store (never a source literal) and use the
# default GCM mode - deterministic ECB leaks plaintext equality
# (identical names -> identical ciphertexts), which the operator
# exploits as a CHECK but a real column-encryption deployment must
# not (ADVICE r6).
AES_KEY = "0123456789abcdef"


@register("q_fn_crypto")  # engine-specific AES -> rows-only
def q_fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column encryption surface: aes_encrypt/aes_decrypt round-trip
    over customer names in deterministic ECB mode (chosen HERE so
    the ciphertext is a pure function of the plaintext and the
    check is rerun-stable; production uses the default GCM, whose
    random IV is the point - same API, one argument), plus sha2 /
    md5 / crc32 digests of the same column - the column-protection
    toolbox next to q_lake_column_mask's policy layer (masking is
    one-way; encryption keeps an authorized read path).

    Checks emitted per segment: round_trip_ok (decrypt(encrypt(x))
    = x for EVERY row), ciphertext_distinct (ECB determinism:
    distinct ciphertexts = distinct names), and digest NDVs.
    Rows-only BY DESIGN (DuckDB ships no AES surface).

    Scale shape: all codec work is per-row JVM expressions inside
    whole-stage codegen - a map-only pass; the audit agg is one
    two-phase pass.
    """
    c = table(spark, sf_dir, "customer")
    enc = F.expr(
        f"aes_encrypt(c_name, '{AES_KEY}', 'ECB')"
    )
    dec = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(c_name, '{AES_KEY}', 'ECB'),"
        f" '{AES_KEY}', 'ECB') AS STRING)"
    )
    enriched = c.select(
        "c_mktsegment",
        "c_name",
        enc.alias("ct"),
        dec.alias("rt"),
        F.sha2(F.col("c_name"), 256).alias("sha"),
        F.md5(F.col("c_name")).alias("md5"),
        F.crc32(F.col("c_name")).alias("crc"),
    )
    return (
        enriched.groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("rt") == F.col("c_name"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_roundtrip_ok"),
            F.count_distinct(F.col("ct")).cast("bigint").alias("ndv_cipher"),
            F.count_distinct(F.col("c_name"))
            .cast("bigint")
            .alias("ndv_plain"),
            F.count_distinct(F.col("sha")).cast("bigint").alias("ndv_sha"),
        )
        .orderBy("seg")
    )
