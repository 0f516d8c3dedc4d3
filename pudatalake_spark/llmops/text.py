"""Text-analysis operators over the document corpus (SURVEY §2.10,
BASELINE.json:6): tokenization/word counts, corpus stats, n-grams,
pure-SQL TF-IDF, language-ID heuristic, quality scoring, token
counting, content fingerprinting.

All token pipelines stay JVM-side (split/explode/aggregate - no
Python UDFs in the hot path); the fold-based fingerprint uses exact
integer arithmetic so both engines agree bit-for-bit.

100 TB posture: explode(tokens) multiplies rows ~100x but feeds a
two-phase hash agg, so the shuffle carries only (token, partial
count) pairs; top-k via TakeOrderedAndProject. All per-doc operators
are embarrassingly parallel scans.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..loaders import broadcast_below, cached, load, spread, table
from ..operators.ranks import global_order
from ..registry import register
from ..session import superstep_checkpoint


def _tokens():
    return F.split(F.lower(F.col("text")), " ")


@register(
    "q_text_tokenize_wordcount",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
          FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def q_text_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize -> tokenize -> top-50 word counts (ties broken by
    token so LIMIT is deterministic)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(50)
    )


@register(
    "q_text_stats",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)
               AS avg_tokens,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars") / F.count("*")).alias("avg_chars"),
        (F.sum(F.size(F.split(F.col("text"), " "))) / F.count("*")).alias(
            "avg_tokens"
        ),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "q_text_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    nums AS (SELECT range AS i FROM range(1, 256))
    SELECT t[i] || ' ' || t[i + 1] AS bigram, count(*) AS n
    FROM toks, nums
    WHERE i < len(t)
    GROUP BY 1
    ORDER BY n DESC, bigram
    LIMIT 30
    """,
)
def q_text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts. Spark pairs adjacent tokens with a transform over
    an index sequence; the oracle cross-joins a bounded index table
    (DuckDB range() can't be lateral-correlated)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(_tokens().alias("t"))
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(30)
    )


@register(
    "q_text_tfidf",
    oracle="""
    WITH tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents)
      WHERE token <> ''
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, token,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM (
      SELECT tf.doc_id, tf.token,
             tf.tf, df.df, n.n_docs,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                        tf.token) AS rn
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    WHERE rn <= 5 AND doc_id < 50
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL TF-IDF, top-5 terms per doc (first 50 docs). The
    HashingTF+IDF ML path is the same shape but hash-bucketed; this
    formulation is exact and oracle-able.

    N is a broadcast 1-row count AGGREGATE cross-joined into the
    expression (mirroring the oracle's CROSS JOIN n) - never a
    driver-side d.count(), which would run an extra full-scan job per
    build and break lazy composition. The plan audit asserts the
    in-plan count stays present."""
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    from pyspark.sql import Window

    score = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("token"))
    return (
        tf.join(F.broadcast(df), "token")
        .join(F.broadcast(n))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 5) & (F.col("doc_id") < 50))
        .select("doc_id", "token", F.round(score, 6).alias("tfidf"))
    )


#: Tiny per-language stopword marker lists for the n-gram/stopword
#: language-ID heuristic (public-knowledge common words).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}


def _langid_sql(split_expr: str) -> str:
    """Shared language-ID SQL: count marker hits per language, pick the
    argmax (ties -> 'und'). split_expr is the dialect's tokenizer."""
    hit_cols = []
    for lang, words in _LANG_MARKERS.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        hit_cols.append(
            f"count(*) FILTER (WHERE token IN ({inlist})) AS hits_{lang}"
        )
    hits = ",\n             ".join(hit_cols)
    greatest = ", ".join(f"hits_{lang}" for lang in _LANG_MARKERS)
    cases = "\n                ".join(
        f"WHEN hits_{lang} = best AND best > 0 THEN '{lang}'"
        for lang in _LANG_MARKERS
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, lang AS true_lang, {split_expr} AS token FROM documents
    ),
    hits AS (
      SELECT doc_id, true_lang,
             {hits}
      FROM toks GROUP BY doc_id, true_lang
    ),
    scored AS (
      SELECT *, greatest({greatest}) AS best FROM hits
    )
    SELECT doc_id, true_lang,
           CASE {cases}
                ELSE 'und' END AS pred_lang
    FROM scored
    """


@register(
    "q_text_langid",
    oracle=_langid_sql("unnest(string_split(lower(text), ' '))"),
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (first matching language in a fixed
    order wins ties -> deterministic). Engine SQL == oracle SQL up to
    the tokenizer spelling (EP3)."""
    load(spark, sf_dir)
    return spark.sql(_langid_sql("explode(split(lower(text), ' '))"))


@register(
    "q_text_quality",
    oracle="""
    SELECT doc_id,
           n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(n_chars AS DOUBLE)
                 / len(string_split(text, ' ')) AS avg_token_len,
           (length(text) - length(replace(text, ' ', ''))) AS n_spaces,
           CASE WHEN n_chars BETWEEN 120 AND 400
                 AND len(string_split(text, ' ')) >= 20
                THEN 1 ELSE 0 END AS quality_ok
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic doc quality scoring: length bounds + token density
    (the punctuation/stopword-ratio family of filters)."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        (F.col("n_chars").cast("double") / n_tokens).alias("avg_token_len"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        ).alias("n_spaces"),
        F.when(
            F.col("n_chars").between(120, 400) & (n_tokens >= 20), 1
        )
        .otherwise(0)
        .alias("quality_ok"),
    )


@register(
    "q_text_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_split_to_array(text, '[^a-z0-9]+')) AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_len_estimate
    FROM documents
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, a BPE-ish regex
    split (alnum runs), and the chars/4 LLM-token rule of thumb."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(F.split(F.col("text"), "[^a-z0-9]+")).alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).alias("byte_len_estimate"),
    )


_FP_MOD = 1_000_000_007


@register(
    "q_text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(lower(text), ' '),
                 t -> CAST(ascii(t) * 256 + length(t) AS BIGINT))),
             (a, x) -> (a * 31 + x) % {_FP_MOD}) AS rolling_hash
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: MD5 content hash (bit-identical across
    engines) + a polynomial rolling hash over token features, folded
    left-to-right in exact BIGINT arithmetic mod 1e9+7."""
    d = table(spark, sf_dir, "documents")
    tok_feature = F.transform(
        _tokens(),
        lambda t: (F.ascii(t) * 256 + F.length(t)).cast("long"),
    )
    rolling = F.aggregate(
        tok_feature,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % _FP_MOD,
    )
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5"),
        rolling.alias("rolling_hash"),
    )


CONTAM_NGRAM = 5


@register(
    "q_text_contamination",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest([array_to_string(w[i+1:i+{CONTAM_NGRAM}], ' ')
                     FOR i IN range(0, len(w) - {CONTAM_NGRAM} + 1)]) AS g
      FROM docs WHERE len(w) >= {CONTAM_NGRAM}
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
    SELECT gr.doc_id, count(DISTINCT gr.g) AS n_shared_grams
    FROM grams gr JOIN bench b USING (g)
    WHERE gr.source <> 'src0'
    GROUP BY gr.doc_id
    """,
)
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word 5-gram with the benchmark set (source='src0' stands in for
    the eval suite) - the standard n-gram-overlap contamination check
    run before training. 5-grams are the fixture's sweet spot: n=3
    over-flags 400 docs on this word-soup corpus, n=5 isolates the
    genuinely contaminated near-copies.

    Scale shape: the benchmark gram set is small (eval suites are
    tiny next to the corpus) -> DISTINCT once, broadcast into the
    training-gram stream - the corpus is scanned once, no shuffle of
    corpus grams; count(DISTINCT) per flagged doc only touches the
    matched remainder. At 100 TB the benchmark grams become a bloom
    filter pushed into the scan."""
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    docs = d.select(
        "doc_id", "source", F.split(F.lower("text"), " ").alias("w")
    ).filter(F.size("w") >= CONTAM_NGRAM)
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - (CONTAM_NGRAM - 1)),
                lambda i: F.array_join(F.slice("w", i, CONTAM_NGRAM), " "),
            )
        ).alias("g"),
    )
    bench = grams.filter(F.col("source") == "src0").select("g").distinct()
    return (
        grams.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
    )


#: PII patterns shared by engine and oracle (RE2/Java-compatible
#: subset: character classes + bounded repetition only).
_PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PII_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"


@register(
    "q_text_pii_redact",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com or +1-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           regexp_replace(regexp_replace(t, '{_PII_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PII_PHONE_RE}', '[PHONE]', 'g') AS redacted
    FROM injected
    """,
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing - the redaction pass an LLM training pipeline
    runs before packing: count and replace email addresses and phone
    numbers with typed placeholder tokens.

    The synthetic corpus contains no organic PII, so a deterministic
    email + phone is INJECTED per document (identically in engine and
    oracle) and the redacted output is value-hashed end-to-end -
    proving the regex machinery removes exactly what the counters
    found. Patterns stay in the RE2/Java common subset so Spark
    (Java regex) and DuckDB (RE2) agree character-for-character.

    Scale shape: pure per-row string work - map-only, no shuffle,
    whole-stage codegen; at 100 TB this fuses into the scan."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(_PII_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(_PII_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(t, _PII_EMAIL_RE, "[EMAIL]"),
            _PII_PHONE_RE,
            "[PHONE]",
        ).alias("redacted"),
    )


@register(
    "q_text_vocab",
    oracle="""
    WITH counts AS (
      SELECT token, count(*) AS n
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
            FROM documents)
      WHERE token <> ''
      GROUP BY token
    ),
    top AS (
      SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 1000
    )
    SELECT token,
           CAST(row_number() OVER (ORDER BY n DESC, token) + 3 AS BIGINT)
             AS token_id,
           CAST(n AS BIGINT) AS n
    FROM top
    """,
)
def q_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary build: frequency-ranked token->id
    table, ids 4..V+3 (0-3 reserved for PAD/UNK/BOS/EOS), ties broken
    by token so the mapping is fully deterministic across runs and
    engines.

    Scale shape: token counting is the two-phase hash agg (shuffle
    carries (token, partial-count) only); top-V selection is
    TakeOrderedAndProject. Only the V surviving rows (bounded: vocab
    sizes are 32k-256k, KBs of data) pass through the single-partition
    row_number window - the unbounded corpus never does, so the
    global-order window is NOT a scale hazard here."""
    from pyspark.sql import Window

    vocab_size = 1000
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(vocab_size)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.select(
        "token",
        (F.row_number().over(w) + F.lit(3)).cast("bigint").alias("token_id"),
        F.col("n").cast("bigint").alias("n"),
    )


@register(
    "q_text_lm_score",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
      FROM documents
    ),
    bigrams AS (
      -- 1-indexed list positions: order-free (no row_number over an
      -- unnest, whose order is an implementation detail).
      SELECT doc_id,
             unnest(list_transform(range(1, len(ts)),
                    i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS bg
      FROM docs
    ),
    flat AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bigrams),
    c1 AS (SELECT w1, count(*) AS n1 FROM flat GROUP BY w1),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM flat GROUP BY w1, w2),
    v AS (SELECT count(DISTINCT t) AS vocab
          FROM (SELECT unnest(ts) AS t FROM docs))
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((n2 + 1.0) / (n1 + vocab))), 4) AS avg_logp
    FROM flat g
    JOIN c1 USING (w1)
    JOIN c2 USING (w1, w2)
    CROSS JOIN v
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model quality score (the KenLM-shaped
    filter every large-scale training pipeline runs): estimate
    add-one-smoothed P(w2|w1) from the corpus's own bigram/unigram
    counts and score each document by its mean log-probability - low
    scores flag machine-generated/boilerplate/garbled text whose
    bigrams don't look like the corpus.

    All JVM-side: token positions via posexplode, bigrams by pairing
    adjacent positions (transform over the token array - no
    self-join), two count aggregates, vocabulary as an in-plan 1-row
    broadcast (the TF-IDF pattern - no driver-side count job).

    Scale shape: the count tables are two-phase aggs whose size is
    the vocabulary (bounded, millions), not the corpus; the scoring
    joins shuffle on w1 / (w1,w2) and AQE broadcasts them when they
    fit. ln() differs by <=1 ulp between engines; the mean over a
    doc's bigrams is rounded (SURVEY §5.3).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.filter(_tokens(), lambda t: t != "").alias("ts"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda t, i: F.struct(
                    t.alias("w1"), F.col("ts")[i + 1].alias("w2")
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    c1 = bigrams.groupBy("w1").agg(F.count("*").alias("n1"))
    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    vocab = (
        toks.select(F.explode("ts").alias("token"))
        .agg(F.count_distinct("token").alias("vocab"))
    )
    logp = F.log(
        (F.col("n2") + F.lit(1.0)) / (F.col("n1") + F.col("vocab"))
    )
    return (
        bigrams.join(c1, "w1")
        .join(c2, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


REPETITION_TAU = 0.2
SPAN_LEN = 8  # words per span for exact-substring dedup


@register(
    "q_text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    b AS (
      SELECT doc_id,
             [t[i] || ' ' || t[i + 1] FOR i IN range(1, len(t))] AS bg
      FROM toks
      WHERE len(t) >= 2
    )
    SELECT doc_id,
           CAST(len(bg) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
           1 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) AS rep_ratio,
           (1 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)) > 0.2
             AS flagged
    FROM toks JOIN b USING (doc_id)
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score (the Gopher 'repetition'
    quality rule): fraction of word bigrams that are duplicates of an
    earlier bigram in the SAME document, flagged above tau=0.2.
    Looping/boilerplate text scores high and gets filtered before
    training.

    Scale shape: entirely MAP-ONLY - the bigram array, its distinct
    count, and the ratio are per-row array expressions (no explode, no
    shuffle, no state); at 100 TB this fuses into the document scan.
    rep_ratio is an exact count ratio - unrounded per the
    functions/exact.py rule. (Map-only still needs map PARALLELISM:
    the single-file local fixture is one split, so spread() fans the
    scan out before the interpreted array work - a no-op on a real
    multi-split lake scan.)
    """
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    t = _tokens()
    bg = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + 1)
        ),
    )
    # n_bigrams == size(t) - 1 by construction: higher-order array
    # expressions are interpreted (no codegen, no common-subexpression
    # elimination), so building bg once instead of twice per row
    # halves the per-row cost (measured 2.8s -> 1.5s at sf0.1).
    base = d.filter(F.size(t) >= 2).select(
        "doc_id",
        (F.size(t) - 1).cast("bigint").alias("n_bigrams"),
        F.size(F.array_distinct(bg)).cast("bigint").alias("n_distinct"),
    )
    ratio = 1 - F.col("n_distinct").cast("double") / F.col("n_bigrams")
    return base.select(
        "doc_id",
        "n_bigrams",
        "n_distinct",
        ratio.alias("rep_ratio"),
        (ratio > REPETITION_TAU).alias("flagged"),
    )


@register(
    "q_text_span_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    sp AS (
      SELECT doc_id,
             [array_to_string(list_slice(t, i, i + {SPAN_LEN - 1}), ' ')
              FOR i IN range(1, len(t) - {SPAN_LEN - 2})] AS spans
      FROM toks
      WHERE len(t) >= {SPAN_LEN}
    ),
    inst AS (SELECT doc_id, unnest(spans) AS g FROM sp),
    df AS (
      SELECT g FROM inst GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ),
    dupn AS (
      SELECT i.doc_id, count(*) AS n_dup
      FROM inst i JOIN df ON i.g = df.g
      GROUP BY i.doc_id
    )
    SELECT s.doc_id,
           CAST(len(spans) AS BIGINT) AS n_spans,
           CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_spans,
           CAST(coalesce(n_dup, 0) AS DOUBLE) / len(spans) AS dup_frac
    FROM sp s LEFT JOIN dupn ON s.doc_id = dupn.doc_id
    """,
)
def q_text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SPAN detection: for every document, how many
    of its word-8-gram spans also occur in at least one OTHER
    document - the per-doc measurement behind exact-substring dedup
    (the 'remove duplicated 50-token spans' pretraining step; 8 words
    here so the synthetic corpus has hits). Output: span count,
    cross-doc duplicated-span count, duplicated fraction.

    Scale shape: the classic inverted-index plan - spans are HASHED
    to int64 before the shuffle (xxhash64; grouping by hash equals
    grouping by span up to negligible collisions, and fixed-width
    keys shuffle ~5x lighter than 8-word strings), document frequency
    is one hash agg, and only spans with df >= 2 flow into the
    count-back join. The per-doc span array is map-side; no quadratic
    stage anywhere (same shape as q_dedup_exact scaled to spans).
    """
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    t = _tokens()
    spans = F.transform(
        F.sequence(F.lit(1), F.size(t) - (SPAN_LEN - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i, SPAN_LEN))),
    )
    # The span table is a diamond (the instance explode AND the final
    # per-doc join both read it) and the span derivation - one xxhash64
    # per 8-gram - is the expensive map stage; persist() so it runs
    # once. Measured at sf0.1: 2.7 s -> 0.95 s steady (contrast
    # q_graph_pagerank, where caching HURT: there the recomputation
    # was one cheap fused join, here it is the dominant CPU).
    sp = cached(
        d.filter(F.size(t) >= SPAN_LEN).select("doc_id", spans.alias("spans"))
    )
    inst = sp.select("doc_id", F.explode("spans").alias("g"))
    dup = (
        inst.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("g")
    )
    dupn = (
        inst.join(dup, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup"))
    )
    return (
        sp.join(dupn, "doc_id", "left")
        .select(
            "doc_id",
            F.size("spans").cast("bigint").alias("n_spans"),
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("bigint").alias("n_dup_spans"),
            (
                F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
                / F.size("spans")
            ).alias("dup_frac"),
        )
    )


LINE_DEDUP_MAX = 3  # drop lines occurring >= this many times (C4)

# Corpus-size ceiling for force-broadcasting the hot-line mark set
# (VERDICT r13 #1): below this many on-disk corpus bytes the distinct
# hot-line hash set is at most a few million int64s (tens of MB
# framed) - safely broadcastable; above it the set's growth is
# unbounded (C4: billions of duplicated lines at ~360 GB) and the
# join must plan shuffled. Conservative vs the session's 64 MiB
# autoBroadcastJoinThreshold because hot rows are 9 bytes wide while
# corpus bytes are whole documents.
LINE_HOT_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


@register(
    "q_text_line_dedup",
    oracle=f"""
    WITH l AS (
      SELECT doc_id,
             unnest(range(1, len(ls) + 1)) AS pos,
             unnest(ls) AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
            FROM documents)
    ),
    hot AS (
      SELECT line FROM l GROUP BY line
      HAVING count(*) >= {LINE_DEDUP_MAX}
    ),
    m AS (
      SELECT l.doc_id, l.pos, l.line,
             (h.line IS NOT NULL) AS dropped
      FROM l LEFT JOIN hot h ON l.line = h.line
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) - sum(CASE WHEN dropped THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_lines,
           CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_lines,
           md5(coalesce(string_agg(
             CASE WHEN NOT dropped THEN line END, chr(10)
             ORDER BY pos), '')) AS clean_md5
    FROM m GROUP BY doc_id
    """,
)
def q_text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-level corpus dedup, the C4/RefinedWeb rule (VERDICT r12
    #4): drop every line that occurs >= LINE_DEDUP_MAX times
    CORPUS-WIDE (total occurrences, not distinct docs - a
    boilerplate footer pasted 3x into one page is still
    boilerplate), then re-assemble each document from its surviving
    lines in original order. Output per doc: line counts
    (total/kept/dropped) plus the md5 of the cleaned text, so the
    re-assembly itself - split, flag, filter, ordered rejoin - is
    value-checked against the oracle, not just counted. The fixture
    corpus has no duplicated lines (every doc is one distinct
    line), so fixture output = md5(text) per doc with 0 drops; the
    drop path is proven by the planted-boilerplate fixture test
    (tests/test_pipeline_props.py), the q_text_pii_redact
    precedent.

    Scale shape (same inverted index as q_text_span_dedup): lines
    are hashed to int64 before the shuffle (grouping by xxhash64
    equals grouping by the line up to negligible collisions; fixed
    8-byte keys shuffle far lighter than raw boilerplate lines),
    occurrence count is one map-side-combinable agg, only hot
    hashes (df >= max) flow into the mark join, and re-assembly is
    a per-doc sort of (pos, line) structs inside one agg - no
    quadratic stage, no global sort.

    Hot-line mark join (r14, VERDICT r13 #1): the hot set is
    DATA-DEPENDENT - C4 measured duplicated lines in the billions
    at ~360 GB, so an unconditional F.broadcast(hot) OOMs long
    before 100 TB. Size-switched via broadcast_below: corpora
    under LINE_HOT_BROADCAST_MAX_BYTES (a pure-metadata stat, no
    action) keep today's broadcast plan; above it - or when the
    size is unknowable - the hint drops and the mark join is a
    plain shuffled left join on the int64 hash (8-byte keys; the
    count agg already shuffled inst on g once, and AQE may still
    broadcast from REAL runtime sizes). Output is identical either
    way; the forced-shuffle branch is pinned by test and the
    switch is asserted by the plan audit.
    """
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    inst = cached(
        d.select(
            "doc_id",
            F.posexplode(F.split("text", "\n")).alias("pos", "line"),
        ).withColumn("g", F.xxhash64("line"))
    )
    hot = (
        inst.groupBy("g")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= LINE_DEDUP_MAX)
        .select("g", F.lit(True).alias("dropped"))
    )
    m = inst.join(
        broadcast_below(hot, d, LINE_HOT_BROADCAST_MAX_BYTES), "g", "left"
    )
    kept_struct = F.when(
        F.col("dropped").isNull(), F.struct("pos", "line")
    )
    return m.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        (
            F.count("*")
            - F.sum(F.when(F.col("dropped"), 1).otherwise(0))
        ).cast("bigint").alias("kept_lines"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0))
        .cast("bigint")
        .alias("dropped_lines"),
        F.md5(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line"],
                ),
            )
        ).alias("clean_md5"),
    )


# Composite filter: reuse the registered signal operators' oracle SQL
# as derived tables (single source of truth, like q_sim_recall_eval).
from ..registry import ORACLES as _T_ORACLES  # noqa: E402


@register(
    "q_text_cc_quality",
    oracle=f"""
    WITH q AS ({_T_ORACLES["q_text_quality"]}),
    r AS ({_T_ORACLES["q_text_repetition"]})
    SELECT q.doc_id,
           q.quality_ok = 1 AS len_ok,
           NOT r.flagged AS rep_ok,
           (q.quality_ok = 1 AND NOT r.flagged) AS keep,
           CASE WHEN q.quality_ok = 0 THEN 'length'
                WHEN r.flagged THEN 'repetition'
                ELSE 'ok' END AS reason
    FROM q JOIN r ON q.doc_id = r.doc_id
    """,
)
def q_text_cc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pretraining-filter verdict (the CCNet/Gopher rule
    STACK): length/token-density gate AND within-doc repetition gate,
    with a keep/drop decision and the FIRST failing rule as the
    reason - the auditable form a data pipeline needs (how much did
    each rule remove?). Composed from the registered q_text_quality
    and q_text_repetition builders on the Spark side and from their
    oracle SQL as derived tables on the DuckDB side, so the composite
    can never drift from its components.

    Scale: both inputs are map-only scans; the join is doc_id-keyed
    (co-partitioned after AQE); add further gates (langid confidence,
    LM score) as extra conjuncts with reasons in precedence order.
    """
    q = q_text_quality(spark, sf_dir).select("doc_id", "quality_ok")
    r = q_text_repetition(spark, sf_dir).select("doc_id", "flagged")
    len_ok = F.col("quality_ok") == 1
    rep_ok = ~F.col("flagged")
    return q.join(r, "doc_id").select(
        "doc_id",
        len_ok.alias("len_ok"),
        rep_ok.alias("rep_ok"),
        (len_ok & rep_ok).alias("keep"),
        F.when(~len_ok, "length")
        .when(F.col("flagged"), "repetition")
        .otherwise("ok")
        .alias("reason"),
    )


@register(
    "q_text_sentences",
    oracle="""
    WITH frags AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[.!?]'),
                         s -> len(trim(s)) > 0) AS sents,
             len(list_filter(string_split_regex(text, '\\s+'),
                             w -> len(w) > 0)) AS n_words
      FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           n_words,
           CASE WHEN len(sents) > 0
                THEN CAST(n_words AS DOUBLE) / len(sents) END
             AS words_per_sentence
    FROM frags
    """,
)
def q_text_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats per document: terminator-delimited
    ([.!?]) non-blank sentence count, word count, and mean sentence
    length - the readability / chunking-prep signal (long-sentence
    outliers are OCR noise; words_per_sentence feeds quality gates).

    Scale shape: map-only array expressions over the text column (no
    shuffle, no UDF); the split pattern is a single-char class so
    Java and DuckDB regex semantics are identical by construction.
    Exact unrounded division (both engines divide the same two
    integers; NULL for sentence-free docs, not a 0-guard).
    """
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    sents = F.filter(
        F.split(F.col("text"), r"[.!?]"),
        lambda s: F.length(F.trim(s)) > 0,
    )
    words = F.filter(
        F.split(F.col("text"), r"\s+"), lambda w: F.length(w) > 0
    )
    return d.select(
        "doc_id",
        F.size(sents).cast("bigint").alias("n_sentences"),
        F.size(words).alias("n_words"),
        F.when(
            F.size(sents) > 0,
            F.size(words).cast("double") / F.size(sents),
        ).alias("words_per_sentence"),
    )


OOV_VOCAB = 100


@register(
    "q_text_oov_rate",
    oracle=f"""
    WITH toks AS (
        SELECT lang, unnest(list_filter(string_split(lower(text), ' '),
                                        t -> t <> '')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token FROM (
            SELECT token, count(*) AS n FROM toks GROUP BY token
            ORDER BY n DESC, token LIMIT {OOV_VOCAB})
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS oov_rate
    FROM toks LEFT JOIN vocab v USING (token)
    GROUP BY lang
    """,
)
def q_text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against the corpus top-V
    vocabulary (V=100, OOV_VOCAB, frequency-ranked, token tie-break as
    in q_text_vocab) - the tokenizer-coverage check that decides
    whether a vocab needs rebuilding for a new data mix.

    Scale shape: ONE explode pass feeds both the vocab build (two-
    phase count agg -> TakeOrderedAndProject top-V) and the coverage
    join; the V-row vocab broadcasts, membership is a broadcast LEFT
    join feeding a conditional count per language. OOV rate is an
    int-count ratio -> one IEEE division, cross-engine exact.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(_tokens()).alias("token")
    ).filter(F.col("token") != "")
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(OOV_VOCAB)
        .select(F.col("token").alias("v_token"))
    )
    return (
        toks.join(
            F.broadcast(vocab), F.col("token") == F.col("v_token"), "left"
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("v_token").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_oov"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias(
                "oov_rate"
            ),
        )
    )


NOVEL_NGRAM = 5


@register(
    "q_text_ngram_novelty",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             array_to_string(
                 list_slice(t, i, i + {NOVEL_NGRAM - 1}), ' ') AS g
      FROM toks, unnest(range(1, len(t) - {NOVEL_NGRAM - 2})) AS u(i)
      WHERE len(t) >= {NOVEL_NGRAM}
    ),
    first_seen AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS novelty_frac
    FROM grams JOIN first_seen USING (g)
    GROUP BY doc_id
    """,
)
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve: per document, the fraction of its
    distinct word-5-grams (NOVEL_NGRAM) FIRST seen in that document
    (ingestion order = doc_id) - the dataset-curation signal for
    diminishing returns: when marginal novelty collapses, more of the
    same source stops adding information. Complements span-dedup
    (which measures duplication anywhere) by attributing each gram to
    its earliest occurrence.

    Scale shape: the same inverted-index plan as span dedup - the
    engine hashes grams to int64 before the shuffle (fixed-width
    keys; the oracle keeps strings, counts agree modulo negligible
    collisions), first-occurrence is ONE min-agg, and the count-back
    join + ratio are exact-int arithmetic. At true scale doc_id
    becomes the ingestion sequence number carried by the pipeline.
    """
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    t = F.split(F.lower("text"), " ")
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.size(t) - (NOVEL_NGRAM - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i, NOVEL_NGRAM))),
    )
    grams = (
        d.filter(F.size(t) >= NOVEL_NGRAM)
        .select("doc_id", F.explode(grams_arr).alias("g"))
        .distinct()
    )
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams")).alias(
                "novelty_frac"
            ),
        )
    )


BOILER_SUFFIX = "© example corp all rights reserved 2024 footer"
BOILER_WORDS = 8  # words in the injected footer
BOILER_DF = 150   # docs sharing a suffix before it counts as boilerplate


def _boiler_suffix_col(w):
    """Document-final BOILER_WORDS-word suffix (NULL for short docs)."""
    return F.when(
        F.size(w) >= BOILER_WORDS,
        F.array_join(F.slice(w, -BOILER_WORDS, BOILER_WORDS), " "),
    )


def _boiler_dict(suffixed: DataFrame) -> DataFrame:
    """Suffixes shared by >= BOILER_DF docs, as a broadcastable
    1-column frame aliased `bsfx` (tiny by definition: at most
    n_docs / BOILER_DF rows)."""
    return (
        suffixed.filter(F.col("suffix").isNotNull())
        .groupBy("suffix")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= BOILER_DF)
        .select(F.col("suffix").alias("bsfx"))
    )


def _strip_boiler_col(w):
    """Cleaned word array: drop the suffix when the joined `bsfx`
    matched, pass through otherwise."""
    return F.when(
        F.col("bsfx").isNotNull(),
        F.slice(w, 1, F.size(w) - BOILER_WORDS),
    ).otherwise(w)


@register(
    "q_text_boilerplate_strip",
    oracle=f"""
    WITH injected AS (
        -- Reproduce a crawl with template footers: docs with even
        -- doc_id carry the same 8-word suffix (same injection idea
        -- as q_text_pii_redact's synthetic PII).
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                    THEN text || ' {BOILER_SUFFIX}'
                    ELSE text END AS t
        FROM documents
    ),
    words AS (
        SELECT doc_id,
               list_filter(string_split(lower(t), ' '), w -> w <> '') AS w
        FROM injected
    ),
    suffixed AS (
        SELECT doc_id, w,
               CASE WHEN len(w) >= {BOILER_WORDS}
                    THEN array_to_string(
                        list_slice(w, len(w) - {BOILER_WORDS - 1}, len(w)),
                        ' ')
                    END AS suffix
        FROM words
    ),
    df AS (
        SELECT suffix FROM suffixed WHERE suffix IS NOT NULL
        GROUP BY suffix HAVING count(*) >= {BOILER_DF}
    )
    SELECT s.doc_id,
           CASE WHEN df.suffix IS NOT NULL THEN 1 ELSE 0 END AS stripped,
           CAST(CASE WHEN df.suffix IS NOT NULL
                     THEN len(w) - {BOILER_WORDS} ELSE len(w) END
                AS BIGINT) AS n_words_clean,
           md5(CASE WHEN df.suffix IS NOT NULL
                    THEN array_to_string(
                        list_slice(w, 1, len(w) - {BOILER_WORDS}), ' ')
                    ELSE array_to_string(w, ' ') END) AS clean_hash
    FROM suffixed s LEFT JOIN df ON s.suffix = df.suffix
    """,
)
def q_text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-boilerplate removal: the crawl-cleaning step that
    strips shared page furniture (footers/headers) BEFORE dedup and
    quality scoring. Detection is corpus-statistical, not a pattern
    list: a document-final 8-word (BOILER_WORDS) suffix occurring in >=
    150 (BOILER_DF) documents is boilerplate by definition (no organic
    suffix repeats across 30% of a corpus). The fixture injects a
    footer on even doc_ids (as q_text_pii_redact injects PII) so
    detection, stripping, and the untouched-doc path are all
    exercised; output is the cleaned-text hash + word count (flat
    scalars for the driver canonicalizer).

    Scale shape: one suffix per document (map-side slice+join), a
    two-phase count agg over those single suffixes, and the tiny
    qualifying-suffix set broadcast back - the corpus text never
    shuffles. Generalizing to headers or k positional spans
    multiplies the per-doc probe rows by k, never the plan shape.
    """
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    t = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.col("text"), F.lit(" " + BOILER_SUFFIX)),
    ).otherwise(F.col("text"))
    w = F.filter(F.split(F.lower(t), " "), lambda x: x != "")
    suffixed = d.select(
        "doc_id", w.alias("w"), _boiler_suffix_col(w).alias("suffix")
    )
    clean_w = _strip_boiler_col(F.col("w"))
    return (
        suffixed.join(
            F.broadcast(_boiler_dict(suffixed)),
            F.col("suffix") == F.col("bsfx"),
            "left",
        )
        .select(
            "doc_id",
            F.when(F.col("bsfx").isNotNull(), 1).otherwise(0).alias(
                "stripped"
            ),
            F.size(clean_w).cast("bigint").alias("n_words_clean"),
            F.md5(F.array_join(clean_w, " ")).alias("clean_hash"),
        )
    )


CURATION_MIN_WORDS = 30


@register(
    "q_curation_funnel",
    oracle=f"""
    WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id < 4),
    planted AS (
        -- Fixture: clone-farm the corpus (doc_id % 100 < 4 re-uses
        -- doc (doc_id % 100)'s text) and stamp template footers on
        -- even ids - the two pathologies the funnel must remove.
        SELECT d.doc_id, d.lang,
               CASE WHEN d.doc_id % 100 < 4 AND d.doc_id >= 100
                    THEN s.text ELSE d.text END
               || CASE WHEN d.doc_id % 2 = 0
                       THEN ' {BOILER_SUFFIX}' ELSE '' END AS t
        FROM documents d
        LEFT JOIN src s ON d.doc_id % 100 = s.doc_id
    ),
    words AS (
        SELECT doc_id, lang,
               list_filter(string_split(lower(t), ' '), w -> w <> '') AS w
        FROM planted
    ),
    suffixed AS (
        SELECT doc_id, lang, w,
               CASE WHEN len(w) >= {BOILER_WORDS}
                    THEN array_to_string(
                        list_slice(w, len(w) - {BOILER_WORDS - 1}, len(w)),
                        ' ') END AS suffix
        FROM words
    ),
    boiler AS (
        SELECT suffix FROM suffixed WHERE suffix IS NOT NULL
        GROUP BY suffix HAVING count(*) >= {BOILER_DF}
    ),
    cleaned AS (
        SELECT doc_id, lang,
               CASE WHEN b.suffix IS NOT NULL
                    THEN list_slice(w, 1, len(w) - {BOILER_WORDS})
                    ELSE w END AS w
        FROM suffixed s LEFT JOIN boiler b ON s.suffix = b.suffix
    ),
    deduped AS (
        SELECT doc_id, lang, w,
               CASE WHEN doc_id = min(doc_id) OVER (
                        PARTITION BY md5(array_to_string(w, ' ')))
                    THEN 1 ELSE 0 END AS keep_dedup
        FROM cleaned
    ),
    gated AS (
        SELECT *, CASE WHEN keep_dedup = 1
                        AND len(w) >= {CURATION_MIN_WORDS}
                       THEN 1 ELSE 0 END AS keep_final
        FROM deduped
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(keep_dedup) AS BIGINT) AS n_after_dedup,
           CAST(sum(keep_final) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep_final = 1 THEN len(w) ELSE 0 END)
                AS BIGINT) AS tokens_kept
    FROM gated
    GROUP BY lang
    """,
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel in ONE declarative plan:
    boilerplate-strip -> exact dedup (survivor = min doc_id per
    cleaned-content hash) -> length quality gate, reported as
    per-language stage counts + surviving token mass. The fixture
    plants both pathologies (clone-farmed texts re-using docs 0-3,
    template footers on even ids) so every stage provably removes
    something; the composition shows the stages FUSE - one job, no
    intermediate materialization, because each stage is a
    map/window/broadcast-join over the previous one.

    Scale shape: the footer dictionary is a tiny broadcast; dedup's
    survivor choice is a min-over-hash window partitioned by the
    content hash (shuffles (hash, doc_id) pairs, not text - same key
    discipline as q_dedup_exact); the funnel report is one final
    agg. Every count is exact-int.
    """
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    src = (
        d.filter(F.col("doc_id") < 4)
        .select(F.col("doc_id").alias("s_id"), F.col("text").alias("s_text"))
    )
    planted = (
        d.join(
            F.broadcast(src), F.col("doc_id") % 100 == F.col("s_id"), "left"
        )
        .select(
            "doc_id",
            "lang",
            F.concat(
                F.when(
                    (F.col("doc_id") % 100 < 4) & (F.col("doc_id") >= 100),
                    F.col("s_text"),
                ).otherwise(F.col("text")),
                F.when(
                    F.col("doc_id") % 2 == 0, F.lit(" " + BOILER_SUFFIX)
                ).otherwise(F.lit("")),
            ).alias("t"),
        )
    )
    w = F.filter(F.split(F.lower("t"), " "), lambda x: x != "")
    suffixed = planted.select(
        "doc_id", "lang", w.alias("w"), _boiler_suffix_col(w).alias("suffix")
    )
    cleaned = (
        suffixed.join(
            F.broadcast(_boiler_dict(suffixed)),
            F.col("suffix") == F.col("bsfx"),
            "left",
        )
        .select(
            "doc_id", "lang", _strip_boiler_col(F.col("w")).alias("w")
        )
    )
    from pyspark.sql import Window as W

    hsh = F.md5(F.array_join(F.col("w"), " "))
    keep_dedup = F.when(
        F.col("doc_id") == F.min("doc_id").over(W.partitionBy(hsh)), 1
    ).otherwise(0)
    deduped = cleaned.withColumn("keep_dedup", keep_dedup)
    keep_final = F.when(
        (F.col("keep_dedup") == 1) & (F.size("w") >= CURATION_MIN_WORDS), 1
    ).otherwise(0)
    return (
        deduped.withColumn("keep_final", keep_final)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_raw"),
            F.sum("keep_dedup").cast("bigint").alias("n_after_dedup"),
            F.sum("keep_final").cast("bigint").alias("n_kept"),
            F.sum(
                F.when(F.col("keep_final") == 1, F.size("w")).otherwise(0)
            ).cast("bigint").alias("tokens_kept"),
        )
    )


COMPRESS_MAX_RATIO = 0.55  # flag docs compressing below this (repetitive)


@register("q_text_compression_ratio")  # UDF-surface -> rows-only + pin
def q_text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: zlib(level 6) compressed
    bytes / raw UTF-8 bytes per document, with a repetitiveness flag
    below 0.55 (COMPRESS_MAX_RATIO) - the classic pretraining filter
    (highly compressible text is boilerplate/template/repetition;
    incompressible text is often binary junk or high-entropy noise).
    Deterministic: zlib with a pinned level is a pure function of the
    bytes - same output on every executor, every rerun.

    Rows-only by design (no SQL twin for DEFLATE);
    tests/test_pipeline_props.py pins a sample of rows against
    direct zlib from the same texts, so a codec-parameter drift
    flips the pin.

    Scale shape: Arrow-batched pandas UDF (declared slow-path
    surface, like the multimodal codecs) - map-only, no shuffle;
    only (doc_id, two ints, ratio, flag) ever leave the executor.
    The JVM-side complement for cheap screening is
    q_text_repetition's n-gram ratios; compression catches the
    long-range redundancy n-grams miss.
    """
    import zlib

    # raw size is JVM-side (octet_length); ONLY the DEFLATE size
    # needs the Python surface.
    @F.pandas_udf("bigint")
    def comp_bytes_udf(texts: pd.Series) -> pd.Series:
        # null-propagate like a built-in (None.encode would kill the
        # whole task); pd.NA keeps the bigint column nullable
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            if isinstance(t, str)
            else None
        )

    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    sized = d.select(
        "doc_id",
        "lang",
        F.octet_length("text").cast("bigint").alias("raw_bytes"),
        comp_bytes_udf("text").alias("comp_bytes"),
    )
    # guard the degenerate rows: null/empty text has no ratio and
    # must not silently classify as fine - it gets its own flag
    ratio = F.when(
        F.col("raw_bytes") > 0,
        F.col("comp_bytes").cast("double") / F.col("raw_bytes"),
    )
    return sized.select(
        "doc_id",
        "lang",
        "raw_bytes",
        "comp_bytes",
        ratio.alias("comp_ratio"),
        F.when(ratio < COMPRESS_MAX_RATIO, 1).otherwise(0).alias(
            "too_repetitive"
        ),
        F.when(
            F.col("raw_bytes").isNull() | (F.col("raw_bytes") == 0), 1
        ).otherwise(0).alias("degenerate"),
    )


@register(
    "q_text_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[^\n\r]')) AS ch
      FROM documents
    ),
    counts AS (
      SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
      FROM chars GROUP BY doc_id, ch
    ),
    per_doc AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             sum(c * ln(c)) AS sclnc
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id, n AS n_chars_counted,
           round(ln(n) - sclnc / n, 4) AS char_entropy
    FROM per_doc
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (natural log),
    via the grouped-count identity H = ln(n) - sum(c*ln c)/n - the
    quality signal that separates natural text (~3 nats) from
    repeated-character junk (low) and random/binary noise (high),
    complementing the zlib ratio (q_text_compression_ratio) with a
    model-free closed form that HAS a SQL twin.

    Scale shape: one explode to (doc, char) - bounded by text length
    - then two map-side-combinable aggs on the doc-partitioned
    stream; no window, no UDF. Chars come from an EXPLICIT
    [^\\n\\r] class, not '.': Java's dot also excludes \\r and the
    U+2028/U+2029/U+0085 separators while RE2's excludes only \\n -
    a latent divergence on CRLF text; the explicit class means the
    same codepoint set on both engines.
    The c*ln(c) partial sums are per-(doc,char) EXACT integers fed to
    ln once each; the final 4dp round absorbs summation-order ULPs.
    """
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(r"regexp_extract_all(lower(text), '[^\n\r]', 0)")
            ).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("sclnc"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n").alias("n_chars_counted"),
        F.round(
            F.log(F.col("n")) - F.col("sclnc") / F.col("n"), 4
        ).alias("char_entropy"),
    )


ZIPF_TOP = 100  # frequency-ranked tokens entering the fit


@register(
    "q_text_zipf",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS token
      FROM documents
    ),
    freq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS f
      FROM toks GROUP BY token
      ORDER BY f DESC, token LIMIT {ZIPF_TOP}
    ),
    ranked AS (
      SELECT ln(row_number() OVER (ORDER BY f DESC, token)) AS x,
             ln(f) AS y
      FROM freq
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM ranked
    )
    SELECT n AS n_tokens_fit,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 4) AS intercept
    FROM sums
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF-LAW fit over the corpus: least-squares slope of ln(freq)
    vs ln(rank) for the top-100 tokens. Natural language sits near
    slope -1; template/boilerplate corpora flatten and synthetic
    word-soup steepens - a one-row corpus-health gauge for curation
    dashboards (this generator's near-uniform vocabulary reads
    shallow by construction, which is itself the signal).

    Scale shape: the token count is one explode + two-phase agg; the
    top-100 cut is TakeOrderedAndProject (never a full sort); the
    regression runs in closed form over the 100-row frame via five
    sums - no ML library, no iteration, one final 1-row projection.
    Ranks tie-break on token so the fit is a pure function of the
    corpus.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(
            F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("f"))
        .orderBy(F.col("f").desc(), "token")
        .limit(ZIPF_TOP)
    )
    w = Window.orderBy(F.col("f").desc(), "token")
    ranked = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    sums = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").alias("n_tokens_fit"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
    )


CONTAIN_NGRAM = 5  # word n-gram width for containment sets
CONTAIN_TAU = 0.5  # directed-containment threshold


@register(
    "q_text_containment",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             list_distinct([hash(array_to_string(
                 w[i + 1:i + {CONTAIN_NGRAM}], ' '))
               FOR i IN range(0, len(w) - {CONTAIN_NGRAM} + 1)]) AS g
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                       t -> t <> '') AS w
            FROM documents)
      WHERE len(w) >= {CONTAIN_NGRAM}
    ),
    n AS (SELECT doc_id, len(g) AS n FROM grams),
    inst AS (SELECT doc_id, unnest(g) AS h FROM grams),
    inter AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS i
      FROM inst a JOIN inst b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc1, doc2,
           round(i::DOUBLE / na.n, 6) AS c1_in_2,
           round(i::DOUBLE / nb.n, 6) AS c2_in_1
    FROM inter JOIN n na ON na.doc_id = doc1 JOIN n nb ON nb.doc_id = doc2
    WHERE i::DOUBLE / least(na.n, nb.n) >= {CONTAIN_TAU}
    """,
)
def q_text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC n-gram CONTAINMENT pairs: directed containment
    C(A in B) = |A n B| / |A| over word-5-gram sets, keeping pairs
    where the SMALLER document is >= 50% contained in the other.
    Jaccard dedup misses quote-inclusion (a small doc embedded in a
    big one has low Jaccard but containment ~ 1); this is the
    Broder containment complement - the sub-document duplication /
    quotation detector contamination pipelines need.

    Scale shape: the same inverted-index discipline as
    q_dedup_near_jaccard - hashed distinct grams, equi self-join on
    the gram hash, counting aggregate, ratios on the bounded pair
    frame. Word-5-grams are rare (far rarer than char shingles), so
    the index join needs no df cap here; at 100 TB the cap +
    pigeonhole machinery transfers unchanged. Exact-by-contract; the
    sub-quadratic screen is minhash banding on the same gram sets.
    """
    d = table(spark, sf_dir, "documents")
    w = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    grams = (
        d.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= CONTAIN_NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.size("w") - CONTAIN_NGRAM)
            ).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            F.xxhash64(
                F.array_join(
                    F.slice(F.col("w"), F.col("i") + 1, CONTAIN_NGRAM), " "
                )
            ).alias("h"),
        )
        .distinct()
    )
    grams = cached(grams)
    n = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = grams.select(F.col("doc_id").alias("doc1"), "h")
    b = grams.select(F.col("doc_id").alias("doc2"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("i"))
    )
    na = n.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"))
    nb = n.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"))
    return (
        inter.join(na, "doc1")
        .join(nb, "doc2")
        .filter(
            F.col("i").cast("double") / F.least("n1", "n2") >= CONTAIN_TAU
        )
        .select(
            "doc1",
            "doc2",
            F.round(F.col("i").cast("double") / F.col("n1"), 6).alias("c1_in_2"),
            F.round(F.col("i").cast("double") / F.col("n2"), 6).alias("c2_in_1"),
        )
    )


@register(
    "q_text_readability",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')),
                           1) AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835 - 1.015 * (n_words::DOUBLE / n_sentences)
                 - 84.6 * (n_syllables::DOUBLE / n_words), 4) AS flesch
    FROM feats
    WHERE n_words > 0
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH READING-EASE per document, with syllables approximated
    by vowel-group runs (the standard regex proxy) and sentences by
    terminator runs - the readability axis of quality scoring
    (q_text_quality measures junk; this measures register), and a
    grade-level filter for curriculum-style data mixes.

    Scale shape: map-only - three regexp/split counts per row
    straight off the scan, one closed-form expression, no shuffle at
    all. Zero-sentence / zero-syllable docs clamp to 1 (both
    engines) so the formula stays finite; the two divisions run on
    exact integer counts, so 4dp rounding is cross-engine safe.
    """
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.filter(F.split(F.lower("text"), " "), lambda t: t != ""))
    n_sent = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    n_syll = F.greatest(
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
        F.lit(1),
    )
    feats = d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syll.cast("bigint").alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    return feats.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - F.lit(84.6)
            * (F.col("n_syllables").cast("double") / F.col("n_words")),
            4,
        ).alias("flesch"),
    )


@register(
    "q_text_code_detect",
    oracle="""
    SELECT doc_id,
           round(CAST(len(regexp_extract_all(text,
                 '[{}()\\[\\];=<>|&]')) AS DOUBLE)
                 / greatest(length(text), 1), 6) AS symbol_ratio,
           round(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 / greatest(length(text), 1), 6) AS digit_ratio,
           CAST(len(regexp_extract_all(lower(text),
                '\\b(def|class|return|import|function|var|const|if|else|for|while)\\b'))
                AS BIGINT) AS kw_hits,
           CASE WHEN CAST(len(regexp_extract_all(text,
                  '[{}()\\[\\];=<>|&]')) AS DOUBLE)
                  / greatest(length(text), 1) > 0.05
                 AND len(regexp_extract_all(lower(text),
                  '\\b(def|class|return|import|function|var|const|if|else|for|while)\\b'))
                  >= 2
                THEN 1 ELSE 0 END AS code_like
    FROM documents
    """,
)
def q_text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CODE-vs-PROSE detection heuristic: structural-symbol density,
    digit density, and programming-keyword hits, combined into a
    code_like flag (symbol ratio > 5% AND >= 2 keywords) - the
    routing signal that decides whether a document enters the code
    or the prose pipeline (tokenizer, quality model, dedup config
    all differ). On this prose corpus the flag is expected ~0;
    the per-doc feature columns are the operator's real output.

    Scale shape: map-only regexp counting straight off the scan - no
    shuffle, no UDF; identical regex classes on both engines, exact
    integer counts under the 6dp-rounded ratios.
    """
    d = table(spark, sf_dir, "documents")
    sym = F.size(F.expr(r"regexp_extract_all(text, '[{}()\\[\\];=<>|&]', 0)"))
    dig = F.size(F.expr("regexp_extract_all(text, '[0-9]', 0)"))
    kw = F.size(
        F.expr(
            r"regexp_extract_all(lower(text), "
            r"'\\b(def|class|return|import|function|var|const|if|else|for|while)\\b', 0)"
        )
    )
    chars = F.greatest(F.length("text"), F.lit(1))
    sym_ratio = sym.cast("double") / chars
    return d.select(
        "doc_id",
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(dig.cast("double") / chars, 6).alias("digit_ratio"),
        kw.cast("bigint").alias("kw_hits"),
        F.when((sym_ratio > 0.05) & (kw >= 2), 1)
        .otherwise(0)
        .cast("int")
        .alias("code_like"),
    )


@register(
    "q_docs_source_diversity",
    oracle="""
    WITH counts AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, source
    ),
    tot AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_sources,
             sum(c * ln(c)) AS sclnc
      FROM counts GROUP BY lang
    )
    SELECT lang, n_docs, n_sources, entropy,
           round(exp(entropy), 4) AS effective_sources
    FROM (
      SELECT lang, n AS n_docs, n_sources,
             round(ln(n) - sclnc / n, 4) AS entropy
      FROM tot
    )
    """,
)
def q_docs_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE-MIX DIVERSITY per language: Shannon entropy of the
    source distribution and its exponential (the effective number of
    sources) - the data-mix health gauge that catches a language
    silently collapsing onto one crawl source (q_text_ngram_novelty
    sees the symptom; this sees the cause).

    Scale shape: two nested map-side-combinable aggs ((lang, source)
    then lang) via the same grouped-count entropy identity as
    q_text_entropy; output is |langs| rows. exp(round(H)) keeps the
    derived column a pure function of the published entropy.
    """
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count("*").alias("c"))
    tot = counts.groupBy("lang").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_sources"),
        F.sum(F.col("c") * F.log("c")).alias("sclnc"),
    )
    ent = F.round(F.log(F.col("n")) - F.col("sclnc") / F.col("n"), 4)
    return tot.select(
        "lang",
        F.col("n").alias("n_docs"),
        "n_sources",
        ent.alias("entropy"),
        F.round(F.exp(ent), 4).alias("effective_sources"),
    )


COLLOC_MIN_N = 20   # minimum bigram frequency before PMI is meaningful
COLLOC_TOPK = 20


@register(
    "q_text_collocations",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, w, CAST(pos AS BIGINT) AS pos
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS w,
               unnest(range(1, len(list_filter(string_split(lower(text), ' '),
                                               t -> t <> '')) + 1)) AS pos
        FROM documents)
    ),
    bigrams AS (
      SELECT a.w AS wa, b.w AS wb, CAST(count(*) AS BIGINT) AS n_ab
      FROM words a JOIN words b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY a.w, b.w
      HAVING count(*) >= {COLLOC_MIN_N}
    ),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY w
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nu,
             (SELECT CAST(sum(n_ab) AS BIGINT)
              FROM (SELECT a.w AS wa, b.w AS wb,
                           CAST(count(*) AS BIGINT) AS n_ab
                    FROM words a JOIN words b
                      ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                    GROUP BY a.w, b.w)) AS nb
      FROM uni
    )
    SELECT bg.wa, bg.wb, bg.n_ab,
           round(ln((CAST(bg.n_ab AS DOUBLE) / t.nb)
                    / ((CAST(ua.n AS DOUBLE) / t.nu)
                       * (CAST(ub.n AS DOUBLE) / t.nu))), 6) AS pmi
    FROM bigrams bg
    JOIN uni ua ON bg.wa = ua.w
    JOIN uni ub ON bg.wb = ub.w
    CROSS JOIN tot t
    ORDER BY pmi DESC, bg.wa, bg.wb
    LIMIT {COLLOC_TOPK}
    """,
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI-scored word collocations ('strongly associated
    bigrams'): PMI = ln(p(ab) / (p(a) p(b))) over adjacent word
    pairs with a min-frequency gate - the phrase-mining /
    tokenizer-merge-candidate signal (BPE merges and phrase
    detection both start from exactly this table).

    Plan shape: ONE posexplode builds the (doc, pos, word) table;
    bigrams come from a window LEAD on the (doc, pos) ordering (one
    shuffle-sort, whole-stage codegen - NOT a corpus-wide
    higher-order function, per the r6 jaccard lesson); unigram and
    bigram totals are two-phase aggs with the tiny dictionaries
    joined back (AQE broadcasts the HAVING-gated bigram list).
    PMI's log is irrational, so rounding at 6 dp is boundary-safe;
    count ratios inside are identical integer divisions.

    Scale shape: everything shuffles on hashed words/bigrams -
    linear in corpus size; the min-frequency gate caps the PMI
    table long before the top-k.
    """
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(
            "doc_id",
            F.posexplode(
                F.filter(
                    F.split(F.lower(F.col("text")), " "),
                    lambda t: t != "",
                )
            ).alias("pos", "w"),
        )
        .withColumn("pos", (F.col("pos") + 1).cast("bigint"))
    )
    wnext = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        words.withColumn("wb", F.lead("w").over(wnext))
        .filter(F.col("wb").isNotNull())
        .select(F.col("w").alias("wa"), "wb")
    )
    bigram_all = pairs.groupBy("wa", "wb").agg(
        F.count("*").cast("bigint").alias("n_ab")
    )
    bigrams = bigram_all.filter(F.col("n_ab") >= COLLOC_MIN_N)
    uni = words.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
    tot = uni.agg(F.sum("n").cast("bigint").alias("nu")).crossJoin(
        bigram_all.agg(F.sum("n_ab").cast("bigint").alias("nb"))
    )
    ua = uni.select(F.col("w").alias("wa"), F.col("n").alias("na"))
    ub = uni.select(F.col("w").alias("wb"), F.col("n").alias("nb_u"))
    pmi = F.log(
        (F.col("n_ab").cast("double") / F.col("nb"))
        / (
            (F.col("na").cast("double") / F.col("nu"))
            * (F.col("nb_u").cast("double") / F.col("nu"))
        )
    )
    return (
        bigrams.join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(tot))
        .select(
            "wa",
            "wb",
            "n_ab",
            F.round(pmi, 6).alias("pmi"),
            pmi.alias("_ord"),
        )
        .orderBy(F.desc("_ord"), "wa", "wb")
        .limit(COLLOC_TOPK)
        .drop("_ord")
    )


def _lang_confusion_sql(split_expr: str) -> str:
    """Confusion rollup over the shared language-ID classifier."""
    return f"""
    WITH preds AS ({_langid_sql(split_expr)})
    SELECT true_lang, pred_lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(count(*)) OVER (PARTITION BY true_lang) AS BIGINT)
               AS n_true,
           CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY true_lang) AS cell_rate
    FROM preds
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """


@register(
    "q_text_lang_confusion",
    oracle=_lang_confusion_sql("unnest(string_split(lower(text), ' '))"),
)
def q_text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFUSION MATRIX: the stopword-vote classifier
    (q_text_langid) evaluated against the labeled lang column -
    (true, predicted) counts and per-true-language rates, i.e. the
    measured accuracy of the heuristic instead of just its output
    (the q_sim_recall_eval discipline applied to text classification:
    every heuristic in the curation stack should ship with its
    measured error surface).

    Scale shape: the classifier is the shared explode -> conditional
    count agg; the confusion rollup adds one |langs|^2-bounded
    two-phase agg and a partition-total window on that tiny frame.
    cell_rate is an exact integer ratio emitted as ONE identical
    division (never rounded - functions/exact.py).
    """
    load(spark, sf_dir)
    return spark.sql(
        _lang_confusion_sql("explode(split(lower(text), ' '))")
    )


BPE_MERGES = 8  # merge rounds learned


@register("q_text_bpe_merges")  # iterative argmax chain -> rows-only + pin
def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 8 BPE merges over the documents corpus
    (Sennrich et al. 2016): start from characters, repeatedly take
    the highest-frequency adjacent symbol pair (count ties broken
    lexicographically) and fuse it corpus-wide - tokenizer-vocabulary
    induction, the step every LLM data pipeline runs BEFORE token
    counting, packing, or fertility analysis can be defined.

    No SQL oracle by design (each round's pair statistics depend on
    the previous round's argmax - the q_sim_mmr iterative-argmax
    precedent); pinned against an independent pure-Python BPE in
    tests/test_pipeline_props.py.

    Scale shape - the standard two-phase trainer split: phase 1
    (UNBOUNDED, the only corpus pass) is one JVM explode+groupBy to
    the (word, freq) VOCABULARY; phase 2 runs the merge loop over
    that BOUNDED frame in ONE applyInPandas task (HuggingFace/
    sentencepiece train on exactly this collapsed form - pair counts
    weight by word freq, never re-touch the corpus). 100 TB:
    phase 1 is a map-side-combining agg; the vocab frame is
    O(distinct words), and if even that outgrows one task the loop
    shards to per-word pair counting with a 1-row argmax broadcast
    per round (k more tiny shuffles, same result).

    Determinism: merge selection = max(count) then lexicographic
    min (left, right) - a total order; left-to-right non-overlapping
    replacement inside each word.
    """
    return _bpe_merges_df(spark, sf_dir).orderBy("merge_rank")


def _bpe_merges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared BPE trainer frame: (merge_rank, left_sym, right_sym,
    merged, pair_count) - built by q_text_bpe_merges, reused by
    q_text_bpe_encode (the merges are the model; encode applies
    them)."""
    d = table(spark, sf_dir, "documents")
    wc = (
        d.select(
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )

    def learn(pdf: pd.DataFrame) -> pd.DataFrame:
        vocab = {
            tuple(w): int(f) for w, f in zip(pdf["w"], pdf["freq"])
        }
        out = []
        for rank in range(1, BPE_MERGES + 1):
            counts: dict[tuple[str, str], int] = {}
            for syms, f in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + f
            if not counts:
                break
            mx = max(counts.values())
            best = min(p for p in counts if counts[p] == mx)
            nv = {}
            for syms, f in vocab.items():
                merged, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best
                    ):
                        merged.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                nv[tuple(merged)] = nv.get(tuple(merged), 0) + f
            vocab = nv
            out.append(
                (rank, best[0], best[1], best[0] + best[1], counts[best])
            )
        return pd.DataFrame(
            out,
            columns=[
                "merge_rank", "left_sym", "right_sym", "merged", "pair_count"
            ],
        )

    schema = (
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count long"
    )
    return (
        wc.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(learn, schema=schema)
    )


def bpe_apply(word: str, merges: list) -> list:
    """Apply learned merges to one word IN RANK ORDER with
    left-to-right non-overlapping replacement - the exact inverse
    discipline of the trainer, and the reference semantics the
    pinned test replicates independently."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@register("q_text_bpe_encode")  # applies the learned merges -> rows-only
def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the learned BPE merges (VERDICT r12 #3
    - the missing half of q_text_bpe_merges: training produced a
    vocabulary, this applies it, so every downstream token count can
    be a REAL tokenizer count instead of whitespace words). Output
    per document: whitespace word count, BPE token count, fertility
    (tokens per word - the number tokenizer evaluations quote), and
    the doc's most frequent BPE token (count desc, token asc).

    No SQL oracle by design: the encode consumes the iterative-
    argmax merge chain (the q_text_bpe_merges precedent); pinned
    end-to-end against an independent pure-Python train+encode in
    tests/test_pipeline_props.py.

    Scale shape - encode the VOCABULARY, not the corpus: the merge
    table is a bounded driver collect (<= BPE_MERGES rows, a model
    artifact like the PQ codebook); the per-word greedy merge walk
    runs ONCE per distinct word in a mapInPandas pass over the
    (bounded) vocab frame; documents then reach their token counts
    by joining (doc, word, count) against (word, tokens) - pure JVM
    joins/aggs. A 100 TB corpus has ~10^7-10^8 distinct words vs
    ~10^13 word instances: the Python stage touches 5-6 orders of
    magnitude fewer rows than a per-document encoder would, and the
    instance-side work stays whole-stage-codegen.

    q_pack_sequences note (VERDICT r12 #3): this frame's
    bpe_token_count is the drop-in seq_len source for the packing
    family - pack on real tokenizer lengths by substituting it for
    the whitespace n_tokens (documented there; the packing math is
    token-source-agnostic).
    """
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    dw = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    # Bounded driver action: the learned merge table, <= BPE_MERGES
    # (8) rows - a model artifact, not a data collect.
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in _bpe_merges_df(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]

    def enc(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "toks": [bpe_apply(w, merges) for w in pdf["w"]],
                }
            )

    enc_df = (
        dw.select("w")
        .distinct()
        .mapInPandas(enc, schema="w string, toks array<string>")
    )
    doc_tok = (
        dw.join(enc_df, "w")
        .select("doc_id", "cnt", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.sum("cnt").alias("n"))
    )
    return (
        doc_tok.groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("bpe_token_count"),
            F.min(
                F.struct(
                    (-F.col("n")).alias("neg_n"), F.col("tok").alias("t")
                )
            ).alias("top"),
        )
        .join(
            dw.groupBy("doc_id").agg(
                F.sum("cnt").cast("bigint").alias("word_count")
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            "word_count",
            "bpe_token_count",
            (
                F.col("bpe_token_count").cast("double")
                / F.col("word_count")
            ).alias("fertility"),
            F.col("top.t").alias("top_token"),
            (-F.col("top.neg_n")).cast("bigint").alias("top_token_n"),
        )
    )


RAKE_MAXLEN = 3   # discard candidate phrases longer than this
RAKE_TOPK = 10

#: RAKE delimiter lexicon: the union of the language-ID marker
#: stopwords (the corpus is multilingual; each language's markers
#: delimit its own docs' phrases).
_RAKE_STOPS = sorted({w for ws in _LANG_MARKERS.values() for w in ws})


@register(
    "q_text_keyphrase_rake",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, w, CAST(pos AS BIGINT) AS pos,
             CASE WHEN w IN ({", ".join(f"'{w}'" for w in _RAKE_STOPS)})
                  THEN 1 ELSE 0 END AS stop
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS w,
               unnest(range(1, len(list_filter(string_split(lower(text), ' '),
                                               t -> t <> '')) + 1)) AS pos
        FROM documents)
    ),
    seg AS (
      SELECT doc_id, w, pos,
             CAST(sum(stop) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS pid
      FROM words
    ),
    inst_words AS (
      SELECT doc_id, pid, w, pos FROM seg
      WHERE w NOT IN ({", ".join(f"'{w}'" for w in _RAKE_STOPS)})
    ),
    inst AS (
      SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS len,
             string_agg(w, ' ' ORDER BY pos) AS phrase
      FROM inst_words GROUP BY doc_id, pid
      HAVING count(*) <= {RAKE_MAXLEN}
    ),
    kept AS (
      SELECT iw.doc_id, iw.pid, iw.w, i.len, i.phrase
      FROM inst_words iw JOIN inst i
        ON iw.doc_id = i.doc_id AND iw.pid = i.pid
    ),
    wstat AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(len) AS BIGINT) AS deg
      FROM kept GROUP BY w
    ),
    scored AS (
      SELECT k.doc_id, k.pid, k.phrase,
             round(sum(CAST(s.deg AS DOUBLE) / s.freq), 6) AS score
      FROM kept k JOIN wstat s ON k.w = s.w
      GROUP BY k.doc_id, k.pid, k.phrase
    )
    SELECT phrase, CAST(count(*) AS BIGINT) AS n_occur,
           max(score) AS score
    FROM scored GROUP BY phrase
    ORDER BY score DESC, phrase LIMIT {RAKE_TOPK}
    """,
)
def q_text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-delimited runs (cap 3
    words; the delimiter lexicon is the language-ID marker union, so
    each language's own stopwords segment its docs), each word is
    scored deg/freq over candidate occurrences (deg = summed length
    of containing phrases - favors words that travel in long
    phrases), and a phrase scores the sum of its word scores -
    corpus-level keyphrases WITHOUT tf-idf's per-doc frame, the
    classic unsupervised complement to q_text_tfidf. Top-10 with
    occurrence counts.

    Determinism: segmentation is a per-doc running stopword count
    (integer window); deg/freq are exact int64 so each word score
    is ONE IEEE division; only the <=3-term phrase-score sum is
    rounded (6dp - group-sum order is the one nondeterminism, the
    PSI rule); top-k boundary ties break on the phrase string.

    Scale shape: ONE tokenize pass -> per-doc window for segment
    ids (doc-partitioned, bounded) -> two-phase word-stat agg ->
    broadcast word scores back onto instances -> phrase agg + a
    TakeOrderedAndProject top-k. No all-pairs anything; the
    vocabulary and phrase tables are the only shuffles. 100 TB:
    identical - this is a pure map/agg pipeline over tokens.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("pos0", "w"),
    ).select(
        "doc_id",
        F.col("w"),
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.when(F.col("w").isin(_RAKE_STOPS), 1).otherwise(0).alias("stop"),
    )
    wp = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = toks.select(
        "doc_id",
        "w",
        "pos",
        "stop",
        F.sum("stop").over(wp).cast("bigint").alias("pid"),
    )
    inst_words = seg.filter(F.col("stop") == 0).select(
        "doc_id", "pid", "w", "pos"
    )
    inst = (
        inst_words.groupBy("doc_id", "pid")
        .agg(
            F.count("*").cast("bigint").alias("len"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("phrase"),
        )
        .filter(F.col("len") <= RAKE_MAXLEN)
    )
    kept = inst_words.join(inst, ["doc_id", "pid"]).select(
        "doc_id", "pid", "w", "len", "phrase"
    )
    wstat = kept.groupBy("w").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("len").cast("bigint").alias("deg"),
    )
    scored = (
        kept.join(F.broadcast(wstat), "w")
        .groupBy("doc_id", "pid", "phrase")
        .agg(
            F.round(
                F.sum(F.col("deg").cast("double") / F.col("freq")), 6
            ).alias("score")
        )
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.count("*").cast("bigint").alias("n_occur"),
            F.max("score").alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(RAKE_TOPK)
        .select("phrase", "n_occur", "score")
    )


BM25_K1 = "1.2"
BM25_B = "0.75"
BM25_QUERY = ("spark", "join", "stream")  # fixed content-term query
BM25_TOPK = 10


@register(
    "q_text_bm25",
    oracle=f"""
    WITH words AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS w
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM words GROUP BY doc_id),
    corp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len
      FROM dl
    ),
    tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM words
      WHERE w IN ({", ".join(f"'{t}'" for t in BM25_QUERY)})
      GROUP BY doc_id, w
    ),
    df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
    scored AS (
      SELECT t.doc_id,
             ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (t.tf * ({BM25_K1} + 1.0))
             / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * (CAST(l.dl * c.n_docs AS DOUBLE)
                              / c.total_len))) AS s
      FROM tf t
      JOIN df d ON t.w = d.w
      JOIN dl l ON t.doc_id = l.doc_id
      CROSS JOIN corp c
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
             round(sum(s), 6) AS bm25
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_terms_hit, bm25 FROM agg
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (k1=1.2, b=0.75, Lucene's +1 idf form)
    for a fixed 3-term query over the corpus: term-frequency
    saturation plus document-length normalization - the lexical
    scoring standard every hybrid RAG stack runs NEXT TO dense
    cosine retrieval (q_sim_cosine_topk), and what q_text_tfidf's
    raw tf*idf lacks (unbounded tf reward, no length prior). Top-10
    docs with per-doc matched-term counts.

    Exactness: tf / df / dl / N are exact int64 from two-phase
    aggs; dl/avgdl is composed as dl*N/total_len (int64 product,
    ONE division); idf's ln is the only libm term and the <=3-term
    per-doc score sum the only order surface - both under the 6dp
    round (PSI rule); top-k ties break on doc_id.

    Scale shape: ONE tokenize pass feeds both the dl frame and the
    query-filtered tf frame (the WHERE prunes to query terms BEFORE
    the tf agg - the inverted-index access path); df and corpus
    stats are tiny broadcasts; final is a TakeOrderedAndProject.
    100 TB: identical - this IS the batch side of an inverted
    index build + probe.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("w"),
    )
    dl = words.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dl")
    )
    corp = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    tf = (
        words.filter(F.col("w").isin(*BM25_QUERY))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count("*").cast("bigint").alias("df"))
    k1, b = float(BM25_K1), float(BM25_B)
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm_len = (F.col("dl") * F.col("n_docs")).cast("double") / F.col(
        "total_len"
    )
    s = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * norm_len))
    )
    scored = (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corp))
        .select("doc_id", s.alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms_hit"),
            F.round(F.sum("s"), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOPK)
    )


RRF_K = 60  # the standard reciprocal-rank-fusion constant


@register(
    "q_sim_rank_fusion",
    oracle=f"""
    WITH words AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS w
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM words GROUP BY doc_id),
    corp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len
      FROM dl
    ),
    tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM words
      WHERE w IN ({", ".join(f"'{t}'" for t in BM25_QUERY)})
      GROUP BY doc_id, w
    ),
    df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
    bm25 AS (
      SELECT t.doc_id, round(sum(
               ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (t.tf * ({BM25_K1} + 1.0))
               / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * (CAST(l.dl * c.n_docs AS DOUBLE)
                                / c.total_len)))), 6) AS s
      FROM tf t JOIN df d ON t.w = d.w
      JOIN dl l ON t.doc_id = l.doc_id CROSS JOIN corp c
      GROUP BY t.doc_id
    ),
    tfidf AS (
      SELECT t.doc_id,
             round(sum(t.tf * ln(CAST(c.n_docs AS DOUBLE) / d.df)), 6)
                 AS s
      FROM tf t JOIN df d ON t.w = d.w CROSS JOIN corp c
      GROUP BY t.doc_id
    ),
    ra AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id)
               AS r FROM bm25),
    rb AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id)
               AS r FROM tfidf),
    fused AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             CAST(a.r AS BIGINT) AS rank_bm25,
             CAST(b.r AS BIGINT) AS rank_tfidf,
             round(COALESCE(1.0 / ({RRF_K} + a.r), 0.0)
                   + COALESCE(1.0 / ({RRF_K} + b.r), 0.0), 9) AS rrf
      FROM ra a FULL OUTER JOIN rb b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, rank_bm25, rank_tfidf, rrf FROM fused
    ORDER BY rrf DESC, doc_id LIMIT {BM25_TOPK}
    """,
)
def q_sim_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack 2009, k=60) of two retrieval
    rankings for the same 3-term query - BM25 (saturating,
    length-normalized) and plain tf*idf (the sum q_text_tfidf
    popularized) - into one fused top-10: RRF(d) = sum_r
    1/(60 + rank_r(d)), the scoreless combiner every hybrid-search
    stack (lexical + dense) uses BECAUSE it needs no score
    calibration between systems; fusing two lexical rankings here
    keeps the oracle exact, and the dense-side ranking
    (q_sim_cosine_topk) plugs into the identical shape.

    Determinism: both component scores are 6dp-rounded before
    ranking (engine-stable order, doc_id tie-break); ranks are
    int64; the fused score is a sum of two exact reciprocals,
    9dp-rounded; final ties break on doc_id.

    Scale shape: the shared inverted-index probe (tf frame) feeds
    both scorers; each ranking is one ordered window over the
    MATCHED docs only (query-pruned, never the corpus); the fusion
    is a full outer join of two rank lists - at scale each system
    returns its top-k' and RRF fuses k'-sized lists, shuffling
    nothing larger.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("w"),
    )
    dl = words.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dl")
    )
    corp = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    tf = (
        words.filter(F.col("w").isin(*BM25_QUERY))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count("*").cast("bigint").alias("df"))
    k1, b = float(BM25_K1), float(BM25_B)
    base = tf.join(F.broadcast(df), "w").crossJoin(F.broadcast(corp))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm_len = (F.col("dl") * F.col("n_docs")).cast("double") / F.col(
        "total_len"
    )
    bm25 = (
        base.join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    idf
                    * (F.col("tf") * (k1 + 1.0))
                    / (F.col("tf") + k1 * (1.0 - b + b * norm_len))
                ),
                6,
            ).alias("s")
        )
    )
    tfidf = base.groupBy("doc_id").agg(
        F.round(
            F.sum(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ),
            6,
        ).alias("s")
    )
    # Distributed ranks (r7): bucketed two-pass row_number per ranker
    # instead of two unpartitioned windows (Exchange SinglePartition
    # single-task sorts over the scored-doc frames - r6 audit
    # finding); at RRF scale each list ranks in parallel.
    ra = global_order(
        bm25.withColumn("_ns", -F.col("s")),
        "_ns", [F.desc("s"), F.col("doc_id")],
        rank_name="rank_bm25",
    ).select(F.col("doc_id").alias("da"), "rank_bm25")
    rb = global_order(
        tfidf.withColumn("_ns", -F.col("s")),
        "_ns", [F.desc("s"), F.col("doc_id")],
        rank_name="rank_tfidf",
    ).select(F.col("doc_id").alias("db"), "rank_tfidf")
    fused = ra.join(rb, F.col("da") == F.col("db"), "full_outer").select(
        F.coalesce("da", "db").alias("doc_id"),
        "rank_bm25",
        "rank_tfidf",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("rank_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rank_tfidf")), F.lit(0.0)),
            9,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(BM25_TOPK)


@register(
    "q_text_heaps_law",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS w
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM words GROUP BY doc_id),
    first_seen AS (
      SELECT w, CAST(min(doc_id) AS BIGINT) AS fd FROM words GROUP BY w
    ),
    new_per_doc AS (
      SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS nv
      FROM first_seen GROUP BY fd
    ),
    curve AS (
      SELECT d.doc_id,
             CAST(sum(d.dl) OVER w AS BIGINT) AS cum_tokens,
             CAST(sum(COALESCE(n.nv, 0)) OVER w AS BIGINT) AS vocab
      FROM dl d LEFT JOIN new_per_doc n ON d.doc_id = n.doc_id
      WINDOW w AS (ORDER BY d.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(ln(CAST(cum_tokens AS DOUBLE))) AS sx,
             sum(ln(CAST(vocab AS DOUBLE))) AS sy,
             sum(ln(CAST(cum_tokens AS DOUBLE))
                 * ln(CAST(vocab AS DOUBLE))) AS sxy,
             sum(ln(CAST(cum_tokens AS DOUBLE))
                 * ln(CAST(cum_tokens AS DOUBLE))) AS sxx,
             max(cum_tokens) AS total_tokens,
             max(vocab) AS total_vocab
      FROM curve
    )
    SELECT n AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(total_vocab AS BIGINT) AS total_vocab,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
           round(exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                      * sx) / n), 4) AS k
    FROM ols
    """,
)
def q_text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(T) = K * T^beta of vocabulary growth over
    the corpus read in doc_id order: the sublinear vocab-vs-tokens
    exponent (typically 0.4-0.6 for natural text) that predicts how
    a TOKENIZER VOCABULARY or index dictionary will grow with the
    next 10x of data - the forward-looking complement to
    q_text_zipf's static frequency fit (the two laws are duals) and
    q_text_vocab's point count. Fit by log-log OLS over the per-doc
    cumulative (tokens, vocab) curve.

    Determinism: the growth curve is EXACT int64 - new words per
    doc via a min-doc-id first-occurrence agg, both cumulatives as
    integer window sums; the OLS runs on ln of those exact integers
    (libm surface + |docs|-term sums, behind the 6dp/4dp rounds -
    the q_stats_ols_trend rule).

    Scale shape: one tokenize pass feeds the per-doc lengths AND
    the first-occurrence agg (two-phase on word); the curve's two
    cumulatives run through the bucketed two-pass distributed cumsum
    (operators/ranks.py - r7; an unpartitioned window would be an
    Exchange SinglePartition single-task sort); the fit is a 1-row
    power-sum agg. 100 TB: identical - checkpoints thin to every
    k-th doc, same algebra.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("w"),
    )
    dl = words.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dl")
    )
    first_seen = words.groupBy("w").agg(
        F.min("doc_id").cast("bigint").alias("fd")
    )
    new_per_doc = first_seen.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("nv")
    )
    # Distributed cumulatives (r7): bucketed two-pass cumsum over the
    # per-doc frame instead of an unpartitioned window (Exchange
    # SinglePartition single-task sort - r6 audit finding).
    per_doc = dl.join(new_per_doc, "doc_id", "left").withColumn(
        "nv0", F.coalesce("nv", F.lit(0))
    )
    curve = global_order(
        per_doc, "doc_id", [F.col("doc_id")],
        cumsum={"dl": "cum_tokens", "nv0": "vocab"},
    ).select(
        "doc_id",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        F.col("vocab").cast("bigint").alias("vocab"),
    )
    lx = F.log(F.col("cum_tokens").cast("double"))
    ly = F.log(F.col("vocab").cast("double"))
    ols = curve.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
        F.max("cum_tokens").alias("total_tokens"),
        F.max("vocab").alias("total_vocab"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return ols.select(
        F.col("n").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("total_vocab").cast("bigint").alias("total_vocab"),
        F.round(slope, 6).alias("beta"),
        F.round(
            F.exp((F.col("sy") - slope * F.col("sx")) / F.col("n")), 4
        ).alias("k"),
    )


def _kappa_sql(split_expr: str) -> str:
    """Cohen's kappa over the shared language-ID classifier."""
    return f"""
    WITH preds AS ({_langid_sql(split_expr)}),
    cells AS (
      SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM preds GROUP BY true_lang, pred_lang
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(CASE WHEN true_lang = pred_lang THEN n
                           ELSE 0 END) AS BIGINT) AS agree
      FROM cells
    ),
    r AS (SELECT true_lang AS lang, CAST(sum(n) AS BIGINT) AS rt
          FROM cells GROUP BY true_lang),
    c AS (SELECT pred_lang AS lang, CAST(sum(n) AS BIGINT) AS ct
          FROM cells GROUP BY pred_lang),
    pe AS (
      SELECT CAST(sum(r.rt * c.ct) AS BIGINT) AS pe2
      FROM r JOIN c ON r.lang = c.lang
    )
    SELECT t.nn AS n_docs, t.agree,
           CAST(t.agree AS DOUBLE) / t.nn AS p_observed,
           CAST(p.pe2 AS DOUBLE) / (t.nn * t.nn) AS p_expected,
           (CAST(t.agree AS DOUBLE) / t.nn
            - CAST(p.pe2 AS DOUBLE) / (t.nn * t.nn))
             / (1.0 - CAST(p.pe2 AS DOUBLE) / (t.nn * t.nn)) AS kappa
    FROM tot t CROSS JOIN pe p
    """


@register(
    "q_stats_cohens_kappa",
    oracle=_kappa_sql("unnest(string_split(lower(text), ' '))"),
)
def q_stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the language-ID heuristic and the
    labeled lang column: chance-corrected agreement (po - pe)/(1 -
    pe) - the one-number upgrade over raw accuracy when classes are
    imbalanced (a majority-class guesser scores high accuracy but
    kappa ~ 0), and the standard agreement statistic for comparing
    any two labelers (model vs model, model vs human) in a
    curation stack. Builds on q_text_lang_confusion's matrix:
    that operator shows WHERE disagreement lives, kappa says HOW
    MUCH exceeds chance.

    Exactness: cell counts / marginals / the pe cross-product sum
    are exact int64 (pe2 <= N^2 - safe through sf100); po, pe and
    kappa are compositions of TWO integer divisions in the
    identical tree, UNROUNDED.

    Scale shape: the shared classifier agg -> |langs|^2 cell frame
    -> marginal aggs on the bounded frame -> 1-row arithmetic.
    100 TB: identical.
    """
    load(spark, sf_dir)  # registers the documents temp view
    return spark.sql(_kappa_sql("explode(split(lower(text), ' '))"))


AUTOCOMPLETE_PREFIX = 3
AUTOCOMPLETE_K = 3
AUTOCOMPLETE_MIN_LEN = 4


@register(
    "q_text_autocomplete",
    oracle=f"""
    WITH words AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                t -> len(t) >= {AUTOCOMPLETE_MIN_LEN}))
                 AS w
      FROM documents
    ),
    freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY w
    ),
    pref AS (
      SELECT substr(w, 1, {AUTOCOMPLETE_PREFIX}) AS prefix, w, n,
             row_number() OVER (
               PARTITION BY substr(w, 1, {AUTOCOMPLETE_PREFIX})
               ORDER BY n DESC, w) AS rk
      FROM freq
    )
    SELECT prefix, CAST(rk AS BIGINT) AS rank, w AS completion, n
    FROM pref WHERE rk <= {AUTOCOMPLETE_K}
    ORDER BY prefix, rank
    """,
)
def q_text_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete index build: for every 3-character prefix, the
    top-3 corpus completions by frequency (word tie-break) - the
    batch side of type-ahead search (the index a serving layer
    loads keyed by prefix), and the simplest instance of the
    "group by prefix, rank within" shape that also powers query
    -suggestion mining. Words shorter than the prefix+1 are
    excluded (nothing to complete).

    Determinism: integer frequencies from one two-phase word agg;
    the per-prefix ranking orders (n DESC, word) - ties on count
    fall to the lexicographic word, identical in both engines.

    Scale shape: ONE tokenize pass -> word-frequency agg (map-side
    combine) -> prefix window with IN-SHUFFLE top-k pruning
    (WindowGroupLimit) - the vocabulary, not the corpus, is what
    shuffles. 100 TB: identical; longer prefixes just widen the
    partition key.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.filter(
                F.split(F.lower("text"), " "),
                lambda t: F.length(t) >= AUTOCOMPLETE_MIN_LEN,
            )
        ).alias("w")
    )
    freq = words.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
    prefix = F.substring("w", 1, AUTOCOMPLETE_PREFIX)
    wp = Window.partitionBy(prefix).orderBy(F.desc("n"), "w")
    return (
        freq.select(
            prefix.alias("prefix"),
            "w",
            "n",
            F.row_number().over(wp).cast("bigint").alias("rank"),
        )
        .filter(F.col("rank") <= AUTOCOMPLETE_K)
        .select("prefix", "rank", F.col("w").alias("completion"), "n")
        .orderBy("prefix", "rank")
    )


@register(
    "q_text_lang_divergence",
    oracle="""
    WITH words AS (
      SELECT lang,
             unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS w
      FROM documents
    ),
    counts AS (
      SELECT lang, w, CAST(count(*) AS BIGINT) AS n
      FROM words GROUP BY lang, w
    ),
    totals AS (
      SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM counts
      GROUP BY lang
    ),
    vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vv
              FROM counts),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b
      FROM totals a JOIN totals b ON a.lang < b.lang
    ),
    cells AS (
      SELECT p.lang_a, p.lang_b, w.w,
             COALESCE(ca.n, 0) AS na, COALESCE(cb.n, 0) AS nb,
             ta.tot AS tta, tb.tot AS ttb, v.vv
      FROM pairs p
      CROSS JOIN (SELECT DISTINCT w FROM counts) w
      CROSS JOIN vocab v
      LEFT JOIN counts ca ON ca.lang = p.lang_a AND ca.w = w.w
      LEFT JOIN counts cb ON cb.lang = p.lang_b AND cb.w = w.w
      JOIN totals ta ON ta.lang = p.lang_a
      JOIN totals tb ON tb.lang = p.lang_b
    ),
    jsd AS (
      SELECT lang_a, lang_b,
             sum(0.5 * ((na + 0.5) / (tta + vv * 0.5))
                 * ln(((na + 0.5) / (tta + vv * 0.5))
                      / (0.5 * ((na + 0.5) / (tta + vv * 0.5))
                         + 0.5 * ((nb + 0.5) / (ttb + vv * 0.5))))
                 + 0.5 * ((nb + 0.5) / (ttb + vv * 0.5))
                   * ln(((nb + 0.5) / (ttb + vv * 0.5))
                        / (0.5 * ((na + 0.5) / (tta + vv * 0.5))
                           + 0.5 * ((nb + 0.5) / (ttb + vv * 0.5)))))
                 AS d
      FROM cells GROUP BY lang_a, lang_b
    )
    SELECT lang_a, lang_b, round(d, 6) AS jsd_nats
    FROM jsd ORDER BY lang_a, lang_b
    """,
)
def q_text_lang_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence matrix between the five
    languages' unigram distributions (+0.5 smoothing over the
    shared vocabulary): which sub-corpora are linguistically close
    - the corpus-comparison readout behind mixture design
    (q_mix_weighted decides HOW MUCH of each language;
    this says HOW DIFFERENT they are, which is what transfer /
    curriculum decisions key on), and q_stats_jsd's scalar lifted
    to a distribution-over-vocabulary per pair.

    Determinism: counts/totals/vocab are exact int64; each term is
    integer ratios through ln over the (pair x vocab) frame - the
    vocab-sized sums are the order surface behind the 6dp round
    (PSI rule).

    Scale shape: ONE tokenize pass -> (lang, word) counts; the
    pair x vocab expansion is bounded by |langs|^2 x |vocab| (a
    vocabulary-scale frame, not corpus-scale) and aggregates
    map-side. 100 TB: identical - vocabulary grows ~T^0.5 (the
    measured q_text_heaps_law exponent), not with T.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("w"),
    )
    counts = words.groupBy("lang", "w").agg(
        F.count("*").cast("bigint").alias("n")
    )
    totals = counts.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("tot")
    )
    vocab = counts.agg(
        F.count_distinct(F.col("w")).cast("bigint").alias("vv")
    )
    pairs = (
        totals.alias("a")
        .join(totals.alias("b"), F.col("a.lang") < F.col("b.lang"))
        .select(
            F.col("a.lang").alias("lang_a"),
            F.col("b.lang").alias("lang_b"),
            F.col("a.tot").alias("tta"),
            F.col("b.tot").alias("ttb"),
        )
    )
    vocab_words = counts.select("w").distinct()
    ca = counts.select(
        F.col("lang").alias("la"), F.col("w").alias("wa"),
        F.col("n").alias("na"),
    )
    cb = counts.select(
        F.col("lang").alias("lb"), F.col("w").alias("wb"),
        F.col("n").alias("nb"),
    )
    cells = (
        pairs.crossJoin(vocab_words)
        .crossJoin(F.broadcast(vocab))
        .join(
            ca,
            (F.col("la") == F.col("lang_a")) & (F.col("wa") == F.col("w")),
            "left",
        )
        .join(
            cb,
            (F.col("lb") == F.col("lang_b")) & (F.col("wb") == F.col("w")),
            "left",
        )
        .select(
            "lang_a",
            "lang_b",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
            "tta",
            "ttb",
            "vv",
        )
    )
    pa = (F.col("na") + 0.5) / (F.col("tta") + F.col("vv") * 0.5)
    pb = (F.col("nb") + 0.5) / (F.col("ttb") + F.col("vv") * 0.5)
    m = 0.5 * pa + 0.5 * pb
    term = 0.5 * pa * F.log(pa / m) + 0.5 * pb * F.log(pb / m)
    return (
        cells.groupBy("lang_a", "lang_b")
        .agg(F.round(F.sum(term), 6).alias("jsd_nats"))
        .orderBy("lang_a", "lang_b")
    )


def _langid_weak_sql(split_expr: str) -> str:
    """Ablated language-ID: votes from only the FIRST marker word of
    each language (the single-feature baseline McNemar compares
    against)."""
    hit_cols = []
    for lang, words in _LANG_MARKERS.items():
        hit_cols.append(
            f"count(*) FILTER (WHERE token = '{words[0]}') AS hits_{lang}"
        )
    hits = ",\n             ".join(hit_cols)
    greatest = ", ".join(f"hits_{lang}" for lang in _LANG_MARKERS)
    cases = "\n                ".join(
        f"WHEN hits_{lang} = best AND best > 0 THEN '{lang}'"
        for lang in _LANG_MARKERS
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, lang AS true_lang, {split_expr} AS token FROM documents
    ),
    hits AS (
      SELECT doc_id, true_lang,
             {hits}
      FROM toks GROUP BY doc_id, true_lang
    ),
    scored AS (
      SELECT *, greatest({greatest}) AS best FROM hits
    )
    SELECT doc_id, true_lang,
           CASE {cases}
                ELSE 'und' END AS pred_lang
    FROM scored
    """


def _mcnemar_sql(split_expr: str) -> str:
    return f"""
    WITH a AS ({_langid_sql(split_expr)}),
    b AS ({_langid_weak_sql(split_expr)}),
    paired AS (
      SELECT CASE WHEN a.pred_lang = a.true_lang THEN 1 ELSE 0 END
                 AS a_ok,
             CASE WHEN b.pred_lang = b.true_lang THEN 1 ELSE 0 END
                 AS b_ok
      FROM a JOIN b ON a.doc_id = b.doc_id
    ),
    cells AS (
      SELECT CAST(sum(a_ok * b_ok) AS BIGINT) AS both_ok,
             CAST(sum(a_ok * (1 - b_ok)) AS BIGINT) AS only_a,
             CAST(sum((1 - a_ok) * b_ok) AS BIGINT) AS only_b,
             CAST(sum((1 - a_ok) * (1 - b_ok)) AS BIGINT) AS both_bad
      FROM paired
    )
    SELECT both_ok, only_a, only_b, both_bad,
           round((abs(CAST(only_a - only_b AS DOUBLE)) - 1.0)
                 * (abs(CAST(only_a - only_b AS DOUBLE)) - 1.0)
                 / nullif(only_a + only_b, 0), 6) AS mcnemar_chi2,
           CASE WHEN (abs(CAST(only_a - only_b AS DOUBLE)) - 1.0)
                     * (abs(CAST(only_a - only_b AS DOUBLE)) - 1.0)
                     / nullif(only_a + only_b, 0) > 3.841458820694124
                THEN 1 ELSE 0 END AS significant
    FROM cells
    """


@register(
    "q_stats_mcnemar",
    oracle=_mcnemar_sql("unnest(string_split(lower(text), ' '))"),
)
def q_stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test between the FULL language-ID classifier (five
    marker words per language) and a single-marker ABLATION on the
    same documents: the paired classifier-comparison test - only
    DISCORDANT docs (one right, the other wrong) carry information,
    so chi2 = (|b - c| - 1)^2/(b + c) with continuity correction,
    against the literal chi2_1 95% critical. THE correct test when
    two models score the SAME examples (an unpaired two-proportion
    test throws away the pairing and loses power) - the missing
    member of the eval family next to q_stats_cohens_kappa
    (agreement) and q_sim_ndcg (ranking).

    Exactness: the 2x2 paired cells are int64 from one join-agg of
    two deterministic classifier runs; chi2 is integer arithmetic
    through ONE nullif-guarded division (6dp) and the significance
    flag compares to a literal.

    Scale shape: the classifier is the shared explode ->
    conditional agg (run twice - at scale, both ablations compute
    in ONE pass with two vote column sets); the pairing join is on
    doc_id. 100 TB: identical.
    """
    load(spark, sf_dir)  # registers the documents temp view
    return spark.sql(_mcnemar_sql("explode(split(lower(text), ' '))"))


PRF_FEEDBACK_DOCS = 3
PRF_EXPANSION_TERMS = 2

_PRF_BASE_CTES = f"""
    words AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS w
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM words GROUP BY doc_id),
    corp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len
      FROM dl
    ),
    alltf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM words GROUP BY doc_id, w
    ),
    alldf AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM alltf
              GROUP BY w)"""


def _prf_bm25_sql(terms_cte: str) -> str:
    """BM25 scoring against a (term) CTE named {terms_cte}."""
    return f"""
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hit,
             round(sum(
               ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (t.tf * ({BM25_K1} + 1.0))
               / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * (CAST(l.dl * c.n_docs AS DOUBLE)
                                / c.total_len)))), 6) AS s
      FROM alltf t
      JOIN {terms_cte} q ON t.w = q.term
      JOIN alldf d ON t.w = d.w
      JOIN dl l ON t.doc_id = l.doc_id
      CROSS JOIN corp c
      GROUP BY t.doc_id
    """


@register(
    "q_sim_query_expansion",
    oracle=f"""
    WITH {_PRF_BASE_CTES},
    q0 AS (SELECT unnest(['{"', '".join(BM25_QUERY)}']) AS term),
    base AS ({_prf_bm25_sql("q0")}),
    fb AS (
      SELECT doc_id FROM base
      ORDER BY s DESC, doc_id LIMIT {PRF_FEEDBACK_DOCS}
    ),
    cand AS (
      SELECT t.w,
             round(sum(t.tf * ln(CAST(c.n_docs AS DOUBLE) / d.df)), 6)
                 AS score
      FROM alltf t JOIN fb ON t.doc_id = fb.doc_id
      JOIN alldf d ON t.w = d.w CROSS JOIN corp c
      WHERE t.w NOT IN ('{"', '".join(BM25_QUERY)}')
        AND t.w NOT IN ({", ".join(f"'{w}'" for w in _RAKE_STOPS)})
      GROUP BY t.w
    ),
    exp_terms AS (
      SELECT w AS term FROM cand ORDER BY score DESC, w
      LIMIT {PRF_EXPANSION_TERMS}
    ),
    q1 AS (SELECT term FROM q0 UNION ALL SELECT term FROM exp_terms),
    expanded AS ({_prf_bm25_sql("q1")}),
    en AS (
      SELECT string_agg(term, ',' ORDER BY term) AS added
      FROM exp_terms
    )
    SELECT e.doc_id, e.n_hit, e.s AS bm25_expanded, en.added
    FROM expanded e CROSS JOIN en
    ORDER BY e.s DESC, e.doc_id LIMIT {BM25_TOPK}
    """,
)
def q_sim_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio/RM-lite):
    run BM25 for the base 3-term query, take the top-3 docs AS IF
    relevant, mine their 2 strongest tf-idf terms (stopword-
    lexicon and original terms excluded), and re-run BM25 with the
    expanded 5-term query - the classical recall-booster every
    lexical search stack ships (and the lexical twin of
    embedding-side HyDE-style expansion), completing the retrieval
    family: q_text_bm25 scores, q_sim_rank_fusion combines,
    this one REFORMULATES.

    Determinism: both BM25 passes inherit the 6dp-rounded scoring
    protocol; feedback-doc and expansion-term cuts order by
    (score DESC, id/word) - engine-stable; the added terms ride
    along as one sorted CSV column so the hash also pins WHAT was
    added, not just the final ranking.

    Scale shape: ONE tokenize pass feeds everything (tf/df/dl
    computed once, probed by BOTH query stages - the inverted-index
    build/probe split again); the feedback mining runs on 3 docs'
    postings. 100 TB: identical; the second probe costs one more
    index lookup per expanded term.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("w"),
    )
    # dl and alltf are consumed by BOTH bm25 passes plus the
    # feedback-term miner (4 references of the corpus tokenize):
    # cache the two aggregated frames so the explode+agg runs once
    # per frame instead of once per consumer (r14). cached(), not a
    # checkpoint: the consumers are interleaved small joins and a
    # checkpoint's materialization barrier measured SLOWER than the
    # duplicate work it saved (2.67s -> 3.65s), while the cache
    # fills on first use with no extra job.
    dl = cached(
        words.groupBy("doc_id").agg(
            F.count("*").cast("bigint").alias("dl")
        )
    )
    corp = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    alltf = cached(
        words.groupBy("doc_id", "w").agg(
            F.count("*").cast("bigint").alias("tf")
        )
    )
    alldf = alltf.groupBy("w").agg(
        F.count("*").cast("bigint").alias("df")
    )
    k1, b = float(BM25_K1), float(BM25_B)

    def bm25_for(terms_df):
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        )
        norm_len = (F.col("dl") * F.col("n_docs")).cast("double") / F.col(
            "total_len"
        )
        sc = (
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * norm_len))
        )
        return (
            alltf.join(
                F.broadcast(terms_df), F.col("w") == F.col("term")
            )
            .join(F.broadcast(alldf), "w")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(corp))
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("bigint").alias("n_hit"),
                F.round(F.sum(sc), 6).alias("s"),
            )
        )

    q0 = spark.createDataFrame(
        [(t,) for t in BM25_QUERY], "term string"
    )
    base = bm25_for(q0)
    fb = base.orderBy(F.desc("s"), "doc_id").limit(
        PRF_FEEDBACK_DOCS
    ).select("doc_id")
    cand = (
        alltf.join(F.broadcast(fb), "doc_id")
        .filter(
            ~F.col("w").isin(*BM25_QUERY)
            & ~F.col("w").isin(_RAKE_STOPS)
        )
        .join(F.broadcast(alldf), "w")
        .crossJoin(F.broadcast(corp))
        .groupBy("w")
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("n_docs").cast("double") / F.col("df"))
                ),
                6,
            ).alias("score")
        )
    )
    # exp_terms feeds the expanded query AND the 'added' summary:
    # cache the <= PRF_EXPANSION_TERMS-row frame so the feedback
    # mining runs once (r14; cached not checkpointed, see dl note).
    exp_terms = cached(
        cand.orderBy(F.desc("score"), "w")
        .limit(PRF_EXPANSION_TERMS)
        .select(F.col("w").alias("term"))
    )
    q1 = q0.unionAll(exp_terms)
    expanded = bm25_for(q1)
    en = exp_terms.agg(
        F.array_join(F.sort_array(F.collect_list("term")), ",").alias(
            "added"
        )
    )
    return (
        expanded.crossJoin(F.broadcast(en))
        .select(
            "doc_id",
            "n_hit",
            F.col("s").alias("bm25_expanded"),
            "added",
        )
        .orderBy(F.desc("bm25_expanded"), "doc_id")
        .limit(BM25_TOPK)
    )


LEN_OUTLIER_LO = 5   # drop below the p5 token-length order statistic
LEN_OUTLIER_HI = 95  # and above the p95


@register(
    "q_docs_length_outliers",
    oracle=f"""
    WITH lens AS (
      SELECT CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS toks
      FROM documents
    ),
    g AS (
      SELECT toks, CAST(count(*) AS BIGINT) AS c FROM lens GROUP BY toks
    ),
    cg AS (
      SELECT toks, c,
             CAST(sum(c) OVER (ORDER BY toks
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM g
    ),
    b AS (
      SELECT max(n) AS n,
             min(CASE WHEN cum >= ({LEN_OUTLIER_LO} * n + 99) // 100
                      THEN toks END) AS lo,
             min(CASE WHEN cum >= ({LEN_OUTLIER_HI} * n + 99) // 100
                      THEN toks END) AS hi
      FROM cg
    )
    SELECT CASE WHEN g.toks < b.lo THEN 'short'
                WHEN g.toks > b.hi THEN 'long'
                ELSE 'kept' END AS outcome,
           CAST(sum(g.c) AS BIGINT) AS n_docs,
           CAST(sum(g.toks * g.c) AS BIGINT) AS total_tokens,
           round(CAST(sum(g.c) AS DOUBLE) / max(b.n), 6) AS doc_share
    FROM g CROSS JOIN b
    GROUP BY 1 ORDER BY 1
    """,
)
def q_docs_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length ORDER-STATISTIC outlier filter over the corpus:
    classify every document against the exact [p5, p95] whitespace-
    token-count bounds - the first knife of any curation funnel
    (truncated fragments below, boilerplate/concatenation monsters
    above), reported as kept/short/long counts with their token
    mass so the cut's data cost is visible before it runs. Exact
    bounds matter here because the length distribution is exactly
    where web corpora are heavy-tailed and sketch rank error
    concentrates (the q_stats_sketch_error lesson applied to
    curation; q_text_quality filters on CONTENT, this on SIZE).

    Exactness: bounds are values at 1-indexed ranks ceil(p*n/100)
    of the token-count order (smallest value whose cumulative count
    reaches the rank - the winsorized protocol); boundary-valued
    docs are KEPT (strict < lo / > hi exclusion); counts and token
    sums are exact int64; doc_share is one IEEE division behind a
    6dp round.

    Scale shape: one tokenize pass collapses to the DISTINCT
    (token-count, docs) frame (two-phase agg); the bounds come from
    ONE bucketed distributed cumsum (operators/ranks.py - no
    unpartitioned window, r6 audit rule) and classification +
    mass totals run ON the distinct frame (documents are never
    re-scanned or joined back). 100 TB: identical.
    """
    d = table(spark, sf_dir, "documents")
    lens = d.select(
        F.size(
            F.filter(
                F.split(F.lower("text"), " "), lambda t: t != ""
            )
        )
        .cast("bigint")
        .alias("toks")
    )
    g = lens.groupBy("toks").agg(
        F.count("*").cast("bigint").alias("c")
    )
    g = global_order(g, "toks", [F.col("toks")], cumsum={"c": "cum"})
    n1 = lens.agg(F.count("*").cast("bigint").alias("n"))
    g = g.crossJoin(F.broadcast(n1))
    b = g.agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"({LEN_OUTLIER_LO} * n + 99) div 100"),
                F.col("toks"),
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"({LEN_OUTLIER_HI} * n + 99) div 100"),
                F.col("toks"),
            )
        ).alias("hi"),
    )
    outcome = (
        F.when(F.col("toks") < F.col("lo"), "short")
        .when(F.col("toks") > F.col("hi"), "long")
        .otherwise("kept")
    )
    return (
        g.select("toks", "c")
        .crossJoin(F.broadcast(b))
        .groupBy(outcome.alias("outcome"))
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.sum(F.col("toks") * F.col("c"))
            .cast("bigint")
            .alias("total_tokens"),
            F.round(
                F.sum("c").cast("double") / F.max("n"), 6
            ).alias("doc_share"),
        )
        .orderBy("outcome")
    )


COVERAGE_PCTS = (50, 90, 99)


@register(
    "q_text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS w
      FROM documents
    ),
    g AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
    ),
    r AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, w) AS rnk,
             CAST(sum(c) OVER (ORDER BY c DESC, w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(sum(c) OVER () AS BIGINT) AS total,
             CAST(count(*) OVER () AS BIGINT) AS vocab
      FROM g
    ),
    ps AS (SELECT CAST(p AS BIGINT) AS coverage_pct
           FROM (VALUES (50), (90), (99)) AS t(p))
    SELECT ps.coverage_pct,
           CAST(min(r.rnk) AS BIGINT) AS tokens_needed,
           round(CAST(min(r.rnk) AS DOUBLE) / max(r.vocab), 6)
               AS vocab_share
    FROM ps JOIN r
      ON r.cum >= (ps.coverage_pct * r.total + 99) // 100
    GROUP BY ps.coverage_pct ORDER BY ps.coverage_pct
    """,
)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY COVERAGE curve: how many distinct tokens (most
    frequent first) cover 50/90/99% of all token occurrences - the
    tokenizer-design number Zipf's law only gestures at
    (q_text_zipf fits the exponent; THIS answers 'what vocab size
    do I need', and the 99%-vs-90% gap is the long-tail cost a BPE
    vocab budget has to swallow).

    Exactness: token counts are exact int64; the frequency-descending
    rank and cumulative mass share one ordered pass; each coverage
    point is the smallest rank whose cumulative count reaches
    ceil(p*total/100) (integer rank math - ties in count share a
    bucket and any tie order yields the same cumulative sequence, so
    the pick is tiebreak-independent); vocab_share is one IEEE
    division behind a 6dp round.

    Scale shape: tokenize -> two-phase (token, count) agg -> ONE
    bucketed distributed rank+cumsum over the vocab frame
    (operators/ranks.py, descending by count - no unpartitioned
    window, r6 audit rule) -> three picks against a broadcast
    3-row spine. 100 TB: identical.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("w")
    )
    g = tok.groupBy("w").agg(F.count("*").cast("bigint").alias("c"))
    r = global_order(
        g.withColumn("_negc", -F.col("c")),
        "_negc",
        [F.col("c").desc(), F.col("w")],
        rank_name="rnk",
        cumsum={"c": "cum"},
    )
    tot = g.agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    ps = spark.createDataFrame(
        [(int(p),) for p in COVERAGE_PCTS], "coverage_pct bigint"
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(ps),
            F.col("cum")
            >= F.expr("(coverage_pct * total + 99) div 100"),
        )
        .groupBy("coverage_pct")
        .agg(
            F.min("rnk").cast("bigint").alias("tokens_needed"),
            F.round(
                F.min("rnk").cast("double") / F.max("vocab"), 6
            ).alias("vocab_share"),
        )
        .orderBy("coverage_pct")
    )
