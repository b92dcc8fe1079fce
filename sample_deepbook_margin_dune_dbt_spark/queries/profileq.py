"""Corpus profiling query: the ANALYZE-style one-pass column statistics
(``operators/profile.py``) over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.profile import histogram_fixed, profile_table
from .common import load


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of documents: one EXPAND-pass scan, ≤ n_cols
    output rows. The stats every downstream decision reads first —
    distinct counts size shuffle keys, null spikes gate quarantine,
    min/max+cardinality triage skew."""
    return profile_table(
        load(spark, sf_dir, "documents"),
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def _col_sql(c: str, dtype: str, is_str: bool) -> str:
    sl = (
        f"CAST(sum(length({c})) * 1000000 // count({c}) AS BIGINT)"
        if is_str
        else "CAST(NULL AS BIGINT)"
    )
    return f"""
SELECT '{c}' AS "column", '{dtype}' AS dtype,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_repr,
       CAST(max({c}) AS VARCHAR) AS max_repr,
       {sl} AS avg_len_e6
FROM documents"""


SQL_CORPUS_PROFILE = "\nUNION ALL\n".join(
    _col_sql(c, dt, s)
    for c, dt, s in [
        ("doc_id", "bigint", False),
        ("text", "string", True),
        ("lang", "string", True),
        ("source", "string", True),
        ("n_chars", "bigint", False),
    ]
)


def q_corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in 20 fixed 0..2000-char buckets
    (+ overflow): the drift-monitoring histogram, one agg pass."""
    return histogram_fixed(
        load(spark, sf_dir, "documents"), "n_chars", lo=0, hi=2000, bins=20
    )


SQL_LENGTH_HISTOGRAM = """
SELECT CAST(CASE WHEN x < 0 THEN 0
            WHEN x >= 2000 THEN 21
            ELSE 1 + floor((x - 0) * 20 / 2000.0) END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL)
GROUP BY 1
"""


def q_events_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 3σ outlier screen in EXACT integer arithmetic — the
    anomaly gate of data profiling, cross-engine bit-exact where the
    textbook ``abs(x - mean) > 3*stddev`` (two float divisions and a
    sqrt) could flip rows at the boundary between engines.

    The float-free trick: with cents ``c`` (exact integers via the
    DECIMAL(12,2) grid), mean = S1/n and var = (n·S2 − S1²)/n², so

        (c − mean)² > 9·var   ⟺   (n·c − S1)² > 9·(n·S2 − S1²)

    (multiply both sides by n² — the n² on the left lands on (c − mean)²
    and the n² on the right cancels var's denominator)

    — both sides integer products (DECIMAL(38,0) in Spark, HUGEINT in
    DuckDB; the squared left side overflows int64, hence the wide
    types). Scale shape: the per-group stats table (≤ n_types rows)
    broadcasts back onto the rows — the join-the-tiny-aggregate idiom,
    not a per-group window (which would buffer hot groups whole) — then
    one grouped count. Two shuffles on event_type, both map-side
    combined.
    """
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100).cast("decimal(38,0)").alias("c"),
    )
    # the testdata's values are uniform (no 3σ tail at all — verified at
    # sf0.01), so the screen would be vacuously all-zero; plant extreme
    # rows identically on both engines (same non-vacuity pattern as the
    # planted-PII/dup-line curation queries)
    planted = spark.createDataFrame(
        [("purchase", 10_000_000), ("click", 25_000_000)],
        "event_type string, c_raw long",
    ).select("event_type", F.col("c_raw").cast("decimal(38,0)").alias("c"))
    ev = ev.unionByName(planted)
    return _outlier_screen(ev)


def _outlier_screen(ev: DataFrame) -> DataFrame:
    """Guarded integer-exact 3σ screen over (event_type, c:decimal(38,0))
    rows — factored out so the overflow guard is testable at the scales
    that actually trip it (huge n·max|c|, not huge single values, which
    the DECIMAL(12,2) input grid already bounds)."""
    from pyspark.sql import functions as F

    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.max(F.abs(F.col("c"))).alias("maxc"),
    )
    # overflow guard (ADVICE r5): with ANSI off a >38-digit decimal product
    # silently NULLs, so is_outlier would undercount with no signal. Both
    # sides are bounded by B = n·max|c|: left (n·c − s1)² ≤ (2B)², right
    # 9(n·s2 − s1²) ≤ 18B², so 18B² < 10³⁸ ⇔ B < ~7.4e17 keeps every
    # product inside DECIMAL(38,0). The guard RIDES the broadcast stats
    # join as a raise_error branch — no extra driver pass, fails loudly
    # at execution instead of dropping flags.
    bound = F.col("n") * F.col("maxc")
    guard = F.when(
        bound > F.lit(7 * 10**17).cast("decimal(38,0)"),
        F.raise_error(
            F.concat(
                F.lit("events_outlier_zscore: n*max|c| = "),
                bound.cast("string"),
                F.lit(
                    " exceeds the DECIMAL(38,0) overflow-safe bound 7e17 — "
                    "rescale c (coarser cents grid) or compute per-group on "
                    "a scaled grid"
                ),
            )
        ).cast("boolean"),
    )
    flagged = (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn(
            "is_outlier",
            F.coalesce(
                guard,
                (F.col("n") * F.col("c") - F.col("s1"))
                * (F.col("n") * F.col("c") - F.col("s1"))
                > F.lit(9) * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")),
            ),
        )
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).cast("long").alias("n_outliers"),
        F.max(F.when(F.col("is_outlier"), F.col("c"))).cast("long").alias("max_outlier_cents"),
    )


SQL_OUTLIER_ZSCORE = """
WITH ev AS (
    SELECT event_type,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) AS c
    FROM events
    UNION ALL
    SELECT * FROM (VALUES ('purchase', CAST(10000000 AS HUGEINT)),
                          ('click',    CAST(25000000 AS HUGEINT))) v(event_type, c)
),
stats AS (
    SELECT event_type,
           CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(c) AS HUGEINT) AS s1,
           CAST(sum(c * c) AS HUGEINT) AS s2
    FROM ev GROUP BY 1
),
flagged AS (
    SELECT ev.event_type, ev.c,
           (n * c - s1) * (n * c - s1) > 9 * (n * s2 - s1 * s1) AS is_outlier
    FROM ev JOIN stats USING (event_type)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(max(CASE WHEN is_outlier THEN c END) AS BIGINT) AS max_outlier_cents
FROM flagged
GROUP BY 1
"""


_TVD_BINS, _TVD_LO, _TVD_HI = 20, 0.0, 500.0


def q_events_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift screen between the FIRST and SECOND half of the
    events time range: per-bucket value shares of both windows and their
    absolute difference — total variation distance = Σ contrib / 2.

    TVD instead of PSI/KL because it is RATIONAL: shares are exact
    integer ppm (``count·10⁶ div total`` — integer division, no float
    path), so the screen is bit-identical across engines where a
    log-based divergence could flip at the last ulp. The two windows
    split at the midpoint of (min, max) event time — a pure function of
    the data, no clock. Scale shape: one scalar min/max probe
    (footer-cheap), then ONE grouped count over (window, bucket) with
    map-side combine, a ≤2·(bins+2)-row pivot, and a broadcast of the
    two totals. Monitoring contract: alert when tvd_ppm = Σ contrib_ppm
    exceeds a threshold.
    """
    from pyspark.sql import functions as F

    from .common import event_ts_us, load

    out_schema = (
        "bucket long, n_a long, n_b long, share_a_ppm long, "
        "share_b_ppm long, contrib_ppm long"
    )
    ev = load(spark, sf_dir, "events").select(
        event_ts_us().alias("us"), F.col("value")
    )
    lo, hi = ev.agg(F.min("us"), F.max("us")).first()
    if lo is None:  # empty events table: 0 rows, matching the oracle
        return spark.createDataFrame([], out_schema)
    mid = (int(lo) + int(hi)) // 2  # exact integer midpoint, both engines
    width = (_TVD_HI - _TVD_LO) / _TVD_BINS
    bucket = (
        F.when(F.col("value") < _TVD_LO, F.lit(0))
        .when(F.col("value") >= _TVD_HI, F.lit(_TVD_BINS + 1))
        .otherwise((F.floor((F.col("value") - _TVD_LO) / width) + 1))
        .cast("bigint")
    )
    counts = (
        ev.filter(F.col("value").isNotNull())
        .select((F.col("us") <= mid).alias("first_half"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("first_half"), 0).otherwise(1)).alias("n_b"),
        )
    )
    totals = counts.agg(
        F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb")
    )
    # an all-one-half time range (min == max) leaves the other total 0:
    # NULL shares on BOTH engines (DuckDB's // would raise; Spark's div
    # would NULL — the explicit CASE makes them agree)
    share_a = F.when(F.col("_ta") > 0, F.expr("n_a * 1000000 div _ta"))
    share_b = F.when(F.col("_tb") > 0, F.expr("n_b * 1000000 div _tb"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            share_a.cast("long").alias("share_a_ppm"),
            share_b.cast("long").alias("share_b_ppm"),
            F.abs(share_a - share_b).cast("long").alias("contrib_ppm"),
        )
    )


SQL_DRIFT_TVD = f"""
WITH ev AS (
    SELECT epoch_us(ts) AS us, value FROM events
),
bounds AS (
    SELECT (CAST(min(us) AS BIGINT) + CAST(max(us) AS BIGINT)) // 2 AS mid
    FROM ev
),
bucketed AS (
    SELECT us <= (SELECT mid FROM bounds) AS first_half,
           CAST(CASE WHEN value < {_TVD_LO} THEN 0
                     WHEN value >= {_TVD_HI} THEN {_TVD_BINS + 1}
                     ELSE floor((value - {_TVD_LO}) / {(_TVD_HI - _TVD_LO) / _TVD_BINS}) + 1
                END AS BIGINT) AS bucket
    FROM ev WHERE value IS NOT NULL
),
counts AS (
    SELECT bucket,
           sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS n_a,
           sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS n_b
    FROM bucketed GROUP BY 1
),
tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM counts)
SELECT bucket,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(CASE WHEN ta > 0 THEN n_a * 1000000 // ta END AS BIGINT) AS share_a_ppm,
       CAST(CASE WHEN tb > 0 THEN n_b * 1000000 // tb END AS BIGINT) AS share_b_ppm,
       CAST(abs(CASE WHEN ta > 0 THEN n_a * 1000000 // ta END
              - CASE WHEN tb > 0 THEN n_b * 1000000 // tb END) AS BIGINT) AS contrib_ppm
FROM counts, tot
"""


def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW dataset card (the "Datasheets for Datasets" artifact,
    Gebru et al. 2021): composition, duplication, dominant language, and
    length distribution in a single governance-ready row — what a corpus
    release attaches next to the data.

    Scale shape: one full-corpus aggregation pass (count / sums /
    exact-distinct fingerprints — the EXPAND cost ``corpus_profile``
    already budgets; swap ``approx_count_distinct`` in production if the
    ±0 contract is not needed) plus a |langs|-row argmax aggregate —
    both map-side combined, meeting in single-row broadcast crossJoins
    (the plan audit's allowed shape). Percentiles are Spark exact
    ``percentile`` ≡ DuckDB ``quantile_cont``, verified bit-identical by
    the ``a_percentiles`` row since r1.
    """
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct(F.md5("text")).cast("long").alias("n_distinct_content"),
        F.sum((F.col("n_chars") < 100).cast("long")).cast("long").alias("n_short"),
        F.expr("percentile(CAST(n_chars AS DOUBLE), 0.5)").alias("p50_chars"),
        F.expr("percentile(CAST(n_chars AS DOUBLE), 0.95)").alias("p95_chars"),
    )
    top_lang = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(F.max(F.struct(F.col("c"), F.col("lang"))).alias("_m"))
        .select(
            F.col("_m.lang").alias("top_lang"),
            F.col("_m.c").cast("long").alias("top_lang_docs"),
        )
    )
    return (
        base.crossJoin(F.broadcast(top_lang))
        .withColumn("mean_chars", F.expr("n_chars_total div n_docs"))
        .withColumn(
            "dup_rate_e6",
            F.expr("(n_docs - n_distinct_content) * 1000000 div n_docs"),
        )
        .withColumn("short_share_e6", F.expr("n_short * 1000000 div n_docs"))
        .withColumn(
            "top_lang_share_e6", F.expr("top_lang_docs * 1000000 div n_docs")
        )
        .select(
            "n_docs",
            "n_chars_total",
            "mean_chars",
            "p50_chars",
            "p95_chars",
            "n_langs",
            "top_lang",
            "top_lang_share_e6",
            "n_sources",
            "dup_rate_e6",
            "short_share_e6",
        )
    )


SQL_DATASHEET = """
WITH base AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_content,
           CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
           quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS p50_chars,
           quantile_cont(CAST(n_chars AS DOUBLE), 0.95) AS p95_chars
    FROM documents
),
tl AS (
    SELECT lang AS top_lang, CAST(count(*) AS BIGINT) AS top_lang_docs
    FROM documents GROUP BY lang
    ORDER BY count(*) DESC, lang DESC LIMIT 1
)
SELECT n_docs, n_chars_total,
       CAST(n_chars_total // n_docs AS BIGINT) AS mean_chars,
       p50_chars, p95_chars, n_langs, top_lang,
       CAST(top_lang_docs * 1000000 // n_docs AS BIGINT) AS top_lang_share_e6,
       n_sources,
       CAST((n_docs - n_distinct_content) * 1000000 // n_docs AS BIGINT)
           AS dup_rate_e6,
       CAST(n_short * 1000000 // n_docs AS BIGINT) AS short_share_e6
FROM base, tl
"""


PROFILE_QUERIES = {
    "corpus_profile": (q_corpus_profile, SQL_CORPUS_PROFILE),
    "corpus_length_histogram": (q_corpus_length_histogram, SQL_LENGTH_HISTOGRAM),
    "events_outlier_zscore": (q_events_outlier_zscore, SQL_OUTLIER_ZSCORE),
    "events_drift_tvd": (q_events_drift_tvd, SQL_DRIFT_TVD),
    "corpus_datasheet": (q_corpus_datasheet, SQL_DATASHEET),
}
