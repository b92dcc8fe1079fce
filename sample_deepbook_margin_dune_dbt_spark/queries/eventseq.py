"""Event-sequence analytics: funnel conversion and cohort retention.

The two canonical product-analytics rollups over an event log — both
expressed so every join and aggregate shuffles on ONE key (``user_id``
for the funnel's sequential-min chain, then tiny rollups), which is what
keeps them a single co-partitioned pipeline at 100 TB: Catalyst reuses
the user_id exchange across the chained steps instead of re-shuffling
per stage.

Funnel semantics (strict ordering): a user converts step k only with an
event of step-k type STRICTLY AFTER their step-(k-1) conversion time —
the sequential-min chain (min view ts → min later click ts → min later
purchase ts), not mere presence of all three types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import event_ts, event_ts_us, load

FUNNEL_STEPS = ("view", "click", "purchase")


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order 3-step funnel: users reaching each step + conversion
    ppm (integer arithmetic — cross-engine exact). Single row."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", event_ts().alias("t"), "event_type"
    )
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("t") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("t") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_step1"),
            F.count("t2").cast("long").alias("n_step2"),
            F.count("t3").cast("long").alias("n_step3"),
        )
        .select(
            "n_step1",
            "n_step2",
            "n_step3",
            F.expr("n_step2 * 1000000L div n_step1").alias("conv_step2_ppm"),
            F.expr("n_step3 * 1000000L div n_step1").alias("conv_step3_ppm"),
        )
    )


SQL_FUNNEL = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
    GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
    GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_step1,
       CAST(count(t2) AS BIGINT) AS n_step2,
       CAST(count(t3) AS BIGINT) AS n_step3,
       CAST(count(t2) * 1000000 // count(*) AS BIGINT) AS conv_step2_ppm,
       CAST(count(t3) * 1000000 // count(*) AS BIGINT) AS conv_step3_ppm
FROM s1
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active date, one
    row per (cohort_date, day_offset) with distinct actives and the
    retention share in ppm of the cohort size.

    Two aggregates on user_id + one broadcast of the per-cohort sizes
    (≤ distinct-days rows). The (user, day) dedup bounds the heavy input
    at actives×days before any join.
    """
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date(event_ts()).alias("d"))
        .distinct()
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    sizes = first.groupBy("cohort_date").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_date", F.datediff("d", "cohort_date").cast("long").alias("day_offset")
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .join(F.broadcast(sizes), "cohort_date")
        .select(
            "cohort_date",
            "day_offset",
            "n_users",
            "cohort_size",
            F.expr("n_users * 1000000L div cohort_size").alias("retention_ppm"),
        )
    )


SQL_RETENTION = """
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
first AS (
    SELECT user_id, min(d) AS cohort_date FROM ud GROUP BY 1
),
sizes AS (
    SELECT cohort_date, CAST(count(*) AS BIGINT) AS cohort_size
    FROM first GROUP BY 1
),
ret AS (
    SELECT f.cohort_date,
           CAST(ud.d - f.cohort_date AS BIGINT) AS day_offset,
           CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_users
    FROM ud JOIN first f USING (user_id)
    GROUP BY 1, 2
)
SELECT r.cohort_date, r.day_offset, r.n_users, s.cohort_size,
       CAST(r.n_users * 1000000 // s.cohort_size AS BIGINT) AS retention_ppm
FROM ret r JOIN sizes s USING (cohort_date)
"""


def q_events_cohort_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort cumulative value (LTV curve): per (cohort_date, day_offset)
    daily value plus the running total over the cohort's life — the
    explicit-frame window family (``rowsBetween``), beyond lag/row_number.

    Decimal-exact end to end: the per-day sums AND the running total
    accumulate as DECIMAL and only the final projection casts to double,
    so the cross-engine hash cannot drift on summation order.
    """
    from pyspark.sql import Window

    from .common import dec2

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date(event_ts()).alias("d"), "value"
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    per = (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff("d", "cohort_date").cast("long").alias("day_offset"),
        )
        .agg(F.sum(dec2(F.col("value"))).alias("_dv"))
    )
    w = (
        Window.partitionBy("cohort_date")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        "cohort_date",
        "day_offset",
        F.round(F.col("_dv").cast("double"), 2).alias("day_value"),
        F.round(F.sum("_dv").over(w).cast("double"), 2).alias("cum_value"),
    )


SQL_COHORT_VALUE = """
WITH ev AS (
    SELECT user_id, CAST(ts AS DATE) AS d, value FROM events
),
first AS (
    SELECT user_id, min(d) AS cohort_date FROM ev GROUP BY 1
),
per AS (
    SELECT f.cohort_date,
           CAST(ev.d - f.cohort_date AS BIGINT) AS day_offset,
           sum(CAST(ev.value AS DECIMAL(12,2))) AS dv
    FROM ev JOIN first f USING (user_id)
    GROUP BY 1, 2
)
SELECT cohort_date, day_offset,
       round(CAST(dv AS DOUBLE), 2) AS day_value,
       round(CAST(sum(dv) OVER (
           PARTITION BY cohort_date ORDER BY day_offset
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 2) AS cum_value
FROM per
"""


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-/last-touch attribution per conversion: for every purchase
    event, the FIRST event type the user ever emitted and the LAST event
    type strictly before the purchase, plus the prior-event count — the
    marketing-attribution join every event pipeline ships.

    One pass, no self-join: all three attributes are frames over the
    per-user (ts, event_id) order ending 1 PRECEDING, so Spark buffers
    one user's history per task at most (per-user partitions, the same
    shape the sessionize/funnel family holds sublinear at 100×).
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", event_ts().alias("t"), "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.withColumn("first_touch", F.first("event_type").over(w))
        .withColumn("last_touch", F.last("event_type").over(w))
        .withColumn("n_prior_events", F.count(F.lit(1)).over(w).cast("long"))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "first_touch", "last_touch", "n_prior_events")
    )


SQL_ATTRIBUTION = """
WITH seq AS (
    SELECT event_id, user_id, event_type,
           first_value(event_type) OVER w AS first_touch,
           last_value(event_type) OVER w AS last_touch,
           CAST(count(*) OVER w AS BIGINT) AS n_prior_events
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, first_touch, last_touch, n_prior_events
FROM seq WHERE event_type = 'purchase'
"""


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event sequences:
    for every ordered pair (event_type → next event_type) within a
    user's (ts, event_id)-ordered history, the transition count and the
    row-normalized probability (fixed-point 1e6, floor contract) — the
    journey model behind next-step prediction and anomaly scoring that
    the funnel/retention/attribution rows don't express (funnels test
    ONE hand-picked path; this emits the full empirical kernel).

    Scale shape: ``lead`` runs in per-user partitions (the
    sessionize/funnel window shape measured sublinear at 100×), the pair
    rollup is a map-side-combined groupBy on a ≤ |types|² key space, and
    the row normalization is a window over that ≤ |types|²-row result —
    partitioned by the source type, never SinglePartition over events.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", event_ts().alias("t"), "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wrow = Window.partitionBy("event_type")
    return (
        pairs.withColumn("row_total", F.sum("n").over(wrow).cast("long"))
        .withColumn("p_e6", F.expr("n * 1000000 div row_total").cast("long"))
        .select("event_type", "next_type", "n", "row_total", "p_e6")
        .orderBy("event_type", "next_type")
    )


SQL_TRANSITIONS = """
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
),
pairs AS (
    SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
       CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS row_total,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY event_type) AS BIGINT)
           AS p_e6
FROM pairs
"""


def q_events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: per user, the lag from their
    FIRST event ever to their FIRST purchase; one summary row with the
    converted-user count and exact p50/p90/max latency — the HOW-FAST
    companion to the funnel's IF (latency percentiles are what SLAs and
    campaign analyses consume).

    Scale shape: one map-side-combined groupBy(user) computing two
    conditional MINs (no window, no ordering buffer — first-ever and
    first-purchase are plain min aggregates), then one global aggregate
    over |users| rows. Percentiles are exact ``percentile`` ≡ DuckDB
    ``quantile_cont`` (the ``a_percentiles`` bit-identical contract);
    latencies are integer microsecond deltas cast to double only at the
    percentile input.
    """
    from .common import event_ts_us

    ev = load(spark, sf_dir, "events").select(
        "user_id", event_ts_us().alias("t_us"), "event_type"
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("t_us").alias("first_us"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("t_us"))).alias(
            "conv_us"
        ),
    )
    conv = per_user.filter(F.col("conv_us").isNotNull()).withColumn(
        "lag_s", ((F.col("conv_us") - F.col("first_us")) / F.lit(1000000.0))
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    ).crossJoin(
        F.broadcast(
            conv.agg(
                F.count(F.lit(1)).cast("long").alias("n_converted"),
                F.expr("percentile(lag_s, 0.5)").alias("p50_s"),
                F.expr("percentile(lag_s, 0.9)").alias("p90_s"),
                F.max("lag_s").alias("max_s"),
            )
        )
    ).withColumn(
        "conversion_e6", F.expr("n_converted * 1000000 div n_users")
    )


SQL_TIME_TO_CONVERT = """
WITH per_user AS (
    SELECT user_id,
           min(epoch_us(ts)) AS first_us,
           min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS conv_us
    FROM events GROUP BY user_id
),
conv AS (
    SELECT (conv_us - first_us) / 1000000.0 AS lag_s
    FROM per_user WHERE conv_us IS NOT NULL
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM per_user) AS n_users,
       CAST(count(*) AS BIGINT) AS n_converted,
       quantile_cont(lag_s, 0.5) AS p50_s,
       quantile_cont(lag_s, 0.9) AS p90_s,
       max(lag_s) AS max_s,
       CAST(count(*) * 1000000 // (SELECT count(*) FROM per_user) AS BIGINT)
           AS conversion_e6
FROM conv
"""


# ----------------------------------- events → training-corpus bridge

#: session gap (µs) and the value band used for the rendered tokens
_C4E_GAP_US = 30 * 60 * 1_000_000
_C4E_BAND = 50


def q_corpus_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured logs → training documents: gap-sessionize the event
    stream (30-min gap) and render each (user, session) as ONE text
    document of time-ordered ``event_type:value_band`` tokens — the
    bridge that turns behavioural telemetry into sequence-model training
    data (next-action modelling, session LMs), after which every corpus
    operator (dedup, sampling, packing, export) applies as-is.

    Determinism: tokens are assembled by ``array_sort`` over
    (ts_us, event_id, token) structs — a total order, independent of
    partitioning — and the DuckDB twin orders its ``string_agg`` by the
    same keys.

    Scale shape: the sessionize windows and the per-(user, session)
    assembly all cluster by user_id, so ONE exchange serves the window
    pass AND the aggregation (hash-partitioning by user satisfies the
    (user, session) clustering); token rendering is a narrow map; output
    is |sessions| rows. A pathological single user is one hot partition
    — the documented skew case, salted upstream if real data has one.
    """
    from ..operators.sessions import sessionize

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        event_ts_us().alias("ts_us"),
        F.concat(
            F.col("event_type"),
            F.lit(":"),
            (F.floor(F.col("value") / _C4E_BAND).cast("long") * _C4E_BAND).cast(
                "string"
            ),
        ).alias("tok"),
    )
    sess = sessionize(ev, "user_id", "ts_us", gap=_C4E_GAP_US, extra_cols=["event_id", "tok"])
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts_us", "event_id", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("text"),
        )
        .select("user_id", "session_id", "n_events", "text")
    )


SQL_CORPUS_FROM_EVENTS = f"""
WITH ev AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_type || ':' ||
               CAST(CAST(floor(value / {_C4E_BAND}) AS BIGINT) * {_C4E_BAND} AS VARCHAR)
               AS tok
    FROM events
),
marked AS (
    SELECT user_id, event_id, ts_us, tok,
           CASE WHEN lag(ts_us) OVER w IS NULL
                  OR ts_us - lag(ts_us) OVER w > {_C4E_GAP_US}
                THEN 1 ELSE 0 END AS is_start
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
sess AS (
    SELECT user_id, event_id, ts_us, tok,
           CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
    FROM marked
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       string_agg(tok, ' ' ORDER BY ts_us, event_id, tok) AS text
FROM sess
GROUP BY user_id, session_id
"""


EVENTSEQ_QUERIES = {
    "events_funnel": (q_events_funnel, SQL_FUNNEL),
    "corpus_from_events": (q_corpus_from_events, SQL_CORPUS_FROM_EVENTS),
    "events_retention": (q_events_retention, SQL_RETENTION),
    "events_cohort_value": (q_events_cohort_value, SQL_COHORT_VALUE),
    "events_attribution": (q_events_attribution, SQL_ATTRIBUTION),
    "events_transitions": (q_events_transitions, SQL_TRANSITIONS),
    "events_time_to_convert": (q_events_time_to_convert, SQL_TIME_TO_CONVERT),
}


# ------------------------------------------------ session association rules


ASSOC_GAP_US = 30 * 60 * 1_000_000


def q_events_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over SESSION baskets (r12): for
    every unordered event-type pair co-occurring in a 30-min-gap
    session, exact-integer support / both-direction confidence / lift —
    the "users who did X in a session also did Y" rollup, and the
    canonical demonstration that the sessionizer composes as a basket
    builder.

    Scale shape: one user_id shuffle for the sessionizer (the shared
    window pass), one distinct over (session, type) — baskets carry
    DISTINCT types, so the pair join is bounded by |type-vocabulary|²
    per session, never events² — a session-keyed self-join
    (AQE-splittable), map-side-combined pair counts, and the per-type
    and total-session counts ride a broadcast (type vocabulary is
    bounded by contract). All metrics are e6 integers over non-negative
    operands: ``support = n_ab·1e6 div n_sessions``, ``conf(a→b) =
    n_ab·1e6 div n_a``, ``lift = n_ab·n_sessions·1e6 div (n_a·n_b)``
    — cross-engine exact.

    The session total rides a one-row ``crossJoin(broadcast(tot))``
    (the oracle's own ``tot`` CTE shape, r13 — VERDICT r12 item 4):
    building this DataFrame runs NO job, and the sessionize pass serves
    baskets AND the total in one query instead of an eager ``.count()``
    pre-pass recomputing the window.
    """
    from ..operators.sessions import sessionize

    from pyspark.storagelevel import StorageLevel

    ev = load(spark, sf_dir, "events").select(
        "user_id", event_ts_us().alias("ts_us"), "event_type"
    )
    sess = sessionize(ev, "user_id", "ts_us", ASSOC_GAP_US, extra_cols=["event_type"])
    # stage the basket rows ONCE (r14, guide §2.4): four consumers read
    # them (the session total, the per-type singles, and BOTH self-join
    # sides) — unstaged, each re-ran the sessionizer window + distinct
    # (ReuseExchange only dedups the exchange itself, not the window/agg
    # work above it). Baskets are (session, distinct type) rows — far
    # smaller than the event log they summarize.
    baskets = (
        sess.select("user_id", "session_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    tot = (
        baskets.select("user_id", "session_id")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )
    singles = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_id") == F.col("b.session_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_ab",
            F.expr("n_ab * 1000000L div n_sessions").cast("long").alias("support_e6"),
            F.expr("n_ab * 1000000L div n_a").cast("long").alias("conf_a_to_b_e6"),
            F.expr("n_ab * 1000000L div n_b").cast("long").alias("conf_b_to_a_e6"),
            F.expr("(n_ab * n_sessions * 1000000L) div (n_a * n_b)")
            .cast("long")
            .alias("lift_e6"),
        )
        .orderBy("type_a", "type_b")
    )


SQL_ASSOC_RULES = f"""
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
),
marked AS (
    SELECT user_id, ts_us, event_type,
           CASE WHEN lag(ts_us) OVER w IS NULL
                  OR ts_us - lag(ts_us) OVER w > {ASSOC_GAP_US}
                THEN 1 ELSE 0 END AS is_start
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
sess AS (
    SELECT user_id, event_type,
           sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM marked
),
baskets AS (
    SELECT DISTINCT user_id, session_id, event_type FROM sess
),
tot AS (
    SELECT count(*) AS n_sessions
    FROM (SELECT DISTINCT user_id, session_id FROM baskets)
),
singles AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM baskets GROUP BY 1
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_ab
    FROM baskets a
    JOIN baskets b ON a.user_id = b.user_id AND a.session_id = b.session_id
                   AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_ab,
       CAST(p.n_ab * 1000000 // t.n_sessions AS BIGINT) AS support_e6,
       CAST(p.n_ab * 1000000 // sa.n AS BIGINT) AS conf_a_to_b_e6,
       CAST(p.n_ab * 1000000 // sb.n AS BIGINT) AS conf_b_to_a_e6,
       CAST((p.n_ab * t.n_sessions * 1000000) // (sa.n * sb.n) AS BIGINT) AS lift_e6
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN tot t
ORDER BY type_a, type_b
"""


# r12: registered after definition (the registry dict sits mid-module)
EVENTSEQ_QUERIES["events_assoc_rules"] = (q_events_assoc_rules, SQL_ASSOC_RULES)
