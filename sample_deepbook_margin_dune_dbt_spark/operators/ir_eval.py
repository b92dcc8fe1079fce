"""Retrieval evaluation: exact-integer IR metrics over a run vs qrels.

The reference repo's surface stops at SQL rollups (reference
``models/deepbook_margin/daily/fct_deepbook_margin_pool_daily.sql`` and
siblings are Jinja-SQL aggregations); a training-data pipeline that
ships retrieval (BM25 / QL / RRF in ``operators/retrieval.py``, ANN in
``operators/similarity.py``) also needs the EVAL side of that loop —
recall@k / MRR / nDCG / MAP against a relevance-judgment table — to
gate ranker changes and to measure retrieval-based curation (seed
expansion, benchmark-neighbour mining) before a 100 TB re-run.

Why fixed-point integers: same contract as ``operators/retrieval.py`` —
every metric column must hash-match a DuckDB oracle bit-for-bit, and
``log2``/float division diverge across engines at the ulp level. The
DCG position discounts ``1/log2(rank+1)`` are precomputed in PYTHON as
integer micro-units (k is bounded, so the table is a k-entry literal
emitted identically into both plans), and every downstream quantity is
int64 arithmetic: gains ``2^rel − 1`` via bit shifts, ratios via
integer division at 1e6 scale.

Scale shape (100 TB corpus, 1000 executors):

- The eval NEVER touches the corpus: inputs are the run (|Q|·k rows —
  the ranker already reduced the corpus) and qrels (benchmark-sized,
  thousands of rows). Everything here is exchange-bounded by |Q|·k.
- All windows partition by the query id — no single-partition window;
  per-query cumulative hits and ideal-gain positions parallelize across
  queries.
- The run↔qrels join is an equi-join on (query, doc); either side
  broadcasts at realistic eval sizes, and the per-query aggregation is
  map-side combined.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_E6 = 1_000_000


def dcg_weights_e6(k: int) -> list[int]:
    """Integer micro-unit DCG discounts ``round(1e6 / log2(r + 1))`` for
    ranks 1..k — computed once in Python so Spark and DuckDB consume the
    SAME k integers instead of each evaluating libm ``log2``."""
    return [int(_E6 / math.log2(r + 1) + 0.5) for r in range(1, k + 1)]


def ir_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query IR metrics at cutoff ``k`` (all fixed-point 1e6 int64).

    ``run``: one row per retrieved document — (query, doc, rank) with
    rank 1-based and unique within a query (the shape every ranker in
    ``operators/retrieval.py`` emits). Rows with rank > k are ignored.
    ``qrels``: graded judgments (query, doc, rel) with rel ≥ 1 (omit
    non-relevant rows, trec style).

    Output, one row per query THAT HAS JUDGMENTS (queries with an empty
    qrels entry have undefined recall — trec_eval drops them too):

    - ``n_rel`` / ``n_hits`` — judged-relevant total, relevant in top-k
    - ``recall_e6``  = n_hits·1e6 div n_rel
    - ``precision_e6`` = n_hits·1e6 div k
    - ``rr_e6``      = 1e6 div rank_of_first_hit (0 when no hit) — MRR
      numerator
    - ``ap_e6``      = (Σ_{hits at rank r} cum_hits(r)·1e6 div r)
      div min(n_rel, k) — MAP numerator
    - ``ndcg_e6``    = DCG@k·1e6 div IDCG@k with gains ``2^rel − 1`` and
      the shared integer discount table (:func:`dcg_weights_e6`)
    """
    w_e6 = dcg_weights_e6(k)
    weight_arr = F.array(*[F.lit(w).cast("long") for w in w_e6])

    topk = run.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).cast("long").alias("_rank"),
    ).filter(F.col("_rank") <= k)
    judged = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("long").alias("_rel"),
    )

    scored = (
        topk.join(judged, ["_q", "_d"], "left")
        .withColumn("_rel", F.coalesce(F.col("_rel"), F.lit(0)).cast("long"))
        .withColumn("_hit", (F.col("_rel") > 0).cast("long"))
        .withColumn(
            "_gain", F.expr("CAST(shiftleft(1L, CAST(_rel AS INT)) - 1L AS LONG)")
        )
        .withColumn(
            "_w_e6", F.element_at(weight_arr, F.col("_rank").cast("int"))
        )
    )
    cum = Window.partitionBy("_q").orderBy("_rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scored = scored.withColumn("_cum_hits", F.sum("_hit").over(cum))
    run_agg = scored.groupBy("_q").agg(
        F.sum("_hit").cast("long").alias("n_hits"),
        F.sum(F.col("_gain") * F.col("_w_e6")).cast("long").alias("_dcg_e6"),
        F.min(F.when(F.col("_hit") == 1, F.col("_rank"))).alias("_first_hit"),
        F.sum(
            F.when(
                F.col("_hit") == 1,
                F.expr(f"(_cum_hits * {_E6}L) div _rank"),
            ).otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("_ap_num_e6"),
    )

    # ideal ranking: judged docs by rel desc (doc asc tiebreak), the same
    # k-entry discount table indexed by ideal position
    ideal_w = Window.partitionBy("_q").orderBy(F.desc("_rel"), F.asc("_d"))
    qstats = (
        judged.withColumn("_pos", F.row_number().over(ideal_w))
        .withColumn(
            "_gain", F.expr("CAST(shiftleft(1L, CAST(_rel AS INT)) - 1L AS LONG)")
        )
        .groupBy("_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rel"),
            F.sum(
                F.when(
                    F.col("_pos") <= k,
                    F.col("_gain")
                    * F.element_at(weight_arr, F.col("_pos").cast("int")),
                ).otherwise(F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("_idcg_e6"),
        )
    )

    out = (
        qstats.join(run_agg, "_q", "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)).cast("long"))
        .withColumn(
            "recall_e6", F.expr(f"(n_hits * {_E6}L) div n_rel").cast("long")
        )
        .withColumn(
            "precision_e6", F.expr(f"(n_hits * {_E6}L) div {k}L").cast("long")
        )
        .withColumn(
            "rr_e6",
            F.when(
                F.col("_first_hit").isNotNull(),
                F.expr(f"{_E6}L div _first_hit"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "ap_e6",
            F.expr(
                f"coalesce(_ap_num_e6, 0L) div least(n_rel, {k}L)"
            ).cast("long"),
        )
        .withColumn(
            "ndcg_e6",
            F.expr(f"(coalesce(_dcg_e6, 0L) * {_E6}L) div _idcg_e6").cast(
                "long"
            ),
        )
    )
    return out.select(
        F.col("_q").alias(query_col),
        "n_rel",
        "n_hits",
        "recall_e6",
        "precision_e6",
        "rr_e6",
        "ap_e6",
        "ndcg_e6",
    )


def ir_metrics_sql(
    run_cte: str,
    qrels_cte: str,
    k: int = 10,
    query_col: str = "query_id",
) -> str:
    """DuckDB oracle for :func:`ir_metrics` — identical integer
    arithmetic; ``run_cte``/``qrels_cte`` are SQL bodies exposing
    (query_id, doc_id, rank) and (query_id, doc_id, rel)."""
    w_e6 = dcg_weights_e6(k)
    w_case = lambda col: (  # noqa: E731 — tiny local template helper
        "CASE " + col + " "
        + " ".join(f"WHEN {r + 1} THEN {w}" for r, w in enumerate(w_e6))
        + " END"
    )
    return f"""
WITH run AS ({run_cte}),
qrels AS ({qrels_cte}),
scored AS (
    SELECT r.query_id AS q, r.doc_id AS d, r.rank,
           CAST(coalesce(j.rel, 0) AS BIGINT) AS rel,
           CASE WHEN coalesce(j.rel, 0) > 0 THEN 1 ELSE 0 END AS hit,
           CAST((1::BIGINT << coalesce(j.rel, 0)) - 1 AS BIGINT) AS gain,
           CAST({w_case('r.rank')} AS BIGINT) AS w_e6
    FROM run r LEFT JOIN qrels j
      ON j.query_id = r.query_id AND j.doc_id = r.doc_id
    WHERE r.rank <= {k}
),
cum AS (
    SELECT *, sum(hit) OVER (
        PARTITION BY q ORDER BY rank
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum_hits
    FROM scored
),
run_agg AS (
    SELECT q,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           CAST(sum(gain * w_e6) AS BIGINT) AS dcg_e6,
           min(CASE WHEN hit = 1 THEN rank END) AS first_hit,
           CAST(sum(CASE WHEN hit = 1
                         THEN (cum_hits * {_E6}) // rank
                         ELSE 0 END) AS BIGINT) AS ap_num_e6
    FROM cum GROUP BY q
),
ideal AS (
    SELECT query_id AS q, rel,
           row_number() OVER (
               PARTITION BY query_id ORDER BY rel DESC, doc_id ASC
           ) AS pos
    FROM qrels
),
qstats AS (
    SELECT q,
           CAST(count(*) AS BIGINT) AS n_rel,
           CAST(sum(CASE WHEN pos <= {k}
                         THEN ((1::BIGINT << rel) - 1) * ({w_case('pos')})
                         ELSE 0 END) AS BIGINT) AS idcg_e6
    FROM ideal GROUP BY q
)
SELECT s.q AS {query_col},
       s.n_rel,
       CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((coalesce(a.n_hits, 0) * {_E6}) // s.n_rel AS BIGINT) AS recall_e6,
       CAST((coalesce(a.n_hits, 0) * {_E6}) // {k} AS BIGINT) AS precision_e6,
       CAST(CASE WHEN a.first_hit IS NOT NULL
                 THEN {_E6} // a.first_hit ELSE 0 END AS BIGINT) AS rr_e6,
       CAST(coalesce(a.ap_num_e6, 0) // least(s.n_rel, {k}) AS BIGINT) AS ap_e6,
       CAST((coalesce(a.dcg_e6, 0) * {_E6}) // s.idcg_e6 AS BIGINT) AS ndcg_e6
FROM qstats s LEFT JOIN run_agg a ON a.q = s.q
"""
