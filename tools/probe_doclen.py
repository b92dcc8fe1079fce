"""r12: doc-LENGTH decade probe for the array-lambda operator class.

The corpus fixtures scale ROW count; the quadratic-lambda hazards found
in r12 (HOF lambdas re-evaluating inline array expressions per element;
UTF8String substr scanning O(position) per call) scale with DOCUMENT
LENGTH, which short fixture docs hide. This probe repeats each sf0.01
document's text ×mult and times the affected operators end-to-end —
linear wall across the ladder is the acceptance criterion (PERF.md
"r12 addendum: doc-LENGTH decades").

Usage: python tools/probe_doclen.py [mults ...]   (default 1 4 16 64)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(mults: list[int]) -> None:
    from pyspark.sql import functions as F

    from bench import force_full
    from sample_deepbook_margin_dune_dbt_spark.engine.session import get_spark
    from sample_deepbook_margin_dune_dbt_spark.operators import chunking as C
    from sample_deepbook_margin_dune_dbt_spark.operators import dedup as D

    spark = get_spark(app_name="probe-doclen")
    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    for mult in mults:
        docs = base.withColumn(
            "text", F.array_join(F.array_repeat(F.col("text"), mult), " ")
        ).localCheckpoint()
        n_chars = docs.agg(F.sum(F.length("text"))).first()[0]
        for name, df in [
            ("winnow", D.winnow_fingerprints(docs, "doc_id", "text", k=8, window=4)),
            ("cdc", C.chunk_content_defined(docs, "doc_id", "text")),
            ("window_rows", D._window_rows(docs, "doc_id", "text", 12)),
            ("boilerplate", D.segment_boilerplate_dedup(docs, "doc_id", "text")),
        ]:
            ts = []
            for _ in range(3):
                t0 = time.time()
                force_full(df)
                ts.append(time.time() - t0)
            print(
                f"DOCLEN mult={mult} chars={n_chars} {name} "
                f"median={sorted(ts)[1]:.2f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 4, 16, 64])
