"""Retrieval-family fourth-decade probe (r13, VERDICT r12 item 7).

Streams the 1000× documents fixture (5M docs, per-copy token-prefixed so
duplicate/candidate counts scale LINEARLY by construction) through the
tokenize→explode-heavy members of the retrieval/jaccard families at the
DEFAULT heap, timing full-column evaluation (`bench.force_full` — a
`count()` would let Catalyst prune the computed columns):

    python tools/probe_retrieval_1000x.py [fixture] [query ...]

Defaults: .scale_fixtures/docs0.1x1000 with text_bm25_topk then
dedup_jaccard_prefix. Record walls (or failures — honestly) in PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import force_full  # noqa: E402
from sample_deepbook_margin_dune_dbt_spark.engine import get_spark  # noqa: E402
from sample_deepbook_margin_dune_dbt_spark.queries import FULL_QUERIES  # noqa: E402


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scale_fixtures/docs0.1x1000"
    names = sys.argv[2:] or ["text_bm25_topk", "dedup_jaccard_prefix"]
    spark = get_spark(app_name="retrieval-probe")
    for name in names:
        fn, _ = FULL_QUERIES[name]
        t0 = time.time()
        try:
            n = force_full(fn(spark, fixture))
            print(f"{name}: {time.time() - t0:.1f} s, {n} rows", flush=True)
        except Exception as e:  # record the wall, don't hide it
            print(
                f"{name}: FAILED after {time.time() - t0:.1f} s — "
                f"{type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
