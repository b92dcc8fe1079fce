"""r12: the events family's fourth decade (VERDICT r11 item 4).

Documents and embeddings hold 1000× datapoints (PERF.md r10/r11); events
stopped at 100× (10M rows, r9 continuation 5). This probe runs the
window-heavy event-analytics shapes — per-user ordered frames are the
memory risk: a user's whole history buffers inside one WindowExec task —
over the streamed ``events0.1x1000`` fixture (100M events, user
population grown 1000× with per-user structure byte-identical), on the
default 8 GB heap.

Full-column evaluation via ``bench.force_full`` (``count()`` lets
Catalyst prune the computed columns — the r8 lesson).

Usage: python tools/probe_events_1000x.py [query ...]
(default: sessionize events_funnel events_transitions events_attribution)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, ".scale_fixtures", "events0.1x1000")
DEFAULT = ["sessionize", "events_funnel", "events_transitions", "events_attribution"]


def main(names: list[str]) -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128")
    from bench import force_full

    from sample_deepbook_margin_dune_dbt_spark.engine.session import get_spark
    from sample_deepbook_margin_dune_dbt_spark.queries import FULL_QUERIES

    spark = get_spark(app_name="probe-events-1000x")
    for name in names:
        fn, _ = FULL_QUERIES[name]
        t0 = time.time()
        rows = force_full(fn(spark, FIXTURE))
        wall = time.time() - t0
        print(f"EVENTS_1000X {name} rows={rows} wall={wall:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT)
