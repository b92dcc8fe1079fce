"""Bitext-mining scale probe (r13, VERDICT r12 item 1's PERF datapoint).

Runs `mine_parallel_pairs` over an N× embeddings scale fixture with the
label-parity sides (the declared query's shape — each side is HALF the
corpus, the web-scale mining regime where neither side is a bounded
query set):

1. asserts the EXACT tier's max_anchors guard refuses (side A is
   ~N·1000 anchors — the unguarded collect the r12 verdict flagged);
2. runs the IVF generator tier end-to-end on the default heap and
   reports wall time, mined-pair count, and the mutual-pair share.

Usage: python tools/probe_bitext_scale.py [fixture_dir] [n_lists]
                                          [n_probes] [train_strategy]
Defaults: .scale_fixtures/sf0.1x100, auto n_lists, 8 probes, driver.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sample_deepbook_margin_dune_dbt_spark.engine import get_spark  # noqa: E402
from sample_deepbook_margin_dune_dbt_spark.operators import bitext as BX  # noqa: E402


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scale_fixtures/sf0.1x100"
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    n_probes = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    train_strategy = sys.argv[4] if len(sys.argv) > 4 else "driver"

    spark = get_spark(app_name="bitext-probe")
    emb = spark.read.parquet(f"{fixture}/embeddings.parquet").withColumn(
        "_side", F.col("label") % 2 == 0
    )
    n = emb.count()
    print(f"fixture {fixture}: {n} vectors", flush=True)

    # 1. the guard: the exact tier must REFUSE to collect half the corpus
    try:
        BX.mine_parallel_pairs(emb, "vec_id", "embedding", "_side", k=4).count()
        print("GUARD DID NOT FIRE — exact tier collected the corpus side")
    except ValueError as e:
        print(f"exact-tier guard fired as designed: {str(e)[:80]}...", flush=True)

    # 2. the distributed tier
    t0 = time.time()
    out = BX.mine_parallel_pairs(
        emb,
        "vec_id",
        "embedding",
        "_side",
        k=4,
        margin_threshold_e6=1_000_000,
        strategy="ivf",
        n_lists=n_lists or None,
        n_probes=n_probes,
        train_strategy=train_strategy,
        train_sample=max(100_000, 16 * n_lists) if n_lists else 100_000,
        max_bucket_size=50_000,
    )
    rows = out.collect()
    wall = time.time() - t0
    mutual = sum(1 for r in rows if r["mutual"])
    print(
        f"ivf tier: {wall:.1f} s wall, {len(rows)} mined pairs, "
        f"{mutual} mutual ({mutual / max(len(rows), 1):.2%}), "
        f"n_lists={n_lists or 'auto'} n_probes={n_probes} "
        f"train={train_strategy}",
        flush=True,
    )


if __name__ == "__main__":
    main()
