"""Multimodal-dedup decade probe (r14, VERDICT r13 item 5).

The pattern fixtures alias content keys mod the pattern modulus (160 for
images), so planted group SIZES — and with them pair volume — grow
linearly with the corpus at fixed keys: the pair output of a full
pattern-fixture run is quadratic BY FIXTURE CONSTRUCTION, not by
operator behavior. The decade probe therefore separates the two claims
a 100 TB run actually depends on:

1. ``decode`` — the codec floor: synth-encode + parse + pixel/sample
   decode + integer hash, one Arrow pass per modality
   (``image_ahash`` / ``audio_fingerprint`` / ``video_frame_ahash``
   over pattern payloads). Linear; reports payloads/sec and per-core
   throughput. This is the Python-side cost a cluster pays per payload
   regardless of dedup outcome.

2. ``tail`` — the banded-Hamming machinery at decades over SYNTHETIC
   signatures with BOUNDED planted groups (group count scales, group
   size fixed — the realistic near-dup shape): xxhash64-derived base
   fingerprints per group, per-member single-bit perturbations, all
   Catalyst expressions (no Python in the generator). Measures
   band-explode → bucket-collect → pair-expand → equi-join verify with
   pair volume linear in n.

Usage:
    python tools/probe_multimodal_scale.py decode [fixture] [image|audio|video ...]
    python tools/probe_multimodal_scale.py tail  [n_docs] [group_size]

Record results (and walls, honestly) in PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from sample_deepbook_margin_dune_dbt_spark.engine import get_spark  # noqa: E402
from sample_deepbook_margin_dune_dbt_spark.operators import multimodal as M  # noqa: E402


def probe_decode(spark, fixture: str, modalities: list[str]) -> None:
    docs = spark.read.parquet(os.path.join(fixture, "documents.parquet"))
    n = docs.count()
    cores = spark.sparkContext.defaultParallelism
    base = docs.select("doc_id").repartition(cores, "doc_id")
    print(f"decode probe: {n} docs, {cores} cores, fixture={fixture}", flush=True)
    for mod in modalities:
        t0 = time.time()
        if mod == "image":
            sig = M.image_ahash(
                M.attach_pattern_png(base, "doc_id", keys=199),
                "doc_id", "png_payload",
            )
        elif mod == "audio":
            sig = M.audio_fingerprint(
                M.attach_pattern_wav(base, "doc_id", keys=199),
                "doc_id", "wav_payload",
            )
        elif mod == "video":
            sig = M.video_frame_ahash(
                M.attach_pattern_video(base, "doc_id"),
                "doc_id", "video_payload",
            )
        else:
            raise SystemExit(f"unknown modality {mod!r}")
        rows = sig.count()
        dt = time.time() - t0
        print(
            f"  {mod}: {dt:.1f} s, {rows} signature rows, "
            f"{n / dt:.0f} payloads/s ({n / dt / cores:.0f}/s/core)",
            flush=True,
        )


def probe_tail(
    spark, n_docs: int, group_size: int, arity: int = 1, shape: str = "collect"
) -> None:
    cores = spark.sparkContext.defaultParallelism
    # bounded planted groups: base 64-bit fp per group from xxhash64,
    # member j of a group flips bit (j % 32) of the lo half — distances
    # within a group stay ≤ 2, distances across groups are random-far
    ids = spark.range(n_docs).select(F.col("id"))
    grp = (F.col("id") / group_size).cast("long")
    base = F.xxhash64(grp.cast("string"))
    hi = F.shiftrightunsigned(base, 32).bitwiseAND(F.lit((1 << 32) - 1))
    flip = F.expr(
        f"CASE WHEN id % {group_size} = 0 THEN 0L "
        f"ELSE shiftleft(1L, int((id % {group_size}) % 32)) END"
    )
    lo = base.bitwiseAND(F.lit((1 << 32) - 1)).bitwiseXOR(flip)
    sig = ids.select(
        F.col("id"), hi.cast("long").alias("hi"), lo.cast("long").alias("lo")
    )
    t0 = time.time()
    n_pairs = M._banded_hamming_pairs(
        sig, "hi", "lo", 6, 8, 10_000, arity=arity, candidate_shape=shape
    ).count()
    dt = time.time() - t0
    print(
        f"tail probe: n={n_docs} groups_of={group_size} arity={arity} "
        f"shape={shape} cores={cores} — "
        f"{dt:.1f} s, {n_pairs} pairs "
        f"(expected ~{n_docs // group_size * group_size * (group_size - 1) // 2})",
        flush=True,
    )


def _synth_sig(spark, n_docs: int, group_size: int, id_offset: int = 0):
    """(media_id, kind, frame_index, fp_hi, fp_lo) synthetic image
    signatures with bounded planted groups (the ``tail`` generator's
    shape in the ``media_signatures`` layout)."""
    ids = spark.range(n_docs).select((F.col("id") + id_offset).alias("media_id"))
    grp = ((F.col("media_id")) / group_size).cast("long")
    base = F.xxhash64(grp.cast("string"))
    hi = F.shiftrightunsigned(base, 32).bitwiseAND(F.lit((1 << 32) - 1))
    flip = F.expr(
        f"CASE WHEN media_id % {group_size} = 0 THEN 0L "
        f"ELSE shiftleft(1L, int((media_id % {group_size}) % 32)) END"
    )
    lo = base.bitwiseAND(F.lit((1 << 32) - 1)).bitwiseXOR(flip)
    return ids.select(
        "media_id",
        F.lit("image").alias("kind"),
        F.lit(0).alias("frame_index"),
        hi.cast("long").alias("fp_hi"),
        lo.cast("long").alias("fp_lo"),
    )


def probe_pairs(
    spark, n_index: int, n_new: int, arity: int = 1, group_size: int = 4
) -> None:
    """The incremental premise measured: a persisted index of n_index
    signatures vs a batch of n_new NEW signatures through
    ``media_neardup_pairs_from_index`` (broadcast-probe prefilter —
    index-sided work must scale with the BATCH's bucket occupancy, not
    the corpus). The index is staged to parquet first so the probe
    times the join, not the generator."""
    import tempfile

    d = tempfile.mkdtemp()
    _synth_sig(spark, n_index, group_size).write.parquet(d + "/sig")
    sig = spark.read.parquet(d + "/sig")
    M.media_index_rows(sig, arity=arity).write.parquet(d + "/idx")
    idx = spark.read.parquet(d + "/idx")
    new_sig = _synth_sig(spark, n_new, group_size, id_offset=n_index)
    M.media_index_rows(new_sig, arity=arity).write.parquet(d + "/new")
    new = spark.read.parquet(d + "/new")
    # mirror the real call order: the batch MERGEs into the index
    # before pair generation, so the accumulated side includes it
    t0 = time.time()
    n_pairs = M.media_neardup_pairs_from_index(
        new, idx.unionByName(new)
    ).count()
    dt = time.time() - t0
    print(
        f"pairs probe: idx={n_index} new={n_new} arity={arity} "
        f"groups_of={group_size} — {dt:.1f} s, {n_pairs} pairs",
        flush=True,
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "decode"
    # fourth-decade runs need the spill-aware partition sizing rule:
    # the tail's bucket-collect holds list buffers per in-flight group,
    # so groups-per-task must fit the heap (20M sigs × 56 composite
    # bands over 32 partitions OOM'd the default 8 GB JVM — r14)
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    # SPARK_GRAFT_SORT_AGG=1 forces SortAggregate for the bucket-collect:
    # at fourth-decade cardinality (~1e9 distinct bucket keys) the
    # MAP-SIDE PARTIAL collect_set holds a buffer per in-flight key and
    # OOMs the 8 GB heap regardless of shuffle partitioning; sort-based
    # aggregation streams one group at a time (measured r14)
    extra = (
        {"spark.sql.execution.useObjectHashAggregateExec": "false"}
        if os.environ.get("SPARK_GRAFT_SORT_AGG")
        else None
    )
    spark = get_spark(
        app_name="multimodal-probe",
        shuffle_partitions=shuffle,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "decode":
        fixture = sys.argv[2] if len(sys.argv) > 2 else ".scale_fixtures/docs0.1x10"
        mods = sys.argv[3:] or ["image", "audio", "video"]
        probe_decode(spark, fixture, mods)
    elif mode == "tail":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
        g = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        a = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        shape = sys.argv[5] if len(sys.argv) > 5 else "collect"
        probe_tail(spark, n, g, a, shape)
    elif mode == "pairs":
        ni = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
        nn = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
        a = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        probe_pairs(spark, ni, nn, a)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
