"""Streaming training-shard export: document drops → sharded corpus +
continuously-maintained shard manifest.

The streaming twin of the incremental batch model
``models_corpus.corpus_training_shards``: producers drop JSONL document
files into a landing directory; each micro-batch's NEW documents (first
occurrence of a doc_id across all drops wins) are shard-assigned with the
same md5-keyed pure function as the batch tiers
(``operators/export.py::assign_shards`` — so batch and stream agree on
every document's shard forever), merged into the corpus table, and their
per-shard manifest delta folded into the accumulated manifest.

Replay-idempotence is the design problem: foreachBatch is at-least-once,
and the manifest combine (counts add, XOR composes) is NOT idempotent —
re-applying a batch's delta would double counts and cancel checksums.
The fix is the audit-table discipline of ``stream_dedup_ingest``: deltas
are MERGE-keyed on ``(shard_id, batch_id)`` into a delta table (replay
overwrites the identical row instead of re-adding), and the manifest is
the groupBy-rollup of the delta table — |shards| × |batches| rows, so
the rollup costs nothing while staying exactly equal to one batch
:func:`~..operators.export.shard_manifest` over the union of all drops
(pinned by ``tests/test_streaming_export.py``).

Scale shape per micro-batch (batch ≪ corpus): the already-ingested probe
scans the corpus once filtered by a BROADCAST of the batch's doc_ids
(hits ≤ batch size — never a hash table of the corpus side); assignment
+ tokenize + the delta aggregate are a narrow map into an n_shards-key
groupBy; the manifest rollup reads only the tiny delta table. The corpus
never re-scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.materialize import TableStore

DELTAS_SUFFIX = "_shard_deltas"
MANIFEST_SUFFIX = "_shard_manifest"


def stream_shard_export(
    spark: SparkSession,
    landing_dir: str,
    schema: str,
    store: TableStore,
    corpus_table: str,
    checkpoint_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    deltas_table: str | None = None,
    manifest_table: str | None = None,
    reader_options: dict[str, str] | None = None,
    trigger_once: bool = True,
):
    """Start the landing-dir → sharded-corpus stream; returns the query.

    Tables (defaults derived from ``corpus_table``):
    - ``corpus_table``: ingested documents + their ``shard_id``, MERGE on
      ``id_col`` (a redelivered document upserts identically);
    - ``deltas_table``: per-(shard, batch) manifest deltas, MERGE on
      ``(shard_id, batch_id)`` — the replay-idempotence ledger;
    - ``manifest_table``: the accumulated per-shard manifest (rollup of
      the ledger), MERGE on ``shard_id`` — always equal to the batch
      manifest of everything ingested so far.
    """
    from ..operators.export import assign_shards, shard_manifest

    dlt_table = deltas_table or corpus_table + DELTAS_SUFFIX
    man_table = manifest_table or corpus_table + MANIFEST_SUFFIX

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "DROPMALFORMED")
        .options(**(reader_options or {}))
        .json(landing_dir)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates([id_col])
        # first-occurrence-wins across drops: probe the corpus once,
        # filtered by a broadcast of the batch's ids (hits ≤ batch size)
        if store.exists(corpus_table):
            seen = (
                store.read(corpus_table)
                .join(F.broadcast(batch.select(id_col).distinct()), id_col, "left_semi")
                .select(id_col)
            )
            batch = batch.join(F.broadcast(seen), id_col, "left_anti")
        new = assign_shards(batch, id_col, n_shards).cache()
        try:
            if new.limit(1).count() == 0:
                return
            store.merge(new, corpus_table, [id_col])
            delta = (
                shard_manifest(new, "shard_id", text_col=text_col)
                .join(
                    new.groupBy("shard_id").agg(
                        F.max(id_col).alias(f"max_{id_col}")
                    ),
                    "shard_id",
                )
                .withColumn("batch_id", F.lit(batch_id).cast("long"))
            )
            store.merge(delta, dlt_table, ["shard_id", "batch_id"])
            manifest = (
                store.read(dlt_table)
                .groupBy("shard_id")
                .agg(
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("n_tokens").cast("long").alias("n_tokens"),
                    F.sum("n_chars").cast("long").alias("n_chars"),
                    F.bit_xor("content_xor").alias("content_xor"),
                    F.max(f"max_{id_col}").alias(f"max_{id_col}"),
                )
            )
            store.merge(manifest, man_table, ["shard_id"])
        finally:
            new.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
