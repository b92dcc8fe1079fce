"""Streaming media dedup (`streaming/media.py`) — the r14 streaming twin
of the incremental media DAG: parquet payload drops → frame-signature
index + verified near-dup pairs + clusters, per-batch, through the SAME
`media_signatures` / `media_index_rows` /
`media_neardup_pairs_from_index` / `incremental_cluster_fold` cores the
batch models run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import TableStore
from sample_deepbook_margin_dune_dbt_spark.operators import multimodal as M
from sample_deepbook_margin_dune_dbt_spark.streaming import stream_media_dedup


def _media_df(spark, ids):
    """media_id % 3 picks the modality (the incremental-DAG fixture's
    convention); keys=7 plants real dup groups in every modality."""
    base = spark.createDataFrame([(i,) for i in ids], "media_id long")
    img = M.attach_pattern_png(
        base.filter(F.col("media_id") % 3 == 0), "media_id", keys=7
    ).select("media_id", F.lit("image").alias("kind"),
             F.col("png_payload").alias("payload"))
    aud = M.attach_pattern_wav(
        base.filter(F.col("media_id") % 3 == 1), "media_id", keys=7
    ).select("media_id", F.lit("audio").alias("kind"),
             F.col("wav_payload").alias("payload"))
    vid = M.attach_pattern_video(
        base.filter(F.col("media_id") % 3 == 2), "media_id", keys=7
    ).select("media_id", F.lit("video").alias("kind"),
             F.col("video_payload").alias("payload"))
    return img.unionByName(aud).unionByName(vid)


def _drop(spark, landing: str, name: str, ids) -> None:
    os.makedirs(landing, exist_ok=True)
    _media_df(spark, ids).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, name)
    )


def _batch_pairs(spark, ids):
    media = _media_df(spark, ids)
    img = M.image_near_dup_pairs(
        media.filter(F.col("kind") == "image"), "media_id", "payload")
    aud = M.audio_near_dup_pairs(
        media.filter(F.col("kind") == "audio"), "media_id", "payload")
    vid = M.video_near_dup_pairs(
        media.filter(F.col("kind") == "video"), "media_id", "payload")
    return {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in img.unionByName(aud).unionByName(vid).collect()
    }


ALL_IDS = list(range(36))
DROPS = [ALL_IDS[:12], ALL_IDS[12:24], ALL_IDS[24:]]


@pytest.fixture(scope="module")
def driven(spark, tmp_path_factory):
    """Three sequential drops through one checkpointed stream."""
    root = tmp_path_factory.mktemp("smedia")
    landing = str(root / "landing")
    store = TableStore(spark, str(root / "wh"))
    ckpt = str(root / "ckpt")
    for i, ids in enumerate(DROPS):
        _drop(spark, landing, f"batch{i}.parquet", ids)
        stream_media_dedup(
            spark, landing, store, ckpt,
            clusters_table="corpus_media_neardup_clusters_inc",
        ).awaitTermination(180)
    return landing, store, ckpt


def test_stream_media_three_drops_match_batch_tiers(spark, driven):
    """N drops ≡ the batch perceptual tiers over the full corpus — the
    same induction as the incremental DAG, through the stream."""
    _, store, _ = driven
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in store.read("corpus_media_neardup_pairs").collect()
    }
    want = _batch_pairs(spark, ALL_IDS)
    assert got == want
    assert want, "fixture must plant media near-duplicates"
    kind_of = {0: "image", 1: "audio", 2: "video"}
    assert {kind_of[a % 3] for a, _, _ in want} == {"image", "audio", "video"}


def test_stream_media_index_matches_batch_layout(spark, driven):
    """The persisted index ≡ `media_index_rows` over the full corpus —
    byte-interoperable with the batch DAG's table."""
    _, store, _ = driven
    want = {
        tuple(r)
        for r in M.media_index_rows(
            M.media_signatures(_media_df(spark, ALL_IDS))
        ).collect()
    }
    got = {
        (r["media_id"], r["kind"], r["frame_index"], r["band"],
         r["band_key"], r["fp_hi"], r["fp_lo"])
        for r in store.read("corpus_media_signature_index").collect()
    }
    assert got == want


def test_stream_media_clusters_match_full_cc(spark, driven):
    """Per-batch contracted-graph folds ≡ a full `duplicate_clusters`
    rebuild over the batch pair set."""
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        duplicate_clusters,
    )

    _, store, _ = driven
    got = {
        r["media_id"]: r["cluster_id"]
        for r in store.read("corpus_media_neardup_clusters_inc").collect()
    }
    pairs = _batch_pairs(spark, ALL_IDS)
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b, _ in pairs], "id_a long, id_b long"
    )
    want = {
        r["id"]: r["cluster_id"] for r in duplicate_clusters(pairs_df).collect()
    }
    clustered_got = {d: c for d, c in got.items() if c != d or d in want}
    assert clustered_got == want
    assert set(got) == set(ALL_IDS)  # singletons label themselves


def test_stream_media_rerun_is_idempotent(spark, driven):
    """Restarting the checkpointed stream with no new files leaves every
    table unchanged (at-least-once replay safety rides the MERGEs)."""
    landing, store, ckpt = driven
    before = {
        t: store.read(t).count()
        for t in ("corpus_media_signature_index", "corpus_media_neardup_pairs",
                  "corpus_media_neardup_clusters_inc")
    }
    pairs_before = {
        tuple(r) for r in store.read("corpus_media_neardup_pairs").collect()
    }
    stream_media_dedup(
        spark, landing, store, ckpt,
        clusters_table="corpus_media_neardup_clusters_inc",
    ).awaitTermination(120)
    for t, n in before.items():
        assert store.read(t).count() == n, t
    assert {
        tuple(r) for r in store.read("corpus_media_neardup_pairs").collect()
    } == pairs_before
