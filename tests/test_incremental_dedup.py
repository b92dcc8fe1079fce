"""Incremental cross-run dedup (VERDICT r5 item 5):
``corpus_fingerprint_index`` (MERGE-upserted MinHash band + exact
fingerprint index) and ``corpus_neardup_pairs`` (only NEW docs join the
accumulated index). Pins: N incremental growth steps ≡ one full rebuild;
idempotency on a no-growth run; the only-new-side scan prunes at the
parquet footer (pushed doc_id watermark filter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore
from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
    minhash_band_rows,
    minhash_lsh_candidates,
)
import sample_deepbook_margin_dune_dbt_spark.models_corpus  # noqa: F401


@pytest.fixture(scope="module")
def doc_slices(spark, sf_dir, tmp_path_factory):
    """Three growth snapshots of the documents table, by doc_id thirds."""
    root = tmp_path_factory.mktemp("growth")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3], ids[-1]]
    paths = []
    for i, cut in enumerate(cuts):
        p = str(root / f"step{i}")
        docs.filter(F.col("doc_id") <= cut).write.parquet(p)
        paths.append(p)
    return paths


def _pairs(store):
    return {
        (r["id_a"], r["id_b"])
        for r in store.read("corpus_neardup_pairs")
        .filter(F.col("id_a") < F.col("id_b"))
        .collect()
    }


def test_incremental_equals_full_rebuild(spark, sf_dir, doc_slices, tmp_path):
    inc_store = TableStore(spark, str(tmp_path / "inc"))
    for p in doc_slices:
        Runner(spark, inc_store, {"main.documents": p}).run(
            "+corpus_neardup_pairs"
        )

    # full rebuild twin over the final corpus, same banding parameters
    full_docs = spark.read.parquet(doc_slices[-1])
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(full_docs, "doc_id", "text").collect()
    }
    assert _pairs(inc_store) == want
    assert want, "fixture corpus must contain near-duplicates"

    # the index itself accumulated every doc's band rows exactly once
    idx = inc_store.read("corpus_fingerprint_index")
    want_bands = minhash_band_rows(full_docs, "doc_id", "text")
    assert idx.count() == want_bands.count()
    assert (
        idx.select("doc_id", "band", "band_key")
        .exceptAll(want_bands)
        .count()
        == 0
    )


def test_no_growth_run_is_idempotent(spark, doc_slices, tmp_path):
    store = TableStore(spark, str(tmp_path / "idem"))
    runner = Runner(spark, store, {"main.documents": doc_slices[0]})
    runner.run("+corpus_neardup_pairs")
    idx_n, pairs = store.read("corpus_fingerprint_index").count(), _pairs(store)
    runner.run("+corpus_neardup_pairs")
    assert store.read("corpus_fingerprint_index").count() == idx_n
    assert _pairs(store) == pairs


def test_incremental_scans_only_new_side(spark, doc_slices, tmp_path):
    """Plan pin: on an incremental run both models' NEW sides carry a
    pushed doc_id watermark predicate, so the scan prunes at the parquet
    footer instead of re-reading the accumulated corpus."""
    from sample_deepbook_margin_dune_dbt_spark.engine.model import (
        ModelContext,
        get_model,
    )

    store = TableStore(spark, str(tmp_path / "plan"))
    sources = {"main.documents": doc_slices[0]}
    Runner(spark, store, sources).run("+corpus_neardup_pairs")

    for name in ("corpus_fingerprint_index", "corpus_neardup_pairs"):
        cfg = get_model(name)
        ctx = ModelContext(spark, store, sources, cfg)
        assert ctx.is_incremental()
        plan = cfg.builder(ctx)._jdf.queryExecution().executedPlan().toString()
        assert "GreaterThan(doc_id," in plan, name


def test_incremental_clusters_equal_full_cc(spark, doc_slices, tmp_path):
    """Contracted-graph incremental CC ≡ full duplicate_clusters rebuild
    across 3 growth steps (singletons label themselves in the
    incremental table; the full twin omits them)."""
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        duplicate_clusters,
    )

    store = TableStore(spark, str(tmp_path / "cc"))
    for p in doc_slices:
        Runner(spark, store, {"main.documents": p}).run(
            "+corpus_neardup_clusters_inc"
        )

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in store.read("corpus_neardup_clusters_inc").collect()
    }
    full_docs = spark.read.parquet(doc_slices[-1])
    pairs = minhash_lsh_candidates(full_docs, "doc_id", "text")
    want = {
        r["id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    clustered_got = {d: c for d, c in got.items() if c != d or d in want}
    # every clustered doc agrees with the full rebuild
    assert clustered_got == want
    assert want, "fixture corpus must contain near-dup clusters"
    # and the incremental table covers every ingested doc exactly once
    assert set(got) == {r["doc_id"] for r in full_docs.select("doc_id").collect()}


def test_incremental_clusters_merge_across_steps(spark, tmp_path):
    """A later batch that BRIDGES two existing clusters relabels the old
    rows through the resolve map (the changed-old MERGE path)."""
    import sample_deepbook_margin_dune_dbt_spark.models_corpus  # noqa: F401

    t_a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    t_b = "kilo lima mike november oscar papa quebec romeo sierra tango"
    steps = [
        [(1, t_a), (2, t_a + " one"), (10, t_b), (11, t_b + " two")],
        # doc 20 is near BOTH families: its text shares shingles with each
        [(20, t_a + " " + t_b)],
    ]
    paths = []
    for i, rows in enumerate(steps):
        p = str(tmp_path / f"s{i}")
        acc = [r for s in steps[: i + 1] for r in s]
        spark.createDataFrame(acc, "doc_id long, text string").write.parquet(p)
        paths.append(p)

    store = TableStore(spark, str(tmp_path / "wh"))
    Runner(spark, store, {"main.documents": paths[0]}).run(
        "+corpus_neardup_clusters_inc"
    )
    first = {
        r["doc_id"]: r["cluster_id"]
        for r in store.read("corpus_neardup_clusters_inc").collect()
    }
    assert first[2] == 1 and first[11] == 10  # two separate families

    Runner(spark, store, {"main.documents": paths[1]}).run(
        "+corpus_neardup_clusters_inc"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in store.read("corpus_neardup_clusters_inc").collect()
    }
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        duplicate_clusters,
    )

    all_docs = spark.createDataFrame(
        [r for s in steps for r in s], "doc_id long, text string"
    )
    want = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(
            minhash_lsh_candidates(all_docs, "doc_id", "text")
        ).collect()
    }
    for d, c in want.items():
        assert got[d] == c, (d, got[d], c)


def test_canonical_documents_over_incremental_clusters(
    spark, doc_slices, tmp_path
):
    """``corpus_canonical_documents`` rebuilt after N growth steps equals
    the operator applied to the full-rebuild clusters, and every
    canonical is the max-chars (min-id tie-break) member of its
    cluster."""
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        duplicate_clusters,
        keep_best_per_cluster,
    )

    store = TableStore(spark, str(tmp_path / "canon"))
    for p in doc_slices:
        Runner(spark, store, {"main.documents": p}).run(
            "+corpus_canonical_documents"
        )

    got = {
        r["cluster_id"]: (
            r["cluster_size"],
            r["canonical_doc_id"],
            r["canonical_chars"],
        )
        for r in store.read("corpus_canonical_documents").collect()
    }

    full_docs = spark.read.parquet(doc_slices[-1])
    pairs = minhash_lsh_candidates(full_docs, "doc_id", "text")
    clusters = duplicate_clusters(pairs)
    # singletons label themselves in the incremental table (watermark
    # contract); add them to the full-rebuild twin the same way
    singles = (
        full_docs.select(F.col("doc_id").alias("id"))
        .join(clusters.select("id"), "id", "left_anti")
        .withColumn("cluster_id", F.col("id"))
    )
    want_df = keep_best_per_cluster(
        clusters.unionByName(singles),
        full_docs,
        "doc_id",
        "n_chars",
    )
    want = {
        r["cluster_id"]: (
            r["cluster_size"],
            r["canonical_doc_id"],
            r["canonical_quality"],
        )
        for r in want_df.collect()
    }
    assert got == want
    assert any(sz > 1 for sz, _, _ in got.values()), "needs real clusters"


# ------------------------------------------------ incremental media dedup


@pytest.fixture(scope="module")
def media_slices(spark, sf_dir, tmp_path_factory):
    """Three growth snapshots of a mixed image+audio+video media table:
    media_id % 3 picks the modality — pattern PNGs, pattern WAVs,
    pattern SVID containers (keys=7 so the fixture plants real dup
    groups in every modality). media_id is monotone — the watermark
    column."""
    from sample_deepbook_margin_dune_dbt_spark.operators import multimodal as M

    root = tmp_path_factory.mktemp("media_growth")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(90)
    )
    img = M.attach_pattern_png(
        docs.select((F.col("doc_id") * 3).alias("media_id")),
        "media_id", keys=7,
    ).select("media_id", F.lit("image").alias("kind"),
             F.col("png_payload").alias("payload"))
    aud = M.attach_pattern_wav(
        docs.select((F.col("doc_id") * 3 + 1).alias("media_id")),
        "media_id", keys=7,
    ).select("media_id", F.lit("audio").alias("kind"),
             F.col("wav_payload").alias("payload"))
    vid = M.attach_pattern_video(
        docs.select((F.col("doc_id") * 3 + 2).alias("media_id")),
        "media_id", keys=7,
    ).select("media_id", F.lit("video").alias("kind"),
             F.col("video_payload").alias("payload"))
    media = img.unionByName(aud).unionByName(vid)
    ids = sorted(r["media_id"] for r in media.select("media_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3], ids[-1]]
    paths = []
    for i, cut in enumerate(cuts):
        p = str(root / f"step{i}")
        media.filter(F.col("media_id") <= cut).write.parquet(p)
        paths.append(p)
    return paths


def _media_pairs(store):
    return {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in store.read("corpus_media_neardup_pairs")
        .filter(F.col("id_a") < F.col("id_b"))
        .collect()
    }


def _batch_media_pairs(spark, path):
    """Full-rebuild twin: the batch perceptual tiers per modality."""
    from sample_deepbook_margin_dune_dbt_spark.operators import multimodal as M

    media = spark.read.parquet(path)
    img = M.image_near_dup_pairs(
        media.filter(F.col("kind") == "image"), "media_id", "payload"
    )
    aud = M.audio_near_dup_pairs(
        media.filter(F.col("kind") == "audio"), "media_id", "payload"
    )
    vid = M.video_near_dup_pairs(
        media.filter(F.col("kind") == "video"), "media_id", "payload"
    )
    return {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in img.unionByName(aud).unionByName(vid).collect()
    }


def _index_rows_expected(spark, path, bands_factor):
    """Expected index cardinality: one row per (payload frame, band
    combination) — image/audio count one frame, video its sampled
    frames."""
    media = spark.read.parquet(path)
    n_single = media.filter(F.col("kind") != "video").count()
    n_video = media.filter(F.col("kind") == "video").count()
    return (n_single + n_video * 4) * bands_factor


def test_media_incremental_equals_full_rebuild(spark, media_slices, tmp_path):
    """N incremental media runs ≡ the batch image/audio tiers over the
    final corpus — same pairs, same verified Hamming distances."""
    store = TableStore(spark, str(tmp_path / "minc"))
    for p in media_slices:
        Runner(spark, store, {"main.media": p}).run(
            "+corpus_media_neardup_pairs"
        )
    want = _batch_media_pairs(spark, media_slices[-1])
    assert _media_pairs(store) == want
    assert want, "fixture must contain planted media near-duplicates"
    # all three modalities actually contribute
    kinds = {r["kind"] for r in store.read("corpus_media_signature_index")
             .select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # every modality plants real pairs (not just the index rows):
    # media_id % 3 encodes the modality by fixture construction
    kind_of = {0: "image", 1: "audio", 2: "video"}
    assert {kind_of[a % 3] for a, _, _ in want} == {"image", "audio", "video"}
    # index: one row per (payload frame, band)
    from sample_deepbook_margin_dune_dbt_spark.models_corpus.models import (
        MEDIA_BANDS,
    )
    assert store.read("corpus_media_signature_index").count() == \
        _index_rows_expected(spark, media_slices[-1], MEDIA_BANDS)


def test_media_no_growth_run_is_idempotent(spark, media_slices, tmp_path):
    store = TableStore(spark, str(tmp_path / "midem"))
    runner = Runner(spark, store, {"main.media": media_slices[0]})
    runner.run("+corpus_media_neardup_pairs")
    idx_n = store.read("corpus_media_signature_index").count()
    pairs = _media_pairs(store)
    runner.run("+corpus_media_neardup_pairs")
    assert store.read("corpus_media_signature_index").count() == idx_n
    assert _media_pairs(store) == pairs


def test_media_incremental_scans_only_new_side(spark, media_slices, tmp_path):
    """Plan pin: on an incremental run the index model's NEW side carries
    a pushed media_id watermark predicate (payload decode prunes at the
    parquet footer) and the pairs model's new side prunes on id_b."""
    from sample_deepbook_margin_dune_dbt_spark.engine.model import (
        ModelContext,
        get_model,
    )

    store = TableStore(spark, str(tmp_path / "mplan"))
    sources = {"main.media": media_slices[0]}
    Runner(spark, store, sources).run("+corpus_media_neardup_pairs")

    for name in ("corpus_media_signature_index", "corpus_media_neardup_pairs"):
        cfg = get_model(name)
        ctx = ModelContext(spark, store, sources, cfg)
        assert ctx.is_incremental()
        plan = cfg.builder(ctx)._jdf.queryExecution().executedPlan().toString()
        assert "GreaterThan(media_id," in plan, name


def test_media_index_composite_arity_equals_arity1(spark, media_slices, tmp_path):
    """`--vars '{media_band_arity: 2}'` bands the persisted index at the
    composite arity (the PERF.md r14 occupancy dial): the fixture's
    planted distances sit within the weaker d ≤ bands−2 pigeonhole, so
    N incremental runs at arity 2 must emit EXACTLY the arity-1 pairs,
    with C(8,2)=28 index rows per payload instead of 8."""
    from math import comb

    from sample_deepbook_margin_dune_dbt_spark.models_corpus.models import (
        MEDIA_BANDS,
    )

    store = TableStore(spark, str(tmp_path / "mar2"))
    for p in media_slices:
        Runner(
            spark, store, {"main.media": p}, vars={"media_band_arity": 2}
        ).run("+corpus_media_neardup_pairs")
    assert _media_pairs(store) == _batch_media_pairs(spark, media_slices[-1])
    assert store.read("corpus_media_signature_index").count() == \
        _index_rows_expected(spark, media_slices[-1], comb(MEDIA_BANDS, 2))
    # arity-corruption guard: an incremental run at a DIFFERENT arity
    # must refuse with the full-refresh instruction, not merge
    with pytest.raises(Exception, match="full-refresh"):
        Runner(
            spark, store, {"main.media": media_slices[-1]},
            vars={"media_band_arity": 1},
        ).run("corpus_media_signature_index")


def test_media_incremental_clusters_equal_full_cc(spark, media_slices, tmp_path):
    """Contracted-graph incremental CC over the media pair graph ≡ a full
    duplicate_clusters rebuild over the batch tiers' pairs."""
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        duplicate_clusters,
    )

    store = TableStore(spark, str(tmp_path / "mcc"))
    for p in media_slices:
        Runner(spark, store, {"main.media": p}).run(
            "+corpus_media_neardup_clusters_inc"
        )
    got = {
        r["media_id"]: r["cluster_id"]
        for r in store.read("corpus_media_neardup_clusters_inc").collect()
    }
    batch = _batch_media_pairs(spark, media_slices[-1])
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b, _ in batch], "id_a long, id_b long"
    )
    want = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs_df).collect()
    }
    clustered_got = {d: c for d, c in got.items() if c != d or d in want}
    assert clustered_got == want
    assert want, "fixture must contain media near-dup clusters"
    all_ids = {
        r["media_id"]
        for r in spark.read.parquet(media_slices[-1]).select("media_id").collect()
    }
    assert set(got) == all_ids


def test_media_dag_cli_drive(spark, media_slices, tmp_path, capsys):
    """The media dedup DAG drives end-to-end through the CLI."""
    from sample_deepbook_margin_dune_dbt_spark.__main__ import main

    wh = str(tmp_path / "mcli")
    rc = main([
        "run", "--warehouse", wh,
        "--source", f"main.media={media_slices[0]}",
        "--select", "+corpus_media_neardup_clusters_inc",
    ])
    assert rc == 0
    store = TableStore(spark, wh)
    assert store.read("corpus_media_neardup_clusters_inc").count() > 0
