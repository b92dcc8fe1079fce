"""Corpus curation models (see package docstring for the DAG)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine.model import ModelContext, model
from ..functions import text as T


@model(
    "stg_document_features",
    unique_key=["doc_id"],
    materialized="incremental",
    incremental_strategy="merge",
    tags=["corpus"],
    not_null=["doc_id", "fingerprint"],
)
def stg_document_features(ctx: ModelContext) -> DataFrame:
    """Per-document features; incremental on the doc_id watermark.

    (The generic documents table has no event time; the monotone doc_id is
    the watermark column — same P4 pattern, different column.)
    """
    docs = ctx.source("main", "documents")
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("doc_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
        docs = docs.filter(F.col("doc_id") > wm)
    return docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.round(T.quality_score(F.col("text")), 4).alias("quality"),
        T.langid(F.col("text")).alias("lang_pred"),
        T.fingerprint64(F.col("text")).alias("fingerprint"),
        ctx.now().alias("updated_at"),
    )


@model(
    "corpus_dedup_groups",
    unique_key=["fingerprint"],
    materialized="table",
    deps=["stg_document_features"],
    tags=["corpus"],
    not_null=["fingerprint", "keep_doc_id"],
)
def corpus_dedup_groups(ctx: ModelContext) -> DataFrame:
    """Exact-duplicate groups: one row per distinct content."""
    feats = ctx.ref("stg_document_features")
    return feats.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


@model(
    "corpus_stats_by_lang",
    unique_key=["lang_pred", "source"],
    materialized="table",
    deps=["stg_document_features", "corpus_dedup_groups"],
    tags=["corpus"],
    not_null=["lang_pred", "source"],
)
def corpus_stats_by_lang(ctx: ModelContext) -> DataFrame:
    """Curation rollup: per (predicted lang, source) counts, dedup rate,
    token mass, and quality distribution — the table a data-mixing run
    reads to budget its sampling."""
    feats = ctx.ref("stg_document_features")
    groups = ctx.ref("corpus_dedup_groups").select("fingerprint", "keep_doc_id")
    enriched = feats.join(groups, "fingerprint", "left").withColumn(
        "is_survivor", (F.col("doc_id") == F.col("keep_doc_id")).cast("int")
    )
    return enriched.groupBy("lang_pred", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_survivor").cast("long").alias("n_unique_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(
            F.sum(F.when(F.col("quality") >= 0.5, 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("high_quality_share"),
        F.sum(
            F.when(F.col("lang_pred") == F.col("lang"), 1).otherwise(0)
        ).cast("long").alias("langid_agree"),
    )


@model(
    "corpus_scrubbed_documents",
    unique_key=["doc_id"],
    materialized="incremental",
    incremental_strategy="merge",
    deps=["stg_document_features", "corpus_dedup_groups"],
    tags=["corpus"],
    not_null=["doc_id", "text_scrubbed"],
)
def corpus_scrubbed_documents(ctx: ModelContext) -> DataFrame:
    """PII-scrubbed, repetition-gated text of the dedup survivors.

    The scrub hop every production corpus pipeline runs before chunking:
    exact-dedup survivors with quality ≥ 0.5 pass the Gopher repetition
    gates (dup-line fraction < 0.3, top-bigram fraction ≤ 0.9 —
    ``functions/text.py``), then emails/IPs/phones are replaced with typed
    tokens (``functions/pii.py``). All narrow maps over the semi-join
    scope; incremental on the doc_id watermark so each crawl batch is
    scrubbed exactly once. PII hit counts are kept as columns so the
    stats rollup can audit scrub volume without re-scanning text.
    """
    from ..functions import pii as P

    feats = ctx.ref("stg_document_features").select("doc_id", "quality")
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("doc_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
        feats = feats.filter(F.col("doc_id") > wm)
    keep = ctx.ref("corpus_dedup_groups").select(
        F.col("keep_doc_id").alias("doc_id")
    )
    survivors = feats.filter(F.col("quality") >= 0.5).join(keep, "doc_id", "left_semi")
    docs = ctx.source("main", "documents").select("doc_id", "text")
    scoped = docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
    gated = scoped.filter(
        (T.dup_line_frac(F.col("text")) < 0.3)
        & (T.top_bigram_frac(F.col("text")) <= 0.9)
    )
    counts = P.pii_counts(F.col("text"))
    return gated.select(
        "doc_id",
        P.pii_redact(F.col("text")).alias("text_scrubbed"),
        counts["n_email"].alias("n_email"),
        counts["n_ipv4"].alias("n_ipv4"),
        counts["n_phone"].alias("n_phone"),
        ctx.now().alias("updated_at"),
    )


@model(
    "corpus_training_chunks",
    unique_key=["doc_id", "chunk_index"],
    materialized="incremental",
    incremental_strategy="merge",
    deps=["corpus_scrubbed_documents"],
    tags=["corpus"],
    not_null=["doc_id", "chunk_index", "chunk_text"],
)
def corpus_training_chunks(ctx: ModelContext) -> DataFrame:
    """Training-window chunks of the deduplicated, scrubbed corpus.

    Slices the scrub hop's output into 64-token windows overlapping by 8
    (``operators/chunking.py``) plus a per-key train/val/test split
    (``operators/sampling.py``) — incremental on the same doc_id
    watermark as the upstream models, so new crawl batches chunk exactly
    once and keep their split assignment forever. (Dedup survivorship,
    the quality floor, and the repetition gates are enforced upstream in
    ``corpus_scrubbed_documents``.)
    """
    from ..operators.chunking import chunk_documents
    from ..operators.sampling import train_val_test_split

    docs = ctx.ref("corpus_scrubbed_documents").select("doc_id", "text_scrubbed")
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("doc_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
        docs = docs.filter(F.col("doc_id") > wm)
    chunks = chunk_documents(
        docs.withColumnRenamed("text_scrubbed", "text"),
        "doc_id",
        "text",
        chunk_tokens=64,
        overlap=8,
    )
    return train_val_test_split(
        chunks, "doc_id", val_fraction=0.05, test_fraction=0.05
    ).withColumn("updated_at", ctx.now())


@model(
    "corpus_neardup_candidates",
    unique_key=["id_a", "id_b"],
    materialized="table",
    deps=["stg_document_features"],
    tags=["corpus"],
    not_null=["id_a", "id_b"],
)
def corpus_neardup_candidates(ctx: ModelContext) -> DataFrame:
    """Near-duplicate candidate pairs via minhash LSH over the raw text.

    (Reads the source directly for text — the feature table deliberately
    does not carry full text — and restricts to documents already ingested
    into the feature table, keeping the DAG edge honest.)
    """
    from ..operators.dedup import minhash_lsh_candidates

    docs = ctx.source("main", "documents")
    ingested = ctx.ref("stg_document_features").select("doc_id")
    scoped = docs.join(ingested, "doc_id", "left_semi")
    return minhash_lsh_candidates(scoped, "doc_id", "text")


@model(
    "corpus_neardup_clusters",
    unique_key=["doc_id"],
    materialized="table",
    deps=["corpus_neardup_candidates"],
    tags=["corpus"],
    not_null=["doc_id", "cluster_id"],
)
def corpus_neardup_clusters(ctx: ModelContext) -> DataFrame:
    """Transitive near-duplicate clusters over the LSH candidate pairs
    (``operators/dedup.duplicate_clusters``): the keep-one-per-GROUP
    resolution that pairwise candidates alone cannot answer. One row per
    clustered doc with its min-id cluster label; unclustered docs are
    absent (they are their own survivors)."""
    from ..operators.dedup import duplicate_clusters

    pairs = ctx.ref("corpus_neardup_candidates")
    return duplicate_clusters(pairs).withColumnRenamed("id", "doc_id")


@model(
    "corpus_fingerprint_index",
    unique_key=["doc_id", "band"],
    materialized="incremental",
    incremental_strategy="merge",
    tags=["corpus"],
    not_null=["doc_id", "band", "band_key", "fingerprint"],
)
def corpus_fingerprint_index(ctx: ModelContext) -> DataFrame:
    """Persisted cross-run dedup index: MinHash LSH band keys + the exact
    content fingerprint per document, MERGE-upserted on the doc_id
    watermark (VERDICT r5 item 5).

    The 100 TB contract: deduplicating a daily batch must not re-shingle
    the accumulated corpus. Each run shingles/bands ONLY new documents —
    a narrow map + the signature groupBy + an n_bands explode — and the
    MERGE accumulates the frozen band index that
    ``corpus_neardup_pairs`` probes (the same train-once pattern as
    ``corpus_embedding_index``). The fingerprint column makes EXACT dedup
    incremental too: group any slice of this index by fingerprint.
    """
    from ..operators.dedup import minhash_band_rows

    docs = ctx.source("main", "documents")
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("doc_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
        docs = docs.filter(F.col("doc_id") > wm)
    bands = minhash_band_rows(docs, "doc_id", "text")
    fp = docs.select("doc_id", T.fingerprint64(F.col("text")).alias("fingerprint"))
    return bands.join(fp, "doc_id").select(
        "doc_id", "band", "band_key", "fingerprint", ctx.now().alias("updated_at")
    )


@model(
    "corpus_neardup_pairs",
    unique_key=["id_a", "id_b"],
    materialized="incremental",
    incremental_strategy="merge",
    deps=["corpus_fingerprint_index"],
    tags=["corpus"],
    not_null=["id_a", "id_b"],
)
def corpus_neardup_pairs(ctx: ModelContext) -> DataFrame:
    """Incremental near-duplicate candidates: ONLY new documents' band
    rows equi-join the accumulated fingerprint index on (band, band_key)
    — new×old and new×new pairs appear; old×old pairs were found by the
    run that introduced them, so N incremental runs ≡ one full rebuild
    (pinned by ``tests/test_incremental_dedup.py``).

    Watermark totality: every processed doc also emits a MARKER row
    (d, d), so ``max(id_b)`` is the highest processed doc even when a
    batch yields no real pair — without markers an all-unique batch would
    stall the watermark and be re-joined forever. Consumers filter
    ``id_a < id_b``.

    Scale: the join shuffles on (band, band_key) — the bucketed shape,
    never all-pairs. Degenerate buckets are the same risk as in
    ``minhash_lsh_candidates``; production caps them using
    ``lsh_band_bucket_stats`` on the index (a monitoring query over this
    model's upstream, no re-shingling).
    """
    idx = ctx.ref("corpus_fingerprint_index")
    wm = -1
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("id_b").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
    new = idx.filter(F.col("doc_id") > wm)
    joined = (
        new.alias("n")
        .join(
            idx.alias("i"),
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.band_key") == F.col("i.band_key"))
            & (F.col("n.doc_id") != F.col("i.doc_id")),
        )
        .select(
            F.least("n.doc_id", "i.doc_id").alias("id_a"),
            F.greatest("n.doc_id", "i.doc_id").alias("id_b"),
        )
        .distinct()
    )
    markers = new.select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    ).distinct()
    return joined.unionByName(markers)


@model(
    "corpus_neardup_clusters_inc",
    unique_key=["doc_id"],
    materialized="incremental",
    incremental_strategy="merge",
    deps=["corpus_neardup_pairs"],
    tags=["corpus"],
    not_null=["doc_id", "cluster_id"],
)
def corpus_neardup_clusters_inc(ctx: ModelContext) -> DataFrame:
    """Incremental transitive near-dup clusters via CONTRACTED-graph
    connected components: re-running corpus-scale CC per batch is the
    scale-killer this model removes.

    One row per processed doc, ``cluster_id`` = min reachable doc id
    (singletons label themselves, so the table doubles as the processed
    watermark). Each run:

    1. new pairs = ``corpus_neardup_pairs`` rows above the doc
       watermark (a pair is produced by the batch that introduces its
       LATER member, so this is exactly the new edge set);
    2. endpoints map through the EXISTING labels (identity for new
       docs) — edges between cluster representatives; the contracted
       graph is orders of magnitude smaller than the corpus (≤ new-edge
       endpoints' clusters);
    3. ``duplicate_clusters`` runs on the contracted edges only;
    4. MERGE writes the new docs' labels plus ONLY the old rows whose
       cluster representative changed (label-keyed join against the
       tiny resolve map — old docs in untouched clusters never rewrite).

    N growth steps ≡ one full CC rebuild
    (``tests/test_incremental_dedup.py``). The batch twin
    ``corpus_neardup_clusters`` stays the full-rebuild authority. The
    fold itself is the shared ``operators.dedup.incremental_cluster_fold``
    (also the streaming twin's core).
    """
    from ..operators.dedup import incremental_cluster_fold

    pairs = ctx.ref("corpus_neardup_pairs")
    wm = -1
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("doc_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
    new_pairs = pairs.filter(F.col("id_b") > wm)
    new_docs = new_pairs.filter(F.col("id_a") == F.col("id_b")).select(
        F.col("id_a").alias("doc_id")
    )
    labels_old = (
        ctx.this().select("doc_id", "cluster_id")
        if ctx.is_incremental()
        else None
    )
    return incremental_cluster_fold(new_pairs, new_docs, labels_old)


@model(
    "corpus_packed_sequences",
    unique_key=["doc_id", "chunk_index"],
    materialized="table",
    deps=["corpus_training_chunks"],
    tags=["corpus"],
    not_null=["doc_id", "chunk_index", "first_seq"],
)
def corpus_packed_sequences(ctx: ModelContext) -> DataFrame:
    """Concat-and-cut packing of the TRAIN-split chunks into 256-token
    sequences (``operators/chunking.pack_sequences``): each chunk gets
    its offsets and sequence span in the virtual training stream — the
    manifest a loader needs to assemble fixed-size batches without
    padding. Chunks are keyed by a surrogate (doc_id · 2^20 + index) so
    the layout hash stays a pure function of the chunk identity."""
    from ..operators.chunking import pack_sequences

    chunks = ctx.ref("corpus_training_chunks").filter(F.col("split") == "train")
    keyed = chunks.select(
        (F.col("doc_id") * (1 << 20) + F.col("chunk_index")).alias("chunk_key"),
        "doc_id",
        "chunk_index",
        "chunk_n_tokens",
    )
    packed = pack_sequences(keyed, "chunk_key", "chunk_n_tokens", seq_len=256)
    return packed.join(keyed.drop("chunk_n_tokens"), "chunk_key").select(
        "doc_id",
        "chunk_index",
        "start_offset",
        "end_offset",
        "first_seq",
        "last_seq",
        "n_seqs",
    )


@model(
    "corpus_index_centroids",
    unique_key=["cell"],
    materialized="incremental",
    incremental_strategy="merge",
    tags=["corpus"],
    not_null=["cell", "center"],
)
def corpus_index_centroids(ctx: ModelContext) -> DataFrame:
    """Coarse quantizer for the embedding index — trained ONCE.

    First run: deterministic k-means (seeded, NumPy — the same
    ``_np_kmeans`` as IVF-PQ) over a bounded hash sample of the embedding
    corpus. Every later run returns zero rows, so the MERGE leaves the
    centroids untouched: an ANN index's cell definitions must stay stable
    while vectors keep arriving, or every incremental batch would land in
    different cells than the last (re-training is an explicit
    --full-refresh, exactly like rebuilding an index).
    """
    import numpy as np

    from ..operators.sampling import hash_uniform
    from ..operators.similarity import _np_kmeans

    schema = "cell int, center array<double>, n_train bigint"
    if ctx.is_incremental():
        return ctx.spark.createDataFrame([], schema)
    emb = ctx.source("main", "embeddings")
    n_lists, train_cap = 16, 100_000
    total = emb.count()
    frac = min(1.0, 1.25 * train_cap / max(total, 1))
    sample = (
        emb.select(
            F.col("vec_id").alias("i"),
            F.col("embedding").cast("array<double>").alias("v"),
            hash_uniform("vec_id", "corpus-index-train").alias("u"),
        )
        .filter(F.col("u") < F.lit(frac))
        .collect()
    )
    sample.sort(key=lambda r: r["i"])  # k-means init draws by row position
    x = np.array([r["v"] for r in sample[:train_cap]], dtype=np.float64)
    centers = _np_kmeans(x, n_lists)
    rows = [
        (int(c), [float(v) for v in centers[c]], int(len(x)))
        for c in range(len(centers))
    ]
    return ctx.spark.createDataFrame(rows, schema)


@model(
    "corpus_embedding_index",
    unique_key=["vec_id"],
    materialized="incremental",
    incremental_strategy="merge",
    deps=["corpus_index_centroids"],
    tags=["corpus"],
    not_null=["vec_id", "cell", "codes"],
)
def corpus_embedding_index(ctx: ModelContext) -> DataFrame:
    """Incremental ANN index manifest: cell assignment + int8 codes.

    New vectors (vec_id watermark) are assigned to their nearest stable
    centroid and stored as the compressed (cell, scale, int8 codes) row —
    the storage layout a 100 TB vector search reads (cell = the
    partition/bucket key so probes prune at the scan; codes = 4× smaller
    than float32). Assignment is a PURE NARROW MAP: the centroids are
    bounded (n_lists rows), collected once, and inlined as literal arrays,
    so each vector computes its argmin cell inside codegen — no join, no
    shuffle, no per-batch re-clustering.
    """
    from ..operators.quantize import int8_quantize, int8_scale

    emb = ctx.source("main", "embeddings")
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("vec_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
        emb = emb.filter(F.col("vec_id") > wm)
    centers = sorted(
        ctx.ref("corpus_index_centroids").collect(), key=lambda r: r["cell"]
    )
    v = F.col("embedding")
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(c)) for c in r["center"]]),
                    lambda x, c: (x.cast("double") - c) ** 2,
                ),
                F.lit(0.0),
                lambda acc, d: acc + d,
            )
            for r in centers
        ]
    )
    scale = int8_scale(v)
    return emb.select(
        "vec_id",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cell"),
        scale.alias("scale"),
        int8_quantize(v, scale).alias("codes"),
        ctx.now().alias("updated_at"),
    )


@model(
    "corpus_refresh_audit",
    unique_key=["status"],
    materialized="table",
    deps=["stg_document_features"],
    tags=["corpus"],
    not_null=["status", "n"],
)
def corpus_refresh_audit(ctx: ModelContext) -> DataFrame:
    """Source-vs-features drift audit: per-status counts of what the
    doc_id-watermark strategy CANNOT capture.

    ``stg_document_features`` merges only ``doc_id > max(doc_id)``, so a
    rewritten text under an existing id ('changed') or a source deletion
    ('removed') never reaches the feature table — the classic incremental
    -model caveat (the reference carries the same exposure: its MERGE
    reprocesses only a 7-day lookback,
    ``models/deepbook_margin/daily/fct_deepbook_margin_pool_daily.sql:34``).
    This model makes the drift observable: nonzero 'changed'/'removed'
    says a --full-refresh is due. Both sides reduce to (id, fingerprint)
    before the diff, so document payloads never shuffle.
    """
    from ..functions.text import fingerprint64
    from ..operators.snapshot import (
        snapshot_diff_fingerprints,
        snapshot_diff_summary,
    )

    src = ctx.source("main", "documents").select(
        "doc_id", fingerprint64(F.col("text")).cast("string").alias("new_fp")
    )
    feats = ctx.ref("stg_document_features").select(
        "doc_id", F.col("fingerprint").cast("string").alias("old_fp")
    )
    return snapshot_diff_summary(snapshot_diff_fingerprints(feats, src, "doc_id"))


@model(
    "corpus_bpe_rules",
    unique_key=["rank"],
    materialized="incremental",
    incremental_strategy="merge",
    tags=["corpus"],
    not_null=["rank", "merged"],
    contract={
        "rank": "bigint",
        "left": "string",
        "right": "string",
        "merged": "string",
        "pair_freq": "bigint",
    },
)
def corpus_bpe_rules(ctx: ModelContext) -> DataFrame:
    """Frozen tokenizer: BPE merge rules trained ONCE (same train-once
    discipline as ``corpus_index_centroids`` — a tokenizer's vocabulary
    must stay stable while documents keep arriving, or every incremental
    batch's token ids/counts would disagree with the last; retraining is
    an explicit --full-refresh). First run learns the rules from the
    corpus word histogram (one corpus scan, then vocab-sized iterations —
    ``operators/bpe.py``); later runs return zero rows so the MERGE
    leaves the table untouched. Doubles as the model-contract exhibit:
    the rule schema is contracted, so a drifted trainer fails before
    materializing.
    """
    from ..operators import bpe as B

    schema = "rank long, left string, right string, merged string, pair_freq long"
    if ctx.is_incremental():
        return ctx.spark.createDataFrame([], schema)
    docs = ctx.source("main", "documents")
    rules, _ = B.learn_bpe(B.word_histogram(docs), n_merges=32)
    return B.bpe_merge_table(ctx.spark, rules)


@model(
    "corpus_tokenized_documents",
    unique_key=["doc_id"],
    materialized="incremental",
    incremental_strategy="merge",
    deps=["corpus_bpe_rules"],
    tags=["corpus"],
    not_null=["doc_id", "n_bpe_tokens"],
)
def corpus_tokenized_documents(ctx: ModelContext) -> DataFrame:
    """Per-document BPE tokenization under the FROZEN rule table:
    (doc_id, n_bpe_tokens, tokens_md5). Incremental on the doc_id
    watermark; because the rules are frozen, rows tokenized in different
    runs are mutually consistent (the property the train-once model
    exists to guarantee). The encode is a zero-shuffle Arrow narrow map;
    the bounded rule table (n_merges rows) is collected once and shipped
    in the udf closure.
    """
    from ..operators import bpe as B

    rules = ctx.ref("corpus_bpe_rules").orderBy("rank").collect()
    docs = ctx.source("main", "documents")
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("doc_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
        docs = docs.filter(F.col("doc_id") > wm)
    enc = B.bpe_encode(docs, "text", rules)
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.md5(F.concat_ws("", F.col("bpe_tokens"))).alias("tokens_md5"),
        ctx.now().alias("updated_at"),
    )


@model(
    "corpus_bigram_stats",
    unique_key=["bigram_fp"],
    materialized="incremental",
    incremental_strategy="merge",
    tags=["corpus"],
    not_null=["bigram_fp", "c"],
)
def corpus_bigram_stats(ctx: ModelContext) -> DataFrame:
    """Bigram LM counts — trained ONCE on the first run's corpus hash
    split (the same train-once/frozen pattern as ``corpus_index_centroids``
    and ``corpus_bpe_rules``): every later run returns zero rows so the
    MERGE leaves the counts untouched. A language model that silently
    retrained mid-stream would make scores from different incremental
    runs incomparable; retraining is an explicit ``--full-refresh``.
    """
    from ..operators.ngram_lm import bigram_lm_stats

    if ctx.is_incremental():
        return ctx.spark.createDataFrame([], "bigram_fp bigint, c bigint")
    docs = ctx.source("main", "documents")
    return bigram_lm_stats(docs, "doc_id", "text", train_frac=0.5, salt="lm")


@model(
    "corpus_lm_scores",
    unique_key=["doc_id"],
    materialized="incremental",
    incremental_strategy="merge",
    deps=["corpus_bigram_stats"],
    tags=["corpus"],
    not_null=["doc_id", "n_bigrams"],
)
def corpus_lm_scores(ctx: ModelContext) -> DataFrame:
    """Per-document bigram familiarity + OOV rate against the FROZEN
    counts; incremental on the doc_id watermark, so each run scores only
    new documents — and because the counts are frozen, rows scored in
    different runs are mutually consistent."""
    from ..operators.ngram_lm import bigram_lm_score

    docs = ctx.source("main", "documents")
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("doc_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
        docs = docs.filter(F.col("doc_id") > wm)
    stats = ctx.ref("corpus_bigram_stats")
    scored = bigram_lm_score(docs, "doc_id", "text", stats)
    return scored.withColumn("updated_at", ctx.now())


@model(
    "corpus_despanned_documents",
    unique_key=["doc_id"],
    materialized="table",
    tags=["corpus"],
    not_null=["doc_id", "text_clean"],
)
def corpus_despanned_documents(ctx: ModelContext) -> DataFrame:
    """Cleaned corpus under keep-first ExactSubstr span stripping.

    TABLE materialization by design, not an oversight: the keep-first
    pick is corpus-GLOBAL — a newly arrived document can turn a
    previously unique window into a duplicated one, retroactively
    stripping occurrences in already-processed documents, so a watermark
    MERGE would silently diverge from the full rebuild. (Contrast with
    the frozen-stats models, where old rows are immutable by contract.)
    """
    from ..operators.dedup import strip_repeated_spans

    docs = ctx.source("main", "documents")
    return strip_repeated_spans(docs, "doc_id", "text", k=8, min_count=2).withColumn(
        "updated_at", ctx.now()
    )


@model(
    "corpus_decontaminated_documents",
    unique_key=["doc_id"],
    materialized="incremental",
    incremental_strategy="merge",
    tags=["corpus"],
    not_null=["doc_id", "text_clean", "benchmark_fp"],
)
def corpus_decontaminated_documents(ctx: ModelContext) -> DataFrame:
    """Benchmark-versioned CROSS-RUN span decontamination (r9).

    The batch (``decontaminate_spans``/``scrub_contaminated_spans``) and
    streaming (``stream_decontaminate``) tiers scrub one frame; this is
    the DAG node that keeps an ACCUMULATING corpus scrubbed across runs:

    - **Same benchmark** → scrub ONLY new documents past the doc_id
      watermark. Unlike the keep-first strip (``corpus_despanned_documents``,
      where a new document can retroactively change old rows), span
      decontamination is per-document against the BENCHMARK only, so the
      watermark MERGE is semantically exact: N incremental runs ≡ one
      full rebuild (pinned by tests).
    - **Benchmark bump** → every run stamps rows with the benchmark's
      content fingerprint (order-independent ``bit_xor`` of per-document
      md5-64 fingerprints + count — the frozen-model discipline of
      ``corpus_bpe_rules``, applied to an external input). When the
      registered ``main.benchmark_documents`` content no longer matches
      the stamp on the existing table, the run re-scrubs the WHOLE
      corpus (retrain-equivalent rebuild: MERGE upserts every row under
      the new fingerprint) — stale scrubs cannot silently survive a
      benchmark version change.
    - **No benchmark registered** → decontamination against an empty
      held-out set is the identity: documents pass through with
      ``n_dropped = 0`` and a sentinel fingerprint.

    Scale shape: the benchmark fingerprint is one bounded aggregate over
    the (tiny) benchmark table; the scrub is the shared narrow window
    map + broadcast semi probe + span-cut tail — the corpus never
    shuffles on content, and incremental runs touch only the new slice.
    """
    from ..functions.text import fingerprint64
    from ..operators.dedup import scrub_contaminated_spans

    docs = ctx.source("main", "documents")
    try:
        bench = ctx.source("main", "benchmark_documents")
    except KeyError:
        bench = None

    if bench is not None:
        row = bench.agg(
            F.bit_xor(fingerprint64(F.col("text"))).alias("x"),
            F.count(F.lit(1)).alias("c"),
        ).first()
        bench_fp = f"{row['x']}_{row['c']}"
    else:
        bench_fp = "none_0"

    if ctx.is_incremental():
        prev = ctx.this().select("benchmark_fp").first()
        if prev is not None and prev["benchmark_fp"] == bench_fp:
            wm_row = ctx.this().agg(F.max("doc_id").alias("wm")).first()
            wm = wm_row["wm"] if wm_row["wm"] is not None else -1
            docs = docs.filter(F.col("doc_id") > wm)
        # else: benchmark content changed → re-scrub everything (the
        # MERGE on doc_id upserts every row under the new fingerprint)

    if bench is None:
        # identity scrub, emitted in the SAME normalized token space as
        # _cut_spans_from_docs so later runs with a real benchmark merge
        # consistently shaped rows
        from ..operators.dedup import ws_tokens_exact

        toks = ws_tokens_exact("text")
        scrubbed = docs.select(
            "doc_id",
            F.array_join(toks, " ").alias("text_clean"),
            F.size(toks).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("n_dropped"),
        )
    else:
        scrubbed = scrub_contaminated_spans(
            docs, "doc_id", "text", bench, "doc_id", "text", k=8
        )
    return scrubbed.withColumn("benchmark_fp", F.lit(bench_fp)).withColumn(
        "updated_at", ctx.now()
    )


@model(
    "corpus_trust_scores",
    unique_key=["doc_id"],
    materialized="table",
    deps=["corpus_neardup_clusters_inc"],
    tags=["corpus"],
    not_null=["doc_id", "cluster_id", "trust_e6"],
)
def corpus_trust_scores(ctx: ModelContext) -> DataFrame:
    """Trust propagation through near-duplicate closures
    (``operators/dedup.cluster_trust``): every corpus document —
    clustered or singleton — stamped with the trusted-source share of
    its whole cluster. Trusted sources come from the ``trusted_sources``
    var (comma-separated), so a deploy retargets the trust set without
    code changes (``--vars '{trusted_sources: "wiki,books"}'``).

    Full-rebuild TABLE for the same reason as
    ``corpus_canonical_documents``: the heavy lifting (pair graph + CC)
    lives in the incremental clusters model; this node is two equi-joins
    and one map-side-combined share aggregation over (corpus ids ×
    16-byte cluster rows) — rebuilding it is cheaper than solving the
    stale-share delete problem an incremental MERGE would inherit when
    a batch merges two clusters.
    """
    from ..operators.dedup import cluster_trust

    trusted = [
        s.strip()
        for s in str(ctx.var("trusted_sources", "src0,src5,src10,src15")).split(",")
        if s.strip()
    ]
    clusters = ctx.ref("corpus_neardup_clusters_inc").select(
        F.col("doc_id").alias("id"), "cluster_id"
    )
    docs = ctx.source("main", "documents").select("doc_id", "source")
    out = cluster_trust(clusters, docs, "doc_id", F.col("source").isin(trusted))
    return out.withColumnRenamed("id", "doc_id").withColumn(
        "updated_at", ctx.now()
    )


@model(
    "corpus_canonical_documents",
    unique_key=["cluster_id"],
    materialized="table",
    deps=["corpus_neardup_clusters_inc"],
    tags=["corpus"],
    not_null=["cluster_id", "canonical_doc_id"],
)
def corpus_canonical_documents(ctx: ModelContext) -> DataFrame:
    """Canonical survivor per near-duplicate cluster: the member with
    the most characters (min doc_id tie-break) — quality-argmax keeps,
    not arbitrary min-id (``operators/dedup.keep_best_per_cluster``).

    Full-rebuild TABLE by design: the input is the CLUSTERS table
    ((doc_id, cluster_id) rows for clustered docs only — orders of
    magnitude smaller than the corpus), and the argmax is one map-side-
    combined grouped aggregation over it. The quality lookup touches the
    corpus only as an id equi-join projected to two columns. Incremental
    re-selection per affected cluster would save a fraction of an
    already-contracted aggregation while inheriting the label-supersede
    delete problem (an absorbed cluster's stale canonical row) — the
    rebuild is the simpler correct contract at every scale the clusters
    table itself is viable.
    """
    from ..operators.dedup import keep_best_per_cluster

    clusters = ctx.ref("corpus_neardup_clusters_inc").select(
        F.col("doc_id").alias("id"), "cluster_id"
    )
    docs = ctx.source("main", "documents").select("doc_id", "n_chars")
    out = keep_best_per_cluster(clusters, docs, "doc_id", "n_chars")
    return out.select(
        "cluster_id",
        "cluster_size",
        "canonical_doc_id",
        F.col("canonical_quality").cast("long").alias("canonical_chars"),
    ).withColumn("updated_at", ctx.now())


@model(
    "corpus_training_shards",
    unique_key=["shard_id"],
    materialized="incremental",
    incremental_strategy="merge",
    tags=["corpus"],
    not_null=["shard_id", "n_docs", "n_tokens", "content_xor", "max_doc_id"],
)
def corpus_training_shards(ctx: ModelContext) -> DataFrame:
    """Incremental training-shard manifest: per-shard row/token/byte
    counts + XOR content checksum, maintained ACROSS runs without ever
    re-scanning history.

    Every manifest statistic is mergeable: counts add, and the 60-bit
    ``bit_xor`` content checksum of a disjoint union is the XOR of the
    parts — so each run manifests ONLY documents past the doc_id
    watermark (shard assignment is the md5-keyed pure function of
    ``operators/export.py::assign_shards``, so a document's shard never
    moves as the corpus grows) and combines the delta with the existing
    row per shard. N incremental runs ≡ one full :func:`shard_manifest`
    over the final corpus, exactly — the same mergeable-state discipline
    as ``events_user_reach_daily``'s HLL sketches, with XOR in place of
    the sketch union. ``max_doc_id`` per shard carries the watermark
    (the global watermark is the max over shards, total because every
    new document lands in exactly one shard).

    Scale shape: the delta pass is a narrow map (md5 assignment +
    tokenize) into one map-side-combined groupBy on n_shards keys; the
    combine joins n_shards delta rows against n_shards existing rows.
    Nothing rescans, shuffles, or collects the corpus.
    """
    from ..operators.export import assign_shards, shard_manifest

    n_shards = int(ctx.var("n_shards", 8))
    docs = ctx.source("main", "documents")
    incremental = ctx.is_incremental()
    if incremental:
        row = ctx.this().agg(F.max("max_doc_id").alias("wm")).first()
        if row["wm"] is not None:
            docs = docs.filter(F.col("doc_id") > F.lit(row["wm"]))

    assigned = assign_shards(docs, "doc_id", n_shards)
    delta = shard_manifest(assigned, "shard_id").join(
        assigned.groupBy("shard_id").agg(F.max("doc_id").alias("max_doc_id")),
        "shard_id",
    )

    if incremental:
        old = ctx.this().select(
            "shard_id",
            F.col("n_docs").alias("_od"),
            F.col("n_tokens").alias("_ot"),
            F.col("n_chars").alias("_oc"),
            F.col("content_xor").alias("_ox"),
            F.col("max_doc_id").alias("_om"),
        )
        delta = delta.join(old, "shard_id", "left").select(
            "shard_id",
            (F.col("n_docs") + F.coalesce("_od", F.lit(0))).cast("long").alias("n_docs"),
            (F.col("n_tokens") + F.coalesce("_ot", F.lit(0))).cast("long").alias("n_tokens"),
            (F.col("n_chars") + F.coalesce("_oc", F.lit(0))).cast("long").alias("n_chars"),
            F.expr("content_xor ^ coalesce(_ox, 0L)").alias("content_xor"),
            F.greatest(F.col("max_doc_id"), F.coalesce("_om", F.col("max_doc_id"))).alias(
                "max_doc_id"
            ),
        )
    return delta.withColumn("updated_at", ctx.now())


@model(
    "corpus_shard_export_audit",
    unique_key=["shard_id"],
    materialized="table",
    deps=["corpus_training_shards"],
    tags=["corpus"],
    not_null=["shard_id", "docs_ok", "xor_ok"],
)
def corpus_shard_export_audit(ctx: ModelContext) -> DataFrame:
    """Cross-run shard-export VERIFICATION node: per shard, prove the
    incrementally-maintained manifest (``corpus_training_shards`` — N
    watermark-delta merges) still equals a manifest recomputed from the
    full current corpus (counts + XOR checksum).

    This turns the "N incremental runs ≡ full rebuild" pytest invariant
    into a queryable, scheduled audit a pipeline can gate on: any drift —
    a missed delta, a double-applied merge, a mutated historical document
    (the incremental ledger NEVER re-reads history, so an in-place edit
    behind the watermark is exactly what this catches), or checksum
    corruption — produces ``*_ok = 0`` rows, and the ``not_null`` +
    downstream ``accepted_values``-style gates fail the run.

    Scale shape: the recompute is one narrow map (md5 assignment +
    tokenize) into a map-side-combined n_shards-key groupBy — the same
    single corpus scan any full audit needs by definition; the compare
    joins n_shards × n_shards rows. Nothing collects.
    """
    from ..operators.export import assign_shards, shard_manifest

    n_shards = int(ctx.var("n_shards", 8))
    ledger = ctx.ref("corpus_training_shards").select(
        "shard_id", "n_docs", "n_tokens", "n_chars", "content_xor", "max_doc_id"
    )
    assigned = assign_shards(ctx.source("main", "documents"), "doc_id", n_shards)
    fresh = (
        shard_manifest(assigned, "shard_id")
        .join(
            assigned.groupBy("shard_id").agg(F.max("doc_id").alias("max_doc_id")),
            "shard_id",
        )
        .select(
            "shard_id",
            F.col("n_docs").alias("n_docs_fresh"),
            F.col("n_tokens").alias("n_tokens_fresh"),
            F.col("n_chars").alias("n_chars_fresh"),
            F.col("content_xor").alias("content_xor_fresh"),
            F.col("max_doc_id").alias("max_doc_id_fresh"),
        )
    )
    ok = lambda a, b: (  # noqa: E731
        F.when(F.col(a) == F.col(b), F.lit(1)).otherwise(F.lit(0)).cast("long")
    )
    return (
        ledger.join(fresh, "shard_id", "full")
        .select(
            "shard_id",
            "n_docs",
            "n_docs_fresh",
            "n_tokens",
            "n_tokens_fresh",
            "n_chars",
            "n_chars_fresh",
            "content_xor",
            "content_xor_fresh",
            "max_doc_id",
            "max_doc_id_fresh",
            ok("n_docs", "n_docs_fresh").alias("docs_ok"),
            ok("n_tokens", "n_tokens_fresh").alias("tokens_ok"),
            ok("content_xor", "content_xor_fresh").alias("xor_ok"),
        )
        .withColumn("updated_at", ctx.now())
    )


@model(
    "corpus_fp_bucketed",
    materialized="incremental",
    incremental_strategy="append",
    tags=["corpus"],
    not_null=["doc_id", "fp"],
    bucket_by=["fp"],
    n_buckets=32,
)
def corpus_fp_bucketed(ctx: ModelContext) -> DataFrame:
    """Maintained shingle-fingerprint projection: one (doc_id, fp) row
    per (doc, distinct 3-gram shingle), ``fp = xxhash64(shingle)`` —
    byte-identical to the inline projection every exact-pair dedup tier
    builds (``operators/dedup.py::_intersect_shingle_rows``), so a
    consumer passing this table as ``fp_rows`` gets the same pairs
    without re-shingling anything (VERDICT r11 item 2).

    The ``bucket_by=['fp']`` config makes the runner maintain a
    BUCKETED managed-table mirror alongside the store table
    (``engine/bucketing.py::mirror_table_name``); fed to
    ``ngram_jaccard_pairs(..., fp_rows=mirror, join_strategy='merge')``
    the shingle self-join plans bucket-local — ONE Exchange in the
    whole pair plan (the downstream pair groupBy; PERF.md r11 Part B
    measured this shape 3.5× faster end-to-end AND passing at the 8 GB
    default heap where every shuffle strategy failed). Incremental runs
    shingle ONLY docs above the doc_id watermark and APPEND — the
    projection build amortizes across the jaccard / containment /
    clusters / canonical family, the reference's incremental-
    amortization pattern (``fct_deepbook_margin_pool_daily.sql:33-35``).
    ``n_buckets=32`` matches the bench session's parallelism; a
    warehouse deployment raises it with the cluster (the measured
    fourth-decade probe used 128).
    """
    from ..operators.dedup import shingles_vectorized

    docs = ctx.source("main", "documents")
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("doc_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
        docs = docs.filter(F.col("doc_id") > wm)
    return docs.select(
        "doc_id",
        F.explode(
            F.transform(
                shingles_vectorized(F.col("text"), 3), lambda c: F.xxhash64(c)
            )
        ).alias("fp"),
    )


@model(
    "corpus_leakage_report",
    unique_key=["bench_id"],
    materialized="table",
    tags=["corpus"],
    not_null=["bench_id", "n_shingles"],
)
def corpus_leakage_report(ctx: ModelContext) -> DataFrame:
    """Eval-governance DAG node (r12, VERDICT r11 item 7): the reverse-
    decontamination leakage audit
    (``operators/contamination.py::benchmark_leakage``) over the
    REGISTERED benchmark — per benchmark document, how many corpus
    documents contain it by asymmetric shingle containment, the worst
    offender, and the ``leaked`` verdict.

    CLI-drivable end-to-end: the containment threshold τ and the
    shingle width come from vars (``--vars '{leakage_threshold_e6:
    400000, leakage_ngram: 3}'`` — the ``trusted_sources`` precedent),
    and the benchmark is the same registered
    ``main.benchmark_documents`` source the decontamination model
    scrubs against. Every row carries the benchmark's content
    fingerprint (the ``corpus_decontaminated_documents`` stamp
    discipline) so a report can never be read against the wrong
    benchmark version. No registered benchmark → an empty report with
    the sentinel stamp (nothing to audit, loudly distinguishable from
    "audited and clean" because bench rows always appear when a
    benchmark exists).

    Full-rebuild TABLE: output is benchmark-bounded by nature (one row
    per benchmark doc), and the corpus side is a streaming map probe —
    rebuilding is cheaper than reasoning about which corpus additions
    could flip old verdicts (any new doc can).
    """
    from ..functions.text import fingerprint64
    from ..operators.contamination import benchmark_leakage

    docs = ctx.source("main", "documents")
    try:
        bench = ctx.source("main", "benchmark_documents")
    except KeyError:
        bench = None
    thr = int(ctx.var("leakage_threshold_e6", 500_000))
    ngram = int(ctx.var("leakage_ngram", 3))

    if bench is None:
        spark = docs.sparkSession
        empty = spark.createDataFrame(
            [],
            "bench_id long, n_shingles long, n_leaking_docs long, "
            "top_doc_id long, top_containment_e6 long, leaked boolean",
        )
        return empty.withColumn("benchmark_fp", F.lit("none_0")).withColumn(
            "threshold_e6", F.lit(thr).cast("long")
        ).withColumn("updated_at", ctx.now())

    row = bench.agg(
        F.bit_xor(fingerprint64(F.col("text"))).alias("x"),
        F.count(F.lit(1)).alias("c"),
    ).first()
    bench_fp = f"{row['x']}_{row['c']}"
    rep = benchmark_leakage(
        docs, bench, "doc_id", "text", n=ngram, threshold_e6=thr
    )
    return (
        rep.withColumn("benchmark_fp", F.lit(bench_fp))
        .withColumn("threshold_e6", F.lit(thr).cast("long"))
        .withColumn("updated_at", ctx.now())
    )


# ------------------------------------------------ incremental media dedup
#
# The multimodal twin of the text family's cross-run index (VERDICT r13
# item 3): corpus_fingerprint_index accumulates MinHash band rows so a
# daily batch never re-shingles the corpus; image/audio signatures had no
# such index — every dedup run re-decoded and re-hashed every payload.
# These three nodes close that gap with the SAME layout and watermark
# discipline: a MERGE-upserted signature index (band rows + the full
# 64-bit fingerprint, so verification never re-decodes), a pairs model
# joining only NEW signatures against the accumulated index, and the
# contracted-graph cluster fold.
#
# Source contract: ``main.media`` — (media_id long, kind string,
# payload binary) with kind ∈ {'image','audio'}; media_id monotone (the
# watermark column, the doc_id discipline).

MEDIA_BANDS = 8
MEDIA_MAX_HAMMING = 6


def _media_signatures(media: DataFrame) -> DataFrame:
    """Delegates to the shared :func:`operators.multimodal.
    media_signatures` core (one Arrow pass per modality; video emits
    per-frame rows) — the streaming twin runs the same function, so the
    twins cannot drift."""
    from ..operators.multimodal import media_signatures

    return media_signatures(media)


@model(
    "corpus_media_signature_index",
    unique_key=["media_id", "frame_index", "band"],
    materialized="incremental",
    incremental_strategy="merge",
    tags=["corpus"],
    not_null=["media_id", "kind", "frame_index", "band", "band_key"],
)
def corpus_media_signature_index(ctx: ModelContext) -> DataFrame:
    """Persisted cross-run media-dedup index: per (payload, frame, band)
    one row carrying the band's bucket key AND the full packed frame
    fingerprint, MERGE-upserted on the media_id watermark (image/audio
    carry one fingerprint at frame_index 0; video one per sampled
    frame).

    The 100 TB contract: deduplicating a daily media batch must not
    re-decode the accumulated corpus — codec decode is the Python-side
    Arrow floor, orders costlier than shingling. Each run decodes ONLY
    new payloads; banding rides the same ``_band_key_structs`` slicing
    the batch tiers bucket on, exploded in the same select as the
    fingerprint columns so the decode pass runs ONCE (no self-join, no
    re-decode). Monitoring: ``banded_hamming_bucket_stats`` over this
    index's distinct (media_id, fp_hi, fp_lo) rows reports the bucket
    distribution without touching a payload.

    ``--vars '{media_band_arity: 2}'`` bands the index at a composite
    arity (the PERF.md r14 occupancy dial — 8-bit chunks admit only 256
    keys per band, so the pairs model's (band, band_key) join fan-out
    goes corpus-quadratic past ~16k payloads per kind; arity 2 widens
    the key space 256× and keeps the family's max_hamming=6 pigeonhole
    at 8 bands). The arity is BAKED into the stored band rows: changing
    it requires a ``--full-refresh`` of this model and its dependents —
    a stale mix would silently miss cross-arity candidates, so the
    incremental merge must never run across an arity change."""
    from ..operators.multimodal import media_index_rows

    from math import comb

    arity = int(ctx.var("media_band_arity", 1))
    media = ctx.source("main", "media")
    if ctx.is_incremental():
        row = ctx.this().agg(
            F.max("media_id").alias("wm"), F.max("band").alias("mb")
        ).first()
        wm = row["wm"] if row["wm"] is not None else -1
        # arity-corruption guard: every signature emits ALL C(bands,
        # arity) band combinations, so a non-empty index's max band id
        # reveals the arity it was built at; merging rows banded at a
        # DIFFERENT arity would silently miss cross-arity candidates
        if row["mb"] is not None and row["mb"] != comb(MEDIA_BANDS, arity) - 1:
            raise ValueError(
                "corpus_media_signature_index was built at a different "
                f"media_band_arity (stored max band {row['mb']}, arity "
                f"{arity} implies {comb(MEDIA_BANDS, arity) - 1}); an "
                "arity change requires --full-refresh of the index and "
                "its dependents"
            )
        media = media.filter(F.col("media_id") > wm)
    return media_index_rows(
        _media_signatures(media), MEDIA_BANDS, arity
    ).withColumn("updated_at", ctx.now())


@model(
    "corpus_media_neardup_pairs",
    unique_key=["id_a", "id_b"],
    materialized="incremental",
    incremental_strategy="merge",
    deps=["corpus_media_signature_index"],
    tags=["corpus"],
    not_null=["id_a", "id_b", "hamming"],
)
def corpus_media_neardup_pairs(ctx: ModelContext) -> DataFrame:
    """Incremental content-level near-duplicate media pairs: ONLY new
    payloads' band rows equi-join the accumulated signature index on
    (kind, band, band_key) — new×old and new×new pairs appear; old×old
    pairs were found by the run that introduced them, so N runs ≡ one
    full rebuild (``tests/test_incremental_dedup.py``). No payload is
    touched after indexing: single-fingerprint kinds (image/audio)
    verify with JVM bit_count over the fingerprints BOTH sides of the
    band match already carry; video pairs — whose distance is the MIN
    over ALL cross-frame pairs, not just the banded ones — re-join the
    candidate ids against the index's distinct frame fingerprints
    (frames² per candidate, frames small by contract, all equi-joins).
    Incremental completeness lifts through frames: every frame of a
    payload enters the index in that payload's run.

    Watermark totality: every processed payload also emits a MARKER row
    (m, m, 0) so ``max(id_b)`` advances even when a batch has no real
    pair (the text pairs model's discipline). Consumers filter
    ``id_a < id_b``."""
    from ..operators.multimodal import media_neardup_pairs_from_index

    idx = ctx.ref("corpus_media_signature_index")
    wm = -1
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("id_b").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
    new = idx.filter(F.col("media_id") > wm)
    pairs = media_neardup_pairs_from_index(new, idx, MEDIA_MAX_HAMMING)
    markers = new.select(
        F.col("media_id").alias("id_a"),
        F.col("media_id").alias("id_b"),
        F.lit(0).cast("integer").alias("hamming"),
    ).distinct()
    return pairs.unionByName(markers)


@model(
    "corpus_media_neardup_clusters_inc",
    unique_key=["media_id"],
    materialized="incremental",
    incremental_strategy="merge",
    deps=["corpus_media_neardup_pairs"],
    tags=["corpus"],
    not_null=["media_id", "cluster_id"],
)
def corpus_media_neardup_clusters_inc(ctx: ModelContext) -> DataFrame:
    """Incremental transitive media-dup clusters — the contracted-graph
    fold (``operators.dedup.incremental_cluster_fold``, shared with the
    text twin and the streaming fold) over the media pair graph: one row
    per processed payload, ``cluster_id`` = min reachable media_id
    (singletons label themselves — the table doubles as the processed
    watermark)."""
    from ..operators.dedup import incremental_cluster_fold

    pairs = ctx.ref("corpus_media_neardup_pairs")
    wm = -1
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("media_id").alias("wm")).first()
        wm = row["wm"] if row["wm"] is not None else -1
    new_pairs = pairs.filter(F.col("id_b") > wm).select("id_a", "id_b")
    new_docs = new_pairs.filter(F.col("id_a") == F.col("id_b")).select(
        F.col("id_a").alias("doc_id")
    )
    labels_old = (
        ctx.this()
        .select(F.col("media_id").alias("doc_id"), "cluster_id")
        if ctx.is_incremental()
        else None
    )
    return incremental_cluster_fold(new_pairs, new_docs, labels_old).select(
        F.col("doc_id").alias("media_id"), "cluster_id"
    )
