"""Corpus-curation model DAG: the LLM-data-pipeline operators as engine models.

Demonstrates that the model/runner/MERGE machinery built for the reference
pipeline drives a training-data curation pipeline unchanged:

    main.documents ─→ stg_document_features ─┬─→ corpus_dedup_groups
                                             └─→ corpus_stats_by_lang

- ``stg_document_features`` — incremental (watermark on doc_id, MERGE):
  per-document token count, quality score, language ID, content
  fingerprint, simhash.
- ``corpus_dedup_groups`` — exact-dup groups over the fingerprints.
- ``corpus_stats_by_lang`` — per (predicted language, source) corpus stats.
"""

from . import models  # noqa: F401

ALL_MODELS = [
    "stg_document_features",
    "corpus_dedup_groups",
    "corpus_stats_by_lang",
    "corpus_scrubbed_documents",
    "corpus_training_chunks",
    "corpus_neardup_candidates",
    "corpus_neardup_clusters",
    "corpus_packed_sequences",
    "corpus_index_centroids",
    "corpus_embedding_index",
    "corpus_refresh_audit",
    "corpus_bpe_rules",
    "corpus_tokenized_documents",
]
