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
- ``corpus_fingerprint_index`` / ``corpus_neardup_pairs`` — incremental
  CROSS-RUN dedup (r6): a MERGE-upserted MinHash-band + exact-fingerprint
  index; each run shingles only new documents and joins them against the
  accumulated index (N incremental runs ≡ one full rebuild —
  ``tests/test_incremental_dedup.py``).
- ``corpus_neardup_clusters_inc`` — incremental transitive clusters via
  CONTRACTED-graph connected components (r6): new edges map through the
  existing labels, CC runs on the tiny representative graph, and only
  relabeled old rows re-MERGE (N growth steps ≡ one full CC rebuild,
  including cluster-bridging batches).
- ``corpus_trust_scores`` — trust propagation through the incremental
  near-dup closures (r9): every document stamped with the
  trusted-source share of its whole cluster; the trusted set is the
  ``trusted_sources`` var.
- ``corpus_decontaminated_documents`` — benchmark-versioned CROSS-RUN
  span decontamination (r9): watermark-incremental scrub of new docs
  while the registered benchmark's content fingerprint is stable; a
  benchmark bump forces a retrain-equivalent full re-scrub
  (``tests/test_decontam_model.py``).
"""

from . import models  # noqa: F401
from . import unit_tests  # noqa: F401  (registers dbt-style unit tests)

ALL_MODELS = [
    "stg_document_features",
    "corpus_dedup_groups",
    "corpus_stats_by_lang",
    "corpus_scrubbed_documents",
    "corpus_training_chunks",
    "corpus_neardup_candidates",
    "corpus_neardup_clusters",
    "corpus_fingerprint_index",
    "corpus_neardup_pairs",
    "corpus_neardup_clusters_inc",
    "corpus_packed_sequences",
    "corpus_index_centroids",
    "corpus_embedding_index",
    "corpus_refresh_audit",
    "corpus_bpe_rules",
    "corpus_tokenized_documents",
    "corpus_decontaminated_documents",
    "corpus_canonical_documents",
    "corpus_trust_scores",
]
