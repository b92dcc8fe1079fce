"""Unit tests for the corpus DAG (dbt ``unit_tests:`` analog): builder
logic verified against literal mocked inputs, no warehouse state —
including BOTH branches of an incremental builder via the ``this`` mock
(dbt's ``overrides: is_incremental``)."""

from __future__ import annotations

from ..engine import unit_test

_DOC_SCHEMA = (
    "doc_id bigint, lang string, source string, n_chars bigint, text string"
)


def _doc(i, text, lang="en"):
    return (i, lang, "web", len(text), text)


# first-run branch: every source row lands, token counts computed
unit_test(
    "stg_features_first_run",
    model="stg_document_features",
    given={
        "source:main.documents": (
            _DOC_SCHEMA,
            [_doc(1, "alpha beta gamma"), _doc(2, "one two")],
        ),
    },
    expect=(
        "doc_id bigint, lang string, n_tokens bigint",
        [(1, "en", 3), (2, "en", 2)],
    ),
    tags=["corpus"],
)

# incremental branch: rows at or below the mocked watermark are skipped
unit_test(
    "stg_features_incremental_watermark",
    model="stg_document_features",
    given={
        "source:main.documents": (
            _DOC_SCHEMA,
            [_doc(1, "old doc"), _doc(2, "old too"), _doc(3, "brand new doc")],
        ),
        "this": ("doc_id bigint", [(1,), (2,)]),
    },
    expect=("doc_id bigint, n_tokens bigint", [(3, 3)]),
    incremental=True,
    tags=["corpus"],
)

# exact-dup groups: min doc_id survives per fingerprint, counts right
unit_test(
    "dedup_groups_keep_min_id",
    model="corpus_dedup_groups",
    given={
        "ref:stg_document_features": (
            "doc_id bigint, fingerprint bigint",
            [(10, 111), (11, 111), (12, 222)],
        ),
    },
    expect=(
        "fingerprint bigint, keep_doc_id bigint, dup_count bigint",
        [(111, 10, 2), (222, 12, 1)],
    ),
    tags=["corpus"],
)
