"""Text-analysis column functions for LLM-data pipelines (BASELINE north star).

Catalyst expressions (JVM-side, codegen-friendly) wherever the expression
evaluator is the right engine; Arrow-vectorized pandas UDFs where it is
not — ``nfc_normalize`` (no Catalyst expression exists) and the r8
repetition-stat twins (higher-order-function lambdas are CodegenFallback:
interpreted per element, measured ~1 ms/doc — the Catalyst forms stay as
the engine-portable oracle-shape reference, parity-pinned bit-for-bit).
Each function returns a Column usable in any model or query.

Inventory:
- ``token_count``        — whitespace tokenization count
- ``word_tokens``        — BPE-ish lowercase word/number/punct token array
- ``quality_score``      — composite doc-quality heuristic in [0, 1]
  (length, alpha ratio, stopword hit, repetition)
- ``langid_scores`` / ``langid`` — n-gram/stopword language heuristic over a
  configurable profile table
- ``fingerprint64``      — deterministic 64-bit content fingerprint (first
  15 hex digits of md5 → bigint), the building block for exact dedup and
  minhash (chosen over ``xxhash64`` because md5 is reproducible across
  engines — the DuckDB oracle computes the identical value)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword profiles: deliberately deterministic and
# vocabulary-based (the usual trigram models are unavailable offline)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
    "it": ["il", "la", "e", "che", "un", "una", "per", "non", "con", "del"],
}

_WORD_RE = r"[a-z0-9]+|[^a-z0-9\s]"


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def word_tokens(col: Column | str) -> Column:
    """Lowercased word/number/punctuation tokens (BPE-ish regex pass)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(_WORD_RE), 0)


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are alphabetic."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are common stopwords."""
    c = F.col(col) if isinstance(col, str) else col
    sw = stopwords or LANG_STOPWORDS["en"]
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    hit_count = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(t.isin(sw), 1).otherwise(0),
    )
    n = F.size(toks)
    return F.when(n > 0, hit_count / n).otherwise(F.lit(0.0))


def repetition_ratio(col: Column | str) -> Column:
    """1 - distinct_tokens/tokens — high values mean boilerplate repetition."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    n = F.size(toks)
    return F.when(n > 0, 1.0 - F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0, 1].

    0.25·length-in-range + 0.25·alpha-ratio + 0.25·has-stopwords +
    0.25·(1 - repetition). Mirrors the usual pretraining-corpus quality
    filters (Gopher/C4-style rules) in pure SQL expressions.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    len_ok = F.when((n >= 50) & (n <= 100000), 1.0).otherwise(
        F.when(n > 0, 0.5).otherwise(0.0)
    )
    has_stop = F.when(stopword_ratio(c) > 0, 1.0).otherwise(0.0)
    return (
        0.25 * len_ok
        + 0.25 * alpha_ratio(c)
        + 0.25 * has_stop
        + 0.25 * (1.0 - repetition_ratio(c))
    )


def digit_ratio(col: Column | str) -> Column:
    """Fraction of characters that are decimal digits."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    return F.when(n > 0, digits / n).otherwise(F.lit(0.0))


# fasttext-style linear quality weights: (bias, len_norm, alpha_ratio,
# stopword_ratio, repetition_ratio, digit_ratio). Illustrative constants in
# the spirit of the RefinedWeb/DCLM learned quality filters — the OPERATOR
# is the deliverable (a linear scorer over cheap Catalyst features; swap in
# trained weights without touching the plan).
QUALITY_WEIGHTS = (-1.25, 1.0, 2.0, 1.5, -2.5, -1.5)


def quality_logit(
    col: Column | str, weights: tuple[float, ...] = QUALITY_WEIGHTS
) -> Column:
    """Linear quality-classifier logit over five document features.

    The production shape of a learned quality filter (fasttext/logistic
    over cheap features): a pure Catalyst dot product — narrow map, whole
    -stage codegen, zero shuffle — so scoring 100 TB costs one scan.
    Deliberately avoids transcendentals (no exp/log: IEEE does not
    require them correctly rounded, so engines may differ in the last
    ulp); +,*,/ on identical doubles are exact, making
    ``floor(logit·1e6)`` bit-stable cross-engine when the expression
    order matches the oracle's. Features:

    - ``len_norm``: ``least(length, 10000)/10000``
    - ``alpha_ratio``, ``stopword_ratio``, ``repetition_ratio``,
      ``digit_ratio`` (see the individual functions)
    """
    c = F.col(col) if isinstance(col, str) else col
    b, w_len, w_alpha, w_stop, w_rep, w_digit = weights
    len_norm = F.least(F.length(c), F.lit(10000)) / F.lit(10000.0)
    # fixed left-to-right association — mirrored exactly in the SQL twin
    return (
        F.lit(b)
        + F.lit(w_len) * len_norm
        + F.lit(w_alpha) * alpha_ratio(c)
        + F.lit(w_stop) * stopword_ratio(c)
        + F.lit(w_rep) * repetition_ratio(c)
        + F.lit(w_digit) * digit_ratio(c)
    )


def langid_scores(col: Column | str) -> Column:
    """Map of language → stopword-hit score."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")

    def _score(words: list[str]) -> Column:
        return F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.when(t.isin(words), 1).otherwise(0)
        )

    return F.array(
        *[
            F.struct(F.lit(lang).alias("lang"), _score(words).alias("score"))
            for lang, words in LANG_STOPWORDS.items()
        ]
    )


def langid(col: Column | str) -> Column:
    """Best-guess language code by stopword vote ('und' when no hits)."""
    scores = langid_scores(col)
    best = F.array_max(
        F.transform(scores, lambda s: F.struct(s["score"].alias("score"), s["lang"].alias("lang")))
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def dup_line_frac(col: Column | str) -> Column:
    """Fraction of lines that are duplicates of an earlier line (Gopher rule).

    ``1 - distinct_lines / lines`` over a newline split. Pure array
    expression — a narrow map with no shuffle, which is the right shape for
    a per-document metric at 100 TB (the alternative explode + groupBy pays
    a full shuffle for what is a per-row computation).
    """
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    n = F.size(lines)
    return F.when(n > 0, 1.0 - F.size(F.array_distinct(lines)) / n).otherwise(
        F.lit(0.0)
    )


def dup_line_char_frac(col: Column | str) -> Column:
    """Fraction of characters sitting in lines that occur more than once.

    Counts duplicated-line characters by RUN-LENGTH over the sorted line
    array: one ``array_sort`` + one ``aggregate`` whose state carries
    (previous line, current run length, accumulated dup chars) and
    flushes a run's ``run·length(line)`` contribution when the line
    changes (runs ≥ 2 only). O(n log n) per document, still a narrow map.
    The r1 version counted each line's occurrences with an in-array
    ``filter`` — O(lines²) of nested-HOF evaluation, which the r8
    full-evaluation bench exposed as a 6-minute scan at sf0.1 (the
    sibling ``top_bigram_frac`` dominated; PERF.md r8).
    """
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    total = F.aggregate(lines, F.lit(0), lambda acc, x: acc + F.length(x))
    sorted_lines = F.array_sort(lines)
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("dup"),
    )

    def _step(acc: Column, x: Column) -> Column:
        is_same = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(is_same, acc["run"] + 1).otherwise(F.lit(1))
        # flush the previous run when the value changes (runs of ≥ 2 lines
        # contribute run·len chars); the final run flushes in the finisher
        flushed = F.when(
            is_same | acc["prev"].isNull() | (acc["run"] < 2),
            acc["dup"],
        ).otherwise(acc["dup"] + acc["run"] * F.length(acc["prev"]))
        return F.struct(x.alias("prev"), run.alias("run"), flushed.alias("dup"))

    dup = F.aggregate(
        sorted_lines,
        zero,
        _step,
        lambda acc: F.when(
            acc["run"] >= 2, acc["dup"] + acc["run"] * F.length(acc["prev"])
        ).otherwise(acc["dup"]),
    )
    return F.when(total > 0, dup / total).otherwise(F.lit(0.0))


def top_bigram_frac(col: Column | str) -> Column:
    """Fraction of word bigrams taken by the most frequent bigram (Gopher).

    High values indicate template/boilerplate text. Space-tokenizes the
    lowercased text, forms adjacent-pair bigrams with a ``sequence`` +
    ``transform`` (no explode), and takes the modal count as the LONGEST
    RUN of the sorted bigram array — one ``array_sort`` + one
    ``aggregate`` carrying (prev, run, best). O(n log n) per document,
    still a narrow map. The r3 version counted every distinct bigram
    with an in-array ``filter`` — O(distinct × bigrams) nested-HOF
    evaluation measured at ~72 ms/doc once the r8 bench started forcing
    full column evaluation (360 s for the sf0.1 scan; count()-pruned
    plans had hidden it — PERF.md r8).
    """
    c = F.col(col) if isinstance(col, str) else col
    w = F.split(F.lower(F.trim(c)), r"\s+")
    nb = F.size(w) - 1
    # greatest() guard: sequence(0, -1) would produce a DESCENDING range on
    # a single-token doc; the outer when() already zeroes that case.
    bg = F.transform(
        F.sequence(F.lit(0), F.greatest(nb - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def _step(acc: Column, x: Column) -> Column:
        run = F.when(
            acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
        ).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    max_cnt = F.aggregate(F.array_sort(bg), zero, _step, lambda acc: acc["best"])
    return F.when(nb >= 1, max_cnt / nb).otherwise(F.lit(0.0))


def fingerprint64(col: Column | str) -> Column:
    """Deterministic 64-bit content fingerprint (md5-derived, engine-portable).

    ``conv(substr(md5(x),1,15),16,10)`` ≤ 60 bits so it fits a signed bigint;
    DuckDB computes the identical value as
    ``cast('0x' || substr(md5(x),1,15) as bigint)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def nfc_normalize(col: Column | str) -> Column:
    """Unicode NFC composition via an Arrow-batched pandas UDF.

    The one text op Catalyst has no expression for: canonical composition
    (e + U+0301 → é) so byte-identical content dedups/fingerprints
    identically whatever the producer emitted. Python's ``unicodedata``
    (stdlib, no install) matches DuckDB's ``nfc_normalize`` — the oracle
    seam — and the UDF is the vectorized kind, not row-at-a-time.
    """
    import pandas as pd  # noqa: F401  (signature typing)
    import unicodedata

    @F.pandas_udf("string")
    def _nfc(s):  # type: ignore[no-untyped-def]
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    c = F.col(col) if isinstance(col, str) else col
    return _nfc(c)


def clean_text(col: Column | str) -> Column:
    """Pre-tokenization cleanup: NFC compose, strip C0/DEL control
    characters, collapse runs of ASCII whitespace to one space, trim.
    Everything after the NFC hop is a Catalyst regexp chain (the regex
    classes are explicit, dialect-portable Java∩RE2∩DuckDB subsets).
    """
    c = nfc_normalize(col)
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    c = F.regexp_replace(c, "[ \\t\\n\\r]+", " ")
    return F.trim(c)


# ------------------------------------------------------------------
# Arrow-vectorized twins of the repetition rules (r8).
#
# Higher-order-function lambdas are CodegenFallback in Spark: the per-
# element expression tree is interpreted, which the r8 full-evaluation
# bench measured at ~1 ms/doc for the bigram/line statistics — the same
# expression-evaluation wall `hyperplane_signature` hit at dim 512, and
# the same answer applies (PERF.md r2 demo pair): keep the Catalyst
# expression as the engine-portable oracle-shape reference, ship the
# Arrow batch as the production path, pin bit-equality in tests.
#
# Tokenization parity notes: Spark's `trim()` strips SPACES (U+0020)
# only — not Python's unicode strip — and Java's default regex `\s`
# class is ASCII-only (replicated with an explicit char class; Python's
# `\s` is unicode). Both engines keep leading/trailing empty tokens
# identically (F.split uses limit -1; `re.split` matches). Case-folding
# uses Python `str.lower()`, equivalent to the JVM path for
# ASCII-and-common-unicode corpora; the parity tests and the DuckDB
# oracle gate would surface any exotic-locale divergence.

_JAVA_WS_RE = None  # built lazily to keep `re` out of the Catalyst-only path


def _java_ws_tokens(s: str) -> list[str]:
    global _JAVA_WS_RE
    if _JAVA_WS_RE is None:
        import re

        _JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")
    return _JAVA_WS_RE.split(s.strip(" ").lower())


def top_bigram_frac_vectorized(col: Column | str) -> Column:
    """Arrow twin of :func:`top_bigram_frac` — identical values
    (IEEE double ``max_count / n_bigrams``), ~50× less per-doc cost."""
    from collections import Counter

    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _f(s):  # type: ignore[no-untyped-def]
        out = []
        for t in s:
            w = _java_ws_tokens(t) if t is not None else [""]
            nb = len(w) - 1
            if nb < 1:
                out.append(0.0)
                continue
            counts = Counter(zip(w, w[1:]))
            out.append(max(counts.values()) / nb)
        return pd.Series(out, dtype="float64")

    c = F.col(col) if isinstance(col, str) else col
    return _f(c)


def dup_line_stats_vectorized(col: Column | str) -> Column:
    """Arrow twin of :func:`dup_line_frac` + :func:`dup_line_char_frac`
    in one pass — struct<dup_line_frac:double, dup_char_frac:double>,
    value-identical to the Catalyst pair."""
    from collections import Counter

    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<dup_line_frac:double, dup_char_frac:double>")
    def _f(s):  # type: ignore[no-untyped-def]
        lf, cf = [], []
        for t in s:
            lines = (t or "").split("\n")
            n = len(lines)
            lf.append(1.0 - len(set(lines)) / n if n > 0 else 0.0)
            total = sum(len(x) for x in lines)
            counts = Counter(lines)
            dup = sum(len(x) for x in lines if counts[x] > 1)
            cf.append(dup / total if total > 0 else 0.0)
        return pd.DataFrame({"dup_line_frac": lf, "dup_char_frac": cf})

    c = F.col(col) if isinstance(col, str) else col
    return _f(c)
