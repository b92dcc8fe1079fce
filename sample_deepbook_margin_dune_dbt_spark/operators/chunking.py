"""Token-window document chunking for training pipelines.

LLM pretraining/fine-tuning consumes fixed-size token windows, not whole
documents: every corpus pipeline ends with a chunking pass that slices
each document into ``chunk_tokens``-sized windows overlapping by
``overlap`` tokens (the overlap preserves cross-boundary context for
retrieval and next-token training).

Spark-first shape: tokenize once (``split``), generate the window start
offsets as an array (``sequence`` with the stride as step), then ONE
``posexplode`` — all pure Catalyst expressions, fan-out exactly
``ceil((n_tokens - overlap) / stride)`` per document. No Python, no
shuffle: chunking is a narrow map and composes with partition pruning.
Memory per row is bounded by the document length (the token array), the
same bound the dedup shingle pipeline already carries.

Determinism/oracle: whitespace tokenization + arithmetic only, so DuckDB
reproduces chunks byte-for-byte (``queries/chunkingq.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Slice each document into overlapping ``chunk_tokens`` windows.

    Output: one row per (document, window) with ``chunk_index`` (0-based),
    ``chunk_text`` (space-rejoined tokens) and ``chunk_n_tokens``. Windows
    start every ``chunk_tokens - overlap`` tokens; the final window may be
    short; documents shorter than one window yield exactly one chunk.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap

    toks = F.split(F.trim(F.col(text_col)), " ")
    n = F.size(toks)
    # window starts: 0, stride, 2·stride, … while start + overlap < n —
    # equivalently while start ≤ n - overlap - 1 (≥ one window always)
    starts = F.sequence(
        F.lit(0), F.greatest(n - F.lit(overlap) - 1, F.lit(0)), F.lit(stride)
    )
    tokked = df.select(
        F.col(id_col), toks.alias("_toks"), F.posexplode(starts).alias("chunk_index", "_start")
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return tokked.select(
        id_col,
        "chunk_index",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("chunk_n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    salt: str = "pack",
    n_buckets: int = 1024,
) -> DataFrame:
    """Concat-and-cut sequence packing: place every document into the
    virtual concatenated token stream and cut it every ``seq_len`` tokens
    — the standard pretraining batch-packing recipe (documents straddle
    cuts; nothing is padded or dropped).

    Documents are laid out in a deterministic hash order (md5 variate of
    the id, ties on id), so the packing is reproducible across engines
    and rebuilds while remaining shuffled for training. Output per doc:
    ``start_offset``/``end_offset`` in the stream, ``first_seq``/
    ``last_seq`` (0-based cut indices), and ``n_seqs`` spanned.

    Scale: the stream offset is a global cumsum over the layout order —
    computed via :func:`..operators.ordering.global_hash_cumsum`
    (order-preserving hash buckets + broadcast per-bucket offsets), NOT a
    single-partition global window: no stage ever sees more than
    ~N/``n_buckets`` rows, and the result is bit-identical to the global
    window. Raise ``n_buckets`` so a bucket's rows fit one task at the
    target corpus size.
    """
    from .ordering import global_hash_cumsum

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    toks = F.col(n_tokens_col).cast("long")
    return (
        global_hash_cumsum(
            df, id_col, n_tokens_col, salt=salt,
            n_buckets=n_buckets, out_col="end_offset",
        )
        .withColumn("start_offset", F.col("end_offset") - toks)
        .filter(toks > 0)
        .select(
            id_col,
            "start_offset",
            "end_offset",
            F.floor(F.col("start_offset") / seq_len).alias("first_seq"),
            F.floor((F.col("end_offset") - 1) / seq_len).alias("last_seq"),
            (
                F.floor((F.col("end_offset") - 1) / seq_len)
                - F.floor(F.col("start_offset") / seq_len)
                + 1
            ).alias("n_seqs"),
        )
    )


def pack_bestfit(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    n_partitions: int = 64,
    salt: str = "bestfit",
) -> DataFrame:
    """Best-fit-decreasing bin packing for PADDED fine-tuning layouts
    (documents must not straddle sequence boundaries, unlike
    :func:`pack_sequences`' concat-and-cut stream).

    Each document of ``t`` tokens contributes ``floor(t / seq_len)``
    exactly-full sequences (zero waste — they never need packing; account
    for them with ``full_bins_expr``) plus, when ``t % seq_len > 0``, one
    REMAINDER piece of ``t % seq_len`` tokens. This operator packs the
    remainder pieces into shared ``seq_len``-capacity bins so the padded
    waste drops from the naive one-bin-per-remainder layout (whose cost
    :func:`..queries.chunkingq.q_pack_efficiency` reports) toward the
    ``ceil(Σ rem / seq_len)`` lower bound.

    Distributed shape: pieces are hash-assigned to ``n_partitions``
    deterministic groups (``xxhash64(salt ‖ id)`` — stable across runs,
    engines and input partitioning) and ONE ``applyInPandas`` runs
    best-fit-decreasing independently inside each group: sort pieces by
    (tokens desc, id asc), place each into the fitting open bin of
    maximal fill (ties → highest bin id, the rightmost-bisect rule),
    else open a new bin. Bin state is a bisect-sorted fill list —
    O(n log n) per group, group size ~N/``n_partitions`` (raise
    ``n_partitions`` so a group's pieces fit one task at corpus scale;
    the packing quality cost of partitioning is bounded: any-fit leaves
    at most ONE bin at ≤ half capacity per group, so total bins ≤
    ⌊2·Σrem/seq_len⌋ + ``n_partitions`` — the structural contract the
    driver oracle checks). Python-in-the-loop is justified: best-fit's
    data-dependent sequential state is not expressible in Catalyst, and
    the UDF is Arrow-batched per group, never per row.

    Output: one row per remainder piece — id, ``rem_tokens``,
    ``part_id``, ``bin_idx`` (dense per group), ``bin_id`` (global =
    part_id·2³² + bin_idx) and ``bin_fill`` (final fill of the piece's
    bin). Deterministic for a fixed (seq_len, n_partitions, salt).
    """
    import bisect

    import pandas as pd

    from pyspark.sql import types as T

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_partitions <= 0:
        raise ValueError(f"n_partitions must be positive, got {n_partitions}")

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("rem_tokens", T.LongType()),
            T.StructField("part_id", T.IntegerType()),
            T.StructField("bin_idx", T.LongType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("bin_fill", T.LongType()),
        ]
    )

    cap = seq_len

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["rem_tokens", id_col], ascending=[False, True], kind="mergesort"
        )
        part = int(pdf["part_id"].iloc[0])
        fills: list[tuple[int, int]] = []  # sorted (fill, bin_idx)
        n_bins = 0
        assigned = []
        for r in pdf["rem_tokens"].astype("int64"):
            r = int(r)
            # rightmost open bin with fill ≤ cap - r: max fill that fits
            i = bisect.bisect_right(fills, (cap - r, 1 << 62)) - 1
            if i >= 0:
                fill, b = fills.pop(i)
            else:
                fill, b = 0, n_bins
                n_bins += 1
            fill += r
            bisect.insort(fills, (fill, b))
            assigned.append(b)
        final = {b: f for f, b in fills}
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "rem_tokens": pdf["rem_tokens"].astype("int64").values,
                "part_id": part,
                "bin_idx": assigned,
                "bin_id": [(part << 32) | b for b in assigned],
                "bin_fill": [final[b] for b in assigned],
            }
        )

    t = F.col(n_tokens_col).cast("long")
    rem = t % F.lit(cap)
    pieces = (
        df.select(
            F.col(id_col),
            rem.alias("rem_tokens"),
            F.pmod(
                F.xxhash64(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                F.lit(n_partitions),
            )
            .cast("int")
            .alias("part_id"),
        )
        .filter(F.col("rem_tokens") > 0)
    )
    return pieces.groupBy("part_id").applyInPandas(_pack, out_schema)


def full_bins_expr(n_tokens_col: str, seq_len: int):
    """Exactly-full sequences a document contributes before remainder
    packing: ``floor(t / seq_len)`` — pair with :func:`pack_bestfit`."""
    return F.floor(F.col(n_tokens_col).cast("long") / F.lit(seq_len))


def chunk_content_defined(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking: boundaries where the rolling n-gram
    fingerprint hits ``fp % divisor == 0`` (expected chunk ≈ ``divisor``
    tokens), the CDC construction dedup-friendly pipelines use instead of
    fixed-stride windows — an insertion only re-chunks its local
    neighborhood because every boundary is a pure function of the
    ``window`` tokens at that position, not of any offset.

    Same output shape as ``chunk_documents`` (chunk_index / chunk_text /
    chunk_n_tokens), same all-Catalyst narrow-map profile (arrays +
    ONE posexplode, no shuffle), and engine-portable boundaries (the
    md5-backed ``fingerprint64``), so a DuckDB oracle reproduces chunks
    byte-for-byte. Compose with ``chunk_documents`` downstream if a hard
    max window is also required.
    """
    from ..functions.text import fingerprint64

    if window <= 0 or divisor <= 0:
        raise ValueError(f"window/divisor must be positive, got {window}/{divisor}")
    toks = F.split(F.trim(F.col(text_col)), " ")
    # the boundary array must be computed ONCE, over a token array that
    # is itself computed once. Three hazards, each measured and pinned
    # (tests/test_plans.py::test_cdc_chunking_single_md5_evaluation):
    # 1. the boundary-filter lambda slicing the INLINE split expression
    #    re-splits the whole text once per token position — O(|text|²)
    #    character work per doc (the r12 text_winnow finding) — so the
    #    token array gets its own select; CollapseProject leaves it
    #    alone (an expensive expression referenced 3×).
    # 2. CollapseProject inlines deterministic exprs referenced once —
    #    computing _starts in its own select below the Generate keeps
    #    the chunk-end element_at a symbolic reference (the r11 3× fix;
    #    the rand() barrier used then was obsolete — re-measured r12).
    # 3. InferFiltersFromGenerate clones the WHOLE _starts expression
    #    into a `size(_starts) > 0` filter below the Project — useless
    #    (_starts always contains index 0) but it doubled the md5 work
    #    (measured r12: 3.5 → 2.1 s at sf0.1). posexplode_outer
    #    suppresses the inference; with the scan-pushed NOT NULL guard
    #    its semantics are identical.
    staged = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), toks.alias("_toks")
    )
    tok_attr = F.col("_toks")
    n = F.size(tok_attr)
    gram = lambda i: F.array_join(F.slice(tok_attr, i + 1, window), " ")  # noqa: E731
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
        lambda i: (i == 0) | (F.pmod(fingerprint64(gram(i)), divisor) == 0),
    )
    pre = staged.select(
        F.col(id_col),
        F.col("_toks"),
        n.alias("_n"),
        starts.alias("_starts"),
    )
    tokked = pre.select(
        F.col(id_col),
        "_toks",
        "_n",
        "_starts",
        F.posexplode_outer(F.col("_starts")).alias("chunk_index", "_start"),
    )
    end = F.coalesce(
        F.element_at(F.col("_starts"), F.col("chunk_index") + 2), F.col("_n")
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, end - F.col("_start"))
    return tokked.select(
        id_col,
        "chunk_index",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("chunk_n_tokens"),
    )
