"""Build the N× embeddings scale fixture used for the r8 scaling study.

Takes the sf0.1 embeddings table and emits ``copies`` rotated replicas:
each copy is multiplied by an independent random orthogonal matrix (QR of
a seeded Gaussian), which preserves EVERY within-copy pairwise cosine —
near-dup pairs, similarity-tail mass — while decorrelating copies, so the
result is "N× the data with identical per-unit structure". Sibling tables
are symlinked so the fixture directory drop-replaces an sf dir for any
query. Output is written under ``.scale_fixtures/`` (gitignored; ~6 MB at
10×). Measurements over it live in PERF.md (r8 section).

Usage: python tools/make_scale_fixture.py [copies=10]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SIBLINGS = "region nation customer supplier part orders lineitem events documents".split()
DOC_SIBLINGS = [s for s in SIBLINGS if s != "documents"]


def make_documents(copies: int = 10) -> str:
    """N× documents fixture for the text/span dedup scale study: copy c
    prefixes every whitespace token with ``c{c}·`` — within-copy window/
    shingle/fingerprint structure (planted repeats, near-dups, benchmark
    contamination) is preserved EXACTLY while no window ever matches
    across copies, so duplicate/candidate counts scale linearly by
    construction and any superlinear wall-time is the plan's fault."""
    t = pq.read_table(f"{SRC}/documents.parquet")
    rows = t.to_pylist()
    out_rows = []
    for c in range(copies):
        for r in rows:
            txt = r["text"]
            if c > 0:
                txt = " ".join(f"c{c}_{w}" for w in txt.split())
            out_rows.append(
                {
                    "doc_id": r["doc_id"] + c * 10_000_000,
                    "text": txt,
                    "lang": r["lang"],
                    "source": r["source"],
                    "n_chars": len(txt),
                }
            )
    tbl = pa.Table.from_pylist(out_rows, schema=t.schema)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_fixtures",
        f"docs0.1x{copies}",
    )
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, f"{out}/documents.parquet", row_group_size=8192)
    for name in DOC_SIBLINGS + ["embeddings"]:
        dst = f"{out}/{name}.parquet"
        if not os.path.islink(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"{out}: {tbl.num_rows} documents")
    return out


def make_documents_streamed(copies: int = 1000) -> str:
    """Large-N documents fixture WITHOUT materializing copies in RAM:
    the same per-copy token-prefix transform as :func:`make_documents`,
    written copy-by-copy through a ParquetWriter — memory stays one copy
    regardless of N (1000× ≈ 5M docs / ~0.5 GB parquet)."""
    t = pq.read_table(f"{SRC}/documents.parquet")
    rows = t.to_pylist()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_fixtures",
        f"docs0.1x{copies}",
    )
    os.makedirs(out, exist_ok=True)
    n = 0
    with pq.ParquetWriter(f"{out}/documents.parquet", t.schema) as w:
        for c in range(copies):
            out_rows = []
            for r in rows:
                txt = r["text"]
                if c > 0:
                    txt = " ".join(f"c{c}_{tok}" for tok in txt.split())
                out_rows.append(
                    {
                        "doc_id": r["doc_id"] + c * 10_000_000,
                        "text": txt,
                        "lang": r["lang"],
                        "source": r["source"],
                        "n_chars": len(txt),
                    }
                )
            w.write_table(pa.Table.from_pylist(out_rows, schema=t.schema))
            n += len(out_rows)
    for name in DOC_SIBLINGS + ["embeddings"]:
        dst = f"{out}/{name}.parquet"
        if not os.path.islink(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"{out}: {n} documents")
    return out


def make_embeddings_streamed(copies: int = 1000) -> str:
    """Large-N embeddings fixture WITHOUT materializing all copies in RAM:
    the same per-copy random-orthogonal rotation as :func:`main` (every
    within-copy pairwise cosine preserved, copies decorrelated), written
    copy-by-copy through a ParquetWriter — memory stays one copy
    regardless of N (1000× ≈ 2M vectors / ~0.5 GB parquet)."""
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    e = np.array([np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()])
    lab = np.asarray(t["label"].to_pylist(), dtype=np.int32)
    vid = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    rng = np.random.RandomState(7)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_fixtures",
        f"sf0.1x{copies}",
    )
    os.makedirs(out, exist_ok=True)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    n = 0
    with pq.ParquetWriter(f"{out}/embeddings.parquet", schema) as w:
        for c in range(copies):
            if c == 0:
                ec = e
            else:
                q, _ = np.linalg.qr(rng.standard_normal((e.shape[1], e.shape[1])))
                ec = (e @ q).astype(np.float32)
            w.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(vid + c * 10_000_000, pa.int64()),
                        "embedding": pa.array(
                            [v.tolist() for v in ec], pa.list_(pa.float32())
                        ),
                        "label": pa.array(lab, pa.int32()),
                    },
                    schema=schema,
                )
            )
            n += len(ec)
    for name in SIBLINGS:
        dst = f"{out}/{name}.parquet"
        if not os.path.islink(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"{out}: {n} embeddings")
    return out


def make_events(copies: int = 10) -> str:
    """N× events fixture for the event-analytics scale study: copy c
    offsets user_id (and event_id) by c·10⁷, keeping timestamps, types,
    values and props byte-identical — per-user session/funnel/cohort
    structure is preserved exactly while the user population grows N×,
    so per-user analytics scale linearly by construction."""
    t = pq.read_table(f"{SRC}/events.parquet")
    cols = {name: t[name] for name in t.schema.names}
    import pyarrow.compute as pc

    def _copy_table(c: int) -> pa.Table:
        off = c * 10_000_000
        return pa.table(
            {
                "event_id": pc.add(cols["event_id"], off),
                "ts": cols["ts"],
                "user_id": pc.add(cols["user_id"], off),
                "event_type": cols["event_type"],
                "value": cols["value"],
                "props": cols["props"],
            }
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_fixtures",
        f"events0.1x{copies}",
    )
    os.makedirs(out, exist_ok=True)
    if copies <= 100:
        tbl = pa.concat_tables([_copy_table(c) for c in range(copies)])
        pq.write_table(tbl, f"{out}/events.parquet", row_group_size=262144)
        n_rows = tbl.num_rows
    else:
        # fourth-decade fixtures (r12): stream copy-by-copy through one
        # ParquetWriter — the concat-then-write path holds every copy's
        # rewritten id columns in memory at once
        writer = None
        n_rows = 0
        try:
            for c in range(copies):
                part = _copy_table(c)
                if writer is None:
                    writer = pq.ParquetWriter(f"{out}/events.parquet", part.schema)
                writer.write_table(part, row_group_size=262144)
                n_rows += part.num_rows
        finally:
            if writer is not None:
                writer.close()
    for name in [s for s in SIBLINGS if s != "events"] + ["embeddings"]:
        dst = f"{out}/{name}.parquet"
        if not os.path.islink(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"{out}: {n_rows} events")
    return out


def main(copies: int = 10) -> str:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    e = np.array([np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()])
    lab = np.asarray(t["label"].to_pylist(), dtype=np.int32)
    vid = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    rng = np.random.RandomState(7)
    es, ls, ids = [e], [lab], [vid]
    for c in range(1, copies):
        q, _ = np.linalg.qr(rng.standard_normal((e.shape[1], e.shape[1])))
        es.append((e @ q).astype(np.float32))
        ls.append(lab)
        # NOTE: offset chosen clear of the query-level augmentation ids
        # (q_dedup_embedding_cosine adds +1e6/+2e6 planted variants)
        ids.append(vid + c * 10_000_000)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in np.concatenate(es)], pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(ls), pa.int32()),
        }
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_fixtures",
        f"sf0.1x{copies}",
    )
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, f"{out}/embeddings.parquet", row_group_size=4096)
    for name in SIBLINGS:
        dst = f"{out}/{name}.parquet"
        if not os.path.islink(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"{out}: {tbl.num_rows} vectors")
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "documents":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        (make_documents_streamed if n > 100 else make_documents)(n)
    elif len(sys.argv) > 1 and sys.argv[1] == "events":
        make_events(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
        (make_embeddings_streamed if n > 100 else main)(n)
