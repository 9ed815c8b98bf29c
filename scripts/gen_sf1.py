#!/usr/bin/env python3
"""Structure-preserving 10x scale-up of the sf0.1 fixture -> an sf1-class
fixture (~6 M lineitem / 1 M events / 50 k documents), for the next-decade
differential sweep (VERDICT r9 item 5).

The driver's generator is not available to re-run at sf1, so this builds
the fixture BY SCALING sf0.1: ten key-shifted copies of every scaled
table, with cross-table key strides kept consistent (orders.o_custkey
copies shift by the same stride as customer.c_custkey, etc.), so join
cardinalities, value distributions, date ranges, and key grammar all
survive. The sweep is differential (Spark vs DuckDB on the SAME data),
so distribution fidelity to the driver's seed matters less than volume:
what the 10x fixture buys is the row-count-sensitive edge classes the
sf0.1 sweep cannot reach (band occupancy, df caps, quantile ties, int64
headroom on value sums).

Deliberate deltas from plain duplication:

* documents: copy i >= 1 rewrites every (i+1)-th word with a copy-tagged
  variant — copies are NEAR duplicates of graded Jaccard (copy 1 ~ 0.33,
  copy 9 ~ 0.82), not exact clones, so the dedup families see a dense,
  graded near-dup graph instead of a degenerate 10-clique per doc, and
  band-occupancy edges land on BOTH sides of every threshold.
* embeddings: copy i >= 1 perturbs each component by a tiny deterministic
  offset — cosine structure (clusters, top-k neighborhoods) survives,
  exact ties do not multiply.
* events: copies shift BOTH event_id and user_id (uid cardinality scales
  10x — the all-time distinct state actually grows), ts unchanged (the
  per-minute grain gets 10x density).

Usage:
    python scripts/gen_sf1.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.1 -> /tmp/sf1
Then sweep it like the driver does:
    SPARK_GRAFT_CHECK_SF_DIR=/tmp/sf1 python scripts/driver_check.py
"""

from __future__ import annotations

import os
import shutil
import sys

COPIES = 10


def _shift_copies(tbl, key_strides: dict[str, int]):
    """Yield COPIES copies of ``tbl`` with each key column shifted by
    i * stride (copy 0 is the original)."""
    import pyarrow.compute as pc

    for i in range(COPIES):
        if i == 0:
            yield tbl
            continue
        cols = {}
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in key_strides:
                col = pc.add(col, i * key_strides[name])
            cols[name] = col
        yield tbl.from_pydict(cols, schema=tbl.schema)


def _write_copies(src: str, dst: str, name: str, key_strides: dict[str, int]) -> None:
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
    writer = pq.ParquetWriter(os.path.join(dst, f"{name}.parquet"), tbl.schema)
    for chunk in _shift_copies(tbl, key_strides):
        writer.write_table(chunk)
    writer.close()


def _perturb_text(text: str, i: int) -> str:
    """Rewrite every (i+1)-th word with a copy-tagged variant: graded
    Jaccard overlap per copy, deterministic, no RNG."""
    words = text.split(" ")
    k = i + 1
    return " ".join(
        (w + f"x{i}") if (j % k == 0) else w for j, w in enumerate(words)
    )


def build(src: str = "/root/testdata/sf0.1", dst: str = "/tmp/sf1") -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    marker = os.path.join(dst, "_COMPLETE")
    if os.path.isfile(marker):
        return dst

    # dimension tables stay at their sf-independent size
    for name in ("region", "nation"):
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"), os.path.join(dst, f"{name}.parquet")
        )

    # consistent cross-table key strides (max+1, so shifted ranges never
    # collide even if the key space is sparse)
    def stride(table: str, col: str) -> int:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
        return int(pc.max(t.column(col)).as_py()) + 1

    C = stride("customer", "c_custkey")
    S = stride("supplier", "s_suppkey")
    P = stride("part", "p_partkey")
    O = stride("orders", "o_orderkey")

    _write_copies(src, dst, "customer", {"c_custkey": C})
    _write_copies(src, dst, "supplier", {"s_suppkey": S})
    _write_copies(src, dst, "part", {"p_partkey": P})
    _write_copies(src, dst, "orders", {"o_orderkey": O, "o_custkey": C})
    _write_copies(
        src, dst, "lineitem", {"l_orderkey": O, "l_partkey": P, "l_suppkey": S}
    )

    E = stride("events", "event_id")
    U = stride("events", "user_id")
    _write_copies(src, dst, "events", {"event_id": E, "user_id": U})

    # documents: shifted ids + graded near-duplicate text per copy
    docs = pq.read_table(os.path.join(src, "documents.parquet"))
    D = int(pc.max(docs.column("doc_id")).as_py()) + 1
    writer = pq.ParquetWriter(os.path.join(dst, "documents.parquet"), docs.schema)
    texts = docs.column("text").to_pylist()
    for i in range(COPIES):
        if i == 0:
            writer.write_table(docs)
            continue
        new_texts = [_perturb_text(t, i) for t in texts]
        writer.write_table(
            pa.table(
                {
                    "doc_id": pc.add(docs.column("doc_id"), i * D),
                    "text": pa.array(new_texts, type=pa.string()),
                    "lang": docs.column("lang"),
                    "source": docs.column("source"),
                    "n_chars": pa.array(
                        [len(t) for t in new_texts], type=pa.int64()
                    ),
                },
                schema=docs.schema,
            )
        )
    writer.close()

    # embeddings: shifted ids + tiny deterministic per-copy perturbation
    emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
    V = int(pc.max(emb.column("vec_id")).as_py()) + 1
    import numpy as np

    vecs = emb.column("embedding").to_pylist()
    dim = len(vecs[0]) if vecs and vecs[0] is not None else 0
    writer = pq.ParquetWriter(os.path.join(dst, "embeddings.parquet"), emb.schema)
    for i in range(COPIES):
        if i == 0:
            writer.write_table(emb)
            continue
        delta = (np.arange(dim) % 7 - 3).astype(np.float32) * (1e-4 * i)
        new_vecs = [
            None if v is None else (np.asarray(v, dtype=np.float32) + delta).tolist()
            for v in vecs
        ]
        writer.write_table(
            pa.table(
                {
                    "vec_id": pc.add(emb.column("vec_id"), i * V),
                    "embedding": pa.array(
                        new_vecs, type=pa.list_(pa.float32())
                    ),
                    "label": emb.column("label"),
                },
                schema=emb.schema,
            )
        )
    writer.close()

    with open(marker, "w") as fh:
        fh.write("ok\n")
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    print(build(src, dst))
