#!/usr/bin/env python3
"""Adversarial (tie-dense, degenerate-row) variant of a testdata sf dir.

The natural fixtures are too polite: microsecond timestamps never land on
exact minute/gap boundaries, event_ids are unique, no document is empty,
and no embedding has zero norm — so an engine/oracle divergence in any of
those regimes stays invisible until production data hits it. The r7 sweep
over THIS fixture found (and fixed) five real classes in one pass:

  1. zero-norm embeddings crashed every cosine consumer under ANSI mode
     (DIVIDE_BY_ZERO) — ~18 ANN/embedding keys;
  2. empty documents crashed the quality-score family the same way;
  3. short documents crashed ``text_fingerprints`` (Spark ``sequence(0, n)``
     with n < 0 DESCENDS, handing ``slice`` a start of 0) while the DuckDB
     oracle silently DROPPED those rows — two different wrongs;
  4. empty documents made ``chunk_documents`` emit two phantom chunks
     (idx 0 and −1; the same descending-sequence trap);
  5. ``stream_deduped_visits``' oracle counted source-duplicated event_ids
     twice while the engine's documented dedup-by-id semantics collapse
     them.

Usage:
    python scripts/adversarial_fixture.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.001 -> /tmp/adv_sf
Then sweep it exactly like the driver does:
    SPARK_GRAFT_CHECK_SF_DIR=<dst> python scripts/driver_check.py

`tests/test_adversarial_fixture.py` rebuilds it per session and re-checks
the representative once-failing keys so the five classes stay fixed.

The fixture also plants VALUE TIES in the relational tables (rounded
monetary columns) and an exact-session-gap user: the full 246-key sweep
over those came back green on the first pass — every rank/top-k window
in the catalog breaks ties on a key column (the discipline is now
verified on tied data, not just asserted in docstrings), and the session
boundary holds end to end.
"""

from __future__ import annotations

import os
import shutil
import sys

RELATIONAL = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def build(src: str = "/root/testdata/sf0.001", dst: str = "/tmp/adv_sf") -> str:
    import duckdb

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier"]:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    # relational VALUE TIES (keys stay unique): round a third of the
    # monetary columns so rank/top-k windows see duplicated sort values —
    # a non-total ORDER BY diverges between engines ONLY on tied data,
    # which the natural fixture essentially never produces
    con.execute(
        f"""COPY (
  SELECT * REPLACE (CASE WHEN o_orderkey % 3 = 0
                         THEN CAST(round(o_totalprice, -3) AS DECIMAL(15,2))
                         ELSE o_totalprice END AS o_totalprice)
  FROM '{src}/orders.parquet'
) TO '{dst}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  SELECT * REPLACE (CASE WHEN p_partkey % 3 = 0
                         THEN CAST(round(p_retailprice, -2) AS DECIMAL(15,2))
                         ELSE p_retailprice END AS p_retailprice)
  FROM '{src}/part.parquet'
) TO '{dst}/part.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  SELECT * REPLACE (CASE WHEN l_orderkey % 3 = 0
                         THEN CAST(round(l_extendedprice, -3) AS DECIMAL(15,2))
                         ELSE l_extendedprice END AS l_extendedprice)
  FROM '{src}/lineitem.parquet'
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    # events: 20% of timestamps floored to exact minutes (bucket-edge
    # ties), 5% of rows duplicated EXACTLY (at-least-once redelivery in
    # the source itself), plus one synthetic user (990990) whose four
    # events sit EXACTLY 30:00.000000 apart — the session_window boundary
    # the r7 hypothesis sweep caught (strict-> keeps them in ONE session)
    con.execute(
        f"""COPY (
  SELECT * REPLACE (CASE WHEN event_id % 5 = 0
                         THEN date_trunc('minute', ts) ELSE ts END AS ts)
  FROM '{src}/events.parquet'
  UNION ALL
  SELECT * FROM '{src}/events.parquet' WHERE event_id % 20 = 7
  UNION ALL
  SELECT 900000 + g.g, TIMESTAMP '2024-01-01 00:00:00' + to_minutes(30 * g.g),
         990990, 'click', 1.0, '{{"k": 1}}'
  FROM generate_series(0, 3) g(g)
) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    # documents: empty text, single token, whitespace-only, a prefix of an
    # existing doc, and an exact duplicate under a different lang
    con.execute(
        f"""COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL SELECT 900001, '', 'en', 'adv', 0
  UNION ALL SELECT 900002, 'solo', 'en', 'adv', 4
  UNION ALL SELECT 900003, '   ', 'en', 'adv', 3
  UNION ALL SELECT 900004, (SELECT substr(text, 1, 80)
                            FROM '{src}/documents.parquet' WHERE doc_id = 1),
            'en', 'adv', 80
  UNION ALL SELECT 900005, (SELECT text FROM '{src}/documents.parquet' WHERE doc_id = 2),
            'xx', 'adv',
            (SELECT n_chars FROM '{src}/documents.parquet' WHERE doc_id = 2)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    # embeddings: an exact duplicate vector (cosine ties) and a ZERO
    # vector — both ids are multiples of QUERY_MOD so they also become
    # ANN queries, exercising the query-side guards
    con.execute(
        f"""COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  UNION ALL SELECT 900100,
    (SELECT embedding FROM '{src}/embeddings.parquet' WHERE vec_id = 1), 0
  UNION ALL SELECT 900200,
    list_transform((SELECT embedding FROM '{src}/embeddings.parquet' WHERE vec_id = 1),
                   x -> CAST(0.0 AS FLOAT)), 0
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adv_sf"
    print(build(src, dst))
