"""Deterministic scale-up generator: build an sf{N} dataset from an
existing driver-generated sf dir by replicating every fact table
``factor`` times with key offsets (referential integrity preserved) —
the local tool for measuring one real decade of scaling (sf0.1 → sf1)
instead of extrapolating it.

Design choices, so the scaled data measures ENGINE scaling rather than
a workload-shape change:

* Dimension tables (region, nation) are copied — like TPC-H, they are
  fixed-size at every SF.
* Fact keys get ``key + replica * stride`` (stride = max(key)+1 from
  the source), so joins stay 1:N exactly as in the source and group
  sizes stay CONSTANT while group counts grow 10× — the shape a 10×
  bigger day of real data has.
* ``documents.text``: replica 0 is byte-identical to the source; every
  other replica suffixes the replica number onto each word.  Within-
  replica duplicate/near-dup structure is preserved exactly, but NO
  near-dups exist across replicas — the corpus's duplicate FRACTION is
  scale-invariant, so MinHash/SimHash candidate counts grow linearly,
  not quadratically, matching real corpus growth (vocab grows with the
  corpus; per-doc stats are recomputed: n_chars = length(text)).
* ``embeddings.embedding``: each replica's vectors are cyclically
  rotated by ``replica`` coordinates.  Pairwise cosines within a
  replica are invariant under the coordinate permutation, so cluster
  structure is preserved; replicas don't collapse onto identical
  vectors (which would make ANN/near-dup degenerate).
* Timestamps are copied unchanged (TPC-H-style: more rows per day, the
  realistic densification of a bigger business; sessionize/as-of
  windows keep their per-user shape because user_id is offset too).

Everything is pure SQL over DuckDB — no RNG, byte-deterministic.

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 → /root/repo/.localdata/sf1 ×10.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

DIMS = ["region", "nation"]
FACTS = ["customer", "supplier", "part", "orders", "lineitem",
         "events", "documents", "embeddings"]

# table → {column: stride-source table.key}; stride tables are resolved
# once so FK columns shift by the SAME stride as their PK.
KEYED = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}


def _strides(con: duckdb.DuckDBPyConnection, src: str) -> dict:
    out = {}
    for tbl, cols in KEYED.items():
        for col, (stbl, scol) in cols.items():
            if (stbl, scol) not in out:
                (mx,) = con.execute(
                    f"SELECT max({scol}) FROM read_parquet("
                    f"'{src}/{stbl}.parquet')").fetchone()
                out[(stbl, scol)] = int(mx) + 1
    return out


def gen(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides = _strides(con, src)
    for tbl in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{tbl}.parquet')) "
            f"TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
        print(f"  {tbl}: copied")
    for tbl in FACTS:
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchall()
        sel = []
        for name, dtype, *_ in cols:
            if name in KEYED.get(tbl, {}):
                stride = strides[KEYED[tbl][name]]
                sel.append(f"CAST({name} + r.r * {stride} AS {dtype}) "
                           f"AS {name}")
            elif tbl == "documents" and name == "text":
                sel.append(
                    "CASE WHEN r.r = 0 THEN text ELSE regexp_replace("
                    "text, '([A-Za-z0-9_]+)', "
                    r"'\1' || CAST(r.r AS VARCHAR), 'g') END AS text")
            elif tbl == "documents" and name == "n_chars":
                sel.append(
                    "CAST(length(CASE WHEN r.r = 0 THEN text ELSE "
                    "regexp_replace(text, '([A-Za-z0-9_]+)', "
                    r"'\1' || CAST(r.r AS VARCHAR), 'g') END) "
                    f"AS {dtype}) AS n_chars")
            elif tbl == "embeddings" and name == "embedding":
                # cyclic rotate by r coords (1-based list slicing)
                sel.append(
                    "CASE WHEN r.r = 0 THEN embedding ELSE "
                    "list_concat("
                    "embedding[(r.r % len(embedding)) + 1 :], "
                    "embedding[1 : (r.r % len(embedding))])"
                    f"::{dtype} END AS embedding")
            else:
                sel.append(name)
        q = (f"COPY (SELECT {', '.join(sel)} "
             f"FROM read_parquet('{src}/{tbl}.parquet'), "
             f"(SELECT unnest(range({factor})) AS r) AS r "
             f"ORDER BY r.r) "
             f"TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
        t0 = time.time()
        con.execute(q)
        (n,) = con.execute(f"SELECT count(*) FROM read_parquet("
                           f"'{dst}/{tbl}.parquet')").fetchone()
        print(f"  {tbl}: {n} rows in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (sys.argv[2] if len(sys.argv) > 2
           else "/root/repo/.localdata/sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(f"gen_sf: {src} → {dst} ×{factor}")
    gen(src, dst, factor)
    print("done")
