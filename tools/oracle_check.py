"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at the
given sf dir, compares row count, sorted column names, per-column TYPES
(the driver hashes typed values — DuckDB HUGEINT vs Spark BIGINT differs
even when every value is numerically identical, the r4/r5
`corpus_stats_profile` flake), and an order-insensitive multiset of rows
(values normalized to strings).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from collections import Counter
from datetime import datetime

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# Canonical type tokens.  Signed ints ≤64-bit collapse to one class —
# the driver's typed hash equates them (empirically: 16 registry
# queries with Spark int vs DuckDB BIGINT are driver-green) — but
# HUGEINT (int128) deliberately maps to a token no Spark type
# produces, so sum(INTEGER) chains left uncast in an oracle fail HERE
# instead of only in the driver's typed hash (the r4/r5
# corpus_stats_profile flake).
_DUCK_TO_CANON = {
    "BIGINT": "int~", "INTEGER": "int~", "SMALLINT": "int~",
    "TINYINT": "int~", "HUGEINT": "hugeint(int128!)",
    "UBIGINT": "ubigint", "UINTEGER": "uint",
    "DOUBLE": "double", "FLOAT": "float", "REAL": "float",
    "VARCHAR": "string", "BOOLEAN": "boolean",
    "DATE": "date", "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp", "BLOB": "binary",
}
_SPARK_TO_CANON = {
    "bigint": "int~", "int": "int~", "smallint": "int~",
    "tinyint": "int~",
}


def duck_type_to_canon(t: str) -> str:
    t = str(t).strip()
    if t.endswith("[]"):
        return f"array<{duck_type_to_canon(t[:-2])}>"
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    return _DUCK_TO_CANON.get(t, t.lower())


def spark_type_to_canon(t: str) -> str:
    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{spark_type_to_canon(t[6:-1])}>"
    return _SPARK_TO_CANON.get(t, t)


def norm(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def run_checks(sf_dir: str, only: set[str] | None = None,
               progress=print) -> list[tuple[str, str, str]]:
    """Run every queries() entry vs its oracle at ``sf_dir``.

    Returns [(name, status, detail)] with status in {"OK", "OK?",
    "FAIL"} ("OK?" = rows-only check, no oracle entry).  ``progress``
    receives one line per query as it completes."""
    import __spark_entry__ as entry_mod
    from sequin_spark.session import get_spark

    spark = get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results: list[tuple[str, str, str]] = []

    def emit(name: str, status: str, detail: str) -> None:
        results.append((name, status, detail))
        progress(f"{status:<5} {name}: {detail}")

    import time as _time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        _t0 = _time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            stypes = {f.name: spark_type_to_canon(f.dataType.simpleString())
                      for f in sdf.schema.fields}
            srows = [tuple(norm(r[c]) for c in scols) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            emit(name, "FAIL", f"spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            emit(name, "OK?", f"rows-only check, {len(srows)} rows")
            continue
        try:
            rel = con.sql(sql)
            dcols_raw = list(rel.columns)
            dtypes = {c: duck_type_to_canon(t)
                      for c, t in zip(rel.columns, rel.types)}
            drows_raw = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            emit(name, "FAIL", f"duckdb error: {e}")
            continue
        dcols = sorted(dcols_raw)
        order = [dcols_raw.index(c) for c in dcols]
        drows = [tuple(norm(r[i]) for i in order) for r in drows_raw]
        if scols != dcols:
            emit(name, "FAIL", f"columns spark={scols} duck={dcols}")
            continue
        tmism = {c: (stypes[c], dtypes[c]) for c in scols
                 if stypes[c] != dtypes[c]}
        if tmism:
            emit(name, "FAIL",
                 f"TYPE mismatch (driver hashes typed values): {tmism}")
            continue
        if len(srows) != len(drows):
            emit(name, "FAIL",
                 f"rowcount spark={len(srows)} duck={len(drows)}")
            continue
        if Counter(srows) != Counter(drows):
            sset, dset = Counter(srows), Counter(drows)
            sonly = list((sset - dset).keys())[:3]
            donly = list((dset - sset).keys())[:3]
            emit(name, "FAIL",
                 f"value mismatch; spark-only={sonly} duck-only={donly}")
            continue
        emit(name, "OK", f"{len(srows)} rows, {len(scols)} cols "
                          f"({_time.time() - _t0:.1f}s)")
    return results


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    results = run_checks(sf_dir, only or None)
    failures = sum(1 for _, s, _ in results if s == "FAIL")
    print(f"\n{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
