"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship CDC pipeline at sf0.001; queries()/oracle_sql()
expose the operator inventory (SURVEY.md §2) for the DuckDB correctness
gate. Implementation lives in the sequin_spark package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sequin_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q_pipeline_flagship(spark, "/root/testdata/sf0.001")


def _rotation_order(names: list[str]) -> list[str]:
    """Order the registry so entries absent from the latest
    CORRECTNESS_r*.json come FIRST. The driver's correctness file caps
    at 50 queries taken in dict order, so with a 71-entry registry a
    static order leaves the same tail unverified every round; rotating
    by last-verified means every query gets a driver-recorded row at
    least every other round (the full set is also checked each round by
    tools/oracle_check.py, committed as CORRECTNESS_FULL_r*.txt)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest, latest_n = None, -1
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m and int(m.group(1)) > latest_n:
            latest, latest_n = p, int(m.group(1))
    if latest is None:
        return names
    try:
        with open(latest) as f:
            rows = json.load(f)
    except (OSError, ValueError):
        return names
    covered = set(rows)

    def _green(r) -> bool:
        return (isinstance(r, dict) and not r.get("err")
                and r.get("rows_match") and r.get("schema_match")
                and r.get("hash_match", True))

    red = {n for n in covered if not _green(rows[n])}
    # non-green rows FIRST (their fixes must land in the next driver
    # window), then never-covered entries, then the verified tail
    return ([n for n in names if n in red]
            + [n for n in names if n not in covered]
            + [n for n in names if n in covered and n not in red])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    order = _rotation_order(list(_q.QUERIES))
    return {n: _q.QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    order = [n for n in _rotation_order(list(_q.QUERIES)) if n in _q.ORACLES]
    return {n: _q.ORACLES[n] for n in order}
