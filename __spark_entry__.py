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


def _parse_hunk_ranges(diff_text: str) -> list[tuple[int, int]]:
    """New-file line ranges touched by a unified diff (-U0 hunks).

    ``@@ -a,b +c,d @@`` → (c, c+max(d,1)-1); pure-deletion hunks (d=0)
    still map to the single line at the deletion point, so removing a
    line inside a query function marks that function as touched."""
    import re

    out: list[tuple[int, int]] = []
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@",
                         diff_text, re.MULTILINE):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        out.append((max(start, 1), max(start, 1) + max(count, 1) - 1))
    return out


def _spans_overlap(span: tuple[int, int], ranges: list[tuple[int, int]]) -> bool:
    lo, hi = span
    return any(a <= hi and lo <= b for a, b in ranges)


def _changed_files_and_hunks(here: str, since_paths: list[str]) -> tuple[set[str], dict[str, list[tuple[int, int]]]] | None:
    """(changed repo-relative .py files, per-file new-line hunk ranges)
    since the commit that last touched any of ``since_paths`` (the
    newest driver correctness file) — committed AND working-tree
    changes.  None on any git failure (callers fall back)."""
    import subprocess

    def _git(*args: str) -> str:
        return subprocess.run(
            ["git", *args], cwd=here, capture_output=True, text=True,
            timeout=30, check=True).stdout

    try:
        base = ""
        for p in since_paths:
            sha = _git("log", "-1", "--format=%H", "--", p).strip()
            if sha:
                base = sha
                break
        if not base:
            return None
        diff = _git("diff", "-U0", base, "--", "sequin_spark",
                    "__spark_entry__.py")
    except Exception:  # noqa: BLE001 — any git hiccup → no prioritization
        return None
    files: set[str] = set()
    hunks: dict[str, list[tuple[int, int]]] = {}
    cur: str | None = None
    for line in diff.splitlines():
        if line.startswith("+++ b/"):
            cur = line[6:]
            files.add(cur)
            hunks.setdefault(cur, [])
        elif line.startswith("@@") and cur is not None:
            hunks[cur].extend(_parse_hunk_ranges(line + "\n"))
    return files, hunks


def _touched_queries(registry: dict[str, Callable], here: str,
                     changed: tuple[set[str], dict[str, list[tuple[int, int]]]]) -> set[str]:
    """Queries whose implementation changed: the hunks intersect the
    query function's own source span, OR the function references a
    ``sequin_spark.<module>`` whose file changed at all (queries import
    their operators inside the function body, so a source-scan for
    module references is the dependency map)."""
    import inspect
    import re

    files, hunks = changed
    touched: set[str] = set()
    mod_file = {f: f.replace("/", ".").removesuffix(".py")
                for f in files if f.endswith(".py")}
    changed_mods = set(mod_file.values())
    for name, fn in registry.items():
        try:
            src_file = os.path.relpath(inspect.getsourcefile(fn), here)
            src, first = inspect.getsourcelines(fn)
        except (TypeError, OSError):
            continue
        span = (first, first + len(src) - 1)
        if src_file in hunks and _spans_overlap(span, hunks[src_file]):
            touched.add(name)
            continue
        refs = set(re.findall(r"sequin_spark\.[\w.]+", "".join(src)))
        for mod in changed_mods:
            if any(r == mod or r.startswith(mod + ".") or mod.startswith(r)
                   for r in refs):
                touched.add(name)
                break
    return touched


# The driver samples the FIRST ~50 rotation entries each round; the
# reserve guarantees that many slots always go to the STALEST queries
# (smallest last-covered round), bounding how long any query can sit
# outside a driver window: worst case (touched saturating its cap every
# round) ceil(|registry| / STALENESS_RESERVE) rounds — ~7 at 156
# queries and reserve 25.  The zero-churn steady-state floor is
# ceil(|registry| / WINDOW) ≈ 4 rounds at the current registry size —
# no ordering can beat that with a 50-query window over 156 queries.
# r10 verdict task #10 tightened two things: NEVER-covered queries
# (new this round — zero driver evidence) are their own tier right
# after red instead of competing inside the reserve, and the touched
# tier drains stalest-first so fresh-covered-but-touched entries no
# longer displace stale ones at the window boundary.
WINDOW = 50
STALENESS_RESERVE = 25
# Hard staleness ceiling (r11 verdict task #6): any query whose age
# (planning round − last covered round) would EXCEED this if skipped is
# a MUST-COVER — placed ahead of the changed-implementation tier and
# never capped.  The steady-state floor with |registry| ≈ 3.2 × WINDOW
# is a 4-round cycle, which keeps every displayed age ≤ 3 exactly when
# each round covers its whole must-cover bucket; buckets are ≤ WINDOW
# by construction of earlier rounds, and tools/coverage_windows.py
# --check fails the build if a bucket ever outgrows the window.
AGE_BOUND = 3


def _last_window_rounds(here: str) -> dict[str, int]:
    """query name → newest driver round whose CORRECTNESS_r*.json
    covered it (−1 if implied absent) — the staleness signal."""
    import glob
    import json
    import re

    last: dict[str, int] = {}
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for n in rows:
            if rnd > last.get(n, -1):
                last[n] = rnd
    return last


def _rotation_order(names: list[str]) -> list[str]:
    """Order the registry so the driver's ~50-query window covers what
    most needs independent verification.  Tiers, first to last:

    1. entries whose latest driver row is NON-GREEN (fixes must land in
       the next window);
    2. entries whose IMPLEMENTATION CHANGED since the last driver
       correctness round (git diff of the query function's span or of a
       sequin_spark module it references) — capped so tier 3's reserve
       survives; overflow lands right after the reserve;
    3. a guaranteed STALENESS_RESERVE of the least-recently-covered
       entries (never-covered first) — every query appears in some
       driver window within ceil(N/RESERVE) rounds no matter how much
       churn tiers 1-2 generate;
    4. the rest, stalest first.

    The full set is independently checked by tools/snapshot_check.py
    --write, committed as CORRECTNESS_FULL_r*.txt and gated by
    tests/test_full_audit.py; per-query last-window rounds are surfaced
    in COVERAGE.md (tools/coverage_windows.py)."""
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

    def _green(r) -> bool:
        return (isinstance(r, dict) and not r.get("err")
                and r.get("rows_match") and r.get("schema_match")
                and r.get("hash_match", True))

    red = {n for n in rows if not _green(rows[n])}
    changed = _changed_files_and_hunks(here, [latest])
    touched: set[str] = set()
    if changed is not None:
        try:
            touched = _touched_queries(
                {n: _q.QUERIES[n] for n in names if n in _q.QUERIES},
                here, changed)
        except Exception:  # noqa: BLE001 — prioritization is best-effort
            touched = set()
    return _tiered(names, red, touched, _last_window_rounds(here))


def _tiered(names: list[str], red: set[str], touched: set[str],
            last_round: dict[str, int], window: int = WINDOW,
            reserve: int = STALENESS_RESERVE,
            latest_round: int | None = None,
            age_bound: int = AGE_BOUND) -> list[str]:
    """Pure tier ordering: red, then NEVER-covered (new queries —
    zero driver evidence, touched or not), then MUST-COVER (queries
    whose age would exceed ``age_bound`` if this window skipped them —
    touched or not, never capped: the hard staleness ceiling), then
    changed-implementation stalest-first (capped at window − earlier
    tiers − reserve), then the stalest ``reserve`` entries, then
    touched overflow, then the rest stalest-first (stable within equal
    staleness)."""
    idx = {n: i for i, n in enumerate(names)}

    def stale_key(n: str) -> tuple:
        return (last_round.get(n, -1), idx[n])

    if latest_round is None:
        latest_round = max(last_round.values(), default=-1)
    planning = latest_round + 1

    t1 = [n for n in names if n in red]
    t_new = [n for n in names if n not in red and n not in last_round]
    t_must = sorted(
        (n for n in names if n not in red and n in last_round
         and planning - last_round[n] > age_bound), key=stale_key)
    taken = set(t1) | set(t_new) | set(t_must)
    t2_all = sorted((n for n in names if n in touched and n not in taken),
                    key=stale_key)
    cap = max(0, window - len(t1) - len(t_new) - len(t_must) - reserve)
    t2, t2_over = t2_all[:cap], t2_all[cap:]
    rest = sorted((n for n in names
                   if n not in taken and n not in touched), key=stale_key)
    head_n = max(0, window - len(t1) - len(t_new) - len(t_must) - len(t2))
    return (t1 + t_new + t_must + t2 + rest[:head_n] + t2_over
            + rest[head_n:])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    order = _rotation_order(list(_q.QUERIES))
    return {n: _q.QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    order = [n for n in _rotation_order(list(_q.QUERIES)) if n in _q.ORACLES]
    return {n: _q.ORACLES[n] for n in order}
