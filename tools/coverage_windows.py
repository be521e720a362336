"""Surface per-query driver-window staleness in COVERAGE.md
(VERDICT r8 task #9): for every registry query, the newest round whose
CORRECTNESS_r*.json covered it.  Rewrites the marker-delimited section
at the end of COVERAGE.md; run after each driver round.

Usage: python tools/coverage_windows.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

BEGIN = "<!-- coverage-windows:begin (tools/coverage_windows.py) -->"
END = "<!-- coverage-windows:end -->"
THROUGH = "<!-- coverage-windows:through r%d -->"


def newest_artifact_round() -> int:
    """The newest round with a CORRECTNESS_r*.json on disk — what the
    generated table must have been built from."""
    import glob
    import re

    rounds = [int(m.group(1))
              for p in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))
              if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))]
    return max(rounds, default=-1)


def build_section() -> str:
    import __spark_entry__ as entry_mod
    from sequin_spark import queries as q

    last = entry_mod._last_window_rounds(HERE)
    by_round: dict[int, list[str]] = defaultdict(list)
    for name in sorted(q.QUERIES):
        by_round[last.get(name, -1)].append(name)
    lines = [
        BEGIN,
        THROUGH % newest_artifact_round(),
        "",
        "## Driver-window staleness (generated)",
        "",
        "Newest driver round whose `CORRECTNESS_r*.json` covered each",
        "query.  The rotation (`__spark_entry__._tiered`) puts every "
        f"query whose age would exceed {entry_mod.AGE_BOUND} rounds in "
        "an uncapped MUST-COVER tier ahead of implementation churn "
        f"(enforced by `tools/coverage_windows.py --check`), plus a "
        f"{entry_mod.STALENESS_RESERVE}-slot reserve of the stalest "
        f"entries in the {entry_mod.WINDOW}-query window.",
        "",
        "| last window | queries |",
        "|---|---|",
    ]
    for rnd in sorted(by_round):
        label = f"r{rnd}" if rnd >= 0 else "never"
        names = by_round[rnd]
        lines.append(f"| {label} ({len(names)}) | {', '.join(names)} |")
    lines += ["", END]
    return "\n".join(lines)


def check_staleness_bound() -> list[str]:
    """The enforcement behind the AGE_BOUND ceiling (r11 verdict task
    #6): recompute the upcoming rotation and verify (a) every
    MUST-COVER query (age would exceed AGE_BOUND if skipped) sits
    inside the first WINDOW entries, and (b) the fixed tiers fit the
    window at all — if red + never-covered + must-cover outgrow the
    window, no ordering can hold the ceiling and the registry/window
    arithmetic itself needs attention.  Returns a list of problems
    (empty = enforced)."""
    import __spark_entry__ as entry_mod
    from sequin_spark import queries as q

    names = list(q.QUERIES)
    last = entry_mod._last_window_rounds(HERE)
    planning = max(last.values(), default=-1) + 1
    must = {n for n in names
            if n in last and planning - last[n] > entry_mod.AGE_BOUND}
    never = {n for n in names if n not in last}
    order = entry_mod._rotation_order(names)
    window = set(order[:entry_mod.WINDOW])
    problems = []
    fixed = len(must) + len(never)
    if fixed > entry_mod.WINDOW:
        problems.append(
            f"must-cover ({len(must)}) + never-covered ({len(never)}) = "
            f"{fixed} > window {entry_mod.WINDOW}: the ceiling is "
            f"unholdable — raise WINDOW or drain faster")
    missed = sorted((must | never) - window)
    if missed:
        problems.append(
            f"rotation leaves {len(missed)} must-cover/new entries "
            f"outside the first {entry_mod.WINDOW}: {', '.join(missed)}")
    # the committed table must have been generated from the NEWEST
    # correctness artifact (r12 verdict "What's wrong" #5: a stale
    # table misreports the drain evidence the verdict tasks cite)
    newest = newest_artifact_round()
    try:
        with open(os.path.join(HERE, "COVERAGE.md")) as f:
            text = f.read()
    except OSError:
        text = ""
    if (THROUGH % newest) not in text:
        problems.append(
            f"COVERAGE.md staleness table predates CORRECTNESS_r"
            f"{newest:02d}.json — regenerate with "
            f"`python tools/coverage_windows.py`")
    return problems


def main() -> int:
    if "--check" in sys.argv:
        problems = check_staleness_bound()
        for p in problems:
            print(f"FAIL: {p}")
        if not problems:
            print("staleness bound enforced: every must-cover query is "
                  "inside the upcoming driver window")
        return 1 if problems else 0
    path = os.path.join(HERE, "COVERAGE.md")
    with open(path) as f:
        text = f.read()
    section = build_section()
    if BEGIN in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END, 1)[1] if END in text else "\n"
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(f"updated {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
