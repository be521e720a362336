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


def build_section() -> str:
    import __spark_entry__ as entry_mod
    from sequin_spark import queries as q

    last = entry_mod._last_window_rounds(HERE)
    by_round: dict[int, list[str]] = defaultdict(list)
    for name in sorted(q.QUERIES):
        by_round[last.get(name, -1)].append(name)
    lines = [
        BEGIN,
        "",
        "## Driver-window staleness (generated)",
        "",
        "Newest driver round whose `CORRECTNESS_r*.json` covered each",
        "query.  The rotation (`__spark_entry__._tiered`) reserves "
        f"{entry_mod.STALENESS_RESERVE} of the "
        f"{entry_mod.WINDOW}-query window for the stalest entries, so "
        "the oldest bucket drains every round (worst-case wait "
        "ceil(N/reserve) rounds).",
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


def main() -> int:
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
