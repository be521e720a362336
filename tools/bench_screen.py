"""Round-over-round per-query regression screen, drift-normalized.

r11's driver bench read a uniform ~1.4–1.7× over r10 — including
pure-CPU no-shuffle kernels — because the host was busy, and
adjudicating that took a manual quiet-host re-run (VERDICT r11, "What's
wrong" #2).  bench.py now interleaves a fixed-work sentinel kernel with
the sweep reps and ships a ``queries_norm`` map (per-query seconds with
the measured host-speed factor divided out); this screen compares two
bench artifacts on the NORMALIZED numbers so genuine movers separate
from host drift.

    python tools/bench_screen.py OLD.json NEW.json [--threshold 1.3]

Accepts any artifact carrying a per-query map (BENCH_QUERIES.json,
docs/BENCH_QUERIES_r*_final.json, BENCH_r*.json).  Norm-vs-norm is
REQUIRED (r12 task #3: raw comparisons are exactly the host-drift
judgment calls the screen exists to remove) — an artifact without
``queries_norm`` is an error unless ``--allow-raw`` is passed.
Exit code 1 when any mover exceeds the threshold (so it can gate).
"""

from __future__ import annotations

import argparse
import json
import sys


def load_map(path: str) -> tuple[dict[str, float], bool]:
    with open(path) as f:
        d = json.load(f)
    if isinstance(d.get("queries_norm"), dict) and d["queries_norm"]:
        return ({k: v for k, v in d["queries_norm"].items() if v > 0}, True)
    q = d.get("queries") or {}
    return ({k: v for k, v in q.items() if isinstance(v, (int, float))
             and v > 0}, False)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--min-sec", type=float, default=0.3,
                    help="ignore sub-threshold-absolute queries (timer "
                         "noise dominates below this)")
    ap.add_argument("--allow-raw", action="store_true",
                    help="permit a raw-seconds comparison when an "
                         "artifact predates queries_norm (pre-r11)")
    args = ap.parse_args()

    old, old_norm = load_map(args.old)
    new, new_norm = load_map(args.new)
    normalized = old_norm and new_norm
    if not normalized:
        if not args.allow_raw:
            which = [p for p, ok in ((args.old, old_norm),
                                     (args.new, new_norm)) if not ok]
            print("ERROR: no queries_norm in " + ", ".join(which)
                  + " — norm-vs-norm is required (pass --allow-raw to "
                    "compare raw seconds; host drift will NOT be "
                    "divided out)")
            return 2
        print("NOTE: raw (un-normalized) comparison — at least one "
              "artifact predates the sentinel; host drift is NOT "
              "divided out")

    common = sorted(set(old) & set(new))
    movers = []
    for name in common:
        o, n = old[name], new[name]
        if max(o, n) < args.min_sec:
            continue
        ratio = n / o
        if ratio >= args.threshold or ratio <= 1.0 / args.threshold:
            movers.append((ratio, name, o, n))
    movers.sort(reverse=True)

    print(f"{len(common)} common queries "
          f"({'normalized' if normalized else 'raw'} seconds), "
          f"threshold {args.threshold}x, floor {args.min_sec}s")
    tot_o = sum(old[n] for n in common)
    tot_n = sum(new[n] for n in common)
    print(f"common-set total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)")
    if not movers:
        print("no movers beyond threshold")
        return 0
    print(f"{'ratio':>7}  {'old_s':>8}  {'new_s':>8}  query")
    for ratio, name, o, n in movers:
        tag = "SLOWER" if ratio > 1 else "faster"
        print(f"{ratio:7.2f}  {o:8.3f}  {n:8.3f}  {name}  [{tag}]")
    return 1 if any(r > 1 for r, *_ in movers) else 0


if __name__ == "__main__":
    sys.exit(main())
