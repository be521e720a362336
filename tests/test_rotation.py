"""Driver-window rotation: changed-implementation queries are
prioritized into the next correctness window (judge r6 task #6 — a
matched-pair query+oracle edit must never miss its next driver
window)."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry_mod  # noqa: E402


def test_parse_hunk_ranges():
    diff = (
        "@@ -10,2 +12,3 @@ def f():\n"
        "@@ -20 +25 @@\n"
        "@@ -30,4 +33,0 @@\n"   # pure deletion → single line at point
    )
    assert entry_mod._parse_hunk_ranges(diff) == [
        (12, 14), (25, 25), (33, 33)]


def test_spans_overlap():
    assert entry_mod._spans_overlap((10, 20), [(1, 5), (18, 25)])
    assert not entry_mod._spans_overlap((10, 20), [(1, 9), (21, 30)])
    assert entry_mod._spans_overlap((10, 10), [(10, 10)])


def test_tiered_ordering():
    names = list("abcdefg")
    out = entry_mod._tiered(
        names,
        red={"e"},
        touched={"b", "d"},       # b: covered-green but changed
        last_round={"a": 8, "b": 8, "e": 8, "f": 3},
    )
    # red first, then NEVER-covered (c, d, g — d's touched flag is
    # moot, no driver evidence beats changed-implementation), then
    # MUST-COVER (f@r3: age 9−3 = 6 > AGE_BOUND — the hard ceiling
    # beats the touched tier), then touched-with-history (b), then a@r8
    assert out == ["e", "c", "d", "g", "f", "b", "a"]


def test_tiered_staleness_reserve_survives_touched_churn():
    """Even when the changed set saturates the window, the reserve
    slots go to the stalest queries — no query can starve outside the
    driver window indefinitely."""
    names = [f"q{i:03d}" for i in range(137)]
    touched = set(names[:100])            # massive churn
    last = {n: 8 for n in names}          # everyone covered at r8...
    stale = names[120:137]                # ...except these, covered r2
    for n in stale:
        last[n] = 2
    out = entry_mod._tiered(names, red=set(), touched=touched,
                            last_round=last, window=50, reserve=15)
    window = set(out[:50])
    # ALL 17 age-violating entries are must-cover (uncapped); the
    # touched cap shrinks to 50 − 17 − 15 = 18 and the reserve's 15
    # slots go to the next-stalest (everyone @r8)
    assert set(stale) <= window
    assert len(window & touched) == 18
    # touched overflow comes immediately after the reserve
    assert set(out[50:50 + 100 - 18]) == set(touched - window)
    # permutation invariant
    assert sorted(out) == sorted(names)


def test_tiered_never_covered_beats_oldest_round():
    names = list("abcd")
    out = entry_mod._tiered(names, red=set(), touched=set(),
                            last_round={"a": 1, "b": 5, "d": 2})
    # c never covered → first; then a@r1, d@r2, b@r5
    assert out == ["c", "a", "d", "b"]


def test_changed_files_and_hunks_synthetic_git(tmp_path):
    """End-to-end over a synthetic git history: commit a correctness
    file, then change a query source — the changed file and its hunk
    lines are reported relative to that commit."""
    repo = str(tmp_path)

    def git(*args):
        subprocess.run(["git", *args], cwd=repo, check=True,
                       capture_output=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    os.makedirs(os.path.join(repo, "sequin_spark"))
    qfile = os.path.join(repo, "sequin_spark", "queries.py")
    with open(qfile, "w") as f:
        f.write("def q_a():\n    return 1\n\n\ndef q_b():\n    return 2\n")
    with open(os.path.join(repo, "CORRECTNESS_r01.json"), "w") as f:
        json.dump({"q_a": {"rows_match": True}}, f)
    git("add", "-A")
    git("commit", "-qm", "round 1")

    # edit q_b's body (line 5-6 region) after the correctness commit
    with open(qfile, "w") as f:
        f.write("def q_a():\n    return 1\n\n\ndef q_b():\n    return 99\n")

    changed = entry_mod._changed_files_and_hunks(
        repo, ["CORRECTNESS_r01.json"])
    assert changed is not None
    files, hunks = changed
    assert files == {"sequin_spark/queries.py"}
    # the touched line (6) falls inside q_b's span (5-6), not q_a's (1-2)
    assert entry_mod._spans_overlap((5, 6), hunks["sequin_spark/queries.py"])
    assert not entry_mod._spans_overlap(
        (1, 2), hunks["sequin_spark/queries.py"])


def test_touched_queries_by_span_and_module_ref():
    """Against the real registry: a hunk inside one query function's
    span touches exactly that query; a changed operator module touches
    the queries that reference it."""
    import inspect

    from sequin_spark import queries as q

    fn = q.QUERIES["bucketed_colocated_join"]
    src, first = inspect.getsourcelines(fn)
    span_mid = first + len(src) // 2
    qfile = os.path.relpath(inspect.getsourcefile(fn), HERE)

    touched = entry_mod._touched_queries(
        q.QUERIES, HERE,
        ({qfile}, {qfile: [(span_mid, span_mid)]}))
    assert "bucketed_colocated_join" in touched
    assert "agg_pricing_summary" not in touched

    # module-reference path: operators/bucketed.py changed wholesale
    mod = "sequin_spark/operators/bucketed.py"
    touched2 = entry_mod._touched_queries(q.QUERIES, HERE, ({mod}, {}))
    assert "bucketed_colocated_join" in touched2
    assert "agg_pricing_summary" not in touched2


def test_rotation_order_still_covers_everything():
    """Whatever the git state, the rotation is a permutation of the
    registry — nothing dropped, nothing duplicated."""
    names = list(entry_mod._q.QUERIES)
    order = entry_mod._rotation_order(names)
    assert sorted(order) == sorted(names)


def test_tiered_new_queries_enter_first_window_despite_churn():
    """r10 verdict task #10: a query added this round (no driver
    evidence at all) must land in its FIRST available window even when
    the changed-implementation tier saturates its cap — new queries
    are a tier of their own, not contestants for the reserve."""
    names = [f"q{i:03d}" for i in range(156)]
    new = {"q150", "q155"}
    touched = set(names[:120]) | new      # churn + the new ones
    last = {n: 9 for n in names if n not in new}
    for n in list(last)[:30]:
        last[n] = 4                        # a stale cohort
    out = entry_mod._tiered(names, red=set(), touched=touched,
                            last_round=last, window=50, reserve=25)
    window = out[:50]
    assert set(window[:2]) == new          # right at the head
    # reserve still holds: the 25 stalest non-touched entries fit too
    stale_rest = [n for n in names
                  if n not in touched and last.get(n) == 4]
    assert set(stale_rest[:23]) <= set(window)


def test_tiered_touched_drains_stalest_first():
    """The touched tier is ordered by staleness, so a touched query
    last covered at r2 beats one covered at r9 when the cap bites."""
    names = [f"q{i:02d}" for i in range(60)]
    touched = set(names[:40])
    last = {n: 9 for n in names}
    last["q30"] = 2                        # touched AND very stale
    out = entry_mod._tiered(names, red=set(), touched=touched,
                            last_round=last, window=10, reserve=5)
    # cap = 10 - 0 - 0 - 5 = 5 touched slots; q30 must take one
    assert "q30" in out[:5]


def test_tiered_must_cover_ceiling():
    """r11 verdict task #6: a query whose age would exceed AGE_BOUND if
    skipped enters the window UNCAPPED, ahead of the touched tier, even
    when churn saturates everything."""
    names = [f"q{i:03d}" for i in range(162)]
    touched = set(names[:150])                # near-total churn
    last = {n: 11 for n in names}
    at_risk = names[100:148]                  # 48 entries about to breach
    for n in at_risk:
        last[n] = 8                           # planning 12 − 8 = 4 > 3
    out = entry_mod._tiered(names, red=set(), touched=touched,
                            last_round=last, window=50, reserve=25)
    window = set(out[:50])
    assert set(at_risk) <= window             # all 48, despite churn
    # age exactly AGE_BOUND is NOT must-cover (it may wait one round)
    last2 = {n: 11 for n in names}
    last2["q000"] = 9                         # age 3 == bound: not forced
    out2 = entry_mod._tiered(names, red=set(), touched=set(names[1:60]),
                             last_round=last2, window=50, reserve=25)
    # q000 still enters via the reserve (it is the stalest), but as a
    # reserve pick, not a must — verify by saturating must instead
    assert "q000" in out2[:50]


def test_coverage_windows_check_passes_on_repo():
    """The enforcement tool: every must-cover query is inside the
    upcoming driver window on the real registry/correctness state."""
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "coverage_windows.py"),
         "--check"], capture_output=True, text=True, cwd=HERE)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "staleness bound enforced" in r.stdout


def test_bench_screen_normalized_comparison(tmp_path):
    """tools/bench_screen.py: prefers queries_norm on both sides, flags
    movers both directions, ignores sub-floor timings, exits 1 only on
    a slower-side mover; falls back to raw with a loud note."""
    import json

    old = {"queries": {"a": 2.0, "b": 1.0, "tiny": 0.01},
           "queries_norm": {"a": 1.0, "b": 1.0, "tiny": 0.01}}
    new = {"queries": {"a": 1.0, "b": 2.0, "tiny": 0.29},
           "queries_norm": {"a": 1.0, "b": 1.9, "tiny": 0.29}}
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    tool = os.path.join(HERE, "tools", "bench_screen.py")
    r = subprocess.run([sys.executable, tool, str(po), str(pn)],
                       capture_output=True, text=True)
    assert r.returncode == 1            # b got slower (normalized)
    assert "normalized" in r.stdout
    assert "b" in r.stdout and "SLOWER" in r.stdout
    assert "tiny" not in r.stdout       # below the 0.3s floor
    # a is 2.0->1.0 raw but 1.0->1.0 normalized: NOT a mover
    assert "  a  " not in r.stdout

    # a raw-only artifact is an ERROR by default (r12 task #3: raw
    # comparisons are the judgment calls the screen exists to remove)…
    old2 = {"queries": {"a": 1.0}}
    po.write_text(json.dumps(old2))
    r2 = subprocess.run([sys.executable, tool, str(po), str(pn)],
                        capture_output=True, text=True)
    assert r2.returncode == 2
    assert "ERROR: no queries_norm" in r2.stdout
    # …and only --allow-raw opts into the loud-note fallback
    r3 = subprocess.run([sys.executable, tool, str(po), str(pn),
                         "--allow-raw"],
                        capture_output=True, text=True)
    assert "NOTE: raw" in r3.stdout
    assert r3.returncode == 0           # a: 1.0 -> 1.0 raw, no movers


def test_bench_interp_factor():
    """bench.interp_factor: time-nearest linear interpolation of the
    host-speed factor, end-clamped, identity with no samples — the
    per-query normalization primitive (r12 task #3)."""
    import bench

    b = bench.SENTINEL_BASELINE_SEC
    assert bench.interp_factor([], 10.0) == 1.0
    # single sample: constant factor
    assert bench.interp_factor([(5.0, 2 * b)], 0.0) == 2.0
    assert bench.interp_factor([(5.0, 2 * b)], 99.0) == 2.0
    # two samples: midpoint interpolates, ends clamp
    s = [(0.0, 1 * b), (10.0, 3 * b)]
    assert abs(bench.interp_factor(s, 5.0) - 2.0) < 1e-9
    assert bench.interp_factor(s, -1.0) == 1.0
    assert bench.interp_factor(s, 11.0) == 3.0
    # a mid-sweep drift spike only affects queries near it in time
    s = [(0.0, b), (50.0, b), (60.0, 2 * b), (70.0, b), (120.0, b)]
    assert abs(bench.interp_factor(s, 25.0) - 1.0) < 1e-9
    assert abs(bench.interp_factor(s, 60.0) - 2.0) < 1e-9
    assert abs(bench.interp_factor(s, 100.0) - 1.0) < 1e-9
    # degenerate duplicate timestamps don't divide by zero
    assert bench.interp_factor([(5.0, b), (5.0, 3 * b)], 5.0) >= 1.0
