"""Seeded randomized corpus: operator semantics vs pure-Python references
(the factory-style randomized coverage of the reference's test suite,
test/support/factory/*.ex — deterministic seed, one Spark job per op)."""

import random

from pyspark.sql import functions as F

from sequin_spark.operators.changes import UNCHANGED_TOAST, changes_expr, toast_filled_expr
from sequin_spark.operators.grouping import deliverable_messages

COLS = ["a", "b", "c", "d"]
VALS = ["x", "y", "z", None, UNCHANGED_TOAST]


def _random_rows(n, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        old = {c: rng.choice(["x", "y", "z", None]) for c in COLS}
        new = {}
        for c in COLS:
            r = rng.random()
            if r < 0.4:
                new[c] = old[c]          # unchanged
            elif r < 0.7:
                new[c] = rng.choice(VALS)  # changed / toast / null
            else:
                new[c] = rng.choice(["p", "q"])
        rows.append((i, {k: v for k, v in new.items() if v is not None},
                     {k: v for k, v in old.items() if v is not None}))
    return rows


def _py_changes(new, old):
    # consumers.ex:661-676: old entries whose new value differs and isn't
    # the unchanged-TOAST marker
    return {
        k: v for k, v in old.items()
        if new.get(k) != v and new.get(k) != UNCHANGED_TOAST
    }


def _py_toast_fill(new, old):
    return {
        k: (old.get(k) if v == UNCHANGED_TOAST and old.get(k) is not None else v)
        for k, v in new.items()
    }


def test_changes_and_toast_match_reference_model(spark):
    rows = _random_rows(300, seed=7)
    df = spark.createDataFrame(
        rows, "id long, record map<string,string>, old_record map<string,string>"
    )
    got = {
        r.id: (dict(r.changes), dict(r.filled))
        for r in df.select(
            "id",
            changes_expr("record", "old_record").alias("changes"),
            toast_filled_expr("record", "old_record").alias("filled"),
        ).collect()
    }
    for i, new, old in rows:
        exp_changes = _py_changes(new, old)
        exp_filled = _py_toast_fill(new, old)
        assert got[i][0] == exp_changes, f"changes mismatch @ {i}: {new} {old}"
        # map comparison ignores null-valued entries (Spark maps drop none here)
        assert {k: v for k, v in got[i][1].items() if v is not None} == {
            k: v for k, v in exp_filled.items() if v is not None
        }, f"toast mismatch @ {i}"


def test_deliverable_selection_matches_reference_model(spark):
    rng = random.Random(11)
    rows = []
    cursors = set()
    for _ in range(400):
        g = f"g{rng.randrange(25)}" if rng.random() > 0.05 else None
        cur = (rng.randrange(50), rng.randrange(8))
        if cur in cursors:
            continue
        cursors.add(cur)
        rows.append((g, cur[0], cur[1]))
    df = spark.createDataFrame(rows, "group_id string, commit_lsn long, commit_idx long")
    got = {(r.group_id, r.commit_lsn, r.commit_idx) for r in deliverable_messages(df).collect()}
    # reference model: min cursor per group; null-group rows all deliverable
    heads = {}
    nulls = set()
    for g, lsn, idx in rows:
        if g is None:
            nulls.add((None, lsn, idx))
        elif g not in heads or (lsn, idx) < heads[g]:
            heads[g] = (lsn, idx)
    expected = {(g, c[0], c[1]) for g, c in heads.items()} | nulls
    assert got == expected


def test_filter_funnel_matches_python_model_randomized(spark):
    """Seeded random metrics × the standard rule semantics vs a pure
    Python fold: first-violation attribution and funnel conservation
    hold for every random draw (one Spark job, 400 rows)."""
    from sequin_spark.datapipe.filtering import filter_funnel

    rng = random.Random(13)
    rows = [(i, rng.randint(0, 30), rng.randint(0, 5), rng.random())
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, nt int, sh int, dr double")
    rules = [
        ("r_short", F.col("nt") < 8),
        ("r_stop", F.col("sh") < 1),
        ("r_dup", F.col("dr") > 0.8),
    ]

    def py_first(nt, sh, dr):
        if nt < 8:
            return "r_short"
        if sh < 1:
            return "r_stop"
        if dr > 0.8:
            return "r_dup"
        return "(kept)"

    want = {}
    for _, nt, sh, dr in rows:
        want[py_first(nt, sh, dr)] = want.get(py_first(nt, sh, dr), 0) + 1
    got = {r.rule: r for r in filter_funnel(df, rules).collect()}
    for name in ("r_short", "r_stop", "r_dup"):
        assert got[name].n_dropped == want.get(name, 0)
    assert got["(kept)"].n_survived == want.get("(kept)", 0)
    # conservation: reached[i+1] == survived[i] in rule order
    ordered = sorted(got.values(), key=lambda r: r.rule_idx)
    for a, b in zip(ordered, ordered[1:]):
        assert a.n_survived == b.n_reached
    assert ordered[0].n_reached == 400


def test_phash_banding_matches_bruteforce_randomized(spark):
    """Random 63-bit hashes: the banded candidate join returns EXACTLY
    the brute-force Hamming<=6 pair set (pigeonhole completeness +
    verify-step soundness) for every draw."""
    import itertools

    from sequin_spark.datapipe.multimodal import phash_near_dup_pairs

    rng = random.Random(29)
    base = rng.getrandbits(63)
    hashes = [(0, base)]
    for i in range(1, 60):
        if i % 3 == 0:  # near-dup: flip up to 7 random bits of base
            h = base
            for _ in range(rng.randint(1, 7)):
                h ^= 1 << rng.randrange(63)
            hashes.append((i, h))
        else:
            hashes.append((i, rng.getrandbits(63)))
    df = spark.createDataFrame(hashes, "doc_id long, dhash long")
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in phash_near_dup_pairs(df, max_hamming=6).collect()}
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(hashes, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 6:
            want[(min(ia, ib), max(ia, ib))] = d
    assert got == want
    assert want  # the draw must actually contain near-dup pairs
