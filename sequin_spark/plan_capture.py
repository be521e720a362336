"""See-through-checkpoint switch for plan capture (r13 verdict task #4).

Several query builds truncate their plan with ``localCheckpoint`` —
the right execution shape (evaluate a reused subframe once), but it
turns the captured physical plan into a bare ``Scan ExistingRDD`` leaf,
so the plan-shape gate (tests/test_plan_quality.py) and the committed
baseline (tools/plan_stats.py) could no longer see regressions behind
those leaves (funnel_conversion read 0 Exchanges after r13).

``ckpt(df)`` is the drop-in used at NON-LOOP checkpoint sites: in
normal execution it is exactly ``df.localCheckpoint(eager=...)``; under
``capture_plans()`` it is the identity, so ``explain`` shows the full
child plan.  Iterative fits keep raw ``localCheckpoint`` calls — their
truncation is load-bearing (without it the per-round plan doubles), and
their loop shape is gated by the bounded-collect contract instead.
"""

from __future__ import annotations

from contextlib import contextmanager

SKIP_CHECKPOINTS = False


def ckpt(df, eager: bool = False):
    """``df.localCheckpoint(eager=eager)``, or ``df`` under capture."""
    if SKIP_CHECKPOINTS:
        return df
    return df.localCheckpoint(eager=eager)


@contextmanager
def capture_plans():
    """Build queries with see-through (no-op) plan checkpoints."""
    global SKIP_CHECKPOINTS
    prev = SKIP_CHECKPOINTS
    SKIP_CHECKPOINTS = True
    try:
        yield
    finally:
        SKIP_CHECKPOINTS = prev
