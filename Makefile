# Developer entry points. `make snapshot` is the pre-snapshot guard the
# audit contract depends on (VERDICT r6 task #1): it re-runs the FULL
# registry oracle check and refuses to proceed unless every row passes,
# writing CORRECTNESS_FULL_r{N}.txt; tests/test_full_audit.py fails the
# suite if that file is missing, stale, or red.

.PHONY: test test-smoke snapshot audit bench plan-audit

# FULL suite (smoke tier + deep tier); the bare `pytest tests/` default
# is the smoke tier (pytest.ini deselects `deep` long-runners so a
# bounded verify window reaches the summary line)
test:
	python -m pytest tests/ -q -m ""

test-smoke:
	python -m pytest tests/ -q

# run before every end-of-round commit (and after any query/oracle edit)
snapshot:
	python tools/snapshot_check.py --write
	python tools/snapshot_check.py

# verify-only (fast; what the pytest gate runs)
audit:
	python tools/snapshot_check.py

bench:
	python bench.py

plan-audit:
	python tools/plan_audit.py

# NOTE: bench.py writes BENCH_QUERIES.json (full per-query seconds) as
# an UNTRACKED scratch artifact (.gitignore) so driver-run benches at
# round close leave the tree clean; to preserve a round's per-query
# map, copy it to docs/BENCH_QUERIES_r{N}_final.json and commit that
# deliberately (r7's map is kept there).
