# Developer entry points. `make snapshot` is the pre-snapshot guard the
# audit contract depends on (VERDICT r6 task #1): it re-runs the FULL
# registry oracle check and refuses to proceed unless every row passes,
# writing CORRECTNESS_FULL_r{N}.txt; tests/test_full_audit.py fails the
# suite if that file is missing, stale, or red.

.PHONY: test snapshot audit bench plan-audit

test:
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
