# Verification gate (SURVEY.md §4): one command a round can run.
#
#   make check       - tests + entry/dryrun + bench smoke w/ regression gate
#   make check-fast  - tests + entry/dryrun only (no TPU needed)
#   make test        - full pytest suite (forced-CPU, 8 virtual devices)
#   make entry       - entry() compile check + dryrun_multichip(8) on CPU
#   make smoke       - bench.py on the TPU vs newest BENCH_r*.json (2x gate)
#   make native      - build the C++ host toolkit

PY ?= python

.PHONY: check check-fast test entry smoke native

check: test entry smoke

check-fast: test entry

test:
	$(PY) -m pytest tests/ -q

entry:
	$(PY) __graft_entry__.py

smoke:
	$(PY) tools/bench_smoke.py

native:
	$(MAKE) -C native
