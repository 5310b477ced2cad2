# CFN-TPU developer targets.
#
# `make preship` is the end-of-round gate: the fast test tier plus the
# driver's own entry/dryrun self-test (`__graft_entry__.py` compiles the
# flagship forward single-chip, then re-execs itself on a virtual 8-device
# CPU mesh and runs the full multichip dryrun: DP fold4 train step,
# sequence-parallel fusion, tensor-parallel tower — each reported
# per-stage).  Nothing ships red: run this before any snapshot.

PY ?= python

.PHONY: test test-slow preship preship-slow bench

test:
	$(PY) -m pytest tests/ -x -q -m "not slow and not tpu"

test-slow:
	$(PY) -m pytest tests/ -x -q -m "not tpu"

preship: test
	$(PY) __graft_entry__.py
	@echo "preship gate: GREEN"

# Full gate including the slow tier (training-trajectory regression harness,
# torch training-dynamics parity): run before any end-of-round snapshot —
# slow-marked regressions are gated here (VERDICT r04 #2).
preship-slow: test-slow
	$(PY) __graft_entry__.py
	@echo "preship-slow gate: GREEN"

bench:
	$(PY) bench.py
