# convenience targets (the reference ships a Makefile too; its `test:` target
# is the same two-tier split — `pytest -k "not slow"`)

.PHONY: test test-all test-fast bench clean-cache native

# fast tier: every test not marked `slow` — the per-commit developer loop.
# Policy: any test measured >= ~15 s on the CI host (subprocess/CLI e2e,
# notebook executions, strategy fits, long training loops) carries
# @pytest.mark.slow; re-derive candidates with `pytest --durations=25`.
# Budget: the tier must stay under ~10 min on this host; when it drifts,
# demote the slowest offenders to the slow tier (re-derive via --durations).
# NOTE (ADVICE r4): `make test` is the FAST tier, not the full suite —
# pre-merge / CI coverage of the slow e2e tests comes from the `full` CI job
# (pushes to main + nightly, .github/workflows/test.yml) which invokes pytest
# directly; use `make test-all` locally for the same.
test:
	python -m pytest tests/ -q -m "not slow"

# full tier: the complete suite (main/nightly CI, pre-release)
test-all:
	python -m pytest tests/ -q

# legacy alias
test-fast: test

bench:
	python bench.py

native:
	$(MAKE) -C particle_fm_tpu/native/fastjet_lite

clean-cache:
	rm -rf .jax_cache .jax_cache_tests
