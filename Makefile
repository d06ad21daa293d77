# convenience targets (the reference ships a Makefile too; its `test:` target
# is the same two-tier split — `pytest -k "not slow"`)

.PHONY: test test-all test-fast bench clean-cache native \
        repro-bench repro-flagship repro-reflow

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

# ---- one-command reproduction of the three headline claims (README) -------
# Each target regenerates the raw artifact behind a README/RESULTS number;
# see docs/evidence/README.md for the claim -> artifact -> command map.

# headline sampling throughput + MFU + per-arch table (JSON on stdout)
repro-bench:
	python bench.py

# flagship quality: ~12 min synthetic-data training on TPU + the standalone
# full-chain eval (writes eval_metrics.yaml into the run dir)
repro-flagship:
	python -m particle_fm_tpu.train experiment=jetnet/fm_tops150_cond \
	    data.synthetic=true data.synthetic_num_jets=30000 \
	    trainer.max_epochs=800 model.cond_dropout=0.1 \
	    output_dir=runs/repro_flagship
	python scripts/eval_ckpt.py --run_dir "$$(ls -dt runs/repro_flagship/* | head -1)"

# ReFlow NFE=1 distillation of the repro-flagship teacher (run after
# repro-flagship; writes reflow_eval.yaml with the per-NFE W1 table)
repro-reflow:
	python scripts/reflow.py --run_dir "$$(ls -dt runs/repro_flagship/* | head -1)" \
	    --epochs 400 --eval_nfes 1,2,4,100

native:
	$(MAKE) -C particle_fm_tpu/native/fastjet_lite

clean-cache:
	rm -rf .jax_cache .jax_cache_tests
