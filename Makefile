# convenience targets (the reference ships a Makefile too)

.PHONY: test test-fast bench clean-cache native

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_lhco_pipeline.py \
		--ignore=tests/test_plotting_final_eval.py --ignore=tests/test_log_prob.py

bench:
	python bench.py

native:
	$(MAKE) -C particle_fm_tpu/native/fastjet_lite

clean-cache:
	rm -rf .jax_cache .jax_cache_tests
