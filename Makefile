# Convenience targets (see CLAUDE.md for environment notes)

test:            ## full suite on a virtual 8-device CPU mesh (~15 min)
	python -m pytest tests/ -q -n 2 --max-worker-restart 4

# test-1proc: single-process run. Can hit a flaky XLA:CPU native crash after
# ~70% of the suite in one interpreter (every test passes in isolation and
# per-file; the 2-worker xdist run above contains/reports it instead).
test-1proc:
	python -m pytest tests/

bench:           ## serving benchmark on the attached TPU (one JSON line)
	python bench.py

smoke-train:     ## tiny end-to-end training run (model+data synthetic)
	python vla-scripts/train.py \
	  --vla.type prism-dinosiglip-224px+mx-moveonly-moveguided-single-policy \
	  --smoke_test true --vla.max_steps 3 --vla.global_batch_size 8 \
	  --run_root_dir /tmp/emmax-smoke --eval_interval 2 --save_interval 2

dryrun:          ## sharded train-step compile+run on 8 virtual devices
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

native:          ## build the C++ frame store
	python -c "from emmax_tpu.data.framestore import build_native; print(build_native(force=True))"

.PHONY: test bench smoke-train dryrun native
