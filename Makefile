# Developer entry points (see CLAUDE.md for environment caveats)

.PHONY: install test bench bench-kernels verify dryrun pipeline

install:
	pip install -e . --no-build-isolation --no-index

test:
	python -m pytest tests/ -q

bench:            ## headline JSON line on the real TPU (tunnel claim can take minutes)
	python bench.py

bench-kernels:    ## per-kernel JSONL -> bench/results.jsonl
	python scripts/bench_kernels.py

dryrun:           ## multichip sharding validation on 8 virtual CPU devices
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python __graft_entry__.py

pipeline:         ## end-to-end audio -> MFCC -> HMM -> metrics (CPU smoke)
	python scripts/run_pipeline.py --utterances 60 --iters 8 --cpu --interpret

verify:           ## quick TPU CLI drive (see .claude/skills/verify)
	python -c "import argparse, shutil; from multimodalworddiscovery_tpu import cli; \
	ns=argparse.Namespace; shutil.rmtree('/tmp/mwd_verify', ignore_errors=True); \
	cli.cmd_train(ns(config='configs/hmm_mini.py', workdir='/tmp/mwd_verify', fresh=True, override=[])); \
	cli.cmd_evaluate(ns(workdir='/tmp/mwd_verify', output=None))"
