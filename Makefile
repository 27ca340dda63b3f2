# Developer entrypoints (counterpart of the reference's Makefile/noxfile).
PORT ?= 5000
IMAGE_NAME ?= dial-rag-tpu
PYTHON ?= python
DOCKER ?= docker
ARGS ?=

.PHONY: all serve demo test test-fast ci docs bench eval eval-alps eval-training dryrun digest docker_build docker_serve help

all: test

serve:
	PORT=$(PORT) $(PYTHON) -m dial_rag_tpu.main

# end-to-end local demo: scripted core + real pipeline, one RAG request
demo:
	JAX_PLATFORMS=cpu $(PYTHON) -m tools.demo

test:
	$(PYTHON) -m pytest tests/ -x -q $(ARGS)

test-fast:
	$(PYTHON) -m pytest tests/ -x -q -m "not slow" $(ARGS)

# local mirror of .github/workflows/pr.yml (syntax check + full suite +
# multichip dryrun); ruff runs in CI where pip is available
ci:
	$(PYTHON) -m compileall -q dial_rag_tpu tests eval tools bench.py __graft_entry__.py
	$(PYTHON) -m pytest tests/ -q
	$(MAKE) dryrun

# regenerate docs/*.generated.schema.json after public-model changes
# (tests/test_docs_schemas.py fails on drift)
docs:
	$(PYTHON) -m tools.generate_docs

# headline benchmark on the real TPU: prints ONE JSON line
bench:
	$(PYTHON) bench.py

# synthetic-corpus retrieval eval (recall/MRR/p50; BM25 recall@1 = 1.0)
eval:
	JAX_PLATFORMS=cpu $(PYTHON) -m eval.eval_retriever --pages 20

# the reference's real corpus: alps_wiki.pdf vs the ground-truth parquet
eval-alps:
	JAX_PLATFORMS=cpu $(PYTHON) -m eval.eval_alps

# closed-loop training eval: fine-tune the encoder, measure held-out recall
eval-training:
	JAX_PLATFORMS=cpu $(PYTHON) -m eval.eval_training
	JAX_PLATFORMS=cpu $(PYTHON) -m eval.eval_training --objective maxsim

# 8-device virtual-mesh dryrun of the full multi-chip path
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  $(PYTHON) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

digest:
	$(PYTHON) -m tools.collect_repository_digest $(ARGS)

docker_build:
	$(DOCKER) build --platform linux/amd64 -t $(IMAGE_NAME) .

docker_serve: docker_build
	$(DOCKER) run --privileged --platform linux/amd64 --rm -p $(PORT):5000 $(IMAGE_NAME)

help:
	@grep -E '^[a-z_-]+:' Makefile | cut -d: -f1 | sort -u

checkpoint:  ## mint the first-party encoder checkpoints (TPU ~25-50 min per stage)
	python -m tools.make_checkpoint --out checkpoints/alps-cls-kd \
		--objective cls --steps 3000 --batch-size 64 --kd-weight 0.7
	# MaxSim trunk: 25k from scratch + two 25k warm-started continuations
	# (75k total — measured best; a fourth stage overtrains: real-corpus
	# ensemble recall@7 0.974 -> 0.897), then the idf pooling table that
	# serves the same trunk single-vector on the semantic arm
	python -m tools.make_checkpoint --out checkpoints/alps-maxsim \
		--objective maxsim --steps 25000 --batch-size 16 --seq-len 192 \
		--kd-weight 1.0 --teacher-temperature 2.0
	python -m tools.make_checkpoint --out checkpoints/alps-maxsim \
		--objective maxsim --steps 25000 --batch-size 16 --seq-len 192 \
		--kd-weight 1.0 --teacher-temperature 2.0 \
		--init-from checkpoints/alps-maxsim
	python -m tools.make_checkpoint --out checkpoints/alps-maxsim \
		--objective maxsim --steps 25000 --batch-size 16 --seq-len 192 \
		--kd-weight 1.0 --teacher-temperature 2.0 \
		--init-from checkpoints/alps-maxsim
	python -m tools.make_idf_pooling --model-dir checkpoints/alps-maxsim
	# semantic-arm trunk: a 4th stage at 3x lower LR trades ~2 points of
	# MaxSim recall for +5 points of idf-pooled single-vector recall
	# (0.821 -> 0.872 recall@7); serving mounts it on embedder.model_path
	# while late_interaction_index.model_path keeps the 75k trunk
	python -m tools.make_checkpoint --out checkpoints/alps-semantic \
		--objective maxsim --steps 25000 --batch-size 16 --seq-len 192 \
		--kd-weight 1.0 --teacher-temperature 2.0 --learning-rate 3e-5 \
		--init-from checkpoints/alps-maxsim
	python -m tools.make_idf_pooling --model-dir checkpoints/alps-semantic
