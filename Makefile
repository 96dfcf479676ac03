# Dev tooling (parity with the reference's Makefile targets:
# lint / test / coverage / bench / bench-compare / profile).
# No fmt target: this image carries no Python formatter (black/ruff);
# style is enforced by tools/lint.py rules instead.

PY ?= python

.PHONY: all check lint test coverage bench bench-single bench-save \
        bench-compare profile native gen conformance clean

all: check

check: lint test

lint:
	$(PY) -m compileall -q go_mp3_tpu tests tools
	$(PY) tools/lint.py
	g++ -std=c++17 -Wall -Wextra -Werror -fsyntax-only \
	    go_mp3_tpu/native/mp3parse.cpp go_mp3_tpu/native/mp3dsp.cpp
	$(PY) -c "import go_mp3_tpu"

test:
	$(PY) -m pytest tests/ -x -q

coverage:
	$(PY) -m pytest tests/ -q --cov=go_mp3_tpu --cov-report=term 2>/dev/null || \
	$(PY) -m pytest tests/ -q

native:
	sh tools/build_native.sh

gen:
	$(PY) tools/gen_huffman.py
	$(PY) tools/gen_dtbl.py
	$(PY) tools/gen_huffman_cpp.py

bench:
	$(PY) bench.py

# the reference's own harness metric (bench_test.go): MB/s of compressed
# input, single stream, per backend
bench-single:
	JAX_PLATFORMS=cpu $(PY) tools/bench_single.py

# benchstat-like baseline workflow
bench-save:
	$(PY) bench.py > benchmarks/baseline.json
	@cat benchmarks/baseline.json

bench-compare:
	$(PY) tools/bench_compare.py benchmarks/baseline.json

profile:
	$(PY) tools/profile_decode.py

# self-contained oracle-verification artifact (conformance/): PCM SHA-256s
# + pairwise ISO metrics for all three backends + the exact mpg123
# invocations for an oracle-equipped machine
conformance:
	$(PY) tools/conformance.py

clean:
	rm -rf go_mp3_tpu/native/libmp3parse.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
