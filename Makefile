.PHONY: test test-all lint bench dryrun native

# Fast tier: excludes @pytest.mark.slow (full-size parity twins, fuzz sweeps,
# multi-process DCN tests, zoo-breadth family modules). Measured 2026-08-19 on
# one CPU core: `make test` 8m27s (409 passed), `make test-all` 55m37s
# (660 passed, 6 skipped). Latest green tails live in docs/TESTING.md.
test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

test-cov:
	python tools/coverage.py --min 85 tests/ -q

lint:
	@if command -v ruff >/dev/null 2>&1; then \
		ruff check semanticlens_tpu tools tests; \
	fi
	python tools/lint.py

bench:
	python bench.py

dryrun:
	python __graft_entry__.py

native:
	mkdir -p native/build
	$(or $(CXX),g++) -O3 -march=native -shared -fPIC -o native/build/libsldecode.so native/decoder.cpp -ljpeg -lpthread
