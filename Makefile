.PHONY: test test-all lint bench dryrun native

# Fast tier: excludes @pytest.mark.slow (full-size parity twins, fuzz sweeps,
# multi-process DCN tests, zoo-breadth family modules). Timings and pass
# counts move every round — the authoritative green tails (with the commit
# each was taken at) live in docs/TESTING.md; roughly fast ~9 min, full ~56 min
# on one CPU core.
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
