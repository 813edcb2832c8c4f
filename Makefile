.PHONY: test test-all lint bench dryrun native

# Fast tier: excludes @pytest.mark.slow (full-size parity twins, fuzz sweeps,
# multi-process DCN tests). Measured runtimes + latest full-suite green tail
# live in docs/TESTING.md.
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
