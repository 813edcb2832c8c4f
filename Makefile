.PHONY: test lint bench dryrun

test:
	python -m pytest tests/ -q

lint:
	ruff check semanticlens_tpu tests

bench:
	python bench.py

dryrun:
	python __graft_entry__.py
