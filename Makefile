# Packaging + verification entry points.
# `make dist` produces the --py-files artifact for spark-submit (the
# cmd/builder analog: one deployable bundle of the whole engine).

DIST := dist
PKG  := opentelemetry_collector_spark

.PHONY: dist test selfcheck bench clean

dist:
	mkdir -p $(DIST)
	rm -f $(DIST)/$(PKG).zip
	zip -qr $(DIST)/$(PKG).zip $(PKG) -x '*__pycache__*'
	cp submit_pipeline.py $(DIST)/
	@echo "spark-submit --py-files $(DIST)/$(PKG).zip $(DIST)/submit_pipeline.py <pages_dir> <out_root>"

test:
	python -m pytest tests/ -x -q

selfcheck:
	python tools/selfcheck.py /root/testdata/sf0.01

bench:
	python bench.py

clean:
	rm -rf $(DIST) .bench_cache
