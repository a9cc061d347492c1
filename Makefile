# Developer entry points (see README.md; driver contract in __spark_entry__.py)

.PHONY: test bench bench-small scaling pyfiles smoke

test:
	python -m pytest tests/ -q

bench:            ## headline paths at sf0.1 on local[32] (one JSON line)
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py

bench-small:      ## fast iteration loop at sf0.01
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py

scaling:          ## 1 vs 4 executor-JVM fleets -> BENCH/BASELINE.md
	python scripts/scaling_bench.py 1600000 2 1,4

pyfiles:          ## build dist/mario_spark.zip for spark-submit --py-files
	bash scripts/make_pyfiles.sh

smoke:            ## driver-contract smoke: flagship query over sf0.001
	python -c "import sys; sys.path.insert(0, '.'); \
	import __spark_entry__ as e; \
	from mario_spark.session import get_spark; \
	s = get_spark('smoke', master='local[8]', shuffle_partitions=8); \
	df = e.entry(s); print(df.count(), 'rows,', len(e.queries()), 'queries')"

bench-sf1:        ## 10x stretch point (generates .localdata/sf1 on first run)
	python scripts/bench_sf1.py
