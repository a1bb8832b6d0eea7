# Engine pre-flight targets. `make verify` is the full gate the round-5
# VERDICT asked for: it chains the driver-window simulation, the
# all-queries sweep, and the config-robustness pass (codegen + AQE off)
# under an adversarial session config, then checks the bench contract
# still prints exactly one JSON line. Each stage runs in a fresh process
# (fresh JVM) like the real harness.

PY ?= python
SF ?= /root/testdata/sf0.01

.PHONY: test verify verify-window verify-all verify-robust verify-ext verify-bench

test:
	$(PY) -m pytest tests/ -x -q

verify-window:
	SPARK_GRAFT_SF_DIR=$(SF) $(PY) scripts/verify_sweep.py window

verify-all:
	SPARK_GRAFT_SF_DIR=$(SF) $(PY) scripts/verify_sweep.py all

verify-robust:
	SPARK_GRAFT_SF_DIR=$(SF) $(PY) scripts/verify_sweep.py robust

verify-ext:
	SPARK_GRAFT_SF_DIR=$(SF) $(PY) scripts/verify_sweep.py ext

verify-bench:
	@SPARK_GRAFT_SF_DIR=$(SF) SPARK_GRAFT_STREAM=0 $(PY) bench.py >/tmp/bench_combined.out 2>&1; \
	$(PY) -c "import sys; tail=open('/tmp/bench_combined.out','rb').read()[-2000:].decode('utf-8','replace'); bad=[m for m in ('Traceback','at py4j','py4j.protocol','ERROR ') if m in tail]; assert tail.rstrip().endswith('}'), 'JSON line is not the LAST thing in the tail window'; sys.exit(('driver tail window polluted: %s' % bad) if bad else 0)" || exit 1; \
	out=$$(grep -o '{"metric".*' /tmp/bench_combined.out); \
	n=$$(printf '%s\n' "$$out" | grep -c '^{'); \
	if [ "$$n" != "1" ]; then \
	  echo "bench.py must print exactly ONE JSON line (got $$n)"; exit 1; \
	fi; \
	printf '%s\n' "$$out" | $(PY) -c "import json,sys; line=sys.stdin.read().strip(); assert len(line) <= 2000, ('line exceeds driver tail window', len(line)); d=json.loads(line); assert d['metric']=='headline_suite_sec' and 'queries' in d; full=json.load(open('BENCH_FULL.json')); assert d['n_queries']==len(full['queries']), 'full-file drift'; print('bench contract ok:', d['value'], 'sec, line', len(line), 'chars,', d['n_queries'], 'queries (', d['queries_shown'], 'on line, full in BENCH_FULL.json)')"

verify: verify-window verify-all verify-robust verify-ext verify-bench
	@echo "verify: all sweeps green"
