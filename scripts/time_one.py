#!/usr/bin/env python
"""Time one or more registry queries at a given sf dir (default sf0.1).

Usage: python scripts/time_one.py q_kcore_peel [q_other ...] [--sf DIR] [--passes N]
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
args = [a for a in sys.argv[1:]]
sf_dir = "/root/testdata/sf0.1"
passes = 3
names = []
i = 0
while i < len(args):
    a = args[i]
    if a == "--sf": sf_dir = args[i+1]; i += 2
    elif a == "--passes": passes = int(args[i+1]); i += 2
    else: names.append(a); i += 1
os.environ.setdefault("PYTHONWARNINGS", "ignore")
from mysql_cdc_to_http_spark.session import get_spark
from mysql_cdc_to_http_spark.queries import all_queries
spark = get_spark(app_name="time_one", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("FATAL")
reg = all_queries()
# warm
reg["q_agg_q1"](spark, sf_dir).write.mode("overwrite").format("noop").save()
for name in names:
    fn = reg[name]
    samples = []
    for _ in range(passes):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples.append(round(time.perf_counter() - t0, 3))
    print(name, samples)
