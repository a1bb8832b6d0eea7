#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/<tag>/.

Usage: python scripts/dump_plan.py --tag r16 --suffix before q_kcore_peel [q_other ...]
       python scripts/dump_plan.py --tag r16 --suffix after  q_kcore_peel
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

args = sys.argv[1:]
tag, suffix, sf_dir, names = "r16", "before", "/root/testdata/sf0.1", []
i = 0
while i < len(args):
    a = args[i]
    if a == "--tag":
        tag = args[i + 1]
        i += 2
    elif a == "--suffix":
        suffix = args[i + 1]
        i += 2
    elif a == "--sf":
        sf_dir = args[i + 1]
        i += 2
    else:
        names.append(a)
        i += 1

os.environ.setdefault("PYTHONWARNINGS", "ignore")
from mysql_cdc_to_http_spark.session import get_spark
from mysql_cdc_to_http_spark.queries import all_queries

spark = get_spark(
    app_name="dump_plan",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("FATAL")
reg = all_queries()
out_dir = os.path.join(REPO, "plans", tag)
os.makedirs(out_dir, exist_ok=True)
for name in names:
    df = reg[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
