#!/usr/bin/env python
"""Whole-registry plan profile: structural metrics per query, no execution.

For every registered query, constructs the DataFrame at $SPARK_GRAFT_SF_DIR
(default sf0.1) and records plan-shape metrics from explain("formatted") +
the optimized logical plan:

  exchanges        — # Exchange nodes (shuffles; ReusedExchange not counted)
  reused_exchanges — # ReusedExchange nodes (shared shuffles)
  bhj / smj / shj  — join strategy counts
  py_eval          — BatchEvalPython / ArrowEvalPython / MapInPandas /
                     PythonMapInArrow node count (the JVM<->Python boundary)
  scans            — # parquet scans; scans_nofilter — scans with no
                     PushedFilters entry
  inmem            — InMemoryRelation in the optimized plan (persist use)
  sorts            — global Sort nodes (Exchange rangepartitioning)
  construct_sec    — wall time of fn(spark, sf_dir) (driver work + any
                     model-sized collects during construction)

Output: one JSON line per query to plans/plan_profile.jsonl (or --out).
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONWARNINGS", "ignore")

out_path = os.path.join(REPO, "plans", "plan_profile.jsonl")
names_filter = []
args = sys.argv[1:]
i = 0
while i < len(args):
    if args[i] == "--out":
        out_path = args[i + 1]
        i += 2
    else:
        names_filter.append(args[i])
        i += 1

from mysql_cdc_to_http_spark.session import get_spark
from mysql_cdc_to_http_spark.queries import all_queries
from mysql_cdc_to_http_spark.operators.caching import release_all_cached

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="plan_profile",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("FATAL")
reg = all_queries()
names = names_filter or list(reg)

fh = open(out_path, "w")
for name in names:
    rec: dict = {"name": name}
    t0 = time.perf_counter()
    try:
        df = reg[name](spark, sf_dir)
        rec["construct_sec"] = round(time.perf_counter() - t0, 3)
        qe = df._jdf.queryExecution()
        plan = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
        opt = qe.optimizedPlan().toString()
        # shuffle_exchanges: numbered "(n) Exchange" operator nodes only
        # (shuffles); exchange_nodes: every textual Exchange mention,
        # including reused/broadcast references (r16 ADVICE: the two
        # metrics are deliberately different — named to say how).
        rec["shuffle_exchanges"] = len(
            re.findall(r"^\s*[+:]?[- ]*\(\d+\) Exchange", plan, re.M)
        )
        rec["exchanges"] = rec["shuffle_exchanges"]  # back-compat key
        rec["exchange_nodes"] = plan.count(") Exchange")
        rec["reused_exchanges"] = plan.count("ReusedExchange")
        rec["bhj"] = plan.count("BroadcastHashJoin")
        rec["bnlj"] = plan.count("BroadcastNestedLoopJoin")
        rec["smj"] = plan.count("SortMergeJoin")
        rec["shj"] = plan.count("ShuffledHashJoin")
        rec["py_eval"] = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("PythonMapInArrow")
            + plan.count("MapInArrow")
        )
        scans = re.findall(r"\(\d+\) Scan parquet[^\n]*", plan)
        rec["scans"] = len(scans)
        # scans with an empty PushedFilters: [] block
        rec["scans_nofilter"] = plan.count("PushedFilters: []")
        rec["inmem"] = "InMemoryRelation" in opt
        rec["range_part"] = plan.count("rangepartitioning")
        rec["rows_est"] = None
    except Exception as exc:  # record, keep sweeping
        rec["error"] = f"{type(exc).__name__}: {exc}"[:200]
    release_all_cached()
    fh.write(json.dumps(rec) + "\n")
    fh.flush()
    print(name, rec.get("construct_sec"), "ex:", rec.get("exchange_nodes"), flush=True)
fh.close()
print("wrote", out_path)
