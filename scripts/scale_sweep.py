#!/usr/bin/env python
"""100x row-scaling sweep: time named queries at two scale factors
(min-of-2, local[32], clean session) and print a SCALE.md-ready table.

    python scripts/scale_sweep.py q_cms_freq q_record_linkage ...

Default window is sf0.001 -> sf0.1. Override either endpoint to run a
decade-shifted window (e.g. the round-13 sf0.01 -> sf1 sweep over the
locally generated sf1 from scripts/gen_sf1.py):

    SWEEP_LO=/root/testdata/sf0.01 SWEEP_HI=/root/repo/localdata/sf1 \
        python scripts/scale_sweep.py q_char_lid ...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: scale_sweep.py q_name [q_name ...]", file=sys.stderr)
        return 2
    from mysql_cdc_to_http_spark.session import get_spark
    from mysql_cdc_to_http_spark.queries import all_queries

    spark = get_spark(app_name="scale-sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    def run(name: str, sf: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    lo = os.environ.get("SWEEP_LO", "/root/testdata/sf0.001")
    hi = os.environ.get("SWEEP_HI", "/root/testdata/sf0.1")
    rows = []
    for n in names:
        a = run(n, lo)
        b = run(n, hi)
        rows.append((n, a, b, b / a))
        print(f"| {n} | {a:.2f} | {b:.2f} | {b/a:.2f} |", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
