"""Standalone host-health probe (VERDICT r6 #2).

Runs bench.host_probe — the same three fixed-cost workloads every bench
record embeds in extra.host_probe — without the headline query set, so a
window's health can be measured in ~15 s before deciding to run (or how to
read) a full bench. Prints one JSON line. Calibration values live in
BASELINE.md "Host-health probe calibration".
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import host_probe  # noqa: E402  (bench.py at repo root)
from pitfeat.session import get_spark  # noqa: E402


def main():
    spark = get_spark("host-probe", master="local[32]")
    # warm the JVM/scheduler so the shuffle leg measures steady state, not
    # first-job class loading
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(json.dumps(host_probe(spark)))


if __name__ == "__main__":
    main()
