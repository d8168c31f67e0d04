"""Time a subset of registered queries with bench.py's exact methodology
(noop sink, clearCache before every attempt, min-of-N samples).

Usage: python scripts/time_queries.py [-n N] name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from h2outility_spark import workload  # noqa: E402
from h2outility_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("h2outility-time-subset")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for _wt in ("lineitem", "events", "documents", "embeddings"):
        try:
            workload._t(spark, sf_dir, _wt).selectExpr("count(*)").collect()
        except Exception:  # noqa: BLE001
            pass
    reg = workload.registry()
    out = {}
    for name in args:
        spec = reg[name]
        samples = []
        for _ in range(n):
            spark.catalog.clearCache()
            df = spec.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
