"""Capture .explain("formatted") for benched queries into plans/<round>/
(round via $PLANS_ROUND, default r15).

Usage:
    python scripts/capture_plans.py before [name ...]
    python scripts/capture_plans.py after  [name ...]
    python scripts/capture_plans.py <suffix> --executed [name ...]

With no names, captures every bench=True query. Plans are built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Default mode is
plan-only (nothing executes — safe next to other jobs) and shows the
INITIAL adaptive plan; --executed runs each query through the noop sink
first and captures the FINAL AQE plan (isFinalPlan=true), which is where
runtime join-strategy changes (SMJ -> SHJ/BHJ re-planning on real sizes)
become visible.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from h2outility_spark import workload  # noqa: E402
from h2outility_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    executed = "--executed" in sys.argv[2:]
    names = [a for a in sys.argv[2:] if a != "--executed"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "plans",
        os.environ.get("PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("h2outility-plans")
    reg = workload.registry()
    if not names:
        names = [n for n, s in reg.items() if s.bench]
    for name in names:
        spec = reg.get(name)
        if spec is None:
            print(f"SKIP unknown query {name}")
            continue
        try:
            spark.catalog.clearCache()
            df = spec.fn(spark, sf_dir)
            if executed:
                df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
