"""Capture .explain("formatted") for benched queries into plans/r14/.

Usage:
    python scripts/capture_plans.py before [name ...]
    python scripts/capture_plans.py after  [name ...]

With no names, captures every bench=True query. Plans are built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — plan-only, nothing is
executed, so this is safe to run next to other jobs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from h2outility_spark import workload  # noqa: E402
from h2outility_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r14")
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
            df = spec.fn(spark, sf_dir)
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
