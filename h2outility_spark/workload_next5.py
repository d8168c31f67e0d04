"""Round-10 registry staging area (same lifecycle as ``workload_next`` →
``workload_next4``): fully-formed (PySpark fn, DuckDB oracle) pairs that
cannot enter the registry yet — the round-9 rotation will consume the
twelve ``workload_next4`` pairs first. Deliberately NOT decorated with
``@query``; a future rotation wraps them.

Each pair is parity-tested in ``tests/test_workload_next.py`` (STAGED5)
under the driver's comparison discipline at sf0.001 AND sf0.01.

Coverage targets:
  * ``oplist_replay`` — the §2.12 record/replay surface under a driver
    hash for the first time: a four-op QC plan is SAVED to JSON, loaded
    back off disk, compiled onto the DataValues frame by
    ``plans.oplist.apply_plan`` (threshold selection → composed
    value-change selection → arithmetic update → flag), and the edited
    frame is returned. The oracle restates the composed plan as one SQL
    expression — a drift in any op's semantics, the compose rule, or the
    JSON round-trip flips the hash. (Reference: the recorded-script
    mechanism ``record_service.py:14-176`` + JSON job specs
    ``Common.py:46-58``.)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from h2outility_spark.plans import oplist
from h2outility_spark.workload import DV_CTE, _dv, fround
from h2outility_spark.workload_lakehouse import scratch_dir

# -- §2.12 op-list record/replay under a driver hash ---------------------------

#: The recorded plan: select values > 60, AND-compose with |Δ|>=40 spikes,
#: subtract the 1.5 calibration bias from the selection, flag it.
OPLIST_PLAN = [
    {"op": "select_value_threshold", "args": {"op": ">", "threshold": 60.0}},
    {
        "op": "select_value_change",
        "args": {"threshold": 40.0, "compose": True, "tiebreak": "ValueID"},
    },
    {"op": "change_value", "args": {"op": "-", "operand": 1.5}},
    {"op": "flag_selected", "args": {"qualifier_id": 9}},
]

OPLIST_REPLAY_ORACLE = (
    DV_CTE
    + """,
w AS (
  SELECT ValueID, DataValue, QualifierID,
         abs(DataValue - lead(DataValue) OVER win) AS dn,
         abs(DataValue - lag(DataValue) OVER win) AS dp
  FROM dv
  WINDOW win AS (PARTITION BY SiteID, VariableCode ORDER BY LocalDateTime, ValueID)
),
sel AS (
  SELECT ValueID, DataValue, QualifierID,
         (DataValue > 60.0) AND coalesce(dn >= 40.0 OR dp >= 40.0, FALSE) AS selected
  FROM w
)
SELECT ValueID,
       floor((CASE WHEN selected THEN DataValue - 1.5 ELSE DataValue END) * 100.0 + 0.5) / 100.0
         AS data_value,
       CASE WHEN selected THEN 9 ELSE QualifierID END AS qualifier_id,
       selected
FROM sel
"""
)


def q_oplist_replay(spark, sf_dir):
    """Record → persist → load → replay: the op-list is SAVED as JSON and
    read back before compiling, so the serialization format rides the
    hash along with every op's semantics and the AND-compose rule.
    Catalyst sees the whole composed plan as one lineage (recording costs
    nothing); the only shuffle is the per-series window the spike
    selection needs."""
    path = os.path.join(scratch_dir("h2ou_oplist_"), "plan.json")
    oplist.save_plan(OPLIST_PLAN, path)
    plan = oplist.load_plan(path)

    dv = _dv(spark, sf_dir)
    edited = oplist.apply_plan(dv, plan, keys=["SiteID", "VariableCode"])
    return edited.select(
        "ValueID",
        fround(F.col("DataValue"), 2).alias("data_value"),
        F.col("QualifierID").alias("qualifier_id"),
        F.col("selected"),
    )


#: name -> (fn, oracle) for a future promotion pass and the parity test.
STAGED5 = {
    "oplist_replay": (q_oplist_replay, OPLIST_REPLAY_ORACLE),
}
