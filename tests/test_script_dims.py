"""Record-service script emission (plans.oplist.emit_script) and the typed
dimension get-or-create helpers (M4)."""

from __future__ import annotations

from datetime import datetime, timedelta

from h2outility_spark.operators import mutation
from h2outility_spark.plans import oplist

T0 = datetime(2024, 1, 1)

DV_SCHEMA = (
    "ValueID long, SiteID int, VariableID int, MethodID int, SourceID int, "
    "QualityControlLevelID int, LocalDateTime timestamp, DataValue double, QualifierID int"
)
KEYS = ["SiteID", "VariableID", "MethodID", "SourceID", "QualityControlLevelID"]

PLAN = [
    {"op": "select_value_threshold", "args": {"op": ">", "threshold": 100.0}},
    {"op": "change_value", "args": {"op": "-", "operand": 250.0}},
    {"op": "flag_selected", "args": {"qualifier_id": 4}},
]


def _dv(spark):
    rows = [
        (i, 1, 7, 1, 1, 0, T0 + timedelta(hours=i), v, None)
        for i, v in enumerate([10.0, 300.0, 310.0, 12.0])
    ]
    return spark.createDataFrame(rows, DV_SCHEMA)


def test_emitted_script_replays_identically(spark):
    df = _dv(spark)
    via_plan = {r["ValueID"]: (r["DataValue"], r["QualifierID"]) for r in oplist.apply_plan(df, PLAN, KEYS).collect()}

    script = oplist.emit_script(PLAN, KEYS)
    ns: dict = {}
    exec(compile(script, "<replay>", "exec"), ns)
    via_script = {r["ValueID"]: (r["DataValue"], r["QualifierID"]) for r in ns["replay"](df).collect()}

    assert via_script == via_plan
    assert via_plan[1] == (50.0, 4) and via_plan[0] == (10.0, None)


def test_emit_script_rejects_unknown_op():
    import pytest

    with pytest.raises(ValueError):
        oplist.emit_script([{"op": "drop_table"}], KEYS)


def test_create_dim_get_or_create(spark):
    methods = spark.createDataFrame(
        [(1, "grab sample", None)], "MethodID int, MethodDescription string, MethodLink string"
    )
    m2, mid = mutation.create_method(methods, "sensor reading")
    assert mid == 2 and m2.count() == 2

    # same code -> existing id, no new row
    m3, mid_again = mutation.create_method(m2, "sensor reading")
    assert mid_again == 2 and m3.count() == 2

    quals = spark.createDataFrame([(1, "e", "estimated")], "QualifierID int, QualifierCode string, QualifierDescription string")
    q2, qid = mutation.create_qualifier(quals, "s", "suspect")
    assert qid == 2 and q2.filter("QualifierCode = 's'").count() == 1

    qcls = spark.createDataFrame(
        [(0, "0", "raw", None)],
        "QualityControlLevelID int, QualityControlLevelCode string, Definition string, Explanation string",
    )
    qc2, qcid = mutation.create_quality_control_level(qcls, "1", "qc'd")
    assert qcid == 1 and qc2.count() == 2

    vars_df = spark.createDataFrame(
        [(7, "temp", -9999.0)], "VariableID int, VariableCode string, NoDataValue double"
    )
    v2, vid = mutation.create_variable(vars_df, {"VariableCode": "ph", "NoDataValue": -9999.0})
    assert vid == 8 and v2.filter("VariableCode = 'ph'").count() == 1


def test_create_dim_on_empty_dim(spark):
    empty = spark.createDataFrame([], "MethodID int, MethodDescription string, MethodLink string")
    m, mid = mutation.create_method(empty, "first method")
    assert mid == 1 and m.count() == 1
