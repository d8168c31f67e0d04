"""Replay idempotence of the foreachBatch state handlers (VERDICT r10 #1).

Structured Streaming's foreachBatch contract is AT-LEAST-ONCE: after a
checkpoint/commit race a batch can be re-delivered with the SAME batch_id.
The two staged handlers that maintain state outside the checkpoint —
the Count-Min grid advance and the late-data quarantine router — must
therefore be idempotent per batch_id. These tests drive the module-level
handler factories directly: apply batch 0 and 1, snapshot the state,
re-invoke with a repeated batch_id, and assert the state is bit-identical.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from h2outility_spark.workload_next7 import (
    make_cms_handler,
    make_quarantine_handler,
)

SF_DIR = "/root/testdata/sf0.001"


def _grid_rows(spark, path):
    return sorted(
        (r["j"], r["bucket"], r["c"]) for r in spark.read.parquet(path).collect()
    )


def test_cms_grid_unchanged_by_replayed_batch(spark, tmp_path):
    from h2outility_spark.sources.parquet import load_table

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    ctl = {"grid_path": None, "n_batches": 0}
    handle = make_cms_handler(spark, state_dir, ctl, key_col="user_id")

    ev = load_table(spark, SF_DIR, "events").select("user_id")
    b0 = ev.filter(F.col("user_id") % 3 != 0)
    b1 = ev.filter(F.col("user_id") % 3 == 0)

    handle(b0, 0)
    handle(b1, 1)
    assert ctl["n_batches"] == 2
    after_two = _grid_rows(spark, ctl["grid_path"])
    assert after_two, "grid must be non-empty"

    # the replay: same batch_id, same rows, re-delivered
    handle(b1, 1)
    assert ctl["n_batches"] == 2, "replayed batch must not advance the counter"
    assert _grid_rows(spark, ctl["grid_path"]) == after_two, (
        "replayed batch must not double-count into the grid"
    )
    # and a replay of the EARLIER batch (late re-delivery) is also a no-op
    handle(b0, 0)
    assert ctl["n_batches"] == 2
    assert _grid_rows(spark, ctl["grid_path"]) == after_two


def _routes(spark, main_dir, quar_dir, schema):
    main = spark.read.schema(schema).parquet(os.path.join(main_dir, "batch_*"))
    quar = spark.read.schema(schema).parquet(os.path.join(quar_dir, "batch_*"))
    key = lambda r: (r["event_id"],)  # noqa: E731
    return (
        sorted(map(key, main.collect())),
        sorted(map(key, quar.collect())),
    )


def test_quarantine_routes_unchanged_by_replayed_batch(spark, tmp_path):
    from h2outility_spark.sources.parquet import load_table

    main_dir = str(tmp_path / "main")
    quar_dir = str(tmp_path / "quar")
    meta_dir = str(tmp_path / "meta")
    for d in (main_dir, quar_dir, meta_dir):
        os.makedirs(d)
    ctl = {"wm": None, "n_batches": 0}
    handle = make_quarantine_handler(main_dir, quar_dir, meta_dir, ctl)

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    b0 = ev.filter(F.col("user_id") % 2 == 0)
    b1 = ev.filter(F.col("user_id") % 2 != 0)

    handle(b0, 0)
    wm_after_b0 = ctl["wm"]
    assert wm_after_b0 is not None
    handle(b1, 1)
    assert ctl["n_batches"] == 2
    main_rows, quar_rows = _routes(spark, main_dir, quar_dir, b0.schema)
    total = b0.count() + b1.count()
    assert len(main_rows) + len(quar_rows) == total, "conservation: route, never drop"

    # the replay: batch 1 re-delivered AFTER the watermark advanced past it.
    # A non-idempotent handler would (a) duplicate every row and (b) reroute
    # rows as late against the newer watermark.
    handle(b1, 1)
    assert ctl["n_batches"] == 2, "replayed batch must not advance the counter"
    assert _routes(spark, main_dir, quar_dir, b0.schema) == (main_rows, quar_rows)
    handle(b0, 0)
    assert _routes(spark, main_dir, quar_dir, b0.schema) == (main_rows, quar_rows)
    assert ctl["wm"] == max(wm_after_b0, ctl["wm"]), "watermark stays monotonic"


def test_quarantine_watermark_survives_restart(spark, tmp_path):
    """A FRESH handler (new process: empty ctl) over the same meta dir
    must rehydrate the committed watermark from the markers — otherwise a
    restart routes genuinely-late stragglers as on-time against a NULL
    watermark."""
    from h2outility_spark.sources.parquet import load_table

    main_dir = str(tmp_path / "main")
    quar_dir = str(tmp_path / "quar")
    meta_dir = str(tmp_path / "meta")
    for d in (main_dir, quar_dir, meta_dir):
        os.makedirs(d)
    ctl = {"wm": None, "n_batches": 0}
    handle = make_quarantine_handler(main_dir, quar_dir, meta_dir, ctl)

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    handle(ev.filter(F.col("user_id") % 2 == 0), 0)
    wm_before = ctl["wm"]
    assert wm_before is not None

    # "restart": a brand-new handler with an empty ctl over the same dirs
    ctl2 = {"wm": None, "n_batches": 0}
    handle2 = make_quarantine_handler(main_dir, quar_dir, meta_dir, ctl2)
    assert ctl2["wm"] == wm_before, "watermark must rehydrate from the markers"

    # a batch of below-watermark stragglers routes ENTIRELY to quarantine
    old = ev.orderBy("ts").limit(5)
    assert old.agg(F.max("ts")).collect()[0][0] < wm_before  # genuinely late
    handle2(old, 1)
    quar = spark.read.schema(old.schema).parquet(os.path.join(quar_dir, "batch_1"))
    assert quar.count() == 5, "restart must not forget the watermark"
    # replay of the pre-restart batch is still a no-op
    handle2(ev.filter(F.col("user_id") % 2 == 0), 0)
    assert ctl2["n_batches"] == 1
