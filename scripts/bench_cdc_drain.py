"""Micro-benchmark: TxTable CDC drain throughput, Arrow RecordBatch data
plane (current) vs the pre-round-13 per-row-tuple plane (reconstructed here
as a subclassed source so the comparison runs on one tree).

Usage: python scripts/bench_cdc_drain.py [n_rows]

Builds a TxTable of N rows (one append), drains it once through
``txtable_cdc`` (Arrow batches) and once through a tuple-yielding clone of
the old reader, and prints rows/s for each plus the speedup.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from h2outility_spark.session import get_spark
from h2outility_spark.sources.txtable_source import TxTableCdcDataSource, _TxCdcReader
from h2outility_spark.storage_tx import TxTable


class _TupleCdcReader(_TxCdcReader):
    """The pre-round-13 data plane: per-row Python tuples via to_pylist."""

    def read(self, partition):  # noqa: D102 — benchmark-only reconstruction
        import pyarrow.parquet as pq

        present = set(pq.read_schema(partition.abs_path).names)
        want = [c for c in self.data_field_names if c in present]
        tbl = pq.read_table(partition.abs_path, columns=want)
        n = tbl.num_rows
        by_name = {c: tbl.column(c).to_pylist() for c in want}
        cols = [by_name.get(c, [None] * n) for c in self.data_field_names]
        meta = ([partition.version] * n, [partition.sign] * n)
        return iter(zip(*cols, *meta))


class TupleCdcDataSource(TxTableCdcDataSource):
    @classmethod
    def name(cls) -> str:
        return "txtable_cdc_tuples"

    def streamReader(self, schema):
        from pyspark.sql.pandas.types import to_arrow_schema

        data = [f.name for f in schema.fields if f.name not in ("_commit_version", "_sign")]
        return _TupleCdcReader(self.options["path"], data, to_arrow_schema(schema))


def drain(spark, fmt: str, tdir: str, tag: str) -> float:
    with tempfile.TemporaryDirectory() as ck:
        t0 = time.perf_counter()
        q = (
            spark.readStream.format(fmt).option("path", tdir).load()
            .writeStream.format("noop").option("checkpointLocation", ck)
            .queryName(tag).start()
        )
        q.processAllAvailable()
        q.stop()
        return time.perf_counter() - t0


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("bench-cdc-drain", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(TxTableCdcDataSource)
    spark.dataSource.register(TupleCdcDataSource)

    with tempfile.TemporaryDirectory() as root:
        tdir = os.path.join(root, "t")
        table = TxTable(spark, tdir, key_cols=["k"])
        df = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 1000).cast("int").alias("grp"),
                (F.col("id") * 1.5).alias("val"),
                F.concat(F.lit("payload_"), F.col("id")).alias("s"),
            )
            .repartition(16)
        )
        table.append(df)

        # warm both paths once (JVM/python-worker startup), then measure
        drain(spark, "txtable_cdc", tdir, "warm_arrow")
        drain(spark, "txtable_cdc_tuples", tdir, "warm_tuples")
        t_arrow = drain(spark, "txtable_cdc", tdir, "bench_arrow")
        t_tuples = drain(spark, "txtable_cdc_tuples", tdir, "bench_tuples")

    print(
        f"rows={n_rows}  arrow={t_arrow:.2f}s ({n_rows/t_arrow/1e6:.2f} M rows/s)  "
        f"tuples={t_tuples:.2f}s ({n_rows/t_tuples/1e6:.2f} M rows/s)  "
        f"speedup={t_tuples/t_arrow:.2f}x"
    )


if __name__ == "__main__":
    main()
