"""Physical data layout: hive-partitioned writes (plan-time partition
pruning) and z-order clustering (multi-column row-group skipping).
These are write-time choices whose value shows at read time, so every
test asserts on the READ side: the scan plan's PartitionFilters, or
the parquet footer min/max statistics the skipping works from."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.sources.maintenance import (
    parquet_file_count,
    write_partitioned,
    write_zordered,
    zorder_key,
)
from arc_kinesis_tagging_spark.sources.tables import load_table


def _zmodel(vals, bits):
    """Reference Morton interleave: bit i of column j -> bit i*n+j."""
    out = 0
    n = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_key_matches_model(spark):
    rows = [(3, 5), (0, 0), (65535, 65535), (1, 2), (32768, 1)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder_key(["a", "b"], bits=16)
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    for a, b in rows:
        assert got[(a, b)] == _zmodel([a, b], 16), (a, b)


def _file_stats_area(path, col_x, col_y):
    """Sum over parquet files of the min/max bounding-box area for the
    two columns — the quantity row-group/file skipping depends on.
    Smaller total area = tighter per-file ranges = more skipping."""
    import os

    area = 0.0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, f))
            mins = {}
            maxs = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in (col_x, col_y) and col.statistics is not None:
                        s = col.statistics
                        mins[name] = min(mins.get(name, s.min), s.min)
                        maxs[name] = max(maxs.get(name, s.max), s.max)
            if col_x in mins and col_y in mins:
                area += (maxs[col_x] - mins[col_x]) * (maxs[col_y] - mins[col_y])
    return area


def test_zorder_layout_tightens_file_stats(spark, sf_dir, tmp_path):
    """Z-ordered layout must give a strictly smaller summed per-file
    (l_partkey x l_suppkey) bounding box than the natural layout —
    the property that makes two-dimensional predicates skip files."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    li.repartition(8).write.parquet(plain)
    write_zordered(li, zord, ["l_partkey", "l_suppkey"], bits=12, n_files=8)
    # row-preserving
    assert spark.read.parquet(zord).count() == li.count()
    a_plain = _file_stats_area(plain, "l_partkey", "l_suppkey")
    a_z = _file_stats_area(zord, "l_partkey", "l_suppkey")
    assert a_z < a_plain * 0.7, (a_z, a_plain)


def test_partitioned_write_prunes_at_plan_time(spark, sf_dir, tmp_path):
    """A filter on the partition column must land in the scan node's
    PartitionFilters (plan-time directory pruning), not a row filter."""
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, "events", sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    write_partitioned(ev, out, ["day"])
    days = [r["day"] for r in spark.read.parquet(out).select("day").distinct().collect()]
    assert len(days) > 1  # multiple directories, else pruning is vacuous
    pick = sorted(days)[0]
    q = spark.read.parquet(out).filter(F.col("day") == pick)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the day predicate must appear among partition filters, and the
    # pruned scan must read only the one directory's rows
    import re

    pf = re.search(r"PartitionFilters: \[[^\]]*\]", plan).group(0)
    assert "day" in pf and "isnotnull" in pf.lower() or pick in pf
    exact = [r for r in q.collect()]
    assert exact and all(r["day"] == pick for r in exact)


def test_orc_partitioned_write_prunes_at_plan_time(spark, sf_dir, tmp_path):
    """The partition-pruning contract is format-independent (pruning
    happens in the file index above the format): the ORC scan must
    carry the day predicate in PartitionFilters exactly like the
    parquet test above."""
    out = str(tmp_path / "events_by_day_orc")
    ev = load_table(spark, "events", sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    write_partitioned(ev, out, ["day"], fmt="orc")
    days = [
        r["day"]
        for r in spark.read.orc(out).select("day").distinct().collect()
    ]
    assert len(days) > 1
    pick = sorted(days)[0]
    q = spark.read.orc(out).filter(F.col("day") == pick)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[[^\]]*\]", plan).group(0)
    assert "day" in pf and "isnotnull" in pf.lower() or pick in pf
    rows = q.collect()
    assert rows and all(r["day"] == pick for r in rows)


def test_orc_zorder_layout_tightens_file_stats(spark, sf_dir, tmp_path):
    """write_zordered(fmt='orc') must cluster like the parquet path:
    the summed per-file (l_partkey x l_suppkey) bounding box shrinks
    vs the natural layout. ORC stripe stats aren't exposed through
    pyarrow the way parquet row groups are, so measure the per-FILE
    bounding boxes by reading each part file individually — the same
    skipping property, one level up."""
    import glob
    import os

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    plain = str(tmp_path / "plain-orc")
    zord = str(tmp_path / "zord-orc")
    li.repartition(8).write.orc(plain)
    write_zordered(li, zord, ["l_partkey", "l_suppkey"], bits=12, n_files=8, fmt="orc")
    assert spark.read.orc(zord).count() == li.count()

    def area(path):
        total = 0.0
        for f in glob.glob(os.path.join(path, "part-*")):
            if f.endswith(".crc"):
                continue
            b = (
                spark.read.orc(f)
                .agg(
                    F.min("l_partkey"), F.max("l_partkey"),
                    F.min("l_suppkey"), F.max("l_suppkey"),
                )
                .collect()[0]
            )
            total += (b[1] - b[0]) * (b[3] - b[2])
        return total

    a_plain, a_z = area(plain), area(zord)
    assert a_z < a_plain * 0.7, (a_z, a_plain)
