"""Z-order clustered write: file-level pruning measurement, plus the
runtime bloom-filter join demonstration. Both are scan-reduction
features — the 100 TB story is "read less", and these tests measure it
rather than assert it abstractly."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from sparkflow_spark.catalog import Tables
from sparkflow_spark.sources import zorder_value, zorder_write


def _file_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per output file: {col: (min, max)} from the parquet footer."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        rng = {c: [None, None] for c in cols}
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for i in range(grp.num_columns):
                col = grp.column(i)
                name = col.path_in_schema
                if name in rng and col.statistics is not None:
                    st = col.statistics
                    lo, hi = rng[name]
                    rng[name][0] = st.min if lo is None else min(lo, st.min)
                    rng[name][1] = st.max if hi is None else max(hi, st.max)
        out.append({c: tuple(v) for c, v in rng.items()})
    return out


def _frac_files_hit(ranges: list[dict], box: dict) -> float:
    hit = 0
    for rng in ranges:
        ok = True
        for c, (qlo, qhi) in box.items():
            lo, hi = rng[c]
            if lo is None or hi < qlo or lo > qhi:
                ok = False
                break
        if ok:
            hit += 1
    return hit / max(len(ranges), 1)


def test_zorder_write_prunes_both_dims(spark, sf_dir, tmp_path):
    """A box predicate on (l_partkey, l_suppkey) must touch a strictly
    smaller fraction of z-ordered files than of linearly-sorted files on
    the SECOND column of the sort (where a linear sort gives ~no
    pruning), and at most half the z-ordered files in absolute terms."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_write(li, zpath, ["l_partkey", "l_suppkey"], num_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # roundtrip integrity
    assert spark.read.parquet(zpath).count() == li.count()

    cols = ["l_partkey", "l_suppkey"]
    zr = _file_ranges(zpath, cols)
    lr = _file_ranges(lpath, cols)
    assert len(zr) >= 8 and len(lr) >= 8

    parts = [r["l_partkey"] for r in li.select("l_partkey").limit(1).collect()]
    pk = parts[0]
    # a narrow box: ±2% of the partkey span x one supplier
    stats = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    span = stats[1] - stats[0]
    box = {
        "l_partkey": (pk, min(pk + max(span // 50, 1), stats[1])),
        "l_suppkey": (stats[2], stats[2]),
    }
    z_hit = _frac_files_hit(zr, box)
    # suppkey-only predicate: linear sort on partkey can't prune it
    sup_box = {"l_suppkey": (stats[2], stats[2])}
    z_sup = _frac_files_hit(zr, sup_box)
    l_sup = _frac_files_hit(lr, sup_box)
    assert z_hit <= 0.5, f"z-order box hit {z_hit}"
    assert z_sup < l_sup, f"z-order suppkey pruning {z_sup} !< linear {l_sup}"


def test_zorder_value_is_pure_expression(spark, sf_dir):
    """The Morton key is Catalyst-only: no python stage in the plan, and
    constant-ordered — interleaving is monotone per dimension when the
    other is fixed."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_partkey", "l_suppkey")
    z = zorder_value(li, ["l_partkey", "l_suppkey"], bits=8)
    plan = li.withColumn("_z", z)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    rows = (
        li.filter(F.col("l_suppkey") == li.agg(F.min("l_suppkey")).first()[0])
        .withColumn("_z", z)
        .orderBy("l_partkey")
        .select("l_partkey", "_z")
        .collect()
    )
    zs = [r["_z"] for r in rows]
    # weakly increasing once the other dimension is pinned
    assert all(a <= b for a, b in zip(zs, zs[1:]))


def test_zorder_validation(spark, sf_dir):
    t = Tables(spark, sf_dir)
    li = t.lineitem
    with pytest.raises(ValueError, match="1-4 columns"):
        zorder_value(li, [])
    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_value(li, ["l_partkey", "l_suppkey"], bits=32)


def test_runtime_bloom_filter_join(spark, sf_dir):
    """With broadcast off (two big sides → SMJ), Spark's runtime bloom
    filter must inject a might_contain filter on the fact scan from the
    selective dim side — the row-level scan-pruning path a 100 TB
    fact-fact join relies on. Thresholds are lowered to make the toy
    fixture eligible; the REWRITE itself is what's under test."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        t = Tables(spark, sf_dir)
        dim = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        fact = t.lineitem
        joined = fact.join(dim, fact.l_orderkey == dim.o_orderkey).groupBy(
            "l_returnflag"
        ).count()
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
