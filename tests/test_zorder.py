"""Z-order layout: conjunctive two-dimensional predicates must be
able to skip a large share of row groups via footer min/max stats —
strictly more than a single-column range layout allows on the
non-sorted dimension — with content identical to the source."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_MED


def _groups_matching(path_dir, lo_a, hi_a, lo_b, hi_b, col_a, col_b):
    """Count parquet row groups whose [min,max] footer stats overlap
    the query box — the groups a stats-pruning reader must touch."""
    import glob

    total, touched = 0, 0
    for f in glob.glob(f"{path_dir}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            sa = md.row_group(rg).column(names[col_a]).statistics
            sb = md.row_group(rg).column(names[col_b]).statistics
            if (
                sa.max >= lo_a
                and sa.min <= hi_a
                and sb.max >= lo_b
                and sb.min <= hi_b
            ):
                touched += 1
    return touched, total


@pytest.fixture()
def small_row_groups(spark):
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block, old_page = hconf.get("parquet.block.size"), hconf.get(
        "parquet.page.size"
    )
    hconf.setInt("parquet.block.size", 64 * 1024)
    hconf.setInt("parquet.page.size", 8 * 1024)
    yield
    for k, v in (("parquet.block.size", old_block), ("parquet.page.size", old_page)):
        if v is None:
            hconf.unset(k)
        else:
            hconf.set(k, v)


def test_zorder_prunes_both_dimensions(spark, tmp_path, small_row_groups):
    from citus_spark.sources.zorder import write_zordered

    li = spark.read.parquet(f"{SF_MED}/lineitem.parquet")
    zpath = str(tmp_path / "li_z")
    lpath = str(tmp_path / "li_linear")

    write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=4)
    (
        li.repartitionByRange(4, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # identical content (exact integer invariants — float sums are
    # partition-order sensitive by design)
    z = spark.read.parquet(zpath)
    assert z.count() == li.count()
    assert (
        z.select(F.sum("l_orderkey"), F.sum("l_partkey")).collect()
        == li.select(F.sum("l_orderkey"), F.sum("l_partkey")).collect()
    )

    # a mid-range box, quarter-span in BOTH dimensions
    a_hi = li.agg(F.max("l_partkey")).collect()[0][0]
    b_hi = li.agg(F.max("l_suppkey")).collect()[0][0]
    box = (a_hi // 4, a_hi // 2, b_hi // 4, b_hi // 2)

    z_touch, z_total = _groups_matching(zpath, *box, "l_partkey", "l_suppkey")
    l_touch, l_total = _groups_matching(lpath, *box, "l_partkey", "l_suppkey")
    assert z_total >= 24, f"want many row groups, got {z_total}"
    # z-order reads a minority of groups on the 2-D box…
    assert z_touch / z_total < 0.5, (z_touch, z_total)
    # …and beats the single-column layout: linear is tight in
    # l_partkey (≈ quarter of groups) but full-range in l_suppkey
    assert z_touch / z_total < l_touch / l_total, (
        (z_touch, z_total),
        (l_touch, l_total),
    )
