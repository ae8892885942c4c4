"""Z-order clustering: the write path must produce files whose parquet
footer min/max stats cover small rectangles in BOTH dimensions — that
is the pruning property the operator exists for."""

import glob

import pyarrow.parquet as pq

from mergeextractor_spark.operators.scale_queries import sort_zorder, zorder_write

SF = "/root/testdata/sf0.001"


def _file_rects(path):
    """Per-file (user range width, item range width) from footer stats."""
    rects = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        lo = {"user_id": None, "item": None}
        hi = {"user_id": None, "item": None}
        for rg in range(meta.num_row_groups):
            for col in ("user_id", "item"):
                st = meta.row_group(rg).column(names[col]).statistics
                lo[col] = st.min if lo[col] is None else min(lo[col], st.min)
                hi[col] = st.max if hi[col] is None else max(hi[col], st.max)
        rects.append((hi["user_id"] - lo["user_id"], hi["item"] - lo["item"]))
    return rects


def test_zorder_files_cover_small_rectangles(spark, tmp_path):
    df = sort_zorder(spark, SF)
    n_files = 8

    zpath = str(tmp_path / "zordered")
    zorder_write(df, zpath, n_files=n_files)

    # control: same data, same file count, clustered by arrival order
    cpath = str(tmp_path / "arrival")
    (
        df.repartitionByRange(n_files, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .parquet(cpath)
    )

    zrects = _file_rects(zpath)
    crects = _file_rects(cpath)
    assert len(zrects) == n_files

    # arrival order scatters both dimensions: every control file spans
    # ~the full rectangle, so per-file stats prune nothing
    zarea = sum(u * i for u, i in zrects) / len(zrects)
    carea = sum(u * i for u, i in crects) / len(crects)
    assert zarea < carea / 3, (zarea, carea)

    # a point/range filter on EITHER single dimension must skip files:
    # for the fixture's ~uniform (user_id, item) grid, each z-ordered
    # file is a compact rectangle, so some file excludes the domain
    # midpoint on each dimension
    assert any(u < 80 for u, _ in zrects), zrects  # 150 users total
    assert any(i < 60 for _, i in zrects), zrects  # 100 items total


def test_zvalue_is_monotone_in_quadrants(spark):
    # coarse sanity: interleaving keeps quadrant order — all-low bits <
    # any value with a high bit set in either dimension
    rows = (
        sort_zorder(spark, SF)
        .select("user_id", "item", "zval")
        .limit(5000)
        .collect()
    )
    for r in rows:
        assert r.zval >= 0
        if r.user_id < 4 and r.item < 4:
            assert r.zval < 64
