"""compact_parquet: row identity preserved, file count collapses to the
size-derived target, sort_cols produce disjoint per-file key ranges (the
min/max row-group pruning claim)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from stock_market_big_data_project_spark.sources.tables import (
    compact_parquet,
    load_events,
)

from .conftest import SF_DIR


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    src, dest = str(tmp_path / "small"), str(tmp_path / "compact")
    ev = load_events(spark, SF_DIR).select("event_id", "ts", "user_id", "value")
    ev.repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 64

    total = sum(os.path.getsize(p) for p in glob.glob(f"{src}/*.parquet"))
    n_out = compact_parquet(spark, src, dest, target_file_bytes=total // 3 + 1)
    files = glob.glob(f"{dest}/*.parquet")
    assert len(files) == n_out <= 4  # ceil over an inflated-src estimate

    a = spark.read.parquet(dest)
    assert a.count() == ev.count()
    assert a.select("event_id").subtract(ev.select("event_id")).count() == 0


def test_compact_sorted_gives_disjoint_ranges(spark, tmp_path):
    src, dest = str(tmp_path / "small"), str(tmp_path / "sorted")
    ev = load_events(spark, SF_DIR).select("event_id", "ts", "user_id", "value")
    ev.repartition(32).write.parquet(src)
    total = sum(os.path.getsize(p) for p in glob.glob(f"{src}/*.parquet"))
    compact_parquet(
        spark, src, dest, target_file_bytes=total // 4 + 1, sort_cols=("event_id",)
    )
    ranges = []
    for p in glob.glob(f"{dest}/*.parquet"):
        md = pq.ParquetFile(p).metadata
        col = [
            md.row_group(i).column(0).statistics for i in range(md.num_row_groups)
        ]
        ranges.append((min(s.min for s in col), max(s.max for s in col)))
    ranges.sort()
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint → min/max pruning is selective
