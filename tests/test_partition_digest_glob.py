"""Pin for partition_digest_frame's r18 feed-dir glob mode.

The ``validate --continuous`` day-localization path reads a LIVE feed
directory of flat parquet files through ``glob=...`` instead of the
catalog's ``events.parquet``; the glob branch must produce the SAME
per-day digest rows as the default catalog path over identical rows
(including the ntz shim on regenerated-fixture vintages), or the
205 message would name wrong days.
"""

from __future__ import annotations

import shutil

from googlecloudstorage_blueprints_spark.operators.audit import (
    partition_digest_frame,
)

SF = "/root/testdata/sf0.001"


def test_glob_mode_matches_catalog_path(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # a feed layout: the same rows as the catalog file, flat-named
    shutil.copy(f"{SF}/events.parquet", feed / "batch-000.parquet")

    default_rows = sorted(
        (r["epoch_day"], r["n_rows"], r["digest"], r["digest_sum"])
        for r in partition_digest_frame(spark, SF).collect()
    )
    glob_rows = sorted(
        (r["epoch_day"], r["n_rows"], r["digest"], r["digest_sum"])
        for r in partition_digest_frame(
            spark, str(feed), glob="*.parquet"
        ).collect()
    )
    assert default_rows == glob_rows
    assert default_rows  # non-vacuous: the fixture has days


def test_glob_mode_sees_only_matching_files(spark, tmp_path):
    """The glob filter must scope the scan: a stray non-matching file
    in the feed dir is ignored (the continuous layout mixes the
    changelog/marker artifacts next to data in --state-dir trees)."""
    feed = tmp_path / "feed"
    feed.mkdir()
    shutil.copy(f"{SF}/events.parquet", feed / "batch-000.parquet")
    (feed / "notes.txt").write_text("not parquet")

    rows = partition_digest_frame(
        spark, str(feed), glob="*.parquet"
    ).collect()
    total = sum(r["n_rows"] for r in rows)
    base = sum(
        r["n_rows"] for r in partition_digest_frame(spark, SF).collect()
    )
    assert total == base
