"""CLI shim tests: argument surface parity + unified exit codes."""

from __future__ import annotations

import pytest

# r19: excluded from the default driver-verify lane (pytest.ini) — builder
# close-out gated via `-m ""`.
pytestmark = pytest.mark.slow

from googlecloudstorage_blueprints_spark.fileops.cli import build_parser, main


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "bucket"
    (root / "data").mkdir(parents=True)
    (root / "data" / "a.csv").write_text("a1")
    (root / "data" / "b.csv").write_text("b1")
    return root


def test_parser_defaults_match_reference():
    args = build_parser().parse_args(
        ["download", "--bucket-name", "b", "--source-file-name", "f"]
    )
    # reference defaults: exact_match, empty folders (download_file.py:11-41)
    assert args.source_file_name_match_type == "exact_match"
    assert args.source_folder_name == ""
    assert args.destination_folder_name == ""
    assert args.destination_file_name is None


def test_parser_rejects_bad_match_type():
    with pytest.raises(SystemExit):
        build_parser().parse_args(
            ["download", "--bucket-name", "b", "--source-file-name", "f",
             "--source-file-name-match-type", "glob"]
        )


def test_cli_download_regex(spark, tree, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(
        ["download", "--bucket-name", f"file:{tree}",
         "--source-file-name", r"\.csv$",
         "--source-file-name-match-type", "regex_match",
         "--destination-folder-name", "out"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "2 files processed." in out
    assert (tmp_path / "out" / "a.csv").exists()
    assert (tmp_path / "out" / "b.csv").exists()


def test_cli_missing_object_exits_205(spark, tree, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(
        ["download", "--bucket-name", f"file:{tree}",
         "--source-folder-name", "data",
         "--source-file-name", "missing.csv"]
    )
    assert rc == 205
    assert "error (205)" in capsys.readouterr().err


def test_cli_missing_bucket_exits_201(spark, tmp_path, capsys):
    rc = main(
        ["remove", "--bucket-name", f"file:{tmp_path}/definitely_missing",
         "--source-file-name", "x"]
    )
    assert rc == 201


def test_cli_query_lists_operators(capsys):
    rc = main(["query"])
    assert rc == 0
    out = capsys.readouterr().out.split()
    assert "pricing_summary" in out and len(out) >= 60


def test_cli_query_unknown_operator(capsys):
    rc = main(["query", "nope_not_real"])
    assert rc == 2
    assert "unknown operator" in capsys.readouterr().err


def test_cli_query_runs_and_prints(spark, capsys):
    rc = main(["query", "pricing_summary",
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    assert "sum_qty" in capsys.readouterr().out


def test_cli_query_writes_parquet(spark, tmp_path, capsys):
    out = f"file:{tmp_path}/res"
    rc = main(["query", "scan_project_filter",
               "--sf-dir", "/root/testdata/sf0.001", "--output", out])
    assert rc == 0
    assert spark.read.parquet(out).count() > 0


def test_root_uri_scheme_passthrough():
    from googlecloudstorage_blueprints_spark.fileops.cli import _root_uri

    assert _root_uri("my-bucket") == "gs://my-bucket"
    assert _root_uri("file:/tmp/x") == "file:/tmp/x"
    assert _root_uri("hdfs:/data/bucket") == "hdfs:/data/bucket"
    assert _root_uri("s3a://b/k") == "s3a://b/k"


def test_cli_curate(tmp_path, capsys):
    from googlecloudstorage_blueprints_spark.fileops.cli import main

    rc = main([
        "curate",
        "--sf-dir", "/root/testdata/sf0.001",
        "--output", f"file:{tmp_path}/curated",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "500 documents read" in out
    assert "partitioned by split" in out
    import glob as g
    assert g.glob(f"{tmp_path}/curated/split=*")


def test_cli_sql_runs_statement(spark, capsys):
    rc = main(
        [
            "sql",
            "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
            "GROUP BY o_orderstatus ORDER BY o_orderstatus",
            "--sf-dir", "/root/testdata/sf0.001",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "o_orderstatus" in out and "|F" in out.replace(" ", "")


def test_cli_sql_writes_parquet(spark, tmp_path, capsys):
    out_dir = f"file:{tmp_path}/sql_out"
    rc = main(
        [
            "sql",
            "SELECT COUNT(*) AS n FROM lineitem",
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", out_dir,
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out_dir).collect()
    assert got[0]["n"] > 0


def test_cli_sql_bad_statement_is_user_error(spark, capsys):
    rc = main(
        [
            "sql",
            "SELECT nope FROM not_a_table",
            "--sf-dir", "/root/testdata/sf0.001",
        ]
    )
    assert rc == 2
    assert "error:" in capsys.readouterr().err


def test_cli_explain_unknown_operator(capsys):
    rc = main(["explain", "nope_not_real"])
    assert rc == 2
    assert "unknown operator" in capsys.readouterr().err


def test_cli_explain_prints_plan_with_pushdown(spark, capsys):
    """The explain verb must surface the plan-audit signals (physical
    plan tree + PushedFilters/ReadSchema in formatted mode) without
    executing the query."""
    rc = main(["explain", "scan_project_filter",
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "PushedFilters" in out
    assert "ReadSchema" in out


def test_cli_explain_simple_mode(spark, capsys):
    rc = main(["explain", "pricing_summary",
               "--sf-dir", "/root/testdata/sf0.001", "--mode", "simple"])
    assert rc == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_cli_report_prints_and_writes(spark, tmp_path, capsys):
    out = f"file:{tmp_path}/report"
    rc = main(["report", "--sf-dir", "/root/testdata/sf0.001",
               "--output", out])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "zipf_slope" in printed and "simpson_diversity" in printed
    assert spark.read.parquet(out).count() > 0


def test_cli_stream_lists_and_drains_a_twin(tmp_path, capsys):
    """The stream verb must list every streaming_* export, and draining
    latest_snapshot must write one row per user to parquet through the
    checkpointed sink."""
    from googlecloudstorage_blueprints_spark.fileops.cli import main

    assert main(["stream"]) == 0
    listed = capsys.readouterr().out.split()
    assert "latest_snapshot" in listed and "session_entries" in listed

    out = f"{tmp_path}/snap"
    assert main([
        "stream", "latest_snapshot",
        "--sf-dir", "/root/testdata/sf0.001",
        "--output", out,
    ]) == 0
    import duckdb

    n_users = duckdb.sql(
        "SELECT count(DISTINCT user_id) FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    got = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{out}/*.parquet')"
    ).fetchone()[0]
    assert got == n_users

    assert main(["stream", "nope", "--output", f"{tmp_path}/x"]) == 2


def test_cli_sessions_builds_the_mart(tmp_path, capsys):
    from googlecloudstorage_blueprints_spark.fileops.cli import main

    out = f"{tmp_path}/mart"
    assert main([
        "sessions", "--sf-dir", "/root/testdata/sf0.001",
        "--output", out,
    ]) == 0
    text = capsys.readouterr().out
    assert "sessions" in text and "written:" in text
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*/*.parquet')"
    ).fetchone()[0]
    assert n > 0


def test_cli_index_build_and_search(tmp_path, capsys):
    from googlecloudstorage_blueprints_spark.fileops.cli import main

    idx = f"{tmp_path}/idx"
    assert main([
        "index", "build", "--index", idx,
        "--sf-dir", "/root/testdata/sf0.001",
    ]) == 0
    assert "500 vectors indexed (IVF)" in capsys.readouterr().out
    assert main([
        "index", "search", "--index", idx,
        "--sf-dir", "/root/testdata/sf0.001", "--n-queries", "2",
    ]) == 0
    out = capsys.readouterr().out
    assert "neighbor_id" in out and "cosine" in out


def test_cli_index_append(tmp_path, capsys, spark):
    """Build on the first 400 vectors, CLI-append the disjoint tail —
    and prove the r11 overlap guard surfaces as a clean nonzero exit
    (never silent duplicate rows) when the shard collides."""
    import os
    import shutil

    from googlecloudstorage_blueprints_spark.fileops.cli import main

    # fixture dir whose embeddings hold only vec_id < 400
    base_dir = tmp_path / "base_sf"
    base_dir.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents"
    ).split():
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet",
            base_dir / f"{t}.parquet",
        )
    spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).where("vec_id < 400").coalesce(1).write.parquet(
        f"file:{base_dir}/tmp"
    )
    part = next((base_dir / "tmp").glob("part-*.parquet"))
    os.rename(part, base_dir / "embeddings.parquet")

    idx = f"{tmp_path}/idx_app"
    assert main([
        "index", "build", "--index", idx,
        "--sf-dir", str(base_dir),
    ]) == 0
    capsys.readouterr()
    # guard: append without a shard selector is an error, not a dup
    assert main([
        "index", "append", "--index", idx,
        "--sf-dir", "/root/testdata/sf0.001",
    ]) == 1
    assert "--min-vec-id" in capsys.readouterr().out
    # overlapping shard: the library guard refuses, CLI exits nonzero
    assert main([
        "index", "append", "--index", idx,
        "--sf-dir", "/root/testdata/sf0.001", "--min-vec-id", "399",
    ]) == 1
    assert "append overlap" in capsys.readouterr().out
    # the disjoint tail appends cleanly
    assert main([
        "index", "append", "--index", idx,
        "--sf-dir", "/root/testdata/sf0.001", "--min-vec-id", "400",
    ]) == 0
    assert "100 vectors appended (IVF)" in capsys.readouterr().out
    assert main([
        "index", "search", "--index", idx,
        "--sf-dir", "/root/testdata/sf0.001", "--n-queries", "1",
    ]) == 0
    assert "neighbor_id" in capsys.readouterr().out


def test_cli_validate_match_and_mismatch(spark, tmp_path, capsys):
    """`validate` compares two directories by content fingerprint:
    identical copies exit 0 with per-table OK lines; a single flipped
    cell exits with the reference's object-not-found code (205) and
    names the failing table; an unknown table name is a usage error
    (2)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    SF = "/root/testdata/sf0.001"
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    for t in ("region", "nation"):
        shutil.copy(f"{SF}/{t}.parquet", a / f"{t}.parquet")
        shutil.copy(f"{SF}/{t}.parquet", b / f"{t}.parquet")

    rc = main([
        "validate", "--source-dir", str(a), "--dest-dir", str(b),
        "--tables", "region,nation",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "2 table(s) match" in out
    assert out.count("OK   ") == 2

    reg = pq.read_table(f"{SF}/region.parquet")
    names = reg.column("r_name").to_pylist()
    names[0] = names[0] + "-corrupted"
    pq.write_table(
        reg.set_column(
            reg.schema.get_field_index("r_name"),
            "r_name",
            pa.array(names, pa.string()),
        ),
        b / "region.parquet",
    )
    rc = main([
        "validate", "--source-dir", str(a), "--dest-dir", str(b),
        "--tables", "region,nation",
    ])
    captured = capsys.readouterr()
    assert rc == 205
    assert "FAIL region:" in captured.out
    assert "OK   nation:" in captured.out

    rc = main([
        "validate", "--source-dir", str(a), "--dest-dir", str(b),
        "--tables", "nope",
    ])
    assert rc == 2

    # --by-column LOCALIZES the corruption: exactly region.r_name fails,
    # every other column line (incl. region.r_regionkey) reads OK
    rc = main([
        "validate", "--source-dir", str(a), "--dest-dir", str(b),
        "--tables", "region,nation", "--by-column",
    ])
    captured = capsys.readouterr()
    assert rc == 205
    assert "FAIL region.r_name:" in captured.out
    assert "OK   region.r_regionkey:" in captured.out
    assert "OK   nation.n_name:" in captured.out

    # and matches exit 0 with per-column OK lines
    rc = main([
        "validate", "--source-dir", str(a), "--dest-dir", str(a),
        "--tables", "region", "--by-column",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "2 column(s) match" in out


def test_cli_validate_by_day_localizes_backfill_damage(
    spark, tmp_path, capsys
):
    """`validate --by-day` compares per-day fingerprints of the events
    feed: identical copies exit 0; a single flipped cell exits 205 and
    names EXACTLY the damaged epoch_day (every other day reads OK) —
    the backfill-localization path a migration user reaches right
    after the table digest flags the feed.  Flag combinations that
    cannot mean anything (--by-day with --by-column, or with a
    non-events table subset) are usage errors (2)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    SF = "/root/testdata/sf0.001"
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    shutil.copy(f"{SF}/events.parquet", a / "events.parquet")
    shutil.copy(f"{SF}/events.parquet", b / "events.parquet")

    rc = main([
        "validate", "--source-dir", str(a), "--dest-dir", str(b),
        "--by-day",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "day(s) match" in out
    assert "FAIL" not in out

    # flip one cell and record the damaged row's epoch_day
    ev = pq.read_table(f"{SF}/events.parquet")
    types = ev.column("event_type").to_pylist()
    types[0] = types[0] + "-corrupted"
    ts0_us = ev.column("ts").cast(pa.timestamp("us")).to_pylist()[0]
    import datetime as _dt

    bad_day = int(
        ts0_us.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000
    ) // 86_400_000_000
    pq.write_table(
        ev.set_column(
            ev.schema.get_field_index("event_type"),
            "event_type",
            pa.array(types, pa.string()),
        ),
        b / "events.parquet",
    )
    rc = main([
        "validate", "--source-dir", str(a), "--dest-dir", str(b),
        "--by-day",
    ])
    captured = capsys.readouterr()
    assert rc == 205
    assert f"FAIL events day {bad_day}:" in captured.out
    # exactly ONE day diverges; the mismatch line names it
    assert captured.out.count("FAIL") == 1
    assert f"mismatch on day(s) {bad_day}" in captured.err

    # a backfill that DROPPED a whole day: the day exists on the source
    # side only and the mismatch line still names it
    import pyarrow.compute as pc

    c = tmp_path / "c"
    c.mkdir()
    day_us = pc.divide(
        ev.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
        86_400_000_000,
    )
    pq.write_table(
        ev.filter(pc.not_equal(day_us, bad_day)), c / "events.parquet"
    )
    rc = main([
        "validate", "--source-dir", str(a), "--dest-dir", str(c),
        "--by-day",
    ])
    captured = capsys.readouterr()
    assert rc == 205
    assert f"FAIL events day {bad_day}:" in captured.out
    assert "dst(n=-, digest=-, sum=-)" in captured.out
    assert captured.out.count("FAIL") == 1

    # flag misuse is a usage error before any Spark work
    assert main([
        "validate", "--source-dir", str(a), "--dest-dir", str(b),
        "--by-day", "--by-column",
    ]) == 2
    assert main([
        "validate", "--source-dir", str(a), "--dest-dir", str(b),
        "--by-day", "--tables", "region",
    ]) == 2
    capsys.readouterr()
    # --tables events is the one permitted subset spelling
    rc = main([
        "validate", "--source-dir", str(a), "--dest-dir", str(a),
        "--by-day", "--tables", "events",
    ])
    assert rc == 0


def test_cli_validate_continuous_incremental(spark, tmp_path, capsys):
    """`validate --continuous` validates two LIVE feeds incrementally:
    identical backlogs match (exit 0); a file that lands on the source
    only flips the NEXT invocation to 205 (the dest is behind/diverged)
    — processed through the SAME state dir, so only the new file is
    read (committed-file skip); once the dest catches up the following
    invocation matches again through the recovered checkpoints.
    Missing --state-dir is a usage error (2)."""
    import glob as globmod
    import shutil

    from pyspark.sql import functions as F

    from googlecloudstorage_blueprints_spark.sources.catalog import (
        load_table,
    )

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, SF, "documents")
    mid = docs.agg(
        F.expr("percentile_approx(doc_id, 0.5)").cast("long").alias("m")
    ).collect()[0]["m"]
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    state = tmp_path / "state"
    src.mkdir()
    dst.mkdir()

    def plant(df, feed, name):
        d = f"{tmp_path}/stage_{feed.name}_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(f"file:{d}")
        shutil.move(
            globmod.glob(f"{d}/part-*.parquet")[0],
            feed / f"{name}.parquet",
        )

    half0 = docs.where(F.col("doc_id") <= F.lit(mid))
    half1 = docs.where(F.col("doc_id") > F.lit(mid))
    plant(half0, src, "00")
    plant(half0, dst, "00")

    base = [
        "validate", "--source-dir", str(src), "--dest-dir", str(dst),
        "--continuous", "--state-dir", str(state),
    ]
    assert main(base) == 0
    out = capsys.readouterr().out
    assert "feeds match" in out and "OK   documents:" in out

    # a batch lands on the source the destination never received
    plant(half1, src, "01")
    rc = main(base)
    captured = capsys.readouterr()
    assert rc == 205
    assert "FAIL documents:" in captured.out
    assert "content mismatch" in captured.err

    # the move completes: same content reaches the dest; the recovered
    # checkpoints reconcile without rescanning the backlog
    shutil.copy(src / "01.parquet", dst / "01.parquet")
    assert main(base) == 0
    assert "feeds match" in capsys.readouterr().out

    # usage errors: no state dir / unknown table / mode combinations
    assert main([
        "validate", "--source-dir", str(src), "--dest-dir", str(dst),
        "--continuous",
    ]) == 2
    assert main(base + ["--table", "nope"]) == 2
    assert main(base + ["--by-column"]) == 2

    capsys.readouterr()
    # r18 guardrails: the state dir is BOUND to its first table —
    # re-invoking against the same state with another table must fail
    # fast (2) instead of merging the old table's leftover changelog
    # into the new table's digest (r17 advice)
    rc = main(base + ["--table", "events"])
    captured = capsys.readouterr()
    assert rc == 2
    assert "bound to table 'documents'" in captured.err

    # a nonexistent feed dir is a usage error, never a silent
    # zero-digest 'feeds match' (the r17-advice false-pass trap)
    rc = main([
        "validate", "--source-dir", str(tmp_path / "no_such_feed"),
        "--dest-dir", str(dst),
        "--continuous", "--state-dir", str(tmp_path / "state2"),
    ])
    captured = capsys.readouterr()
    assert rc == 2
    assert "does not exist" in captured.err


def test_cli_validate_continuous_names_diverging_day(
    spark, tmp_path, capsys
):
    """An events-feed divergence under ``validate --continuous`` must
    LOCALIZE the damage: the 205 message names the diverging
    epoch_day(s) (the --by-day comparison composed onto the continuous
    path), not just the table/shard triple — r17 verdict item 8."""
    import datetime as _dt
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    SF = "/root/testdata/sf0.001"
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "00.parquet")

    # dest received the same day's rows with ONE cell flipped
    ev = pq.read_table(f"{SF}/events.parquet")
    types = ev.column("event_type").to_pylist()
    types[0] = types[0] + "-corrupted"
    ts0_us = ev.column("ts").cast(pa.timestamp("us")).to_pylist()[0]
    bad_day = int(
        ts0_us.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000
    ) // 86_400_000_000
    pq.write_table(
        ev.set_column(
            ev.schema.get_field_index("event_type"),
            "event_type",
            pa.array(types, pa.string()),
        ),
        dst / "00.parquet",
    )

    rc = main([
        "validate", "--source-dir", str(src), "--dest-dir", str(dst),
        "--continuous", "--state-dir", str(tmp_path / "state"),
        "--table", "events",
    ])
    captured = capsys.readouterr()
    assert rc == 205
    assert "FAIL events:" in captured.out
    assert f"content mismatch on day(s) {bad_day}" in captured.err
