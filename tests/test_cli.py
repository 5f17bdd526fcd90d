"""CLI shim tests: argument surface parity + unified exit codes."""

from __future__ import annotations

import pytest

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
