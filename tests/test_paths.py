"""Table-driven parity tests for the naming algebra (SURVEY.md §2.A.2).

Expected values encode the reference semantics exactly: first-dot
enumeration (``download_file.py:74-84``), folder cleaning
(``download_file.py:109-116``), destination-name resolution
(``download_file.py:87-106``).
"""

from __future__ import annotations

import pytest

from googlecloudstorage_blueprints_spark.paths import (
    clean_folder_name,
    combine_folder_and_file_name,
    determine_destination_file_name,
    determine_destination_full_path,
    enumerate_destination_file_name,
    extract_file_name_from_source_full_path,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("", ""),
        ("/", ""),
        ("folder/", "folder"),
        ("/folder", "folder"),
        ("//a/b//", "a/b"),
        ("a/./b", "a/b"),
        ("a/../b", "b"),
    ],
)
def test_clean_folder_name(raw, expected):
    assert clean_folder_name(raw) == expected


@pytest.mark.parametrize(
    "folder,file,expected",
    [
        ("", "a.csv", "a.csv"),
        ("f", "a.csv", "f/a.csv"),
        ("f/g", "a.csv", "f/g/a.csv"),
    ],
)
def test_combine(folder, file, expected):
    assert combine_folder_and_file_name(folder, file) == expected


@pytest.mark.parametrize(
    "name,n,expected",
    [
        # the FIRST dot gets the suffix — multi-extension preserved
        ("a.tar.gz", 3, "a_3.tar.gz"),
        ("data.csv", 1, "data_1.csv"),
        ("data", 3, "data_3"),
        ("a.b.c.d", 2, "a_2.b.c.d"),
    ],
)
def test_enumerate_first_dot(name, n, expected):
    assert enumerate_destination_file_name(name, n) == expected


def test_basename():
    assert extract_file_name_from_source_full_path("a/b/c.txt") == "c.txt"
    assert extract_file_name_from_source_full_path("c.txt") == "c.txt"


def test_determine_destination_file_name():
    # explicit destination + file_number → enumerated
    assert (
        determine_destination_file_name(
            source_full_path="x/y.csv",
            destination_file_name="out.csv",
            file_number=2,
        )
        == "out_2.csv"
    )
    # explicit destination, no file_number → as-is
    assert (
        determine_destination_file_name(
            source_full_path="x/y.csv",
            destination_file_name="out.csv",
            file_number=None,
        )
        == "out.csv"
    )
    # no destination → source basename (even with file_number set;
    # reference only enumerates explicit names, download_file.py:95-104)
    assert (
        determine_destination_file_name(
            source_full_path="x/y.csv",
            destination_file_name=None,
            file_number=4,
        )
        == "y.csv"
    )


def test_determine_destination_full_path():
    assert (
        determine_destination_full_path(
            destination_folder_name="dest",
            destination_file_name="o.csv",
            source_full_path="s/a.csv",
            file_number=None,
        )
        == "dest/o.csv"
    )
    assert (
        determine_destination_full_path(
            destination_folder_name="",
            destination_file_name=None,
            source_full_path="s/a.csv",
            file_number=1,
        )
        == "a.csv"
    )
