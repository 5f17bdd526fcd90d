"""Path & naming algebra — exact-parity pure functions.

The reference's only "projection layer" is a set of pure string functions
shared by its four CLI scripts.  Semantics preserved exactly (SURVEY.md
§2.A.2), citations into the reference:

- ``clean_folder_name``: ``download_file.py:109-116``, ``upload_file.py:114-122``
- ``combine_folder_and_file_name``: ``download_file.py:119-127``,
  ``upload_file.py:125-134``
- ``extract_file_name_from_source_full_path``: ``download_file.py:65-71``
- ``enumerate_destination_file_name`` (insert ``_{n}`` before the FIRST dot):
  ``download_file.py:74-84``, ``upload_file.py:77-88``
- ``determine_destination_file_name``: ``download_file.py:87-106``
- ``determine_destination_name`` / ``determine_destination_full_path``:
  ``download_file.py:130-144``, ``upload_file.py:137-151``

These run driver-side (they name files, they don't move data).  Column-level
equivalents for use inside DataFrame plans live in
:mod:`googlecloudstorage_blueprints_spark.functions.columns`.
"""

from __future__ import annotations

import os
import re

__all__ = [
    "clean_folder_name",
    "combine_folder_and_file_name",
    "extract_file_name_from_source_full_path",
    "enumerate_destination_file_name",
    "determine_destination_file_name",
    "determine_destination_name",
    "determine_destination_full_path",
]


def clean_folder_name(folder_name: str) -> str:
    """Strip leading/trailing ``/`` and normalize the path.

    Parity: reference ``download_file.py:109-116`` (strip('/') then
    ``os.path.normpath``).  An empty string stays empty — ``normpath('')``
    would return ``'.'``, which the reference avoids by stripping first and
    only normalizing non-empty results.
    """
    folder_name = folder_name.strip("/")
    if folder_name != "":
        folder_name = os.path.normpath(folder_name)
    return folder_name


def combine_folder_and_file_name(folder_name: str, file_name: str) -> str:
    """Join folder and file into one path, skipping the slash when the
    folder is empty.  Parity: ``download_file.py:119-127`` (normpath applied
    to the combined string; the reference applies normpath twice — idempotent,
    so one application is behavior-identical)."""
    combined_name = os.path.normpath(
        f"{folder_name}{'/' if folder_name else ''}{file_name}"
    )
    return combined_name


def extract_file_name_from_source_full_path(source_full_path: str) -> str:
    """Basename of a path.  Parity: ``download_file.py:65-71``."""
    destination_file_name = os.path.basename(source_full_path)
    return destination_file_name


def enumerate_destination_file_name(
    destination_file_name: str, file_number: int = 1
) -> str:
    """Append ``_{n}`` BEFORE THE FIRST dot (not the last).

    Parity: ``download_file.py:74-84`` — ``re.sub(r'\\.', f'_{n}.', name, 1)``;
    if the name has no dot, append ``_{n}``.  Examples (reference-exact):
    ``a.tar.gz -> a_3.tar.gz`` (first dot, so the multi-extension suffix is
    preserved), ``data -> data_3``.
    """
    if re.search(r"\.", destination_file_name):
        destination_file_name = re.sub(
            r"\.", f"_{file_number}.", destination_file_name, 1
        )
    else:
        destination_file_name = f"{destination_file_name}_{file_number}"
    return destination_file_name


def determine_destination_file_name(
    *,
    source_full_path: str,
    destination_file_name: str | None,
    file_number: int | None = None,
) -> str:
    """Pick the destination file name.

    Parity: ``download_file.py:87-106`` — if an explicit destination name was
    given, enumerate it only when ``file_number`` is set (multi-match loops);
    otherwise each matched file keeps its own basename (collisions across
    folders overwrite, a reference behavior we preserve).
    """
    if destination_file_name:
        if file_number:
            destination_file_name = enumerate_destination_file_name(
                destination_file_name, file_number
            )
    else:
        destination_file_name = extract_file_name_from_source_full_path(
            source_full_path
        )
    return destination_file_name


def determine_destination_name(
    destination_folder_name: str,
    destination_file_name: str | None,
    source_full_path: str,
    file_number: int | None = None,
) -> str:
    """Compose folder + chosen file name into the full destination path.
    Parity: ``download_file.py:130-144``."""
    destination_file_name = determine_destination_file_name(
        destination_file_name=destination_file_name,
        source_full_path=source_full_path,
        file_number=file_number,
    )
    destination_name = combine_folder_and_file_name(
        destination_folder_name, destination_file_name
    )
    return destination_name


# The reference exposes the same composition under two names
# (download_file.py:130-144 `determine_destination_name` vs.
# upload_file.py:137-151 `determine_destination_full_path`); keep both.
determine_destination_full_path = determine_destination_name
