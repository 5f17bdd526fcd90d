"""Typed error model mirroring the reference's exit codes.

Reference: ``googlecloudstorage_blueprints/exit_codes.py:1-3`` defines
``EXIT_CODE_INVALID_CREDENTIALS = 200``, ``EXIT_CODE_INVALID_BUCKET = 201``,
``EXIT_CODE_FILE_NOT_FOUND = 205``.  ``move_file.py:103/118/137/183`` and
``remove_file.py:79/94/113`` call ``sys.exit(code)`` directly; the download
and upload scripts re-raise instead (``download_file.py:186-191,202-206,
220-225``).  The engine unifies this: operations raise one exception
hierarchy carrying the canonical code, and the CLI shims translate every
:class:`BlueprintError` into ``sys.exit(exit_code)`` uniformly.
"""

from __future__ import annotations

EXIT_CODE_INVALID_CREDENTIALS = 200
EXIT_CODE_INVALID_BUCKET = 201
EXIT_CODE_FILE_NOT_FOUND = 205


class BlueprintError(Exception):
    """Base class for engine errors; carries the reference exit code."""

    exit_code: int = 1

    def __init__(self, message: str = ""):
        super().__init__(message)
        self.message = message


class InvalidCredentialsError(BlueprintError):
    """Credential bootstrap failed (reference exit code 200)."""

    exit_code = EXIT_CODE_INVALID_CREDENTIALS


class InvalidBucketError(BlueprintError):
    """Bucket / root URI does not exist or is inaccessible (code 201)."""

    exit_code = EXIT_CODE_INVALID_BUCKET


class FileNotFoundBlueprintError(BlueprintError):
    """Object not found, or a regex matched nothing (code 205)."""

    exit_code = EXIT_CODE_FILE_NOT_FOUND
