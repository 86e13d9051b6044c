"""Driver-side file enumeration and dispatch (SURVEY §2.1 S2-S3).

The reference enumerates ``./data/*.xlsx`` and routes each file to a
pipeline by filename prefix (reference: src/main.py:390-393, 412-419).
These are driver-side decisions in Spark too — the distributed analog
(glob paths + ``F.input_file_name()``) only applies once files are
splittable lake formats.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence


def list_data_files(
    directory: str, extension: str = ".xlsx"
) -> list[str]:
    """Enumerate work-item files in a directory (S2).

    Reference: src/main.py:390-393 — ``[d+f for f in listdir(d) if
    isfile and f.endswith(".xlsx")]``; like the reference, paths are
    directory-prefixed and non-recursive.
    """
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if os.path.isfile(os.path.join(directory, f)) and f.endswith(extension)
    )


def route_by_prefix(
    files: Sequence[str],
    routes: dict[str, Callable[[str], object]],
    on_unmatched: Callable[[str], None] | None = None,
) -> list[tuple[str, object]]:
    """Dispatch files to pipelines by filename prefix (S3).

    Reference: src/main.py:412-419 — ``startswith("Index")`` routes to the
    index pipeline, ``startswith("adult")`` to the adult one; unmatched
    files are skipped (optionally reported).
    Returns (file, result) pairs in input order.
    """
    results: list[tuple[str, object]] = []
    for path in files:
        name = os.path.basename(path)
        for prefix, fn in routes.items():
            if name.startswith(prefix):
                results.append((path, fn(path)))
                break
        else:
            if on_unmatched is not None:
                on_unmatched(path)
    return results
