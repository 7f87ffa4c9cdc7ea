"""CSV matrix IO with the reference's validation semantics.

Reference analogue: `PLS::split` / `PLS::read_matrix_file`
(/root/reference/src/pls.cpp:23-67): headerless CSV, each line a row;
ragged rows print
    "Error: row R has N columns, but previous row(s) have M columns."
and exit(1); non-numeric fields throw (std::stod).

Library semantics here: raise `RaggedMatrixError` (carrying the
reference's exact message and exit code 1) or ValueError; the CLI converts
them into the reference's exit behavior (cli.py).

A native C++ loader (`pls_tpu._native.read_matrix`, see native/) is used
when built — the reference's data-loader is C++, and a compiled parser is
~10× faster than Python line splitting on big matrices; the pure-Python
fallback is always available.
"""

from __future__ import annotations

import numpy as np


class RaggedMatrixError(ValueError):
    """Rows have inconsistent column counts (reference pls.cpp:54-58)."""

    def __init__(self, row: int, got: int, expected: int):
        self.row = row
        self.got = got
        self.expected = expected
        self.exit_code = 1
        super().__init__(
            f"Error: row {row} has {got} columns, but previous row(s) have "
            f"{expected} columns."
        )


def _read_matrix_python(filename: str, separator: str = ",") -> np.ndarray:
    rows: list[np.ndarray] = []
    ncols: int | None = None
    with open(filename) as f:
        for line in f:
            line = line.rstrip("\n").rstrip("\r")
            fields = line.split(separator)
            try:
                row = np.array([float(v) for v in fields], dtype=np.float64)
            except ValueError as e:
                # reference: uncaught std::invalid_argument from stod
                # (pls.cpp:53, documented at pls.h:92)
                raise ValueError(
                    f"non-numeric field in {filename} row {len(rows)}: {e}"
                ) from e
            if ncols is not None and row.size != ncols:
                raise RaggedMatrixError(len(rows), row.size, ncols)
            ncols = row.size if ncols is None else ncols
            rows.append(row)
    if not rows:
        raise ValueError(f"{filename} is empty")
    return np.stack(rows)


_RAGGED_RE = None


def read_matrix_file(filename: str, separator: str = ",") -> np.ndarray:
    """Read a headerless CSV into a float64 (rows, cols) array."""
    try:
        from pls_tpu import _native  # built from native/pls_native.cpp
    except ImportError:
        return _read_matrix_python(filename, separator)
    try:
        return _native.read_matrix(str(filename), separator)
    except ValueError as e:
        # re-type the native loader's ragged-row diagnostic so callers (the
        # CLI) can reproduce the reference's exit semantics
        import re

        m = re.match(
            r"Error: row (\d+) has (\d+) columns, but previous row\(s\) have "
            r"(\d+) columns\.",
            str(e),
        )
        if m:
            raise RaggedMatrixError(*(int(g) for g in m.groups())) from None
        raise
