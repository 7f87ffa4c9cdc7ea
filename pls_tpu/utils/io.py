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


def _stream_matrix_python(filename: str, chunk_rows: int, separator: str = ","):
    rows: list[np.ndarray] = []
    ncols: int | None = None
    row_index = 0
    with open(filename) as f:
        for line in f:
            line = line.rstrip("\n").rstrip("\r")
            fields = line.split(separator)
            try:
                row = np.array([float(v) for v in fields], dtype=np.float64)
            except ValueError as e:
                raise ValueError(
                    f"non-numeric field in {filename} row {row_index}: {e}"
                ) from e
            if ncols is not None and row.size != ncols:
                raise RaggedMatrixError(row_index, row.size, ncols)
            ncols = row.size if ncols is None else ncols
            rows.append(row)
            row_index += 1
            if len(rows) == chunk_rows:
                yield np.stack(rows)
                rows = []
    if rows:
        yield np.stack(rows)
    elif row_index == 0:
        raise ValueError(f"{filename} is empty")


def _retype_ragged(e: ValueError) -> Exception:
    import re

    m = re.match(
        r"Error: row (\d+) has (\d+) columns, but previous row\(s\) have "
        r"(\d+) columns\.",
        str(e),
    )
    if m:
        return RaggedMatrixError(*(int(g) for g in m.groups()))
    return e


def stream_matrix_file(filename: str, chunk_rows: int, separator: str = ","):
    """Yield float64 (rows <= chunk_rows, cols) blocks of a headerless CSV.

    When the native extension is built, parsing runs on a background C++
    thread that prefetches the next chunk while the caller consumes the
    current one (pls_tpu._native.chunk_reader — double-buffered data
    loading for out-of-core streaming fits, models/streaming.py); the
    pure-Python fallback streams the same chunks synchronously.  Ragged
    rows raise RaggedMatrixError with the reference's diagnostic
    (/root/reference/src/pls.cpp:54-58), row index global across chunks.
    """
    if chunk_rows <= 0:
        raise ValueError("chunk_rows must be positive")
    try:
        from pls_tpu import _native

        reader = _native.chunk_reader(str(filename), int(chunk_rows), separator)
    except ImportError:
        yield from _stream_matrix_python(filename, chunk_rows, separator)
        return
    while True:
        try:
            chunk = next(reader)
        except StopIteration:
            return
        except ValueError as e:
            raise _retype_ragged(e) from None
        yield chunk


def read_matrix_file(filename: str, separator: str = ",") -> np.ndarray:
    """Read a matrix file into a float64 (rows, cols) array.

    Headerless CSV by default (the reference's container,
    /root/reference/src/pls.cpp:37-67); files ending in ``.npy`` load as
    binary numpy arrays instead (the production container —
    utils/binio.py streams them out-of-core; here the whole matrix is
    wanted in memory, so plain np.load suffices).  1-D .npy arrays are
    treated as a single column.
    """
    if str(filename).endswith(".npy"):
        arr = np.load(filename)
        if arr.ndim == 1:
            arr = arr[:, None]
        if arr.ndim != 2:
            raise ValueError(f"{filename}: expected 1-D or 2-D array")
        return np.asarray(arr, np.float64)
    try:
        from pls_tpu import _native  # built from native/pls_native.cpp
    except ImportError:
        return _read_matrix_python(filename, separator)
    try:
        return _native.read_matrix(str(filename), separator)
    except ValueError as e:
        # re-type the native loader's ragged-row diagnostic so callers (the
        # CLI) can reproduce the reference's exit semantics
        err = _retype_ragged(e)
        if err is e:
            raise
        raise err from None
