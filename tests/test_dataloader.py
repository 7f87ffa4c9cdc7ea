"""Out-of-core data-loader tests: the threaded native chunk reader, the
pure-Python fallback, and the end-to-end fit_streaming_csv pipeline
(which must reproduce the in-memory fit exactly — the statistics are the
same sums, just accumulated chunkwise)."""

import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.models.streaming import csv_chunks, fit_streaming_csv
from pls_tpu.utils.io import (
    RaggedMatrixError,
    _stream_matrix_python,
    read_matrix_file,
    stream_matrix_file,
)

NIR = "/root/repo/pls_tpu/data/nir.csv"
OCT = "/root/repo/pls_tpu/data/octane.csv"


def _has_native():
    try:
        from pls_tpu import _native  # noqa: F401

        return hasattr(_native, "chunk_reader")
    except ImportError:
        return False


class TestStreamMatrixFile:
    @pytest.mark.parametrize("chunk_rows", [1, 7, 60, 1000])
    def test_chunks_concat_to_full_matrix(self, chunk_rows):
        full = read_matrix_file(NIR)
        chunks = list(stream_matrix_file(NIR, chunk_rows))
        assert all(c.shape[0] <= chunk_rows for c in chunks)
        np.testing.assert_array_equal(np.vstack(chunks), full)

    def test_python_fallback_matches(self):
        full = read_matrix_file(NIR)
        chunks = list(_stream_matrix_python(NIR, 13))
        np.testing.assert_array_equal(np.vstack(chunks), full)

    def test_ragged_raises_with_global_row_index(self, tmp_path):
        p = tmp_path / "rag.csv"
        p.write_text("1,2\n3,4\n5,6\n7,8,9\n")
        streams = [lambda: stream_matrix_file(str(p), 2)]
        if _has_native():
            streams.append(lambda: _stream_matrix_python(str(p), 2))
        for mk in streams:
            out = []
            with pytest.raises(RaggedMatrixError) as ei:
                for c in mk():
                    out.append(c)
            assert ei.value.row == 3 and ei.value.got == 3
            assert ei.value.exit_code == 1
            # complete chunks before the bad row still streamed
            assert sum(c.shape[0] for c in out) == 2

    def test_empty_file(self, tmp_path):
        p = tmp_path / "e.csv"
        p.write_text("")
        with pytest.raises(ValueError, match="empty"):
            list(stream_matrix_file(str(p), 4))

    def test_bad_chunk_rows(self):
        with pytest.raises(ValueError):
            list(stream_matrix_file(NIR, 0))


class TestCsvChunks:
    def test_aligned_pairs(self):
        pairs = list(csv_chunks(NIR, OCT, 17))
        assert all(x.shape[0] == y.shape[0] for x, y in pairs)
        assert sum(x.shape[0] for x, _ in pairs) == 60

    def test_row_count_mismatch(self, tmp_path):
        p = tmp_path / "short.csv"
        p.write_text("1.0\n2.0\n")
        with pytest.raises(ValueError, match="different numbers of rows"):
            list(csv_chunks(NIR, str(p), 8))


class TestFitStreamingCsv:
    def test_matches_in_memory_fit(self):
        import jax.numpy as jnp

        f = fit_streaming_csv(NIR, OCT, 4, chunk_rows=16, dtype=jnp.float64)
        X = pt.colwise_z_scores(read_matrix_file(NIR))
        Y = pt.colwise_z_scores(read_matrix_file(OCT))
        f_ref = pt.fit(jnp.asarray(X), jnp.asarray(Y), 4, pt.KERNEL_TYPE2)
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(f)),
            np.asarray(pt.coefficients(f_ref)),
            atol=1e-9,
        )
