"""Native C++ data-kernel parity tests (native/fast_data.cpp vs the Python
reference implementation in data/lm_datasets.py)."""

import numpy as np
import pytest

from llm_qat_tpu.data import native


def python_chunk(tokens, max_length, doc_stride, pad_id, drop_partial=False):
    """Inline copy of the Python fallback loop (the pre-native reference)."""
    tokens = np.asarray(tokens, np.int32)
    ids_rows, label_rows = [], []
    step = doc_stride if doc_stride > 0 else max_length
    for start in range(0, max(len(tokens) - 1, 0), step):
        window = tokens[start : start + max_length]
        if len(window) < 2:
            break
        if len(window) < max_length:
            if drop_partial:
                break
            ids = np.full((max_length,), pad_id, np.int32)
            ids[: len(window)] = window
            labels = np.full((max_length,), -100, np.int32)
            labels[: len(window)] = window
        else:
            ids = window.copy()
            labels = window.copy()
        ids_rows.append(ids)
        label_rows.append(labels)
        if start + max_length >= len(tokens):
            break
    if not ids_rows:
        return (np.zeros((0, max_length), np.int32),
                np.zeros((0, max_length), np.int32))
    return np.stack(ids_rows), np.stack(label_rows)


needs_native = pytest.mark.skipif(not native.is_available(),
                                  reason="C++ toolchain unavailable")


@needs_native
class TestNativeChunker:
    @pytest.mark.parametrize("n,ml,stride,drop", [
        (100, 16, 8, False),
        (100, 16, 16, False),
        (100, 16, 16, True),
        (10, 4, 4, False),
        (3, 8, 8, False),
        (1, 8, 8, False),
        (257, 32, 13, False),
    ])
    def test_matches_python(self, n, ml, stride, drop):
        tokens = np.arange(n, dtype=np.int32)
        want_ids, want_labels = python_chunk(tokens, ml, stride, 99, drop)
        got = native.chunk_tokens_native(tokens, ml, stride, 99, drop)
        assert got is not None
        np.testing.assert_array_equal(got[0], want_ids)
        np.testing.assert_array_equal(got[1], want_labels)

    def test_gather_rows(self):
        data = np.arange(40, dtype=np.int32).reshape(10, 4)
        idx = np.asarray([7, 0, 3], np.int64)
        out = native.gather_rows_native(data, idx)
        np.testing.assert_array_equal(out, data[idx])

    def test_lmdataset_uses_native(self):
        """chunk_tokens (used by LMDataset) routes through the native path."""
        from llm_qat_tpu.data import chunk_tokens

        tokens = np.arange(50, dtype=np.int32)
        ids, labels = chunk_tokens(tokens, 8, 4, pad_id=0)
        want_ids, want_labels = python_chunk(tokens, 8, 4, 0)
        np.testing.assert_array_equal(ids, want_ids)
        np.testing.assert_array_equal(labels, want_labels)
