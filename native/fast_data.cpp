// Native data-loader kernels for llm_qat_tpu.
//
// The reference's data layer is pure Python (SURVEY.md §L5:
// part1_switchable_precision/dataset.py, part2 dataset.py) — tokenize,
// concatenate, chunk into fixed windows with stride, pad, -100 labels.
// Chunking/batching large corpora in Python is host-bound while the TPU
// idles between steps; these C++ kernels (exposed through ctypes, see
// llm_qat_tpu/data/native.py) do the window/label materialization and
// shuffled batch gathers at memcpy speed.
//
// Semantics match llm_qat_tpu/data/lm_datasets.py::chunk_tokens exactly
// (validated by tests/test_native.py), which in turn mirrors the reference:
// - drop_partial=false + stride: part1 semantics (dataset.py:35-60) —
//   overlapping windows, last partial window padded, labels -100 on pads;
// - drop_partial=true: part2 semantics (dataset.py:24-34) — full windows only.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Count how many windows chunking will produce (for buffer allocation).
int64_t count_windows(int64_t n_tokens, int64_t max_length, int64_t step,
                      bool drop_partial) {
    if (step <= 0) step = max_length;
    int64_t count = 0;
    for (int64_t start = 0; start < std::max<int64_t>(n_tokens - 1, 0);
         start += step) {
        int64_t len = std::min(max_length, n_tokens - start);
        if (len < 2) break;
        if (len < max_length && drop_partial) break;
        count++;
        if (start + max_length >= n_tokens) break;
    }
    return count;
}

// Materialize windows. out_ids/out_labels must hold
// count_windows(...) * max_length int32 each. Returns rows written.
int64_t chunk_tokens(const int32_t* tokens, int64_t n_tokens,
                     int64_t max_length, int64_t step, int32_t pad_id,
                     bool drop_partial, int32_t* out_ids,
                     int32_t* out_labels) {
    if (step <= 0) step = max_length;
    int64_t row = 0;
    for (int64_t start = 0; start < std::max<int64_t>(n_tokens - 1, 0);
         start += step) {
        int64_t len = std::min(max_length, n_tokens - start);
        if (len < 2) break;
        int32_t* ids = out_ids + row * max_length;
        int32_t* labels = out_labels + row * max_length;
        if (len < max_length) {
            if (drop_partial) break;
            std::memcpy(ids, tokens + start, len * sizeof(int32_t));
            std::fill(ids + len, ids + max_length, pad_id);
            std::memcpy(labels, tokens + start, len * sizeof(int32_t));
            std::fill(labels + len, labels + max_length, (int32_t)-100);
        } else {
            std::memcpy(ids, tokens + start, max_length * sizeof(int32_t));
            std::memcpy(labels, tokens + start, max_length * sizeof(int32_t));
        }
        row++;
        if (start + max_length >= n_tokens) break;
    }
    return row;
}

// Gather shuffled batch rows: out[i] = data[indices[i]] for 2-D int32 data.
void gather_rows(const int32_t* data, int64_t row_len, const int64_t* indices,
                 int64_t n_rows, int32_t* out) {
    for (int64_t i = 0; i < n_rows; i++) {
        std::memcpy(out + i * row_len, data + indices[i] * row_len,
                    row_len * sizeof(int32_t));
    }
}

// Byte-level tokenization (the offline fallback tokenizer's hot loop):
// out must hold n bytes as int32. Returns n.
int64_t tokenize_bytes(const uint8_t* text, int64_t n, int32_t* out) {
    for (int64_t i = 0; i < n; i++) out[i] = (int32_t)text[i];
    return n;
}

}  // extern "C"
