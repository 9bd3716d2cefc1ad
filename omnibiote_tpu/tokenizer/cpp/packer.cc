// Native sequence packer: fixed ctx_len rows from variable-length lines.
//
// C++ twin of data/loader.py pack_sequences (reference get_sequence,
// /root/reference/training/loader.py:118-163), bit-identical for a given
// line order, including the reference's drop semantics:
//   * truncate mode: the overflowing line is cut to fill the row; its
//     remainder is discarded;
//   * padding mode: the overflowing line is discarded; lines longer than
//     ctx_len are skipped;
//   * the line pulled right after a row fills to exactly ctx_len is dropped
//     (the row is only emitted once that next line has been consumed, so an
//     exactly-full row at end-of-input stays pending, as in the generator).
// Also emits segment ids (exclusive running EOS count per row) so the host
// pipeline produces kernel-ready batches in one pass.
//
// Streaming contract: *consumed_lines is the index of the first line whose
// tokens are NOT yet materialised in a completed row. Re-feeding from that
// index reproduces the pending partial row exactly (packing is
// deterministic in line order).
#include <cstdint>
#include <cstring>

namespace {
constexpr int32_t kEos = 3;
constexpr int32_t kPad = 1;
}

extern "C" {

long obt_pack_lines(const int32_t* lines, const long* offsets, long n_lines,
                    int ctx_len, int use_padding, int32_t* out_rows,
                    int32_t* out_segs, long cap_rows, long* consumed_lines) {
  long row = 0;
  int fill = 0;
  int32_t* cur = out_rows;
  long li = 0;
  long row_start_line = 0;  // first line feeding the current row

  auto finish_row = [&]() {
    int32_t seg = 0;
    int32_t* segp = out_segs + row * (long)ctx_len;
    for (int t = 0; t < ctx_len; ++t) {
      segp[t] = seg;
      if (cur[t] == kEos) ++seg;
    }
    ++row;
    cur = out_rows + row * (long)ctx_len;
    fill = 0;
  };

  while (li < n_lines && row < cap_rows) {
    const int32_t* line = lines + offsets[li];
    long len = offsets[li + 1] - offsets[li];

    if (fill == ctx_len) {
      // exact fill: this freshly pulled line is dropped (loader.py:131-136)
      ++li;
      finish_row();
      row_start_line = li;
      continue;
    }
    ++li;
    if (fill == 0) row_start_line = li - 1;

    if (fill + len > ctx_len) {
      if (use_padding) {
        if (fill == 0) {
          row_start_line = li;  // oversized line skipped entirely
          continue;
        }
        for (int t = fill; t < ctx_len; ++t) cur[t] = kPad;
      } else {
        std::memcpy(cur + fill, line, (ctx_len - fill) * sizeof(int32_t));
      }
      finish_row();
      row_start_line = li;
      continue;
    }
    std::memcpy(cur + fill, line, len * sizeof(int32_t));
    fill += (int)len;
  }

  // fill > 0 covers the exactly-full pending row too (it is only emitted
  // after the next line is pulled and dropped)
  *consumed_lines = (fill > 0) ? row_start_line : li;
  return row;
}

}  // extern "C"
