// Native host-side runtime for blocksparse_tpu.
//
// The reference implements its host runtime in C++ (TF op glue, LUT
// handling, comm threads — /root/reference/src/*.cc).  On TPU the device
// side is Pallas/XLA, but the host-side *layout compiler* — turning 0/1
// block layouts into kernel schedules — is pure preprocessing and is the
// part worth keeping native: production layouts reach 10^5..10^6 nonzero
// blocks (e.g. 20480^2 at block 8), where the Python builders take
// seconds-to-minutes per layout and this library takes milliseconds.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in the
// image).  All functions are two-phase: call with null outputs to size,
// then with buffers to fill.
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// ------------------------------------------------------------------
// Grouped gather schedule (kernels/bsmm.py build_grouped_schedule).
// entries are sorted by output row: row_of[e], in_blk[e], w_id[e].
// Phase 1 (rows==nullptr): returns CH via *out_CH.
// Phase 2: fills rows (groups*CH), in_idx/w_idx/w_valid (groups*CH*G).
// Returns number of groups, or -1 on error.
// ------------------------------------------------------------------
int bs_grouped_schedule(
    int64_t nnz, const int32_t* row_of, const int32_t* in_blk,
    const int32_t* w_id, int32_t n_rows, int32_t G, int32_t R,
    int32_t* out_CH,
    int32_t* rows, int32_t* in_idx, int32_t* w_idx, int32_t* w_valid) {
  if (G <= 0 || R <= 0 || n_rows <= 0) return -1;
  const int32_t groups = (n_rows + R - 1) / R;

  // per-row entry ranges (entries sorted by row)
  std::vector<int64_t> row_start(n_rows + 1, 0);
  {
    std::vector<int64_t> count(n_rows, 0);
    for (int64_t e = 0; e < nnz; ++e) {
      int32_t r = row_of[e];
      if (r < 0 || r >= n_rows) return -1;
      count[r]++;
    }
    for (int32_t r = 0; r < n_rows; ++r)
      row_start[r + 1] = row_start[r] + count[r];
  }

  // chunks per group
  int32_t CH = 0;
  std::vector<int32_t> chunks_of_group(groups, 0);
  for (int32_t g = 0; g < groups; ++g) {
    int32_t ch = 0;
    for (int32_t r = g * R; r < std::min((g + 1) * R, n_rows); ++r) {
      int64_t n = row_start[r + 1] - row_start[r];
      ch += std::max<int64_t>(1, (n + G - 1) / G);
    }
    // rows beyond n_rows in the last group emit nothing
    chunks_of_group[g] = ch;
    CH = std::max(CH, ch);
  }
  if (out_CH) *out_CH = CH;
  if (!rows) return groups;

  std::memset(rows, 0, sizeof(int32_t) * (size_t)groups * CH);
  std::memset(in_idx, 0, sizeof(int32_t) * (size_t)groups * CH * G);
  std::memset(w_idx, 0, sizeof(int32_t) * (size_t)groups * CH * G);
  std::memset(w_valid, 0, sizeof(int32_t) * (size_t)groups * CH * G);

  for (int32_t g = 0; g < groups; ++g) {
    int64_t j = 0;
    for (int32_t r = g * R; r < std::min((g + 1) * R, n_rows); ++r) {
      int64_t lo = row_start[r], hi = row_start[r + 1];
      int64_t n = hi - lo;
      int64_t nch = std::max<int64_t>(1, (n + G - 1) / G);
      for (int64_t c = 0; c < nch; ++c, ++j) {
        rows[(int64_t)g * CH + j] = r - g * R;
        for (int32_t i = 0; i < G; ++i) {
          int64_t e = lo + c * G + i;
          int64_t slot = ((int64_t)g * CH + j) * G + i;
          if (e < hi) {
            in_idx[slot] = in_blk[e];
            w_idx[slot] = w_id[e];
            w_valid[slot] = 1;
          }
        }
      }
    }
  }
  return groups;
}

// ------------------------------------------------------------------
// Supertile schedule (kernels/bsmm.py build_supertile_schedule).
// Phase 1: *out_CH = max chunks/group, *out_inflation_num/det for the
// padding estimate.  Phase 2 fills arrays like above, with
// in_idx[slot] = supertile_start + i.
// ------------------------------------------------------------------
int bs_supertile_schedule(
    int64_t nnz, const int32_t* row_of, const int32_t* in_blk,
    const int32_t* w_id, int32_t n_rows, int32_t V, int32_t R,
    int32_t* out_CH, int64_t* out_padded_blocks,
    int32_t* rows, int32_t* in_idx, int32_t* w_idx, int32_t* w_valid) {
  if (V <= 0 || R <= 0 || n_rows <= 0) return -1;
  const int32_t groups = (n_rows + R - 1) / R;

  std::vector<int64_t> row_start(n_rows + 1, 0);
  {
    std::vector<int64_t> count(n_rows, 0);
    for (int64_t e = 0; e < nnz; ++e) count[row_of[e]]++;
    for (int32_t r = 0; r < n_rows; ++r)
      row_start[r + 1] = row_start[r] + count[r];
  }

  // per-row supertile counts (entries sorted by (row, in_blk))
  std::vector<int32_t> st_count(n_rows, 0);
  int64_t padded = 0;
  for (int32_t r = 0; r < n_rows; ++r) {
    int32_t last_st = -1, cnt = 0;
    for (int64_t e = row_start[r]; e < row_start[r + 1]; ++e) {
      int32_t st = in_blk[e] / V;
      if (st != last_st) { cnt++; last_st = st; }
    }
    st_count[r] = std::max(cnt, 1);
    padded += (int64_t)cnt * V;  // empty rows excluded (parity with
                                 // supertile_rows' inflation estimate)
  }
  if (out_padded_blocks) *out_padded_blocks = padded;

  int32_t CH = 0;
  for (int32_t g = 0; g < groups; ++g) {
    int32_t ch = 0;
    for (int32_t r = g * R; r < std::min((g + 1) * R, n_rows); ++r)
      ch += st_count[r];
    CH = std::max(CH, ch);
  }
  if (out_CH) *out_CH = CH;
  if (!rows) return groups;

  std::memset(rows, 0, sizeof(int32_t) * (size_t)groups * CH);
  std::memset(in_idx, 0, sizeof(int32_t) * (size_t)groups * CH * V);
  std::memset(w_idx, 0, sizeof(int32_t) * (size_t)groups * CH * V);
  std::memset(w_valid, 0, sizeof(int32_t) * (size_t)groups * CH * V);

  for (int32_t g = 0; g < groups; ++g) {
    int64_t j = 0;
    for (int32_t r = g * R; r < std::min((g + 1) * R, n_rows); ++r) {
      int64_t lo = row_start[r], hi = row_start[r + 1];
      if (lo == hi) {
        // empty row: one inert chunk (supertile 0, no valid weights)
        rows[(int64_t)g * CH + j] = r - g * R;
        for (int32_t i = 0; i < V; ++i)
          in_idx[((int64_t)g * CH + j) * V + i] = i;
        ++j;
        continue;
      }
      int64_t e = lo;
      while (e < hi) {
        int32_t st = in_blk[e] / V;
        int64_t base = ((int64_t)g * CH + j) * V;
        rows[(int64_t)g * CH + j] = r - g * R;
        for (int32_t i = 0; i < V; ++i) in_idx[base + i] = st * V + i;
        while (e < hi && in_blk[e] / V == st) {
          int32_t slot = in_blk[e] % V;
          w_idx[base + slot] = w_id[e];
          w_valid[base + slot] = 1;
          ++e;
        }
        ++j;
      }
    }
  }
  return groups;
}

// ------------------------------------------------------------------
// Batched byte-corpus sampler (examples data path): gathers `batch`
// windows of length ctx+1 from a byte corpus into int32 (x, y) arrays.
// A native loop keeps the host input pipeline off the Python
// interpreter (the reference's examples did this slicing in Python).
// ------------------------------------------------------------------
void bs_sample_batch(const uint8_t* data, int64_t n, const int64_t* offsets,
                     int32_t batch, int32_t ctx, int32_t* x, int32_t* y) {
  for (int32_t b = 0; b < batch; ++b) {
    int64_t o = offsets[b];
    const uint8_t* p = data + o;
    int32_t* xb = x + (int64_t)b * ctx;
    int32_t* yb = y + (int64_t)b * ctx;
    for (int32_t t = 0; t < ctx; ++t) {
      xb[t] = p[t];
      yb[t] = p[t + 1];
    }
  }
}

// ------------------------------------------------------------------
// Greedy union-minimizing row clustering (kernels/bsmm.py cluster_rows).
// Groups of R rows share one dense-tile column union; packing rows with
// overlapping support raises MXU fill.  Bit-identical to the Python
// fallback: seeds in stable descending-degree order, each pick is the
// lowest-index unused row minimizing |support \ union|.
// perm must hold n_rows int32.  Returns 0, or -1 on error.
// ------------------------------------------------------------------
int bs_cluster_rows(
    int64_t nnz, const int32_t* row_of, const int32_t* in_blk,
    int32_t n_rows, int32_t n_cols, int32_t R, int32_t* perm) {
  if (n_rows <= 0 || n_cols <= 0 || R <= 0 || perm == nullptr) return -1;
  const int32_t W = (n_cols + 63) / 64;
  std::vector<uint64_t> sup((size_t)n_rows * W, 0);
  std::vector<int64_t> deg(n_rows, 0);
  for (int64_t e = 0; e < nnz; ++e) {
    int32_t r = row_of[e], c = in_blk[e];
    if (r < 0 || r >= n_rows || c < 0 || c >= n_cols) return -1;
    uint64_t& w = sup[(size_t)r * W + c / 64];
    uint64_t bit = 1ull << (c % 64);
    if (!(w & bit)) deg[r]++;
    w |= bit;
  }
  std::vector<int32_t> order(n_rows);
  for (int32_t r = 0; r < n_rows; ++r) order[r] = r;
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return deg[a] > deg[b]; });
  std::vector<char> used(n_rows, 0);
  std::vector<uint64_t> u(W);
  int64_t out = 0;
  for (int32_t s = 0; s < n_rows; ++s) {
    int32_t seed = order[s];
    if (used[seed]) continue;
    used[seed] = 1;
    std::memcpy(u.data(), &sup[(size_t)seed * W], W * sizeof(uint64_t));
    perm[out++] = seed;
    for (int32_t k = 1; k < R; ++k) {
      int32_t best = -1;
      int64_t best_growth = 0;
      for (int32_t r = 0; r < n_rows; ++r) {
        if (used[r]) continue;
        int64_t growth = 0;
        const uint64_t* sr = &sup[(size_t)r * W];
        for (int32_t w = 0; w < W; ++w)
          growth += __builtin_popcountll(sr[w] & ~u[w]);
        if (best < 0 || growth < best_growth) {
          best = r;
          best_growth = growth;
        }
      }
      if (best < 0) break;
      used[best] = 1;
      const uint64_t* sb = &sup[(size_t)best * W];
      for (int32_t w = 0; w < W; ++w) u[w] |= sb[w];
      perm[out++] = best;
    }
  }
  return out == n_rows ? 0 : -1;
}

}  // extern "C"
