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
// Swap-refinement pass shared by bs_cluster_rows: deterministic local
// search — for each row in ascending id order, find the swap partner
// (ascending id, strict improvement) minimizing the two groups' total
// union, apply greedily.  `pos_of` maps row -> position in perm.
static void refine_swaps(
    const std::vector<uint64_t>& sup, int32_t n_rows, int32_t W,
    int32_t R, int32_t passes, int32_t* perm) {
  const int32_t groups = (n_rows + R - 1) / R;
  std::vector<int32_t> pos_of(n_rows);
  for (int32_t p = 0; p < n_rows; ++p) pos_of[perm[p]] = p;
  auto group_of = [&](int32_t r) { return pos_of[r] / R; };
  // union popcount of group g with row `skip` removed and `add` added
  // (skip/add may be -1)
  std::vector<uint64_t> u(W);
  auto union_size = [&](int32_t g, int32_t skip, int32_t add) {
    std::fill(u.begin(), u.end(), 0);
    for (int32_t p = g * R; p < std::min((g + 1) * R, n_rows); ++p) {
      int32_t r = perm[p];
      if (r == skip) continue;
      const uint64_t* sr = &sup[(size_t)r * W];
      for (int32_t w = 0; w < W; ++w) u[w] |= sr[w];
    }
    if (add >= 0) {
      const uint64_t* sr = &sup[(size_t)add * W];
      for (int32_t w = 0; w < W; ++w) u[w] |= sr[w];
    }
    int64_t c = 0;
    for (int32_t w = 0; w < W; ++w) c += __builtin_popcountll(u[w]);
    return c;
  };
  for (int32_t pass = 0; pass < passes; ++pass) {
    bool improved = false;
    for (int32_t r = 0; r < n_rows; ++r) {
      int32_t g = group_of(r);
      int64_t base_g = union_size(g, -1, -1);
      int64_t best_delta = 0;
      int32_t best = -1;
      int32_t cached_g2 = -1;
      int64_t base_g2 = 0;
      for (int32_t r2 = r + 1; r2 < n_rows; ++r2) {
        int32_t g2 = group_of(r2);
        if (g2 == g) continue;
        if (g2 != cached_g2) {
          cached_g2 = g2;
          base_g2 = union_size(g2, -1, -1);
        }
        int64_t delta = union_size(g, r, r2) + union_size(g2, r2, r)
            - base_g - base_g2;
        if (delta < best_delta) {
          best_delta = delta;
          best = r2;
        }
      }
      if (best >= 0) {
        std::swap(perm[pos_of[r]], perm[pos_of[best]]);
        std::swap(pos_of[r], pos_of[best]);
        improved = true;
      }
    }
    if (!improved) break;
  }
}

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
  if (out != n_rows) return -1;
  refine_swaps(sup, n_rows, W, R, /*passes=*/2, perm);
  return 0;
}

}  // extern "C"
