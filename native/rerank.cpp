// Native kernel for the k-reciprocal expansion step of Jaccard re-ranking.
//
// Computes, for every item i of an (n x n) distance matrix with precomputed
// row-wise ranking, the k-reciprocal neighbor expansion set and its
// exp(-d) L1-normalized weights (the "V" rows). This is the published
// k-reciprocal encoding (CVPR'17) step 2+3; the per-item candidate loops are
// irregular pointer-chasing, hence C++ instead of numpy.
//
// Exported C ABI consumed by openibl_tpu/ops/_native.py via ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// k-reciprocal neighbors of `i`: forward top-(k+1) whose own top-(k+1)
// contains i.
void k_reciprocal(const int32_t* rank, int64_t rank_cols, int64_t i,
                  int32_t k, std::vector<int32_t>* out) {
  out->clear();
  const int32_t* fwd = rank + i * rank_cols;
  for (int32_t a = 0; a <= k; ++a) {
    int32_t cand = fwd[a];
    const int32_t* back = rank + static_cast<int64_t>(cand) * rank_cols;
    for (int32_t b = 0; b <= k; ++b) {
      if (back[b] == static_cast<int32_t>(i)) {
        out->push_back(cand);
        break;
      }
    }
  }
}

}  // namespace

namespace {

// Shared expansion loop. When `original` is non-null, emits the exp(-d)
// L1-normalized weights; otherwise emits only the (row, col) index pairs
// (the caller computes values from features — the streaming / no-N^2 path).
int64_t expansion_impl(const float* original, const int32_t* rank, int64_t n,
                       int64_t rank_cols, int32_t k1, int32_t half,
                       int32_t* out_rows, int32_t* out_cols, float* out_vals,
                       int64_t cap) {
  // `half` comes from the caller (np.around(k1/2), half-to-even) so the
  // native and numpy paths and the output-capacity bound always agree
  int64_t written = 0;
  std::vector<int32_t> k_recip, cand_recip, expansion;
  std::vector<char> in_set(n, 0);

  for (int64_t i = 0; i < n; ++i) {
    k_reciprocal(rank, rank_cols, i, k1, &k_recip);
    expansion = k_recip;
    for (char& c : in_set) c = 0;  // reset membership (n is small enough)
    for (int32_t v : k_recip) in_set[v] = 1;

    for (int32_t cand : k_recip) {
      k_reciprocal(rank, rank_cols, cand, half, &cand_recip);
      int64_t overlap = 0;
      for (int32_t v : cand_recip) overlap += in_set[v];
      if (3 * overlap > 2 * static_cast<int64_t>(cand_recip.size())) {
        expansion.insert(expansion.end(), cand_recip.begin(), cand_recip.end());
      }
    }
    std::sort(expansion.begin(), expansion.end());
    expansion.erase(std::unique(expansion.begin(), expansion.end()),
                    expansion.end());

    if (written + static_cast<int64_t>(expansion.size()) > cap) return -1;
    double sum = 0.0;
    const float* row = original ? original + i * n : nullptr;
    if (row) {
      for (int32_t e : expansion) sum += std::exp(-static_cast<double>(row[e]));
    }
    for (int32_t e : expansion) {
      out_rows[written] = static_cast<int32_t>(i);
      out_cols[written] = e;
      if (row) {
        out_vals[written] =
            static_cast<float>(std::exp(-static_cast<double>(row[e])) / sum);
      }
      ++written;
    }
  }
  return written;
}

}  // namespace

extern "C" int64_t expansion_weights(
    const float* original, const int32_t* rank, int64_t n, int64_t rank_cols,
    int32_t k1, int32_t half, int32_t* out_rows, int32_t* out_cols,
    float* out_vals, int64_t cap) {
  return expansion_impl(original, rank, n, rank_cols, k1, half, out_rows,
                        out_cols, out_vals, cap);
}

extern "C" int64_t expansion_sets(
    const int32_t* rank, int64_t n, int64_t rank_cols, int32_t k1,
    int32_t half, int32_t* out_rows, int32_t* out_cols, int64_t cap) {
  return expansion_impl(nullptr, rank, n, rank_cols, k1, half, out_rows,
                        out_cols, nullptr, cap);
}
