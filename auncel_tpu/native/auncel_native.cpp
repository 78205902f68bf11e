// Native host-side runtime for auncel_tpu.
//
// The reference implements its entire host runtime in C++; the TPU rebuild
// keeps the device path in XLA/Pallas and uses this small C-ABI library for
// the host-side hot paths:
//   * vecs_strip_headers: .fvecs/.ivecs row-header stripping at memcpy speed
//     (the reference reads these formats in eval/bound.cpp:29-114)
//   * kway_merge_topk: per-query k-way merge of per-shard sorted top-k lists
//     (the reference's dist/reduce.cpp merge, generalized to S shards)
//   * pack_lists: scatter assigned vectors into the padded [nlist, cap, d]
//     inverted-list layout (IndexIVF add path)
//
// Build: make -C auncel_tpu/native   (g++ -O3 -fopenmp -shared)
// Python binding: ctypes (auncel_tpu/native/__init__.py); every entry point
// has a numpy fallback, so the library is an accelerator, not a dependency.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>

extern "C" {

// Strip per-row [int32 dim] headers from a raw .fvecs/.ivecs byte buffer.
// src: n rows of (1 + d) int32-sized items; dst: n * d items.
// Returns 0 on success, -1 on a row whose header != d.
int vecs_strip_headers(const int32_t* src, int64_t n, int64_t d,
                       int32_t* dst) {
  int bad = 0;
#pragma omp parallel for reduction(|| : bad)
  for (int64_t i = 0; i < n; i++) {
    if (src[i * (d + 1)] != d) {
      bad = 1;
      continue;
    }
    std::memcpy(dst + i * d, src + i * (d + 1) + 1, d * sizeof(int32_t));
  }
  return bad ? -1 : 0;
}

// Merge S per-shard sorted top-k lists into one global top-k per query.
// vals: [S, B, k] (sorted best-first per row), ids: [S, B, k] int64.
// lower_is_better: 1 for L2, 0 for IP.
// out_vals: [B, k], out_ids: [B, k].
void kway_merge_topk(const float* vals, const int64_t* ids, int64_t S,
                     int64_t B, int64_t k, int lower_is_better,
                     float* out_vals, int64_t* out_ids) {
  if (S <= 0 || B <= 0 || k <= 0) return;  // public ABI: guard, don't UB
#pragma omp parallel for
  for (int64_t b = 0; b < B; b++) {
    // cursor per shard
    int64_t cur[64];  // supports up to 64 shards; callers chunk beyond that
    for (int64_t s = 0; s < S; s++) cur[s] = 0;
    for (int64_t j = 0; j < k; j++) {
      int64_t best_s = -1;
      float best_v = 0.f;
      for (int64_t s = 0; s < S; s++) {
        if (cur[s] >= k) continue;
        float v = vals[(s * B + b) * k + cur[s]];
        bool better = best_s < 0 ||
                      (lower_is_better ? v < best_v : v > best_v);
        if (better) {
          best_v = v;
          best_s = s;
        }
      }
      out_vals[b * k + j] = best_v;
      out_ids[b * k + j] = ids[(best_s * B + b) * k + cur[best_s]];
      cur[best_s]++;
    }
  }
}

// Scatter vectors (already sorted by list: order/starts precomputed) into
// the padded dense layout. x: [n, d]; order: [n] permutation sorting by
// list; starts: [nlist+1] prefix offsets; vid: [n] global ids.
// db: [nlist, cap, d] zero-initialized; out_ids: [nlist, cap] -1-filled.
void pack_lists(const float* x, const int64_t* vid, const int64_t* order,
                const int64_t* starts, int64_t nlist, int64_t cap,
                int64_t d, float* db, int32_t* out_ids) {
#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t l = 0; l < nlist; l++) {
    int64_t s = starts[l], e = starts[l + 1];
    // clamp to the list capacity: a span beyond cap would memcpy into
    // the NEXT list's slice (and past the buffer on the last list)
    int64_t n_l = e - s;
    if (n_l > cap) n_l = cap;
    for (int64_t j = 0; j < n_l; j++) {
      int64_t v = order[s + j];
      std::memcpy(db + (l * cap + j) * d, x + v * d, d * sizeof(float));
      out_ids[l * cap + j] = (int32_t)vid[v];
    }
  }
}

// Gather scattered rows from a (possibly mmap'd) source into a contiguous
// destination: dst[i] = src[rows[i]], row_bytes each. The parallel loop
// fans mmap page faults out across threads — the capability of the
// reference's pread-thread list prefetcher (OnDiskInvertedLists.h:51
// prefetch_lists), recast for the npy-mmap on-disk layout. Single-thread
// numpy fancy indexing faults and copies rows serially; this overlaps
// both.
void gather_rows(const char* src, const int64_t* rows, int64_t n_rows,
                 int64_t row_bytes, char* dst) {
#pragma omp parallel for schedule(dynamic, 1)
  for (int64_t i = 0; i < n_rows; i++) {
    std::memcpy(dst + i * row_bytes, src + rows[i] * row_bytes, row_bytes);
  }
}

}  // extern "C"
