// Native host leg of fill_from_triplets: triplets -> sorted unique-block
// arrays for the block-ELL container.
//
// The numpy chain this replaces (np.add.at / np.unique / np.lexsort,
// ntpoly_tpu/parallel/pmatrix.py) measured ~51 s for 25.7M triplets at
// 524k rows — single-threaded and allocation-heavy.  This is the same
// role the reference's fill plays after its alltoallv (sort + CSR build,
// reference Source/Fortran/distributed_includes/
// FillMatrixFromTripletList.f90:25-46 + triplet_includes/
// SortTripletList.f90): sort by (panel, block-row, block-col), collapse
// duplicates, scatter values into bs x bs blocks — here with host
// threads (thread-local sorted runs + pairwise merges, boundary-aligned
// parallel accumulation).
//
// Build: ntpoly_tpu/native/build.py (g++ -O3 -shared -fPIC -pthread).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

struct KeyIdx {
  int64_t key;
  int64_t idx;
};

}  // namespace

extern "C" {

// Pass 1: sort triplet indices by (panel, block_row, block_col) packed as
// key = ((bj/pnb) * nb + bi) * nb + bj.  Writes the permutation into
// ``order`` and the sorted keys into ``keys``; returns the number of
// unique blocks.  Caller guarantees nb < 2^21 (key fits int64).
int64_t ntx_fill_sort(const int64_t* rows, const int64_t* cols, int64_t n,
                      int64_t bs, int64_t nb, int64_t pnb, int64_t* order,
                      int64_t* keys) {
  if (n == 0) return 0;
  int nt = hw_threads();
  if (n < 65536) nt = 1;
  std::vector<KeyIdx> buf(static_cast<size_t>(n));
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; ++t) {
      int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
      ts.emplace_back([&, lo, hi] {
        for (int64_t i = lo; i < hi; ++i) {
          int64_t bi = rows[i] / bs, bj = cols[i] / bs;
          buf[i] = {((bj / pnb) * nb + bi) * nb + bj, i};
        }
        std::sort(buf.begin() + lo, buf.begin() + hi,
                  [](const KeyIdx& a, const KeyIdx& b) {
                    return a.key < b.key ||
                           (a.key == b.key && a.idx < b.idx);
                  });
      });
    }
    for (auto& th : ts) th.join();
  }
  // pairwise merge rounds of the nt sorted runs
  std::vector<int64_t> bounds(nt + 1);
  for (int t = 0; t <= nt; ++t) bounds[t] = n * t / nt;
  std::vector<KeyIdx> tmp(static_cast<size_t>(n));
  auto* src = &buf;
  auto* dst = &tmp;
  while (bounds.size() > 2) {
    std::vector<int64_t> nb2;
    std::vector<std::thread> ts;
    for (size_t r = 0; r + 2 < bounds.size(); r += 2) {
      int64_t lo = bounds[r], mid = bounds[r + 1], hi = bounds[r + 2];
      nb2.push_back(lo);
      ts.emplace_back([src, dst, lo, mid, hi] {
        std::merge(src->begin() + lo, src->begin() + mid,
                   src->begin() + mid, src->begin() + hi, dst->begin() + lo,
                   [](const KeyIdx& a, const KeyIdx& b) {
                     return a.key < b.key ||
                            (a.key == b.key && a.idx < b.idx);
                   });
      });
    }
    if (bounds.size() % 2 == 0) {  // odd number of runs: copy the last
      int64_t lo = bounds[bounds.size() - 2], hi = bounds.back();
      nb2.push_back(lo);
      ts.emplace_back([src, dst, lo, hi] {
        std::copy(src->begin() + lo, src->begin() + hi, dst->begin() + lo);
      });
    }
    nb2.push_back(n);
    for (auto& th : ts) th.join();
    std::swap(src, dst);
    bounds = std::move(nb2);
  }
  auto& sorted = *src;
  std::vector<int64_t> ucounts(nt, 0);
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; ++t) {
      int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
      ts.emplace_back([&, t, lo, hi] {
        int64_t u = 0;
        for (int64_t i = lo; i < hi; ++i) {
          order[i] = sorted[i].idx;
          keys[i] = sorted[i].key;
          if (i == 0 || sorted[i].key != sorted[i - 1].key) ++u;
        }
        ucounts[t] = u;
      });
    }
    for (auto& th : ts) th.join();
  }
  int64_t nub = 0;
  for (int64_t c : ucounts) nub += c;
  return nub;
}

// Pass 2: walk the sorted order, collapse duplicate coordinates into
// unique bs x bs blocks, and emit the _build_sharded inputs: sp (panel),
// sr (block row), slot (position within the (panel, row) group), sc
// (block col) — each int64[nub] — plus zeroed-and-accumulated blocks
// (dtype f32 when dt=0 else f64, [nub, bs, bs]).  Returns the capacity
// k = max slot + 1.
int64_t ntx_fill_build(const int64_t* rows, const int64_t* cols,
                       const void* vals, int dt, int64_t n,
                       const int64_t* order, const int64_t* keys, int64_t bs,
                       int64_t nb, int64_t pnb, int64_t* sp, int64_t* sr,
                       int64_t* slot, int64_t* sc, void* blocks) {
  if (n == 0) return 1;
  int nt = hw_threads();
  if (n < 65536) nt = 1;
  // boundary-aligned thread ranges: a range never splits a duplicate run
  std::vector<int64_t> lo_i(nt + 1);
  for (int t = 0; t <= nt; ++t) {
    int64_t i = n * t / nt;
    while (i > 0 && i < n && keys[i] == keys[i - 1]) ++i;
    lo_i[t] = std::min(i, n);
  }
  // unique-count prefix per range
  std::vector<int64_t> upre(nt + 1, 0);
  {
    std::vector<std::thread> ts;
    std::vector<int64_t> uc(nt, 0);
    for (int t = 0; t < nt; ++t)
      ts.emplace_back([&, t] {
        int64_t u = 0;
        for (int64_t i = lo_i[t]; i < lo_i[t + 1]; ++i)
          if (i == lo_i[t] || keys[i] != keys[i - 1]) ++u;
        uc[t] = u;
      });
    for (auto& th : ts) th.join();
    for (int t = 0; t < nt; ++t) upre[t + 1] = upre[t] + uc[t];
  }
  const int64_t bsq = bs * bs;
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; ++t)
      ts.emplace_back([&, t] {
        int64_t u = upre[t] - 1;
        float* bf = static_cast<float*>(blocks);
        double* bd = static_cast<double*>(blocks);
        const float* vf = static_cast<const float*>(vals);
        const double* vd = static_cast<const double*>(vals);
        for (int64_t i = lo_i[t]; i < lo_i[t + 1]; ++i) {
          if (i == lo_i[t] || keys[i] != keys[i - 1]) {
            ++u;
            int64_t bj = keys[i] % nb;
            int64_t bi = (keys[i] / nb) % nb;
            sp[u] = bj / pnb;
            sr[u] = bi;
            sc[u] = bj;
            if (dt == 0)
              std::memset(bf + u * bsq, 0, bsq * sizeof(float));
            else
              std::memset(bd + u * bsq, 0, bsq * sizeof(double));
          }
          int64_t src = order[i];
          int64_t off = u * bsq + (rows[src] % bs) * bs + (cols[src] % bs);
          if (dt == 0)
            bf[off] += vf[src];
          else
            bd[off] += vd[src];
        }
      });
    for (auto& th : ts) th.join();
  }
  // slots: position of each unique block within its (panel, row) group —
  // serial over nub (integer compares only)
  int64_t nub = upre[nt];
  int64_t k = 1;
  int64_t s = 0;
  for (int64_t u = 0; u < nub; ++u) {
    if (u > 0 && sp[u] == sp[u - 1] && sr[u] == sr[u - 1])
      ++s;
    else
      s = 0;
    slot[u] = s;
    if (s + 1 > k) k = s + 1;
  }
  return k;
}

}  // extern "C"
