// Native greedy row-clustering for BSMR reordering.
//
// C++/OpenMP replacement for the hot preprocessing loop (the reference
// runs this on-GPU with dynamic parallelism and per-row spinlocks,
// src/rowReordering.cu:325-432; the TPU-native framework keeps clustering
// host-side, and this module is its production implementation — the
// NumPy/SciPy version in reorder.py is the readable fallback/spec).
//
// Inputs are the L2-normalized row encodings in CSR form, rows already
// sorted ascending by dispersion. Similarity is the normalized weighted
// Jaccard (rowReordering.cu:235-293):
//
//     sim(a, b) = sum_k min(a_hat_k, b_hat_k) / sum_k max(a_hat_k, b_hat_k)
//     sum(max) = ||a_hat||_1 + ||b_hat||_1 - sum(min)
//
// Exposed with a plain C ABI; loaded from Python via ctypes (no pybind11
// in this environment).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// sum_k min(acc[k], row_hat[k]) over the row's support only (min against
// an implicit zero is zero for nonnegative encodings).
inline double sum_min(const double* acc, const int32_t* idx,
                      const double* val, int64_t n) {
    double s = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double a = acc[idx[i]];
        double b = val[i];
        s += a < b ? a : b;
    }
    return s;
}

}  // namespace

extern "C" {

// Greedy clustering with a static representative ("fast" strategy):
// the first unassigned row seeds a cluster; every later unassigned row
// whose similarity with the *seed* encoding exceeds alpha joins.
//
//   R          number of rows (in ascending-dispersion order)
//   indptr     (R+1) CSR offsets into indices/data_hat
//   indices    column-block ids per row entry
//   data_hat   L2-normalized encoding values per entry (float64)
//   l1_hat     (R) L1 norm of each normalized row
//   nblocks    encoding width (number of column blocks)
//   alpha      similarity threshold
//   cluster_out (R) cluster id per row position, 0-based
// Returns the number of clusters.
int64_t bsmr_cluster_fast(int64_t R, const int64_t* indptr,
                          const int32_t* indices, const double* data_hat,
                          const double* l1_hat, int64_t nblocks,
                          double alpha, int64_t* cluster_out) {
    std::vector<int64_t> active(R);
    for (int64_t i = 0; i < R; ++i) active[i] = i;
    std::vector<double> acc(nblocks, 0.0);
    std::vector<int64_t> next;
    next.reserve(R);
    std::vector<uint8_t> hit(R, 0);
    int64_t cid = 0;
    while (!active.empty()) {
        int64_t rep = active[0];
        cluster_out[rep] = cid;
        const int64_t rb = indptr[rep], re = indptr[rep + 1];
        for (int64_t i = rb; i < re; ++i)
            acc[indices[i]] = data_hat[i];
        const double acc_l1 = l1_hat[rep];
        const int64_t n_act = static_cast<int64_t>(active.size());
#pragma omp parallel for schedule(dynamic, 256)
        for (int64_t j = 1; j < n_act; ++j) {
            const int64_t r = active[j];
            // upper bound: smin <= min(l1a, l1r), smax >= max(l1a, l1r),
            // so sim <= min/max — skip the scan when it cannot pass
            const double lo = acc_l1 < l1_hat[r] ? acc_l1 : l1_hat[r];
            const double hi = acc_l1 < l1_hat[r] ? l1_hat[r] : acc_l1;
            if (hi <= 0.0 || lo / hi <= alpha) { hit[j] = 0; continue; }
            const int64_t b = indptr[r], e = indptr[r + 1];
            double smin = sum_min(acc.data(), indices + b, data_hat + b,
                                  e - b);
            double smax = acc_l1 + l1_hat[r] - smin;
            hit[j] = (smax > 0.0 && smin / smax > alpha) ? 1 : 0;
        }
        next.clear();
        for (int64_t j = 1; j < n_act; ++j) {
            if (hit[j]) {
                cluster_out[active[j]] = cid;
            } else {
                next.push_back(active[j]);
            }
        }
        for (int64_t i = rb; i < re; ++i) acc[indices[i]] = 0.0;
        active.swap(next);
        ++cid;
    }
    return cid;
}

// Faithful accumulate-greedy clustering ("exact" strategy, the reference
// bsa_clustering semantics, rowReordering.cu:361-431): scan remaining rows
// in order; a row joining the cluster adds its encoding into the
// representative accumulator, and scanning continues *after* it against
// the updated accumulator.
// data_raw are the *unnormalized* encoding values: the accumulator sums
// raw member encodings (rowReordering.cu:393-397) and is L2-normalized
// once per sweep; candidate rows compare with their normalized data_hat.
int64_t bsmr_cluster_exact(int64_t R, const int64_t* indptr,
                           const int32_t* indices, const double* data_raw,
                           const double* data_hat, const double* l1_hat,
                           int64_t nblocks, double alpha,
                           int64_t* cluster_out) {
    std::vector<int64_t> active(R);
    for (int64_t i = 0; i < R; ++i) active[i] = i;
    std::vector<double> acc(nblocks, 0.0);
    std::vector<double> sims;
    std::vector<int64_t> next;
    std::vector<uint8_t> member;
    int64_t cid = 0;
    while (!active.empty()) {
        const int64_t n_act = static_cast<int64_t>(active.size());
        member.assign(n_act, 0);
        member[0] = 1;
        const int64_t rep = active[0];
        cluster_out[rep] = cid;
        std::fill(acc.begin(), acc.end(), 0.0);
        {
            const int64_t b = indptr[rep], e = indptr[rep + 1];
            for (int64_t i = b; i < e; ++i)
                acc[indices[i]] = data_raw[i];
        }
        int64_t scan = 1;
        while (scan < n_act) {
            // normalize acc once per sweep
            double l2sq = 0.0;
#pragma omp parallel for reduction(+ : l2sq)
            for (int64_t k = 0; k < nblocks; ++k) l2sq += acc[k] * acc[k];
            const double inv_l2 = l2sq > 0.0 ? 1.0 / std::sqrt(l2sq) : 0.0;
            double acc_l1 = 0.0;
#pragma omp parallel for reduction(+ : acc_l1)
            for (int64_t k = 0; k < nblocks; ++k) acc_l1 += acc[k];
            acc_l1 *= inv_l2;
            // find the first row beyond `scan` that joins
            int64_t first_hit = -1;
#pragma omp parallel
            {
                int64_t local_hit = -1;
#pragma omp for schedule(dynamic, 256)
                for (int64_t j = scan; j < n_act; ++j) {
                    // only skip iterations we know are past our local hit
                    if (local_hit >= 0 && j > local_hit) continue;
                    const int64_t r = active[j];
                    const double lo =
                        acc_l1 < l1_hat[r] ? acc_l1 : l1_hat[r];
                    const double hi =
                        acc_l1 < l1_hat[r] ? l1_hat[r] : acc_l1;
                    if (hi <= 0.0 || lo / hi <= alpha) continue;
                    const int64_t b = indptr[r], e = indptr[r + 1];
                    double smin = 0.0;
                    for (int64_t i = b; i < e; ++i) {
                        double a = acc[indices[i]] * inv_l2;
                        double v = data_hat[i];
                        smin += a < v ? a : v;
                    }
                    double smax = acc_l1 + l1_hat[r] - smin;
                    if (smax > 0.0 && smin / smax > alpha) local_hit = j;
                }
#pragma omp critical
                {
                    if (local_hit >= 0 &&
                        (first_hit < 0 || local_hit < first_hit))
                        first_hit = local_hit;
                }
            }
            if (first_hit < 0) break;
            const int64_t r = active[first_hit];
            cluster_out[r] = cid;
            member[first_hit] = 1;
            const int64_t b = indptr[r], e = indptr[r + 1];
            for (int64_t i = b; i < e; ++i)
                acc[indices[i]] += data_raw[i];
            scan = first_hit + 1;
        }
        next.clear();
        for (int64_t j = 0; j < n_act; ++j)
            if (!member[j]) next.push_back(active[j]);
        active.swap(next);
        ++cid;
    }
    return cid;
}

}  // extern "C"
