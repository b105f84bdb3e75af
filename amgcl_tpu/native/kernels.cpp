// Native setup kernels for amgcl_tpu.
//
// The solve phase is pure TPU (JAX/XLA); the *setup* phase mirrors the
// reference's CPU-side hierarchy construction (amgcl/amg.hpp:355-360).  Two
// of its passes are inherently sequential and dominate Python setup time at
// scale, so they live here as a small C++ shared library loaded via ctypes:
//
//  * greedy aggregation sweep (capability of
//    amgcl/coarsening/plain_aggregates.hpp:163-191)
//  * IKJ ILU(0) factorization (capability of
//    amgcl/relaxation/ilu0.hpp:123-200)
//  * level-scheduled ordering for triangular factors (capability of
//    amgcl/relaxation/detail/ilu_solve.hpp:132+)
//
// Build: g++ -O3 -march=native -shared -fPIC kernels.cpp -o libamgcltpu.so

#include <cstdint>
#include <vector>
#include <cstring>
#include <unordered_map>

extern "C" {

// Greedy single-pass aggregation. ids[i] must arrive as -1 (undefined) or
// -2 (removed); returns the number of aggregates created (before
// renumbering, which the Python side performs).
int64_t greedy_aggregate(
    const int64_t* indptr,
    const int64_t* indices,
    const uint8_t* strong,
    int64_t* ids,
    int64_t n)
{
    const int64_t UNDEFINED = -1;
    const int64_t REMOVED = -2;
    int64_t count = 0;
    std::vector<int64_t> neib;
    neib.reserve(64);

    for (int64_t i = 0; i < n; ++i) {
        if (ids[i] != UNDEFINED) continue;

        int64_t cur = count++;
        ids[i] = cur;

        neib.clear();
        for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
            int64_t c = indices[j];
            if (strong[j] && ids[c] != REMOVED) {
                ids[c] = cur;
                neib.push_back(c);
            }
        }
        for (size_t t = 0; t < neib.size(); ++t) {
            int64_t c = neib[t];
            for (int64_t j = indptr[c]; j < indptr[c + 1]; ++j) {
                int64_t cc = indices[j];
                if (strong[j] && ids[cc] == UNDEFINED) ids[cc] = cur;
            }
        }
    }
    return count;
}

// IKJ ILU(0): factorizes in place over the CSR pattern of A (indices must
// be sorted per row).  Returns 0 on success, or -(row+1) when a zero/
// missing pivot is found.
int64_t ilu0_factor(
    const int64_t* indptr,
    const int64_t* indices,
    double* data,
    int64_t n)
{
    std::vector<int64_t> dia(n, -1);
    std::vector<int64_t> work(n, -1);  // column -> position map for row i

    for (int64_t i = 0; i < n; ++i) {
        int64_t row_beg = indptr[i], row_end = indptr[i + 1];

        for (int64_t j = row_beg; j < row_end; ++j) work[indices[j]] = j;

        for (int64_t j = row_beg; j < row_end; ++j) {
            int64_t k = indices[j];
            if (k >= i) {
                if (k == i) dia[i] = j;
                break;
            }
            if (dia[k] < 0) return -(i + 1);
            double lik = data[j] / data[dia[k]];
            data[j] = lik;
            for (int64_t t = dia[k] + 1; t < indptr[k + 1]; ++t) {
                int64_t p = work[indices[t]];
                if (p >= 0) data[p] -= lik * data[t];
            }
        }
        if (dia[i] < 0 || data[dia[i]] == 0.0) return -(i + 1);

        for (int64_t j = row_beg; j < row_end; ++j) work[indices[j]] = -1;
    }
    return 0;
}

// Level scheduling of a (strict) triangular CSR factor: computes for each
// row its dependency level; rows within a level can be solved in parallel.
// Writes levels[i]; returns the number of levels.
int64_t level_schedule(
    const int64_t* indptr,
    const int64_t* indices,
    int64_t* levels,
    int64_t n,
    int64_t lower)  // 1 = lower triangular (deps are cols < i), 0 = upper
{
    int64_t nlev = 0;
    if (lower) {
        for (int64_t i = 0; i < n; ++i) {
            int64_t lev = 0;
            for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
                int64_t c = indices[j];
                if (c < i && levels[c] + 1 > lev) lev = levels[c] + 1;
            }
            levels[i] = lev;
            if (lev + 1 > nlev) nlev = lev + 1;
        }
    } else {
        for (int64_t i = n - 1; i >= 0; --i) {
            int64_t lev = 0;
            for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
                int64_t c = indices[j];
                if (c > i && levels[c] + 1 > lev) lev = levels[c] + 1;
            }
            levels[i] = lev;
            if (lev + 1 > nlev) nlev = lev + 1;
        }
    }
    return nlev;
}

}  // extern "C"
