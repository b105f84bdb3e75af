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

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <vector>

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

// ILUT(p, tau): row-wise IKJ with a sparse accumulator (capability of
// amgcl/relaxation/ilut.hpp:55-198,330-378).  Per row i:
//   tol  = tau * sum|a_ij| / (lenL + lenU)
//   eliminate against finished U rows in ascending column order
//   (fill-in included); l_ik = w_k * Dinv[k]; skip the update when
//   |l_ik| <= tol;
//   keep the int(lenL*p) largest L entries with |.| > tol, the diagonal
//   (inverted into Dinv), and the int(lenU*p)-1 largest strict-upper
//   entries with |.| > tol.
// Outputs are caller-allocated with capacities Lcap = sum(int(lenL*p)),
// Ucap = sum(int(lenU*p)).  Returns 0, or -(i+1) on a zero pivot at row i.
int64_t ilut_factor(
    const int64_t* indptr,
    const int64_t* indices,
    const double* data,
    int64_t n,
    double p,
    double tau,
    int64_t* Lptr, int64_t* Lcol, double* Lval,
    int64_t* Uptr, int64_t* Ucol, double* Uval,
    double* Dinv)
{
    std::vector<double> w(n, 0.0);
    std::vector<int64_t> pos(n, -1);      // col -> slot in nzcols, or -1
    std::vector<int64_t> nzcols;          // nonzero pattern of current row
    nzcols.reserve(256);
    std::priority_queue<int64_t, std::vector<int64_t>,
                        std::greater<int64_t>> q;   // ascending cols < i

    int64_t Lhead = 0, Uhead = 0;
    Lptr[0] = 0;
    Uptr[0] = 0;

    std::vector<int64_t> keep;            // indices into nzcols
    keep.reserve(256);

    for (int64_t i = 0; i < n; ++i) {
        int64_t lenL = 0, lenU = 0;
        double row_norm = 0.0;

        for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
            int64_t c = indices[j];
            w[c] = data[j];
            pos[c] = (int64_t)nzcols.size();
            nzcols.push_back(c);
            row_norm += std::fabs(data[j]);
            if (c < i) { ++lenL; q.push(c); }
            else if (c > i) ++lenU;
        }
        double tol = (lenL + lenU) ? tau * row_norm / (lenL + lenU) : 0.0;

        while (!q.empty()) {
            int64_t k = q.top(); q.pop();
            double lik = w[k] * Dinv[k];
            w[k] = lik;
            if (std::fabs(lik) > tol) {
                for (int64_t t = Uptr[k]; t < Uptr[k + 1]; ++t) {
                    int64_t c = Ucol[t];
                    if (pos[c] < 0) {
                        pos[c] = (int64_t)nzcols.size();
                        nzcols.push_back(c);
                        w[c] = 0.0;
                        if (c < i) q.push(c);
                    }
                    w[c] -= lik * Uval[t];
                }
            }
        }

        // --- select: L side -------------------------------------------
        keep.clear();
        for (int64_t c : nzcols)
            if (c < i && std::fabs(w[c]) > tol) keep.push_back(c);
        int64_t lp = (int64_t)(lenL * p);
        if ((int64_t)keep.size() > lp) {
            std::nth_element(
                keep.begin(), keep.begin() + lp, keep.end(),
                [&](int64_t a, int64_t b) {
                    return std::fabs(w[a]) > std::fabs(w[b]);
                });
            keep.resize(lp);
        }
        std::sort(keep.begin(), keep.end());
        for (int64_t c : keep) { Lcol[Lhead] = c; Lval[Lhead] = w[c]; ++Lhead; }
        Lptr[i + 1] = Lhead;

        // --- diagonal --------------------------------------------------
        double dv = (pos[i] >= 0) ? w[i] : 0.0;
        if (dv == 0.0) {
            for (int64_t c : nzcols) { w[c] = 0.0; pos[c] = -1; }
            nzcols.clear();
            return -(i + 1);
        }
        Dinv[i] = 1.0 / dv;

        // --- U side (diagonal consumes one slot of the up budget, as in
        // the reference's move_to: uend = min(m + up, e) with m = dia) ---
        keep.clear();
        for (int64_t c : nzcols)
            if (c > i && std::fabs(w[c]) > tol) keep.push_back(c);
        int64_t up = (int64_t)(lenU * p) - 1;
        if (up < 0) up = 0;
        if ((int64_t)keep.size() > up) {
            std::nth_element(
                keep.begin(), keep.begin() + up, keep.end(),
                [&](int64_t a, int64_t b) {
                    return std::fabs(w[a]) > std::fabs(w[b]);
                });
            keep.resize(up);
        }
        std::sort(keep.begin(), keep.end());
        for (int64_t c : keep) { Ucol[Uhead] = c; Uval[Uhead] = w[c]; ++Uhead; }
        Uptr[i + 1] = Uhead;

        for (int64_t c : nzcols) { w[c] = 0.0; pos[c] = -1; }
        nzcols.clear();
    }
    return 0;
}

}  // extern "C"
