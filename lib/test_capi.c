/* Smoke test for the C API: 1D Poisson (tridiagonal), CG + single-level
 * SPAI0, checks convergence. */
#include "amgcl_tpu.h"

#include <stdio.h>
#include <stdlib.h>
#include <math.h>

int main(void) {
    const int64_t n = 64;
    int64_t *ptr = malloc((n + 1) * sizeof(int64_t));
    int64_t *col = malloc(3 * n * sizeof(int64_t));
    double *val = malloc(3 * n * sizeof(double));

    int64_t nnz = 0;
    ptr[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (i > 0) { col[nnz] = i - 1; val[nnz++] = -1.0; }
        col[nnz] = i; val[nnz++] = 2.0;
        if (i < n - 1) { col[nnz] = i + 1; val[nnz++] = -1.0; }
        ptr[i + 1] = nnz;
    }

    const char *params =
        "{\"solver\": {\"type\": \"cg\", \"tol\": 1e-8, \"maxiter\": 500},"
        " \"precond\": {\"class\": \"relaxation\","
        "              \"relax\": {\"type\": \"spai0\"}}}";

    amgcl_tpu_handle h = amgcl_tpu_solver_create(n, ptr, col, val, params);
    if (h <= 0) { fprintf(stderr, "create failed: %lld\n", (long long)h); return 1; }

    double *rhs = malloc(n * sizeof(double));
    double *x = malloc(n * sizeof(double));
    for (int64_t i = 0; i < n; ++i) { rhs[i] = 1.0; x[i] = 0.0; }

    int64_t iters = 0;
    double error = 0.0;
    int rc = amgcl_tpu_solver_solve(h, rhs, x, n, &iters, &error);
    if (rc != 0) { fprintf(stderr, "solve failed: %d\n", rc); return 2; }

    /* check residual */
    double rmax = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double ax = 2.0 * x[i];
        if (i > 0) ax -= x[i - 1];
        if (i < n - 1) ax -= x[i + 1];
        double r = fabs(rhs[i] - ax);
        if (r > rmax) rmax = r;
    }
    printf("iters=%lld error=%.3e max|r|=%.3e\n",
           (long long)iters, error, rmax);
    amgcl_tpu_solver_destroy(h);
    if (rmax > 1e-5) { fprintf(stderr, "residual too large\n"); return 3; }
    /* distributed solver (device-mesh role of the MPI C binding) */
    amgcl_tpu_handle hd = amgcl_tpu_dist_solver_create(
        n, ptr, col, val, 0,
        "{\"solver\": {\"type\": \"cg\", \"tol\": 1e-8},"
        " \"precond\": {\"type\": \"relaxation\"}}");
    if (hd <= 0) { fprintf(stderr, "dist create failed\n"); return 4; }
    for (int64_t i = 0; i < n; ++i) x[i] = 0.0;
    rc = amgcl_tpu_solver_solve(hd, rhs, x, n, &iters, &error);
    if (rc != 0 || error > 1e-6) {
        fprintf(stderr, "dist solve failed: rc=%d err=%g\n", rc, error);
        return 5;
    }
    amgcl_tpu_solver_destroy(hd);

    printf("OK\n");
    return 0;
}
