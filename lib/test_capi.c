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

    /* params handles + precond-only + Fortran-indexed create
     * (reference surface: amgcl_params_*, amgcl_precond_*,
     * amgcl_solver_create_f; lib/amgcl.h:46-100) */
    amgcl_tpu_handle prm = amgcl_tpu_params_create();
    if (prm <= 0) { fprintf(stderr, "params create failed\n"); return 6; }
    amgcl_tpu_params_sets(prm, "solver.type", "cg");
    amgcl_tpu_params_setf(prm, "solver.tol", 1e-8);
    amgcl_tpu_params_seti(prm, "solver.maxiter", 500);
    amgcl_tpu_params_sets(prm, "precond.class", "relaxation");
    amgcl_tpu_params_sets(prm, "precond.relax.type", "spai0");

    amgcl_tpu_handle hp = amgcl_tpu_solver_create_prm(n, ptr, col, val, prm);
    if (hp <= 0) { fprintf(stderr, "create_prm failed\n"); return 7; }
    for (int64_t i = 0; i < n; ++i) x[i] = 0.0;
    rc = amgcl_tpu_solver_solve(hp, rhs, x, n, &iters, &error);
    if (rc != 0 || error > 1e-6) {
        fprintf(stderr, "prm solve failed: rc=%d err=%g\n", rc, error);
        return 8;
    }
    amgcl_tpu_solver_destroy(hp);

    /* 1-based (Fortran) arrays */
    int64_t *ptr1 = malloc((n + 1) * sizeof(int64_t));
    int64_t *col1 = malloc(3 * n * sizeof(int64_t));
    for (int64_t i = 0; i <= n; ++i) ptr1[i] = ptr[i] + 1;
    for (int64_t i = 0; i < nnz; ++i) col1[i] = col[i] + 1;
    amgcl_tpu_handle hf = amgcl_tpu_solver_create_f(n, ptr1, col1, val, prm);
    if (hf <= 0) { fprintf(stderr, "create_f failed\n"); return 9; }
    for (int64_t i = 0; i < n; ++i) x[i] = 0.0;
    rc = amgcl_tpu_solver_solve(hf, rhs, x, n, &iters, &error);
    if (rc != 0 || error > 1e-6) {
        fprintf(stderr, "f-indexed solve failed: rc=%d err=%g\n", rc, error);
        return 10;
    }
    amgcl_tpu_solver_destroy(hf);

    /* precond-only handle: one application must reduce the residual */
    amgcl_tpu_handle pm = amgcl_tpu_params_create();
    amgcl_tpu_params_sets(pm, "precond.class", "amg");
    amgcl_tpu_params_seti(pm, "precond.coarse_enough", 8);
    amgcl_tpu_handle hprec = amgcl_tpu_precond_create(n, ptr, col, val, pm);
    if (hprec <= 0) { fprintf(stderr, "precond create failed\n"); return 11; }
    amgcl_tpu_precond_report(hprec);
    rc = amgcl_tpu_precond_apply(hprec, rhs, x, n);
    if (rc != 0) { fprintf(stderr, "precond apply failed\n"); return 12; }
    double rnorm = 0.0, bnorm = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double ax = 2.0 * x[i];
        if (i > 0) ax -= x[i - 1];
        if (i < n - 1) ax -= x[i + 1];
        rnorm += (rhs[i] - ax) * (rhs[i] - ax);
        bnorm += rhs[i] * rhs[i];
    }
    printf("precond apply rel resid: %.3e\n", sqrt(rnorm / bnorm));
    if (!(rnorm < bnorm)) {
        fprintf(stderr, "precond apply did not reduce residual\n");
        return 13;
    }
    amgcl_tpu_solver_destroy(hprec);
    amgcl_tpu_solver_destroy(prm);
    amgcl_tpu_solver_destroy(pm);

    printf("OK\n");
    return 0;
}
