/* C API for amgcl_tpu — capability parity with the reference C bindings
 * (lib/amgcl.h:44-100): create a solver from raw CSR arrays with
 * JSON-encoded runtime parameters, solve, destroy.
 *
 * The library embeds the Python runtime; set PYTHONPATH so that the
 * amgcl_tpu package (and its virtualenv site-packages) are importable.
 */
#ifndef AMGCL_TPU_C_H
#define AMGCL_TPU_C_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t amgcl_tpu_handle;

/* Build a solver for the n x n CSR matrix (ptr: n+1 int64, col: nnz int64,
 * val: nnz double).  params_json addresses the same dotted parameter tree
 * as the Python API, e.g.
 *   {"solver": {"type": "cg", "tol": 1e-8},
 *    "precond": {"relax": {"type": "spai0"}}}
 * Returns a handle > 0, or < 0 on error. */
amgcl_tpu_handle amgcl_tpu_solver_create(
    int64_t n,
    const int64_t *ptr,
    const int64_t *col,
    const double  *val,
    const char    *params_json);

/* Solve A x = rhs; x holds the initial guess on entry and the solution on
 * exit.  Returns 0 on success; fills iters and error. */
int amgcl_tpu_solver_solve(
    amgcl_tpu_handle h,
    const double *rhs,
    double *x,
    int64_t n,
    int64_t *iters,
    double *error);

void amgcl_tpu_solver_destroy(amgcl_tpu_handle h);

/* Distributed solver over n_shards devices of the local mesh (the role
 * of the reference's MPI C binding amgcl_mpi_create, lib/amgcl_mpi.h:
 * 44-64; the device mesh replaces the MPI communicator).  n_shards = 0
 * uses every visible device.  Solve/destroy via the same handle calls. */
amgcl_tpu_handle amgcl_tpu_dist_solver_create(
    int64_t n,
    const int64_t *ptr,
    const int64_t *col,
    const double  *val,
    int64_t n_shards,
    const char    *params_json);

/* ---- parameter-list handles (reference: amgcl_params_*,
 * lib/amgcl.h:46-63).  Names use the same dotted paths as the JSON
 * config ("solver.tol", "precond.relax.type", ...). ---- */
amgcl_tpu_handle amgcl_tpu_params_create(void);
void amgcl_tpu_params_seti(amgcl_tpu_handle prm, const char *name,
                           int value);
void amgcl_tpu_params_setf(amgcl_tpu_handle prm, const char *name,
                           double value);
void amgcl_tpu_params_sets(amgcl_tpu_handle prm, const char *name,
                           const char *value);
void amgcl_tpu_params_read_json(amgcl_tpu_handle prm, const char *fname);
/* destroy via amgcl_tpu_solver_destroy (handles share one table) */

/* Solver create from a params handle; _f takes 1-based (Fortran)
 * ptr/col arrays (reference: amgcl_solver_create / _create_f). */
amgcl_tpu_handle amgcl_tpu_solver_create_prm(
    int64_t n, const int64_t *ptr, const int64_t *col, const double *val,
    amgcl_tpu_handle prm);
amgcl_tpu_handle amgcl_tpu_solver_create_f(
    int64_t n, const int64_t *ptr, const int64_t *col, const double *val,
    amgcl_tpu_handle prm);

/* ---- preconditioner-only handles (reference: amgcl_precond_*,
 * lib/amgcl.h:64-90) ---- */
amgcl_tpu_handle amgcl_tpu_precond_create(
    int64_t n, const int64_t *ptr, const int64_t *col, const double *val,
    amgcl_tpu_handle prm);
amgcl_tpu_handle amgcl_tpu_precond_create_f(
    int64_t n, const int64_t *ptr, const int64_t *col, const double *val,
    amgcl_tpu_handle prm);
/* x = M^{-1} rhs */
int amgcl_tpu_precond_apply(amgcl_tpu_handle h, const double *rhs,
                            double *x, int64_t n);
/* print hierarchy structure to stdout */
void amgcl_tpu_precond_report(amgcl_tpu_handle h);
/* destroy via amgcl_tpu_solver_destroy */

#ifdef __cplusplus
}
#endif
#endif
