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

#ifdef __cplusplus
}
#endif
#endif
