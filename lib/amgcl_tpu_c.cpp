// C ABI implementation — embeds the Python runtime and delegates to
// amgcl_tpu.capi (capability parity with the reference's lib/amgcl.cpp,
// which compiles the header-only C++ library behind a C interface; here
// the "library" is the Python/JAX framework, so the C layer is an
// embedding shim and all marshaling is zero-copy via buffer addresses).
//
// Build: see build.sh (g++ + python3-config --embed).

#include "amgcl_tpu.h"

#include <Python.h>
#include <cstdarg>
#include <cstdio>
#include <mutex>

namespace {

std::mutex g_lock;
PyObject *g_capi = nullptr;

bool ensure_python() {
    if (g_capi) return true;
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
    }
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *mod = PyImport_ImportModule("amgcl_tpu.capi");
    if (!mod) {
        PyErr_Print();
        PyGILState_Release(st);
        return false;
    }
    g_capi = mod;
    PyGILState_Release(st);
    return true;
}

}  // namespace

extern "C" {

amgcl_tpu_handle amgcl_tpu_solver_create(
    int64_t n,
    const int64_t *ptr,
    const int64_t *col,
    const double *val,
    const char *params_json)
{
    std::lock_guard<std::mutex> guard(g_lock);
    if (!ensure_python()) return -1;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *res = PyObject_CallMethod(
        g_capi, "create", "LLLLs",
        (long long)n,
        (long long)(intptr_t)ptr,
        (long long)(intptr_t)col,
        (long long)(intptr_t)val,
        params_json ? params_json : "");
    amgcl_tpu_handle h = -2;
    if (res) {
        h = (amgcl_tpu_handle)PyLong_AsLongLong(res);
        Py_DECREF(res);
    } else {
        PyErr_Print();
    }
    PyGILState_Release(st);
    return h;
}

int amgcl_tpu_solver_solve(
    amgcl_tpu_handle h,
    const double *rhs,
    double *x,
    int64_t n,
    int64_t *iters,
    double *error)
{
    std::lock_guard<std::mutex> guard(g_lock);
    if (!ensure_python()) return -1;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *res = PyObject_CallMethod(
        g_capi, "solve", "LLLL",
        (long long)h,
        (long long)(intptr_t)rhs,
        (long long)(intptr_t)x,
        (long long)n);
    int rc = -2;
    if (res && PyTuple_Check(res) && PyTuple_Size(res) == 2) {
        if (iters) *iters = PyLong_AsLongLong(PyTuple_GetItem(res, 0));
        if (error) *error = PyFloat_AsDouble(PyTuple_GetItem(res, 1));
        rc = 0;
    } else if (!res) {
        PyErr_Print();
    }
    Py_XDECREF(res);
    PyGILState_Release(st);
    return rc;
}

void amgcl_tpu_solver_destroy(amgcl_tpu_handle h)
{
    std::lock_guard<std::mutex> guard(g_lock);
    if (!ensure_python()) return;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *res = PyObject_CallMethod(g_capi, "destroy", "L", (long long)h);
    Py_XDECREF(res);
    PyGILState_Release(st);
}


amgcl_tpu_handle amgcl_tpu_dist_solver_create(
    int64_t n,
    const int64_t *ptr,
    const int64_t *col,
    const double *val,
    int64_t n_shards,
    const char *params_json)
{
    std::lock_guard<std::mutex> guard(g_lock);
    if (!ensure_python()) return -1;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *res = PyObject_CallMethod(
        g_capi, "create_dist", "LLLLLs",
        (long long)n,
        (long long)(intptr_t)ptr,
        (long long)(intptr_t)col,
        (long long)(intptr_t)val,
        (long long)n_shards,
        params_json ? params_json : "");
    amgcl_tpu_handle h = -2;
    if (res) {
        h = (amgcl_tpu_handle)PyLong_AsLongLong(res);
        Py_DECREF(res);
    } else {
        PyErr_Print();
    }
    PyGILState_Release(st);
    return h;
}

// ---- helpers -------------------------------------------------------

namespace {

amgcl_tpu_handle call_handle(const char *fn, const char *fmt, ...) {
    std::lock_guard<std::mutex> guard(g_lock);
    if (!ensure_python()) return -1;
    PyGILState_STATE st = PyGILState_Ensure();
    va_list ap;
    va_start(ap, fmt);
    PyObject *meth = PyObject_GetAttrString(g_capi, fn);
    PyObject *args = Py_VaBuildValue(fmt, ap);
    va_end(ap);
    amgcl_tpu_handle h = -2;
    if (meth && args) {
        PyObject *res = PyObject_CallObject(meth, args);
        if (res) {
            if (res != Py_None) h = (amgcl_tpu_handle)PyLong_AsLongLong(res);
            else h = 0;
            Py_DECREF(res);
        } else {
            PyErr_Print();
        }
    } else {
        PyErr_Print();
    }
    Py_XDECREF(args);
    Py_XDECREF(meth);
    PyGILState_Release(st);
    return h;
}

}  // namespace

// ---- parameter handles (reference: amgcl_params_*) -----------------

amgcl_tpu_handle amgcl_tpu_params_create(void) {
    return call_handle("params_create", "()");
}

void amgcl_tpu_params_seti(amgcl_tpu_handle prm, const char *name,
                           int value) {
    call_handle("params_seti", "(Lsi)", (long long)prm, name, value);
}

void amgcl_tpu_params_setf(amgcl_tpu_handle prm, const char *name,
                           double value) {
    call_handle("params_setf", "(Lsd)", (long long)prm, name, value);
}

void amgcl_tpu_params_sets(amgcl_tpu_handle prm, const char *name,
                           const char *value) {
    call_handle("params_sets", "(Lss)", (long long)prm, name, value);
}

void amgcl_tpu_params_read_json(amgcl_tpu_handle prm, const char *fname) {
    call_handle("params_read_json", "(Ls)", (long long)prm, fname);
}

// ---- solver/precond creates with params handles --------------------

amgcl_tpu_handle amgcl_tpu_solver_create_prm(
    int64_t n, const int64_t *ptr, const int64_t *col, const double *val,
    amgcl_tpu_handle prm)
{
    return call_handle("create_p", "(LLLLL)", (long long)n,
                       (long long)(intptr_t)ptr, (long long)(intptr_t)col,
                       (long long)(intptr_t)val, (long long)prm);
}

amgcl_tpu_handle amgcl_tpu_solver_create_f(
    int64_t n, const int64_t *ptr, const int64_t *col, const double *val,
    amgcl_tpu_handle prm)
{
    return call_handle("create_f", "(LLLLL)", (long long)n,
                       (long long)(intptr_t)ptr, (long long)(intptr_t)col,
                       (long long)(intptr_t)val, (long long)prm);
}

amgcl_tpu_handle amgcl_tpu_precond_create(
    int64_t n, const int64_t *ptr, const int64_t *col, const double *val,
    amgcl_tpu_handle prm)
{
    return call_handle("precond_create", "(LLLLL)", (long long)n,
                       (long long)(intptr_t)ptr, (long long)(intptr_t)col,
                       (long long)(intptr_t)val, (long long)prm);
}

amgcl_tpu_handle amgcl_tpu_precond_create_f(
    int64_t n, const int64_t *ptr, const int64_t *col, const double *val,
    amgcl_tpu_handle prm)
{
    return call_handle("precond_create_f", "(LLLLL)", (long long)n,
                       (long long)(intptr_t)ptr, (long long)(intptr_t)col,
                       (long long)(intptr_t)val, (long long)prm);
}

int amgcl_tpu_precond_apply(amgcl_tpu_handle h, const double *rhs,
                            double *x, int64_t n)
{
    amgcl_tpu_handle rc = call_handle(
        "precond_apply", "(LLLL)", (long long)h,
        (long long)(intptr_t)rhs, (long long)(intptr_t)x, (long long)n);
    return rc == 0 ? 0 : -1;
}

void amgcl_tpu_precond_report(amgcl_tpu_handle h)
{
    std::lock_guard<std::mutex> guard(g_lock);
    if (!ensure_python()) return;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *res = PyObject_CallMethod(
        g_capi, "precond_report", "L", (long long)h);
    if (res) {
        const char *s = PyUnicode_AsUTF8(res);
        if (s) std::printf("%s\n", s);
        Py_DECREF(res);
    } else {
        PyErr_Print();
    }
    PyGILState_Release(st);
}
}  // extern "C"
