// CPython fastcall bindings for the trace-append hot path.
//
// The reference's trace append is a direct C++ call (cuda_trace_append,
// jit.cu:701-861) costing ~2 us/op for its 22.8 ms / 10,444-op re-trace
// (docs/autodiff.rst:386-387). Going through ctypes costs ~1 us of FFI
// per call plus one extra call per dependency for the dirty check; this
// module exposes the hot subset as METH_FASTCALL (~60 ns/call) with the
// dirty check folded INTO the append, which is what lets the Python
// re-trace beat the reference's number. Cold APIs stay on ctypes against
// the same shared object (one dlopen, one state).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>

extern "C" {
uint32_t et_append(int32_t, int32_t, uint64_t, uint32_t, uint32_t, uint32_t,
                   uint32_t);
uint32_t et_append_raw(int32_t, int32_t, uint64_t, uint32_t, uint32_t,
                       uint32_t, uint32_t);
uint32_t et_literal(int32_t, uint64_t, uint64_t);
uint32_t et_data(int32_t, uint64_t);
void et_inc_ref_ext(uint32_t);
void et_dec_ref_ext(uint32_t);
int32_t et_is_dirty(uint32_t);
int32_t et_var_materialized(uint32_t);
}

namespace {

// append(opcode, dtype, size, d0, d1, d2, d3, raw) -> int
//   > 0 : new variable id
//     0 : broadcast-size violation (raw=0 only)
//    -1 : some dependency is dirty -- caller must eval it and retry
//         (the read-after-scatter protocol, jit.cu:719-730)
PyObject *py_append(PyObject *, PyObject *const *args, Py_ssize_t nargs) {
    if (nargs != 8) {
        PyErr_SetString(PyExc_TypeError, "append expects 8 ints");
        return nullptr;
    }
    long long v[8];
    for (int i = 0; i < 8; ++i) {
        v[i] = PyLong_AsLongLong(args[i]);
        if (v[i] == -1 && PyErr_Occurred()) return nullptr;
    }
    uint32_t d[4] = {(uint32_t)v[3], (uint32_t)v[4], (uint32_t)v[5],
                     (uint32_t)v[6]};
    for (int i = 0; i < 4; ++i)
        if (d[i] && et_is_dirty(d[i])) return PyLong_FromLong(-1);
    uint32_t id = v[7]
        ? et_append_raw((int32_t)v[0], (int32_t)v[1], (uint64_t)v[2], d[0],
                        d[1], d[2], d[3])
        : et_append((int32_t)v[0], (int32_t)v[1], (uint64_t)v[2], d[0], d[1],
                    d[2], d[3]);
    return PyLong_FromUnsignedLong(id);
}

// literal(dtype, bits, size) -> id
PyObject *py_literal(PyObject *, PyObject *const *args, Py_ssize_t nargs) {
    if (nargs != 3) {
        PyErr_SetString(PyExc_TypeError, "literal expects 3 ints");
        return nullptr;
    }
    long dtype = PyLong_AsLong(args[0]);
    uint64_t bits = PyLong_AsUnsignedLongLong(args[1]);
    uint64_t size = PyLong_AsUnsignedLongLong(args[2]);
    if (PyErr_Occurred()) return nullptr;
    return PyLong_FromUnsignedLong(et_literal((int32_t)dtype, bits, size));
}

// data(dtype, size) -> id
PyObject *py_data(PyObject *, PyObject *const *args, Py_ssize_t nargs) {
    if (nargs != 2) {
        PyErr_SetString(PyExc_TypeError, "data expects 2 ints");
        return nullptr;
    }
    long dtype = PyLong_AsLong(args[0]);
    uint64_t size = PyLong_AsUnsignedLongLong(args[1]);
    if (PyErr_Occurred()) return nullptr;
    return PyLong_FromUnsignedLong(et_data((int32_t)dtype, size));
}

PyObject *py_dec_ref(PyObject *, PyObject *const *args, Py_ssize_t nargs) {
    if (nargs == 1) et_dec_ref_ext((uint32_t)PyLong_AsUnsignedLong(args[0]));
    Py_RETURN_NONE;
}

PyObject *py_inc_ref(PyObject *, PyObject *const *args, Py_ssize_t nargs) {
    if (nargs == 1) et_inc_ref_ext((uint32_t)PyLong_AsUnsignedLong(args[0]));
    Py_RETURN_NONE;
}

PyObject *py_is_dirty(PyObject *, PyObject *const *args, Py_ssize_t nargs) {
    if (nargs != 1) {
        PyErr_SetString(PyExc_TypeError, "is_dirty expects 1 int");
        return nullptr;
    }
    return PyLong_FromLong(
        et_is_dirty((uint32_t)PyLong_AsUnsignedLong(args[0])));
}

PyObject *py_materialized(PyObject *, PyObject *const *args,
                          Py_ssize_t nargs) {
    if (nargs != 1) {
        PyErr_SetString(PyExc_TypeError, "materialized expects 1 int");
        return nullptr;
    }
    return PyLong_FromLong(
        et_var_materialized((uint32_t)PyLong_AsUnsignedLong(args[0])));
}

PyMethodDef kMethods[] = {
    {"append", (PyCFunction)(void *)py_append, METH_FASTCALL, nullptr},
    {"literal", (PyCFunction)(void *)py_literal, METH_FASTCALL, nullptr},
    {"data", (PyCFunction)(void *)py_data, METH_FASTCALL, nullptr},
    {"dec_ref", (PyCFunction)(void *)py_dec_ref, METH_FASTCALL, nullptr},
    {"inc_ref", (PyCFunction)(void *)py_inc_ref, METH_FASTCALL, nullptr},
    {"is_dirty", (PyCFunction)(void *)py_is_dirty, METH_FASTCALL, nullptr},
    {"materialized", (PyCFunction)(void *)py_materialized, METH_FASTCALL,
     nullptr},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_etnative",
                       "enoki-tpu trace hot path", -1, kMethods,
                       nullptr, nullptr, nullptr, nullptr};

}  // namespace

extern "C" PyObject *PyInit__etnative(void) { return PyModule_Create(&kModule); }
