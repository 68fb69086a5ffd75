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

// ---------------------------------------------------------------------------
// C fast path for LazyArray operator dispatch.
//
// A binary trace op costs ~1.2 us/op through the Python route (dunder
// frame + _bin frame + attribute reads + promotion lookup + append +
// LazyArray.__new__ + three slot writes). binop()/unop() fold all of
// that into one METH_FASTCALL: the LazyArray __slots__ are read/written
// at their fixed member offsets, the dtype promotion is a C table, and
// the result object is built with tp_alloc directly (LazyArray holds
// only ints -- no reference cycles, so skipping GC tracking is sound).
// Scalar operands, dirty dependencies and broadcast violations return
// None: the Python slow path (LazyArray._bin/_record) handles them.
// ---------------------------------------------------------------------------

PyTypeObject *g_lazy = nullptr;       // the LazyArray class
Py_ssize_t g_off_index = 0, g_off_size = 0, g_off_code = 0;
int g_promote[16][16];
int g_ndtypes = 0;

Py_ssize_t member_offset(PyObject *type, const char *name) {
    PyObject *d = PyObject_GetAttrString(type, name);
    if (!d) return -1;
    // __slots__ descriptors are member descriptors carrying the offset
    if (Py_TYPE(d) != &PyMemberDescr_Type) {
        Py_DECREF(d);
        PyErr_SetString(PyExc_TypeError, "expected a __slots__ member");
        return -1;
    }
    Py_ssize_t off = ((PyMemberDescrObject *)d)->d_member->offset;
    Py_DECREF(d);
    return off;
}

// set_class(LazyArray, promote_flat, n_dtypes): one-time wiring
PyObject *py_set_class(PyObject *, PyObject *const *args, Py_ssize_t nargs) {
    if (nargs != 3) {
        PyErr_SetString(PyExc_TypeError, "set_class expects 3 args");
        return nullptr;
    }
    PyObject *cls = args[0];
    Py_ssize_t oi = member_offset(cls, "index");
    Py_ssize_t os = member_offset(cls, "_size");
    Py_ssize_t oc = member_offset(cls, "_code");
    if (oi < 0 || os < 0 || oc < 0) return nullptr;
    long nd = PyLong_AsLong(args[2]);
    if (nd <= 0 || nd > 16) {
        PyErr_SetString(PyExc_ValueError, "n_dtypes out of range");
        return nullptr;
    }
    PyObject *flat = args[1];
    for (long i = 0; i < nd; ++i)
        for (long j = 0; j < nd; ++j) {
            PyObject *v = PySequence_GetItem(flat, i * nd + j);
            if (!v) return nullptr;
            g_promote[i][j] = (int)PyLong_AsLong(v);
            Py_DECREF(v);
        }
    Py_INCREF(cls);
    Py_XDECREF((PyObject *)g_lazy);
    g_lazy = (PyTypeObject *)cls;
    g_off_index = oi;
    g_off_size = os;
    g_off_code = oc;
    g_ndtypes = (int)nd;
    Py_RETURN_NONE;
}

inline PyObject *slot_get(PyObject *o, Py_ssize_t off) {
    return *(PyObject **)((char *)o + off);
}

inline void slot_set_new(PyObject *o, Py_ssize_t off, PyObject *v) {
    *(PyObject **)((char *)o + off) = v;  // o is fresh: no old value
}

PyObject *make_result(uint32_t id, PyObject *size_obj, PyObject *code_obj) {
    PyObject *r = g_lazy->tp_alloc(g_lazy, 0);
    if (!r) return nullptr;
    PyObject *idx = PyLong_FromUnsignedLong(id);
    if (!idx) { Py_DECREF(r); return nullptr; }
    slot_set_new(r, g_off_index, idx);
    Py_INCREF(size_obj);
    slot_set_new(r, g_off_size, size_obj);
    Py_INCREF(code_obj);
    slot_set_new(r, g_off_code, code_obj);
    return r;
}

// make_result that releases the appended native var's ext reference on
// failure (OOM-only today, but the var would otherwise leak for the
// lifetime of the trace).
PyObject *make_result_or_release(uint32_t id, PyObject *size_obj,
                                 PyObject *code_obj) {
    PyObject *r = make_result(id, size_obj, code_obj);
    if (!r) et_dec_ref_ext(id);
    return r;
}

// binop(a, b, opcode, out_code) -> LazyArray | None (caller falls back)
//   out_code: -1 = promote(a._code, b._code), else the fixed dtype code
PyObject *py_binop(PyObject *, PyObject *const *args, Py_ssize_t nargs) {
    if (nargs != 4) {
        PyErr_SetString(PyExc_TypeError, "binop expects 4 args");
        return nullptr;
    }
    PyObject *a = args[0], *b = args[1];
    if (!g_lazy || Py_TYPE(a) != g_lazy || Py_TYPE(b) != g_lazy)
        Py_RETURN_NONE;
    long opcode = PyLong_AsLong(args[2]);
    long out_code = PyLong_AsLong(args[3]);
    if (PyErr_Occurred()) return nullptr;
    PyObject *ai = slot_get(a, g_off_index), *bi = slot_get(b, g_off_index);
    PyObject *as = slot_get(a, g_off_size), *bs = slot_get(b, g_off_size);
    PyObject *ac = slot_get(a, g_off_code), *bc = slot_get(b, g_off_code);
    if (!ai || !bi || !as || !bs || !ac || !bc) Py_RETURN_NONE;
    uint32_t ida = (uint32_t)PyLong_AsUnsignedLong(ai);
    uint32_t idb = (uint32_t)PyLong_AsUnsignedLong(bi);
    unsigned long long sa = PyLong_AsUnsignedLongLong(as);
    unsigned long long sb = PyLong_AsUnsignedLongLong(bs);
    long ca = PyLong_AsLong(ac), cb = PyLong_AsLong(bc);
    if (PyErr_Occurred()) { PyErr_Clear(); Py_RETURN_NONE; }
    if (ca < 0 || ca >= g_ndtypes || cb < 0 || cb >= g_ndtypes)
        Py_RETURN_NONE;
    long dc = out_code >= 0 ? out_code : g_promote[ca][cb];
    if ((ida && et_is_dirty(ida)) || (idb && et_is_dirty(idb)))
        Py_RETURN_NONE;  // slow path evals the pending scatter + retries
    uint32_t id = et_append((int32_t)opcode, (int32_t)dc,
                            sa >= sb ? sa : sb, ida, idb, 0, 0);
    if (id == 0 || id == (uint32_t)-1) Py_RETURN_NONE;
    PyObject *size_obj = sa >= sb ? as : bs;
    PyObject *code_obj = dc == ca ? ac : (dc == cb ? bc : nullptr);
    if (code_obj) return make_result_or_release(id, size_obj, code_obj);
    PyObject *co = PyLong_FromLong(dc);
    if (!co) { et_dec_ref_ext(id); return nullptr; }
    PyObject *r = make_result_or_release(id, size_obj, co);
    Py_DECREF(co);
    return r;
}

// unop(a, opcode, out_code) -> LazyArray | None
PyObject *py_unop(PyObject *, PyObject *const *args, Py_ssize_t nargs) {
    if (nargs != 3) {
        PyErr_SetString(PyExc_TypeError, "unop expects 3 args");
        return nullptr;
    }
    PyObject *a = args[0];
    if (!g_lazy || Py_TYPE(a) != g_lazy) Py_RETURN_NONE;
    long opcode = PyLong_AsLong(args[1]);
    long out_code = PyLong_AsLong(args[2]);
    if (PyErr_Occurred()) return nullptr;
    PyObject *ai = slot_get(a, g_off_index);
    PyObject *as = slot_get(a, g_off_size);
    PyObject *ac = slot_get(a, g_off_code);
    if (!ai || !as || !ac) Py_RETURN_NONE;
    uint32_t ida = (uint32_t)PyLong_AsUnsignedLong(ai);
    unsigned long long sa = PyLong_AsUnsignedLongLong(as);
    long ca = PyLong_AsLong(ac);
    if (PyErr_Occurred()) { PyErr_Clear(); Py_RETURN_NONE; }
    long dc = out_code >= 0 ? out_code : ca;
    if (ida && et_is_dirty(ida)) Py_RETURN_NONE;
    uint32_t id = et_append((int32_t)opcode, (int32_t)dc, sa, ida, 0, 0, 0);
    if (id == 0 || id == (uint32_t)-1) Py_RETURN_NONE;
    if (dc == ca) return make_result_or_release(id, as, ac);
    PyObject *co = PyLong_FromLong(dc);
    if (!co) { et_dec_ref_ext(id); return nullptr; }
    PyObject *r = make_result_or_release(id, as, co);
    Py_DECREF(co);
    return r;
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
    {"set_class", (PyCFunction)(void *)py_set_class, METH_FASTCALL, nullptr},
    {"binop", (PyCFunction)(void *)py_binop, METH_FASTCALL, nullptr},
    {"unop", (PyCFunction)(void *)py_unop, METH_FASTCALL, nullptr},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_etnative",
                       "enoki-tpu trace hot path", -1, kMethods,
                       nullptr, nullptr, nullptr, nullptr};

}  // namespace

extern "C" PyObject *PyInit__etnative(void) { return PyModule_Create(&kModule); }
