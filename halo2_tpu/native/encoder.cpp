// Native witness-encoding runtime for halo2_tpu.
//
// The reference's host-side hot loops are Rust (witness collection,
// helpers.rs mmap IO, the counting sort at prover.rs:164-200). The
// TPU stack's equivalents live here as a C++ CPython extension:
//   * encode_mont:  canonical 256-bit values (little-endian u64 x4 rows)
//                   -> Montgomery-form 16x16-bit limb planes (uint32),
//                   i.e. the device layout, with the xR mod p multiply
//                   done in fixed 4x64 CIOS Montgomery arithmetic.
//   * decode_mont:  the inverse (Montgomery -> canonical u64 x4 rows).
//   * counting_sort_u32: the range-check sort (prover.rs:164-200).
//
// Bit-exactness vs the Python/bigint path is covered by tests.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstdint>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using u128 = __uint128_t;

struct Fp {
    u64 p[4];
    u64 pinv;   // -p^{-1} mod 2^64
    u64 r2[4];  // R^2 mod p
};

static inline void mont_mul(const Fp& f, const u64 a[4], const u64 b[4], u64 out[4]) {
    // CIOS Montgomery multiplication, 4x64 limbs
    u64 t[5] = {0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)a[i] * b[j] + t[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u64 t4 = (u64)((u128)t[4] + carry);
        u64 extra = (u64)(((u128)t[4] + carry) >> 64);

        u64 m = t[0] * f.pinv;
        u128 cur = (u128)m * f.p[0] + t[0];
        carry = cur >> 64;
        for (int j = 1; j < 4; j++) {
            cur = (u128)m * f.p[j] + t[j] + carry;
            t[j - 1] = (u64)cur;
            carry = cur >> 64;
        }
        cur = (u128)t4 + carry;
        t[3] = (u64)cur;
        t[4] = extra + (u64)(cur >> 64);
    }
    // conditional subtract
    u64 borrow = 0;
    u64 res[4];
    for (int j = 0; j < 4; j++) {
        u128 cur = (u128)t[j] - f.p[j] - borrow;
        res[j] = (u64)cur;
        borrow = (cur >> 64) ? 1 : 0;
    }
    bool ge = t[4] || !borrow;
    for (int j = 0; j < 4; j++) out[j] = ge ? res[j] : t[j];
}

static void parse_fp(PyObject* tup, Fp& f) {
    // (p0..p3, pinv, r2_0..r2_3) as Python ints
    for (int i = 0; i < 4; i++)
        f.p[i] = PyLong_AsUnsignedLongLong(PyTuple_GetItem(tup, i));
    f.pinv = PyLong_AsUnsignedLongLong(PyTuple_GetItem(tup, 4));
    for (int i = 0; i < 4; i++)
        f.r2[i] = PyLong_AsUnsignedLongLong(PyTuple_GetItem(tup, 5 + i));
}

// encode_mont(values_bytes: bytes (N*32, little-endian), consts) -> bytes
// output: 16 planes of N uint32 (limb-major, ready for (16, N) reshape)
static PyObject* encode_mont(PyObject*, PyObject* args) {
    Py_buffer buf;
    PyObject* consts;
    if (!PyArg_ParseTuple(args, "y*O", &buf, &consts)) return nullptr;
    Fp f;
    parse_fp(consts, f);
    Py_ssize_t n = buf.len / 32;
    const u64* in = (const u64*)buf.buf;

    PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, n * 16 * 4);
    if (!out_bytes) { PyBuffer_Release(&buf); return nullptr; }
    uint32_t* out = (uint32_t*)PyBytes_AsString(out_bytes);

    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < n; i++) {
        u64 v[4], m[4];
        memcpy(v, in + 4 * i, 32);
        mont_mul(f, v, f.r2, m);  // v * R mod p
        for (int limb = 0; limb < 16; limb++) {
            out[(Py_ssize_t)limb * n + i] =
                (uint32_t)((m[limb / 4] >> (16 * (limb % 4))) & 0xFFFF);
        }
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&buf);
    return out_bytes;
}

// decode_mont(limb_bytes: bytes (16 planes of N u32), consts) -> bytes (N*32)
static PyObject* decode_mont(PyObject*, PyObject* args) {
    Py_buffer buf;
    PyObject* consts;
    if (!PyArg_ParseTuple(args, "y*O", &buf, &consts)) return nullptr;
    Fp f;
    parse_fp(consts, f);
    Py_ssize_t n = buf.len / (16 * 4);
    const uint32_t* in = (const uint32_t*)buf.buf;

    PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, n * 32);
    if (!out_bytes) { PyBuffer_Release(&buf); return nullptr; }
    u64* out = (u64*)PyBytes_AsString(out_bytes);

    Py_BEGIN_ALLOW_THREADS
    u64 one[4] = {1, 0, 0, 0};
    for (Py_ssize_t i = 0; i < n; i++) {
        u64 v[4] = {0, 0, 0, 0};
        for (int limb = 0; limb < 16; limb++) {
            v[limb / 4] |= (u64)(in[(Py_ssize_t)limb * n + i] & 0xFFFF)
                           << (16 * (limb % 4));
        }
        u64 m[4];
        mont_mul(f, v, one, m);  // v / R mod p (Montgomery reduce)
        memcpy(out + 4 * i, m, 32);
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&buf);
    return out_bytes;
}

// counting_sort_u32(values: bytes of u32, min, max) -> bytes sorted
static PyObject* counting_sort_u32(PyObject*, PyObject* args) {
    Py_buffer buf;
    unsigned long mn, mx;
    if (!PyArg_ParseTuple(args, "y*kk", &buf, &mn, &mx)) return nullptr;
    Py_ssize_t n = buf.len / 4;
    const uint32_t* in = (const uint32_t*)buf.buf;

    std::vector<Py_ssize_t> counts(mx - mn + 1, 0);
    for (Py_ssize_t i = 0; i < n; i++) {
        uint32_t v = in[i];
        if (v < mn || v > mx) {
            PyBuffer_Release(&buf);
            PyErr_Format(PyExc_ValueError, "value %u outside [%lu, %lu]",
                         v, mn, mx);
            return nullptr;
        }
        counts[v - mn]++;
    }
    PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, n * 4);
    if (!out_bytes) { PyBuffer_Release(&buf); return nullptr; }
    uint32_t* out = (uint32_t*)PyBytes_AsString(out_bytes);
    Py_ssize_t pos = 0;
    for (size_t b = 0; b < counts.size(); b++)
        for (Py_ssize_t c = 0; c < counts[b]; c++)
            out[pos++] = (uint32_t)(mn + b);
    PyBuffer_Release(&buf);
    return out_bytes;
}

// longs_to_blob(values: list[int]) -> bytes (N*32 little-endian rows).
// The witness hot path for degraded (bigint) columns: converting 1M
// Python ints with int.to_bytes costs ~2 s in the interpreter; this
// loop does the same export through the CPython long API in ~0.05 s.
// Values must be nonnegative and < 2^256 (the witness-column contract
// keeps them < p); anything else raises and the caller falls back to
// the Python join.
static PyObject* longs_to_blob(PyObject*, PyObject* args) {
    PyObject* list;
    if (!PyArg_ParseTuple(args, "O!", &PyList_Type, &list)) return nullptr;
    Py_ssize_t n = PyList_GET_SIZE(list);
    PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, n * 32);
    if (!out_bytes) return nullptr;
    unsigned char* out = (unsigned char*)PyBytes_AsString(out_bytes);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject* v = PyList_GET_ITEM(list, i);
        if (!PyLong_Check(v)) {
            Py_DECREF(out_bytes);
            PyErr_SetString(PyExc_TypeError, "longs_to_blob: not an int");
            return nullptr;
        }
        if (_PyLong_AsByteArray((PyLongObject*)v, out + 32 * i, 32,
                                /*little_endian=*/1, /*is_signed=*/0) < 0) {
            Py_DECREF(out_bytes);
            return nullptr;  // OverflowError / negative
        }
    }
    return out_bytes;
}

static PyMethodDef methods[] = {
    {"encode_mont", encode_mont, METH_VARARGS,
     "canonical value bytes -> Montgomery limb planes"},
    {"longs_to_blob", longs_to_blob, METH_VARARGS,
     "list of ints -> 32-byte little-endian rows"},
    {"decode_mont", decode_mont, METH_VARARGS,
     "Montgomery limb planes -> canonical value bytes"},
    {"counting_sort_u32", counting_sort_u32, METH_VARARGS,
     "range-check counting sort"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moddef = {
    PyModuleDef_HEAD_INIT, "_native", "halo2_tpu native runtime", -1, methods,
};

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&moddef); }
