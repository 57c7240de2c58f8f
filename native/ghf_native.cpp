// Native graph-builder for graph_hypernetwork_forge_tpu.
//
// Implements the host-side hot path that feeds the TPU compute graph:
//   - order-preserving relation-text dedup  (reference semantics:
//     dict.fromkeys at models/hypergnn.py:264-268, here one C++ hash pass)
//   - char-level tokenization with codepoint clamp to <128 (reference
//     models/hypergnn.py:66-71), batch-vectorized
//   - CSR build over dst (counting sort) for the neighbor sampler
//   - stable counting-sort of edges by relation id for the Pallas
//     relation-grouped kernel
//
// Pure CPython C API + NumPy C API; built by native/build.py with g++.
// The Python layer (data/encoding.py) falls back to pure-Python/NumPy
// implementations when this module is unavailable.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <cstring>
#include <random>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// Decode one UTF-8 string to clamped char codes (codepoint, clamped to 127).
// Mirrors Python's ord(c) per character; invalid sequences fall back to the
// replacement path byte-by-byte (never crashes).
static void decode_clamped(const char* s, Py_ssize_t n,
                           std::vector<int32_t>* out) {
  out->clear();
  Py_ssize_t i = 0;
  while (i < n) {
    unsigned char b0 = static_cast<unsigned char>(s[i]);
    uint32_t cp = 0;
    int len = 1;
    if (b0 < 0x80) {
      cp = b0;
    } else if ((b0 >> 5) == 0x6 && i + 1 < n) {
      cp = ((b0 & 0x1F) << 6) | (s[i + 1] & 0x3F);
      len = 2;
    } else if ((b0 >> 4) == 0xE && i + 2 < n) {
      cp = ((b0 & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
      len = 3;
    } else if ((b0 >> 3) == 0x1E && i + 3 < n) {
      cp = ((b0 & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
           ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
      len = 4;
    } else {
      cp = b0;  // invalid byte: treat as itself
    }
    out->push_back(cp > 127 ? 127 : static_cast<int32_t>(cp));
    i += len;
  }
  if (out->empty()) out->push_back(0);  // empty string -> [0]
}

// dedup_and_ids(texts: list[str]) -> (unique: list[str], ids: int32[E])
static PyObject* dedup_and_ids(PyObject*, PyObject* args) {
  PyObject* texts;
  if (!PyArg_ParseTuple(args, "O", &texts)) return nullptr;
  PyObject* seq = PySequence_Fast(texts, "texts must be a sequence");
  if (!seq) return nullptr;
  Py_ssize_t e = PySequence_Fast_GET_SIZE(seq);

  npy_intp dims[1] = {e};
  PyObject* ids_arr = PyArray_SimpleNew(1, dims, NPY_INT32);
  if (!ids_arr) {
    Py_DECREF(seq);
    return nullptr;
  }
  int32_t* ids = static_cast<int32_t*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(ids_arr)));

  std::unordered_map<std::string, int32_t> index;
  index.reserve(static_cast<size_t>(e) * 2 + 16);
  PyObject* unique = PyList_New(0);

  for (Py_ssize_t i = 0; i < e; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);  // borrowed
    Py_ssize_t len = 0;
    const char* utf8 = PyUnicode_AsUTF8AndSize(item, &len);
    if (!utf8) {
      Py_DECREF(seq);
      Py_DECREF(ids_arr);
      Py_DECREF(unique);
      return nullptr;
    }
    std::string key(utf8, static_cast<size_t>(len));
    auto it = index.find(key);
    if (it == index.end()) {
      int32_t next = static_cast<int32_t>(index.size());
      index.emplace(std::move(key), next);
      PyList_Append(unique, item);
      ids[i] = next;
    } else {
      ids[i] = it->second;
    }
  }
  Py_DECREF(seq);
  return Py_BuildValue("(NN)", unique, ids_arr);
}

// tokenize_batch(texts: list[str], pad_multiple: int)
//   -> (char_ids: int32[U, L], lengths: int32[U])
static PyObject* tokenize_batch(PyObject*, PyObject* args) {
  PyObject* texts;
  long pad_multiple = 8;
  if (!PyArg_ParseTuple(args, "O|l", &texts, &pad_multiple)) return nullptr;
  if (pad_multiple <= 0) pad_multiple = 1;
  PyObject* seq = PySequence_Fast(texts, "texts must be a sequence");
  if (!seq) return nullptr;
  Py_ssize_t u = PySequence_Fast_GET_SIZE(seq);

  std::vector<std::vector<int32_t>> codes(static_cast<size_t>(u));
  Py_ssize_t max_len = 1;
  for (Py_ssize_t i = 0; i < u; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
    Py_ssize_t len = 0;
    const char* utf8 = PyUnicode_AsUTF8AndSize(item, &len);
    if (!utf8) {
      Py_DECREF(seq);
      return nullptr;
    }
    decode_clamped(utf8, len, &codes[static_cast<size_t>(i)]);
    Py_ssize_t c = static_cast<Py_ssize_t>(codes[static_cast<size_t>(i)].size());
    if (c > max_len) max_len = c;
  }
  Py_DECREF(seq);

  Py_ssize_t l_pad = ((max_len + pad_multiple - 1) / pad_multiple) * pad_multiple;
  npy_intp dims2[2] = {u, l_pad};
  npy_intp dims1[1] = {u};
  PyObject* ids_arr = PyArray_ZEROS(2, dims2, NPY_INT32, 0);
  PyObject* len_arr = PyArray_SimpleNew(1, dims1, NPY_INT32);
  if (!ids_arr || !len_arr) {
    Py_XDECREF(ids_arr);
    Py_XDECREF(len_arr);
    return nullptr;
  }
  int32_t* ids = static_cast<int32_t*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(ids_arr)));
  int32_t* lens = static_cast<int32_t*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(len_arr)));
  for (Py_ssize_t i = 0; i < u; ++i) {
    const auto& c = codes[static_cast<size_t>(i)];
    lens[i] = static_cast<int32_t>(c.size());
    std::memcpy(ids + i * l_pad, c.data(), c.size() * sizeof(int32_t));
  }
  return Py_BuildValue("(NN)", ids_arr, len_arr);
}

// build_csr(dst: int64[E], num_nodes: int) -> (ptr: int64[N+1], eid: int64[E])
// Counting sort: eid lists edge ids grouped by dst, stable.
static PyObject* build_csr(PyObject*, PyObject* args) {
  PyObject* dst_obj;
  long long num_nodes;
  if (!PyArg_ParseTuple(args, "OL", &dst_obj, &num_nodes)) return nullptr;
  PyArrayObject* dst = reinterpret_cast<PyArrayObject*>(PyArray_FROM_OTF(
      dst_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY));
  if (!dst) return nullptr;
  Py_ssize_t e = PyArray_SIZE(dst);
  const int64_t* d = static_cast<const int64_t*>(PyArray_DATA(dst));

  npy_intp dims_ptr[1] = {num_nodes + 1};
  npy_intp dims_eid[1] = {e};
  PyObject* ptr_arr = PyArray_ZEROS(1, dims_ptr, NPY_INT64, 0);
  PyObject* eid_arr = PyArray_SimpleNew(1, dims_eid, NPY_INT64);
  if (!ptr_arr || !eid_arr) {
    Py_DECREF(dst);
    Py_XDECREF(ptr_arr);
    Py_XDECREF(eid_arr);
    return nullptr;
  }
  int64_t* ptr = static_cast<int64_t*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(ptr_arr)));
  int64_t* eid = static_cast<int64_t*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(eid_arr)));

  for (Py_ssize_t i = 0; i < e; ++i) {
    int64_t v = d[i];
    if (v < 0 || v >= num_nodes) {
      Py_DECREF(dst);
      Py_DECREF(ptr_arr);
      Py_DECREF(eid_arr);
      PyErr_Format(PyExc_ValueError, "dst[%zd]=%lld out of range [0, %lld)",
                   i, static_cast<long long>(v),
                   static_cast<long long>(num_nodes));
      return nullptr;
    }
    ptr[v + 1] += 1;
  }
  for (long long v = 0; v < num_nodes; ++v) ptr[v + 1] += ptr[v];
  std::vector<int64_t> cursor(ptr, ptr + num_nodes);
  for (Py_ssize_t i = 0; i < e; ++i) {
    eid[cursor[static_cast<size_t>(d[i])]++] = i;
  }
  Py_DECREF(dst);
  return Py_BuildValue("(NN)", ptr_arr, eid_arr);
}

// sort_by_relation(rel: int32[E], num_rel: int) -> order: int64[E]
// Stable counting-sort argsort (O(E + U)) for the relation-grouped kernel.
static PyObject* sort_by_relation(PyObject*, PyObject* args) {
  PyObject* rel_obj;
  long long num_rel;
  if (!PyArg_ParseTuple(args, "OL", &rel_obj, &num_rel)) return nullptr;
  PyArrayObject* rel = reinterpret_cast<PyArrayObject*>(PyArray_FROM_OTF(
      rel_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY));
  if (!rel) return nullptr;
  Py_ssize_t e = PyArray_SIZE(rel);
  const int32_t* r = static_cast<const int32_t*>(PyArray_DATA(rel));

  npy_intp dims[1] = {e};
  PyObject* order_arr = PyArray_SimpleNew(1, dims, NPY_INT64);
  if (!order_arr) {
    Py_DECREF(rel);
    return nullptr;
  }
  int64_t* order = static_cast<int64_t*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(order_arr)));

  std::vector<int64_t> counts(static_cast<size_t>(num_rel) + 1, 0);
  for (Py_ssize_t i = 0; i < e; ++i) {
    int32_t v = r[i];
    if (v < 0 || v >= num_rel) {
      Py_DECREF(rel);
      Py_DECREF(order_arr);
      PyErr_Format(PyExc_ValueError, "rel[%zd]=%d out of range [0, %lld)", i,
                   v, static_cast<long long>(num_rel));
      return nullptr;
    }
    counts[static_cast<size_t>(v) + 1] += 1;
  }
  for (long long v = 0; v < num_rel; ++v) counts[v + 1] += counts[v];
  for (Py_ssize_t i = 0; i < e; ++i) {
    order[counts[static_cast<size_t>(r[i])]++] = i;
  }
  Py_DECREF(rel);
  return order_arr;
}

// sample_hop(ptr: int64[N+1], eid: int64[E], frontier: int64[F],
//            fanout: int, seed: uint64) -> int64[] chosen edge ids
// One neighbor-sampling hop: for each frontier node take all in-edges if
// degree <= fanout, else a uniform sample without replacement (Floyd's
// algorithm). Edge ids across nodes are disjoint (one dst per edge), so the
// concatenated result is duplicate-free.
static PyObject* sample_hop(PyObject*, PyObject* args) {
  PyObject *ptr_obj, *eid_obj, *frontier_obj;
  long long fanout;
  unsigned long long seed;
  if (!PyArg_ParseTuple(args, "OOOLK", &ptr_obj, &eid_obj, &frontier_obj,
                        &fanout, &seed))
    return nullptr;
  PyArrayObject* ptr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(ptr_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY));
  PyArrayObject* eid = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(eid_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY));
  PyArrayObject* frontier = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(frontier_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY));
  if (!ptr || !eid || !frontier) {
    Py_XDECREF(ptr);
    Py_XDECREF(eid);
    Py_XDECREF(frontier);
    return nullptr;
  }
  const int64_t* p = static_cast<const int64_t*>(PyArray_DATA(ptr));
  const int64_t* e = static_cast<const int64_t*>(PyArray_DATA(eid));
  const int64_t* f = static_cast<const int64_t*>(PyArray_DATA(frontier));
  Py_ssize_t n_nodes = PyArray_SIZE(ptr) - 1;
  Py_ssize_t n_frontier = PyArray_SIZE(frontier);

  std::mt19937_64 gen(seed);
  std::vector<int64_t> out;
  out.reserve(static_cast<size_t>(n_frontier) *
              static_cast<size_t>(fanout > 0 ? fanout : 1));
  std::unordered_set<int64_t> picked;
  for (Py_ssize_t i = 0; i < n_frontier; ++i) {
    int64_t v = f[i];
    if (v < 0 || v >= n_nodes) {
      Py_DECREF(ptr);
      Py_DECREF(eid);
      Py_DECREF(frontier);
      PyErr_Format(PyExc_ValueError, "frontier[%zd]=%lld out of range", i,
                   static_cast<long long>(v));
      return nullptr;
    }
    int64_t lo = p[v], hi = p[v + 1];
    int64_t deg = hi - lo;
    if (deg <= fanout) {
      for (int64_t j = lo; j < hi; ++j) out.push_back(e[j]);
    } else {
      // Floyd's sampling: fanout distinct offsets in [0, deg).
      picked.clear();
      for (int64_t j = deg - fanout; j < deg; ++j) {
        std::uniform_int_distribution<int64_t> dist(0, j);
        int64_t t = dist(gen);
        if (!picked.insert(t).second) picked.insert(j), t = j;
        out.push_back(e[lo + t]);
      }
    }
  }
  Py_DECREF(ptr);
  Py_DECREF(eid);
  Py_DECREF(frontier);

  npy_intp dims[1] = {static_cast<npy_intp>(out.size())};
  PyObject* arr = PyArray_SimpleNew(1, dims, NPY_INT64);
  if (!arr) return nullptr;
  std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)), out.data(),
              out.size() * sizeof(int64_t));
  return arr;
}

static PyMethodDef Methods[] = {
    {"dedup_and_ids", dedup_and_ids, METH_VARARGS,
     "Order-preserving dedup of texts -> (unique, int32 ids)."},
    {"tokenize_batch", tokenize_batch, METH_VARARGS,
     "Tokenize texts -> (int32 [U, L] clamped codepoints, int32 [U] lengths)."},
    {"build_csr", build_csr, METH_VARARGS,
     "Counting-sort CSR over dst -> (int64 ptr [N+1], int64 eid [E])."},
    {"sort_by_relation", sort_by_relation, METH_VARARGS,
     "Stable counting argsort of relation ids -> int64 order [E]."},
    {"sample_hop", sample_hop, METH_VARARGS,
     "One neighbor-sampling hop over CSR -> int64 chosen edge ids."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_ghf_native",
    "Native graph-builder hot path for graph_hypernetwork_forge_tpu.",
    -1, Methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__ghf_native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
