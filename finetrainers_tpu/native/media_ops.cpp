// Native media preprocessing ops (CPython C API, no pybind11).
//
// The reference delegates all native-performance work to external binaries
// (SURVEY.md §2.9); its video decode path (decord/torchvision) hands uint8 HWC
// frames to Python-side tensor conversion. Here the hot host-side transform —
// uint8 HWC -> float32 CHW normalized to [-1, 1] — is a fused multithreaded C++
// kernel: one pass over memory, no intermediate allocations, scales with cores.
// This is the bandwidth-bound step between the cv2 decoder and device upload.
//
// Exposed functions (module `_media_ops`):
//   to_float_chw(frames: ndarray[uint8, (T,H,W,C) or (H,W,C)]) -> ndarray[float32, (T,C,H,W) / (C,H,W)]
//   from_float_chw(frames: ndarray[float32, (T,C,H,W) or (C,H,W)]) -> ndarray[uint8, (...,H,W,C)]

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

constexpr float kScale = 1.0f / 127.5f;

void to_float_worker(const uint8_t* src, float* dst, npy_intp h, npy_intp w,
                     npy_intp c, npy_intp row_begin, npy_intp row_end) {
  // src: HWC contiguous; dst: CHW contiguous.
  const npy_intp plane = h * w;
  for (npy_intp y = row_begin; y < row_end; ++y) {
    const uint8_t* row = src + y * w * c;
    for (npy_intp x = 0; x < w; ++x) {
      for (npy_intp ch = 0; ch < c; ++ch) {
        dst[ch * plane + y * w + x] = static_cast<float>(row[x * c + ch]) * kScale - 1.0f;
      }
    }
  }
}

void from_float_worker(const float* src, uint8_t* dst, npy_intp h, npy_intp w,
                       npy_intp c, npy_intp row_begin, npy_intp row_end) {
  const npy_intp plane = h * w;
  for (npy_intp y = row_begin; y < row_end; ++y) {
    for (npy_intp x = 0; x < w; ++x) {
      for (npy_intp ch = 0; ch < c; ++ch) {
        float v = (src[ch * plane + y * w + x] + 1.0f) * 127.5f;
        v = std::max(0.0f, std::min(255.0f, v));
        dst[y * w * c + x * c + ch] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

template <typename Fn>
void parallel_frames(npy_intp frames, npy_intp rows, Fn&& per_slice) {
  unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
  // One task per (frame, row-chunk); cap threads at frames*4 granularity.
  std::vector<std::thread> pool;
  npy_intp total_rows = frames * rows;
  npy_intp n = std::min<npy_intp>(n_threads, std::max<npy_intp>(1, total_rows / 64));
  npy_intp chunk = (total_rows + n - 1) / n;
  for (npy_intp t = 0; t < n; ++t) {
    npy_intp begin = t * chunk;
    npy_intp end = std::min(total_rows, begin + chunk);
    if (begin >= end) break;
    pool.emplace_back([=]() {
      for (npy_intp r = begin; r < end; ++r) {
        per_slice(r / rows, r % rows, r % rows + 1);
      }
    });
  }
  for (auto& th : pool) th.join();
}

PyObject* to_float_chw(PyObject*, PyObject* arg) {
  PyArrayObject* in = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(arg, NPY_UINT8, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!in) return nullptr;
  int nd = PyArray_NDIM(in);
  if (nd != 3 && nd != 4) {
    Py_DECREF(in);
    PyErr_SetString(PyExc_ValueError, "expected (H,W,C) or (T,H,W,C) uint8 array");
    return nullptr;
  }
  npy_intp t = nd == 4 ? PyArray_DIM(in, 0) : 1;
  npy_intp h = PyArray_DIM(in, nd - 3);
  npy_intp w = PyArray_DIM(in, nd - 2);
  npy_intp c = PyArray_DIM(in, nd - 1);

  npy_intp out_dims4[4] = {t, c, h, w};
  npy_intp out_dims3[3] = {c, h, w};
  PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(nd, nd == 4 ? out_dims4 : out_dims3, NPY_FLOAT32));
  if (!out) {
    Py_DECREF(in);
    return nullptr;
  }
  const uint8_t* src = static_cast<const uint8_t*>(PyArray_DATA(in));
  float* dst = static_cast<float*>(PyArray_DATA(out));
  npy_intp frame_in = h * w * c;
  npy_intp frame_out = c * h * w;

  Py_BEGIN_ALLOW_THREADS
  parallel_frames(t, h, [&](npy_intp frame, npy_intp row_begin, npy_intp row_end) {
    to_float_worker(src + frame * frame_in, dst + frame * frame_out, h, w, c, row_begin, row_end);
  });
  Py_END_ALLOW_THREADS

  Py_DECREF(in);
  return reinterpret_cast<PyObject*>(out);
}

PyObject* from_float_chw(PyObject*, PyObject* arg) {
  PyArrayObject* in = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(arg, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!in) return nullptr;
  int nd = PyArray_NDIM(in);
  if (nd != 3 && nd != 4) {
    Py_DECREF(in);
    PyErr_SetString(PyExc_ValueError, "expected (C,H,W) or (T,C,H,W) float32 array");
    return nullptr;
  }
  npy_intp t = nd == 4 ? PyArray_DIM(in, 0) : 1;
  npy_intp c = PyArray_DIM(in, nd - 3);
  npy_intp h = PyArray_DIM(in, nd - 2);
  npy_intp w = PyArray_DIM(in, nd - 1);

  npy_intp out_dims4[4] = {t, h, w, c};
  npy_intp out_dims3[3] = {h, w, c};
  PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(nd, nd == 4 ? out_dims4 : out_dims3, NPY_UINT8));
  if (!out) {
    Py_DECREF(in);
    return nullptr;
  }
  const float* src = static_cast<const float*>(PyArray_DATA(in));
  uint8_t* dst = static_cast<uint8_t*>(PyArray_DATA(out));
  npy_intp frame_in = c * h * w;
  npy_intp frame_out = h * w * c;

  Py_BEGIN_ALLOW_THREADS
  parallel_frames(t, h, [&](npy_intp frame, npy_intp row_begin, npy_intp row_end) {
    from_float_worker(src + frame * frame_in, dst + frame * frame_out, h, w, c, row_begin, row_end);
  });
  Py_END_ALLOW_THREADS

  Py_DECREF(in);
  return reinterpret_cast<PyObject*>(out);
}

PyMethodDef methods[] = {
    {"to_float_chw", to_float_chw, METH_O,
     "uint8 (T,H,W,C)/(H,W,C) -> float32 (T,C,H,W)/(C,H,W) in [-1,1], multithreaded"},
    {"from_float_chw", from_float_chw, METH_O,
     "float32 (T,C,H,W)/(C,H,W) in [-1,1] -> uint8 (T,H,W,C)/(H,W,C), multithreaded"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_media_ops",
                      "Fused native media preprocessing", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__media_ops(void) {
  import_array();
  return PyModule_Create(&module);
}
