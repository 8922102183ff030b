// Native host-side IO + sparse kernels for deflatedmlmc_schwinger_tpu.
//
// Replaces the reference's scipy.io.loadmat + scipy.sparse CSR host path
// (reference: matrix.py:14-31, multigrid.py:552-557) with a self-contained
// C++ implementation:
//   * MAT-file v5 reader (incl. miCOMPRESSED/zlib) for sparse complex
//     matrices -- the ingest path for schwinger16.mat / schwinger128.mat;
//   * CSC->CSR conversion and complex sparse matvec / multi-RHS matmat,
//     used as the fast host oracle against which device kernels validate.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libdmlmc_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct SparseMat {
  int64_t m = 0, n = 0, nnz = 0;
  std::vector<int64_t> ir;   // row indices (CSC)
  std::vector<int64_t> jc;   // column pointers, n+1
  std::vector<double> pr;    // real parts
  std::vector<double> pi;    // imag parts (empty if real)
  std::string err;
};

// ---- MAT5 parsing ---------------------------------------------------------

struct Cursor {
  const uint8_t* p;
  size_t len;
  size_t off = 0;
  bool ok = true;

  bool need(size_t k) {
    if (off + k > len) { ok = false; return false; }
    return true;
  }
  uint32_t u32() {
    if (!need(4)) return 0;
    uint32_t v; memcpy(&v, p + off, 4); off += 4; return v;
  }
  void skip(size_t k) { if (need(k)) off += k; }
  void align8() { off = (off + 7) & ~size_t(7); }
};

enum MiType : uint32_t {
  miINT8 = 1, miUINT8 = 2, miINT16 = 3, miUINT16 = 4, miINT32 = 5,
  miUINT32 = 6, miSINGLE = 7, miDOUBLE = 9, miINT64 = 12, miUINT64 = 13,
  miMATRIX = 14, miCOMPRESSED = 15,
};

struct Element {
  uint32_t type = 0;
  const uint8_t* data = nullptr;
  size_t nbytes = 0;
};

// Read one data element (handles the small-element format); advances cursor.
bool read_element(Cursor& c, Element& e) {
  if (!c.need(8)) return false;
  uint32_t tag = c.u32();
  if (tag >> 16) {  // small element: nbytes in upper 16 bits, data inline
    e.type = tag & 0xFFFF;
    e.nbytes = tag >> 16;
    if (!c.need(4)) return false;
    e.data = c.p + c.off;
    c.off += 4;
    return true;
  }
  e.type = tag;
  e.nbytes = c.u32();
  if (!c.need(e.nbytes)) return false;
  e.data = c.p + c.off;
  c.off += e.nbytes;
  c.align8();
  return c.ok;
}

template <typename T>
void copy_ints(const Element& e, std::vector<int64_t>& out) {
  size_t cnt = e.nbytes / sizeof(T);
  out.resize(cnt);
  const T* src = reinterpret_cast<const T*>(e.data);
  for (size_t i = 0; i < cnt; i++) out[i] = static_cast<int64_t>(src[i]);
}

bool int_element(const Element& e, std::vector<int64_t>& out) {
  switch (e.type) {
    case miINT8:   copy_ints<int8_t>(e, out); return true;
    case miUINT8:  copy_ints<uint8_t>(e, out); return true;
    case miINT16:  copy_ints<int16_t>(e, out); return true;
    case miUINT16: copy_ints<uint16_t>(e, out); return true;
    case miINT32:  copy_ints<int32_t>(e, out); return true;
    case miUINT32: copy_ints<uint32_t>(e, out); return true;
    case miINT64:  copy_ints<int64_t>(e, out); return true;
    case miUINT64: copy_ints<uint64_t>(e, out); return true;
    default: return false;
  }
}

bool real_element(const Element& e, std::vector<double>& out) {
  if (e.type == miDOUBLE) {
    size_t cnt = e.nbytes / 8;
    out.resize(cnt);
    memcpy(out.data(), e.data, cnt * 8);
    return true;
  }
  if (e.type == miSINGLE) {
    size_t cnt = e.nbytes / 4;
    out.resize(cnt);
    const float* src = reinterpret_cast<const float*>(e.data);
    for (size_t i = 0; i < cnt; i++) out[i] = src[i];
    return true;
  }
  std::vector<int64_t> ints;
  if (int_element(e, ints)) {
    out.assign(ints.begin(), ints.end());
    return true;
  }
  return false;
}

// Parse a miMATRIX payload; fills sm if it is a sparse matrix named `want`
// (or any sparse matrix when want is empty). Returns true when filled.
bool parse_matrix(const uint8_t* buf, size_t len, const std::string& want,
                  SparseMat& sm) {
  Cursor c{buf, len};
  Element flags_e, dims_e, name_e;
  if (!read_element(c, flags_e) || flags_e.type != miUINT32 || flags_e.nbytes < 8)
    return false;
  uint32_t flags_word;
  memcpy(&flags_word, flags_e.data, 4);
  uint32_t cls = flags_word & 0xFF;
  bool is_complex = (flags_word & 0x0800) != 0;
  if (!read_element(c, dims_e)) return false;
  if (!read_element(c, name_e)) return false;
  std::string name(reinterpret_cast<const char*>(name_e.data), name_e.nbytes);
  if (cls != 5) return false;  // mxSPARSE_CLASS
  if (!want.empty() && name != want) return false;

  std::vector<int64_t> dims;
  if (!int_element(dims_e, dims) || dims.size() < 2) return false;
  sm.m = dims[0];
  sm.n = dims[1];

  Element ir_e, jc_e, pr_e;
  if (!read_element(c, ir_e) || !int_element(ir_e, sm.ir)) return false;
  if (!read_element(c, jc_e) || !int_element(jc_e, sm.jc)) return false;
  if (!read_element(c, pr_e) || !real_element(pr_e, sm.pr)) return false;
  if (is_complex) {
    Element pi_e;
    if (!read_element(c, pi_e) || !real_element(pi_e, sm.pi)) return false;
  }
  sm.nnz = sm.jc.empty() ? 0 : sm.jc[sm.n];
  // nzmax may exceed nnz; trim
  sm.ir.resize(sm.nnz);
  sm.pr.resize(sm.nnz);
  if (is_complex) sm.pi.resize(sm.nnz);
  return true;
}

bool inflate_buf(const uint8_t* src, size_t srclen, std::vector<uint8_t>& out) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  out.resize(srclen * 4 + 1024);
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = static_cast<uInt>(srclen);
  size_t total = 0;
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    if (total == out.size()) out.resize(out.size() * 2);
    zs.next_out = out.data() + total;
    zs.avail_out = static_cast<uInt>(out.size() - total);
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) { inflateEnd(&zs); return false; }
    total = zs.total_out;
  }
  inflateEnd(&zs);
  out.resize(total);
  return true;
}

SparseMat* load_mat5_sparse(const char* path, const char* varname) {
  auto* sm = new SparseMat();
  FILE* f = fopen(path, "rb");
  if (!f) { sm->err = "cannot open file"; return sm; }
  fseek(f, 0, SEEK_END);
  long fsz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(fsz);
  if (fread(buf.data(), 1, fsz, f) != static_cast<size_t>(fsz)) {
    fclose(f); sm->err = "short read"; return sm;
  }
  fclose(f);
  if (fsz < 128 || memcmp(buf.data(), "MATLAB 5.0", 10) != 0) {
    sm->err = "not a MAT 5.0 file"; return sm;
  }
  std::string want = varname ? varname : "";
  Cursor c{buf.data(), static_cast<size_t>(fsz)};
  c.off = 128;  // header
  while (c.ok && c.off + 8 <= c.len) {
    Element e;
    if (!read_element(c, e)) break;
    if (e.type == miCOMPRESSED) {
      std::vector<uint8_t> raw;
      if (!inflate_buf(e.data, e.nbytes, raw)) continue;
      Cursor ci{raw.data(), raw.size()};
      Element inner;
      if (!read_element(ci, inner)) continue;
      if (inner.type == miMATRIX &&
          parse_matrix(inner.data, inner.nbytes, want, *sm))
        return sm;
    } else if (e.type == miMATRIX) {
      if (parse_matrix(e.data, e.nbytes, want, *sm)) return sm;
    }
  }
  sm->err = "sparse variable not found";
  return sm;
}

}  // namespace

extern "C" {

void* dmlmc_open(const char* path, const char* varname) {
  return load_mat5_sparse(path, varname);
}

const char* dmlmc_error(void* h) {
  auto* sm = static_cast<SparseMat*>(h);
  return sm->err.empty() ? nullptr : sm->err.c_str();
}

int64_t dmlmc_rows(void* h) { return static_cast<SparseMat*>(h)->m; }
int64_t dmlmc_cols(void* h) { return static_cast<SparseMat*>(h)->n; }
int64_t dmlmc_nnz(void* h) { return static_cast<SparseMat*>(h)->nnz; }
int dmlmc_is_complex(void* h) {
  return static_cast<SparseMat*>(h)->pi.empty() ? 0 : 1;
}

// Copy CSC arrays into caller-allocated buffers (jc: n+1, ir/pr/pi: nnz).
void dmlmc_copy_csc(void* h, int64_t* jc, int64_t* ir, double* pr, double* pi) {
  auto* sm = static_cast<SparseMat*>(h);
  memcpy(jc, sm->jc.data(), (sm->n + 1) * sizeof(int64_t));
  memcpy(ir, sm->ir.data(), sm->nnz * sizeof(int64_t));
  memcpy(pr, sm->pr.data(), sm->nnz * sizeof(double));
  if (pi) {
    if (!sm->pi.empty())
      memcpy(pi, sm->pi.data(), sm->nnz * sizeof(double));
    else
      memset(pi, 0, sm->nnz * sizeof(double));
  }
}

void dmlmc_close(void* h) { delete static_cast<SparseMat*>(h); }

// ---- sparse kernels (host oracle path) -----------------------------------

// CSC -> CSR for an m x n matrix.
void dmlmc_csc_to_csr(int64_t m, int64_t n, const int64_t* jc,
                      const int64_t* ir, const double* pr, const double* pi,
                      int64_t* rowptr, int64_t* col, double* vr, double* vi) {
  int64_t nnz = jc[n];
  for (int64_t i = 0; i <= m; i++) rowptr[i] = 0;
  for (int64_t k = 0; k < nnz; k++) rowptr[ir[k] + 1]++;
  for (int64_t i = 0; i < m; i++) rowptr[i + 1] += rowptr[i];
  std::vector<int64_t> next(rowptr, rowptr + m);
  for (int64_t j = 0; j < n; j++) {
    for (int64_t k = jc[j]; k < jc[j + 1]; k++) {
      int64_t dst = next[ir[k]]++;
      col[dst] = j;
      vr[dst] = pr[k];
      vi[dst] = pi ? pi[k] : 0.0;
    }
  }
}

// y = A x for complex CSR, B right-hand sides (row-major x,y of shape B x n).
void dmlmc_csr_matvec(int64_t m, int64_t n, int64_t nrhs,
                      const int64_t* rowptr, const int64_t* col,
                      const double* vr, const double* vi,
                      const double* xr, const double* xi,
                      double* yr, double* yi) {
  for (int64_t b = 0; b < nrhs; b++) {
    const double* xrb = xr + b * n;
    const double* xib = xi + b * n;
    double* yrb = yr + b * m;
    double* yib = yi + b * m;
    for (int64_t i = 0; i < m; i++) {
      double sr = 0.0, si = 0.0;
      for (int64_t k = rowptr[i]; k < rowptr[i + 1]; k++) {
        int64_t j = col[k];
        sr += vr[k] * xrb[j] - vi[k] * xib[j];
        si += vr[k] * xib[j] + vi[k] * xrb[j];
      }
      yrb[i] = sr;
      yib[i] = si;
    }
  }
}

}  // extern "C"
