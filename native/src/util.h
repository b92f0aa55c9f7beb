// Internal helpers shared by the native parsers.
//
// Semantics mirror dcora_tpu/utils/rotations.py (which itself mirrors the
// Eigen conventions used by the reference parsers, DCORA_utils.cpp:179-1167).
#ifndef DCORA_NATIVE_UTIL_H
#define DCORA_NATIVE_UTIL_H

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace dcora {

// angle -> 2x2 rotation, row-major
inline void theta_to_rotation(double theta, double *R) {
  const double c = std::cos(theta), s = std::sin(theta);
  R[0] = c;
  R[1] = -s;
  R[2] = s;
  R[3] = c;
}

// (qx qy qz qw) -> 3x3 rotation, row-major; normalizes first
inline void quat_to_rotation(const double *q, double *R) {
  double x = q[0], y = q[1], z = q[2], w = q[3];
  const double nrm = std::sqrt(x * x + y * y + z * z + w * w);
  x /= nrm;
  y /= nrm;
  z /= nrm;
  w /= nrm;
  R[0] = 1 - 2 * (y * y + z * z);
  R[1] = 2 * (x * y - w * z);
  R[2] = 2 * (x * z + w * y);
  R[3] = 2 * (x * y + w * z);
  R[4] = 1 - 2 * (x * x + z * z);
  R[5] = 2 * (y * z - w * x);
  R[6] = 2 * (x * z - w * y);
  R[7] = 2 * (y * z + w * x);
  R[8] = 1 - 2 * (x * x + y * y);
}

// trace of the inverse of a symmetric positive-definite 2x2 / 3x3 matrix
inline double trace_inv_sym(const double *M, int d) {
  if (d == 2) {
    const double det = M[0] * M[3] - M[1] * M[2];
    return (M[3] + M[0]) / det;
  }
  // 3x3: trace(inv) = trace(adj) / det; adj diagonal entries are the
  // cofactors of the diagonal.
  const double a = M[0], b = M[1], c = M[2];
  const double e = M[4], f = M[5], i = M[8];
  const double det = a * (e * i - f * f) - b * (b * i - f * c) +
                     c * (b * f - e * c);
  const double adj = (e * i - f * f) + (a * i - c * c) + (a * e - b * b);
  return adj / det;
}

// upper-triangular row-major packed values -> full symmetric row-major
inline void sym_from_upper(const double *vals, int d, double *M) {
  int idx = 0;
  for (int i = 0; i < d; ++i)
    for (int j = i; j < d; ++j) {
      M[i * d + j] = vals[idx];
      M[j * d + i] = vals[idx];
      ++idx;
    }
}

// Whitespace tokenizer over one line (in-place views).
struct Tokens {
  std::vector<const char *> tok;
  std::vector<int> len;

  void split(const char *line, const char *end) {
    tok.clear();
    len.clear();
    const char *p = line;
    while (p < end) {
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
      if (p >= end) break;
      const char *s = p;
      while (p < end && *p != ' ' && *p != '\t' && *p != '\r') ++p;
      tok.push_back(s);
      len.push_back(static_cast<int>(p - s));
    }
  }

  size_t size() const { return tok.size(); }

  std::string str(size_t i) const { return std::string(tok[i], len[i]); }

  bool is(size_t i, const char *s) const {
    const size_t n = std::strlen(s);
    return n == static_cast<size_t>(len[i]) &&
           std::memcmp(tok[i], s, n) == 0;
  }

  double num(size_t i) const {
    char buf[64];
    const int n = len[i] < 63 ? len[i] : 63;
    std::memcpy(buf, tok[i], n);
    buf[n] = 0;
    char *endp = nullptr;
    const double v = std::strtod(buf, &endp);
    if (endp == buf) throw std::runtime_error("bad number: " + str(i));
    return v;
  }

  long long integer(size_t i) const {
    char buf[64];
    const int n = len[i] < 63 ? len[i] : 63;
    std::memcpy(buf, tok[i], n);
    buf[n] = 0;
    char *endp = nullptr;
    const long long v = std::strtoll(buf, &endp, 10);
    if (endp == buf) throw std::runtime_error("bad integer: " + str(i));
    return v;
  }

  // floats tok[a..b) into out
  void nums(size_t a, size_t b, double *out) const {
    for (size_t i = a; i < b; ++i) out[i - a] = num(i);
  }
};

// Read the whole file into a string; throws on failure.
std::string read_file(const char *path);

}  // namespace dcora

#endif  // DCORA_NATIVE_UTIL_H
