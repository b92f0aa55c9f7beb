// Native g2o loader.
//
// Behavioral parity with the reference parser (DCORA_utils.cpp:179-375) and
// with the Python fallback (dcora_tpu/io/g2o.py):
//   * EDGE_SE2:      tau = 2/trace(inv(I_t)), kappa = I33
//   * EDGE_SE3:QUAT: tau = 3/trace(inv(I_t)), kappa = 3/(2*trace(inv(I_R)))
//   * VERTEX_* populate ground-truth poses; duplicates are an error
#include <cstdio>
#include <fstream>
#include <memory>
#include <sstream>
#include <unordered_set>

#include "../include/dcora_native.h"
#include "util.h"

namespace dcora {

std::string read_file(const char *path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error(std::string("cannot open: ") + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

}  // namespace dcora

using namespace dcora;

struct DcoraG2o {
  int dim = 0;
  // vertices
  std::vector<int64_t> v_ids;
  std::vector<double> v_R;  // [nv, d*d]
  std::vector<double> v_t;  // [nv, d]
  // edges
  std::vector<int64_t> e_i, e_j;
  std::vector<double> e_R, e_t, e_kappa, e_tau;
};

static void parse_g2o_into(DcoraG2o &out, const char *path) {
  const std::string data = read_file(path);
  const char *p = data.data();
  const char *end = p + data.size();
  Tokens tk;
  std::unordered_set<int64_t> seen_vertices;

  while (p < end) {
    const char *nl = static_cast<const char *>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char *line_end = nl ? nl : end;
    tk.split(p, line_end);
    p = nl ? nl + 1 : end;
    if (tk.size() == 0) continue;

    int want;  // dimension implied by the record type
    bool is_vertex;
    if (tk.is(0, "EDGE_SE3:QUAT")) {
      want = 3;
      is_vertex = false;
    } else if (tk.is(0, "EDGE_SE2")) {
      want = 2;
      is_vertex = false;
    } else if (tk.is(0, "VERTEX_SE3:QUAT")) {
      want = 3;
      is_vertex = true;
    } else if (tk.is(0, "VERTEX_SE2")) {
      want = 2;
      is_vertex = true;
    } else if (tk.is(0, "FIX")) {
      // anchor declaration (g2o convention; e.g. ais2klinik.g2o:2) --
      // the first pose is gauge-fixed downstream, so skip the record
      continue;
    } else {
      throw std::runtime_error("unrecognized g2o record type: '" +
                               tk.str(0) + "'");
    }
    if (out.dim == 0)
      out.dim = want;
    else if (out.dim != want)
      throw std::runtime_error("mixed 2D/3D g2o file");

    if (is_vertex) {
      const int64_t id = tk.integer(1);
      if (!seen_vertices.insert(id).second)
        throw std::runtime_error("duplicate pose ID " + std::to_string(id));
      out.v_ids.push_back(id);
      double R[9], t[3];
      if (want == 2) {
        // i x y theta
        t[0] = tk.num(2);
        t[1] = tk.num(3);
        theta_to_rotation(tk.num(4), R);
        out.v_R.insert(out.v_R.end(), R, R + 4);
        out.v_t.insert(out.v_t.end(), t, t + 2);
      } else {
        // i x y z qx qy qz qw
        double q[4];
        t[0] = tk.num(2);
        t[1] = tk.num(3);
        t[2] = tk.num(4);
        tk.nums(5, 9, q);
        quat_to_rotation(q, R);
        out.v_R.insert(out.v_R.end(), R, R + 9);
        out.v_t.insert(out.v_t.end(), t, t + 3);
      }
    } else {
      out.e_i.push_back(tk.integer(1));
      out.e_j.push_back(tk.integer(2));
      double R[9], t[3];
      if (want == 2) {
        // i j dx dy dtheta I11 I12 I13 I22 I23 I33
        t[0] = tk.num(3);
        t[1] = tk.num(4);
        theta_to_rotation(tk.num(5), R);
        double It[4] = {tk.num(6), tk.num(7), tk.num(7), tk.num(9)};
        out.e_tau.push_back(2.0 / trace_inv_sym(It, 2));
        out.e_kappa.push_back(tk.num(11));
        out.e_R.insert(out.e_R.end(), R, R + 4);
        out.e_t.insert(out.e_t.end(), t, t + 2);
      } else {
        // i j dx dy dz qx qy qz qw I11..I16 I22..I26 I33..I36 I44..I46
        // I55 I56 I66   (columns 10..30 = the 21 upper-tri values)
        double q[4];
        t[0] = tk.num(3);
        t[1] = tk.num(4);
        t[2] = tk.num(5);
        tk.nums(6, 10, q);
        quat_to_rotation(q, R);
        double info[21];
        tk.nums(10, 31, info);
        double I6[36];
        sym_from_upper(info, 6, I6);
        double It[9], IR[9];
        for (int a = 0; a < 3; ++a)
          for (int b = 0; b < 3; ++b) {
            It[a * 3 + b] = I6[a * 6 + b];
            IR[a * 3 + b] = I6[(a + 3) * 6 + (b + 3)];
          }
        out.e_tau.push_back(3.0 / trace_inv_sym(It, 3));
        out.e_kappa.push_back(3.0 / (2.0 * trace_inv_sym(IR, 3)));
        out.e_R.insert(out.e_R.end(), R, R + 9);
        out.e_t.insert(out.e_t.end(), t, t + 3);
      }
    }
  }
  if (out.dim == 0) throw std::runtime_error("empty g2o file");
}

extern "C" {

DcoraG2o *dcora_g2o_parse(const char *path, char *errbuf, int errlen) {
  auto h = std::make_unique<DcoraG2o>();
  try {
    parse_g2o_into(*h, path);
  } catch (const std::exception &e) {
    if (errbuf && errlen > 0) snprintf(errbuf, errlen, "%s", e.what());
    return nullptr;
  }
  return h.release();
}

int dcora_g2o_dim(const DcoraG2o *h) { return h->dim; }

int64_t dcora_g2o_num_vertices(const DcoraG2o *h) {
  return static_cast<int64_t>(h->v_ids.size());
}

int64_t dcora_g2o_num_edges(const DcoraG2o *h) {
  return static_cast<int64_t>(h->e_i.size());
}

void dcora_g2o_get_vertices(const DcoraG2o *h, int64_t *ids, double *Rs,
                            double *ts) {
  const int d = h->dim;
  std::memcpy(ids, h->v_ids.data(), h->v_ids.size() * sizeof(int64_t));
  std::memcpy(Rs, h->v_R.data(), h->v_ids.size() * d * d * sizeof(double));
  std::memcpy(ts, h->v_t.data(), h->v_ids.size() * d * sizeof(double));
}

void dcora_g2o_get_edges(const DcoraG2o *h, int64_t *is, int64_t *js,
                         double *Rs, double *ts, double *kappas,
                         double *taus) {
  const int d = h->dim;
  const size_t m = h->e_i.size();
  std::memcpy(is, h->e_i.data(), m * sizeof(int64_t));
  std::memcpy(js, h->e_j.data(), m * sizeof(int64_t));
  std::memcpy(Rs, h->e_R.data(), m * d * d * sizeof(double));
  std::memcpy(ts, h->e_t.data(), m * d * sizeof(double));
  std::memcpy(kappas, h->e_kappa.data(), m * sizeof(double));
  std::memcpy(taus, h->e_tau.data(), m * sizeof(double));
}

void dcora_g2o_free(DcoraG2o *h) { delete h; }

}  // extern "C"
