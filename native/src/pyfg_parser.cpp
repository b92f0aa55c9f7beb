// Native PyFG loader.
//
// Behavioral parity with the reference parser (DCORA_utils.cpp:437-1167)
// and with the Python fallback (dcora_tpu/io/pyfg.py):
//   * symbol decoding: 'A'..'Z' poses per robot; 'L'-prefixed landmarks
//     ('L12' -> map robot = 'M'-'A' = 12, 'LB3' -> robot B)
//   * covariances given directly; tau = dim/trace(cov_t);
//     kappa = 1/cov (2D rot) or 3/(2*trace(cov_R)) (3D)
//   * range edges allocate one unit-sphere variable per unique edge, owned
//     by the source robot; ground truth u = (t_src - t_dst).normalized();
//     duplicate (undirected) range edges are skipped
#include <array>
#include <cstdio>
#include <memory>
#include <unordered_map>
#include <unordered_set>

#include "../include/dcora_native.h"
#include "util.h"

using namespace dcora;

namespace {

constexpr int kStatePose = 0;
constexpr int kStateLandmark = 1;
constexpr int kMapRobot = 'M' - 'A';

struct SymId {
  int64_t robot, state;
  int type;
};

SymId decode_symbol(const std::string &sym) {
  if (sym.empty()) throw std::runtime_error("empty PyFG symbol");
  if (sym[0] == 'L') {
    if (sym.size() >= 2 && sym[1] >= 'A' && sym[1] <= 'Z')
      return {sym[1] - 'A', std::stoll(sym.substr(2)), kStateLandmark};
    return {kMapRobot, std::stoll(sym.substr(1)), kStateLandmark};
  }
  if (sym[0] >= 'A' && sym[0] <= 'Z')
    return {sym[0] - 'A', std::stoll(sym.substr(1)), kStatePose};
  throw std::runtime_error("cannot decode PyFG symbol: '" + sym + "'");
}

struct KeyHash {
  size_t operator()(const std::pair<int64_t, int64_t> &k) const {
    return std::hash<int64_t>()(k.first * 1000003 + k.second);
  }
};

}  // namespace

struct DcoraPyfg {
  int dim = 0;
  // ground truth
  std::vector<int64_t> gp_robot, gp_state;
  std::vector<double> gp_R, gp_t;
  std::vector<int64_t> gl_robot, gl_state;
  std::vector<double> gl_t;
  // priors
  std::vector<int64_t> prp_robot, prp_state;
  std::vector<double> prp_R, prp_t, prp_kappa, prp_tau;
  std::vector<int64_t> prl_robot, prl_state;
  std::vector<double> prl_t, prl_tau;
  // relative measurements (seq = global file order over all three kinds)
  std::vector<int64_t> pp_seq, pp_r1, pp_p1, pp_r2, pp_p2;
  std::vector<double> pp_R, pp_t, pp_kappa, pp_tau;
  std::vector<int64_t> pl_seq, pl_r1, pl_p1, pl_r2, pl_p2;
  std::vector<double> pl_t, pl_tau;
  std::vector<int64_t> rg_seq, rg_r1, rg_p1, rg_st1, rg_r2, rg_p2, rg_st2,
      rg_l;
  std::vector<double> rg_range, rg_prec, rg_u;
};

static void parse_pyfg_into(DcoraPyfg &out, const char *path) {
  const std::string data = read_file(path);
  const char *p = data.data();
  const char *end = p + data.size();
  Tokens tk;

  // gt lookup for range unit vectors: (robot,state) -> index into gt arrays
  std::unordered_map<std::pair<int64_t, int64_t>, size_t, KeyHash> pose_gt,
      lmk_gt;
  std::unordered_map<int64_t, int64_t> sphere_idx;  // robot -> next index
  struct RKeyHash {
    size_t operator()(const std::array<int64_t, 6> &k) const {
      size_t h = 1469598103934665603ull;
      for (int64_t v : k) h = (h ^ std::hash<int64_t>()(v)) * 1099511628211ull;
      return h;
    }
  };
  std::unordered_set<std::array<int64_t, 6>, RKeyHash> seen_ranges;
  int64_t seq = 0;

  while (p < end) {
    const char *nl = static_cast<const char *>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char *line_end = nl ? nl : end;
    tk.split(p, line_end);
    p = nl ? nl + 1 : end;
    if (tk.size() == 0) continue;

    // first matching record fixes the dimension
    auto want_dim = [&](int want) {
      if (out.dim == 0) out.dim = want;
      return out.dim;
    };

    if (tk.is(0, "VERTEX_SE2") || tk.is(0, "VERTEX_SE3:QUAT")) {
      const int d = want_dim(tk.is(0, "VERTEX_SE2") ? 2 : 3);
      const SymId id = decode_symbol(tk.str(2));
      double R[9], t[3];
      if (d == 2) {
        t[0] = tk.num(3);
        t[1] = tk.num(4);
        theta_to_rotation(tk.num(5), R);
      } else {
        double q[4];
        t[0] = tk.num(3);
        t[1] = tk.num(4);
        t[2] = tk.num(5);
        tk.nums(6, 10, q);
        quat_to_rotation(q, R);
      }
      auto key = std::make_pair(id.robot, id.state);
      if (!pose_gt.emplace(key, out.gp_robot.size()).second)
        throw std::runtime_error("duplicate pose ID (" +
                                 std::to_string(id.robot) + "," +
                                 std::to_string(id.state) + ")");
      out.gp_robot.push_back(id.robot);
      out.gp_state.push_back(id.state);
      out.gp_R.insert(out.gp_R.end(), R, R + d * d);
      out.gp_t.insert(out.gp_t.end(), t, t + d);

    } else if (tk.is(0, "VERTEX_SE2:PRIOR") ||
               tk.is(0, "VERTEX_SE3:QUAT:PRIOR")) {
      const int d = want_dim(tk.is(0, "VERTEX_SE2:PRIOR") ? 2 : 3);
      const SymId id = decode_symbol(tk.str(2));
      double R[9], t[3], kappa, tau;
      if (d == 2) {
        t[0] = tk.num(3);
        t[1] = tk.num(4);
        theta_to_rotation(tk.num(5), R);
        double vals[6], C[9];
        tk.nums(6, 12, vals);
        sym_from_upper(vals, 3, C);
        tau = 2.0 / (C[0] + C[4]);
        kappa = 1.0 / C[8];
      } else {
        double q[4];
        t[0] = tk.num(3);
        t[1] = tk.num(4);
        t[2] = tk.num(5);
        tk.nums(6, 10, q);
        quat_to_rotation(q, R);
        double vals[21], C[36];
        tk.nums(10, 31, vals);
        sym_from_upper(vals, 6, C);
        tau = 3.0 / (C[0] + C[7] + C[14]);
        kappa = 3.0 / (2.0 * (C[21] + C[28] + C[35]));
      }
      out.prp_robot.push_back(id.robot);
      out.prp_state.push_back(id.state);
      out.prp_R.insert(out.prp_R.end(), R, R + d * d);
      out.prp_t.insert(out.prp_t.end(), t, t + d);
      out.prp_kappa.push_back(kappa);
      out.prp_tau.push_back(tau);

    } else if (tk.is(0, "VERTEX_XY") || tk.is(0, "VERTEX_XYZ")) {
      const int d = want_dim(tk.is(0, "VERTEX_XY") ? 2 : 3);
      // no timestamp column (DCORA_utils.cpp:741)
      const SymId id = decode_symbol(tk.str(1));
      double t[3];
      tk.nums(2, 2 + d, t);
      auto key = std::make_pair(id.robot, id.state);
      if (!lmk_gt.emplace(key, out.gl_robot.size()).second)
        throw std::runtime_error("duplicate landmark ID (" +
                                 std::to_string(id.robot) + "," +
                                 std::to_string(id.state) + ")");
      out.gl_robot.push_back(id.robot);
      out.gl_state.push_back(id.state);
      out.gl_t.insert(out.gl_t.end(), t, t + d);

    } else if (tk.is(0, "VERTEX_XY:PRIOR") || tk.is(0, "VERTEX_XYZ:PRIOR")) {
      const int d = want_dim(tk.is(0, "VERTEX_XY:PRIOR") ? 2 : 3);
      const SymId id = decode_symbol(tk.str(2));
      double t[3];
      tk.nums(3, 3 + d, t);
      const int ncov = d * (d + 1) / 2;
      std::vector<double> vals(ncov);
      tk.nums(3 + d, 3 + d + ncov, vals.data());
      double C[9];
      sym_from_upper(vals.data(), d, C);
      double tr = 0;
      for (int a = 0; a < d; ++a) tr += C[a * d + a];
      out.prl_robot.push_back(id.robot);
      out.prl_state.push_back(id.state);
      out.prl_t.insert(out.prl_t.end(), t, t + d);
      out.prl_tau.push_back(d / tr);

    } else if (tk.is(0, "EDGE_SE2") || tk.is(0, "EDGE_SE3:QUAT")) {
      const int d = want_dim(tk.is(0, "EDGE_SE2") ? 2 : 3);
      const SymId id1 = decode_symbol(tk.str(2));
      const SymId id2 = decode_symbol(tk.str(3));
      double R[9], t[3], kappa, tau;
      if (d == 2) {
        t[0] = tk.num(4);
        t[1] = tk.num(5);
        theta_to_rotation(tk.num(6), R);
        double vals[6], C[9];
        tk.nums(7, 13, vals);
        sym_from_upper(vals, 3, C);
        tau = 2.0 / (C[0] + C[4]);
        kappa = 1.0 / C[8];
      } else {
        double q[4];
        t[0] = tk.num(4);
        t[1] = tk.num(5);
        t[2] = tk.num(6);
        tk.nums(7, 11, q);
        quat_to_rotation(q, R);
        double vals[21], C[36];
        tk.nums(11, 32, vals);
        sym_from_upper(vals, 6, C);
        tau = 3.0 / (C[0] + C[7] + C[14]);
        kappa = 3.0 / (2.0 * (C[21] + C[28] + C[35]));
      }
      out.pp_seq.push_back(seq++);
      out.pp_r1.push_back(id1.robot);
      out.pp_p1.push_back(id1.state);
      out.pp_r2.push_back(id2.robot);
      out.pp_p2.push_back(id2.state);
      out.pp_R.insert(out.pp_R.end(), R, R + d * d);
      out.pp_t.insert(out.pp_t.end(), t, t + d);
      out.pp_kappa.push_back(kappa);
      out.pp_tau.push_back(tau);

    } else if (tk.is(0, "EDGE_SE2_XY") || tk.is(0, "EDGE_SE3_XYZ")) {
      const int d = want_dim(tk.is(0, "EDGE_SE2_XY") ? 2 : 3);
      const SymId id1 = decode_symbol(tk.str(2));
      const SymId id2 = decode_symbol(tk.str(3));
      double t[3];
      tk.nums(4, 4 + d, t);
      const int ncov = d * (d + 1) / 2;
      std::vector<double> vals(ncov);
      tk.nums(4 + d, 4 + d + ncov, vals.data());
      double C[9];
      sym_from_upper(vals.data(), d, C);
      double tr = 0;
      for (int a = 0; a < d; ++a) tr += C[a * d + a];
      out.pl_seq.push_back(seq++);
      out.pl_r1.push_back(id1.robot);
      out.pl_p1.push_back(id1.state);
      out.pl_r2.push_back(id2.robot);
      out.pl_p2.push_back(id2.state);
      out.pl_t.insert(out.pl_t.end(), t, t + d);
      out.pl_tau.push_back(d / tr);

    } else if (tk.is(0, "EDGE_RANGE")) {
      const int d = out.dim;
      if (d == 0) throw std::runtime_error("EDGE_RANGE before any vertex");
      const SymId id1 = decode_symbol(tk.str(2));
      const SymId id2 = decode_symbol(tk.str(3));
      const double range = tk.num(4);
      const double cov = tk.num(5);
      if (range <= 0)
        throw std::runtime_error("range must be positive: " +
                                 std::to_string(range));
      std::array<int64_t, 6> key = {id1.robot, id1.state, id1.type,
                                    id2.robot, id2.state, id2.type};
      std::array<int64_t, 6> rkey = {id2.robot, id2.state, id2.type,
                                     id1.robot, id1.state, id1.type};
      if (seen_ranges.count(key) || seen_ranges.count(rkey))
        continue;  // skip duplicates (DCORA_utils.cpp:1083-1090)
      seen_ranges.insert(key);
      const int64_t l_idx = sphere_idx[id1.robot]++;

      auto gt_translation = [&](const SymId &id, double *t_out) {
        auto k = std::make_pair(id.robot, id.state);
        if (id.type == kStatePose) {
          auto it = pose_gt.find(k);
          if (it == pose_gt.end())
            throw std::runtime_error("range edge references unknown pose");
          std::memcpy(t_out, &out.gp_t[it->second * d], d * sizeof(double));
        } else {
          auto it = lmk_gt.find(k);
          if (it == lmk_gt.end())
            throw std::runtime_error(
                "range edge references unknown landmark");
          std::memcpy(t_out, &out.gl_t[it->second * d], d * sizeof(double));
        }
      };
      double t1[3], t2[3], u[3], nrm = 0;
      gt_translation(id1, t1);
      gt_translation(id2, t2);
      for (int a = 0; a < d; ++a) {
        u[a] = t1[a] - t2[a];
        nrm += u[a] * u[a];
      }
      nrm = std::sqrt(nrm);
      for (int a = 0; a < d; ++a) u[a] /= nrm;

      out.rg_seq.push_back(seq++);
      out.rg_r1.push_back(id1.robot);
      out.rg_p1.push_back(id1.state);
      out.rg_st1.push_back(id1.type);
      out.rg_r2.push_back(id2.robot);
      out.rg_p2.push_back(id2.state);
      out.rg_st2.push_back(id2.type);
      out.rg_l.push_back(l_idx);
      out.rg_range.push_back(range);
      out.rg_prec.push_back(1.0 / cov);
      out.rg_u.insert(out.rg_u.end(), u, u + d);

    } else {
      throw std::runtime_error("unknown PyFG record type: '" + tk.str(0) +
                               "'");
    }
  }
}

extern "C" {

DcoraPyfg *dcora_pyfg_parse(const char *path, char *errbuf, int errlen) {
  auto h = std::make_unique<DcoraPyfg>();
  try {
    parse_pyfg_into(*h, path);
  } catch (const std::exception &e) {
    if (errbuf && errlen > 0) snprintf(errbuf, errlen, "%s", e.what());
    return nullptr;
  }
  return h.release();
}

int dcora_pyfg_dim(const DcoraPyfg *h) { return h->dim; }

int64_t dcora_pyfg_count(const DcoraPyfg *h, int kind) {
  switch (kind) {
    case DCORA_PYFG_GT_POSE:
      return static_cast<int64_t>(h->gp_robot.size());
    case DCORA_PYFG_GT_LANDMARK:
      return static_cast<int64_t>(h->gl_robot.size());
    case DCORA_PYFG_POSE_PRIOR:
      return static_cast<int64_t>(h->prp_robot.size());
    case DCORA_PYFG_LANDMARK_PRIOR:
      return static_cast<int64_t>(h->prl_robot.size());
    case DCORA_PYFG_REL_POSE_POSE:
      return static_cast<int64_t>(h->pp_r1.size());
    case DCORA_PYFG_REL_POSE_LANDMARK:
      return static_cast<int64_t>(h->pl_r1.size());
    case DCORA_PYFG_RANGE:
      return static_cast<int64_t>(h->rg_r1.size());
    default:
      return -1;
  }
}

#define CPY(dst, src, count) \
  std::memcpy(dst, (src).data(), (count) * sizeof(*(dst)))

void dcora_pyfg_get_gt_poses(const DcoraPyfg *h, int64_t *robots,
                             int64_t *states, double *Rs, double *ts) {
  const int d = h->dim;
  const size_t m = h->gp_robot.size();
  CPY(robots, h->gp_robot, m);
  CPY(states, h->gp_state, m);
  CPY(Rs, h->gp_R, m * d * d);
  CPY(ts, h->gp_t, m * d);
}

void dcora_pyfg_get_gt_landmarks(const DcoraPyfg *h, int64_t *robots,
                                 int64_t *states, double *ts) {
  const size_t m = h->gl_robot.size();
  CPY(robots, h->gl_robot, m);
  CPY(states, h->gl_state, m);
  CPY(ts, h->gl_t, m * h->dim);
}

void dcora_pyfg_get_pose_priors(const DcoraPyfg *h, int64_t *robots,
                                int64_t *states, double *Rs, double *ts,
                                double *kappas, double *taus) {
  const int d = h->dim;
  const size_t m = h->prp_robot.size();
  CPY(robots, h->prp_robot, m);
  CPY(states, h->prp_state, m);
  CPY(Rs, h->prp_R, m * d * d);
  CPY(ts, h->prp_t, m * d);
  CPY(kappas, h->prp_kappa, m);
  CPY(taus, h->prp_tau, m);
}

void dcora_pyfg_get_landmark_priors(const DcoraPyfg *h, int64_t *robots,
                                    int64_t *states, double *ts,
                                    double *taus) {
  const size_t m = h->prl_robot.size();
  CPY(robots, h->prl_robot, m);
  CPY(states, h->prl_state, m);
  CPY(ts, h->prl_t, m * h->dim);
  CPY(taus, h->prl_tau, m);
}

void dcora_pyfg_get_rel_pose_pose(const DcoraPyfg *h, int64_t *seq,
                                  int64_t *r1, int64_t *p1, int64_t *r2,
                                  int64_t *p2, double *Rs, double *ts,
                                  double *kappas, double *taus) {
  const int d = h->dim;
  const size_t m = h->pp_r1.size();
  CPY(seq, h->pp_seq, m);
  CPY(r1, h->pp_r1, m);
  CPY(p1, h->pp_p1, m);
  CPY(r2, h->pp_r2, m);
  CPY(p2, h->pp_p2, m);
  CPY(Rs, h->pp_R, m * d * d);
  CPY(ts, h->pp_t, m * d);
  CPY(kappas, h->pp_kappa, m);
  CPY(taus, h->pp_tau, m);
}

void dcora_pyfg_get_rel_pose_landmark(const DcoraPyfg *h, int64_t *seq,
                                      int64_t *r1, int64_t *p1, int64_t *r2,
                                      int64_t *p2, double *ts,
                                      double *taus) {
  const size_t m = h->pl_r1.size();
  CPY(seq, h->pl_seq, m);
  CPY(r1, h->pl_r1, m);
  CPY(p1, h->pl_p1, m);
  CPY(r2, h->pl_r2, m);
  CPY(p2, h->pl_p2, m);
  CPY(ts, h->pl_t, m * h->dim);
  CPY(taus, h->pl_tau, m);
}

void dcora_pyfg_get_ranges(const DcoraPyfg *h, int64_t *seq, int64_t *r1,
                           int64_t *p1, int64_t *st1, int64_t *r2,
                           int64_t *p2, int64_t *st2, int64_t *l,
                           double *ranges, double *precisions,
                           double *gt_u) {
  const size_t m = h->rg_r1.size();
  CPY(seq, h->rg_seq, m);
  CPY(r1, h->rg_r1, m);
  CPY(p1, h->rg_p1, m);
  CPY(st1, h->rg_st1, m);
  CPY(r2, h->rg_r2, m);
  CPY(p2, h->rg_p2, m);
  CPY(st2, h->rg_st2, m);
  CPY(l, h->rg_l, m);
  CPY(ranges, h->rg_range, m);
  CPY(precisions, h->rg_prec, m);
  CPY(gt_u, h->rg_u, m * h->dim);
}

#undef CPY

void dcora_pyfg_free(DcoraPyfg *h) { delete h; }

}  // extern "C"
