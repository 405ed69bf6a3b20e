// Plackett-Luce MM rating engine (native core).
//
// Exact-semantics C++ implementation of the hot post-expansion path of
// burn_ppo_tpu/selfplay/plackett_luce.py (itself the behavioral parity
// of the reference src/plackett_luce.rs: mm_update 271-316,
// compute_hessian 320-353, invert_matrix 361-425, compute_ratings
// 437-615).  Rating recomputes happen at every checkpoint during
// training (reference rating_history.rs:234-255 logs elo_compute_ms);
// tournaments recompute over every recorded game, so the MM loop is the
// hottest host-side code in the framework.
//
// Build: g++ -O3 -shared -fPIC plackett_luce.cpp -o _libplackett_luce.so
// Binding: ctypes (burn_ppo_tpu/native/__init__.py) with a pure-Python
// fallback when no compiler is available.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double ELO_SCALE_LN10 = 400.0;  // ELO_SCALE = 400 / ln(10)

double elo_scale() { return ELO_SCALE_LN10 / std::log(10.0); }

// Partial-pivot Gauss-Jordan inversion; near-singular -> eye * 100
// high-variance fallback (plackett_luce.rs:361-425).
bool invert(std::vector<double>& m, int n, double epsilon,
            std::vector<double>& out) {
  out.assign(static_cast<size_t>(n) * n, 0.0);
  if (n == 0) return true;
  std::vector<double> aug(static_cast<size_t>(n) * 2 * n, 0.0);
  const int w = 2 * n;
  for (int i = 0; i < n; ++i) {
    std::memcpy(&aug[static_cast<size_t>(i) * w], &m[static_cast<size_t>(i) * n],
                sizeof(double) * n);
    aug[static_cast<size_t>(i) * w + n + i] = 1.0;
  }
  for (int col = 0; col < n; ++col) {
    int pivot = col;
    double best = std::fabs(aug[static_cast<size_t>(col) * w + col]);
    for (int r = col + 1; r < n; ++r) {
      double v = std::fabs(aug[static_cast<size_t>(r) * w + col]);
      if (v > best) { best = v; pivot = r; }
    }
    if (pivot != col) {
      for (int j = 0; j < w; ++j)
        std::swap(aug[static_cast<size_t>(col) * w + j],
                  aug[static_cast<size_t>(pivot) * w + j]);
    }
    double p = aug[static_cast<size_t>(col) * w + col];
    if (std::fabs(p) < epsilon) {
      // high-variance fallback
      for (int i = 0; i < n; ++i) out[static_cast<size_t>(i) * n + i] = 100.0;
      return false;
    }
    double inv_p = 1.0 / p;
    for (int j = 0; j < w; ++j) aug[static_cast<size_t>(col) * w + j] *= inv_p;
    for (int r = 0; r < n; ++r) {
      if (r == col) continue;
      double f = aug[static_cast<size_t>(r) * w + col];
      if (f == 0.0) continue;
      for (int j = 0; j < w; ++j)
        aug[static_cast<size_t>(r) * w + j] -=
            f * aug[static_cast<size_t>(col) * w + j];
    }
  }
  for (int i = 0; i < n; ++i)
    std::memcpy(&out[static_cast<size_t>(i) * n],
                &aug[static_cast<size_t>(i) * w + n], sizeof(double) * n);
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success.  Comparisons are given flat: winners[c] beats
// losers[loser_offsets[c] .. loser_offsets[c+1]) with weight weights[c].
int pl_compute(
    int32_t num_players, int32_t num_comparisons,
    const int32_t* winners, const int32_t* loser_offsets,
    const int32_t* losers, const double* weights,
    const int32_t* games_played, int32_t anchor_idx,
    const double* init_gammas,  // nullable warm start (same fixed point)
    int32_t max_iterations, double convergence_threshold, double epsilon,
    double anchor_elo, double ci_inflation,
    double* out_ratings, double* out_uncertainties,
    int32_t* out_iterations, double* out_final_delta, int32_t* out_converged,
    double* out_gammas /* nullable: final raw (centered) MM gammas */) {
  const int n = num_players;
  const int C = num_comparisons;
  *out_iterations = 0;
  *out_final_delta = 0.0;
  *out_converged = 1;
  if (n == 0) return 0;

  std::vector<double> gammas(n, 0.0), new_g(n), wins(n), denom(n), exp_g(n);
  if (init_gammas != nullptr)
    for (int i = 0; i < n; ++i)
      gammas[i] = std::isfinite(init_gammas[i]) ? init_gammas[i] : 0.0;
  bool converged = false;
  double delta = 0.0;
  int iters = 0;

  // Precompute per-player win totals (constant across iterations).
  std::vector<double> win_total(n, 0.0);
  for (int c = 0; c < C; ++c) win_total[winners[c]] += weights[c];

  for (int it = 0; it < max_iterations; ++it) {
    iters = it + 1;
    std::fill(denom.begin(), denom.end(), 0.0);
    for (int i = 0; i < n; ++i) exp_g[i] = std::exp(gammas[i]);
    for (int c = 0; c < C; ++c) {
      const int w0 = winners[c];
      double sum_exp = exp_g[w0];
      for (int32_t k = loser_offsets[c]; k < loser_offsets[c + 1]; ++k)
        sum_exp += exp_g[losers[k]];
      if (sum_exp > epsilon) {
        const double contribution = weights[c] / sum_exp;
        denom[w0] += contribution;
        for (int32_t k = loser_offsets[c]; k < loser_offsets[c + 1]; ++k)
          denom[losers[k]] += contribution;
      }
    }
    double mean = 0.0;
    for (int i = 0; i < n; ++i) {
      if (win_total[i] > epsilon && denom[i] > epsilon)
        new_g[i] = std::log(win_total[i] / denom[i]);
      else if (denom[i] > epsilon)
        new_g[i] = gammas[i] - 1.0;  // participated, never won
      else
        new_g[i] = gammas[i];
      mean += new_g[i];
    }
    mean /= n;
    delta = 0.0;
    bool finite = true;
    for (int i = 0; i < n; ++i) {
      new_g[i] -= mean;  // center to prevent drift
      double d = std::fabs(new_g[i] - gammas[i]);
      if (d > delta) delta = d;
      gammas[i] = new_g[i];
      if (!std::isfinite(gammas[i])) finite = false;
    }
    if (delta < convergence_threshold) { converged = true; break; }
    if (!finite) {
      std::fill(gammas.begin(), gammas.end(), 0.0);
      break;
    }
  }
  *out_iterations = iters;
  *out_final_delta = delta;
  *out_converged = converged ? 1 : 0;
  if (out_gammas != nullptr)
    for (int i = 0; i < n; ++i) out_gammas[i] = gammas[i];

  // ---- Fisher information over active (played, non-anchor) players ----
  std::vector<int> active;
  active.reserve(n);
  for (int i = 0; i < n; ++i)
    if (games_played[i] > 0 && i != anchor_idx) active.push_back(i);
  const int na = static_cast<int>(active.size());
  std::vector<int> pos(n, -1);  // player -> reduced index
  for (int ri = 0; ri < na; ++ri) pos[active[ri]] = ri;

  std::vector<double> reduced(static_cast<size_t>(na) * na, 0.0);
  std::vector<int> part;
  std::vector<double> probs;
  for (int c = 0; c < C; ++c) {
    part.clear();
    part.push_back(winners[c]);
    for (int32_t k = loser_offsets[c]; k < loser_offsets[c + 1]; ++k)
      part.push_back(losers[k]);
    const int m = static_cast<int>(part.size());
    double gmax = -1e300;
    for (int j = 0; j < m; ++j) gmax = std::max(gmax, gammas[part[j]]);
    probs.resize(m);
    double sum = 0.0;
    for (int j = 0; j < m; ++j) {
      probs[j] = std::exp(gammas[part[j]] - gmax);
      sum += probs[j];
    }
    for (int j = 0; j < m; ++j) probs[j] /= sum;
    const double wgt = weights[c];
    // Accumulate only the active-x-active block of w * (diag(p) - p p^T).
    for (int a = 0; a < m; ++a) {
      const int ra = pos[part[a]];
      if (ra < 0) continue;
      for (int b = 0; b < m; ++b) {
        const int rb = pos[part[b]];
        if (rb < 0) continue;
        double v = -probs[a] * probs[b];
        if (a == b) v += probs[a];
        reduced[static_cast<size_t>(ra) * na + rb] += wgt * v;
      }
    }
  }
  for (int i = 0; i < na; ++i)
    reduced[static_cast<size_t>(i) * na + i] += 1e-6;

  std::vector<double> cov;
  invert(reduced, na, epsilon, cov);

  const double scale = elo_scale();
  const double shift = (anchor_elo - 1500.0) / scale - gammas[anchor_idx];
  for (int i = 0; i < n; ++i) {
    double unc = 2.0;
    if (i == anchor_idx) unc = 0.0;
    if (pos[i] >= 0) {
      double var = cov[static_cast<size_t>(pos[i]) * na + pos[i]];
      if (var > 0.0) unc = std::sqrt(var);
    }
    if (games_played[i] > 0) {
      out_ratings[i] = 1500.0 + scale * (gammas[i] + shift);
      out_uncertainties[i] = scale * unc * ci_inflation;
    } else {
      out_ratings[i] = anchor_elo;
      out_uncertainties[i] = 350.0;
    }
  }
  return 0;
}

}  // extern "C"
