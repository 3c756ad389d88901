// gpode_tpu native host library: data-prep compute that the reference
// outsourced to compiled third-party code (SURVEY.md §2.2).
//
//   * gpode_kmeans    — Lloyd's k-means with sample-points init, replacing
//                       scipy.cluster.vq.kmeans2(minit='points') used for
//                       inducing-point initialization
//                       (reference src/gpode/model_initialization.py:29).
//   * gpode_integrate — adaptive Dormand-Prince 5(4) IVP integration of the
//                       built-in benchmark systems (Van der Pol,
//                       FitzHugh-Nagumo), replacing scipy.integrate.odeint
//                       (FORTRAN LSODA) for dataset simulation
//                       (reference src/datasets/vanderpol.py:55, fhn.py:49).
//   * gpode_integrate_cb — same integrator driving an arbitrary Python/C
//                       callback right-hand side.
//
// Pure C ABI; bound from Python with ctypes (gpode_tpu/utils/native.py).
// Device compute stays in XLA/Pallas — this library is the host-side runtime.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// k-means
// ---------------------------------------------------------------------------

// data: (n, d) row-major; centers_out: (k, d). Returns iterations used, or -1.
int gpode_kmeans(const float* data, int64_t n, int64_t d, int64_t k,
                 int64_t max_iters, uint64_t seed, float* centers_out) {
  if (n < k || k <= 0 || d <= 0) return -1;
  std::mt19937_64 rng(seed);

  // init: k distinct data points (scipy kmeans2 minit='points')
  std::vector<int64_t> perm(n);
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  for (int64_t i = 0; i < k; ++i) {
    std::uniform_int_distribution<int64_t> pick(i, n - 1);
    std::swap(perm[i], perm[pick(rng)]);
  }
  std::vector<double> centers(k * d);
  for (int64_t c = 0; c < k; ++c)
    for (int64_t j = 0; j < d; ++j)
      centers[c * d + j] = data[perm[c] * d + j];

  std::vector<int64_t> assign(n, -1);
  std::vector<double> sums(k * d);
  std::vector<int64_t> counts(k);

  int iters = 0;
  for (; iters < max_iters; ++iters) {
    bool changed = false;
    // assignment
    for (int64_t i = 0; i < n; ++i) {
      double best = 1e300;
      int64_t best_c = 0;
      for (int64_t c = 0; c < k; ++c) {
        double dist = 0.0;
        for (int64_t j = 0; j < d; ++j) {
          const double diff = data[i * d + j] - centers[c * d + j];
          dist += diff * diff;
        }
        if (dist < best) { best = dist; best_c = c; }
      }
      if (assign[i] != best_c) { assign[i] = best_c; changed = true; }
    }
    if (!changed && iters > 0) break;
    // update
    std::fill(sums.begin(), sums.end(), 0.0);
    std::fill(counts.begin(), counts.end(), 0);
    for (int64_t i = 0; i < n; ++i) {
      counts[assign[i]] += 1;
      for (int64_t j = 0; j < d; ++j) sums[assign[i] * d + j] += data[i * d + j];
    }
    for (int64_t c = 0; c < k; ++c) {
      if (counts[c] == 0) {
        // re-seed empty cluster at a random data point
        std::uniform_int_distribution<int64_t> pick(0, n - 1);
        const int64_t p = pick(rng);
        for (int64_t j = 0; j < d; ++j) centers[c * d + j] = data[p * d + j];
      } else {
        for (int64_t j = 0; j < d; ++j)
          centers[c * d + j] = sums[c * d + j] / counts[c];
      }
    }
  }
  for (int64_t c = 0; c < k; ++c)
    for (int64_t j = 0; j < d; ++j)
      centers_out[c * d + j] = static_cast<float>(centers[c * d + j]);
  return iters;
}

// ---------------------------------------------------------------------------
// Dormand-Prince 5(4) with per-observation clipping
// ---------------------------------------------------------------------------

typedef void (*rhs_fn)(double t, const double* y, double* dy, void* ctx);

namespace {

struct SystemCtx {
  const double* params;
};

void vdp_rhs(double /*t*/, const double* y, double* dy, void* ctx) {
  const double mu = static_cast<SystemCtx*>(ctx)->params[0];
  dy[0] = y[1];
  dy[1] = -y[0] + mu * y[1] * (1.0 - y[0] * y[0]);
}

void fhn_rhs(double /*t*/, const double* y, double* dy, void* /*ctx*/) {
  dy[0] = 3.0 * (y[0] - y[0] * y[0] * y[0] / 3.0 + y[1]);
  dy[1] = (1.0 / 3.0) * (0.2 - 3.0 * y[0] - 0.2 * y[1]);
}

// Dormand-Prince tableau
const double C[7] = {0.0, 1.0 / 5, 3.0 / 10, 4.0 / 5, 8.0 / 9, 1.0, 1.0};
const double A[7][6] = {
    {},
    {1.0 / 5},
    {3.0 / 40, 9.0 / 40},
    {44.0 / 45, -56.0 / 15, 32.0 / 9},
    {19372.0 / 6561, -25360.0 / 2187, 64448.0 / 6561, -212.0 / 729},
    {9017.0 / 3168, -355.0 / 33, 46732.0 / 5247, 49.0 / 176, -5103.0 / 18656},
    {35.0 / 384, 0.0, 500.0 / 1113, 125.0 / 192, -2187.0 / 6784, 11.0 / 84}};
const double B5[7] = {35.0 / 384, 0.0, 500.0 / 1113, 125.0 / 192,
                      -2187.0 / 6784, 11.0 / 84, 0.0};
const double B4[7] = {5179.0 / 57600, 0.0, 7571.0 / 16695, 393.0 / 640,
                      -92097.0 / 339200, 187.0 / 2100, 1.0 / 40};

int integrate(rhs_fn f, void* ctx, const double* x0, int64_t dim,
              const double* ts, int64_t num_t, double rtol, double atol,
              double* out) {
  std::vector<double> y(x0, x0 + dim), ynew(dim), err(dim);
  std::vector<std::vector<double>> k(7, std::vector<double>(dim));
  double t = ts[0];
  std::memcpy(out, y.data(), dim * sizeof(double));

  const double dir = (num_t > 1 && ts[num_t - 1] < ts[0]) ? -1.0 : 1.0;
  double h = dir * 1e-3;

  for (int64_t idx = 1; idx < num_t; ++idx) {
    const double t_end = ts[idx];
    int guard = 0;
    while (dir * (t_end - t) > 1e-14) {
      if (++guard > 1000000) return -1;
      if (dir * (t + h - t_end) > 0.0) h = t_end - t;

      f(t, y.data(), k[0].data(), ctx);
      for (int s = 1; s < 7; ++s) {
        for (int64_t j = 0; j < dim; ++j) {
          double acc = y[j];
          for (int p = 0; p < s; ++p) acc += h * A[s][p] * k[p][j];
          ynew[j] = acc;
        }
        f(t + C[s] * h, ynew.data(), k[s].data(), ctx);
      }
      double err_norm = 0.0;
      for (int64_t j = 0; j < dim; ++j) {
        double y5 = y[j], e = 0.0;
        for (int s = 0; s < 7; ++s) {
          y5 += h * B5[s] * k[s][j];
          e += h * (B5[s] - B4[s]) * k[s][j];
        }
        ynew[j] = y5;
        const double sc = atol + rtol * std::fmax(std::fabs(y[j]), std::fabs(y5));
        err_norm += (e / sc) * (e / sc);
      }
      err_norm = std::sqrt(err_norm / dim);
      if (err_norm <= 1.0) {
        t += h;
        y = ynew;
      }
      const double factor =
          std::fmin(10.0, std::fmax(0.2, 0.9 * std::pow(err_norm + 1e-16, -0.2)));
      h *= factor;
    }
    std::memcpy(out + idx * dim, y.data(), dim * sizeof(double));
  }
  return 0;
}

}  // namespace

// system: 0 = Van der Pol (params[0] = mu), 1 = FitzHugh-Nagumo.
int gpode_integrate(int system, const double* params, const double* x0,
                    int64_t dim, const double* ts, int64_t num_t, double rtol,
                    double atol, double* out) {
  SystemCtx ctx{params};
  rhs_fn f = nullptr;
  switch (system) {
    case 0: f = vdp_rhs; break;
    case 1: f = fhn_rhs; break;
    default: return -2;
  }
  return integrate(f, &ctx, x0, dim, ts, num_t, rtol, atol, out);
}

// Arbitrary callback rhs (e.g. a Python ctypes CFUNCTYPE).
int gpode_integrate_cb(rhs_fn f, void* ctx, const double* x0, int64_t dim,
                       const double* ts, int64_t num_t, double rtol,
                       double atol, double* out) {
  return integrate(f, ctx, x0, dim, ts, num_t, rtol, atol, out);
}

}  // extern "C"
