// Native high-accuracy integrator oracle + rocket flow maps.
//
// An independent C++ implementation of the framework's dynamics and an
// adaptive embedded Dormand-Prince 5(4) integrator with PI step control,
// mirroring the role of the reference's Boost.odeint RKF78 + CppAD stack
// (scpp_core/src/simulation.cpp:31-42, systemDynamics.hpp:110-235): it
// provides golden trajectories for cross-validating the JAX flow maps and
// fixed-step lax.scan integrators without any Python/JAX in the loop.
//
// C ABI (ctypes):
//   int scpp_simulate(int model_id, const double* par, const double* x0,
//                     const double* u0, const double* u1, double dt,
//                     double rtol, double atol, double* x_out, long* n_steps)
//   model_id: 0 = Rocket2D (n=6, m=2, p=6)
//             1 = RocketQuat (n=14, m=4, p=10)
//             2 = RocketEuler (n=13, m=4, p=10)
// Input u(t) = u0 + t/dt (u1 - u0) (FOH), as in scpp::simulate.

#include <cmath>
#include <cstring>
#include <algorithm>

namespace {

constexpr int MAX_N = 16;

// ---- flow maps ----

void rocket2d_f(const double* par, const double* x, const double* u,
                double* f) {
  const double m = par[0], J_B = par[1];
  const double gx = par[2], gy = par[3];
  const double rTx = par[4], rTy = par[5];

  const double angle = u[0], mag = u[1];
  // T_B = Rot(angle) * (0, mag)
  const double Tx = -std::sin(angle) * mag;
  const double Ty = std::cos(angle) * mag;
  const double eta = x[4];
  const double c = std::cos(eta), s = std::sin(eta);

  f[0] = x[2];
  f[1] = x[3];
  f[2] = (c * Tx - s * Ty) / m + gx;
  f[3] = (s * Tx + c * Ty) / m + gy;
  f[4] = x[5];
  f[5] = (rTx * Ty - rTy * Tx) / J_B;
}

void rocketquat_f(const double* par, const double* x, const double* u,
                  double* f) {
  const double alpha_m = par[0];
  const double* g_I = par + 1;
  const double* J_B = par + 4;
  const double* r_T_B = par + 7;

  const double m = x[0];
  const double* v = x + 4;
  const double* q = x + 7;   // w, x, y, z
  const double* w = x + 11;
  const double* T = u;       // thrust (3)
  const double tz = u[3];

  const double Tn = std::sqrt(T[0] * T[0] + T[1] * T[1] + T[2] * T[2]);

  // rotation matrix from raw (possibly non-unit) quaternion, Eigen-style
  const double qw = q[0], qx = q[1], qy = q[2], qz = q[3];
  double R[3][3] = {
      {1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)},
      {2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)},
      {2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)}};

  f[0] = -alpha_m * Tn;
  f[1] = v[0];
  f[2] = v[1];
  f[3] = v[2];
  for (int i = 0; i < 3; ++i)
    f[4 + i] = (R[i][0] * T[0] + R[i][1] * T[1] + R[i][2] * T[2]) / m + g_I[i];
  // qdot = 0.5 * Omega(w) q
  f[7] = 0.5 * (-w[0] * qx - w[1] * qy - w[2] * qz);
  f[8] = 0.5 * (w[0] * qw + w[2] * qy - w[1] * qz);
  f[9] = 0.5 * (w[1] * qw - w[2] * qx + w[0] * qz);
  f[10] = 0.5 * (w[2] * qw + w[1] * qx - w[0] * qy);
  // wdot = (r_T_B x T + (0,0,tz)) / J_B   (w x w = 0 identically)
  const double tau0 = r_T_B[1] * T[2] - r_T_B[2] * T[1];
  const double tau1 = r_T_B[2] * T[0] - r_T_B[0] * T[2];
  const double tau2 = r_T_B[0] * T[1] - r_T_B[1] * T[0] + tz;
  f[11] = tau0 / J_B[0];
  f[12] = tau1 / J_B[1];
  f[13] = tau2 / J_B[2];
}

void rocketeuler_f(const double* par, const double* x, const double* u,
                   double* f) {
  // RocketQuat dynamics with intrinsic x-y'-z'' Euler attitude
  // (scpp_tpu/models/rocket_euler.py:138-159): state
  // (m, r(3), v(3), eta(3), w(3)), input (T(3), tz).
  const double alpha_m = par[0];
  const double* g_I = par + 1;
  const double* J_B = par + 4;
  const double* r_T_B = par + 7;

  const double m = x[0];
  const double* v = x + 4;
  const double* eta = x + 7;
  const double* w = x + 10;
  const double* T = u;
  const double tz = u[3];

  const double Tn = std::sqrt(T[0] * T[0] + T[1] * T[1] + T[2] * T[2]);

  const double cphi = std::cos(eta[0]), sphi = std::sin(eta[0]);
  const double cth = std::cos(eta[1]), sth = std::sin(eta[1]);
  const double cpsi = std::cos(eta[2]), spsi = std::sin(eta[2]);

  // R = Rx(phi) * Ry(theta) * Rz(psi)
  double Ry_z[3][3] = {{cth * cpsi, -cth * spsi, sth},
                       {spsi, cpsi, 0.0},
                       {-sth * cpsi, sth * spsi, cth}};
  double R[3][3];
  // Rx(phi) * Ry_z
  for (int j = 0; j < 3; ++j) R[0][j] = Ry_z[0][j];
  for (int j = 0; j < 3; ++j)
    R[1][j] = cphi * Ry_z[1][j] - sphi * Ry_z[2][j];
  for (int j = 0; j < 3; ++j)
    R[2][j] = sphi * Ry_z[1][j] + cphi * Ry_z[2][j];

  f[0] = -alpha_m * Tn;
  f[1] = v[0];
  f[2] = v[1];
  f[3] = v[2];
  for (int i = 0; i < 3; ++i)
    f[4 + i] = (R[i][0] * T[0] + R[i][1] * T[1] + R[i][2] * T[2]) / m + g_I[i];
  // etadot = M(eta) w  (rotationJacobianXYZ re-derivation,
  // models/mathlib.py:95-110; singular at theta = +-90 deg)
  f[7] = (cpsi * w[0] - spsi * w[1]) / cth;
  f[8] = spsi * w[0] + cpsi * w[1];
  f[9] = (-sth * cpsi * w[0] + sth * spsi * w[1]) / cth + w[2];
  const double tau0 = r_T_B[1] * T[2] - r_T_B[2] * T[1];
  const double tau1 = r_T_B[2] * T[0] - r_T_B[0] * T[2];
  const double tau2 = r_T_B[0] * T[1] - r_T_B[1] * T[0] + tz;
  f[10] = tau0 / J_B[0];
  f[11] = tau1 / J_B[1];
  f[12] = tau2 / J_B[2];
}

struct Model {
  int n, m;
  void (*f)(const double*, const double*, const double*, double*);
};

const Model kModels[] = {
    {6, 2, rocket2d_f},
    {14, 4, rocketquat_f},
    {13, 4, rocketeuler_f},
};

// ---- adaptive Dormand-Prince 5(4) ----

// Butcher tableau (classic dopri5 coefficients)
const double C2 = 1.0 / 5, C3 = 3.0 / 10, C4 = 4.0 / 5, C5 = 8.0 / 9;
const double A21 = 1.0 / 5;
const double A31 = 3.0 / 40, A32 = 9.0 / 40;
const double A41 = 44.0 / 45, A42 = -56.0 / 15, A43 = 32.0 / 9;
const double A51 = 19372.0 / 6561, A52 = -25360.0 / 2187,
             A53 = 64448.0 / 6561, A54 = -212.0 / 729;
const double A61 = 9017.0 / 3168, A62 = -355.0 / 33, A63 = 46732.0 / 5247,
             A64 = 49.0 / 176, A65 = -5103.0 / 18656;
const double A71 = 35.0 / 384, A73 = 500.0 / 1113, A74 = 125.0 / 192,
             A75 = -2187.0 / 6784, A76 = 11.0 / 84;
// 4th-order embedded weights
const double B1 = 5179.0 / 57600, B3 = 7571.0 / 16695, B4 = 393.0 / 640,
             B5 = -92097.0 / 339200, B6 = 187.0 / 2100, B7 = 1.0 / 40;

}  // namespace

extern "C" int scpp_simulate(int model_id, const double* par,
                             const double* x0, const double* u0,
                             const double* u1, double dt, double rtol,
                             double atol, double* x_out, long* n_steps) {
  if (model_id < 0 || model_id >= 3) return -1;
  const Model& M = kModels[model_id];
  const int n = M.n;

  double x[MAX_N], xt[MAX_N], xe[MAX_N];
  double k1[MAX_N], k2[MAX_N], k3[MAX_N], k4[MAX_N], k5[MAX_N], k6[MAX_N],
      k7[MAX_N];
  double u[8];
  std::memcpy(x, x0, n * sizeof(double));

  auto eval = [&](double t, const double* xx, double* ff) {
    const double a = t / dt;
    for (int j = 0; j < M.m; ++j) u[j] = u0[j] + a * (u1[j] - u0[j]);
    M.f(par, xx, u, ff);
  };

  double t = 0.0;
  double h = dt / 16.0;
  long steps = 0;
  const long max_steps = 4000000;

  while (t < dt && steps < max_steps) {
    if (t + h > dt) h = dt - t;

    eval(t, x, k1);
    for (int i = 0; i < n; ++i) xt[i] = x[i] + h * A21 * k1[i];
    eval(t + C2 * h, xt, k2);
    for (int i = 0; i < n; ++i) xt[i] = x[i] + h * (A31 * k1[i] + A32 * k2[i]);
    eval(t + C3 * h, xt, k3);
    for (int i = 0; i < n; ++i)
      xt[i] = x[i] + h * (A41 * k1[i] + A42 * k2[i] + A43 * k3[i]);
    eval(t + C4 * h, xt, k4);
    for (int i = 0; i < n; ++i)
      xt[i] = x[i] + h * (A51 * k1[i] + A52 * k2[i] + A53 * k3[i] + A54 * k4[i]);
    eval(t + C5 * h, xt, k5);
    for (int i = 0; i < n; ++i)
      xt[i] = x[i] + h * (A61 * k1[i] + A62 * k2[i] + A63 * k3[i] +
                          A64 * k4[i] + A65 * k5[i]);
    eval(t + h, xt, k6);
    for (int i = 0; i < n; ++i)
      xt[i] = x[i] + h * (A71 * k1[i] + A73 * k3[i] + A74 * k4[i] +
                          A75 * k5[i] + A76 * k6[i]);  // 5th-order solution
    eval(t + h, xt, k7);

    // embedded 4th-order error estimate
    double err = 0.0;
    for (int i = 0; i < n; ++i) {
      xe[i] = x[i] + h * (B1 * k1[i] + B3 * k3[i] + B4 * k4[i] + B5 * k5[i] +
                          B6 * k6[i] + B7 * k7[i]);
      const double sc =
          atol + rtol * std::max(std::fabs(x[i]), std::fabs(xt[i]));
      const double e = (xt[i] - xe[i]) / sc;
      err += e * e;
    }
    err = std::sqrt(err / n);

    if (err <= 1.0) {
      t += h;
      std::memcpy(x, xt, n * sizeof(double));
    }
    const double fac =
        std::min(5.0, std::max(0.2, 0.9 * std::pow(std::max(err, 1e-16), -0.2)));
    h *= fac;
    ++steps;
  }

  std::memcpy(x_out, x, n * sizeof(double));
  if (n_steps) *n_steps = steps;
  return (t >= dt) ? 0 : 1;
}
