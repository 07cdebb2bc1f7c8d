// Host-side serial oracles for the TPU framework's data-parallel solvers.
//
// These are exact sequential algorithms (binary-heap Dijkstra, Hopf-Lax
// variant, Gauss-Seidel p-eikonal) used (a) as correctness oracles for the
// on-device Bellman-Ford / Jacobi fixed-point iterations
// (graphlearning_tpu/solvers/eikonal.py) and (b) as a low-latency path for
// tiny graphs where host beats device round-trips.
//
// Own implementation (std::priority_queue; CSR in, distances out) of the
// same mathematical recursions the reference implements with a hand-rolled
// heap in c_code/hjsolvers.cpp:37-227 — cited for parity, not copied.
//
// Build: g++ -O3 -march=native -shared -fPIC oracles.cpp -o liboracles.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <queue>
#include <utility>
#include <vector>

extern "C" {

// Graph in CSR: row_ptr[n+1], col_idx[nnz], weights[nnz].
// bdy_idx[m] starting nodes with values bdy_val[m]; f[n] per-node RHS.
// Output: dist[n] (pre-filled with +inf by caller), cp[n] closest points.
// hopf_lax selects the quadratic HJ update.
void dijkstra_oracle(const int64_t* row_ptr, const int32_t* col_idx,
                     const double* weights, int32_t n,
                     const int32_t* bdy_idx, const double* bdy_val, int32_t m,
                     const double* f, double max_dist, int32_t hopf_lax,
                     double* dist, int32_t* cp) {
  using QE = std::pair<double, int32_t>;  // (dist, node), min-heap
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> heap;
  std::vector<char> done(n, 0);

  for (int32_t i = 0; i < m; ++i) {
    int32_t v = bdy_idx[i];
    if (bdy_val[i] < dist[v]) {
      dist[v] = bdy_val[i];
      cp[v] = v;
    }
  }
  for (int32_t i = 0; i < m; ++i) heap.emplace(dist[bdy_idx[i]], bdy_idx[i]);

  while (!heap.empty()) {
    auto [d, u] = heap.top();
    heap.pop();
    if (done[u] || d > dist[u]) continue;
    done[u] = 1;
    if (d > max_dist) break;
    for (int64_t e = row_ptr[u]; e < row_ptr[u + 1]; ++e) {
      int32_t v = col_idx[e];
      if (v == u || done[v]) continue;
      double cand;
      if (hopf_lax) {
        double fw = f[u] * weights[e];
        cand = 0.5 * (fw + std::sqrt(fw * fw + 4.0 * dist[u] * dist[u]));
      } else {
        cand = dist[u] + weights[e] * f[u];
      }
      if (cand < dist[v]) {
        dist[v] = cand;
        cp[v] = cp[u];
        heap.emplace(cand, v);
      }
    }
  }
}

// Gauss-Seidel p-eikonal: solve sum_j w_ij (u_i - u_j)_+^p = f_i per node,
// sweeping until max update < tol.  p==1 uses the exact sorted-prefix
// formula; p!=1 bisection (num_bisection_it steps).
void peikonal_oracle(const int64_t* row_ptr, const int32_t* col_idx,
                     const double* weights, int32_t n,
                     const int32_t* bdy_idx, const double* bdy_val, int32_t m,
                     const double* f, double p, int32_t max_num_it, double tol,
                     int32_t num_bisection_it, double* u) {
  std::vector<char> is_bdy(n, 0);
  for (int32_t i = 0; i < m; ++i) {
    is_bdy[bdy_idx[i]] = 1;
    u[bdy_idx[i]] = bdy_val[i];
  }
  std::vector<std::pair<double, double>> nb;  // (u_j, w_j)
  double err = tol + 1;
  for (int32_t it = 0; it < max_num_it && err > tol; ++it) {
    err = 0;
    for (int32_t i = 0; i < n; ++i) {
      if (is_bdy[i]) continue;
      nb.clear();
      for (int64_t e = row_ptr[i]; e < row_ptr[i + 1]; ++e)
        nb.emplace_back(u[col_idx[e]], weights[e]);
      if (nb.empty()) continue;
      double newu;
      if (p == 1.0) {
        std::sort(nb.begin(), nb.end());
        double wsum = nb[0].second, wusum = nb[0].first * nb[0].second;
        double t = (f[i] + wusum) / wsum;
        size_t k = 0;
        while (k + 1 < nb.size() && t > nb[k + 1].first) {
          ++k;
          wusum += nb[k].first * nb[k].second;
          wsum += nb[k].second;
          t = (f[i] + wusum) / wsum;
        }
        newu = t;
      } else {
        double umin = nb[0].first, umax = nb[0].first, deg = 0;
        for (auto& [uj, wj] : nb) {
          umin = std::min(umin, uj);
          umax = std::max(umax, uj);
          deg += wj;
        }
        double inc = std::pow(f[i] / deg, 1.0 / p);
        double a = umin + inc, b = umax + inc;
        for (int32_t bi = 0; bi < num_bisection_it; ++bi) {
          double t = 0.5 * (a + b), op = 0;
          for (auto& [uj, wj] : nb) {
            double v = std::max(t - uj, 0.0);
            op += wj * std::pow(v, p);
          }
          if (op > f[i]) b = t; else a = t;
        }
        newu = 0.5 * (a + b);
      }
      err = std::max(err, std::fabs(newu - u[i]));
      u[i] = newu;
    }
  }
}

}  // extern "C"
