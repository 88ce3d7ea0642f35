// Exact balanced assignment via successive-shortest-path min-cost flow.
//
// Role: the assignment step of equal-size k-means. The reference delegates this
// to k_means_constrained's native min-cost-flow core (reference:
// moefication/moe_utils.py:11,104); here it is a self-contained C++ solver
// exposed through a C ABI and loaded with ctypes
// (moefication/cluster.py method="exact").
//
// Problem: assign each of N points to one of K clusters, each cluster holding at
// most `capacity` points, minimizing total cost. Unit supplies => one Dijkstra
// (with Johnson potentials over both point and cluster nodes, keeping reduced
// costs non-negative) per point, augmenting along alternating
// point->cluster->point->... paths.
//
// Build: g++ -O3 -shared -fPIC balanced_assign.cpp -o libbalanced_assign.so

#include <algorithm>
#include <cstdint>
#include <limits>
#include <queue>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Solver {
  int n, k, cap;
  const double* cost;                     // n x k row-major
  std::vector<int> assign;                // point -> cluster (-1 unassigned)
  std::vector<std::vector<int>> members;  // cluster -> points
  std::vector<double> pi_p, pi_c;         // potentials

  Solver(const double* c, int n_, int k_, int cap_)
      : n(n_), k(k_), cap(cap_), cost(c), assign(n_, -1), members(k_) {
    pi_p.assign(n, 0.0);
    pi_c.assign(k, 0.0);
  }

  double c_at(int i, int j) const { return cost[(size_t)i * k + j]; }

  bool augment(int s) {
    // Dijkstra over tagged nodes: id < k => cluster id, else point (id - k).
    std::vector<double> dist_c(k, kInf), dist_p(n, kInf);
    std::vector<int> par_c(k, -1);   // cluster j reached from point par_c[j]
    std::vector<int> par_p(n, -1);   // point i reached from cluster par_p[i]
    std::vector<char> done_c(k, 0), done_p(n, 0);
    using Item = std::pair<double, int>;
    std::priority_queue<Item, std::vector<Item>, std::greater<Item>> pq;

    dist_p[s] = 0.0;
    pq.push({0.0, k + s});
    int sink = -1;
    double sink_dist = kInf;

    while (!pq.empty()) {
      auto [d, id] = pq.top();
      pq.pop();
      if (id < k) {                                   // cluster node
        int j = id;
        if (done_c[j] || d > dist_c[j]) continue;
        done_c[j] = 1;
        if ((int)members[j].size() < cap) { sink = j; sink_dist = d; break; }
        for (int i : members[j]) {                    // reverse edges j -> i
          if (done_p[i]) continue;
          // red(j->i) = -c_ij + pi_c[j] - pi_p[i]
          double nd = d + (-c_at(i, j) + pi_c[j] - pi_p[i]);
          if (nd < dist_p[i] - 1e-15) {
            dist_p[i] = nd;
            par_p[i] = j;
            pq.push({nd, k + i});
          }
        }
      } else {                                        // point node
        int i = id - k;
        if (done_p[i] || d > dist_p[i]) continue;
        done_p[i] = 1;
        const double* row = cost + (size_t)i * k;
        for (int j = 0; j < k; ++j) {                 // forward edges i -> j
          if (done_c[j] || assign[i] == j) continue;
          double nd = d + (row[j] + pi_p[i] - pi_c[j]);
          if (nd < dist_c[j] - 1e-15) {
            dist_c[j] = nd;
            par_c[j] = i;
            pq.push({nd, j});
          }
        }
      }
    }
    if (sink < 0) return false;

    // potential update: pi(v) += min(dist(v), sink_dist) for ALL nodes.
    // Unreached nodes (dist = inf) shift by sink_dist too — otherwise residual
    // reduced costs between drifted and un-drifted nodes can turn negative in
    // later augmentations, breaking Dijkstra and optimality.
    for (int j = 0; j < k; ++j) pi_c[j] += std::min(dist_c[j], sink_dist);
    for (int i = 0; i < n; ++i) pi_p[i] += std::min(dist_p[i], sink_dist);

    // walk alternating path back from sink, applying reassignments
    int j = sink;
    while (j != -1) {
      int i = par_c[j];
      int prev = (i == s) ? -1 : par_p[i];            // cluster i leaves
      if (prev != -1) {
        auto& m = members[prev];
        m.erase(std::find(m.begin(), m.end(), i));
      }
      assign[i] = j;
      members[j].push_back(i);
      j = prev;
    }
    return true;
  }

  int run(int64_t* out) {
    for (int i = 0; i < n; ++i)
      if (!augment(i)) return 2;
    for (int i = 0; i < n; ++i) out[i] = assign[i];
    return 0;
  }
};

}  // namespace

extern "C" {

// cost: row-major n*k doubles; out: n int64 labels. Returns 0 on success.
int balanced_assign(const double* cost, int n, int k, int capacity,
                    int64_t* out) {
  if (n <= 0 || k <= 0 || (int64_t)capacity * k < n) return 1;
  Solver s(cost, n, k, capacity);
  return s.run(out);
}

}  // extern "C"
