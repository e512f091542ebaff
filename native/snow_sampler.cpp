// Native dart-throwing sampler for snow-particle banks.
//
// Same accept/reject process as lidar_snow_sim_tpu.sampling.dart (reference
// semantics: centers uniform-in-area over a disk of radius R0, ball diameters
// truncated-exponential (cap 20 mm), plane-intersection disk radii, rejection
// of origin-covering or overlapping disks, stop at the first acceptance that
// reaches the target area). A uniform spatial hash (cell = max disk diameter)
// makes the overlap check O(1), so generating the reference's full
// 2 x 50 x 64-channel bank grid takes seconds instead of CPU-days.
//
// C ABI for ctypes; thread-safe (no globals).

#include <cmath>
#include <cstdint>
#include <random>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct Grid {
  double cell;
  std::unordered_map<int64_t, std::vector<int32_t>> cells;

  static int64_t key(int64_t ix, int64_t iy) { return (ix << 21) ^ iy; }

  int64_t index(double v) const {
    return static_cast<int64_t>(std::floor(v / cell)) + (1 << 19);
  }
};

}  // namespace

extern "C" {

// Returns the number of accepted particles written to out (rows x,y,r), or -1
// if cap was exceeded before the area target was met.
int64_t snow_dart_throw(double occupancy_ratio, double rate_param_per_cm,
                        double r0, uint64_t seed, double max_diameter_mm,
                        int64_t cap, double* out) {
  const double scale_mm = 10.0 / rate_param_per_cm;  // mean diameter in mm
  const double area_target = occupancy_ratio * kPi * r0 * r0;

  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  std::exponential_distribution<double> expo(1.0 / scale_mm);

  Grid grid{max_diameter_mm / 1000.0, {}};

  std::vector<double> xs, ys, rs;
  xs.reserve(1 << 16);
  ys.reserve(1 << 16);
  rs.reserve(1 << 16);

  double area = 0.0;
  while (area < area_target) {
    const double length = std::sqrt(unif(rng)) * r0;
    const double angle = unif(rng) * 2.0 * kPi;
    const double x = length * std::cos(angle);
    const double y = length * std::sin(angle);

    double d_mm;
    do {
      d_mm = expo(rng);
    } while (d_mm > max_diameter_mm);
    const double d = d_mm / 1000.0;
    const double h = (unif(rng) - 0.5) * d;
    const double r = std::sqrt(d * d / 4.0 - h * h);

    if (x * x + y * y <= r * r) continue;  // disk covers the sensor origin

    const int64_t ix = grid.index(x), iy = grid.index(y);
    bool overlap = false;
    for (int64_t dx = -1; dx <= 1 && !overlap; ++dx) {
      for (int64_t dy = -1; dy <= 1 && !overlap; ++dy) {
        auto it = grid.cells.find(Grid::key(ix + dx, iy + dy));
        if (it == grid.cells.end()) continue;
        for (int32_t j : it->second) {
          const double ddx = xs[j] - x, ddy = ys[j] - y, rr = rs[j] + r;
          if (ddx * ddx + ddy * ddy <= rr * rr) {
            overlap = true;
            break;
          }
        }
      }
    }
    if (overlap) continue;

    const auto n = static_cast<int64_t>(xs.size());
    if (n >= cap) return -1;
    grid.cells[Grid::key(ix, iy)].push_back(static_cast<int32_t>(n));
    xs.push_back(x);
    ys.push_back(y);
    rs.push_back(r);
    area += kPi * r * r;
  }

  const auto n = static_cast<int64_t>(xs.size());
  for (int64_t i = 0; i < n; ++i) {
    out[3 * i + 0] = xs[i];
    out[3 * i + 1] = ys[i];
    out[3 * i + 2] = rs[i];
  }
  return n;
}

}  // extern "C"
