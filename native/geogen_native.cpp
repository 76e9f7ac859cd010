// Native synthetic-geology batch generator (host-side data pipeline).
//
// The reference feeds training from the external GeoGen generator running in
// 16 CPU dataloader worker processes (model_train_inference.py:249-260).
// This is the TPU build's native equivalent for the host path: a C++
// generator producing the same volume family as
// flowtrain_stochastic_interpolation_tpu/data/synthetic.py (tilted + folded
// strata under a random topographic surface, cross-cutting dikes, air = -1),
// callable from Python via ctypes (data/native.py).  On a real TPU VM the
// host cores run this concurrently with device steps, so data generation
// never blocks the accelerator; threads fan out over batch items.
//
// Category convention (GeoGen parity): int32 values in [-1, n_categories-2],
// -1 = air (boreholes.py:100 tests air with == -1).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxDikes = 3;
constexpr int kSurfWaves = 4;
constexpr int kFoldWaves = 3;
constexpr double kTwoPi = 6.283185307179586;

// SplitMix64: tiny, high-quality, seedable PRNG (public-domain algorithm).
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  double uniform() { return (next() >> 11) * 0x1.0p-53; }
  double uniform(double lo, double hi) { return lo + (hi - lo) * uniform(); }
  int randint(int lo, int hi) {  // [lo, hi)
    return lo + static_cast<int>(next() % static_cast<uint64_t>(hi - lo));
  }
};

struct Wave {
  double fx, fy, amp, phase;
};

// Sum of random 2D sinusoids — smooth random field over the (x, y) grid.
void make_waves(Rng& rng, Wave* waves, int n, double amp_scale, double freq_scale) {
  for (int i = 0; i < n; ++i) {
    waves[i].fx = rng.uniform(0.5, freq_scale);
    waves[i].fy = rng.uniform(0.5, freq_scale);
    waves[i].amp = rng.uniform(0.2, 1.0) * amp_scale;
    waves[i].phase = rng.uniform(0.0, kTwoPi);
  }
}

double eval_waves(const Wave* waves, int n, double x, double y) {
  double v = 0.0;
  for (int i = 0; i < n; ++i)
    v += waves[i].amp * std::sin(kTwoPi * (waves[i].fx * x + waves[i].fy * y) + waves[i].phase);
  return v;
}

void generate_one(int32_t* out, int X, int Y, int Z, int n_categories, uint64_t seed) {
  Rng rng(seed);
  const int n_rock = n_categories - 1;

  Wave surf[kSurfWaves], fold[kFoldWaves];
  make_waves(rng, surf, kSurfWaves, 0.08 * Z, 2.5);
  make_waves(rng, fold, kFoldWaves, 0.05 * Z, 3.0);

  const double tilt_x = rng.uniform(-0.35, 0.35) * Z;
  const double tilt_y = rng.uniform(-0.35, 0.35) * Z;
  const double thickness = rng.uniform(0.04 * Z, 0.12 * Z);
  const double base_offset = rng.uniform(0.0, 8.0) * thickness;

  constexpr int kPalette = 32;
  int palette[kPalette];
  for (int i = 0; i < kPalette; ++i) palette[i] = rng.randint(0, n_rock - 1);

  const int n_dikes = rng.randint(0, kMaxDikes + 1);
  double nrm[kMaxDikes][3], p0[kMaxDikes][3], width[kMaxDikes];
  for (int i = 0; i < kMaxDikes; ++i) {
    // normal ~ N(0,1)^3 via Box-Muller pairs, then normalised
    double g[3];
    for (int c = 0; c < 3; ++c) {
      double u1 = std::max(rng.uniform(), 1e-12), u2 = rng.uniform();
      g[c] = std::sqrt(-2.0 * std::log(u1)) * std::cos(kTwoPi * u2);
    }
    double norm = std::sqrt(g[0] * g[0] + g[1] * g[1] + g[2] * g[2]);
    for (int c = 0; c < 3; ++c) nrm[i][c] = g[c] / norm;
    for (int c = 0; c < 3; ++c) p0[i][c] = rng.uniform();
    width[i] = rng.uniform(0.008, 0.025);
  }

  for (int ix = 0; ix < X; ++ix) {
    const double xu = static_cast<double>(ix) / X;
    for (int iy = 0; iy < Y; ++iy) {
      const double yu = static_cast<double>(iy) / Y;
      const double surf_h = std::clamp(
          0.75 * Z + eval_waves(surf, kSurfWaves, xu, yu), 0.55 * Z, Z - 1.0);
      const double fold_v = eval_waves(fold, kFoldWaves, xu, yu);
      int32_t* col = out + (static_cast<int64_t>(ix) * Y + iy) * Z;
      for (int iz = 0; iz < Z; ++iz) {
        if (iz > surf_h) {
          col[iz] = -1;  // air
          continue;
        }
        const double s = iz + tilt_x * xu + tilt_y * yu + fold_v + base_offset;
        int layer = static_cast<int>(std::floor(s / thickness));
        layer %= kPalette;
        if (layer < 0) layer += kPalette;
        int cat = palette[layer];
        for (int d = 0; d < n_dikes; ++d) {
          const double zu = static_cast<double>(iz) / Z;
          const double dist = std::fabs((xu - p0[d][0]) * nrm[d][0] +
                                        (yu - p0[d][1]) * nrm[d][1] +
                                        (zu - p0[d][2]) * nrm[d][2]);
          if (dist < width[d]) {
            cat = n_rock - 1;
            break;
          }
        }
        col[iz] = cat;
      }
    }
  }
}

}  // namespace

extern "C" {

// Fill out[batch, X, Y, Z] (C-contiguous int32) with independent volumes.
// Threaded over batch items; n_threads <= 0 -> hardware concurrency.
void geogen_generate_batch(int32_t* out, int batch, int X, int Y, int Z,
                           int n_categories, uint64_t seed, int n_threads) {
  const int64_t vol = static_cast<int64_t>(X) * Y * Z;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads <= 0) n_threads = hw > 0 ? hw : 1;
  n_threads = std::min(n_threads, batch);

  auto work = [&](int start, int stride) {
    for (int b = start; b < batch; b += stride)
      generate_one(out + b * vol, X, Y, Z, n_categories,
                   seed * 0x100000001b3ULL + static_cast<uint64_t>(b) + 1);
  };
  if (n_threads <= 1) {
    work(0, 1);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t, n_threads);
  for (auto& th : threads) th.join();
}

int geogen_abi_version() { return 1; }

}  // extern "C"
