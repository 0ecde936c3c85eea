// Measured proxy for the reference Go BPR trainer's hot loop.
//
// Reimplements gorse's per-example training step EXACTLY as the reference
// does it (reference model/cf/model.go:448-490):
//   - sample user uniformly, retry until it has feedback
//   - sample positive uniformly within the user's feedback
//   - sample negative by unbounded rejection against the user's positive set
//     (the reference uses a Go map-backed mapset.Set[int32]; we use a flat
//     sorted array + binary search, which is FASTER than a Go map lookup —
//     keeping this proxy an UPPER bound on the Go implementation)
//   - two k-dim dot products, three k-dim row copies, and the six
//     axpy-family updates (MulConstTo / MulConstAdd / SubTo / MulConst),
//     matching the reference's floats.* SIMD kernels via -O3
//     auto-vectorization
//
// Purpose: BASELINE.md grounds the bench's vs_baseline denominator in a
// MEASURED native per-core number instead of an estimate (VERDICT r1
// "weak #1"). Build/run:
//   g++ -O3 -march=native -std=c++17 -pthread bpr_baseline.cpp -o bpr_baseline
//   ./bpr_baseline [n_threads] [k]
// Prints one JSON line: per-core and total examples/s.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <random>
#include <thread>
#include <vector>

static constexpr int N_USERS = 6040;   // ml-1m shape (model_test.go:35-48)
static constexpr int N_ITEMS = 3706;
static constexpr int NNZ_TARGET = 1000000;

struct Data {
  std::vector<std::vector<int32_t>> user_feedback;  // positives per user
  std::vector<std::vector<int32_t>> user_sorted;    // sorted copy for Contains
  int64_t nnz = 0;
};

static Data make_data(uint64_t seed) {
  // Zipf-ish popularity + lognormal activity, same spirit as
  // gorse_tpu.data.synthetic_cf_powerlaw. Only the ACCESS PATTERN matters
  // for throughput; scores/ordering are irrelevant here.
  std::mt19937_64 rng(seed);
  std::lognormal_distribution<double> act(0.0, 1.0);
  std::vector<double> raw(N_USERS);
  double sum = 0;
  for (auto& r : raw) { r = act(rng); sum += r; }
  Data d;
  d.user_feedback.resize(N_USERS);
  d.user_sorted.resize(N_USERS);
  // popularity-skewed item sampler: item = floor(N * u^2) biases low ids
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int u = 0; u < N_USERS; ++u) {
    int cnt = std::max(5, std::min(N_ITEMS - 1, (int)(raw[u] * NNZ_TARGET / sum)));
    auto& fb = d.user_feedback[u];
    fb.reserve(cnt);
    for (int t = 0; t < cnt; ++t) {
      double x = uni(rng);
      fb.push_back((int32_t)(N_ITEMS * x * x));
    }
    std::sort(fb.begin(), fb.end());
    fb.erase(std::unique(fb.begin(), fb.end()), fb.end());
    d.user_sorted[u] = fb;
    d.nnz += (int64_t)fb.size();
  }
  return d;
}

int main(int argc, char** argv) {
  int n_threads = argc > 1 ? atoi(argv[1]) : (int)std::thread::hardware_concurrency();
  int k = argc > 2 ? atoi(argv[2]) : 16;
  const float lr = 0.05f, reg = 0.01f;

  Data data = make_data(42);
  std::vector<float> user_factor((size_t)N_USERS * k);
  std::vector<float> item_factor((size_t)N_ITEMS * k);
  {
    std::mt19937_64 rng(7);
    std::normal_distribution<float> init(0.0f, 0.001f);
    for (auto& v : user_factor) v = init(rng);
    for (auto& v : item_factor) v = init(rng);
  }

  const int64_t per_epoch = data.nnz;  // reference: CountFeedback samples/epoch
  const int n_epochs = 3;

  auto run = [&](int tid, int nthr, double* out_secs) {
    std::mt19937_64 rng(1000 + tid);
    std::uniform_int_distribution<int> user_dist(0, N_USERS - 1);
    std::uniform_int_distribution<int> item_dist(0, N_ITEMS - 1);
    std::vector<float> temp(k), uf(k), pf(k), nf(k);
    int64_t samples = per_epoch * n_epochs / nthr;
    auto t0 = std::chrono::steady_clock::now();
    for (int64_t s = 0; s < samples; ++s) {
      // --- sampling (model/cf/model.go:450-468)
      int u;
      do { u = user_dist(rng); } while (data.user_feedback[u].empty());
      const auto& fb = data.user_feedback[u];
      int32_t pos = fb[rng() % fb.size()];
      const auto& srt = data.user_sorted[u];
      int32_t neg;
      for (;;) {
        neg = item_dist(rng);
        if (!std::binary_search(srt.begin(), srt.end(), neg)) break;
      }
      // --- update (model/cf/model.go:469-488)
      float* pu = &user_factor[(size_t)u * k];
      float* qi = &item_factor[(size_t)pos * k];
      float* qj = &item_factor[(size_t)neg * k];
      float di = 0, dj = 0;
      for (int f = 0; f < k; ++f) di += pu[f] * qi[f];
      for (int f = 0; f < k; ++f) dj += pu[f] * qj[f];
      float diff = di - dj;
      float grad = 1.0f / (1.0f + std::exp(diff));
      // copies (the reference copies all three rows first)
      std::copy(pu, pu + k, uf.begin());
      std::copy(qi, qi + k, pf.begin());
      std::copy(qj, qj + k, nf.begin());
      // positive item: temp = grad*uf; temp += -reg*pf; qi += lr*temp
      for (int f = 0; f < k; ++f) temp[f] = grad * uf[f] - reg * pf[f];
      for (int f = 0; f < k; ++f) qi[f] += lr * temp[f];
      // negative item
      for (int f = 0; f < k; ++f) temp[f] = -grad * uf[f] - reg * nf[f];
      for (int f = 0; f < k; ++f) qj[f] += lr * temp[f];
      // user
      for (int f = 0; f < k; ++f) temp[f] = grad * (pf[f] - nf[f]) - reg * uf[f];
      for (int f = 0; f < k; ++f) pu[f] += lr * temp[f];
    }
    *out_secs =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
  };

  // single-core measurement
  double sec1 = 0;
  run(0, 1, &sec1);
  double per_core = (double)(per_epoch * n_epochs) / sec1;

  // all-core measurement (lock-free hogwild, as the reference effectively is)
  std::vector<std::thread> threads;
  std::vector<double> secs(n_threads);
  auto t0 = std::chrono::steady_clock::now();
  for (int t = 0; t < n_threads; ++t)
    threads.emplace_back(run, t, n_threads, &secs[t]);
  for (auto& t : threads) t.join();
  double wall =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
  double total = (double)(per_epoch * n_epochs) / wall;

  // dispatch-structured measurement: the reference pushes EVERY example id
  // through one buffered channel from a single producer goroutine
  // (common/parallel/parallel.go:45-55) — emulate that with a mutex-guarded
  // bounded queue (Go channels are likewise lock-based) to measure the
  // structural cap that per-example dispatch puts on total throughput.
  {
    constexpr int QCAP = 1024;  // reference chanSize
    std::vector<int64_t> queue(QCAP);
    std::atomic<int64_t> head{0}, tail{0};
    std::atomic<bool> done{false};
    int64_t total_jobs = per_epoch;  // one epoch through the queue
    auto producer = [&]() {
      for (int64_t i = 0; i < total_jobs; ++i) {
        while (head.load(std::memory_order_acquire) - tail.load(std::memory_order_acquire) >= QCAP)
          std::this_thread::yield();
        queue[head.load(std::memory_order_relaxed) % QCAP] = i;
        head.fetch_add(1, std::memory_order_release);
      }
      done.store(true, std::memory_order_release);
    };
    std::atomic<int64_t> consumed{0};
    auto consumer = [&](int tid) {
      std::mt19937_64 rng(5000 + tid);
      std::uniform_int_distribution<int> user_dist(0, N_USERS - 1);
      std::uniform_int_distribution<int> item_dist(0, N_ITEMS - 1);
      std::vector<float> temp(k), uf(k), pf(k), nf(k);
      for (;;) {
        int64_t t = tail.load(std::memory_order_relaxed);
        if (t >= head.load(std::memory_order_acquire)) {
          if (done.load(std::memory_order_acquire) &&
              tail.load(std::memory_order_acquire) >=
                  head.load(std::memory_order_acquire))
            return;
          std::this_thread::yield();
          continue;
        }
        if (!tail.compare_exchange_weak(t, t + 1, std::memory_order_acq_rel))
          continue;
        // same per-example work as run()
        int u;
        do { u = user_dist(rng); } while (data.user_feedback[u].empty());
        const auto& fb = data.user_feedback[u];
        int32_t pos = fb[rng() % fb.size()];
        const auto& srt = data.user_sorted[u];
        int32_t neg;
        for (;;) {
          neg = item_dist(rng);
          if (!std::binary_search(srt.begin(), srt.end(), neg)) break;
        }
        float* pu = &user_factor[(size_t)u * k];
        float* qi = &item_factor[(size_t)pos * k];
        float* qj = &item_factor[(size_t)neg * k];
        float di = 0, dj = 0;
        for (int f = 0; f < k; ++f) di += pu[f] * qi[f];
        for (int f = 0; f < k; ++f) dj += pu[f] * qj[f];
        float grad = 1.0f / (1.0f + std::exp(di - dj));
        std::copy(pu, pu + k, uf.begin());
        std::copy(qi, qi + k, pf.begin());
        std::copy(qj, qj + k, nf.begin());
        for (int f = 0; f < k; ++f) temp[f] = grad * uf[f] - reg * pf[f];
        for (int f = 0; f < k; ++f) qi[f] += lr * temp[f];
        for (int f = 0; f < k; ++f) temp[f] = -grad * uf[f] - reg * nf[f];
        for (int f = 0; f < k; ++f) qj[f] += lr * temp[f];
        for (int f = 0; f < k; ++f) temp[f] = grad * (pf[f] - nf[f]) - reg * uf[f];
        for (int f = 0; f < k; ++f) pu[f] += lr * temp[f];
        consumed.fetch_add(1, std::memory_order_relaxed);
      }
    };
    auto tq0 = std::chrono::steady_clock::now();
    std::thread prod(producer);
    std::vector<std::thread> cons;
    for (int t = 0; t < n_threads; ++t) cons.emplace_back(consumer, t);
    prod.join();
    for (auto& c : cons) c.join();
    double qwall =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - tq0)
            .count();
    double dispatched = (double)total_jobs / qwall;

    printf(
        "{\"nnz\": %lld, \"k\": %d, \"threads\": %d, "
        "\"examples_per_s_per_core\": %.0f, \"examples_per_s_total\": %.0f, "
        "\"examples_per_s_dispatch_structured\": %.0f}\n",
        (long long)data.nnz, k, n_threads, per_core, total, dispatched);
  }
  return 0;
}
