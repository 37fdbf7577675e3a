// Native batch assembler for the input pipeline.
//
// Gathers a batch of HWC uint8 images by index from a resident dataset and
// optionally applies the standard CIFAR augmentation (zero-pad-4 random
// crop + horizontal flip), fanned out over a thread pool. This is the
// hot host-side loop of training: Python/numpy fancy-indexing +
// augmentation costs milliseconds per batch and fights the GIL; this runs
// at memcpy speed on all cores and feeds the device queue.
//
// Deterministic: per-sample splitmix64 streams seeded by (seed, position)
// so a (seed, epoch) pair always produces the same batch, independent of
// thread scheduling.
//
// C ABI only (consumed via ctypes).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // uniform integer in [0, n)
  uint64_t below(uint64_t n) { return next() % n; }
};

void copy_plain(const uint8_t* src, uint8_t* dst, int64_t h, int64_t w,
                int64_t c) {
  std::memcpy(dst, src, static_cast<size_t>(h * w * c));
}

// zero-pad by `pad`, take a random h x w crop, optional horizontal flip
void copy_augmented(const uint8_t* src, uint8_t* dst, int64_t h, int64_t w,
                    int64_t c, int64_t pad, SplitMix64& rng) {
  const int64_t oy = static_cast<int64_t>(rng.below(2 * pad + 1)) - pad;
  const int64_t ox = static_cast<int64_t>(rng.below(2 * pad + 1)) - pad;
  const bool flip = rng.below(2) == 1;

  for (int64_t y = 0; y < h; ++y) {
    const int64_t sy = y + oy;
    uint8_t* drow = dst + y * w * c;
    if (sy < 0 || sy >= h) {
      std::memset(drow, 0, static_cast<size_t>(w * c));
      continue;
    }
    const uint8_t* srow = src + sy * w * c;
    for (int64_t x = 0; x < w; ++x) {
      // flip-then-crop semantics: out[y,x] = flipped_src[y+oy, x+ox]
      const int64_t sx = flip ? (w - 1 - x - ox) : (x + ox);
      uint8_t* dpx = drow + x * c;
      if (sx < 0 || sx >= w) {
        std::memset(dpx, 0, static_cast<size_t>(c));
      } else {
        std::memcpy(dpx, srow + sx * c, static_cast<size_t>(c));
      }
    }
  }
}

}  // namespace

extern "C" {

// images:  [num_images, h, w, c] uint8, resident dataset
// indices: [batch] int64 gather indices
// out:     [batch, h, w, c] uint8 (preallocated)
void odevit_assemble_batch(const uint8_t* images, const int64_t* indices,
                           int64_t batch, int64_t h, int64_t w, int64_t c,
                           uint8_t* out, int32_t augment, int64_t pad,
                           uint64_t seed, int32_t num_threads) {
  const int64_t img_bytes = h * w * c;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > batch) num_threads = static_cast<int32_t>(batch);

  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const uint8_t* src = images + indices[i] * img_bytes;
      uint8_t* dst = out + i * img_bytes;
      if (augment) {
        SplitMix64 rng(seed * 0x9e3779b97f4a7c15ULL + static_cast<uint64_t>(i));
        copy_augmented(src, dst, h, w, c, pad, rng);
      } else {
        copy_plain(src, dst, h, w, c);
      }
    }
  };

  if (num_threads == 1) {
    worker(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (batch + num_threads - 1) / num_threads;
  for (int32_t t = 0; t < num_threads; ++t) {
    const int64_t begin = t * chunk;
    const int64_t end = begin + chunk < batch ? begin + chunk : batch;
    if (begin >= end) break;
    threads.emplace_back(worker, begin, end);
  }
  for (auto& th : threads) th.join();
}

int32_t odevit_native_version() { return 1; }

}  // extern "C"
