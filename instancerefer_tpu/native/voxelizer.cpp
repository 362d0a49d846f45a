// Native voxelizer + sparse-conv kernel-map builder.
//
// The input-pipeline hot path of the framework: replaces torchsparse's C++
// `sparse_quantize` hashing and the CUDA kernel-map hash build inside
// `spnn.Conv3d` (reference lib/dataset.py:228-261, models/basic_blocks.py via
// torchsparse; SURVEY.md §2.3 N1-N3) with open-addressing hash maps on the
// host.  Exposed as a plain C ABI consumed via ctypes
// (instancerefer_tpu/ops/voxelize.py) — results are bit-identical to the
// numpy reference implementation there (same first-occurrence semantics,
// same output ordering), which the unit tests verify.
//
// Build:  python instancerefer_tpu/native/build.py   (or `make -C .`)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kCoordBits = 14;
constexpr int64_t kCoordOff = 1ll << (kCoordBits - 1);
constexpr int64_t kCoordMask = (1ll << kCoordBits) - 1;
constexpr int64_t kEmpty = -1;

inline int64_t pack(const int32_t* c) {
  int64_t x = c[0] + kCoordOff, y = c[1] + kCoordOff, z = c[2] + kCoordOff;
  x = x < 0 ? 0 : (x > kCoordMask ? kCoordMask : x);
  y = y < 0 ? 0 : (y > kCoordMask ? kCoordMask : y);
  z = z < 0 ? 0 : (z > kCoordMask ? kCoordMask : z);
  return (x << (2 * kCoordBits)) | (y << kCoordBits) | z;
}

inline int64_t pack3(int64_t x, int64_t y, int64_t z) {
  x += kCoordOff; y += kCoordOff; z += kCoordOff;
  x = x < 0 ? 0 : (x > kCoordMask ? kCoordMask : x);
  y = y < 0 ? 0 : (y > kCoordMask ? kCoordMask : y);
  z = z < 0 ? 0 : (z > kCoordMask ? kCoordMask : z);
  return (x << (2 * kCoordBits)) | (y << kCoordBits) | z;
}

// Open-addressing hash map: key int64 -> value int32.
struct HashMap {
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  int64_t mask;

  explicit HashMap(int64_t n) {
    int64_t cap = 16;
    while (cap < n * 2) cap <<= 1;
    keys.assign(cap, kEmpty);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  static inline int64_t hash(int64_t k) {
    uint64_t h = static_cast<uint64_t>(k);
    h ^= h >> 33; h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33; h *= 0xc4ceb9fe1a85ec53ULL;
    h ^= h >> 33;
    return static_cast<int64_t>(h);
  }

  // insert if absent; returns existing or new value
  inline int32_t insert(int64_t k, int32_t v, bool* inserted) {
    int64_t i = hash(k) & mask;
    for (;;) {
      if (keys[i] == kEmpty) {
        keys[i] = k; vals[i] = v; *inserted = true; return v;
      }
      if (keys[i] == k) { *inserted = false; return vals[i]; }
      i = (i + 1) & mask;
    }
  }

  inline int32_t find(int64_t k) const {
    int64_t i = hash(k) & mask;
    for (;;) {
      if (keys[i] == kEmpty) return -1;
      if (keys[i] == k) return vals[i];
      i = (i + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// Unique-by-voxel keeping first occurrence; writes kept row indices to
// keep_idx (caller allocates n) and returns the kept count.
int64_t ir_unique_first(const int32_t* coords, int64_t n, int64_t* keep_idx) {
  HashMap map(n);
  int64_t kept = 0;
  for (int64_t i = 0; i < n; ++i) {
    bool inserted;
    map.insert(pack(coords + 3 * i), static_cast<int32_t>(kept), &inserted);
    if (inserted) keep_idx[kept++] = i;
  }
  return kept;
}

// Neighbor map: nbr[i*k + j] = row of (coords[i] + offsets[j] * stride), -1 if
// absent.  offsets: k x 3 int32.
void ir_build_nbr(const int32_t* coords, int64_t n, const int32_t* offsets,
                  int32_t k, int32_t stride, int32_t* nbr) {
  HashMap map(n);
  bool inserted;
  for (int64_t i = 0; i < n; ++i)
    map.insert(pack(coords + 3 * i), static_cast<int32_t>(i), &inserted);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = coords[3 * i], cy = coords[3 * i + 1], cz = coords[3 * i + 2];
    for (int32_t j = 0; j < k; ++j) {
      int64_t key = pack3(cx + int64_t(offsets[3 * j]) * stride,
                          cy + int64_t(offsets[3 * j + 1]) * stride,
                          cz + int64_t(offsets[3 * j + 2]) * stride);
      nbr[i * k + j] = map.find(key);
    }
  }
}

// Stride-2 downsample: out_coords = unique floor(c / (2*stride)) * (2*stride)
// in first-occurrence order; down[o*8 + j] = input row at out + {0,stride}^3.
// out_coords sized n*3, down sized n*8 by the caller.  Returns output count.
int64_t ir_downsample(const int32_t* coords, int64_t n, int32_t stride,
                      int32_t* out_coords, int32_t* down) {
  const int64_t ns = int64_t(stride) * 2;
  HashMap in_map(n);
  bool inserted;
  for (int64_t i = 0; i < n; ++i)
    in_map.insert(pack(coords + 3 * i), static_cast<int32_t>(i), &inserted);

  HashMap out_map(n);
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t d[3];
    for (int t = 0; t < 3; ++t) {
      int64_t c = coords[3 * i + t];
      // floor division for negative coords
      int64_t q = (c >= 0) ? (c / ns) : (-(((-c) + ns - 1) / ns));
      d[t] = static_cast<int32_t>(q * ns);
    }
    out_map.insert(pack(d), static_cast<int32_t>(m), &inserted);
    if (inserted) {
      std::memcpy(out_coords + 3 * m, d, 3 * sizeof(int32_t));
      ++m;
    }
  }
  for (int64_t o = 0; o < m; ++o) {
    int64_t ox = out_coords[3 * o], oy = out_coords[3 * o + 1],
            oz = out_coords[3 * o + 2];
    int32_t j = 0;
    for (int dz = 0; dz < 2; ++dz)
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx, ++j) {
          int64_t key = pack3(ox + int64_t(dx) * stride, oy + int64_t(dy) * stride,
                              oz + int64_t(dz) * stride);
          down[o * 8 + j] = in_map.find(key);
        }
  }
  return m;
}

}  // extern "C"
