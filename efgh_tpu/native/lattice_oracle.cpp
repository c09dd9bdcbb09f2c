// Native CPU lattice-index oracle.
//
// The reference backs its permutohedral lattice build with a C hash table
// (reference lib/khash.h + lib/khash_int2int.h) driven from numba-JIT loops
// (reference nets/transforms.py:126-183).  This is a clean-room C++
// equivalent of that native component: an open-addressing int64->int64 hash
// map (linear probing, power-of-two capacity) plus the full index-build
// routine.  It exists for bit-parity testing of the on-device sort-based
// build and as a fast host-side fallback; the TPU path never calls it.
//
// Build: python -m efgh_tpu.native.build   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

constexpr int64_t kEmpty = INT64_MIN;

struct HashMap {
  int64_t* keys;
  int64_t* vals;
  uint64_t capacity;  // power of two
  uint64_t size;

  static HashMap* create(uint64_t hint) {
    uint64_t cap = 16;
    while (cap < hint * 2) cap <<= 1;
    HashMap* h = new HashMap;
    h->capacity = cap;
    h->size = 0;
    h->keys = static_cast<int64_t*>(malloc(cap * sizeof(int64_t)));
    h->vals = static_cast<int64_t*>(malloc(cap * sizeof(int64_t)));
    for (uint64_t i = 0; i < cap; ++i) h->keys[i] = kEmpty;
    return h;
  }

  void destroy() {
    free(keys);
    free(vals);
    delete this;
  }

  static uint64_t mix(uint64_t x) {
    // splitmix64 finalizer
    x += 0x9e3779b97f4a7c15ULL;
    x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
    x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
    return x ^ (x >> 31);
  }

  void grow() {
    uint64_t old_cap = capacity;
    int64_t* old_keys = keys;
    int64_t* old_vals = vals;
    capacity <<= 1;
    keys = static_cast<int64_t*>(malloc(capacity * sizeof(int64_t)));
    vals = static_cast<int64_t*>(malloc(capacity * sizeof(int64_t)));
    for (uint64_t i = 0; i < capacity; ++i) keys[i] = kEmpty;
    size = 0;
    for (uint64_t i = 0; i < old_cap; ++i) {
      if (old_keys[i] != kEmpty) set(old_keys[i], old_vals[i]);
    }
    free(old_keys);
    free(old_vals);
  }

  void set(int64_t key, int64_t val) {
    if (size * 10 >= capacity * 7) grow();
    uint64_t mask = capacity - 1;
    uint64_t i = mix(static_cast<uint64_t>(key)) & mask;
    while (keys[i] != kEmpty && keys[i] != key) i = (i + 1) & mask;
    if (keys[i] == kEmpty) {
      keys[i] = key;
      ++size;
    }
    vals[i] = val;
  }

  int64_t get(int64_t key, int64_t dflt) const {
    uint64_t mask = capacity - 1;
    uint64_t i = mix(static_cast<uint64_t>(key)) & mask;
    while (keys[i] != kEmpty) {
      if (keys[i] == key) return vals[i];
      i = (i + 1) & mask;
    }
    return dflt;
  }
};

// mixed-radix packing of a (d1)-dim lattice coordinate into one int64,
// same scheme as the reference's key2int (reference nets/transforms.py:62-78)
inline int64_t pack_key(const int64_t* key, int64_t d1, const int64_t* key_maxs,
                        const int64_t* key_mins) {
  int64_t res = 0;
  for (int64_t i = 0; i < d1 - 1; ++i) {
    res += key[i] - key_mins[i];
    res *= key_maxs[i + 1] - key_mins[i + 1] + 1;
  }
  res += key[d1 - 1] - key_mins[d1 - 1];
  return res;
}

}  // namespace

extern "C" {

void* efgh_hash_create(int64_t hint) { return HashMap::create(hint < 16 ? 16 : hint); }
void efgh_hash_destroy(void* h) { static_cast<HashMap*>(h)->destroy(); }
int64_t efgh_hash_get(void* h, int64_t k, int64_t d) {
  return static_cast<HashMap*>(h)->get(k, d);
}
void efgh_hash_set(void* h, int64_t k, int64_t v) {
  static_cast<HashMap*>(h)->set(k, v);
}

// Full lattice index build.
//
// keys:           (d1, N, d1) row-major int64 simplex-vertex coordinates
// lattice_offset: (d1, N) out — cell id per point-vertex (insertion order)
// cell_coords:    (h_max, d1) out — coordinates of each cell
// filter_offsets: (F, d1) neighbor offsets
// blur_neighbors: (F, h_max) out — neighbor cell ids, -1 if absent
// returns the number of unique cells (hash_cnt), or -1 on capacity overflow
int64_t efgh_build_lattice(const int64_t* keys, int64_t num_points, int64_t d1,
                           const int64_t* key_maxs, const int64_t* key_mins,
                           int64_t* lattice_offset, int64_t* cell_coords,
                           const int64_t* filter_offsets, int64_t filter_size,
                           int64_t* blur_neighbors, int64_t h_max) {
  HashMap* table = HashMap::create(num_points * 2);
  int64_t cnt = 0;
  // insertion order: point-major, then vertex — matching the reference's
  // build_it loop nest so cell numbering is comparable
  for (int64_t p = 0; p < num_points; ++p) {
    for (int64_t v = 0; v < d1; ++v) {
      const int64_t* key = keys + (v * num_points + p) * d1;
      int64_t packed = pack_key(key, d1, key_maxs, key_mins);
      int64_t idx = table->get(packed, -1);
      if (idx == -1) {
        if (cnt >= h_max) {
          table->destroy();
          return -1;
        }
        idx = cnt++;
        table->set(packed, idx);
        std::memcpy(cell_coords + idx * d1, key, d1 * sizeof(int64_t));
      }
      lattice_offset[v * num_points + p] = idx;
    }
  }
  if (filter_size > 0) {
    int64_t* nkey = static_cast<int64_t*>(malloc(d1 * sizeof(int64_t)));
    for (int64_t h = 0; h < cnt; ++h) {
      for (int64_t f = 0; f < filter_size; ++f) {
        for (int64_t i = 0; i < d1; ++i) {
          nkey[i] = cell_coords[h * d1 + i] + filter_offsets[f * d1 + i];
        }
        blur_neighbors[f * h_max + h] =
            table->get(pack_key(nkey, d1, key_maxs, key_mins), -1);
      }
    }
    free(nkey);
  }
  table->destroy();
  return cnt;
}

}  // extern "C"
