// Native BVH builder: binned SAH over primitive AABBs.
//
// The performance-critical host-side preprocess of the framework (the
// reference builds its flat BVHs in Julia:
// /root/reference/examples/julia-raytracer-optimized.jl:1327-1419,
// /root/reference/examples/spira-metal-raytracer.jl:346-487).  This builder
// upgrades the median-split heuristic to binned surface-area-heuristic
// splits (16 bins) for better traversal trees on large meshes, while
// emitting the exact flat layout of spira_tpu.accel.bvh.FlatBVH:
//   internal node i: left[i]/right[i] = child node indices, is_leaf[i]=0
//   leaf node i:     left[i] = first index into prim_idx, right[i] = count,
//                    is_leaf[i]=1
//
// C ABI for ctypes (see spira_tpu/accel/native.py).  Single-threaded,
// iterative (explicit stack), no exceptions across the boundary.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kBins = 16;
constexpr int kMaxStack = 64;  // must match accel.bvh.MAX_STACK

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  Vec3 lo{std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity()};
  Vec3 hi{-std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity()};
  void grow(const AABB &o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const Vec3 &p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float half_area() const {
    float dx = std::max(0.0f, hi.x - lo.x);
    float dy = std::max(0.0f, hi.y - lo.y);
    float dz = std::max(0.0f, hi.z - lo.z);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct BuildState {
  const float *lo;  // (n, 3)
  const float *hi;
  std::vector<Vec3> centroid;
  std::vector<int32_t> order;
  // output arrays (grown as nodes are allocated)
  std::vector<float> node_min, node_max;
  std::vector<int32_t> left, right, is_leaf;

  AABB prim_box(int32_t p) const {
    AABB b;
    b.lo = {lo[3 * p], lo[3 * p + 1], lo[3 * p + 2]};
    b.hi = {hi[3 * p], hi[3 * p + 1], hi[3 * p + 2]};
    return b;
  }

  int32_t alloc() {
    node_min.insert(node_min.end(), {0, 0, 0});
    node_max.insert(node_max.end(), {0, 0, 0});
    left.push_back(0);
    right.push_back(0);
    is_leaf.push_back(0);
    return static_cast<int32_t>(left.size()) - 1;
  }
};

struct Task {
  int32_t node, start, end, depth;
};

void build(BuildState &st, int leaf_size) {
  std::vector<Task> stack;
  int32_t n = static_cast<int32_t>(st.order.size());
  int32_t root = st.alloc();
  stack.push_back({root, 0, n, 0});

  while (!stack.empty()) {
    Task t = stack.back();
    stack.pop_back();
    AABB box, cbox;
    for (int32_t i = t.start; i < t.end; ++i) {
      box.grow(st.prim_box(st.order[i]));
      cbox.grow(st.centroid[st.order[i]]);
    }
    st.node_min[3 * t.node] = box.lo.x;
    st.node_min[3 * t.node + 1] = box.lo.y;
    st.node_min[3 * t.node + 2] = box.lo.z;
    st.node_max[3 * t.node] = box.hi.x;
    st.node_max[3 * t.node + 1] = box.hi.y;
    st.node_max[3 * t.node + 2] = box.hi.z;

    int32_t count = t.end - t.start;
    auto make_leaf = [&]() {
      st.left[t.node] = t.start;
      st.right[t.node] = count;
      st.is_leaf[t.node] = 1;
    };
    if (count <= leaf_size || t.depth >= kMaxStack - 2) {
      make_leaf();
      continue;
    }

    // Binned SAH over the widest centroid axis.
    float ext[3] = {cbox.hi.x - cbox.lo.x, cbox.hi.y - cbox.lo.y,
                    cbox.hi.z - cbox.lo.z};
    int axis = 0;
    if (ext[1] > ext[0]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;
    float cmin = (axis == 0 ? cbox.lo.x : axis == 1 ? cbox.lo.y : cbox.lo.z);
    float cext = ext[axis];
    if (cext <= 1e-12f) {
      // Degenerate spread: median split keeps the tree balanced (the
      // forced-leaf guard of the reference's BVH v2 would make giant
      // leaves here; splitting is strictly better).
      int32_t mid = t.start + count / 2;
      std::nth_element(
          st.order.begin() + t.start, st.order.begin() + mid,
          st.order.begin() + t.end, [&](int32_t a, int32_t b) {
            float ca = (axis == 0   ? st.centroid[a].x
                        : axis == 1 ? st.centroid[a].y
                                    : st.centroid[a].z);
            float cb = (axis == 0   ? st.centroid[b].x
                        : axis == 1 ? st.centroid[b].y
                                    : st.centroid[b].z);
            return ca < cb;
          });
      int32_t l = st.alloc(), r = st.alloc();
      st.left[t.node] = l;
      st.right[t.node] = r;
      st.is_leaf[t.node] = 0;
      stack.push_back({l, t.start, mid, t.depth + 1});
      stack.push_back({r, mid, t.end, t.depth + 1});
      continue;
    }

    AABB bin_box[kBins];
    int32_t bin_count[kBins] = {0};
    float inv = kBins / cext;
    auto bin_of = [&](int32_t p) {
      float c = (axis == 0   ? st.centroid[p].x
                 : axis == 1 ? st.centroid[p].y
                             : st.centroid[p].z);
      int b = static_cast<int>((c - cmin) * inv);
      return std::min(std::max(b, 0), kBins - 1);
    };
    for (int32_t i = t.start; i < t.end; ++i) {
      int b = bin_of(st.order[i]);
      bin_box[b].grow(st.prim_box(st.order[i]));
      bin_count[b]++;
    }

    // Sweep: left-to-right and right-to-left prefix areas.
    float left_area[kBins - 1], right_area[kBins - 1];
    int32_t left_cnt[kBins - 1], right_cnt[kBins - 1];
    AABB acc;
    int32_t cacc = 0;
    for (int b = 0; b < kBins - 1; ++b) {
      acc.grow(bin_box[b]);
      cacc += bin_count[b];
      left_area[b] = acc.half_area();
      left_cnt[b] = cacc;
    }
    acc = AABB();
    cacc = 0;
    for (int b = kBins - 1; b >= 1; --b) {
      acc.grow(bin_box[b]);
      cacc += bin_count[b];
      right_area[b - 1] = acc.half_area();
      right_cnt[b - 1] = cacc;
    }

    int best_split = -1;
    float best_cost = std::numeric_limits<float>::infinity();
    for (int b = 0; b < kBins - 1; ++b) {
      if (left_cnt[b] == 0 || right_cnt[b] == 0) continue;
      float cost = left_area[b] * left_cnt[b] + right_area[b] * right_cnt[b];
      if (cost < best_cost) {
        best_cost = cost;
        best_split = b;
      }
    }

    // SAH termination: splitting must beat the leaf cost.
    float leaf_cost = box.half_area() * count;
    if (best_split < 0 ||
        (count <= 2 * leaf_size && best_cost >= leaf_cost)) {
      if (count <= 4 * leaf_size) {
        make_leaf();
        continue;
      }
      best_split = kBins / 2 - 1;  // fall back to a mid split
    }

    auto mid_it = std::partition(
        st.order.begin() + t.start, st.order.begin() + t.end,
        [&](int32_t p) { return bin_of(p) <= best_split; });
    int32_t mid = static_cast<int32_t>(mid_it - st.order.begin());
    if (mid == t.start || mid == t.end) {
      // partition failed to separate (numeric edge): median split
      mid = t.start + count / 2;
      std::nth_element(st.order.begin() + t.start, st.order.begin() + mid,
                       st.order.begin() + t.end, [&](int32_t a, int32_t b) {
                         return (axis == 0   ? st.centroid[a].x
                                 : axis == 1 ? st.centroid[a].y
                                             : st.centroid[a].z) <
                                (axis == 0   ? st.centroid[b].x
                                 : axis == 1 ? st.centroid[b].y
                                             : st.centroid[b].z);
                       });
    }
    int32_t l = st.alloc(), r = st.alloc();
    st.left[t.node] = l;
    st.right[t.node] = r;
    st.is_leaf[t.node] = 0;
    stack.push_back({l, t.start, mid, t.depth + 1});
    stack.push_back({r, mid, t.end, t.depth + 1});
  }
}

}  // namespace

extern "C" {

// Returns the number of nodes written, or -1 on error.  Callers allocate
// out_* for the worst case of 2n-1 nodes (n >= 1).
//   lo, hi:        (n, 3) float32 primitive AABBs
//   out_node_min:  (2n-1, 3) float32
//   out_node_max:  (2n-1, 3) float32
//   out_left/right/is_leaf: (2n-1,) int32
//   out_prim_idx:  (n,) int32 — leaf-contiguous primitive permutation
int32_t spira_build_bvh(const float *lo, const float *hi, int32_t n,
                        int32_t leaf_size, float *out_node_min,
                        float *out_node_max, int32_t *out_left,
                        int32_t *out_right, int32_t *out_is_leaf,
                        int32_t *out_prim_idx) {
  if (n <= 0 || leaf_size <= 0) return -1;
  BuildState st;
  st.lo = lo;
  st.hi = hi;
  st.centroid.resize(n);
  st.order.resize(n);
  for (int32_t i = 0; i < n; ++i) {
    st.centroid[i] = {0.5f * (lo[3 * i] + hi[3 * i]),
                      0.5f * (lo[3 * i + 1] + hi[3 * i + 1]),
                      0.5f * (lo[3 * i + 2] + hi[3 * i + 2])};
    st.order[i] = i;
  }
  build(st, leaf_size);
  int32_t m = static_cast<int32_t>(st.left.size());
  if (m > 2 * n - 1 && n > 1) return -1;  // contract violation
  std::memcpy(out_node_min, st.node_min.data(), sizeof(float) * 3 * m);
  std::memcpy(out_node_max, st.node_max.data(), sizeof(float) * 3 * m);
  std::memcpy(out_left, st.left.data(), sizeof(int32_t) * m);
  std::memcpy(out_right, st.right.data(), sizeof(int32_t) * m);
  std::memcpy(out_is_leaf, st.is_leaf.data(), sizeof(int32_t) * m);
  std::memcpy(out_prim_idx, st.order.data(), sizeof(int32_t) * n);
  return m;
}

}  // extern "C"
