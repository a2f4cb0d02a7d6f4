// Native voxel-grid downsampling for the host preprocessing path.
//
// The reference's voxel stage routes through Open3D/NumPy sort+unique
// (reference: dataloader/transforms.py:322-356); this is the same
// semantics ('first' and 'center' retention) as a single open-addressing
// hash pass over the raw scan -- O(N) instead of O(N log N), no Python
// object overhead. Exposed via ctypes (deeppointmap_tpu/native/__init__.py)
// with a NumPy fallback when the shared library is unavailable.
//
// Build: make -C deeppointmap_tpu/native   (or the setup.py ext module)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct Slot {
    int64_t key;    // linearized voxel id, -1 = empty
    int32_t index;  // retained point index
    float best_d2;  // 'center' retention: distance to voxel center
};

inline uint64_t hash_key(int64_t k) {
    uint64_t h = static_cast<uint64_t>(k);
    h ^= h >> 33;
    h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33;
    return h;
}

}  // namespace

extern "C" {

// xyz: (n, 3) float32, voxel_size > 0, retention: 0 = first, 1 = center.
// out_idx: preallocated int32 buffer of capacity n; returns the number of
// retained indices written (one per occupied voxel, in first-seen order).
int voxel_downsample(const float* xyz, int64_t n, float voxel_size,
                     int retention, int32_t* out_idx) {
    if (n <= 0) return 0;
    float mn[3] = {xyz[0], xyz[1], xyz[2]};
    for (int64_t i = 1; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            float v = xyz[i * 3 + d];
            if (v < mn[d]) mn[d] = v;
        }
    }
    // grid dims for collision-free linearization
    int64_t dims[3] = {1, 1, 1};
    for (int64_t i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            int64_t c = static_cast<int64_t>((xyz[i * 3 + d] - mn[d]) / voxel_size);
            if (c + 1 > dims[d]) dims[d] = c + 1;
        }
    }

    // open addressing, power-of-two capacity >= 2n
    uint64_t cap = 1;
    while (cap < static_cast<uint64_t>(n) * 2) cap <<= 1;
    std::vector<Slot> table(cap);
    for (auto& s : table) s.key = -1;

    std::vector<int32_t> order;
    order.reserve(n / 4);

    for (int64_t i = 0; i < n; ++i) {
        int64_t cx = static_cast<int64_t>((xyz[i * 3 + 0] - mn[0]) / voxel_size);
        int64_t cy = static_cast<int64_t>((xyz[i * 3 + 1] - mn[1]) / voxel_size);
        int64_t cz = static_cast<int64_t>((xyz[i * 3 + 2] - mn[2]) / voxel_size);
        int64_t key = cx + cy * dims[0] + cz * dims[0] * dims[1];

        float d2 = 0.0f;
        if (retention == 1) {
            float ox = xyz[i * 3 + 0] - mn[0] - (cx + 0.5f) * voxel_size;
            float oy = xyz[i * 3 + 1] - mn[1] - (cy + 0.5f) * voxel_size;
            float oz = xyz[i * 3 + 2] - mn[2] - (cz + 0.5f) * voxel_size;
            d2 = ox * ox + oy * oy + oz * oz;
        }

        uint64_t h = hash_key(key) & (cap - 1);
        while (true) {
            Slot& s = table[h];
            if (s.key == -1) {
                s.key = key;
                s.index = static_cast<int32_t>(i);
                s.best_d2 = d2;
                order.push_back(static_cast<int32_t>(i));
                break;
            }
            if (s.key == key) {
                if (retention == 1 && d2 < s.best_d2) {
                    // replace retained point in-place (order keeps the
                    // slot's position; index is updated via the table)
                    s.best_d2 = d2;
                    s.index = static_cast<int32_t>(i);
                }
                break;
            }
            h = (h + 1) & (cap - 1);
        }
    }

    // for 'center' retention, re-read winning indices from the table
    if (retention == 1) {
        // order holds the first-seen index per voxel; map each back to
        // its voxel's winning index
        int64_t m = static_cast<int64_t>(order.size());
        int64_t w = 0;
        for (auto& s : table) {
            if (s.key != -1) ++w;
        }
        (void)m; (void)w;
        int64_t k = 0;
        for (int32_t first_idx : order) {
            int64_t cx = static_cast<int64_t>((xyz[first_idx * 3 + 0] - mn[0]) / voxel_size);
            int64_t cy = static_cast<int64_t>((xyz[first_idx * 3 + 1] - mn[1]) / voxel_size);
            int64_t cz = static_cast<int64_t>((xyz[first_idx * 3 + 2] - mn[2]) / voxel_size);
            int64_t key = cx + cy * dims[0] + cz * dims[0] * dims[1];
            uint64_t h = hash_key(key) & (cap - 1);
            while (table[h].key != key) h = (h + 1) & (cap - 1);
            out_idx[k++] = table[h].index;
        }
        return static_cast<int>(k);
    }

    std::memcpy(out_idx, order.data(), order.size() * sizeof(int32_t));
    return static_cast<int>(order.size());
}

// KITTI .bin reader: (n, 4) float32 x/y/z/intensity -> xyz only with NaN
// rows dropped (reference: dataloader/heads/bin.py:12-25). Returns number
// of valid points written to out (capacity n_rows * 3 floats).
int read_kitti_xyz(const float* raw, int64_t n_rows, float* out) {
    int64_t k = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        float x = raw[i * 4], y = raw[i * 4 + 1], z = raw[i * 4 + 2];
        if (std::isnan(x) || std::isnan(y) || std::isnan(z)) continue;
        out[k * 3] = x;
        out[k * 3 + 1] = y;
        out[k * 3 + 2] = z;
        ++k;
    }
    return static_cast<int>(k);
}

}  // extern "C"
