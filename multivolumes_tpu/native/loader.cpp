// Native data loaders for multivolumes_tpu.
//
// C++ counterpart of the reference's host-side asset pipeline:
// `XUSG::ObjLoader` (XUSG/Optional/XUSGObjLoader.cpp: two-pass OBJ parse,
// per-vertex normal accumulation, AABB) and the CPU half of
// `XUSG::DDS::Loader` (XUSG/Advanced/XUSGDDSLoader.h). The Python wrappers
// in `multivolumes_tpu/native/__init__.py` expose these through ctypes and
// fall back to the pure-Python parsers when the shared library is absent.
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cpp -o libmvnative.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct Float3 {
    float x, y, z;
};

inline Float3 cross(const Float3& a, const Float3& b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}

inline Float3 sub(const Float3& a, const Float3& b) {
    return {a.x - b.x, a.y - b.y, a.z - b.z};
}

// Parse one whitespace-separated float, advancing p.
inline bool parse_float(const char*& p, const char* end, float& out) {
    while (p < end && (*p == ' ' || *p == '\t')) ++p;
    if (p >= end) return false;
    char* q = nullptr;
    out = strtof(p, &q);
    if (q == p) return false;
    p = q;
    return true;
}

// Parse an OBJ face vertex reference "v", "v/t", "v//n", "v/t/n" -> v index.
inline bool parse_face_index(const char*& p, const char* end, long& out) {
    while (p < end && (*p == ' ' || *p == '\t')) ++p;
    if (p >= end || (*p != '-' && (*p < '0' || *p > '9'))) return false;
    char* q = nullptr;
    out = strtol(p, &q, 10);
    if (q == p) return false;
    p = q;
    // skip texcoord/normal refs
    while (p < end && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') ++p;
    return true;
}

}  // namespace

extern "C" {

// Load a Wavefront OBJ: positions + accumulated unit normals, triangulated
// fan faces, AABB. Returns 0 on success. Buffers are malloc'd; release
// with mv_free.
int mv_load_obj(const char* path, int for_dx, float** out_verts,
                int32_t** out_indices, int64_t* out_v_count,
                int64_t* out_t_count, float* out_aabb) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(static_cast<size_t>(size));
    if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
        fclose(f);
        return -2;
    }
    fclose(f);

    std::vector<Float3> pos;
    std::vector<int32_t> idx;
    pos.reserve(1 << 16);
    idx.reserve(1 << 17);

    const char* p = buf.data();
    const char* end = p + size;
    std::vector<long> face;
    while (p < end) {
        // line start
        if (p[0] == 'v' && p + 1 < end && p[1] == 'n') {
            // vn-bearing files use the reference's split-vertex file-normal
            // assignment (XUSGObjLoader.cpp:300-335) — handled by the
            // Python parser; signal the wrapper to fall back.
            return -6;
        } else if (p[0] == 'v' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
            const char* q = p + 2;
            Float3 v{};
            if (parse_float(q, end, v.x) && parse_float(q, end, v.y) &&
                parse_float(q, end, v.z)) {
                if (for_dx) v.z = -v.z;  // XUSGObjLoader.cpp:198
                pos.push_back(v);
            }
        } else if (p[0] == 'f' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
            const char* q = p + 2;
            face.clear();
            long vi;
            while (parse_face_index(q, end, vi)) {
                long resolved = vi > 0 ? vi - 1
                                       : static_cast<long>(pos.size()) + vi;
                face.push_back(resolved);
            }
            for (size_t k = 1; k + 1 < face.size(); ++k) {
                // for_dx flips winding (handedness conversion, see
                // XUSGObjLoader.cpp:227)
                idx.push_back(static_cast<int32_t>(face[0]));
                if (for_dx) {
                    idx.push_back(static_cast<int32_t>(face[k + 1]));
                    idx.push_back(static_cast<int32_t>(face[k]));
                } else {
                    idx.push_back(static_cast<int32_t>(face[k]));
                    idx.push_back(static_cast<int32_t>(face[k + 1]));
                }
            }
        }
        while (p < end && *p != '\n') ++p;
        ++p;
    }

    const int64_t v_count = static_cast<int64_t>(pos.size());
    const int64_t t_count = static_cast<int64_t>(idx.size() / 3);
    if (v_count == 0 || t_count == 0) return -3;

    // unit-face-normal accumulation (ObjLoader::recomputeNormals,
    // XUSGObjLoader.cpp:337-385 — the reference normalizes each face
    // normal before accumulating, i.e. NOT area-weighted)
    std::vector<Float3> nrm(pos.size(), Float3{0, 0, 0});
    for (int64_t t = 0; t < t_count; ++t) {
        const int32_t a = idx[3 * t], b = idx[3 * t + 1], c = idx[3 * t + 2];
        if (a < 0 || b < 0 || c < 0 || a >= v_count || b >= v_count ||
            c >= v_count)
            return -4;
        Float3 fn = cross(sub(pos[b], pos[a]), sub(pos[c], pos[b]));
        const float fl =
            std::sqrt(fn.x * fn.x + fn.y * fn.y + fn.z * fn.z);
        const float fi = fl > 1e-20f ? 1.0f / fl : 0.0f;
        fn.x *= fi;
        fn.y *= fi;
        fn.z *= fi;
        for (int32_t vi : {a, b, c}) {
            nrm[vi].x += fn.x;
            nrm[vi].y += fn.y;
            nrm[vi].z += fn.z;
        }
    }

    float* verts =
        static_cast<float*>(malloc(sizeof(float) * 6 * pos.size()));
    int32_t* indices =
        static_cast<int32_t*>(malloc(sizeof(int32_t) * idx.size()));
    if (!verts || !indices) {
        free(verts);
        free(indices);
        return -5;
    }
    float aabb_min[3] = {INFINITY, INFINITY, INFINITY};
    float aabb_max[3] = {-INFINITY, -INFINITY, -INFINITY};
    for (size_t i = 0; i < pos.size(); ++i) {
        const float len = std::sqrt(nrm[i].x * nrm[i].x + nrm[i].y * nrm[i].y +
                                    nrm[i].z * nrm[i].z);
        const float inv = len > 1e-20f ? 1.0f / len : 0.0f;
        verts[6 * i + 0] = pos[i].x;
        verts[6 * i + 1] = pos[i].y;
        verts[6 * i + 2] = pos[i].z;
        verts[6 * i + 3] = nrm[i].x * inv;
        verts[6 * i + 4] = nrm[i].y * inv;
        verts[6 * i + 5] = nrm[i].z * inv;
        const float c[3] = {pos[i].x, pos[i].y, pos[i].z};
        for (int k = 0; k < 3; ++k) {
            aabb_min[k] = c[k] < aabb_min[k] ? c[k] : aabb_min[k];
            aabb_max[k] = c[k] > aabb_max[k] ? c[k] : aabb_max[k];
        }
    }
    memcpy(indices, idx.data(), sizeof(int32_t) * idx.size());

    *out_verts = verts;
    *out_indices = indices;
    *out_v_count = v_count;
    *out_t_count = t_count;
    for (int k = 0; k < 3; ++k) {
        out_aabb[k] = aabb_min[k];
        out_aabb[3 + k] = aabb_max[k];
    }
    return 0;
}

// Halton radical inverse (XUSG::Halton, XUSG/Advanced/XUSGHalton.h:8-13).
float mv_halton(uint32_t index, uint32_t base) {
    float f = 1.0f, r = 0.0f;
    while (index > 0) {
        f /= static_cast<float>(base);
        r += f * static_cast<float>(index % base);
        index /= base;
    }
    return r;
}

void mv_free(void* p) { free(p); }

}  // extern "C"
