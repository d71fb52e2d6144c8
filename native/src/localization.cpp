// Depth-ROI -> camera-space localization and RANSAC plane removal.
//
// Replaces the Kinect-SDK-dependent path of the reference
// (KinectUtil.cpp GetImgAvg:489 averaging nonzero depth over the
// detection ROI, then MapDepthPointToCameraSpace:437 for 3D meters;
// plane_seg.cpp:157-210 PCL RANSAC plane zeroed out of the depth
// buffer for table-top grasping) with a dependency-free pinhole model
// and an in-house RANSAC.

#include "sr_robot.h"

#include <algorithm>
#include <cmath>
#include <cstdlib>
#include <vector>

extern "C" {

float sr_depth_roi_mean(const uint16_t *depth, int dw, int dh,
                        srRect roi_px) {
    int x0 = std::max(0, (int)(roi_px.x - roi_px.w / 2));
    int x1 = std::min(dw - 1, (int)(roi_px.x + roi_px.w / 2));
    int y0 = std::max(0, (int)(roi_px.y - roi_px.h / 2));
    int y1 = std::min(dh - 1, (int)(roi_px.y + roi_px.h / 2));
    double sum = 0;
    long count = 0;
    for (int y = y0; y <= y1; ++y) {
        const uint16_t *row = depth + (size_t)y * dw;
        for (int x = x0; x <= x1; ++x) {
            if (row[x] > 0) { sum += row[x]; ++count; }
        }
    }
    return count ? (float)(sum / count) : 0.f;
}

void sr_depth_to_camera(float px, float py, float depth_mm,
                        const srIntrinsics *K, float *xyz_out) {
    float z = depth_mm * 1e-3f;
    xyz_out[0] = (px - K->cx) / K->fx * z;
    xyz_out[1] = (py - K->cy) / K->fy * z;
    xyz_out[2] = z;
}

void sr_localize(const uint16_t *depth, int dw, int dh,
                 const srIntrinsics *K, srDetection *det) {
    srRect roi;
    roi.x = det->x * dw;
    roi.y = det->y * dh;
    roi.w = det->w * dw;
    roi.h = det->h * dh;
    float d = sr_depth_roi_mean(depth, dw, dh, roi);
    if (d <= 0) {
        det->cam_x = det->cam_y = det->cam_z = 0.f;
        return;
    }
    float xyz[3];
    sr_depth_to_camera(roi.x, roi.y, d, K, xyz);
    det->cam_x = xyz[0];
    det->cam_y = xyz[1];
    det->cam_z = xyz[2];
}

// ------------------------------------------------------------------
// RANSAC plane

int sr_plane_ransac(const float *xyz, int n, float dist_thresh,
                    int max_iters, uint32_t seed,
                    float *plane_out, uint8_t *inlier_mask) {
    if (n < 3) return 0;
    uint64_t state = seed * 6364136223846793005ull + 1442695040888963407ull;
    auto rnd = [&state](int m) {
        state = state * 6364136223846793005ull + 1442695040888963407ull;
        return (int)((state >> 33) % (uint64_t)m);
    };

    float best[4] = {0, 0, 1, 0};
    int best_inliers = 0;
    for (int it = 0; it < max_iters; ++it) {
        int i0 = rnd(n), i1 = rnd(n), i2 = rnd(n);
        if (i0 == i1 || i1 == i2 || i0 == i2) continue;
        const float *p0 = xyz + 3 * i0, *p1 = xyz + 3 * i1,
                    *p2 = xyz + 3 * i2;
        float u[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
        float v[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
        float nrm[3] = {u[1] * v[2] - u[2] * v[1],
                        u[2] * v[0] - u[0] * v[2],
                        u[0] * v[1] - u[1] * v[0]};
        float len = std::sqrt(nrm[0] * nrm[0] + nrm[1] * nrm[1] +
                              nrm[2] * nrm[2]);
        if (len < 1e-9f) continue;
        for (float &c : nrm) c /= len;
        float d = -(nrm[0] * p0[0] + nrm[1] * p0[1] + nrm[2] * p0[2]);
        int inl = 0;
        for (int i = 0; i < n; ++i) {
            const float *p = xyz + 3 * i;
            float dist = std::fabs(nrm[0] * p[0] + nrm[1] * p[1] +
                                   nrm[2] * p[2] + d);
            if (dist < dist_thresh) ++inl;
        }
        if (inl > best_inliers) {
            best_inliers = inl;
            best[0] = nrm[0]; best[1] = nrm[1]; best[2] = nrm[2];
            best[3] = d;
        }
    }
    if (plane_out) {
        for (int i = 0; i < 4; ++i) plane_out[i] = best[i];
    }
    if (inlier_mask) {
        for (int i = 0; i < n; ++i) {
            const float *p = xyz + 3 * i;
            float dist = std::fabs(best[0] * p[0] + best[1] * p[1] +
                                   best[2] * p[2] + best[3]);
            inlier_mask[i] = dist < dist_thresh ? 1 : 0;
        }
    }
    return best_inliers;
}

int sr_remove_plane_depth(uint16_t *depth, int dw, int dh,
                          const srIntrinsics *K, float dist_thresh,
                          int max_iters, uint32_t seed) {
    // build point cloud from valid depth (subsampled x2 for speed)
    std::vector<float> pts;
    std::vector<int> idx;
    pts.reserve((size_t)dw * dh / 4 * 3);
    for (int y = 0; y < dh; y += 2) {
        for (int x = 0; x < dw; x += 2) {
            uint16_t d = depth[(size_t)y * dw + x];
            if (!d) continue;
            float xyz[3];
            sr_depth_to_camera((float)x, (float)y, (float)d, K, xyz);
            pts.insert(pts.end(), xyz, xyz + 3);
        }
    }
    int n = (int)(pts.size() / 3);
    float plane[4];
    int inl = sr_plane_ransac(pts.data(), n, dist_thresh, max_iters, seed,
                              plane, nullptr);
    if (!inl) return 0;
    // zero every depth pixel on the plane (full resolution pass)
    int removed = 0;
    for (int y = 0; y < dh; ++y) {
        for (int x = 0; x < dw; ++x) {
            uint16_t &d = depth[(size_t)y * dw + x];
            if (!d) continue;
            float xyz[3];
            sr_depth_to_camera((float)x, (float)y, (float)d, K, xyz);
            float dist = std::fabs(plane[0] * xyz[0] + plane[1] * xyz[1] +
                                   plane[2] * xyz[2] + plane[3]);
            if (dist < dist_thresh) { d = 0; ++removed; }
        }
    }
    return removed;
}

}  // extern "C"
