// Native-level smoke tests for libsr_robot, built under ASan/UBSan by
// `make check` (the sanitizer coverage the reference never had,
// SURVEY §5.2).
#include "sr_robot.h"
#include "sr_detector.h"

#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

static srDetection det(float x, float y, float w, float h, int cls) {
    srDetection d{};
    d.x = x; d.y = y; d.w = w; d.h = h;
    d.prob = 0.9f; d.class_id = cls; d.body_id = -1;
    return d;
}

int main() {
    // object memory vote + reminder lifecycle
    srObjectMemoryConfig cfg{2, 2, 0.45f, 0.8f, 16};
    srObjectMemory *om = sr_om_create(&cfg);
    srDetection d = det(0.5f, 0.5f, 0.2f, 0.2f, 3);
    sr_om_update(om, &d, 1);
    int stable = sr_om_update(om, &d, 1);
    assert(stable == 1);
    for (int i = 0; i < 4; ++i) sr_om_update(om, nullptr, 0);
    srDetection rem[4];
    assert(sr_om_reminders(om, rem, 4) == 1);
    assert(rem[0].class_id == 3);
    sr_om_destroy(om);

    // filters
    srDetection ds[3] = {det(0.1f, 0.1f, 0.1f, 0.1f, 1),
                         det(0.2f, 0.2f, 0.1f, 0.1f, 2),
                         det(0.3f, 0.3f, 0.1f, 0.1f, 1)};
    int allowed[1] = {1};
    assert(sr_filter_category(ds, 3, allowed, 1) == 2);

    // localization
    std::vector<uint16_t> depth(64 * 64, 0);
    for (int y = 20; y < 40; ++y)
        for (int x = 20; x < 40; ++x) depth[y * 64 + x] = 1500;
    srIntrinsics K{64.f, 64.f, 32.f, 32.f};
    srDetection ld = det(0.47f, 0.47f, 0.2f, 0.2f, 0);
    sr_localize(depth.data(), 64, 64, &K, &ld);
    assert(std::fabs(ld.cam_z - 1.5f) < 1e-3f);

    // plane RANSAC on a synthetic floor
    std::vector<float> pts;
    for (int i = 0; i < 300; ++i) {
        pts.push_back((i % 17) * 0.05f);
        pts.push_back((i % 13) * 0.05f);
        pts.push_back(1.0f);
    }
    float plane[4];
    int inl = sr_plane_ransac(pts.data(), 300, 0.01f, 100, 7, plane,
                              nullptr);
    assert(inl > 290);
    assert(std::fabs(std::fabs(plane[2]) - 1.0f) < 1e-3f);

    // fHOG + KCF init/track on a static frame (no crash, stable box)
    std::vector<uint8_t> frame(96 * 96 * 3, 40);
    for (int y = 30; y < 50; ++y)
        for (int x = 30; x < 50; ++x)
            frame[(size_t)(y * 96 + x) * 3] = 200;
    srKCF *t = sr_kcf_create(nullptr);
    srRect r{30, 30, 20, 20};
    sr_kcf_init(t, frame.data(), 96, 96, r);
    srRect out = sr_kcf_track(t, frame.data(), 96, 96);
    assert(out.w == 20 && out.h == 20);
    assert(std::fabs(out.x - 30) < 4 && std::fabs(out.y - 30) < 4);
    sr_kcf_destroy(t);

    // multi-tracking ids
    srTrackStore *s = sr_tracks_create(6, 0.1f);
    srDetection m1[1] = {det(0.3f, 0.3f, 0.1f, 0.1f, 0)};
    sr_tracks_update(s, m1, 1, 100, 100);
    int id1 = m1[0].body_id;
    srDetection m2[1] = {det(0.31f, 0.31f, 0.1f, 0.1f, 0)};
    sr_tracks_update(s, m2, 1, 100, 100);
    assert(m2[0].body_id == id1);
    sr_tracks_destroy(s);

    // --- srDetector (yolo_v2_class.hpp analog), callback backend ---
    // fake network: 3 grid boxes, 2 classes; boxes 0 and 1 overlap
    // heavily with box 0 stronger -> NMS must zero box 1's class-0
    // prob; box 2 is a clean class-1 hit.
    auto fake_infer = [](void *, const float *, int, int, int, float,
                         float *boxes, float *probs) -> int {
        const float bx[12] = {0.50f, 0.50f, 0.20f, 0.20f,
                              0.52f, 0.50f, 0.20f, 0.20f,
                              0.20f, 0.20f, 0.10f, 0.10f};
        const float pr[6] = {0.9f, 0.0f,
                             0.6f, 0.0f,
                             0.0f, 0.8f};
        for (int i = 0; i < 12; ++i) boxes[i] = bx[i];
        for (int i = 0; i < 6; ++i) probs[i] = pr[i];
        return 0;
    };
    srDetector *dd = sr_detector_create(3, 2, 416, 416, fake_infer,
                                        nullptr);
    assert(dd);
    std::vector<float> img(64 * 64 * 3, 0.5f);
    srBBox bb[8];
    int nb = sr_detector_detect(dd, img.data(), 64, 64, 3, 0.24f, 0.4f,
                                bb, 8);
    assert(nb == 2);                       // box 1 suppressed by NMS
    assert(bb[0].obj_id == 0 && std::fabs(bb[0].prob - 0.9f) < 1e-6f);
    assert(bb[1].obj_id == 1);
    // pixel conversion: x = max(0, (cx - w/2) * im_w)
    assert(std::fabs(bb[0].x - (0.5f - 0.1f) * 64) < 1e-4f);
    assert(std::fabs(bb[0].w - 0.2f * 64) < 1e-4f);

    // tracking deque semantics: first call seeds per-class ids from 1;
    // second call matches by center distance (<100px) and keeps ids;
    // a far-away new object gets a fresh id.
    int nt = sr_detector_tracking(dd, bb, nb, 6);
    assert(nt == 2);
    assert(bb[0].track_id == 1 && bb[1].track_id == 1); // per-class
    srBBox next[3] = {bb[0], bb[1], bb[0]};
    next[0].x += 5;                        // same object, moved 5px
    next[0].track_id = 0;
    next[1].track_id = 0;
    next[2].x += 300; next[2].y += 300;    // new far object, class 0
    next[2].track_id = 0;
    sr_detector_tracking(dd, next, 3, 6);
    assert(next[0].track_id == 1);         // matched old id
    assert(next[1].track_id == 1);         // class-1 object keeps id
    assert(next[2].track_id == 2);         // fresh class-0 id
    sr_detector_destroy(dd);

    printf("native tests OK\n");
    return 0;
}
