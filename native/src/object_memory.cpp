// Cross-frame object memory: voting, reminders, filters.
//
// Re-design of the reference's object persistence logic
// (src_yolo2/objectApplication.c: object_vote_mutilframe:270 —
// IoU+class matching with appear/disappear counters and box EMA;
// object_reminder:389 — report stable objects that vanished;
// objectFilterUsingObjectCategory:100, distanceFilter:188,
// person filters:129-187). State lives in a handle, not globals.

#include "sr_robot.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Tracked {
    srDetection det{};
    int seen = 0;        // consecutive-ish appearance count
    int missed = 0;      // consecutive missed frames
    bool stable = false;
};

float iou(const srDetection &a, const srDetection &b) {
    float ax1 = a.x - a.w / 2, ax2 = a.x + a.w / 2;
    float ay1 = a.y - a.h / 2, ay2 = a.y + a.h / 2;
    float bx1 = b.x - b.w / 2, bx2 = b.x + b.w / 2;
    float by1 = b.y - b.h / 2, by2 = b.y + b.h / 2;
    float iw = std::min(ax2, bx2) - std::max(ax1, bx1);
    float ih = std::min(ay2, by2) - std::max(ay1, by1);
    if (iw <= 0 || ih <= 0) return 0.f;
    float inter = iw * ih;
    float uni = a.w * a.h + b.w * b.h - inter;
    return uni > 0 ? inter / uni : 0.f;
}

}  // namespace

struct srObjectMemory {
    srObjectMemoryConfig cfg{};
    std::vector<Tracked> tracks;
    std::vector<srDetection> reminders;
};

extern "C" {

srObjectMemory *sr_om_create(const srObjectMemoryConfig *cfg) {
    auto *om = new srObjectMemory();
    if (cfg) {
        om->cfg = *cfg;
    } else {
        // reference defaults: ~5-frame appear vote, box EMA 0.8/0.2
        // (objectApplication.c:320-323)
        om->cfg = {5, 8, 0.45f, 0.8f, 128};
    }
    return om;
}

void sr_om_destroy(srObjectMemory *om) { delete om; }

int sr_om_update(srObjectMemory *om, const srDetection *dets, int n) {
    const auto &cfg = om->cfg;
    std::vector<bool> used(static_cast<size_t>(std::max(n, 0)), false);

    // match existing tracks greedily by IoU + class
    for (auto &t : om->tracks) {
        int best = -1;
        float best_iou = cfg.iou_match;
        for (int i = 0; i < n; ++i) {
            if (used[i] || dets[i].class_id != t.det.class_id) continue;
            float v = iou(dets[i], t.det);
            if (v > best_iou) { best_iou = v; best = i; }
        }
        if (best >= 0) {
            used[best] = true;
            const srDetection &d = dets[best];
            float a = cfg.box_ema;
            t.det.x = a * t.det.x + (1 - a) * d.x;
            t.det.y = a * t.det.y + (1 - a) * d.y;
            t.det.w = a * t.det.w + (1 - a) * d.w;
            t.det.h = a * t.det.h + (1 - a) * d.h;
            t.det.prob = d.prob;
            t.det.cam_x = d.cam_x;
            t.det.cam_y = d.cam_y;
            t.det.cam_z = d.cam_z;
            t.det.body_id = d.body_id;
            t.seen = std::min(t.seen + 1, 1000000);
            t.missed = 0;
            if (t.seen >= cfg.appear_thresh) t.stable = true;
        } else {
            t.missed += 1;
        }
    }

    // spawn tracks for unmatched detections
    for (int i = 0; i < n; ++i) {
        if (used[i]) continue;
        if ((int)om->tracks.size() >= cfg.max_objects) break;
        Tracked t;
        t.det = dets[i];
        t.seen = 1;
        t.stable = (t.seen >= cfg.appear_thresh);
        om->tracks.push_back(t);
    }

    // retire tracks; stable ones that vanish become reminders
    std::vector<Tracked> keep;
    keep.reserve(om->tracks.size());
    for (auto &t : om->tracks) {
        if (t.missed > cfg.disappear_thresh) {
            if (t.stable) om->reminders.push_back(t.det);
        } else {
            keep.push_back(t);
        }
    }
    om->tracks.swap(keep);

    int stable = 0;
    for (auto &t : om->tracks)
        if (t.stable) ++stable;
    return stable;
}

int sr_om_objects(const srObjectMemory *om, srDetection *out, int cap) {
    int k = 0;
    for (const auto &t : om->tracks) {
        if (!t.stable || k >= cap) continue;
        out[k++] = t.det;
    }
    return k;
}

int sr_om_reminders(srObjectMemory *om, srDetection *out, int cap) {
    int k = 0;
    for (const auto &d : om->reminders) {
        if (k >= cap) break;
        out[k++] = d;
    }
    om->reminders.clear();
    return k;
}

int sr_filter_category(srDetection *dets, int n,
                       const int *allowed, int n_allowed) {
    int k = 0;
    for (int i = 0; i < n; ++i) {
        bool ok = false;
        for (int j = 0; j < n_allowed; ++j)
            if (dets[i].class_id == allowed[j]) { ok = true; break; }
        if (ok) dets[k++] = dets[i];
    }
    return k;
}

int sr_filter_distance(srDetection *dets, int n, float max_z) {
    int k = 0;
    for (int i = 0; i < n; ++i)
        if (dets[i].cam_z > 0 && dets[i].cam_z <= max_z)
            dets[k++] = dets[i];
    return k;
}

int sr_filter_person(srDetection *dets, int n, int body_id) {
    int k = 0;
    for (int i = 0; i < n; ++i)
        if (dets[i].body_id == body_id) dets[k++] = dets[i];
    return k;
}

}  // extern "C"
