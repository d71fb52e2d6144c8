// TSan-checked concurrency test (`make tsan`, SURVEY §5.2): the
// reference's object/tracking logic lived in file-scope globals
// (objectApplication.c:12-13, darknet.c:358 GlobleObjBoxes) so two
// concurrent pipelines would race; this runtime is handle-based, and
// ThreadSanitizer proves two threads driving INDEPENDENT handles of
// every subsystem share no hidden mutable state.
#include "sr_robot.h"

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>

static void pipeline(int seed) {
    srObjectMemoryConfig cfg{2, 2, 0.45f, 0.8f, 16};
    srObjectMemory *om = sr_om_create(&cfg);
    srTrackStore *ts = sr_tracks_create(6, 0.3f);
    srKCF *kcf = sr_kcf_create(nullptr);

    std::vector<uint8_t> frame(64 * 64 * 3);
    for (size_t i = 0; i < frame.size(); ++i)
        frame[i] = static_cast<uint8_t>((i * 31 + seed * 7) & 0xff);
    sr_kcf_init(kcf, frame.data(), 64, 64, srRect{16, 16, 24, 24});

    std::vector<uint16_t> depth(64 * 64, 1200);
    srIntrinsics K{64.f, 64.f, 32.f, 32.f};

    for (int it = 0; it < 50; ++it) {
        srDetection d{};
        d.x = 0.4f + 0.002f * ((it + seed) % 5);
        d.y = 0.5f;
        d.w = d.h = 0.2f;
        d.prob = 0.9f;
        d.class_id = seed;
        d.body_id = -1;
        sr_om_update(om, &d, 1);
        sr_tracks_update(ts, &d, 1, 64, 64);
        sr_localize(depth.data(), 64, 64, &K, &d);
        (void)sr_kcf_track(kcf, frame.data(), 64, 64);
    }
    srDetection out[16];
    assert(sr_om_objects(om, out, 16) >= 1);

    sr_kcf_destroy(kcf);
    sr_tracks_destroy(ts);
    sr_om_destroy(om);
}

int main() {
    std::thread a(pipeline, 1);
    std::thread b(pipeline, 2);
    a.join();
    b.join();
    std::puts("native thread tests OK");
    return 0;
}
