/* C/C++-callable detection API implementation. See sr_detector.h.
 *
 * Native pieces (everything after the network): probability
 * thresholding + per-class sorted NMS (box.c:249-277 semantics),
 * per-box argmax + pixel conversion (yolo_v2_class.cpp:219-239), and
 * the tracking deque (yolo_v2_class.cpp:251-304). The network runs
 * out-of-process (pipe backend) or via a caller-supplied callback.
 */

#include "sr_detector.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <limits>
#include <numeric>
#include <vector>

#include <csignal>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x53524456; /* "SRDV" */

struct PipeBackend {
    pid_t pid = -1;
    FILE *to_child = nullptr;
    FILE *from_child = nullptr;

    ~PipeBackend() {
        if (to_child) fclose(to_child);
        if (from_child) fclose(from_child);
        if (pid > 0) waitpid(pid, nullptr, 0);
    }
};

float box_iou_rel(const float *a, const float *b) {
    /* boxes are (cx, cy, w, h); IoU in the shared relative frame */
    auto overlap = [](float x1, float w1, float x2, float w2) {
        float l = std::max(x1 - w1 / 2, x2 - w2 / 2);
        float r = std::min(x1 + w1 / 2, x2 + w2 / 2);
        return r - l;
    };
    float ow = overlap(a[0], a[2], b[0], b[2]);
    float oh = overlap(a[1], a[3], b[1], b[3]);
    if (ow <= 0 || oh <= 0) return 0;
    float inter = ow * oh;
    float uni = a[2] * a[3] + b[2] * b[3] - inter;
    return uni > 0 ? inter / uni : 0;
}

} // namespace

struct srDetector {
    int n_boxes = 0;
    int classes = 0;
    int net_w = 0;
    int net_h = 0;

    sr_infer_fn infer = nullptr;
    void *ctx = nullptr;
    PipeBackend *pipe = nullptr;

    std::vector<float> boxes;   /* n_boxes * 4 */
    std::vector<float> probs;   /* n_boxes * classes */

    /* tracking state (yolo_v2_class.cpp: prev_bbox_vec_deque +
     * det_gpu.track_id[]; ids start at 1 so 0 means unassigned) */
    std::deque<std::vector<srBBox>> prev;
    std::vector<uint32_t> track_counter;

    int run_infer(const float *img, int w, int h, int c, float thresh) {
        if (infer) return infer(ctx, img, w, h, c, thresh, boxes.data(),
                                probs.data());
        if (!pipe) return -1;
        int32_t hdr[3] = {w, h, c};
        if (fwrite(hdr, sizeof(int32_t), 3, pipe->to_child) != 3) return -1;
        if (fwrite(&thresh, sizeof(float), 1, pipe->to_child) != 1)
            return -1;
        size_t n = (size_t)w * h * c;
        if (fwrite(img, sizeof(float), n, pipe->to_child) != n) return -1;
        fflush(pipe->to_child);
        size_t nb = boxes.size(), np = probs.size();
        if (fread(boxes.data(), sizeof(float), nb, pipe->from_child) != nb)
            return -1;
        if (fread(probs.data(), sizeof(float), np, pipe->from_child) != np)
            return -1;
        return 0;
    }
};

extern "C" {

srDetector *sr_detector_create(int n_boxes, int classes, int net_w,
                               int net_h, sr_infer_fn infer, void *ctx) {
    if (n_boxes <= 0 || classes <= 0 || !infer) return nullptr;
    auto *d = new srDetector;
    d->n_boxes = n_boxes;
    d->classes = classes;
    d->net_w = net_w;
    d->net_h = net_h;
    d->infer = infer;
    d->ctx = ctx;
    d->boxes.resize((size_t)n_boxes * 4);
    d->probs.resize((size_t)n_boxes * classes);
    d->track_counter.assign(classes, 1);
    return d;
}

srDetector *sr_detector_create_pipe(const char *const argv[]) {
    /* a dead worker must surface as detect() == -1, not kill the
     * embedding process: writes to a closed pipe raise SIGPIPE by
     * default, turning fwrite into process death before the error
     * path can run */
    signal(SIGPIPE, SIG_IGN);
    int in_pipe[2], out_pipe[2];
    if (pipe(in_pipe) != 0) return nullptr;
    if (pipe(out_pipe) != 0) { close(in_pipe[0]); close(in_pipe[1]);
                               return nullptr; }
    pid_t pid = fork();
    if (pid < 0) {
        close(in_pipe[0]); close(in_pipe[1]);
        close(out_pipe[0]); close(out_pipe[1]);
        return nullptr;
    }
    if (pid == 0) {
        /* child: stdin <- in_pipe, stdout -> out_pipe */
        dup2(in_pipe[0], 0);
        dup2(out_pipe[1], 1);
        close(in_pipe[0]); close(in_pipe[1]);
        close(out_pipe[0]); close(out_pipe[1]);
        execvp(argv[0], const_cast<char *const *>(argv));
        _exit(127);
    }
    close(in_pipe[0]);
    close(out_pipe[1]);
    auto *pb = new PipeBackend;
    pb->pid = pid;
    pb->to_child = fdopen(in_pipe[1], "wb");
    pb->from_child = fdopen(out_pipe[0], "rb");

    /* handshake: magic, net_w, net_h, n_boxes, classes */
    int32_t hs[5] = {0};
    if (fread(hs, sizeof(int32_t), 5, pb->from_child) != 5 ||
            (uint32_t)hs[0] != kMagic) {
        delete pb;
        return nullptr;
    }
    auto *d = new srDetector;
    d->net_w = hs[1];
    d->net_h = hs[2];
    d->n_boxes = hs[3];
    d->classes = hs[4];
    d->pipe = pb;
    d->boxes.resize((size_t)d->n_boxes * 4);
    d->probs.resize((size_t)d->n_boxes * d->classes);
    d->track_counter.assign(d->classes, 1);
    return d;
}

void sr_detector_destroy(srDetector *d) {
    if (!d) return;
    if (d->pipe) {
        /* w=0 header tells the worker to exit cleanly */
        int32_t hdr[3] = {0, 0, 0};
        fwrite(hdr, sizeof(int32_t), 3, d->pipe->to_child);
        fflush(d->pipe->to_child);
        delete d->pipe;
    }
    delete d;
}

int sr_detector_net_width(const srDetector *d) { return d->net_w; }
int sr_detector_net_height(const srDetector *d) { return d->net_h; }
int sr_detector_classes(const srDetector *d) { return d->classes; }

int sr_detector_detect(srDetector *d, const float *img_hwc, int w, int h,
                       int c, float thresh, float nms, srBBox *out,
                       int cap) {
    if (d->run_infer(img_hwc, w, h, c, thresh) != 0) return -1;
    const int n = d->n_boxes, nc = d->classes;
    float *probs = d->probs.data();
    const float *boxes = d->boxes.data();

    /* get_region_boxes' threshold zeroing (region_layer.c:368-373) */
    for (int i = 0; i < n * nc; ++i)
        if (probs[i] <= thresh) probs[i] = 0;

    /* do_nms_sort (box.c:249-277): per class, prob-descending scan,
     * suppress lower-scored overlaps */
    if (nms > 0) {
        std::vector<int> order(n);
        for (int k = 0; k < nc; ++k) {
            std::iota(order.begin(), order.end(), 0);
            std::stable_sort(order.begin(), order.end(),
                             [&](int a, int b) {
                                 return probs[a * nc + k] >
                                        probs[b * nc + k];
                             });
            for (int i = 0; i < n; ++i) {
                int bi = order[i];
                if (probs[bi * nc + k] == 0) continue;
                const float *a = boxes + bi * 4;
                for (int j = i + 1; j < n; ++j) {
                    int bj = order[j];
                    if (box_iou_rel(a, boxes + bj * 4) > nms)
                        probs[bj * nc + k] = 0;
                }
            }
        }
    }

    /* bbox extraction (yolo_v2_class.cpp:219-239): per-box argmax,
     * keep prob > thresh, convert to clamped top-left pixel coords */
    int m = 0;
    for (int i = 0; i < n && m < cap; ++i) {
        const float *p = probs + i * nc;
        int obj_id = 0;
        for (int k = 1; k < nc; ++k)
            if (p[k] > p[obj_id]) obj_id = k;
        float prob = p[obj_id];
        if (prob > thresh) {
            const float *b = boxes + i * 4;
            srBBox bb;
            bb.x = std::max(0.f, (b[0] - b[2] / 2) * w);
            bb.y = std::max(0.f, (b[1] - b[3] / 2) * h);
            bb.w = b[2] * w;
            bb.h = b[3] * h;
            bb.prob = prob;
            bb.obj_id = (uint32_t)obj_id;
            bb.track_id = 0;
            out[m++] = bb;
        }
    }
    return m;
}

int sr_detector_tracking(srDetector *d, srBBox *boxes, int n,
                         int frames_story) {
    bool prev_present = false;
    for (auto &v : d->prev)
        if (!v.empty()) prev_present = true;

    auto push = [&]() {
        d->prev.push_front(std::vector<srBBox>(boxes, boxes + n));
        while ((int)d->prev.size() > frames_story) d->prev.pop_back();
    };

    if (!prev_present) {
        for (int i = 0; i < n; ++i)
            boxes[i].track_id = d->track_counter[boxes[i].obj_id]++;
        push();
        return n;
    }

    std::vector<unsigned> dist_vec(
        n, std::numeric_limits<unsigned>::max());
    for (auto &prev_vec : d->prev) {
        for (auto &pi : prev_vec) {
            int cur_index = -1;
            for (int m = 0; m < n; ++m) {
                srBBox &k = boxes[m];
                if (pi.obj_id != k.obj_id) continue;
                float dx = (pi.x + pi.w / 2) - (k.x + k.w / 2);
                float dy = (pi.y + pi.h / 2) - (k.y + k.h / 2);
                unsigned dist = (unsigned)std::sqrt(dx * dx + dy * dy);
                if (dist < 100 &&
                        (k.track_id == 0 || dist_vec[m] > dist)) {
                    dist_vec[m] = dist;
                    cur_index = m;
                }
            }
            bool absent = true;
            for (int m = 0; m < n; ++m)
                if (boxes[m].track_id == pi.track_id &&
                        boxes[m].obj_id == pi.obj_id) { absent = false;
                                                        break; }
            if (cur_index >= 0 && absent) {
                boxes[cur_index].track_id = pi.track_id;
                boxes[cur_index].w = (boxes[cur_index].w + pi.w) / 2;
                boxes[cur_index].h = (boxes[cur_index].h + pi.h) / 2;
            }
        }
    }
    for (int i = 0; i < n; ++i)
        if (boxes[i].track_id == 0)
            boxes[i].track_id = d->track_counter[boxes[i].obj_id]++;
    push();
    return n;
}

} /* extern "C" */
