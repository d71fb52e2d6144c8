/* sr_detector — C/C++-callable detection API.
 *
 * Mirrors the reference DLL's Detector class surface
 * (src_yolo2/yolo_v2_class.hpp:42-146): detect() -> pixel-space bboxes
 * with per-class ids/probs, tracking() with the frames_story deque
 * semantics of yolo_v2_class.cpp:251-304.
 *
 * The network itself runs on the TPU through JAX; this API bridges to
 * it in one of two ways:
 *   1. callback backend (sr_detector_create): the caller supplies an
 *      inference function returning decoded (boxes, probs) for one
 *      image — e.g. a Python closure over infer.Detector handed down
 *      via ctypes; everything after the network (thresholding, NMS,
 *      bbox extraction, tracking) is native.
 *   2. pipe backend (sr_detector_create_pipe): spawns a worker process
 *      (python -m sr_object_detection_tpu.infer.serve cfg weights)
 *      and speaks a binary protocol over its stdin/stdout — a pure
 *      C++ application needs no Python embedding.
 */

#ifndef SR_DETECTOR_H
#define SR_DETECTOR_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* bbox_t analog (yolo_v2_class.hpp:17-27): x,y = top-left pixels,
 * clamped at 0 like Detector::detect (yolo_v2_class.cpp:228-231). */
typedef struct {
    float    x, y, w, h;
    float    prob;
    uint32_t obj_id;
    uint32_t track_id;
} srBBox;

/* Inference bridge: fill boxes_out (n_boxes*4: x,y,w,h center-relative
 * in [0,1]) and probs_out (n_boxes*classes, region-decoded with
 * get_region_boxes' thresh gating applied — the tree-without-map
 * branch gates on objectness > thresh at decode time, so thresh must
 * reach the backend). img is HWC float RGB [0,1] at ANY size — the
 * backend resizes to net dims itself (load_image + resize_image parity
 * lives with the network). Return 0 on success. */
typedef int (*sr_infer_fn)(void *ctx, const float *img_hwc,
                           int w, int h, int c, float thresh,
                           float *boxes_out, float *probs_out);

typedef struct srDetector srDetector;

srDetector *sr_detector_create(int n_boxes, int classes,
                               int net_w, int net_h,
                               sr_infer_fn infer, void *ctx);

/* Spawn `argv` (NULL-terminated) as a worker speaking the serve
 * protocol; returns NULL if exec or handshake fails. */
srDetector *sr_detector_create_pipe(const char *const argv[]);

void sr_detector_destroy(srDetector *d);

int sr_detector_net_width(const srDetector *d);
int sr_detector_net_height(const srDetector *d);
int sr_detector_classes(const srDetector *d);

/* Full detect (Detector::detect, yolo_v2_class.cpp:173-249): inference
 * via the backend, then native threshold + do_nms_sort + per-box
 * argmax + pixel-space conversion. Returns #boxes written (<= cap),
 * or -1 on backend failure. nms <= 0 disables NMS (default .4). */
int sr_detector_detect(srDetector *d, const float *img_hwc,
                       int w, int h, int c, float thresh, float nms,
                       srBBox *out, int cap);

/* Track-id assignment across calls (Detector::tracking,
 * yolo_v2_class.cpp:251-304): per-class monotone ids, center-distance
 * (<100px) matching against a deque of the last frames_story frames,
 * box w/h averaging on match. Mutates boxes in place, returns n. */
int sr_detector_tracking(srDetector *d, srBBox *boxes, int n,
                         int frames_story);

#ifdef __cplusplus
}
#endif

#endif /* SR_DETECTOR_H */
