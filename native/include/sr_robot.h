/* sr_robot — native robot-vision runtime (C API).
 *
 * TPU-native rebuild of the reference's C++/Win32 robot layer
 * (reference: src_yolo2/objectApplication.c, kcf.cpp, piotr_fhog/,
 * plane_seg.cpp, KinectUtil*.cpp). Device inference stays in JAX; this
 * library provides the host-side runtime around it: cross-frame object
 * memory with appear/disappear voting and "forgotten object" reminders,
 * a KCF/fHOG tracker for inter-detection frames, RANSAC plane removal
 * for table-top grasping, and depth-ROI -> camera-space localization.
 *
 * All functions are thread-compatible (no hidden globals; one handle ==
 * one state), unlike the reference's file-scope globals
 * (objectApplication.c:12-24).
 */

#ifndef SR_ROBOT_H
#define SR_ROBOT_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ------------------------------------------------------------------ */
/* Shared POD types                                                     */

typedef struct {
    float x, y, w, h;        /* box: center-relative [0,1] coords       */
    float prob;
    int   class_id;
    float cam_x, cam_y, cam_z;   /* camera-space meters (0 if unknown)  */
    int   body_id;           /* associated person, -1 if none           */
} srDetection;

typedef struct {
    float x, y, w, h;
} srRect;

typedef struct {
    float fx, fy, cx, cy;    /* pinhole intrinsics (depth camera)       */
} srIntrinsics;

/* ------------------------------------------------------------------ */
/* Object memory: cross-frame voting + reminders                        */
/* (objectApplication.c object_vote_mutilframe:270, object_reminder:389)*/

typedef struct srObjectMemory srObjectMemory;

typedef struct {
    int   appear_thresh;     /* frames seen before an object is stable  */
    int   disappear_thresh;  /* frames missed before removal            */
    float iou_match;         /* same-object IoU gate                    */
    float box_ema;           /* box smoothing factor (ref: 0.8 old+0.2) */
    int   max_objects;
} srObjectMemoryConfig;

srObjectMemory *sr_om_create(const srObjectMemoryConfig *cfg);
void sr_om_destroy(srObjectMemory *om);

/* feed one frame's detections; returns number of stable objects */
int sr_om_update(srObjectMemory *om, const srDetection *dets, int n);

/* stable (voted-in) objects */
int sr_om_objects(const srObjectMemory *om, srDetection *out, int cap);

/* objects that just vanished after being stable — "you forgot your X"
 * (object_reminder semantics)                                          */
int sr_om_reminders(srObjectMemory *om, srDetection *out, int cap);

/* category whitelist filter (objectFilterUsingObjectCategory:100):
 * keeps dets whose class_id appears in `allowed`; returns new count.  */
int sr_filter_category(srDetection *dets, int n,
                       const int *allowed, int n_allowed);

/* distance filter on camera Z (distanceFilter:188) */
int sr_filter_distance(srDetection *dets, int n, float max_z);

/* person-association filter: keep objects whose body_id matches */
int sr_filter_person(srDetection *dets, int n, int body_id);

/* ------------------------------------------------------------------ */
/* Depth-ROI -> camera-space localization                               */
/* (KinectUtil.cpp GetImgAvg:489 + MapDepthPointToCameraSpace:437)      */

/* mean nonzero depth (mm) in the ROI; 0 if none */
float sr_depth_roi_mean(const uint16_t *depth, int dw, int dh,
                        srRect roi_px);

/* back-project pixel+depth to camera meters */
void sr_depth_to_camera(float px, float py, float depth_mm,
                        const srIntrinsics *K, float *xyz_out);

/* full helper: detection box (relative, color space) -> camera xyz */
void sr_localize(const uint16_t *depth, int dw, int dh,
                 const srIntrinsics *K, srDetection *det);

/* ------------------------------------------------------------------ */
/* RANSAC plane segmentation (plane_seg.cpp:157-210, PCL SACMODEL_PLANE)*/

/* fit dominant plane to points (n x 3 float, meters); returns inlier
 * count, writes plane [a,b,c,d] (ax+by+cz+d=0, unit normal) and an
 * optional per-point inlier mask. */
int sr_plane_ransac(const float *xyz, int n, float dist_thresh,
                    int max_iters, uint32_t seed,
                    float *plane_out, uint8_t *inlier_mask);

/* zero depth pixels on the plane (desk_seg semantics: remove the
 * table so objects stand out for grasping) */
int sr_remove_plane_depth(uint16_t *depth, int dw, int dh,
                          const srIntrinsics *K, float dist_thresh,
                          int max_iters, uint32_t seed);

/* ------------------------------------------------------------------ */
/* KCF tracker with fHOG features (kcf.cpp/kcf.h, piotr_fhog/)          */

typedef struct srKCF srKCF;

typedef struct {
    float padding;           /* ref: 3.0  (kcf.h)                       */
    float sigma;             /* gaussian kernel, ref: 0.5               */
    float lambda_;           /* regularization, ref: 1e-4               */
    float interp_factor;     /* model update rate, ref: 0.02            */
    float output_sigma_factor; /* label sigma, ref: 0.1                 */
    int   cell_size;         /* fHOG cell, ref: 4                       */
    int   template_size;     /* internal patch size, 64                 */
} srKCFConfig;

srKCF *sr_kcf_create(const srKCFConfig *cfg);   /* NULL cfg = defaults  */
void sr_kcf_destroy(srKCF *t);

/* rgb: HWC uint8, row stride = 3*w bytes. bbox in pixels. */
void sr_kcf_init(srKCF *t, const uint8_t *rgb, int w, int h, srRect bbox);
srRect sr_kcf_track(srKCF *t, const uint8_t *rgb, int w, int h);
float sr_kcf_peak(const srKCF *t);   /* last response peak (confidence) */

/* ------------------------------------------------------------------ */
/* fHOG features (exposed for tests): 31-channel Felzenszwalb HOG       */

/* img: HWC float RGB [0,1]; out: (h/cell) x (w/cell) x 31, caller-
 * allocated. Returns 0 on success. */
int sr_fhog(const float *img, int w, int h, int cell, float *out);

/* ------------------------------------------------------------------ */
/* Multi-object greedy centroid tracking (yolo_v2_class.cpp:251-304)    */

typedef struct srTrackStore srTrackStore;
srTrackStore *sr_tracks_create(int history, float dist_thresh);
void sr_tracks_destroy(srTrackStore *s);
/* assigns track ids in det[i].body_id (reusing the field); returns n */
int sr_tracks_update(srTrackStore *s, srDetection *dets, int n,
                     int frame_w, int frame_h);

#ifdef __cplusplus
}
#endif

#endif /* SR_ROBOT_H */
