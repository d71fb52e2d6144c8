/* mAP-parity oracle: the validate_detector loop (detector.c:244-369)
 * without data-cfg/thread plumbing.
 * Usage: oracle_valid cfg weights list.txt results_dir [thresh nms]
 * For each image path in list.txt: load_image_color, resize_image to
 * net dims (plain resize, IMAGE_DATA semantics, data.c load thread),
 * network_predict, get_region_boxes(l, im.w, im.h, thresh, ..., map=0),
 * do_nms_sort, print_detector_detections into
 * results_dir/comp4_det_test_<class>.txt (class names = "0".."C-1").
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "network.h"
#include "parser.h"
#include "utils.h"
#include "box.h"
#include "image.h"
#include "region_layer.h"

detectBoxes *GlobleObjBoxes = 0;
int GlobleObjBoxesNum = 0;

/* inlined print_detector_detections (detector.c:201-220) so we don't
 * have to link all of detector.c: boxes arrive pre-scaled to pixels by
 * get_region_boxes; clamp to [0, w]x[0, h]; NO +1 offset (this fork
 * dropped upstream's 1-based shift). */
static void print_dets(FILE **fps, char *id, box *boxes, float **probs,
                       int total, int classes, int w, int h)
{
    int i, j;
    for (i = 0; i < total; ++i) {
        float xmin = boxes[i].x - boxes[i].w/2.;
        float xmax = boxes[i].x + boxes[i].w/2.;
        float ymin = boxes[i].y - boxes[i].h/2.;
        float ymax = boxes[i].y + boxes[i].h/2.;
        if (xmin < 0) xmin = 0;
        if (ymin < 0) ymin = 0;
        if (xmax > w) xmax = w;
        if (ymax > h) ymax = h;
        for (j = 0; j < classes; ++j) {
            if (probs[i][j]) fprintf(fps[j], "%s %f %f %f %f %f\n", id,
                    probs[i][j], xmin, ymin, xmax, ymax);
        }
    }
}

int main(int argc, char **argv)
{
    if (argc < 5) {
        fprintf(stderr, "usage: cfg weights list results_dir [thresh nms]\n");
        return 1;
    }
    float thresh = argc > 5 ? atof(argv[5]) : .005;
    float nms = argc > 6 ? atof(argv[6]) : .45;
    network net = parse_network_cfg(argv[1]);
    load_weights(&net, argv[2]);
    set_batch_network(&net, 1);
    layer l = net.layers[net.n-1];
    int classes = l.classes;
    int n = l.w*l.h*l.n;

    FILE **fps = calloc(classes, sizeof(FILE *));
    char buff[1024];
    int j;
    for (j = 0; j < classes; ++j) {
        snprintf(buff, 1024, "%s/comp4_det_test_%d.txt", argv[4], j);
        fps[j] = fopen(buff, "w");
        if (!fps[j]) { fprintf(stderr, "cannot open %s\n", buff); return 1; }
    }

    box *boxes = calloc(n, sizeof(box));
    float **probs = calloc(n, sizeof(float *));
    for (j = 0; j < n; ++j) probs[j] = calloc(classes, sizeof(float));

    list *plist = get_paths(argv[3]);
    char **paths = (char **)list_to_array(plist);
    int i;
    for (i = 0; i < plist->size; ++i) {
        char *id = basecfg(paths[i]);
        image orig = load_image_color(paths[i], 0, 0);
        image sized = resize_image(orig, net.w, net.h);
        network_predict(net, sized.data);
        get_region_boxes(l, orig.w, orig.h, thresh, probs, boxes, 0, 0);
        if (nms) do_nms_sort(boxes, probs, n, classes, nms);
        print_dets(fps, id, boxes, probs, n, classes, orig.w, orig.h);
        free(id);
        free_image(orig);
        free_image(sized);
    }
    for (j = 0; j < classes; ++j) fclose(fps[j]);
    fprintf(stderr, "valid oracle done: %d images\n", plist->size);
    return 0;
}
