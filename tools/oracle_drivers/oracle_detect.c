/* Decode-parity oracle: network_predict + get_region_boxes + do_nms_sort.
 * Usage: oracle_detect cfg weights in.bin boxes.bin probs.bin thresh nms
 * Dumps boxes (N x 4 floats, relative coords w=h=1) and probs (N x classes)
 * after threshold + NMS, exactly like test_detector (detector.c:454-512).
 */
#include <stdio.h>
#include <stdlib.h>
#include "network.h"
#include "parser.h"
#include "utils.h"
#include "box.h"
#include "image.h"
#include "region_layer.h"

detectBoxes *GlobleObjBoxes = 0;
int GlobleObjBoxesNum = 0;

int main(int argc, char **argv)
{
    if (argc < 8) { fprintf(stderr, "usage\n"); return 1; }
    network net = parse_network_cfg(argv[1]);
    load_weights(&net, argv[2]);
    set_batch_network(&net, 1);
    float thresh = atof(argv[6]);
    float nms = atof(argv[7]);
    layer l = net.layers[net.n-1];
    float *input = calloc(net.inputs, sizeof(float));
    FILE *f = fopen(argv[3], "rb");
    fread(input, sizeof(float), net.inputs, f); fclose(f);
    network_predict(net, input);
    int n = l.w*l.h*l.n;
    box *boxes = calloc(n, sizeof(box));
    float **probs = calloc(n, sizeof(float*));
    int i;
    for (i = 0; i < n; ++i) probs[i] = calloc(l.classes, sizeof(float));
    get_region_boxes(l, 1, 1, thresh, probs, boxes, 0, 0);
    if (nms > 0) do_nms_sort(boxes, probs, n, l.classes, nms);
    f = fopen(argv[4], "wb");
    fwrite(boxes, sizeof(box), n, f); fclose(f);
    f = fopen(argv[5], "wb");
    for (i = 0; i < n; ++i) fwrite(probs[i], sizeof(float), l.classes, f);
    fclose(f);
    fprintf(stderr, "detect oracle done: %d boxes x %d classes\n", n, l.classes);
    return 0;
}
