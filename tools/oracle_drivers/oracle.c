/* Golden-tensor oracle driver for the reference CPU path.
 * Usage: oracle <cfg> <weights> <input.bin> <out.bin> [dump_layer_prefix]
 * input.bin: raw float32 CHW input (net.w*net.h*net.c floats)
 * out.bin:   raw float32 network output
 * If dump_layer_prefix given, also dumps every layer's output as
 * <prefix><i>.bin
 */
#include <stdio.h>
#include <stdlib.h>
#include "network.h"
#include "parser.h"
#include "utils.h"



int main(int argc, char **argv)
{
    if (argc < 5) { fprintf(stderr, "usage: %s cfg weights in out [prefix]\n", argv[0]); return 1; }
    network net = parse_network_cfg(argv[1]);
    load_weights(&net, argv[2]);
    set_batch_network(&net, 1);
    float *input = calloc(net.inputs, sizeof(float));
    FILE *f = fopen(argv[3], "rb");
    if (!f) { fprintf(stderr, "no input file\n"); return 1; }
    fread(input, sizeof(float), net.inputs, f);
    fclose(f);
    float *out = network_predict(net, input);
    int n = net.outputs;
    f = fopen(argv[4], "wb");
    fwrite(out, sizeof(float), n, f);
    fclose(f);
    if (argc > 5) {
        int i;
        for (i = 0; i < net.n; ++i) {
            char buf[512];
            sprintf(buf, "%s%d.bin", argv[5], i);
            f = fopen(buf, "wb");
            fwrite(net.layers[i].output, sizeof(float), net.layers[i].outputs, f);
            fclose(f);
        }
    }
    fprintf(stderr, "oracle done: %d outputs\n", n);
    return 0;
}

/* globals normally defined in darknet.c / objectApplication.c */
#include "image.h"
detectBoxes *GlobleObjBoxes = 0;
int GlobleObjBoxesNum = 0;
