/* Training-parity oracle: run N train steps on fixed data, dump weights.
 * Usage: oracle_train <cfg> <weights_in> <x.bin> <truth.bin> <steps>
 *        <weights_out> [cost_out.bin]
 * x.bin: (outer_batch, C*H*W) float32; truth.bin: (outer_batch, truths)
 * outer_batch = net.batch * net.subdivisions (we call train_network_datum
 * per micro-batch exactly like train_network network.c:263-281).
 */
#include <stdio.h>
#include <stdlib.h>
#include "network.h"
#include "parser.h"
#include "utils.h"
#include "image.h"

detectBoxes *GlobleObjBoxes = 0;
int GlobleObjBoxesNum = 0;

int main(int argc, char **argv)
{
    if (argc < 7) { fprintf(stderr, "usage: cfg win x truth steps wout [cost]\n"); return 1; }
    network net = parse_network_cfg(argv[1]);
    load_weights(&net, argv[2]);
    int steps = atoi(argv[5]);
    int outer = net.batch * net.subdivisions;
    int truths = net.layers[net.n-1].truths;
    if (!truths) truths = net.layers[net.n-1].outputs;
    float *X = calloc((size_t)outer * net.inputs, sizeof(float));
    float *Y = calloc((size_t)outer * truths, sizeof(float));
    FILE *f = fopen(argv[3], "rb");
    fread(X, sizeof(float), (size_t)outer * net.inputs, f); fclose(f);
    f = fopen(argv[4], "rb");
    fread(Y, sizeof(float), (size_t)outer * truths, f); fclose(f);

    float *costs = calloc(steps * net.subdivisions, sizeof(float));
    int s, m;
    int k = 0;
    for (s = 0; s < steps; ++s) {
        for (m = 0; m < net.subdivisions; ++m) {
            float *x = X + (size_t)m * net.batch * net.inputs;
            float *y = Y + (size_t)m * net.batch * truths;
            costs[k++] = train_network_datum(net, x, y);
        }
    }
    save_weights(net, argv[6]);
    if (argc > 7) {
        f = fopen(argv[7], "wb");
        fwrite(costs, sizeof(float), k, f);
        fclose(f);
    }
    fprintf(stderr, "train oracle done: %d updates, seen=%d\n", steps, (int)*net.seen);
    return 0;
}
