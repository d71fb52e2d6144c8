/* Layer-level oracle for the two layers the upstream cfg path cannot
 * run:
 *   - [deconvolutional]: parser.c has NO deconv case (string_to_layer_type
 *     doesn't know the section), so a cfg-driven net leaves a zeroed
 *     layer and forward_network calls a NULL l.forward. We construct
 *     the layer directly via make_deconvolutional_layer.
 *   - [crnn]: forward_crnn_layer builds `network_state s = {0}` and
 *     never sets s.workspace, so its sub-convolutions im2col into NULL
 *     (crnn_layer.c:107 + convolutional_layer.c:455). We replicate the
 *     step loop with a real workspace — patching the DRIVER, not the
 *     layer, so the math pinned is the reference's own.
 *
 * Usage:
 *   oracle_layer deconv h w c n size stride act in.bin params.bin out.bin
 *       params.bin = weights (c*n*size*size floats, (c,n,s,s) order)
 *                    then biases (n floats)
 *   oracle_layer crnn h w c hidden outf act in.bin params.bin out.bin
 *       params.bin = for each of input/self/output sub-conv:
 *                    weights ((n,c,3,3) order) then biases (n floats)
 *       (batch=1, steps=1, batch_normalize=0, pad=1 stride=1 size=3 —
 *        make_crnn_layer's fixed geometry, crnn_layer.c:44-58)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "network.h"
#include "parser.h"
#include "utils.h"
#include "activations.h"
#include "deconvolutional_layer.h"
#include "convolutional_layer.h"
#include "crnn_layer.h"
#include "blas.h"
#include "image.h"

detectBoxes *GlobleObjBoxes = 0;
int GlobleObjBoxesNum = 0;

static void read_floats(FILE *f, float *dst, size_t n)
{
    if (fread(dst, sizeof(float), n, f) != n) {
        fprintf(stderr, "short read\n");
        exit(1);
    }
}

int main(int argc, char **argv)
{
    if (argc < 2) { fprintf(stderr, "usage: see header\n"); return 1; }

    if (strcmp(argv[1], "deconv") == 0) {
        if (argc < 11) { fprintf(stderr, "deconv args\n"); return 1; }
        int h = atoi(argv[2]), w = atoi(argv[3]), c = atoi(argv[4]);
        int n = atoi(argv[5]), size = atoi(argv[6]), stride = atoi(argv[7]);
        ACTIVATION act = get_activation(argv[8]);
        deconvolutional_layer l = make_deconvolutional_layer(
            1, h, w, c, n, size, stride, act);
        FILE *f = fopen(argv[10], "rb");
        read_floats(f, l.weights, (size_t)c * n * size * size);
        read_floats(f, l.biases, n);
        fclose(f);
        float *x = calloc((size_t)c * h * w, sizeof(float));
        f = fopen(argv[9], "rb");
        read_floats(f, x, (size_t)c * h * w);
        fclose(f);
        network_state s = {0};
        s.input = x;
        forward_deconvolutional_layer(l, s);
        f = fopen(argv[11], "wb");
        fwrite(l.output, sizeof(float), l.outputs, f);
        fclose(f);
        fprintf(stderr, "deconv oracle: %d out floats\n", l.outputs);
        return 0;
    }

    if (strcmp(argv[1], "crnn") == 0) {
        if (argc < 11) { fprintf(stderr, "crnn args\n"); return 1; }
        int h = atoi(argv[2]), w = atoi(argv[3]), c = atoi(argv[4]);
        int hidden = atoi(argv[5]), outf = atoi(argv[6]);
        ACTIVATION act = get_activation(argv[7]);
        layer l = make_crnn_layer(1, h, w, c, hidden, outf, 1, act, 0);
        layer *subs[3] = {l.input_layer, l.self_layer, l.output_layer};
        FILE *f = fopen(argv[9], "rb");
        for (int i = 0; i < 3; ++i) {
            layer *sl = subs[i];
            read_floats(f, sl->weights,
                        (size_t)sl->n * sl->c * sl->size * sl->size);
            read_floats(f, sl->biases, sl->n);
        }
        fclose(f);
        float *x = calloc((size_t)c * h * w, sizeof(float));
        f = fopen(argv[8], "rb");
        read_floats(f, x, (size_t)c * h * w);
        fclose(f);

        /* workspace big enough for any sub-conv's im2col buffer */
        size_t ws = 0;
        for (int i = 0; i < 3; ++i) {
            layer *sl = subs[i];
            size_t need = (size_t)sl->out_h * sl->out_w * sl->size *
                          sl->size * sl->c;
            if (need > ws) ws = need;
        }
        float *workspace = calloc(ws, sizeof(float));

        /* forward_crnn_layer (crnn_layer.c:91-130) with a REAL
         * workspace; steps=1, inference (no train) */
        network_state s = {0};
        s.workspace = workspace;
        s.input = x;
        forward_convolutional_layer(*l.input_layer, s);
        s.input = l.state;
        forward_convolutional_layer(*l.self_layer, s);
        fill_cpu(l.hidden * l.batch, 0, l.state, 1);
        axpy_cpu(l.hidden * l.batch, 1, l.input_layer->output, 1,
                 l.state, 1);
        axpy_cpu(l.hidden * l.batch, 1, l.self_layer->output, 1,
                 l.state, 1);
        s.input = l.state;
        forward_convolutional_layer(*l.output_layer, s);
        f = fopen(argv[10], "wb");
        fwrite(l.output_layer->output, sizeof(float),
               l.output_layer->outputs, f);
        fclose(f);
        fprintf(stderr, "crnn oracle: %d out floats\n",
                l.output_layer->outputs);
        return 0;
    }

    fprintf(stderr, "unknown mode %s\n", argv[1]);
    return 1;
}
