#!/bin/bash
# Build the reference C CPU oracle used by tools/make_golden.py.
#
# The reference (a Windows/VS2013 darknet fork) needs three Linux fixes,
# applied to a SCRATCH COPY — the read-only reference is never touched:
#   1. its local unistd.h shim includes the Windows <io.h>;
#   2. image.c's robot-layer draw_text_box doesn't compile (undeclared
#      return var + call-site arity mismatch);
#   3. two robot globals live in files we don't link.
#
# Produces three binaries in $BUILD:
#   oracle         cfg+weights -> forward output (+ per-layer dumps)
#   oracle_train   N SGD steps -> updated .weights + costs
#   oracle_detect  decode path -> boxes+probs after get_region_boxes+NMS
#
# Usage: tools/build_oracle.sh [build_dir]   (default /tmp/refbuild)
set -euo pipefail

REF=${REF:-/root/reference/src_yolo2}
BUILD=${1:-/tmp/refbuild}
REPO=$(cd "$(dirname "$0")/.." && pwd)

mkdir -p "$BUILD"
rm -rf "$BUILD/src"
cp -r "$REF" "$BUILD/src"

# fix 1: unistd shim
printf '#pragma once\n#include "/usr/include/unistd.h"\n' > "$BUILD/src/unistd.h"

# fix 2: image.c robot-layer compile errors
python3 - "$BUILD/src" <<'EOF'
import re, sys
src_dir = sys.argv[1]
p = f"{src_dir}/image.c"
s = open(p, encoding="latin-1").read()
s = s.replace(
    "char* draw_text_box(detectBoxes *GlobleObjBoxes, int GlobleObjBoxesNum, detectBoxes *NewObjBoxes, int NewObjBoxesNum, char **names, showName *objectName, int num_Obj)",
    "char* draw_text_box(detectBoxes *GlobleObjBoxes, int GlobleObjBoxesNum, detectBoxes *NewObjBoxes, int NewObjBoxesNum, char **names, showName *objectName, int num_Obj, char *eventMessage)")
s = s.replace("return strID;", "return 0;")
open(p, "w", encoding="latin-1").write(s)
h = f"{src_dir}/image.h"
s = open(h, encoding="latin-1").read()
s = re.sub(r"char\*\s+draw_text_box\(([^)]*)\);",
           lambda m: "char*  draw_text_box(" + m.group(1) + ", char *eventMessage);", s)
open(h, "w", encoding="latin-1").write(s)
EOF

SRCS="parser.c network.c utils.c list.c option_list.c blas.c gemm.c \
im2col.c col2im.c activations.c convolutional_layer.c connected_layer.c \
maxpool_layer.c avgpool_layer.c batchnorm_layer.c route_layer.c \
shortcut_layer.c reorg_layer.c dropout_layer.c crop_layer.c cost_layer.c \
normalization_layer.c local_layer.c deconvolutional_layer.c \
activation_layer.c rnn_layer.c gru_layer.c crnn_layer.c region_layer.c \
detection_layer.c softmax_layer.c tree.c box.c layer.c matrix.c data.c \
image.c cuda.c"
OBJS=$(for f in $SRCS; do echo "$BUILD/src/$f"; done)

for drv in oracle oracle_train oracle_detect oracle_valid oracle_layer; do
    cp "$REPO/tools/oracle_drivers/${drv}.c" "$BUILD/${drv}.c"
    gcc -O2 -fcommon -w -I"$BUILD/src" -o "$BUILD/$drv" \
        "$BUILD/${drv}.c" $OBJS -lm -lpthread
    echo "built $BUILD/$drv"
done
