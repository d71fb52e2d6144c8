"""cfg parsing + shape inference tests against known reference layouts."""

import pytest

from sr_object_detection_tpu.config import parse_cfg_text
from sr_object_detection_tpu.graph import spec as S


def test_parse_all_reference_cfgs(ref_cfg_dir):
    """Every network cfg the reference ships must parse + shape-infer."""
    skip = {"t1.test.cfg", "jnet-conv.cfg", "vgg-conv.cfg",
            "extraction.conv.cfg", "yolov1"}
    parsed = 0
    for p in sorted(ref_cfg_dir.glob("*.cfg")):
        if p.name in skip:
            continue
        net = S.parse_network_cfg(str(p))
        assert len(net.layers) > 0, p.name
        parsed += 1
    assert parsed >= 20


def test_tiny_yolo_voc_shapes(ref_cfg_dir):
    net = S.parse_network_cfg(str(ref_cfg_dir / "tiny-yolo-voc.cfg"))
    assert net.net.w == 416 and net.net.h == 416 and net.net.c == 3
    convs = [l for l in net.layers if isinstance(l, S.ConvSpec)]
    pools = [l for l in net.layers if isinstance(l, S.MaxPoolSpec)]
    assert len(convs) == 9
    assert len(pools) == 6
    # final conv produces 125 = 5*(20+5) channels at 13x13
    last_conv = convs[-1]
    assert last_conv.filters == 125
    assert (last_conv.out_h, last_conv.out_w) == (13, 13)
    region = net.layers[-1]
    assert isinstance(region, S.RegionSpec)
    assert region.classes == 20 and region.n == 5
    assert region.outputs == 13 * 13 * 5 * 25
    # the stride-1 size-2 'same' maxpool before the 512->1024 conv
    same_pool = [p for p in pools if p.stride == 1]
    assert len(same_pool) == 1
    sp = same_pool[0]
    assert sp.size == 2 and sp.pad == 0
    assert (sp.out_h, sp.out_w, sp.out_c) == (13, 13, 512)


def test_yolo_cfg_shapes(ref_cfg_dir):
    net = S.parse_network_cfg(str(ref_cfg_dir / "yolo.cfg"))
    region = net.layers[-1]
    assert isinstance(region, S.RegionSpec)
    assert region.classes == 80 and region.n == 5
    # reorg passthrough: 26x26x64 -> 13x13x256
    reorgs = [l for l in net.layers if isinstance(l, S.ReorgSpec)]
    assert len(reorgs) == 1
    r = reorgs[0]
    assert (r.h, r.w, r.c) == (26, 26, 64)
    assert (r.out_h, r.out_w, r.out_c) == (13, 13, 256)
    # route after reorg concats 256 + 1024
    routes = [l for l in net.layers if isinstance(l, S.RouteSpec)]
    concat = [l for l in routes if len(l.layers) == 2]
    assert concat and concat[0].out_c == 256 + 1024


def test_yolo9000_shapes(ref_cfg_dir):
    net = S.parse_network_cfg(str(ref_cfg_dir / "yolo9000.cfg"))
    region = net.layers[-1]
    assert isinstance(region, S.RegionSpec)
    assert region.classes == 9418 and region.n == 3
    assert region.tree_file is not None
    last_conv = [l for l in net.layers if isinstance(l, S.ConvSpec)][-1]
    assert last_conv.filters == 3 * (9418 + 5) == 28269


def test_cifar_shapes(ref_cfg_dir):
    net = S.parse_network_cfg(str(ref_cfg_dir / "cifar.cfg"))
    kinds = [l.kind for l in net.layers]
    assert kinds[0] == "crop"
    assert "softmax" in kinds and "cost" in kinds
    crop = net.layers[0]
    assert isinstance(crop, S.CropSpec)
    assert (crop.out_h, crop.out_w) == (28, 28)
    # batch folding: batch/subdivisions*time_steps (parser.c:510-514)
    assert net.net.batch >= 1


def test_net_batch_folding():
    cfg = """
[net]
batch=128
subdivisions=4
time_steps=1
height=32
width=32
channels=3

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky
"""
    net = S.build_network_spec(parse_cfg_text(cfg))
    assert net.net.batch == 32
    assert net.net.subdivisions == 4
    conv = net.layers[0]
    assert (conv.out_h, conv.out_w, conv.out_c) == (32, 32, 8)


def test_maxpool_darknet_geometry():
    """out = (w + 2*pad)//stride with default padding (size-1)//2."""
    cfg = """
[net]
height=13
width=13
channels=4

[maxpool]
size=2
stride=1
"""
    net = S.build_network_spec(parse_cfg_text(cfg))
    mp = net.layers[0]
    assert isinstance(mp, S.MaxPoolSpec)
    assert mp.pad == 0
    assert (mp.out_h, mp.out_w) == (13, 13)


def test_resize_recompiles_shapes(ref_cfg_dir):
    net = S.parse_network_cfg(str(ref_cfg_dir / "tiny-yolo-voc.cfg"))
    big = net.resize(608, 608)
    region = big.layers[-1]
    assert (region.h, region.w) == (19, 19)
    assert region.outputs == 19 * 19 * 5 * 25


def test_rnn_cfg(ref_cfg_dir):
    net = S.parse_network_cfg(str(ref_cfg_dir / "rnn.cfg"))
    rnns = [l for l in net.layers if isinstance(l, S.RNNSpec)]
    assert len(rnns) == 3
    train = S.parse_network_cfg(str(ref_cfg_dir / "rnn.train.cfg"))
    assert train.net.time_steps > 1
    # batch folds in time_steps (parser.c:510-514)
    assert train.net.batch % train.net.time_steps == 0
