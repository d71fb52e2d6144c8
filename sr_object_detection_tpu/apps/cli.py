"""darknet-compatible CLI dispatcher.

Mirrors the reference's command surface (src_yolo2/darknet.c:366-499):

  sr-detect detector train|valid|recall|test <data> <cfg> [weights] ...
  sr-detect classifier train|valid|predict <data> <cfg> [weights] ...
  sr-detect detect <cfg> <weights> <image> [-thresh T]
  sr-detect classify <cfg> <weights> <image>
  sr-detect rnn generate <cfg> <weights> [-len N] [-temp T] [-seed S]
  sr-detect speed <cfg> [tics]
  sr-detect ops <cfg>
  sr-detect partial <cfg> <weights> <out> <n>
  sr-detect average <cfg> <out> <w1> <w2> ...
  sr-detect rescale <cfg> <weights> <out>
  sr-detect rgbgr <cfg> <weights> <out>
  sr-detect denormalize <cfg> <weights> <out>
  sr-detect normalize <cfg> <weights> <out>
  sr-detect statistics <cfg> <weights>
  sr-detect visualize <cfg> [weights]

Flag parsing follows the reference's argv-splicing helpers
(utils.c:62-118): '-key value' pairs are plucked from anywhere.
"""

from __future__ import annotations

import json
import sys
import time


def find_arg(argv, key):
    if key in argv:
        argv.remove(key)
        return True
    return False


def find_value(argv, key, default=None, cast=str):
    if key in argv:
        i = argv.index(key)
        v = argv[i + 1]
        del argv[i:i + 2]
        return cast(v)
    return default


def _load_net(cfg, weights):
    from ..graph.spec import parse_network_cfg
    from ..io.weights import load_weights, init_params
    spec = parse_network_cfg(cfg)
    if weights:
        params, seen = load_weights(spec, weights)
    else:
        params, seen = init_params(spec), 0
    return spec, params, seen


def cmd_detect(argv):
    thresh = find_value(argv, "-thresh", 0.24, float)
    out_path = find_value(argv, "-out", None)
    use_int8 = find_arg(argv, "-int8")
    use_presplit = find_arg(argv, "-presplit")
    use_qhead = find_arg(argv, "-qhead")   # int8 head conv too
    cfg, weights, image = argv[0], argv[1], argv[2]
    from ..infer.detector import Detector
    from ..ops.image import load_image_rgb
    names_file = find_value(argv, "-names", None)
    names = None
    if names_file:
        from ..config import read_names
        names = read_names(names_file)
    img = load_image_rgb(image)
    calib = None
    if use_int8:
        # int8 serving mode (infer/quant.py): calibrate activation
        # scales on the input image itself
        from ..graph.spec import parse_network_cfg
        _spec = parse_network_cfg(cfg)
        from ..ops.image import resize_image_np
        calib = resize_image_np(img, _spec.net.w, _spec.net.h)[None]
    det = Detector(cfg, weights, names=names, int8_calib=calib,
                   presplit=use_presplit, quantize_head=use_qhead)
    t0 = time.time()
    dets = det.detect(img, thresh=thresh)
    print(f"{image}: Predicted in {time.time()-t0:.6f} seconds.")
    for d in dets:
        label = d.name or str(d.class_id)
        print(f"{label}: {100*d.prob:.0f}%  box={d.box}")
    if out_path:
        # draw_detections + save_image analog (image.c:741,1397)
        from ..ops.draw import draw_detections
        from .nightmare_app import _save_ppm
        _save_ppm(out_path, draw_detections(
            img, dets, classes=det.region.classes))
        print(f"wrote {out_path}")
    return dets


def cmd_classify(argv):
    use_int8 = find_arg(argv, "-int8")
    cfg, weights, image = argv[0], argv[1], argv[2]
    from ..infer.classifier import Classifier
    from ..ops.image import load_image_rgb
    names_file = find_value(argv, "-names", None)
    names = None
    if names_file:
        from ..config import read_names
        names = read_names(names_file)
    img = load_image_rgb(image)
    calib = None
    if use_int8:
        from ..graph.spec import parse_network_cfg
        from ..ops.image import letterbox_image_np
        _spec = parse_network_cfg(cfg)
        calib = letterbox_image_np(img, _spec.net.w, _spec.net.h)[None]
    clf = Classifier(cfg, weights, names=names, int8_calib=calib)
    for idx, p, name in clf.predict_topk(img, k=5):
        print(f"{name or idx}: {p:.6f}")


def cmd_gemm(argv):
    """gemm.c:232-341 time_ongpu analog: GFLOP/s for darknet-shaped
    matmuls on the MXU. `gemm [m k n] [-reps N] [-f32]`."""
    import jax.numpy as jnp
    from ..utils.gemm_bench import run_gemm_bench
    reps = find_value(argv, "-reps", 200, int)
    dtype = jnp.float32 if find_arg(argv, "-f32") else jnp.bfloat16
    shapes = None
    if len(argv) >= 3:
        shapes = [(0, 0, int(argv[0]), int(argv[1]), int(argv[2]))]
    run_gemm_bench(shapes, dtype=dtype, reps=reps)


def cmd_speed(argv):
    """darknet.c:98-113: time `tics` forwards, print sec/eval and Hz.
    `-batch N` widens the eval; `-int8` uses the quantized engine;
    `-phase-stem` (with -int8 -batch 128) fuses the leading
    conv3x3+pool2x2 pairs into the Pallas phase-split kernel
    (kernels/phase_stem.py, bit-exact to the int8 chain)."""
    use_int8 = find_arg(argv, "-int8")
    use_presplit = "flat" if find_arg(argv, "-presplit-flat") \
        else find_arg(argv, "-presplit")
    use_qhead = find_arg(argv, "-qhead")
    use_phase = find_arg(argv, "-phase-stem")
    batch = find_value(argv, "-batch", 1, int)
    cfg = argv[0]
    tics = int(argv[1]) if len(argv) > 1 else 20
    import jax.numpy as jnp
    from ..io.weights import init_params
    from ..graph.spec import parse_network_cfg
    from ..infer.engine import ThroughputEngine
    spec = parse_network_cfg(cfg)
    params = init_params(spec)
    if use_int8:
        from ..infer.quant import QuantizedThroughputEngine
        eng = QuantizedThroughputEngine(spec, params, batch=batch,
                                        presplit=use_presplit,
                                        quantize_head=use_qhead,
                                        phase_stem=use_phase)
    else:
        eng = ThroughputEngine(spec, params, batch=batch,
                               dtype=jnp.bfloat16,
                               presplit=use_presplit)
    eng.warmup()
    r = eng.benchmark(iters=tics)
    sec = r["sec_per_batch"]
    print(f"Speed: {sec:f} sec/eval")
    print(f"Speed: {1.0/sec:f} Hz")
    if batch > 1:
        print(f"Speed: {r['images_per_sec']:.1f} images/sec (batch {batch})")


def cmd_ops(argv):
    """darknet.c:115-131: analytic FLOPs."""
    cfg = argv[0]
    from ..graph.spec import parse_network_cfg
    from ..infer.engine import analytic_flops
    spec = parse_network_cfg(cfg)
    ops = analytic_flops(spec)
    print(f"Floating Point Operations: {ops:.0f}")
    print(f"Floating Point Operations: {ops/1e9:.2f} Bn")


def cmd_partial(argv):
    cfg, weights, out, n = argv[0], argv[1], argv[2], int(argv[3])
    from ..io import surgery
    spec, params, _ = _load_net(cfg, weights)
    surgery.partial(spec, params, out, n)
    print(f"Saved first {n} layers to {out}")


def cmd_average(argv):
    cfg, out = argv[0], argv[1]
    from ..graph.spec import parse_network_cfg
    from ..io import surgery
    spec = parse_network_cfg(cfg)
    surgery.average(spec, argv[2:], out)
    print(f"Averaged {len(argv)-2} checkpoints -> {out}")


def _surgery_cmd(fn_name):
    def run(argv):
        cfg, weights, out = argv[0], argv[1], argv[2]
        from ..io import surgery
        from ..io.weights import save_weights
        spec, params, seen = _load_net(cfg, weights)
        fn = getattr(surgery, fn_name)
        res = fn(params, spec)
        if isinstance(res, tuple):
            params, spec = res
        else:
            params = res
        save_weights(spec, params, out, seen=seen)
        print(f"{fn_name} -> {out}")
    return run


def cmd_statistics(argv):
    cfg, weights = argv[0], argv[1]
    from ..io import surgery
    spec, params, _ = _load_net(cfg, weights)
    for row in surgery.statistics(params, spec):
        print(f"layer {row['layer']:3d} {row['kind']:<12} "
              f"shape={row['shape']} mean={row['mean']:+.4f} "
              f"std={row['std']:.4f}")


def cmd_visualize(argv):
    """Text rendering of the network graph (parser-table analog,
    parser.c:611 layer table)."""
    cfg = argv[0]
    from ..graph.spec import parse_network_cfg
    spec = parse_network_cfg(cfg)
    print("layer     type              input                output")
    for l in spec.layers:
        print(f"{l.index:5d} {l.kind:<16} {l.w:4d} x{l.h:4d} x{l.c:4d}"
              f"   ->  {l.out_w:4d} x{l.out_h:4d} x{l.out_c:4d}")
    from ..infer.engine import analytic_flops
    print(f"total FLOPs/forward: {analytic_flops(spec)/1e9:.2f} Bn")


def cmd_detector(argv):
    sub = argv[0]
    if sub == "test":
        return cmd_detect(argv[2:3] + argv[3:])
    from .detector_app import run_detector
    return run_detector(argv)


def cmd_classifier(argv):
    from .classifier_app import run_classifier
    return run_classifier(argv)


def cmd_rnn(argv):
    from .rnn_app import run_char_rnn
    return run_char_rnn(argv)


def cmd_art(argv):
    from .misc_apps import art
    return art(argv[0], argv[1], argv[2])


def cmd_captcha(argv):
    if argv and argv[0] == "train":
        from .misc_train import train_captcha
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return train_captcha(argv[1], w, argv[3:] if w else argv[2:])
    if argv and argv[0] == "test":
        # test_captcha (captcha.c:98): cfg [weights] <image> — two
        # positionals after cfg mean (weights, image), one means image
        from .misc_train import test_captcha
        rest = argv[1:]
        cfg = rest.pop(0)
        pos = [a for a in rest[:2] if not a.startswith("-")]
        w = rest.pop(0) if len(pos) == 2 else None
        return test_captcha(cfg, w, rest.pop(0), rest)
    if argv and argv[0] == "valid":
        from .misc_train import valid_captcha
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return valid_captcha(argv[1], w, argv[3:] if w else argv[2:])
    from .misc_apps import captcha
    return captcha(argv[0], argv[1], argv[2])


def cmd_tag(argv):
    if argv and argv[0] == "train":
        from .misc_train import train_tag
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return train_tag(argv[1], w, argv[3:] if w else argv[2:])
    from .misc_apps import tag
    names_file = find_value(argv, "-names", None)
    names = None
    if names_file:
        from ..config import read_names
        names = read_names(names_file)
    return tag(argv[0], argv[1], argv[2], names=names)


def cmd_compare(argv):
    if argv and argv[0] == "train":
        from .misc_train import train_compare
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return train_compare(argv[1], w, argv[3:] if w else argv[2:])
    if argv and argv[0] in ("valid", "sort", "battle"):
        # run_compare dispatch (compare.c:343-359)
        from . import compare_app
        fn = {"valid": compare_app.validate_compare,
              "sort": compare_app.sort_master,
              "battle": compare_app.battle_royale}[argv[0]]
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return fn(argv[1], w, argv[3:] if w else argv[2:])
    from .misc_apps import compare
    return compare(argv[0], argv[1], argv[2], argv[3])


def cmd_writing(argv):
    if argv and argv[0] == "train":
        from .misc_train import train_writing
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return train_writing(argv[1], w, argv[3:] if w else argv[2:])
    from .misc_apps import writing
    out = find_value(argv, "-out", "writing_out.ppm")
    return writing(argv[0], argv[1], argv[2], out_path=out)


def cmd_oneoff(argv):
    """oneoff (darknet.c:133-156): transfer shape-matching weights from
    one checkpoint into another architecture."""
    cfg_src, weights, cfg_dst, out = argv[0], argv[1], argv[2], argv[3]
    from ..graph.spec import parse_network_cfg
    from ..io import surgery
    from ..io.weights import load_weights, init_params, save_weights
    src_spec = parse_network_cfg(cfg_src)
    src_params, _ = load_weights(src_spec, weights)
    dst_spec = parse_network_cfg(cfg_dst)
    dst_params = init_params(dst_spec)
    merged, copied = surgery.transfer(src_params, src_spec, dst_spec,
                                      dst_params)
    save_weights(dst_spec, merged, out, seen=0)
    print(f"transferred {copied} layers -> {out}")


def cmd_3d(argv):
    from .misc_apps import composite_3d
    delta = find_value(argv, "-delta", 0, int)
    out = argv[2] if len(argv) > 2 else "out.ppm"
    return composite_3d(argv[0], argv[1], out, delta=delta)


def cmd_imtest(argv):
    from .misc_apps import imtest
    return imtest(argv[0], find_value(argv, "-out", "."))


def cmd_vid(argv):
    """rnn_vid: per-frame conv features -> feature-RNN demo."""
    if argv and argv[0] == "train":
        from .misc_train import train_vid_rnn
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return train_vid_rnn(argv[1], w, argv[3:] if w else argv[2:])
    if argv and argv[0] == "generate":
        # generate_vid_rnn (rnn_vid.c:154-198)
        from .misc_apps import generate_vid_rnn
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return generate_vid_rnn(argv[1], w,
                                argv[3:] if w else argv[2:])
    from .misc_apps import VideoRNN
    from ..robot.frame_source import ImageDirectorySource
    cfg = argv[0]
    weights = argv[1] if len(argv) > 1 and not argv[1].startswith("-") \
        else None
    pattern = find_value(argv, "-frames", "frames/*.ppm")
    vr = VideoRNN(cfg, weights)
    import numpy as np
    src = ImageDirectorySource(pattern)
    frames = []
    for f in src:
        frames.append(f.color.astype(np.float32) / 255.0)
    feats = vr.features(np.stack(frames))
    print(f"extracted features: {feats.shape}")
    return feats


def cmd_dice(argv):
    """run_dice (dice.c:104-118): [train/test/valid] cfg [weights]
    [image]. A bare cfg (no subcommand) keeps the test behavior."""
    sub = argv[0]
    if sub in ("train", "valid", "test"):
        argv = argv[1:]
    else:
        sub = "test"
    cfg = argv[0]
    weights = argv[1] if len(argv) > 1 and not argv[1].startswith("-") \
        else None
    if sub == "train":
        from .misc_train import train_dice
        return train_dice(cfg, weights, argv[2:] if weights else argv[1:])
    if sub == "valid":
        from .misc_train import validate_dice
        return validate_dice(cfg, weights,
                             argv[2:] if weights else argv[1:])
    from .misc_apps import dice
    return dice(cfg, weights, argv[2])


def cmd_voxel(argv):
    if argv and argv[0] == "train":
        # train_voxel (voxel.c:51) == train_super over SUPER_DATA
        from .misc_train import train_voxel
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return train_voxel(argv[1], w, argv[3:] if w else argv[2:])
    if argv and argv[0] == "extract":
        # extract_voxel (voxel.c:15): <left> <right> <prefix>
        from .misc_apps import extract_voxel
        return extract_voxel(argv[1], argv[2], argv[3], argv[4:])
    if argv and argv[0] == "test":
        argv = argv[1:]
    from .misc_apps import voxel
    out = find_value(argv, "-out", ".")
    return voxel(argv[0], argv[1], argv[2], out_dir=out)


def _cmd_yolo_v1(argv, *, coco: bool):
    """run_yolo (yolo.c:341-361) / run_coco (coco.c:368-389) /
    run_swag (swag.c:90): v1 train/test/valid/recall/demo."""
    sub = argv.pop(0)
    from .misc_apps import run_yolo_v1
    if sub == "train":
        data_cfg, cfg = argv[0], argv[1]
        weights = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return run_yolo_v1(data_cfg, cfg, weights, argv[3:],
                           classes=80 if coco else 20)
    from . import yolo_v1_app as V1
    names = None
    if coco:
        from ..config import read_names
        nf = find_value(argv, "-names", None)
        names = read_names(nf) if nf else [str(i) for i in range(80)]
    cfg = argv.pop(0)
    if sub == "test":
        # two positionals after cfg = (weights, image); one = image
        pos = [a for a in argv[:2] if not a.startswith("-")]
        weights = argv.pop(0) if len(pos) == 2 else None
        return V1.test_yolo_v1(cfg, weights, argv.pop(0), argv,
                               names=names)
    weights = argv.pop(0) if argv and not argv[0].startswith("-") \
        else None
    if sub == "valid":
        return V1.validate_yolo_v1(cfg, weights, argv, names=names,
                                   coco=coco)
    if sub == "recall":
        return V1.validate_yolo_v1_recall(cfg, weights, argv)
    if sub == "demo":
        return V1.demo_yolo_v1(cfg, weights, argv, names=names)
    raise SystemExit(f"yolo/coco: unknown subcommand {sub}")


def cmd_yolo(argv):
    return _cmd_yolo_v1(argv, coco=False)


def cmd_coco(argv):
    return _cmd_yolo_v1(argv, coco=True)


def cmd_robot(argv):
    from .robot_app import run_robot
    return run_robot(argv)


def cmd_nightmare(argv):
    from .nightmare_app import run_nightmare
    return run_nightmare(argv)


def cmd_cifar(argv):
    from .cifar_app import run_cifar
    return run_cifar(argv)


def cmd_super(argv):
    if argv and argv[0] == "train":
        # train_super (super.c:10): SUPER_DATA random-crop pairs
        from .misc_train import train_super
        w = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
            else None
        return train_super(argv[1], w, argv[3:] if w else argv[2:])
    if argv and argv[0] == "test":
        argv = argv[1:]
    from .super_app import run_super
    return run_super(argv)


def cmd_go(argv):
    from .go_app import run_go
    return run_go(argv)


COMMANDS = {
    "detect": cmd_detect,
    "classify": cmd_classify,
    "detector": cmd_detector,
    "classifier": cmd_classifier,
    "rnn": cmd_rnn,
    "nightmare": cmd_nightmare,
    "cifar": cmd_cifar,
    "super": cmd_super,
    "go": cmd_go,
    "robot": cmd_robot,
    "dice": cmd_dice,
    "voxel": cmd_voxel,
    "yolo": cmd_yolo,
    "coco": cmd_coco,
    "swag": cmd_yolo,
    "art": cmd_art,
    "captcha": cmd_captcha,
    "tag": cmd_tag,
    "compare": cmd_compare,
    "writing": cmd_writing,
    "speed": cmd_speed,
    "gemm": cmd_gemm,
    "ops": cmd_ops,
    "partial": cmd_partial,
    "average": cmd_average,
    "rescale": _surgery_cmd("rescale_net"),
    "reset": _surgery_cmd("reset_normalize_net"),
    "oneoff": cmd_oneoff,
    "3d": cmd_3d,
    "imtest": cmd_imtest,
    "test": cmd_imtest,
    "vid": cmd_vid,
    "rgbgr": _surgery_cmd("rgbgr_net"),
    "denormalize": _surgery_cmd("denormalize_net"),
    "normalize": _surgery_cmd("normalize_net"),
    "statistics": cmd_statistics,
    "visualize": cmd_visualize,
}


def _enable_compile_cache():
    """Persistent XLA compile cache: first jit of a big cfg costs tens
    of seconds to minutes; cached reruns start in ~1s. Same cache dir
    bench.py uses."""
    import os
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in COMMANDS:
        print("usage: sr-detect <command> ...", file=sys.stderr)
        print("commands:", ", ".join(sorted(COMMANDS)), file=sys.stderr)
        return 2
    _enable_compile_cache()
    cmd = argv.pop(0)
    COMMANDS[cmd](argv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
