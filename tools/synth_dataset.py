"""Deterministic synthetic VOC-style detection dataset.

Colored rectangles (one class per color) on textured backgrounds, with
darknet-format labels. Used by the mAP-parity A/B gate: the SAME byte
stream feeds the reference C oracle's validate_detector loop
(detector.c:244-369) and this framework's `detector valid`, so the only
variable is the detection stack. Images are binary PPMs — decodable by
both stb_image (reference) and ops/image.load_image_rgb (here) with no
soft deps.
"""

from __future__ import annotations

import os

import numpy as np

# class -> mean RGB of the rectangle fill
CLASS_COLORS = np.array([
    [220, 40, 40],    # 0: red-ish
    [40, 200, 60],    # 1: green-ish
    [50, 80, 230],    # 2: blue-ish
], np.float32)
N_CLASSES = len(CLASS_COLORS)


def write_ppm(path: str, img_u8: np.ndarray) -> None:
    h, w, _ = img_u8.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img_u8.astype(np.uint8).tobytes())


def make_image(rng: np.random.Generator, iw: int, ih: int,
               max_boxes: int = 3):
    """One image: noise background + 1..max_boxes colored rectangles.
    Returns (img_u8 HWC, truth (N,5) of [cx,cy,w,h,cls] relative)."""
    img = rng.uniform(60, 120, (ih, iw, 3)).astype(np.float32)
    # low-frequency texture so the background isn't trivially flat
    yy = np.linspace(0, np.pi * 2, ih)[:, None, None]
    xx = np.linspace(0, np.pi * 2, iw)[None, :, None]
    img += 25 * np.sin(yy * rng.uniform(1, 3)) * np.cos(xx * rng.uniform(1, 3))

    n = int(rng.integers(1, max_boxes + 1))
    truth = []
    for _ in range(n):
        bw = int(rng.uniform(0.2, 0.45) * iw)
        bh = int(rng.uniform(0.2, 0.45) * ih)
        x0 = int(rng.uniform(0, iw - bw))
        y0 = int(rng.uniform(0, ih - bh))
        cls = int(rng.integers(0, N_CLASSES))
        color = CLASS_COLORS[cls] + rng.uniform(-15, 15, 3)
        img[y0:y0 + bh, x0:x0 + bw] = color
        img[y0:y0 + bh, x0:x0 + bw] += rng.uniform(
            -10, 10, (bh, bw, 3)).astype(np.float32)
        truth.append([(x0 + bw / 2) / iw, (y0 + bh / 2) / ih,
                      bw / iw, bh / ih, cls])
    return np.clip(img, 0, 255).astype(np.uint8), np.asarray(truth,
                                                             np.float32)


def make_dataset(outdir: str, n_images: int = 24, seed: int = 7):
    """Write n_images PPMs + label txts + list file. Deterministic in
    (n_images, seed). Returns (list_path, gt) where gt maps image_id ->
    (truth array, (iw, ih))."""
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    sizes = [(160, 120), (140, 140), (120, 160), (200, 150)]
    gt = {}
    paths = []
    for i in range(n_images):
        iw, ih = sizes[i % len(sizes)]
        img, truth = make_image(rng, iw, ih)
        image_id = f"synth{i:04d}"
        p = os.path.join(outdir, image_id + ".ppm")
        write_ppm(p, img)
        with open(os.path.join(outdir, image_id + ".txt"), "w") as f:
            for t in truth:
                f.write(f"{int(t[4])} {t[0]:.6f} {t[1]:.6f} "
                        f"{t[2]:.6f} {t[3]:.6f}\n")
        gt[image_id] = (truth, (iw, ih))
        paths.append(p)
    list_path = os.path.join(outdir, "valid.list")
    with open(list_path, "w") as f:
        f.write("\n".join(paths) + "\n")
    return list_path, gt


def gt_corner_boxes(gt):
    """Per-class GT in eval_class format: {cls: {image_id: {'boxes':
    (N,4) pixel corners}}} using the same center->corner math as the
    det writers (no +1; pixel coords)."""
    per_class = {c: {} for c in range(N_CLASSES)}
    for image_id, (truth, (iw, ih)) in gt.items():
        for c in range(N_CLASSES):
            sel = truth[truth[:, 4] == c] if len(truth) else truth
            boxes = []
            for t in sel:
                x, y, w, h = t[0] * iw, t[1] * ih, t[2] * iw, t[3] * ih
                boxes.append([x - w / 2, y - h / 2, x + w / 2, y + h / 2])
            per_class[c][image_id] = {
                "boxes": np.asarray(boxes, np.float32).reshape(-1, 4)}
    return per_class


def dataset_digest(outdir: str) -> str:
    """SHA-256 over all PPM bytes in sorted order (drift guard)."""
    import hashlib
    h = hashlib.sha256()
    for name in sorted(os.listdir(outdir)):
        if name.endswith(".ppm"):
            with open(os.path.join(outdir, name), "rb") as f:
                h.update(f.read())
    return h.hexdigest()
