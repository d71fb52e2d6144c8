#!/usr/bin/env python
"""VOC XML annotations -> darknet txt labels.

Re-implementation of the reference's scripts/voc_label.py (Python 2):
for each image, write labels/<id>.txt lines of
  class_id x_center y_center w h     (all relative)
and emit the train/val list files.

Usage: python tools/voc_label.py <VOCdevkit_dir> [--sets 2007:train ...]
"""

from __future__ import annotations

import argparse
import os
import xml.etree.ElementTree as ET

VOC_CLASSES = ["aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog",
               "horse", "motorbike", "person", "pottedplant", "sheep",
               "sofa", "train", "tvmonitor"]


def convert_box(size, box):
    """(xmin,xmax,ymin,ymax) pixels -> relative center box, matching
    the reference's scripts/voc_label.py convert() exactly (plain
    midpoint, no pixel offset)."""
    dw, dh = 1.0 / size[0], 1.0 / size[1]
    x = (box[0] + box[1]) / 2.0
    y = (box[2] + box[3]) / 2.0
    w = box[1] - box[0]
    h = box[3] - box[2]
    return x * dw, y * dh, w * dw, h * dh


def convert_annotation(devkit: str, year: str, image_id: str) -> bool:
    ann = os.path.join(devkit, f"VOC{year}", "Annotations",
                       f"{image_id}.xml")
    out_dir = os.path.join(devkit, f"VOC{year}", "labels")
    os.makedirs(out_dir, exist_ok=True)
    tree = ET.parse(ann)
    root = tree.getroot()
    size = root.find("size")
    w = int(size.find("width").text)
    h = int(size.find("height").text)
    lines = []
    for obj in root.iter("object"):
        difficult = obj.find("difficult")
        if difficult is not None and int(difficult.text) == 1:
            continue
        cls = obj.find("name").text
        if cls not in VOC_CLASSES:
            continue
        cid = VOC_CLASSES.index(cls)
        xml_box = obj.find("bndbox")
        b = (float(xml_box.find("xmin").text),
             float(xml_box.find("xmax").text),
             float(xml_box.find("ymin").text),
             float(xml_box.find("ymax").text))
        bb = convert_box((w, h), b)
        lines.append(f"{cid} " + " ".join(f"{v:.6f}" for v in bb))
    with open(os.path.join(out_dir, f"{image_id}.txt"), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("devkit")
    ap.add_argument("--sets", nargs="*",
                    default=["2007:train", "2007:val", "2007:test",
                             "2012:train", "2012:val"])
    args = ap.parse_args()
    for spec in args.sets:
        year, image_set = spec.split(":")
        list_file = os.path.join(
            args.devkit, f"VOC{year}", "ImageSets", "Main",
            f"{image_set}.txt")
        if not os.path.exists(list_file):
            continue
        ids = [l.strip() for l in open(list_file) if l.strip()]
        out_list = os.path.join(args.devkit, f"{year}_{image_set}.txt")
        with open(out_list, "w") as f:
            for image_id in ids:
                convert_annotation(args.devkit, year, image_id)
                f.write(os.path.join(
                    args.devkit, f"VOC{year}", "JPEGImages",
                    f"{image_id}.jpg") + "\n")
        print(f"{year} {image_set}: {len(ids)} images")


if __name__ == "__main__":
    main()
