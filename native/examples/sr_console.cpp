/* Standalone C++ console detector — the yolo_console_dll.cpp analog
 * (src_yolo2/yolo_console_dll.cpp:62-227: loop over image filenames,
 * detect, print "obj_id / x,y,w,h / prob", track ids across frames).
 * No OpenCV: reads binary PPM (P6) directly; the network runs in the
 * spawned Python/JAX worker via the sr_detector pipe protocol.
 *
 * Usage: sr_console <cfg> <weights> <names.txt> <img1.ppm> [img2 ...]
 *        [-thresh T] [-python /path/to/python]
 */
#include "sr_detector.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

static bool load_ppm(const std::string &path, std::vector<float> &out,
                     int &w, int &h) {
    std::ifstream f(path, std::ios::binary);
    std::string magic;
    int maxv;
    f >> magic >> w >> h >> maxv;
    if (!f || magic != "P6") return false;
    f.get();
    std::vector<unsigned char> raw((size_t)w * h * 3);
    f.read(reinterpret_cast<char *>(raw.data()), raw.size());
    if (!f) return false;
    out.resize(raw.size());
    for (size_t i = 0; i < raw.size(); ++i) out[i] = raw[i] / 255.0f;
    return true;
}

int main(int argc, char **argv) {
    if (argc < 5) {
        std::cerr << "usage: sr_console cfg weights names img.ppm... "
                     "[-thresh T] [-python exe]\n";
        return 1;
    }
    float thresh = 0.24f;
    std::string python = "python3";
    std::vector<std::string> images;
    std::string cfg = argv[1], weights = argv[2], names_path = argv[3];
    for (int i = 4; i < argc; ++i) {
        if (!strcmp(argv[i], "-thresh") && i + 1 < argc) {
            thresh = atof(argv[++i]);
        } else if (!strcmp(argv[i], "-python") && i + 1 < argc) {
            python = argv[++i];
        } else {
            images.push_back(argv[i]);
        }
    }

    std::vector<std::string> names;
    {
        std::ifstream nf(names_path);
        std::string line;
        while (std::getline(nf, line))
            if (!line.empty()) names.push_back(line);
    }

    const char *wargv[] = {python.c_str(), "-m",
                           "sr_object_detection_tpu.infer.serve",
                           cfg.c_str(), weights.c_str(), nullptr};
    srDetector *det = sr_detector_create_pipe(wargv);
    if (!det) {
        std::cerr << "worker start/handshake failed\n";
        return 1;
    }
    std::cout << "net " << sr_detector_net_width(det) << "x"
              << sr_detector_net_height(det) << ", "
              << sr_detector_classes(det) << " classes\n";

    std::vector<srBBox> boxes(256);
    for (auto &path : images) {
        std::vector<float> img;
        int w, h;
        if (!load_ppm(path, img, w, h)) {
            std::cerr << path << ": cannot read (P6 PPM only)\n";
            continue;
        }
        int n = sr_detector_detect(det, img.data(), w, h, 3, thresh,
                                   0.4f, boxes.data(), boxes.size());
        if (n < 0) {
            std::cerr << path << ": inference failed\n";
            break;
        }
        n = sr_detector_tracking(det, boxes.data(), n, 6);
        std::cout << path << ": " << n << " objects\n";
        for (int i = 0; i < n; ++i) {
            const srBBox &b = boxes[i];
            std::string nm = b.obj_id < names.size()
                ? names[b.obj_id] : std::to_string(b.obj_id);
            /* show_console_result format (yolo_console_dll.cpp:62-70) */
            std::cout << "  obj_id = " << b.obj_id << " (" << nm
                      << "), track_id = " << b.track_id
                      << ", x = " << (int)b.x << ", y = " << (int)b.y
                      << ", w = " << (int)b.w << ", h = " << (int)b.h
                      << ", prob = " << b.prob << "\n";
        }
    }
    sr_detector_destroy(det);
    return 0;
}
