// Felzenszwalb HOG (fHOG) features, 31 channels.
//
// Re-implementation of the feature used by the reference's KCF tracker
// (src_yolo2/piotr_fhog/fhog.hpp:16-45, gradientMex.cpp — Piotr Dollar
// toolbox port): per-pixel max-channel gradients, 18 signed orientation
// bins with bilinear spatial interpolation into cells, 4-neighborhood
// L2 normalization clipped at 0.2, output = 18 signed + 9 unsigned + 4
// texture channels. Written from the published algorithm, vectorizable
// scalar C++ (the compiler auto-vectorizes the inner loops at -O2).

#include "sr_robot.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {
constexpr int kBins = 18;        // signed orientation bins
constexpr float kClip = 0.2f;
constexpr float kEps = 1e-4f;
}  // namespace

extern "C" int sr_fhog(const float *img, int w, int h, int cell,
                       float *out) {
    const int cw = w / cell, ch = h / cell;
    if (cw < 2 || ch < 2) return -1;
    const int nch = 3;

    // --- per-cell signed orientation histograms (soft spatial bins) ---
    std::vector<float> hist((size_t)cw * ch * kBins, 0.f);
    for (int y = 1; y < h - 1; ++y) {
        for (int x = 1; x < w - 1; ++x) {
            // max-magnitude gradient over color channels
            float best_mag2 = -1.f, gx = 0.f, gy = 0.f;
            for (int c = 0; c < nch; ++c) {
                const float *p = img + ((size_t)y * w + x) * nch + c;
                float dx = p[nch] - p[-nch];
                float dy = p[(size_t)w * nch] - p[-(ptrdiff_t)w * nch];
                float m2 = dx * dx + dy * dy;
                if (m2 > best_mag2) { best_mag2 = m2; gx = dx; gy = dy; }
            }
            float mag = std::sqrt(best_mag2);
            if (mag <= 0) continue;
            float ang = std::atan2(gy, gx);           // [-pi, pi]
            if (ang < 0) ang += 2.f * (float)M_PI;    // [0, 2pi)
            int bin = (int)(ang / (2.f * (float)M_PI) * kBins) % kBins;

            // bilinear interpolation into the 4 surrounding cells
            float cxf = ((float)x + 0.5f) / cell - 0.5f;
            float cyf = ((float)y + 0.5f) / cell - 0.5f;
            int cx0 = (int)std::floor(cxf), cy0 = (int)std::floor(cyf);
            float ax = cxf - cx0, ay = cyf - cy0;
            const float wgt[4] = {(1 - ax) * (1 - ay), ax * (1 - ay),
                                  (1 - ax) * ay, ax * ay};
            const int ox[4] = {cx0, cx0 + 1, cx0, cx0 + 1};
            const int oy[4] = {cy0, cy0, cy0 + 1, cy0 + 1};
            for (int k = 0; k < 4; ++k) {
                if (ox[k] < 0 || ox[k] >= cw || oy[k] < 0 || oy[k] >= ch)
                    continue;
                hist[((size_t)oy[k] * cw + ox[k]) * kBins + bin] +=
                    mag * wgt[k];
            }
        }
    }

    // --- cell energies from unsigned (9-bin) histograms ---
    std::vector<float> energy((size_t)cw * ch, 0.f);
    for (int i = 0; i < cw * ch; ++i) {
        const float *hb = hist.data() + (size_t)i * kBins;
        float e = 0;
        for (int b = 0; b < kBins / 2; ++b) {
            float v = hb[b] + hb[b + kBins / 2];
            e += v * v;
        }
        energy[i] = e;
    }

    auto block_energy = [&](int cx, int cy) {
        cx = std::clamp(cx, 0, cw - 2);
        cy = std::clamp(cy, 0, ch - 2);
        return energy[(size_t)cy * cw + cx] +
               energy[(size_t)cy * cw + cx + 1] +
               energy[(size_t)(cy + 1) * cw + cx] +
               energy[(size_t)(cy + 1) * cw + cx + 1];
    };

    // --- normalized output: 18 signed + 9 unsigned + 4 texture ---
    const int out_ch = 31;
    for (int cy = 0; cy < ch; ++cy) {
        for (int cx = 0; cx < cw; ++cx) {
            const float *hb = hist.data() + ((size_t)cy * cw + cx) * kBins;
            float *o = out + ((size_t)cy * cw + cx) * out_ch;
            float n[4] = {
                1.f / std::sqrt(block_energy(cx - 1, cy - 1) + kEps),
                1.f / std::sqrt(block_energy(cx, cy - 1) + kEps),
                1.f / std::sqrt(block_energy(cx - 1, cy) + kEps),
                1.f / std::sqrt(block_energy(cx, cy) + kEps),
            };
            float tex[4] = {0, 0, 0, 0};
            // signed features
            for (int b = 0; b < kBins; ++b) {
                float sum = 0;
                for (int k = 0; k < 4; ++k) {
                    float v = std::min(hb[b] * n[k], kClip);
                    sum += v;
                    tex[k] += v;
                }
                o[b] = 0.5f * sum;
            }
            // unsigned features
            for (int b = 0; b < kBins / 2; ++b) {
                float hu = hb[b] + hb[b + kBins / 2];
                float sum = 0;
                for (int k = 0; k < 4; ++k)
                    sum += std::min(hu * n[k], kClip);
                o[kBins + b] = 0.5f * sum;
            }
            // texture features
            for (int k = 0; k < 4; ++k)
                o[kBins + kBins / 2 + k] = 0.2357f * tex[k];
        }
    }
    return 0;
}
