// KCF tracker: kernelized correlation filter on fHOG features.
//
// Re-design of the reference tracker (src_yolo2/kcf.cpp, kcf.h:21-82 —
// gaussian-kernel KCF with fHOG, padding 3.0, sigma 0.5, lambda 1e-4,
// interp 0.02, cell 4; complexmat.hpp FFT plumbing). This version uses
// an in-house radix-2 FFT (power-of-two feature grids by construction),
// translation tracking with a cosine window and gaussian labels.

#include "sr_robot.h"

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstring>
#include <vector>

namespace {

using cplx = std::complex<float>;

// ---------------- radix-2 FFT ----------------

void fft1d(cplx *a, int n, bool inverse) {
    // bit-reversal permutation
    for (int i = 1, j = 0; i < n; ++i) {
        int bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) std::swap(a[i], a[j]);
    }
    for (int len = 2; len <= n; len <<= 1) {
        float ang = 2.f * (float)M_PI / len * (inverse ? 1 : -1);
        cplx wl(std::cos(ang), std::sin(ang));
        for (int i = 0; i < n; i += len) {
            cplx w(1.f, 0.f);
            for (int k = 0; k < len / 2; ++k) {
                cplx u = a[i + k];
                cplx v = a[i + k + len / 2] * w;
                a[i + k] = u + v;
                a[i + k + len / 2] = u - v;
                w *= wl;
            }
        }
    }
    if (inverse) {
        for (int i = 0; i < n; ++i) a[i] /= (float)n;
    }
}

void fft2d(cplx *a, int h, int w, bool inverse) {
    std::vector<cplx> col(h);
    for (int y = 0; y < h; ++y) fft1d(a + (size_t)y * w, w, inverse);
    for (int x = 0; x < w; ++x) {
        for (int y = 0; y < h; ++y) col[y] = a[(size_t)y * w + x];
        fft1d(col.data(), h, inverse);
        for (int y = 0; y < h; ++y) a[(size_t)y * w + x] = col[y];
    }
}

// bilinear subwindow crop with edge clamp, RGB u8 -> float [0,1]
void extract_patch(const uint8_t *rgb, int w, int h, float cx, float cy,
                   float pw, float ph, int tw, int th, float *out) {
    for (int y = 0; y < th; ++y) {
        float sy = cy - ph / 2 + (y + 0.5f) * ph / th - 0.5f;
        int iy = (int)std::floor(sy);
        float dy = sy - iy;
        int y0 = std::clamp(iy, 0, h - 1), y1 = std::clamp(iy + 1, 0, h - 1);
        for (int x = 0; x < tw; ++x) {
            float sx = cx - pw / 2 + (x + 0.5f) * pw / tw - 0.5f;
            int ix = (int)std::floor(sx);
            float dx = sx - ix;
            int x0 = std::clamp(ix, 0, w - 1),
                x1 = std::clamp(ix + 1, 0, w - 1);
            for (int c = 0; c < 3; ++c) {
                float v00 = rgb[((size_t)y0 * w + x0) * 3 + c];
                float v01 = rgb[((size_t)y0 * w + x1) * 3 + c];
                float v10 = rgb[((size_t)y1 * w + x0) * 3 + c];
                float v11 = rgb[((size_t)y1 * w + x1) * 3 + c];
                float v = (1 - dy) * ((1 - dx) * v00 + dx * v01) +
                          dy * ((1 - dx) * v10 + dx * v11);
                out[((size_t)y * tw + x) * 3 + c] = v / 255.f;
            }
        }
    }
}

}  // namespace

struct srKCF {
    srKCFConfig cfg{};
    int gw = 0, gh = 0, nch = 31;           // feature grid dims
    float cx = 0, cy = 0, bw = 0, bh = 0;   // target state (pixels)
    float pw = 0, ph = 0;                   // padded window (pixels)
    float peak = 0;
    std::vector<cplx> model_xf;             // (nch, gh, gw)
    std::vector<cplx> model_alphaf;         // (gh, gw)
    std::vector<float> window;              // cosine window (gh, gw)
    std::vector<cplx> yf;                   // gaussian label fft
    std::vector<float> patch, feats;
    bool initialized = false;

    std::vector<cplx> features_fft(const uint8_t *rgb, int w, int h);
    std::vector<float> gaussian_correlation(const std::vector<cplx> &xf,
                                            const std::vector<cplx> &zf,
                                            float xx, float zz);
    float feat_energy(const std::vector<cplx> &xf) const;
    void train(const std::vector<cplx> &xf, float lr);
};

std::vector<cplx> srKCF::features_fft(const uint8_t *rgb, int w, int h) {
    int tw = gw * cfg.cell_size, th = gh * cfg.cell_size;
    patch.resize((size_t)tw * th * 3);
    extract_patch(rgb, w, h, cx, cy, pw, ph, tw, th, patch.data());
    feats.resize((size_t)gw * gh * 31);
    sr_fhog(patch.data(), tw, th, cfg.cell_size, feats.data());
    std::vector<cplx> xf((size_t)nch * gh * gw);
    for (int c = 0; c < nch; ++c) {
        cplx *plane = xf.data() + (size_t)c * gh * gw;
        for (int i = 0; i < gh * gw; ++i)
            plane[i] = cplx(feats[(size_t)i * 31 + c] * window[i], 0.f);
        fft2d(plane, gh, gw, false);
    }
    return xf;
}

float srKCF::feat_energy(const std::vector<cplx> &xf) const {
    // Parseval: sum |x|^2 = sum |X|^2 / N
    double e = 0;
    for (const auto &v : xf) e += std::norm(v);
    return (float)(e / (gh * gw));
}

std::vector<float> srKCF::gaussian_correlation(const std::vector<cplx> &xf,
                                               const std::vector<cplx> &zf,
                                               float xx, float zz) {
    // k = exp(-1/sigma^2 * max(0, (xx + zz - 2*ifft(sum_c X* Z)) / numel))
    const int hw = gh * gw;
    std::vector<cplx> sum(hw, cplx(0, 0));
    for (int c = 0; c < nch; ++c) {
        const cplx *xp = xf.data() + (size_t)c * hw;
        const cplx *zp = zf.data() + (size_t)c * hw;
        for (int i = 0; i < hw; ++i) sum[i] += std::conj(xp[i]) * zp[i];
    }
    fft2d(sum.data(), gh, gw, true);
    std::vector<float> k(hw);
    float numel = (float)hw * nch;
    float inv_s2 = 1.f / (cfg.sigma * cfg.sigma);
    for (int i = 0; i < hw; ++i) {
        float v = (xx + zz - 2.f * sum[i].real()) / numel;
        k[i] = std::exp(-inv_s2 * std::max(0.f, v));
    }
    return k;
}

void srKCF::train(const std::vector<cplx> &xf, float lr) {
    float xx = feat_energy(xf);
    auto k = gaussian_correlation(xf, xf, xx, xx);
    std::vector<cplx> kf(k.size());
    for (size_t i = 0; i < k.size(); ++i) kf[i] = cplx(k[i], 0.f);
    fft2d(kf.data(), gh, gw, false);
    const int hw = gh * gw;
    std::vector<cplx> alphaf(hw);
    for (int i = 0; i < hw; ++i)
        alphaf[i] = yf[i] / (kf[i] + cplx(cfg.lambda_, 0.f));
    if (!initialized || lr >= 1.f) {
        model_alphaf = alphaf;
        model_xf = xf;
    } else {
        for (int i = 0; i < hw; ++i)
            model_alphaf[i] = (1 - lr) * model_alphaf[i] + lr * alphaf[i];
        for (size_t i = 0; i < xf.size(); ++i)
            model_xf[i] = (1 - lr) * model_xf[i] + lr * xf[i];
    }
}

extern "C" {

srKCF *sr_kcf_create(const srKCFConfig *cfg) {
    auto *t = new srKCF();
    if (cfg) t->cfg = *cfg;
    else t->cfg = {3.0f, 0.5f, 1e-4f, 0.02f, 0.1f, 4, 64};
    return t;
}

void sr_kcf_destroy(srKCF *t) { delete t; }

void sr_kcf_init(srKCF *t, const uint8_t *rgb, int w, int h, srRect bbox) {
    t->cx = bbox.x + bbox.w / 2;
    t->cy = bbox.y + bbox.h / 2;
    t->bw = bbox.w;
    t->bh = bbox.h;
    t->pw = bbox.w * (1 + t->cfg.padding);
    t->ph = bbox.h * (1 + t->cfg.padding);
    // power-of-two feature grid
    int tpl = t->cfg.template_size;
    int cells = tpl / t->cfg.cell_size;
    int p2 = 1;
    while (p2 * 2 <= cells) p2 *= 2;
    t->gw = t->gh = p2;

    const int hw = t->gh * t->gw;
    t->window.resize(hw);
    for (int y = 0; y < t->gh; ++y)
        for (int x = 0; x < t->gw; ++x)
            t->window[(size_t)y * t->gw + x] =
                0.25f * (1 - std::cos(2 * (float)M_PI * y / (t->gh - 1))) *
                (1 - std::cos(2 * (float)M_PI * x / (t->gw - 1)));

    // gaussian labels centered at (0,0) with wrap-around
    float out_sigma = std::sqrt((float)t->gw * t->gh) *
                      t->cfg.output_sigma_factor / (1 + t->cfg.padding);
    std::vector<cplx> y(hw);
    for (int yy = 0; yy < t->gh; ++yy) {
        int dy = yy <= t->gh / 2 ? yy : yy - t->gh;
        for (int xx = 0; xx < t->gw; ++xx) {
            int dx = xx <= t->gw / 2 ? xx : xx - t->gw;
            float v = std::exp(-0.5f * (dx * dx + dy * dy) /
                               (out_sigma * out_sigma));
            y[(size_t)yy * t->gw + xx] = cplx(v, 0.f);
        }
    }
    fft2d(y.data(), t->gh, t->gw, false);
    t->yf = std::move(y);

    auto xf = t->features_fft(rgb, w, h);
    t->train(xf, 1.f);
    t->initialized = true;
}

srRect sr_kcf_track(srKCF *t, const uint8_t *rgb, int w, int h) {
    auto zf = t->features_fft(rgb, w, h);
    float zz = t->feat_energy(zf);
    float xx = t->feat_energy(t->model_xf);
    auto k = t->gaussian_correlation(t->model_xf, zf, xx, zz);
    const int hw = t->gh * t->gw;
    std::vector<cplx> kf(hw);
    for (int i = 0; i < hw; ++i) kf[i] = cplx(k[i], 0.f);
    fft2d(kf.data(), t->gh, t->gw, false);
    std::vector<cplx> resp(hw);
    for (int i = 0; i < hw; ++i) resp[i] = kf[i] * t->model_alphaf[i];
    fft2d(resp.data(), t->gh, t->gw, true);

    int best = 0;
    float best_v = -1e30f;
    for (int i = 0; i < hw; ++i) {
        float v = resp[i].real();
        if (v > best_v) { best_v = v; best = i; }
    }
    t->peak = best_v;
    int py = best / t->gw, px = best % t->gw;
    if (py > t->gh / 2) py -= t->gh;
    if (px > t->gw / 2) px -= t->gw;
    // displacement in pixels: cells -> padded-window fraction -> pixels
    t->cx += px * t->pw / t->gw;
    t->cy += py * t->ph / t->gh;
    t->cx = std::clamp(t->cx, 0.f, (float)w - 1);
    t->cy = std::clamp(t->cy, 0.f, (float)h - 1);

    auto xf = t->features_fft(rgb, w, h);
    t->train(xf, t->cfg.interp_factor);

    srRect r;
    r.x = t->cx - t->bw / 2;
    r.y = t->cy - t->bh / 2;
    r.w = t->bw;
    r.h = t->bh;
    return r;
}

float sr_kcf_peak(const srKCF *t) { return t->peak; }

// ------------------------------------------------------------------
// Greedy centroid multi-object tracking (yolo_v2_class.cpp:251-304):
// match current detections to a deque of previous frames' tracked
// detections by nearest centroid within a distance threshold.

struct srTrackStore {
    int history;
    float dist_thresh;
    int next_id = 1;
    struct Entry { float x, y; int cls; int id; int age; };
    std::vector<Entry> prev;
};

srTrackStore *sr_tracks_create(int history, float dist_thresh) {
    auto *s = new srTrackStore();
    s->history = history > 0 ? history : 6;
    s->dist_thresh = dist_thresh > 0 ? dist_thresh : 0.08f;
    return s;
}

void sr_tracks_destroy(srTrackStore *s) { delete s; }

int sr_tracks_update(srTrackStore *s, srDetection *dets, int n,
                     int frame_w, int frame_h) {
    (void)frame_w; (void)frame_h;
    std::vector<bool> used(s->prev.size(), false);
    for (int i = 0; i < n; ++i) {
        float bx = dets[i].x, by = dets[i].y;
        int best = -1;
        float best_d = s->dist_thresh;
        for (size_t j = 0; j < s->prev.size(); ++j) {
            if (used[j] || s->prev[j].cls != dets[i].class_id) continue;
            float dx = s->prev[j].x - bx, dy = s->prev[j].y - by;
            float d = std::sqrt(dx * dx + dy * dy);
            if (d < best_d) { best_d = d; best = (int)j; }
        }
        if (best >= 0) {
            used[best] = true;
            dets[i].body_id = s->prev[best].id;
        } else {
            dets[i].body_id = s->next_id++;
        }
    }
    // age and refresh memory
    std::vector<srTrackStore::Entry> next;
    for (int i = 0; i < n; ++i)
        next.push_back({dets[i].x, dets[i].y, dets[i].class_id,
                        dets[i].body_id, 0});
    for (size_t j = 0; j < s->prev.size(); ++j) {
        if (!used[j] && s->prev[j].age + 1 < s->history) {
            auto e = s->prev[j];
            e.age += 1;
            next.push_back(e);
        }
    }
    s->prev.swap(next);
    return n;
}

}  // extern "C"
