// btia_ingest — native host-side ingest for the streaming path [B:11].
//
// The single-core host is the streaming bottleneck risk [SURVEY §7.3]; this
// library does the per-image host work (DICOM parse → rescale/window →
// uint8 → bilinear resize → RGB) in C++ with no Python object churn, and
// releases the GIL for real decode/compute overlap (the ctypes FFI drops
// the GIL for the duration of the call).
//
// Scope mirrors btia_tpu/data/dicom.py exactly (the Python implementation
// remains the portable fallback and the behavioural reference):
//   * Part-10 (preamble+DICM) and raw datasets
//   * explicit & implicit VR little endian; group 0002 always explicit
//   * uncompressed PixelData: 8/16-bit, signed/unsigned, MONO1/2 + RGB
//   * rescale slope/intercept, window center/width, MONOCHROME1 inversion
// Compressed transfer syntaxes return an error (Python/PIL path handles
// JPEG).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t pos = 0;
  bool ok = true;

  uint16_t u16() {
    if (pos + 2 > n) { ok = false; return 0; }
    uint16_t v = static_cast<uint16_t>(p[pos]) |
                 (static_cast<uint16_t>(p[pos + 1]) << 8);
    pos += 2;
    return v;
  }
  uint32_t u32() {
    if (pos + 4 > n) { ok = false; return 0; }
    uint32_t v = 0;
    std::memcpy(&v, p + pos, 4);  // little-endian host assumed (x86/arm64)
    pos += 4;
    return v;
  }
};

struct Element {
  uint16_t group, elem;
  const uint8_t* value;
  uint32_t length;
};

bool is_long_vr(const uint8_t* vr) {
  static const char* kLong[] = {"OB", "OW", "OF", "SQ", "UT", "UN", "UC", "UR"};
  for (const char* v : kLong)
    if (vr[0] == v[0] && vr[1] == v[1]) return true;
  return false;
}

double first_float(const Element& e, double dflt) {
  std::string s(reinterpret_cast<const char*>(e.value),
                std::min<uint32_t>(e.length, 64));
  size_t bs = s.find('\\');
  if (bs != std::string::npos) s = s.substr(0, bs);
  try {
    return std::stod(s);
  } catch (...) {
    return dflt;
  }
}

struct Dicom {
  int rows = 0, cols = 0, bits = 8, samples = 1;
  bool is_signed = false;
  bool mono1 = false;
  bool is_rgb = false;
  double slope = 1.0, intercept = 0.0;
  double wc = NAN, ww = NAN;
  const uint8_t* pixels = nullptr;
  uint32_t pixel_len = 0;
};

// Parses elements; returns false on unsupported (encapsulated) data.
bool parse(const uint8_t* data, size_t len, Dicom* out) {
  size_t start = 0;
  if (len > 132 && std::memcmp(data + 128, "DICM", 4) == 0) start = 132;
  else if (len > 4 && std::memcmp(data, "DICM", 4) == 0) start = 4;

  // Sniff explicit VR: first element after start has printable VR bytes.
  bool explicit_vr = true;
  if (len >= start + 6) {
    uint8_t a = data[start + 4], b = data[start + 5];
    explicit_vr = (a >= 'A' && a <= 'Z') && (b >= 'A' && b <= 'Z');
  }

  std::string transfer_syntax;
  Reader r{data, len, start};
  while (r.pos + 8 <= r.n) {
    Element e;
    e.group = r.u16();
    e.elem = r.u16();
    bool exp = explicit_vr || e.group == 0x0002;
    if (exp) {
      const uint8_t* vr = r.p + r.pos;
      if (r.pos + 2 > r.n) return false;
      if (is_long_vr(vr)) {
        r.pos += 4;  // VR + 2 reserved
        e.length = r.u32();
      } else {
        r.pos += 2;
        e.length = r.u16();
      }
    } else {
      e.length = r.u32();
    }
    if (!r.ok) return false;
    if (e.length == 0xFFFFFFFFu) return false;  // encapsulated/compressed
    if (r.pos + e.length > r.n) return false;
    e.value = r.p + r.pos;
    r.pos += e.length;

    if (e.group == 0x0002 && e.elem == 0x0010) {
      transfer_syntax.assign(reinterpret_cast<const char*>(e.value), e.length);
      while (!transfer_syntax.empty() &&
             (transfer_syntax.back() == '\0' || transfer_syntax.back() == ' '))
        transfer_syntax.pop_back();
      if (transfer_syntax == "1.2.840.10008.1.2") explicit_vr = false;
      else if (transfer_syntax == "1.2.840.10008.1.2.1") explicit_vr = true;
      else return false;  // compressed transfer syntax
    } else if (e.group == 0x0028) {
      // US elements must carry ≥2 bytes; a lying header must not read OOB.
      auto us = [&](int* dst) {
        if (e.length >= 2) *dst = e.value[0] | (e.value[1] << 8);
      };
      switch (e.elem) {
        case 0x0002: us(&out->samples); break;
        case 0x0004: {
          std::string pm(reinterpret_cast<const char*>(e.value), e.length);
          out->mono1 = pm.rfind("MONOCHROME1", 0) == 0;
          out->is_rgb = pm.rfind("RGB", 0) == 0;
          break;
        }
        case 0x0010: us(&out->rows); break;
        case 0x0011: us(&out->cols); break;
        case 0x0100: us(&out->bits); break;
        case 0x0103: {
          int pr = 0;
          us(&pr);
          out->is_signed = pr == 1;
          break;
        }
        case 0x1050: out->wc = first_float(e, NAN); break;
        case 0x1051: out->ww = first_float(e, NAN); break;
        case 0x1052: out->intercept = first_float(e, 0.0); break;
        case 0x1053: out->slope = first_float(e, 1.0); break;
      }
    } else if (e.group == 0x7FE0 && e.elem == 0x0010) {
      out->pixels = e.value;
      out->pixel_len = e.length;
      break;
    }
  }
  if (out->pixels == nullptr || out->rows <= 0 || out->cols <= 0) return false;
  // Reject truncated/header-lying PixelData: fetch_px indexes up to
  // rows*cols*samples pixels, so the buffer must actually hold them
  // (matches the Python path, where np.frombuffer(count=) raises).
  if (out->bits != 8 && out->bits != 16) return false;
  if (out->samples != 1 && out->samples != 3) return false;
  uint64_t need = static_cast<uint64_t>(out->rows) * out->cols * out->samples *
                  (out->bits == 8 ? 1 : 2);
  if (static_cast<uint64_t>(out->pixel_len) < need) return false;
  return true;
}

inline float fetch_px(const Dicom& d, int idx) {
  if (d.bits == 8) {
    return d.is_signed ? static_cast<float>(reinterpret_cast<const int8_t*>(d.pixels)[idx])
                       : static_cast<float>(d.pixels[idx]);
  }
  if (d.is_signed) {
    int16_t v;
    std::memcpy(&v, d.pixels + 2 * idx, 2);
    return static_cast<float>(v);
  }
  uint16_t v;
  std::memcpy(&v, d.pixels + 2 * idx, 2);
  return static_cast<float>(v);
}

// Half-pixel bilinear sample of a single-channel float image.
struct LerpIdx {
  int i0, i1;
  float w1;
};

void build_lerp(int src, int dst, std::vector<LerpIdx>* out) {
  out->resize(dst);
  double scale = static_cast<double>(src) / dst;
  for (int i = 0; i < dst; ++i) {
    double x = (i + 0.5) * scale - 0.5;
    int x0 = static_cast<int>(std::floor(x));
    float w1 = static_cast<float>(x - x0);
    (*out)[i] = {std::clamp(x0, 0, src - 1), std::clamp(x0 + 1, 0, src - 1), w1};
  }
}

}  // namespace

extern "C" {

// Decode DICOM bytes → (out_h, out_w, 3) uint8 RGB with rescale/window and
// bilinear resize fused in one pass over the output grid.
// Returns 0 on success; negative on unsupported/parse failure.
int btia_dicom_decode(const uint8_t* data, size_t len, uint8_t* out,
                      int out_h, int out_w) {
  Dicom d;
  if (!parse(data, len, &d)) return -1;
  if (d.samples != 1 && d.samples != 3) return -2;
  const int H = d.rows, W = d.cols, C = d.samples;

  // Display mapping (grayscale): rescale then window (or min/max).
  float lo = 0.f, hi = 1.f;
  if (C == 1) {
    if (!std::isnan(d.wc) && !std::isnan(d.ww) && d.ww > 0) {
      lo = static_cast<float>(d.wc - d.ww / 2.0);
      hi = static_cast<float>(d.wc + d.ww / 2.0);
    } else {
      float mn = 1e30f, mx = -1e30f;
      for (int i = 0; i < H * W; ++i) {
        float v = fetch_px(d, i);
        mn = std::min(mn, v);
        mx = std::max(mx, v);
      }
      lo = static_cast<float>(mn * d.slope + d.intercept);
      hi = static_cast<float>(mx * d.slope + d.intercept);
    }
    if (hi <= lo) hi = lo + 1.f;
  }

  std::vector<LerpIdx> ly, lx;
  build_lerp(H, out_h, &ly);
  build_lerp(W, out_w, &lx);

  const float inv_range = 1.0f / (hi - lo);
  for (int oy = 0; oy < out_h; ++oy) {
    const LerpIdx& Y = ly[oy];
    for (int ox = 0; ox < out_w; ++ox) {
      const LerpIdx& X = lx[ox];
      for (int c = 0; c < (C == 3 ? 3 : 1); ++c) {
        auto at = [&](int yy, int xx) {
          return fetch_px(d, (yy * W + xx) * C + c);
        };
        float v00 = at(Y.i0, X.i0), v01 = at(Y.i0, X.i1);
        float v10 = at(Y.i1, X.i0), v11 = at(Y.i1, X.i1);
        float top = v00 + (v01 - v00) * X.w1;
        float bot = v10 + (v11 - v10) * X.w1;
        float v = top + (bot - top) * Y.w1;
        uint8_t u;
        if (C == 1) {
          v = v * static_cast<float>(d.slope) + static_cast<float>(d.intercept);
          float t = std::clamp((v - lo) * inv_range, 0.f, 1.f);
          if (d.mono1) t = 1.f - t;
          u = static_cast<uint8_t>(t * 255.f + 0.5f);
        } else {
          u = static_cast<uint8_t>(std::clamp(v, 0.f, 255.f));
        }
        uint8_t* dst = out + (oy * out_w + ox) * 3;
        if (C == 1) {
          dst[0] = dst[1] = dst[2] = u;
        } else {
          dst[c] = u;
        }
      }
    }
  }
  return 0;
}

// Bilinear half-pixel uint8 resize, HWC → (oh, ow, c).
int btia_resize_u8(const uint8_t* in, int h, int w, int c, uint8_t* out,
                   int oh, int ow) {
  if (h <= 0 || w <= 0 || c <= 0) return -1;
  std::vector<LerpIdx> ly, lx;
  build_lerp(h, oh, &ly);
  build_lerp(w, ow, &lx);
  for (int oy = 0; oy < oh; ++oy) {
    const LerpIdx& Y = ly[oy];
    for (int ox = 0; ox < ow; ++ox) {
      const LerpIdx& X = lx[ox];
      for (int ch = 0; ch < c; ++ch) {
        auto at = [&](int yy, int xx) {
          return static_cast<float>(in[(yy * w + xx) * c + ch]);
        };
        float top = at(Y.i0, X.i0) + (at(Y.i0, X.i1) - at(Y.i0, X.i0)) * X.w1;
        float bot = at(Y.i1, X.i0) + (at(Y.i1, X.i1) - at(Y.i1, X.i0)) * X.w1;
        float v = top + (bot - top) * Y.w1;
        out[(oy * ow + ox) * c + ch] =
            static_cast<uint8_t>(std::clamp(v + 0.5f, 0.f, 255.f));
      }
    }
  }
  return 0;
}

int btia_ingest_version() { return 1; }

}  // extern "C"
