// Fast host-side codec for the 53-line v2 training-chunk format.
//
// Native counterpart of the Python parser/serializer in
// sayuri_tpu/train/dataset.py and sayuri_tpu/selfplay/data.py — the same
// role the reference's C++ TrainingData::StreamOut and the trainer's
// line parser play (/root/reference/src/neural/training_data.cc,
// train/torch/data.py). The self-play writer and the training loader are
// the only host-side throughput paths in the framework (everything else
// is jitted device code), so they get native implementations.
//
// Exposed as plain C symbols for ctypes (no pybind11 in the image).
//
// Layout contracts (must match dataset.py):
//   planes  : [cap, 37, hw] float32, binary features
//   prob    : [cap, hw+1]   float32
//   aux     : [cap, hw+1]   float32
//   own     : [cap, hw]     float32 in {-1, 0, 1}
//   scalars : [cap, 18]     float32 =
//     {bsize, komi, rule, wave, to_move, result,
//      avg_q, short_q, mid_q, long_q, final_score,
//      avg_s, short_s, mid_s, long_s, q_stddev, score_stddev, kld}

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

constexpr int kNumBinaryPlanes = 37;
constexpr int kNumScalars = 18;
constexpr int kDataLines = 53;

struct Cursor {
    const char* p;
    const char* end;

    bool eof() const { return p >= end; }

    // Return the current line (trimmed of trailing \r\n) and advance.
    bool next_line(const char** line, long* len) {
        if (eof()) return false;
        const char* nl = static_cast<const char*>(
            memchr(p, '\n', static_cast<size_t>(end - p)));
        const char* stop = nl ? nl : end;
        *line = p;
        *len = static_cast<long>(stop - p);
        while (*len > 0 && ((*line)[*len - 1] == '\r')) --(*len);
        p = nl ? nl + 1 : end;
        return true;
    }
};

double parse_float(const char*& s, const char* end) {
    while (s < end && isspace(static_cast<unsigned char>(*s))) ++s;
    char* out = nullptr;
    double v = strtod(s, &out);
    s = out;
    return v;
}

void parse_floats(const char* s, long len, float* dst, int n) {
    const char* end = s + len;
    for (int i = 0; i < n; ++i) dst[i] = static_cast<float>(parse_float(s, end));
}

int hexval(char c) {
    if (c >= '0' && c <= '9') return c - '0';
    if (c >= 'a' && c <= 'f') return c - 'a' + 10;
    if (c >= 'A' && c <= 'F') return c - 'A' + 10;
    return 0;
}

}  // namespace

extern "C" {

// Parse up to `cap` positions of board size `bsize` from `text`.
// Returns the number parsed; -1 on format error, -2 on size mismatch.
int sayuri_parse_positions(const char* text, long text_len, int bsize,
                           float* planes, float* prob, float* aux,
                           float* own, float* scalars, int cap) {
    const int hw = bsize * bsize;
    Cursor cur{text, text + text_len};
    int count = 0;
    const char* line;
    long len;

    while (count < cap) {
        // L1 version
        if (!cur.next_line(&line, &len)) break;
        if (len == 0) continue;  // tolerate blank separators
        if (!(len == 1 && line[0] == '2')) return -1;
        // L2 mode
        if (!cur.next_line(&line, &len)) return -1;
        // L3 board size
        if (!cur.next_line(&line, &len)) return -1;
        if (atoi(line) != bsize) return -2;

        float* sc = scalars + count * kNumScalars;
        sc[0] = static_cast<float>(bsize);
        // L4 komi, L5 rule, L6 wave
        for (int k = 1; k <= 3; ++k) {
            if (!cur.next_line(&line, &len)) return -1;
            const char* s = line;
            sc[k] = static_cast<float>(parse_float(s, line + len));
        }
        // L7-L43 binary planes (hex packed, low bit first)
        float* pl = planes + static_cast<long>(count) * kNumBinaryPlanes * hw;
        const int n4 = (hw / 4) * 4;
        for (int pidx = 0; pidx < kNumBinaryPlanes; ++pidx) {
            if (!cur.next_line(&line, &len)) return -1;
            float* row = pl + pidx * hw;
            memset(row, 0, sizeof(float) * hw);
            const int ndigits = n4 / 4;
            if (len < ndigits) return -1;
            for (int d = 0; d < ndigits; ++d) {
                const int v = hexval(line[d]);
                row[d * 4 + 0] = static_cast<float>(v & 1);
                row[d * 4 + 1] = static_cast<float>((v >> 1) & 1);
                row[d * 4 + 2] = static_cast<float>((v >> 2) & 1);
                row[d * 4 + 3] = static_cast<float>((v >> 3) & 1);
            }
            if (hw % 4 && len > ndigits) {
                row[hw - 1] = (line[ndigits] == '1') ? 1.f : 0.f;
            }
        }
        // L44 side to move (1 = black)
        if (!cur.next_line(&line, &len)) return -1;
        sc[4] = static_cast<float>(atoi(line));
        // L45 probabilities, L46 aux probabilities
        if (!cur.next_line(&line, &len)) return -1;
        parse_floats(line, len, prob + static_cast<long>(count) * (hw + 1), hw + 1);
        if (!cur.next_line(&line, &len)) return -1;
        parse_floats(line, len, aux + static_cast<long>(count) * (hw + 1), hw + 1);
        // L47 ownership chars
        if (!cur.next_line(&line, &len)) return -1;
        if (len < hw) return -1;
        float* ow = own + static_cast<long>(count) * hw;
        for (int i = 0; i < hw; ++i) {
            ow[i] = line[i] == '1' ? 1.f : (line[i] == '3' ? -1.f : 0.f);
        }
        // L48 result
        if (!cur.next_line(&line, &len)) return -1;
        sc[5] = static_cast<float>(atoi(line));
        // L49 avg/short/mid/long q
        if (!cur.next_line(&line, &len)) return -1;
        parse_floats(line, len, sc + 6, 4);
        // L50 final score
        if (!cur.next_line(&line, &len)) return -1;
        {
            const char* s = line;
            sc[10] = static_cast<float>(parse_float(s, line + len));
        }
        // L51 avg/short/mid/long score
        if (!cur.next_line(&line, &len)) return -1;
        parse_floats(line, len, sc + 11, 4);
        // L52 stddevs
        if (!cur.next_line(&line, &len)) return -1;
        parse_floats(line, len, sc + 15, 2);
        // L53 kld
        if (!cur.next_line(&line, &len)) return -1;
        {
            const char* s = line;
            sc[17] = static_cast<float>(parse_float(s, line + len));
        }
        ++count;
    }
    return count;
}

// Serialize `n` positions into `out` (caller-sized buffer); returns bytes
// written or -1 if the buffer is too small. Inputs follow the layout
// contract above; float formatting matches C++ iostream defaults (%.6g,
// training_data.cc:6-14).
long sayuri_serialize_positions(int n, int bsize, const float* planes,
                                const float* prob, const float* aux,
                                const float* own, const float* scalars,
                                char* out, long out_cap) {
    const int hw = bsize * bsize;
    char* w = out;
    char* end = out + out_cap;

#define EMIT(...)                                                   \
    do {                                                            \
        int _k = snprintf(w, static_cast<size_t>(end - w), __VA_ARGS__); \
        if (_k < 0 || w + _k >= end) return -1;                     \
        w += _k;                                                    \
    } while (0)

    for (int i = 0; i < n; ++i) {
        const float* sc = scalars + i * kNumScalars;
        EMIT("2\n0\n%d\n%.6g\n%.6g\n%.6g\n", bsize, sc[1], sc[2], sc[3]);
        const float* pl = planes + static_cast<long>(i) * kNumBinaryPlanes * hw;
        const int n4 = (hw / 4) * 4;
        for (int p = 0; p < kNumBinaryPlanes; ++p) {
            const float* row = pl + p * hw;
            for (int d = 0; d < n4; d += 4) {
                int v = (row[d] != 0.f) | ((row[d + 1] != 0.f) << 1) |
                        ((row[d + 2] != 0.f) << 2) | ((row[d + 3] != 0.f) << 3);
                EMIT("%x", v);
            }
            if (hw % 4) EMIT("%d", row[hw - 1] != 0.f ? 1 : 0);
            EMIT("\n");
        }
        EMIT("%d\n", static_cast<int>(sc[4]));
        const float* pr = prob + static_cast<long>(i) * (hw + 1);
        for (int k = 0; k <= hw; ++k) EMIT(k ? " %.6g" : "%.6g", pr[k]);
        EMIT("\n");
        const float* ax = aux + static_cast<long>(i) * (hw + 1);
        for (int k = 0; k <= hw; ++k) EMIT(k ? " %.6g" : "%.6g", ax[k]);
        EMIT("\n");
        const float* ow = own + static_cast<long>(i) * hw;
        for (int k = 0; k < hw; ++k) {
            EMIT("%c", ow[k] > 0.5f ? '1' : (ow[k] < -0.5f ? '3' : '0'));
        }
        EMIT("\n%d\n", static_cast<int>(sc[5]));
        EMIT("%.6g %.6g %.6g %.6g\n", sc[6], sc[7], sc[8], sc[9]);
        EMIT("%.6g\n", sc[10]);
        EMIT("%.6g %.6g %.6g %.6g\n", sc[11], sc[12], sc[13], sc[14]);
        EMIT("%.6g %.6g\n", sc[15], sc[16]);
        EMIT("%.6g\n", sc[17]);
    }
#undef EMIT
    return static_cast<long>(w - out);
}

int sayuri_codec_version() { return 1; }

}  // extern "C"
