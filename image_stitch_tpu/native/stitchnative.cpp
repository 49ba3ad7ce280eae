// stitchnative — host-side native kernels for the TPU stitching framework.
//
// TPU-native equivalent of the reference's native/WASM components (SURVEY §2):
// the Rust→WASM JPEG entropy coder (jpeg-encoder-wasm) and the byte-serial
// PNG defilter hot loop (png-filter.ts:34-100). The device (XLA/Pallas) owns
// all parallel pixel math; these are the two truly sequential byte-level
// stages that belong on the host: PNG scanline defiltering (a 2D recurrence)
// and JPEG Huffman bit packing (a serial bitstream).
//
// Build: g++ -O3 -march=native -shared -fPIC (see build.py). ctypes ABI.

#include <cstdint>
#include <cstring>
#include <cstdlib>

extern "C" {

// ---------------------------------------------------------------------------
// PNG defilter: undo None/Sub/Up/Average/Paeth over a band of rows.
// rows: h * rowbytes filtered bytes (modified in place to raw bytes).
// filter_types: h bytes. prev_row: rowbytes bytes or nullptr.
// Returns 0 on success, -1 on unknown filter type.
// ---------------------------------------------------------------------------

static inline uint8_t paeth(uint8_t a, uint8_t b, uint8_t c) {
    int p = (int)a + (int)b - (int)c;
    int pa = abs(p - (int)a);
    int pb = abs(p - (int)b);
    int pc = abs(p - (int)c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

// In-place variant: rows holds filtered bytes, becomes raw bytes.
int png_defilter_band(uint8_t* rows, const uint8_t* filter_types,
                      int64_t h, int64_t rowbytes, int bpp,
                      const uint8_t* prev_row) {
    const uint8_t* prev = prev_row;  // may be null for first band
    for (int64_t y = 0; y < h; ++y) {
        uint8_t* cur = rows + y * rowbytes;
        switch (filter_types[y]) {
            case 0:  // None
                break;
            case 1:  // Sub
                for (int64_t i = bpp; i < rowbytes; ++i)
                    cur[i] = (uint8_t)(cur[i] + cur[i - bpp]);
                break;
            case 2:  // Up
                if (prev)
                    for (int64_t i = 0; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(cur[i] + prev[i]);
                break;
            case 3:  // Average
                if (prev) {
                    for (int64_t i = 0; i < bpp; ++i)
                        cur[i] = (uint8_t)(cur[i] + (prev[i] >> 1));
                    for (int64_t i = bpp; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(cur[i] +
                                           (((int)cur[i - bpp] + (int)prev[i]) >> 1));
                } else {
                    for (int64_t i = bpp; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(cur[i] + (cur[i - bpp] >> 1));
                }
                break;
            case 4:  // Paeth
                if (prev) {
                    for (int64_t i = 0; i < bpp; ++i)
                        cur[i] = (uint8_t)(cur[i] + prev[i]);  // left=c=0 -> up
                    for (int64_t i = bpp; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(cur[i] + paeth(cur[i - bpp], prev[i],
                                                          prev[i - bpp]));
                } else {
                    for (int64_t i = bpp; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(cur[i] + cur[i - bpp]);  // paeth->left
                }
                break;
            default:
                return -1;
        }
        prev = cur;
    }
    return 0;
}

// Strided-input variant: reads filter byte + filtered bytes directly from
// the decoder's (1+rowbytes)-stride scanline units (no contiguous copy),
// writes raw bytes into a separate contiguous output.
int png_defilter_units(const uint8_t* units, int64_t unit_stride,
                       int64_t h, int64_t rowbytes, int bpp,
                       const uint8_t* prev_row, uint8_t* out) {
    const uint8_t* prev = prev_row;
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* src = units + y * unit_stride;
        uint8_t ft = src[0];
        const uint8_t* in = src + 1;
        uint8_t* cur = out + y * rowbytes;
        switch (ft) {
            case 0:
                memcpy(cur, in, (size_t)rowbytes);
                break;
            case 1:
                for (int64_t i = 0; i < bpp && i < rowbytes; ++i) cur[i] = in[i];
                for (int64_t i = bpp; i < rowbytes; ++i)
                    cur[i] = (uint8_t)(in[i] + cur[i - bpp]);
                break;
            case 2:
                if (prev)
                    for (int64_t i = 0; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(in[i] + prev[i]);
                else
                    memcpy(cur, in, (size_t)rowbytes);
                break;
            case 3:
                if (prev) {
                    for (int64_t i = 0; i < bpp && i < rowbytes; ++i)
                        cur[i] = (uint8_t)(in[i] + (prev[i] >> 1));
                    for (int64_t i = bpp; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(in[i] +
                                           (((int)cur[i - bpp] + (int)prev[i]) >> 1));
                } else {
                    for (int64_t i = 0; i < bpp && i < rowbytes; ++i) cur[i] = in[i];
                    for (int64_t i = bpp; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(in[i] + (cur[i - bpp] >> 1));
                }
                break;
            case 4:
                if (prev) {
                    for (int64_t i = 0; i < bpp && i < rowbytes; ++i)
                        cur[i] = (uint8_t)(in[i] + prev[i]);
                    for (int64_t i = bpp; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(in[i] + paeth(cur[i - bpp], prev[i],
                                                         prev[i - bpp]));
                } else {
                    for (int64_t i = 0; i < bpp && i < rowbytes; ++i) cur[i] = in[i];
                    for (int64_t i = bpp; i < rowbytes; ++i)
                        cur[i] = (uint8_t)(in[i] + cur[i - bpp]);
                }
                break;
            default:
                return -1;
        }
        prev = cur;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// JPEG Huffman entropy coding of interleaved 4:4:4 MCUs.
//
// Inputs: three (n_blocks, 64) int32 arrays of quantized coefficients in
// natural (row-major) order, standard code tables, DC predictors and the
// bit-reservoir carry. Output: stuffed entropy bytes.
//
// State (prev_dc[3], bit buffer) lives in the caller so strips stream.
// Returns number of bytes written to out (capacity must be generous:
// worst case ~ n_blocks * 3 * 256 bytes).
// ---------------------------------------------------------------------------

typedef struct {
    uint32_t dc_code[16];
    uint8_t dc_len[16];
    uint32_t ac_code[256];
    uint8_t ac_len[256];
} HuffTable;

typedef struct {
    uint64_t bits;     // bit reservoir, MSB-aligned within count
    int count;         // number of valid bits in reservoir
    int32_t prev_dc[3];
} EntropyState;

static const int kZigzag[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

static inline int bit_size(int v) {
    unsigned uv = (unsigned)(v < 0 ? -v : v);
    return uv ? 32 - __builtin_clz(uv) : 0;
}

// Emit whole bytes from the bit buffer one at a time (stuffing-aware).
static inline void drain_bytes(EntropyState* st, uint8_t** outp) {
    while (st->count >= 8) {
        uint8_t byte = (uint8_t)(st->bits >> (st->count - 8));
        st->count -= 8;
        *(*outp)++ = byte;
        if (byte == 0xFF) *(*outp)++ = 0x00;  // stuffing
    }
}

static inline void put_bits(EntropyState* st, uint8_t** outp, uint32_t code,
                            int len) {
    // Deferred flushing: keep up to 57 bits buffered; when >= 32 are
    // pending, emit 4 bytes at once. 0xFF bytes (needing 0x00 stuffing) are
    // detected with a SWAR zero-byte test on the complemented word — the
    // fast path is a plain big-endian store (0xFF bytes are ~1/256 of
    // entropy output).
    if (st->count >= 32) {
        uint32_t chunk = (uint32_t)(st->bits >> (st->count - 32));
        uint32_t t = ~chunk;
        if ((t - 0x01010101u) & ~t & 0x80808080u) {
            drain_bytes(st, outp);  // an 0xFF byte somewhere: stuff per byte
        } else {
            (*outp)[0] = (uint8_t)(chunk >> 24);
            (*outp)[1] = (uint8_t)(chunk >> 16);
            (*outp)[2] = (uint8_t)(chunk >> 8);
            (*outp)[3] = (uint8_t)chunk;
            *outp += 4;
            st->count -= 32;
            st->bits &= (st->count ? ((1ull << st->count) - 1ull) : 0ull);
        }
    }
    st->bits = (st->bits << len) | (uint64_t)(code & ((1u << len) - 1u));
    st->count += len;
}

#ifdef __AVX2__
#include <immintrin.h>
// Bitmask of nonzero int16 lanes in zz[0..63] (bit k set iff zz[k] != 0).
static inline uint64_t nonzero_mask64(const int16_t* zz) {
    const __m256i zero = _mm256_setzero_si256();
    uint64_t m = 0;
    for (int g = 0; g < 4; ++g) {
        __m256i a = _mm256_loadu_si256((const __m256i*)(zz + g * 16));
        __m256i eq = _mm256_cmpeq_epi16(a, zero);
        // Two bytes per lane; take one bit per int16 via pack+movemask.
        __m256i packed = _mm256_packs_epi16(eq, zero);  // lanes interleave
        packed = _mm256_permute4x64_epi64(packed, 0xD8);
        uint32_t z16 = (uint32_t)_mm256_movemask_epi8(packed) & 0xFFFFu;
        m |= ((uint64_t)(~z16 & 0xFFFFu)) << (g * 16);
    }
    return m;
}
#else
static inline uint64_t nonzero_mask64(const int16_t* zz) {
    uint64_t m = 0;
    for (int k = 0; k < 64; ++k) m |= (uint64_t)(zz[k] != 0) << k;
    return m;
}
#endif

static void encode_block(EntropyState* st, uint8_t** outp, const int16_t* blk,
                         const HuffTable* t, int comp) {
    // Zigzag gather into a dense local block, then iterate only the set
    // bits of a nonzero bitmask (ctz walk) — skips zero runs entirely
    // instead of branching per coefficient.
    int16_t zz[64];
    for (int k = 0; k < 64; ++k) zz[k] = blk[kZigzag[k]];

    int32_t dc = zz[0];
    int32_t diff = dc - st->prev_dc[comp];
    st->prev_dc[comp] = dc;
    int s = bit_size(diff);
    put_bits(st, outp, t->dc_code[s], t->dc_len[s]);
    if (s) {
        int32_t v = diff < 0 ? diff + (1 << s) - 1 : diff;
        put_bits(st, outp, (uint32_t)v, s);
    }

    uint64_t m = nonzero_mask64(zz) & ~1ull;  // AC positions 1..63
    int prev = 0;
    int last_nz = 0;
    while (m) {
        int k = __builtin_ctzll(m);
        m &= m - 1;
        int run = k - prev - 1;
        while (run > 15) {
            put_bits(st, outp, t->ac_code[0xF0], t->ac_len[0xF0]);
            run -= 16;
        }
        int32_t v = zz[k];
        int size = bit_size(v);
        int sym = (run << 4) | size;
        put_bits(st, outp, t->ac_code[sym], t->ac_len[sym]);
        int32_t vb = v < 0 ? v + (1 << size) - 1 : v;
        put_bits(st, outp, (uint32_t)vb, size);
        prev = k;
        last_nz = k;
    }
    if (last_nz != 63) put_bits(st, outp, t->ac_code[0x00], t->ac_len[0x00]);
}

// Structural worst case per encoded block: DC (16-bit code + 17 magnitude
// bits) + 63 AC x (16-bit code + 16 magnitude bits) = 2049 bits ~ 257 bytes,
// doubled by 0xFF stuffing = 514 bytes (+ <8 carried bytes). The per-MCU
// headroom check below uses this bound so put_bits stays branch-light.
static const int64_t kMaxBlockBytes = 528;

int64_t jpeg_entropy_encode_444(const int16_t* y_blocks,
                                const int16_t* cb_blocks,
                                const int16_t* cr_blocks, int64_t n_mcus,
                                const HuffTable* luma, const HuffTable* chroma,
                                EntropyState* state, uint8_t* out,
                                int64_t capacity) {
    uint8_t* p = out;
    const uint8_t* end = out + capacity;
    for (int64_t m = 0; m < n_mcus; ++m) {
        if (end - p < 3 * kMaxBlockBytes) return -1;  // capacity exhausted
        encode_block(state, &p, y_blocks + m * 64, luma, 0);
        encode_block(state, &p, cb_blocks + m * 64, chroma, 1);
        encode_block(state, &p, cr_blocks + m * 64, chroma, 2);
    }
    return (int64_t)(p - out);
}

// 4:2:0 MCU: 4 Y blocks + 1 Cb + 1 Cr.
int64_t jpeg_entropy_encode_420(const int16_t* y_blocks,
                                const int16_t* cb_blocks,
                                const int16_t* cr_blocks, int64_t n_mcus,
                                const HuffTable* luma, const HuffTable* chroma,
                                EntropyState* state, uint8_t* out,
                                int64_t capacity) {
    uint8_t* p = out;
    const uint8_t* end = out + capacity;
    for (int64_t m = 0; m < n_mcus; ++m) {
        if (end - p < 6 * kMaxBlockBytes) return -1;  // capacity exhausted
        for (int i = 0; i < 4; ++i)
            encode_block(state, &p, y_blocks + (m * 4 + i) * 64, luma, 0);
        encode_block(state, &p, cb_blocks + m * 64, chroma, 1);
        encode_block(state, &p, cr_blocks + m * 64, chroma, 2);
    }
    return (int64_t)(p - out);
}

// ---------------------------------------------------------------------------
// Porter-Duff "over" alpha compositing (straight alpha), float64 math
// matching the reference JS expression order exactly (pixel-ops.ts:646-744):
// copy when srcAlpha >= 0.9999, skip when <= 0.0001, Math.round == floor+0.5.
// Identical results to the numpy float64 oracle (ops/pixel.composite_band).
// ---------------------------------------------------------------------------

// fp-contract off: FMA fusion would change the float64 results vs the
// numpy oracle (and the reference's JS), which computes mul/add separately.
__attribute__((optimize("fp-contract=off")))
void composite_rgba8(uint8_t* dest, const uint8_t* src, int64_t n_pixels) {
    for (int64_t i = 0; i < n_pixels; ++i) {
        const uint8_t* s = src + i * 4;
        uint8_t* d = dest + i * 4;
        double sa = (double)s[3] / 255.0;
        if (sa >= 0.9999) {
            d[0] = s[0]; d[1] = s[1]; d[2] = s[2]; d[3] = s[3];
        } else if (sa > 0.0001) {
            double da = (double)d[3] / 255.0;
            double oa = sa + da * (1.0 - sa);
            if (oa > 0.0001) {
                for (int c = 0; c < 3; ++c) {
                    double blended =
                        ((double)s[c] * sa + (double)d[c] * da * (1.0 - sa)) / oa;
                    if (blended > 255.0) blended = 255.0;
                    if (blended < 0.0) blended = 0.0;
                    d[c] = (uint8_t)((int)(blended + 0.5));
                }
                d[3] = (uint8_t)((int)(oa * 255.0 + 0.5));
            }
        }
    }
}

__attribute__((optimize("fp-contract=off")))
void composite_rgba16(uint16_t* dest, const uint16_t* src, int64_t n_pixels) {
    for (int64_t i = 0; i < n_pixels; ++i) {
        const uint16_t* s = src + i * 4;
        uint16_t* d = dest + i * 4;
        double sa = (double)s[3] / 65535.0;
        if (sa >= 0.9999) {
            d[0] = s[0]; d[1] = s[1]; d[2] = s[2]; d[3] = s[3];
        } else if (sa > 0.0001) {
            double da = (double)d[3] / 65535.0;
            double oa = sa + da * (1.0 - sa);
            if (oa > 0.0001) {
                for (int c = 0; c < 3; ++c) {
                    double blended =
                        ((double)s[c] * sa + (double)d[c] * da * (1.0 - sa)) / oa;
                    if (blended > 65535.0) blended = 65535.0;
                    if (blended < 0.0) blended = 0.0;
                    d[c] = (uint16_t)((int)(blended + 0.5));
                }
                d[3] = (uint16_t)((int)(oa * 65535.0 + 0.5));
            }
        }
    }
}

// ---------------------------------------------------------------------------
// PNG filter selection over a band (encode side).
//
// For every row: compute all 5 filter candidates, score by sum of
// |signed byte|, pick the first minimum (None,Sub,Up,Average,Paeth order —
// the reference's strict-< rule, png-filter.ts:154-180), write the chosen
// filtered bytes. prev rows come from the band itself (raw input), so rows
// are independent; this is the host tier of the device program
// (ops/device.filter_select_trace).
// ---------------------------------------------------------------------------

static inline int absi8(uint8_t v) {
    int s = (int)(int8_t)v;
    return s < 0 ? -s : s;
}

void png_filter_select_band(const uint8_t* rows, const uint8_t* prev_row,
                            int64_t h, int64_t n, int bpp,
                            uint8_t* out_types, uint8_t* out_rows) {
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* cur = rows + y * n;
        const uint8_t* up = y > 0 ? rows + (y - 1) * n : prev_row;  // may be null
        long sums[5] = {0, 0, 0, 0, 0};
        for (int64_t i = 0; i < n; ++i) {
            uint8_t x = cur[i];
            uint8_t a = i >= bpp ? cur[i - bpp] : 0;           // left
            uint8_t b = up ? up[i] : 0;                        // up
            uint8_t c = (up && i >= bpp) ? up[i - bpp] : 0;    // up-left
            sums[0] += absi8(x);
            sums[1] += absi8((uint8_t)(x - a));
            sums[2] += absi8((uint8_t)(x - b));
            sums[3] += absi8((uint8_t)(x - (uint8_t)(((int)a + (int)b) >> 1)));
            sums[4] += absi8((uint8_t)(x - paeth(a, b, c)));
        }
        int best = 0;
        for (int f = 1; f < 5; ++f)
            if (sums[f] < sums[best]) best = f;
        out_types[y] = (uint8_t)best;
        uint8_t* o = out_rows + y * n;
        switch (best) {
            case 0:
                memcpy(o, cur, (size_t)n);
                break;
            case 1:
                for (int64_t i = 0; i < n; ++i)
                    o[i] = (uint8_t)(cur[i] - (i >= bpp ? cur[i - bpp] : 0));
                break;
            case 2:
                for (int64_t i = 0; i < n; ++i)
                    o[i] = (uint8_t)(cur[i] - (up ? up[i] : 0));
                break;
            case 3:
                for (int64_t i = 0; i < n; ++i) {
                    uint8_t a = i >= bpp ? cur[i - bpp] : 0;
                    uint8_t b = up ? up[i] : 0;
                    o[i] = (uint8_t)(cur[i] - (uint8_t)(((int)a + (int)b) >> 1));
                }
                break;
            case 4:
                for (int64_t i = 0; i < n; ++i) {
                    uint8_t a = i >= bpp ? cur[i - bpp] : 0;
                    uint8_t b = up ? up[i] : 0;
                    uint8_t c = (up && i >= bpp) ? up[i - bpp] : 0;
                    o[i] = (uint8_t)(cur[i] - paeth(a, b, c));
                }
                break;
        }
    }
}

// ---------------------------------------------------------------------------
// Fused RGBA -> YCbCr -> 8x8 DCT -> quantize over a band (4:4:4).
//
// Host fast tier of the encoder's device program (ops/device.py
// _jpeg_quantize_jit): same math, scalar/SIMD C++. Input (h, w, 4) uint8
// with h % 8 == 0 and w % 8 == 0; outputs (h/8 * w/8, 64) int16 blocks per
// component in strip-major order.
// ---------------------------------------------------------------------------

static void dct8_rows(float* b) {
    // 1-D DCT-II (orthonormal) applied to 8 rows of 8 via matrix C:
    // out = C * in  where C[u][x] = c(u)/2 * cos((2x+1)u*pi/16).
    static float C[8][8];
    static int init = 0;
    if (!init) {
        for (int u = 0; u < 8; ++u)
            for (int x = 0; x < 8; ++x) {
                double s = u == 0 ? 0.3535533905932738 : 0.5;
                C[u][x] = (float)(s * __builtin_cos((2 * x + 1) * u * 3.14159265358979323846 / 16.0));
            }
        init = 1;
    }
    float tmp[64];
    // rows: tmp = in * C^T  (apply along x)
    for (int y = 0; y < 8; ++y)
        for (int u = 0; u < 8; ++u) {
            float acc = 0.f;
            for (int x = 0; x < 8; ++x) acc += b[y * 8 + x] * C[u][x];
            tmp[y * 8 + u] = acc;
        }
    // cols: out = C * tmp (apply along y)
    for (int u = 0; u < 8; ++u)
        for (int x = 0; x < 8; ++x) {
            float acc = 0.f;
            for (int y = 0; y < 8; ++y) acc += C[u][y] * tmp[y * 8 + x];
            b[u * 8 + x] = acc;
        }
}

static inline int16_t quant1(float v, float inv_q) {
    float s = v * inv_q;
    return (int16_t)(s >= 0.f ? (int)(s + 0.5f) : -(int)(-s + 0.5f));
}

// Note: the C++ tier's f32 DCT may differ from the numpy/XLA tiers by +-1
// in rare round-half-tie coefficients (FMA contraction / summation order);
// each tier is deterministic and all are valid JPEG (see ops/device.py
// exactness notes). Measured: ~1e-5 of coefficients at q85.
void jpeg_quant_band_444(const uint8_t* rgba, int64_t h, int64_t w,
                         const int32_t* lq, const int32_t* cq,
                         int16_t* yout, int16_t* cbout, int16_t* crout) {
    float inv_lq[64], inv_cq[64];
    for (int i = 0; i < 64; ++i) {
        inv_lq[i] = 1.0f / (float)lq[i];
        inv_cq[i] = 1.0f / (float)cq[i];
    }
    int64_t bx = w / 8;
    // Strip-at-a-time: convert 8 interleaved RGBA rows into three planar
    // (8, w) float buffers with one contiguous sweep (auto-vectorizes),
    // then DCT+quantize each 8x8 block from the planes.
    float* planes = (float*)malloc((size_t)(3 * 8 * w) * sizeof(float));
    float* yp = planes;
    float* cbp = planes + 8 * w;
    float* crp = planes + 16 * w;
    float blkbuf[64];
    for (int64_t sy = 0; sy < h / 8; ++sy) {
        const uint8_t* src = rgba + sy * 8 * w * 4;
        int64_t n = 8 * w;
        for (int64_t i = 0; i < n; ++i) {
            float r = (float)src[i * 4 + 0];
            float g = (float)src[i * 4 + 1];
            float b = (float)src[i * 4 + 2];
            yp[i] = 0.299f * r + 0.587f * g + 0.114f * b - 128.0f;
            cbp[i] = -0.168735892f * r - 0.331264108f * g + 0.5f * b;
            crp[i] = 0.5f * r - 0.418687589f * g - 0.081312411f * b;
        }
        for (int64_t sx = 0; sx < bx; ++sx) {
            int64_t blk = sy * bx + sx;
            const struct { const float* plane; const float* invq; int16_t* out; }
                jobs[3] = {{yp, inv_lq, yout + blk * 64},
                           {cbp, inv_cq, cbout + blk * 64},
                           {crp, inv_cq, crout + blk * 64}};
            for (int j = 0; j < 3; ++j) {
                const float* p = jobs[j].plane + sx * 8;
                for (int yy = 0; yy < 8; ++yy)
                    for (int xx = 0; xx < 8; ++xx)
                        blkbuf[yy * 8 + xx] = p[yy * w + xx];
                dct8_rows(blkbuf);
                int16_t* o = jobs[j].out;
                const float* iq = jobs[j].invq;
                for (int i = 0; i < 64; ++i) o[i] = quant1(blkbuf[i], iq[i]);
            }
        }
    }
    free(planes);
}

// Flush remaining buffered bits (up to 57 with deferred flushing), final
// partial byte padded with 1s. Returns bytes written (0..16).
int64_t jpeg_entropy_flush(EntropyState* state, uint8_t* out) {
    uint8_t* p = out;
    drain_bytes(state, &p);
    if (state->count > 0) {
        int pad = 8 - (int)state->count;
        uint8_t byte =
            (uint8_t)((state->bits << pad) | ((1u << pad) - 1u));
        state->count = 0;
        state->bits = 0;
        *p++ = byte;
        if (byte == 0xFF) *p++ = 0x00;
    }
    state->bits = 0;
    return (int64_t)(p - out);
}

// ---------------------------------------------------------------------------
// Baseline JPEG Huffman scan decode (the owned decoder's hot loop).
//
// Marker parsing stays in Python (codecs/jpeg/owned_decoder.py); this walks
// the entropy-coded segment: canonical Huffman decode per T.81 F.2.2,
// 0xFF00 unstuffing, restart-marker resync, DC prediction, zigzag
// placement into natural-order int32 blocks.
// ---------------------------------------------------------------------------

typedef struct {
    int32_t min_code[17];
    int32_t max_code[17];
    int32_t val_ptr[17];
    uint8_t vals[256];
} HuffDecTable;

typedef struct {
    const uint8_t* data;
    int64_t len;
    int64_t pos;
    uint32_t val;
    int n;
} BitReader;

static int br_bit(BitReader* br) {
    if (br->n == 0) {
        uint8_t b = 0;
        if (br->pos < br->len) {
            b = br->data[br->pos];
            if (b == 0xFF) {
                uint8_t nxt =
                    br->pos + 1 < br->len ? br->data[br->pos + 1] : 0xD9;
                if (nxt == 0x00) {
                    br->pos += 2;
                } else {
                    // Marker: feed zeros, don't consume.
                    b = 0;
                }
            } else {
                br->pos += 1;
            }
        }
        br->val = b;
        br->n = 8;
    }
    br->n -= 1;
    return (br->val >> br->n) & 1;
}

static int br_bits(BitReader* br, int count) {
    int v = 0;
    for (int i = 0; i < count; ++i) v = (v << 1) | br_bit(br);
    return v;
}

static int br_sync_restart(BitReader* br) {
    br->val = 0;
    br->n = 0;
    while (br->pos + 1 < br->len) {
        if (br->data[br->pos] == 0xFF && br->data[br->pos + 1] >= 0xD0 &&
            br->data[br->pos + 1] <= 0xD7) {
            br->pos += 2;
            return 0;
        }
        br->pos += 1;
    }
    return -1;
}

static int huff_decode(BitReader* br, const HuffDecTable* t) {
    int code = br_bit(br);
    for (int length = 1; length <= 16; ++length) {
        if (t->max_code[length] >= 0 && code <= t->max_code[length] &&
            code >= t->min_code[length]) {
            return t->vals[t->val_ptr[length] + code - t->min_code[length]];
        }
        code = (code << 1) | br_bit(br);
    }
    return -1;
}

static inline int extend_val(int v, int size) {
    if (size == 0) return 0;
    return v >= (1 << (size - 1)) ? v : v - (1 << size) + 1;
}

// blocks_c: per-component output buffers, each (by*bx, 64) int32 zeroed.
// Returns 0 on success, negative error otherwise.
int jpeg_decode_scan(const uint8_t* data, int64_t data_len,
                     int n_comps, const int* comp_h, const int* comp_v,
                     const int* comp_bx,
                     const HuffDecTable* dc_tables, const HuffDecTable* ac_tables,
                     const int* dc_sel, const int* ac_sel,
                     int mcux, int mcuy, int restart_interval,
                     int32_t* blocks0, int32_t* blocks1, int32_t* blocks2) {
    int32_t* blocks_c[3] = {blocks0, blocks1, blocks2};
    int32_t preds[3] = {0, 0, 0};
    BitReader br = {data, data_len, 0, 0, 0};
    int64_t mcu_count = 0;

    for (int my = 0; my < mcuy; ++my) {
        for (int mx = 0; mx < mcux; ++mx) {
            if (restart_interval && mcu_count &&
                mcu_count % restart_interval == 0) {
                if (br_sync_restart(&br) != 0) return -2;
                preds[0] = preds[1] = preds[2] = 0;
            }
            for (int c = 0; c < n_comps; ++c) {
                const HuffDecTable* dct = dc_tables + dc_sel[c];
                const HuffDecTable* act = ac_tables + ac_sel[c];
                for (int v = 0; v < comp_v[c]; ++v) {
                    for (int h = 0; h < comp_h[c]; ++h) {
                        int bx = mx * comp_h[c] + h;
                        int by = my * comp_v[c] + v;
                        int32_t* blk =
                            blocks_c[c] + ((int64_t)by * comp_bx[c] + bx) * 64;
                        int s = huff_decode(&br, dct);
                        if (s < 0) return -3;
                        int diff = extend_val(br_bits(&br, s), s);
                        preds[c] += diff;
                        blk[0] = preds[c];
                        int k = 1;
                        while (k < 64) {
                            int rs = huff_decode(&br, act);
                            if (rs < 0) return -4;
                            int r = rs >> 4, size = rs & 0x0F;
                            if (size == 0) {
                                if (r == 15) { k += 16; continue; }
                                break;  // EOB
                            }
                            k += r;
                            if (k > 63) return -5;
                            blk[kZigzag[k]] = extend_val(br_bits(&br, size), size);
                            k += 1;
                        }
                    }
                }
            }
            ++mcu_count;
        }
    }
    return 0;
}

}  // extern "C"
