// Native runtime components for dabmod_tpu.
//
// The TPU executes the signal chain; this library provides the host-side
// hot paths around it, mirroring the roles the reference implements in
// C/C++: ETI(NI) header parsing and payload deframing (src/EtiReader.cpp),
// CRC16-CCITT (lib/crc.c), Reed-Solomon RS(255,207) for EDI PFT
// (lib/fec/decode_rs.h), and saturating sample-format conversion with clip
// counting (src/FormatConverter.cpp).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// All functions are GIL-free bulk operations over caller-provided buffers.

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------------------
// CRC16-CCITT, poly 0x1021, init 0xffff, final xor 0xffff (lib/crc.c)
// ---------------------------------------------------------------------------

static uint16_t crc_tab[256];
static bool crc_init_done = false;

static void crc_init() {
    for (int b = 0; b < 256; b++) {
        uint16_t crc = (uint16_t)(b << 8);
        for (int i = 0; i < 8; i++) {
            crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x1021)
                                 : (uint16_t)(crc << 1);
        }
        crc_tab[b] = crc;
    }
    crc_init_done = true;
}

uint16_t dab_crc16(const uint8_t* data, size_t len) {
    if (!crc_init_done) crc_init();
    uint16_t crc = 0xffff;
    for (size_t i = 0; i < len; i++) {
        crc = (uint16_t)((crc << 8) ^ crc_tab[((crc >> 8) ^ data[i]) & 0xff]);
    }
    return crc ^ 0xffff;
}

// ---------------------------------------------------------------------------
// ETI(NI) batch parser
// ---------------------------------------------------------------------------

// Parses T raw 6144-byte frames. Returns 0 on success, negative error:
//  -1 bad FICF, -2 layout mismatch vs frame 0, -3 inconsistent NST.
// Outputs: fct/fp [T], mnsc [T] (LE read), tist_pps [T],
//          fic [T * fic_len], subch_data: concatenation per frame of all
//          sub-channel payloads in STC order (layout described by the
//          stc_out array: 4 u16 per stream = scid, sad, stl, tpl).
int dab_parse_eti_batch(
        const uint8_t* raw, size_t T,
        uint8_t* fct, uint8_t* fp, uint16_t* mnsc, uint32_t* tist_pps,
        uint8_t* fic_out, size_t fic_len,
        uint8_t* subch_out, size_t subch_stride,
        uint16_t* stc_out, int* nst_out) {
    const size_t F = 6144;
    int nst = -1;
    uint8_t stc_ref[64 * 4];

    for (size_t t = 0; t < T; t++) {
        const uint8_t* fr = raw + t * F;
        uint8_t nst_t = fr[5] & 0x7f;
        uint8_t ficf = fr[5] >> 7;
        if (!ficf) return -1;
        if (nst < 0) {
            nst = nst_t;
            memcpy(stc_ref, fr + 8, 4 * nst);
            for (int i = 0; i < nst; i++) {
                const uint8_t* s = fr + 8 + 4 * i;
                uint16_t sad = (uint16_t)(((s[0] & 0x3) << 8) | s[1]);
                uint16_t scid = (uint16_t)(s[0] >> 2);
                uint16_t stl = (uint16_t)(((s[2] & 0x3) << 8) | s[3]);
                uint16_t tpl = (uint16_t)(s[2] >> 2);
                stc_out[4 * i + 0] = scid;
                stc_out[4 * i + 1] = sad;
                stc_out[4 * i + 2] = stl;
                stc_out[4 * i + 3] = tpl;
            }
            *nst_out = nst;
        } else {
            if (nst_t != nst) return -3;
            if (memcmp(stc_ref, fr + 8, 4 * nst) != 0) return -2;
        }

        fct[t] = fr[4];
        fp[t] = fr[6] >> 5;
        size_t off = 8 + 4 * (size_t)nst;
        mnsc[t] = (uint16_t)(fr[off] | (fr[off + 1] << 8));
        off += 4;
        memcpy(fic_out + t * fic_len, fr + off, fic_len);
        off += fic_len;
        size_t sub_total = 0;
        for (int i = 0; i < nst; i++) {
            sub_total += 8u * stc_out[4 * i + 2];
        }
        memcpy(subch_out + t * subch_stride, fr + off, sub_total);
        off += sub_total;
        off += 4;  // EOF
        uint32_t pps = ((uint32_t)fr[off + 1] << 16)
                     | ((uint32_t)fr[off + 2] << 8) | fr[off + 3];
        tist_pps[t] = (pps == 0xFFFFFF) ? 0 : pps;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Reed-Solomon RS(255,207), GF(2^8) poly 0x11d, fcr=1, prim=1
// (KA9Q-equivalent errors-and-erasures decoder, lib/fec/decode_rs.h)
// ---------------------------------------------------------------------------

static uint8_t gf_exp[512];
static uint8_t gf_log[256];
static uint8_t rs_genpoly[49];
static bool gf_init_done = false;

static void gf_init() {
    int x = 1;
    for (int i = 0; i < 255; i++) {
        gf_exp[i] = (uint8_t)x;
        gf_log[x] = (uint8_t)i;
        x <<= 1;
        if (x & 0x100) x ^= 0x11d;
    }
    for (int i = 255; i < 510; i++) gf_exp[i] = gf_exp[i - 255];
    (void)rs_genpoly;
    gf_init_done = true;
}

static inline uint8_t gmul(uint8_t a, uint8_t b) {
    if (!a || !b) return 0;
    return gf_exp[gf_log[a] + gf_log[b]];
}

// Evaluate received polynomial syndromes and run errors-and-erasures BM.
// data: 255 bytes in place. eras_pos: erasure positions (0-based index into
// the 255-byte block). Returns corrected count or -1.
int dab_rs_decode(uint8_t* data, const int* eras_pos, int n_eras) {
    if (!gf_init_done) gf_init();
    const int N = 255, NROOTS = 48;
    uint8_t synd[48];
    bool all_zero = true;
    for (int i = 0; i < NROOTS; i++) {
        uint8_t y = 0;
        uint8_t xr = gf_exp[i + 1];
        for (int j = 0; j < N; j++) {
            y = (uint8_t)(gmul(y, xr) ^ data[j]);
        }
        synd[i] = y;
        if (y) all_zero = false;
    }
    if (all_zero) return 0;
    if (n_eras > NROOTS) return -1;

    // erasure locator gamma (lowest-first)
    uint8_t gamma[49];
    memset(gamma, 0, sizeof(gamma));
    gamma[0] = 1;
    int glen = 1;
    for (int e = 0; e < n_eras; e++) {
        uint8_t xj = gf_exp[(254 - eras_pos[e]) % 255];
        for (int i = glen; i >= 1; i--) {
            gamma[i] ^= gmul(gamma[i - 1], xj);
        }
        glen++;
    }

    // modified syndromes xi = S * gamma mod x^48
    uint8_t xi[48];
    memset(xi, 0, sizeof(xi));
    for (int i = 0; i < glen; i++) {
        for (int j = 0; j + i < NROOTS; j++) {
            xi[i + j] ^= gmul(gamma[i], synd[j]);
        }
    }

    // Berlekamp-Massey for lambda
    uint8_t lam[49], bpoly[49], tpoly[49];
    memset(lam, 0, sizeof(lam)); lam[0] = 1;
    memset(bpoly, 0, sizeof(bpoly)); bpoly[0] = 1;
    int L = 0, m = 1;
    uint8_t bc = 1;
    for (int n = 0; n < NROOTS - n_eras; n++) {
        uint8_t d = xi[n + n_eras];
        for (int i = 1; i <= L; i++) {
            d ^= gmul(lam[i], xi[n + n_eras - i]);
        }
        if (d == 0) {
            m++;
        } else if (2 * L <= n) {
            memcpy(tpoly, lam, sizeof(lam));
            uint8_t coef = gmul(d, gf_exp[255 - gf_log[bc]]);
            for (int i = 0; i + m <= 48; i++) {
                lam[i + m] ^= gmul(coef, bpoly[i]);
            }
            L = n + 1 - L;
            memcpy(bpoly, tpoly, sizeof(bpoly));
            bc = d;
            m = 1;
        } else {
            uint8_t coef = gmul(d, gf_exp[255 - gf_log[bc]]);
            for (int i = 0; i + m <= 48; i++) {
                lam[i + m] ^= gmul(coef, bpoly[i]);
            }
            m++;
        }
    }

    // sigma = lambda * gamma
    uint8_t sigma[49];
    memset(sigma, 0, sizeof(sigma));
    for (int i = 0; i < 49; i++) {
        if (!lam[i]) continue;
        for (int j = 0; j < glen && i + j < 49; j++) {
            sigma[i + j] ^= gmul(lam[i], gamma[j]);
        }
    }
    int deg = 48;
    while (deg > 0 && sigma[deg] == 0) deg--;

    // Chien search
    int positions[48];
    int nfound = 0;
    for (int pos = 0; pos < N; pos++) {
        uint8_t xinv = gf_exp[(254 - pos) % 255];
        uint8_t xj_inv = xinv ? gf_exp[(255 - gf_log[xinv]) % 255] : 0;
        uint8_t val = 0, xp = 1;
        for (int c = 0; c <= deg; c++) {
            val ^= gmul(sigma[c], xp);
            xp = gmul(xp, xj_inv);
        }
        if (val == 0) {
            if (nfound >= 48) return -1;
            positions[nfound++] = pos;
        }
    }
    if (nfound != deg) return -1;

    // Forney
    uint8_t omega[48];
    memset(omega, 0, sizeof(omega));
    for (int i = 0; i <= deg; i++) {
        if (!sigma[i]) continue;
        for (int j = 0; j + i < NROOTS; j++) {
            omega[i + j] ^= gmul(sigma[i], synd[j]);
        }
    }
    for (int k = 0; k < nfound; k++) {
        int pos = positions[k];
        uint8_t xj = gf_exp[(254 - pos) % 255];
        uint8_t xj_inv = gf_exp[(255 - gf_log[xj]) % 255];
        uint8_t num = 0, xp = 1;
        for (int c = 0; c < NROOTS; c++) {
            num ^= gmul(omega[c], xp);
            xp = gmul(xp, xj_inv);
        }
        uint8_t den = 0;
        uint8_t xj2 = gmul(xj_inv, xj_inv);
        xp = 1;
        for (int c = 1; c <= deg; c += 2) {
            den ^= gmul(sigma[c], xp);
            xp = gmul(xp, xj2);
        }
        if (den == 0) return -1;
        uint8_t mag = gmul(num, gf_exp[255 - gf_log[den]]);
        data[pos] ^= mag;
    }

    // verify
    for (int i = 0; i < NROOTS; i++) {
        uint8_t y = 0;
        uint8_t xr = gf_exp[i + 1];
        for (int j = 0; j < N; j++) y = (uint8_t)(gmul(y, xr) ^ data[j]);
        if (y) return -1;
    }
    return nfound;
}

// Systematic encode: 207 data bytes -> 48 parity bytes appended by caller.
void dab_rs_encode(const uint8_t* data, uint8_t* parity) {
    if (!gf_init_done) gf_init();
    uint8_t rem[48];
    memset(rem, 0, sizeof(rem));
    // Long division by the generator computed on the fly via its roots is
    // costly; instead precompute generator coefficients once.
    static uint8_t gen[49];
    static bool gen_done = false;
    if (!gen_done) {
        memset(gen, 0, sizeof(gen));
        gen[0] = 1;
        int n = 0;
        for (int r = 1; r <= 48; r++) {
            uint8_t root = gf_exp[r];
            n++;
            for (int i = n; i >= 1; i--) {
                gen[i] = gen[i] ^ gmul(gen[i - 1], root);
            }
        }
        gen_done = true;
    }
    for (int i = 0; i < 207; i++) {
        uint8_t factor = rem[0] ^ data[i];
        memmove(rem, rem + 1, 47);
        rem[47] = 0;
        if (factor) {
            for (int j = 0; j < 48; j++) {
                if (gen[j + 1]) {
                    rem[j] ^= gmul(factor, gen[j + 1]);
                }
            }
        }
    }
    memcpy(parity, rem, 48);
}

// ---------------------------------------------------------------------------
// Saturating format conversion with clip counting
// (src/FormatConverter.cpp:62-206; C float->int truncates toward zero)
// ---------------------------------------------------------------------------

size_t dab_convert_s16(const float* in, int16_t* out, size_t n) {
    size_t clipped = 0;
    for (size_t i = 0; i < n; i++) {
        float v = in[i];
        if (v < -32768.0f) { out[i] = -32768; clipped++; }
        else if (v > 32767.0f) { out[i] = 32767; clipped++; }
        else out[i] = (int16_t)v;
    }
    return clipped;
}

size_t dab_convert_u8(const float* in, uint8_t* out, size_t n) {
    size_t clipped = 0;
    for (size_t i = 0; i < n; i++) {
        float v = in[i] + 128.0f;
        if (v < 0.0f) { out[i] = 0; clipped++; }
        else if (v > 255.0f) { out[i] = 255; clipped++; }
        else out[i] = (uint8_t)v;
    }
    return clipped;
}

size_t dab_convert_s8(const float* in, int8_t* out, size_t n) {
    size_t clipped = 0;
    for (size_t i = 0; i < n; i++) {
        float v = in[i];
        if (v < -128.0f) { out[i] = -128; clipped++; }
        else if (v > 127.0f) { out[i] = 127; clipped++; }
        else out[i] = (int8_t)v;
    }
    return clipped;
}

}  // extern "C"
