// keyhunt-tpu native host runtime.
//
// The reference (naanprofit/keyhunt) is a C++ program end to end; in the
// TPU build all O(keys) work runs on-device (JAX/Pallas), and this library
// is the native counterpart for the *host* side of the runtime: the
// setup/verify paths that are O(targets) or O(lanes) but sit on the
// latency-critical dispatch path.
//
//   - secp256k1 scalar/field/EC arithmetic on 4x64 limbs
//     (role of secp256k1/Int*.cpp + SECP256K1.cpp in the reference)
//   - BSGS lane seeding: P[l] = Q - (c0 + l*stride)*G via one scalar mult,
//     a Jacobian chain and ONE Montgomery-trick batch inversion
//     (role of the per-thread seeding in thread_process_bsgs,
//     keyhunt.cpp:4635-4642)
//   - scalar SHA-256 / RIPEMD-160 / Keccak-256 and batch hash160
//     (role of hash/*.cpp, sha3/*.c — host verification + target loading)
//   - XXH64 (bloom/bloom.cpp:129-130 parity)
//   - LSB radix argsort of u64 fragments (baby-table post-processing,
//     role of bsgs_sort, keyhunt.cpp:4412-4457)
//
// Everything here is written fresh against the public algorithm
// specifications; exported symbols use a flat extern "C" ABI for ctypes.
//
// Build: make -C native   ->  native/libkeyhunt_native.so

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;
typedef uint8_t u8;

// ===========================================================================
// 256-bit integers: little-endian 4x64 limbs.
// ===========================================================================

struct U256 {
    u64 v[4];
};

static inline U256 u256_zero() { return U256{{0, 0, 0, 0}}; }

static inline bool u256_is_zero(const U256 &a) {
    return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool u256_eq(const U256 &a, const U256 &b) {
    return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
           a.v[3] == b.v[3];
}

static inline int u256_cmp(const U256 &a, const U256 &b) {
    for (int i = 3; i >= 0; --i) {
        if (a.v[i] < b.v[i]) return -1;
        if (a.v[i] > b.v[i]) return 1;
    }
    return 0;
}

// returns carry out
static inline u64 u256_add(U256 &r, const U256 &a, const U256 &b) {
    u128 c = 0;
    for (int i = 0; i < 4; ++i) {
        c += (u128)a.v[i] + b.v[i];
        r.v[i] = (u64)c;
        c >>= 64;
    }
    return (u64)c;
}

// returns borrow out
static inline u64 u256_sub(U256 &r, const U256 &a, const U256 &b) {
    u128 br = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - br;
        r.v[i] = (u64)d;
        br = (d >> 64) ? 1 : 0;
    }
    return (u64)br;
}

static inline void u256_from_be(U256 &r, const u8 be[32]) {
    for (int i = 0; i < 4; ++i) {
        u64 w = 0;
        for (int j = 0; j < 8; ++j) w = (w << 8) | be[(3 - i) * 8 + j];
        r.v[i] = w;
    }
}

static inline void u256_to_be(const U256 &a, u8 be[32]) {
    for (int i = 0; i < 4; ++i) {
        u64 w = a.v[i];
        for (int j = 7; j >= 0; --j) {
            be[(3 - i) * 8 + j] = (u8)w;
            w >>= 8;
        }
    }
}

// ===========================================================================
// Field arithmetic mod p = 2^256 - 2^32 - 977   (2^256 ≡ K, K = 0x1000003D1)
// ===========================================================================

static const U256 FIELD_P = {{0xFFFFFFFEFFFFFC2FULL, 0xFFFFFFFFFFFFFFFFULL,
                              0xFFFFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL}};
static const u64 PK = 0x1000003D1ULL;  // 2^256 mod p

static inline void fe_norm(U256 &a) {
    if (u256_cmp(a, FIELD_P) >= 0) u256_sub(a, a, FIELD_P);
}

static inline void fe_add(U256 &r, const U256 &a, const U256 &b) {
    u64 c = u256_add(r, a, b);
    if (c) {  // fold 2^256 -> K; cannot carry again (r < K after wrap)
        u128 t = (u128)r.v[0] + PK;
        r.v[0] = (u64)t;
        u64 cc = (u64)(t >> 64);
        for (int i = 1; cc && i < 4; ++i) {
            t = (u128)r.v[i] + cc;
            r.v[i] = (u64)t;
            cc = (u64)(t >> 64);
        }
    }
    fe_norm(r);
}

static inline void fe_sub(U256 &r, const U256 &a, const U256 &b) {
    u64 br = u256_sub(r, a, b);
    if (br) {  // borrow: subtract K (i.e. add p ≡ add 2^256 - K)
        u128 t = (u128)r.v[0] - PK;
        r.v[0] = (u64)t;
        u64 bb = (t >> 64) ? 1 : 0;
        for (int i = 1; bb && i < 4; ++i) {
            t = (u128)r.v[i] - bb;
            r.v[i] = (u64)t;
            bb = (t >> 64) ? 1 : 0;
        }
    }
    fe_norm(r);
}

// full 256x256 -> 512 product (schoolbook rows, carry via u128)
static inline void u256_mul_full(u64 out[8], const U256 &a, const U256 &b) {
    u64 r[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u64 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 t = (u128)a.v[i] * b.v[j] + r[i + j] + carry;
            r[i + j] = (u64)t;
            carry = (u64)(t >> 64);
        }
        r[i + 4] = carry;
    }
    memcpy(out, r, sizeof(r));
}

// reduce 512-bit (lo 4 limbs, hi 4 limbs) mod p
static inline void fe_reduce_512(U256 &r, const u64 t[8]) {
    // first fold: lo + hi*K  (hi*K fits 4 limbs + 1 overflow limb)
    u64 f[5] = {0, 0, 0, 0, 0};
    u128 c = 0;
    for (int i = 0; i < 4; ++i) {
        c += (u128)t[4 + i] * PK + t[i];
        f[i] = (u64)c;
        c >>= 64;
    }
    f[4] = (u64)c;
    // second fold: f[0..3] + f4*K  (f4 < 2^34, f4*K < 2^68)
    u128 t2 = (u128)f[4] * PK;
    c = (u128)f[0] + (u64)t2;
    r.v[0] = (u64)c;
    c = (c >> 64) + (u128)f[1] + (u64)(t2 >> 64);
    r.v[1] = (u64)c;
    c = (c >> 64) + f[2];
    r.v[2] = (u64)c;
    c = (c >> 64) + f[3];
    r.v[3] = (u64)c;
    if (c >> 64) {  // third fold: single +K, cannot carry out of limb3 again
        u128 tt = (u128)r.v[0] + PK;
        r.v[0] = (u64)tt;
        u64 cc = (u64)(tt >> 64);
        for (int i = 1; cc && i < 4; ++i) {
            tt = (u128)r.v[i] + cc;
            r.v[i] = (u64)tt;
            cc = (u64)(tt >> 64);
        }
    }
    fe_norm(r);
}

static inline void fe_mul(U256 &r, const U256 &a, const U256 &b) {
    u64 t[8];
    u256_mul_full(t, a, b);
    fe_reduce_512(r, t);
}

static inline void fe_sqr(U256 &r, const U256 &a) { fe_mul(r, a, a); }

// Fermat inversion x^(p-2) with the standard secp256k1 addition chain.
static void fe_inv(U256 &r, const U256 &x) {
    U256 x2, x3, x6, x9, x11, x22, x44, x88, x176, x220, x223, t;
    fe_sqr(x2, x);
    fe_mul(x2, x2, x);                       // 2 ones
    fe_sqr(x3, x2);
    fe_mul(x3, x3, x);                       // 3 ones
    x6 = x3;
    for (int i = 0; i < 3; ++i) fe_sqr(x6, x6);
    fe_mul(x6, x6, x3);
    x9 = x6;
    for (int i = 0; i < 3; ++i) fe_sqr(x9, x9);
    fe_mul(x9, x9, x3);
    x11 = x9;
    for (int i = 0; i < 2; ++i) fe_sqr(x11, x11);
    fe_mul(x11, x11, x2);
    x22 = x11;
    for (int i = 0; i < 11; ++i) fe_sqr(x22, x22);
    fe_mul(x22, x22, x11);
    x44 = x22;
    for (int i = 0; i < 22; ++i) fe_sqr(x44, x44);
    fe_mul(x44, x44, x22);
    x88 = x44;
    for (int i = 0; i < 44; ++i) fe_sqr(x88, x88);
    fe_mul(x88, x88, x44);
    x176 = x88;
    for (int i = 0; i < 88; ++i) fe_sqr(x176, x176);
    fe_mul(x176, x176, x88);
    x220 = x176;
    for (int i = 0; i < 44; ++i) fe_sqr(x220, x220);
    fe_mul(x220, x220, x44);
    x223 = x220;
    for (int i = 0; i < 3; ++i) fe_sqr(x223, x223);
    fe_mul(x223, x223, x3);
    t = x223;
    for (int i = 0; i < 23; ++i) fe_sqr(t, t);
    fe_mul(t, t, x22);
    for (int i = 0; i < 5; ++i) fe_sqr(t, t);
    fe_mul(t, t, x);
    for (int i = 0; i < 3; ++i) fe_sqr(t, t);
    fe_mul(t, t, x2);
    for (int i = 0; i < 2; ++i) fe_sqr(t, t);
    fe_mul(r, t, x);
}

// sqrt via x^((p+1)/4); returns false if x is not a QR.
static bool fe_sqrt(U256 &r, const U256 &x) {
    // (p+1)/4 = 0x3FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFBFFFFF0C
    static const U256 E = {{0xFFFFFFFFBFFFFF0CULL, 0xFFFFFFFFFFFFFFFFULL,
                            0xFFFFFFFFFFFFFFFFULL, 0x3FFFFFFFFFFFFFFFULL}};
    U256 acc = {{1, 0, 0, 0}}, base = x;
    for (int limb = 0; limb < 4; ++limb) {
        u64 bits = E.v[limb];
        for (int i = 0; i < 64; ++i) {
            if (bits & 1) fe_mul(acc, acc, base);
            bits >>= 1;
            if (limb == 3 && bits == 0) break;
            fe_sqr(base, base);
        }
    }
    U256 chk;
    fe_sqr(chk, acc);
    U256 xin = x;
    fe_norm(xin);
    if (!u256_eq(chk, xin)) return false;
    r = acc;
    return true;
}

// ===========================================================================
// Scalar arithmetic mod the group order n.
// ===========================================================================

static const U256 ORDER_N = {{0xBFD25E8CD0364141ULL, 0xBAAEDCE6AF48A03BULL,
                              0xFFFFFFFFFFFFFFFEULL, 0xFFFFFFFFFFFFFFFFULL}};

static inline void sc_reduce(U256 &a) {
    if (u256_cmp(a, ORDER_N) >= 0) u256_sub(a, a, ORDER_N);
}

// ===========================================================================
// Elliptic curve: affine + Jacobian over the field.
// ===========================================================================

struct PtA {          // affine; inf flag
    U256 x, y;
    bool inf;
};

struct PtJ {          // Jacobian (X, Y, Z); Z == 0 means infinity
    U256 x, y, z;
};

static const PtA PT_G = {
    {{0x59F2815B16F81798ULL, 0x029BFCDB2DCE28D9ULL, 0x55A06295CE870B07ULL,
      0x79BE667EF9DCBBACULL}},
    {{0x9C47D08FFB10D4B8ULL, 0xFD17B448A6855419ULL, 0x5DA4FBFC0E1108A8ULL,
      0x483ADA7726A3C465ULL}},
    false};

static inline void j_from_a(PtJ &r, const PtA &a) {
    if (a.inf) {
        r.x = U256{{1, 0, 0, 0}};
        r.y = U256{{1, 0, 0, 0}};
        r.z = u256_zero();
        return;
    }
    r.x = a.x;
    r.y = a.y;
    r.z = U256{{1, 0, 0, 0}};
}

// Jacobian doubling (a = 0 curve): standard dbl-2009-l formulas.
static void j_double(PtJ &r, const PtJ &p) {
    if (u256_is_zero(p.z)) { r = p; return; }
    U256 A, B, C, D, E, F, t, x3, y3, z3;
    fe_sqr(A, p.x);                  // A = X^2
    fe_sqr(B, p.y);                  // B = Y^2
    fe_sqr(C, B);                    // C = B^2
    fe_add(t, p.x, B);
    fe_sqr(t, t);
    fe_sub(t, t, A);
    fe_sub(t, t, C);
    fe_add(D, t, t);                 // D = 2*((X+B)^2 - A - C)
    fe_add(E, A, A);
    fe_add(E, E, A);                 // E = 3A
    fe_sqr(F, E);                    // F = E^2
    fe_sub(x3, F, D);
    fe_sub(x3, x3, D);               // X3 = F - 2D
    fe_sub(y3, D, x3);
    fe_mul(y3, y3, E);
    fe_add(t, C, C);
    fe_add(t, t, t);
    fe_add(t, t, t);                 // 8C
    fe_sub(y3, y3, t);               // Y3 = E*(D - X3) - 8C
    fe_mul(z3, p.y, p.z);
    fe_add(z3, z3, z3);              // Z3 = 2*Y*Z
    r.x = x3; r.y = y3; r.z = z3;
}

// Mixed addition r = p + q (q affine, q not infinity): madd-2007-bl.
static void j_add_mixed(PtJ &r, const PtJ &p, const PtA &q) {
    if (q.inf) { r = p; return; }
    if (u256_is_zero(p.z)) { j_from_a(r, q); return; }
    U256 z1z1, u2, s2, h, hh, i, j, rr, v, t, x3, y3, z3;
    fe_sqr(z1z1, p.z);
    fe_mul(u2, q.x, z1z1);           // U2 = X2*Z1^2
    fe_mul(s2, q.y, p.z);
    fe_mul(s2, s2, z1z1);            // S2 = Y2*Z1^3
    fe_sub(h, u2, p.x);              // H = U2 - X1
    fe_sub(rr, s2, p.y);             // r = S2 - Y1   (no *2: simple variant)
    if (u256_is_zero(h)) {
        if (u256_is_zero(rr)) { j_double(r, p); return; }
        r.x = U256{{1, 0, 0, 0}}; r.y = U256{{1, 0, 0, 0}};
        r.z = u256_zero();           // opposite points -> infinity
        return;
    }
    fe_sqr(hh, h);                   // HH = H^2
    fe_mul(i, hh, h);                // I = H^3
    fe_mul(v, p.x, hh);              // V = X1*H^2
    fe_sqr(x3, rr);
    fe_sub(x3, x3, i);
    fe_sub(x3, x3, v);
    fe_sub(x3, x3, v);               // X3 = r^2 - H^3 - 2V
    fe_sub(t, v, x3);
    fe_mul(y3, rr, t);
    fe_mul(j, p.y, i);
    fe_sub(y3, y3, j);               // Y3 = r*(V - X3) - Y1*H^3
    fe_mul(z3, p.z, h);              // Z3 = Z1*H
    r.x = x3; r.y = y3; r.z = z3;
}

// Full Jacobian addition r = p + q.
static void j_add(PtJ &r, const PtJ &p, const PtJ &q) {
    if (u256_is_zero(p.z)) { r = q; return; }
    if (u256_is_zero(q.z)) { r = p; return; }
    U256 z1z1, z2z2, u1, u2, s1, s2, h, rr, hh, i, v, t, x3, y3, z3;
    fe_sqr(z1z1, p.z);
    fe_sqr(z2z2, q.z);
    fe_mul(u1, p.x, z2z2);
    fe_mul(u2, q.x, z1z1);
    fe_mul(s1, p.y, q.z); fe_mul(s1, s1, z2z2);
    fe_mul(s2, q.y, p.z); fe_mul(s2, s2, z1z1);
    fe_sub(h, u2, u1);
    fe_sub(rr, s2, s1);
    if (u256_is_zero(h)) {
        if (u256_is_zero(rr)) { j_double(r, p); return; }
        r.x = U256{{1, 0, 0, 0}}; r.y = U256{{1, 0, 0, 0}};
        r.z = u256_zero();
        return;
    }
    fe_sqr(hh, h);
    fe_mul(i, hh, h);
    fe_mul(v, u1, hh);
    fe_sqr(x3, rr);
    fe_sub(x3, x3, i);
    fe_sub(x3, x3, v);
    fe_sub(x3, x3, v);
    fe_sub(t, v, x3);
    fe_mul(y3, rr, t);
    fe_mul(t, s1, i);
    fe_sub(y3, y3, t);
    fe_mul(z3, p.z, q.z);
    fe_mul(z3, z3, h);
    r.x = x3; r.y = y3; r.z = z3;
}

static void j_to_affine(PtA &r, const PtJ &p) {
    if (u256_is_zero(p.z)) {
        r.inf = true;
        r.x = u256_zero();
        r.y = u256_zero();
        return;
    }
    U256 zi, zi2, zi3;
    fe_inv(zi, p.z);
    fe_sqr(zi2, zi);
    fe_mul(zi3, zi2, zi);
    fe_mul(r.x, p.x, zi2);
    fe_mul(r.y, p.y, zi3);
    r.inf = false;
}

// -- generator table: G, 2G, 3G, ..., 255G and 256-multiples for window-8 ---

static PtA g_window[32][256];   // g_window[w][d] = d * 256^w * G (d=0 -> inf)
static bool g_window_ready = false;

static void ec_init_tables() {
    if (g_window_ready) return;
    PtJ base;
    j_from_a(base, PT_G);
    for (int w = 0; w < 32; ++w) {
        g_window[w][0].inf = true;
        g_window[w][0].x = u256_zero();
        g_window[w][0].y = u256_zero();
        // chain d*base in Jacobian, batch-normalise at the end of the row
        std::vector<PtJ> row(255);
        row[0] = base;
        for (int d = 1; d < 255; ++d) j_add(row[d], row[d - 1], base);
        // batch inversion of all Z via Montgomery's trick
        std::vector<U256> pref(255);
        pref[0] = row[0].z;
        for (int d = 1; d < 255; ++d) fe_mul(pref[d], pref[d - 1], row[d].z);
        U256 inv_all;
        fe_inv(inv_all, pref[254]);
        for (int d = 254; d >= 0; --d) {
            U256 zi;
            if (d == 0) zi = inv_all;
            else {
                fe_mul(zi, inv_all, pref[d - 1]);
                fe_mul(inv_all, inv_all, row[d].z);
            }
            U256 zi2, zi3;
            fe_sqr(zi2, zi);
            fe_mul(zi3, zi2, zi);
            fe_mul(g_window[w][d + 1].x, row[d].x, zi2);
            fe_mul(g_window[w][d + 1].y, row[d].y, zi3);
            g_window[w][d + 1].inf = false;
        }
        // next window base = 256 * (this window base)
        PtJ nb = row[254];          // 255*base
        j_add(nb, nb, base);        // 256*base
        base = nb;
    }
    g_window_ready = true;
}

// k*G via the fixed window-8 comb: 32 table adds, zero doublings.
static void ec_mul_g(PtJ &r, const U256 &k) {
    ec_init_tables();
    r.x = U256{{1, 0, 0, 0}};
    r.y = U256{{1, 0, 0, 0}};
    r.z = u256_zero();
    for (int w = 0; w < 32; ++w) {
        unsigned d = (unsigned)((k.v[w / 8] >> ((w % 8) * 8)) & 0xFF);
        if (d) j_add_mixed(r, r, g_window[w][d]);
    }
}

// k*P for arbitrary affine P: 4-bit window double-and-add.
static void ec_mul_pt(PtJ &r, const U256 &k, const PtA &p) {
    PtJ tbl[16];
    j_from_a(tbl[1], p);
    j_double(tbl[2], tbl[1]);
    for (int i = 3; i < 16; ++i) j_add(tbl[i], tbl[i - 1], tbl[1]);
    r.x = U256{{1, 0, 0, 0}};
    r.y = U256{{1, 0, 0, 0}};
    r.z = u256_zero();
    bool started = false;
    for (int nib = 63; nib >= 0; --nib) {
        if (started)
            for (int i = 0; i < 4; ++i) j_double(r, r);
        unsigned d = (unsigned)((k.v[nib / 16] >> ((nib % 16) * 4)) & 0xF);
        if (d) {
            j_add(r, r, tbl[d]);
            started = true;
        }
    }
}

// ===========================================================================
// SHA-256 (FIPS 180-4)
// ===========================================================================

static const u32 SHA_K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline u32 ror32(u32 x, int n) { return (x >> n) | (x << (32 - n)); }

static void sha256_block(u32 st[8], const u8 *blk) {
    u32 w[64];
    for (int i = 0; i < 16; ++i)
        w[i] = ((u32)blk[i * 4] << 24) | ((u32)blk[i * 4 + 1] << 16) |
               ((u32)blk[i * 4 + 2] << 8) | blk[i * 4 + 3];
    for (int i = 16; i < 64; ++i) {
        u32 s0 = ror32(w[i - 15], 7) ^ ror32(w[i - 15], 18) ^ (w[i - 15] >> 3);
        u32 s1 = ror32(w[i - 2], 17) ^ ror32(w[i - 2], 19) ^ (w[i - 2] >> 10);
        w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    u32 a = st[0], b = st[1], c = st[2], d = st[3];
    u32 e = st[4], f = st[5], g = st[6], h = st[7];
    for (int i = 0; i < 64; ++i) {
        u32 S1 = ror32(e, 6) ^ ror32(e, 11) ^ ror32(e, 25);
        u32 ch = (e & f) ^ (~e & g);
        u32 t1 = h + S1 + ch + SHA_K[i] + w[i];
        u32 S0 = ror32(a, 2) ^ ror32(a, 13) ^ ror32(a, 22);
        u32 mj = (a & b) ^ (a & c) ^ (b & c);
        u32 t2 = S0 + mj;
        h = g; g = f; f = e; e = d + t1;
        d = c; c = b; b = a; a = t1 + t2;
    }
    st[0] += a; st[1] += b; st[2] += c; st[3] += d;
    st[4] += e; st[5] += f; st[6] += g; st[7] += h;
}

static void sha256_full(const u8 *data, size_t len, u8 out[32]) {
    u32 st[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                 0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    size_t off = 0;
    for (; off + 64 <= len; off += 64) sha256_block(st, data + off);
    u8 tail[128];
    size_t rem = len - off;
    memcpy(tail, data + off, rem);
    tail[rem] = 0x80;
    size_t padlen = (rem < 56) ? 64 : 128;
    memset(tail + rem + 1, 0, padlen - rem - 1 - 8);
    u64 bits = (u64)len * 8;
    for (int i = 0; i < 8; ++i) tail[padlen - 1 - i] = (u8)(bits >> (8 * i));
    sha256_block(st, tail);
    if (padlen == 128) sha256_block(st, tail + 64);
    for (int i = 0; i < 8; ++i) {
        out[i * 4] = (u8)(st[i] >> 24);
        out[i * 4 + 1] = (u8)(st[i] >> 16);
        out[i * 4 + 2] = (u8)(st[i] >> 8);
        out[i * 4 + 3] = (u8)st[i];
    }
}

// ===========================================================================
// RIPEMD-160 (Dobbertin/Bosselaers/Preneel)
// ===========================================================================

static const int RMD_RL[80] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13};
static const int RMD_RR[80] = {
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11};
static const int RMD_SL[80] = {
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6};
static const int RMD_SR[80] = {
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11};

static inline u32 rol32(u32 x, int n) { return (x << n) | (x >> (32 - n)); }

static inline u32 rmd_f(int j, u32 x, u32 y, u32 z) {
    if (j < 16) return x ^ y ^ z;
    if (j < 32) return (x & y) | (~x & z);
    if (j < 48) return (x | ~y) ^ z;
    if (j < 64) return (x & z) | (y & ~z);
    return x ^ (y | ~z);
}

static void ripemd160_block(u32 st[5], const u8 *blk) {
    static const u32 KL[5] = {0, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E};
    static const u32 KR[5] = {0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0};
    u32 x[16];
    for (int i = 0; i < 16; ++i)
        x[i] = (u32)blk[i * 4] | ((u32)blk[i * 4 + 1] << 8) |
               ((u32)blk[i * 4 + 2] << 16) | ((u32)blk[i * 4 + 3] << 24);
    u32 al = st[0], bl = st[1], cl = st[2], dl = st[3], el = st[4];
    u32 ar = al, br = bl, cr = cl, dr = dl, er = el;
    for (int j = 0; j < 80; ++j) {
        u32 t = rol32(al + rmd_f(j, bl, cl, dl) + x[RMD_RL[j]] + KL[j / 16],
                      RMD_SL[j]) + el;
        al = el; el = dl; dl = rol32(cl, 10); cl = bl; bl = t;
        t = rol32(ar + rmd_f(79 - j, br, cr, dr) + x[RMD_RR[j]] + KR[j / 16],
                  RMD_SR[j]) + er;
        ar = er; er = dr; dr = rol32(cr, 10); cr = br; br = t;
    }
    u32 t = st[1] + cl + dr;
    st[1] = st[2] + dl + er;
    st[2] = st[3] + el + ar;
    st[3] = st[4] + al + br;
    st[4] = st[0] + bl + cr;
    st[0] = t;
}

static void ripemd160_full(const u8 *data, size_t len, u8 out[20]) {
    u32 st[5] = {0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0};
    size_t off = 0;
    for (; off + 64 <= len; off += 64) ripemd160_block(st, data + off);
    u8 tail[128];
    size_t rem = len - off;
    memcpy(tail, data + off, rem);
    tail[rem] = 0x80;
    size_t padlen = (rem < 56) ? 64 : 128;
    memset(tail + rem + 1, 0, padlen - rem - 1 - 8);
    u64 bits = (u64)len * 8;
    for (int i = 0; i < 8; ++i) tail[padlen - 8 + i] = (u8)(bits >> (8 * i));
    ripemd160_block(st, tail);
    if (padlen == 128) ripemd160_block(st, tail + 64);
    for (int i = 0; i < 5; ++i) {
        out[i * 4] = (u8)st[i];
        out[i * 4 + 1] = (u8)(st[i] >> 8);
        out[i * 4 + 2] = (u8)(st[i] >> 16);
        out[i * 4 + 3] = (u8)(st[i] >> 24);
    }
}

// ===========================================================================
// Keccak-256 (pre-NIST padding 0x01, as used by Ethereum)
// ===========================================================================

static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};
static const int KECCAK_ROT[5][5] = {{0, 36, 3, 41, 18},
                                     {1, 44, 10, 45, 2},
                                     {62, 6, 43, 15, 61},
                                     {28, 55, 25, 21, 56},
                                     {27, 20, 39, 8, 14}};

static inline u64 rol64(u64 x, int n) {
    return n ? (x << n) | (x >> (64 - n)) : x;
}

static void keccak_f(u64 a[5][5]) {
    for (int rnd = 0; rnd < 24; ++rnd) {
        u64 c[5], d[5];
        for (int x = 0; x < 5; ++x)
            c[x] = a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4];
        for (int x = 0; x < 5; ++x) {
            d[x] = c[(x + 4) % 5] ^ rol64(c[(x + 1) % 5], 1);
            for (int y = 0; y < 5; ++y) a[x][y] ^= d[x];
        }
        u64 b[5][5];
        for (int x = 0; x < 5; ++x)
            for (int y = 0; y < 5; ++y)
                b[y][(2 * x + 3 * y) % 5] = rol64(a[x][y], KECCAK_ROT[x][y]);
        for (int x = 0; x < 5; ++x)
            for (int y = 0; y < 5; ++y)
                a[x][y] = b[x][y] ^ (~b[(x + 1) % 5][y] & b[(x + 2) % 5][y]);
        a[0][0] ^= KECCAK_RC[rnd];
    }
}

static void keccak256_full(const u8 *data, size_t len, u8 out[32]) {
    const size_t rate = 136;
    u64 st[5][5];
    memset(st, 0, sizeof(st));
    u8 blk[136];
    size_t off = 0;
    while (len - off >= rate) {
        for (size_t i = 0; i < rate / 8; ++i) {
            u64 w = 0;
            for (int j = 7; j >= 0; --j) w = (w << 8) | data[off + i * 8 + j];
            st[i % 5][i / 5] ^= w;
        }
        keccak_f(st);
        off += rate;
    }
    size_t rem = len - off;
    memset(blk, 0, rate);
    memcpy(blk, data + off, rem);
    blk[rem] ^= 0x01;              // Keccak (pre-NIST) domain padding
    blk[rate - 1] ^= 0x80;
    for (size_t i = 0; i < rate / 8; ++i) {
        u64 w = 0;
        for (int j = 7; j >= 0; --j) w = (w << 8) | blk[i * 8 + j];
        st[i % 5][i / 5] ^= w;
    }
    keccak_f(st);
    for (int i = 0; i < 4; ++i) {
        u64 w = st[i % 5][i / 5];
        for (int j = 0; j < 8; ++j) out[i * 8 + j] = (u8)(w >> (8 * j));
    }
}

// ===========================================================================
// XXH64 (Collet) — the bloom filter hash (bloom/bloom.cpp:129-130 parity).
// ===========================================================================

static const u64 XP1 = 0x9E3779B185EBCA87ULL, XP2 = 0xC2B2AE3D27D4EB4FULL,
                 XP3 = 0x165667B19E3779F9ULL, XP4 = 0x85EBCA77C2B2AE63ULL,
                 XP5 = 0x27D4EB2F165667C5ULL;

static inline u64 xxh_read64(const u8 *p) {
    u64 w;
    memcpy(&w, p, 8);
    return w;   // little-endian host assumed (x86/arm64)
}

static inline u32 xxh_read32(const u8 *p) {
    u32 w;
    memcpy(&w, p, 4);
    return w;
}

static inline u64 xxh_round(u64 acc, u64 lane) {
    acc += lane * XP2;
    acc = rol64(acc, 31);
    return acc * XP1;
}

static u64 xxh64(const u8 *data, size_t len, u64 seed) {
    const u8 *p = data, *end = data + len;
    u64 h;
    if (len >= 32) {
        u64 v1 = seed + XP1 + XP2, v2 = seed + XP2, v3 = seed, v4 = seed - XP1;
        do {
            v1 = xxh_round(v1, xxh_read64(p)); p += 8;
            v2 = xxh_round(v2, xxh_read64(p)); p += 8;
            v3 = xxh_round(v3, xxh_read64(p)); p += 8;
            v4 = xxh_round(v4, xxh_read64(p)); p += 8;
        } while (p + 32 <= end);
        h = rol64(v1, 1) + rol64(v2, 7) + rol64(v3, 12) + rol64(v4, 18);
        for (u64 *v : {&v1, &v2, &v3, &v4}) {
            h ^= xxh_round(0, *v);
            h = h * XP1 + XP4;
        }
    } else {
        h = seed + XP5;
    }
    h += (u64)len;
    while (p + 8 <= end) {
        h ^= xxh_round(0, xxh_read64(p));
        h = rol64(h, 27) * XP1 + XP4;
        p += 8;
    }
    if (p + 4 <= end) {
        h ^= (u64)xxh_read32(p) * XP1;
        h = rol64(h, 23) * XP2 + XP3;
        p += 4;
    }
    while (p < end) {
        h ^= (*p++) * XP5;
        h = rol64(h, 11) * XP1;
    }
    h ^= h >> 33;
    h *= XP2;
    h ^= h >> 29;
    h *= XP3;
    h ^= h >> 32;
    return h;
}

// ===========================================================================
// extern "C" API
// ===========================================================================

extern "C" {

// ---- hashes ---------------------------------------------------------------

void kh_sha256(const u8 *data, u64 len, u8 *out32) {
    sha256_full(data, (size_t)len, out32);
}

void kh_ripemd160(const u8 *data, u64 len, u8 *out20) {
    ripemd160_full(data, (size_t)len, out20);
}

void kh_keccak256(const u8 *data, u64 len, u8 *out32) {
    keccak256_full(data, (size_t)len, out32);
}

// hash160 = ripemd160(sha256(msg)) over n fixed-size messages
void kh_hash160_batch(const u8 *msgs, u64 msg_len, u64 n, u8 *out20s) {
    u8 mid[32];
    for (u64 i = 0; i < n; ++i) {
        sha256_full(msgs + i * msg_len, (size_t)msg_len, mid);
        ripemd160_full(mid, 32, out20s + i * 20);
    }
}

// batch sha256 over n fixed-size messages (minikeys hot host path)
void kh_sha256_batch(const u8 *msgs, u64 msg_len, u64 n, u8 *out32s) {
    for (u64 i = 0; i < n; ++i)
        sha256_full(msgs + i * msg_len, (size_t)msg_len, out32s + i * 32);
}

u64 kh_xxh64(const u8 *data, u64 len, u64 seed) {
    return xxh64(data, (size_t)len, seed);
}

// ---- EC -------------------------------------------------------------------

// Batch-normalise a vector of Jacobian points to affine big-endian x||y
// buffers with ONE field inversion (Montgomery's trick — the same
// amortisation as IntGroup::ModInv, secp256k1/IntGroup.cpp:36-57).
// Infinity writes 64 zero bytes and sets inf_mask[i] = 1 (if given).
static void batch_to_affine_be(const std::vector<PtJ> &pts, u8 *out_xy,
                               u8 *inf_mask) {
    size_t n = pts.size();
    std::vector<U256> pref(n);
    U256 run = {{1, 0, 0, 0}};
    for (size_t i = 0; i < n; ++i) {
        pref[i] = run;                       // product of z[0..i-1] (non-inf)
        if (!u256_is_zero(pts[i].z)) fe_mul(run, run, pts[i].z);
    }
    U256 acc;                                 // inv of product of z[0..i]
    fe_inv(acc, run);
    for (size_t ii = n; ii-- > 0;) {
        if (inf_mask) inf_mask[ii] = 0;
        if (u256_is_zero(pts[ii].z)) {
            memset(out_xy + ii * 64, 0, 64);
            if (inf_mask) inf_mask[ii] = 1;
            continue;
        }
        U256 zi, zi2, zi3, ax, ay;
        fe_mul(zi, acc, pref[ii]);            // z[ii]^-1
        fe_mul(acc, acc, pts[ii].z);          // strip z[ii] from the inverse
        fe_sqr(zi2, zi);
        fe_mul(zi3, zi2, zi);
        fe_mul(ax, pts[ii].x, zi2);
        fe_mul(ay, pts[ii].y, zi3);
        u256_to_be(ax, out_xy + ii * 64);
        u256_to_be(ay, out_xy + ii * 64 + 32);
    }
}

// out_xy: n * 64 bytes (x_be32 || y_be32); keys: n * 32 bytes big-endian.
// A zero key (mod n) writes 64 zero bytes (point at infinity).
void kh_ec_pubkey_batch(const u8 *keys_be, u64 n, u8 *out_xy) {
    ec_init_tables();
    std::vector<PtJ> pts((size_t)n);
    for (u64 i = 0; i < n; ++i) {
        U256 k;
        u256_from_be(k, keys_be + i * 32);
        sc_reduce(k);
        ec_mul_g(pts[(size_t)i], k);
    }
    batch_to_affine_be(pts, out_xy, nullptr);
}

// General scalar mult: out = k * P (P affine be x||y). Returns 1, or 0 for
// the infinity result (out zeroed).
int kh_ec_mul(const u8 *k_be, const u8 *pt_xy_be, u8 *out_xy) {
    U256 k;
    u256_from_be(k, k_be);
    sc_reduce(k);
    PtA p;
    u256_from_be(p.x, pt_xy_be);
    u256_from_be(p.y, pt_xy_be + 32);
    p.inf = false;
    PtJ r;
    ec_mul_pt(r, k, p);
    PtA ra;
    j_to_affine(ra, r);
    if (ra.inf) {
        memset(out_xy, 0, 64);
        return 0;
    }
    u256_to_be(ra.x, out_xy);
    u256_to_be(ra.y, out_xy + 32);
    return 1;
}

// Affine point addition out = A + B (either may be the zero buffer =
// infinity). Returns 0 when the result is infinity.
int kh_ec_add(const u8 *a_xy, const u8 *b_xy, u8 *out_xy) {
    auto is_zero64 = [](const u8 *p) {
        for (int i = 0; i < 64; ++i)
            if (p[i]) return false;
        return true;
    };
    if (is_zero64(a_xy)) { memcpy(out_xy, b_xy, 64); return is_zero64(b_xy) ? 0 : 1; }
    if (is_zero64(b_xy)) { memcpy(out_xy, a_xy, 64); return 1; }
    PtA a, b;
    u256_from_be(a.x, a_xy); u256_from_be(a.y, a_xy + 32); a.inf = false;
    u256_from_be(b.x, b_xy); u256_from_be(b.y, b_xy + 32); b.inf = false;
    PtJ aj, r;
    j_from_a(aj, a);
    j_add_mixed(r, aj, b);
    PtA ra;
    j_to_affine(ra, r);
    if (ra.inf) { memset(out_xy, 0, 64); return 0; }
    u256_to_be(ra.x, out_xy);
    u256_to_be(ra.y, out_xy + 32);
    return 1;
}

// BSGS lane seeding: out[l] = Q - (c0 + l*stride)*G for l = 0..lanes-1.
// Two scalar mults (S = Q - c0*G, D = -stride*G) + a Jacobian add chain +
// one batch inversion. inf_mask[l] = 1 marks Q == (c0 + l*stride)*G — the
// private key is exactly c0 + l*stride (caller records it).
void kh_ec_seed_lanes(const u8 *q_xy_be, const u8 *c0_be, const u8 *stride_be,
                      u64 lanes, u8 *out_xy, u8 *inf_mask) {
    ec_init_tables();
    U256 c0, stride;
    u256_from_be(c0, c0_be);
    u256_from_be(stride, stride_be);
    sc_reduce(c0);
    sc_reduce(stride);
    // S = Q + (n - c0)*G
    U256 negc0;
    u256_sub(negc0, ORDER_N, c0);
    if (u256_eq(negc0, ORDER_N)) negc0 = u256_zero();   // c0 == 0
    PtJ s;
    ec_mul_g(s, negc0);
    PtA q;
    u256_from_be(q.x, q_xy_be);
    u256_from_be(q.y, q_xy_be + 32);
    q.inf = false;
    j_add_mixed(s, s, q);
    // D = (n - stride)*G as affine (for the mixed-add chain)
    U256 negstride;
    u256_sub(negstride, ORDER_N, stride);
    if (u256_eq(negstride, ORDER_N)) negstride = u256_zero();
    PtJ dj;
    ec_mul_g(dj, negstride);
    PtA d;
    j_to_affine(d, dj);
    std::vector<PtJ> pts((size_t)lanes);
    pts[0] = s;
    for (u64 l = 1; l < lanes; ++l) j_add_mixed(pts[(size_t)l], pts[(size_t)l - 1], d);
    batch_to_affine_be(pts, out_xy, inf_mask);
}

// Lift X: recover y with the requested parity. Returns 0 if x is not on
// the curve. Mirrors Secp256K1::GetY (SECP256K1.cpp:675-689).
int kh_ec_lift_x(const u8 *x_be, int odd, u8 *out_y_be) {
    U256 x, y2, y, t;
    u256_from_be(x, x_be);
    fe_sqr(t, x);
    fe_mul(t, t, x);
    U256 seven = {{7, 0, 0, 0}};
    fe_add(y2, t, seven);
    if (!fe_sqrt(y, y2)) return 0;
    if ((y.v[0] & 1) != (u64)(odd ? 1 : 0)) u256_sub(y, FIELD_P, y);
    u256_to_be(y, out_y_be);
    return 1;
}

// ---- sort -----------------------------------------------------------------

// LSB radix argsort: perm_out gets the indices that sort keys ascending
// (stable). 8 passes of 8 bits; scratch allocated internally.
void kh_radix_argsort_u64(const u64 *keys, u64 n, u32 *perm_out) {
    std::vector<u32> idx_a((size_t)n), idx_b((size_t)n);
    std::vector<u64> key_a((size_t)n), key_b((size_t)n);
    for (u64 i = 0; i < n; ++i) {
        idx_a[(size_t)i] = (u32)i;
        key_a[(size_t)i] = keys[i];
    }
    u64 count[256];
    for (int pass = 0; pass < 8; ++pass) {
        int shift = pass * 8;
        memset(count, 0, sizeof(count));
        for (u64 i = 0; i < n; ++i) count[(key_a[(size_t)i] >> shift) & 0xFF]++;
        u64 pos = 0;
        for (int b = 0; b < 256; ++b) {
            u64 c = count[b];
            count[b] = pos;
            pos += c;
        }
        for (u64 i = 0; i < n; ++i) {
            u64 k = key_a[(size_t)i];
            u64 dst = count[(k >> shift) & 0xFF]++;
            key_b[(size_t)dst] = k;
            idx_b[(size_t)dst] = idx_a[(size_t)i];
        }
        key_a.swap(key_b);
        idx_a.swap(idx_b);
    }
    memcpy(perm_out, idx_a.data(), (size_t)n * sizeof(u32));
}

// version / availability probe
u64 kh_version() { return 1; }

}  // extern "C"
