// Host-side BN254 G1 arithmetic in C++ (4x64-bit Montgomery limbs).
//
// Native runtime component: the role halo2curves' hand-written field
// arithmetic plays for the reference's native builds (SURVEY.md 2.2,
// /root/reference/circuits/Cargo.lock halo2curves 0.3.2).  The TPU kernels
// (field/vec.py, ec/g1_vec.py) carry all bulk work; this library carries the
// *host* point work that is serial by nature — MSM window folds, SRS
// bookkeeping, verifier-side accumulator algebra — which otherwise runs over
// Python bigints (ec/host.py).  ec/host.py transparently routes through this
// when the shared object is present (see native/__init__.py) and keeps the
// pure-Python path as ground truth.
//
// ABI: every field element crosses the boundary as 32 little-endian bytes in
// STANDARD (non-Montgomery) form; points as x||y (affine, 64 bytes, with an
// explicit infinity flag) or x||y||z (Jacobian, 96 bytes, z == 0 encodes the
// identity — same convention as the device kernels).

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint8_t u8;

struct Fp {
    u64 l[4];
};

static const Fp Q_MOD = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                          0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const Fp Q_R2 = {{0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                         0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL}};
static const Fp Q_R = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                        0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};
static const u64 Q_N0 = 0x87d20782e4866389ULL;

static inline bool is_zero(const Fp &a) {
    return (a.l[0] | a.l[1] | a.l[2] | a.l[3]) == 0;
}

static inline bool geq_q(const Fp &a) {
    for (int i = 3; i >= 0; --i) {
        if (a.l[i] > Q_MOD.l[i]) return true;
        if (a.l[i] < Q_MOD.l[i]) return false;
    }
    return true;  // equal
}

static inline void sub_q(Fp &a) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.l[i] - Q_MOD.l[i] - borrow;
        a.l[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static inline void fadd(Fp &o, const Fp &a, const Fp &b) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        o.l[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq_q(o)) sub_q(o);
}

static inline void fsub(Fp &o, const Fp &a, const Fp &b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        o.l[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)o.l[i] + Q_MOD.l[i] + carry;
            o.l[i] = (u64)s;
            carry = s >> 64;
        }
    }
}

static inline void fneg(Fp &o, const Fp &a) {
    if (is_zero(a)) {
        o = a;
        return;
    }
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)Q_MOD.l[i] - a.l[i] - borrow;
        o.l[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

// CIOS Montgomery multiplication (4x64).
static void fmul(Fp &out, const Fp &a, const Fp &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 s = (u128)t[j] + (u128)a.l[j] * b.l[i] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * Q_N0;
        carry = ((u128)t[0] + (u128)m * Q_MOD.l[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 s2 = (u128)t[j] + (u128)m * Q_MOD.l[j] + carry;
            t[j - 1] = (u64)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[4] + carry;
        t[3] = (u64)s;
        t[4] = t[5] + (u64)(s >> 64);
        t[5] = 0;
    }
    out.l[0] = t[0];
    out.l[1] = t[1];
    out.l[2] = t[2];
    out.l[3] = t[3];
    if (t[4] || geq_q(out)) sub_q(out);
}

static inline void fsqr(Fp &o, const Fp &a) { fmul(o, a, a); }

static void fpow(Fp &o, const Fp &base, const Fp &e_std) {
    // e_std: standard-form exponent limbs (NOT Montgomery)
    Fp acc = Q_R;  // Montgomery 1
    for (int bit = 255; bit >= 0; --bit) {
        fsqr(acc, acc);
        if ((e_std.l[bit / 64] >> (bit % 64)) & 1) fmul(acc, acc, base);
    }
    o = acc;
}

static void finv(Fp &o, const Fp &a) {
    // Fermat: a^(q-2) in Montgomery form
    Fp e = Q_MOD;
    u128 borrow = 2;
    for (int i = 0; i < 4 && borrow; ++i) {
        u128 d = (u128)e.l[i] - borrow;
        e.l[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    fpow(o, a, e);
}

static inline void to_mont(Fp &o, const Fp &a) { fmul(o, a, Q_R2); }

static inline void from_mont(Fp &o, const Fp &a) {
    Fp one = {{1, 0, 0, 0}};
    fmul(o, a, one);
}

// ---------------------------------------------------------------------------
// G1 Jacobian (coords in Montgomery form internally); z == 0 <=> identity
// ---------------------------------------------------------------------------

struct G1 {
    Fp x, y, z;
};

static const G1 G1_IDENT = {{{0, 0, 0, 0}}, {{0, 0, 0, 0}}, {{0, 0, 0, 0}}};

static inline bool pt_is_ident(const G1 &p) { return is_zero(p.z); }

static void pt_dbl(G1 &o, const G1 &p) {
    if (pt_is_ident(p)) {
        o = p;
        return;
    }
    Fp A, B, C, D, E, F, t, t2;
    fsqr(A, p.x);
    fsqr(B, p.y);
    fsqr(C, B);
    fadd(t, p.x, B);
    fsqr(t, t);
    fadd(t2, A, C);
    fsub(t, t, t2);
    fadd(D, t, t);
    fadd(E, A, A);
    fadd(E, E, A);
    fsqr(F, E);
    Fp X3, Y3, Z3;
    fadd(t, D, D);
    fsub(X3, F, t);
    Fp c8;
    fadd(c8, C, C);
    fadd(c8, c8, c8);
    fadd(c8, c8, c8);
    fsub(t, D, X3);
    fmul(t, E, t);
    fsub(Y3, t, c8);
    fmul(t, p.y, p.z);
    fadd(Z3, t, t);
    o.x = X3;
    o.y = Y3;
    o.z = Z3;
}

static void pt_add(G1 &o, const G1 &p, const G1 &q) {
    if (pt_is_ident(p)) {
        o = q;
        return;
    }
    if (pt_is_ident(q)) {
        o = p;
        return;
    }
    Fp Z1Z1, Z2Z2, U1, U2, S1, S2, t;
    fsqr(Z1Z1, p.z);
    fsqr(Z2Z2, q.z);
    fmul(U1, p.x, Z2Z2);
    fmul(U2, q.x, Z1Z1);
    fmul(t, q.z, Z2Z2);
    fmul(S1, p.y, t);
    fmul(t, p.z, Z1Z1);
    fmul(S2, q.y, t);
    Fp H, r;
    fsub(H, U2, U1);
    fsub(r, S2, S1);
    if (is_zero(H)) {
        if (is_zero(r)) {
            pt_dbl(o, p);
        } else {
            o = G1_IDENT;
        }
        return;
    }
    Fp HH, HHH, V;
    fsqr(HH, H);
    fmul(HHH, H, HH);
    fmul(V, U1, HH);
    Fp X3, Y3, Z3;
    fsqr(t, r);
    fsub(t, t, HHH);
    Fp v2;
    fadd(v2, V, V);
    fsub(X3, t, v2);
    fsub(t, V, X3);
    fmul(t, r, t);
    Fp s1hhh;
    fmul(s1hhh, S1, HHH);
    fsub(Y3, t, s1hhh);
    fmul(t, p.z, q.z);
    fmul(Z3, t, H);
    o.x = X3;
    o.y = Y3;
    o.z = Z3;
}

static void pt_mul_u64x4(G1 &o, const G1 &p, const Fp &k_std) {
    G1 acc = G1_IDENT;
    bool started = false;
    for (int bit = 255; bit >= 0; --bit) {
        if (started) pt_dbl(acc, acc);
        if ((k_std.l[bit / 64] >> (bit % 64)) & 1) {
            pt_add(acc, acc, p);
            started = true;
        }
    }
    o = acc;
}

// ---------------------------------------------------------------------------
// byte-buffer (de)serialization: std-form little-endian
// ---------------------------------------------------------------------------

static void load_fp(Fp &o, const u8 *b) {  // std form -> Montgomery
    Fp s;
    memcpy(s.l, b, 32);
    to_mont(o, s);
}

static void store_fp(u8 *b, const Fp &a) {  // Montgomery -> std form
    Fp s;
    from_mont(s, a);
    memcpy(b, s.l, 32);
}

static void load_jac(G1 &o, const u8 *b) {
    load_fp(o.x, b);
    load_fp(o.y, b + 32);
    load_fp(o.z, b + 64);
}

static void store_jac(u8 *b, const G1 &p) {
    store_fp(b, p.x);
    store_fp(b + 32, p.y);
    store_fp(b + 64, p.z);
}

static void load_affine(G1 &o, const u8 *b, int inf) {
    if (inf) {
        o = G1_IDENT;
        return;
    }
    load_fp(o.x, b);
    load_fp(o.y, b + 32);
    o.z = Q_R;  // Montgomery 1
}

static int store_affine(u8 *b, const G1 &p) {  // returns inf flag
    if (pt_is_ident(p)) {
        memset(b, 0, 64);
        return 1;
    }
    Fp zinv, zi2, zi3, t;
    finv(zinv, p.z);
    fsqr(zi2, zinv);
    fmul(zi3, zi2, zinv);
    fmul(t, p.x, zi2);
    store_fp(b, t);
    fmul(t, p.y, zi3);
    store_fp(b + 32, t);
    return 0;
}

extern "C" {

int h2n_abi_version() { return 1; }

// Jacobian += Jacobian (96-byte std-form buffers)
void h2n_g1_add(const u8 *a, const u8 *b, u8 *out) {
    G1 p, q, r;
    load_jac(p, a);
    load_jac(q, b);
    pt_add(r, p, q);
    store_jac(out, r);
}

void h2n_g1_dbl(const u8 *a, u8 *out) {
    G1 p, r;
    load_jac(p, a);
    pt_dbl(r, p);
    store_jac(out, r);
}

// affine point (64B + inf flag) times 32-byte scalar -> jacobian out
void h2n_g1_mul(const u8 *p_aff, int p_inf, const u8 *k, u8 *out) {
    G1 p, r;
    load_affine(p, p_aff, p_inf);
    Fp ks;
    memcpy(ks.l, k, 32);
    pt_mul_u64x4(r, p, ks);
    store_jac(out, r);
}

// jacobian (96B) -> affine (64B); returns inf flag
int h2n_g1_to_affine(const u8 *jac, u8 *out) {
    G1 p;
    load_jac(p, jac);
    return store_affine(out, p);
}

// The MSM host fold (ec/msm_vec.py msm_vec): given per-window Jacobian
// partials T_max and sum_T (possibly summed over shards first), compute
//   acc = sum_w 2^(c*w) * ((V-1) * T_max[w] - sum_T[w]),  V = 2^c
// Horner-style from the most significant window.  parts layout:
// n_windows * 2 * 96 bytes std-form Jacobian (T_max then sum_T per window).
// Returns inf flag; writes affine x||y to out.
int h2n_msm_fold(const u8 *parts, int n_windows, int c, u8 *out) {
    G1 acc = G1_IDENT;
    for (int w = n_windows - 1; w >= 0; --w) {
        for (int d = 0; d < c; ++d) pt_dbl(acc, acc);
        G1 tmax, sumt;
        load_jac(tmax, parts + (size_t)w * 2 * 96);
        load_jac(sumt, parts + (size_t)w * 2 * 96 + 96);
        // (V-1) * tmax via double-and-add on the c-bit constant (all ones)
        G1 wsum = G1_IDENT;
        for (int bit = c - 1; bit >= 0; --bit) {
            pt_dbl(wsum, wsum);
            pt_add(wsum, wsum, tmax);  // every bit of V-1 is set
        }
        // wsum -= sum_T
        G1 nsum = sumt;
        fneg(nsum.y, sumt.y);
        pt_add(wsum, wsum, nsum);
        pt_add(acc, acc, wsum);
    }
    return store_affine(out, acc);
}

// Sum of n affine points (64B each, inf flags in a parallel byte array);
// jacobian out.  Used for shard-partial folds.
void h2n_g1_sum(const u8 *pts, const u8 *infs, int n, u8 *out) {
    G1 acc = G1_IDENT;
    for (int i = 0; i < n; ++i) {
        G1 p;
        load_affine(p, pts + (size_t)i * 64, infs[i]);
        pt_add(acc, acc, p);
    }
    store_jac(out, acc);
}

// Host MSM over affine points and 32-byte scalars (Pippenger c=8) —
// the test oracle / tiny-size fallback path.
int h2n_g1_msm(const u8 *pts, const u8 *infs, const u8 *scalars, int n,
               u8 *out) {
    const int C = 8, V = 1 << C, WINDOWS = 32;
    G1 acc = G1_IDENT;
    G1 *buckets = new G1[V];
    for (int w = WINDOWS - 1; w >= 0; --w) {
        for (int d = 0; d < C; ++d) pt_dbl(acc, acc);
        for (int v = 0; v < V; ++v) buckets[v] = G1_IDENT;
        for (int i = 0; i < n; ++i) {
            int digit = scalars[(size_t)i * 32 + w];
            if (!digit || infs[i]) continue;
            G1 p;
            load_affine(p, pts + (size_t)i * 64, infs[i]);
            pt_add(buckets[digit], buckets[digit], p);
        }
        // sum_v v * bucket_v via suffix accumulation
        G1 run = G1_IDENT, tot = G1_IDENT;
        for (int v = V - 1; v >= 1; --v) {
            pt_add(run, run, buckets[v]);
            pt_add(tot, tot, run);
        }
        pt_add(acc, acc, tot);
    }
    delete[] buckets;
    return store_affine(out, acc);
}

}  // extern "C"
