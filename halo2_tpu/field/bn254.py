"""BN254 curve/field constants (host-side Python ints).

The reference prover's field/curve layer lives in the external Rust crate
`halo2curves` tag 0.3.2 (see /root/reference/circuits/Cargo.lock:854-856 and
SURVEY.md L0). This module re-derives every constant from first principles
(modulus + generator) rather than porting code.

Conventions (matching halo2curves so serialized bytes interop):
  * Fr / Fq elements serialize as 32-byte little-endian integers.
  * G1 affine compressed = 32-byte LE x-coordinate with flag bits in the top
    byte: bit7 = y sign (y is "odd": least significant bit of canonical y),
    bit6 = point at infinity.  (Fq is 254 bits so bits 254/255 are free.)
  * Montgomery form on device uses R = 2^256 with 16 limbs of 16 bits each,
    stored as uint32 (see limbs.py / mont.py).
"""

# ---- moduli -----------------------------------------------------------------
# Scalar field (circuit field) Fr and base field Fq of BN254.
FR_MOD = 21888242871839275222246405745257275088548364400416034343698204186575808495617
FQ_MOD = 21888242871839275222246405745257275088696311157297823662689037894645226208583

# ---- Fr (scalar field) structure --------------------------------------------
FR_S = 28  # 2-adicity: 2^28 | (r - 1)
FR_GENERATOR = 7  # multiplicative generator of Fr*
FR_T = (FR_MOD - 1) >> FR_S  # odd part
# omega: generator of the maximal 2^S-order subgroup
FR_ROOT_OF_UNITY = pow(FR_GENERATOR, FR_T, FR_MOD)
FR_ROOT_OF_UNITY_INV = pow(FR_ROOT_OF_UNITY, FR_MOD - 2, FR_MOD)
# DELTA = g^{2^S}: generator of the order-T subgroup (used by the permutation
# argument to tag columns with distinct cosets; halo2's C::Scalar::DELTA).
FR_DELTA = pow(FR_GENERATOR, 1 << FR_S, FR_MOD)
# ZETA: a primitive cube root of unity (halo2's g_coset for the extended
# domain distinguished coset).
FR_ZETA = pow(FR_GENERATOR, (FR_MOD - 1) // 3, FR_MOD)
FR_TWO_INV = pow(2, FR_MOD - 2, FR_MOD)

# ---- Fq (base field) structure ----------------------------------------------
FQ_GENERATOR = 3
FQ_S = 1

# ---- curve equations ---------------------------------------------------------
# G1: y^2 = x^3 + 3 over Fq; generator (1, 2).
G1_B = 3
G1_GEN = (1, 2)

# G2: y^2 = x^3 + 3/(9+u) over Fq2 = Fq[u]/(u^2+1).
# Standard generator (c0 + c1*u coordinates):
G2_GEN_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_GEN_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

# BN parameter u and ate loop count 6u+2 (for the pairing).
BN_U = 4965661367192848881
ATE_LOOP_COUNT = 6 * BN_U + 2  # 29793968203157093288

# ---- Montgomery layout (device representation) -------------------------------
LIMB_BITS = 16
N_LIMBS = 16  # 16 * 16 = 256 bits
R_BITS = LIMB_BITS * N_LIMBS
R = 1 << R_BITS
LIMB_MASK = (1 << LIMB_BITS) - 1


def _n0inv(p: int) -> int:
    """-p^{-1} mod 2^LIMB_BITS (the Montgomery REDC low-word multiplier)."""
    return (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)


FR_R = R % FR_MOD
FR_R2 = (R * R) % FR_MOD
FR_N0INV = _n0inv(FR_MOD)

FQ_R = R % FQ_MOD
FQ_R2 = (R * R) % FQ_MOD
FQ_N0INV = _n0inv(FQ_MOD)


def fr_to_bytes(x: int) -> bytes:
    """Serialize an Fr element exactly like halo2curves `Fr::to_repr` (32B LE)."""
    return int(x % FR_MOD).to_bytes(32, "little")


def fr_from_bytes(b: bytes) -> int:
    x = int.from_bytes(b, "little")
    if x >= FR_MOD:
        raise ValueError("non-canonical Fr encoding")
    return x


def fq_to_bytes(x: int) -> bytes:
    return int(x % FQ_MOD).to_bytes(32, "little")


def fq_from_bytes(b: bytes) -> int:
    x = int.from_bytes(b, "little")
    if x >= FQ_MOD:
        raise ValueError("non-canonical Fq encoding")
    return x


def fr_from_u512(lo_hi: bytes) -> int:
    """Map 64 little-endian bytes to Fr by reduction mod r.

    Matches `Fr::from_bytes_wide` semantics used by Challenge255
    (reference: halo2 transcript squeeze, SURVEY.md section 2.2).
    """
    assert len(lo_hi) == 64
    return int.from_bytes(lo_hi, "little") % FR_MOD
