"""On-chip check: block_reduce / block_scan_1024 vs host ground truth."""

import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from halo2_tpu.utils import enable_compilation_cache
from halo2_tpu.ec import host, g1_vec as gv
from halo2_tpu.field.bn254 import FQ_MOD
from halo2_tpu.field.limbs import int_to_mont_limbs, mont_limbs_to_int


def log(m):
    print(m, file=sys.stderr, flush=True)


def flat_points(pts, m):
    """host affine points (some None) -> flat [16, m] jacobian coords."""
    cols = {0: [], 1: [], 2: []}
    for p in pts:
        if p is None:
            x, y, z = 1, 1, 0
        else:
            x, y, z = p[0], p[1], 1
        for i, v in enumerate((x, y, z)):
            cols[i].append(int_to_mont_limbs(v, FQ_MOD))
    return tuple(
        jnp.asarray(np.stack(cols[i], axis=1).astype(np.uint32)) for i in range(3)
    )


def to_host(coords):
    x = mont_limbs_to_int(np.asarray(coords[0][:, 0]), FQ_MOD)
    y = mont_limbs_to_int(np.asarray(coords[1][:, 0]), FQ_MOD)
    z = mont_limbs_to_int(np.asarray(coords[2][:, 0]), FQ_MOD)
    return host.g1_jacobian_to_affine(x, y, z)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(7)
    ok = True

    # points [s_i]G with some identities and repeats
    for m in (1000, 1024, 65536):
        scal = [int(s) for s in rng.integers(0, 1 << 30, size=m)]
        scal[0] = 0  # identity in the mix (represented as None)
        if m > 2:
            scal[2] = scal[1]  # repeated point exercises doubling branch
        pts = [host.g1_mul(host.G1, s) for s in scal]
        P = flat_points(pts, m)
        t0 = time.time()
        got = to_host(gv.block_reduce(P, m))
        want = host.g1_mul(host.G1, sum(scal))
        good = got == want
        log(f"block_reduce m={m}: {'OK' if good else 'FAIL'} ({time.time()-t0:.0f}s)")
        ok &= good

    # scan: prefix at a few positions
    m = 1024
    scal = [int(s) for s in rng.integers(1, 1 << 20, size=m)]
    pts = [host.g1_mul(host.G1, s) for s in scal]
    P = flat_points(pts, m)
    t0 = time.time()
    pref = gv.block_scan_1024(P)
    prefnp = tuple(np.asarray(a) for a in pref)
    good = True
    for pos in (0, 1, 127, 128, 511, 1023):
        got = to_host(tuple(a[:, pos : pos + 1] for a in prefnp))
        want = host.g1_mul(host.G1, sum(scal[: pos + 1]))
        if got != want:
            good = False
            log(f"  scan mismatch at {pos}")
    log(f"block_scan_1024: {'OK' if good else 'FAIL'} ({time.time()-t0:.0f}s)")
    ok &= good
    log("BUTTERFLY ALL OK" if ok else "BUTTERFLY FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
