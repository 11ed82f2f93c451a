"""Sharded NTT: four-step (Cooley–Tukey n = R×C) over a 1-D device mesh.

Replaces the reference's single-threaded `best_fft` at scale (SURVEY.md 2.3
'Stage-parallel NTT').  Instead of translating the radix-2 butterfly loop and
exchanging per stage, the TPU formulation factors the transform so ALL
cross-device movement is three `all_to_all` transposes and all compute is the
existing batched local NTT (poly/ntt.py):

    x[j], j = j1*C + j2                 (rows j1 ∈ [R), cols j2 ∈ [C))
    A[k1, j2] = NTT_R over j1           (local: columns after transpose #0)
    B[k1, j2] = A[k1, j2] * omega^{j2*k1}   (pointwise twiddle)
    X[k1 + R*k2] = NTT_C over j2        (local: rows after transpose #1)
    transpose #2 restores natural contiguous-shard output order

Input/output convention: a [n, 16] Montgomery array sharded contiguously
along axis 0 (jax.sharding P('shard')); the result has the same sharding and
matches poly.ntt.ntt bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..field import FR, mont
from ..field.bn254 import FR_MOD
from ..field.limbs import int_to_mont_limbs
from ..poly.ntt import _bitrev_perm, _ntt_core, powers_table
from .mesh import SHARD_AXIS


def _split_rc(k: int, d: int) -> tuple[int, int]:
    """n = R*C with both R and C divisible by the device count d."""
    kr = (k + 1) // 2
    kc = k - kr
    dlog = (d - 1).bit_length()
    if (1 << kr) % d or (1 << kc) % d:
        kr = max(kr, dlog)
        kc = k - kr
        if kc < dlog:
            raise ValueError(f"domain 2^{k} too small for {d} devices")
    return 1 << kr, 1 << kc


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "scale_n_inv")
)
def _ntt_sharded_jit(a, tw_full, perm_r, tw_r, perm_c, tw_c,
                     k: int, mesh, scale_n_inv: bool):
    n = 1 << k
    d = mesh.devices.size
    R, C = _split_rc(k, d)
    kr, kc = R.bit_length() - 1, C.bit_length() - 1
    n_inv = jnp.asarray(int_to_mont_limbs(pow(n, -1, FR_MOD), FR_MOD))

    def local(x, tw):
        # x: [n/d, 16] contiguous shard = rows j1 ∈ [R/d) block of [R, C]
        x = x.reshape(R // d, C, 16)
        # transpose #0: -> [R, C/d] columns shard
        x = jax.lax.all_to_all(x, SHARD_AXIS, split_axis=1, concat_axis=0,
                               tiled=True)
        # local column NTTs (length R along axis 0): batch over C/d columns
        x = jnp.moveaxis(x, 0, 1)  # [C/d, R, 16]
        x = _ntt_core(x, perm_r, tw_r, kr)
        # twiddle: T[j2, k1] = omega^{j2 * k1}, j2 global
        me = jax.lax.axis_index(SHARD_AXIS)
        j2 = me * (C // d) + jnp.arange(C // d, dtype=jnp.uint32)[:, None]
        k1 = jnp.arange(R, dtype=jnp.uint32)[None, :]
        idx = (j2 * k1) % np.uint32(n) if n < (1 << 31) else (
            (j2.astype(jnp.uint64) * k1.astype(jnp.uint64)) % np.uint64(n)
        ).astype(jnp.uint32)
        x = mont.mul(FR, x, tw[idx.astype(jnp.int32)])
        # transpose #1: [C/d, R] -> [C, R/d]
        x = jax.lax.all_to_all(x, SHARD_AXIS, split_axis=1, concat_axis=0,
                               tiled=True)
        # local row NTTs (length C over j2): batch over R/d rows
        x = jnp.moveaxis(x, 0, 1)  # [R/d, C, 16]
        x = _ntt_core(x, perm_c, tw_c, kc)
        # x[k1_local, k2] = X[k1 + R*k2]; natural order is k2-major:
        # transpose #2: gather all k1 for a k2 block, then transpose locally
        x = jax.lax.all_to_all(x, SHARD_AXIS, split_axis=1, concat_axis=0,
                               tiled=True)  # [R, C/d, 16]
        x = jnp.moveaxis(x, 0, 1)  # [C/d, R, 16]
        out = x.reshape(C // d * R, 16)
        if scale_n_inv:
            out = mont.mul(FR, out, n_inv[None, :])
        return out

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P()),
        out_specs=P(SHARD_AXIS),
        check_vma=False,
    )
    return fn(a, tw_full)


def _tables(k: int, omega: int, d: int):
    """All host/cached tables needed by one sharded transform, built OUTSIDE
    any trace (the builders cache their jitted results)."""
    R, C = _split_rc(k, d)
    kr, kc = R.bit_length() - 1, C.bit_length() - 1
    omega_r = pow(omega, C, FR_MOD)
    omega_c = pow(omega, R, FR_MOD)
    return (
        powers_table(omega, k),
        jnp.asarray(_bitrev_perm(kr)),
        powers_table(omega_r, max(kr - 1, 0)),
        jnp.asarray(_bitrev_perm(kc)),
        powers_table(omega_c, max(kc - 1, 0)),
    )


def ntt_sharded(a, k: int, omega: int, mesh):
    """Forward NTT of a [n, 16] array sharded along axis 0 over `mesh`."""
    assert a.shape == (1 << k, 16)
    d = mesh.devices.size
    return _ntt_sharded_jit(a, *_tables(k, omega, d), k, mesh, False)


def intt_sharded(a, k: int, omega: int, mesh):
    """Inverse NTT (scaled by n^{-1}), same layout as ntt_sharded."""
    omega_inv = pow(omega, -1, FR_MOD)
    d = mesh.devices.size
    return _ntt_sharded_jit(a, *_tables(k, omega_inv, d), k, mesh, True)
