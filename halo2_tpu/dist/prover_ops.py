"""Mesh adapters that drop the sharded kernels into the real prover.

`create_proof(..., mesh=...)` wraps its Domain and ParamsKZG in these
adapters; everything downstream is unchanged.  This retires the round-1 toy
(dist/pipeline.py) as the multi-chip story: the actual `plonk.prover`
pipeline runs with

  * every basis conversion through the four-step sharded NTT (dist/ntt.py,
    three all_to_all transposes over ICI),
  * every commitment through the sharded MSM (dist/msm.py — window-partial
    all_gather on TPU, portable Pippenger + gather-fold elsewhere),
  * the quotient's pointwise gate evaluation under XLA auto-SPMD: extended
    arrays are device_put with the domain axis sharded, rotations
    (jnp.roll) lower to collective permutes.

Equivalent of scaling the reference's rayon-parallel `create_proof`
(/root/reference/circuits/src/utils.rs:105-120) across chips — a design the
reference has no analog of (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..field import FR, mont
from .mesh import SHARD_AXIS
from . import msm as dmsm
from . import ntt as dntt


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


class ShardedDomain:
    """Domain wrapper routing basis conversions through dist/ntt.py.

    Accepts the prover's [n, 16] and [m, n, 16] layouts; batches loop
    columns through one jitted sharded transform per (k, direction)."""

    def __init__(self, dom, mesh):
        self._dom = dom
        self.mesh = mesh

    def __getattr__(self, name):
        return getattr(self._dom, name)

    def _map(self, arr, fn):
        if arr.ndim == 2:
            return fn(arr)
        if arr.shape[0] == 0:
            return arr
        return jnp.stack([fn(arr[i]) for i in range(arr.shape[0])])

    def lagrange_to_coeff(self, values):
        d = self._dom
        return self._map(
            values, lambda a: dntt.intt_sharded(a, d.k, d.omega, self.mesh)
        )

    def coeff_to_lagrange(self, coeffs):
        d = self._dom
        return self._map(
            coeffs, lambda a: dntt.ntt_sharded(a, d.k, d.omega, self.mesh)
        )

    def coeff_to_extended(self, coeffs):
        from ..poly.domain import _distribute_zeta

        d = self._dom

        def one(a):
            padded = _distribute_zeta(a, False, d.extended_n - d.n)
            out = dntt.ntt_sharded(
                padded, d.extended_k, d.extended_omega, self.mesh
            )
            return self.shard_rows(out)

        return self._map(coeffs, one)

    def extended_to_coeff(self, values):
        from ..poly.domain import _distribute_zeta

        d = self._dom

        def one(a):
            coeffs = dntt.intt_sharded(a, d.extended_k, d.extended_omega, self.mesh)
            return _distribute_zeta(coeffs, True)

        return self._map(values, one)

    def shard_rows(self, arr):
        """Pin the domain axis sharding so downstream pointwise ops (the
        quotient's gate evaluation) run SPMD with rolls as collectives."""
        spec = P(SHARD_AXIS, None) if arr.ndim == 2 else P(None, SHARD_AXIS, None)
        return jax.device_put(arr, NamedSharding(self.mesh, spec))


class ShardedParams:
    """ParamsKZG wrapper routing commitments through dist/msm.py."""

    def __init__(self, params, mesh):
        self._params = params
        self.mesh = mesh

    def __getattr__(self, name):
        return getattr(self._params, name)

    def _msm_affine(self, PX, PY, raw):
        from ..ec import jax_g1 as g1
        from ..ec.msm_vec import use_vec_msm

        n = PX.shape[0]
        if n % self.mesh.devices.size:
            # tiny tails (h piece remainders etc.) fall back to one chip
            return self._params._msm_affine(PX, PY, raw)
        if _is_tpu() and use_vec_msm(n // self.mesh.devices.size):
            return dmsm.msm_sharded_vec(PX, PY, raw, self.mesh)
        return g1.point_to_host(dmsm.msm_sharded(PX, PY, raw, self.mesh))

    def commit_affine(self, coeffs_mont):
        m = coeffs_mont.shape[0]
        raw = mont.from_mont(FR, coeffs_mont)
        return self._msm_affine(self._params.g_x[:m], self._params.g_y[:m], raw)

    def commit_lagrange_affine(self, values_mont):
        assert values_mont.shape[0] == self._params.n
        raw = mont.from_mont(FR, values_mont)
        return self._msm_affine(self._params.gl_x, self._params.gl_y, raw)

    def _batch(self, PX, PY, values_batch):
        from ..ec import host as ec_host

        # sharded MSMs already fold per call; the loop just keeps transcript
        # order (device work for call i+1 overlaps call i's host fold)
        out = []
        for i in range(values_batch.shape[0]):
            raw = mont.from_mont(FR, values_batch[i])
            out.append(self._msm_affine(PX, PY, raw))
        return out

    def commit_lagrange_affine_batch(self, values_batch) -> list:
        assert values_batch.ndim == 3 and values_batch.shape[1] == self._params.n
        return self._batch(self._params.gl_x, self._params.gl_y, values_batch)

    def commit_affine_batch(self, coeffs_batch) -> list:
        assert coeffs_batch.ndim == 3
        q = coeffs_batch.shape[1]
        return self._batch(self._params.g_x[:q], self._params.g_y[:q], coeffs_batch)
