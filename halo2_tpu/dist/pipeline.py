"""A sharded end-to-end proving step (the multi-chip 'training step').

Stitches the sharded primitives into one jitted program with real shardings —
what a multi-chip prover phase does per advice column batch (SURVEY.md 3.2
phase 2 + 5's bulk work):

  1. inverse NTT each Lagrange column to coefficient form   (all_to_all x3)
  2. forward NTT back over the domain                        (all_to_all x3)
  3. a fused pointwise 'gate' over the sharded evaluations   (pure local VPU)
  4. KZG-style commitment of the gate values: Pippenger MSM
     over sharded SRS points                                 (all_gather)

Used by __graft_entry__.dryrun_multichip to validate that the full sharded
path compiles and executes on an N-device mesh.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..field import FR, mont
from ..field.limbs import mont_limbs_to_int
from .mesh import SHARD_AXIS
from .msm import msm_sharded
from .ntt import intt_sharded, ntt_sharded


def prove_step_sharded(mesh, advice_lagrange, PX, PY, k: int, omega: int):
    """advice_lagrange: [m, n, 16] Montgomery Fr, sharded P(None, 'shard').
    PX/PY: [n, 16] Montgomery Fq SRS points, sharded P('shard').
    Returns (gate_values [n,16] sharded, commitment Jacobian point)."""
    m = advice_lagrange.shape[0]
    cols = []
    for i in range(m):
        coeff = intt_sharded(advice_lagrange[i], k, omega, mesh)
        cols.append(ntt_sharded(coeff, k, omega, mesh))
    # pointwise toy gate l*r - o over the sharded evaluations (XLA keeps the
    # sharding; purely local work)
    acc = cols[0]
    for c in cols[1:]:
        acc = mont.mul(FR, acc, c)
    gate = mont.sub(FR, acc, cols[-1])
    # commit the (raw-form) gate values against the sharded SRS
    raw = mont.from_mont(FR, gate)
    com = msm_sharded(PX, PY, raw, mesh)
    return gate, com
