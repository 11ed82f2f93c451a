"""Multi-chip parallelism: device mesh helpers, sharded NTT, sharded MSM.

The reference has no distributed code at all (SURVEY.md 2.3 — its only
parallelism is rayon threads inside the external `halo2_proofs`).  This
package is the TPU-native scaling story: the polynomial evaluation-domain
axis and the MSM point axis are sharded over a `jax.sharding.Mesh`, with XLA
collectives (`all_to_all` for NTT stage transposes, `all_gather` for MSM
partial reduction) riding ICI.
"""

from .mesh import make_mesh, shard_axis
from .msm import msm_sharded, msm_sharded_vec
from .ntt import intt_sharded, ntt_sharded
from .prover_ops import ShardedDomain, ShardedParams

__all__ = [
    "make_mesh",
    "shard_axis",
    "ntt_sharded",
    "intt_sharded",
    "msm_sharded",
    "msm_sharded_vec",
    "ShardedDomain",
    "ShardedParams",
]
