"""On-chip validation + timing of the round-4 MSM pipeline changes."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from halo2_tpu.utils import enable_compilation_cache, device_put_chunked

def log(m): print(m, file=sys.stderr, flush=True)
def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])

enable_compilation_cache()
log(f"backend: {jax.default_backend()}")
from halo2_tpu.ec import msm_vec as mv
from halo2_tpu.field.bn254 import FR_MOD
from halo2_tpu.field.limbs import ints_to_limbs
from halo2_tpu.ec import host as ec_host

d = np.load(".bench_cache/msm_points_k16.npz")
px, py = d["px"], d["py"]

# correctness at n=2^16: points are [i+1]G, so expected = (sum (i+1) s_i) G
n = 1 << 16
PX = device_put_chunked(px[:n]); PY = device_put_chunked(py[:n]); fence(PY)
rng = np.random.default_rng(77)
# full-range Fr scalars so the GLV k2 half and all windows are exercised
ss = [
    (int(a) | int(b) << 64 | int(c) << 128 | int(d) << 192) % FR_MOD
    for a, b, c, d in zip(*(rng.integers(0, 1 << 63, n) for _ in range(4)))
]
S = jnp.asarray(ints_to_limbs(ss))
t0 = time.perf_counter()
got = mv.msm_vec(PX, PY, S)
log(f"msm_vec 2^16 compile+run {time.perf_counter()-t0:.1f}s")
kexp = sum((i + 1) * s for i, s in enumerate(ss)) % FR_MOD
want = ec_host.g1_mul(ec_host.G1, kexp)
assert got == want, f"MISMATCH\n got={got}\nwant={want}"
log("CORRECT at 2^16 (glv auto)")

# timing at 2^20
k = 20
nb = 1 << k
reps_t = nb // px.shape[0]
tile = jax.jit(lambda a: jnp.tile(a, (reps_t, 1)))
PX20, PY20 = tile(device_put_chunked(px)), tile(device_put_chunked(py))
fence(PY20)
def rand_scalars(seed):
    @jax.jit
    def gen(key):
        bits = jax.random.bits(key, (nb, 16), dtype=jnp.uint32) & 0xFFFF
        mask = jnp.full((16,), 0xFFFF, jnp.uint32).at[15].set(0x2FFF)
        return bits & mask[None, :]
    return gen(jax.random.PRNGKey(seed))
scs = [rand_scalars(100 + i) for i in range(4)]
for s in scs: fence(s)
t0 = time.perf_counter()
np.asarray(mv._msm_window_partials_glv(PX20, PY20, scs[0], 16)[0])
log(f"msm 2^20 glv compile+first {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
outs = [mv._msm_window_partials_glv(PX20, PY20, s, 16)[0] for s in scs]
for o in outs: np.asarray(o)
ms = (time.perf_counter() - t0) / len(scs) * 1e3
log(f"msm 2^20: {ms:.2f} ms (chained avg of {len(scs)})")
