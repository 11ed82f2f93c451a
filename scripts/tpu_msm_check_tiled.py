"""On-chip validation + timing of the TILED MSM grouping pipeline (c=13).

Correctness at n=2^18 (GLV stream 2^19 -> ntiles=2 at TILE_SORT=2^18, so the
cross-tile telescope cancellation is actually exercised): points are
[(i mod 2^16)+1]G tiles, so expected = (sum_i s_i*((i mod 2^16)+1)) G in
closed form.  Then chained-avg timing at 2^20 with c=13 (tiled) for direct
comparison against the c=16 global-sort numbers.
"""
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
nb16 = px.shape[0]

if os.environ.get("TILED_CORRECTNESS", "1") != "0":
    k = 18
    n = 1 << k
    reps_t = n // nb16
    tile = jax.jit(lambda a: jnp.tile(a, (reps_t, 1)))
    PX = tile(device_put_chunked(px)); PY = tile(device_put_chunked(py))
    fence(PY)
    rng = np.random.default_rng(123)
    # FULL-range Fr scalars (advisor r04): < 2^62 scalars make the GLV k2
    # half identically zero, leaving phi(P) lanes and the upper windows
    # unexercised — assemble 256-bit values from four 64-bit draws
    ss = [
        int(a) | int(b) << 64 | int(c) << 128 | int(d) << 192
        for a, b, c, d in zip(*(rng.integers(0, 1 << 63, n) for _ in range(4)))
    ]
    ss = [s % FR_MOD for s in ss]
    S = jnp.asarray(ints_to_limbs(ss))
    t0 = time.perf_counter()
    got = mv.msm_vec(PX, PY, S)  # default c=13 -> tiled, glv
    log(f"msm_vec 2^{k} (tiled, ntiles>1) compile+run {time.perf_counter()-t0:.1f}s")
    kexp = sum(s * ((i % nb16) + 1) for i, s in enumerate(ss)) % FR_MOD
    want = ec_host.g1_mul(ec_host.G1, kexp)
    assert got == want, f"MISMATCH\n got={got}\nwant={want}"
    log(f"CORRECT at 2^{k} with cross-tile telescope")

# timing at 2^20, c=13 tiled
k = 20
nbig = 1 << k
reps_t = nbig // nb16
tile = jax.jit(lambda a: jnp.tile(a, (reps_t, 1)))
PX20, PY20 = tile(device_put_chunked(px)), tile(device_put_chunked(py))
fence(PY20)
def rand_scalars(seed):
    @jax.jit
    def gen(key):
        bits = jax.random.bits(key, (nbig, 16), dtype=jnp.uint32) & 0xFFFF
        mask = jnp.full((16,), 0xFFFF, jnp.uint32).at[15].set(0x2FFF)
        return bits & mask[None, :]
    return gen(jax.random.PRNGKey(seed))
scs = [rand_scalars(200 + i) for i in range(int(os.environ.get("REPS", "4")))]
for s in scs: fence(s)
t0 = time.perf_counter()
np.asarray(mv._msm_window_partials_glv(PX20, PY20, scs[0], 13)[0])
log(f"msm 2^20 glv c=13 tiled compile+first {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
outs = [mv._msm_window_partials_glv(PX20, PY20, s, 13)[0] for s in scs]
for o in outs: np.asarray(o)
ms = (time.perf_counter() - t0) / len(scs) * 1e3
log(f"msm 2^20 (c=13 tiled): {ms:.2f} ms (chained avg of {len(scs)})")
