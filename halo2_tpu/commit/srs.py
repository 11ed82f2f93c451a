"""KZG structured reference string (ParamsKZG equivalent).

Replaces the reference's external `halo2_proofs::poly::kzg::ParamsKZG`
(SURVEY.md 2.2; consumed at reference: circuits/src/wasm.rs:49-55,79-80).
Like the reference's `ParamsKZG::new`, this is an UNSAFE test SRS: tau is
generated locally (here: deterministically from a seed, so runs are
reproducible; the reference draws it from an internal RNG).

TPU-first generation: powers of tau are built as a device prefix table, and
the 2^k fixed-base scalar multiplications run as one batched double-and-add
scan over the 256 precomputed doublings of the generator — no host loop over
points.  g_lagrange is derived in closed form from the known tau:
L_i(tau) = w^i (tau^n - 1) / (n (tau - w^i)), batch-inverted on device.

Byte format (documented; interop target is halo2's uncompressed layout):
  k: u32 LE | 2^k g points (64B uncompressed LE affine) | 2^k g_lagrange |
  g2 (128B) | s_g2 (128B).
"""

from __future__ import annotations

import functools
import hashlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, mont
from ..field.bn254 import FR_MOD
from ..field.limbs import ints_to_limbs, ints_to_mont_limbs
from ..ec import host as ec_host
from ..ec import jax_g1 as g1
from ..ec import msm as msm_mod
from ..poly.domain import get_domain
from ..poly.ntt import powers_table


@functools.lru_cache(maxsize=1)
def _gen_doubling_table():
    """[256] host affine doublings 2^b * G of the G1 generator."""
    pts = []
    P = ec_host.G1
    for _ in range(256):
        pts.append(P)
        P = ec_host.g1_double(P)
    return pts


@functools.lru_cache(maxsize=1)
def _gen_table_device():
    pts = _gen_doubling_table()
    X, Y, _ = g1.points_to_device(pts)
    return X, Y


@functools.partial(jax.jit, static_argnums=())
def _fixed_base_mul_batch(table_x, table_y, scalars_raw):
    """[n,16] raw scalars -> n Jacobian points scalar * G (scan over 256 bits)."""
    n = scalars_raw.shape[0]
    acc = g1.identity((n,))

    def body(acc, inputs):
        gx, gy, b = inputs
        limb = b // 16
        off = b % 16
        bits = (jax.lax.dynamic_index_in_dim(scalars_raw, limb, axis=1, keepdims=False) >> off) & 1
        P = (
            jnp.broadcast_to(gx[None, :], (n, 16)),
            jnp.broadcast_to(gy[None, :], (n, 16)),
            jnp.broadcast_to(jnp.asarray(g1._ONE)[None, :], (n, 16)),
        )
        cand = g1.padd(acc, P)
        acc = g1.select_point(bits != 0, cand, acc)
        return acc, None

    bs = jnp.arange(256, dtype=jnp.int32)
    acc, _ = jax.lax.scan(body, acc, (table_x, table_y, bs))
    return acc


@functools.partial(jax.jit, static_argnums=())
def _fixed_base_mul_batch_vec(table_x, table_y, scalars_raw):
    """Vec-layout (Pallas kernel) version of _fixed_base_mul_batch: [n, 16]
    raw scalars -> Jacobian (X, Y, Z) vec arrays [16, rows, 128].

    ~10x the throughput of the jnp-layout scan on TPU; used for SRS and
    bench point generation (n must be a multiple of 1024)."""
    from ..ec import g1_vec as gv
    from ..field import vec as fv

    n = scalars_raw.shape[0]
    rows = n // fv.LANES
    acc = gv.videntity(rows)
    one_col = jnp.asarray(gv._ONE_COL)

    def body(acc, inputs):
        gx, gy, b = inputs
        limb = b // 16
        off = b % 16
        bits = (
            jax.lax.dynamic_index_in_dim(scalars_raw, limb, axis=1, keepdims=False)
            >> off
        ) & 1  # [n]
        mask = bits.reshape(rows, fv.LANES) != 0
        P = (
            jnp.broadcast_to(gx[:, None, None], (16, rows, fv.LANES)),
            jnp.broadcast_to(gy[:, None, None], (16, rows, fv.LANES)),
            jnp.broadcast_to(one_col, (16, rows, fv.LANES)),
        )
        cand = gv.vpadd(acc, P)
        acc = gv.vselect(mask, cand, acc)
        return acc, None

    bs = jnp.arange(256, dtype=jnp.int32)
    acc, _ = jax.lax.scan(body, acc, (table_x, table_y, bs))
    return acc


def _fixed_base_affine_chunked(table_x, table_y, scalars_raw, chunk=1 << 16):
    """[n, 16] raw scalars -> device affine (X, Y) [n, 16] Montgomery arrays
    via the vec fixed-base scan, processed in 2^16-scalar chunks.

    The portable [n, 16]-layout scan (_fixed_base_mul_batch) crashes the TPU
    worker at n = 2^20 (reproducible XLA:TPU fault in the 256-step scan
    program; bisected 2026-08-20 round 3); the Pallas vec pipeline at 2^16
    chunks is the proven path (bench.py point generation) and ~10x faster.
    All chunks share one compiled program and stay device-resident.
    """
    n = scalars_raw.shape[0]
    assert n % 1024 == 0, n
    chunk = min(chunk, n)
    outs_x, outs_y = [], []
    for lo in range(0, n, chunk):
        X, Y, Z = _fixed_base_mul_batch_vec(table_x, table_y,
                                            scalars_raw[lo : lo + chunk])
        P = tuple(jnp.transpose(a.reshape(16, chunk), (1, 0)) for a in (X, Y, Z))
        ax, ay, _ = g1.to_affine_batch(P)
        outs_x.append(ax)
        outs_y.append(ay)
    if len(outs_x) == 1:
        return outs_x[0], outs_y[0]
    return jnp.concatenate(outs_x), jnp.concatenate(outs_y)


@dataclass(eq=False)
class ParamsKZG:
    """SRS held on device: g / g_lagrange as [n, 16] Montgomery coordinate
    arrays (affine), plus tiny host-side G2 elements."""

    k: int
    g_x: jnp.ndarray
    g_y: jnp.ndarray
    gl_x: jnp.ndarray
    gl_y: jnp.ndarray
    g2: tuple
    s_g2: tuple

    @property
    def n(self) -> int:
        return 1 << self.k

    # ---- generation -----------------------------------------------------------

    @staticmethod
    def setup(k: int, seed: bytes | int = b"halo2_tpu-unsafe-srs") -> "ParamsKZG":
        if isinstance(seed, int):
            seed = seed.to_bytes(32, "little")
        tau = int.from_bytes(
            hashlib.blake2b(seed, digest_size=64, person=b"halo2tpu-srs-tau").digest(),
            "little",
        ) % FR_MOD
        if tau in (0, 1):
            tau += 2
        return ParamsKZG.from_tau(k, tau)

    @staticmethod
    def from_tau(k: int, tau: int) -> "ParamsKZG":
        n = 1 << k
        dom = get_domain(k)
        if n <= 512 or jax.default_backend() != "tpu":
            # tiny SRS — and ANY SRS off-TPU: host bigint generation (native
            # C++ G1) beats compiling the 256-step fixed-base device scan
            # (minutes of XLA compile on a cold cache; the composed-jnp
            # fallback of the vec scan took HOURS on the 1-core CPU box for
            # k=10 — round-4 collatz e2e post-mortem)
            g_pows = []
            acc = 1
            for _ in range(n):
                g_pows.append(ec_host.g1_mul(ec_host.G1, acc))
                acc = acc * tau % FR_MOD
            c = dom.eval_vanishing(tau) * pow(n, -1, FR_MOD) % FR_MOD
            gl = []
            w = 1
            for i in range(n):
                li = w * c % FR_MOD * pow((tau - w) % FR_MOD, -1, FR_MOD) % FR_MOD
                gl.append(ec_host.g1_mul(ec_host.G1, li))
                w = w * dom.omega % FR_MOD
            gx, gy, _ = g1.points_to_device(g_pows)
            glx, gly, _ = g1.points_to_device(gl)
            return ParamsKZG(
                k=k, g_x=gx, g_y=gy, gl_x=glx, gl_y=gly,
                g2=ec_host.G2, s_g2=ec_host.g2_mul(ec_host.G2, tau),
            )
        tx, ty = _gen_table_device()

        # powers 1, tau, ..., tau^{n-1} (Montgomery, device) -> raw
        pw = powers_table(tau, k)
        pw_raw = mont.from_mont(FR, pw)
        gx, gy = _fixed_base_affine_chunked(tx, ty, pw_raw)

        # Lagrange basis at tau: L_i(tau) = w^i (tau^n - 1) / (n (tau - w^i))
        wpow = powers_table(dom.omega, k)  # [n,16] Montgomery
        c = dom.eval_vanishing(tau) * pow(n, -1, FR_MOD) % FR_MOD
        tau_m = jnp.asarray(ints_to_mont_limbs([tau], FR_MOD))
        c_m = jnp.asarray(ints_to_mont_limbs([c], FR_MOD))
        denom = mont.sub(FR, jnp.broadcast_to(tau_m, wpow.shape), wpow)
        li = mont.mul(FR, mont.mul(FR, wpow, mont.batch_inv(FR, denom)), c_m)
        li_raw = mont.from_mont(FR, li)
        glx, gly = _fixed_base_affine_chunked(tx, ty, li_raw)

        g2 = ec_host.G2
        s_g2 = ec_host.g2_mul(ec_host.G2, tau)
        return ParamsKZG(k=k, g_x=gx, g_y=gy, gl_x=glx, gl_y=gly, g2=g2, s_g2=s_g2)

    # ---- commitments ------------------------------------------------------------

    def commit(self, coeffs_mont):
        """Commit to a coefficient-basis poly ([m, 16] Montgomery, m <= n)."""
        m = coeffs_mont.shape[0]
        raw = mont.from_mont(FR, coeffs_mont)
        return msm_mod.msm_device(self.g_x[:m], self.g_y[:m], raw)

    def commit_lagrange(self, values_mont):
        """Commit to an evaluation-basis poly over the size-n domain."""
        assert values_mont.shape[0] == self.n
        raw = mont.from_mont(FR, values_mont)
        return msm_mod.msm_device(self.gl_x, self.gl_y, raw)

    # host-affine variants: the prover always converts commitments to host
    # affine points for the transcript, so these dispatch the MSM to the
    # production sort+scan pipeline (ec/msm_vec.py) on TPU at sizes where
    # its kernels pay for themselves, and to the portable Pippenger
    # elsewhere (identical group results either way).

    def _msm_affine(self, PX, PY, raw):
        from ..ec.msm_vec import use_vec_msm, msm_vec

        if use_vec_msm(PX.shape[0]):
            return msm_vec(PX, PY, raw)
        if jax.default_backend() != "tpu":
            from .. import native

            if native.lib() is not None:
                return self._msm_native_batch_async(PX, PY, raw[None], 1)()[0]
        return g1.point_to_host(msm_mod.msm_device(PX, PY, raw))

    def commit_affine(self, coeffs_mont):
        """commit() as a host affine point (or None)."""
        m = coeffs_mont.shape[0]
        raw = mont.from_mont(FR, coeffs_mont)
        return self._msm_affine(self.g_x[:m], self.g_y[:m], raw)

    def commit_lagrange_affine(self, values_mont):
        """commit_lagrange() as a host affine point (or None)."""
        assert values_mont.shape[0] == self.n
        raw = mont.from_mont(FR, values_mont)
        return self._msm_affine(self.gl_x, self.gl_y, raw)

    # batched variants: m MSMs dispatched without intermediate blocking and
    # ONE affine-normalization readback at the end — through the tunneled
    # relay this turns m round trips into 1 (the per-column commitment loop
    # is the prover's dominant dispatch cost at small k).

    def _msm_affine_batch(self, PX, PY, values_batch) -> list:
        return self._msm_affine_batch_async(PX, PY, values_batch)()

    def _msm_native_batch_async(self, PX, PY, raws, m):
        from .. import native
        from ..field.bn254 import FQ_MOD
        from ..field.limbs import limbs_to_ints, mont_limbs_to_ints

        xs = mont_limbs_to_ints(np.asarray(PX), FQ_MOD)
        ys = mont_limbs_to_ints(np.asarray(PY), FQ_MOD)
        pts = list(zip(xs, ys))
        raws_np = np.asarray(raws)

        def resolve() -> list:
            return [
                native.g1_msm(pts, limbs_to_ints(raws_np[i]))
                for i in range(m)
            ]

        return resolve

    def commit_lagrange_affine_batch(self, values_batch) -> list:
        """[m, n, 16] evaluation-basis polys -> m host affine points."""
        return self.commit_lagrange_affine_batch_async(values_batch)()

    def commit_affine_batch(self, coeffs_batch) -> list:
        """[m, q, 16] coefficient polys (q <= n) -> m host affine points."""
        return self.commit_affine_batch_async(coeffs_batch)()

    # async variants: dispatch every commitment program NOW, return a
    # zero-arg resolver for the host points.  The prover dispatches the next
    # phase's NTTs between dispatch and resolve so MSM execution + partial
    # readbacks + host folds overlap device work (SURVEY.md 2.3 "host
    # pipeline" row).

    def commit_lagrange_affine_batch_async(self, values_batch):
        assert values_batch.ndim == 3 and values_batch.shape[1] == self.n
        return self._msm_affine_batch_async(self.gl_x, self.gl_y, values_batch)

    def commit_affine_batch_async(self, coeffs_batch):
        assert coeffs_batch.ndim == 3
        q = coeffs_batch.shape[1]
        return self._msm_affine_batch_async(
            self.g_x[:q], self.g_y[:q], coeffs_batch
        )

    def _msm_affine_batch_async(self, PX, PY, values_batch):
        from ..ec.msm_vec import msm_vec_batch_async, use_vec_msm
        from ..field.bn254 import FQ_MOD
        from ..field.limbs import mont_limbs_to_int

        m = values_batch.shape[0]
        if m == 0:
            return lambda: []
        raws = mont.from_mont(FR, values_batch)
        if use_vec_msm(PX.shape[0]):
            return msm_vec_batch_async(PX, PY, [raws[i] for i in range(m)])
        if jax.default_backend() != "tpu":
            # off-TPU the native C++ Pippenger beats compiling the portable
            # device MSM by orders of magnitude (XLA:CPU took minutes per
            # shape on the 1-core box; the C++ MSM at n=2^10 is ~ms)
            from .. import native

            if native.lib() is not None:
                return self._msm_native_batch_async(PX, PY, raws, m)
        # portable path: all device programs dispatch asynchronously here;
        # only the resolver's np.asarray readbacks block
        pts = [msm_mod.msm_device(PX, PY, raws[i]) for i in range(m)]
        X = jnp.stack([p[0] for p in pts])
        Y = jnp.stack([p[1] for p in pts])
        Z = jnp.stack([p[2] for p in pts])
        ax, ay, inf = g1.to_affine_batch((X, Y, Z))

        def resolve() -> list:
            axn, ayn, infn = np.asarray(ax), np.asarray(ay), np.asarray(inf)
            out = []
            for i in range(m):
                if bool(infn[i]):
                    out.append(None)
                else:
                    out.append(
                        (
                            mont_limbs_to_int(axn[i], FQ_MOD),
                            mont_limbs_to_int(ayn[i], FQ_MOD),
                        )
                    )
            return out

        return resolve

    # ---- serialization ------------------------------------------------------------

    def write(self) -> bytes:
        """halo2_proofs rev 6b43b6b `ParamsKZG::write` byte layout, verified
        against the reference wasm's `setup()` output: k (u32 LE), 2^k g
        points then 2^k g_lagrange points as 64-byte MONTGOMERY-form x||y,
        then g2 and s_g2 as 128-byte Montgomery-form Fq2 coordinates."""
        from ..field.limbs import mont_limbs_to_ints

        out = bytearray()
        out += int(self.k).to_bytes(4, "little")
        for X, Y in ((self.g_x, self.g_y), (self.gl_x, self.gl_y)):
            xs = mont_limbs_to_ints(np.asarray(X), ec_host.Q)
            ys = mont_limbs_to_ints(np.asarray(Y), ec_host.Q)
            for x, y in zip(xs, ys):
                out += ec_host.g1_to_raw_bytes((x, y))
        out += ec_host.g2_to_raw_bytes(self.g2)
        out += ec_host.g2_to_raw_bytes(self.s_g2)
        return bytes(out)

    @staticmethod
    def read(data: bytes) -> "ParamsKZG":
        if len(data) < 4:
            raise ValueError("params too short")
        k = int.from_bytes(data[:4], "little")
        if k > 28:
            raise ValueError(f"params k={k} out of range")
        n = 1 << k
        if len(data) != 4 + 2 * n * 64 + 2 * 128:
            raise ValueError("params byte length mismatch")
        pos = 4
        groups = []
        for _ in range(2):
            pts = []
            for _ in range(n):
                pts.append(ec_host.g1_from_raw_bytes(data[pos : pos + 64]))
                pos += 64
            groups.append(pts)
        g2 = ec_host.g2_from_raw_bytes(data[pos : pos + 128]); pos += 128
        s_g2 = ec_host.g2_from_raw_bytes(data[pos : pos + 128]); pos += 128
        gx, gy, _ = g1.points_to_device(groups[0])
        glx, gly, _ = g1.points_to_device(groups[1])
        return ParamsKZG(k=k, g_x=gx, g_y=gy, gl_x=glx, gl_y=gly, g2=g2, s_g2=s_g2)
