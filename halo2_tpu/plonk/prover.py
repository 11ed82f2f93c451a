"""The PLONKish prover pipeline.

Equivalent of the reference's external `create_proof` (SURVEY.md 3.2 — the
phase order there is the specification).  Host orchestrates the transcript;
every bulk step (column NTTs, commitments/MSMs, grand products, the fused
quotient evaluation) runs on device.

Phases (no lookups in the reference circuits — lookup phases are empty):
  1. absorb vk digest + instance values (KZG hashes instances, no commit);
  2. synthesize witness, blind the last bf+1 rows, commit advice columns;
  3. theta (lookups: none);
  4. beta, gamma; permutation grand-product commitments;
  5. vanishing random-poly commitment; y; fused quotient; h piece commitments;
  6. x; evaluations (advice, fixed, random, sigmas, z chains);
  7. multiopen (GWC or SHPLONK).
"""

from __future__ import annotations

import hashlib
import os

import jax.numpy as jnp
import numpy as np

from ..commit import gwc, shplonk
from ..commit.srs import ParamsKZG
from ..field import FR, mont
from ..field.bn254 import FR_MOD
from ..field.limbs import ints_to_mont_limbs, mont_limbs_to_int
from ..frontend import synthesize
from ..poly.ops import eval_grouped, eval_polys_at, scalar_mont
from ..transcript import Blake2bWrite
from ..utils.profiling import PhaseTimer
from . import lookup_dev
from .evaluation import quotient_ext
from .keygen import ProvingKey
from .permutation import z_polys


class DeterministicRng:
    """Blake2b-stream RNG so proofs are reproducible under a fixed seed
    (the reference uses OsRng — SURVEY.md 7.3 hard part #1)."""

    def __init__(self, seed: bytes | None):
        self._seed = seed if seed is not None else os.urandom(32)
        self._ctr = 0

    def field_elements(self, count: int) -> list[int]:
        out = []
        for _ in range(count):
            h = hashlib.blake2b(
                self._seed + self._ctr.to_bytes(8, "little"), digest_size=64
            ).digest()
            self._ctr += 1
            out.append(int.from_bytes(h, "little") % FR_MOD)
        return out

    def unused_blind(self, count: int = 1) -> None:
        """halo2 create_proof draws `Blind(..)` values that KZG commitment
        ignores.  A no-op here; parity.rustrng.RustStreamRng (which replays
        the wasm harness's OsRng stream for the byte-identity ground-truth
        test) consumes the stream at these call sites."""

    def random_poly_coeffs(self, n: int) -> list[int]:
        """Coefficients for the vanishing argument's random poly (halo2
        seeds a per-thread ChaCha20Rng here; for the deterministic lane the
        distinction is irrelevant — any stream works)."""
        return self.field_elements(n)


def _commit_lagrange_async(params, batch):
    """Async batched commit when params supports it (ParamsKZG); sharded /
    wrapped params fall back to an immediate resolve."""
    fn = getattr(params, "commit_lagrange_affine_batch_async", None)
    if fn is not None:
        return fn(batch)
    out = params.commit_lagrange_affine_batch(batch)
    return lambda: out


def _to_device_columns(cols, n):
    if not cols:
        return jnp.zeros((0, n, 16), dtype=jnp.uint32)
    return jnp.asarray(np.stack([ints_to_mont_limbs(c, FR_MOD) for c in cols]))


def create_proof(
    params: ParamsKZG,
    pk: ProvingKey,
    circuit,
    instances: list[list[int]],
    scheme: str = "gwc",
    rng_seed: bytes | None = None,
    mesh=None,
    rng=None,
) -> bytes:
    """mesh: optional jax.sharding.Mesh — basis conversions run through the
    sharded four-step NTT, commitments through the sharded MSM, and the
    quotient's pointwise evaluation under auto-SPMD (dist/prover_ops.py).
    Proof bytes are identical to the single-device path."""
    cs = pk.vk.cs
    dom = pk.vk.domain
    if mesh is not None:
        from ..dist.prover_ops import ShardedDomain, ShardedParams

        dom = ShardedDomain(dom, mesh)
        params = ShardedParams(params, mesh)
    k, n = pk.vk.k, 1 << pk.vk.k
    bf = cs.blinding_factors()
    u = pk.vk.usable_row
    if rng is None:
        rng = DeterministicRng(rng_seed)
    timer = PhaseTimer()

    transcript = Blake2bWrite()
    transcript.common_scalar(pk.vk.transcript_repr)

    # ---- instances (KZG: hashed, not committed) ---------------------------------
    instances = [
        [v % FR_MOD for v in col] for col in instances
    ]
    if len(instances) != cs.num_instance:
        raise ValueError("instance column count mismatch")
    for col in instances:
        if len(col) > u:
            raise ValueError("instance too large")
        for v in col:
            transcript.common_scalar(v)
    instance_full = [col + [0] * (n - len(col)) for col in instances]
    instance_lagrange = _to_device_columns(instance_full, n)
    instance_coeff = dom.lagrange_to_coeff(instance_lagrange) if cs.num_instance else instance_lagrange
    instance_ext = dom.coeff_to_extended(instance_coeff) if cs.num_instance else instance_lagrange

    # ---- advice synthesis + blinding + commitments --------------------------------
    cs2_config = _reconfigure(circuit, cs)
    asg = synthesize(circuit, cs, cs2_config, k, instances=instance_full)
    advice_cols = []
    blind_rows = rng.field_elements((n - u) * cs.num_advice)
    bi = 0
    for col in asg.advice:
        vals = [0 if v is None else v for v in col]
        for row in range(u, n):
            vals[row] = blind_rows[bi]
            bi += 1
        advice_cols.append(vals)
    rng.unused_blind(cs.num_advice)  # halo2: per-column Blind draws
    advice_lagrange = _to_device_columns(advice_cols, n)
    # dispatch the commitment MSMs, queue the basis-conversion NTTs behind
    # them, then resolve: the NTTs run while the host waits on / folds the
    # MSM partials (SURVEY.md 2.3 host-pipeline overlap)
    resolve_advice = _commit_lagrange_async(params, advice_lagrange)
    advice_coeff = dom.lagrange_to_coeff(advice_lagrange)
    advice_ext = dom.coeff_to_extended(advice_coeff)
    for com in resolve_advice():
        transcript.write_point(com)
    timer.mark("prove.advice")

    # ---- theta; lookup permuted columns -----------------------------------------------
    # witness generation runs on device (lookup_dev): expression eval +
    # theta-fold, 16-key lexicographic sort, permuted-pair construction and
    # (after beta/gamma) the z prefix scan.  Values are identical to the host
    # path in plonk/lookup.py (tests cross-check them).
    theta = transcript.squeeze_challenge()

    lookups_data = []  # per lookup: device arrays
    for (_name, pairs) in cs.lookups:
        A_dev = lookup_dev.compress_lagrange(
            [i for i, _ in pairs], theta, pk.fixed_lagrange, advice_lagrange,
            instance_lagrange, n,
        )
        S_dev = lookup_dev.compress_lagrange(
            [t for _, t in pairs], theta, pk.fixed_lagrange, advice_lagrange,
            instance_lagrange, n,
        )
        ap_u, sp_u = lookup_dev.permute_pair_dev(A_dev, S_dev, u)
        a_blind = jnp.asarray(
            ints_to_mont_limbs(rng.field_elements(n - u), FR_MOD)
        )
        s_blind = jnp.asarray(
            ints_to_mont_limbs(rng.field_elements(n - u), FR_MOD)
        )
        rng.unused_blind(2)  # halo2: permuted input + table Blind draws
        a_dev = jnp.concatenate([ap_u, a_blind], axis=0)
        s_dev = jnp.concatenate([sp_u, s_blind], axis=0)
        lookups_data.append(
            {"A_dev": A_dev, "S_dev": S_dev, "ap_u": ap_u, "sp_u": sp_u,
             "a_dev": a_dev, "s_dev": s_dev}
        )
    if lookups_data:  # batched commits, written in the per-lookup a, s order
        batch = jnp.stack(
            [col for ld in lookups_data for col in (ld["a_dev"], ld["s_dev"])]
        )
        for com in params.commit_lagrange_affine_batch(batch):
            transcript.write_point(com)

    timer.mark("prove.lookup_permute")

    # ---- beta, gamma; permutation z polys ---------------------------------------------
    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    perm_cols = cs.permutation_columns
    perm_values = _gather_permutation_values(
        perm_cols, advice_lagrange, pk.fixed_lagrange, instance_lagrange, n
    )
    zs = []
    resolve_zs = lambda: []  # noqa: E731
    if perm_cols:
        chunk_len = cs.permutation_chunk_len()
        zs = z_polys(perm_values, pk.sigma_lagrange, beta, gamma, chunk_len, k, u)
        # blind z rows n-bf..n-1
        blinded = []
        for z in zs:
            rand = ints_to_mont_limbs(rng.field_elements(bf), FR_MOD)
            rng.unused_blind(1)  # halo2: per-chunk z Blind draw
            z = z.at[n - bf :, :].set(jnp.asarray(rand))
            blinded.append(z)
        zs = blinded
        resolve_zs = _commit_lagrange_async(params, jnp.stack(zs))
    # dispatch the z/permutation NTT chains now — they depend only on zs,
    # so they execute while the z commitment partials compute (their
    # transcript writes happen below, in the unchanged protocol order)
    z_coeffs = [dom.lagrange_to_coeff(z) for z in zs]
    z_exts = [dom.coeff_to_extended(zc) for zc in z_coeffs]
    perm_value_coeff = dom.lagrange_to_coeff(perm_values) if perm_cols else perm_values
    perm_value_ext = dom.coeff_to_extended(perm_value_coeff) if perm_cols else perm_values
    for com in resolve_zs():
        transcript.write_point(com)

    # ---- lookup grand products ---------------------------------------------------------
    for ld in lookups_data:
        z_u = lookup_dev.lookup_z_dev(
            ld["A_dev"], ld["S_dev"], ld["ap_u"], ld["sp_u"], beta, gamma, u
        )  # [u+1, 16]
        z_blind = jnp.asarray(
            ints_to_mont_limbs(rng.field_elements(n - (u + 1)), FR_MOD)
        )
        rng.unused_blind(1)  # halo2: lookup product Blind draw
        ld["z_dev"] = jnp.concatenate([z_u, z_blind], axis=0)
    if lookups_data:
        batch = jnp.stack([ld["z_dev"] for ld in lookups_data])
        for com in params.commit_lagrange_affine_batch(batch):
            transcript.write_point(com)

    timer.mark("prove.grand_products")

    # ---- vanishing: random poly, y, quotient -------------------------------------------
    random_coeffs = rng.random_poly_coeffs(n)
    rng.unused_blind(1)  # halo2: random-poly Blind draw
    random_poly = jnp.asarray(ints_to_mont_limbs(random_coeffs, FR_MOD))
    transcript.write_point(params.commit_affine(random_poly))
    y = transcript.squeeze_challenge()

    lookup_exts = []
    for ld in lookups_data:
        ld["a_perm_coeff"] = dom.lagrange_to_coeff(ld["a_dev"])
        ld["s_perm_coeff"] = dom.lagrange_to_coeff(ld["s_dev"])
        ld["z_coeff"] = dom.lagrange_to_coeff(ld["z_dev"])
        lookup_exts.append(
            {
                "a_perm": dom.coeff_to_extended(ld["a_perm_coeff"]),
                "s_perm": dom.coeff_to_extended(ld["s_perm_coeff"]),
                "z": dom.coeff_to_extended(ld["z_coeff"]),
            }
        )
        # the lagrange-basis lookup working set (compressed inputs, permuted
        # pairs, z values) is dead once the coeff forms exist — free ~6
        # domain-size arrays per lookup before the quotient's extended work
        for key in ("A_dev", "S_dev", "ap_u", "sp_u", "a_dev", "s_dev",
                    "z_dev"):
            ld.pop(key, None)

    h_ext = quotient_ext(
        pk, advice_ext, instance_ext, z_exts, perm_value_ext, y, beta, gamma,
        lookup_exts=lookup_exts, lookup_theta=theta, mesh=mesh,
    )
    # the extended-domain working set is dead after the quotient — drop it
    # before the h NTT/commit and evaluations (at k=20 each extended array
    # is ~256 MB and HBM is the binding resource; the round-4 k=20 run
    # OOM'd at eval_grouped with these still referenced)
    del advice_ext, instance_ext, z_exts, perm_value_ext, lookup_exts
    h_coeff_full = dom.extended_to_coeff(h_ext)
    del h_ext
    qd = cs.degree() - 1
    h_pieces = [h_coeff_full[i * n : (i + 1) * n] for i in range(qd)]
    del h_coeff_full
    rng.unused_blind(qd)  # halo2: per-piece h Blind draws
    for com in params.commit_affine_batch(jnp.stack(h_pieces)):
        transcript.write_point(com)

    timer.mark("prove.quotient")

    # ---- x and evaluations ------------------------------------------------------------
    x = transcript.squeeze_challenge()
    x_next = dom.rotate_omega(x, 1)
    x_last = dom.rotate_omega(x, -(bf + 1))
    x_inv = dom.rotate_omega(x, -1)
    h_combined = _combine_h(h_pieces, x, n)

    # Every opened polynomial is evaluated in ONE batched device pass with a
    # single readback (eval_grouped): register (key, poly, point) requests,
    # group them by point, then write the transcript in halo2's order.
    order: list[tuple] = []  # (key, point) in registration order
    req_polys: dict = {}

    def req(key, poly, point):
        order.append((key, point))
        req_polys[key] = poly

    for (col, rot) in cs.advice_queries:
        req(("advice", col, rot), advice_coeff[col], dom.rotate_omega(x, rot))
    for (col, rot) in cs.fixed_queries:
        req(("fixed", col, rot), pk.fixed_coeff[col], dom.rotate_omega(x, rot))
    req(("random",), random_poly, x)
    for i in range(len(perm_cols)):
        req(("sigma", i), pk.sigma_coeff[i], x)
    for i, zc in enumerate(z_coeffs):
        req(("z", i, "x"), zc, x)
        req(("z", i, "next"), zc, x_next)
        if i < len(z_coeffs) - 1:
            req(("z", i, "last"), zc, x_last)
    for li, ld in enumerate(lookups_data):
        req(("lz", li, "x"), ld["z_coeff"], x)
        req(("lz", li, "next"), ld["z_coeff"], x_next)
        req(("la", li, "x"), ld["a_perm_coeff"], x)
        req(("la", li, "inv"), ld["a_perm_coeff"], x_inv)
        req(("ls", li, "x"), ld["s_perm_coeff"], x)
    req(("h",), h_combined, x)

    pt_order: list[int] = []
    pt_keys: dict = {}
    for key, point in order:
        if point not in pt_keys:
            pt_keys[point] = []
            pt_order.append(point)
        pt_keys[point].append(key)
    results = eval_grouped(
        [(p, [req_polys[kk] for kk in pt_keys[p]]) for p in pt_order]
    )
    evals = {}
    for p, vals in zip(pt_order, results):
        for kk, v in zip(pt_keys[p], vals):
            evals[kk] = v

    # transcript writes, in the reference create_proof order
    advice_evals = {}
    for (col, rot) in cs.advice_queries:
        ev = evals[("advice", col, rot)]
        advice_evals[(col, rot)] = ev
        transcript.write_scalar(ev)
    fixed_evals = {}
    for (col, rot) in cs.fixed_queries:
        ev = evals[("fixed", col, rot)]
        fixed_evals[(col, rot)] = ev
        transcript.write_scalar(ev)
    random_eval = evals[("random",)]
    transcript.write_scalar(random_eval)
    sigma_evals = []
    for i in range(len(perm_cols)):
        sigma_evals.append(evals[("sigma", i)])
        transcript.write_scalar(sigma_evals[-1])
    z_evals = []
    for i in range(len(z_coeffs)):
        entry = {"x": evals[("z", i, "x")], "next": evals[("z", i, "next")]}
        transcript.write_scalar(entry["x"])
        transcript.write_scalar(entry["next"])
        if i < len(z_coeffs) - 1:
            entry["last"] = evals[("z", i, "last")]
            transcript.write_scalar(entry["last"])
        z_evals.append(entry)
    for li, ld in enumerate(lookups_data):
        ld["ev"] = {
            "z": evals[("lz", li, "x")],
            "z_next": evals[("lz", li, "next")],
            "a": evals[("la", li, "x")],
            "a_inv": evals[("la", li, "inv")],
            "s": evals[("ls", li, "x")],
        }
        for key in ("z", "z_next", "a", "a_inv", "s"):
            transcript.write_scalar(ld["ev"][key])

    # ---- multiopen query assembly (order mirrors halo2 create_proof) ----------------
    # Query format: (label, poly, point, eval).  Labels give polys a stable
    # identity so SHPLONK's rotation-set grouping matches between prover and
    # verifier.
    queries = []
    for (col, rot) in cs.advice_queries:
        pt = dom.rotate_omega(x, rot)
        queries.append((f"advice{col}", advice_coeff[col], pt, advice_evals[(col, rot)]))
    # permutation prover opens: z(x), z(x_next) per set; then rev-skip-1 z(x_last)
    for i, zc in enumerate(z_coeffs):
        queries.append((f"z{i}", zc, x, z_evals[i]["x"]))
        queries.append((f"z{i}", zc, x_next, z_evals[i]["next"]))
    for i in range(len(z_coeffs) - 2, -1, -1):
        queries.append((f"z{i}", z_coeffs[i], x_last, z_evals[i]["last"]))
    # lookup opens: z@x, A'@x, S'@x, A'@x_inv, z@x_next (halo2 order)
    for li, ld in enumerate(lookups_data):
        ev = ld["ev"]
        queries.append((f"lz{li}", ld["z_coeff"], x, ev["z"]))
        queries.append((f"la{li}", ld["a_perm_coeff"], x, ev["a"]))
        queries.append((f"ls{li}", ld["s_perm_coeff"], x, ev["s"]))
        queries.append((f"la{li}", ld["a_perm_coeff"], x_inv, ev["a_inv"]))
        queries.append((f"lz{li}", ld["z_coeff"], x_next, ev["z_next"]))
    for (col, rot) in cs.fixed_queries:
        pt = dom.rotate_omega(x, rot)
        queries.append((f"fixed{col}", pk.fixed_coeff[col], pt, fixed_evals[(col, rot)]))
    for i in range(len(perm_cols)):
        queries.append((f"sigma{i}", pk.sigma_coeff[i], x, sigma_evals[i]))
    # vanishing: combined h poly then random poly
    h_eval = evals[("h",)]
    queries.append(("h", h_combined, x, h_eval))
    queries.append(("random", random_poly, x, random_eval))

    timer.mark("prove.evals")
    if scheme == "gwc":
        gwc.open_gwc(params, transcript, queries, k, dom.omega)
    elif scheme == "shplonk":
        shplonk.open_shplonk(params, transcript, queries, k, dom.omega)
    else:
        raise ValueError(f"unknown multiopen scheme {scheme}")
    timer.mark("prove.multiopen")

    return transcript.finalize()


def _reconfigure(circuit, cs):
    """Build the circuit's config against the already-finalized CS by running
    configure on a throwaway CS and re-mapping nothing — configure must be
    deterministic, so the column objects in the fresh config coincide with the
    ones registered in `cs` (same indices/kinds)."""
    from ..frontend import ConstraintSystem

    tmp = ConstraintSystem()
    return type(circuit).configure(tmp)


def _eval_single(coeff_poly, point: int) -> int:
    out = eval_polys_at(coeff_poly[None, :, :], scalar_mont(point))
    return mont_limbs_to_int(np.asarray(out)[0], FR_MOD)


def _combine_h(h_pieces, x: int, n: int):
    """sum_i x^{n i} h_i — a degree < n coefficient poly."""
    acc = None
    coeff = 1
    for piece in h_pieces:
        term = mont.mul(FR, piece, scalar_mont(coeff)[None, :])
        acc = term if acc is None else mont.add(FR, acc, term)
        coeff = coeff * pow(x, n, FR_MOD) % FR_MOD
    return acc


def _gather_permutation_values(perm_cols, advice_lagrange, fixed_lagrange,
                               instance_lagrange, n):
    if not perm_cols:
        return jnp.zeros((0, n, 16), dtype=jnp.uint32)
    rows = []
    for c in perm_cols:
        if c.kind == "advice":
            rows.append(advice_lagrange[c.index])
        elif c.kind == "fixed":
            rows.append(fixed_lagrange[c.index])
        else:
            rows.append(instance_lagrange[c.index])
    return jnp.stack(rows)
