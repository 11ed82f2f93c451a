"""Keygen: verifying key + proving key.

Equivalent of the reference's external `keygen_vk`/`keygen_pk`
(SURVEY.md 3.2: "keygen EVERY prove call", utils.rs:63-70): runs
configure + a witness-free synthesis, commits the fixed columns (selectors
included as dedicated fixed columns — see constraint_system.py divergence
note), builds the permutation sigma polynomials, and precomputes the
extended-coset tables the prover needs (fixed/sigma cosets, l_0 / l_last /
l_active_row).

vk.transcript_repr: Blake2b("Halo2-Verify-Key") over the u64-length-prefixed
`format!("{:?}", vk.pinned())` string, replicating Rust's Debug formatting of
PinnedVerificationKey byte-for-byte (format recovered from the reference's
checked-in wasm — see plonk/pinned.py for provenance and residual risk).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..commit.srs import ParamsKZG
from ..ec import host as ec_host
from ..field.bn254 import FR_MOD, fr_from_u512
from ..field.limbs import ints_to_mont_limbs
from ..frontend import ConstraintSystem, synthesize
from ..poly.domain import Domain, get_domain
from ..poly.ntt import powers_table
from .permutation import PermutationAssembly


@dataclass(eq=False)
class VerifyingKey:
    k: int
    cs: ConstraintSystem
    domain: Domain
    fixed_commitments: list
    permutation_commitments: list
    transcript_repr: int
    usable_row: int  # u = n - (blinding_factors + 1)

    def write(self) -> bytes:
        """Serialize to bytes (checkpoint subsystem, SURVEY.md §5).

        Like halo2's VerifyingKey::read, deserialization needs the circuit
        (the ConstraintSystem is structural, not serialized): pass the same
        witness-free circuit to `VerifyingKey.read`."""
        out = bytearray()
        out += b"h2tpuVK1"
        out += self.k.to_bytes(4, "little")
        for group in (self.fixed_commitments, self.permutation_commitments):
            out += len(group).to_bytes(4, "little")
            for pt in group:
                out += ec_host.g1_to_uncompressed(pt)
        return bytes(out)

    @staticmethod
    def read(data: bytes, circuit) -> "VerifyingKey":
        if data[:8] != b"h2tpuVK1":
            raise ValueError("bad vk magic")
        k = int.from_bytes(data[8:12], "little")
        pos = 12
        groups = []
        for _ in range(2):
            count = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            pts = []
            for _ in range(count):
                pts.append(ec_host.g1_from_uncompressed(data[pos : pos + 64]))
                pos += 64
            groups.append(pts)
        cs = ConstraintSystem()
        config = type(circuit).configure(cs)
        # selector compression depends on activation rows: re-synthesize the
        # witness-free circuit exactly like keygen (deterministic)
        asg = synthesize(circuit, cs, config, k, instances=None)
        cs.compress_selectors(asg.selectors)
        dom = get_domain(k, cs.degree() - 1)
        u = (1 << k) - (cs.blinding_factors() + 1)
        vk = VerifyingKey(
            k=k,
            cs=cs,
            domain=dom,
            fixed_commitments=groups[0],
            permutation_commitments=groups[1],
            transcript_repr=0,
            usable_row=u,
        )
        vk.transcript_repr = _hash_vk(k, cs, dom, groups[0], groups[1])
        return vk


@dataclass(eq=False)
class ProvingKey:
    vk: VerifyingKey
    fixed_lagrange: jnp.ndarray  # [F, n, 16]
    fixed_coeff: jnp.ndarray
    fixed_ext: jnp.ndarray  # [F, ext_n, 16]
    sigma_lagrange: jnp.ndarray  # [P, n, 16]
    sigma_coeff: jnp.ndarray
    sigma_ext: jnp.ndarray
    l0_ext: jnp.ndarray  # [ext_n, 16]
    l_last_ext: jnp.ndarray
    l_active_ext: jnp.ndarray


def _lagrange_delta(n: int, row: int) -> list:
    v = [0] * n
    v[row] = 1
    return v


def _hash_vk(k: int, cs: ConstraintSystem, dom: Domain,
             fixed_commitments, perm_commitments) -> int:
    """halo2's transcript_repr: Blake2b-512(person=b"Halo2-Verify-Key") over
    the u64-LE-length-prefixed `format!("{:?}", vk.pinned())` string, reduced
    from_bytes_wide (halo2_proofs plonk::VerifyingKey::from_parts; format
    recovered from the reference wasm artifact — see plonk/pinned.py)."""
    from .pinned import pinned_vk_repr

    payload = pinned_vk_repr(
        k, dom.extended_k, dom.omega, cs, fixed_commitments, perm_commitments
    )
    h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
    h.update(len(payload).to_bytes(8, "little"))
    h.update(payload.encode())
    return fr_from_u512(h.digest())


def keygen(params: ParamsKZG, circuit) -> ProvingKey:
    """circuit: a witness-free circuit instance (like the reference's
    empty_circuit); params fixes k."""
    from ..utils.profiling import PhaseTimer

    timer = PhaseTimer()
    k = params.k
    n = 1 << k
    cs = ConstraintSystem()
    config = type(circuit).configure(cs)

    asg = synthesize(circuit, cs, config, k, instances=None)
    timer.mark("keygen.synthesize")
    # halo2 keygen_vk: pack selector activations into fixed columns and
    # substitute their gate occurrences, THEN fix the quotient degree
    selector_polys = cs.compress_selectors(asg.selectors)
    degree = cs.degree()
    dom = get_domain(k, degree - 1)
    bf = cs.blinding_factors()
    u = n - (bf + 1)
    if asg.max_row_touched >= u:
        raise ValueError(
            f"circuit needs {asg.max_row_touched + 1} rows but only {u + 1} are "
            f"usable at k={k} (blinding takes {bf + 1})"
        )

    # ---- fixed columns + compressed-selector combination columns -----------------
    fixed_cols = list(asg.fixed) + selector_polys
    fixed_lagrange = jnp.asarray(
        np.stack([ints_to_mont_limbs(col, FR_MOD) for col in fixed_cols])
        if fixed_cols
        else np.zeros((0, n, 16), np.uint32)
    )
    timer.mark("keygen.fixed_upload")
    fixed_coeff = dom.lagrange_to_coeff(fixed_lagrange)
    fixed_ext = dom.coeff_to_extended(fixed_coeff)
    timer.mark("keygen.fixed_ntt")

    # ---- permutation sigmas -------------------------------------------------------
    perm_cols = cs.permutation_columns
    pos = {c: i for i, c in enumerate(perm_cols)}
    assembly = PermutationAssembly(len(perm_cols), n)
    for (ca, ra), (cb, rb) in asg.copies:
        assembly.add_copy(pos[ca], ra, pos[cb], rb)
    sig_vals = assembly.sigma_values()
    timer.mark("keygen.sigma_assembly")
    sigma_lagrange = jnp.asarray(
        np.stack([ints_to_mont_limbs(col, FR_MOD) for col in sig_vals])
        if sig_vals
        else np.zeros((0, n, 16), np.uint32)
    )
    timer.mark("keygen.sigma_upload")
    sigma_coeff = dom.lagrange_to_coeff(sigma_lagrange)
    sigma_ext = dom.coeff_to_extended(sigma_coeff)
    timer.mark("keygen.sigma_ntt")

    # ---- lagrange selector polys for the permutation argument ---------------------
    l0 = jnp.asarray(ints_to_mont_limbs(_lagrange_delta(n, 0), FR_MOD))
    l_last = jnp.asarray(ints_to_mont_limbs(_lagrange_delta(n, u), FR_MOD))
    l_blind_vals = [1 if u < i else 0 for i in range(n)]  # rows u+1..n-1
    l_active_vals = [1 if i < u else 0 for i in range(n)]  # 1 - (l_last + l_blind)
    l_blind = jnp.asarray(ints_to_mont_limbs(l_blind_vals, FR_MOD))
    l_active = jnp.asarray(ints_to_mont_limbs(l_active_vals, FR_MOD))
    l0_ext = dom.coeff_to_extended(dom.lagrange_to_coeff(l0))
    l_last_ext = dom.coeff_to_extended(dom.lagrange_to_coeff(l_last))
    l_active_ext = dom.coeff_to_extended(dom.lagrange_to_coeff(l_active))
    timer.mark("keygen.lagrange_selectors")

    # ---- commitments + vk ------------------------------------------------------------
    # one batched async dispatch for ALL fixed + sigma commitments (the
    # round-4 k=20 keygen spent most of its 1742 s in per-column
    # dispatch+readback round trips here)
    n_fixed = int(fixed_lagrange.shape[0])
    if n_fixed + int(sigma_lagrange.shape[0]) > 0:
        batch = jnp.concatenate([fixed_lagrange, sigma_lagrange], axis=0)
        resolve = getattr(params, "commit_lagrange_affine_batch_async", None)
        if resolve is not None:
            commits = resolve(batch)()
        else:
            commits = params.commit_lagrange_affine_batch(batch)
        fixed_commitments = list(commits[:n_fixed])
        perm_commitments = list(commits[n_fixed:])
    else:
        fixed_commitments, perm_commitments = [], []
    timer.mark("keygen.commitments")
    vk = VerifyingKey(
        k=k,
        cs=cs,
        domain=dom,
        fixed_commitments=fixed_commitments,
        permutation_commitments=perm_commitments,
        transcript_repr=_hash_vk(k, cs, dom, fixed_commitments, perm_commitments),
        usable_row=u,
    )
    return ProvingKey(
        vk=vk,
        fixed_lagrange=fixed_lagrange,
        fixed_coeff=fixed_coeff,
        fixed_ext=fixed_ext,
        sigma_lagrange=sigma_lagrange,
        sigma_coeff=sigma_coeff,
        sigma_ext=sigma_ext,
        l0_ext=l0_ext,
        l_last_ext=l_last_ext,
        l_active_ext=l_active_ext,
    )
