"""halo2 `PinnedVerificationKey` Debug formatting — byte-exact target.

The vk's `transcript_repr` (the scalar every proof transcript starts with)
is, in halo2, Blake2b-512 with personalization "Halo2-Verify-Key" over
`format!("{:?}", vk.pinned())` (length-prefixed with u64 LE), reduced via
`from_bytes_wide`.  Reproducing it requires reproducing Rust's Debug output
for the pinned structs byte-for-byte.

The format here is reverse-engineered from the reference's CHECKED-IN wasm
artifact (`/root/reference/src/lib/wasm/halo2_prover_bg.wasm`), whose rodata
embeds the Debug field-name tables of the exact pinned revisions
(halo2_proofs rev 6b43b6b, halo2curves rev 9f5c508):

  * PinnedVerificationKey { base_modulus, scalar_modulus, domain, cs,
    fixed_commitments, permutation }
  * PinnedEvaluationDomain { k, extended_k, omega }
  * PinnedConstraintSystem { num_fixed_columns, num_advice_columns,
    num_instance_columns, num_selectors, gates, advice_queries,
    instance_queries, fixed_queries, permutation, lookups, constants,
    minimum_degree }  (rev 6b43b6b predates the multi-phase API — no
    num_challenges / advice_column_phase / challenge_phase fields; verified
    against the live string captured from wasm memory, scripts/debug_pinned.py)
  * Expression variants: Constant / Selector / Fixed / Advice / Instance /
    Challenge / Negated / Sum / Product / Scaled, with fields query_index,
    column_index, rotation (and phase on Advice)
  * Column { index, column_type }, Rotation(i), Phase(p), Selector(i, bool)
  * permutation::Argument { columns }, permutation VerifyingKey
    { commitments }, lookup Argument { input_expressions, table_expressions }
  * G1Affine renders "(0x<x>, 0x<y>)" ("Infinity" for the identity) and the
    field moduli strings 0x30644e..fd47 / 0x30644e..0001 — all present
    verbatim in the artifact's string table.

Resolved (round 5): the previously-documented uncertainty about phase
fields is settled by capturing the actual formatted string from the wasm's
linear memory mid-keygen (scripts/debug_pinned.py) — this rev has no phase
concept anywhere in the pinned output, and Advice queries print exactly
{ query_index, column_index, rotation }.
"""

from __future__ import annotations

from ..frontend.constraint_system import ConstraintSystem
from ..frontend.expression import (
    AdviceQuery,
    Constant,
    FixedQuery,
    InstanceQuery,
    Negated,
    Product,
    Scaled,
    SelectorExpr,
    Sum,
)

BASE_MODULUS = "0x30644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd47"
SCALAR_MODULUS = "0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001"


def _f(v: int) -> str:
    """Fr/Fq Debug: 0x + 64 lowercase hex digits of the canonical value."""
    return f"0x{v:064x}"


def _point(pt) -> str:
    if pt is None:
        return "Infinity"
    return f"({_f(pt[0])}, {_f(pt[1])})"


_KIND = {"advice": "Advice", "fixed": "Fixed", "instance": "Instance"}


def _column(index: int, kind: str) -> str:
    return f"Column {{ index: {index}, column_type: {_KIND[kind]} }}"


def _expr(e) -> str:
    if isinstance(e, Constant):
        return f"Constant({_f(e.value)})"
    if isinstance(e, SelectorExpr):
        # only reachable pre-compression; halo2 pins post-compression gates
        return f"Selector(Selector({e.selector_index}, true))"
    if isinstance(e, FixedQuery):
        return (
            f"Fixed {{ query_index: {e.query_index}, "
            f"column_index: {e.column_index}, "
            f"rotation: Rotation({e.rotation}) }}"
        )
    if isinstance(e, AdviceQuery):
        return (
            f"Advice {{ query_index: {e.query_index}, "
            f"column_index: {e.column_index}, "
            f"rotation: Rotation({e.rotation}) }}"
        )
    if isinstance(e, InstanceQuery):
        return (
            f"Instance {{ query_index: {e.query_index}, "
            f"column_index: {e.column_index}, "
            f"rotation: Rotation({e.rotation}) }}"
        )
    if isinstance(e, Negated):
        return f"Negated({_expr(e.expr)})"
    if isinstance(e, Sum):
        return f"Sum({_expr(e.a)}, {_expr(e.b)})"
    if isinstance(e, Product):
        return f"Product({_expr(e.a)}, {_expr(e.b)})"
    if isinstance(e, Scaled):
        return f"Scaled({_expr(e.expr)}, {_f(e.scalar)})"
    raise TypeError(f"unknown expression node {type(e)}")


def _queries(queries, kind: str) -> str:
    return (
        "["
        + ", ".join(
            f"({_column(col, kind)}, Rotation({rot}))" for (col, rot) in queries
        )
        + "]"
    )


def pinned_vk_repr(
    k: int,
    extended_k: int,
    omega: int,
    cs: ConstraintSystem,
    fixed_commitments,
    permutation_commitments,
) -> str:
    """The single-line `format!("{:?}", vk.pinned())` string."""
    gates = ", ".join(_expr(p) for g in cs.gates for p in g.polys)
    perm_cols = ", ".join(_column(c.index, c.kind) for c in cs.permutation_columns)
    lookups = ", ".join(
        "Argument { input_expressions: ["
        + ", ".join(_expr(i) for i, _t in pairs)
        + "], table_expressions: ["
        + ", ".join(_expr(t) for _i, t in pairs)
        + "] }"
        for (_name, pairs) in cs.lookups
    )
    constants = ", ".join(_column(c.index, c.kind) for c in cs.constants_columns)
    # rev 6b43b6b predates the multi-phase/challenge API: PinnedConstraintSystem
    # has NO num_challenges / advice_column_phase / challenge_phase fields
    # (ground truth recovered from the running wasm's linear memory —
    # scripts/debug_pinned.py; the captured string is byte-identical to this
    # rendering for the arithmetic circuit at k=4).
    cs_str = (
        "PinnedConstraintSystem { "
        f"num_fixed_columns: {cs.num_fixed}, "
        f"num_advice_columns: {cs.num_advice}, "
        f"num_instance_columns: {cs.num_instance}, "
        f"num_selectors: {cs.num_selectors}, "
        f"gates: [{gates}], "
        f"advice_queries: {_queries(cs.advice_queries, 'advice')}, "
        f"instance_queries: {_queries(cs.instance_queries, 'instance')}, "
        f"fixed_queries: {_queries(cs.fixed_queries, 'fixed')}, "
        f"permutation: Argument {{ columns: [{perm_cols}] }}, "
        f"lookups: [{lookups}], "
        f"constants: [{constants}], "
        f"minimum_degree: None "
        "}"
    )
    fixed_str = ", ".join(_point(p) for p in fixed_commitments)
    perm_str = ", ".join(_point(p) for p in permutation_commitments)
    return (
        "PinnedVerificationKey { "
        f'base_modulus: "{BASE_MODULUS}", '
        f'scalar_modulus: "{SCALAR_MODULUS}", '
        f"domain: PinnedEvaluationDomain {{ k: {k}, extended_k: {extended_k}, "
        f"omega: {_f(omega)} }}, "
        f"cs: {cs_str}, "
        f"fixed_commitments: [{fixed_str}], "
        f"permutation: VerifyingKey {{ commitments: [{perm_str}] }} "
        "}"
    )
