"""The halo2 (2022, permuted-pair) lookup argument.

Equivalent of the reference's external `halo2_proofs::plonk::lookup` — the
reference circuits declare no lookups (SURVEY.md 2.2 notes the phases exist
but are empty), yet the argument itself is part of the proving system and the
north-star config list includes a range-check circuit (BASELINE.md).

Protocol per lookup (input_exprs, table_exprs):
  A(X) = fold(acc*theta + e) over input expressions     (compressed input)
  S(X) = fold(acc*theta + e) over table expressions     (compressed table)
  A'(X), S'(X): permutations over the usable rows such that A' is sorted and
  every "first occurrence" row of A' equals S' at the same row
  z(X): grand product of (A+beta)(S+gamma) / ((A'+beta)(S'+gamma))

Constraints (folded into the quotient with y, gated like halo2):
  l_0 * (1 - z) = 0
  l_last * (z^2 - z) = 0
  l_active * (z(wX)(A'+beta)(S'+gamma) - z(X)(A+beta)(S+gamma)) = 0
  l_0 * (A' - S') = 0
  l_active * (A' - S') * (A' - A'(w^-1 X)) = 0

Witness generation (sorting, multiset bookkeeping, the z recurrence) is
host-side Python over the usable rows — these are O(n) bigint ops on the
serial part of the pipeline; commitments and quotient evaluation stay on
device.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from ..field.bn254 import FR_MOD
from ..frontend.expression import evaluate


def eval_expr_rows(expr, n: int, advice, fixed, instance) -> list[int]:
    """Evaluate an expression at every row over host column lists.

    advice/fixed: list of columns (lists of ints, None treated as 0);
    instance(col, row) accessor."""

    def adv(q, r):
        v = advice[q.column_index][(r + q.rotation) % n]
        return 0 if v is None else v

    out = []
    for row in range(n):
        out.append(
            evaluate(
                expr,
                constant=lambda v: v,
                fixed=lambda q, r=row: fixed[q.column_index][(r + q.rotation) % n],
                advice=lambda q, r=row: adv(q, r),
                instance=lambda q, r=row: instance(
                    q.column_index, (r + q.rotation) % n
                ),
                selector=lambda q: (_ for _ in ()).throw(
                    AssertionError("selectors must be finalized")
                ),
                add=lambda a, b: (a + b) % FR_MOD,
                mul=lambda a, b: (a * b) % FR_MOD,
                neg=lambda a: (-a) % FR_MOD,
                scale=lambda a, s: (a * s) % FR_MOD,
            )
            % FR_MOD
        )
    return out


def compress_rows(exprs, theta: int, n: int, advice, fixed, instance) -> list[int]:
    """fold(acc * theta + e) across expressions, per row."""
    acc = [0] * n
    for e in exprs:
        vals = eval_expr_rows(e, n, advice, fixed, instance)
        acc = [(a * theta + v) % FR_MOD for a, v in zip(acc, vals)]
    return acc


def permute_pair(input_vals: list[int], table_vals: list[int], usable: int):
    """halo2's permute_expression_pair over rows [0, usable).

    Returns (permuted_input, permuted_table) of length `usable`.
    Raises ValueError when an input value is absent from the table."""
    a_sorted = sorted(input_vals[:usable])
    counts = Counter(table_vals[:usable])
    s_perm: list = [None] * usable
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            if counts[v] <= 0:
                raise ValueError(f"lookup input {v:#x} not in table")
            counts[v] -= 1
            s_perm[i] = v
    leftovers = []
    for v in sorted(counts):
        leftovers.extend([v] * counts[v])
    it = iter(leftovers)
    for i in range(usable):
        if s_perm[i] is None:
            s_perm[i] = next(it)
    return a_sorted, s_perm


def grand_product(
    compressed_input, compressed_table, perm_input, perm_table,
    beta: int, gamma: int, usable: int,
) -> list[int]:
    """z over rows [0, usable]: z[0] = 1,
    z[i+1] = z[i] * (A_i+beta)(S_i+gamma) / ((A'_i+beta)(S'_i+gamma))."""
    z = [1]
    num = 1
    den = 1
    # batch the divisions: accumulate numerators and denominators separately,
    # one modular inverse of the running denominator per row is avoided by
    # computing all prefix denominators then batch-inverting.
    dens = []
    cur = 1
    for i in range(usable):
        cur = (
            cur
            * ((perm_input[i] + beta) % FR_MOD)
            % FR_MOD
            * ((perm_table[i] + gamma) % FR_MOD)
            % FR_MOD
        )
        dens.append(cur)
    inv_last = pow(dens[-1], -1, FR_MOD) if usable else 1
    # back-substitute inverses: inv(dens[i]) = inv(dens[i+1]) * d_{i+1}
    invs = [0] * usable
    acc = inv_last
    for i in range(usable - 1, -1, -1):
        invs[i] = acc
        acc = (
            acc
            * ((perm_input[i] + beta) % FR_MOD)
            % FR_MOD
            * ((perm_table[i] + gamma) % FR_MOD)
            % FR_MOD
        )
    nums = 1
    for i in range(usable):
        nums = (
            nums
            * ((compressed_input[i] + beta) % FR_MOD)
            % FR_MOD
            * ((compressed_table[i] + gamma) % FR_MOD)
            % FR_MOD
        )
        z.append(nums * invs[i] % FR_MOD)
    return z  # length usable + 1; z[usable] == 1 iff multiset equality holds
