"""Selector compression (halo2 keygen behavior): packing, substitution
semantics, and degree bounds."""

from halo2_tpu.field.bn254 import FR_MOD
from halo2_tpu.frontend import ConstraintSystem
from halo2_tpu.frontend.expression import SelectorExpr, evaluate


def _eval_rows(expr, col_values, n):
    """Evaluate a (fixed-query-only) expression at every row; col_values maps
    fixed column index -> list of row values."""
    out = []
    for row in range(n):
        out.append(
            evaluate(
                expr,
                constant=lambda v: v,
                fixed=lambda q, r=row: col_values[q.column_index][r],
                advice=lambda q: 0,
                instance=lambda q: 0,
                selector=lambda q: (_ for _ in ()).throw(AssertionError()),
                add=lambda a, b: (a + b) % FR_MOD,
                mul=lambda a, b: (a * b) % FR_MOD,
                neg=lambda a: (-a) % FR_MOD,
                scale=lambda a, s: (a * s) % FR_MOD,
            )
            % FR_MOD
        )
    return out


def _build(num_sel, gate_builder, complex_idx=()):
    cs = ConstraintSystem()
    a = cs.advice_column()
    sels = [
        cs.complex_selector() if i in complex_idx else cs.selector()
        for i in range(num_sel)
    ]
    cs.create_gate("g", lambda q: gate_builder(q, a, sels))
    return cs, sels


def test_disjoint_simple_selectors_share_one_column():
    n = 8
    # three degree-2 gates (sel * advice) under a degree-4 bound (set by a
    # selector-free degree-4 gate): all three fit one combination, since the
    # substituted gate degree is 3 (combination size) + 1 (advice) = 4
    def gates(q, a, sels):
        g = [q.query_selector(s) * q.query_advice(a, 0) for s in sels]
        adv = q.query_advice(a, 0)
        g.append(adv * adv * adv * adv)
        return g

    cs, sels = _build(3, gates)
    acts = [[0] * n for _ in range(3)]
    acts[0][0] = 1
    acts[1][2] = 1
    acts[2][4] = 1
    base_fixed = cs.num_fixed
    polys = cs.compress_selectors(acts)
    assert len(polys) == 1, "disjoint low-degree selectors must share a column"
    assert cs.num_fixed == base_fixed + 1
    # roots 1, 2, 3 at the respective active rows, 0 elsewhere
    assert polys[0][0] == 1 and polys[0][2] == 2 and polys[0][4] == 3
    assert sum(1 for v in polys[0] if v) == 3
    # substituted expressions: nonzero exactly on the selector's rows
    col_values = {base_fixed: polys[0]}
    for i in range(3):
        vals = _eval_rows(cs.selector_replacements[i], col_values, n)
        for row in range(n):
            assert (vals[row] != 0) == bool(acts[i][row]), (i, row)


def test_overlapping_selectors_split_columns():
    n = 4
    cs, sels = _build(
        2,
        lambda q, a, sels: [q.query_selector(s) * q.query_advice(a, 0) for s in sels],
    )
    acts = [[1, 0, 0, 0], [1, 0, 0, 0]]  # overlap at row 0
    polys = cs.compress_selectors(acts)
    assert len(polys) == 2


def test_complex_selector_gets_own_boolean_column():
    n = 4
    cs, sels = _build(
        2,
        lambda q, a, sels: [q.query_selector(s) * q.query_advice(a, 0) for s in sels],
        complex_idx=(1,),
    )
    acts = [[0, 1, 0, 0], [0, 0, 1, 0]]
    polys = cs.compress_selectors(acts)
    assert len(polys) == 2
    # the complex one keeps 0/1 values and a bare query replacement
    from halo2_tpu.frontend.expression import FixedQuery

    assert isinstance(cs.selector_replacements[1], FixedQuery)
    assert set(polys[0]) <= {0, 1} and set(polys[1]) <= {0, 1}


def test_degree_bound_limits_combination_size():
    n = 16
    # gate degree 3 per selector => cs.degree() = max(3, 3) = 3;
    # combination of size m raises substituted degree to (3 - 1) + m, so only
    # m = 1 fits: every selector stays alone.
    cs, sels = _build(
        2,
        lambda q, a, sels: [
            q.query_selector(s)
            * q.query_advice(a, 0)
            * q.query_advice(a, 1)
            for s in sels
        ],
    )
    acts = [[0] * n for _ in range(2)]
    acts[0][1] = 1
    acts[1][3] = 1
    polys = cs.compress_selectors(acts)
    assert len(polys) == 2, "degree-saturated selectors must not combine"
    # substituted gates must not exceed the pre-compression degree
    assert cs.gate_degree() <= 3


def test_no_selector_expr_survives():
    n = 8
    cs, sels = _build(
        3,
        lambda q, a, sels: [q.query_selector(s) * q.query_advice(a, 0) for s in sels],
    )
    acts = [[0] * n for _ in range(3)]
    for i in range(3):
        acts[i][i] = 1
    cs.compress_selectors(acts)
    leftover = []
    for g in cs.gates:
        for p in g.polys:
            p.traverse(
                lambda e: leftover.append(e) if isinstance(e, SelectorExpr) else None
            )
    assert not leftover
