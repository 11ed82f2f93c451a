"""Circuit layout SVG renderer — the reference's CircuitLayout equivalent.

The reference renders layout diagrams with halo2's `dev-graph` feature +
plotters (reference: circuits/src/utils.rs:25-40, main.rs:14-34) and shows
them in the web UI carousel.  This renders the same information from the
framework's own IR: one vertical band per column (advice red, instance white,
fixed/selector blue — halo2's palette), filled cells darker, green overlays
for regions with their names.
"""

from __future__ import annotations

import html

from ..frontend import ConstraintSystem
from ..frontend.layouter import synthesize

CELL_W = 22
CELL_H = 8
LABEL_H = 56
MARGIN = 10

ADVICE_FILL = "#fdd4d4"
ADVICE_USED = "#e06666"
FIXED_FILL = "#d4ddfd"
FIXED_USED = "#6680e0"
INSTANCE_FILL = "#ffffff"
INSTANCE_USED = "#b7b7b7"
REGION_FILL = "#00ff0022"
REGION_EDGE = "#38761d"


def _column_order(cs: ConstraintSystem):
    """Instance | advice | fixed | selectors — halo2's CircuitLayout renders
    the pre-compression view, selectors as their own (blue) columns."""
    cols = []
    for i in range(cs.num_instance):
        cols.append(("instance", i))
    for i in range(cs.num_advice):
        cols.append(("advice", i))
    for i in range(cs.num_fixed):
        cols.append(("fixed", i))
    for i in range(cs.num_selectors):
        cols.append(("selector", i))
    return cols


def render_layout(k: int, circuit, path: str, max_rows: int | None = None) -> str:
    """Synthesize `circuit` at 2^k rows and write an SVG; returns the SVG."""
    cs = ConstraintSystem()
    config = type(circuit).configure(cs)
    asg = synthesize(circuit, cs, config, k)

    n = 1 << k
    rows = min(n, max_rows if max_rows is not None else max(asg.max_row_touched + 2, 8))
    cols = _column_order(cs)
    col_x = {c: MARGIN + i * CELL_W for i, c in enumerate(cols)}
    width = MARGIN * 2 + len(cols) * CELL_W
    height = LABEL_H + rows * CELL_H + MARGIN

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]

    # column bands + headers
    for kind, idx in cols:
        x = col_x[(kind, idx)]
        fill = {
            "advice": ADVICE_FILL,
            "fixed": FIXED_FILL,
            "selector": FIXED_FILL,
            "instance": INSTANCE_FILL,
        }[kind]
        out.append(
            f'<rect x="{x}" y="{LABEL_H}" width="{CELL_W - 1}" '
            f'height="{rows * CELL_H}" fill="{fill}" stroke="#999" stroke-width="0.5"/>'
        )
        label = {
            "advice": "a",
            "fixed": "f",
            "selector": "s",
            "instance": "i",
        }[kind] + str(idx)
        out.append(
            f'<text x="{x + CELL_W // 2}" y="{LABEL_H - 6}" font-size="9" '
            f'text-anchor="middle" font-family="monospace">{label}</text>'
        )

    # used cells
    def cell(kind, idx, row, color):
        x = col_x[(kind, idx)]
        y = LABEL_H + row * CELL_H
        out.append(
            f'<rect x="{x}" y="{y}" width="{CELL_W - 1}" height="{CELL_H - 1}" '
            f'fill="{color}"/>'
        )

    for i, col in enumerate(asg.advice):
        for r in range(rows):
            if col[r] is not None:
                cell("advice", i, r, ADVICE_USED)
    for i, col in enumerate(asg.fixed):
        for r in range(rows):
            if col[r]:
                cell("fixed", i, r, FIXED_USED)
    for i, col in enumerate(asg.selectors):
        for r in range(rows):
            if col[r]:
                cell("selector", i, r, FIXED_USED)
    for i, vals in enumerate(asg.instances):
        for r in range(min(len(vals), rows)):
            cell("instance", i, r, INSTANCE_USED)

    # region overlays
    for name, start, row_count, rcols in asg.regions:
        xs = []
        for c in rcols:
            kind = getattr(c, "kind", None)
            if kind is None:  # Selector -> its own rendered column
                key = ("selector", c.index)
            else:
                key = (kind, c.index)
            if key in col_x:
                xs.append(col_x[key])
        if not xs or start >= rows:
            continue
        x0, x1 = min(xs), max(xs) + CELL_W - 1
        y0 = LABEL_H + start * CELL_H
        h = min(row_count, rows - start) * CELL_H
        out.append(
            f'<rect x="{x0}" y="{y0}" width="{x1 - x0}" height="{h}" '
            f'fill="{REGION_FILL}" stroke="{REGION_EDGE}" stroke-width="1"/>'
        )
        out.append(
            f'<text x="{x0 + 2}" y="{y0 + 7}" font-size="7" fill="{REGION_EDGE}" '
            f'font-family="monospace">{html.escape(str(name))}</text>'
        )

    out.append("</svg>")
    svg = "\n".join(out)
    if path:
        with open(path, "w") as f:
            f.write(svg)
    return svg
