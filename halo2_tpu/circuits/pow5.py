"""Pow5 Poseidon chip: in-circuit Poseidon permutation + sponge gadget.

Behavioral re-implementation of the reference's vendored/external Pow5 chip
(reference: circuits/src/poseidon/pow5.rs; the production circuit uses the
line-identical external halo2_gadgets copy — SURVEY.md 2.1):

  * layout: WIDTH state advice columns, 1 partial_sbox advice, WIDTH rc_a +
    WIDTH rc_b fixed columns; state + rc_b equality-enabled (rc_b doubles as
    scratch for constants/padding);
  * gates: "full round" (one row per round, x^5 S-box then MDS),
    "partial rounds" (TWO rounds per row using the m_inv trick),
    "pad-and-add" (sponge absorption: prev + cur = next, capacity untouched);
  * requires RATE == WIDTH-1 and even R_F, R_P.

Witness values are Python ints with None = unknown (keygen mode).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..field.bn254 import FR_MOD
from ..frontend import ConstraintSystem
from ..hashes.poseidon import PoseidonSpec


def _vadd(a, b):
    return None if a is None or b is None else (a + b) % FR_MOD


def _vmul(a, b):
    return None if a is None or b is None else (a * b) % FR_MOD


def _vpow5(a):
    return None if a is None else pow(a, 5, FR_MOD)


@dataclass
class Pow5Config:
    state: list
    partial_sbox: object
    rc_a: list
    rc_b: list
    s_full: object
    s_partial: object
    s_pad_and_add: object
    spec: PoseidonSpec


class Pow5Chip:
    def __init__(self, config: Pow5Config):
        self.config = config

    @staticmethod
    def configure(meta: ConstraintSystem, spec: PoseidonSpec, state, partial_sbox,
                  rc_a, rc_b) -> Pow5Config:
        width = spec.width
        assert spec.rate == width - 1
        assert spec.r_f % 2 == 0 and spec.r_p % 2 == 0
        for col in list(state) + list(rc_b):
            meta.enable_equality(col)

        s_full = meta.selector()
        s_partial = meta.selector()
        s_pad_and_add = meta.selector()

        m = spec.mds
        m_inv = spec.mds_inv

        def pow_5(e):
            e2 = e * e
            return e2 * e2 * e

        def full_round(q):
            sel = q.query_selector(s_full)
            polys = []
            for next_idx in range(width):
                state_next = q.query_advice(state[next_idx], 1)
                expr = None
                for idx in range(width):
                    cur = q.query_advice(state[idx], 0)
                    rc = q.query_fixed(rc_a[idx], 0)
                    term = pow_5(cur + rc) * m[next_idx][idx]
                    expr = term if expr is None else expr + term
                polys.append(sel * (expr - state_next))
            return polys

        def partial_rounds(q):
            sel = q.query_selector(s_partial)
            cur_0 = q.query_advice(state[0], 0)
            mid_0 = q.query_advice(partial_sbox, 0)
            rc_a0 = q.query_fixed(rc_a[0], 0)
            rc_b0 = q.query_fixed(rc_b[0], 0)

            def mid(idx):
                acc = mid_0 * m[idx][0]
                for cur_idx in range(1, width):
                    cur = q.query_advice(state[cur_idx], 0)
                    rc = q.query_fixed(rc_a[cur_idx], 0)
                    acc = acc + (cur + rc) * m[idx][cur_idx]
                return acc

            def nxt(idx):
                acc = None
                for next_idx in range(width):
                    term = q.query_advice(state[next_idx], 1) * m_inv[idx][next_idx]
                    acc = term if acc is None else acc + term
                return acc

            polys = [sel * (pow_5(cur_0 + rc_a0) - mid_0)]
            polys.append(sel * (pow_5(mid(0) + rc_b0) - nxt(0)))
            for idx in range(1, width):
                rc_b_i = q.query_fixed(rc_b[idx], 0)
                polys.append(sel * (mid(idx) + rc_b_i - nxt(idx)))
            return polys

        def pad_and_add(q):
            sel = q.query_selector(s_pad_and_add)
            # query registration order mirrors pow5.rs:108-116: state[RATE]
            # at prev/next FIRST, then the rate columns — the resulting
            # advice_queries numbering is part of the pinned vk (round 5:
            # captured from the wasm's linear memory, the only divergence
            # in the whole 19936-char poseidon pinned string)
            init_rate = q.query_advice(state[spec.rate], -1)
            out_rate = q.query_advice(state[spec.rate], 1)
            polys = []
            for idx in range(spec.rate):
                initial = q.query_advice(state[idx], -1)
                inp = q.query_advice(state[idx], 0)
                output = q.query_advice(state[idx], 1)
                polys.append(sel * (initial + inp - output))
            polys.append(sel * (init_rate - out_rate))
            return polys

        meta.create_gate("full round", full_round)
        meta.create_gate("partial rounds", partial_rounds)
        meta.create_gate("pad-and-add", pad_and_add)

        return Pow5Config(
            state=list(state),
            partial_sbox=partial_sbox,
            rc_a=list(rc_a),
            rc_b=list(rc_b),
            s_full=s_full,
            s_partial=s_partial,
            s_pad_and_add=s_pad_and_add,
            spec=spec,
        )

    # ---- in-circuit permutation --------------------------------------------------

    def permute(self, layouter, initial_state):
        """initial_state: list of WIDTH AssignedCells; returns WIDTH cells."""
        cfg = self.config
        spec = cfg.spec
        width = spec.width
        half_f = spec.r_f // 2
        half_p = spec.r_p // 2
        rcs = spec.round_constants
        m = spec.mds

        def build(region):
            # load
            state = [
                region.copy_advice(initial_state[i], cfg.state[i], 0)
                for i in range(width)
            ]

            def load_rc(col_list, round_idx, offset):
                for i in range(width):
                    region.assign_fixed(col_list[i], offset, rcs[round_idx][i])

            def write_state(vals, offset):
                return [
                    region.assign_advice(cfg.state[i], offset, vals[i])
                    for i in range(width)
                ]

            def mds_apply(vals):
                return [
                    _mds_row(m, i, vals)
                    for i in range(width)
                ]

            offset = 0
            round_idx = 0
            # first half full rounds
            for _ in range(half_f):
                region.enable_selector(cfg.s_full, offset)
                load_rc(cfg.rc_a, round_idx, offset)
                cur = [w.value for w in state]
                sboxed = [_vpow5(_vadd(v, rcs[round_idx][i])) for i, v in enumerate(cur)]
                nxt = mds_apply(sboxed)
                state = write_state(nxt, offset + 1)
                offset += 1
                round_idx += 1
            # partial rounds, two per row
            for _ in range(half_p):
                region.enable_selector(cfg.s_partial, offset)
                load_rc(cfg.rc_a, round_idx, offset)
                load_rc(cfg.rc_b, round_idx + 1, offset)
                cur = [w.value for w in state]
                # round a
                r = [_vpow5(_vadd(cur[0], rcs[round_idx][0]))] + [
                    _vadd(cur[i], rcs[round_idx][i]) for i in range(1, width)
                ]
                region.assign_advice(cfg.partial_sbox, offset, r[0])
                p_mid = mds_apply(r)
                # round b
                r_mid = [_vpow5(_vadd(p_mid[0], rcs[round_idx + 1][0]))] + [
                    _vadd(p_mid[i], rcs[round_idx + 1][i]) for i in range(1, width)
                ]
                nxt = mds_apply(r_mid)
                state = write_state(nxt, offset + 1)
                offset += 1
                round_idx += 2
            # final half full rounds
            for _ in range(half_f):
                region.enable_selector(cfg.s_full, offset)
                load_rc(cfg.rc_a, round_idx, offset)
                cur = [w.value for w in state]
                sboxed = [_vpow5(_vadd(v, rcs[round_idx][i])) for i, v in enumerate(cur)]
                nxt = mds_apply(sboxed)
                state = write_state(nxt, offset + 1)
                offset += 1
                round_idx += 1
            return state

        return layouter.assign_region("permute state", build)

    # ---- sponge pieces ------------------------------------------------------------

    def initial_state(self, layouter, capacity_value: int):
        cfg = self.config
        spec = cfg.spec

        def build(region):
            state = []
            for i in range(spec.rate):
                state.append(region.assign_advice_from_constant(cfg.state[i], 0, 0))
            state.append(
                region.assign_advice_from_constant(cfg.state[spec.rate], 0, capacity_value)
            )
            return state

        return layouter.assign_region("initial state", build)

    def add_input(self, layouter, initial_state, inputs):
        """inputs: list of RATE entries — AssignedCell (message) or
        ("pad", value) for padding."""
        cfg = self.config
        spec = cfg.spec
        width = spec.width

        def build(region):
            region.enable_selector(cfg.s_pad_and_add, 1)
            loaded = [
                region.copy_advice(initial_state[i], cfg.state[i], 0)
                for i in range(width)
            ]
            in_cells = []
            for i, entry in enumerate(inputs):
                if isinstance(entry, tuple) and entry[0] == "pad":
                    # padding value goes into rc_b scratch, copy-constrained
                    # into the state column (reference: pow5.rs load_input_word)
                    fixed = region.assign_fixed(cfg.rc_b[i], 1, entry[1])
                    acell = region.assign_advice(cfg.state[i], 1, entry[1])
                    region.constrain_equal(acell, fixed)
                    in_cells.append(acell)
                else:
                    in_cells.append(region.copy_advice(entry, cfg.state[i], 1))
            out = []
            for i in range(width):
                if i < spec.rate:
                    v = _vadd(loaded[i].value, in_cells[i].value)
                else:
                    v = loaded[i].value
                out.append(region.assign_advice(cfg.state[i], 2, v))
            return out

        return layouter.assign_region("add input", build)


def _mds_row(m, i, vals):
    acc = None
    for j, v in enumerate(vals):
        t = _vmul(m[i][j], v) if v is not None else None
        if t is None:
            return None
        acc = t if acc is None else (acc + t) % FR_MOD
    return acc


class PoseidonHashGadget:
    """ConstantLength<L> sponge hash built on Pow5Chip
    (reference: circuits/src/poseidon.rs:121-296 Hash gadget)."""

    def __init__(self, chip: Pow5Chip, length: int):
        self.chip = chip
        self.length = length

    def hash(self, layouter, message_cells):
        spec = self.chip.config.spec
        rate = spec.rate
        L = self.length
        assert len(message_cells) == L
        cap = (L << 64) % FR_MOD
        state = self.chip.initial_state(layouter, cap)
        # pad to a multiple of rate with zeros
        k = (L + rate - 1) // rate
        padded = list(message_cells) + [("pad", 0)] * (k * rate - L)
        for chunk_start in range(0, len(padded), rate):
            chunk = padded[chunk_start : chunk_start + rate]
            state = self.chip.add_input(layouter, state, chunk)
            state = self.chip.permute(layouter, state)
        return state[0]
