"""A WebAssembly (MVP + sign-ext + bulk-memory + sat-trunc) -> Python
ahead-of-time transpiler.

Purpose-built to execute the reference repo's checked-in wasm-bindgen
artifact (`halo2_prover_bg.wasm`, the real Rust halo2 prover compiled to
wasm32) so proofs/params/vk digests produced by the ACTUAL Rust stack can be
generated and cross-verified in-image, where no Rust toolchain or wasm
runtime exists.  It is generic: any single-memory wasm module with function
imports works.

Design: one Python function per wasm function.  The wasm value stack is
resolved statically — stack slot i becomes local variable s<i> — so the
generated code is plain assignments.  Control flow compiles to a flat
basic-block machine: every branch target starts a new segment, transfers are
`_pc = <seg>; continue` through a binary-tree dispatcher (Rust/LLVM emits
br_table ladders hundreds of blocks deep, which overflows CPython's
100-level indentation limit if mapped to nested `while` constructs — the
flat machine's nesting is O(log segments) regardless of wasm nesting).

Integers are Python ints in unsigned representation ([0, 2^32) / [0, 2^64)),
masked after each arithmetic op; signedness is handled at the consuming
operator (bias trick for comparisons, sign-extension for shr_s/div_s).
Floats use struct round-trips (the target module barely touches them).
"""

from __future__ import annotations

import hashlib
import os
import struct
from dataclasses import dataclass, field

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# binary parsing
# ---------------------------------------------------------------------------


class Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def u8(self) -> int:
        v = self.d[self.p]
        self.p += 1
        return v

    def uleb(self) -> int:
        r = 0
        sh = 0
        while True:
            b = self.d[self.p]
            self.p += 1
            r |= (b & 0x7F) << sh
            sh += 7
            if not b & 0x80:
                return r

    def sleb(self, bits: int) -> int:
        r = 0
        sh = 0
        while True:
            b = self.d[self.p]
            self.p += 1
            r |= (b & 0x7F) << sh
            sh += 7
            if not b & 0x80:
                if sh < bits and (b & 0x40):
                    r |= -1 << sh
                return r

    def bytes(self, n: int) -> bytes:
        v = self.d[self.p : self.p + n]
        self.p += n
        return v

    def name(self) -> str:
        return self.bytes(self.uleb()).decode("utf-8")


@dataclass
class FuncType:
    params: tuple
    results: tuple


@dataclass
class Module:
    types: list = field(default_factory=list)
    imports: list = field(default_factory=list)  # (mod, name, typeidx)
    func_types: list = field(default_factory=list)  # typeidx per local func
    table_size: int = 0
    mem_pages: int = 0
    mem_max: int | None = None
    globals: list = field(default_factory=list)  # (valtype, mutable, init)
    exports: dict = field(default_factory=dict)  # name -> (kind, idx)
    elems: list = field(default_factory=list)  # (offset, [funcidx])
    codes: list = field(default_factory=list)  # (locals, body_bytes)
    datas: list = field(default_factory=list)  # (offset, bytes)

    @property
    def n_imports(self) -> int:
        return len(self.imports)

    def type_of_func(self, idx: int) -> FuncType:
        if idx < self.n_imports:
            return self.types[self.imports[idx][2]]
        return self.types[self.func_types[idx - self.n_imports]]


def _const_expr(r: Reader) -> int:
    op = r.u8()
    if op == 0x41:
        v = r.sleb(32) & M32
    elif op == 0x42:
        v = r.sleb(64) & M64
    else:
        raise NotImplementedError(f"const expr op {op:#x}")
    assert r.u8() == 0x0B
    return v


def parse_module(data: bytes) -> Module:
    assert data[:4] == b"\0asm" and data[4:8] == b"\x01\0\0\0"
    m = Module()
    r = Reader(data, 8)
    while r.p < len(data):
        sid = r.u8()
        ln = r.uleb()
        end = r.p + ln
        if sid == 1:
            for _ in range(r.uleb()):
                assert r.u8() == 0x60
                params = tuple(r.u8() for _ in range(r.uleb()))
                results = tuple(r.u8() for _ in range(r.uleb()))
                m.types.append(FuncType(params, results))
        elif sid == 2:
            for _ in range(r.uleb()):
                mod, nm = r.name(), r.name()
                kind = r.u8()
                assert kind == 0, "only function imports supported"
                m.imports.append((mod, nm, r.uleb()))
        elif sid == 3:
            m.func_types = [r.uleb() for _ in range(r.uleb())]
        elif sid == 4:
            for _ in range(r.uleb()):
                assert r.u8() == 0x70
                flags = r.u8()
                m.table_size = r.uleb()
                if flags:
                    r.uleb()
        elif sid == 5:
            for _ in range(r.uleb()):
                flags = r.u8()
                m.mem_pages = r.uleb()
                m.mem_max = r.uleb() if flags else None
        elif sid == 6:
            for _ in range(r.uleb()):
                vt = r.u8()
                r.u8()  # mutability
                m.globals.append((vt, 1, _const_expr(r)))
        elif sid == 7:
            for _ in range(r.uleb()):
                nm = r.name()
                kind = r.u8()
                m.exports[nm] = (kind, r.uleb())
        elif sid == 9:
            for _ in range(r.uleb()):
                flags = r.uleb()
                assert flags == 0, f"elem flags {flags} unsupported"
                off = _const_expr(r)
                m.elems.append((off, [r.uleb() for _ in range(r.uleb())]))
        elif sid == 10:
            for _ in range(r.uleb()):
                sz = r.uleb()
                body_end = r.p + sz
                locals_ = []
                for _ in range(r.uleb()):
                    cnt = r.uleb()
                    vt = r.u8()
                    locals_.extend([vt] * cnt)
                m.codes.append((locals_, data[r.p : body_end]))
                r.p = body_end
        elif sid == 11:
            for _ in range(r.uleb()):
                flags = r.uleb()
                assert flags == 0, f"data flags {flags} unsupported"
                off = _const_expr(r)
                m.datas.append((off, r.bytes(r.uleb())))
        r.p = end
    return m


# ---------------------------------------------------------------------------
# transpiler
# ---------------------------------------------------------------------------

# opcode -> (kind, width_bytes, sign_extend, is64)
_LOADS = {
    0x28: ("i", 4, False, False),
    0x29: ("i", 8, False, True),
    0x2A: ("f32", 4, False, False),
    0x2B: ("f64", 8, False, True),
    0x2C: ("i", 1, True, False),
    0x2D: ("i", 1, False, False),
    0x2E: ("i", 2, True, False),
    0x2F: ("i", 2, False, False),
    0x30: ("i", 1, True, True),
    0x31: ("i", 1, False, True),
    0x32: ("i", 2, True, True),
    0x33: ("i", 2, False, True),
    0x34: ("i", 4, True, True),
    0x35: ("i", 4, False, True),
}
_STORES = {0x36: 4, 0x37: 8, 0x38: 4, 0x39: 8, 0x3A: 1, 0x3B: 2, 0x3C: 1, 0x3D: 2, 0x3E: 4}


class _Fn:
    """Flat basic-block codegen state for one function."""

    def __init__(self, mod: Module, fidx: int):
        self.m = mod
        self.fidx = fidx
        self.segments: list[list[str]] = [[]]
        self.cur = self.segments[0]
        self.label_seg: dict[int, int] = {}
        self._next_label = 0
        self.h = 0
        # control stack: (kind, base, br_arity, end_arity, br_label, end_label)
        self.ctrl: list = []
        self.dead = 0
        self.indent = 0

    # ---- emission helpers ---------------------------------------------------

    def w(self, s: str):
        self.cur.append("    " * self.indent + s)

    def push(self, expr: str):
        self.w(f"s{self.h} = {expr}")
        self.h += 1

    def s(self, back: int = 1) -> str:
        return f"s{self.h - back}"

    def bin(self, op_fmt: str):
        a, b = self.s(2), self.s(1)
        self.h -= 2
        self.push(op_fmt.format(a=a, b=b))

    def un(self, op_fmt: str):
        a = self.s(1)
        self.h -= 1
        self.push(op_fmt.format(a=a))

    # ---- labels / segments ----------------------------------------------------

    def new_label(self) -> int:
        self._next_label += 1
        return self._next_label - 1

    def jump(self, label: int):
        self.w(f"_pc = @L{label}@")
        self.w("continue")

    def bind(self, label: int, height: int):
        """Start a fresh segment as the landing point of `label`.  The
        previous segment always ends with a fallthrough jump to it (dead if
        the segment already terminated — harmless unreachable text)."""
        self.indent = 0
        self.jump(label)
        self.segments.append([])
        self.cur = self.segments[-1]
        self.label_seg[label] = len(self.segments) - 1
        self.h = height

    def _blocktype(self, r: Reader):
        b = r.d[r.p]
        if b == 0x40:
            r.p += 1
            return 0, 0
        if b in (0x7F, 0x7E, 0x7D, 0x7C):
            r.p += 1
            return 0, 1
        ti = r.sleb(33)
        ft = self.m.types[ti]
        return len(ft.params), len(ft.results)

    def br(self, depth: int):
        kind, base, br_ar, _ea, br_label, _el = self.ctrl[-1 - depth]
        src = self.h - br_ar
        if src != base:
            for i in range(br_ar):
                self.w(f"s{base + i} = s{src + i}")
        if kind == "func":
            self._emit_return()
        else:
            self.jump(br_label)

    def _emit_return(self):
        nres = len(self.m.type_of_func(self.fidx).results)
        kind, base = "func", 0
        if nres == 0:
            self.w("return")
        elif nres == 1:
            self.w(f"return s{self.h - 1}")
        else:
            vals = ", ".join(f"s{self.h - nres + i}" for i in range(nres))
            self.w(f"return ({vals})")


def _gen_function(mod: Module, fidx: int, out: list):
    ftype = mod.type_of_func(fidx)
    locals_types, body = mod.codes[fidx - mod.n_imports]
    n_params = len(ftype.params)
    args = ", ".join(f"l{i}" for i in range(n_params))
    g = _Fn(mod, fidx)
    for i, vt in enumerate(locals_types):
        g.w(f"l{n_params + i} = 0" + (".0" if vt in (0x7D, 0x7C) else ""))
    nres = len(ftype.results)
    end_label = g.new_label()
    g.ctrl.append(("func", 0, nres, nres, end_label, end_label))
    _gen_body(g, Reader(body))
    # implicit end handled in _gen_body when ctrl stack reaches the func frame

    # resolve labels and emit the dispatcher
    lines = [f"def f{fidx}({args}):"]
    segs = [
        [ln for ln in seg]
        for seg in g.segments
    ]
    resolved = []
    for seg in segs:
        rs = []
        for ln in seg:
            while "@L" in ln:
                i = ln.index("@L")
                j = ln.index("@", i + 1)
                lab = int(ln[i + 2 : j])
                ln = ln[:i] + str(g.label_seg[lab]) + ln[j + 1 :]
            rs.append(ln)
        resolved.append(rs)
    n = len(resolved)
    if n == 1:
        for ln in resolved[0]:
            lines.append("    " + ln)
        if not resolved[0] or not resolved[0][-1].lstrip().startswith(
            ("return", "raise")
        ):
            lines.append("    return")
    else:
        lines.append("    _pc = 0")
        lines.append("    while True:")

        def tree(lo: int, hi: int, depth: int):
            pad = "    " * depth
            if hi - lo == 1:
                body_ = resolved[lo] or ["pass"]
                for ln in body_:
                    lines.append(pad + ln)
                last = body_[-1].lstrip()
                if not last.startswith(("continue", "return", "raise")):
                    lines.append(pad + "return")
                return
            mid = (lo + hi) // 2
            lines.append(pad + f"if _pc < {mid}:")
            tree(lo, mid, depth + 1)
            lines.append(pad + "else:")
            tree(mid, hi, depth + 1)

        tree(0, n, 2)
    out.extend(lines)
    out.append("")


def _gen_body(g: _Fn, r: Reader):  # noqa: C901 — opcode dispatch is long
    m = g.m
    while True:
        op = r.u8()

        # ---- dead-code skipping ------------------------------------------------
        if g.dead:
            if op in (0x02, 0x03, 0x04):
                g._blocktype(r)
                g.dead += 1
            elif op == 0x0B:
                g.dead -= 1
                if g.dead == 0:
                    if _close_construct(g, arrived_dead=True):
                        return
            elif op == 0x05 and g.dead == 1:
                g.dead = 0
                kind, base, br_ar, end_ar, br_label, else_label = g.ctrl[-1]
                g.bind(else_label, base)
                g.ctrl[-1] = (kind, base, br_ar, end_ar, br_label, None)
            elif op in (0x0C, 0x0D, 0x10, 0x20, 0x21, 0x22, 0x23, 0x24, 0x3F, 0x40):
                r.uleb()
            elif op == 0x0E:
                for _ in range(r.uleb() + 1):
                    r.uleb()
            elif op == 0x11:
                r.uleb()
                r.uleb()
            elif op in _LOADS or op in _STORES:
                r.uleb()
                r.uleb()
            elif op == 0x41:
                r.sleb(32)
            elif op == 0x42:
                r.sleb(64)
            elif op == 0x43:
                r.bytes(4)
            elif op == 0x44:
                r.bytes(8)
            elif op == 0x1C:
                for _ in range(r.uleb()):
                    r.u8()
            elif op == 0xFC:
                sub = r.uleb()
                if sub == 8:
                    r.uleb()
                    r.u8()
                elif sub == 9:
                    r.uleb()
                elif sub == 10:
                    r.u8()
                    r.u8()
                elif sub == 11:
                    r.u8()
            continue

        # ---- control -------------------------------------------------------------
        if op == 0x00:
            g.w("raise WasmTrap('unreachable')")
            g.dead = 1
        elif op == 0x01:
            pass
        elif op == 0x02:  # block: br target = end
            np_, nr = g._blocktype(r)
            lab = g.new_label()
            g.ctrl.append(("block", g.h - np_, nr, nr, lab, lab))
        elif op == 0x03:  # loop: br target = start
            np_, nr = g._blocktype(r)
            start = g.new_label()
            end = g.new_label()
            g.ctrl.append(("loop", g.h - np_, np_, nr, start, end))
            g.bind(start, g.h)
        elif op == 0x04:  # if
            np_, nr = g._blocktype(r)
            cond = g.s()
            g.h -= 1
            else_lab = g.new_label()
            end_lab = g.new_label()
            g.ctrl.append(("if", g.h - np_, nr, nr, end_lab, else_lab))
            g.w(f"if not {cond}:")
            g.indent += 1
            g.jump(else_lab)
            g.indent -= 1
        elif op == 0x05:  # else
            kind, base, br_ar, end_ar, br_label, else_label = g.ctrl[-1]
            # then-arm fallthrough jumps to end (result values in place)
            g.jump(br_label)
            g.bind(else_label, base)
            g.ctrl[-1] = (kind, base, br_ar, end_ar, br_label, None)
        elif op == 0x0B:  # end
            if _close_construct(g, arrived_dead=False):
                return
        elif op == 0x0C:
            g.br(r.uleb())
            g.dead = 1
        elif op == 0x0D:
            d = r.uleb()
            cond = g.s()
            g.h -= 1
            g.w(f"if {cond}:")
            g.indent += 1
            g.br(d)
            g.indent -= 1
        elif op == 0x0E:  # br_table
            n = r.uleb()
            depths = [r.uleb() for _ in range(n)]
            default = r.uleb()
            sel = g.s()
            g.h -= 1
            g.w(f"_bt = {sel}")
            emitted = False
            for d in sorted(set(depths)):
                idxs = [i for i, dd in enumerate(depths) if dd == d]
                cond = (
                    f"_bt == {idxs[0]}"
                    if len(idxs) == 1
                    else f"_bt in ({', '.join(map(str, idxs))})"
                )
                g.w(("elif " if emitted else "if ") + cond + ":")
                g.indent += 1
                g.br(d)
                g.indent -= 1
                emitted = True
            if emitted:
                g.w("else:")
                g.indent += 1
                g.br(default)
                g.indent -= 1
            else:
                g.br(default)
            g.dead = 1
        elif op == 0x0F:
            g._emit_return()
            g.dead = 1
        elif op == 0x10:
            fi = r.uleb()
            ft = m.type_of_func(fi)
            na, nr_ = len(ft.params), len(ft.results)
            args = ", ".join(f"s{g.h - na + i}" for i in range(na))
            g.h -= na
            if nr_ == 0:
                g.w(f"f{fi}({args})")
            elif nr_ == 1:
                g.push(f"f{fi}({args})")
            else:
                targets = ", ".join(f"s{g.h + i}" for i in range(nr_))
                g.w(f"{targets} = f{fi}({args})")
                g.h += nr_
        elif op == 0x11:
            ti = r.uleb()
            r.uleb()
            ft = m.types[ti]
            na, nr_ = len(ft.params), len(ft.results)
            idx = g.s()
            g.h -= 1
            args = ", ".join(f"s{g.h - na + i}" for i in range(na))
            g.h -= na
            if nr_ == 0:
                g.w(f"T[{idx}]({args})")
            elif nr_ == 1:
                g.push(f"T[{idx}]({args})")
            else:
                targets = ", ".join(f"s{g.h + i}" for i in range(nr_))
                g.w(f"{targets} = T[{idx}]({args})")
                g.h += nr_

        # ---- parametric / locals / globals ----------------------------------------
        elif op == 0x1A:
            g.h -= 1
        elif op in (0x1B, 0x1C):
            if op == 0x1C:
                for _ in range(r.uleb()):
                    r.u8()
            c, b2, a = g.s(1), g.s(2), g.s(3)
            g.h -= 3
            g.push(f"({a} if {c} else {b2})")
        elif op == 0x20:
            g.push(f"l{r.uleb()}")
        elif op == 0x21:
            g.h -= 1
            g.w(f"l{r.uleb()} = s{g.h}")
        elif op == 0x22:
            g.w(f"l{r.uleb()} = {g.s()}")
        elif op == 0x23:
            g.push(f"G[{r.uleb()}]")
        elif op == 0x24:
            g.h -= 1
            g.w(f"G[{r.uleb()}] = s{g.h}")

        # ---- memory -------------------------------------------------------------
        elif op in _LOADS:
            r.uleb()
            off = r.uleb()
            ty, width, signed, is64 = _LOADS[op]
            addr = g.s()
            g.h -= 1
            base = f"{addr} + {off}" if off else addr
            if ty == "f32":
                g.push(f"_ldf32(M, {base})")
            elif ty == "f64":
                g.push(f"_ldf64(M, {base})")
            elif width == 1:
                e = f"M[{base}]"
                if signed:
                    e = f"_sx({e}, 8, {64 if is64 else 32})"
                g.push(e)
            else:
                e = f"int.from_bytes(M[(_a := {base}) : _a + {width}], 'little')"
                if signed:
                    e = f"_sx({e}, {width * 8}, {64 if is64 else 32})"
                g.push(e)
        elif op in _STORES:
            r.uleb()
            off = r.uleb()
            width = _STORES[op]
            val, addr = g.s(1), g.s(2)
            g.h -= 2
            base = f"{addr} + {off}" if off else addr
            if op == 0x38:
                g.w(f"_stf32(M, {base}, {val})")
            elif op == 0x39:
                g.w(f"_stf64(M, {base}, {val})")
            elif width == 1:
                g.w(f"M[{base}] = {val} & 0xFF")
            else:
                mask = (1 << (width * 8)) - 1
                g.w(
                    f"M[(_a := {base}) : _a + {width}] = "
                    f"({val} & {hex(mask)}).to_bytes({width}, 'little')"
                )
        elif op == 0x3F:
            r.uleb()
            g.push("len(M) >> 16")
        elif op == 0x40:
            r.uleb()
            g.un("_grow(M, {a})")

        # ---- constants -------------------------------------------------------------
        elif op == 0x41:
            g.push(hex(r.sleb(32) & M32))
        elif op == 0x42:
            g.push(hex(r.sleb(64) & M64))
        elif op == 0x43:
            g.push(repr(struct.unpack("<f", r.bytes(4))[0]))
        elif op == 0x44:
            g.push(repr(struct.unpack("<d", r.bytes(8))[0]))

        # ---- comparisons -------------------------------------------------------------
        elif op == 0x45:
            g.un("(0 if {a} else 1)")
        elif 0x46 <= op <= 0x4F:
            a, b2 = g.s(2), g.s(1)
            g.h -= 2
            sa = f"(({a} + 0x80000000) & 0xFFFFFFFF)"
            sb = f"(({b2} + 0x80000000) & 0xFFFFFFFF)"
            cmp = {
                0x46: f"{a} == {b2}", 0x47: f"{a} != {b2}",
                0x48: f"{sa} < {sb}", 0x49: f"{a} < {b2}",
                0x4A: f"{sa} > {sb}", 0x4B: f"{a} > {b2}",
                0x4C: f"{sa} <= {sb}", 0x4D: f"{a} <= {b2}",
                0x4E: f"{sa} >= {sb}", 0x4F: f"{a} >= {b2}",
            }[op]
            g.push(f"(1 if {cmp} else 0)")
        elif op == 0x50:
            g.un("(0 if {a} else 1)")
        elif 0x51 <= op <= 0x5A:
            a, b2 = g.s(2), g.s(1)
            g.h -= 2
            K = "0x8000000000000000"
            KM = "0xFFFFFFFFFFFFFFFF"
            sa = f"(({a} + {K}) & {KM})"
            sb = f"(({b2} + {K}) & {KM})"
            cmp = {
                0x51: f"{a} == {b2}", 0x52: f"{a} != {b2}",
                0x53: f"{sa} < {sb}", 0x54: f"{a} < {b2}",
                0x55: f"{sa} > {sb}", 0x56: f"{a} > {b2}",
                0x57: f"{sa} <= {sb}", 0x58: f"{a} <= {b2}",
                0x59: f"{sa} >= {sb}", 0x5A: f"{a} >= {b2}",
            }[op]
            g.push(f"(1 if {cmp} else 0)")
        elif 0x5B <= op <= 0x66:
            a, b2 = g.s(2), g.s(1)
            g.h -= 2
            sym = {0: "==", 1: "!=", 2: "<", 3: ">", 4: "<=", 5: ">="}[(op - 0x5B) % 6]
            g.push(f"(1 if {a} {sym} {b2} else 0)")

        # ---- i32 arithmetic -------------------------------------------------------------
        elif op == 0x67:
            g.un("(32 - {a}.bit_length())")
        elif op == 0x68:
            g.un("_ctz({a}, 32)")
        elif op == 0x69:
            g.un("{a}.bit_count()")
        elif op == 0x6A:
            g.bin("({a} + {b}) & 0xFFFFFFFF")
        elif op == 0x6B:
            g.bin("({a} - {b}) & 0xFFFFFFFF")
        elif op == 0x6C:
            g.bin("({a} * {b}) & 0xFFFFFFFF")
        elif op == 0x6D:
            g.bin("_divs({a}, {b}, 32)")
        elif op == 0x6E:
            g.bin("{a} // {b}")
        elif op == 0x6F:
            g.bin("_rems({a}, {b}, 32)")
        elif op == 0x70:
            g.bin("{a} % {b}")
        elif op == 0x71:
            g.bin("{a} & {b}")
        elif op == 0x72:
            g.bin("{a} | {b}")
        elif op == 0x73:
            g.bin("{a} ^ {b}")
        elif op == 0x74:
            g.bin("({a} << ({b} & 31)) & 0xFFFFFFFF")
        elif op == 0x75:
            g.bin("(({a} - (({a} & 0x80000000) << 1)) >> ({b} & 31)) & 0xFFFFFFFF")
        elif op == 0x76:
            g.bin("{a} >> ({b} & 31)")
        elif op == 0x77:
            g.bin("_rotl({a}, {b} & 31, 32)")
        elif op == 0x78:
            g.bin("_rotr({a}, {b} & 31, 32)")

        # ---- i64 arithmetic -------------------------------------------------------------
        elif op == 0x79:
            g.un("(64 - {a}.bit_length())")
        elif op == 0x7A:
            g.un("_ctz({a}, 64)")
        elif op == 0x7B:
            g.un("{a}.bit_count()")
        elif op == 0x7C:
            g.bin("({a} + {b}) & 0xFFFFFFFFFFFFFFFF")
        elif op == 0x7D:
            g.bin("({a} - {b}) & 0xFFFFFFFFFFFFFFFF")
        elif op == 0x7E:
            g.bin("({a} * {b}) & 0xFFFFFFFFFFFFFFFF")
        elif op == 0x7F:
            g.bin("_divs({a}, {b}, 64)")
        elif op == 0x80:
            g.bin("{a} // {b}")
        elif op == 0x81:
            g.bin("_rems({a}, {b}, 64)")
        elif op == 0x82:
            g.bin("{a} % {b}")
        elif op == 0x83:
            g.bin("{a} & {b}")
        elif op == 0x84:
            g.bin("{a} | {b}")
        elif op == 0x85:
            g.bin("{a} ^ {b}")
        elif op == 0x86:
            g.bin("({a} << ({b} & 63)) & 0xFFFFFFFFFFFFFFFF")
        elif op == 0x87:
            g.bin(
                "(({a} - (({a} & 0x8000000000000000) << 1)) >> ({b} & 63))"
                " & 0xFFFFFFFFFFFFFFFF"
            )
        elif op == 0x88:
            g.bin("{a} >> ({b} & 63)")
        elif op == 0x89:
            g.bin("_rotl({a}, {b} & 63, 64)")
        elif op == 0x8A:
            g.bin("_rotr({a}, {b} & 63, 64)")

        # ---- floats (minimal) -------------------------------------------------------------
        elif 0x8B <= op <= 0xA6:
            table = {
                0x8B: ("u", "_f32(abs({a}))"), 0x8C: ("u", "_f32(-{a})"),
                0x8D: ("u", "_f32(_ceil({a}))"), 0x8E: ("u", "_f32(_floor({a}))"),
                0x8F: ("u", "_f32(_trunc({a}))"), 0x90: ("u", "_f32(_round({a}))"),
                0x91: ("u", "_f32(_sqrt({a}))"),
                0x92: ("b", "_f32({a} + {b})"), 0x93: ("b", "_f32({a} - {b})"),
                0x94: ("b", "_f32({a} * {b})"), 0x95: ("b", "_f32({a} / {b})"),
                0x96: ("b", "_f32(min({a}, {b}))"), 0x97: ("b", "_f32(max({a}, {b}))"),
                0x98: ("b", "_f32(_copysign({a}, {b}))"),
                0x99: ("u", "abs({a})"), 0x9A: ("u", "-{a}"),
                0x9B: ("u", "float(_ceil({a}))"), 0x9C: ("u", "float(_floor({a}))"),
                0x9D: ("u", "float(_trunc({a}))"), 0x9E: ("u", "_round({a})"),
                0x9F: ("u", "_sqrt({a})"),
                0xA0: ("b", "{a} + {b}"), 0xA1: ("b", "{a} - {b}"),
                0xA2: ("b", "{a} * {b}"), 0xA3: ("b", "{a} / {b}"),
                0xA4: ("b", "min({a}, {b})"), 0xA5: ("b", "max({a}, {b})"),
                0xA6: ("b", "_copysign({a}, {b})"),
            }
            kind, fmt = table[op]
            if kind == "u":
                g.un(fmt)
            else:
                g.bin(fmt)

        # ---- conversions -------------------------------------------------------------
        elif op == 0xA7:
            g.un("{a} & 0xFFFFFFFF")
        elif op in (0xA8, 0xAA):
            g.un("int({a}) & 0xFFFFFFFF")
        elif op in (0xA9, 0xAB):
            g.un("int({a}) & 0xFFFFFFFF")
        elif op == 0xAC:
            g.un("_sx({a}, 32, 64)")
        elif op == 0xAD:
            pass
        elif op in (0xAE, 0xB0, 0xAF, 0xB1):
            g.un("int({a}) & 0xFFFFFFFFFFFFFFFF")
        elif op in (0xB2, 0xB7):  # convert_i32_s
            g.un("float({a} - (({a} >> 31) << 32))")
        elif op in (0xB4, 0xB9):  # convert_i64_s
            g.un("float({a} - (({a} >> 63) << 64))")
        elif op in (0xB3, 0xB5, 0xB8, 0xBA):
            g.un("float({a})")
        elif op == 0xB6:
            g.un("_f32({a})")
        elif op == 0xBB:
            pass
        elif op == 0xBC:
            g.un("_if32({a})")
        elif op == 0xBD:
            g.un("_if64({a})")
        elif op == 0xBE:
            g.un("_fi32({a})")
        elif op == 0xBF:
            g.un("_fi64({a})")

        # ---- sign extension -------------------------------------------------------------
        elif op == 0xC0:
            g.un("_sx({a} & 0xFF, 8, 32)")
        elif op == 0xC1:
            g.un("_sx({a} & 0xFFFF, 16, 32)")
        elif op == 0xC2:
            g.un("_sx({a} & 0xFF, 8, 64)")
        elif op == 0xC3:
            g.un("_sx({a} & 0xFFFF, 16, 64)")
        elif op == 0xC4:
            g.un("_sx({a} & 0xFFFFFFFF, 32, 64)")

        # ---- 0xFC prefix -------------------------------------------------------------
        elif op == 0xFC:
            sub = r.uleb()
            if sub <= 7:
                bits = 32 if sub <= 3 else 64
                signed = sub % 2 == 0
                g.un(f"_truncsat({{a}}, {bits}, {signed})")
            elif sub == 8:
                seg = r.uleb()
                r.u8()
                n, s_, d = g.s(1), g.s(2), g.s(3)
                g.h -= 3
                g.w(f"M[(_a := {d}) : _a + {n}] = DATA[{seg}][(_b := {s_}) : _b + {n}]")
            elif sub == 9:
                r.uleb()
            elif sub == 10:
                r.u8()
                r.u8()
                n, s_, d = g.s(1), g.s(2), g.s(3)
                g.h -= 3
                g.w(f"M[(_a := {d}) : _a + {n}] = bytes(M[(_b := {s_}) : _b + {n}])")
            elif sub == 11:
                r.u8()
                n, v, d = g.s(1), g.s(2), g.s(3)
                g.h -= 3
                g.w(f"M[(_a := {d}) : _a + {n}] = bytes([{v} & 0xFF]) * {n}")
            else:
                raise NotImplementedError(f"0xFC {sub}")
        else:
            raise NotImplementedError(f"opcode {op:#x} in f{g.fidx}")


def _close_construct(g: _Fn, arrived_dead: bool) -> bool:
    """Handle an `end`: bind the construct's end label.  Returns True when
    the function frame itself was closed."""
    kind, base, _br_ar, end_ar, br_label, aux = g.ctrl.pop()
    if kind == "func":
        if not arrived_dead:
            g._emit_return()
        return True
    if kind == "loop":
        # loop ends are never br targets: a live body falls through in the
        # current segment; a dead body end leaves everything after dead
        if arrived_dead:
            g.dead = 1
        else:
            g.h = base + end_ar
        return False
    g.bind(br_label, base + end_ar)
    if kind == "if" and aux is not None:
        # no else arm existed: the else label lands at the end
        g.label_seg[aux] = g.label_seg[br_label]
    g.dead = 0
    return False


_PREAMBLE = '''\
import struct as _struct
import math as _math

class WasmTrap(Exception):
    pass

def _sx(v, frombits, tobits):
    if v & (1 << (frombits - 1)):
        v -= 1 << frombits
    return v & ((1 << tobits) - 1)

def _ctz(v, bits):
    if v == 0:
        return bits
    return (v & -v).bit_length() - 1

def _rotl(v, s, bits):
    m = (1 << bits) - 1
    return ((v << s) | (v >> (bits - s))) & m if s else v

def _rotr(v, s, bits):
    m = (1 << bits) - 1
    return ((v >> s) | (v << (bits - s))) & m if s else v

def _divs(a, b, bits):
    h = 1 << (bits - 1)
    m = (1 << bits) - 1
    sa = a - ((a & h) << 1)
    sb = b - ((b & h) << 1)
    q = abs(sa) // abs(sb)
    if (sa < 0) != (sb < 0):
        q = -q
    return q & m

def _rems(a, b, bits):
    h = 1 << (bits - 1)
    m = (1 << bits) - 1
    sa = a - ((a & h) << 1)
    sb = b - ((b & h) << 1)
    r = abs(sa) % abs(sb)
    if sa < 0:
        r = -r
    return r & m

def _grow(M, pages):
    old = len(M) >> 16
    M.extend(bytes(pages << 16))
    return old

def _f32(x):
    return _struct.unpack("<f", _struct.pack("<f", x))[0]

def _ldf32(M, a):
    return _struct.unpack_from("<f", M, a)[0]

def _ldf64(M, a):
    return _struct.unpack_from("<d", M, a)[0]

def _stf32(M, a, v):
    _struct.pack_into("<f", M, a, v)

def _stf64(M, a, v):
    _struct.pack_into("<d", M, a, v)

def _if32(v):
    return _struct.unpack("<I", _struct.pack("<f", v))[0]

def _if64(v):
    return _struct.unpack("<Q", _struct.pack("<d", v))[0]

def _fi32(v):
    return _struct.unpack("<f", _struct.pack("<I", v))[0]

def _fi64(v):
    return _struct.unpack("<d", _struct.pack("<Q", v))[0]

def _truncsat(v, bits, signed):
    m = (1 << bits) - 1
    if v != v:
        return 0
    v = int(v)
    if signed:
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        return max(lo, min(hi, v)) & m
    return max(0, min(m, v))

_ceil = _math.ceil
_floor = _math.floor
_trunc = _math.trunc
_sqrt = _math.sqrt
_copysign = _math.copysign

def _round(x):
    f = _math.floor(x)
    d = x - f
    if d > 0.5:
        return float(f + 1)
    if d < 0.5:
        return float(f)
    return float(f + (f % 2))
'''


def transpile(mod: Module) -> str:
    """Generate Python source defining `instantiate(env, DATA)` which returns
    (exports_dict, memory_bytearray, runtime_dict)."""
    lines = [_PREAMBLE, ""]
    lines.append("def instantiate(env, DATA):")
    lines.append(f"    M = bytearray({mod.mem_pages} << 16)")
    lines.append("    G = [%s]" % ", ".join(hex(gv[2]) for gv in mod.globals))
    lines.append(f"    T = [None] * {max(mod.table_size, 1)}")
    for i, (imod, iname, _ti) in enumerate(mod.imports):
        lines.append(f"    f{i} = env[{(imod + '.' + iname)!r}]")
    body: list = []
    for fidx in range(mod.n_imports, mod.n_imports + len(mod.codes)):
        _gen_function(mod, fidx, body)
    lines.extend("    " + ln if ln else "" for ln in body)
    for off, funcs in mod.elems:
        for j, fi in enumerate(funcs):
            lines.append(f"    T[{off + j}] = f{fi}")
    lines.append("    for _off, _seg in zip(DATA_OFFSETS, DATA):")
    lines.append("        M[_off : _off + len(_seg)] = _seg")
    exports = ", ".join(
        f"{nm!r}: f{idx}" for nm, (kind, idx) in mod.exports.items() if kind == 0
    )
    lines.append("    return {%s}, M, {'globals': G, 'table': T}" % exports)
    return "\n".join(lines)


class WasmInstance:
    """Compile (with on-disk caching of the generated source) and
    instantiate a wasm module."""

    def __init__(self, wasm_bytes: bytes, env: dict, cache_dir: str | None = None):
        mod = parse_module(wasm_bytes)
        digest = hashlib.blake2b(wasm_bytes, digest_size=16).hexdigest()
        src = None
        cache_path = None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            cache_path = os.path.join(cache_dir, f"wasm_{digest}.py")
            if os.path.exists(cache_path):
                with open(cache_path) as f:
                    src = f.read()
        if src is None:
            src = transpile(mod)
            if cache_path:
                with open(cache_path, "w") as f:
                    f.write(src)
        ns: dict = {
            "DATA_OFFSETS": [off for off, _seg in mod.datas],
        }
        code = compile(src, f"<wasm {digest}>", "exec")
        exec(code, ns)
        self.exports, self.memory, self.runtime = ns["instantiate"](
            env, [seg for _off, seg in mod.datas]
        )
        self.module = mod
