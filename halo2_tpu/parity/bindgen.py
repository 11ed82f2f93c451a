"""wasm-bindgen ABI emulation (Python port of the reference's generated
`halo2_prover.js` glue) plus a minimal JS object model for the getrandom
shims.

The wasm module manages JS values through a heap of indices (the classic
pre-externref wasm-bindgen model): `addHeapObject`/`takeObject` here mirror
the JS glue exactly, including the freelist encoding and the 4 reserved
slots (undefined, null, true, false at 128..131).

Randomness: the module's only nondeterminism is `crypto.getRandomValues`
(used by Rust's OsRng for SRS tau and proof blinding).  The shim fills from
a seeded Blake2b stream, so the "Rust prover" becomes reproducible —
enabling stored golden vectors.
"""

from __future__ import annotations

import hashlib


class _Undefined:
    def __repr__(self):
        return "undefined"


UNDEFINED = _Undefined()


class JSError:
    def __init__(self, stack: str = ""):
        self.stack = stack


class U8View:
    """A Uint8Array: either a view over the wasm memory (buffer is the live
    bytearray) or a standalone buffer."""

    def __init__(self, buffer, offset: int = 0, length: int | None = None):
        self.buffer = buffer
        self.offset = offset
        self.length = len(buffer) - offset if length is None else length

    def set(self, src: "U8View", dst_off: int = 0) -> None:
        data = src.to_bytes()
        s = self.offset + dst_off
        self.buffer[s : s + len(data)] = data

    def subarray(self, start: int, end: int) -> "U8View":
        return U8View(self.buffer, self.offset + start, end - start)

    def fill_from(self, data: bytes) -> None:
        self.buffer[self.offset : self.offset + len(data)] = data

    def to_bytes(self) -> bytes:
        return bytes(self.buffer[self.offset : self.offset + self.length])


class RandomStream:
    """Deterministic byte stream standing in for crypto.getRandomValues."""

    def __init__(self, seed: bytes | None):
        import os

        self.seed = seed if seed is not None else os.urandom(32)
        self.ctr = 0

    def take(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            out += hashlib.blake2b(
                self.seed + self.ctr.to_bytes(8, "little"),
                digest_size=64,
                person=b"wasmrt-getrandom",
            ).digest()
            self.ctr += 1
        return bytes(out[:n])


class Crypto:
    def __init__(self, rng: RandomStream):
        self.rng = rng

    def getRandomValues(self, view: U8View) -> None:
        view.fill_from(self.rng.take(view.length))


class GlobalObj:
    """globalThis with just enough surface for getrandom's browser path."""

    def __init__(self, rng: RandomStream):
        self.crypto = Crypto(rng)
        self.process = UNDEFINED
        self.msCrypto = UNDEFINED
        self.node = UNDEFINED
        self.versions = UNDEFINED


class Bindgen:
    """Instantiates the module with the full wbg import set and exposes the
    high-level exported functions with JS-glue-equivalent marshalling."""

    def __init__(self, wasm_bytes: bytes, rng_seed: bytes | None = b"halo2-parity",
                 cache_dir: str | None = None, log=None):
        from .wasmrt import WasmInstance

        self.heap: list = [UNDEFINED] * 128 + [UNDEFINED, None, True, False]
        self.heap_next = len(self.heap)
        self.rng = RandomStream(rng_seed)
        self.global_obj = GlobalObj(self.rng)
        self.log = log or (lambda s: None)
        self._vector_len = 0
        env = self._imports()
        self.inst = WasmInstance(wasm_bytes, env, cache_dir=cache_dir)
        self.exports = self.inst.exports
        self.mem = self.inst.memory

    # ---- heap management (mirrors halo2_prover.js) -------------------------

    def add(self, obj) -> int:
        if self.heap_next == len(self.heap):
            self.heap.append(len(self.heap) + 1)
        idx = self.heap_next
        self.heap_next = self.heap[idx]
        self.heap[idx] = obj
        return idx

    def get(self, idx: int):
        return self.heap[idx]

    def drop(self, idx: int) -> None:
        if idx < 132:
            return
        self.heap[idx] = self.heap_next
        self.heap_next = idx

    def take(self, idx: int):
        obj = self.get(idx)
        self.drop(idx)
        return obj

    # ---- marshalling ---------------------------------------------------------

    def _get_string(self, ptr: int, ln: int) -> str:
        return bytes(self.mem[ptr : ptr + ln]).decode("utf-8")

    def pass_string(self, s: str) -> tuple[int, int]:
        data = s.encode("utf-8")
        ptr = self.exports["__wbindgen_malloc"](len(data), 1)
        self.mem[ptr : ptr + len(data)] = data
        return ptr, len(data)

    def pass_bytes(self, data: bytes) -> tuple[int, int]:
        ptr = self.exports["__wbindgen_malloc"](len(data), 1)
        self.mem[ptr : ptr + len(data)] = data
        return ptr, len(data)

    def _i32(self, addr: int) -> int:
        return int.from_bytes(self.mem[addr : addr + 4], "little")

    # ---- imports ----------------------------------------------------------------

    def _imports(self) -> dict:
        b = self

        def handle_error(fn):
            def wrapped(*args):
                try:
                    return fn(*args)
                except Exception as e:  # mirror JS handleError
                    b.exports["__wbindgen_exn_store"](b.add(JSError(str(e))))

            return wrapped

        def getattr_shim(name):
            def fn(arg0):
                obj = b.get(arg0)
                return b.add(getattr(obj, name, UNDEFINED))

            return fn

        env = {
            "wbg.__wbg_log_fb75e50de18aef2c": lambda p, ln: b.log(
                b._get_string(p, ln)
            ),
            "wbg.__wbg_new_abda76e883ba8a5f": lambda: b.add(JSError()),
            "wbg.__wbg_stack_658279fe44541cf6": lambda retptr, objidx: (
                b._write_string_ret(retptr, b.get(objidx).stack)
            ),
            "wbg.__wbg_error_f851667af71bcfc6": lambda p, ln: (
                b.log("ERROR: " + b._get_string(p, ln)),
                b.exports["__wbindgen_free"](p, ln, 1),
            )[0],
            "wbg.__wbindgen_object_drop_ref": lambda i: (b.take(i), None)[1],
            "wbg.__wbg_getRandomValues_37fa2ca9e4e07fab": handle_error(
                lambda c, v: b.get(c).getRandomValues(b.get(v))
            ),
            "wbg.__wbg_randomFillSync_dc1e9a60c158336d": handle_error(
                lambda c, v: b.get(c).getRandomValues(b.take(v))
            ),
            "wbg.__wbg_crypto_c48a774b022d20ac": getattr_shim("crypto"),
            "wbg.__wbindgen_is_object": lambda i: int(
                not isinstance(b.get(i), (_Undefined, str, int, float, bool))
                and b.get(i) is not None
            ),
            "wbg.__wbg_process_298734cf255a885d": getattr_shim("process"),
            "wbg.__wbg_versions_e2e78e134e3e5d01": getattr_shim("versions"),
            "wbg.__wbg_node_1cd7a5d853dbea79": getattr_shim("node"),
            "wbg.__wbindgen_is_string": lambda i: int(isinstance(b.get(i), str)),
            "wbg.__wbg_msCrypto_bcb970640f50a1e8": getattr_shim("msCrypto"),
            "wbg.__wbg_require_8f08ceecec0f4fee": handle_error(
                lambda: (_ for _ in ()).throw(RuntimeError("no require"))
            ),
            "wbg.__wbindgen_is_function": lambda i: int(callable(b.get(i))),
            "wbg.__wbindgen_string_new": lambda p, ln: b.add(b._get_string(p, ln)),
            "wbg.__wbg_newnoargs_581967eacc0e2604": lambda p, ln: b.add(
                lambda this=None: b.global_obj  # Function("return this")
            ),
            "wbg.__wbg_call_cb65541d95d71282": handle_error(
                lambda f, this: b.add(b.get(f)(b.get(this)))
            ),
            "wbg.__wbindgen_object_clone_ref": lambda i: b.add(b.get(i)),
            "wbg.__wbg_self_1ff1d729e9aae938": handle_error(
                lambda: b.add(b.global_obj)
            ),
            "wbg.__wbg_window_5f4faef6c12b79ec": handle_error(
                lambda: b.add(b.global_obj)
            ),
            "wbg.__wbg_globalThis_1d39714405582d3c": handle_error(
                lambda: b.add(b.global_obj)
            ),
            "wbg.__wbg_global_651f05c6a0944d1c": handle_error(
                lambda: b.add(b.global_obj)
            ),
            "wbg.__wbindgen_is_undefined": lambda i: int(
                isinstance(b.get(i), _Undefined)
            ),
            "wbg.__wbg_call_01734de55d61e11d": handle_error(
                lambda f, this, a0: b.add(b.get(f)(b.get(this), b.get(a0)))
            ),
            "wbg.__wbg_buffer_085ec1f694018c4f": lambda i: b.add(
                b.get(i).buffer if isinstance(b.get(i), U8View) else b.mem
            ),
            "wbg.__wbg_newwithbyteoffsetandlength_6da8e527659b86aa": (
                lambda buf, off, ln: b.add(U8View(b.get(buf), off, ln))
            ),
            "wbg.__wbg_new_8125e318e6245eed": lambda i: b.add(
                b._u8_from(b.get(i))
            ),
            "wbg.__wbg_set_5cf90238115182c3": lambda dst, src, off: b.get(
                dst
            ).set(b.get(src), off),
            "wbg.__wbg_length_72e2208bbc0efc61": lambda i: b.get(i).length,
            "wbg.__wbg_newwithlength_e5d69174d6984cd7": lambda ln: b.add(
                U8View(bytearray(ln))
            ),
            "wbg.__wbg_subarray_13db269f57aa838d": lambda i, s, e: b.add(
                b.get(i).subarray(s, e)
            ),
            "wbg.__wbindgen_throw": lambda p, ln: (_ for _ in ()).throw(
                RuntimeError(b._get_string(p, ln))
            ),
            "wbg.__wbindgen_memory": lambda: b.add(b.mem),
        }
        return env

    def _u8_from(self, obj):
        # new Uint8Array(arg): from ArrayBuffer (here: the raw bytearray)
        if isinstance(obj, (bytearray, bytes)):
            return U8View(obj if isinstance(obj, bytearray) else bytearray(obj))
        if isinstance(obj, U8View):
            return U8View(bytearray(obj.to_bytes()))
        raise TypeError(f"new Uint8Array({obj!r})")

    def _write_string_ret(self, retptr: int, s: str) -> None:
        ptr, ln = self.pass_string(s)
        self.mem[retptr + 4 : retptr + 8] = ln.to_bytes(4, "little")
        self.mem[retptr : retptr + 4] = ptr.to_bytes(4, "little")

    # ---- exported API (mirrors halo2_prover.js exports) ------------------------

    def setup(self, k: int) -> bytes:
        ret = self.exports["setup"](k)
        return self.take(ret).to_bytes()

    def wasm_simulate_circuit(self, s: str, circuit: int) -> str:
        retptr = self.exports["__wbindgen_add_to_stack_pointer"]((-16) & 0xFFFFFFFF)
        try:
            p0, l0 = self.pass_string(s)
            self.exports["wasm_simulate_circuit"](retptr, p0, l0, circuit)
            r0 = self._i32(retptr)
            r1 = self._i32(retptr + 4)
            out = self._get_string(r0, r1)
            self.exports["__wbindgen_free"](r0, r1, 1)
            return out
        finally:
            self.exports["__wbindgen_add_to_stack_pointer"](16)

    def wasm_generate_proof(self, params: bytes, s: str, circuit: int) -> bytes:
        p0, l0 = self.pass_bytes(params)
        p1, l1 = self.pass_string(s)
        ret = self.exports["wasm_generate_proof"](p0, l0, p1, l1, circuit)
        return self.take(ret).to_bytes()

    def wasm_verify_proof(
        self, params: bytes, proof: bytes, s: str, circuit: int
    ) -> bool:
        p0, l0 = self.pass_bytes(params)
        p1, l1 = self.pass_bytes(proof)
        p2, l2 = self.pass_string(s)
        ret = self.exports["wasm_verify_proof"](p0, l0, p1, l1, p2, l2, circuit)
        return ret != 0

    def get_circuit_count(self) -> int:
        return self.exports["get_circuit_count"]()
