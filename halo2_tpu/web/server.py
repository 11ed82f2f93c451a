"""Web UI: the reference's Next.js front-end equivalent, stdlib-only.

Mirrors the reference page (src/pages/index.tsx + src/components/Circuits.tsx):
a circuit carousel (layout SVGs, index arithmetic mod get_circuit_count()),
a JSON-input textarea, and Setup / Simulate / Prove / Verify / Clear buttons.
Params and proofs live in the browser's localStorage as comma-joined byte
strings — exactly the reference's storage scheme (Circuits.tsx:89-116) — and
are POSTed back for prove/verify, keeping the server stateless like the WASM
module.

Run: python -m halo2_tpu.web.server [--port 8777]
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

PAGE = """<!DOCTYPE html>
<html><head><title>halo2_tpu</title><style>
body { font-family: monospace; background: #111; color: #eee; margin: 2em; }
button { margin: 0.3em; padding: 0.5em 1.2em; background: #333; color: #eee;
         border: 1px solid #666; cursor: pointer; }
button:hover { background: #444; }
textarea { width: 40em; height: 5em; background: #222; color: #eee; }
#svg { background: #fff; padding: 1em; display: inline-block; min-width: 20em;
       min-height: 10em; }
.row { margin: 1em 0; }
#status { color: #8f8; white-space: pre-wrap; }
</style></head><body>
<h2>halo2_tpu — TPU-native halo2 prover</h2>
<div class="row">
  <button onclick="move(-1)">&larr;</button>
  <span id="name"></span>
  <button onclick="move(1)">&rarr;</button>
</div>
<div class="row" id="svg"></div>
<div class="row"><textarea id="input"></textarea></div>
<div class="row">
  <button onclick="setup()">Setup Params</button>
  <button onclick="simulate()">Simulate Circuit</button>
  <button onclick="prove()">Generate Proof</button>
  <button onclick="verify()">Verify Proof</button>
  <button onclick="clearAll()">Clear</button>
</div>
<div class="row" id="status"></div>
<script>
const NAMES = ["Collatz", "Arithmetic", "Poseidon"];
const DEFAULTS = ['{"x": [6]}',
                  '{"x": 3, "y": 4, "constant": 7, "z": 151}',
                  '{"x": [1, 2]}'];
let count = 3, idx = 1;
function st(msg) { document.getElementById("status").textContent = msg; }
async function post(path, body) {
  const r = await fetch(path, {method: "POST", body: JSON.stringify(body)});
  return await r.json();
}
function render() {
  document.getElementById("name").textContent = NAMES[idx] + " (" + idx + ")";
  document.getElementById("input").value =
      localStorage.getItem("input" + idx) || DEFAULTS[idx];
  fetch("/svg/" + idx).then(r => r.text()).then(
      s => document.getElementById("svg").innerHTML = s);
}
function move(d) {
  localStorage.setItem("input" + idx, document.getElementById("input").value);
  idx = ((idx + d) % count + count) % count; render();
}
async function setup() {
  st("setting up params (k=10)...");
  const r = await post("/api/setup", {k: 10});
  localStorage.setItem("setup_params", r.params);   // comma-joined bytes
  st("params stored (" + r.params.split(",").length + " bytes)");
}
async function simulate() {
  const r = await post("/api/simulate",
      {input: document.getElementById("input").value, circuit: idx});
  alert("Simulation result: " + r.result);
}
async function prove() {
  const params = localStorage.getItem("setup_params");
  if (!params) { st("run Setup first"); return; }
  st("proving...");
  const r = await post("/api/prove",
      {params: params, input: document.getElementById("input").value,
       circuit: idx});
  if (r.error) { st("Invalid params, circuit, or input: " + r.error); return; }
  localStorage.setItem("proof", r.proof);
  st("proof stored (" + r.proof.split(",").length + " bytes)");
}
async function verify() {
  const params = localStorage.getItem("setup_params");
  const proof = localStorage.getItem("proof");
  if (!params || !proof) { st("need params and a proof"); return; }
  st("verifying...");
  const r = await post("/api/verify",
      {params: params, proof: proof,
       input: document.getElementById("input").value, circuit: idx});
  st(r.valid ? "Valid Proof" : "Invalid Proof");
}
function clearAll() { localStorage.clear(); st("cleared"); }
fetch("/api/count").then(r => r.json()).then(r => { count = r.count; render(); });
</script></body></html>
"""


def _bytes_from_csv(s: str) -> bytes:
    return bytes(int(v) for v in s.split(",") if v != "")


def _csv_from_bytes(b: bytes) -> str:
    return ",".join(str(v) for v in b)


class Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, obj) -> None:
        self._send(200, json.dumps(obj).encode(), "application/json")

    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            self._send(200, PAGE.encode(), "text/html")
            return
        if self.path == "/api/count":
            from .. import api

            self._json({"count": api.get_circuit_count()})
            return
        if self.path.startswith("/svg/"):
            from ..circuits import arithmetic, collatz, poseidon_circuit
            from ..viz import render_layout

            idx = int(self.path.rsplit("/", 1)[1]) % 3
            jobs = [
                (10, collatz.create_circuit(collatz.collatz_conjecture(4))),
                (4, arithmetic.empty_circuit(7)),
                (6, poseidon_circuit.create_circuit([1, 2])),
            ]
            k, circuit = jobs[idx]
            self._send(200, render_layout(k, circuit, "").encode(),
                       "image/svg+xml")
            return
        self._send(404, b"not found", "text/plain")

    def do_POST(self):
        from .. import api

        length = int(self.headers.get("Content-Length", "0"))
        body = json.loads(self.rfile.read(length) or b"{}")
        try:
            if self.path == "/api/count":
                self._json({"count": api.get_circuit_count()})
            elif self.path == "/api/setup":
                params = api.setup(int(body.get("k", 10)))
                self._json({"params": _csv_from_bytes(params)})
            elif self.path == "/api/simulate":
                self._json(
                    {"result": api.simulate_circuit(body["input"],
                                                    int(body["circuit"]))}
                )
            elif self.path == "/api/prove":
                proof = api.generate_proof(
                    _bytes_from_csv(body["params"]), body["input"],
                    int(body["circuit"]),
                )
                self._json({"proof": _csv_from_bytes(proof)})
            elif self.path == "/api/verify":
                ok = api.verify_proof(
                    _bytes_from_csv(body["params"]),
                    _bytes_from_csv(body["proof"]),
                    body["input"], int(body["circuit"]),
                )
                self._json({"valid": bool(ok)})
            else:
                self._send(404, b"{}", "application/json")
        except Exception as e:  # surface as the reference UI's error alerts
            self._json({"error": str(e)})


def make_server(port: int = 8777) -> ThreadingHTTPServer:
    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8777)
    args = p.parse_args(argv)
    srv = make_server(args.port)
    print(f"halo2_tpu web UI on http://127.0.0.1:{args.port}")
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    main()
