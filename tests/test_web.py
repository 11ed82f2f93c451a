"""Web UI server tests (the reference Next.js front-end equivalent,
src/components/Circuits.tsx behavior at the HTTP surface)."""

import json
import threading
import urllib.request

import pytest

from halo2_tpu.web import make_server


@pytest.fixture(scope="module")
def server():
    srv = make_server(port=0)  # OS-assigned port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, path, body):
    req = urllib.request.Request(url + path, data=json.dumps(body).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_index_and_svgs(server):
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        page = r.read().decode()
    assert "halo2_tpu" in page and "localStorage" in page
    for idx in range(3):
        with urllib.request.urlopen(server + f"/svg/{idx}", timeout=60) as r:
            svg = r.read().decode()
        assert svg.startswith("<svg")


def test_count_and_simulate(server):
    assert _post(server, "/api/count", {})["count"] == 3
    out = _post(server, "/api/simulate",
                {"input": json.dumps({"x": 2, "y": 2, "constant": 1, "z": 0}),
                 "circuit": 1})
    assert out["result"] == str(2 * 2 * 2 * 2 + 1)
    out = _post(server, "/api/simulate", {"input": "{}", "circuit": 0})
    assert out["result"] == "N/A"


def test_error_surfaces_as_json(server):
    out = _post(server, "/api/prove",
                {"params": "1,2,3", "input": "{}", "circuit": 1})
    assert "error" in out
