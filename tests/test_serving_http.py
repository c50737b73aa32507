"""HTTP endpoint over the micro-batching frontend: request/response formats,
concurrent clients coalescing on device, and error reporting."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from text2loc_tpu import constants as C
from text2loc_tpu.serving import Localizer
from text2loc_tpu.serving_frontend import BatchingFrontend
from text2loc_tpu.serving_http import LocalizationServer

from test_serving import _states


@pytest.fixture(scope="module")
def server(small_cfg, small_embedder, small_data):
    cs, cm, fs, fm = _states(small_cfg, small_embedder, small_data)
    loc = Localizer(small_data, cs, cm, fs, fm, small_embedder, small_cfg,
                    top_k=3)
    fe = BatchingFrontend(loc, max_batch=16, max_wait_s=0.05)
    with LocalizationServer(fe, port=0) as srv:
        yield srv, loc, small_data


def _post(addr, payload, timeout=300):
    host, port = addr
    req = urllib.request.Request(
        f"http://{host}:{port}/localize",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(addr, path, timeout=60):
    host, port = addr
    with urllib.request.urlopen(f"http://{host}:{port}{path}",
                                timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_healthz_and_hints_roundtrip(server):
    srv, loc, data = server
    assert _get(srv.address, "/healthz") == (200, {"ok": True})

    status, out = _post(srv.address, {"hints": {
        "dir": data.hint_dir[0].tolist(),
        "color": data.hint_color[0].tolist(),
        "label": data.hint_label[0].tolist(),
    }})
    assert status == 200
    direct = loc.localize(data.hint_dir[:1], data.hint_color[:1],
                          data.hint_label[:1])
    np.testing.assert_allclose(out["position"], direct.position_w[0],
                               atol=1e-3)
    assert out["cells"] == direct.cell_indices[0].tolist()
    assert len(out["candidates"]) == 3 and len(out["scores"]) == 3


def test_description_and_concurrent_batching(server):
    srv, loc, data = server
    d0 = " ".join(
        C.render_hint(data.hint_dir[0][s], data.hint_color[0][s],
                      data.hint_label[0][s])
        for s in range(data.hint_dir.shape[1])
    )
    before = srv.frontend.stats.requests
    results = [None] * 8
    errs = []

    def client(i):
        try:
            results[i] = _post(srv.address, {"description": d0})
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert all(s == 200 for s, _ in results)
    direct = loc.localize_text([d0])
    for _, out in results:
        assert out["cells"] == direct.cell_indices[0].tolist()
        np.testing.assert_allclose(out["position"], direct.position_w[0],
                                   atol=1e-3)
    # The 8 HTTP requests reached the device in fewer than 8 dispatches.
    st = srv.frontend.stats
    assert st.requests - before >= 8
    assert st.dispatches < st.requests

    status, stats = _get(srv.address, "/stats")
    assert status == 200 and stats["requests"] == st.requests


def test_error_paths(server):
    srv, _, data = server
    status, out = _post(srv.address, {})
    assert status == 400 and "need" in out["error"]
    status, out = _post(srv.address, {"hints": {"dir": [0]}})  # missing keys
    assert status == 400 and "KeyError" in out["error"]
    status, out = _post(srv.address,
                        {"description": "take me to the glowing obelisk"})
    assert status == 400 and "HintParseError" in out["error"]
    host, port = srv.address
    req = urllib.request.Request(f"http://{host}:{port}/nope", data=b"{}")
    try:
        urllib.request.urlopen(req, timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 404
    assert raised
