"""HTTP inference server (particle_fm_tpu/server.py + scripts/serve_model.py).

Beyond-reference: the reference has no serving layer. These tests run a REAL
ThreadingHTTPServer over a real exported artifact and drive it with a real
HTTP client (urllib): health/meta endpoints, conditional sampling with
explicit masks and with per-sample multiplicities, request chunking past the
artifact's compiled batch size, seed determinism, and the 400 error paths.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from particle_fm_tpu import serving
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.server import make_server


def _request(url, body=None):
    req = urllib.request.Request(
        url,
        data=None if body is None else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="GET" if body is None else "POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    model = FlowMatchingModel(
        num_particles=8, features=3, hidden_dim=16, latent=4, layers=1,
        global_cond_dim=2, local_cond_dim=2,
    )
    variables = model.init(jax.random.PRNGKey(0))
    means, stds = np.array([0.1, -0.2, 0.3]), np.array([1.5, 2.0, 0.5])
    blob, meta = serving.export_sampler(
        model, variables, batch_size=4, num_points=8, features=3, cond_dim=2,
        use_mask=True, ode_solver="midpoint", ode_steps=4, means=means, stds=stds,
    )
    out = serving.save_exported(
        str(tmp_path_factory.mktemp("artifact") / "exported"), blob, meta
    )
    srv = make_server(out, port=0)  # ephemeral port; warmup included
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        t.join(timeout=10)


@pytest.fixture(scope="module")
def url(server):
    host, port = server.server_address[:2]
    return f"http://{host}:{port}"


def test_healthz_and_meta(url):
    status, body = _request(f"{url}/healthz")
    assert status == 200 and body["status"] == "ok"
    assert body["requests_served"] >= 1  # warmup counted
    status, meta = _request(f"{url}/meta")
    assert status == 200
    assert meta["batch_size"] == 4 and meta["output_units"] == "physical"


def test_sample_chunked_conditional(url):
    # n_samples=6 > batch_size=4 exercises the padded-chunk driver
    rs = np.random.RandomState(0)
    cond = rs.randn(6, 2).astype(np.float32).tolist()
    mult = [8, 5, 3, 8, 1, 7]
    status, body = _request(
        f"{url}/sample",
        {"n_samples": 6, "seed": 3, "cond": cond, "num_points": mult},
    )
    assert status == 200 and body["shape"] == [6, 8, 3]
    x = np.asarray(body["samples"], np.float32)
    assert np.isfinite(x).all()
    # the multiplicity mask zeroes padding rows in physical space
    for i, m in enumerate(mult):
        assert np.all(x[i, m:] == 0)
        assert np.abs(x[i, :m]).max() > 0

    # same seed -> identical samples; different seed -> different
    _, again = _request(
        f"{url}/sample",
        {"n_samples": 6, "seed": 3, "cond": cond, "num_points": mult},
    )
    np.testing.assert_array_equal(np.asarray(again["samples"]), x)
    _, other = _request(
        f"{url}/sample",
        {"n_samples": 6, "seed": 4, "cond": cond, "num_points": mult},
    )
    assert np.abs(np.asarray(other["samples"]) - x).max() > 1e-3


def test_sample_explicit_mask_2d(url):
    cond = np.zeros((2, 2), np.float32).tolist()
    mask = [[1, 1, 1, 0, 0, 0, 0, 0], [1] * 8]
    status, body = _request(
        f"{url}/sample", {"n_samples": 2, "cond": cond, "mask": mask}
    )
    assert status == 200
    x = np.asarray(body["samples"])
    assert x.shape == (2, 8, 3) and np.all(x[0, 3:] == 0)


@pytest.mark.parametrize(
    "body,frag",
    [
        ({}, "n_samples"),
        ({"n_samples": 0}, ">= 1"),
        ({"n_samples": 2}, "'cond'"),                              # conditional artifact
        ({"n_samples": 2, "cond": [[0.0, 0.0]]}, "cond shape"),    # wrong rows
        ({"n_samples": 2, "cond": [[0.0, 0.0]] * 2,
          "num_points": [9, 2]}, "[0, 8]"),                        # mult > num_points
        ({"n_samples": 2, "cond": [[0.0, 0.0]] * 2,
          "mask": [[1] * 5] * 2}, "mask shape"),
        ({"n_samples": 100000}, "cap"),                            # > max_n_samples
        ({"n_samples": 2, "cond": [[0.0, 0.0]] * 2,
          "seed": "abc"}, "'seed'"),                               # non-integer seed
        ({"n_samples": 2, "cond": [[0.0, 0.0]] * 2,
          "seed": -1}, "'seed'"),                                  # negative seed
    ],
)
def test_sample_bad_requests_400(url, body, frag):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _request(f"{url}/sample", body)
    assert exc.value.code == 400
    err = json.loads(exc.value.read())["error"]
    assert frag in err


def test_unknown_route_404(url):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _request(f"{url}/nope")
    assert exc.value.code == 404


def test_oversized_body_413_without_reading(url):
    """A Content-Length above the server cap is rejected up front (413),
    before the body is read — the guard cannot be bypassed by never sending
    the advertised bytes."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(url)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
    try:
        conn.putrequest("POST", "/sample")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(10**12))  # 1 TB claimed
        conn.endheaders()
        conn.send(b"{}")  # tiny actual payload; server must not block on read
        resp = conn.getresponse()
        assert resp.status == 413
        assert "exceeds" in json.loads(resp.read())["error"]
    finally:
        conn.close()


def test_mask_rejected_when_artifact_unmasked():
    """use_mask=False artifacts must 400 on client mask/num_points instead of
    silently ignoring them (the client would otherwise believe its mask was
    applied)."""
    from particle_fm_tpu.server import RequestError, SamplerService

    svc = SamplerService.__new__(SamplerService)  # no artifact load needed
    svc.meta = {"use_mask": False, "num_points": 8}
    with pytest.raises(RequestError, match="without mask support"):
        svc._build_mask({"mask": [[1] * 8]}, 1)
    with pytest.raises(RequestError, match="without mask support"):
        svc._build_mask({"num_points": [4]}, 1)
    assert svc._build_mask({}, 1) is None


def test_chunk_seed_independence(url):
    """serve_batches keys each chunk by hashing (seed, chunk): with equal
    cond, request seed=s+1 chunk 0 must NOT reproduce seed=s chunk 1 (the
    failure mode of a naive `seed + chunk` stride)."""
    cond = [[0.25, -0.5]] * 6  # identical rows so only the RNG stream differs
    _, a = _request(f"{url}/sample", {"n_samples": 6, "seed": 3, "cond": cond})
    _, b = _request(f"{url}/sample", {"n_samples": 6, "seed": 4, "cond": cond})
    xa = np.asarray(a["samples"], np.float32)  # chunks: [0:4], [4:6]
    xb = np.asarray(b["samples"], np.float32)
    assert np.abs(xb[:2] - xa[4:6]).max() > 1e-3
