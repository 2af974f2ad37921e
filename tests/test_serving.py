"""Serving daemon (multimodal_supernovae_tpu/serving/): dynamic
micro-batching onto the fixed device batch, the HTTP contract, and the
padding-inertness invariant. No reference counterpart — the reference has
no serving path (its closest is evaluate_models.py:269-303, a per-use
model rebuild)."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from multimodal_supernovae_tpu.evaluation.export import (
    batch_to_dict,
    export_encoder,
)
from multimodal_supernovae_tpu.models import CLIPModel
from multimodal_supernovae_tpu.serving import (
    DynamicBatcher,
    EmbedServer,
    ServingModel,
    load_artifact,
)

from tests.test_clip_model import tiny_batch, tiny_cfg

SPEC = {"x": ((3,), np.float32)}


def _echo_fn(calls):
    """Fixed-batch fn that records call batches and returns row sums —
    per-row, so result routing across coalesced requests is checkable."""

    def fn(batch):
        calls.append({k: v.copy() for k, v in batch.items()})
        return [batch["x"].sum(axis=1, keepdims=True)]

    return fn


def _req(x, n):
    return {"x": (x + np.arange(n, dtype=np.float32)[:, None]
                  * np.ones(3, np.float32))}


# ------------------------------------------------------------- batcher


def test_single_request_is_padded_and_unpadded():
    calls = []
    b = DynamicBatcher(_echo_fn(calls), SPEC, batch_size=8, max_wait_ms=0)
    x = np.arange(9, dtype=np.float32).reshape(3, 3)
    (out,) = b.submit({"x": x})
    np.testing.assert_allclose(out, x.sum(axis=1, keepdims=True))
    assert len(calls) == 1 and calls[0]["x"].shape == (8, 3)
    np.testing.assert_array_equal(calls[0]["x"][3:], 0)  # zero padding
    s = b.stats.snapshot()
    assert s["requests"] == 1 and s["samples"] == 3
    assert s["device_calls"] == 1 and s["padded_samples"] == 5
    b.close()


def test_large_request_is_chunked():
    calls = []
    b = DynamicBatcher(_echo_fn(calls), SPEC, batch_size=8, max_wait_ms=0)
    x = np.random.default_rng(0).normal(size=(20, 3)).astype(np.float32)
    (out,) = b.submit({"x": x})
    np.testing.assert_allclose(out, x.sum(axis=1, keepdims=True), rtol=1e-6)
    assert len(calls) == 3  # 8 + 8 + 4
    b.close()


def test_concurrent_requests_coalesce_into_one_device_call():
    calls = []
    b = DynamicBatcher(_echo_fn(calls), SPEC, batch_size=8, max_wait_ms=500)
    xs = [np.random.default_rng(i).normal(size=(3, 3)).astype(np.float32)
          for i in range(2)]
    outs = [None, None]

    def go(i):
        outs[i] = b.submit({"x": xs[i]})[0]

    ts = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    for i in range(2):
        np.testing.assert_allclose(outs[i], xs[i].sum(axis=1, keepdims=True),
                                   rtol=1e-6)
    # both 3-sample requests rode one padded 8-batch
    assert len(calls) == 1
    assert b.stats.snapshot()["batch_fill"] == pytest.approx(6 / 8)
    b.close()


def test_validation_errors():
    b = DynamicBatcher(_echo_fn([]), SPEC, batch_size=4, max_wait_ms=0)
    with pytest.raises(ValueError, match="missing=\\['x'\\]"):
        b.submit({})
    with pytest.raises(ValueError, match="unexpected=\\['y'\\]"):
        b.submit({"x": np.zeros((2, 3), np.float32),
                  "y": np.zeros((2, 3), np.float32)})
    with pytest.raises(ValueError, match="expected shape"):
        b.submit({"x": np.zeros((2, 4), np.float32)})
    with pytest.raises(ValueError, match="empty request"):
        b.submit({"x": np.zeros((0, 3), np.float32)})
    b.close()


def test_mismatched_leading_dims_rejected():
    spec = {"x": ((3,), np.float32), "y": ((2,), np.float32)}
    b = DynamicBatcher(lambda d: [d["x"]], spec, batch_size=4, max_wait_ms=0)
    with pytest.raises(ValueError, match="leading dim"):
        b.submit({"x": np.zeros((2, 3), np.float32),
                  "y": np.zeros((3, 2), np.float32)})
    b.close()


def test_device_error_propagates_and_worker_survives():
    state = {"fail": True}

    def fn(batch):
        if state["fail"]:
            raise RuntimeError("injected device failure")
        return [batch["x"].sum(axis=1, keepdims=True)]

    b = DynamicBatcher(fn, SPEC, batch_size=4, max_wait_ms=0)
    with pytest.raises(RuntimeError, match="injected device failure"):
        b.submit({"x": np.ones((2, 3), np.float32)})
    state["fail"] = False
    (out,) = b.submit({"x": np.ones((2, 3), np.float32)})
    np.testing.assert_allclose(out, 3.0)
    b.close()


# ----------------------------------------------- model + HTTP end-to-end


@pytest.fixture(scope="module")
def tiny_artifact(tmp_path_factory):
    """Export a tiny CLIP at B=8 and return (path, model, variables,
    example batch) for live-vs-served comparisons."""
    rng = np.random.default_rng(0)
    cfg = tiny_cfg()
    batch = tiny_batch(rng, b=8)
    model = CLIPModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    data = export_encoder(model, variables, batch)
    path = tmp_path_factory.mktemp("serve") / "model.stablehlo"
    path.write_bytes(data)
    d = batch_to_dict(batch, cfg.combinations)
    manifest = {
        "batch_size": 8,
        "input": {k: {"shape": list(np.shape(v)),
                      "dtype": str(np.asarray(v).dtype)} for k, v in d.items()},
        "output_modalities": ["lightcurve", "spectral"],
    }
    (path.parent / "model.stablehlo.json").write_text(json.dumps(manifest))
    return str(path), model, variables, batch


def _inputs(batch, cfg, rows):
    d = batch_to_dict(batch, cfg.combinations)
    return {k: np.asarray(v)[rows] for k, v in d.items()}


def test_padding_is_inert(tiny_artifact):
    """The invariant dynamic batching rests on: a sample's embedding does
    not depend on what else (real rows or zero pad) shares its device
    batch."""
    path, model, variables, batch = tiny_artifact
    sm = load_artifact(path)
    b = DynamicBatcher(sm.fn, {k: v for k, v in sm.input_spec.items()},
                       sm.batch_size, max_wait_ms=0)
    full = _inputs(batch, model.cfg, np.arange(8))
    want = [np.asarray(o) for o in sm.fn(full)]  # the exact full-batch call
    got = b.submit({k: v[:3] for k, v in full.items()})  # padded with zeros
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w[:3], rtol=1e-5, atol=1e-6)
    b.close()


@pytest.fixture(scope="module")
def server(tiny_artifact):
    path, model, variables, batch = tiny_artifact
    srv = EmbedServer(load_artifact(path), port=0,
                      max_wait_ms=0).start_background()
    yield srv, model, variables, batch
    srv.close()


def _post(port, body, ctype, path="/embed"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body,
        headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.read(), r.headers.get("Content-Type")


def test_http_healthz_contract(server):
    srv, model, *_ = server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["batch_size"] == 8
    assert h["output_modalities"] == ["lightcurve", "spectral"]
    assert h["input"]["x_lc"]["shape"] == ["n", 10]
    assert h["source"] == "artifact"


def test_http_embed_npz_matches_live_model(server):
    srv, model, variables, batch = server
    feed = _inputs(batch, model.cfg, np.arange(5))
    buf = io.BytesIO()
    np.savez(buf, **feed)
    body, ctype = _post(srv.port, buf.getvalue(), "application/x-npz")
    assert ctype == "application/x-npz"
    with np.load(io.BytesIO(body)) as z:
        got = {k: z[k] for k in z.files}
    assert set(got) == {"emb_lightcurve", "emb_spectral"}
    want = model.apply(variables, batch, method=model.encode)
    for i, m in enumerate(("lightcurve", "spectral")):
        assert got[f"emb_{m}"].shape == (5, 4)
        np.testing.assert_allclose(got[f"emb_{m}"], np.asarray(want[i])[:5],
                                   rtol=1e-5, atol=1e-6)
        # embeddings arrive L2-normalized, ready for retrieval
        np.testing.assert_allclose(
            np.linalg.norm(got[f"emb_{m}"], axis=-1), 1.0, rtol=1e-5)


def test_http_embed_json(server):
    srv, model, variables, batch = server
    feed = {k: v.tolist()
            for k, v in _inputs(batch, model.cfg, np.arange(2)).items()}
    body, ctype = _post(srv.port, json.dumps(feed).encode(),
                        "application/json")
    assert ctype == "application/json"
    out = json.loads(body)
    assert np.asarray(out["emb_lightcurve"]).shape == (2, 4)


def test_http_bad_request_is_400_not_crash(server):
    srv, model, variables, batch = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv.port, b"not an npz", "application/x-npz")
    assert ei.value.code == 400
    # contract violation: wrong trailing shape
    buf = io.BytesIO()
    np.savez(buf, **{k: np.zeros((2, 99), np.float32)
                     for k in ("x_lc", "t_lc", "mask_lc",
                               "x_sp", "t_sp", "mask_sp")})
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv.port, buf.getvalue(), "application/x-npz")
    assert ei.value.code == 400
    assert "expected shape" in json.loads(ei.value.read())["error"]
    # the server still serves after bad requests
    feed = _inputs(batch, model.cfg, np.arange(1))
    buf = io.BytesIO()
    np.savez(buf, **feed)
    body, _ = _post(srv.port, buf.getvalue(), "application/x-npz")
    with np.load(io.BytesIO(body)) as z:
        assert z["emb_lightcurve"].shape == (1, 4)


def test_http_stats(server):
    srv, *_ = server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stats", timeout=30) as r:
        s = json.loads(r.read())
    assert s["device_calls"] >= 1 and s["samples"] >= 1
    assert 0 < s["batch_fill"] <= 1
    assert s["latency_ms"]["p50"] > 0


@pytest.mark.slow
def test_serve_cli_end_to_end(tiny_artifact, tmp_path):
    """scripts/serve.py as a subprocess: startup line, live request,
    clean shutdown."""
    import os
    import signal
    import subprocess
    import sys

    path, model, variables, batch = tiny_artifact
    REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    log = open(tmp_path / "serve.log", "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--artifact", path, "--port", "0", "--platform", "cpu", "--quiet"],
        stdout=log, stderr=subprocess.STDOUT, env=env, cwd=REPO,
    )
    try:
        port = None
        for _ in range(600):  # jax import + warmup compile
            time.sleep(0.5)
            for line in open(tmp_path / "serve.log"):
                if line.startswith("{") and '"serving": true' in line:
                    port = json.loads(line)["port"]
                    break
            if port or proc.poll() is not None:
                break
        assert proc.poll() is None, open(tmp_path / "serve.log").read()[-3000:]
        assert port, "server never printed its startup line"
        feed = _inputs(batch, model.cfg, np.arange(4))
        buf = io.BytesIO()
        np.savez(buf, **feed)
        body, _ = _post(port, buf.getvalue(), "application/x-npz")
        with np.load(io.BytesIO(body)) as z:
            want = model.apply(variables, batch, method=model.encode)
            np.testing.assert_allclose(
                z["emb_lightcurve"], np.asarray(want[0])[:4],
                rtol=1e-5, atol=1e-6)
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=30)
        log.close()
