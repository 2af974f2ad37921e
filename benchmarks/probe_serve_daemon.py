#!/usr/bin/env python
"""Measure the serving daemon on the real chip: export the flagship
maven-lite encoder (bench.py shapes) to a StableHLO artifact, serve it via
the dynamic-batching HTTP daemon (multimodal_supernovae_tpu/serving/), and
drive concurrent npz clients over localhost.

Reports:
  * interactive floor: single n=1 request latency (one device call + HTTP
    + tunnel RTT);
  * sustained throughput at client concurrency 1 / 8 / 32 (requests of 32
    samples), with batch fill and latency percentiles.

Writes probe_serve_daemon.json next to this file.

Usage: nohup python benchmarks/probe_serve_daemon.py > /tmp/serve_probe.log &
"""

from __future__ import annotations

import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

BATCH = int(os.environ.get("MMSN_SERVE_BATCH", 256))
REQ_N = 32
DURATION_S = 10.0


def build_artifact(tmpdir: str) -> str:
    from bench import build_setup

    from multimodal_supernovae_tpu.evaluation.export import (
        batch_to_dict,
        export_encoder,
    )

    setup = build_setup(batch=BATCH, steps_per_scan=1)
    model, state, data = setup["model"], setup["state"], setup["data"]
    example = data.take(np.arange(BATCH))
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    blob = export_encoder(model, variables, example)
    path = os.path.join(tmpdir, "maven_lite.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    d = batch_to_dict(example, model.cfg.combinations)
    manifest = {
        "batch_size": BATCH,
        "input": {k: {"shape": list(np.shape(v)),
                      "dtype": str(np.asarray(v).dtype)} for k, v in d.items()},
        "output_modalities": ["lightcurve", "spectral"],
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f)
        f.write("\n")
    print(f"artifact: {len(blob)/1e6:.1f} MB at {path}", flush=True)
    return path


def _post(port: int, body: bytes) -> bytes:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/embed", data=body,
        headers={"Content-Type": "application/x-npz"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read()


def _payload(feed, n):
    buf = io.BytesIO()
    np.savez(buf, **{k: v[:n] for k, v in feed.items()})
    return buf.getvalue()


def run_load(port, payload, concurrency, duration_s, req_n):
    stop = time.monotonic() + duration_s
    counts = [0] * concurrency
    lats = [[] for _ in range(concurrency)]

    def client(i):
        while time.monotonic() < stop:
            t0 = time.monotonic()
            _post(port, payload)
            lats[i].append((time.monotonic() - t0) * 1e3)
            counts[i] += 1

    ts = [threading.Thread(target=client, args=(i,)) for i in range(concurrency)]
    t0 = time.monotonic()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.monotonic() - t0
    lat = np.concatenate([np.asarray(l) for l in lats if l])
    return {
        "concurrency": concurrency,
        "request_samples": req_n,
        "requests": int(sum(counts)),
        "wall_s": round(wall, 2),
        "samples_per_s": round(sum(counts) * req_n / wall, 1),
        "latency_ms": {"p50": round(float(np.percentile(lat, 50)), 2),
                       "p99": round(float(np.percentile(lat, 99)), 2)},
    }


def main():
    import tempfile

    from multimodal_supernovae_tpu.serving import EmbedServer, load_artifact

    tmpdir = tempfile.mkdtemp(prefix="mmsn_serve_")
    path = build_artifact(tmpdir)

    sm = load_artifact(path)
    t0 = time.monotonic()
    srv = EmbedServer(sm, port=0, max_wait_ms=10.0).start_background()
    print(f"warmup+bind: {time.monotonic()-t0:.1f} s, port {srv.port}",
          flush=True)

    feed = {k: np.zeros((BATCH,) + s, d) for k, (s, d) in sm.input_spec.items()}
    rng = np.random.default_rng(0)
    for k in feed:
        if feed[k].dtype == np.float32:
            feed[k] = rng.normal(size=feed[k].shape).astype(np.float32)
        elif feed[k].dtype == bool:
            feed[k] = np.ones(feed[k].shape, bool)

    results = {"batch_size": BATCH, "max_wait_ms": 10.0, "backend": "tpu"}

    # raw device-call floor: one fn launch + host fetch, synchronous —
    # what a single coalesced batch costs end to end without HTTP.
    full = {k: v for k, v in feed.items()}
    _ = [np.asarray(o) for o in sm.fn(full)]  # prime
    t = []
    for _i in range(20):
        t0 = time.monotonic()
        _ = [np.asarray(o) for o in sm.fn(full)]
        t.append((time.monotonic() - t0) * 1e3)
    results["device_call_ms"] = {"p50": round(float(np.percentile(t, 50)), 2),
                                 "min": round(float(np.min(t)), 2)}
    print("device call:", results["device_call_ms"], flush=True)

    # interactive floor: sequential n=1 requests
    p1 = _payload(feed, 1)
    _post(srv.port, p1)  # prime
    lats = []
    for _ in range(50):
        t0 = time.monotonic()
        _post(srv.port, p1)
        lats.append((time.monotonic() - t0) * 1e3)
    results["single_sample_latency_ms"] = {
        "p50": round(float(np.percentile(lats, 50)), 2),
        "p99": round(float(np.percentile(lats, 99)), 2),
    }
    print("n=1 latency:", results["single_sample_latency_ms"], flush=True)

    results["load"] = []
    for c, req_n in ((1, 32), (8, 32), (32, 32), (8, BATCH), (32, BATCH)):
        payload = _payload(feed, req_n)
        r = run_load(srv.port, payload, c, DURATION_S, req_n)
        s = srv.batcher.stats.snapshot()
        r["batch_fill_cumulative"] = s.get("batch_fill")
        results["load"].append(r)
        print(json.dumps(r), flush=True)

    srv.close()
    out = os.path.join(os.path.dirname(__file__), "probe_serve_daemon.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print("WROTE", out, flush=True)


if __name__ == "__main__":
    main()
