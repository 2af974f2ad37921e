"""HTTP serving daemon over the AOT export or a live checkpoint.

Stdlib-only (http.server + npz/json wire formats): any host with numpy can
be a client; the serving host needs jax and — for the live path only — this
package's model code. Endpoints:

  * ``GET  /healthz``  -> JSON: status, batch size, modalities, the exact
    input contract (field -> shape/dtype), platform.
  * ``GET  /stats``    -> JSON: request/sample/device-call counters, batch
    fill, latency percentiles (DynamicBatcher stats).
  * ``POST /embed``    -> body is either an ``.npz`` payload
    (``Content-Type: application/x-npz``, fields per the manifest) or JSON
    ``{field: nested lists}``; response mirrors the request format with
    one ``emb_<modality>`` array per output tower. Any leading dim n >= 1
    is accepted — the daemon chunks/coalesces onto the fixed device batch.

Two model sources (scripts/serve.py):

  * ``load_artifact(path)`` — the ``scripts/export_model.py`` artifact
    (StableHLO bytes + ``<path>.json`` manifest). No model code needed;
    compiled once at startup (warmup) so the first request pays no trace.
  * ``load_live(run_dir, batch_size)`` — any run directory the factory can
    restore (ours or the reference's torch run dirs,
    models/factory.py), served as ``jit(encode)``.

No reference counterpart: the reference re-builds its torch model per use
(evaluate_models.py:269-303) and has no serving entry point at all.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple

import numpy as np

from .batcher import DynamicBatcher

__all__ = ["ServingModel", "load_artifact", "load_live", "serve", "EmbedServer"]


class ServingModel:
    """What the daemon needs to serve: a fixed-batch callable + contract."""

    def __init__(self, fn, input_spec: Dict[str, Tuple[Tuple[int, ...], str]],
                 batch_size: int, modalities, meta: Optional[Dict] = None):
        self.fn = fn
        self.input_spec = {k: (tuple(s), np.dtype(d))
                           for k, (s, d) in input_spec.items()}
        self.batch_size = int(batch_size)
        self.modalities = list(modalities)
        self.meta = dict(meta or {})

    def warmup(self):
        """One zero-batch call so compile happens before traffic."""
        feed = {k: np.zeros((self.batch_size,) + s, d)
                for k, (s, d) in self.input_spec.items()}
        outs = self.fn(feed)
        if len(outs) != len(self.modalities):
            raise RuntimeError(
                f"model returned {len(outs)} outputs for "
                f"{len(self.modalities)} modalities")
        # fetch a value: on the tunnelled TPU backend block_until_ready
        # does not block (CLAUDE.md) — conversion does.
        float(np.asarray(outs[0]).sum())


def load_artifact(path: str) -> ServingModel:
    """Rebuild a ServingModel from export_model.py's artifact + manifest."""
    from ..evaluation.export import load_exported

    with open(path, "rb") as f:
        fn, exported = load_exported(f.read())
    with open(path + ".json") as f:
        manifest = json.load(f)
    spec = {k: (tuple(v["shape"][1:]), v["dtype"])
            for k, v in manifest["input"].items()}
    return ServingModel(
        fn, spec, manifest["batch_size"], manifest["output_modalities"],
        meta={"source": "artifact", "path": path,
              "platforms": list(exported.platforms)},
    )


def load_live(run_dir: str, batch_size: int, which: str = "best",
              lc_len: Optional[int] = None, sp_len: Optional[int] = None,
              image_size: Optional[int] = None) -> ServingModel:
    """Serve straight from a run directory (ours or the reference's)."""
    import jax

    from ..data.batching import Batch
    from ..data.synthetic import make_synthetic_dataset
    from ..evaluation.export import batch_to_dict, modality_names
    from ..models.factory import initialize_from_run_dir, load_model

    probe_model, _, extra = initialize_from_run_dir(run_dir)
    if not hasattr(probe_model, "encode"):
        raise ValueError(
            f"{run_dir} rebuilds as {type(probe_model).__name__}, which has "
            "no embedding encoder to serve")
    combos = tuple(extra.get("combinations", ("lightcurve",)))
    # Same default ladder as scripts/export_model.py: flag > run config >
    # the real-data serving defaults.
    ds = make_synthetic_dataset(
        n=batch_size,
        n_max_lc=lc_len or int(extra.get("max_lightcurve_data_len", 100)),
        nband=int(extra.get("nband", 2)),
        n_max_sp=sp_len or int(extra.get("max_spectral_data_len", 1000)),
        image_size=image_size or int(extra.get("image_size", 60)),
        modalities=combos,
    )
    example = ds.to_device().take(np.arange(batch_size))
    model, variables, *_ = load_model(run_dir, example, which=which)
    encode = jax.jit(
        lambda d: model.apply(variables, Batch(**d), method=model.encode))
    d = batch_to_dict(example, model.cfg.combinations)
    spec = {k: (tuple(np.shape(v)[1:]), str(np.asarray(v).dtype))
            for k, v in d.items()}
    return ServingModel(
        encode, spec, batch_size, modality_names(model),
        meta={"source": "run_dir", "path": run_dir, "which": which},
    )


# --------------------------------------------------------------- wire I/O

def _read_npz(body: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(body), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def _write_npz(arrays: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    # set on the server instance: .batcher, .model, .quiet
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):
        if not getattr(self.server, "quiet", True):
            super().log_message(fmt, *args)

    def _reply(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, code: int, obj):
        self._reply(code, (json.dumps(obj) + "\n").encode(),
                    "application/json")

    def do_GET(self):
        model: ServingModel = self.server.model
        if self.path == "/healthz":
            self._reply_json(200, {
                "status": "ok",
                "batch_size": model.batch_size,
                "max_wait_ms": self.server.batcher.max_wait_s * 1e3,
                "output_modalities": model.modalities,
                "input": {k: {"shape": ["n"] + list(s), "dtype": str(d)}
                          for k, (s, d) in model.input_spec.items()},
                **model.meta,
            })
        elif self.path == "/stats":
            self._reply_json(200, self.server.batcher.stats.snapshot())
        else:
            self._reply_json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/embed":
            return self._reply_json(404, {"error": f"unknown path {self.path}"})
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
            as_json = ctype == "application/json"
            if as_json:
                arrays = {k: np.asarray(v)
                          for k, v in json.loads(body.decode()).items()}
            else:
                arrays = _read_npz(body)
        except Exception as e:
            return self._reply_json(400, {"error": f"unreadable body: {e}"})
        try:
            outs = self.server.batcher.submit(arrays)
        except ValueError as e:  # contract violation
            return self._reply_json(400, {"error": str(e)})
        except RuntimeError as e:  # closed / device failure
            return self._reply_json(503, {"error": str(e)})
        named = {f"emb_{m}": o
                 for m, o in zip(self.server.model.modalities, outs)}
        if as_json:
            self._reply_json(200, {k: v.tolist() for k, v in named.items()})
        else:
            self._reply(200, _write_npz(named), "application/x-npz")


class EmbedServer:
    """Owns the HTTP server + batcher; usable in-process (tests) or from
    scripts/serve.py. ``port=0`` binds an ephemeral port (then read
    ``.port``)."""

    def __init__(self, model: ServingModel, host: str = "127.0.0.1",
                 port: int = 0, max_wait_ms: float = 5.0,
                 quiet: bool = True, warmup: bool = True):
        if warmup:
            model.warmup()
        self.model = model
        self.batcher = DynamicBatcher(
            model.fn, {k: (s, d) for k, (s, d) in model.input_spec.items()},
            model.batch_size, max_wait_ms=max_wait_ms)
        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.httpd.model = model
        self.httpd.batcher = self.batcher
        self.httpd.quiet = quiet
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start_background(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="mmsn-serving-http",
            daemon=True)
        self._thread.start()
        return self

    def serve_forever(self):
        self.httpd.serve_forever()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.close()
        if self._thread:
            self._thread.join(timeout=10)


def serve(model: ServingModel, host: str = "127.0.0.1", port: int = 8000,
          max_wait_ms: float = 5.0, quiet: bool = False) -> EmbedServer:
    """Blocking entry used by scripts/serve.py."""
    srv = EmbedServer(model, host=host, port=port, max_wait_ms=max_wait_ms,
                      quiet=quiet)
    print(json.dumps({"serving": True, "host": host, "port": srv.port,
                      "batch_size": model.batch_size,
                      "output_modalities": model.modalities,
                      **model.meta}), flush=True)
    try:
        srv.serve_forever()
    finally:
        srv.close()
    return srv
