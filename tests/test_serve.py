"""The generation worker (serve.py): direct calls + an HTTP round trip."""

import base64
import http.client
import json
import threading

import jax
import numpy as np
import pytest

from polyffusion_tpu.config import Params
from polyffusion_tpu.inference import InferenceSession
from polyffusion_tpu.serve import GenerationWorker, make_handler
from polyffusion_tpu.tasks import SDFTask

TINY = Params(
    model_name="sdf_test", batch_size=2, max_epoch=1, learning_rate=1e-4,
    max_grad_norm=10, bf16=False, in_channels=2, out_channels=2, channels=32,
    attention_levels=[], n_res_blocks=1, channel_multipliers=[1, 2], n_heads=2,
    tf_layers=1, d_cond=1152, linear_start=0.00085, linear_end=0.012,
    n_steps=8, img_h=32, img_w=32, cond_type="chord", cond_mode="mix",
    use_enc=False,
)


@pytest.fixture(scope="module")
def worker():
    task = SDFTask(TINY)
    params = task.init_params(jax.random.PRNGKey(0))
    w = GenerationWorker.__new__(GenerationWorker)
    w.cfg = TINY
    w.batch = 2
    w.task = task
    w.session = InferenceSession(task, params, seed=0)
    w.requests = 0
    w.samples = 0
    w.last_device_ms = None
    w.warm = True
    w.warm_error = None
    w.warmed_scales = [1.0]
    w._lock = threading.Lock()
    return w


def test_generate_returns_midi_and_metrics(worker):
    out = worker.generate(num=1, uncond_scale=1.0, seed=7)
    midi = base64.b64decode(out["midi_b64"])
    assert midi[:4] == b"MThd"
    assert 0.0 <= out["integrity_err"] <= 1.0
    assert out["num"] == 1 and out["device_ms"] > 0
    assert worker.samples == 1


def test_generate_with_chord_conditioning(worker):
    chord = np.zeros((2, 32, 36), np.float32)
    chord[:, :, 0] = 1.0
    out = worker.generate(num=2, uncond_scale=1.0, chord=chord.tolist())
    assert out["num"] == 2


def test_warmup_registers_scales(worker):
    """warmup() compiles one executable per CFG scale and records the set.

    Repeat warmups UNION into warmed_scales (a second call must not drop
    earlier registrations) and warmup generations stay out of the /stats
    request/sample counters (ADVICE r2)."""
    before = (worker.requests, worker.samples)
    worker.warmup([0.0])
    assert worker.warm
    assert 0.0 in worker.warmed_scales and 1.0 in worker.warmed_scales
    worker.warmup([0.0, 2.0])  # re-warm: no duplicates, nothing dropped
    assert sorted(worker.warmed_scales) == [0.0, 1.0, 2.0]
    assert (worker.requests, worker.samples) == before


def test_generate_rejects_oversize(worker):
    with pytest.raises(AssertionError):
        worker.generate(num=3, uncond_scale=1.0)


def test_http_round_trip(worker):
    # ThreadingHTTPServer mirrors production (serve.py main): a sequential
    # accept loop would wedge /healthz behind a long /generate
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["warm"]

        body = json.dumps({"num": 1, "uncond_scale": 1.0, "seed": 3})
        conn.request("POST", "/generate", body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        assert base64.b64decode(out["midi_b64"])[:4] == b"MThd"

        # bad request -> 400, worker stays alive
        conn.request("POST", "/generate", body=json.dumps({"num": 99}),
                     headers={"Content-Type": "application/json"})
        assert conn.getresponse().status == 400

        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests"] >= 2
    finally:
        server.shutdown()


def test_healthz_reports_warmup_failure(worker):
    """A dead warmup thread must turn /healthz red (500 + warm_error), not
    leave a zombie serving ok/warm:false forever."""
    from http.server import ThreadingHTTPServer

    worker.warm_error = "RuntimeError: boom"
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 500
        assert body["ok"] is False and "boom" in body["warm_error"]
    finally:
        worker.warm_error = None
        server.shutdown()
