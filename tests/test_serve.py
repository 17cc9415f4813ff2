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
from polyffusion_tpu.serve import GenerationWorker, RequestQueue, make_handler
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
    w._stats_lock = threading.Lock()
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


def _concurrent_submit(rqueue, reqs):
    """Submit each request dict from its own thread; return results/errors."""
    out = [None] * len(reqs)

    def call(i):
        try:
            out[i] = rqueue.submit(**reqs[i])
        except Exception as e:  # noqa: BLE001 - surfaced to the assertions
            out[i] = e

    threads = [threading.Thread(target=call, args=(i,)) for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    return out


def test_queue_coalesces_concurrent_requests(worker):
    """Two concurrent unseeded same-scale requests share ONE device pass
    (VERDICT r3 weak-item 6: request batching across concurrent clients)."""
    calls = []
    real_predict = worker.session.predict

    def spy(*a, **kw):
        calls.append(1)
        return real_predict(*a, **kw)

    worker.session.predict = spy
    try:
        rq = RequestQueue(worker, coalesce_ms=500.0)
        before = (worker.requests, worker.samples)
        out = _concurrent_submit(rq, [
            {"num": 1, "uncond_scale": 1.0},
            {"num": 1, "uncond_scale": 1.0},
        ])
        assert len(calls) == 1, f"expected 1 coalesced device pass, got {len(calls)}"
        assert rq.batches == 1
        for o in out:
            assert isinstance(o, dict), o
            assert base64.b64decode(o["midi_b64"])[:4] == b"MThd"
            assert o["num"] == 1 and o["batched_with"] == 1
        assert worker.requests == before[0] + 2
        assert worker.samples == before[1] + 2
    finally:
        worker.session.predict = real_predict


def test_queue_seeded_requests_run_solo(worker):
    """Explicit seeds must keep seed->output reproducibility: no merging."""
    rq = RequestQueue(worker, coalesce_ms=200.0)
    out = _concurrent_submit(rq, [
        {"num": 1, "uncond_scale": 1.0, "seed": 3},
        {"num": 1, "uncond_scale": 1.0, "seed": 3},
    ])
    assert rq.batches == 0
    for o in out:
        assert isinstance(o, dict) and "batched_with" not in o
    # identical seeds through the solo path -> identical MIDI
    assert out[0]["midi_b64"] == out[1]["midi_b64"]


def test_queue_rejects_bad_request_without_poisoning_group(worker):
    """A malformed request fails in its own submit(); a concurrent good one
    still succeeds."""
    rq = RequestQueue(worker, coalesce_ms=100.0)
    out = _concurrent_submit(rq, [
        {"num": 99, "uncond_scale": 1.0},            # oversize -> AssertionError
        {"num": 1, "uncond_scale": 1.0},
    ])
    errs = [o for o in out if isinstance(o, AssertionError)]
    oks = [o for o in out if isinstance(o, dict)]
    assert len(errs) == 1 and len(oks) == 1
    assert base64.b64decode(oks[0]["midi_b64"])[:4] == b"MThd"


def test_queue_http_concurrent_clients(worker):
    """End-to-end: two concurrent HTTP clients land in one coalesced batch and
    /stats reports it."""
    from http.server import ThreadingHTTPServer

    rq = RequestQueue(worker, coalesce_ms=500.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker, rq))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        results = [None, None]

        def post(i):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", "/generate",
                         body=json.dumps({"num": 1, "uncond_scale": 1.0}),
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            results[i] = (resp.status, json.loads(resp.read()))

        ts = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        for status, body in results:
            assert status == 200 and body["num"] == 1

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["coalesced_batches"] >= 1
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


# ---------------------------------------------------------------------------
# long-form (autoregressive) generation — round 4
# ---------------------------------------------------------------------------


def test_generate_long_uncond(worker):
    """/generate_long: sliding-window autoreg served resident; pieces padded
    to the worker batch so it reuses the /generate executable."""
    out = worker.generate_long(length=3, num=1, uncond_scale=1.0, seed=11)
    assert out["num"] == 1 and out["length"] == 3
    assert len(out["pieces"]) == 1
    piece = out["pieces"][0]
    midi = base64.b64decode(piece["midi_b64"])
    assert midi[:4] == b"MThd"
    assert 0.0 <= piece["integrity_err"] <= 1.0

    # seeded requests reproduce byte-for-byte
    again = worker.generate_long(length=3, num=1, uncond_scale=1.0, seed=11)
    assert again["pieces"][0]["midi_b64"] == piece["midi_b64"]

    # two pieces through the same windows: distinct music per piece
    two = worker.generate_long(length=3, num=2, uncond_scale=1.0, seed=12)
    assert len(two["pieces"]) == 2
    assert two["pieces"][0]["midi_b64"] != two["pieces"][1]["midi_b64"]


def test_generate_long_with_chord(worker):
    chord = np.zeros((1, 3 * 32, 36), np.float32)
    chord[:, :, 0] = 1.0
    out = worker.generate_long(length=3, num=1, uncond_scale=1.0,
                               chord=chord.tolist(), seed=5)
    assert out["num"] == 1 and len(out["pieces"]) == 1

    # malformed chord (wrong window count) -> assertion, not a crash
    with pytest.raises(AssertionError):
        worker.generate_long(length=3, num=1, chord=chord[:, :64].tolist())


def test_generate_long_validation(worker):
    with pytest.raises(AssertionError):
        worker.generate_long(length=1, num=1)  # one window = plain /generate
    with pytest.raises(AssertionError):
        worker.generate_long(length=3, num=worker.batch + 1)


def test_generate_long_http(worker):
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        body = json.dumps({"length": 2, "num": 1, "uncond_scale": 1.0, "seed": 4})
        conn.request("POST", "/generate_long", body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        assert len(out["pieces"]) == 1
        assert base64.b64decode(out["pieces"][0]["midi_b64"])[:4] == b"MThd"

        conn.request("POST", "/generate_long", body=json.dumps({"length": 1}),
                     headers={"Content-Type": "application/json"})
        assert conn.getresponse().status == 400
    finally:
        server.shutdown()


def _concurrent_submit_long(rqueue, reqs):
    """submit_long() each request dict from its own thread."""
    out = [None] * len(reqs)

    def call(i):
        try:
            out[i] = rqueue.submit_long(**reqs[i])
        except Exception as e:  # noqa: BLE001 - surfaced to the assertions
            out[i] = e

    threads = [threading.Thread(target=call, args=(i,)) for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    return out


def test_queue_coalesces_long_requests(worker):
    """Two concurrent same-length unseeded /generate_long requests share ONE
    piece-batched autoreg pass (VERDICT r4 item 7: long requests previously
    bypassed the queue and only serialized on the worker lock)."""
    calls = []
    real_predict = worker.session.predict

    def spy(*a, **kw):
        calls.append(kw.get("autoreg", False))
        return real_predict(*a, **kw)

    worker.session.predict = spy
    try:
        rq = RequestQueue(worker, coalesce_ms=500.0)
        before = (worker.requests, worker.samples)
        out = _concurrent_submit_long(rq, [
            {"length": 3, "num": 1, "uncond_scale": 1.0},
            {"length": 3, "num": 1, "uncond_scale": 1.0},
        ])
        assert len(calls) == 1 and calls[0] is True, calls
        assert rq.batches == 1
        for o in out:
            assert isinstance(o, dict), o
            assert o["length"] == 3 and o["num"] == 1 and o["batched_with"] == 1
            assert len(o["pieces"]) == 1
            assert base64.b64decode(o["pieces"][0]["midi_b64"])[:4] == b"MThd"
        assert worker.requests == before[0] + 2
        assert worker.samples == before[1] + 2
    finally:
        worker.session.predict = real_predict


def test_queue_does_not_mix_long_lengths_or_kinds(worker):
    """Different lengths (different window counts) and short-vs-long requests
    must NOT merge: each needs its own device pass."""
    calls = []
    real_predict = worker.session.predict

    def spy(*a, **kw):
        calls.append(kw.get("autoreg", False))
        return real_predict(*a, **kw)

    worker.session.predict = spy
    try:
        rq = RequestQueue(worker, coalesce_ms=300.0)
        out = [None, None]

        def call_long(i, length):
            out[i] = rq.submit_long(length=length, num=1, uncond_scale=1.0)

        t1 = threading.Thread(target=call_long, args=(0, 2))
        t2 = threading.Thread(target=call_long, args=(1, 3))
        t1.start(); t2.start(); t1.join(timeout=300); t2.join(timeout=300)
        assert len(calls) == 2, calls
        assert rq.batches == 0
        assert {out[0]["length"], out[1]["length"]} == {2, 3}
        assert "batched_with" not in out[0] and "batched_with" not in out[1]

        # short + long concurrently: also two passes
        calls.clear()
        res = [None, None]

        def call_short():
            res[0] = rq.submit(num=1, uncond_scale=1.0)

        def call_l():
            res[1] = rq.submit_long(length=2, num=1, uncond_scale=1.0)

        a = threading.Thread(target=call_short)
        b = threading.Thread(target=call_l)
        a.start(); b.start(); a.join(timeout=300); b.join(timeout=300)
        assert len(calls) == 2, calls
        assert sorted(calls) == [False, True]
        assert base64.b64decode(res[0]["midi_b64"])[:4] == b"MThd"
        assert len(res[1]["pieces"]) == 1
    finally:
        worker.session.predict = real_predict
