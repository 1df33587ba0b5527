"""Batch-inference server: micro-batching, HTTP surface, stats."""

import json
import threading
import urllib.request

import flax.linen as nn
import jax
import numpy as np

from vfd_gan_tpu.cli.serve import InferenceServer, make_handler

T, S = 4, 8


class TinyMask(nn.Module):
    """Stand-in mask model: per-pixel sigmoid of a 1x1 conv."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.sigmoid(nn.Dense(1)(x))


def _make_server(max_batch=4, max_wait_ms=20.0):
    model = TinyMask()
    x = np.zeros((1, T, S, S, 3), np.float32)
    variables = model.init(jax.random.key(0), x)
    return InferenceServer(model, variables, "tiny", isize=S, nfr=T,
                           max_batch=max_batch, max_wait_ms=max_wait_ms)


def test_predict_batches_and_pads():
    srv = _make_server()
    try:
        rng = np.random.default_rng(0)
        # 3 clips through a max_batch=4 forward: one padded batch
        clips = rng.uniform(-1, 1, (3, T, S, S, 3)).astype(np.float32)
        pred = srv.predict(clips)
        assert pred.shape == (3, T, S, S, 1)
        # padding must not leak into real outputs: recompute directly
        want = np.asarray(srv._apply(srv._variables,
                                     np.concatenate([clips, clips[:1]])))[:3]
        np.testing.assert_allclose(pred, want, atol=1e-6)
        # 6 clips > max_batch: split into two compiled-shape chunks
        clips6 = rng.uniform(-1, 1, (6, T, S, S, 3)).astype(np.float32)
        assert srv.predict(clips6).shape == (6, T, S, S, 1)
        st = srv.stats()
        assert st["requests"] == 2 and st["clips"] == 9
    finally:
        srv.close()


def test_concurrent_requests_share_a_batch():
    srv = _make_server(max_batch=8, max_wait_ms=200.0)
    try:
        rng = np.random.default_rng(1)
        outs = {}

        def worker(i):
            c = rng.uniform(-1, 1, (1, T, S, S, 3)).astype(np.float32)
            outs[i] = srv.predict(c)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(outs) == 4
        st = srv.stats()
        # the 200 ms window should have packed (most of) them together
        assert st["batches"] <= 3
        assert st["clips"] == 4
    finally:
        srv.close()


def test_load_shedding():
    from vfd_gan_tpu.cli.serve import OverloadedError

    model = TinyMask()
    x = np.zeros((1, T, S, S, 3), np.float32)
    variables = model.init(jax.random.key(0), x)
    srv = InferenceServer(model, variables, "tiny", isize=S, nfr=T,
                          max_batch=4, max_wait_ms=5.0, max_queued_clips=2)
    try:
        clips = np.zeros((3, T, S, S, 3), np.float32)
        try:
            srv.predict(clips)          # 3 > bound of 2 -> immediate shed
            assert False, "expected OverloadedError"
        except OverloadedError:
            pass
        assert srv.stats()["shed_requests"] == 1
        # within the bound still works
        assert srv.predict(clips[:2]).shape == (2, T, S, S, 1)
    finally:
        srv.close()


def test_batcher_error_propagates_not_hangs():
    """A poisoned request (wrong trailing shape) fails fast with the cause
    instead of hanging its batch until timeout or killing the batcher."""
    srv = _make_server()
    try:
        bad = np.zeros((1, T, S, S, 4), np.float32)  # 4 channels
        try:
            srv.predict(bad, timeout=30.0)
            assert False, "expected RuntimeError"
        except RuntimeError as e:
            assert "inference failed" in str(e)
        # the batcher thread survived: a good request still works
        good = np.zeros((1, T, S, S, 3), np.float32)
        assert srv.predict(good).shape == (1, T, S, S, 1)
    finally:
        srv.close()


def test_http_endpoints():
    from http.server import ThreadingHTTPServer

    srv = _make_server()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    httpd.inference = srv
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            h = json.loads(r.read())
        assert h["ok"] and h["nfr"] == T

        clip = np.random.default_rng(2).uniform(
            -1, 1, (1, T, S, S, 3)).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?mask=1",
            data=clip.tobytes(),
            headers={"X-Clip-Count": "1"}, method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out["frame_scores"]) == 1
        assert len(out["frame_scores"][0]) == T
        assert out["mask_shape"] == [1, T, S, S]

        # malformed size -> 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"123", method="POST")
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats") as r:
            st = json.loads(r.read())
        assert st["clips"] >= 1
    finally:
        httpd.shutdown()
        srv.close()


def test_http_predict_stream():
    """Streaming ingestion: clips trickled over a raw socket, NDJSON score
    lines streamed back per clip, values matching the blocking /predict."""
    import socket
    from http.server import ThreadingHTTPServer

    srv = _make_server(max_batch=2, max_wait_ms=5.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    httpd.inference = srv
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(4)
        k = 5
        clips = rng.uniform(-1, 1, (k, T, S, S, 3)).astype(np.float32)
        body = clips.tobytes()
        with socket.create_connection(("127.0.0.1", port), timeout=30) as sk:
            sk.sendall((f"POST /predict_stream HTTP/1.0\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n").encode())
            # trickle the body one clip at a time (the point of streaming)
            clip_bytes = len(body) // k
            for i in range(k):
                sk.sendall(body[i * clip_bytes:(i + 1) * clip_bytes])
            raw = b""
            while True:
                chunk = sk.recv(65536)
                if not chunk:
                    break
                raw += chunk
        head, _, payload = raw.partition(b"\r\n\r\n")
        assert b"200" in head.split(b"\r\n")[0]
        lines = [json.loads(ln) for ln in payload.splitlines() if ln]
        assert [ln["clip"] for ln in lines] == list(range(k))
        want = srv.predict(clips)[..., 0].reshape(k, T, -1).mean(axis=2)
        got = np.array([ln["frame_scores"] for ln in lines])
        np.testing.assert_allclose(got, want, atol=1e-6)

        # bad body size -> 400 before any streaming starts
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict_stream", data=b"123",
            method="POST")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        srv.close()


def test_stream_backpressure_blocks_not_sheds():
    """With a tiny admission window, the streaming producer must block on
    the oldest in-flight clip (no 429 shedding) and still score them all."""
    model = TinyMask()
    x = np.zeros((1, T, S, S, 3), np.float32)
    variables = model.init(jax.random.key(0), x)
    srv = InferenceServer(model, variables, "tiny", isize=S, nfr=T,
                          max_batch=2, max_wait_ms=1.0, max_queued_clips=1)
    import socket
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    httpd.inference = srv
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        k = 4
        clips = np.random.default_rng(5).uniform(
            -1, 1, (k, T, S, S, 3)).astype(np.float32)
        body = clips.tobytes()
        with socket.create_connection(("127.0.0.1", port), timeout=60) as sk:
            sk.sendall((f"POST /predict_stream HTTP/1.0\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n").encode())
            sk.sendall(body)
            raw = b""
            while True:
                chunk = sk.recv(65536)
                if not chunk:
                    break
                raw += chunk
        lines = [json.loads(ln) for ln in
                 raw.partition(b"\r\n\r\n")[2].splitlines() if ln]
        assert [ln["clip"] for ln in lines] == list(range(k))
        assert all("frame_scores" in ln for ln in lines)
        assert srv.stats()["shed_requests"] >= 1   # bound was hit, absorbed
    finally:
        httpd.shutdown()
        srv.close()


def test_http_predict_video(tmp_path):
    from http.server import ThreadingHTTPServer

    from vfd_gan_tpu.data.video_io import write_video

    vid = str(tmp_path / "clip.mp4")
    frames = np.random.default_rng(3).integers(
        0, 255, (2 * T + 1, S, S, 3), dtype=np.uint8)
    write_video(vid, frames)

    srv = _make_server()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(srv, video_root=str(tmp_path)))
    httpd.inference = srv
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(payload):
        return urllib.request.Request(
            f"http://127.0.0.1:{port}/predict_video",
            data=json.dumps(payload).encode(), method="POST")

    try:
        # both relative-to-root and absolute-inside-root forms work
        for p in ("clip.mp4", vid):
            with urllib.request.urlopen(post({"video_path": p})) as r:
                out = json.loads(r.read())
            assert out["clip_count"] == 2      # 2T+1 frames -> 2 windows
            assert len(out["frame_scores"]) == 2 * T

        try:
            urllib.request.urlopen(post({"video_path": vid + ".nope"}))
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # confinement (VERDICT r3 item 5): traversal out of --video_root is
        # rejected before any filesystem access, for ../ and absolute forms
        for evil in ("../../../etc/passwd", "/etc/passwd",
                     "a/../../outside.mp4"):
            try:
                urllib.request.urlopen(post({"video_path": evil}))
                assert False, f"expected 403 for {evil!r}"
            except urllib.error.HTTPError as e:
                assert e.code == 403
    finally:
        httpd.shutdown()
        srv.close()


def test_predict_video_disabled_without_root(tmp_path):
    from http.server import ThreadingHTTPServer

    srv = _make_server()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    httpd.inference = srv
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict_video",
            data=json.dumps({"video_path": "x.mp4"}).encode(), method="POST")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 403 (endpoint disabled)"
        except urllib.error.HTTPError as e:
            assert e.code == 403
    finally:
        httpd.shutdown()
        srv.close()


def test_auth_token_gates_everything_but_healthz():
    from http.server import ThreadingHTTPServer

    srv = _make_server()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(srv, auth_token="s3cret"))
    httpd.inference = srv
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:   # always open
            assert json.loads(r.read())["ok"]

        try:
            urllib.request.urlopen(f"{base}/stats")
            assert False, "expected 401"
        except urllib.error.HTTPError as e:
            assert e.code == 401

        clips = np.zeros((1, T, S, S, 3), np.float32)
        req = urllib.request.Request(
            f"{base}/predict", data=clips.tobytes(), method="POST",
            headers={"X-Clip-Count": "1"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected 401"
        except urllib.error.HTTPError as e:
            assert e.code == 401

        ok = urllib.request.Request(
            f"{base}/predict", data=clips.tobytes(), method="POST",
            headers={"X-Clip-Count": "1",
                     "Authorization": "Bearer s3cret"})
        with urllib.request.urlopen(ok) as r:
            assert "frame_scores" in json.loads(r.read())
    finally:
        httpd.shutdown()
        srv.close()


def test_dp_serving_matches_dp1():
    # data-parallel serving over the virtual mesh: batch sharded, params
    # replicated — same predictions as the single-device server
    model = TinyMask()
    x = np.zeros((1, T, S, S, 3), np.float32)
    variables = model.init(jax.random.key(0), x)
    srv1 = InferenceServer(model, variables, "tiny", isize=S, nfr=T,
                           max_batch=4, max_wait_ms=5.0)
    srv2 = InferenceServer(model, variables, "tiny-dp2", isize=S, nfr=T,
                           max_batch=4, max_wait_ms=5.0, dp=2)
    try:
        clips = np.random.default_rng(5).uniform(
            -1, 1, (3, T, S, S, 3)).astype(np.float32)
        np.testing.assert_allclose(srv2.predict(clips), srv1.predict(clips),
                                   atol=1e-6)
    finally:
        srv1.close()
        srv2.close()


def test_dp_serving_rejects_indivisible_batch():
    import pytest

    model = TinyMask()
    x = np.zeros((1, T, S, S, 3), np.float32)
    variables = model.init(jax.random.key(0), x)
    with pytest.raises(SystemExit):
        InferenceServer(model, variables, "tiny", isize=S, nfr=T,
                        max_batch=3, max_wait_ms=5.0, dp=2)


def test_serve_bfloat16_dtype(tmp_path):
    """--dtype bfloat16 rebuilds the model with bf16 body compute (params
    stay f32 in the checkpoint): health reports [bf16], predictions track
    the f32 forward within bf16 rounding."""
    import jax.numpy as jnp

    from vfd_gan_tpu.cli.serve import build_parser, serve
    from vfd_gan_tpu.models.convlstm import ConvLSTMModel
    from vfd_gan_tpu.train.checkpoints import save_checkpoint

    t, s = 6, 16
    model = ConvLSTMModel(dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, t, s, s, 3)),
                           False)
    ckpt = str(tmp_path / "weights")
    save_checkpoint(ckpt, {"state": {"params": variables["params"],
                                     "batch_stats": variables["batch_stats"]}})
    clip = np.random.default_rng(1).uniform(
        -1, 1, (1, t, s, s, 3)).astype(np.float32)
    want = np.asarray(model.apply(variables, clip, False))

    args = build_parser().parse_args(
        ["--ckpt", ckpt, "--isize", str(s), "--nfr", str(t), "--port", "0",
         "--dtype", "bfloat16", "--max_batch", "2"])
    httpd = serve(args)
    try:
        assert "[bf16]" in httpd.inference.name
        got = np.asarray(httpd.inference.predict(clip))
        assert got.shape == (1, t, s, s, 1)
        np.testing.assert_allclose(got, want, atol=3e-2)
    finally:
        httpd.inference.close()
        httpd.server_close()
