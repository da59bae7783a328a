"""Small utilities: httpkit (WSGI kit), profiling, jaxcache, and the eight
ablation launcher shims (reference: TIC/ViT/ntrain_but_*.py etc.)."""
import io
import runpy
import sys

import pytest

from touhouimageclassification_tpu.utils import httpkit, jaxcache, profiling


def _environ(method="GET", path="/", query="", body=b"", ctype="",
             cookie=""):
    env = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "wsgi.input": io.BytesIO(body),
        "CONTENT_LENGTH": str(len(body)),
    }
    if ctype:
        env["CONTENT_TYPE"] = ctype
    if cookie:
        env["HTTP_COOKIE"] = cookie
    return env


def test_httpkit_get_query_and_cookies():
    req = httpkit.Request(_environ(query="a=1&a=2&b=x", cookie="sid=abc"))
    assert req.query["a"] == ["1", "2"]
    assert req.cookies == {"sid": "abc"}
    assert req.form_value("missing", "dflt") == "dflt"


def test_httpkit_non_ascii_path_redecoded():
    # PEP 3333: the server hands over PATH_INFO latin-1-decoded; the kit must
    # recover the browser's UTF-8 (the dataset's Chinese label directories)
    raw = "/review/博丽灵梦".encode("utf-8").decode("iso-8859-1")
    req = httpkit.Request(_environ(path=raw))
    assert req.path == "/review/博丽灵梦"


def test_httpkit_urlencoded_post():
    req = httpkit.Request(_environ(
        method="POST", body=b"lang=jp&name=%E9%9C%8A%E5%A4%A2",
        ctype="application/x-www-form-urlencoded"))
    assert req.form_value("lang") == "jp"
    assert req.form_value("name") == "霊夢"


def test_httpkit_multipart_file_and_field():
    boundary = "BOUND"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="lang"\r\n\r\n'
        "en\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="x.jpg"\r\n'
        "Content-Type: image/jpeg\r\n\r\n"
    ).encode() + b"\xff\xd8JPEGDATA" + f"\r\n--{boundary}--\r\n".encode()
    req = httpkit.Request(_environ(
        method="POST", body=body,
        ctype=f"multipart/form-data; boundary={boundary}"))
    assert req.form_value("lang") == "en"
    [(field, filename, data)] = req.files
    assert (field, filename) == ("file", "x.jpg")
    assert data.startswith(b"\xff\xd8")


def test_httpkit_response_protocol_and_cookie():
    resp = httpkit.Response("<p>hi</p>")
    resp.set_cookie("sid", "42")
    seen = {}

    def start_response(status, headers):
        seen["status"], seen["headers"] = status, dict(headers)

    [body] = resp(start_response)
    assert body == b"<p>hi</p>"
    assert seen["status"] == "200 OK"
    assert seen["headers"]["Content-Length"] == str(len(b"<p>hi</p>"))
    assert seen["headers"]["Set-Cookie"] == "sid=42; Path=/"


def test_httpkit_wsgi_app_error_page():
    def handler(req):
        raise RuntimeError("boom")

    app = httpkit.make_wsgi_app(handler)
    seen = {}

    def start_response(status, headers):
        seen["status"] = status

    [body] = app(_environ(), start_response)
    assert seen["status"].startswith("500")
    assert b"boom" in body


def test_step_timer_summary():
    t = profiling.StepTimer()
    assert t.summary() == {}
    t.start()
    for _ in range(5):
        t.lap()
    s = t.summary()
    assert s["steps"] == 5
    assert 0.0 <= s["p50_s"] <= s["p95_s"] <= s["max_s"]
    # lap() blocks on a device value when given one
    import jax.numpy as jnp

    t.lap(jnp.ones(()) * 2)
    assert t.summary()["steps"] == 6


def test_trace_noop_without_logdir():
    with profiling.trace(None):
        pass  # must not touch jax.profiler


def test_jaxcache_opt_out_and_enable(monkeypatch, tmp_path):
    import jax

    monkeypatch.setattr(jaxcache, "_enabled", False)
    monkeypatch.setenv("TIC_COMPILE_CACHE", "0")
    jaxcache.enable_compile_cache()
    assert jaxcache._enabled is False

    monkeypatch.delenv("TIC_COMPILE_CACHE")
    monkeypatch.setenv("TIC_COMPILE_CACHE_DIR", str(tmp_path / "cc"))
    jaxcache.enable_compile_cache()
    assert jaxcache._enabled is True
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    assert (tmp_path / "cc").is_dir()
    # idempotent
    jaxcache.enable_compile_cache()


LAUNCHERS = ["but_gen", "but_div", "but_mix", "grey", "grey_unmix",
             "unfiltered", "unfiltered_unaug", "unfiltered_unmix"]


@pytest.mark.parametrize("suffix", LAUNCHERS)
def test_ablation_launcher_wires_its_preset(monkeypatch, suffix):
    """Each 6-line launcher shim must invoke ntrain.main with its own preset
    (mirrors the reference's TIC/ViT/ntrain_<suffix>.py thin launchers)."""
    from touhouimageclassification_tpu.train import ntrain

    calls = []
    monkeypatch.setattr(ntrain, "main",
                        lambda argv=None, preset="nvit": calls.append(preset))
    mod = f"touhouimageclassification_tpu.train.ntrain_{suffix}"
    sys.modules.pop(mod, None)
    runpy.run_module(mod, run_name="__main__")
    assert calls == [f"nvit_{suffix}"]
