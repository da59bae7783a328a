"""Crowd labeling server with a filename-extension state machine.

Parity with ``/root/reference/reviewer/app.py`` (protocol docstring :14-37):

- each image lives in ``data/<label>/`` and carries its review state in its
  extension: ``.pending`` -> claim by ATOMIC ``os.rename`` to
  ``<id>.<session_uid>.<timestamp>.processing`` (a rename succeeds for
  exactly one session) -> ``.jpg`` (approve) / ``.invalid`` (reject),
- a reaper thread returns ``.processing`` items older than 60 s to
  ``.pending`` every 10 s (``app.py:164-188``),
- per-session queue + history with undo ('back' re-claims the last processed
  item), progress counters, per-label reference image ``0.jpg``,
- fixes the reference's unreachable 'valid' status (``parse_file_info``
  compares ``parts[-1] == '.jpg'`` after ``split('.')`` — the dot never
  survives the split, ``app.py:83``).

Runs on the stdlib WSGI kit (no Flask in this environment); sessions are a
cookie uid + an in-memory store. ``python -m reviewer.app [--data-dir data]``
serves on port 5000.
"""
from __future__ import annotations

import glob
import mimetypes
import os
import sys
import threading
import time
import uuid
from html import escape

_APP_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_APP_DIR))

from touhouimageclassification_tpu.utils.httpkit import (  # noqa: E402
    Request, Response, make_wsgi_app,
)

DATA_DIR = os.environ.get("TIC_REVIEWER_DATA", os.path.join(_APP_DIR, "data"))
PROCESSING_TIMEOUT = 60
REAPER_INTERVAL = 10
MAX_SESSION_LIST = 10

_sessions: dict[str, dict] = {}
_sessions_lock = threading.Lock()


# ---------------------------------------------------------------------------
# filename state machine
# ---------------------------------------------------------------------------

def parse_file_info(label: str, filepath: str) -> dict:
    """Parse ``<id>[.<uid>.<ts>].<status>`` from the RIGHT so image ids
    containing dots (``cute.art``) survive the state machine."""
    filename = os.path.basename(filepath)
    parts = filename.split(".")
    status, session_uid, timestamp = "unknown", None, None
    img_id = ".".join(parts[:-1])
    if parts[-1] == "jpg":
        status = "valid"
    elif parts[-1] == "pending":
        status = "pending"
    elif parts[-1] == "invalid":
        status = "invalid"
    elif parts[-1] == "processing" and len(parts) >= 4:
        status = "processing"
        session_uid = parts[-3]
        timestamp = parts[-2]
        img_id = ".".join(parts[:-3])
    return {
        "label": label,
        "id": img_id,
        "status": status,
        "session_uid": session_uid,
        "timestamp": timestamp,
        "path": filepath,
    }


def get_status(label: str, img_id: str) -> dict:
    base_path = os.path.join(DATA_DIR, label)
    if os.path.isdir(base_path):
        for filename in sorted(os.listdir(base_path)):
            if not filename.startswith(f"{img_id}."):
                continue
            info = parse_file_info(label, os.path.join(base_path, filename))
            # exact-id match, not prefix: id '1' must not pick up '1.x.jpg'
            if info["id"] == img_id:
                return info
    return {"label": label, "id": img_id, "status": None, "session_uid": None,
            "timestamp": None, "path": None}


def get_one_pending(session_uid: str):
    """Claim one pending image via atomic rename; None when drained."""
    for label in sorted(os.listdir(DATA_DIR)):
        label_dir = os.path.join(DATA_DIR, label)
        if not os.path.isdir(label_dir):
            continue
        for file in sorted(os.listdir(label_dir)):
            if not file.endswith(".pending"):
                continue
            base_name = file.rsplit(".", 1)[0]
            processing = f"{base_name}.{session_uid}.{int(time.time())}.processing"
            try:
                os.rename(os.path.join(label_dir, file),
                          os.path.join(label_dir, processing))
            except OSError:
                continue  # someone else claimed it first
            return label, base_name  # the FULL id (may contain dots)
    return None


def mark_processed(img: dict, valid: bool) -> bool:
    new_name = f"{img['id']}.{'jpg' if valid else 'invalid'}"
    try:
        os.rename(img["path"], os.path.join(DATA_DIR, img["label"], new_name))
        return True
    except OSError:
        return False


def processed_to_processing(label: str, img_id: str, valid: bool,
                            session_uid: str) -> bool:
    """Undo: re-claim an already-judged image."""
    base = os.path.join(DATA_DIR, label)
    src = os.path.join(base, f"{img_id}.{'jpg' if valid else 'invalid'}")
    dst = os.path.join(base, f"{img_id}.{session_uid}.{int(time.time())}.processing")
    try:
        os.rename(src, dst)
        return True
    except OSError:
        return False


def release_processing_images():
    """Reaper: stale .processing -> .pending (app.py:164-188)."""
    while True:
        time.sleep(REAPER_INTERVAL)
        now = time.time()
        for filepath in glob.glob(os.path.join(DATA_DIR, "*", "*.processing")):
            parts = os.path.basename(filepath).split(".")
            if len(parts) < 4 or parts[-1] != "processing":
                continue
            try:
                if now - int(parts[-2]) > PROCESSING_TIMEOUT:
                    pending = ".".join(parts[:-3]) + ".pending"
                    os.rename(filepath,
                              os.path.join(os.path.dirname(filepath), pending))
            except (ValueError, OSError):
                continue


def count_images() -> tuple[int, int]:
    """(processed, total) excluding reference images."""
    valid = invalid = pending = processing = 0
    for label in os.listdir(DATA_DIR):
        label_dir = os.path.join(DATA_DIR, label)
        if not os.path.isdir(label_dir):
            continue
        for file in os.listdir(label_dir):
            if file == "0.jpg":
                continue
            if file.endswith(".jpg"):
                valid += 1
            elif file.endswith(".invalid"):
                invalid += 1
            elif file.endswith(".pending"):
                pending += 1
            elif file.endswith(".processing"):
                processing += 1
    done = valid + invalid
    return done, done + pending + processing


# ---------------------------------------------------------------------------
# session + page
# ---------------------------------------------------------------------------

def _get_session(request: Request):
    uid = request.cookies.get("session_uid") or str(uuid.uuid4())
    with _sessions_lock:
        sess = _sessions.setdefault(uid, {"queue": [], "history": []})
    return uid, sess


_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Reviewer</title>
<style>
 body {{ font-family: sans-serif; max-width: 900px; margin: 1.5em auto; }}
 .pair {{ display: flex; gap: 16px; }}
 .pair figure {{ margin: 0; }} .pair img {{ max-width: 420px; max-height: 420px; }}
 .bar {{ background: #eee; height: 10px; border-radius: 5px; }}
 .bar div {{ background: #4a8; height: 10px; border-radius: 5px; width: {progress}%; }}
 button {{ font-size: 1.1em; padding: .4em 1.2em; margin-right: .5em; }}
</style></head><body>
<h2>{label} — #{number}</h2>
<p>Progress: {current} <span class="bar"><div></div></span></p>
<div class="pair">
  <figure><img src="/img/{image}"><figcaption>candidate</figcaption></figure>
  {reference_fig}
</div>
<form method="post">
  <button name="action" value="approve">✔ Approve (matches {label})</button>
  <button name="action" value="reject">✘ Reject</button>
  {back_btn}
</form>
</body></html>"""


def handler(request: Request) -> Response:
    if request.path.startswith("/img/"):
        rel = request.path[len("/img/"):]
        # canonicalize both sides, then require containment — works for
        # relative --data-dir values too (absolute-vs-normpath mixing used
        # to 404 every nested candidate under a relative data dir)
        base = os.path.abspath(DATA_DIR)
        full = os.path.abspath(os.path.join(base, rel))
        try:
            inside = os.path.commonpath([full, base]) == base
        except ValueError:
            inside = False
        if not inside:
            return Response("forbidden", status="403 Forbidden")
        if os.path.isfile(full):
            ctype = mimetypes.guess_type(full.replace(".pending", ".jpg")
                                         .replace(".processing", ".jpg")
                                         .replace(".invalid", ".jpg"))[0] or "image/jpeg"
            with open(full, "rb") as f:
                return Response(f.read(), content_type=ctype)
        return Response("not found", status="404 Not Found")

    uid, sess = _get_session(request)
    queue, history = sess["queue"], sess["history"]

    if request.method == "POST":
        action = request.form_value("action")
        if action == "back" and history:
            label, img_id, valid = history.pop()
            if processed_to_processing(label, img_id, valid, uid):
                queue.insert(0, (label, img_id))
        elif action in ("approve", "reject") and queue:
            label, img_id = queue.pop(0)
            img = get_status(label, img_id)
            if img["status"] == "processing" and img["session_uid"] == uid:
                if mark_processed(img, action == "approve"):
                    history.append((label, img_id, action == "approve"))
        # Post/Redirect/Get: rendering the next item from the POST response
        # would let a browser refresh re-submit the judgment against an
        # image the user never acted on
        resp = Response("", status="303 See Other")
        resp.headers.append(("Location", "/"))
        resp.set_cookie("session_uid", uid)
        return resp

    # refill queue
    if not queue:
        claim = get_one_pending(uid)
        if claim:
            queue.append(claim)

    # drop stale queue heads (file moved by the reaper or another session);
    # runs BEFORE the session trim so claims made here are never lost to a
    # slice copy
    img = None
    while queue:
        label, img_id = queue[0]
        img = get_status(label, img_id)
        if img["path"] and os.path.exists(img["path"]):
            break
        queue.pop(0)
        if not queue:
            claim = get_one_pending(uid)
            if claim:
                queue.append(claim)
            else:
                break
    sess["queue"] = queue[-MAX_SESSION_LIST:]
    sess["history"] = history[-MAX_SESSION_LIST:]
    if not queue:
        resp = Response("<h2>Review queue drained — nothing left to label.</h2>")
        resp.set_cookie("session_uid", uid)
        return resp
    label, img_id = queue[0]

    ref = os.path.join(DATA_DIR, label, "0.jpg")
    reference_fig = (
        f'<figure><img src="/img/{escape(label)}/0.jpg">'
        "<figcaption>reference</figcaption></figure>"
        if os.path.exists(ref) else ""
    )
    current, total = count_images()
    rel_img = os.path.relpath(img["path"], DATA_DIR).replace("\\", "/")
    html = _PAGE.format(
        label=escape(label), number=escape(img_id),
        current=f"{current}/{total}",
        progress=f"{(current / total * 100):.1f}" if total else "0",
        image=escape(rel_img),
        reference_fig=reference_fig,
        back_btn='<button name="action" value="back">↶ Back</button>' if history else "",
    )
    resp = Response(html)
    resp.set_cookie("session_uid", uid)
    return resp


app = make_wsgi_app(handler)


def start_reaper():
    threading.Thread(target=release_processing_images, daemon=True).start()


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Run the labeling reviewer.")
    parser.add_argument("--data-dir", default=DATA_DIR)
    parser.add_argument("--port", type=int, default=5000)
    args = parser.parse_args()
    DATA_DIR = args.data_dir
    start_reaper()
    from wsgiref.simple_server import make_server

    print(f"Reviewer on :{args.port}, data dir {DATA_DIR}")
    make_server("", args.port, app).serve_forever()
