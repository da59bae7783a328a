"""Web demo: upload images / paste URLs -> prediction cards.

Parity with ``/root/reference/web/app.py``: one route accepting multipart
``files[]`` plus newline-separated ``urls``, producing base64-JPEG result
cards labeled ``<name>\\n<confidence%>``; a daemon status banner
(Inactive / CPU / TPU); dual-stack servers on 20810 (IPv4) and 20811 (IPv6)
in two threads. Runs on the stdlib WSGI kit instead of Flask (not available
in this environment); ``--debug`` serves single-stack on port 80 like the
reference's debug path.

URL fetching requires outbound network; failures surface as flash messages
(as in the reference) rather than crashing the request.
"""
from __future__ import annotations

import base64
import os
import sys
from io import BytesIO

_APP_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_APP_DIR))

from touhouimageclassification_tpu.utils.httpkit import (  # noqa: E402
    Request, Response, escape, make_wsgi_app, serve_dual_stack,
)
from web.runtime import (  # noqa: E402
    DEFAULT_LABEL_LANG, is_daemon_accelerated, is_daemon_running, serve_batch,
)

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>TouhouIC-TPU demo</title>
<style>
 body {{ font-family: sans-serif; max-width: 960px; margin: 2em auto; }}
 .banner {{ padding: .4em .8em; border-radius: 6px; display: inline-block;
            background: #eee; }}
 .cards {{ display: flex; flex-wrap: wrap; gap: 12px; margin-top: 1em; }}
 .card {{ border: 1px solid #ccc; border-radius: 8px; padding: 8px;
          width: 200px; text-align: center; }}
 .card img {{ max-width: 100%; border-radius: 4px; }}
 .pred {{ white-space: pre-line; font-weight: bold; }}
 .flash {{ color: #06529b; }} .error {{ color: #b00; }}
 textarea {{ width: 100%; }}
</style></head><body>
<h1>Touhou character classifier (TPU)</h1>
<p class="banner">Model daemon: {device_mode}</p>
{flashes}
<form method="post" enctype="multipart/form-data">
  <p><input type="file" name="files[]" multiple accept="image/*"></p>
  <p>Image URLs (one per line):<br><textarea name="urls" rows="3"></textarea></p>
  <p>Label language:
    <select name="lang">
      <option value="JP" {jp}>JP</option>
      <option value="CN" {cn}>CN</option>
      <option value="EN" {en}>EN</option>
    </select>
    <button type="submit">Classify</button></p>
</form>
{intro}
<div class="cards">{cards}</div>
</body></html>"""

_INTRO = """<p>Upload Touhou character fanart and the ViT-Large model
(trained on the filtered Pixiv corpus) predicts which of the 120 characters
it shows. Predictions run as one jitted batched graph on TPU.</p>"""


def handler(request: Request) -> Response:
    flashes: list[str] = []
    cards: list[str] = []
    lang = request.form_value("lang", DEFAULT_LABEL_LANG)

    if request.method == "POST":
        from PIL import Image

        images, filenames = [], []
        for _field, filename, data in request.files:
            if filename and data:
                try:
                    images.append(Image.open(BytesIO(data)))
                    filenames.append(filename)
                except Exception as e:
                    flashes.append(f'<p class="error">Error reading {escape(filename)}: {escape(str(e))}</p>')
        urls_string = request.form_value("urls", "")
        for url in (u.strip() for u in urls_string.splitlines()):
            if not url:
                continue
            try:
                import requests

                r = requests.get(url, stream=True, timeout=20)
                r.raise_for_status()
                images.append(Image.open(BytesIO(r.content)))
                filenames.append(url.split("/")[-1])
            except Exception as e:
                flashes.append(f'<p class="error">Error fetching URL {escape(url)}: {escape(str(e))}</p>')

        if not images:
            flashes.append('<p class="error">No valid files or URLs were provided.</p>')
        else:
            try:
                predictions, _ = serve_batch(images, target_lang=lang)
                for img, (label, confidence), fname in zip(images, predictions, filenames):
                    buf = BytesIO()
                    img.convert("RGB").save(buf, format="JPEG")
                    b64 = base64.b64encode(buf.getvalue()).decode()
                    cards.append(
                        '<div class="card">'
                        f'<img src="data:image/jpeg;base64,{b64}">'
                        f'<div class="pred">{escape(label)}\n{confidence:.1%}</div>'
                        f'<div>{escape(fname)}</div></div>'
                    )
                flashes.append(
                    f'<p class="flash">Classification complete for {len(cards)} image(s)!</p>'
                )
            except Exception as e:
                flashes.append(f'<p class="error">An error occurred: {escape(str(e))}</p>')

    if is_daemon_running():
        device_mode = "TPU" if is_daemon_accelerated() else "CPU"
    else:
        device_mode = "Inactive"

    html = _PAGE.format(
        device_mode=device_mode,
        flashes="".join(flashes),
        cards="".join(cards),
        intro=_INTRO if not cards else "",
        jp="selected" if lang == "JP" else "",
        cn="selected" if lang == "CN" else "",
        en="selected" if lang == "EN" else "",
    )
    return Response(html)


app = make_wsgi_app(handler)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Run the web demo.")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--port", type=int, default=20810)
    args = parser.parse_args()
    if args.debug:
        from wsgiref.simple_server import make_server

        port = args.port if args.port != 20810 else 80
        make_server("0.0.0.0", port, app).serve_forever()
    else:
        serve_dual_stack(app, args.port, args.port + 1)  # 20810 / 20811
