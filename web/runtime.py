"""Web model daemon: lazy load, idle unload, batched TPU predict, label
language remapping.

Parity with ``/root/reference/web/runtime.py``:
- lazy-loading singleton that loads the flagship checkpoint on first request
  and self-unloads after 5 minutes idle via ``threading.Timer``
  (``runtime.py:27,91-95``),
- lock-guarded start/stop; unlike the reference, ``predict`` also
  synchronizes with the unload timer (the reference reads ``self.model``
  outside the lock and can race the idle unload — SURVEY §5 race notes),
- chunked batched prediction, ``MAX_BATCH_SIZE = 64`` (``runtime.py:29``),
- label language remap CN -> JP/EN from ``th_name_lang_map.csv``
  (``runtime.py:180-228``),
- device arbitration: the reference probes GPU memory via pynvml and falls
  back to CPU (``runtime.py:140-169``); on TPU the device is exclusive to
  the process, so arbitration reduces to "is an accelerator present" —
  ``is_daemon_cuda`` becomes ``is_daemon_accelerated``.
"""
from __future__ import annotations

import os
import sys
import threading

_RUNTIME_DIR = os.path.dirname(os.path.abspath(__file__))
_PROJECT_ROOT = os.path.dirname(_RUNTIME_DIR)
sys.path.insert(0, _PROJECT_ROOT)

MODEL_TYPE = os.environ.get("TIC_WEB_MODEL_TYPE", "vit-large")
WEIGHTS_PATH = os.environ.get(
    "TIC_WEB_WEIGHTS", os.path.join(_PROJECT_ROOT, "checkpoint/serving/nvit")
)
DATA_DIR = os.environ.get(
    "TIC_WEB_DATA_DIR", os.path.join(_PROJECT_ROOT, "data/data_filtered_vit_base")
)
INACTIVITY_TIMEOUT = 5 * 60  # seconds
MAX_BATCH_SIZE = 64

ACTUAL_LABEL_LANG = "CN"
DEFAULT_LABEL_LANG = "JP"


class ModelDaemon:
    def __init__(self):
        self.predictor = None
        self.timer = None
        self.lock = threading.Lock()

    # -- lifecycle (call under self.lock) ---------------------------------

    def start(self):
        if self.predictor is None:
            print("Starting model daemon...")
            from touhouimageclassification_tpu.infer.serve import init

            self.predictor = init(modelt=MODEL_TYPE, weights=WEIGHTS_PATH,
                                  data_dir=DATA_DIR)
            print("Model daemon started successfully.")
        self._reset_timer()

    def stop(self):
        with self.lock:
            if self.predictor is not None:
                print("Stopping model daemon due to inactivity...")
                self.predictor = None
            if self.timer:
                self.timer.cancel()
                self.timer = None

    def _reset_timer(self):
        if self.timer:
            self.timer.cancel()
        self.timer = threading.Timer(INACTIVITY_TIMEOUT, self.stop)
        self.timer.daemon = True
        self.timer.start()

    # -- inference ---------------------------------------------------------

    def predict(self, images):
        """images: list of PIL images -> [(class_name, confidence)]."""
        with self.lock:
            if self.predictor is None:
                self.start()
            self._reset_timer()
            return self.predictor.predict_images(images)


daemon = ModelDaemon()


def is_daemon_running() -> bool:
    return daemon.predictor is not None


def is_daemon_accelerated() -> bool:
    if not is_daemon_running():
        return False
    import jax

    return jax.default_backend() not in ("cpu",)


# ---------------------------------------------------------------------------
# label language remapping (runtime.py:180-228)
# ---------------------------------------------------------------------------

label_lang_map: dict[str, dict[str, str]] = {}


def prepare_label_lang_map(file: str = "th_name_lang_map.csv") -> None:
    global label_lang_map
    if label_lang_map:
        return
    filepath = os.path.join(_RUNTIME_DIR, file)
    if not os.path.exists(filepath):
        print(f"Warning: Language map file '{file}' not found in '{_RUNTIME_DIR}'.")
        return
    with open(filepath, encoding="utf-8") as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    if not lines:
        return
    header = [h.strip() for h in lines[0].split(",")]
    if ACTUAL_LABEL_LANG not in header:
        raise ValueError(
            f"ACTUAL_LABEL_LANG '{ACTUAL_LABEL_LANG}' not found in header of {file}"
        )
    actual_idx = header.index(ACTUAL_LABEL_LANG)
    label_lang_map = {lang: {} for lang in header}
    for line in lines[1:]:
        parts = [p.strip() for p in line.split(",")]
        if len(parts) != len(header):
            continue
        actual = parts[actual_idx]
        for i, lang in enumerate(header):
            if parts[i]:
                label_lang_map[lang][actual] = parts[i]


def remap_label_lang(label: str, target_lang: str = DEFAULT_LABEL_LANG) -> str:
    if not label_lang_map:
        prepare_label_lang_map()
    return label_lang_map.get(target_lang, {}).get(label, label)


# ---------------------------------------------------------------------------
# serve (runtime.py:235-250)
# ---------------------------------------------------------------------------

def serve_batch(images: list, target_lang: str = DEFAULT_LABEL_LANG):
    """Chunked batched prediction + language remap. Returns
    (results, started_cold)."""
    started = not is_daemon_running()
    results = []
    for i in range(0, len(images), MAX_BATCH_SIZE):
        results.extend(daemon.predict(images[i:i + MAX_BATCH_SIZE]))
    results = [
        (remap_label_lang(label, target_lang), confidence)
        for label, confidence in results
    ]
    return results, started
