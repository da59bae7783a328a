"""Component decomposition of the COLD judge path (VERDICT r3 next #5).

The e2e numbers (tools/bench_judge.py --e2e, 1,152-image corpus, chip):
decode-path 98.2, cache-fill 86.3, warm 234.4 img/s. This box has ONE host
core and the native decoder tops out ~127 img/s/core at 1200x900 -> 256²,
so on this host the cold passes are CPU-bound: everything that costs host
CPU (decode, memmap store, upload serialization, padding copies) is
strictly ADDITIVE — thread overlap only hides device execution and
network wait, not CPU work.

This tool prices each host component standalone on the real corpus so the
decode->fill gap is attributed with numbers rather than guesses:

  decode224   native batch decode at model size (the decode-path prep)
  decode256   native batch decode at canvas size (the fill-path prep)
  +store      decode256 + memmap store (CanvasCache.store)
  +stage      decode256 + store + device_put of the batch (upload CPU
              share; the transfer itself overlaps predict in the real
              loop, but its serialization steals the core)
  fetch       warm-cache memmap fetch alone (the warm-path prep)

Run (chip): python tools/bench_fill.py [corpus] [batch]
"""
import json, os, shutil, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tic_bench_corpus"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax

    from bench import _ensure_jpeg_corpus
    from touhouimageclassification_tpu.data.canvas_cache import CanvasCache
    from touhouimageclassification_tpu.data.folder import scan_image_folder
    from touhouimageclassification_tpu.data.loader import decode_batch_into

    _ensure_jpeg_corpus(corpus)
    index = scan_image_folder(corpus, persist_class_map=False)
    paths = list(index.paths)
    n = len(paths)
    starts = list(range(0, n - batch + 1, batch))

    def rate(tag, fn, per_batch_imgs=batch):
        os.sync()
        t0 = time.perf_counter()
        for s in starts:
            fn(s)
        dt = time.perf_counter() - t0
        r = len(starts) * per_batch_imgs / dt
        print(json.dumps({"component": tag, "img_s": round(r, 1),
                          "ms_per_batch": round(dt / len(starts) * 1000, 1)}),
              flush=True)
        return r

    buf224 = np.empty((batch, 224, 224, 3), np.uint8)
    buf256 = np.empty((batch, 256, 256, 3), np.uint8)

    rate("decode224", lambda s: decode_batch_into(
        paths[s:s + batch], (224, 224), buf224, on_error="zero"))
    rate("decode256", lambda s: decode_batch_into(
        paths[s:s + batch], (256, 256), buf256, on_error="zero"))

    shutil.rmtree(os.path.join(corpus, ".tic_canvas_cache"),
                  ignore_errors=True)
    cache = CanvasCache(index, (256, 256))

    def fill_store(s):
        decode_batch_into(paths[s:s + batch], (256, 256), buf256,
                          on_error="zero")
        cache.store(np.arange(s, s + batch), buf256)

    rate("decode256+store", fill_store)

    def fill_store_stage(s):
        decode_batch_into(paths[s:s + batch], (256, 256), buf256,
                          on_error="zero")
        cache.store(np.arange(s, s + batch), buf256)
        jax.device_put(buf256).block_until_ready()

    rate("decode256+store+stage", fill_store_stage)

    def fetch(s):
        cache.fetch(np.arange(s, s + batch), buf256)

    rate("fetch_warm", fetch)

    def fetch_stage(s):
        cache.fetch(np.arange(s, s + batch), buf256)
        jax.device_put(buf256).block_until_ready()

    rate("fetch_warm+stage", fetch_stage)
    cache.flush()


if __name__ == "__main__":
    main()
