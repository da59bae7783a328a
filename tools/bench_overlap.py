"""Do host decode and tunnel device_put actually overlap? (VERDICT r3 #5)

The pipelined cold-fill path (infer/serve.py full_judge) measures ~83 img/s
— close to the ADDITIVE sum of decode+store (422 ms/batch) and upload
(403 ms/batch), not their max (~150 img/s). On a 1-core host the only way
the pipeline can work is if device_put's network wait releases the GIL so
the decode thread keeps the core. This tool answers that directly:

  decode_alone    native batch decode loop, single thread
  upload_alone    device_put loop of a same-size uint8 batch
  concurrent      both loops in two threads for the same wall window

If concurrent decode rate ~= decode_alone, overlap works and the fill
pipeline should approach max(decode, upload); if it collapses toward the
serialized rate, the relay client holds the GIL (or a client lock) during
transfers and the >=150 img/s cold target is unreachable on this host.

Run (chip): python tools/bench_overlap.py [corpus] [batch] [seconds]
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tic_bench_corpus"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    window = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

    import jax

    from bench import _ensure_jpeg_corpus
    from touhouimageclassification_tpu.data.folder import scan_image_folder
    from touhouimageclassification_tpu.data.loader import decode_batch_into

    _ensure_jpeg_corpus(corpus)
    index = scan_image_folder(corpus, persist_class_map=False)
    paths = list(index.paths)
    starts = list(range(0, len(paths) - batch + 1, batch))
    buf = np.empty((batch, 256, 256, 3), np.uint8)
    up = np.random.randint(0, 255, (batch, 256, 256, 3), np.uint8)

    def decode_loop(stop, out):
        i = 0
        while not stop.is_set():
            decode_batch_into(paths[starts[i % len(starts)]:
                                    starts[i % len(starts)] + batch],
                              (256, 256), buf, on_error="zero")
            i += 1
            out[0] = i

    def upload_loop(stop, out):
        i = 0
        while not stop.is_set():
            # vary a byte so the relay can't memoize the transfer
            up[0, 0, 0, 0] = i % 251
            jax.device_put(up).block_until_ready()
            i += 1
            out[0] = i

    jax.device_put(up).block_until_ready()  # init the backend off the clock

    def run(tag, loops):
        stop = threading.Event()
        outs = [[0] for _ in loops]
        ths = [threading.Thread(target=fn, args=(stop, o), daemon=True)
               for fn, o in zip(loops, outs)]
        t0 = time.perf_counter()
        for t in ths:
            t.start()
        time.sleep(window)
        stop.set()
        for t in ths:
            t.join()
        dt = time.perf_counter() - t0
        rates = [round(o[0] * batch / dt, 1) for o in outs]
        print(json.dumps({"mode": tag, "img_s": rates,
                          "seconds": round(dt, 2)}), flush=True)
        return rates

    run("decode_alone", [decode_loop])
    run("upload_alone", [upload_loop])
    run("concurrent", [decode_loop, upload_loop])


if __name__ == "__main__":
    main()
