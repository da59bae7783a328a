"""Measure cross-request micro-batching in the web daemon on the chip.

Round-3 upgrade (web/runtime.py): concurrent requests enqueue and a worker
thread coalesces whatever is queued into ONE bucketed device call, instead
of serializing each request's device call under the daemon lock (the
round-2 design) or racing the unload timer locklessly (the reference,
``web/runtime.py:97-128``). The CPU-mesh threaded test
(tests/test_web.py) proves N concurrent requests -> ~1 device batch; this
tool measures the wall-clock effect where it matters, on the tunneled TPU
whose ~30 ms RTT dominates single-image latency:

  sequential  N single-image predicts, one after another (N x RTT)
  concurrent  N threads firing the same predicts together (~1-2 RTTs)

Uses the 3-class fixture checkpoint (regenerated if missing — random
weights; latency doesn't care). Run (chip):

  python tools/bench_serve_concurrency.py [--n 8] [--reps 3]
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_WEIGHTS = "/tmp/vit_base_3cls.pth"
FIXTURE_DATA = "/tmp/vdata"


def ensure_fixture():
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    if not os.path.isdir(FIXTURE_DATA):
        for name, col in zip(
            ["reimu", "marisa", "sakuya"],
            [(220, 40, 40), (40, 220, 40), (40, 40, 220)],
        ):
            os.makedirs(f"{FIXTURE_DATA}/{name}", exist_ok=True)
            for i in range(6):
                img = np.clip(
                    np.array(col) + rng.normal(0, 25, (224, 224, 3)), 0, 255
                ).astype(np.uint8)
                Image.fromarray(img).save(f"{FIXTURE_DATA}/{name}/{i}.jpg")
    if not os.path.exists(FIXTURE_WEIGHTS):
        import torch
        import transformers

        m = transformers.ViTForImageClassification(
            transformers.ViTConfig(num_labels=3)
        )
        torch.save(m.state_dict(), FIXTURE_WEIGHTS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="concurrent requests")
    ap.add_argument("--reps", type=int, default=3, help="best-of reps")
    args = ap.parse_args()

    ensure_fixture()
    os.environ["TIC_WEB_MODEL_TYPE"] = "vit-base"
    os.environ["TIC_WEB_WEIGHTS"] = FIXTURE_WEIGHTS
    os.environ["TIC_WEB_DATA_DIR"] = FIXTURE_DATA

    from PIL import Image

    from web.runtime import daemon

    img = Image.open(f"{FIXTURE_DATA}/reimu/0.jpg")

    # warm: loads the model, compiles the 1- and N-image buckets
    daemon.predict([img])
    daemon.predict([img] * args.n)

    def best_of(fn):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best * 1000

    def sequential():
        for _ in range(args.n):
            daemon.predict([img])

    def concurrent():
        threads = [
            threading.Thread(target=daemon.predict, args=([img],))
            for _ in range(args.n)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    seq_ms = best_of(sequential)
    conc_ms = best_of(concurrent)
    single_ms = best_of(lambda: daemon.predict([img]))

    print(json.dumps({
        "n": args.n,
        "single_request_ms": round(single_ms, 1),
        "sequential_total_ms": round(seq_ms, 1),
        "concurrent_total_ms": round(conc_ms, 1),
        "speedup": round(seq_ms / conc_ms, 2),
        "concurrent_vs_single": round(conc_ms / single_ms, 2),
    }))


if __name__ == "__main__":
    main()
