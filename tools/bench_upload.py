"""Host->device transfer bandwidth through the axon relay.

Motivated by the judge-path finding (round 4): a 12.6 MB uint8 batch took
~350 ms to device_put (~36 MB/s), 10x below the ~350 MB/s device->host
fetch rate recorded in round 1 — so batch-shipping paths (judging, the
real-data input pipeline) are UPLOAD-bound on this tunnel, and overlap
(Predictor.stage, device_put_iterator) is the only lever. This study pins
the rate across sizes and checks whether a concurrent upload overlaps an
in-flight device execution (the assumption behind stage()).

Synchronization: device_put on this backend blocks until the transfer is
enqueued remotely; we additionally force materialization by a device-side
reduce + scalar fetch and subtract the measured empty-call floor.
"""
import json, os, sys, threading, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from touhouimageclassification_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)

    reduce_fn = jax.jit(lambda x: jnp.sum(x, dtype=jnp.float32))

    # per-call floor: tiny upload + reduce + scalar fetch (distinct buffers
    # per rep — identical (executable, input) pairs are relay-memoized)
    tinies = [rng.integers(0, 256, (8,), dtype=np.uint8) for _ in range(11)]
    float(reduce_fn(jax.device_put(tinies.pop())))  # compile
    t0 = time.perf_counter()
    for tiny in tinies:
        float(reduce_fn(jax.device_put(tiny)))
    floor = (time.perf_counter() - t0) / len(tinies)
    print(json.dumps({"empty_call_floor_ms": round(floor * 1000, 1)}), flush=True)

    for mb in (1, 4, 12, 37):
        n = mb * 1_000_000
        # compile on a buffer NOT reused in the timed loop: re-executing an
        # identical (executable, input) pair is served from the relay's
        # memo and would bias the min() toward a rep with no device work
        bufs = [rng.integers(0, 256, (n,), dtype=np.uint8) for _ in range(4)]
        float(reduce_fn(jax.device_put(bufs.pop())))  # compile this shape
        best = float("inf")
        for b in bufs:
            t0 = time.perf_counter()
            float(reduce_fn(jax.device_put(b)))
            best = min(best, time.perf_counter() - t0)
        rate = n / max(best - floor, 1e-9) / 1e6
        print(json.dumps({
            "upload_mb": mb, "ms": round(best * 1000, 1),
            "mb_per_s_minus_floor": round(rate, 1),
        }), flush=True)

    # overlap check: a long device execution launched, then an upload from
    # another thread while it runs. If uploads ride a separate lane, total
    # ≈ max(exec, upload); if serialized, ≈ sum. The seed input varies per
    # call — the relay memoizes identical (executable, inputs) pairs.
    k = 4096
    a = jnp.asarray(rng.normal(size=(k, k)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def spin(x, seed):
        def body(_, x):
            y = x @ x
            return (y / (jnp.max(jnp.abs(y)) + seed)).astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, 192, body, x).astype(jnp.float32))

    float(spin(a, jnp.float32(1.0)))  # compile
    # best-of-3 each: single reps swing with relay load (0.30-0.57 s was
    # observed for the same 12 MB upload across sessions)
    exec_s = min(_timed(lambda s=s: float(spin(a, jnp.float32(2.0 + s))))
                 for s in range(3))
    ups = [rng.integers(0, 256, (12_000_000,), dtype=np.uint8)
           for _ in range(6)]
    up_s = min(_timed(lambda b=b: float(reduce_fn(jax.device_put(b))))
               for b in ups[:3])

    totals = []
    for i in range(3):
        th = threading.Thread(
            target=lambda b=ups[3 + i]: float(reduce_fn(jax.device_put(b))))
        t0 = time.perf_counter()
        fut = spin(a, jnp.float32(7.0 + i))  # dispatch async
        th.start()
        float(fut)
        th.join()
        totals.append(time.perf_counter() - t0)
    total = min(totals)
    print(json.dumps({
        "exec_s": round(exec_s, 3), "upload_s": round(up_s, 3),
        "overlapped_total_s": round(total, 3),
        "serialized_sum_s": round(exec_s + up_s, 3),
        "overlap_works": total < 0.8 * (exec_s + up_s),
    }), flush=True)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
