"""Attention microbench: XLA einsum+f32 softmax vs Pallas fused kernel."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _fetch(x):
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))

def timed(f, make_args, iters=3, inner=1):
    _fetch(f(*make_args(0)))
    ts = []
    for i in range(1, iters+1):
        args = make_args(i)
        for a in args:
            if hasattr(a, "shape"): _fetch(a)
        t0 = time.perf_counter(); _fetch(f(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)/inner

def main():
    import jax, jax.numpy as jnp
    from touhouimageclassification_tpu.ops.attention import (
        _flash_forward, _reference_attention, flash_attention)
    B, N, NH, D, REPS = 128, 197, 16, 64, 24

    def make(i):
        ks = jax.random.split(jax.random.key(i), 3)
        return tuple(jax.random.normal(k, (B, N, NH, D)).astype(jnp.bfloat16) for k in ks)

    for name, fn in [("xla", _reference_attention), ("pallas_own", _flash_forward), ("pallas_builtin", flash_attention)]:
        @jax.jit
        def run(q, k, v, fn=fn):
            def body(_, q):
                o = fn(q, k, v)
                return q + o * 1e-6
            return jax.lax.fori_loop(0, REPS, body, q)
        dt = timed(run, make, inner=REPS)
        print(json.dumps({"attn": name, "ms_per_app": round(dt*1000, 2)}), flush=True)

if __name__ == "__main__":
    main()
