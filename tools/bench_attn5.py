"""Pure-kernel timing of the IN-TREE packed attention (fwd and fwd+bwd).

Measures ops/attention.packed_attention exactly as shipped — so kernel
changes (exp2 softmax, post-matmul normalization) show up here. Chained
across REPS inside one jitted program with a scalar fetch (relay rules).
Compare: round-2 ledger numbers were fwd 1.65 ms/app, fwd+bwd 3.83 ms/app.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))


def main():
    import jax, jax.numpy as jnp
    from touhouimageclassification_tpu.ops.attention import packed_attention

    B, N, NH, D, REPS = 128, 197, 16, 64, 24
    C = NH * D

    def make(i):
        ks = jax.random.split(jax.random.key(i), 3)
        return tuple(jax.random.normal(kk, (B, N, C)).astype(jnp.bfloat16)
                     for kk in ks)

    @jax.jit
    def run_fwd(q, k, v):
        def body(_, q):
            o = packed_attention(q, k, v, NH)
            return q + o * 1e-6
        return jax.lax.fori_loop(0, REPS, body, q)

    @jax.jit
    def run_fwdbwd(q, k, v):
        def one(q):
            return jnp.sum(packed_attention(q, k, v, NH).astype(jnp.float32))

        def body(_, q):
            g = jax.grad(one)(q)
            return q + g * 1e-6
        return jax.lax.fori_loop(0, REPS, body, q)

    for name, fn in (("fwd", run_fwd), ("fwd+bwd", run_fwdbwd)):
        _fetch(fn(*make(0)))
        best = float("inf")
        for i in range(1, 4):
            args = make(i)
            for a in args:
                _fetch(a)
            t0 = time.perf_counter()
            _fetch(fn(*args))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(json.dumps({"which": name,
                          "ms_per_app": round(best * 1000, 3)}), flush=True)



# appended: slab-form measurement via `python tools/bench_attn5.py slab`
def main_slab():
    import jax, jax.numpy as jnp
    from touhouimageclassification_tpu.ops.attention import packed_attention_slab

    B, N, NH, D, REPS = 128, 197, 16, 64, 24
    C3 = 3 * NH * D

    def make(i):
        return jax.random.normal(jax.random.key(i), (B, N, C3)).astype(jnp.bfloat16)

    @jax.jit
    def run_fwd(qkv):
        def body(_, qkv):
            o = packed_attention_slab(qkv, NH)
            return qkv.at[:, :, :o.shape[-1]].add(o * 1e-6)
        return jax.lax.fori_loop(0, REPS, body, qkv)

    @jax.jit
    def run_fwdbwd(qkv):
        def one(qkv):
            return jnp.sum(packed_attention_slab(qkv, NH).astype(jnp.float32))

        def body(_, qkv):
            return qkv + jax.grad(one)(qkv) * 1e-6
        return jax.lax.fori_loop(0, REPS, body, qkv)

    for name, fn in (("slab fwd", run_fwd), ("slab fwd+bwd", run_fwdbwd)):
        _fetch(fn(make(0)))
        best = float("inf")
        for i in range(1, 4):
            a = make(i)
            _fetch(a)
            t0 = time.perf_counter()
            _fetch(fn(a))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(json.dumps({"which": name,
                          "ms_per_app": round(best * 1000, 3)}), flush=True)


if __name__ == "__main__":
    main_slab() if "slab" in sys.argv[1:] else main()
