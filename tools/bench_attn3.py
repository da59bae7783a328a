"""Attention microbench at the REAL call site layout.

The model's QKV projection emits packed (B, N, 3C); every attention impl
pays its own layout glue from there. This bench measures, per application:

- xla:    lane-slice -> reshape (B,N,H,D) -> einsum + f32 softmax (today's
          default path)
- fused:  lane-slice -> packed Pallas kernel (no reshape)

both forward-only and forward+backward (grad wrt the packed qkv), chained
across repetitions with a final scalar fetch (axon relay measurement rules).
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))


def timed(f, make_args, iters=3, inner=1):
    _fetch(f(*make_args(0)))
    ts = []
    for i in range(1, iters + 1):
        args = make_args(i)
        for a in args:
            if hasattr(a, "shape"):
                _fetch(a)
        t0 = time.perf_counter(); _fetch(f(*args)); ts.append(time.perf_counter() - t0)
    return min(ts) / inner


def main():
    import jax, jax.numpy as jnp
    from touhouimageclassification_tpu.ops.attention import packed_attention

    B, N, NH, D, REPS = 128, 197, 16, 64, 24
    C = NH * D

    def xla_attn(qkv):
        q = qkv[..., :C].reshape(B, N, NH, D)
        k = qkv[..., C:2 * C].reshape(B, N, NH, D)
        v = qkv[..., 2 * C:].reshape(B, N, NH, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, C)

    def fused_attn(qkv):
        return packed_attention(qkv[..., :C], qkv[..., C:2 * C],
                                qkv[..., 2 * C:], NH)

    def make(i):
        return (jax.random.normal(jax.random.key(i), (B, N, 3 * C))
                .astype(jnp.bfloat16),)

    for name, fn in [("xla", xla_attn), ("fused", fused_attn)]:
        @jax.jit
        def fwd(qkv, fn=fn):
            def body(_, qkv):
                o = fn(qkv)
                return qkv + jnp.tile(o, (1, 1, 3)) * 1e-6
            return jax.lax.fori_loop(0, REPS, body, qkv)

        @jax.jit
        def fwdbwd(qkv, fn=fn):
            def body(_, qkv):
                g = jax.grad(lambda x: jnp.mean(fn(x).astype(jnp.float32)))(qkv)
                return qkv + g * 1e-3
            return jax.lax.fori_loop(0, REPS, body, qkv)

        print(json.dumps({"attn": name,
                          "fwd_ms_per_app": round(timed(fwd, make, inner=REPS) * 1000, 3),
                          "fwdbwd_ms_per_app": round(timed(fwdbwd, make, inner=REPS) * 1000, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
