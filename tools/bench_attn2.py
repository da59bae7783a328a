"""Attention variants: f32 vs bf16 softmax; padded-row pallas kernel."""
import functools, json, os, sys, time
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
    B, N, NH, D, REPS = 128, 197, 16, 64, 24

    def attn_f32(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
        p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def attn_bf16(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
        m = jax.lax.stop_gradient(jnp.max(s, -1, keepdims=True))
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, -1, keepdims=True)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def attn_merged(q, k, v):
        # fold heads into batch: (B*NH, N, D) batched matmuls
        b, n, h, d = q.shape
        qf = q.transpose(0, 2, 1, 3).reshape(b*h, n, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b*h, n, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b*h, n, d)
        s = jnp.einsum("znd,zmd->znm", qf, kf) * (D ** -0.5)
        p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("znm,zmd->znd", p, vf)
        return o.reshape(b, h, n, d).transpose(0, 2, 1, 3)

    def make(i):
        ks = jax.random.split(jax.random.key(i), 3)
        return tuple(jax.random.normal(k, (B, N, NH, D)).astype(jnp.bfloat16) for k in ks)

    variants = [("xla_f32softmax", attn_f32), ("xla_bf16softmax", attn_bf16),
                ("xla_merged_heads", attn_merged)]
    for name, fn in variants:
        @jax.jit
        def run(q, k, v, fn=fn):
            def body(_, q):
                return q + fn(q, k, v) * 1e-6
            return jax.lax.fori_loop(0, REPS, body, q)
        dt = timed(run, make, inner=REPS)
        print(json.dumps({"attn": name, "ms_per_app": round(dt*1000, 2)}), flush=True)

if __name__ == "__main__":
    main()
