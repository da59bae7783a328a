"""Component-level timing of the ViT-L forward: where does MFU go?"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _fetch(x):
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x if not isinstance(x,(tuple,list)) else x[0])))

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
    B, N, H, MLP, NH, L = 128, 197, 1024, 4096, 16, 24
    key = jax.random.key(0)

    # one encoder-layer worth of GEMMs, chained L times
    wqkv = jax.random.normal(key, (H, 3*H), jnp.bfloat16)*0.02
    wo = jax.random.normal(key, (H, H), jnp.bfloat16)*0.02
    w1 = jax.random.normal(key, (H, MLP), jnp.bfloat16)*0.02
    w2 = jax.random.normal(key, (MLP, H), jnp.bfloat16)*0.02

    def layer(x, full=True):
        b, n, h = x.shape
        ln = (x - x.mean(-1, keepdims=True)) * jax.lax.rsqrt(x.astype(jnp.float32).var(-1, keepdims=True)+1e-6).astype(x.dtype)
        qkv = ln @ wqkv
        q, k, v = jnp.split(qkv.reshape(b, n, 3, NH, 64).astype(jnp.bfloat16), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        if full:
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (64 ** -0.5)
            p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(jnp.bfloat16)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        else:
            o = v
        x = x + o.reshape(b, n, h) @ wo
        ln2 = x
        x = x + jax.nn.gelu(ln2 @ w1, approximate=False) @ w2
        return x

    import functools
    for name, fn in [
        ("layers_full", functools.partial(layer, full=True)),
        ("layers_noattn", functools.partial(layer, full=False)),
    ]:
        @jax.jit
        def run(x, fn=fn):
            def body(_, x):
                return fn(x)
            return jax.lax.fori_loop(0, L, body, x)
        def args(i):
            return (jax.random.normal(jax.random.key(i), (B, N, H)).astype(jnp.bfloat16),)
        dt = timed(run, args)
        # FLOPs: qkvo = 2*N*H*4H ; mlp = 2*N*H*2*MLP ; attn = 4*N*N*H
        gemm_f = B*L*(2*N*H*(4*H) + 4*N*H*MLP)
        attn_f = B*L*(4*N*N*NH*64) if "full" in name else 0
        print(json.dumps({"component": name, "ms": round(dt*1000,1),
                          "tflops": round((gemm_f+attn_f)/dt/1e12,1)}), flush=True)

    # gelu exact vs tanh approx
    for approx in (False, True):
        @jax.jit
        def g(x, approx=approx):
            def body(_, x):
                return jax.nn.gelu(x, approximate=approx)*1.0001
            return jax.lax.fori_loop(0, 24, body, x)
        def args(i):
            return (jax.random.normal(jax.random.key(i), (B, N, MLP)).astype(jnp.bfloat16),)
        dt = timed(g, args)
        print(json.dumps({"component": f"gelu_approx={approx}", "ms": round(dt*1000,1)}), flush=True)

if __name__ == "__main__":
    main()
