"""Chip calibration. Axon-relay rules: (1) time warm calls with FRESH
inputs; (2) synchronize by host-fetching a scalar — block_until_ready
returns early on this backend."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _fetch(out):
    """Host-fetch a scalar: on the axon relay only a real device->host read
    synchronizes (block_until_ready returns early)."""
    import jax.numpy as jnp, numpy as np
    leaf = out if not isinstance(out, (tuple, list)) else out[0]
    return float(np.asarray(jnp.mean(leaf)))

def timed(f, make_args, iters=3):
    _fetch(f(*make_args(0)))  # warm compile
    ts = []
    for i in range(1, iters + 1):
        args = make_args(i)
        for a in args:
            _fetch(a) if hasattr(a, "shape") else None
        t0 = time.perf_counter()
        _fetch(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

def main():
    import jax, jax.numpy as jnp
    from touhouimageclassification_tpu.config import VIT_LARGE
    from touhouimageclassification_tpu.models.vit import ViT

    n = 8192
    STEPS = 20

    @jax.jit
    def chain_mm(a, b):
        def body(_, x):
            return jnp.tanh(x @ b)
        return jax.lax.fori_loop(0, STEPS, body, a)

    def mm_args(i):
        a = jax.random.normal(jax.random.key(i), (n, n)).astype(jnp.bfloat16)
        b = jax.random.normal(jax.random.key(100 + i), (n, n)).astype(jnp.bfloat16) * 0.01
        return a, b
    dt = timed(chain_mm, mm_args) / STEPS
    print(json.dumps({"raw_matmul_tflops": round(2 * n**3 / dt / 1e12, 1)}), flush=True)

    model = ViT(VIT_LARGE)
    params = model.init(jax.random.key(0), jnp.ones((128, 224, 224, 3)))

    F_STEPS = 8
    @jax.jit
    def chain_fwd(p, x):
        def body(_, x):
            o = model.apply(p, x)
            return x + jnp.mean(o) * 1e-20
        return jax.lax.fori_loop(0, F_STEPS, body, x)

    def fwd_args(i):
        return params, jax.random.normal(jax.random.key(i), (128, 224, 224, 3))
    dt = timed(chain_fwd, fwd_args) / F_STEPS
    print(json.dumps({"fwd_img_s": round(128 / dt, 1),
                      "fwd_mfu_pct": round(128 * 61.6e9 / dt / 197e12 * 100, 1)}), flush=True)

    B_STEPS = 4
    @jax.jit
    def chain_bwd(p, x):
        def loss_fn(p, x):
            return jnp.mean(model.apply(p, x) ** 2)
        def body(_, x):
            g = jax.grad(loss_fn)(p, x)
            return x + jnp.mean(jax.tree_util.tree_leaves(g)[0]) * 1e-20
        return jax.lax.fori_loop(0, B_STEPS, body, x)
    dt = timed(chain_bwd, fwd_args) / B_STEPS
    print(json.dumps({"fwdbwd_img_s": round(128 / dt, 1),
                      "fwdbwd_mfu_pct": round(128 * 3 * 61.6e9 / dt / 197e12 * 100, 1)}), flush=True)

if __name__ == "__main__":
    main()
