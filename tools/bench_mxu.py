"""Calibrate chip peak + isolate fwd/bwd cost of the ViT-L step."""
import dataclasses, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from touhouimageclassification_tpu.config import VIT_LARGE
    from touhouimageclassification_tpu.models.vit import ViT

    # 1) raw MXU peak: bf16 (8192² @ 8192²) matmul
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    f(a, b).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(a, b)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({"raw_matmul_tflops": round(2 * n**3 / dt / 1e12, 1)}), flush=True)

    # 2) ViT-L forward only, batch 128
    model = ViT(VIT_LARGE)
    x = jnp.ones((128, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    fwd(params, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        o = fwd(params, x)
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({"fwd_img_s": round(128 / dt, 1),
                      "fwd_mfu_pct": round(128 * 61.6e9 / dt / 197e12 * 100, 1)}), flush=True)

    # 3) fwd+bwd only (no optimizer, no augment)
    def loss_fn(p, x):
        return jnp.mean(model.apply(p, x) ** 2)
    g = jax.jit(jax.grad(loss_fn))
    g(params, x)
    jax.block_until_ready(jax.tree_util.tree_leaves(g(params, x))[0])
    t0 = time.perf_counter()
    for _ in range(5):
        grads = g(params, x)
    jax.block_until_ready(jax.tree_util.tree_leaves(grads)[0])
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({"fwdbwd_img_s": round(128 / dt, 1),
                      "fwdbwd_mfu_pct": round(128 * 3 * 61.6e9 / dt / 197e12 * 100, 1)}), flush=True)

if __name__ == "__main__":
    main()
