"""A/B the packed-forward softmax variants: exp vs exp2, (N,N) divide vs
post-matmul reciprocal multiply. Four inline kernel variants, chained."""
import functools, itertools, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LOG2E = 1.4426950408889634


def _fetch(x):
    # reduce ON DEVICE, fetch one scalar (a full-tensor fetch would be
    # 51 MB through the tunnel and dominate the measurement)
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))


def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from touhouimageclassification_tpu.ops import _pallas_compat as pc

    B, N, NH, D, REPS = 128, 197, 16, 64, 24
    C = NH * D

    def make_fwd(use_exp2, post_mul):
        scale = D ** -0.5

        def kernel(q_ref, k_ref, v_ref, o_ref):
            q, k, v = q_ref[0], k_ref[0], v_ref[0]
            outs = []
            for h in range(NH):
                sl = slice(h * D, (h + 1) * D)
                s = jax.lax.dot_general(
                    q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = s * (scale * _LOG2E if use_exp2 else scale)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = (jnp.exp2 if use_exp2 else jnp.exp)(s - m)
                if post_mul:
                    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
                    o = jax.lax.dot_general(
                        e.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * r
                else:
                    p = e / jnp.sum(e, axis=-1, keepdims=True)
                    o = jax.lax.dot_general(
                        p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                outs.append(o)
            o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)

        spec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                            memory_space=pc.VMEM)
        def fwd(q, k, v):
            return pl.pallas_call(
                kernel, grid=(B,), in_specs=[spec, spec, spec],
                out_specs=spec, out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
                interpret=pc.should_interpret())(q, k, v)
        return fwd

    def make(i):
        ks = jax.random.split(jax.random.key(i), 3)
        return tuple(jax.random.normal(kk, (B, N, C)).astype(jnp.bfloat16)
                     for kk in ks)

    for use_exp2, post_mul in itertools.product((False, True), repeat=2):
        fwd = make_fwd(use_exp2, post_mul)

        @jax.jit
        def run(q, k, v, fwd=fwd):
            def body(_, q):
                return q + fwd(q, k, v) * 1e-6
            return jax.lax.fori_loop(0, REPS, body, q)

        _fetch(run(*make(0)))
        best = float("inf")
        for i in range(1, 4):
            args = make(i)
            for a in args:
                _fetch(a)
            t0 = time.perf_counter()
            _fetch(run(*args))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(json.dumps({"exp2": use_exp2, "post_mul": post_mul,
                          "fwd_ms_per_app": round(best * 1000, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
