"""Forward-kernel variants: images-per-grid-step (block_b) sweep.

The packed kernel ties XLA on forward (bwd is where it wins); this probes
whether fewer, fatter grid steps (bigger DMA bursts, less grid overhead)
buy anything at B=128, N=197, C=1024.
"""
import functools, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))


def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from touhouimageclassification_tpu.ops import _pallas_compat as pc
    from touhouimageclassification_tpu.ops.attention import _packed_fwd_kernel

    B, N, NH, D, REPS = 128, 197, 16, 64, 24
    C = NH * D

    def fwd_blocked(q, k, v, block_b):
        scale = D ** -0.5

        def kernel(q_ref, k_ref, v_ref, o_ref):
            for bb in range(block_b):
                hd = C // NH
                outs = []
                for h in range(NH):
                    sl = slice(h * hd, (h + 1) * hd)
                    s = jax.lax.dot_general(
                        q_ref[bb][:, sl], k_ref[bb][:, sl],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m)
                    p = e / jnp.sum(e, axis=-1, keepdims=True)
                    outs.append(jax.lax.dot_general(
                        p.astype(v_ref.dtype), v_ref[bb][:, sl],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                o_ref[bb] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)

        spec = pl.BlockSpec((block_b, N, C), lambda i: (i, 0, 0),
                            memory_space=pc.VMEM)
        return pl.pallas_call(
            kernel, grid=(B // block_b,),
            in_specs=[spec, spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
            interpret=pc.should_interpret(),
        )(q, k, v)

    def make(i):
        ks = jax.random.split(jax.random.key(i), 3)
        return tuple(jax.random.normal(kk, (B, N, C)).astype(jnp.bfloat16)
                     for kk in ks)

    for block_b in (1, 2, 4):
        @jax.jit
        def run(q, k, v, block_b=block_b):
            def body(_, q):
                o = fwd_blocked(q, k, v, block_b)
                return q + o * 1e-6
            return jax.lax.fori_loop(0, REPS, body, q)

        _fetch(run(*make(0)))
        best = float("inf")
        for i in range(1, 4):
            args = make(i)
            for a in args:
                _fetch(a)
            t0 = time.perf_counter(); _fetch(run(*args))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(json.dumps({"block_b": block_b,
                          "fwd_ms_per_app": round(best * 1000, 3)}), flush=True)


if __name__ == "__main__":
    main()
