"""Head-batching study for the packed attention kernels.

The shipped kernels loop over 16 heads, each a 64-lane slice of the packed
(N, C) slab — odd heads sit in the second half of a 128-lane vreg, so every
other slice pays a lane shuffle before its matmul. Variants:

  loop     — shipped form (sequential 64-lane head slices)
  batched  — ONE in-VMEM relayout (N, C) -> (H, N, D), then batched
             dot_generals over all heads at once (trades 16 small matmuls
             for 1 relayout + 1 fat batched matmul chain)
  pairs    — 128-lane slices (2 heads/vreg-aligned slice), per-pair reshape
             (N, 2, 64) -> (2, N, 64) + batched dots; 8 iterations
  loop-i2  — shipped loop, 2 images per grid step (bwd pipelining check)

Each variant runs fwd and fwd+bwd at the real call site shapes
(B=128, N=197, H=16, D=64, bf16). Ship threshold: beat loop's numbers
(fwd 1.65-1.71, bwd ~2.9 ms/app) outside noise.
"""
import functools
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))


def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from touhouimageclassification_tpu.ops import _pallas_compat as pc
    from touhouimageclassification_tpu.ops.attention import (
        _packed_bwd_kernel, _packed_fwd_kernel,
    )

    B, N, NH, D, REPS = 128, 197, 16, 64, 24
    C = NH * D
    scale = D ** -0.5

    # --- batched: one relayout, batched dots over all heads ---------------
    def fwd_batched(q_ref, k_ref, v_ref, o_ref):
        q, k, v = q_ref[0], k_ref[0], v_ref[0]            # (N, C)
        # Mosaic rejects the (N, C) -> (N, H, D) shape cast; build the head
        # axis by stacking lane slices (explicit relayout copies)
        r = lambda x: jnp.stack(
            [x[:, h * D:(h + 1) * D] for h in range(NH)], axis=0)  # (H, N, D)
        qh, kh, vh = r(q), r(k), r(v)
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale    # (H, N, N)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (H, N, D)
        o_ref[0] = jnp.concatenate(
            [o[h] for h in range(NH)], axis=-1).astype(o_ref.dtype)

    def bwd_batched(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
        q, k, v, g = q_ref[0], k_ref[0], v_ref[0], g_ref[0]
        r = lambda x: jnp.stack(
            [x[:, h * D:(h + 1) * D] for h in range(NH)], axis=0)
        un = lambda x: jnp.concatenate(
            [x[h] for h in range(NH)], axis=-1)
        qh, kh, vh, gh = r(q), r(k), r(v), r(g)
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(
            gh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_c = ds.astype(k.dtype)
        p_c = p.astype(g.dtype)
        dq = jax.lax.dot_general(
            ds_c, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds_c, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dv = jax.lax.dot_general(
            p_c, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq_ref[0] = un(dq).astype(dq_ref.dtype)
        dk_ref[0] = un(dk).astype(dk_ref.dtype)
        dv_ref[0] = un(dv).astype(dv_ref.dtype)

    # --- pairs: 128-lane slices, 2-head batched dots ----------------------
    def fwd_pairs(q_ref, k_ref, v_ref, o_ref):
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        outs = []
        for hp in range(NH // 2):
            s0 = slice(hp * 2 * D, hp * 2 * D + D)
            s1 = slice(hp * 2 * D + D, (hp + 1) * 2 * D)
            r = lambda x: jnp.stack([x[:, s0], x[:, s1]], axis=0)  # (2, N, D)
            qh, kh, vh = r(q), r(k), r(v)
            s = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale   # (2, N, N)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            outs.append(jnp.concatenate([o[0], o[1]], axis=-1))
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)

    def call_fwd(kernel, q, k, v, imgs=1):
        spec = pl.BlockSpec((imgs, N, C), lambda i: (i, 0, 0),
                            memory_space=pc.VMEM)
        return pl.pallas_call(
            kernel, grid=(B // imgs,), in_specs=[spec, spec, spec],
            out_specs=spec, out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
            interpret=pc.should_interpret(),
        )(q, k, v)

    def call_bwd(kernel, q, k, v, g, imgs=1):
        spec = pl.BlockSpec((imgs, N, C), lambda i: (i, 0, 0),
                            memory_space=pc.VMEM)
        shape = jax.ShapeDtypeStruct((B, N, C), q.dtype)
        return pl.pallas_call(
            kernel, grid=(B // imgs,), in_specs=[spec] * 4,
            out_specs=(spec, spec, spec), out_shape=(shape,) * 3,
            interpret=pc.should_interpret(),
        )(q, k, v, g)

    ship_fwd = functools.partial(_packed_fwd_kernel, num_heads=NH, scale=scale)
    ship_bwd = functools.partial(_packed_bwd_kernel, num_heads=NH, scale=scale)

    def _one_head(qh, kh, vh):
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        return jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def ship_fwd_i2(q_ref, k_ref, v_ref, o_ref):
        for i in range(2):
            q, k, v = q_ref[i], k_ref[i], v_ref[i]
            outs = [_one_head(q[:, h * D:(h + 1) * D], k[:, h * D:(h + 1) * D],
                              v[:, h * D:(h + 1) * D]) for h in range(NH)]
            o_ref[i] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)

    def ship_bwd_i2(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
        for i in range(2):
            q, k, v, g = q_ref[i], k_ref[i], v_ref[i], g_ref[i]
            dqs, dks, dvs = [], [], []
            for h in range(NH):
                sl = slice(h * D, (h + 1) * D)
                qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                dp = jax.lax.dot_general(
                    gh, vh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                ds_c = ds.astype(kh.dtype)
                p_c = p.astype(gh.dtype)
                dqs.append(jax.lax.dot_general(
                    ds_c, kh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale)
                dks.append(jax.lax.dot_general(
                    ds_c, qh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale)
                dvs.append(jax.lax.dot_general(
                    p_c, gh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            dq_ref[i] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
            dk_ref[i] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
            dv_ref[i] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)

    variants = {
        "loop":    (lambda q, k, v: call_fwd(ship_fwd, q, k, v),
                    lambda q, k, v, g: call_bwd(ship_bwd, q, k, v, g)),
        "batched": (lambda q, k, v: call_fwd(fwd_batched, q, k, v),
                    lambda q, k, v, g: call_bwd(bwd_batched, q, k, v, g)),
        "pairs":   (lambda q, k, v: call_fwd(fwd_pairs, q, k, v), None),
        "loop-i2": (lambda q, k, v: call_fwd(ship_fwd_i2, q, k, v, imgs=2),
                    lambda q, k, v, g: call_bwd(ship_bwd_i2, q, k, v, g,
                                                imgs=2)),
    }

    which = sys.argv[1:] or list(variants)

    def make(i):
        ks = jax.random.split(jax.random.key(i), 4)
        return tuple(jax.random.normal(kk, (B, N, C)).astype(jnp.bfloat16)
                     for kk in ks)

    for name in which:
        fwd, bwd = variants[name]

        @jax.jit
        def run_fwd(q, k, v, fwd=fwd):
            def body(_, q):
                return q + fwd(q, k, v) * 1e-6
            return jax.lax.fori_loop(0, REPS, body, q)

        _fetch(run_fwd(*make(0)[:3]))
        best = float("inf")
        for i in range(1, 4):
            args = make(i)[:3]
            for a in args:
                _fetch(a)
            t0 = time.perf_counter()
            _fetch(run_fwd(*args))
            best = min(best, (time.perf_counter() - t0) / REPS)
        out = {"variant": name, "fwd_ms_per_app": round(best * 1000, 3)}

        if bwd is not None:
            @jax.jit
            def run_bwd(q, k, v, g, bwd=bwd):
                def body(_, q):
                    dq, dk, dv = bwd(q, k, v, g)
                    return q + (dq + dk + dv) * 1e-6
                return jax.lax.fori_loop(0, REPS, body, q)

            _fetch(run_bwd(*make(0)))
            best = float("inf")
            for i in range(1, 4):
                args = make(i)
                for a in args:
                    _fetch(a)
                t0 = time.perf_counter()
                _fetch(run_bwd(*args))
                best = min(best, (time.perf_counter() - t0) / REPS)
            out["bwd_ms_per_app"] = round(best * 1000, 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
