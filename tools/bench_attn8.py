"""Grid-split study for the slab attention: grid (B, S) with H/S heads per
step, reading q/k/v as three lane-offset BlockSpec views of the SAME
(B, N, 3C) buffer (no XLA slice copies — the slab win — but S× more grid
steps with S× smaller VMEM blocks, which may pipeline DMA/compute better).

S=1 degenerates to the shipped single-input slab kernel's work shape.
Measures fwd and fwd+bwd ms/app at the real call-site shapes.
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
        _packed_fwd_kernel_body, BWD_HEAD_GROUP,
    )

    B, N, NH, D, REPS = 128, 197, 16, 64, 24
    C = NH * D
    scale = D ** -0.5

    def fwd_split(qkv, splits):
        cs = C // splits          # lanes per split
        hs = NH // splits         # heads per split

        def kernel(q_ref, k_ref, v_ref, o_ref):
            _packed_fwd_kernel_body(q_ref[0], k_ref[0], v_ref[0], o_ref,
                                    num_heads=hs, scale=scale)

        blk = lambda off: pl.BlockSpec(
            (1, N, cs), lambda i, j, off=off: (i, 0, off + j),
            memory_space=pc.VMEM)
        out_spec = pl.BlockSpec((1, N, cs), lambda i, j: (i, 0, j),
                                memory_space=pc.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B, splits),
            in_specs=[blk(0), blk(splits), blk(2 * splits)],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
            interpret=pc.should_interpret(),
        )(qkv, qkv, qkv)

    def bwd_split(qkv, g, splits):
        cs = C // splits
        hs = NH // splits

        def kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
            q, k, v, gg = q_ref[0], k_ref[0], v_ref[0], g_ref[0]
            hd = D
            dqs, dks, dvs = [], [], []
            for h0 in range(0, hs, BWD_HEAD_GROUP):
                heads = list(range(h0, min(h0 + BWD_HEAD_GROUP, hs)))
                st = lambda x: jnp.stack(
                    [x[:, h * hd:(h + 1) * hd] for h in heads], axis=0)
                qh, kh, vh, gh = st(q), st(k), st(v), st(gg)
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
                p_c = p.astype(gg.dtype)
                dqs.append(jax.lax.dot_general(
                    ds_c, kh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale)
                dks.append(jax.lax.dot_general(
                    ds_c, qh, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale)
                dvs.append(jax.lax.dot_general(
                    p_c, gh, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))
            cat = lambda xs: jnp.concatenate(
                [x[i] for x in xs for i in range(x.shape[0])], axis=-1)
            dq_ref[0] = cat(dqs).astype(dq_ref.dtype)
            dk_ref[0] = cat(dks).astype(dk_ref.dtype)
            dv_ref[0] = cat(dvs).astype(dv_ref.dtype)

        blk = lambda off: pl.BlockSpec(
            (1, N, cs), lambda i, j, off=off: (i, 0, off + j),
            memory_space=pc.VMEM)
        gspec = pl.BlockSpec((1, N, cs), lambda i, j: (i, 0, j),
                             memory_space=pc.VMEM)
        shape = jax.ShapeDtypeStruct((B, N, C), qkv.dtype)
        return pl.pallas_call(
            kernel,
            grid=(B, splits),
            in_specs=[blk(0), blk(splits), blk(2 * splits), gspec],
            out_specs=(gspec, gspec, gspec),
            out_shape=(shape, shape, shape),
            interpret=pc.should_interpret(),
        )(qkv, qkv, qkv, g)

    def make(i, c):
        return jax.random.normal(jax.random.key(i), (B, N, c)).astype(jnp.bfloat16)

    for splits in (int(a) for a in (sys.argv[1:] or ["1", "2", "4"])):
        @jax.jit
        def run_fwd(qkv, splits=splits):
            def body(_, qkv):
                o = fwd_split(qkv, splits)
                return qkv.at[:, :, :C].add(o * 1e-6)
            return jax.lax.fori_loop(0, REPS, body, qkv)

        @jax.jit
        def run_bwd(qkv, g, splits=splits):
            def body(_, qkv):
                dq, dk, dv = bwd_split(qkv, g, splits)
                return qkv.at[:, :, :C].add((dq + dk + dv) * 1e-6)
            return jax.lax.fori_loop(0, REPS, body, qkv)

        out = {"splits": splits}
        _fetch(run_fwd(make(0, 3 * C)))
        best = float("inf")
        for i in range(1, 4):
            a = make(i, 3 * C)
            _fetch(a)
            t0 = time.perf_counter()
            _fetch(run_fwd(a))
            best = min(best, (time.perf_counter() - t0) / REPS)
        out["fwd_ms_per_app"] = round(best * 1000, 3)

        g = make(99, C)
        _fetch(run_bwd(make(0, 3 * C), g))
        best = float("inf")
        for i in range(1, 4):
            a = make(i, 3 * C)
            _fetch(a)
            t0 = time.perf_counter()
            _fetch(run_bwd(a, g))
            best = min(best, (time.perf_counter() - t0) / REPS)
        out["bwd_ms_per_app"] = round(best * 1000, 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
