"""Per-component roofline decomposition of the slab attention kernel.

VERDICT round-2 item 1: the train-step headline (332.3 img/s) sits ~14%
below the matmul-bound ceiling (~385), and the residual was attributed to
attention kernel overhead at N=197. The one untried idea was a
"persistent-VMEM multi-layer megakernel". This tool settles the question
with measurement instead of another kernel: it runs CUMULATIVE variants of
the shipped slab kernels — identical grid, BlockSpecs, and DMA pattern —
peeling one component off at a time:

  fwd:  dma    = read (1,N,3C) slab, write (1,N,C) copy   (grid+DMA floor)
        layout = dma + the 3x stack_heads / 1x unstack VMEM relayout
        matmul = layout + both dot_generals (softmax -> 1/N scale)
        full   = the shipped _packed_fwd_kernel_body
  bwd:  dma    = read slab+g, write (1,N,3C)              (grid+DMA floor)
        matmul = all 5 dot_generals + relayouts, softmax -> 1/N scale
        full   = the shipped _slab_bwd_kernel

Differences between adjacent rows attribute the kernel's time to
DMA/grid, relayout, MXU, and softmax(VPU). Analytic floors (bytes at
819 GB/s HBM BW; FLOPs at the 142 TFLOP/s measured-achievable matmul rate)
are printed alongside so "irreducible" is a number, not a vibe.

Timing per CLAUDE.md relay rules: chained fori_loop reps inside one jit,
scalar fetch to synchronize, best-of-3 with fresh inputs.

Result (2026-08-17, v5e, chain-corrected ms/app): fwd 0.575 vs combined
floor 0.624 (at/below floor — DMA overlaps MXU); bwd 1.586 vs floor 1.372
(within 16%). Verdict: the kernels are at their D=64/N=197 shape floor;
the "385 img/s ceiling" was miscalibrated and the corrected ceiling is
~344, of which the shipped step achieves 97%. Full write-up: RESULTS.md
"Attention roofline decomposition".

Run (chip): python tools/roofline_attn.py
"""
import functools
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, NH, D, REPS = 128, 197, 16, 64, 24
C = NH * D
HBM_GBPS = 819.0          # v5e nominal HBM bandwidth
MXU_TFLOPS = 142.0        # measured-achievable bf16 matmul rate (RESULTS.md)


def _fetch(x):
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))


def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from touhouimageclassification_tpu.ops import _pallas_compat as pc
    from touhouimageclassification_tpu.ops.attention import (
        BWD_HEAD_GROUP, _stack_heads, _unstack_heads,
    )

    scale = D ** -0.5

    # ---- forward variant kernels (identical specs to the shipped slab) ----

    def fwd_body(qkv, o_ref, level):
        c = qkv.shape[-1] // 3
        q, k, v = qkv[:, :c], qkv[:, c:2 * c], qkv[:, 2 * c:]
        if level == "dma":
            o_ref[0] = q
            return
        qh = _stack_heads(q, NH)
        kh = _stack_heads(k, NH)
        vh = _stack_heads(v, NH)
        if level == "layout":
            o_ref[0] = _unstack_heads(qh).astype(o_ref.dtype)
            return
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if level == "matmul":
            p = s * (1.0 / N)            # stand-in normalization, no VPU
        else:                            # full softmax
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[0] = _unstack_heads(o).astype(o_ref.dtype)

    def fwd(qkv, level):
        in_spec = pl.BlockSpec((1, N, 3 * C), lambda i: (i, 0, 0),
                               memory_space=pc.VMEM)
        out_spec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                                memory_space=pc.VMEM)
        return pl.pallas_call(
            lambda qkv_ref, o_ref: fwd_body(qkv_ref[0], o_ref, level),
            grid=(B,),
            in_specs=[in_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
            interpret=pc.should_interpret(),
        )(qkv)

    # ---- backward variant kernels ----

    def bwd_body(qkv, g, dqkv_ref, level):
        c = qkv.shape[-1] // 3
        if level == "dma":
            dqkv_ref[0] = qkv
            return
        q, k, v = qkv[:, :c], qkv[:, c:2 * c], qkv[:, 2 * c:]
        hd = c // NH
        dqs, dks, dvs = [], [], []
        for h0 in range(0, NH, BWD_HEAD_GROUP):
            heads = list(range(h0, min(h0 + BWD_HEAD_GROUP, NH)))
            st = lambda x: jnp.stack(
                [x[:, h * hd:(h + 1) * hd] for h in heads], axis=0)
            qh, kh, vh, gh = st(q), st(k), st(v), st(g)
            s = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            dp = jax.lax.dot_general(
                gh, vh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if level == "matmul":
                p = s * (1.0 / N)
                ds = dp * (1.0 / N)
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds_c = ds.astype(k.dtype)
            p_c = p.astype(g.dtype)
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
        dqkv_ref[0] = jnp.concatenate(
            [cat(dqs), cat(dks), cat(dvs)], axis=-1).astype(dqkv_ref.dtype)

    def bwd(qkv, g, level):
        in_spec = pl.BlockSpec((1, N, 3 * C), lambda i: (i, 0, 0),
                               memory_space=pc.VMEM)
        g_spec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                              memory_space=pc.VMEM)
        return pl.pallas_call(
            lambda qkv_ref, g_ref, d_ref: bwd_body(
                qkv_ref[0], g_ref[0], d_ref, level),
            grid=(B,),
            in_specs=[in_spec, g_spec],
            out_specs=in_spec,
            out_shape=jax.ShapeDtypeStruct((B, N, 3 * C), qkv.dtype),
            interpret=pc.should_interpret(),
        )(qkv, g)

    def make(i, c):
        return jax.random.normal(
            jax.random.key(i), (B, N, c)).astype(jnp.bfloat16)

    def time_fn(run, *args):
        _fetch(run(*args))                     # compile + warm
        best = float("inf")
        for i in range(1, 4):
            a = make(100 + i, args[0].shape[-1])
            rest = args[1:]
            _fetch(a)
            t0 = time.perf_counter()
            _fetch(run(a, *rest))
            best = min(best, (time.perf_counter() - t0) / REPS)
        return best * 1000

    results = {}

    # The inter-rep chaining op is NOT free: it moves ~360 MB/rep and the
    # device streams XLA elementwise at ~280 GB/s (tools/bench_dma.py), so
    # it costs ~1.3 ms/rep — measure it alone and subtract.
    @jax.jit
    def run_chain(qkv):
        def body(_, qkv):
            return qkv.at[:, :, :C].add(qkv[:, :, :C] * 1e-6)
        return jax.lax.fori_loop(0, REPS, body, qkv)
    results["chain"] = round(time_fn(run_chain, make(0, 3 * C)), 3)
    print(f"chain: {results['chain']} ms/app", flush=True)

    for level in ("dma", "layout", "matmul", "full"):
        @jax.jit
        def run_fwd(qkv, level=level):
            def body(_, qkv):
                o = fwd(qkv, level)
                return qkv.at[:, :, :C].add(o * 1e-6)
            return jax.lax.fori_loop(0, REPS, body, qkv)
        results[f"fwd_{level}"] = round(time_fn(run_fwd, make(0, 3 * C)), 3)
        print(f"fwd_{level}: {results[f'fwd_{level}']} ms/app", flush=True)

    g = make(99, C)
    for level in ("dma", "matmul", "full"):
        @jax.jit
        def run_bwd(qkv, g, level=level):
            def body(_, qkv):
                d = bwd(qkv, g, level)
                return qkv + d * 1e-6
            return jax.lax.fori_loop(0, REPS, body, qkv)
        results[f"bwd_{level}"] = round(time_fn(run_bwd, make(0, 3 * C), g), 3)
        print(f"bwd_{level}: {results[f'bwd_{level}']} ms/app", flush=True)

    # Chain-free backward: dqkv is (B, N, 3C), so it feeds the next rep's
    # qkv directly — zero harness ops, the purest kernel wall time.
    for level in ("matmul", "full"):
        @jax.jit
        def run_bwd_pure(qkv, g, level=level):
            def body(_, qkv):
                return bwd(qkv, g, level)
            return jax.lax.fori_loop(0, REPS, body, qkv)
        key = f"bwd_{level}_pure"
        results[key] = round(time_fn(run_bwd_pure, make(0, 3 * C), g), 3)
        print(f"{key}: {results[key]} ms/app", flush=True)

    # ---- analytic floors --------------------------------------------------
    bf = 2  # bf16 bytes
    fwd_bytes = B * N * (3 * C + C) * bf                    # slab in, out
    bwd_bytes = B * N * (3 * C + C + 3 * C) * bf            # slab+g in, dslab
    fwd_flops = 2 * B * NH * N * N * D * 2                  # QK^T + PV
    bwd_flops = 2 * B * NH * N * N * D * 5                  # 5 matmuls
    floors = {
        "fwd_dma_floor_ms": round(fwd_bytes / (HBM_GBPS * 1e6), 3),
        "bwd_dma_floor_ms": round(bwd_bytes / (HBM_GBPS * 1e6), 3),
        "fwd_mxu_floor_ms": round(fwd_flops / (MXU_TFLOPS * 1e9), 3),
        "bwd_mxu_floor_ms": round(bwd_flops / (MXU_TFLOPS * 1e9), 3),
        # K=64 contractions at N=197 occupy the 128-wide MXU pipeline like
        # K=128 would, and lanes pad 197->256: the achievable matmul rate
        # for THIS shape is ~(64/128)*(197/256) of the big-GEMM rate.
        "fwd_mxu_shape_ms": round(
            fwd_flops / (MXU_TFLOPS * 1e9) / ((64 / 128) * (197 / 256)), 3),
        "bwd_mxu_shape_ms": round(
            bwd_flops / (MXU_TFLOPS * 1e9) / ((64 / 128) * (197 / 256)), 3),
    }

    ch = results["chain"]
    decomp = {
        # chain-corrected absolute kernel costs
        "fwd_kernel": round(results["fwd_full"] - ch, 3),
        "bwd_kernel": round(results["bwd_full"] - ch, 3),
        "bwd_kernel_pure": results["bwd_full_pure"],
        # incremental attribution (chain cancels in differences)
        "fwd_grid_dma": round(results["fwd_dma"] - ch, 3),
        "fwd_relayout": round(results["fwd_layout"] - results["fwd_dma"], 3),
        "fwd_matmuls": round(results["fwd_matmul"] - results["fwd_layout"], 3),
        "fwd_softmax": round(results["fwd_full"] - results["fwd_matmul"], 3),
        "bwd_grid_dma": round(results["bwd_dma"] - ch, 3),
        "bwd_matmuls_layout": round(
            results["bwd_matmul"] - results["bwd_dma"], 3),
        "bwd_softmax": round(results["bwd_full"] - results["bwd_matmul"], 3),
        # floor comparison: shape-adjusted MXU + DMA vs chain-corrected time
        "fwd_floor": round(
            floors["fwd_mxu_shape_ms"] + floors["fwd_dma_floor_ms"], 3),
        "bwd_floor": round(
            floors["bwd_mxu_shape_ms"] + floors["bwd_dma_floor_ms"], 3),
    }
    print(json.dumps({"measured": results, "floors": floors,
                      "decomposition": decomp}, indent=1))


if __name__ == "__main__":
    main()
