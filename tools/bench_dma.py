"""Null-copy DMA study for the slab attention kernels' grid/BlockSpecs.

Origin: a first (chain-polluted) roofline read suggested the slab kernels
were DMA/grid bound at ~120-160 GB/s effective. This tool disproved that:
once the inter-rep chaining op (1.37 ms/rep of its own elementwise traffic)
is measured and subtracted, every null-copy variant runs at >=1 TB/s
effective — Pallas grid DMA is at full bandwidth, and none of the candidate
"fixes" below moves the needle (all within noise). Measured 2026-08-17 on
v5e (RESULTS.md "Attention roofline decomposition"). Variants:

  chain      the inter-rep chaining op alone (no pallas) — subtract from all
  n197       shipped shape: grid (B,), block (1, 197, 3C)
  n208/n256  input pre-padded so the block's sublane dim is tile-aligned
  img2/4/8   2/4/8 images per grid step (fewer, bigger DMAs)
  img4n208   combined
  lanes      grid (B, 3) with (1, 197, C) blocks (smaller, more steps)
  xla_copy   plain XLA full-array copy — the device's streaming copy rate

Result (minus chain, ms/app): n197 0.183, n208 0.160, n256 0.279, img2
0.170, img4 0.204, img4n208 0.178, lanes 0.181 — no misaligned-sublane
penalty, no per-grid-step overhead worth chasing; xla_copy fuses into the
chain entirely (delta ~0).

Run (chip): python tools/bench_dma.py
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, C, REPS = 128, 197, 1024, 24


def _fetch(x):
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))


def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from touhouimageclassification_tpu.ops import _pallas_compat as pc

    def null_copy(qkv, img_block, n):
        """grid (B/img_block,), block (img_block, n, 3C) -> copy lanes :C."""
        def kernel(qkv_ref, o_ref):
            o_ref[:] = qkv_ref[:, :, :C]
        in_spec = pl.BlockSpec((img_block, n, 3 * C), lambda i: (i, 0, 0),
                               memory_space=pc.VMEM)
        out_spec = pl.BlockSpec((img_block, n, C), lambda i: (i, 0, 0),
                                memory_space=pc.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B // img_block,),
            in_specs=[in_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, n, C), qkv.dtype),
            interpret=pc.should_interpret(),
        )(qkv)

    def null_copy_lanes(qkv, n):
        def kernel(qkv_ref, o_ref):
            o_ref[:] = qkv_ref[:]
        in_spec = pl.BlockSpec((1, n, C), lambda i, j: (i, 0, j),
                               memory_space=pc.VMEM)
        out_spec = pl.BlockSpec((1, n, C), lambda i, j: (i, 0, 0),
                                memory_space=pc.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B, 3),
            in_specs=[in_spec],
            out_specs=pl.BlockSpec((1, n, C), lambda i, j: (i, 0, 0),
                                   memory_space=pc.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n, C), qkv.dtype),
            interpret=pc.should_interpret(),
        )(qkv)

    def make(i, n):
        return jax.random.normal(
            jax.random.key(i), (B, n, 3 * C)).astype(jnp.bfloat16)

    def timed(run, n):
        _fetch(run(make(0, n)))
        best = float("inf")
        for i in range(1, 4):
            a = make(100 + i, n)
            _fetch(a)
            t0 = time.perf_counter()
            _fetch(run(a))
            best = min(best, (time.perf_counter() - t0) / REPS)
        return best * 1000

    def chained(fn):
        @jax.jit
        def run(qkv):
            def body(_, qkv):
                o = fn(qkv)
                return qkv.at[:, :, :C].add(o * 1e-6)
            return jax.lax.fori_loop(0, REPS, body, qkv)
        return run

    out = {}

    def rec(key, fn, n):
        out[key] = round(timed(chained(fn), n), 3)
        print(f"{key}: {out[key]} ms/app", flush=True)

    # the chaining op alone (identity "kernel")
    rec("chain", lambda q: q[:, :, :C], N)

    rec("n197", lambda q: null_copy(q, 1, N), N)
    for n in (208, 256):
        rec(f"n{n}", lambda q, n=n: null_copy(q, 1, n), n)
    for ib in (2, 4):    # 8 images/step busts the 16 MB scoped-VMEM limit
        rec(f"img{ib}", lambda q, ib=ib: null_copy(q, ib, N), N)
    rec("img4n208", lambda q: null_copy(q, 4, 208), 208)
    rec("lanes", lambda q: null_copy_lanes(q, N), N)

    # plain XLA copy of the same traffic (read slab, write (B,N,C))
    rec("xla_copy", lambda q: q[:, :, :C] * 1.000001, N)

    bytes_fwd = B * N * (3 * C + C) * 2
    adj = {k: round(v - out["chain"], 3) for k, v in out.items()
           if k != "chain"}
    gbps = {k: round(bytes_fwd / max(v, 1e-9) / 1e6, 1)
            for k, v in adj.items()}
    print(json.dumps({"ms_per_app": out, "minus_chain": adj,
                      "effective_GBps": gbps}, indent=1))


if __name__ == "__main__":
    main()
