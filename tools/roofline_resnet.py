"""Per-stage roofline decomposition of the ResNet-152 train workload.

tools/bench_resnet.py measures 911 img/s/chip (b80, 256²) — ~58% of a
naive all-FLOPs-at-142-TFLOP/s ceiling (~1,570), a much bigger gap than
the ViT-L step's (97% of its corrected ceiling). This tool finds where
the gap lives: it times the stem, each of the four stages, and the head
as standalone jitted probes (batch 80, the preset's shapes), each in
three BatchNorm modes:

  infer  BN with running stats (scale+shift only)
  train  BN computing batch statistics (the training fwd path)
  none   convs+relu+residual only — prices BN itself

Probes chain reps via a scalar feedback into the input (the input
rewrite this costs is measured separately per shape as `chain_*` and
subtracted — the lesson of tools/roofline_attn.py). Analytic floors per
stage: conv FLOPs at the measured 142 TFLOP/s big-GEMM rate, and
elementwise/BN HBM traffic at 819 GB/s.

The probe modules re-state the block structure locally (conv/BN flags)
rather than importing the model — they are instruments, and their params
are random; only shapes/timing matter.

Result (2026-08-17, v5e, chain-corrected train-mode fwd ms vs floors):
stem 1.05/0.62(HBM), stage1 4.62/3.07(HBM), stage2 4.91/4.10(HBM),
stage3 11.70/11.80(MXU — at 100% of the big-GEMM rate), stage4 0.92.
BN batch-stats passes cost 6.3 ms ≈ 27% of fwd. Verdict: memory-bound
early stages + BN statistics, not recoverable conv overhead; see
RESULTS.md "Per-stage roofline".

Run (chip): python tools/roofline_resnet.py
"""
import functools
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 80
HBM_GBPS = 819.0
MXU_TFLOPS = 142.0
REPS = 24

# ResNet-152: (blocks, filters) per stage; bottleneck expansion 4.
STAGES = [(3, 64), (8, 128), (36, 256), (3, 512)]


def _fetch(x):
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))


def main():
    import jax, jax.numpy as jnp
    from flax import linen as nn

    kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

    class Probe(nn.Module):
        """stem | stageK | head, with BN mode 'infer'|'train'|'none'."""
        part: str
        bn: str

        @nn.compact
        def __call__(self, x):
            conv = functools.partial(
                nn.Conv, use_bias=False, dtype=jnp.bfloat16,
                param_dtype=jnp.float32, kernel_init=kaiming)

            def norm(y, name):
                if self.bn == "none":
                    return y
                return nn.BatchNorm(
                    use_running_average=(self.bn == "infer"), momentum=0.9,
                    epsilon=1e-5, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32, name=name)(y)

            if self.part == "stem":
                y = conv(64, (7, 7), strides=(2, 2),
                         padding=[(3, 3), (3, 3)], name="conv")(x)
                y = nn.relu(norm(y, "bn"))
                return nn.max_pool(y, (3, 3), strides=(2, 2),
                                   padding=[(1, 1), (1, 1)])
            if self.part == "head":
                y = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
                return nn.Dense(120, dtype=jnp.float32, name="fc")(y)

            k = int(self.part[5:])           # 'stageK'
            blocks, f = STAGES[k - 1]
            for b in range(blocks):
                strides = 2 if k > 1 and b == 0 else 1
                residual = x
                y = nn.relu(norm(conv(f, (1, 1), name=f"b{b}c1")(x), f"b{b}n1"))
                y = nn.relu(norm(conv(f, (3, 3), strides=(strides, strides),
                                      name=f"b{b}c2")(y), f"b{b}n2"))
                y = norm(conv(4 * f, (1, 1), name=f"b{b}c3")(y), f"b{b}n3")
                if residual.shape != y.shape:
                    residual = norm(conv(4 * f, (1, 1),
                                         strides=(strides, strides),
                                         name=f"b{b}cd")(x), f"b{b}nd")
                x = nn.relu(y + residual)
            return x

    # input shape per part at 256² (stem out: 64², stages halve from there)
    shapes = {
        "stem": (B, 256, 256, 3),
        "stage1": (B, 64, 64, 64),      # first block widens 64 -> 256
        "stage2": (B, 64, 64, 256),
        "stage3": (B, 32, 32, 512),
        "stage4": (B, 16, 16, 1024),
        "head": (B, 8, 8, 2048),
    }

    def timed(run, shape):
        def make(i):
            return jax.random.normal(
                jax.random.key(i), shape).astype(jnp.bfloat16)
        _fetch(run(make(0)))
        best = float("inf")
        for i in range(1, 4):
            a = make(100 + i)
            _fetch(a)
            t0 = time.perf_counter()
            _fetch(run(a))
            best = min(best, (time.perf_counter() - t0) / REPS)
        return best * 1000

    results, chains = {}, {}

    for part, shape in shapes.items():
        # the chain op alone for this shape
        @jax.jit
        def run_chain(x):
            def body(_, x):
                return x * (1.0 + jnp.mean(x) * 1e-12)
            return jax.lax.fori_loop(0, REPS, body, x)
        chains[part] = round(timed(run_chain, shape), 3)

        for bn in ("infer", "train", "none"):
            mod = Probe(part=part, bn=bn)
            variables = mod.init(jax.random.key(0),
                                 jnp.zeros(shape, jnp.bfloat16))

            if bn == "train" and part != "head":
                def apply_fn(x, mod=mod, variables=variables):
                    out, _ = mod.apply(variables, x,
                                       mutable=["batch_stats"])
                    return out
            else:
                def apply_fn(x, mod=mod, variables=variables):
                    return mod.apply(variables, x)

            @jax.jit
            def run(x, apply_fn=apply_fn):
                def body(_, x):
                    o = apply_fn(x)
                    return x * (1.0 + jnp.mean(o).astype(x.dtype) * 1e-12)
                return jax.lax.fori_loop(0, REPS, body, x)

            key = f"{part}_{bn}"
            results[key] = round(timed(run, shape), 3)
            print(f"{key}: {results[key]} ms (chain {chains[part]})",
                  flush=True)
            if part == "head":
                break                      # BN mode irrelevant for the head

    # ---- analytic floors per stage -------------------------------------
    floors = {}
    for part, shape in shapes.items():
        _, h, w, cin = shape
        flops = 0
        ew_bytes = 0
        if part == "stem":
            flops = B * (h // 2) * (w // 2) * 64 * 7 * 7 * cin * 2
            ew_bytes = B * (h // 2) * (w // 2) * 64 * 2 * 3  # bn r+w, pool r
        elif part == "head":
            flops = B * 2048 * 120 * 2
            ew_bytes = B * h * w * cin * 2
        else:
            k = int(part[5:])
            blocks, f = STAGES[k - 1]
            s = h // 2 if k > 1 else h      # spatial after the stride block
            cin_b = cin
            for b in range(blocks):
                sp = s * s
                sp1 = h * w if b == 0 else sp   # conv1 runs pre-stride
                flops += B * (sp1 * cin_b * f + sp * f * f * 9
                              + sp * f * 4 * f) * 2
                if b == 0 and cin_b != 4 * f:
                    flops += B * sp * cin_b * 4 * f * 2
                # each conv output: BN read+write, relu fused; residual add
                ew_bytes += B * sp * (f + f + 4 * f) * 2 * 2
                ew_bytes += B * sp * 4 * f * 2 * 2
                cin_b = 4 * f
        floors[part] = {
            "gflops": round(flops / 1e9, 1),
            "mxu_ms": round(flops / (MXU_TFLOPS * 1e9), 3),
            "ew_dma_ms": round(ew_bytes / (HBM_GBPS * 1e6), 3),
        }

    adj = {k: round(v - chains[k.rsplit("_", 1)[0]], 3)
           for k, v in results.items()}
    print(json.dumps({"measured_ms": results, "chain_ms": chains,
                      "minus_chain_ms": adj, "floors": floors}, indent=1))


if __name__ == "__main__":
    main()
