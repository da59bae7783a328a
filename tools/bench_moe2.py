"""Component breakdown of the sparse-MoE forward (where do the ms go?).

bench_moe.py measured sparse = 120 ms vs dense = 148 ms at B=64, E=8, K=2,
C=20 — a 1.23x speedup where FLOP accounting predicts ~2x. This bench times
the pieces in isolation so the overhead has an address:
  gate       — ViT-S gate forward at B
  stack@C    — vmapped expert stack on dispatched (E, C, ...) images
  stack@B    — vmapped expert stack on broadcast (E, B, ...) images (dense)
  gather     — the (E, C, H, W, 3) dispatch gather alone
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    # reduce ON DEVICE, fetch one scalar (a full-tensor fetch through the
    # tunnel would pollute the measurement)
    import jax.numpy as jnp, numpy as np
    return float(np.asarray(jnp.mean(x)))


def timed(fn, make_x, reps):
    import time
    _fetch(fn(make_x(0)))
    best = float("inf")
    for i in range(1, 4):
        x = make_x(i)
        _fetch(x)
        t0 = time.perf_counter()
        _fetch(fn(x))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1000


def main():
    import dataclasses

    import jax, jax.numpy as jnp
    from flax import linen as nn

    from touhouimageclassification_tpu.config import MoEConfig, ViTConfig
    from touhouimageclassification_tpu.models.resmoe import (
        GatingNetwork, _expert_vit_cfg,
    )
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.ops import moe_dispatch as md

    B, E, K, REPS = 64, 8, 2, 8
    expert = ViTConfig(image_size=224, patch_size=16, hidden_size=384,
                       num_layers=6, num_heads=6, mlp_dim=1536,
                       num_classes=120)
    cfg = MoEConfig(num_experts=E, top_k=K, routing="sparse",
                    capacity_factor=1.25, expert_vit=expert)
    C = md.capacity_for(B, K, E, cfg.capacity_factor)

    x0 = jax.random.normal(jax.random.key(0), (B, 224, 224, 3))

    # gate
    gate = GatingNetwork(cfg)
    gp = gate.init(jax.random.key(1), x0)["params"]

    @jax.jit
    def run_gate(gp, x):
        def body(_, x):
            w, i, _probs = gate.apply({"params": gp}, x, deterministic=True)
            return x + jnp.mean(w) * 1e-6
        return jax.lax.fori_loop(0, REPS, body, x)

    def rnd(i, shape):
        return jax.random.normal(jax.random.key(i), shape)

    import functools
    print(json.dumps({"gate_ms": round(
        timed(functools.partial(run_gate, gp),
              lambda i: rnd(i, (B, 224, 224, 3)), REPS), 2)}), flush=True)

    # expert stack at various effective batch
    ExpertStack = nn.vmap(
        ViT, variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(0, None), out_axes=0, axis_size=E,
        metadata_params={nn.meta.PARTITION_NAME: "expert"},
    )
    ecfg = _expert_vit_cfg(cfg)
    stack = ExpertStack(ecfg)
    sp = stack.init(jax.random.key(2), jnp.zeros((E, 1, 224, 224, 3)),
                    True)["params"]

    for label, nb in (("stack@C", C), ("stack@B", B)):
        @jax.jit
        def run_stack(sp, x):
            def body(_, x):
                out = stack.apply({"params": sp}, x, True)
                return x + jnp.mean(out) * 1e-6
            return jax.lax.fori_loop(0, REPS, body, x)

        print(json.dumps({label + "_ms": round(
            timed(functools.partial(run_stack, sp),
                  lambda i: rnd(i, (E, nb, 224, 224, 3)), REPS),
            2)}), flush=True)

    # dispatch gather alone
    idx = jax.random.randint(jax.random.key(3), (B, K), 0, E)
    plan = md.make_dispatch_plan(idx, E, C)

    @jax.jit
    def run_gather(x):
        def body(_, x):
            xs = md.dispatch(plan, x)
            return x + jnp.mean(xs) * 1e-6
        return jax.lax.fori_loop(0, REPS, body, x)

    print(json.dumps({"gather_ms": round(
        timed(run_gather, lambda i: rnd(i, (B, 224, 224, 3)), REPS), 2)}),
        flush=True)


if __name__ == "__main__":
    main()
