"""Isolated flash-attention kernel timing (vs the step-level census).

Times N chained fwd (and optionally fwd+bwd) invocations of the shipped
flash kernel inside ONE jit at the production shapes, with a single
device_get — the only reliable timing through the axon tunnel
(PERF_NOTES "environment quirks").  Compares against the per-kernel
numbers the profiler census reports (~0.4-0.5 ms fwd / 0.78 ms bwd per
student layer at S=3072) and the matmul speed-of-light (~0.1 ms).

Usage: python scripts/flash_microbench.py [--bwd] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--seq", type=int, default=3072)
    ap.add_argument("--heads", type=int, default=14)
    ap.add_argument("--kv_heads", type=int, default=2)
    ap.add_argument("--head_dim", type=int, default=64)
    ap.add_argument("--impl", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--stock_blocks", action="store_true",
                    help="skip the production big-block budgets")
    args = ap.parse_args()

    if not args.stock_blocks:
        # mirror bench.py's production kernel configuration
        os.environ.setdefault("KDSS_FLASH_ROWS", "7168")
        os.environ.setdefault("KDSS_FLASH_BK", "1024")

    import jax
    import jax.numpy as jnp

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.attention import (
        dot_product_attention,
    )

    b, s, h, hk, d = 1, args.seq, args.heads, args.kv_heads, args.head_dim
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, s, hk, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, s, hk, d), jnp.bfloat16)

    def one(q, k, v):
        return dot_product_attention(q, k, v, causal=True, impl=args.impl)

    if args.bwd:
        def one_pass(q, k, v):
            out, vjp = jax.vjp(one, q, k, v)
            dq, dk, dv = vjp(out)
            return dq
    else:
        one_pass = one

    opts = (None if args.stock_blocks
            else {"xla_tpu_scoped_vmem_limit_kib": "98304"})

    def make_chain(length):
        @lambda f: jax.jit(f, compiler_options=opts)
        def chain(q, k, v):
            def body(c, _):
                o = one_pass(c, k, v)
                # feed output back as q (prevents CSE; keeps shapes)
                return o.astype(c.dtype) * 1e-3, None
            out, _ = jax.lax.scan(body, q, None, length=length)
            return out[0, 0, 0, 0]
        return chain

    # Marginal rate between two chain lengths: a single chain call carries
    # ~30 ms of tunnel launch/RTT overhead, which at 50 iters inflates the
    # per-pass figure by ~0.6 ms (verified against a device-event profile:
    # wall said 1.335 ms/pass where the kernel ran 0.76 ms).  The length
    # difference cancels the fixed cost.
    short, long_ = make_chain(args.iters), make_chain(3 * args.iters)
    jax.device_get(short(q, k, v))  # compile + warm
    jax.device_get(long_(q, k, v))
    t0 = time.time()
    jax.device_get(short(q, k, v))
    t1 = time.time()
    jax.device_get(long_(q, k, v))
    dt = ((time.time() - t1) - (t1 - t0)) / (2 * args.iters)
    # per-pass attention FLOPs (causal halves the score space)
    fl = 2 * 2 * 0.5 * s * s * (h * d)
    if args.bwd:
        fl *= 3.5
    print(f"{args.impl} {'fwd+bwd' if args.bwd else 'fwd'}: "
          f"{dt*1e3:.3f} ms/pass, ~{fl/dt/1e12:.1f} TFLOP/s "
          f"(S={s}, {h}q/{hk}kv heads, d={d})")


if __name__ == "__main__":
    main()
