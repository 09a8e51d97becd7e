"""Single-chip perf ablations for the baseline train step.

Variants: loss chunk size, vision remat on/off, batch size.  Each prints
ms/step measured with true host-fetch sync (see bench.py sync caveat).

Usage: python scripts/ablate.py [--steps 4]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def run_variant(name, *, batch_size, chunk, remat_vision, steps, attn="pallas", ce="chunked", remat=True):
    import jax
    import jax.numpy as jnp
    from flax.training.train_state import TrainState

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
        TrainConfig, llava_onevision_0_5b,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
        LlavaOnevision,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.train import (
        KDModels, make_optimizer, make_train_step,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.synthetic import (
        synthetic_kd_batch,
    )

    scfg = dataclasses.replace(llava_onevision_0_5b(), max_tiles=8)
    student = LlavaOnevision(
        scfg, dtype=jnp.bfloat16, remat=remat, remat_vision=remat_vision,
        attn_impl=attn,
    )
    batch = jax.tree.map(jnp.asarray, synthetic_kd_batch(
        scfg, batch_size, 4864, orig_sizes=[(530, 730)] * batch_size,
        accum=1, seed=0,
    ))
    micro = jax.tree.map(lambda x: x[0], batch)
    shapes = jax.eval_shape(lambda: student.init(
        jax.random.PRNGKey(0),
        input_ids=micro["student_input_ids"],
        attention_mask=micro["student_attention_mask"],
        pixel_values=micro["student_pixel_values"],
        pack_idx=micro["pack_idx"], pack_weight=micro["pack_weight"],
        pack_valid=micro["pack_valid"], tile_valid=micro["tile_valid"],
    )["params"])
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def init(key):
        ks = jax.random.split(key, len(leaves))
        return [jax.random.normal(ks[i], leaves[i].shape, jnp.bfloat16) * 0.02
                for i in range(len(leaves))]

    params = jax.tree.unflatten(treedef, init(jax.random.PRNGKey(0)))
    cfg = TrainConfig(kd_mode="baseline", loss_chunk_size=chunk, ce_impl=ce)
    state = TrainState.create(apply_fn=None, params=params,
                              tx=make_optimizer(params, 2e-5))
    step = jax.jit(make_train_step(KDModels(student, None), cfg),
                   donate_argnums=(0,))

    t0 = time.time()
    state, metrics = step(state, None, batch)
    l0 = float(jax.device_get(metrics["loss"]))
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, None, batch)
        float(jax.device_get(metrics["loss"]))
    dt = (time.time() - t0) / steps
    print(f"{name}: {dt*1000:.0f} ms/step ({batch_size/dt:.2f} samples/s) "
          f"compile={compile_t:.0f}s loss0={l0:.3f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--variants", nargs="+", default=[
        "base", "chunk512", "novisremat", "b2",
    ])
    args = ap.parse_args()

    table = {
        "base":       dict(batch_size=1, chunk=256, remat_vision=True),
        "chunk512":   dict(batch_size=1, chunk=512, remat_vision=True),
        "chunk1024":  dict(batch_size=1, chunk=1024, remat_vision=True),
        "novisremat": dict(batch_size=1, chunk=256, remat_vision=False),
        "b2":         dict(batch_size=2, chunk=256, remat_vision=True),
        "b2best":     dict(batch_size=2, chunk=512, remat_vision=False),
        "xlachunked": dict(batch_size=1, chunk=256, remat_vision=True,
                           attn="xla_chunked"),
        "fusedloss":  dict(batch_size=1, chunk=256, remat_vision=True,
                           ce="fused"),
        "noremat":    dict(batch_size=1, chunk=256, remat_vision=True,
                           ce="fused", remat=False),
    }
    for name in args.variants:
        run_variant(name, steps=args.steps, **table[name])


if __name__ == "__main__":
    main()
