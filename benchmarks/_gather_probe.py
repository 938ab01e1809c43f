"""Throwaway: micro-bench two in-kernel gather strategies for the fused
DLGM trainer.  Each kernel repeats the gather REPS times inside a
fori_loop, so per-gather cost = wall / REPS with no relay overhead."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N, D, B = 10_000, 32, 256
REPS = 20000
CH = 1000   # one-hot chunk


def loop_kernel(seed_ref, x_ref, out_ref, idx_scr, xb_scr):
    pltpu.prng_seed(seed_ref[0])

    def rep(r, acc):
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, 1)), jnp.uint32)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
        idx_scr[...] = jnp.minimum((u * N).astype(jnp.int32), N - 1)

        def g(i, _):
            i0 = idx_scr[i, 0]
            xb_scr[pl.ds(i, 1), :] = x_ref[pl.ds(i0, 1), :]
            return _

        jax.lax.fori_loop(0, B, g, None)
        return acc + jnp.sum(xb_scr[...])

    out_ref[0, 0] = jax.lax.fori_loop(0, REPS, rep, 0.0)


def onehot_kernel(seed_ref, x_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    col = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)

    def rep(r, acc):
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, 1)), jnp.uint32)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
        idx = jnp.minimum((u * N).astype(jnp.int32), N - 1)   # (B, 1)
        xb = jnp.zeros((B, D), jnp.float32)
        for c in range(N // CH):
            oh = (idx == col + c * CH).astype(jnp.bfloat16)    # (B, CH)
            xb = xb + jax.lax.dot_general(
                oh, x_ref[c * CH:(c + 1) * CH, :].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc + jnp.sum(xb)

    out_ref[0, 0] = jax.lax.fori_loop(0, REPS, rep, 0.0)



def mixed_kernel(seed_ref, x_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    col = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)

    def rep(r, acc):
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, 1)), jnp.uint32)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
        idx = jnp.minimum((u * N).astype(jnp.int32), N - 1)   # (B, 1)
        xb = jnp.zeros((B, D), jnp.float32)
        for c in range(N // CH):
            oh = (idx == col + c * CH).astype(jnp.bfloat16)    # (B, CH)
            xb = xb + jax.lax.dot_general(
                oh, x_ref[c * CH:(c + 1) * CH, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc + jnp.sum(xb)

    out_ref[0, 0] = jax.lax.fori_loop(0, REPS, rep, 0.0)



def f32_kernel(seed_ref, x_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    col = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)

    def rep(r, acc):
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, 1)), jnp.uint32)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
        idx = jnp.minimum((u * N).astype(jnp.int32), N - 1)   # (B, 1)
        xb = jnp.zeros((B, D), jnp.float32)
        for c in range(N // CH):
            oh = (idx == col + c * CH).astype(jnp.float32)    # (B, CH)
            xb = xb + jax.lax.dot_general(
                oh, x_ref[c * CH:(c + 1) * CH, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc + jnp.sum(xb)

    out_ref[0, 0] = jax.lax.fori_loop(0, REPS, rep, 0.0)



def rng_kernel(seed_ref, x_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])

    def rep(r, acc):
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, 1)), jnp.uint32)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
        idx = jnp.minimum((u * N).astype(jnp.int32), N - 1)
        return acc + jnp.sum(idx.astype(jnp.float32))

    out_ref[0, 0] = jax.lax.fori_loop(0, REPS, rep, 0.0)


def run(name, kernel, scratch):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(N, D)),
                    jnp.float32)
    fn = jax.jit(functools.partial(
        pl.pallas_call,
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=scratch,
        ),
    )())
    seed = jnp.asarray([0], jnp.int32)
    out = fn(seed, x)
    float(out[0, 0])
    t0 = time.perf_counter()
    out = fn(jnp.asarray([1], jnp.int32), x)
    float(out[0, 0])
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / REPS * 1e6:.2f} us/gather  (wall {dt:.3f}s)",
          flush=True)


if __name__ == "__main__":
    try:
        run("onehot-mixed", mixed_kernel, [])
        run("onehot-f32", f32_kernel, [])
    except Exception as e:
        print("onehot FAILED:", repr(e)[:500])

