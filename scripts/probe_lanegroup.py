"""Mosaic feasibility probe: lane-group reduction inside a Pallas kernel.

The SA1 point-packed gather idea (STATUS round-3 note) needs
oh4[r, p4] = sum_{c<4} oh[r, 4*p4+c] — a [R, 256] -> [R, 64, 4] minor
split + minor-axis sum. Also probes the block-diag first-layer trick's
reshape-free alternative: strided lane slices.
"""
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, P = 512, 256


def kernel_reshape(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = jnp.sum(x.reshape(R, P // 4, 4), axis=2)


def kernel_slice(x_ref, o_ref):
    x = x_ref[...]
    acc = x[:, 0::4]
    for c in range(1, 4):
        acc = acc + x[:, c::4]
    o_ref[...] = acc


x = jnp.asarray(np.random.default_rng(0).random((R, P)), jnp.float32)
want = np.asarray(x).reshape(R, P // 4, 4).sum(2)

for name, kern in [("minor-split reshape", kernel_reshape),
                   ("strided lane slices", kernel_slice)]:
    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, P // 4), jnp.float32),
            in_specs=[pl.BlockSpec((R, P), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, P // 4), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        got = np.asarray(jax.jit(f)(x))
        ok = np.allclose(got, want, atol=1e-5)
        print(f"{name}: COMPILES, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILS — {msg}")
