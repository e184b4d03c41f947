#!/usr/bin/env python3
"""Layout micro-benchmarks: NHWC vs planar cost of full-res passes."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def timeit(label, fn, reps=5):
    print("compiling:", label, flush=True)
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} med {np.median(ts)*1e3:8.2f} ms")
    return float(np.median(ts))


def sync(a):
    _ = float(np.asarray(a[tuple([0] * a.ndim)]))


def main():
    n, h, w = 96, 1080, 1920
    rng = np.random.default_rng(0)
    host = rng.random((n, h, w, 3), np.float32)
    nhwc = jnp.asarray(host)
    nhwc.block_until_ready()
    print("uploaded", flush=True)
    planar = jax.jit(lambda x: jnp.transpose(x, (0, 3, 1, 2)))(nhwc)
    planar.block_until_ready()
    cfirst = jax.jit(lambda x: jnp.transpose(x, (3, 0, 1, 2)))(nhwc)
    cfirst.block_until_ready()

    @jax.jit
    def gray_pool_nhwc(x):
        g = jnp.einsum("nhwc,c->nhw", x, jnp.asarray(LUMA))
        g = jnp.floor(jnp.clip(g * 255.0, 0.0, 255.0))
        return g.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    @jax.jit
    def gray_pool_planar(x):  # (N,3,H,W)
        g = jnp.einsum("nchw,c->nhw", x, jnp.asarray(LUMA))
        g = jnp.floor(jnp.clip(g * 255.0, 0.0, 255.0))
        return g.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    @jax.jit
    def gray_pool_planar_slice(x):  # (N,3,H,W), strided-slice pooling
        g = jnp.einsum("nchw,c->nhw", x, jnp.asarray(LUMA))
        g = jnp.floor(jnp.clip(g * 255.0, 0.0, 255.0))
        return (g[:, ::2, ::2] + g[:, 1::2, ::2] + g[:, ::2, 1::2] + g[:, 1::2, 1::2]) * 0.25

    @jax.jit
    def gray_pool_cfirst(x):  # (3,N,H,W)
        g = jnp.einsum("cnhw,c->nhw", x, jnp.asarray(LUMA))
        g = jnp.floor(jnp.clip(g * 255.0, 0.0, 255.0))
        return g.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    @jax.jit
    def to_planar(x):
        return jnp.transpose(x, (0, 3, 1, 2))

    @jax.jit
    def to_cfirst(x):
        return jnp.transpose(x, (3, 0, 1, 2))

    @jax.jit
    def from_planar(x):
        return jnp.transpose(x, (0, 2, 3, 1))

    @jax.jit
    def copy_nhwc(x):
        return x * 1.0000001

    @jax.jit
    def copy_planar(x):
        return x * 1.0000001

    timeit("copy NHWC (read+write 1.6GB)", lambda: sync(copy_nhwc(nhwc)))
    timeit("copy planar", lambda: sync(copy_planar(planar)))
    timeit("gray+pool NHWC", lambda: sync(gray_pool_nhwc(nhwc)))
    timeit("gray+pool planar (N,3,H,W)", lambda: sync(gray_pool_planar(planar)))
    timeit("gray+pool planar slice-pool", lambda: sync(gray_pool_planar_slice(planar)))
    timeit("gray+pool cfirst (3,N,H,W)", lambda: sync(gray_pool_cfirst(cfirst)))
    timeit("transpose NHWC->planar", lambda: sync(to_planar(nhwc)))
    timeit("transpose NHWC->cfirst", lambda: sync(to_cfirst(nhwc)))
    timeit("transpose planar->NHWC", lambda: sync(from_planar(planar)))

    # host->device transfer comparison
    timeit("device_put NHWC host->dev 0.8GB", lambda: jax.device_put(host).block_until_ready())


if __name__ == "__main__":
    main()
