#!/usr/bin/env python3
"""Layout micro-benchmarks: NHWC vs planar cost of full-res passes.

Synthesizes the clip ON DEVICE (host->device of 0.8 GB through the dev
tunnel takes minutes; bench.py does the same).
"""

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
    print(f"{label:44s} med {np.median(ts)*1e3:8.2f} ms", flush=True)
    return float(np.median(ts))


def sync(a):
    _ = float(np.asarray(a[tuple([0] * a.ndim)]))


def main():
    n, h, w = 96, 1080, 1920
    key = jax.random.PRNGKey(0)
    nhwc = jax.random.uniform(key, (n, h, w, 3), jnp.float32)
    sync(nhwc)
    print("clip ready", flush=True)
    planar = jax.jit(lambda x: jnp.transpose(x, (0, 3, 1, 2)))(nhwc)
    sync(planar)

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
    def to_planar(x):
        return jnp.transpose(x, (0, 3, 1, 2))

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
    timeit("transpose NHWC->planar", lambda: sync(to_planar(nhwc)))
    timeit("transpose planar->NHWC", lambda: sync(from_planar(planar)))


if __name__ == "__main__":
    main()
