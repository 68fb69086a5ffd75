"""Haversine-distance benchmark -- parity with docs/dynamic.rst "A benchmark".

The reference's flagship CPU-SIMD demo: the great-circle distance between
10M coordinate pairs stored as an SoA struct, vectorized with
``DynamicArray`` packets (23.5x over scalar on AVX-512, 10x over libm on
AVX2 -- BASELINE.md §C). The TPU-native formulation: the record batch is
an ``@enoki_struct`` pytree, the kernel is plain jnp under ``jit`` (XLA
fuses the whole chain into one program, the analog of the packet loop),
and the baseline is the same computation in scalar-loop numpy / vectorized
numpy on the host CPU.

Run: python examples/haversine.py [n]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from enoki_tpu.struct import enoki_struct


@enoki_struct
class GeoRecord:
    lat1: jnp.ndarray
    lon1: jnp.ndarray
    lat2: jnp.ndarray
    lon2: jnp.ndarray


EARTH_RADIUS_KM = 6371.0


def haversine(r: GeoRecord):
    """Great-circle distance in km (the docs/dynamic.rst kernel)."""
    dlat = r.lat2 - r.lat1
    dlon = r.lon2 - r.lon1
    a = (jnp.sin(dlat * 0.5) ** 2
         + jnp.cos(r.lat1) * jnp.cos(r.lat2) * jnp.sin(dlon * 0.5) ** 2)
    return 2.0 * EARTH_RADIUS_KM * jnp.arcsin(jnp.sqrt(a))


haversine_jit = jax.jit(haversine)


def haversine_numpy(lat1, lon1, lat2, lon2):
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = (np.sin(dlat * 0.5) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin(dlon * 0.5) ** 2)
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    rng = np.random.default_rng(0)
    lat = rng.uniform(-np.pi / 2, np.pi / 2, (4, n)).astype(np.float32)
    rec = GeoRecord(*(jnp.asarray(x) for x in lat))

    out = haversine_jit(rec)
    np.asarray(out[:4])  # warm; a readback is the only reliable fence
    iters = 100

    # chained scan: step i+1's input depends on step i's result, so the
    # device must execute every step serially (async dispatch / remote
    # tunnels cannot fake it); the one readback is amortized over iters
    @jax.jit
    def bench_loop(rec):
        def step(carry, _):
            r = GeoRecord(rec.lat1 + carry * 1e-12, rec.lon1,
                          rec.lat2, rec.lon2)
            return jnp.mean(haversine(r)), None

        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
        return s

    float(bench_loop(rec))  # compile
    t0 = time.perf_counter()
    float(bench_loop(rec))
    t_tpu = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    ref = haversine_numpy(*lat)
    t_np = time.perf_counter() - t0

    ref64 = haversine_numpy(*(x.astype(np.float64) for x in lat))
    err = (np.abs(np.asarray(out, np.float64) - ref64)
           / np.maximum(ref64, 1e-9)).max()
    print(f"records               : {n:,}")
    print(f"device ({jax.devices()[0].device_kind:>12s}): "
          f"{t_tpu * 1e3:8.3f} ms   {n / t_tpu / 1e9:6.2f} G records/s")
    print(f"numpy (host, vector)  : {t_np * 1e3:8.3f} ms   "
          f"{n / t_np / 1e9:6.2f} G records/s")
    print(f"speedup vs numpy      : {t_np / t_tpu:6.1f}x   (reference: "
          f"23.5x vs scalar on AVX-512, BASELINE.md §C)")
    print(f"max rel err vs f64    : {err:.2e}")


if __name__ == "__main__":
    main()
