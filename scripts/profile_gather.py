"""Quantify gather strategies on TPU to pick the traversal design."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:44s} {dt*1000:9.2f} ms")
    return dt


def main():
    R = 1 << 20
    rs = np.random.RandomState(0)

    for N in (32, 1024, 32768, 262144):
        tab = jnp.asarray(rs.rand(N, 8), jnp.float32)
        idx = jnp.asarray(rs.randint(0, N, R), jnp.int32)
        bench(f"gather (N={N},8) one op", jax.jit(lambda t, i: t[i].sum()), tab, idx)

    # One-hot matmul gather (MXU) for small tables.
    N = 32
    tab = jnp.asarray(rs.rand(N, 8), jnp.float32)
    idx = jnp.asarray(rs.randint(0, N, R), jnp.int32)

    def onehot_gather(t, i):
        oh = jax.nn.one_hot(i, N, dtype=jnp.float32)
        return (oh @ t).sum()

    bench("one-hot matmul gather (N=32,8)", jax.jit(onehot_gather), tab, idx)

    # Brute-force intersection throughput: R rays x T triangles dense.
    from imbatracer_tpu.render.intersect import brute_force_closest_hit

    for T in (36, 512):
        v0 = jnp.asarray(rs.rand(T, 3) * 4 - 2, jnp.float32)
        e1 = jnp.asarray(rs.rand(T, 3) - 0.5, jnp.float32)
        e2 = jnp.asarray(rs.rand(T, 3) - 0.5, jnp.float32)
        org = jnp.asarray(rs.rand(R, 3) * 4 - 2, jnp.float32)
        d = jnp.asarray(rs.randn(R, 3), jnp.float32)
        f = jax.jit(lambda o, dd: brute_force_closest_hit(o, dd, v0, e1, e2, chunk=min(T, 512))[0].sum())
        dt = bench(f"brute force {T} tris x 1M rays", f, org, d, n=5)
        print(f"   -> {R/dt/1e6:.0f} Mrays/s, {R*T/dt/1e9:.1f} Gtests/s")

    # Transposed brute force: coordinates as separate (R,) arrays, scan over
    # triangles as python loop of scalar-broadcast ops (fully lane-parallel).
    T = 36
    tv = rs.rand(T, 9).astype(np.float32)
    ox, oy, oz = (jnp.asarray(rs.rand(R), jnp.float32) for _ in range(3))
    dx, dy, dz = (jnp.asarray(rs.randn(R), jnp.float32) for _ in range(3))

    def brute_t(ox, oy, oz, dx, dy, dz):
        best = jnp.full_like(ox, 1e30)
        for t in range(T):
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = [float(x) for x in tv[t]]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 0) & (tt < best)
            best = jnp.where(ok, tt, best)
        return best.sum()

    dt = bench("transposed brute 36 tris x 1M rays", jax.jit(brute_t), ox, oy, oz, dx, dy, dz, n=5)
    print(f"   -> {R/dt/1e6:.0f} Mrays/s")


if __name__ == "__main__":
    main()
