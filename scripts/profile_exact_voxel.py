"""Stage breakdown of voxelize_mean_fm_exact on the real TPU — where do
the 1.31 ms go (round-3 VERDICT weak #4 / next-round item 3)?

Times, with the bench.py on-device-loop methodology, a ladder of
progressively truncated variants of the exact path plus the fixed-point
headline path for reference:

  key        key computation + in-range mask only
  sort1      the ROUND-3 exact form's first sort (key + F f32 columns)
  sort1_fm   the fixed-point sort1 (key + ceil(F/2) packed int32)
  sort1_q    the CURRENT exact form's sort1 (key + F int32 q25 columns)
  scan       + the round-3 segmented f32 inclusive scan (historical)
  cumsum     (the fm path's plain int32 cumsums at the same operand count)
  limbs      sort1_q + two-limb split + 2F plain int32 cumsums (current)
  full       the complete exact voxelizer (current two-limb form)
  full_fm    the complete fixed-point voxelizer

Also captures a jax.profiler xplane trace of the full exact path; feed
the printed path to scripts/xplane_report.py for the per-op view.

Run: python scripts/profile_exact_voxel.py
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = (432, 496, 1)
MAXV = 16000
N = 120_000
REPS = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from d3d_tpu.ops.voxel import voxelize_mean_fm, voxelize_mean_fm_exact
    from d3d_tpu.ops.voxel import _segmented_op

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    rng = np.random.default_rng(42)
    pts = np.stack([
        rng.random(N) * 69.12,
        rng.random(N) * 79.36 - 39.68,
        rng.random(N) * 4.0 - 3.0,
        rng.random(N),
    ], axis=1).astype(np.float32)
    pts_fm = jnp.asarray(np.ascontiguousarray(pts.T))
    bounds = jnp.asarray([0.0, 69.12, -39.68, 39.68, -3.0, 1.0], jnp.float32)

    b = bounds.reshape(3, 2)
    sh = jnp.asarray(SHAPE, jnp.int32)
    vsize = (b[:, 1] - b[:, 0]) / sh
    max_key = SHAPE[0] * SHAPE[1] * SHAPE[2]

    def keys_of(points_fm):
        scaled = (points_fm[:3] - b[:, 0:1]) / vsize[:, None]
        idx = jnp.trunc(jnp.clip(scaled, -2e9, 2e9)).astype(jnp.int32)
        inr = jnp.all((idx >= 0) & (idx < sh[:, None]), axis=0)
        key = (idx[0] * SHAPE[1] + idx[1]) * SHAPE[2] + idx[2]
        key = jnp.where(inr, key, max_key + 1).astype(jnp.int32)
        frac = scaled - idx.astype(scaled.dtype)
        return key, frac

    def stage_key(points_fm):
        key, frac = keys_of(points_fm)
        return key + frac[0].astype(jnp.int32)

    def stage_sort1(points_fm):
        key, frac = keys_of(points_fm)
        cols = jnp.concatenate([frac, points_fm[3:]], axis=0)
        out = lax.sort((key,) + tuple(cols[i] for i in range(4)), num_keys=1,
                       is_stable=False)
        return out[0] + out[1].astype(jnp.int32)

    def stage_sort1_fm(points_fm):
        key, frac = keys_of(points_fm)
        q = jnp.round(frac * 16384.0).astype(jnp.int32) + 16384
        extra = jnp.round(points_fm[3:] * 16384.0).astype(jnp.int32) + 16384
        qcols = jnp.concatenate([q, extra], axis=0)
        packed = (qcols[0] * 32768 + qcols[1], qcols[2] * 32768 + qcols[3])
        out = lax.sort((key,) + packed, num_keys=1, is_stable=False)
        return out[0] + out[1]

    def stage_scan(points_fm):
        key, frac = keys_of(points_fm)
        cols = jnp.concatenate([frac, points_fm[3:]], axis=0)
        sres = lax.sort((key,) + tuple(cols[i] for i in range(4)), num_keys=1,
                        is_stable=False)
        k_s = sres[0]
        cols_s = jnp.stack(sres[1:], axis=0)
        newseg = jnp.concatenate([jnp.ones((1,), bool), k_s[1:] != k_s[:-1]])
        valid_s = k_s <= max_key
        vals = jnp.where(valid_s[None, :], cols_s, 0.0)
        flags = jnp.broadcast_to(newseg[None, :], vals.shape)
        segsum = jax.lax.associative_scan(
            _segmented_op(jnp.add), (vals, flags), axis=1)[0]
        return k_s + segsum[0].astype(jnp.int32)

    def stage_cumsum(points_fm):
        key, frac = keys_of(points_fm)
        cols = jnp.concatenate([frac, points_fm[3:]], axis=0)
        sres = lax.sort((key,) + tuple(cols[i] for i in range(4)), num_keys=1,
                        is_stable=False)
        k_s = sres[0]
        qcols = [jnp.round(c * 16384.0).astype(jnp.int32) for c in sres[1:]]
        csums = [jnp.cumsum(c) for c in qcols]
        return k_s + csums[0] + csums[1] + csums[2] + csums[3]

    def stage_sort1_q(points_fm):
        key, frac = keys_of(points_fm)
        q = jnp.round(frac * 2.0 ** 24).astype(jnp.int32)
        extra = jnp.round(points_fm[3:] * 2.0 ** 24).astype(jnp.int32)
        qcols = jnp.concatenate([q, extra], axis=0)
        out = lax.sort((key,) + tuple(qcols[i] for i in range(4)),
                       num_keys=1, is_stable=False)
        return out[0] + out[1]

    def stage_limbs(points_fm):
        key, frac = keys_of(points_fm)
        q = jnp.round(frac * 2.0 ** 24).astype(jnp.int32)
        extra = jnp.round(points_fm[3:] * 2.0 ** 24).astype(jnp.int32)
        qcols = jnp.concatenate([q, extra], axis=0)
        out = lax.sort((key,) + tuple(qcols[i] for i in range(4)),
                       num_keys=1, is_stable=False)
        k_s = out[0]
        qv = jnp.stack(out[1:], axis=0)
        limbs = jnp.concatenate([qv >> 12, qv & 4095], axis=0)
        csum = jnp.cumsum(limbs, axis=1)
        return k_s + jnp.sum(csum[:, -1])

    def stage_full(points_fm):
        out = voxelize_mean_fm_exact(points_fm, SHAPE, bounds, MAXV)
        return (jnp.sum(out.aggregates[0, :8]).astype(jnp.int32)
                + out.nvoxels)

    def stage_full_fm(points_fm):
        out = voxelize_mean_fm(points_fm, SHAPE, bounds, MAXV)
        return (jnp.sum(out.aggregates[0, :8]).astype(jnp.int32)
                + out.nvoxels)

    stages = [
        ("key", stage_key),
        ("sort1", stage_sort1),
        ("sort1_fm", stage_sort1_fm),
        ("sort1_q", stage_sort1_q),
        ("scan", stage_scan),
        ("cumsum", stage_cumsum),
        ("limbs", stage_limbs),
        ("full", stage_full),
        ("full_fm", stage_full_fm),
    ]

    def timed(fn):
        @jax.jit
        def loop(p):
            def body(_, carry):
                chk, = carry
                r = fn(p + chk.astype(p.dtype) * 1e-20)
                out = jnp.sum(r[..., :1]) if r.ndim else r
                # scalar stages can return i64 under jax_enable_x64; the
                # carry must match the i32 init either way
                return (out.astype(jnp.int32),)

            return lax.fori_loop(0, REPS, body, (jnp.int32(0),))

        perturb = jax.jit(lambda p, e: p + e)
        copies = [jax.block_until_ready(perturb(pts_fm, jnp.float32(i) * 1e-6))
                  for i in range(4)]

        def run(p):
            return int(np.asarray(loop(p)[0]))

        run(copies[3])
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            run(copies[i])
            ts.append(time.perf_counter() - t0)

        trivial = jax.jit(lambda x: x + 1)
        int(np.asarray(trivial(copies[0])[0, 0]))
        rtts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(np.asarray(trivial(copies[i])[0, 0]))
            rtts.append(time.perf_counter() - t0)
        med, rtt = float(np.median(ts)), min(rtts)
        return max(med - rtt, 0.5 * med) / REPS * 1e3

    results = {}
    for name, fn in stages:
        results[name] = timed(fn)
        print(f"{name:10s} {results[name]:8.4f} ms", flush=True)

    print("\ndeltas:", flush=True)
    print(f"  sort1 - key        = {results['sort1'] - results['key']:.4f} ms"
          f"   (fm: {results['sort1_fm'] - results['key']:.4f}, "
          f"q25: {results['sort1_q'] - results['key']:.4f})")
    print(f"  scan  - sort1      = {results['scan'] - results['sort1']:.4f} ms"
          f"   (plain int32 cumsums: "
          f"{results['cumsum'] - results['sort1']:.4f}, "
          f"two-limb cumsums: {results['limbs'] - results['sort1_q']:.4f})")
    print(f"  rest (sort2+final) = {results['full'] - results['limbs']:.4f} "
          f"ms")
    print(f"  full exact / fm    = {results['full']:.4f} / "
          f"{results['full_fm']:.4f} ms")

    # xplane trace of the full exact path
    trace_dir = "/tmp/jaxtrace_exact_voxel"
    os.system(f"rm -rf {trace_dir}")
    loop_full = jax.jit(lambda p: lax.fori_loop(
        0, REPS, lambda _, c: (stage_full(p + c[0].astype(
            jnp.float32) * 1e-20).astype(jnp.int32),), (jnp.int32(0),)))
    loop_full(pts_fm)  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        int(np.asarray(loop_full(pts_fm)[0]))
    pbs = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    print("\ntrace:", pbs[-1] if pbs else "none")
    print(f"per-op view: python scripts/xplane_report.py {pbs[-1]} {REPS}"
          if pbs else "")


if __name__ == "__main__":
    main()
