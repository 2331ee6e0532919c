"""Subprocess worker for test_distributed_multiprocess.py — runs as one of
N real OS processes wired together with ``jax.distributed``.

Each worker:

  1. initializes the distributed runtime through
     :func:`d3d_tpu.parallel.distributed.initialize` (explicit coordinator,
     the non-degraded path),
  2. builds :func:`make_global_mesh` over the *global* device set and runs
     a dp-sharded linear-regression grad step whose batch rows live on
     different processes — the mean-over-batch gradient forces a
     cross-process (gloo) all-reduce, checked against the analytic
     full-batch gradient,
  3. accumulates this host's DetectionEvaluator stats over its own frames
     and merges them globally with :func:`all_hosts_stats` (the
     ``process_allgather`` + ``merge_stacked_stats`` branch),
  4. saves the merged stat arrays to ``<outdir>/merged_<pid>.npz`` for the
     parent test to compare across hosts and against a single-process
     add_stats oracle.

Not a pytest module (leading underscore): it must configure XLA before jax
initializes, which cannot happen inside the already-initialized suite
process. Usage: python _distributed_worker.py PID NPROC PORT OUTDIR
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_host_stats(evaluator, pid, nframes=3):
    """Deterministic per-host evaluator stats (importable by the parent
    test to compute the merge oracle without spawning)."""
    import numpy as np
    from scipy.spatial.transform import Rotation

    from d3d_tpu.abstraction import ObjectTag, ObjectTarget3D, Target3DArray
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass

    CAR = KittiObjectClass.Car
    rng = np.random.default_rng(100 + pid)
    r = Rotation.from_euler("Z", 0)
    for i in range(nframes):
        base = float(pid * 40 + i * 7)
        gt = Target3DArray([
            ObjectTarget3D([base, 0, 0], r, [2, 2, 2], ObjectTag(CAR)),
            ObjectTarget3D([base + 10, 0, 0], r, [2, 2, 2], ObjectTag(CAR)),
        ], frame="t")
        dt = Target3DArray([
            ObjectTarget3D([base + rng.normal(0, 0.1), 0, 0], r, [2, 2, 2],
                           ObjectTag(CAR, scores=0.9)),
        ], frame="t")
        evaluator.add_stats(evaluator.calc_stats(gt, dt))
    return evaluator.get_stats()


def global_batch(n=8, f=4):
    """The full train batch, identical on every process (seeded)."""
    import numpy as np

    rng = np.random.default_rng(7)
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.normal(size=(n,)).astype(np.float32)
    return x, y


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    outdir = sys.argv[4]

    # 2 virtual CPU devices per process; strip any inherited
    # force_host_platform count (the suite's conftest sets 8)
    flags = [t for t in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in t]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax
    # the sitecustomize's axon plugin force-overrides jax_platforms; win it
    # back AFTER importing jax (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from d3d_tpu.parallel.distributed import (all_hosts_stats, initialize,
                                              make_global_mesh)

    assert initialize(f"localhost:{port}", nproc, pid), \
        "distributed.initialize degraded to single-process"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # --- global mesh + dp-sharded train step -----------------------------
    mesh = make_global_mesh()
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (2, 2), mesh.devices.shape

    xh, yh = global_batch()
    batch_sh = NamedSharding(mesh, P("dp"))
    rep_sh = NamedSharding(mesh, P())
    # each process materializes only its addressable shards of the batch
    x = jax.make_array_from_callback(xh.shape, batch_sh,
                                     lambda idx: xh[idx])
    y = jax.make_array_from_callback(yh.shape, batch_sh,
                                     lambda idx: yh[idx])
    w = jax.device_put(jnp.zeros((4,), jnp.float32), rep_sh)

    @jax.jit
    def step(w, x, y):
        def loss(w):
            return jnp.mean((x @ w - y) ** 2)

        l, g = jax.value_and_grad(loss)(w)
        return l, w - 0.1 * g

    l, w1 = step(w, x, y)
    # analytic full-batch values (computed locally from the seeded batch)
    want_loss = float(np.mean(yh ** 2))
    want_grad = -2.0 * (xh.T @ yh) / len(yh)
    np.testing.assert_allclose(float(l), want_loss, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w1), 0.1 * -want_grad, rtol=1e-5,
                               atol=1e-7)

    # --- multi-host evaluator stat merge ----------------------------------
    from d3d_tpu.benchmarks import DetectionEvaluator
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.parallel import stats_to_arrays

    CAR = KittiObjectClass.Car
    ev = DetectionEvaluator([CAR], [0.3], pr_sample_count=8)
    stats = build_host_stats(ev, pid)
    merged = all_hosts_stats(stats, [CAR.value])
    arrays = {k: np.asarray(v)
              for k, v in stats_to_arrays(merged, [CAR.value]).items()}
    np.savez(os.path.join(outdir, f"merged_{pid}.npz"), **arrays)
    print(f"WORKER {pid} OK", flush=True)


if __name__ == "__main__":
    main()
