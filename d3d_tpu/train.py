"""Training orchestration: the loop that ties the framework together.

The reference is a devkit — users hand-roll their training loops around
it. d3d_tpu ships the TPU-native loop as a component: host data iterator
-> (optional) device batch-prep (augmentation / target assignment, the
parameter-independent work measured to dominate naive steps — see
models.pointpillars.prepare_targets) -> sharded jitted train step ->
async orbax checkpointing -> periodic metric fetch.

Prefetching exploits JAX's async dispatch: the next batch's host->device
transfer and prep program are dispatched BEFORE the current step's
metrics are fetched, so input-pipeline work overlaps device compute
without threads. Everything is pure-functional state threading —
restart-safe and identical under resume (tested).
"""

import queue
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["Trainer", "prefetch", "batch_frames",
           "shard_frames_across_hosts", "ema_init", "ema_update",
           "make_optimizer", "init_variables", "repeat_batch_step"]


def init_variables(model, rng, *args, **kwargs):
    """``model.init`` pinned to the host CPU, then transferred.

    With the package's global ``jax_enable_x64``, initializer RNG
    programs (``jax.random.truncated_normal`` inside ``lecun_normal``)
    contain an s64 ``nextafter`` that the TPU backend's x64-rewrite pass
    cannot compile ("While rewriting computation to not contain X64
    element types ... not implemented: nextafter"). Initialization is a
    one-off host-side task anyway — run it on CPU and ``device_put`` the
    f32 leaves to the default device.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(rng, *args, **kwargs)
    if jax.default_backend() == "cpu":
        return variables
    return jax.device_put(variables, jax.devices()[0])


def make_optimizer(total_steps, base_lr=1e-3, schedule="onecycle",
                   warmup_frac=0.4, clip_norm=10.0, weight_decay=0.01,
                   accumulate=1):
    """The standard lidar-detection training recipe as one optax chain:
    AdamW + one-cycle LR (SECOND/CenterPoint train with Adam one-cycle;
    OpenPCDet's ``adam_onecycle`` default) + global-norm gradient
    clipping, optionally wrapped in ``optax.MultiSteps`` for gradient
    accumulation (an effective batch ``accumulate``x the per-step batch
    on the same HBM — the TPU-native big-batch knob when the canvas
    won't shard further).

    :param schedule: ``"onecycle"`` (cosine ramp to ``base_lr`` at
        ``warmup_frac`` of training, cosine decay after), ``"cosine"``
        (decay-only) or ``"constant"``
    :param accumulate: microbatches per optimizer update; the returned
        optimizer's update only applies every ``accumulate``-th step
        (gradients average in between). ``total_steps`` stays counted in
        TRAINING steps: the inner schedule runs over
        ``total_steps // accumulate`` optimizer updates (MultiSteps only
        advances it on applied updates), and the returned lr schedule is
        training-step-indexed either way.
    :returns: ``(optimizer, lr_schedule)`` — the schedule is returned so
        metrics can log the current LR
    """
    import optax

    upd_steps = max(total_steps // max(accumulate, 1), 1)
    if schedule == "onecycle":
        lr = optax.cosine_onecycle_schedule(
            transition_steps=upd_steps, peak_value=base_lr,
            pct_start=warmup_frac, div_factor=10.0,
            final_div_factor=100.0)
    elif schedule == "cosine":
        lr = optax.cosine_decay_schedule(base_lr, upd_steps)
    elif schedule == "constant":
        lr = optax.constant_schedule(base_lr)
    else:
        raise ValueError("unknown schedule %r" % (schedule,))
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, weight_decay=weight_decay),
    )
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
        return tx, (lambda step: lr(step // accumulate))
    return tx, lr


def ema_init(params):
    """Start an exponential moving average of the parameters (a device
    copy). Serve/evaluate with the EMA weights — the standard trick for
    detector training stability (pairs with ``models.fold`` BN folding
    at export time)."""
    return jax.tree.map(jnp.asarray, params)


@jax.jit
def _ema_update(ema, params, decay, step):
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)


def ema_update(ema, params, decay=0.999, step=None):
    """One EMA step: ``ema = d * ema + (1 - d) * params`` with the
    TF-style warmup ``d = min(decay, (1 + step) / (10 + step))`` (early
    steps track the live weights instead of the random init; pass
    ``step=None`` for the plain fixed-decay update). One jitted program
    regardless of the Python step value — feed it right after each train
    step and it overlaps like any other dispatched device work."""
    step = jnp.float32(1e9 if step is None else step)
    return _ema_update(ema, params, jnp.float32(decay), step)


def repeat_batch_step(step, repeat, batch_argnum=3):
    """Wrap a train step so the batch is tiled ``repeat``x along its
    leading axis inside the jitted program.

    Why this exists: XLA:TPU *space-to-batches* convolutions whose batch
    is smaller than the 8-row sublane tile — the 2D grid is sliced into
    halo'd width tiles that fake a batch of 32, and the halo/mask glue
    can dominate the step. Measured on one v5e chip at KITTI-scale
    PointPillars (bf16, external targets): batch 4 compiles to a
    *slower absolute* program than batch 8 (179.0 vs 148.9 ms/step —
    the b4 device trace is ~33% layout copies / halo glue, e.g.
    ``bf16[432,4,8,62,64]`` space-to-batch shapes), while batch 8 tiles
    the native ``T(8,128)`` layout directly.

    Duplicating the batch is *exact*, not an approximation: every loss
    in the package normalizes by a batch-proportional count (sum/npos),
    so gradients are identical, and BatchNorm means/variances over a
    duplicated batch equal the originals. The only cost is activation
    memory (``repeat``x) and the only difference is float reduction
    order. It pays exactly when the native-batch program is slower in
    *absolute* time than the tiled one — measured true at batch 4
    (``repeat=2`` runs the b4 update through the b8 program at +20%
    throughput, identical update) but false at batch 2 (paying the full
    b8 program for 2 real frames loses to the native b2 program), so
    measure before tiling batches below half the sublane count.

    :param batch_argnum: positional index of the batch pytree in
        ``step``'s signature (3 for every family's
        ``step(params, batch_stats, opt_state, batch)``).
    """
    if repeat == 1:
        return step

    def tiled(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return x
        return jnp.concatenate([x] * repeat, axis=0)

    def wrapped(*args):
        args = list(args)
        args[batch_argnum] = jax.tree.map(tiled, args[batch_argnum])
        return step(*args)

    return wrapped


def prefetch(iterable, depth=2):
    """Run an iterator in a background thread with a bounded queue.

    Host-side frame loading / augmentation / pillarization (the
    ``batch_frames`` pipeline) overlaps device steps this way even though
    the Trainer's device-side prep already overlaps via async dispatch —
    disk reads and numpy work would otherwise serialize with the train
    loop. Exceptions propagate to the consumer; the worker dies with the
    process (daemon).
    """
    q = queue.Queue(maxsize=max(depth, 1))
    END = object()
    stop = threading.Event()

    def put(item):
        # bounded put that aborts when the consumer went away — otherwise
        # an early `break` leaves the worker blocked forever, pinning the
        # source iterator (open files, buffers) for the process lifetime
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not put(("item", item)):
                    return
        except BaseException as e:  # propagate into the consuming thread
            put(("error", e))
            return
        put(("end", END))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            kind, payload = q.get()
            if kind == "error":
                raise payload
            if kind == "end":
                return
            yield payload
    finally:
        stop.set()


def shard_frames_across_hosts(frames, index=None, count=None):
    """Strided multi-host split of a frame stream: host ``index`` yields
    items index, index+count, index+2*count, … — the data-parallel-over-
    DCN loading convention (every host reads only its own slice, then
    feeds its local dp shard of the global mesh; see
    :mod:`d3d_tpu.parallel.distributed`).

    Defaults come from the live ``jax.distributed`` job
    (:func:`d3d_tpu.parallel.process_index` / ``process_count``) and
    degrade to the identity split on a single-process run. Pair with
    ``drop_last=True`` batching so every host steps the same number of
    times (a host that runs out first would hang the collectives).
    """
    if index is None or count is None:
        from .parallel import process_count, process_index

        index = process_index() if index is None else index
        count = process_count() if count is None else count
    for i, frame in enumerate(frames):
        if i % count == index:
            yield frame


def batch_frames(frames, batch_size, collate=None, drop_last=True):
    """Group per-frame pytrees into stacked batches.

    :param frames: iterable of per-frame dicts of arrays
    :param collate: leaf-stacking function (default np.stack)
    """
    stack = collate or (lambda leaves: np.stack([np.asarray(x)
                                                 for x in leaves]))
    buf = []
    for frame in frames:
        buf.append(frame)
        if len(buf) == batch_size:
            yield jax.tree.map(lambda *xs: stack(xs), *buf)
            buf = []
    if buf and not drop_last:
        yield jax.tree.map(lambda *xs: stack(xs), *buf)


class Trainer:
    """Generic training-loop driver.

    :param step_fn: jitted ``(params, batch_stats, opt_state, batch) ->
        (params, batch_stats, opt_state, metrics)`` — e.g. from
        ``make_train_step`` (+ ``shard_train_step`` for a mesh)
    :param prep_fn: optional jitted ``batch -> batch`` device-side prep
        (augmentation, ``prepare_targets``); run on the NEXT batch while
        the current step executes
    :param checkpointer: optional :class:`d3d_tpu.checkpoint.TrainCheckpointer`
    :param log_every: fetch + record metrics every N steps (fetching
        blocks on the device, so this sets the sync cadence)
    :param ckpt_every: save every N steps (async)
    :param eval_fn: optional ``(step, params, batch_stats) -> dict`` run
        every ``eval_every`` steps (e.g. a validation mAP via
        ``benchmarks_device``); results append to ``history`` under
        ``eval`` and go through ``log_fn``
    """

    def __init__(self, step_fn, prep_fn=None, checkpointer=None,
                 log_every=50, ckpt_every=1000, log_fn=print,
                 eval_fn=None, eval_every=0):
        self.step_fn = step_fn
        self.prep_fn = prep_fn
        self.ckpt = checkpointer
        self.log_every = log_every
        self.ckpt_every = ckpt_every
        self.log_fn = log_fn
        self.eval_fn = eval_fn
        self.eval_every = eval_every
        self.history = []

    def restore_or(self, params, batch_stats, opt_state):
        """Resume from the latest checkpoint if one exists."""
        start = 0
        if self.ckpt is not None:
            state = self.ckpt.restore(like=(params, batch_stats, opt_state))
            if state is not None:
                params = state["params"]
                batch_stats = state["batch_stats"]
                opt_state = state["opt_state"]
                start = int(self.ckpt.latest_step)
        return start, params, batch_stats, opt_state

    def run(self, params, batch_stats, opt_state, batches, num_steps=None,
            start_step=0):
        """Run the loop over ``batches`` (an iterator of host batches).

        :returns: (step, params, batch_stats, opt_state)
        """
        it = iter(batches)
        prep = self.prep_fn or (lambda b: b)
        step = start_step
        if num_steps is not None and num_steps <= 0:
            return step, params, batch_stats, opt_state
        try:
            nxt = prep(next(it))  # dispatch first prep
        except StopIteration:
            return step, params, batch_stats, opt_state

        t0 = time.perf_counter()
        last_log_step = step
        while num_steps is None or step < start_step + num_steps:
            batch = nxt
            # dispatch the NEXT batch's prep before fetching anything —
            # it overlaps the step below on device. Don't prefetch past the
            # last step: a persistent iterator would silently lose a batch.
            last = num_steps is not None and step + 1 >= start_step + num_steps
            if last:
                nxt = None
            else:
                try:
                    nxt = prep(next(it))
                except StopIteration:
                    nxt = None
            params, batch_stats, opt_state, metrics = self.step_fn(
                params, batch_stats, opt_state, batch)
            step += 1

            if self.log_every and step % self.log_every == 0:
                vals = {k: float(np.asarray(v)) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                rate = (step - last_log_step) / max(dt, 1e-9)
                last_log_step = step
                self.history.append(dict(step=step, **vals))
                self.log_fn(f"step {step}: " + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(vals.items()))
                    + f" ({rate:.2f} steps/s)")
            if (self.eval_fn is not None and self.eval_every
                    and step % self.eval_every == 0):
                result = self.eval_fn(step, params, batch_stats)
                self.history.append(dict(step=step, eval=result))
                self.log_fn(f"eval @ {step}: {result}")
            if (self.ckpt is not None and self.ckpt_every
                    and step % self.ckpt_every == 0):
                self.ckpt.save(step, params, batch_stats, opt_state)
            if nxt is None:
                break

        if self.ckpt is not None:
            # orbax raises StepAlreadyExists even with force=True — skip if
            # the periodic save already covered the final step
            if self.ckpt.latest_step != step:
                self.ckpt.save(step, params, batch_stats, opt_state,
                               force=True)
            self.ckpt.wait()
        return step, params, batch_stats, opt_state
