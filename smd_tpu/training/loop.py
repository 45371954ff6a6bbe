"""Generic training loop shared by the diffusion and MDN harnesses.

One loop implements the reference's two nearly-identical epoch loops
(``train_ncsn.py:291-496``, ``train_mdn.py:224-321``): logging cadence,
snapshot eval, Orbax checkpoint + resume, early stopping, max-steps cutoff.
The model-specific pieces (state construction, jitted train/eval steps,
snapshot sampling) are injected.
"""
from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from smd_tpu.parallel import mesh as mesh_lib
from smd_tpu.training.state import EarlyStopping
from smd_tpu.utils import checkpoints as ckpt_lib
from smd_tpu.utils import logging as log_lib

__all__ = ["evaluate", "run_loop", "device_prefetch"]


def device_prefetch(iterator, mesh=None, size: int = 2):
    """Keep ``size`` batches in flight on device ahead of compute.

    Host->device copies dispatch asynchronously, so transferring the next
    batch while the current step runs hides the PCIe/ICI transfer entirely
    (the reference fed numpy batches synchronously via tfds.as_numpy).
    """
    import collections

    import numpy as np

    queue = collections.deque()

    def put(batch):
        batch = np.asarray(batch)
        if mesh is not None:
            return mesh_lib.shard_batch(batch, mesh)
        return jax.device_put(batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def evaluate(eval_step, params, dataset: Iterable, rng=None):
    """Mean per-example loss over a dataset; eval_step returns a summed loss."""
    count, total = 0, 0.0
    for batch in dataset:
        batch = jnp.asarray(batch)
        if rng is not None:
            rng, eval_rng = jax.random.split(rng)
            total += float(eval_step(params, batch, eval_rng))
        else:
            total += float(eval_step(params, batch))
        count += batch.shape[0]
    return {"loss": total / max(count, 1)}


def run_loop(state,
             train_step: Callable,
             eval_step: Callable,
             train_data: Callable[[], Iterable],
             eval_data: Callable[[], Iterable],
             config,
             model_dir: Optional[str] = None,
             mesh=None,
             rng=None,
             needs_rng: bool = True,
             snapshot_callback: Optional[Callable] = None,
             train_chunk: Optional[Callable] = None):
    """Run the epoch/step loop; returns the final state.

    ``train_step(state, batch[, rng]) -> (state, metrics)``;
    ``eval_step(params, batch[, rng]) -> summed loss``.

    When ``train_chunk`` is given and ``config.scan_chunk > 1``, up to K
    step-batches are stacked and dispatched as ONE scanned program
    (``train_chunk(state, (K, batch, ...)[, rng]) -> (state, (K,)-metrics)``)
    — the dispatch-amortization path for remote/tunneled accelerators.
    Chunks are clamped so snapshot / checkpoint / max-step boundaries land
    exactly where the per-step loop puts them; logging coarsens to chunk
    granularity (the row logged is the boundary-crossing step's). Per-step
    RNG differs from the unchunked path (K keys split at once per chunk vs
    one split per step) — same distribution, different streams.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if getattr(config, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    profile_steps = getattr(config, "profile_steps", 0)
    profile_start = getattr(config, "profile_start_step", 10)
    profiling = False
    early_stop = EarlyStopping(patience=1)
    manager = train_writer = eval_writer = None
    if model_dir is not None:
        # Orbax save/restore are collectives: every process participates.
        manager = ckpt_lib.CheckpointManager(f"{model_dir}/ckpt",
                                             keep=config.checkpoints_to_keep)
        if config.resume and manager.latest_step is not None:
            state = manager.restore_latest(state)
        if jax.process_index() == 0:   # TB logs are host-0-only
            train_writer = log_lib.SummaryWriter(f"{model_dir}/train")
            eval_writer = log_lib.SummaryWriter(f"{model_dir}/eval")

    global_step = int(state.step)
    sampling_step = -1
    stop = False
    scan_chunk = getattr(config, "scan_chunk", 1)
    use_chunk = train_chunk is not None and scan_chunk > 1

    def handle_profiler(state):
        nonlocal profiling
        if profile_steps <= 0 or model_dir is None:
            return
        if global_step >= profile_start and \
                global_step < profile_start + profile_steps and not profiling:
            jax.profiler.start_trace(f"{model_dir}/profile")
            profiling = True
        elif profiling and global_step >= profile_start + profile_steps:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            profiling = False

    def log_train(metrics, step_in_epoch, start_time):
        elapsed = time.time() - start_time
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["batch/s"] = (step_in_epoch + 1) / elapsed
        metrics["ms/batch"] = elapsed * 1000 / (step_in_epoch + 1)
        log_lib.log_metrics(metrics, global_step, config.max_steps or -1,
                            epoch=None, summary_writer=train_writer,
                            verbose=config.verbose)

    def snapshot_or_end():
        """Eval + checkpoint + early-stop bookkeeping; returns stop."""
        nonlocal sampling_step, rng, early_stop
        at_snapshot = (global_step % config.snapshot_freq == 0
                       and global_step > 0)
        at_end = (config.max_steps is not None
                  and global_step >= config.max_steps)
        if at_snapshot or at_end:
            sampling_step += 1
            if needs_rng:
                rng, eval_rng = jax.random.split(rng)
            else:
                eval_rng = None
            eval_metrics = evaluate(eval_step, state.params, eval_data(),
                                    eval_rng)
            log_lib.log_metrics(eval_metrics, global_step,
                                config.max_steps or -1,
                                summary_writer=eval_writer,
                                verbose=config.verbose)
            improved, early_stop = early_stop.update(eval_metrics["loss"])

            if manager is not None and config.save_ckpt and \
                    (not config.early_stopping or improved):
                manager.save(global_step, state)

            if snapshot_callback is not None:
                snapshot_callback(state, eval_metrics, sampling_step)

            if config.early_stopping and early_stop.should_stop:
                return True
        return at_end

    for epoch in range(config.epochs):
        if stop:
            break
        start_time = time.time()
        if use_chunk:
            import itertools

            import numpy as np

            it = iter(train_data())
            step_in_epoch = 0
            while not stop:
                if config.max_steps is not None and \
                        global_step >= config.max_steps:
                    stop = True   # e.g. resumed from a completed run
                    break
                # Clamp the chunk so snapshot / max-step boundaries land
                # exactly where the per-step loop puts them.
                k = min(scan_chunk,
                        config.snapshot_freq -
                        (global_step % config.snapshot_freq))
                if config.max_steps is not None:
                    k = min(k, config.max_steps - global_step)
                k = max(k, 1)
                host_batches = [np.asarray(b)
                                for b in itertools.islice(it, k)]
                if not host_batches:
                    break   # epoch exhausted
                stacked = np.stack(host_batches)
                if mesh is not None:
                    stacked = mesh_lib.shard_chunk(stacked, mesh)
                handle_profiler(state)
                if needs_rng:
                    rng, step_rng = jax.random.split(rng)
                    state, metrics_k = train_chunk(state, stacked, step_rng)
                else:
                    state, metrics_k = train_chunk(state, stacked)
                prev_step = global_step
                global_step += len(host_batches)
                step_in_epoch += len(host_batches)

                crossed_log = (prev_step // config.logging_freq !=
                               global_step // config.logging_freq)
                if prev_step == 0 or crossed_log:
                    log_train({k2: v[-1] for k2, v in metrics_k.items()},
                              step_in_epoch - 1, start_time)
                stop = snapshot_or_end()
        else:
            for step, batch in enumerate(device_prefetch(train_data(), mesh)):
                if config.max_steps is not None and \
                        global_step >= config.max_steps:
                    stop = True   # e.g. resumed from a completed run
                    break
                handle_profiler(state)
                if needs_rng:
                    rng, step_rng = jax.random.split(rng)
                    state, metrics = train_step(state, batch, step_rng)
                else:
                    state, metrics = train_step(state, batch)
                global_step += 1

                if step % config.logging_freq == 0:
                    log_train(metrics, step, start_time)

                stop = snapshot_or_end()
                if stop:
                    break

    if profiling:
        jax.profiler.stop_trace()
    if manager is not None:
        if manager.latest_step != global_step:
            manager.save(global_step, state, force=True)
        manager.wait()
        manager.close()
    return state
