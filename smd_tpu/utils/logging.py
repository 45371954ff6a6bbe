"""Metric logging: stdout + TensorBoard.

Parity with reference ``utils/train_utils.py:81-131`` (log_metrics,
report_model) using tf.summary writers directly (TF ships in the image; when
absent the writer degrades to stdout-only).
"""
from __future__ import annotations

import numpy as np
from absl import logging

try:
    import tensorflow as tf
    _HAS_TF = True
except ImportError:  # pragma: no cover
    tf = None
    _HAS_TF = False

__all__ = ["SummaryWriter", "log_metrics", "report_params"]


class SummaryWriter:
    """Minimal scalar/image writer backed by tf.summary when available."""

    def __init__(self, log_dir):
        self._writer = (tf.summary.create_file_writer(str(log_dir))
                        if _HAS_TF else None)

    def scalar(self, tag, value, step):
        if self._writer is not None:
            with self._writer.as_default():
                tf.summary.scalar(tag, float(value), step=int(step))

    def image(self, tag, png_bytes, step):
        if self._writer is not None:
            im = tf.image.decode_png(png_bytes, channels=4)
            with self._writer.as_default():
                tf.summary.image(tag, im[None], step=int(step))

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


def log_metrics(metrics, step, total_steps, epoch=None, summary_writer=None,
                verbose=True):
    metrics_str = ""
    for metric, value in metrics.items():
        if metric == "lr":
            metrics_str += "{} {:5.4f} | ".format(metric, value)
        else:
            metrics_str += "{} {:5.2f} | ".format(metric, value)
        if summary_writer is not None:
            writer_step = step if epoch is None else total_steps * epoch + step
            summary_writer.scalar(metric, value, writer_step)

    epoch_str = "| epoch {:3d} ".format(epoch) if epoch is not None else ""
    if verbose:
        logging.info("%s| %5d/%5d steps | %s", epoch_str, step, total_steps,
                     metrics_str)


def log_sampling_metrics(ld_metrics, step, output_dir, verbose=False):
    """Per-noise-level sampling statistics to their own TB dir.

    Parity with the reference's ``log_langevin_dynamics``
    (``train_ncsn.py:166-184``): each sigma level gets slope/step/alpha/noise
    scalars under ``sampling_epoch{step}``.
    """
    from smd_tpu.diffusion.samplers import collate_sampling_metrics
    collated = collate_sampling_metrics(ld_metrics)
    if not collated:
        return
    writer = SummaryWriter(f"{output_dir}/sampling_epoch{step}")
    for i, sigma_metrics in enumerate(collated):
        for j, metric in enumerate(sigma_metrics):
            log_metrics(metric, j, len(sigma_metrics), epoch=i,
                        summary_writer=writer, verbose=verbose)
    writer.flush()


def report_params(params):
    """Log parameter count and memory footprint."""
    import jax
    leaves = jax.tree_util.tree_leaves(params)
    n = int(np.sum([p.size for p in leaves]))
    footprint = int(np.sum([p.size * p.dtype.itemsize for p in leaves]))
    logging.info("Number of trainable parameters: {:,}".format(n))
    logging.info("Memory footprint: %dMB", footprint / 2**20)
    return n, footprint
