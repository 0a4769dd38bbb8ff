"""Bucketed gradient reduction: overlappable voxel-grad all-reduce.

BASELINE's north star calls for the voxel/TF gradient all-reduce to overlap
with the backward march.  A single end-of-backward ``psum`` over the whole
grid serializes communication after compute; splitting the volume into z
buckets makes the backward pass emit one independent collective per bucket,
which XLA's latency-hiding scheduler can interleave with the remaining
backward computation (the SPMD analog of bucketed NCCL all-reduce in DDP).

Usage::

    buckets = split_volume(volume, k)
    loss, grads = value_and_grad_bucketed(loss_of_volume, buckets, *args)
    volume_grad = join_volume(grads)

``loss_of_volume`` receives the re-joined (D, H, W, C) array; gradients come
back per bucket.  Equality with the monolithic gradient is asserted in
tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp


def split_volume(volume, num_buckets: int) -> List[jnp.ndarray]:
    """(D, H, W, C) → list of (D/k, H, W, C) z buckets."""
    d = volume.shape[0]
    if d % num_buckets != 0:
        raise ValueError(f"depth {d} not divisible by {num_buckets}")
    size = d // num_buckets
    return [volume[i * size:(i + 1) * size] for i in range(num_buckets)]


def join_volume(buckets: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate(list(buckets), axis=0)


def value_and_grad_bucketed(loss_of_volume: Callable, buckets, *args,
                            **kwargs):
    """``value_and_grad`` of a volume loss with per-bucket gradients.

    Because each bucket is an independent differentiable input, the
    transpose emits an independent (scatter-add +, under SPMD, psum)
    per bucket instead of one fused end-of-graph reduction."""
    def wrapped(bucket_list, *a, **k):
        return loss_of_volume(join_volume(bucket_list), *a, **k)

    return jax.value_and_grad(wrapped)(list(buckets), *args, **kwargs)


def bucketed_train_step(optimizer, loss_of_volume: Callable,
                        num_buckets: int):
    """Build a jittable ``step(volume, opt_state, *args) -> (loss, volume,
    opt_state)`` whose voxel-gradient reduction is bucketed."""
    def step(volume, opt_state, *args):
        buckets = split_volume(volume, num_buckets)
        loss, grads = value_and_grad_bucketed(loss_of_volume, buckets,
                                              *args)
        updates, opt_state = optimizer.update(grads, opt_state, buckets)
        import optax

        new_buckets = optax.apply_updates(buckets, updates)
        return loss, jnp.clip(join_volume(new_buckets), 0.0, 1.0), opt_state

    return step
