"""Shared dispatch for broadcast-probe stages (decontam, LM scoring,
boilerplate removal): per-batch work against one ``ray.put``-broadcast
numpy state.

Two execution shapes, auto-selected (the ``ann_topk`` precedent,
measured there at 3.7s → ~1s on the sf0.1 bench):

- STATELESS TASKS when the state is small (default < 8 MiB): the
  object ref rides ``fn_kwargs`` and each task calls ``ray.get`` —
  plasma-local and zero-copy for numpy after the first touch on a
  node, and the Ray worker pool is reused, so there is NO actor-pool
  ramp (the dominant cost of these stages on small inputs: the pool
  spins up to 8 fresh processes for seconds of work).
- ACTOR POOL when the state is big enough that per-task handling
  would hurt, or when the caller passes an explicit ``concurrency``
  — the broadcast-once-per-actor shape the 100-TB brief prescribes.
"""

from __future__ import annotations

import ray

_SMALL_STATE_BYTES = 8 << 20


def broadcast_map_batches(
    ds: ray.data.Dataset,
    actor_cls,
    state_key: str,
    state_obj,
    state_bytes: int,
    concurrency,
    **ctor_kwargs,
):
    """Run ``actor_cls`` over ``ds`` with ``state_key=ray.put(state)``
    in its constructor kwargs — as stateless tasks (a fresh instance
    per batch; cheap because the state get is plasma-local) when the
    state is small and ``concurrency`` is None, else as an
    autoscaling actor pool."""
    ref = ray.put(state_obj)
    kwargs = dict(ctor_kwargs)
    kwargs[state_key] = ref
    if concurrency is None and state_bytes < _SMALL_STATE_BYTES:

        def task_fn(batch, **kw):
            return actor_cls(**kw)(batch)

        return ds.map_batches(
            task_fn,
            fn_kwargs=kwargs,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds.map_batches(
        actor_cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or (1, 8),
        num_cpus=1,
    )
