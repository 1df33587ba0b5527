"""Double-buffered host->device batch prefetch.

Transfers the next batch to device (with DP sharding) while the current
step computes — keeps the MXU fed when host IO or the PCIe/ICI link is the
bottleneck (BASELINE.json north star: "preprocessing overlaps with GAN step
compute").  Depth 2 = classic double buffering.
"""

from __future__ import annotations

from collections import deque

from vfd_gan_tpu.parallel.mesh import shard_batch


def device_prefetch(iterator, mesh, depth: int = 2):
    """Yield device-resident sharded batches, ``depth`` transfers ahead.

    ``jax.device_put`` is asynchronous: enqueueing the next transfers before
    yielding the current batch overlaps H2D with the consumer's compute.
    """
    queue: deque = deque()
    it = iter(iterator)
    try:
        while len(queue) < depth:
            queue.append(shard_batch(mesh, next(it)))
    except StopIteration:
        pass
    while queue:
        try:
            queue.append(shard_batch(mesh, next(it)))
        except StopIteration:
            pass
        yield queue.popleft()
