"""Ray Data execution-context tuning shared by all entry points.

Ray's default ``read_op_min_num_blocks = 200`` shatters small/medium inputs
into ~1 MB blocks; a sort-based shuffle over B input blocks then moves
O(B^2) tiny objects through the object store, which dominated the CDC replay
wall time 10:1 in profiling (208 blocks: 44.7s; 32 blocks: 4.5s for the
identical pipeline). We floor block count at the CPU count instead — large
inputs are still split by ``target_max_block_size`` (128 MiB), so at 100 TB
the block count is bytes/128MiB and this knob is inert.

Call :func:`tune_data_context` once after ``ray.init`` (or at import when the
driver owns the session).
"""

from __future__ import annotations

import ray
from ray.data.context import DataContext


def tune_data_context(cpus: int | None = None,
                      progress_bars: bool = False) -> DataContext:
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = progress_bars
    if cpus is None:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
        else:
            cpus = 8
    ctx.read_op_min_num_blocks = max(int(cpus), 8)
    return ctx
