"""Scale-out: multi-stream data parallelism over TPU meshes."""

from dynaboa_tpu.parallel.streams import (
    ParallelStreams,
    make_mesh,
    stack_frames,
    stack_outs,
)

__all__ = ["ParallelStreams", "make_mesh", "stack_frames", "stack_outs"]
