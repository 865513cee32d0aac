"""Multi-device parallelism (SURVEY.md §2.11, configs[4]).

The reference is strictly single-GPU — no DP/TP/PP/SP/EP, no NCCL/MPI
(arXiv 1704.04313 §4, 1808.05488 §VI). The TPU-native extension batches
independent video streams and shards the stream axis over an ICI mesh with
jit/shard_map; XLA collectives replace hand-written communication (none are
needed inside a frame — per-stream work is embarrassingly parallel).
"""

from .streams import (MultiStreamRunner, make_stream_mesh,  # noqa: F401
                      shard_streams)
