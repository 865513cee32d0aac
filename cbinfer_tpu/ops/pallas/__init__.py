"""Pallas (Mosaic) TPU kernels — the native-kernel tier (SURVEY.md §2
native-kernel checklist).

Each of the reference's CUDA kernels maps to a Pallas kernel here:
  C1 change-detect + cache update -> detect.py
  C4+C5+C6 gather->GEMM->scatter  -> delta_conv.py (one fused kernel: scalar-
      prefetched tile ids drive data-dependent HBM->VMEM DMA, MXU matmuls,
      and DMA-scatter into the aliased output cache)
  C7 change-based max pool        -> delta_pool.py

All kernels also run under interpret=True on CPU for CI (SURVEY.md §4).
"""
