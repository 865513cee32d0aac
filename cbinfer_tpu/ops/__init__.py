"""Pipeline stage ops (SURVEY.md C1-C7).

Each op exists in two backends:
  * ``jnp`` — pure XLA ops (this package): the bring-up / CPU-CI path and
    the numerical reference for the Pallas kernels.
  * ``pallas`` — fused TPU kernels in ``cbinfer_tpu.ops.pallas``.

Stage map to the reference's CUDA kernels (SURVEY.md §2; /root/reference is
empty this session — semantics per arXiv 1704.04313 §3 / 1808.05488 §IV):
  C1 change detection  -> detect.py      (per-pixel, exact reference rule)
  C2 mask propagation  -> detect.py      (pixel map -> output-tile mask)
  C3 index extraction  -> compact.py     (cumsum compaction, fixed capacity)
  C4 gather            -> delta_conv.py  (tile windows incl. halo)
  C5 delta-conv GEMM   -> delta_conv.py  (k^2 shifted matmuls on MXU)
  C6 scatter           -> delta_conv.py  (tile-major scatter into out cache)
  C7 change-based pool -> delta_pool.py
"""
