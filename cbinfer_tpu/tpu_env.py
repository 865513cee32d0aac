"""Process-level TPU runtime flags the framework ships with.

The sparse CB kernels read/write their HBM-resident caches (input
accepted-value caches, out caches, flat4 clip buffers) through aliased
Pallas operands that touch only the dirty tiles of a frame. XLA's memory
space assignment (MSA) nevertheless schedules *staging prefetches* of
those operands into VMEM around the kernels — a full cache round trip per
frame that the kernels never read (r3 xprof: ~114 us/frame of staging
copies on the 720p scene workload).

``--xla_msa_max_outstanding_prefetches=0`` disables those prefetches.
Measured adoption decision (scripts/probe_msa_flags.py, one flag set per
process, dense twin timed in the SAME process so a flag that sandbags
dense cannot fake a CB win; full JSON in MSA_FLAGS.json):

    workload   CB fps (base)  CB fps (pf0)  dense (base)  dense (pf0)
    scene      1177.5/1381.8  1739.1/1718.7  275.2/275.7   277.7/276.6
    pose        493.1/529.1    710.1/709.1   160.2         159.7

CB +26..+44% with dense unchanged (<1%) — the staging copies were pure
overhead on this access pattern. The other probed knobs lost or did
nothing: global scoped-VMEM shrink costs dense 13% (sandbag — rejected),
inefficient_use_to_copy_ratio=0.5 is a no-op.

``ensure_libtpu_flags()`` must run before libtpu initializes (i.e. before
the first jax device/backend call — importing jax is fine). The package
__init__ calls it, and bench.py calls it before importing jax at all. A
user-provided value for the same flag in LIBTPU_INIT_ARGS wins.
"""

import os

# Adopted per the measured decision above. Appended (not overwritten) so
# user/env-provided LIBTPU_INIT_ARGS content is preserved; skipped when
# the env already pins this flag to any value.
LIBTPU_FLAGS = ("--xla_msa_max_outstanding_prefetches=0",)


def ensure_libtpu_flags() -> str:
    """Append the adopted libtpu flags to LIBTPU_INIT_ARGS (idempotent).

    Returns the resulting value. No-op for flags the environment already
    sets (any value) — the user's choice wins. ``CBINFER_TPU_NO_FLAGS=1``
    skips the adopted flags entirely (A/B harnesses: probe_stepper.py /
    probe_msa_flags.py run the stock-runtime arm this way).
    """
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if os.environ.get("CBINFER_TPU_NO_FLAGS") == "1":
        return cur
    parts = cur.split()
    for flag in LIBTPU_FLAGS:
        key = flag.split("=", 1)[0]
        if not any(p.split("=", 1)[0] == key for p in parts):
            parts.append(flag)
    val = " ".join(parts)
    os.environ["LIBTPU_INIT_ARGS"] = val
    return val
