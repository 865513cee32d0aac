"""Gate: block (bounded) until the axon-tunneled TPU answers a real op.

Device ENUMERATION succeeds from local metadata even when the remote
terminal is wedged (r3: session-claim hello sent, zero bytes answered),
so the probe must execute an op. Each attempt runs in a fresh bounded
subprocess — a wedged attempt cannot poison the next one, and the parent
never touches jax itself.

Usage: python scripts/wait_tpu.py [deadline_s=1800] [attempt_s=120]
Exit 0 once a probe answers; 1 if the deadline passes.
"""

import os
import subprocess
import sys
import time

PROBE = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.add(jnp.zeros((), jnp.float32), 1.0)\n"
    # sync via scalar fetch, not block_until_ready — the repo's timing
    # notes found block_until_ready unreliable on this runtime, and the
    # gate must prove a full device round-trip (advisor r3)
    "assert float(x) == 1.0\n"
    "assert any(d.platform == 'tpu' for d in jax.devices())\n"
    "print('tpu-ok')\n")


def main():
    deadline_s = float(sys.argv[1]) if len(sys.argv) > 1 else 1800.0
    attempt_s = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    t0 = time.time()
    n = 0
    while time.time() - t0 < deadline_s:
        n += 1
        try:
            r = subprocess.run([sys.executable, "-c", PROBE],
                               capture_output=True, text=True,
                               timeout=attempt_s, cwd="/")
            if r.returncode == 0 and "tpu-ok" in r.stdout:
                print(f"wait_tpu: up after {time.time() - t0:.0f}s "
                      f"({n} attempts)", flush=True)
                return 0
            msg = (r.stderr or r.stdout).strip().splitlines()
            print(f"wait_tpu: attempt {n} rc={r.returncode} "
                  f"{msg[-1] if msg else ''}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"wait_tpu: attempt {n} timed out after {attempt_s:.0f}s "
                  "(terminal not answering)", flush=True)
        time.sleep(30)
    print(f"wait_tpu: deadline {deadline_s:.0f}s passed — giving up",
          flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
