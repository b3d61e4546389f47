"""Accelerator reachability probe for the "auto" codec selection.

On the tunneled TPU platform a stalled link makes the first
`jax.local_devices()` / dispatch hang indefinitely with zero CPU, which
would hang any `auto`-mode CLI run that crosses the device-size
threshold.  `device_reachable()` answers "can a tiny jax dispatch
complete right now?" from a killable subprocess, once per process:

- an explicit `XSI_DEVICE=jax` skips the probe (the user demanded the
  device; failing loudly there is the correct behavior),
- a CPU-pinned backend (`XSI_JAX_PLATFORM=cpu` / `JAX_PLATFORMS=cpu`)
  skips it (local dispatch cannot hang),
- otherwise the probe runs with a bounded timeout
  (`XSI_DEVICE_PROBE_TIMEOUT`, default 120 s — generous against slow
  first-connection grants) and an unreachable device downgrades the run
  to the host codec with a stderr note instead of hanging forever.

bench.py carries its own fail-fast variant of this probe (it must not
silently produce host numbers); this one exists for the CLI/library
path, where completing on the host beats hanging.
"""
from __future__ import annotations

import os
import sys

_cached: bool | None = None


def device_reachable() -> bool:
    global _cached
    if os.environ.get("XSI_DEVICE") == "jax":
        # forced device selection always wins, even over a cached
        # negative probe (the user changed their mind mid-process)
        return True
    if _cached is not None:
        return _cached
    if os.environ.get("XSI_DEVICE_PROBE", "1") in ("0", "off", "no"):
        _cached = True
        return True
    plat = (os.environ.get("XSI_JAX_PLATFORM")
            or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in plat.split(","):
        _cached = True
        return True
    jx = sys.modules.get("jax")
    if jx is not None:
        # Library callers may already hold the accelerator in-process
        # (libtpu grants are exclusive): a subprocess probe would then
        # FAIL to acquire the device that demonstrably works right here.
        # An already-initialized non-CPU backend is proof of
        # reachability — skip the subprocess.
        try:
            live = list(jx._src.xla_bridge._backends)
        except Exception:    # internal layout changed: fall through
            live = []
        if any(k != "cpu" for k in live):
            _cached = True
            return True
    import subprocess
    timeout_s = float(os.environ.get("XSI_DEVICE_PROBE_TIMEOUT", 120))
    why = ""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np, jax.numpy as jnp;"
             "x = jnp.ones((128, 128)) @ jnp.ones((128, 128));"
             "print(float(np.asarray(x)[0, 0]))"],
            timeout=timeout_s, capture_output=True, text=True)
        _cached = r.returncode == 0
        if not _cached:
            tail = (r.stderr or "").strip().splitlines()
            why = ("device probe failed: " + tail[-1] if tail
                   else "device probe exited %d" % r.returncode)
    except subprocess.TimeoutExpired:
        _cached = False
        why = "device probe timed out after %gs" % timeout_s
    if not _cached:
        print("xsi: accelerator unreachable (%s) — "
              "continuing on the host codec; set XSI_DEVICE=jax to wait "
              "for the device instead" % why, file=sys.stderr)
    return _cached
