#!/usr/bin/env python
"""Minimal repro hunt for the XLA:CPU segfault the test conftest works
around (tests/conftest.py::_clear_jax_caches_per_module).

Observed: running the full suite in ONE process, the ~110th-plus distinct
XLA:CPU compilation segfaults inside backend_compile_and_load —
deterministically in full-suite order, never in any subset. Hypothesis: an
accumulation effect in the CPU client across many loaded executables
(cpu_client buffer/program arena), not any single program.

This script compiles N distinct programs (varying shapes so nothing is
cache-hit) with 8 virtual CPU devices, printing progress. If it crashes,
the printed index is the repro; if it survives, the suite's crash needs the
real test programs (donation/shard_map/scan variety), which is recorded
here as the negative result.

Usage: JAX_PLATFORMS=cpu python tools/xla_cpu_segfault_repro.py [N]
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    for i in range(n):
        k = 8 + i  # distinct static shape per program → distinct compile
        x = jnp.ones((k, k), jnp.float32)

        @jax.jit
        def f(x, i=i):
            def body(c, _):
                c = jnp.tanh(c @ x[: x.shape[0]]) + i * 1e-6
                return c, jnp.sum(c)
            c, s = jax.lax.scan(body, x, None, length=3)
            return jnp.linalg.norm(c) + jnp.sum(s)

        float(f(x))
        if i % 25 == 0:
            print(f"[{i}/{n}] ok", flush=True)
    print(f"survived {n} distinct compilations — accumulation alone "
          "does not reproduce; the suite crash needs the real programs")


if __name__ == "__main__":
    main()
