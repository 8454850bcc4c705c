"""Minimal repro harness for the intermittent XLA:CPU SIGSEGV in
``backend_compile_and_load``.

Signature observed while running this repo's full test suite in ONE process
(jax 0.6-era jaxlib, single-core linux VM):

* after ~20+ heavyweight compilations in the same interpreter, a subsequent
  compile crashes with SIGSEGV inside ``backend_compile_and_load``
  (stack: pjit -> UnloadedExecutable -> LLVM codegen);
* the SAME compile succeeds reliably in a fresh interpreter — the crash is
  in-process-history dependent, which is why this repo runs its slow tier
  one pytest process per file (tests/conftest.py pytest_runtestloop);
* ``--xla_cpu_parallel_codegen_split_count=1`` reduces but does not
  eliminate the incidence, pointing at (but not proving) a parallel-codegen
  race.

This script approximates the suite's compile pressure: it compiles a stream
of distinct medium-sized programs (scans + gathers + reductions, new shapes
each iteration so nothing is cached) until it crashes or reaches --iters.
Run under a loop to catch the intermittent crash, e.g.:

    for i in $(seq 20); do python tools/xla_cpu_sigsegv_repro.py || break; done

Exit code 0 = no crash this run (the bug is intermittent); a SIGSEGV kills
the process with signal 11.
"""
import argparse
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def make_program(n: int, cap: int):
    """A fresh program shaped like this repo's pipeline kernels: a stateful
    scan over gathered windows plus masked reductions (distinct (n, cap)
    each call defeats caching so every iteration pays a full compile)."""

    def body(carry, x):
        acc, idx = carry
        w = lax.dynamic_slice(x, (jnp.minimum(idx, n - 8),), (8,))
        acc = acc * 0.99 + jnp.sum(w)
        return (acc, (idx + 3) % n), acc

    def fn(sig):
        env = jnp.abs(sig)
        order = jnp.argsort(env)
        top = env[order[-cap:]]
        (_, _), trace = lax.scan(body, (0.0, 0), jnp.broadcast_to(env, (cap, n)))
        q = jnp.quantile(env, 0.3)
        return jnp.sum(top) + jnp.sum(trace) + q

    return jax.jit(fn)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=60,
                   help="number of distinct compiles to attempt (default 60)")
    args = p.parse_args()

    rng = np.random.RandomState(0)
    for i in range(args.iters):
        n = 4096 + 64 * i          # new static shapes -> fresh compile
        cap = 128 + 8 * (i % 13)
        fn = make_program(n, cap)
        out = fn(jnp.asarray(rng.randn(n)))
        float(out)                 # force execution
        print(f"compile {i + 1}/{args.iters} ok (n={n}, cap={cap})", flush=True)
    print("no crash this run (bug is intermittent; loop the script)")


if __name__ == "__main__":
    main()
