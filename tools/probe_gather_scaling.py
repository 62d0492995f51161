#!/usr/bin/env python
"""Random-row gather rate vs TABLE SIZE and ROW BYTES on the chip.

r4 finding: the bare slot gather runs 240M rows/s at a 169K-row table
but 78.9M rows/s at a 2.45M-row table (tools/probe_products_spmm.py)
— the entire products-scale SpMM 'gap' is this curve, not plan
quality. This probe maps it: 4M uniform random row reads from tables
of 169K..2.45M rows at f32 (400B), bf16 (200B) and int8 (100B) rows,
to decide whether source-range chunking (shrinks the working table)
or narrower rows (int8 eval tier / bf16 features) buy the rate back.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

F = 100
READS = 4_000_000
SIZES = [169_343, 400_000, 800_000, 1_600_000, 2_449_029]


def main():
    import jax
    import jax.numpy as jnp

    t_start = time.monotonic()

    def log(msg):
        print(f"[{time.monotonic()-t_start:6.1f}s] {msg}", flush=True)

    def timed(fn, *args, iters=3):
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(*args))
        return (time.perf_counter() - t0) / iters

    def chain(body, args, kk=5, iters=2):
        def build(n):
            @jax.jit
            def f(s, *a):
                def stp(c, _):
                    return body(c, *a) * (1.0 - 1e-9), None
                c, _ = jax.lax.scan(stp, s, None, length=n)
                return c
            return f
        z = jnp.float32(0.0)
        t1 = timed(build(1), z, *args, iters=iters)
        tk = timed(build(kk), z, *args, iters=iters)
        return max((tk - t1) / (kk - 1), 1e-9)

    nmax = max(SIZES)
    x = jax.random.normal(jax.random.PRNGKey(0), (nmax, F), jnp.float32)
    idx_u = jax.random.randint(jax.random.PRNGKey(1), (READS,), 0,
                               1 << 30, jnp.int32)
    _ = float(x[0, 0]) + int(idx_u[0])
    log(f"table [{nmax}, {F}] + {READS} indices ready")

    for n_rows in SIZES:
        idx = idx_u % n_rows

        def body(c, tbl, ii):
            # fold the carry into the INDICES (cheap; folding into the
            # table would stream the whole table per iteration)
            i2 = (ii + c.astype(jnp.int32)) % n_rows
            m = jnp.take(tbl, i2, axis=0)
            return c + m.sum(dtype=jnp.float32) * 1e-12

        row = []
        for name, tbl in [("f32", x[:n_rows]),
                          ("bf16", x[:n_rows].astype(jnp.bfloat16)),
                          ("int8", (x[:n_rows] * 10).astype(jnp.int8))]:
            t = chain(body, (tbl, idx))
            row.append(f"{name} {READS/t/1e6:6.1f}M rows/s")
        log(f"table {n_rows:>9} rows: " + "  ".join(row))


if __name__ == "__main__":
    main()
