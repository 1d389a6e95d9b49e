#!/usr/bin/env python
"""Data-parallel throughput: mixtures/sec for batched AuxIVA-IP separation
(vmapped jitted scan).  Times the device computation with a scalar sync —
host I/O over this development tunnel is not representative of production
transfers, so separated outputs stay on device."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audio_source_separation_tpu.ops.ip_components import (
    auxiva_ip_step_components,
    pair_products_planes,
    separate_components,
)


def main():
    rng = np.random.RandomState(111)
    C, F, T, ITER = 2, 1025, 256, 30

    def single(X2):
        Xc = jax.lax.complex(X2[0], X2[1])
        planes = pair_products_planes(Xc)
        eye = jnp.eye(C, dtype=Xc.dtype)
        W_rows = [
            [jnp.broadcast_to(eye[s, c], (F,)) for c in range(C)] for s in range(C)
        ]
        Y = separate_components(W_rows, Xc)

        def body(carry, _):
            W_rows, Y = carry
            W_rows, Y, nll = auxiva_ip_step_components(Xc, W_rows, Y, planes)
            return (W_rows, Y), nll

        (W_rows, Y), nlls = jax.lax.scan(body, (W_rows, Y), None, length=ITER)
        return nlls[-1]

    for batch in (1, 4, 16):
        X2 = rng.randn(batch, 2, C, F, T).astype(np.float32)
        run = jax.jit(jax.vmap(single))
        X2j = jnp.asarray(X2)
        _ = jax.device_get(run(X2j))  # compile + warm
        n_rep = 5
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = run(X2j)
        _ = jax.device_get(out)
        elapsed = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "batch": batch,
                    "mixtures_per_sec": round(batch * n_rep / elapsed, 2),
                    "config": "{}ch, {} bins, {} frames, {} iters".format(
                        C, F, T, ITER
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
