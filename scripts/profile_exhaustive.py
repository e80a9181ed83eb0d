"""Measure the exhaustive-ADC Pallas kernel: ms/query at the documented
config (V=64, M=8, S=256, 1M codes, NQ=8 and NQ=64). Chained batches
through ExhaustiveADC.search_batch wall-clock (each batch is one kernel
launch + top-k + D2H of the top rows)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.index.pallas_adc import ExhaustiveADC

    from tests.oracle_lopq import random_params

    rng = np.random.RandomState(0)
    V, M, S, D = 64, 8, 256, 128
    n = 1_000_000
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    log(f"devices {jax.devices()}")

    coarse = rng.randint(0, V, (n, 2)).astype(np.int32)
    fine = rng.randint(0, S, (n, M)).astype(np.uint8)

    for nq in (8, 64):
        ex = ExhaustiveADC(model, nq=nq)
        ex.build(coarse, fine)
        X = rng.randn(nq, D).astype(np.float32)
        ex.search_batch(X, k=10)  # compile + warm
        times = []
        for _ in range(5):
            s = time.perf_counter()
            ex.search_batch(X, k=10)
            times.append((time.perf_counter() - s) / nq * 1e3)
        log(f"NQ={nq}: {np.median(times):.2f} ms/query "
            f"({len(ex._ids)} padded rows)")


if __name__ == "__main__":
    main()
