#!/usr/bin/env python
"""Prime the persistent compile cache with every program bench.py runs.

bench.py's per-section caps are sized for a WARM cache; several programs
(rk4x13-b2048 fwd, the dropout checks, the f32 parity pair, serve224,
the tsbase_b256_cached matrix entry) cold-compile slower than their caps
over the tunneled runtime, so a cold bench run times them out AND leaves
them uncached (the client-side cache write never happens). This script
runs the exact same snippets/modules — the module-level *_CODE constants
bench.py itself executes (ADVICE r4: duplicated snippet strings drifted)
— in fresh interpreters with generous timeouts so the next
`python bench.py` — including the driver's round-end run on this host —
finds every entry warm. Re-runnable; each stage is independent.

Usage: python scripts/prime_bench.py [stage ...]
  stages: euler1024 fidelity parity_bf16 euler2048 rk4 dropout f32
          serve224 matrix6 matrix
  default: all but `matrix` (matrix6 primes the six headline variants
  bench.py records; `matrix` additionally primes the builder-side
  extras via benchmarks.train_speed.variant_matrix)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import bench  # noqa: E402

_HEADLINE_VARIANTS = ("free_b1024", "tsbase_b64", "drop03_b1024",
                      "l2_b1024", "macaron_b1024", "tsbase_b256_cached")


def _prime_variants(names, timeout):
    out = {}
    for name in names:
        t0 = time.time()
        try:
            r = bench._subproc_json(
                argv=["-m", "benchmarks.train_speed", "--variant", name],
                timeout=timeout)
            out[name] = f"ok in {time.time() - t0:.0f}s " \
                        f"({r.get('step_ms')}ms)"
        except Exception as e:  # noqa: BLE001
            out[name] = f"FAILED after {time.time() - t0:.0f}s: " \
                        f"{str(e)[:160]}"
        print(f"[prime]   {name}: {out[name]}", flush=True)
    return out


STAGES = {
    # the headline path itself: on a fresh host the tunnel cold-compiles
    # it slower than bench.py's 650s first-section cap (measured r4), so
    # it MUST be primed here or the driver's round-end bench records 0
    "euler1024": lambda t: bench._subproc_json(
        bench._FWD_CODE.format(steps=49, solver="euler", batch=1024,
                               use_pallas=True), timeout=t),
    "euler2048": lambda t: bench._subproc_json(
        bench._FWD_CODE.format(steps=49, solver="euler", batch=2048,
                               use_pallas=True), timeout=t),
    "fidelity": lambda t: bench._subproc_json(
        bench._FIDELITY_CODE, timeout=t),
    "parity_bf16": lambda t: bench._subproc_json(
        argv=["-m", "benchmarks.parity_check", "--bf16-only"], timeout=t),
    "rk4": lambda t: bench._subproc_json(
        bench._FWD_CODE.format(steps=13, solver="rk4", batch=2048,
                               use_pallas=True), timeout=t),
    "dropout": lambda t: bench._subproc_json(
        bench._DROPOUT_CODE, timeout=t),
    "f32": lambda t: bench._subproc_json(
        argv=["-m", "benchmarks.parity_check", "--f32-only"], timeout=t),
    "serve224": lambda t: bench._subproc_json(
        bench._SERVE224_CODE, timeout=t),
    "matrix6": lambda t: _prime_variants(_HEADLINE_VARIANTS, t),
    "matrix": lambda t: bench._subproc_json(
        "import json\n"
        "from benchmarks.train_speed import variant_matrix\n"
        "print(json.dumps(variant_matrix(budget_s=%f, isolate=True)))" % t,
        timeout=t + 120),
}


def main():
    names = sys.argv[1:] or ["euler1024", "fidelity", "parity_bf16",
                             "euler2048", "rk4", "dropout", "f32",
                             "matrix6", "serve224"]
    for name in names:
        t0 = time.time()
        try:
            r = STAGES[name](2400.0 if name == "matrix" else 1500.0)
            print(f"[prime] {name}: ok in {time.time() - t0:.0f}s -> "
                  f"{str(r)[:200]}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[prime] {name}: FAILED after {time.time() - t0:.0f}s: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
