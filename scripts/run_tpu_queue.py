#!/usr/bin/env python
"""Supervised runner for the TPU benchmark queue on the axon dev box.

The relay has a failure mode where a client launched right after a heavy
process exits blocks forever BEFORE its first compile (near-zero CPU time
accrues; see .claude/skills/verify/SKILL.md "Post-exit wedge"). This
supervisor launches each step, watches /proc CPU time, and kills+retries
a step whose process accrues < ``MIN_CPU_S`` seconds of CPU over
``IDLE_WINDOW_S`` of wall clock. Steps run sequentially; stdout goes to
the artifact path when given, stderr to a per-step log in /tmp.

Usage: python scripts/run_tpu_queue.py [queue-file.json]
Queue file: [{"cmd": [...], "stdout": "benchmarks/x.json",
              "timeout_s": ..., "idle_window_s": ...}, ...]
Default queue: the round-3 artifact set.

Set ``idle_window_s`` generously (>= 1500) for steps that spend long
stretches waiting on REMOTE compiles with near-zero local CPU —
serving-mode prewarm compiles many bucket programs back to back and
looks exactly like a wedge to the default 420 s window (it killed the
r04 serving-10M re-measure mid-prewarm).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IDLE_WINDOW_S = 420
MIN_CPU_S = 3.0
MAX_TRIES = 4
STEP_TIMEOUT_S = 3 * 3600

DEFAULT_QUEUE = [
    # Re-run the adversarial sweep on the precision-fixed ground truth.
    {"cmd": [sys.executable, "scripts/eval_recall.py", "--n", "4000000",
             "--dim", "256", "--train-n", "100000", "--V", "4096",
             "--M", "8", "--queries", "100", "--query-noise", "0.25",
             "--skip-exact", "--skip-rerank", "--probe-widths", "64,256,0",
             "--quotas", "10000,100000",
             "--out", "benchmarks/r03_recall_adversarial_4M_V4096.json"]},
    # Serving: no-rerank baseline, rerank, rerank+coalesce (same code).
    {"cmd": [sys.executable, "bench.py", "--mode", "serving"],
     "stdout": "benchmarks/r03_serving_http_1M.json"},
    {"cmd": [sys.executable, "bench.py", "--mode", "serving", "--rerank"],
     "stdout": "benchmarks/r03_serving_http_rerank_1M.json"},
    {"cmd": [sys.executable, "bench.py", "--mode", "serving", "--rerank",
             "--coalesce", "4"],
     "stdout": "benchmarks/r03_serving_http_rerank_coalesce_1M.json"},
    # Extraction after the resampler rewrite.
    {"cmd": [sys.executable, "bench.py", "--mode", "extraction-e2e"],
     "stdout": "benchmarks/r03_extraction_e2e.json"},
    {"cmd": [sys.executable, "bench.py", "--mode", "extraction"],
     "stdout": "benchmarks/r03_extraction_device.json"},
    # Headline latency smoke at 10.5M (driver runs the official one).
    {"cmd": [sys.executable, "bench.py"],
     "stdout": "benchmarks/r03_query_10Mi.json"},
    {"cmd": [sys.executable, "bench.py", "--mode", "searcher"],
     "stdout": "benchmarks/r03_searcher_10Mi.json"},
    # 100M recall + probe tradeoff (longest; last).
    {"timeout_s": 5 * 3600,
     "cmd": [sys.executable, "scripts/eval_recall.py",
             "--n", str(100 << 20), "--dim", "256", "--train-n", "100000",
             "--V", "4096", "--M", "8", "--queries", "100",
             "--query-noise", "0.25", "--stream-synth", "--skip-exact",
             "--skip-rerank", "--probe-widths", "64,256,0",
             "--quotas", "10000,100000",
             "--out", "benchmarks/r03_recall_100M.json"]},
]


def cpu_seconds(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
    except OSError:
        return None


def run_step(step, idx):
    name = step.get("stdout") or f"step{idx}"
    log_path = f"/tmp/queue_step{idx}.log"
    for attempt in range(1, MAX_TRIES + 1):
        out_f = (open(os.path.join(REPO, step["stdout"]), "w")
                 if step.get("stdout") else open(log_path, "a"))
        with open(log_path, "a") as log_f, out_f:
            log_f.write(f"\n=== attempt {attempt}: {' '.join(step['cmd'])}\n")
            log_f.flush()
            p = subprocess.Popen(step["cmd"], cwd=REPO, stdout=out_f,
                                 stderr=log_f)
            t0 = time.time()
            window_t0, window_cpu0 = t0, 0.0
            while True:
                rc = p.poll()
                if rc is not None:
                    break
                if time.time() - t0 > step.get("timeout_s", STEP_TIMEOUT_S):
                    print(f"[queue] {name}: step timeout, killing",
                          flush=True)
                    p.kill()
                    p.wait()
                    rc = "timeout"
                    break
                cpu = cpu_seconds(p.pid)
                now = time.time()
                if cpu is not None:
                    if cpu - window_cpu0 >= MIN_CPU_S:
                        window_t0, window_cpu0 = now, cpu
                    elif now - window_t0 > step.get("idle_window_s",
                                                    IDLE_WINDOW_S):
                        print(f"[queue] {name}: wedged "
                              f"({cpu - window_cpu0:.1f}s CPU in "
                              f"{now - window_t0:.0f}s), kill+retry",
                              flush=True)
                        p.kill()
                        p.wait()
                        rc = "wedged"
                        break
                time.sleep(15)
        if rc == 0:
            print(f"[queue] {name}: OK (attempt {attempt})", flush=True)
            return True
        print(f"[queue] {name}: rc={rc} (attempt {attempt})", flush=True)
        # Re-gate on device health before retrying: a client launched
        # right after a killed heavy process is exactly the post-exit
        # wedge scenario (docstring) — without this, all retries can burn
        # inside one wedge window while the startup gate never re-runs.
        time.sleep(20)
        wait_for_tpu()
    print(f"[queue] {name}: FAILED after {MAX_TRIES} attempts", flush=True)
    return False


def wait_for_tpu(max_wait_s=10 * 3600):
    """Gate: probe with a tiny matmul subprocess until the device answers
    (the relay can wedge for extended periods; see SKILL.md)."""
    probe = [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.ones((64,64)) @ jnp.ones((64,64)))))"]
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            # 330 s: above the 30-300 s remote-compile range, so a healthy
            # device with a cold compilation cache is not declared wedged
            # (a killed probe never populates the cache, which would make
            # every retry recompile and time out identically).
            subprocess.run(probe, timeout=330, check=True,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            print(f"[queue] TPU healthy after {time.time()-t0:.0f}s wait",
                  flush=True)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print(f"[queue] TPU still wedged ({time.time()-t0:.0f}s); "
                  "sleeping 5 min", flush=True)
            time.sleep(300)
    return False


def main():
    queue = DEFAULT_QUEUE
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            queue = json.load(f)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    if not wait_for_tpu():
        print("[queue] TPU never recovered; aborting", flush=True)
        return
    results = []
    for i, step in enumerate(queue):
        results.append(run_step(step, i))
    print(f"[queue] done: {sum(results)}/{len(results)} steps OK",
          flush=True)


if __name__ == "__main__":
    main()
