#!/usr/bin/env python
"""Run the search REST API.

The role of the reference's www/run_search_api.py:34-66 (gevent server) and
api/gunicorn_api.py:21-75: build the searcher from a conf file and serve
``/<endpoint>/<mode>``. Searcher construction retries forever like the
reference's worker boot (gunicorn_api.py:43-51).

Usage: python scripts/run_search_api.py -c conf/conf_search_local.json \
          -e cuimgsearch -p 5000
"""

import argparse
import os
import sys
import time

# Allow running straight from a checkout: scripts/ -> repo root on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--conf", required=True)
    ap.add_argument("-e", "--endpoint", default="cuimgsearch")
    ap.add_argument("-p", "--port", type=int, default=5000)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--retry-delay", type=int, default=60)
    args = ap.parse_args()

    from columbiaimagesearch_tpu.api.app import make_server
    from columbiaimagesearch_tpu.common.factory import build_searcher

    searcher = None
    while searcher is None:
        try:
            searcher = build_searcher(args.conf)
        except Exception as inst:
            print(f"[run_search_api] searcher init failed: {inst}; "
                  f"retrying in {args.retry_delay}s", file=sys.stderr)
            time.sleep(args.retry_delay)

    # Compile every serving wave-bucket program before taking traffic
    # (conf key "prewarm_waves"; defaults to the coalescer's max batch so
    # no bucket first compiles mid-request).
    try:
        import json

        with open(args.conf) as f:
            conf = json.load(f)
        coalescing = conf.get("SEARCHLOPQ_coalesce_window_ms") is not None
        max_wave = int(conf.get(
            "SEARCHLOPQ_prewarm_waves",
            conf.get("SEARCHLOPQ_coalesce_max_batch", 8)
            if coalescing else 1))
        if max_wave > 0:
            warmed = searcher.prewarm_serving(max_wave)
            print(f"[run_search_api] pre-warmed wave buckets {warmed}",
                  file=sys.stderr)
    except Exception as inst:  # noqa: BLE001 — warm-up is best-effort
        print(f"[run_search_api] prewarm skipped: {inst}", file=sys.stderr)

    server = make_server(searcher, endpoint=args.endpoint, port=args.port,
                         host=args.host,
                         input_type=searcher.input_type)
    print(f"[run_search_api] serving /{args.endpoint}/<mode> "
          f"on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
