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

    server = make_server(searcher, endpoint=args.endpoint, port=args.port,
                         host=args.host,
                         input_type=searcher.input_type)
    print(f"[run_search_api] serving /{args.endpoint}/<mode> "
          f"on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
