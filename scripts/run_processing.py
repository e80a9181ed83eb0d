#!/usr/bin/env python
"""Run the extraction pipeline: checker + processor loop.

The role of the reference's scripts/run_processing.sh + the daemon wrappers
(reference: updater/extraction_checker.py:462-487 DaemonExtractionChecker,
updater/extraction_processor.py:890-907): poll the ingest source, build
updates, extract them, forever, with linear restart backoff on errors
(crash-only: persistent state in the KV store makes every restart safe).

Usage: python scripts/run_processing.py -c conf/conf_extraction_local.json
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
    ap.add_argument("--poll-delay", type=int, default=60,
                    help="seconds between ingest polls")
    ap.add_argument("--once", action="store_true",
                    help="run a single pass and exit")
    args = ap.parse_args()

    from columbiaimagesearch_tpu.common.factory import (
        build_checker,
        build_indexer,
        build_processor,
    )

    indexer = build_indexer(args.conf)
    checker = build_checker(args.conf, indexer=indexer)
    processor = build_processor(args.conf, indexer=indexer)

    nb_err = 0
    while True:
        try:
            created = checker.run_once()
            processed = processor.run_once()
            if created or processed:
                print(f"[run_processing] +{len(created)} updates created, "
                      f"{len(processed)} processed", flush=True)
            nb_err = 0
            if args.once:
                return
            time.sleep(args.poll_delay)
        except KeyboardInterrupt:
            return
        except Exception as inst:
            nb_err += 1
            delay = min(10 * nb_err, 600)
            print(f"[run_processing] error ({nb_err}): {inst}; "
                  f"restarting in {delay}s", file=sys.stderr)
            time.sleep(delay)


if __name__ == "__main__":
    main()
