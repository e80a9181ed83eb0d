#!/usr/bin/env python
"""CLI client for a deployed search API.

The role of the reference's manual endpoint tester
(reference: tests/test_face_search.py — GET/POST byURL/bySHA1/byB64 queries
against a deployed service, printing the JSON).

Usage:
  python scripts/query_client.py --host localhost:5000 --endpoint cuimgsearch \
      --mode byPATH --data /path/img.jpg --options '{"max_returned": 5}'
  python scripts/query_client.py --mode byB64 --file img.jpg --post
  python scripts/query_client.py --mode status
"""

import argparse
import base64
import json
import urllib.parse
import urllib.request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="localhost:5000")
    ap.add_argument("--endpoint", default="cuimgsearch")
    ap.add_argument("--mode", default="status",
                    help="byURL|byPATH|bySHA1|byB64|status|refresh|"
                         "check_new_updates|check_all_updates|view_similar_by*")
    ap.add_argument("--data", help="query payload (comma-separated)")
    ap.add_argument("--file", help="read an image file and send as byB64")
    ap.add_argument("--options", help="options JSON string")
    ap.add_argument("--post", action="store_true", help="send as POST body")
    args = ap.parse_args()

    data = args.data
    if args.file:
        with open(args.file, "rb") as f:
            data = base64.b64encode(f.read()).decode()

    url = f"http://{args.host}/{args.endpoint}/{args.mode}"
    if args.post:
        body = json.dumps({"data": data,
                           "options": json.loads(args.options)
                           if args.options else None}).encode()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"},
            method="POST")
    else:
        params = {}
        if data:
            params["data"] = data
        if args.options:
            params["options"] = args.options
        if params:
            url += "?" + urllib.parse.urlencode(params)
        req = urllib.request.Request(url)

    try:
        with urllib.request.urlopen(req, timeout=600) as resp:
            payload = resp.read().decode()
    except urllib.error.HTTPError as err:
        payload = err.read().decode()
    try:
        print(json.dumps(json.loads(payload), indent=2))
    except json.JSONDecodeError:
        print(payload)  # HTML modes


if __name__ == "__main__":
    main()
