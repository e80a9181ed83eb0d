"""Write a component conf JSON from environment variables.

The reference generates per-component confs from docker env vars at
container start (reference: setup/ConfGenerator/create_conf_{ingester,
extractor,searcher}.py, invoked from setup/all-in-one/*.yml service
commands). This is the same step for the TPU-native stack: the compose
services in setup/ run it before exec'ing their role script.

Usage:
    python scripts/generate_conf.py <searcher|extractor|ingester> [-o OUT]

The conf content comes from columbiaimagesearch_tpu.common.factory
``generate_conf_*`` (tested in tests/test_config_scripts.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("roles", nargs="+",
                    choices=["searcher", "extractor", "ingester"],
                    help="one or more roles; multiple roles merge into "
                         "one conf (e.g. 'extractor ingester' for a "
                         "processor that consumes a broker)")
    ap.add_argument("-o", "--out", default=None,
                    help="output path (default: conf/generated/"
                         "conf_<roles>.json)")
    args = ap.parse_args()

    from columbiaimagesearch_tpu.common.factory import (
        generate_conf_extractor,
        generate_conf_ingester,
        generate_conf_searcher,
    )

    gens = {"searcher": generate_conf_searcher,
            "extractor": generate_conf_extractor,
            "ingester": generate_conf_ingester}
    conf = {}
    for role in args.roles:
        conf.update(gens[role]())
    out = args.out or os.path.join("conf", "generated",
                                   f"conf_{'_'.join(args.roles)}.json")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "w") as f:
        json.dump(conf, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {out} ({len(conf)} keys)", file=sys.stderr)


if __name__ == "__main__":
    main()
