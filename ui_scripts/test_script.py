"""Example UI script invoked via POST /api/scripts (reference
ui_scripts/test_script.py contract): stdout/stderr are returned buffered, and
a JSON object on the FINAL stdout line becomes the response's `result`."""

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--message", default="hello")
    ap.add_argument("--count", type=int, default=3)
    args = ap.parse_args()
    for i in range(args.count):
        print(f"line {i}: {args.message}")
    print(json.dumps({"ok": True, "message": args.message, "lines": args.count}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
