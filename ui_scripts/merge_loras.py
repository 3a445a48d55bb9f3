"""Merge a list of LoRA files into one checkpoint (reference
ui_scripts/merge_loras.py): weighted-average shared keys, pass-through
uniques. Args: --loras '[{"path": ..., "strength": 1.0}, ...]' --output out.safetensors
[--save_dtype bf16|fp16|fp32]. Prints a JSON result line."""

import argparse
import json

import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file

DTYPES = {"float32": np.float32, "fp32": np.float32, "float16": np.float16,
          "fp16": np.float16, "bfloat16": "bfloat16", "bf16": "bfloat16"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--loras", required=True,
                    help='JSON list of {"path", "strength"} entries')
    ap.add_argument("--output", required=True)
    ap.add_argument("--save_dtype", default="bfloat16", choices=list(DTYPES))
    args = ap.parse_args()
    entries = json.loads(args.loras)
    if not entries:
        raise SystemExit("no loras given")
    merged: dict[str, np.ndarray] = {}
    weight: dict[str, float] = {}
    for e in entries:
        strength = float(e.get("strength", 1.0))
        with safe_open(e["path"], framework="np") as f:
            for k in f.keys():
                t = np.asarray(f.get_tensor(k), np.float32) * strength
                if k in merged:
                    merged[k] = merged[k] + t
                    weight[k] += strength
                else:
                    merged[k] = t
                    weight[k] = strength
        print(f"loaded {e['path']} (strength {strength})", flush=True)
    dt = DTYPES[args.save_dtype]
    if dt == "bfloat16":
        import ml_dtypes

        dt = ml_dtypes.bfloat16
    out = {k: np.ascontiguousarray((v / max(weight[k], 1e-8)).astype(dt))
           for k, v in merged.items()}
    save_file(out, args.output)
    print(json.dumps({"ok": True, "output": args.output, "keys": len(out)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
