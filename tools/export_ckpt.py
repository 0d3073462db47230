"""Export a training checkpoint as a compact, committable inference artifact.

Training checkpoints carry the full optimizer state (3x the parameter
payload); the scratch disk holding them does NOT survive between build
sessions.  The independent-seed ensemble members (the reference's production
recipe, reference README.md:77 / logs/trained_ckpt/ens*) must therefore be
committed to git in a params-only form: same self-describing pickle schema
(``tsdiff_tpu.ckpt.v1``), ``opt_state`` dropped, EMA kept only on request.
The sampling/eval stack reads these unchanged (``select_params`` never
touches ``opt_state``); only training resume needs the full file.

Usage:
    python tools/export_ckpt.py IN.ckpt OUT.ckpt [--keep_ema]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]


def export(in_path: str, out_path: str, keep_ema: bool = False) -> dict:
    from tsdiff_tpu.train import load_checkpoint

    ck = load_checkpoint(in_path)
    payload = {
        "format": "tsdiff_tpu.ckpt.v1",
        "config": ck["config"],
        "params": ck["params"],
        "opt_state": None,
        "ema_params": ck.get("ema_params") if keep_ema else None,
        "scheduler": None,
        "iteration": ck.get("iteration"),
        "avg_val_loss": ck.get("avg_val_loss"),
        "exported_from": os.path.basename(in_path),
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, out_path)
    return payload


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("in_path")
    ap.add_argument("out_path")
    ap.add_argument("--keep_ema", action="store_true")
    args = ap.parse_args(argv)
    payload = export(args.in_path, args.out_path, keep_ema=args.keep_ema)
    size_mb = os.path.getsize(args.out_path) / 1e6
    print(f"exported iter={payload['iteration']} val={payload['avg_val_loss']}"
          f" -> {args.out_path} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
