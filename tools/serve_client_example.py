"""Minimal client for the tsdiff_tpu serving API (tsdiff_tpu/serve.py).

Start the server:  python -m tsdiff_tpu.serve CKPT... --port 8000
Then:              python tools/serve_client_example.py test_data.pkl

Posts the first reaction of a dataset pickle to /generate and prints the
generated TS coordinates.
"""

import json
import os
import sys
import urllib.request

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [_ROOT]


def main(path: str, url: str = "http://127.0.0.1:8000"):
    from tsdiff_tpu.data.dataset import load_dataset

    graphs, _ = load_dataset(path)
    g = graphs[0]
    payload = json.dumps({
        "graphs": [{
            "atom_type": np.asarray(g["atom_type"]).tolist(),
            "r_feat": np.asarray(g["r_feat"]).tolist(),
            "p_feat": np.asarray(g["p_feat"]).tolist(),
            "pos": None,
            "edge_index": np.asarray(g["edge_index"]).tolist(),
            "edge_type": np.asarray(g["edge_type"]).tolist(),
        }]
    }).encode()
    req = urllib.request.Request(
        f"{url}/generate", data=payload,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        out = json.load(r)
    pos = np.asarray(out["pos_gen"][0])
    print(f"generated {pos.shape[0]} atoms (nan={out['nan'][0]}):")
    print(np.array2string(pos, precision=3))


if __name__ == "__main__":
    main(*sys.argv[1:])
