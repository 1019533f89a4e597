"""Measure the north-star forward bench under BOTH in-program scan lengths.

Round 1 reported `measure_unet_fwd` with n_iters=16; round >= 2 uses
n_iters=32 (a longer in-program steady state amortizes the per-call
fence more, so the two protocols are not directly comparable — see the
PROTOCOL NOTE in bench.py).  This tool prints both numbers side by side
so any cross-round comparison can be made under one protocol.

Usage (real TPU, run as the only TPU job):
    python tools/bench_protocol.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import measure_unet_fwd

    out = {}
    for n_iters in (16, 32):
        img_s, mfu = measure_unet_fwd(n_iters=n_iters)
        out[f"unet_fwd_n{n_iters}_img_s"] = round(img_s, 1)
        if mfu is not None:
            out[f"unet_fwd_n{n_iters}_mfu"] = round(mfu, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
